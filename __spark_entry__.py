"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship BM25 top-10 over the sf0.001 documents
  table via the float32-exact engine path.
- ``queries()`` / ``oracle_sql()``: the full operator surface with
  DuckDB oracles — see lucene_solr_spark/driver_surface.py for the
  implementations and the cross-engine determinism contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 for a
    boolean query, answered by the flagship engine path — segment
    index (FOR/delta + skip + block-max codec) + block-max WAND with
    float32 Lucene-exact scoring."""
    from lucene_solr_spark.driver_surface_ext import _seg_index
    from lucene_solr_spark.search.wand import WandSearcher

    si = _seg_index(spark, "/root/testdata/sf0.001")
    return WandSearcher(si).search("hash AND join", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucene_solr_spark.driver_surface import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from lucene_solr_spark.driver_surface import ORACLES

    return dict(ORACLES)
