from __future__ import annotations

import pytest

from lucene_solr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lss-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_tiny(spark):
    from lucene_solr_spark.sources.webtext import synth_pages

    df = synth_pages(spark, 300, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_index(spark, pages_tiny):
    from lucene_solr_spark.index.builder import build_index

    idx = build_index(pages_tiny).cache()
    idx.docs.count()
    return idx


@pytest.fixture(scope="session")
def tiny_oracle(pages_tiny):
    from lucene_solr_spark.oracle import OracleIndex

    rows = pages_tiny.select("url", "text").collect()
    docs = [(i, r["text"]) for i, r in enumerate(sorted(rows, key=lambda r: r["url"]))]
    return OracleIndex(docs)


@pytest.fixture(scope="session")
def offsets_index_tiny(spark, pages_tiny):
    from lucene_solr_spark.index.builder import build_index

    idx = build_index(pages_tiny, with_offsets=True).cache()
    idx.docs.count()
    return idx
