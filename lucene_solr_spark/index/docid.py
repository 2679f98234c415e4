"""Deterministic, scalable global docid assignment.

Lucene assigns docids in arrival order per segment
(index/DocumentsWriterPerThread.java); cross-segment order is fixed by
the segment list. For reproducible rank tie-breaks (SURVEY §2.10) we
freeze a canonical global order — sort by a key column (url) — and
assign dense 0..N-1 ids.

Scale design: a naive ``row_number() OVER (ORDER BY url)`` is a
single-partition window — a non-starter at 10^12 rows. Instead we use
the classic two-pass range-partitioned pattern (the same thing
``zipWithIndex`` does, but staying in DataFrame land):

1. ``repartitionByRange(key)`` — Spark range-samples the key and
   produces globally ordered partitions.
2. ``sortWithinPartitions(key)`` + per-partition sizes → cumulative
   offsets (tiny driver-side array, one int per partition).
3. mapInPandas adds ``offset[pid] + local_index``.

Cost: one range shuffle + one count per partition. No global sort on
a single node, no window over the whole table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_doc_ids(df: DataFrame, key: str = "url", num_partitions: int | None = None,
                   docid_col: str = "docid") -> DataFrame:
    """Add a dense global ``docid`` ordered by ``key``.

    Deterministic for a fixed input and key (independent of input
    partitioning or parallelism level — required so local[8] and
    local[32] builds produce identical indexes).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, F.col(key)).sortWithinPartitions(key)
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    # PIN the range partitioning: repartitionByRange samples boundaries
    # with a per-execution random seed, so without a persist the count
    # pass and the id pass could see DIFFERENT partitionings and assign
    # duplicate/holey docids. The persist makes both passes read one
    # materialization. (Across runs determinism is unaffected: docid =
    # global rank in key order, independent of where boundaries fall.)
    ranged = ranged.persist()

    # Pass 1: per-partition counts -> offsets. Tiny result (#partitions
    # rows) so collect() is fine at any scale.
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(ranged.schema.fields + [StructField(docid_col, LongType(), False)])
    offsets_b = df.sparkSession.sparkContext.broadcast(offsets)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = offsets_b.value[pid] + local
            pdf = pdf.copy()
            pdf[docid_col] = range(base, base + len(pdf))
            local += len(pdf)
            yield pdf

    out = ranged.mapInPandas(add_ids, schema=out_schema).drop("__pid")
    # expose the pinned (persisted) range frame so the caller can
    # unpersist it once the docid-bearing output is materialized —
    # without this, every build (incl. each NRT micro-batch) leaks one
    # cached DataFrame for the session lifetime.
    out._pinned_range_frame = ranged
    return out
