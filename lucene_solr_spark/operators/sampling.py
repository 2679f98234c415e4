"""Deterministic sampling / packing operators for training-data
pipelines (the LLM-pipeline surface alongside operators/dedup.py and
operators/textstats.py). Both are hash- or window-based — no RNG
state, identical results at any parallelism, which is what a 100 TB
pipeline needs for reproducible dataset builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample(df: DataFrame, group_col: str, k_per_group: int,
                      key_col: str, seed: str = "42") -> DataFrame:
    """Deterministic stratified sample: top ``k_per_group`` rows per
    group by the md5(seed:key) hash order (the RandomSortField
    construction of random_stream, applied per stratum). Unlike
    df.sampleBy, the result is exact-size per group and reproducible
    across engines and partitionings.

    Scale: one shuffle on the group key; per-group rank windows are
    bounded heaps after AQE, no global sort."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(F.asc("rnd"),
                                              F.asc(key_col))
    return (df.withColumn("rnd", h)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k_per_group))


def pack_sequences(df: DataFrame, part_col: str, key_col: str,
                   tokens_col: str, budget: int) -> DataFrame:
    """Sequence packing for context-window training batches: rows are
    ordered deterministically inside each ``part_col`` partition and
    packed into bins of ~``budget`` tokens by cumulative-sum splitting
    — pack_id = floor(cum_tokens_before / budget) (the T5-style offset
    packing; documented deviation from exact first-fit bin packing,
    whose sequential state does not distribute). Emits (pack_id,
    pack_pos, cum_before) per row.

    Scale: ONE window cumsum per partition key — the window is
    partitioned by ``part_col``, so no single-partition global sort;
    at 100 TB the partition key is a hash bucket and every bucket
    packs independently."""
    w = Window.partitionBy(part_col).orderBy(F.asc(key_col))
    cum = (F.sum(F.col(tokens_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    out = df.withColumn("cum_before", F.coalesce(cum, F.lit(0))
                        .cast("long"))
    out = out.withColumn(
        "pack_id", F.floor(F.col("cum_before") / F.lit(budget))
        .cast("long"))
    wp = Window.partitionBy(part_col, "pack_id").orderBy(F.asc(key_col))
    return out.withColumn("pack_pos",
                          F.row_number().over(wp).cast("long"))


def dataset_split(df: DataFrame, key_col: str,
                  fractions: dict[str, float],
                  seed: str = "42") -> DataFrame:
    """Deterministic train/val/test split: each row lands in exactly
    one named split by its md5(seed:key) hash. The first 8 hex chars
    are compared LEXICOGRAPHICALLY against the cumulative-fraction
    cuts rendered as 8-digit lowercase hex (fixed-width hex order ==
    numeric order), so the rule is pure string comparison — identical
    on every engine, no hex-to-int cast needed. Cut boundaries are
    quantized to the 2^32 grid (documented: a fraction of 0.8 means
    floor(0.8 * 2^32) / 2^32 exactly). Disjoint and exhaustive by
    construction; ``fractions`` values must sum to 1.0.

    Scale: a pure map — no shuffle, no sample() RNG state; the split
    column is a Column expression over the hash."""
    tot = sum(fractions.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {tot}, expected 1.0")
    h8 = F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col(key_col).cast("string"))), 1, 8)
    expr = None
    acc = 0.0
    names = list(fractions.items())
    for name, frac in names[:-1]:
        acc += frac
        cut_i = int(acc * (1 << 32))
        # a cumulative fraction reaching 1.0 would render 9 hex chars
        # and invert the fixed-width comparison: catch-all instead
        cond = (F.lit(True) if cut_i >= (1 << 32)
                else h8 < format(cut_i, "08x"))
        branch = F.when(cond, F.lit(name))
        expr = branch if expr is None else expr.when(cond, F.lit(name))
    last = names[-1][0]
    expr = (F.lit(last) if expr is None
            else expr.otherwise(F.lit(last)))
    return df.withColumn("split", expr)
