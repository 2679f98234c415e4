"""Facets / stats / grouping (SURVEY §2.5, §2.6).

Maps Solr's JSON Facet API + StatsComponent + grouping/collapse onto
groupBy / window operators:

- field facet        -> groupBy(field).count() + top-k buckets
                        (FacetFieldProcessorByHashDV.java — hash agg;
                        Catalyst partial+final HashAggregate = the
                        distributed two-phase refinement for free)
- range facet        -> bucketed groupBy (RangeFacetProcessor.java)
- pivot facet        -> multi-level groupBy (PivotFacetProcessor.java)
- stats component    -> agg() with min/max/sum/count/mean/stddev
                        (StatsValuesFactory.java:106-165); stddev via
                        exact integer sums so it is cross-engine
                        deterministic
- grouping/collapse  -> Window.partitionBy(group).orderBy(sort) +
                        row_number() <= k (grouping module /
                        CollapsingQParserPlugin.java)
- cardinality        -> approx_count_distinct (HLL, like
                        solr/core/.../util/hll/HLL.java)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def field_facet(df: DataFrame, field: str, limit: int = 10,
                sort_by_count: bool = True) -> DataFrame:
    """Per-value counts, top `limit` buckets, Solr default sort
    (count desc, value asc)."""
    counts = df.groupBy(field).agg(F.count(F.lit(1)).alias("cnt"))
    order = [F.desc("cnt"), F.asc(field)] if sort_by_count else [F.asc(field)]
    return counts.orderBy(*order).limit(limit)


def range_facet(df: DataFrame, field: str, start: float, end: float,
                gap: float) -> DataFrame:
    """Numeric range buckets [start+i*gap, start+(i+1)*gap)."""
    bucket = F.floor((F.col(field) - F.lit(start)) / F.lit(gap)).cast("long")
    return (
        df.where((F.col(field) >= start) & (F.col(field) < end))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pivot_facet(df: DataFrame, fields: list[str]) -> DataFrame:
    """Multi-level pivot: counts for every combination of the fields
    (hierarchical drill-down flattened)."""
    return df.groupBy(*fields).agg(F.count(F.lit(1)).alias("cnt"))


def stats_component(df: DataFrame, field_cents: Column, n_col: str = "n") -> DataFrame:
    """StatsComponent metrics over an *integer* column (cents /
    counts): min, max, sum, count, mean, sumsq, stddev.

    mean/stddev are derived from exact integer sums with a fixed
    double-precision formula — deterministic across engines and
    partitionings (no float accumulation order dependence):
    stddev = sqrt((n*sumsq - sum^2) / (n*(n-1))).
    """
    agg = df.agg(
        F.count(F.lit(1)).alias(n_col),
        F.min(field_cents).alias("min_v"),
        F.max(field_cents).alias("max_v"),
        F.sum(field_cents).alias("sum_v"),
        F.sum(field_cents * field_cents).alias("sumsq_v"),
    )
    n = F.col(n_col).cast("double")
    s = F.col("sum_v").cast("double")
    ss = F.col("sumsq_v").cast("double")
    return agg.select(
        n_col, "min_v", "max_v", "sum_v", "sumsq_v",
        (s / n).alias("mean_v"),
        F.sqrt((n * ss - s * s) / (n * (n - F.lit(1.0)))).alias("stddev_v"),
    )


def cardinality(df: DataFrame, field: str, rsd: float = 0.023) -> DataFrame:
    """HLL cardinality (StatsComponent 'cardinality' / HLLAgg)."""
    return df.agg(F.approx_count_distinct(field, rsd).alias("cardinality"))


def group_top_k(df: DataFrame, group: str, order: list[Column], k: int = 1,
                rank_col: str = "grank") -> DataFrame:
    """Grouping / CollapsingQParserPlugin: top-k rows per group.

    Two-pass grouping collectors (FirstPass/SecondPassGroupingCollector)
    become one window aggregation; the shuffle partitions by group key
    so each group is ranked locally (no global sort)."""
    w = Window.partitionBy(group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k)


def distinct_values(df: DataFrame, fields: list[str]) -> DataFrame:
    """DistinctValuesCollector / SELECT DISTINCT."""
    return df.select(*fields).distinct()
