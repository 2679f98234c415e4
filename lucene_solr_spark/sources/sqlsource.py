"""SQL-database source — the JdbcStream analogue (solr/solrj/src/java/
org/apache/solr/client/solrj/io/stream/JDBCStream.java): read the
result of a SQL query on an external database into the streaming
expression pipeline.

Spark-first shape: the external engine here is DuckDB (the SQL engine
available in this environment; on a cluster this would be
spark.read.jdbc with a driver jar). Like the reference's JDBCStream,
the fetch is a SINGLE stream from the database — the parallelism
comes from what you do with the frame afterwards, not the read. Arrow
is the transport (no per-row Python), and results land as a regular
DataFrame that joins/aggregates with everything else.

For big extractions, partition on the database side (one query per
key range via ``sql_stream_partitioned``) — the same
partitionColumn/lowerBound/upperBound contract as spark.read.jdbc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sql_stream(spark: SparkSession, db_path: str, query: str) -> DataFrame:
    """One-shot SQL read: run ``query`` on the DuckDB database at
    ``db_path`` (':memory:' or a file) and return the result as a
    DataFrame (Arrow transport)."""
    import duckdb

    con = duckdb.connect(db_path, read_only=db_path != ":memory:")
    try:
        tbl = con.sql(query).arrow()
    finally:
        con.close()
    return spark.createDataFrame(tbl.to_pandas())


def sql_stream_partitioned(spark: SparkSession, db_path: str, query: str,
                           partition_col: str, lower: int, upper: int,
                           num_partitions: int = 8) -> DataFrame:
    """Range-partitioned SQL read (spark.read.jdbc's partitionColumn
    contract): N queries, one per key stripe, unioned lazily — each
    stripe fetch is independent, so the database does the scan N ways.
    ``query`` must be a relation usable in a WHERE-able subselect."""
    from functools import reduce

    span = max(1, (upper - lower + num_partitions) // num_partitions)
    frames = []
    for i in range(num_partitions):
        lo = lower + i * span
        hi = min(upper + 1, lo + span)
        if lo >= upper + 1:
            break
        frames.append(sql_stream(
            spark, db_path,
            f"SELECT * FROM ({query}) WHERE {partition_col} >= {lo} "
            f"AND {partition_col} < {hi}"))
    return reduce(lambda a, b: a.unionByName(b), frames)
