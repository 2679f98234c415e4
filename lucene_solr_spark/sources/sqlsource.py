"""SQL-database source — the JdbcStream analogue (solr/solrj/src/java/
org/apache/solr/client/solrj/io/stream/JDBCStream.java): read the
result of a SQL query on an external database into the streaming
expression pipeline.

Spark-first shape: the external engine here is DuckDB (the SQL engine
available in this environment; on a cluster this would be
spark.read.jdbc with a driver jar). ``sql_stream`` mirrors the
reference's JDBCStream exactly: ONE stream from the database through
the driver (Arrow transport, no per-row Python) — fine for dimension
pulls, wrong for big extractions.

``sql_stream_partitioned`` is the spark.read.jdbc shape: the key range
is cut into stripes and EACH STRIPE IS FETCHED INSIDE AN EXECUTOR TASK
(mapInPandas over a one-row-per-stripe frame; every task opens its own
read-only connection), so fetch bandwidth scales with tasks and no
row ever rides through the driver. Bounds follow the JDBC contract:
``lower``/``upper`` only set stripe WIDTHS — the first stripe is
unbounded below (and takes NULL keys) and the last unbounded above,
so no row is ever lost to approximate bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sql_stream(spark: SparkSession, db_path: str, query: str) -> DataFrame:
    """One-shot SQL read: run ``query`` on the DuckDB database at
    ``db_path`` and return the result as a DataFrame. Implemented as a
    ONE-STRIPE call of sql_stream_partitioned, so the fetch happens
    INSIDE an executor task (mapInPandas) and rows never transit the
    driver — there is no accidental driver-materialization route left.
    The driver runs only a zero-row schema probe (the JDBCStream
    open()/metadata round of the reference). A ':memory:' database has
    no cross-process identity, so it still takes the (driver-side,
    explicit, small) Arrow path."""
    if db_path == ":memory:":
        import duckdb

        con = duckdb.connect(db_path)
        try:
            tbl = con.sql(query).arrow()
        finally:
            con.close()
        return spark.createDataFrame(tbl.to_pandas())
    return sql_stream_partitioned(spark, db_path, query,
                                  partition_col="1", lower=0, upper=0,
                                  num_partitions=1)


def jdbc_stripe_predicates(partition_col: str, lower: int, upper: int,
                           num_partitions: int) -> list[str]:
    """The stripe WHERE clauses of spark.read.jdbc's columnPartition
    (sql/execution/datasources/jdbc/JDBCRelation.scala): bounds decide
    stride only; the first stripe has no lower bound (and absorbs
    NULLs), the last no upper bound — so rows outside [lower, upper]
    are still fetched, exactly once."""
    num_partitions = max(1, int(num_partitions))
    if num_partitions == 1:
        return ["1 = 1"]
    stride = max(1, (int(upper) - int(lower)) // num_partitions)
    bounds = [int(lower) + i * stride for i in range(1, num_partitions)]
    preds = [f"{partition_col} < {bounds[0]} OR {partition_col} IS NULL"]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        preds.append(f"{partition_col} >= {lo} AND {partition_col} < {hi}")
    preds.append(f"{partition_col} >= {bounds[-1]}")
    return preds


def sql_stream_partitioned(spark: SparkSession, db_path: str, query: str,
                           partition_col: str, lower: int, upper: int,
                           num_partitions: int = 8) -> DataFrame:
    """Range-partitioned SQL read with EXECUTOR-SIDE fetches: one task
    per key stripe opens its own read-only connection and pulls only
    its stripe, so the database is scanned N ways concurrently and no
    data transits the driver (the driver runs only a zero-row schema
    probe). ``query`` must be a relation usable in a WHERE-able
    subselect; ``db_path`` must be a file reachable from executors
    (a ':memory:' database has no cross-process identity)."""
    import duckdb
    from pyspark.sql.pandas.types import from_arrow_schema

    if db_path == ":memory:":
        raise ValueError(
            "partitioned reads need a database file visible to executor "
            "tasks; ':memory:' exists only in the driver process")
    con = duckdb.connect(db_path, read_only=True)
    try:
        probe = con.sql(f"SELECT * FROM ({query}) LIMIT 0").arrow()
    finally:
        con.close()
    schema = from_arrow_schema(probe.schema)

    preds = jdbc_stripe_predicates(partition_col, lower, upper,
                                   num_partitions)
    stripes = spark.createDataFrame(
        [(i, p) for i, p in enumerate(preds)], "pid int, pred string"
    ).repartition(len(preds), "pid")

    def fetch(batches):
        import duckdb as _dd

        for pdf in batches:
            for pred in pdf["pred"]:
                c = _dd.connect(db_path, read_only=True)
                try:
                    tbl = c.sql(
                        f"SELECT * FROM ({query}) WHERE {pred}").arrow()
                finally:
                    c.close()
                if tbl.num_rows:
                    yield tbl.to_pandas()

    return stripes.mapInPandas(fetch, schema=schema)
