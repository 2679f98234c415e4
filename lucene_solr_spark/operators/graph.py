"""Graph traversal expressions (solr/solrj/src/java/org/apache/solr/
client/solrj/io/graph/): GatherNodesStream is expressed inline as
iterative joins (driver_surface_ext._gather_nodes); this module adds
the ShortestPathStream analogue.

Spark-first shape: BFS by frontier expansion — each hop is ONE
hash join frontier x edges plus an anti-join against the visited set,
all DataFrame ops (the reference walks hops the same way, one
distributed /export query per hop, ShortestPathStream.java:312-420).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_path_levels(edges: DataFrame, src, max_hops: int,
                         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Min-distance BFS from ``src``: returns (node, dist) for every
    node reachable within ``max_hops`` hops (dist = 0 for the source —
    the unweighted shortest-path distances ShortestPathStream derives
    its paths from).

    Each hop: frontier ⋈ edges (hash join on the edge key), dedup,
    anti-join the visited set — no driver-side adjacency, no
    collect(); the frontier is persisted per hop so the iterative
    lineage doesn't recompute previous hops.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    visited = spark.createDataFrame([(src, 0)], "node long, dist int").persist()
    frontier = visited
    handles = [visited]
    for d in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier.node == e._s)
               .select(F.col("_d").alias("node")).distinct()
               .join(visited, "node", "left_anti")
               .withColumn("dist", F.lit(d))
               .persist())
        if nxt.isEmpty():
            nxt.unpersist()
            break
        visited = visited.unionByName(nxt).persist()
        handles += [nxt, visited]
        frontier = nxt
    # materialize the result once (cuts the iterative lineage), then
    # release every per-hop cache
    out = visited.localCheckpoint(eager=True)
    for h in handles:
        h.unpersist()
    return out


def shortest_paths(edges: DataFrame, src, max_hops: int,
                   src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """BFS shortest paths WITH the path tuples (node, dist,
    path array<long>) — the full ShortestPathStream surface
    (solr/solrj/.../io/graph/ShortestPathStream.java:312-420 tracks
    path tuples per frontier node the same way).

    One shortest path per node; ties broken deterministically by
    lexicographic minimum over the path arrays (equivalent to minimum
    predecessor chain, since all min-dist paths to a node have equal
    length). Each hop: frontier x edges hash join, per-node min-path
    aggregation, anti-join against visited — no driver-side adjacency,
    no collect(); frontier rows carry O(dist) path entries (bounded by
    ``max_hops``, as the reference bounds maxDepth).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    visited = spark.createDataFrame(
        [(src, 0, [src])], "node long, dist int, path array<bigint>").persist()
    frontier = visited
    handles = [visited]
    for d in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier.node == e._s)
               .select(F.col("_d").alias("node"),
                       F.concat("path", F.array(F.col("_d"))).alias("path"))
               .groupBy("node").agg(F.min("path").alias("path"))
               .join(visited, "node", "left_anti")
               .withColumn("dist", F.lit(d))
               .select("node", "dist", "path")
               .persist())
        if nxt.isEmpty():
            nxt.unpersist()
            break
        visited = visited.unionByName(nxt).persist()
        handles += [nxt, visited]
        frontier = nxt
    out = visited.localCheckpoint(eager=True)
    for h in handles:
        h.unpersist()
    return out
