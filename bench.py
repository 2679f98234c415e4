"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "index_build": {...}, "scaling": {...}}

Measures, per BASELINE.md's in-sandbox protocol:
1. index-build docs/sec over the deterministic synthetic webtext
   corpus (FIXTURES.md §1) at $SPARK_GRAFT_CPUS cores;
2. BM25 top-10 query latency/throughput over the $SPARK_GRAFT_SF_DIR
   documents table (high/med/low-df terms + boolean AND/OR, the
   query-terms.txt shapes) — both one-job-per-query latency and a
   single batched job (the realistic Spark serving model);
3. N vs 4N scaling efficiency: the same build at local[N] and
   local[4N]; efficiency = (T_N / T_4N) / 4.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_DOCS (default 40000),
BENCH_SCALING (default 1; 0 skips phase 3), BENCH_SCALING_DOCS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _fresh_spark(cores: int):
    from lucene_solr_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                      shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _build_corpus_index(spark, n_docs: int):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.sources.webtext import synth_pages

    pages = synth_pages(spark, n_docs)
    idx = build_index(pages)
    # materialize everything the way a real build job would: write the
    # posting + docs tables (to local tmp parquet standing in for the
    # Iceberg sink).
    t0 = time.time()
    out = f"/tmp/bench_index_{n_docs}_{spark.sparkContext.applicationId}"
    from lucene_solr_spark.index.builder import write_index

    write_index(idx, out, term_buckets=spark.sparkContext.defaultParallelism)
    dt = time.time() - t0
    return idx, dt, out


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from lucene_solr_spark.driver_surface import _docs_index
    from lucene_solr_spark.search.executor import Searcher

    t0 = time.time()
    idx = _docs_index(spark, sf_dir)
    setup = time.time() - t0
    s = Searcher(idx, mode="lucene")

    qset = {
        "q_term_high": "join",
        "q_term_med": "vector",
        "q_term_low": "dup",
        "q_and2": "hash AND join",
        "q_and3": "hash AND join AND merge",
        "q_or2": "scan OR slow",
        "q_or3": "scan OR slow OR merge",
        "q_andor": "(hash AND join) OR merge",
        "q_phrase": '"hash join"',
    }
    times: dict[str, float] = {"index_setup": round(setup, 3)}
    for name, q in qset.items():
        t0 = time.time()
        s.search(q, k=10).collect()
        times[name] = round(time.time() - t0, 3)

    # batched: all queries in one job (union of top-k frames)
    from functools import reduce
    from pyspark.sql import functions as F

    t0 = time.time()
    frames = [s.search(q, k=10).withColumn("q", F.lit(n)) for n, q in qset.items()]
    reduce(lambda a, b: a.unionByName(b), frames).collect()
    times["batched_all"] = round(time.time() - t0, 3)
    return times


def bench_build(spark, n_docs: int) -> dict:
    t0 = time.time()
    _, write_s, path = _build_corpus_index(spark, n_docs)
    total = time.time() - t0
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return {"n_docs": n_docs, "build_sec": round(total, 2),
            "docs_per_sec": round(n_docs / total, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "40000"))
    do_scaling = os.environ.get("BENCH_SCALING", "1") != "0"
    scaling_docs = int(os.environ.get("BENCH_SCALING_DOCS", str(n_docs // 2)))

    result: dict = {"metric": "index-build docs/sec + BM25 top-10 q/s",
                    "unit": "sec", "sf": sf_dir, "cpus": cpus}

    t_all = time.time()
    spark = _fresh_spark(cpus)
    result["index_build"] = bench_build(spark, n_docs)
    result["queries"] = bench_queries(spark, sf_dir)
    spark.stop()

    if do_scaling:
        small = max(cpus // 4, 2)
        timings = {}
        for c in (small, cpus):
            spark = _fresh_spark(c)
            b = bench_build(spark, scaling_docs)
            timings[c] = b["build_sec"]
            spark.stop()
        speedup = timings[small] / timings[cpus]
        result["scaling"] = {
            "n_cores": small, "four_n_cores": cpus,
            "t_n_sec": timings[small], "t_4n_sec": timings[cpus],
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (cpus / small), 3),
            "docs": scaling_docs,
        }

    result["value"] = round(time.time() - t_all, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
