"""spark-submit entry point for the index build (north-rule evidence).

Usage (the two-cluster-size protocol, BASELINE.md):

  spark-submit --master local[4]  --py-files lss.zip scripts/build_job.py \
      --input /tmp/bench_pages_500000 --output /tmp/idx4 --seg-size 65536
  spark-submit --master local[16] --py-files lss.zip scripts/build_job.py \
      --input /tmp/bench_pages_500000 --output /tmp/idx16 --seg-size 65536

where lss.zip is the packaged library:
  (cd /root/repo && zip -qr /tmp/lss.zip lucene_solr_spark)

On a real cluster the master/--num-executors come from spark-submit;
the script only reads the already-created session. Prints one JSON
line: {"docs": N, "build_sec": S, "docs_per_sec": R, "segments": K}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet directory")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--seg-size", type=int, default=1 << 16)
    ap.add_argument("--salt-span", type=int, default=1 << 10)
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-positions", action="store_true",
                    help="index DOCS_AND_FREQS only (skip the .pos stream)")
    ap.add_argument("--offsets", action="store_true",
                    help="also store char offsets (the .pay analogue; "
                         "enables offset-based highlighting)")
    ap.add_argument("--fresh", action="store_true",
                    help="delete any existing output first")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.index.segments import build_segment_index

    if args.fresh:
        shutil.rmtree(args.output, ignore_errors=True)

    pages = spark.read.parquet(args.input)
    t0 = time.time()
    si = build_segment_index(
        pages, args.output, key_col=args.key_col, text_col=args.text_col,
        seg_size=args.seg_size, salt_span=args.salt_span, resume=args.resume,
        store_positions=not args.no_positions,
        store_offsets=args.offsets)
    dt = time.time() - t0
    stats = si.coll_stats()
    print(json.dumps({
        "docs": stats["doc_count"],
        "build_sec": round(dt, 2),
        "docs_per_sec": round(stats["doc_count"] / dt, 1),
        "segments": len(si.live_segments()),
        "cores": spark.sparkContext.defaultParallelism,
    }))


if __name__ == "__main__":
    main()
