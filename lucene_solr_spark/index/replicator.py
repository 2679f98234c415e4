"""Index replication — the lucene/replicator module re-expressed for
the segment store (lucene/replicator/src/java/org/apache/lucene/
replicator/IndexReplicationHandler.java + IndexRevision.java):

  IndexRevision (files of a commit)   the live segment set of the
                                      source's newest committed
                                      manifest generation
  SessionToken diff                   segments present at the source
                                      but absent at the replica
  copy + sync + commit                per-segment directory copy
                                      (docs/norms/postings[/docvalues]
                                      partitions), then an atomic
                                      manifest commit on the replica

Correct by the same argument as the reference: segment files are
IMMUTABLE once committed (merges mint fresh seg_ids), so a replica
only ever COPIES whole new segment dirs and re-commits the manifest —
no in-place mutation, and a reader on the replica flips atomically at
the manifest commit. Copies are driver-orchestrated file ops
(O(new segments) directory copies); on object storage this is a
server-side copy per file.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from lucene_solr_spark.index.segments import (
    SegmentIndex,
    _hadoop_fs,
    commit_segments_meta,
    read_segments_meta,
)

_SUBDIRS = ("docs", "norms", "postings", "docvalues")


def _copy_dir(fs, jvm, conf, src: str, dst: str) -> None:
    sp = jvm.org.apache.hadoop.fs.Path(src)
    dp = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.exists(sp):
        return
    jvm.org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs, dp, False, True, conf)


def replicate(src: SegmentIndex, dst_path: str) -> dict:
    """One replication round: copy segments the replica lacks, then
    commit the source's manifest at the replica. Idempotent and
    incremental — returns {'copied': [...], 'skipped': [...]}.
    """
    spark: SparkSession = src.spark
    fs, jvm = _hadoop_fs(spark, src.path)
    conf = spark._jsc.hadoopConfiguration()

    # Freeze ONE revision up front (IndexRevision's frozen file list):
    # both the copy list and the manifest committed at the replica
    # derive from this single collected snapshot. Reading the live
    # manifest twice (live_segments() for the copy list, src.meta at
    # commit time) would race a concurrent committer — the replica's
    # manifest could reference segment dirs that were never copied.
    meta_rows = src.meta.collect()
    meta_schema = src.meta.schema
    live = sorted({int(r["seg_id"]) for r in meta_rows})
    dst_meta = read_segments_meta(spark, dst_path)
    have = (set() if dst_meta is None else
            {int(r["seg_id"]) for r in dst_meta.select("seg_id").collect()})

    copied, skipped = [], []
    for sid in live:
        if sid in have:
            skipped.append(sid)
            continue
        for sub in _SUBDIRS:
            _copy_dir(fs, jvm, conf,
                      f"{src.path}/{sub}/seg_id={sid}",
                      f"{dst_path}/{sub}/seg_id={sid}")
        copied.append(sid)

    # commit the FROZEN revision's manifest as the replica's next
    # generation — the revision flip; readers on the replica see
    # old-or-new, never a mix (generational manifest + _SUCCESS), and
    # never a manifest row whose segment dir wasn't copied above.
    commit_segments_meta(spark.createDataFrame(meta_rows, meta_schema),
                         dst_path)
    return {"copied": copied, "skipped": skipped}
