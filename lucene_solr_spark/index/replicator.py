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


# --- CDCR: checkpointed cross-cluster log-shipping loop ---------------------

_CDCR_STATE = "cdcr_state_v"


def _cdcr_read_checkpoint(spark, state_path: str) -> int:
    """Last source manifest generation applied at the target (-1 =
    never bootstrapped). Checkpoints follow the same
    create-directory-then-_SUCCESS protocol as manifest generations."""
    from lucene_solr_spark.index.segments import _hadoop_fs

    fs, jvm = _hadoop_fs(spark, state_path)
    p = jvm.org.apache.hadoop.fs.Path(state_path)
    if not fs.exists(p):
        return -1
    best = -1
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not name.startswith(_CDCR_STATE):
            continue
        ok = jvm.org.apache.hadoop.fs.Path(
            f"{state_path}/{name}/_SUCCESS")
        if fs.exists(ok):
            best = max(best, int(name[len(_CDCR_STATE):]))
    return best


def cdcr_replicate(src: SegmentIndex, dst_path: str,
                   state_path: str) -> dict:
    """One round of CDCR (solr/core/src/java/org/apache/solr/handler/
    CdcrReplicator.java + CdcrUpdateLogSynchronizer: the source
    forwards committed updates to the target cluster asynchronously;
    a persisted CHECKPOINT records the last-forwarded position so
    forwarding resumes across failures and restarts, and replay is
    idempotent).

    This engine ships committed SEGMENTS instead of tlog entries (the
    segment manifest generation is the log position — updates only
    ever arrive as new committed segments, NRT appends included, and
    streaming replay dedup rides the manifests' ``batch:`` lineage
    tokens): read the checkpoint, no-op if the source's newest
    committed generation is already applied, else run the incremental
    replicate() (immutable segment dirs; atomic manifest flip at the
    target) and durably advance the checkpoint. Crash between
    replicate() and the checkpoint write re-ships nothing on rerun
    (replicate is idempotent) and re-commits an identical manifest —
    the reference's replay-idempotence contract.

    Returns {'generation', 'applied', 'copied', 'skipped'}.
    """
    from lucene_solr_spark.index.segments import (_hadoop_fs,
                                                  meta_generations)

    spark = src.spark
    gens = meta_generations(spark, src.path)
    if not gens:
        raise ValueError(f"source {src.path!r} has no committed manifest")
    src_gen = gens[-1]
    applied = _cdcr_read_checkpoint(spark, state_path)
    if src_gen <= applied:
        return {"generation": src_gen, "applied": False,
                "copied": [], "skipped": []}
    out = replicate(src, dst_path)
    # durable checkpoint advance (create dir, then _SUCCESS marker)
    fs, jvm = _hadoop_fs(spark, state_path)
    gen_dir = f"{state_path}/{_CDCR_STATE}{src_gen}"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(gen_dir))
    fs.create(jvm.org.apache.hadoop.fs.Path(f"{gen_dir}/_SUCCESS"),
              True).close()
    return {"generation": src_gen, "applied": True, **out}


def split_index(src: SegmentIndex, dst_path: str,
                seg_ids: list[int]) -> dict:
    """IndexSplitter (lucene/misc/src/java/org/apache/lucene/index/
    IndexSplitter.java): carve selected WHOLE segments out of an index
    into a new standalone index — the reference copies the chosen
    segments' files and writes a segments_N referencing only them;
    docids never remap (segment immutability, the same argument
    replicate() leans on). The destination gets the source manifest
    filtered to ``seg_ids`` committed as its first generation.

    Scale: per-segment directory copies (server-side on HDFS/S3 via
    FileUtil.copy) + one O(segments) manifest write — no data-plane
    Spark job at all."""
    spark: SparkSession = src.spark
    fs, jvm = _hadoop_fs(spark, src.path)
    conf = spark._jsc.hadoopConfiguration()

    meta_rows = src.meta.collect()
    meta_schema = src.meta.schema
    live = {int(r["seg_id"]) for r in meta_rows}
    want = sorted(set(int(s) for s in seg_ids))
    missing = [s for s in want if s not in live]
    if missing:
        raise ValueError(f"split_index: segments {missing} are not "
                         f"live in {src.path} (live: {sorted(live)})")
    for sid in want:
        for sub in _SUBDIRS:
            sp = jvm.org.apache.hadoop.fs.Path(
                f"{src.path}/{sub}/seg_id={sid}")
            if fs.exists(sp):
                _copy_dir(fs, jvm, conf,
                          f"{src.path}/{sub}/seg_id={sid}",
                          f"{dst_path}/{sub}/seg_id={sid}")
    keep = [r for r in meta_rows if int(r["seg_id"]) in set(want)]
    commit_segments_meta(spark.createDataFrame(keep, meta_schema),
                         dst_path)
    return {"segments": want}
