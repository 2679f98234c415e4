"""Near-real-time (NRT) incremental indexing via Structured Streaming.

The reference's "streaming" model (SURVEY §2.11) is NRT segment
visibility, not event-time processing:

  reference                                  this engine
  ---------                                  -----------
  IndexWriter NRT flush: buffered docs       one micro-batch ->
    become a new searchable segment            build_segment_index append
    (DocumentsWriterPerThread flush)           of fresh segments
  soft commit / searcher reopen              SegmentIndex.refresh() picks
    (SearcherManager.maybeRefresh)             up new meta rows
  hard commit + transaction log replay       Spark streaming checkpoint +
    (UpdateLog.java:79-152)                    idempotent batch append
                                               (lineage tag dedupes
                                                replayed batches)
  CommitTracker auto-commit intervals        trigger(processingTime=...)
  DaemonStream re-run loop                   the streaming query itself

Exactly-once contract: foreachBatch may replay a batch after a
failure; append_batch records ``batch:<id>`` in every produced meta
row's lineage column and skips batches already present — the replay
becomes a no-op, so the index never double-counts documents (the
UpdateLog version-check analogue).

Scale notes: each micro-batch is an independent bounded append — the
same salted shuffle and FOR-encode path as the batch build, producing
seg_size-bounded segments. Background maybe_merge() (merge.py) keeps
the segment count tiered as batches accumulate, exactly the
NRT-flush-then-merge lifecycle of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lucene_solr_spark.index.segments import (
    DEFAULT_SALT_SPAN,
    DEFAULT_SEG_SIZE,
    SegmentIndex,
    build_segment_index,
)


def _index_state(spark: SparkSession, path: str) -> tuple[int, int, set[str]]:
    """(next_docid, next_seg_id, seen lineage tags) from segments_meta.

    Lineage columns hold comma-separated tokens: a fresh NRT segment
    carries its ``batch:<id>`` tag; a merged segment carries its member
    seg-ids PLUS the members' inherited batch tags (merge.py) — so a
    batch stays deduplicated even after its segments merged away."""
    from lucene_solr_spark.index.segments import read_segments_meta

    meta = read_segments_meta(spark, path)
    if meta is None:
        return 0, 0, set()
    rows = meta.select("seg_id", "doc_base", "doc_count", "merged_from").collect()
    if not rows:
        return 0, 0, set()
    next_docid = max(int(r["doc_base"]) + int(r["doc_count"]) for r in rows)
    next_seg = max(int(r["seg_id"]) for r in rows) + 1
    tags = {t for r in rows if r["merged_from"]
            for t in str(r["merged_from"]).split(",") if t}
    return next_docid, next_seg, tags


def append_batch(
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    key_col: str = "url",
    text_col: str = "text",
    seg_size: int = DEFAULT_SEG_SIZE,
    salt_span: int = DEFAULT_SALT_SPAN,
) -> SegmentIndex | None:
    """Append one micro-batch as fresh segments. Idempotent per
    batch_id: a replayed batch (streaming restart) is skipped."""
    spark = batch_df.sparkSession
    tag = f"batch:{batch_id}"
    next_docid, next_seg, tags = _index_state(spark, path)
    if tag in tags:
        return None  # replay after checkpoint recovery — already applied
    if batch_df.isEmpty():
        return None
    return build_segment_index(
        batch_df, path, key_col=key_col, text_col=text_col,
        seg_size=seg_size, salt_span=salt_span,
        docid_offset=next_docid, seg_id_offset=next_seg, lineage=tag)


def index_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str = "url",
    text_col: str = "text",
    seg_size: int = DEFAULT_SEG_SIZE,
    salt_span: int = DEFAULT_SALT_SPAN,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start continuous indexing of a streaming DataFrame of pages.

    trigger: kwargs for DataStreamWriter.trigger (e.g.
    {"availableNow": True} to drain, {"processingTime": "30 seconds"}
    for a commit cadence — the CommitTracker analogue).
    """

    def sink(df: DataFrame, batch_id: int) -> None:
        append_batch(df, path, batch_id, key_col=key_col, text_col=text_col,
                     seg_size=seg_size, salt_span=salt_span)

    w = (stream_df.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint))
    if trigger:
        w = w.trigger(**trigger)
    return w.start()


# --- TopicStream: checkpointed pub-sub over the index ------------------------

_TOPIC_STATE = "topic_state_v"


class Topic:
    """TopicStream (solr/solrj/src/java/org/apache/solr/client/solrj/
    io/stream/TopicStream.java): a durable SUBSCRIPTION over an index —
    each poll returns the query's matches that arrived since the last
    committed checkpoint, and commit() durably advances it, so a
    restarted subscriber resumes where it left off (the reference
    persists per-shard version checkpoints to a collection; here the
    checkpoint is a docid watermark — docids are assigned monotonically
    by construction, the _version_ analogue).

    poll() is a snapshot read: it filters (watermark, next_docid) on
    the match frame — a plain Column range predicate that reaches the
    scan — and remembers the snapshot's high end; commit() makes it
    durable (dir + _SUCCESS, the manifest protocol). Poll-without-
    commit replays on the next poll, exactly the reference's
    at-least-once delivery. DaemonStream's re-run loop is the caller's
    trigger (or index_stream's streaming query) — documented
    substitution."""

    def __init__(self, searcher, q, state_path: str):
        self._searcher = searcher
        self._q = q
        self._state = state_path
        self._pending: int | None = None

    def _spark(self) -> SparkSession:
        return self._searcher.si.spark if hasattr(self._searcher, "si") \
            else self._searcher.index.docs.sparkSession

    def _read_watermark(self) -> int:
        from lucene_solr_spark.index.segments import _hadoop_fs

        spark = self._spark()
        fs, jvm = _hadoop_fs(spark, self._state)
        p = jvm.org.apache.hadoop.fs.Path(self._state)
        if not fs.exists(p):
            return 0
        best = 0
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if not name.startswith(_TOPIC_STATE):
                continue
            if fs.exists(jvm.org.apache.hadoop.fs.Path(
                    f"{self._state}/{name}/_SUCCESS")):
                best = max(best, int(name[len(_TOPIC_STATE):]))
        return best

    def _next_docid(self) -> int:
        if hasattr(self._searcher, "si"):
            self._searcher.si.refresh()
            rows = self._searcher.si.meta.select(
                "doc_base", "doc_count").collect()
            return max((int(r["doc_base"]) + int(r["doc_count"])
                        for r in rows), default=0)
        d = self._searcher.index.docs
        row = d.agg(F.max("docid").alias("m")).first()
        return (int(row["m"]) + 1) if row["m"] is not None else 0

    def poll(self) -> DataFrame:
        """Matches with watermark <= docid < snapshot high (the
        watermark is the first UNSEEN docid); the high end is
        remembered for commit()."""
        lo = self._read_watermark()
        hi = self._next_docid()
        self._pending = hi
        return (self._searcher.matches(self._q)
                .where((F.col("docid") >= lo) & (F.col("docid") < hi)))

    def commit(self) -> None:
        """Durably advance the checkpoint to the last poll's snapshot."""
        if self._pending is None:
            raise ValueError("commit() without a poll()")
        from lucene_solr_spark.index.segments import _hadoop_fs

        spark = self._spark()
        fs, jvm = _hadoop_fs(spark, self._state)
        gen_dir = f"{self._state}/{_TOPIC_STATE}{self._pending}"
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(gen_dir))
        fs.create(jvm.org.apache.hadoop.fs.Path(f"{gen_dir}/_SUCCESS"),
                  True).close()
        self._pending = None
