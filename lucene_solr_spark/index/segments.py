"""Segment-structured index build (SURVEY §7 Milestone 2).

Lucene's write path (EP1, SURVEY §3) re-expressed as one declarative
DataFrame pipeline:

  reference                               this engine
  ---------                               -----------
  DWPT: one thread owns one in-RAM        one segment = one contiguous
    segment (DocumentsWriterPerThread)      docid range; built by a
                                            groupBy shuffle keyed on seg_id
  FreqProxTermsWriter.flush sort + codec  two-stage salted aggregation ->
    (FreqProxTermsWriter.java:82-103)       encode_posting in an Arrow UDF
  Lucene50PostingsWriter FOR blocks +     codec.py (128-int FOR blocks,
    skip + our block-max extension          skip offsets, blockmax cols)
  .nvd norms file                         per-segment norms blob (one
    (Lucene70NormsFormat)                   binary row, index = docid-base)
  SegmentInfos (segments_N)               segments_meta parquet table with
                                            lineage + metrics per segment
  flush checkpoint / resumability         completed-segment manifest: a
                                            re-run builds only segments
                                            missing from segments_meta

Scale design (the part that must survive 10^12 docs / 1000 executors):

- **Contiguous docid ranges per segment.** seg_id = docid // seg_size.
  Tie-breaks are global-docid ordered, merges of adjacent segments
  need NO docid rebasing (concatenation in docbase order is already
  sorted), and the per-segment norms "file" is a dense array.
- **Salted two-stage aggregation for Zipf skew** (north rule). Stage 1
  groups by (seg_id, term, salt) where salt = in-segment docid range
  bucket: a hot term's postings are combined by many reducers, each
  producing a sorted chunk. Stage 2 groups by (seg_id, term) over the
  ~seg_size/salt_span chunk rows and concatenates chunks in salt
  order — already globally sorted because salt buckets partition the
  docid space in order. Both stages are map-side combinable hash
  aggregations; no single reducer ever sees one row per posting of a
  hot term.
- **Postings written partitioned by seg_id, sorted by term** so a
  query-term lookup prunes to one directory and row-group min/max
  stats prune within it (the FST term-dictionary seek of
  codecs/blocktree/ becomes free storage-level pruning).
- **No driver-side data paths**: the only collect() is the tiny
  per-segment metrics aggregate (one row per segment).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables, analyzed_frame
from lucene_solr_spark.index.codec import (
    POSTING_ROW_SCHEMA,
    encode_posting,
    posting_to_row,
)
from lucene_solr_spark.index.docid import assign_doc_ids

DEFAULT_SEG_SIZE = 1 << 16          # docs per segment (tests use smaller)
DEFAULT_SALT_SPAN = 1 << 10         # docids per salt bucket within a segment

POSTINGS_SCHEMA = "seg_id int, term string, " + POSTING_ROW_SCHEMA

META_SCHEMA = (
    "seg_id int, doc_base long, doc_count long, sum_doclen long, "
    "term_count long, posting_rows long, max_df long, "
    "input_rows long, build_wall_s double, built_at double, "
    "salt_span int, seg_size int, merged_from string"
)


@dataclass
class SegmentIndex:
    """Handle over an on-disk segment index (read side).

    segments_meta is the commit point (the ``segments_N`` analogue,
    index/SegmentInfos.java): after a merge, superseded segments'
    files may still exist on disk, so postings/norms reads are
    filtered to the live segment set — the snapshot-isolation role an
    Iceberg catalog would play in a real deployment.
    """

    path: str
    spark: SparkSession

    def __post_init__(self):
        self._live: list[int] | None = None

    def live_segments(self) -> list[int]:
        if self._live is None:
            self._live = sorted(
                int(r["seg_id"])
                for r in self.meta.select("seg_id").distinct().collect())
        return self._live

    def refresh(self) -> None:
        """Drop the cached segment list (SearcherManager.maybeRefresh)."""
        self._live = None

    @property
    def postings(self) -> DataFrame:
        df = self.spark.read.parquet(f"{self.path}/postings")
        return df.where(F.col("seg_id").isin(self.live_segments()))

    @property
    def docs(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/docs")

    @property
    def norms(self) -> DataFrame:
        df = self.spark.read.parquet(f"{self.path}/norms")
        return df.where(F.col("seg_id").isin(self.live_segments()))

    @property
    def meta(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/segments_meta")

    @property
    def term_stats(self) -> DataFrame:
        """Global (term, df, ttf) — aggregated across segments, the
        cross-segment term dictionary statistics (TermStatistics)."""
        return self.postings.groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))

    def coll_stats(self) -> dict:
        row = self.meta.agg(
            F.sum("doc_count").alias("n"), F.sum("sum_doclen").alias("s")
        ).collect()[0]
        return {"doc_count": int(row["n"]), "sum_ttf": int(row["s"])}

    def as_flat_tables(self) -> IndexTables:
        """Adapter: view the segment index through the flat-index API
        (decodes postings on the fly) — used by dueling tests."""
        from lucene_solr_spark.index.codec import posting_from_row

        def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lucene_solr_spark.index.codec import decode_posting
            for pdf in batches:
                terms, docids, tfs = [], [], []
                for i in range(len(pdf)):
                    row = pdf.iloc[i]
                    ep = posting_from_row(row)
                    d, t = decode_posting(ep)
                    terms.extend([row["term"]] * len(d))
                    docids.append(d)
                    tfs.append(t)
                if terms:
                    yield pd.DataFrame({
                        "term": terms,
                        "docid": np.concatenate(docids),
                        "tf": np.concatenate(tfs).astype(np.int32),
                    })

        flat = self.postings.mapInPandas(explode, schema="term string, docid long, tf int")
        docs = self.docs
        return IndexTables(
            docs=docs,
            postings=flat,
            term_stats=self.term_stats,
            coll_stats=self.coll_stats(),
        )


# --- build ------------------------------------------------------------------


def _encode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched encoder: rows of (seg_id, term, docids, tfs,
    norms) arrays -> encoded posting rows. This is the
    Lucene50PostingsWriter stage, vectorized numpy per posting;
    iteration is column-wise (pandas row access is 10x slower)."""
    for pdf in batches:
        out = []
        it = zip(pdf["seg_id"].to_numpy(), pdf["term"].to_numpy(),
                 pdf["docids"].to_numpy(), pdf["tfs"].to_numpy(),
                 pdf["norms"].to_numpy())
        for seg_id, term, docids, tfs, norms in it:
            tfs = np.asarray(tfs, dtype=np.int64)
            ep = encode_posting(np.asarray(docids, dtype=np.int64), tfs,
                                np.asarray(norms, dtype=np.int64))
            row = posting_to_row(ep, ttf=int(tfs.sum()))
            row["seg_id"] = int(seg_id)
            row["term"] = term
            out.append(row)
        if out:
            yield pd.DataFrame(out)


def build_segment_index(
    pages: DataFrame,
    path: str,
    key_col: str = "url",
    text_col: str = "text",
    seg_size: int = DEFAULT_SEG_SIZE,
    salt_span: int = DEFAULT_SALT_SPAN,
    resume: bool = False,
    precomputed_docid: str | None = None,
    docid_offset: int = 0,
    seg_id_offset: int = 0,
    lineage: str = "",
) -> SegmentIndex:
    """Build (or resume building) a segment-structured index at ``path``.

    Resume contract (north rule): segment builds are idempotent and
    docid assignment is deterministic, so a re-run after a mid-build
    failure recomputes docids, drops segments already present in
    segments_meta, and builds only the missing ranges. The final index
    is byte-identical to a single-shot build (tested).

    ``docid_offset`` / ``seg_id_offset`` / ``lineage`` support
    incremental (NRT) appends — see streaming/nrt.py: a micro-batch
    becomes fresh segments whose docid range starts after the existing
    index and whose meta rows carry the batch lineage tag.
    """
    spark = pages.sparkSession
    t0 = time.time()

    # project to the columns the build touches BEFORE the docid range
    # shuffle — at webtext scale the html blobs dominate row size and
    # must not ride through the sort (column pruning by hand here;
    # Catalyst can't prune through the id-assigning mapInPandas).
    cols = list(dict.fromkeys(
        [key_col, text_col] + ([precomputed_docid] if precomputed_docid else [])))
    slim = pages.select(*cols)
    if precomputed_docid:
        base = slim.withColumn("docid", F.col(precomputed_docid).cast("long"))
    else:
        base = assign_doc_ids(slim, key=key_col)
        if docid_offset:
            base = base.withColumn("docid", F.col("docid") + F.lit(docid_offset))
    base = base.withColumn(
        "seg_id",
        (F.lit(seg_id_offset)
         + ((F.col("docid") - F.lit(docid_offset)) / F.lit(seg_size)).cast("int")))

    done: set[int] = set()
    if resume:
        done = completed_segments(spark, path)
        if done:
            base = base.where(~F.col("seg_id").isin(sorted(done)))
    appending = bool(done) or docid_offset > 0 or seg_id_offset > 0

    base = base.persist()
    n_input = base.count()
    if n_input == 0:
        base.unpersist()
        return SegmentIndex(path=path, spark=spark)

    # --- one fused analyze+invert scan; everything derives from it ------
    af = (analyzed_frame(base, key_col=key_col, text_col=text_col,
                         with_positions=False)
          .withColumn("seg_id", F.lit(seg_id_offset)
                      + ((F.col("docid") - F.lit(docid_offset))
                         / F.lit(seg_size)).cast("int"))
          .persist())

    docs = af.select("seg_id", "docid", "url", "doclen", "norm_byte").persist()

    (docs.repartition("seg_id")
         .sortWithinPartitions("docid")
         .write.partitionBy("seg_id")
         .mode("append" if appending else "overwrite")
         .parquet(f"{path}/docs"))

    # per-segment dense norms blob: index = docid - doc_base
    def pack_norms(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("docid")
        doc_base = int(pdf["docid"].iloc[0])
        blob = pdf["norm_byte"].to_numpy(dtype=np.int64).astype(np.uint8).tobytes()
        lens = pdf["doclen"].to_numpy(dtype=np.int32)
        return pd.DataFrame({
            "seg_id": [int(key[0])], "doc_base": [doc_base],
            "doc_count": [len(pdf)], "norms": [blob],
            "doclens": [lens],
        })

    norms = docs.groupBy("seg_id").applyInPandas(
        pack_norms,
        schema="seg_id int, doc_base long, doc_count long, norms binary, "
               "doclens array<int>")
    (norms.write.partitionBy("seg_id")
          .mode("append" if appending else "overwrite")
          .parquet(f"{path}/norms"))

    # --- postings (the .doc/.tim side) -----------------------------------
    # one row per (doc, distinct term), already tf-combined in the
    # analysis pass — no token-granularity shuffle anywhere.
    z = af.select(
        "seg_id", "docid", "norm_byte",
        F.explode(F.arrays_zip(
            F.col("terms").alias("term"), F.col("tfs").alias("tf"))).alias("z"),
    )
    with_norm = z.select(
        "seg_id", "docid", "norm_byte",
        F.col("z.term").alias("term"), F.col("z.tf").alias("tf"))

    salt = (((F.col("docid") - F.lit(docid_offset)) % F.lit(seg_size))
            / F.lit(salt_span)).cast("int")

    # stage 1: per-salt sorted chunks (map-side combinable; bounds the
    # reduce-side concentration of Zipf-hot terms to one chunk row per
    # salt bucket instead of one row per posting).
    chunks = (
        with_norm.withColumn("salt", salt)
        .groupBy("seg_id", "term", "salt")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("docid"), F.col("tf"), F.col("norm_byte")))).alias("chunk"))
    )

    # stage 2: concat chunks in salt order -> full sorted posting arrays
    grouped = (
        chunks.groupBy("seg_id", "term")
        .agg(F.flatten(F.array_sort(F.collect_list(F.struct(
            F.col("salt"), F.col("chunk"))))["chunk"]).alias("postings"))
        .select(
            "seg_id", "term",
            F.col("postings.docid").alias("docids"),
            F.col("postings.tf").alias("tfs"),
            F.col("postings.norm_byte").alias("norms"),
        )
    )

    encoded = grouped.mapInPandas(_encode_rows, schema=POSTINGS_SCHEMA)
    (encoded.repartition("seg_id")
            .sortWithinPartitions("term")
            .write.partitionBy("seg_id")
            .mode("append" if appending else "overwrite")
            .parquet(f"{path}/postings"))

    # --- segment infos: lineage + metrics (north rule) --------------------
    seg_doc = docs.groupBy("seg_id").agg(
        F.min("docid").alias("doc_base"),
        F.count(F.lit(1)).alias("doc_count"),
        F.sum("doclen").alias("sum_doclen"),
    )
    post_read = spark.read.parquet(f"{path}/postings")
    if done:
        post_read = post_read.where(~F.col("seg_id").isin(sorted(done)))
    seg_post = post_read.groupBy("seg_id").agg(
        F.count(F.lit(1)).alias("term_count"),
        F.count(F.lit(1)).alias("posting_rows"),
        F.max("df").alias("max_df"),
    )
    wall = time.time() - t0
    meta = (
        seg_doc.join(seg_post, "seg_id", "left")
        .withColumn("input_rows", F.col("doc_count"))
        .withColumn("build_wall_s", F.lit(round(wall, 3)))
        .withColumn("built_at", F.lit(time.time()))
        .withColumn("salt_span", F.lit(salt_span))
        .withColumn("seg_size", F.lit(seg_size))
        .withColumn("merged_from", F.lit(lineage))
        .select([f.split(" ")[0] for f in META_SCHEMA.split(", ")])
    )
    meta.write.mode("append" if appending else "overwrite").parquet(f"{path}/segments_meta")

    docs.unpersist()
    af.unpersist()
    base.unpersist()
    return SegmentIndex(path=path, spark=spark)


def completed_segments(spark: SparkSession, path: str) -> set[int]:
    """Segments already durably built (present in segments_meta with a
    matching postings partition) — the resume manifest."""
    try:
        meta = spark.read.parquet(f"{path}/segments_meta")
    except Exception:
        return set()
    return {int(r["seg_id"]) for r in meta.select("seg_id").distinct().collect()}
