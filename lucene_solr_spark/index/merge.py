"""TieredMergePolicy port + distributed segment merge (M4).

Reference: index/TieredMergePolicy.java (defaults at lines 81-88,
budget at 291-342, candidate scoring at 383-492) and
index/SegmentMerger.java / DocIDMerger.java for execution. The policy
below is re-derived from that spec; the execution is a Spark job, not
a translation.

Design deviation (and why): Lucene merges arbitrary segment subsets
and REMAPS docids (DocIDMerger). Our segments own contiguous global
docid ranges (segments.py), so we restrict candidates to doc_base-
adjacent runs: a merged segment is again a contiguous range, docids
never change (rank tie-breaks stay stable forever), the merged norms
blob is a plain concatenation, and the merge job is a pure
groupBy(term) re-encode with zero remapping. Tiered size-budget
semantics are preserved; only the candidate enumeration is
restricted — at webtext scale segments are built from contiguous
docid ranges anyway, so adjacent runs are exactly the natural merge
candidates.

Merge execution = one Spark job per merge:
  postings of member segments
    -> groupBy(term) (term-pruned columnar read of only member dirs)
    -> Arrow UDF: decode member postings, concatenate in doc_base
       order (already globally sorted — the DocIDMerger step is free),
       re-encode 128-blocks + skip + block-max
    -> write new seg partition, rewrite segments_meta (the commit).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_solr_spark.index.codec import (
    POSTING_ROW_SCHEMA,
    decode_posting,
    encode_posting,
    posting_from_row,
)
from lucene_solr_spark.index.segments import SegmentIndex, commit_segments_meta

# TieredMergePolicy defaults (TieredMergePolicy.java:81-88)
MAX_MERGE_AT_ONCE = 10
SEGS_PER_TIER = 10.0
MAX_MERGED_BYTES = 5 << 30
FLOOR_SEGMENT_BYTES = 2 << 20


@dataclass
class SegInfo:
    seg_id: int
    doc_base: int
    doc_count: int
    size_bytes: int


@dataclass
class MergeSpec:
    members: list[SegInfo]
    score: float

    @property
    def seg_ids(self) -> list[int]:
        return [s.seg_id for s in self.members]


@dataclass
class TieredMergePolicy:
    """Size-tiered merge selection over contiguous segment runs."""

    max_merge_at_once: int = MAX_MERGE_AT_ONCE
    segs_per_tier: float = SEGS_PER_TIER
    max_merged_bytes: int = MAX_MERGED_BYTES
    floor_bytes: int = FLOOR_SEGMENT_BYTES

    def _floored(self, b: int) -> float:
        return float(max(b, self.floor_bytes))

    def allowed_segment_count(self, sizes: list[int]) -> int:
        """Tier budget (TieredMergePolicy.java:328-342): with
        minSegmentBytes the floored smallest size, each tier holds
        segsPerTier segments of levelSize, levelSize *= maxMergeAtOnce
        per tier, until totalBytes is covered."""
        total = sum(self._floored(s) for s in sizes)
        if not sizes:
            return 0
        min_size = min(self._floored(s) for s in sizes)
        level = min_size
        allowed = 0.0
        while True:
            level_count = total / level
            if level_count < self.segs_per_tier:
                allowed += np.ceil(level_count)
                break
            allowed += self.segs_per_tier
            total -= self.segs_per_tier * level
            level *= self.max_merge_at_once
        return int(allowed)

    def find_merge(self, infos: list[SegInfo]) -> MergeSpec | None:
        """Pick the best adjacent candidate window, or None if within
        budget. Score = skew * totalSize^0.05 (nonDelRatio == 1: we
        have no deletes), smaller is better
        (TieredMergePolicy.java:450-492)."""
        infos = sorted(infos, key=lambda s: s.doc_base)
        # grace out oversized segments (>= max/2 — lines 316-324)
        eligible = [s for s in infos if s.size_bytes < self.max_merged_bytes / 2]
        sizes = [s.size_bytes for s in eligible]
        if len(eligible) <= self.allowed_segment_count(sizes):
            return None

        best: MergeSpec | None = None
        for i in range(len(eligible)):
            tot = 0
            members: list[SegInfo] = []
            for j in range(i, min(i + self.max_merge_at_once, len(eligible))):
                # adjacency in docid space: consecutive eligible
                # entries must be contiguous, else break the run
                if members and eligible[j].doc_base != (
                        members[-1].doc_base + members[-1].doc_count):
                    break
                if tot + eligible[j].size_bytes > self.max_merged_bytes:
                    break
                members.append(eligible[j])
                tot += eligible[j].size_bytes
            if len(members) < 2:
                continue
            floored = [self._floored(s.size_bytes) for s in members]
            skew = max(floored) / sum(floored)
            score = skew * (sum(floored) ** 0.05)
            if best is None or score < best.score:
                best = MergeSpec(members=list(members), score=score)
        return best


def segment_sizes(si: SegmentIndex) -> list[SegInfo]:
    """Posting-bytes per live segment (the segment 'file size')."""
    rows = (
        si.postings.groupBy("seg_id")
        .agg(F.sum(F.length("docs_enc") + F.length("tfs_enc")).alias("b"))
        .collect()
    )
    size = {int(r["seg_id"]): int(r["b"]) for r in rows}
    out = []
    for r in si.meta.collect():
        out.append(SegInfo(int(r["seg_id"]), int(r["doc_base"]),
                           int(r["doc_count"]), size.get(int(r["seg_id"]), 0)))
    return out


def execute_merge(si: SegmentIndex, spec: MergeSpec) -> int:
    """Run one merge as a Spark job; returns the new seg_id."""
    spark = si.spark
    members = sorted(spec.members, key=lambda s: s.doc_base)
    member_ids = [s.seg_id for s in members]
    new_id = max(si.live_segments()) + 1
    order = {sid: i for i, sid in enumerate(member_ids)}

    # norms blobs of members, broadcast (<= max_merge_at_once blobs of
    # doc_count bytes each)
    norm_rows = (si.norms.where(F.col("seg_id").isin(member_ids))
                 .select("seg_id", "doc_base", "norms").collect())
    blobs = {int(r["seg_id"]): (int(r["doc_base"]), bytes(r["norms"]))
             for r in norm_rows}
    order_b = spark.sparkContext.broadcast(order)
    blobs_b = spark.sparkContext.broadcast(blobs)
    new_base = members[0].doc_base

    def merge_terms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lucene_solr_spark.index.codec import encode_positions, read_vints_arr

        ordm = order_b.value
        bl = blobs_b.value
        norm_arr = {sid: np.frombuffer(b, dtype=np.uint8) for sid, (_, b) in bl.items()}
        from lucene_solr_spark.index.codec import split_posting_to_rows

        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                term = pdf["term"].iloc[i]
                parts = pdf["parts"].iloc[i]
                # member order, then group order within a member — the
                # DocIDMerger concatenation order (group rows decode
                # standalone thanks to their grp_prev_doc base)
                parts = sorted(parts, key=lambda p: (ordm[int(p["seg_id"])],
                                                     int(p["grp_id"])))
                d_parts, t_parts, n_parts, p_parts, o_parts = [], [], [], [], []
                for p in parts:
                    sid = int(p["seg_id"])
                    ep_in = posting_from_row(p)
                    docs, tfs = decode_posting(ep_in)
                    base = bl[sid][0]
                    d_parts.append(docs)
                    t_parts.append(tfs)
                    n_parts.append(norm_arr[sid][docs - base].astype(np.int64))
                    if ep_in.pos_enc:
                        # the .pos stream's per-doc delta layout is
                        # position-local, so member streams concatenate
                        # after a flat re-absolutize (decode deltas ->
                        # positions), mirroring SegmentMerger's copy
                        p_parts.append(ep_in.pos_enc)
                    if ep_in.offs_enc:
                        o_parts.append(ep_in.offs_enc)
                docs = np.concatenate(d_parts)   # already sorted: doc_base order
                tfs = np.concatenate(t_parts)
                norms = np.concatenate(n_parts)
                ep = encode_posting(docs, tfs, norms)
                flat_pos = flat_st = flat_en = None
                if p_parts and len(p_parts) == len(parts):
                    from lucene_solr_spark.index.codec import decode_positions
                    flats = []
                    for p, t in zip(p_parts, t_parts):
                        for arr in decode_positions(p, t):
                            flats.append(arr)
                    flat_pos = np.concatenate(flats)
                if o_parts and len(o_parts) == len(parts):
                    from lucene_solr_spark.index.codec import decode_offsets
                    sts, ens = [], []
                    for o, t in zip(o_parts, t_parts):
                        for st_a, en_a in decode_offsets(o, t):
                            sts.append(st_a)
                            ens.append(en_a)
                    flat_st = np.concatenate(sts)
                    flat_en = np.concatenate(ens)
                for r in split_posting_to_rows(ep, tfs, flat_pos,
                                               flat_st, flat_en):
                    r["term"] = term
                    out.append(r)
            if out:
                yield pd.DataFrame(out)

    from lucene_solr_spark.index.codec import POSTING_ROW_FIELDS

    part_struct = F.struct(F.col("seg_id"), *[F.col(c) for c in POSTING_ROW_FIELDS])
    merged = (
        si.postings.where(F.col("seg_id").isin(member_ids))
        .groupBy("term").agg(F.collect_list(part_struct).alias("parts"))
        .mapInPandas(merge_terms, schema="term string, " + POSTING_ROW_SCHEMA)
    )
    (merged.withColumn("seg_id", F.lit(new_id))
           .repartition("seg_id").sortWithinPartitions("term", "grp_id")
           .write.partitionBy("seg_id")
           .option("partitionOverwriteMode", "dynamic").mode("overwrite")
           .parquet(f"{si.path}/postings"))

    # merged norms: concatenation in doc_base order (contiguous)
    blob = b"".join(blobs[sid][1] for sid in member_ids)
    doc_count = sum(s.doc_count for s in members)
    # doclens for the merged norms row
    dl_rows = (si.norms.where(F.col("seg_id").isin(member_ids))
               .select("seg_id", "doclens").collect())
    dl_map = {int(r["seg_id"]): list(r["doclens"]) for r in dl_rows}
    doclens = []
    for sid in member_ids:
        doclens.extend(dl_map[sid])
    norms_df = spark.createDataFrame(
        [(new_id, new_base, doc_count, bytearray(blob), doclens,
          int(sum(doclens)))],
        "seg_id int, doc_base long, doc_count long, norms binary, "
        "doclens array<int>, sum_doclen long")
    (norms_df.write.partitionBy("seg_id")
     .option("partitionOverwriteMode", "dynamic").mode("overwrite")
     .parquet(f"{si.path}/norms"))

    # doc-values sidecar carry-over: docids never remap across merges,
    # so the merged segment's sidecar is the members' rows re-keyed to
    # the new seg_id (SegmentMerger re-writes .dvd the same way,
    # index/SegmentMerger.java mergeDocValues)
    if si.has_docvalues():
        dv = (si.spark.read.parquet(f"{si.path}/docvalues")
              .where(F.col("seg_id").isin(member_ids))
              .withColumn("seg_id", F.lit(new_id)))
        (dv.repartition("seg_id").sortWithinPartitions("docid")
         .write.partitionBy("seg_id")
         .option("partitionOverwriteMode", "dynamic").mode("overwrite")
         .parquet(f"{si.path}/docvalues"))

    # commit: write the next segments_meta generation (the segments_N
    # swap, made atomic by commit_segments_meta's _SUCCESS protocol).
    # Meta is one tiny row per segment — collect, edit driver-side.
    schema = si.meta.schema
    rows = si.meta.collect()
    keep = [r for r in rows if int(r["seg_id"]) not in set(member_ids)]
    dropped = [r for r in rows if int(r["seg_id"]) in set(member_ids)]
    post_stats = (spark.read.parquet(f"{si.path}/postings")
                  .where(F.col("seg_id") == new_id)
                  .agg(F.count(F.lit(1)).alias("tc"), F.max("df").alias("mx"))
                  .collect()[0])
    # lineage: the merged row inherits the members' consumed batch tags
    # alongside the member seg-ids — a merge must never erase the
    # 'batch:<id>' markers streaming replay dedup keys on (the
    # UpdateLog version survival across segment merges).
    inherited: set[str] = set()
    for r in dropped:
        if r["merged_from"]:
            inherited.update(t for t in str(r["merged_from"]).split(",")
                             if t.startswith("batch:"))
    lineage = ",".join([str(s) for s in member_ids] + sorted(inherited))
    merged_row = (
        new_id, new_base,
        sum(int(r["doc_count"]) for r in dropped),
        sum(int(r["sum_doclen"]) for r in dropped),
        int(post_stats["tc"]), int(post_stats["tc"]), int(post_stats["mx"]),
        sum(int(r["input_rows"]) for r in dropped),
        0.0, time.time(),
        max(int(r["salt_span"]) for r in dropped),
        max(int(r["seg_size"]) for r in dropped),
        lineage,
    )
    new_meta = spark.createDataFrame(
        [tuple(r) for r in keep] + [merged_row], schema=schema)
    commit_segments_meta(new_meta, si.path)
    si.refresh()
    return new_id


def maybe_merge(si: SegmentIndex, policy: TieredMergePolicy | None = None,
                max_merges: int = 100) -> list[list[int]]:
    """IndexWriter.maybeMerge loop: repeatedly ask the policy for work
    and run it until the index is within budget. Returns the executed
    merges (lists of member seg_ids)."""
    policy = policy or TieredMergePolicy()
    done: list[list[int]] = []
    for _ in range(max_merges):
        spec = policy.find_merge(segment_sizes(si))
        if spec is None:
            break
        ids = spec.seg_ids
        execute_merge(si, spec)
        done.append(ids)
    return done
