"""CheckIndex port: whole-index invariant validation (SURVEY §5.4;
reference: lucene/core/src/java/org/apache/lucene/index/CheckIndex.java,
2,856 LoC — the validations below are the subset that applies to our
table layout, run as distributed DataFrame checks + an Arrow-UDF
decode pass, not a driver loop).

Checks:
 1. segment geometry: contiguous non-overlapping docid ranges; meta
    doc_count == docs-table count per segment.
 2. postings decode round-trip: every encoded posting decodes to
    strictly-increasing docids within the segment's [base, base+count)
    range; df == decoded length; ttf == sum(tf); tf >= 1.
 3. skip/blockmax consistency: skip_last_doc matches decoded block
    boundaries; blockmax_tf/blockmax_norm are true per-block maxima
    (CheckIndex.checkPostings's skip-data verification).
 4. norms: every docid present in the norms blob; norm_byte in docs
    table matches the blob byte.
 5. term stats: per-segment df/ttf aggregates match the docs table's
    doclen sum (sum over terms of ttf == sum of doclen).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_solr_spark.index.codec import (
    decode_posting,
    posting_from_row,
)
from lucene_solr_spark.index.segments import SegmentIndex


class CheckIndexError(AssertionError):
    pass


def _check_posting_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Distributed decode-and-verify; emits one error-count row per
    batch plus per-segment (seg_id, df_sum, ttf_sum) for cross-checks."""
    from lucene_solr_spark.index.codec import BLOCK_SIZE

    for pdf in batches:
        errs: list[str] = []
        seg_df: dict[int, int] = {}
        seg_ttf: dict[int, int] = {}
        for i in range(len(pdf)):
            r = pdf.iloc[i]
            seg, term = int(r["seg_id"]), r["term"]
            ep = posting_from_row(r)
            try:
                docs, tfs = decode_posting(ep)
            except Exception as e:  # decode blow-up is a corruption
                errs.append(f"seg={seg} term={term}: decode failed: {e}")
                continue
            if len(docs) != int(r["df"]):
                errs.append(f"seg={seg} term={term}: df {r['df']} != {len(docs)}")
            if len(docs) > 1 and not np.all(np.diff(docs) > 0):
                errs.append(f"seg={seg} term={term}: docids not increasing")
            if int(tfs.sum()) != int(r["ttf"]):
                errs.append(f"seg={seg} term={term}: ttf {r['ttf']} != {tfs.sum()}")
            if np.any(tfs < 1):
                errs.append(f"seg={seg} term={term}: tf < 1")
            # skip + blockmax invariants over full blocks
            full = len(docs) // BLOCK_SIZE
            skip = np.asarray(r["skip_last_doc"])
            if ep.singleton_docid is None and len(skip) != full:
                errs.append(f"seg={seg} term={term}: skip count {len(skip)} != {full}")
            else:
                for b in range(full):
                    lo, hi = b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE
                    if int(skip[b]) != int(docs[hi - 1]):
                        errs.append(f"seg={seg} term={term}: skip[{b}] mismatch")
                    if int(r["bm_tf"][b]) != int(tfs[lo:hi].max()):
                        errs.append(f"seg={seg} term={term}: bm_tf[{b}] mismatch")
            tail_lo = full * BLOCK_SIZE
            if tail_lo < len(docs):
                nb = full  # tail block index in bm arrays
                if int(r["bm_tf"][nb]) != int(tfs[tail_lo:].max()):
                    errs.append(f"seg={seg} term={term}: tail bm_tf mismatch")
            # positions stream (when stored): per-doc count == tf,
            # strictly increasing (CheckIndex's checkPostings prox part)
            if ep.pos_enc:
                from lucene_solr_spark.index.codec import decode_positions
                try:
                    plists = decode_positions(ep.pos_enc, tfs)
                except Exception as e:
                    errs.append(f"seg={seg} term={term}: pos decode failed: {e}")
                    plists = []
                for pl, tf in zip(plists, tfs):
                    if len(pl) != int(tf):
                        errs.append(f"seg={seg} term={term}: pos count != tf")
                        break
                    if len(pl) > 1 and not np.all(np.diff(pl) > 0):
                        errs.append(f"seg={seg} term={term}: pos not increasing")
                        break
            # impacts: every (tf, norm) in a full block must be
            # dominated by a frontier pair, else bounds under-estimate
            # and WAND pruning would drop true hits
            if ep.impacts_tf:
                for b in range(min(len(ep.impacts_tf), full)):
                    ftf = np.asarray(ep.impacts_tf[b], dtype=np.int64)
                    fnb = np.asarray(ep.impacts_norm[b], dtype=np.int64)
                    if len(ftf) == 0:
                        errs.append(f"seg={seg} term={term}: empty impact "
                                    f"frontier at block {b}")
                        break
                    btf = tfs[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
                    if int(ftf.max()) < int(btf.max()):
                        errs.append(f"seg={seg} term={term}: impact frontier "
                                    f"misses max tf at block {b}")
                        break
            # offsets stream (when stored): per-doc pair count == tf,
            # spans well-formed (end >= start, starts non-decreasing)
            if ep.offs_enc:
                from lucene_solr_spark.index.codec import decode_offsets
                try:
                    olists = decode_offsets(ep.offs_enc, tfs)
                except Exception as e:
                    errs.append(f"seg={seg} term={term}: offs decode failed: {e}")
                    olists = []
                for (st, en), tf in zip(olists, tfs):
                    if len(st) != int(tf):
                        errs.append(f"seg={seg} term={term}: offs count != tf")
                        break
                    if np.any(en < st) or (
                            len(st) > 1 and np.any(np.diff(st) < 0)):
                        errs.append(f"seg={seg} term={term}: malformed offsets")
                        break
            seg_df[seg] = seg_df.get(seg, 0) + len(docs)
            seg_ttf[seg] = seg_ttf.get(seg, 0) + int(tfs.sum())
        segs = sorted(seg_df)
        yield pd.DataFrame({
            "seg_id": segs,
            "df_sum": [seg_df[s] for s in segs],
            "ttf_sum": [seg_ttf[s] for s in segs],
            "errors": ["\n".join(errs[:20])] * len(segs) if segs else [],
            "n_errors": [len(errs)] * len(segs) if segs else [],
        })


def check_index(si: SegmentIndex, max_report: int = 20) -> dict:
    """Run all invariant checks; raises CheckIndexError on the first
    violated class, returns summary metrics when clean."""
    meta = si.meta.select("seg_id", "doc_base", "doc_count", "sum_doclen").collect()
    # segment order is docid-range order (seg_ids are not monotone
    # after merges — a merged segment gets a fresh id)
    meta = sorted(meta, key=lambda r: r["doc_base"])
    problems: list[str] = []

    # 1. geometry. Docs is the immutable docid-keyed store; segment
    # membership is by docid range, so count docs per range.
    for prev, cur in zip(meta, meta[1:]):
        if prev["doc_base"] + prev["doc_count"] != cur["doc_base"]:
            problems.append(
                f"segment gap/overlap between seg {prev['seg_id']} and {cur['seg_id']}")
    range_counts = {
        r["seg_id"]: si.docs.where(
            (F.col("docid") >= r["doc_base"])
            & (F.col("docid") < r["doc_base"] + r["doc_count"])).count()
        for r in meta
    }
    for r in meta:
        if range_counts.get(r["seg_id"], 0) != r["doc_count"]:
            problems.append(
                f"seg {r['seg_id']}: meta doc_count {r['doc_count']} != "
                f"docs rows in range {range_counts.get(r['seg_id'], 0)}")
    if problems:
        raise CheckIndexError("; ".join(problems[:max_report]))

    # 2+3. distributed decode pass
    res = si.postings.mapInPandas(
        _check_posting_rows,
        schema="seg_id int, df_sum long, ttf_sum long, errors string, n_errors int",
    ).persist()
    bad = res.where(F.col("n_errors") > 0).select("errors").limit(1).collect()
    if bad:
        res.unpersist()
        raise CheckIndexError(bad[0]["errors"])

    # 5. ttf vs doclen cross-check (sum over terms of ttf == sum doclen)
    ttf_by_seg = {
        r["seg_id"]: r["t"]
        for r in res.groupBy("seg_id").agg(F.sum("ttf_sum").alias("t")).collect()
    }
    res.unpersist()
    for r in meta:
        if ttf_by_seg.get(r["seg_id"], 0) != r["sum_doclen"]:
            problems.append(
                f"seg {r['seg_id']}: ttf total {ttf_by_seg.get(r['seg_id'])} != "
                f"sum_doclen {r['sum_doclen']}")
    if problems:
        raise CheckIndexError("; ".join(problems[:max_report]))

    # 4. norms blob vs docs table. Docids map to live segments by
    # range (docs.seg_id is the original build partition, which merges
    # do not rewrite), so route by doc_base interval. The pass streams
    # PER SEGMENT like the postings pass: only the tiny
    # (seg_id, doc_base) metadata reaches the driver; each blob is
    # shuffled once to the one cogroup task checking its segment's
    # docs — no O(total docs) driver-side collect.
    meta_rows = sorted(si.norms.select("seg_id", "doc_base").collect(),
                       key=lambda r: r["doc_base"])
    bases = np.array([r["doc_base"] for r in meta_rows], dtype=np.int64)
    owner_segs = np.array([r["seg_id"] for r in meta_rows], dtype=np.int64)
    tag_b = si.spark.sparkContext.broadcast((bases, owner_segs))

    def tag_owner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bases_l, segs_l = tag_b.value
        for pdf in batches:
            docid = pdf["docid"].to_numpy(dtype=np.int64)
            ix = np.searchsorted(bases_l, docid, side="right") - 1
            own = np.where(ix >= 0, segs_l[np.clip(ix, 0, None)], -1)
            yield pd.DataFrame({"docid": docid,
                                "norm_byte": pdf["norm_byte"].to_numpy(),
                                "own_seg": own})

    tagged = (si.docs.select("docid", "norm_byte")
              .mapInPandas(tag_owner,
                           schema="docid long, norm_byte int, own_seg long"))
    norms_keyed = si.norms.select(
        F.col("seg_id").cast("long").alias("own_seg"), "doc_base",
        "doc_count", "norms")

    def check_norms(docs_pdf: pd.DataFrame,
                    norm_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(docs_pdf) == 0:
            return pd.DataFrame({"nerr": [0]})
        if len(norm_pdf) == 0:
            # docs owned by no norms segment (or own_seg == -1)
            return pd.DataFrame({"nerr": [len(docs_pdf)]})
        arr = np.frombuffer(bytes(norm_pdf["norms"].iloc[0]),
                            dtype=np.uint8)
        base = int(norm_pdf["doc_base"].iloc[0])
        docid = docs_pdf["docid"].to_numpy(dtype=np.int64)
        nb = docs_pdf["norm_byte"].to_numpy(dtype=np.int64)
        idx = docid - base
        in_rng = (idx >= 0) & (idx < len(arr))
        bad = int((~in_rng).sum())
        bad += int((arr[idx[in_rng]] != nb[in_rng]).sum())
        return pd.DataFrame({"nerr": [bad]})

    nerr = (tagged.groupBy("own_seg")
            .cogroup(norms_keyed.groupBy("own_seg"))
            .applyInPandas(check_norms, schema="nerr long")
            .agg(F.sum("nerr")).collect()[0][0])
    if nerr:
        raise CheckIndexError(f"{nerr} norm bytes disagree between docs table and blob")

    # 5. doc-values sidecar (when present): exactly one row per live
    # doc, docids within segment ranges (the CheckIndex testDocValues
    # pass, index/CheckIndex.java)
    dv_docs = None
    if si.has_docvalues():
        dv = si.docvalues
        dv_docs = dv.count()
        if dv_docs != sum(r["doc_count"] for r in meta):
            raise CheckIndexError(
                f"docvalues rows {dv_docs} != live docs "
                f"{sum(r['doc_count'] for r in meta)}")
        dup = dv.groupBy("docid").count().where(F.col("count") > 1).count()
        if dup:
            raise CheckIndexError(f"{dup} duplicate docvalues docids")

    return {
        "segments": len(meta),
        "docs": sum(r["doc_count"] for r in meta),
        "sum_doclen": sum(r["sum_doclen"] for r in meta),
        "docvalues_docs": dv_docs,
        "clean": True,
    }


def check_flat_index(idx) -> dict:
    """CheckIndex for the FLAT index tables (the index/CheckIndex.java
    term/freq cross-checks applied to IndexTables): verifies
    (1) term_stats.df == distinct-doc count derived from postings per
    term, (2) docs.doclen == sum of the doc's postings tf, (3)
    coll_stats doc_count/sum_ttf match the tables. Returns a report
    dict with per-check violation counts; clean == all zeros.

    Scale: three aggregate jobs, each one shuffle — no collects of
    postings."""
    from pyspark.sql import functions as F

    p = idx.postings
    df_derived = p.groupBy("term").agg(
        F.countDistinct("docid").alias("df2"))
    bad_df = (idx.term_stats.join(df_derived, "term", "full")
              .where(F.coalesce(F.col("df").cast("long"), F.lit(-1))
                     != F.coalesce(F.col("df2"), F.lit(-1))).count())
    dl_derived = p.groupBy("docid").agg(F.sum("tf").alias("dl2"))
    bad_dl = (idx.docs.select("docid", "doclen")
              .join(dl_derived, "docid", "left")
              .where(F.col("doclen").cast("long")
                     != F.coalesce(F.col("dl2"), F.lit(0))).count())
    n_docs = idx.docs.count()
    sttf = idx.docs.agg(F.sum("doclen")).first()[0] or 0
    cs = idx.coll_stats
    bad_cs = int(int(cs["doc_count"]) != int(n_docs)) + int(
        int(cs["sum_ttf"]) != int(sttf))
    return {"clean": bad_df == 0 and bad_dl == 0 and bad_cs == 0,
            "bad_term_stats": int(bad_df), "bad_doclens": int(bad_dl),
            "bad_coll_stats": int(bad_cs), "docs": int(n_docs)}
