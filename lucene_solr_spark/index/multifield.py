"""Multi-field indexing — the per-field dimension of Lucene's data
model (index/FieldInfos.java: every field carries its own postings,
norms and statistics; codecs/perfield/PerFieldPostingsFormat.java:382
routes each field to its own postings format; index/Term.java: a term
is (field, text)).

Spark-first shape: ONE fused analyze+invert Arrow pass over the corpus
produces per-field term/tf/position arrays side by side (the corpus
text is scanned once, not once per field), and each field's index is a
Catalyst PROJECTION of that shared frame — per-field postings explode
only that field's arrays, per-field norms/doclen are plain columns.
Per-field statistics follow Lucene exactly:

- df / ttf per (field, term)  — Terms.getStats per field
- docCount per field = docs with at least one indexed term in the
  field (CollectionStatistics.docCount; a doc with an empty/absent
  field does not count toward that field's idf denominator)
- avgdl per field = sumTotalTermFreq(field) / docCount(field)
- norms per field = byte315 of the FIELD length (the same
  length-norm table, applied per field — norms are per (doc, field))

so a query scored against field f is bit-identical to the same query
on a standalone single-field index of f (duel-tested).

Scale: the fused pass is one mapInPandas over the source table; every
per-field table derives from it by narrow projection + one explode, so
adding a field adds no extra source scan. Per-field postings shuffle
independently on their own (term) keys — hot terms in `title` don't
skew `body`'s aggregation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.functions.bm25 import length_norm_byte
from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.index.docid import assign_doc_ids


@dataclass
class MultiFieldIndex:
    """Per-field IndexTables over one shared analyzed scan.

    ``fields`` maps field name -> that field's IndexTables (its own
    postings/term_stats/coll_stats/norms); ``docs`` is the shared
    stored-fields frame (docid, url, doclen_<f>, norm_<f> per field).
    """

    fields: dict[str, IndexTables]
    docs: DataFrame
    analyzed: DataFrame

    def unpersist(self) -> None:
        self.analyzed.unpersist()


def analyzed_multifield_frame(pages: DataFrame, field_cols: list[str],
                              key_col: str = "url",
                              with_positions: bool = True) -> DataFrame:
    """The single expensive scan of a multi-field build: per document,
    (docid, url, then per field f: doclen_f, norm_f, terms_f[],
    tfs_f[][, positions_f[][]]). All fields are analyzed inside ONE
    Arrow batch pass (DefaultIndexingChain.processField runs per field
    within one addDocument; here: one invert_batch call per field per
    batch, same scan)."""
    from lucene_solr_spark.analysis.standard import invert_batch

    for f in field_cols:
        if not re.fullmatch(r"\w+", f):
            raise ValueError(f"field name {f!r} must be identifier-like")

    def run(batches):
        for pdf in batches:
            cols: dict[str, object] = {
                "docid": pdf["docid"].to_numpy(),
                "url": pdf[key_col].astype(str).to_numpy(),
            }
            for f in field_cols:
                if with_positions:
                    dl, terms, tfs, pos = invert_batch(pdf[f], True)
                    cols[f"positions_{f}"] = pos
                else:
                    dl, terms, tfs = invert_batch(pdf[f], False)
                nb = np.zeros(len(dl), dtype=np.int32)
                nz = dl > 0
                nb[nz] = length_norm_byte(
                    dl[nz].astype(np.int64)).astype(np.int32)
                cols[f"doclen_{f}"] = dl
                cols[f"norm_{f}"] = nb
                cols[f"terms_{f}"] = terms
                cols[f"tfs_{f}"] = tfs
            yield pd.DataFrame(cols)

    per_field = ", ".join(
        f"doclen_{f} int, norm_{f} int, terms_{f} array<string>, "
        f"tfs_{f} array<int>"
        + (f", positions_{f} array<array<int>>" if with_positions else "")
        for f in field_cols)
    return pages.mapInPandas(run, schema=f"docid long, url string, {per_field}")


def build_multifield_index(
    pages: DataFrame,
    field_cols: list[str],
    key_col: str = "url",
    precomputed_docid: str | None = None,
    with_positions: bool = True,
) -> MultiFieldIndex:
    """Build per-field flat indexes from one corpus scan.

    Docids are assigned ONCE (shared across fields — a doc is one
    docid in every field's index, so cross-field composition is a
    docid join). Per-field docCount/sumTotalTermFreq come from one
    aggregate job over the persisted analyzed frame.
    """
    pinned_range = None
    if precomputed_docid:
        base = pages.withColumn("docid",
                                F.col(precomputed_docid).cast("long"))
    else:
        base = assign_doc_ids(pages, key=key_col)
        pinned_range = getattr(base, "_pinned_range_frame", None)

    af = analyzed_multifield_frame(base, field_cols, key_col=key_col,
                                   with_positions=with_positions).persist()

    stat_aggs = []
    for f in field_cols:
        stat_aggs.append(F.count(F.when(F.col(f"doclen_{f}") > 0, 1))
                         .alias(f"n_{f}"))
        stat_aggs.append(F.coalesce(F.sum(f"doclen_{f}"), F.lit(0))
                         .alias(f"s_{f}"))
    stats_row = af.agg(*stat_aggs).collect()[0]
    if pinned_range is not None:
        pinned_range.unpersist()

    docs_cols = ["docid", "url"] + [c for f in field_cols
                                    for c in (f"doclen_{f}", f"norm_{f}")]
    shared_docs = af.select(*docs_cols)

    fields: dict[str, IndexTables] = {}
    for f in field_cols:
        # per-field docs: only docs WITH the field (docCount semantics);
        # postings can't reference the others anyway
        docs_f = (af.where(F.col(f"doclen_{f}") > 0)
                  .select("docid", "url",
                          F.col(f"doclen_{f}").alias("doclen"),
                          F.col(f"norm_{f}").alias("norm_byte")))
        zip_cols = [F.col(f"terms_{f}").alias("term"),
                    F.col(f"tfs_{f}").alias("tf")]
        if with_positions:
            zip_cols.append(F.col(f"positions_{f}").alias("positions"))
        z = af.select("docid", F.explode(F.arrays_zip(*zip_cols)).alias("z"))
        sel = [F.col("z.term").alias("term"), "docid",
               F.col("z.tf").alias("tf")]
        if with_positions:
            sel.append(F.col("z.positions").alias("positions"))
        postings_f = z.select(*sel)
        term_stats_f = postings_f.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf"))
        fields[f] = IndexTables(
            docs=docs_f, postings=postings_f, term_stats=term_stats_f,
            coll_stats={"doc_count": int(stats_row[f"n_{f}"]),
                        "sum_ttf": int(stats_row[f"s_{f}"])})

    return MultiFieldIndex(fields=fields, docs=shared_docs, analyzed=af)


def build_multifield_segment_index(pages: DataFrame, field_cols: list[str],
                                   base_path: str, **build_kw) -> dict:
    """Per-field SEGMENT indexes with ALIGNED docids — multi-field at
    the WAND tier (codecs/perfield/PerFieldPostingsFormat.java's role
    for the block-max serving path).

    Each field builds a full segment index at ``{base_path}/{field}``
    over the same url-keyed corpus; assign_doc_ids ranks by url, so
    the SAME doc holds the SAME docid in every field's index (the
    FieldInfos invariant: one doc, per-field postings/norms), verified
    here with one anti-join per field.

    Semantics note (documented deviation for sparse fields): a
    segment index's docCount counts every corpus doc, while Lucene's
    per-field docCount excludes docs without the field — so this
    builder REJECTS corpora where a field analyzes to zero tokens for
    some doc (fail-fast beats silently shifted idf/avgdl). Sparse
    fields belong on the flat MultiFieldSearcher, whose stats follow
    the per-field contract exactly.
    """
    from lucene_solr_spark.index.segments import build_segment_index

    out = {}
    for f in field_cols:
        si = build_segment_index(pages, f"{base_path}/{f}",
                                 text_col=f, **build_kw)
        n_empty = si.docs.where(F.col("doclen") == 0).count()
        if n_empty:
            # remove EVERY field dir built so far — a partial
            # per-field set must not survive for a later open/glob to
            # mistake for a complete multi-field index
            import shutil

            for g in [f] + list(out):
                shutil.rmtree(f"{base_path}/{g}", ignore_errors=True)
            raise ValueError(
                f"field {f!r}: {n_empty} docs analyze to zero tokens — "
                "per-field docCount would diverge from Lucene's; use "
                "the flat MultiFieldSearcher for sparse fields")
        out[f] = si
    first = field_cols[0]
    base = out[first].docs.select("url", "docid")
    for f in field_cols[1:]:
        misaligned = (out[f].docs.select("url", "docid")
                      .join(base, ["url", "docid"], "left_anti").count())
        if misaligned:
            raise ValueError(f"docid misalignment between {first!r} "
                             f"and {f!r}: {misaligned} docs")
    return out
