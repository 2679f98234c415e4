"""M4 tests: TieredMergePolicy selection + distributed merge execution.

Policy behaviors asserted from the spec (TieredMergePolicy.java:81-88,
291-342, 383-492); execution asserted by the dueling pattern — search
results and decoded postings must be identical before and after
merging (SegmentMerger preserves index contents, only layout changes).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.checkindex import check_index
from lucene_solr_spark.index.merge import (
    SegInfo,
    TieredMergePolicy,
    execute_merge,
    maybe_merge,
    segment_sizes,
)
from lucene_solr_spark.index.segments import build_segment_index
from lucene_solr_spark.search.wand import WandSearcher

MB = 1 << 20


def _infos(sizes, doc_per=1000):
    return [SegInfo(seg_id=i, doc_base=i * doc_per, doc_count=doc_per,
                    size_bytes=s) for i, s in enumerate(sizes)]


class TestPolicy:
    def test_no_merge_within_budget(self):
        p = TieredMergePolicy()
        assert p.find_merge(_infos([10 * MB] * 5)) is None

    def test_merges_when_over_budget(self):
        p = TieredMergePolicy()
        spec = p.find_merge(_infos([10 * MB] * 25))
        assert spec is not None
        assert 2 <= len(spec.members) <= p.max_merge_at_once

    def test_respects_max_merged_bytes(self):
        p = TieredMergePolicy(max_merged_bytes=64 * MB)
        spec = p.find_merge(_infos([10 * MB] * 30))
        assert spec is not None
        assert sum(s.size_bytes for s in spec.members) <= 64 * MB

    def test_oversized_graced_out(self):
        p = TieredMergePolicy(max_merged_bytes=64 * MB)
        infos = _infos([40 * MB] * 3 + [1 * MB] * 30)
        spec = p.find_merge(infos)
        assert spec is not None
        assert all(s.size_bytes < 32 * MB for s in spec.members)

    def test_members_are_adjacent(self):
        p = TieredMergePolicy()
        spec = p.find_merge(_infos([10 * MB] * 25))
        bases = [s.doc_base for s in sorted(spec.members, key=lambda x: x.doc_base)]
        counts = [s.doc_count for s in sorted(spec.members, key=lambda x: x.doc_base)]
        for i in range(1, len(bases)):
            assert bases[i] == bases[i - 1] + counts[i - 1]

    def test_prefers_uniform_windows(self):
        """Score favors low skew: a run of equal small segments beats a
        window containing one big segment."""
        p = TieredMergePolicy(segs_per_tier=2.0, max_merge_at_once=3)
        infos = _infos([100 * MB] * 3 + [3 * MB] * 10)
        spec = p.find_merge(infos)
        assert spec is not None
        assert all(s.size_bytes == 3 * MB for s in spec.members)


@pytest.fixture(scope="module")
def merged_pair(spark, pages_tiny, tmp_path_factory):
    """Two copies of the same index; one gets fully merged."""
    base = tmp_path_factory.mktemp("merge")
    a = build_segment_index(pages_tiny, str(base / "plain"), seg_size=64,
                            salt_span=32)
    b = build_segment_index(pages_tiny, str(base / "merged"), seg_size=64,
                            salt_span=32)
    # force merging down to few segments regardless of byte budget
    policy = TieredMergePolicy(segs_per_tier=1.0, max_merge_at_once=3,
                               floor_bytes=1)
    merges = maybe_merge(b, policy)
    assert merges, "expected at least one merge on a 5-segment index"
    return a, b, merges


def test_merge_checkindex_clean(merged_pair):
    _, b, _ = merged_pair
    assert check_index(b)["clean"]


def test_merge_reduces_segments(merged_pair):
    a, b, merges = merged_pair
    assert len(b.live_segments()) < len(a.live_segments())


def test_merge_lineage_recorded(merged_pair):
    _, b, merges = merged_pair
    rows = {int(r["seg_id"]): r["merged_from"] for r in b.meta.collect()}
    merged_rows = [v for v in rows.values() if v]
    assert len(merged_rows) >= 1
    flat = {int(x) for v in merged_rows for x in v.split(",")}
    assert flat  # at least the original ids appear

    # every executed merge's members recorded on some row
    for members in merges:
        assert any(set(map(int, v.split(","))) == set(members)
                   for v in merged_rows if v)


def test_merge_preserves_postings(merged_pair):
    a, b, _ = merged_pair
    fa = a.as_flat_tables().postings.select("term", "docid", "tf")
    fb = b.as_flat_tables().postings.select("term", "docid", "tf")
    assert fa.exceptAll(fb).count() == 0
    assert fb.exceptAll(fa).count() == 0


def test_merge_preserves_search_results(merged_pair):
    a, b, _ = merged_pair
    for q in ["t000000", "t000001 AND t000002", "t000001 OR t000002 OR t000003"]:
        ra = [(r["docid"], np.float32(r["score"]))
              for r in WandSearcher(a).search(q, k=10).orderBy("rank").collect()]
        rb = [(r["docid"], np.float32(r["score"]))
              for r in WandSearcher(b).search(q, k=10).orderBy("rank").collect()]
        assert ra == rb, q


def test_segment_sizes_positive(merged_pair):
    a, _, _ = merged_pair
    for s in segment_sizes(a):
        assert s.size_bytes > 0
        assert s.doc_count > 0


def test_docvalues_survive_merge(spark, pages_tiny, tmp_path_factory):
    """Merges re-key the doc-values sidecar to the merged segment
    (docids unchanged) — values identical before and after."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.merge import TieredMergePolicy, maybe_merge
    from lucene_solr_spark.index.segments import (
        SegmentIndex, build_segment_index)

    src = pages_tiny.withColumn("nch", F.length("text").cast("double"))
    path = str(tmp_path_factory.mktemp("dvmerge") / "idx")
    build_segment_index(src, path, seg_size=32, salt_span=16,
                        docvalues_cols=["nch"])
    si = SegmentIndex(path=path, spark=spark)
    before = {(r["docid"], r["nch"]) for r in si.docvalues.collect()}
    merged = maybe_merge(si, TieredMergePolicy(segs_per_tier=2))
    assert merged, "expected at least one merge on 10 tiny segments"
    si.refresh()
    after = {(r["docid"], r["nch"]) for r in si.docvalues.collect()}
    assert after == before
