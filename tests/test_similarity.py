"""ANN scale-path tests: the persisted bucket/cell layout must return
exactly what the full-scan probe returns, while its scan is
PARTITION-PRUNED to the probe buckets (the property that makes probe
cost independent of corpus size)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def ann_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "idx")
    cents = SIM._hyperplanes(DIM, 4, seed=7)
    SIM.build_ann_index(emb, path, dim=DIM, n_planes=8, seed=42,
                        centroids=cents)
    return path, cents


def _rows(df):
    return [(r["vec_id"], r["cos_q"], r["rank"]) for r in
            df.orderBy("rank").collect()]


def test_lsh_indexed_equals_scan(spark, emb, ann_path):
    path, _ = ann_path
    q = list(emb.where("vec_id = 3").first()["embedding"])
    scan = SIM.lsh_topk(emb, q, dim=DIM, k=10, n_planes=8, seed=42)
    idx = SIM.lsh_topk_indexed(spark, path, q, dim=DIM, k=10, n_planes=8,
                               seed=42)
    assert _rows(scan) == _rows(idx)


def test_ivf_indexed_equals_scan(spark, emb, ann_path):
    path, cents = ann_path
    q = list(emb.where("vec_id = 3").first()["embedding"])
    scan = SIM.ivf_topk(emb, q, cents, k=10, nprobe=2)
    idx = SIM.ivf_topk_indexed(spark, path, q, cents, k=10, nprobe=2)
    assert _rows(scan) == _rows(idx)


def test_indexed_probe_is_partition_pruned(spark, emb, ann_path):
    """The probe scan must show non-empty PartitionFilters — i.e. the
    bucket predicate prunes directories, it does not re-hash the
    corpus."""
    path, cents = ann_path
    q = list(emb.where("vec_id = 3").first()["embedding"])
    for df in (SIM.lsh_topk_indexed(spark, path, q, dim=DIM, k=10),
               SIM.ivf_topk_indexed(spark, path, q, cents, k=10)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        import re
        filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert any(f.strip() for f in filters), plan


def test_probe_reads_subset_of_files(spark, emb, ann_path):
    """Partition pruning is real: the probed buckets are a strict
    subset of the index's bucket directories."""
    import glob

    path, _ = ann_path
    q = list(emb.where("vec_id = 3").first()["embedding"])
    probe = set(SIM.lsh_query_buckets(q, DIM, n_planes=8, seed=42))
    all_buckets = {int(p.rsplit("=", 1)[1])
                   for p in glob.glob(f"{path}/lsh/bucket=*")}
    assert probe & all_buckets
    assert len(all_buckets - probe) > 0  # something was prunable
