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


def test_geo_distance_prefilter_never_drops(spark):
    """The circle bounding-box prefilter is conservative: brute-force
    haversine membership == distance_query output on a dense lattice
    around the circle edge (regression for the asin-vs-linear dlon
    bound)."""
    import math

    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.spatial import (
        EARTH_MEAN_RADIUS_METERS, distance_query, haversine_meters)

    lat0, lon0, r = 34.05, -118.24, 2_000_000.0
    pts = [(i, lat0 + (i % 81 - 40) * 0.5, lon0 + (i // 81 - 40) * 0.6)
           for i in range(81 * 81)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {r_["id"] for r_ in distance_query(df, lat0, lon0, r).collect()}
    d = haversine_meters(F.col("lat"), F.col("lon"),
                         F.lit(lat0), F.lit(lon0))
    want = {r_["id"] for r_ in df.where(d <= r).collect()}
    assert got == want and len(want) > 100

    def hav(lat, lon):
        p = math.pi / 180
        a = (math.sin((lat - lat0) * p / 2) ** 2
             + math.cos(lat0 * p) * math.cos(lat * p)
             * math.sin((lon - lon0) * p / 2) ** 2)
        return 2 * EARTH_MEAN_RADIUS_METERS * math.asin(min(1, math.sqrt(a)))

    want_py = {i for i, la, lo in pts if hav(la, lo) <= r}
    assert got == want_py

# --- persisted SQ8 code layout ---------------------------------------------


def test_sq8_roundtrip_codes(spark, emb, ann_path):
    """Persisted codes decode to exactly floor(x*127/max|x|) with the
    stored scale = max|x|."""
    import numpy as np

    path, _ = ann_path
    codes = {r["vec_id"]: (bytes(r["codes"]), r["scale"])
             for r in spark.read.parquet(f"{path}/sq8").collect()}
    for r in emb.limit(20).collect():
        a = np.asarray(r["embedding"], dtype=np.float64)
        mx = float(np.abs(a).max())
        if mx == 0.0:
            assert r["vec_id"] not in codes
            continue
        blob, scale = codes[r["vec_id"]]
        assert scale == mx
        got = np.frombuffer(blob, dtype=np.int8).astype(np.int64)
        exp = np.floor(a * 127.0 / mx).astype(np.int64)
        assert (got == exp).all()


def test_sq8_indexed_matches_recomputed(spark, emb, ann_path):
    """sq8_topk_indexed ranking == brute recomputation of the
    reconstructed dot (int64 code dot * stored scale) in numpy."""
    import numpy as np

    path, _ = ann_path
    q = list(emb.where("vec_id = 3").first()["embedding"])
    qa = np.asarray(q, dtype=np.float64)
    qc = np.floor(qa * 127.0 / np.abs(qa).max()).astype(np.int64)

    exp = []
    for r in emb.collect():
        a = np.asarray(r["embedding"], dtype=np.float64)
        mx = float(np.abs(a).max())
        if mx == 0.0:
            continue
        c = np.floor(a * 127.0 / mx).astype(np.int64)
        recon = int(np.floor((float(c @ qc) * mx) * 1_000_000.0))
        exp.append((-recon, r["vec_id"]))
    exp.sort()
    exp_top = [(v, -nr) for nr, v in exp[:10]]

    got = [(r["vec_id"], r["recon_q"]) for r in
           SIM.sq8_topk_indexed(spark, path, q, k=10).orderBy("rank").collect()]
    assert got == exp_top


def test_sq8_probe_never_reads_float_column(spark, emb, ann_path):
    """The quantized probe's scan touches ONLY the code table: no
    'embedding' column anywhere in the plan's ReadSchema — the 4x
    scan-shrink claim is real, not recomputed from floats."""
    path, _ = ann_path
    q = list(emb.where("vec_id = 3").first()["embedding"])
    df = SIM.sq8_topk_indexed(spark, path, q, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan, plan
    assert "codes" in plan


def test_polygon_holes_matches_numpy_raycast(spark):
    """polygon_query (even-odd ray casting with holes) agrees with an
    independent numpy PNPOLY on a random lattice, and reduces to
    convex_polygon_query on a convex ring."""
    import numpy as np

    from lucene_solr_spark.operators.spatial import (
        convex_polygon_query, polygon_query)

    rng = np.random.default_rng(7)
    lat = np.round(rng.uniform(25, 65, 400), 2)
    lon = np.round(rng.uniform(-20, 40, 400), 2)
    df = spark.createDataFrame(
        [(int(i), float(a), float(o)) for i, (a, o) in
         enumerate(zip(lat, lon))], "id long, lat double, lon double")

    def pnpoly(ring, plat, plon):
        inside = np.zeros(len(plat), dtype=bool)
        n = len(ring)
        for i in range(n):
            a_lat, a_lon = ring[i]
            b_lat, b_lon = ring[(i + 1) % n]
            if a_lat == b_lat:
                continue
            strad = (a_lat > plat) != (b_lat > plat)
            xint = ((b_lon - a_lon) * (plat - a_lat)
                    / (b_lat - a_lat) + a_lon)
            inside ^= strad & (plon < xint)
        return inside

    shell = [(30.0, -10.0), (30.0, 30.0), (45.0, 30.0),
             (45.0, 10.0), (60.0, 10.0), (60.0, -10.0)]
    hole = [(35.0, -5.0), (35.0, 5.0), (40.0, 5.0), (40.0, -5.0)]
    want = set(np.flatnonzero(
        pnpoly(shell, lat, lon) & ~pnpoly(hole, lat, lon)).tolist())
    got = {r["id"] for r in
           polygon_query(df, shell, [hole]).select("id").collect()}
    assert got == want and 0 < len(got) < 400

    convex = [(35.0, -12.0), (35.0, 25.0), (60.0, 30.0), (60.0, -15.0)]
    a = {r["id"] for r in
         convex_polygon_query(df, convex).select("id").collect()}
    b = {r["id"] for r in
         polygon_query(df, convex).select("id").collect()}
    assert a == b


def test_geo_dateline_crossing(spark):
    """A distance circle near +-180 must keep in-radius points on the
    FAR side of the dateline (the clamped prefilter used to drop
    them), and box_query with min_lon > max_lon wraps like
    LatLonPoint.newBoxQuery's crossesDateline branch."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.spatial import (box_query,
                                                     distance_query,
                                                     haversine_meters)

    pts = [(i, (i % 21 - 10) * 0.5,
            ((179.0 + (i // 21) * 0.1 + 180.0) % 360.0) - 180.0)
           for i in range(21 * 21)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    lat0, lon0, r = 0.0, 179.7, 150_000.0
    got = {r_["id"] for r_ in distance_query(df, lat0, lon0, r).collect()}
    d = haversine_meters(F.col("lat"), F.col("lon"),
                         F.lit(lat0), F.lit(lon0))
    want = {r_["id"] for r_ in df.where(d <= r).collect()}
    assert got == want
    # matches exist on BOTH sides of the dateline
    lons = {lo for i, la, lo in pts if i in got}
    assert any(x > 0 for x in lons) and any(x < 0 for x in lons)
    # crossing box: [179.5, -179.5] == the two half-boxes
    crossing = {r_["id"] for r_ in box_query(
        df, -5.0, 5.0, 179.5, -179.5).collect()}
    straight = {r_["id"] for r_ in df.where(
        (F.col("lat").between(-5.0, 5.0))
        & ((F.col("lon") >= 179.5) | (F.col("lon") <= -179.5))).collect()}
    assert crossing == straight and crossing
