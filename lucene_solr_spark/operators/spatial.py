"""Geo/spatial queries: the LatLonPoint trio re-expressed as Catalyst
column algebra (lucene/core/src/java/org/apache/lucene/document/
LatLonPoint.java newBoxQuery/newDistanceQuery + sandbox
LatLonPointDistanceQuery / NearestNeighbor):

  newBoxQuery        -> range predicates on (lat, lon) columns; with a
                        lat/lon-sorted or partitioned layout these
                        reach the scan as PushedFilters (the BKD-tree
                        cell pruning becomes row-group/partition
                        pruning)
  newDistanceQuery   -> bounding-box prefilter (cheap, index-prunable)
                        + exact haversine verify — LatLonPoint's own
                        two-phase: BKD box visit then haversin check
  nearest (KNN)      -> top-k by (distance, id), TakeOrderedAndProject

Distance = great-circle haversine on the mean-radius sphere
(geo/GeoUtils.java EARTH_MEAN_RADIUS_METERS = 6371008.7714;
util/SloppyMath.haversinMeters semantics in exact double math —
we skip SloppyMath's table-driven approximations, which only trade
accuracy for JVM speed). Engine-portable determinism: distances are
quantized floor(meters) for cross-engine comparison; sub-ulp libm
differences are absorbed exactly as for BM25 score quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EARTH_MEAN_RADIUS_METERS = 6_371_008.7714


def haversine_meters(lat1: Column, lon1: Column,
                     lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine, mean radius)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.sin(dlat / 2) * F.sin(dlat / 2)
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2))
    return (F.lit(2.0 * EARTH_MEAN_RADIUS_METERS)
            * F.asin(F.least(F.lit(1.0), F.sqrt(a))))


def box_query(df: DataFrame, min_lat: float, max_lat: float,
              min_lon: float, max_lon: float,
              lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """LatLonPoint.newBoxQuery: rectangle containment. A crossing box
    (min_lon > max_lon) wraps the dateline — the reference splits it
    into two half-boxes internally (LatLonPoint.newBoxQuery's
    crossesDateline branch); here that is one OR predicate, still a
    min/max-prunable scan filter on the lon column."""
    lat_ok = (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
    if min_lon > max_lon:  # crosses the dateline
        return df.where(lat_ok & ((F.col(lon_col) >= min_lon)
                                  | (F.col(lon_col) <= max_lon)))
    return df.where(
        lat_ok & (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon))


def _bbox_of_circle(lat: float, lon: float, radius_m: float):
    """Bounding box of a distance circle (GeoUtils.Rectangle
    .fromPointDistance semantics): the longitude extreme of a
    great-circle disc is asin(sin(c)/cos(lat)) — NOT c/cos(lat),
    which under-covers near the edge — and a disc reaching a pole
    spans all longitudes. Conservative prefilter only; the exact
    haversine verify follows."""
    import math

    c = radius_m / EARTH_MEAN_RADIUS_METERS  # angular radius, radians
    dlat = math.degrees(c)
    lo_lat, hi_lat = max(lat - dlat, -90.0), min(lat + dlat, 90.0)
    if lo_lat <= -90.0 + 1e-12 or hi_lat >= 90.0 - 1e-12 or c >= math.pi / 2:
        return (lo_lat, hi_lat, -180.0, 180.0)  # disc reaches a pole
    ratio = math.sin(c) / math.cos(math.radians(lat))
    if ratio >= 1.0:
        return (lo_lat, hi_lat, -180.0, 180.0)
    dlon = math.degrees(math.asin(ratio)) + 1e-9  # cover libm slack
    lo_lon, hi_lon = lon - dlon, lon + dlon
    # wrap across the dateline instead of clamping (clamping silently
    # DROPPED in-radius points on the far side of +-180): a wrapped
    # window comes back as a crossing box (lo > hi), which box_query
    # evaluates as the reference's two half-boxes
    if lo_lon < -180.0:
        lo_lon += 360.0
    if hi_lon > 180.0:
        hi_lon -= 360.0
    return (lo_lat, hi_lat, lo_lon, hi_lon)


def distance_query(df: DataFrame, lat: float, lon: float, radius_m: float,
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """LatLonPoint.newDistanceQuery: two-phase — index-prunable
    bounding-box prefilter, then exact haversine <= radius."""
    lo_lat, hi_lat, lo_lon, hi_lon = _bbox_of_circle(lat, lon, radius_m)
    boxed = box_query(df, lo_lat, hi_lat, lo_lon, hi_lon, lat_col, lon_col)
    d = haversine_meters(F.col(lat_col), F.col(lon_col),
                         F.lit(float(lat)), F.lit(float(lon)))
    return boxed.where(d <= F.lit(float(radius_m)))


def nearest(df: DataFrame, lat: float, lon: float, k: int,
            id_col: str, lat_col: str = "lat",
            lon_col: str = "lon") -> DataFrame:
    """LatLonPoint nearest-neighbor: top-k by (distance asc, id asc),
    distance quantized to whole meters for engine portability.
    Returns (id, dist_m, rank)."""
    d = haversine_meters(F.col(lat_col), F.col(lon_col),
                         F.lit(float(lat)), F.lit(float(lon)))
    scored = df.select(F.col(id_col),
                       F.floor(d).cast("long").alias("dist_m"))
    order = [F.asc("dist_m"), F.asc(id_col)]
    w = Window.orderBy(*order)
    return (scored.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))


def _ray_cast_cond(ring: list[tuple[float, float]], lat_col: str,
                   lon_col: str) -> Column:
    """Even-odd crossing parity of a westward ray from the point
    against one ring (the PNPOLY form of Polygon.java's contains()
    crossing count): an edge contributes a crossing iff it straddles
    the point's latitude and its longitude-intercept at that latitude
    lies east of the point. Parity folds as a boolean XOR chain —
    pure column arithmetic, identical in any SQL engine."""
    if len(ring) < 3:
        raise ValueError("ring needs >= 3 vertices")
    cond = F.lit(False)
    n = len(ring)
    p_lat, p_lon = F.col(lat_col), F.col(lon_col)
    for i in range(n):
        a_lat, a_lon = ring[i]
        b_lat, b_lon = ring[(i + 1) % n]
        if a_lat == b_lat:
            continue  # parallel to the ray: never straddles
        straddles = (F.lit(a_lat) > p_lat) != (F.lit(b_lat) > p_lat)
        xint = (F.lit(b_lon - a_lon) * (p_lat - F.lit(a_lat))
                / F.lit(b_lat - a_lat) + F.lit(a_lon))
        cond = cond != (straddles & (p_lon < xint))  # boolean XOR
    return cond


def polygon_query(df: DataFrame, shell: list[tuple[float, float]],
                  holes: list[list[tuple[float, float]]] = (),
                  lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """General PLANAR polygon containment with holes
    (core/geo/Polygon.java + document/LatLonPointInPolygonQuery):
    inside the shell by even-odd ray casting AND outside every hole.
    Arbitrary (also concave) rings, any vertex order. Stays planar —
    the reference's geodesic edge interpolation (Polygon2D's lat/lon
    crossing refinement) is out of scope, documented; for the
    sub-degree edges of typical filters the planar/geodesic gap is
    below the coordinate lattice."""
    cond = _ray_cast_cond(shell, lat_col, lon_col)
    for h in holes:
        cond = cond & ~_ray_cast_cond(h, lat_col, lon_col)
    return df.where(cond)


def convex_polygon_query(df: DataFrame, vertices: list[tuple[float, float]],
                         lat_col: str = "lat",
                         lon_col: str = "lon") -> DataFrame:
    """Convex-polygon containment (the planar-convex fast path of
    LatLonPoint.newPolygonQuery; general/concave rings and holes go
    through polygon_query's ray casting): vertices as (lat, lon) in
    counter-clockwise order; a point is inside iff every edge's cross
    product (b-a) x (p-a) >= 0. Pure arithmetic inequalities — they
    reach the scan, and the same expressions run in any SQL engine."""
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    cond = None
    n = len(vertices)
    for i in range(n):
        a_lat, a_lon = vertices[i]
        b_lat, b_lon = vertices[(i + 1) % n]
        cross = ((F.lit(b_lon - a_lon))
                 * (F.col(lat_col) - F.lit(a_lat))
                 - (F.lit(b_lat - a_lat))
                 * (F.col(lon_col) - F.lit(a_lon)))
        c = cross >= 0
        cond = c if cond is None else (cond & c)
    return df.where(cond)
