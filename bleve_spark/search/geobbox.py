"""Coarse spatial pruning for geo/geoshape relation queries.

The reference pre-filters shape relations through s2 cell terms in the
term dictionary (/root/reference/document/field_geoshape.go,
geo/README.md:1-32) so a relation query never evaluates exact geometry
against every document. The Spark-native twin is a bounding-box
pre-filter:

* the QUERY shape's bbox is computed once, driver-side;
* each DOC shape's bbox is either computed inline (cheap native
  array min/max over its vertices — still orders of magnitude cheaper
  than the exact PIP/edge predicates it guards, and short-circuited
  per row by conjunct ordering), or read from materialized
  ``<field>_bbox_*`` columns written at index time
  (:func:`with_flat_shape_bbox` / :func:`with_parts_bbox`) — plain
  double columns whose min/max parquet stats give ROW-GROUP pruning,
  the at-rest analogue of the reference's cell-term pre-filter.

Necessary-condition math (planar model, matching the exact predicates
in search/geo.py + search/geoshape.py, which are themselves planar —
only circle tests use haversine):

* INTERSECTS: extents must overlap → doc OUTER bbox (vertex hull +
  conservative circle-radius expansion) overlaps query OUTER bbox.
* WITHIN: every doc part sits inside some query part ⊆ query extent →
  doc INNER bbox (vertex hull only — a subset of the true extent, so
  the test can never wrongly exclude) inside query OUTER bbox.
* CONTAINS: query extent ⊆ doc extent → query INNER bbox inside doc
  OUTER bbox.

Circle expansions use conservative meters→degrees factors (divisor
110 000 m/deg < the true minimum 110 946, times a 1.05 margin) and
degrade to "no lon pruning" near the dateline or poles, where
haversine wraps; a query shape that is itself dateline/pole-ambiguous
disables pruning entirely (``query_shape_bbox`` → None). False
positives only ever fall through to the exact predicate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# meters per degree: conservative UNDER-estimate (true minimum is
# ~110 946 m/deg along a meridian) so degree margins OVER-estimate
_M_PER_DEG_FLOOR = 110_000.0
_MARGIN = 1.05


def _expand_deg(lat_abs_hi: float, radius_m: float) -> tuple:
    """(dlat_deg, dlon_deg) over-estimates for a radius in meters
    around latitudes up to |lat_abs_hi|. dlon = 360 means the lon
    neighborhood is unbounded (pole-adjacent)."""
    dlat = radius_m / _M_PER_DEG_FLOOR * _MARGIN + 1e-9
    lat_hi = abs(lat_abs_hi) + dlat
    if lat_hi > 88.0:
        return dlat, 360.0
    dlon = (
        radius_m
        / (_M_PER_DEG_FLOOR * math.cos(math.radians(lat_hi)))
        * _MARGIN
        + 1e-9
    )
    return dlat, dlon


def _norm_query_shape(shape: dict) -> dict:
    """Accept both the GeoJSON ring nesting (parts engine) and the
    flat vertex-list polygon convention of search/geo.py's
    shape_relation_pred."""
    t = shape.get("type", "").lower()
    c = shape.get("coordinates")
    if t == "polygon" and c and c[0] and not isinstance(
            c[0][0], (list, tuple)):
        return {**shape, "coordinates": [c]}
    if t == "multipolygon" and c and c[0] and c[0][0] and not isinstance(
            c[0][0][0], (list, tuple)):
        return {**shape, "coordinates": [[r] for r in c]}
    return shape


def query_shape_bbox(query_shape: dict) -> dict | None:
    """Inner/outer bbox of a GeoJSON query shape, or ``None`` when no
    safe planar bbox exists (dateline-crossing or pole-adjacent outer
    extent) — callers then skip pruning entirely."""
    from bleve_spark.search.geoshape import geojson_to_parts

    try:
        parts = geojson_to_parts(_norm_query_shape(query_shape))
    except (ValueError, KeyError, TypeError):
        return None
    if not parts:
        return None
    in_minlon = in_minlat = float("inf")
    in_maxlon = in_maxlat = float("-inf")
    out_minlon = out_minlat = float("inf")
    out_maxlon = out_maxlat = float("-inf")
    for kind, ring, radius, _holes in parts:
        lons = [p[0] for p in ring]
        lats = [p[1] for p in ring]
        lo_lon, hi_lon = min(lons), max(lons)
        lo_lat, hi_lat = min(lats), max(lats)
        in_minlon = min(in_minlon, lo_lon)
        in_maxlon = max(in_maxlon, hi_lon)
        in_minlat = min(in_minlat, lo_lat)
        in_maxlat = max(in_maxlat, hi_lat)
        if kind == "circle" and radius > 0:
            dlat, dlon = _expand_deg(max(abs(lo_lat), abs(hi_lat)), radius)
            if dlon >= 360.0:
                return None
            lo_lon, hi_lon = lo_lon - dlon, hi_lon + dlon
            lo_lat, hi_lat = lo_lat - dlat, hi_lat + dlat
        out_minlon = min(out_minlon, lo_lon)
        out_maxlon = max(out_maxlon, hi_lon)
        out_minlat = min(out_minlat, lo_lat)
        out_maxlat = max(out_maxlat, hi_lat)
    # dateline ambiguity: an extent wider than a hemisphere, or a
    # circle expansion spilling past ±180, can wrap — don't prune
    if out_maxlon - out_minlon > 180.0 or out_minlon < -180.0 \
            or out_maxlon > 180.0:
        return None
    return {
        "in": (in_minlon, in_minlat, in_maxlon, in_maxlat),
        "out": (out_minlon, out_minlat, out_maxlon, out_maxlat),
    }


# --------------------------------------------------- doc-side bbox exprs --


def coords_bbox_exprs(coords_col: Column) -> tuple:
    """(minlon, minlat, maxlon, maxlat) of a flat vertex list
    (array<array<double>>, inner [lon, lat]) — native array min/max."""
    lons = F.transform(coords_col, lambda v: F.element_at(v, 1))
    lats = F.transform(coords_col, lambda v: F.element_at(v, 2))
    return (
        F.array_min(lons), F.array_min(lats),
        F.array_max(lons), F.array_max(lats),
    )


def parts_bbox_exprs(parts_col: Column) -> dict:
    """Inner (vertex hull) and outer (radius-expanded) bbox columns of
    a PARTS shape column. Keys: in_minlon, in_minlat, in_maxlon,
    in_maxlat, out_minlon, out_minlat, out_maxlon, out_maxlat. Outer
    lon bounds degrade to ±180 (no lon pruning) when a circle part's
    expansion crosses the dateline or nears a pole."""

    def ring_min(p, i):
        return F.array_min(
            F.transform(p["ring"], lambda v: F.element_at(v, i))
        )

    def ring_max(p, i):
        return F.array_max(
            F.transform(p["ring"], lambda v: F.element_at(v, i))
        )

    def agg_min(fn):
        return F.array_min(F.transform(parts_col, fn))

    def agg_max(fn):
        return F.array_max(F.transform(parts_col, fn))

    out = {
        "in_minlon": agg_min(lambda p: ring_min(p, 1)),
        "in_minlat": agg_min(lambda p: ring_min(p, 2)),
        "in_maxlon": agg_max(lambda p: ring_max(p, 1)),
        "in_maxlat": agg_max(lambda p: ring_max(p, 2)),
    }

    def dlat(p):
        return p["radius"] / F.lit(_M_PER_DEG_FLOOR) * F.lit(_MARGIN)

    def lat_hi(p):
        return (
            F.greatest(F.abs(ring_min(p, 2)), F.abs(ring_max(p, 2)))
            + dlat(p)
        )

    def dlon(p):
        # radius == 0 parts expand by 0; pole-adjacent → 360 (wrap)
        return F.when(p["radius"] <= 0, F.lit(0.0)).when(
            lat_hi(p) > 88.0, F.lit(360.0)
        ).otherwise(
            p["radius"]
            / (F.lit(_M_PER_DEG_FLOOR)
               * F.cos(F.radians(F.least(lat_hi(p), F.lit(88.0)))))
            * F.lit(_MARGIN)
        )

    o_minlon = agg_min(lambda p: ring_min(p, 1) - dlon(p))
    o_maxlon = agg_max(lambda p: ring_max(p, 1) + dlon(p))
    wrap = (o_minlon < F.lit(-180.0)) | (o_maxlon > F.lit(180.0))
    out["out_minlon"] = F.when(wrap, F.lit(-180.0)).otherwise(o_minlon)
    out["out_maxlon"] = F.when(wrap, F.lit(180.0)).otherwise(o_maxlon)
    out["out_minlat"] = agg_min(lambda p: ring_min(p, 2) - dlat(p))
    out["out_maxlat"] = agg_max(lambda p: ring_max(p, 2) + dlat(p))
    return out


# ----------------------------------------------------------- pre-filters --


def _box_pred(doc_box: tuple, qb: dict, relation: str) -> Column:
    """doc_box = (in_minlon, in_minlat, in_maxlon, in_maxlat,
    out_minlon, in... out_maxlat) column 8-tuple."""
    (d_in_minlon, d_in_minlat, d_in_maxlon, d_in_maxlat,
     d_out_minlon, d_out_minlat, d_out_maxlon, d_out_maxlat) = doc_box
    q_in = qb["in"]
    q_out = qb["out"]
    if relation == "intersects":
        return (
            (d_out_maxlon >= F.lit(q_out[0]))
            & (d_out_minlon <= F.lit(q_out[2]))
            & (d_out_maxlat >= F.lit(q_out[1]))
            & (d_out_minlat <= F.lit(q_out[3]))
        )
    if relation == "within":
        return (
            (d_in_minlon >= F.lit(q_out[0]))
            & (d_in_maxlon <= F.lit(q_out[2]))
            & (d_in_minlat >= F.lit(q_out[1]))
            & (d_in_maxlat <= F.lit(q_out[3]))
        )
    if relation == "contains":
        return (
            (d_out_minlon <= F.lit(q_in[0]))
            & (d_out_maxlon >= F.lit(q_in[2]))
            & (d_out_minlat <= F.lit(q_in[1]))
            & (d_out_maxlat >= F.lit(q_in[3]))
        )
    raise ValueError(f"unsupported relation: {relation!r}")


def flat_prefilter(
    coords_col: Column, qb: dict, relation: str,
    bbox_cols: tuple | None = None,
) -> Column:
    """bbox pre-filter for the flat (kind, coords) doc-shape layout —
    flat shapes have no radius, so inner == outer. ``bbox_cols`` =
    (minlon, minlat, maxlon, maxlat) Columns when materialized."""
    if bbox_cols is not None:
        mnlon, mnlat, mxlon, mxlat = bbox_cols
    else:
        mnlon, mnlat, mxlon, mxlat = coords_bbox_exprs(coords_col)
    return _box_pred(
        (mnlon, mnlat, mxlon, mxlat, mnlon, mnlat, mxlon, mxlat),
        qb, relation,
    )


def parts_prefilter(
    parts_col: Column, qb: dict, relation: str,
    bbox_cols: dict | None = None,
) -> Column:
    b = bbox_cols if bbox_cols is not None else parts_bbox_exprs(parts_col)
    return _box_pred(
        (b["in_minlon"], b["in_minlat"], b["in_maxlon"], b["in_maxlat"],
         b["out_minlon"], b["out_minlat"], b["out_maxlon"],
         b["out_maxlat"]),
        qb, relation,
    )


# --------------------------------------------------------- materializers --


def with_flat_shape_bbox(df: DataFrame, field: str,
                         coords_col: str | None = None) -> DataFrame:
    """Materialize ``<field>_bbox_{minlon,minlat,maxlon,maxlat}`` from
    the flat ``<field>_coords`` column. Written to parquet, these four
    double columns carry min/max page stats — a far-away query shape
    prunes whole row groups without touching the geometry."""
    mnlon, mnlat, mxlon, mxlat = coords_bbox_exprs(
        F.col(coords_col or f"{field}_coords")
    )
    return (
        df.withColumn(f"{field}_bbox_minlon", mnlon)
        .withColumn(f"{field}_bbox_minlat", mnlat)
        .withColumn(f"{field}_bbox_maxlon", mxlon)
        .withColumn(f"{field}_bbox_maxlat", mxlat)
    )


FLAT_BBOX_SUFFIXES = ("minlon", "minlat", "maxlon", "maxlat")
PARTS_BBOX_KEYS = (
    "in_minlon", "in_minlat", "in_maxlon", "in_maxlat",
    "out_minlon", "out_minlat", "out_maxlon", "out_maxlat",
)


def with_parts_bbox(df: DataFrame, parts_col: str,
                    prefix: str) -> DataFrame:
    """Materialize ``<prefix>_bbox_<key>`` columns for a PARTS shape
    column (8 columns: inner vertex hull + outer radius-expanded)."""
    exprs = parts_bbox_exprs(F.col(parts_col))
    for k in PARTS_BBOX_KEYS:
        df = df.withColumn(f"{prefix}_bbox_{k}", exprs[k])
    return df


def flat_bbox_cols_if_present(df: DataFrame, field: str) -> tuple | None:
    names = [f"{field}_bbox_{s}" for s in FLAT_BBOX_SUFFIXES]
    if all(n in df.columns for n in names):
        return tuple(F.col(n) for n in names)
    return None


def parts_bbox_cols_if_present(df: DataFrame, prefix: str) -> dict | None:
    names = {k: f"{prefix}_bbox_{k}" for k in PARTS_BBOX_KEYS}
    if all(n in df.columns for n in names.values()):
        return {k: F.col(n) for k, n in names.items()}
    return None
