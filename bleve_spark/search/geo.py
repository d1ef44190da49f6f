"""Geo queries: distance and bounding-box over (lat, lon) columns.

Parity targets: /root/reference/search/query/geo_distance.go:60 and
geo_boundingbox.go:60 — both constant-scored filters. The distance
predicate implements the reference's haversine
(/root/reference/geo/geo_dist.go:88-98) with the latitude-dependent
ellipsoidal earth diameter computed in closed form
(/root/reference/geo/sloppy.go:29-49 uses a 1025-entry lookup table of
the same formula; we evaluate the formula exactly, so results differ
from the reference only by the table's quantization — well under the
metre at any radius). The engine expression and the SQL oracle use the
IDENTICAL formula, so engine↔oracle comparison is exact.

The reference stores geopoints as morton-interleaved prefix terms and
pre-filters via the term dictionary; in Spark the columnar source IS
the docvalue store, and parquet min/max pruning on lat/lon replaces
the term-prefix pre-filter.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, functions as F

# WGS84 semi-axes (sloppy.go:33-34)
_A = 6378137.0
_B = 6356752.31420

# distance units → meters — the reference's full distanceUnit table
# (/root/reference/geo/geo_dist.go:29-41): short and long suffixes
_UNITS = {
    "mm": 0.001, "cm": 0.01, "m": 1.0, "km": 1000.0,
    "mi": 1609.344, "yd": 0.9144, "ft": 0.3048, "in": 0.0254,
    "nm": 1852.0,
    "millimeters": 0.001, "centimeters": 0.01, "meters": 1.0,
    "kilometers": 1000.0, "miles": 1609.344, "yards": 0.9144,
    "feet": 0.3048, "inch": 0.0254, "nauticalmiles": 1852.0,
}

_DIST_RE = re.compile(r"^\s*([0-9.+-eE]+)\s*([a-zA-Z]*)\s*$")


def parse_distance(s) -> float:
    """Distance string → meters (geo.ParseDistance). Bare numbers are
    meters."""
    if isinstance(s, (int, float)):
        return float(s)
    m = _DIST_RE.match(str(s))
    if not m:
        raise ValueError(f"unparseable distance: {s!r}")
    val = float(m.group(1))
    unit = m.group(2).lower() or "m"
    if unit not in _UNITS:
        raise ValueError(f"unknown distance unit: {unit!r}")
    return val * _UNITS[unit]


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_decode(gh: str) -> tuple[float, float]:
    """Geohash → (lon, lat) cell center (public base32 interleaved
    bisection algorithm; the reference accepts geohashes anywhere a
    geopoint is accepted, geo/parse.go + geo/geohash.go)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in gh.lower():
        bits = _GEOHASH_B32.index(ch)
        for shift in range(4, -1, -1):
            bit = (bits >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2.0
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2.0
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lon_lo + lon_hi) / 2.0, (lat_lo + lat_hi) / 2.0)


def parse_geopoint(v) -> tuple[float, float]:
    """The reference's ExtractGeoPoint (geo/parse.go:25-47) → (lon,
    lat). Accepts: [lon, lat] slices (GeoJSON order), "lat, lon"
    strings, bare geohash strings, {lat, lon|lng} mappings."""
    if isinstance(v, (list, tuple)) and len(v) == 2:
        return float(v[0]), float(v[1])
    if isinstance(v, dict):
        lat = v.get("lat")
        lon = v.get("lon", v.get("lng"))
        if lat is None or lon is None:
            raise ValueError(f"unparseable geopoint: {v!r}")
        return float(lon), float(lat)
    if isinstance(v, str):
        if "," in v:
            lat_s, lon_s = v.split(",", 1)
            return float(lon_s.strip()), float(lat_s.strip())
        return geohash_decode(v)
    raise ValueError(f"unparseable geopoint: {v!r}")


def distance_unit_mult(unit: str) -> float:
    """Meters per ``unit`` (geo.ParseDistanceUnit) — for geo_distance
    sort value conversion (search/sort.go:625-646 unitMult)."""
    u = (unit or "m").lower()
    if u not in _UNITS:
        raise ValueError(f"unknown distance unit: {unit!r}")
    return _UNITS[u]


def earth_diameter_km_col(avg_lat_rad: Column) -> Column:
    """2·R(φ) in km for the WGS84 ellipsoid — closed form of
    sloppy.go's table entries."""
    lat = F.abs(avg_lat_rad)
    c, s = F.cos(lat), F.sin(lat)
    a2, b2 = _A * _A, _B * _B
    num = (F.lit(a2) * c) * (F.lit(a2) * c) + (F.lit(b2) * s) * (
        F.lit(b2) * s
    )
    den = (F.lit(_A) * c) * (F.lit(_A) * c) + (F.lit(_B) * s) * (
        F.lit(_B) * s
    )
    return F.lit(2.0) * F.sqrt(num / den) / F.lit(1000.0)


def haversine_km_col(
    lat_col: Column, lon_col: Column, lat: float, lon: float
) -> Column:
    """geo_dist.go:88-98, as native column arithmetic."""
    d2r = math.pi / 180.0
    x1 = lat_col.cast("double") * F.lit(d2r)
    x2 = F.lit(lat * d2r)
    h1 = F.lit(1.0) - F.cos(x1 - x2)
    h2 = F.lit(1.0) - F.cos(
        (lon_col.cast("double") - F.lit(float(lon))) * F.lit(d2r)
    )
    h = (h1 + F.cos(x1) * F.cos(F.lit(lat * d2r)) * h2) / F.lit(2.0)
    avg = (x1 + F.lit(lat * d2r)) / F.lit(2.0)
    return earth_diameter_km_col(avg) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h))
    )


def distance_pred(
    lat_col: Column, lon_col: Column, lat: float, lon: float,
    distance_meters: float,
) -> Column:
    """Haversine radius filter, guarded by a conservative lat/lon
    window (the reference pre-filters distance queries through morton
    prefix terms, search_geopointdistance.go:36-45; here the window's
    plain comparisons short-circuit the trig per row AND push down to
    parquet min/max stats when lat/lon are stored columns)."""
    from bleve_spark.search.geobbox import _expand_deg

    exact = (
        haversine_km_col(lat_col, lon_col, lat, lon)
        <= F.lit(distance_meters / 1000.0)
    )
    dlat, dlon = _expand_deg(lat, distance_meters)
    window = (lat_col >= F.lit(lat - dlat)) & (lat_col <= F.lit(lat + dlat))
    if dlon < 360.0 and lon - dlon >= -180.0 and lon + dlon <= 180.0:
        window = window & (
            (lon_col >= F.lit(lon - dlon)) & (lon_col <= F.lit(lon + dlon))
        )
    return window & exact


def bbox_pred(
    lat_col: Column, lon_col: Column,
    top_left_lon: float, top_left_lat: float,
    bottom_right_lon: float, bottom_right_lat: float,
) -> Column:
    """Bounding box with dateline wrap: minLon > maxLon splits into two
    ranges (the reference splits the same way,
    search_geoboundingbox.go)."""
    lat_ok = (lat_col >= F.lit(bottom_right_lat)) & (
        lat_col <= F.lit(top_left_lat)
    )
    if top_left_lon <= bottom_right_lon:
        lon_ok = (lon_col >= F.lit(top_left_lon)) & (
            lon_col <= F.lit(bottom_right_lon)
        )
    else:
        lon_ok = (lon_col >= F.lit(top_left_lon)) | (
            lon_col <= F.lit(bottom_right_lon)
        )
    return lat_ok & lon_ok


def polygon_pred(
    lat_col: Column, lon_col: Column, points: list[tuple[float, float]]
) -> Column:
    """Point-in-polygon by even-odd ray casting (the reference's
    boundingPolygon filter, search/query/geo_boundingpolygon.go:57 →
    geo searcher's winding test), unrolled as native column arithmetic
    over the (lon, lat) vertex list."""
    x, y = lon_col.cast("double"), lat_col.cast("double")
    inside = F.lit(False)
    n = len(points)
    for i in range(n):
        xi, yi = float(points[i][0]), float(points[i][1])
        xj, yj = float(points[(i + 1) % n][0]), float(points[(i + 1) % n][1])
        if yi == yj:
            continue  # horizontal edge never crosses the ray
        crosses = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
            x
            < (F.lit(xj - xi)) * (y - F.lit(yi)) / F.lit(yj - yi)
            + F.lit(xi)
        )
        inside = inside != crosses  # boolean XOR
    return inside


# --------------------------------------------------------------- shapes --
# GeoShape queries (/root/reference/search/query/geo_shape.go:104 →
# searcher.NewGeoShapeSearcher; shape model geo/README.md:1-32).
# Document shapes live in two native columns: `<field>_kind` (string:
# point | linestring | polygon) and `<field>_coords`
# (array<array<double>>, inner [lon, lat]; polygon rings CLOSED,
# first == last, per GeoJSON). Relations are evaluated as
# "doc shape RELATION query shape" with PLANAR lon/lat geometry — the
# reference uses s2 geodesic edges; at the city-park scale of its
# golden suite the two agree, and the divergence is documented here
# rather than hidden. QUERY polygon holes are honored (r3: GeoJSON
# ring nesting [outer, hole...] subtracts the holes); multi* query
# shapes decompose member-wise below; DOC-side hole rings require the
# parts engine (geoshape.py), which the mapping layer uses.


def _pip_expr(x: Column, y: Column, qpts: list[tuple[float, float]]):
    """Point (x, y exprs) in FIXED query polygon — even-odd ray cast
    unrolled over the query vertex list (same as polygon_pred)."""
    inside = F.lit(False)
    n = len(qpts)
    for i in range(n):
        xi, yi = float(qpts[i][0]), float(qpts[i][1])
        xj, yj = float(qpts[(i + 1) % n][0]), float(qpts[(i + 1) % n][1])
        if yi == yj:
            continue
        crosses = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
            x < (F.lit(xj - xi)) * (y - F.lit(yi)) / F.lit(yj - yi)
            + F.lit(xi)
        )
        inside = inside != crosses
    return inside


def point_in_doc_polygon(px: float, py: float, coords: Column) -> Column:
    """FIXED query point inside the doc's polygon ring (closed,
    variable length) — even-odd parity accumulated with a native
    aggregate over the edge index sequence."""
    n = F.size(coords)

    def edge_crosses(i):
        a = F.element_at(coords, i + 1)
        b = F.element_at(coords, i + 2)
        ax, ay = F.element_at(a, 1), F.element_at(a, 2)
        bx, by = F.element_at(b, 1), F.element_at(b, 2)
        # CASE WHEN is lazily evaluated: the straddle guard implies
        # ay != by, so the division never sees zero (Spark ANSI mode
        # THROWS on double division by zero — horizontal doc edges
        # would kill the query otherwise)
        return F.when(
            (ay > F.lit(py)) != (by > F.lit(py)),
            F.lit(px)
            < (bx - ax) * (F.lit(py) - ay) / (by - ay) + ax,
        ).otherwise(F.lit(False))

    return F.aggregate(
        F.sequence(F.lit(0), n - 2),
        F.lit(False),
        lambda acc, i: acc != edge_crosses(i),
    )


def _ccw(ax, ay, bx, by, cx, cy):
    """Orientation sign of (A→B→C): >0 counter-clockwise."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def doc_edges_intersect_query(
    coords: Column, qpts: list[tuple[float, float]],
    closed_query: bool = True,
) -> Column:
    """Any doc edge properly crosses any query edge (strict
    orientation test; degenerate touching/collinear cases are outside
    the synthetic-data contract and the planar model)."""
    nq = len(qpts)
    q_edges = [
        (qpts[i], qpts[(i + 1) % nq])
        for i in range(nq if closed_query else nq - 1)
    ]

    def edge_hits(i):
        a = F.element_at(coords, i + 1)
        b = F.element_at(coords, i + 2)
        ax, ay = F.element_at(a, 1), F.element_at(a, 2)
        bx, by = F.element_at(b, 1), F.element_at(b, 2)
        hit = F.lit(False)
        for (cx, cy), (dx, dy) in q_edges:
            cxl, cyl = F.lit(float(cx)), F.lit(float(cy))
            dxl, dyl = F.lit(float(dx)), F.lit(float(dy))
            d1 = _ccw(ax, ay, bx, by, cxl, cyl)
            d2 = _ccw(ax, ay, bx, by, dxl, dyl)
            d3 = _ccw(cxl, cyl, dxl, dyl, ax, ay)
            d4 = _ccw(cxl, cyl, dxl, dyl, bx, by)
            hit = hit | ((d1 * d2 < 0) & (d3 * d4 < 0))
        return hit

    return F.exists(
        F.sequence(F.lit(0), F.size(coords) - 2),
        lambda i: edge_hits(i),
    )


def _verts(coords: Column, pred_fn) -> tuple[Column, Column]:
    """(any vertex matches, all vertices match) for a unary predicate
    over [lon, lat] elements."""
    return (
        F.exists(coords, pred_fn),
        F.forall(coords, pred_fn),
    )


def shape_relation_parts(
    kind_col: Column,
    coords_col: Column,
    query_shape: dict,
    relation: str,
    bbox_cols: tuple | None = None,
    nondet_exact: bool = False,
) -> tuple[Column | None, Column]:
    """(coarse bbox pre-filter or None, exact predicate) — the two
    halves of :func:`shape_relation_pred`'s pruned form, exposed
    separately so a caller can re-balance the surviving rows BETWEEN
    them: the pre-filter is cheap native conjuncts that push into the
    parquet scan (with materialized ``bbox_cols``, min/max row-group
    pruning), the exact pass is the Arrow kernel whose per-row cost
    dominates and benefits from running wide."""
    from bleve_spark.search import geoshape_np
    from bleve_spark.search.geobbox import (
        flat_prefilter, query_shape_bbox,
    )

    if geoshape_np.ARROW_EXACT:
        # exact pass as ONE Arrow stage (HOFs are CodegenFallback
        # — interpreted per element); Catalyst splits the
        # conjunction so the bbox conjuncts still push into the
        # scan and the Arrow stage sees only surviving rows
        exact = geoshape_np.flat_exact_pred(
            kind_col, coords_col, query_shape, relation,
            nondet=nondet_exact,
        )
    else:
        exact = shape_relation_pred(
            kind_col, coords_col, query_shape, relation, prune=False
        )
    qb = query_shape_bbox(query_shape)
    if qb is None:
        return None, exact
    return flat_prefilter(coords_col, qb, relation, bbox_cols), exact


def shape_relation_pred(
    kind_col: Column,
    coords_col: Column,
    query_shape: dict,
    relation: str,
    bbox_cols: tuple | None = None,
    prune: bool = True,
) -> Column:
    """Compile (doc shape RELATION query shape) to one native column
    predicate. Query shapes: polygon {type, coordinates:[[lon,lat]...]}
    (closed or open — closed internally), envelope {type,
    coordinates:[[minlon,maxlat],[maxlon,minlat]]} (GeoJSON envelope
    order, geojson.go), circle {type, coordinates:[lon,lat], radius},
    point {type, coordinates:[lon,lat]}.

    When ``prune`` is set (default) a coarse bbox pre-filter is
    prepended — the Spark twin of the reference's s2 cell-term
    pre-filter (document/field_geoshape.go): cheap conjuncts Catalyst
    short-circuits before the exact geometry, and — with materialized
    ``bbox_cols`` — parquet min/max row-group pruning."""
    qtype = query_shape["type"].lower()
    relation = relation.lower()

    if prune:
        pre, exact = shape_relation_parts(
            kind_col, coords_col, query_shape, relation,
            bbox_cols=bbox_cols,
        )
        return exact if pre is None else pre & exact

    # multi* query shapes: a doc INTERSECTS the union iff it
    # intersects any member; is WITHIN the union iff within some
    # member (documented approximation: a doc straddling two disjoint
    # members is not recognized); CONTAINS the union iff it contains
    # every member.
    if qtype in ("multipolygon", "multilinestring"):
        member_type = qtype[len("multi"):]
        preds = [
            shape_relation_pred(
                kind_col, coords_col,
                {"type": member_type, "coordinates": part},
                relation, prune=False,
            )
            for part in query_shape["coordinates"]
        ]
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if relation == "contains" else (out | p)
        return out

    if qtype == "linestring":
        qpts = [tuple(map(float, p)) for p in query_shape["coordinates"]]
        is_point_d = kind_col == "point"
        is_poly_d = kind_col == "polygon"
        first_d = F.element_at(coords_col, 1)
        if relation == "intersects":
            # doc edges cross the open query path, or the path enters
            # a doc polygon (any query vertex inside it)
            cross = doc_edges_intersect_query(
                coords_col, qpts, closed_query=False
            )
            q_vert_in_doc = F.lit(False)
            for qx, qy in qpts:
                q_vert_in_doc = q_vert_in_doc | point_in_doc_polygon(
                    qx, qy, coords_col
                )
            return ~is_point_d & (cross | (is_poly_d & q_vert_in_doc))
        if relation == "contains":
            # only a doc polygon can contain a path: every query
            # vertex inside and no boundary crossing
            all_in = F.lit(True)
            for qx, qy in qpts:
                all_in = all_in & point_in_doc_polygon(
                    qx, qy, coords_col
                )
            return is_poly_d & all_in & ~doc_edges_intersect_query(
                coords_col, qpts, closed_query=False
            )
        if relation == "within":
            # measure-zero for points/polygons vs a path — matches
            # nothing in the planar model (the reference's s2
            # containment is likewise degenerate here)
            return F.lit(False) & is_point_d
        raise ValueError(f"unsupported relation: {relation!r}")

    qholes: list = []
    if qtype == "envelope":
        (tl_lon, tl_lat), (br_lon, br_lat) = query_shape["coordinates"]
        qpts = [
            (tl_lon, br_lat), (br_lon, br_lat),
            (br_lon, tl_lat), (tl_lon, tl_lat),
        ]
        qtype = "polygon"
    elif qtype == "polygon":
        qc = query_shape["coordinates"]
        # accept GeoJSON ring nesting: [outer, hole1, ...]; flat
        # vertex lists stay the single-ring fast path
        qholes = []
        if qc and qc[0] and isinstance(qc[0][0], (list, tuple)):
            rings = [[tuple(map(float, p)) for p in r] for r in qc]
            qpts = rings[0]
            qholes = [
                r[:-1] if r[0] == r[-1] else r for r in rings[1:]
            ]
        else:
            qpts = [tuple(map(float, p)) for p in qc]
        if qpts[0] == qpts[-1]:
            qpts = qpts[:-1]
    elif qtype in ("circle", "point"):
        qpts = None
    else:
        raise ValueError(f"unsupported query shape type: {qtype!r}")

    is_point = kind_col == "point"
    is_line = kind_col == "linestring"
    is_poly = kind_col == "polygon"
    first = F.element_at(coords_col, 1)
    fx, fy = F.element_at(first, 1), F.element_at(first, 2)

    if qtype == "circle":
        lon, lat = map(float, query_shape["coordinates"])
        radius_km = parse_distance(query_shape["radius"]) / 1000.0

        def within_r(v):
            return haversine_km_col(
                F.element_at(v, 2), F.element_at(v, 1), lat, lon
            ) <= F.lit(radius_km)

        any_in, all_in = _verts(coords_col, within_r)
        if relation == "within":
            # vertex test is exact for points; for lines/polygons it
            # is the documented planar/vertex approximation
            return all_in
        if relation == "intersects":
            return any_in
        if relation == "contains":
            # only a polygon can contain the circle's CENTER (vertex
            # approximation of circle containment)
            return is_poly & point_in_doc_polygon(lon, lat, coords_col)
        raise ValueError(f"unsupported relation: {relation!r}")

    if qtype == "point":
        px, py = map(float, query_shape["coordinates"])
        if relation == "contains":
            return is_poly & point_in_doc_polygon(px, py, coords_col)
        if relation in ("intersects", "within"):
            # a doc point intersects/lies-within a query point iff equal
            return is_point & (fx == F.lit(px)) & (fy == F.lit(py))
        raise ValueError(f"unsupported relation: {relation!r}")

    # ---- polygon / envelope query (region = outer minus holes) ----
    def v_in_q(v):
        pred = _pip_expr(F.element_at(v, 1), F.element_at(v, 2), qpts)
        for h in qholes:
            pred = pred & ~_pip_expr(
                F.element_at(v, 1), F.element_at(v, 2), h
            )
        return pred

    any_in, all_in = _verts(coords_col, v_in_q)
    edges_cross = doc_edges_intersect_query(coords_col, qpts)
    for h in qholes:
        # hole rings are region boundary too
        edges_cross = edges_cross | doc_edges_intersect_query(
            coords_col, h
        )
    q_vertex_in_doc = F.lit(False)
    for qx, qy in qpts:
        q_vertex_in_doc = q_vertex_in_doc | point_in_doc_polygon(
            qx, qy, coords_col
        )
    # a query hole buried inside a doc polygon (no crossings) breaks
    # within: the doc area under the hole is outside the region
    hole_vertex_in_doc = F.lit(False)
    for h in qholes:
        for hx, hy in h:
            hole_vertex_in_doc = (
                hole_vertex_in_doc
                | point_in_doc_polygon(hx, hy, coords_col)
            )

    if relation == "within":
        # all vertices inside and no boundary crossing (exact for the
        # planar model)
        return F.when(is_point, any_in).otherwise(
            all_in & ~edges_cross
            & ~(is_poly & hole_vertex_in_doc)
        )
    if relation == "intersects":
        return F.when(is_point, any_in).otherwise(
            any_in | edges_cross | (is_poly & q_vertex_in_doc)
        )
    if relation == "contains":
        all_q_in_doc = F.lit(True)
        for qx, qy in qpts:
            all_q_in_doc = all_q_in_doc & point_in_doc_polygon(
                qx, qy, coords_col
            )
        return is_poly & all_q_in_doc & ~edges_cross
    raise ValueError(f"unsupported relation: {relation!r}")


def polygon_pred_sql(
    lat_expr: str, lon_expr: str, points: list[tuple[float, float]]
) -> str:
    """The SAME even-odd test as :func:`polygon_pred`, as ANSI SQL."""
    terms = []
    n = len(points)
    for i in range(n):
        xi, yi = float(points[i][0]), float(points[i][1])
        xj, yj = float(points[(i + 1) % n][0]), float(points[(i + 1) % n][1])
        if yi == yj:
            continue
        terms.append(
            f"((({yi!r} > {lat_expr}) <> ({yj!r} > {lat_expr})) AND "
            f"({lon_expr} < ({xj - xi!r}) * ({lat_expr} - {yi!r}) "
            f"/ ({yj - yi!r}) + {xi!r}))"
        )
    expr = "FALSE"
    for t in terms:
        expr = f"({expr} <> {t})"
    return expr


def haversine_km_sql(lat_expr: str, lon_expr: str, lat: float,
                     lon: float) -> str:
    """The SAME formula as :func:`haversine_km_col`, as ANSI SQL — for
    DuckDB oracles (identical IEEE-754 op order)."""
    d2r = math.pi / 180.0
    a2, b2 = _A * _A, _B * _B
    x1 = f"({lat_expr} * {d2r!r})"
    x2 = f"{lat * d2r!r}"
    h1 = f"(1.0 - cos({x1} - {x2}))"
    h2 = f"(1.0 - cos(({lon_expr} - {float(lon)!r}) * {d2r!r}))"
    h = f"(({h1} + cos({x1}) * cos({x2}) * {h2}) / 2.0)"
    avg = f"abs(({x1} + {x2}) / 2.0)"
    num = (
        f"(({a2!r} * cos({avg})) * ({a2!r} * cos({avg}))"
        f" + ({b2!r} * sin({avg})) * ({b2!r} * sin({avg})))"
    )
    den = (
        f"(({_A!r} * cos({avg})) * ({_A!r} * cos({avg}))"
        f" + ({_B!r} * sin({avg})) * ({_B!r} * sin({avg})))"
    )
    diam = f"(2.0 * sqrt({num} / {den}) / 1000.0)"
    return f"({diam} * asin(least(1.0, sqrt({h}))))"
