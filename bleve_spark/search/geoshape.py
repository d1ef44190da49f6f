"""Generalized geoshape engine: PARTS-based shapes.

Every GeoJSON geometry the reference indexes
(/root/reference/geo/README.md, search/query/geo_shape.go) normalizes
to a LIST OF PARTS, each part one of four primitive kinds:

    point | linestring | polygon (single closed ring) | circle

point → 1 part; multipoint → one point part per coordinate;
linestring/multilinestring → path parts; polygon/multipolygon → outer
rings plus hole rings (r3: a 4th struct field `holes`; a point inside
a hole is outside the polygon); envelope → its rectangle ring; circle
→ a center part + radius (meters); geometrycollection → the
concatenation of its members' parts.

Document storage: one column `<field>_parts`
(array<struct<kind string, ring array<array<double>>, radius double>>)
— relations compile to native higher-order functions over the parts
array. Relations are evaluated as doc RELATION query with the s2
semantics restated planar (equirectangular metric distances at city
scale; haversine for point radii):

* intersects: ∃ doc part, ∃ query part: parts intersect
* within:     ∀ doc parts: contained in the UNION of the query parts
              (r3 exact polygon-union path: a doc part straddling two
              adjacent query polygons is recognized via the native
              union test; see q_geo_shape_union_within)
* contains:   ∀ query parts: ∃ doc part containing it

Verified against the reference's LARGEST golden suite
(test/tests/geoshapes/searches.json, 35 searches / 9 shape docs) in
tests/test_reference_goldens_geoshapes.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

from bleve_spark.search.geo import (
    _pip_expr,
    doc_edges_intersect_query,
    haversine_km_col,
    parse_distance,
)

PARTS_SCHEMA = (
    "array<struct<kind: string, ring: array<array<double>>, "
    "radius: double, holes: array<array<array<double>>>>>"
)

_M_PER_DEG_LAT = 110540.0
_M_PER_DEG_LON_EQ = 111320.0


def _close(ring: list) -> list:
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    return ring


def geojson_to_parts(shape: dict) -> list[tuple]:
    """GeoJSON-ish dict →
    [(kind, [[lon, lat], ...], radius_m, holes)] where ``holes`` is a
    list of closed inner rings (polygon parts only — GeoJSON rings
    c[1:], subtracted from the outer ring's region; geo/README.md's s2
    polygons carry holes the same way)."""
    t = shape["type"].lower()
    c = shape.get("coordinates")
    if t == "point":
        return [("point", [list(map(float, c))], 0.0, [])]
    if t == "multipoint":
        return [("point", [list(map(float, p))], 0.0, []) for p in c]
    if t == "linestring":
        return [("linestring", [list(map(float, p)) for p in c], 0.0,
                 [])]
    if t == "multilinestring":
        return [
            ("linestring", [list(map(float, p)) for p in part], 0.0,
             [])
            for part in c
        ]
    if t == "polygon":
        ring = _close([list(map(float, p)) for p in c[0]])
        holes = [
            _close([list(map(float, p)) for p in h]) for h in c[1:]
        ]
        return [("polygon", ring, 0.0, holes)]
    if t == "multipolygon":
        out = []
        for poly in c:
            ring = _close([list(map(float, p)) for p in poly[0]])
            holes = [
                _close([list(map(float, p)) for p in h])
                for h in poly[1:]
            ]
            out.append(("polygon", ring, 0.0, holes))
        return out
    if t == "envelope":
        (lo_lon, hi_lat), (hi_lon, lo_lat) = c
        ring = [
            [float(lo_lon), float(lo_lat)], [float(hi_lon), float(lo_lat)],
            [float(hi_lon), float(hi_lat)], [float(lo_lon), float(hi_lat)],
            [float(lo_lon), float(lo_lat)],
        ]
        return [("polygon", ring, 0.0, [])]
    if t == "circle":
        return [
            ("circle", [list(map(float, c))],
             parse_distance(shape["radius"]), [])
        ]
    if t == "geometrycollection":
        out = []
        for g in shape["geometries"]:
            out.extend(geojson_to_parts(g))
        return out
    raise ValueError(f"unsupported shape type: {t!r}")


# ----------------------------------------------------- metric helpers --


def _hav_m(lat_col, lon_col, lat: float, lon: float) -> Column:
    return haversine_km_col(lat_col, lon_col, lat, lon) * F.lit(1000.0)


def _const_pt_to_docsegs_min_m(cx: float, cy: float, ring: Column,
                               closed: bool) -> Column:
    """Min distance (meters) from a FIXED point to the doc part's
    segments — local equirectangular projection around the point."""
    kx = _M_PER_DEG_LON_EQ * math.cos(math.radians(cy))
    ky = _M_PER_DEG_LAT

    def seg_d(i):
        a = F.element_at(ring, i + 1)
        b = F.element_at(ring, i + 2)
        ax = (F.element_at(a, 1) - F.lit(cx)) * F.lit(kx)
        ay = (F.element_at(a, 2) - F.lit(cy)) * F.lit(ky)
        bx = (F.element_at(b, 1) - F.lit(cx)) * F.lit(kx)
        by = (F.element_at(b, 2) - F.lit(cy)) * F.lit(ky)
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = F.when(
            len2 > 0, (-(ax * dx + ay * dy)) / len2
        ).otherwise(F.lit(0.0))
        t = F.greatest(F.lit(0.0), F.least(F.lit(1.0), t))
        px, py = ax + t * dx, ay + t * dy
        return F.sqrt(px * px + py * py)

    n_edges = F.size(ring) - 1
    return F.aggregate(
        F.sequence(F.lit(0), n_edges - 1),
        F.lit(float("inf")),
        lambda acc, i: F.least(acc, seg_d(i)),
    )


def _docpt_to_qsegs_min_m(px: Column, py: Column,
                          verts: list, closed: bool) -> Column:
    """Min distance (meters) from a doc point COLUMN to the FIXED
    query part's segments (projection around the query centroid)."""
    cy = sum(v[1] for v in verts) / len(verts)
    kx = _M_PER_DEG_LON_EQ * math.cos(math.radians(cy))
    ky = _M_PER_DEG_LAT
    n = len(verts)
    edges = range(n if closed else n - 1)
    best = F.lit(float("inf"))
    for i in edges:
        ax, ay = verts[i]
        bx, by = verts[(i + 1) % n]
        dxm, dym = (bx - ax) * kx, (by - ay) * ky
        len2 = dxm * dxm + dym * dym
        pxm = (px - F.lit(ax)) * F.lit(kx)
        pym = (py - F.lit(ay)) * F.lit(ky)
        if len2 > 0:
            t = (pxm * F.lit(dxm) + pym * F.lit(dym)) / F.lit(len2)
            t = F.greatest(F.lit(0.0), F.least(F.lit(1.0), t))
        else:
            t = F.lit(0.0)
        ddx = pxm - t * F.lit(dxm)
        ddy = pym - t * F.lit(dym)
        best = F.least(best, F.sqrt(ddx * ddx + ddy * ddy))
    return best


# ------------------------------------------------- part-pair predicates --


def _verts_all(ring: Column, fn) -> Column:
    return F.forall(ring, fn)


def _verts_any(ring: Column, fn) -> Column:
    return F.exists(ring, fn)


def _q_verts_in_docring(qverts: list, ring: Column) -> tuple:
    """(any, all) of the FIXED query vertices inside the doc ring."""
    from bleve_spark.search.geo import point_in_doc_polygon

    preds = [point_in_doc_polygon(x, y, ring) for x, y in qverts]
    any_p = preds[0]
    all_p = preds[0]
    for p in preds[1:]:
        any_p = any_p | p
        all_p = all_p & p
    return any_p, all_p


def _in_q_region(x, y, qverts: list, qholes: list) -> Column:
    """Point column in the query polygon's REGION: inside the outer
    ring and outside every hole ring (GeoJSON c[1:] subtraction)."""
    pred = _pip_expr(x, y, qverts[:-1])
    for h in qholes:
        pred = pred & ~_pip_expr(x, y, h[:-1])
    return pred


def _cross_q_rings(ring: Column, qverts: list, qholes: list,
                   closed_query: bool = True) -> Column:
    """Doc edges crossing ANY query ring (outer or hole) — hole edges
    are region boundary too."""
    cross = doc_edges_intersect_query(
        ring, qverts[:-1] if closed_query else qverts,
        closed_query=closed_query,
    )
    for h in qholes:
        cross = cross | doc_edges_intersect_query(ring, h[:-1])
    return cross


def _pt_in_doc_region(qx: float, qy: float, ring: Column,
                      holes: Column | None) -> Column:
    """Fixed point inside the doc polygon part's region (outer ring
    minus its holes)."""
    from bleve_spark.search.geo import point_in_doc_polygon

    inside = point_in_doc_polygon(qx, qy, ring)
    if holes is not None:
        inside = inside & ~F.exists(
            holes, lambda h: point_in_doc_polygon(qx, qy, h)
        )
    return inside


def _doc_holes_cross(holes: Column | None, qverts: list,
                     closed_query: bool = True) -> Column:
    if holes is None:
        return F.lit(False)
    return F.exists(
        holes,
        lambda h: doc_edges_intersect_query(
            h, qverts, closed_query=closed_query
        ),
    )


def _pair_preds(doc_kind: str, ring: Column, rd: Column, qpart,
                holes: Column | None = None) -> dict:
    """{'intersects','within','contains'} for one doc-part kind vs one
    FIXED query part.  ``holes`` = the doc polygon part's hole rings
    (None/empty elsewhere); qpart carries the query part's holes."""
    qk, qverts, qr, qholes = qpart
    first = F.element_at(ring, 1)
    fx, fy = F.element_at(first, 1), F.element_at(first, 2)
    FALSE = F.lit(False)
    out = {"intersects": FALSE, "within": FALSE, "contains": FALSE}

    if doc_kind == "point":
        if qk == "point":
            qx, qy = qverts[0]
            eq = (fx == F.lit(qx)) & (fy == F.lit(qy))
            out = {"intersects": eq, "within": eq, "contains": eq}
        elif qk == "polygon":
            pip = _in_q_region(fx, fy, qverts, qholes)
            out["intersects"] = pip
            out["within"] = pip
        elif qk == "circle":
            d = _hav_m(fy, fx, qverts[0][1], qverts[0][0])
            out["intersects"] = d <= F.lit(qr)
            out["within"] = d <= F.lit(qr)
        return out

    if doc_kind == "linestring":
        if qk == "polygon":
            pip = lambda v: _in_q_region(  # noqa: E731
                F.element_at(v, 1), F.element_at(v, 2), qverts, qholes
            )
            cross = _cross_q_rings(ring, qverts, qholes)
            out["intersects"] = _verts_any(ring, pip) | cross
            out["within"] = _verts_all(ring, pip) & ~cross
        elif qk == "linestring":
            out["intersects"] = doc_edges_intersect_query(
                ring, qverts, closed_query=False
            )
        elif qk == "circle":
            cx, cy = qverts[0]
            d = _const_pt_to_docsegs_min_m(cx, cy, ring, closed=False)
            out["intersects"] = d <= F.lit(qr)
            out["within"] = _verts_all(
                ring,
                lambda v: _hav_m(
                    F.element_at(v, 2), F.element_at(v, 1), cy, cx
                ) <= F.lit(qr),
            )
        return out

    if doc_kind == "polygon":
        if qk == "point":
            qx, qy = qverts[0]
            inside = _pt_in_doc_region(qx, qy, ring, holes)
            out["intersects"] = inside
            out["contains"] = inside
        elif qk == "polygon":
            pip = lambda v: _in_q_region(  # noqa: E731
                F.element_at(v, 1), F.element_at(v, 2), qverts, qholes
            )
            cross = _cross_q_rings(ring, qverts, qholes)
            cross_dh = _doc_holes_cross(holes, qverts[:-1])
            q_region_any = FALSE
            q_region_all = F.lit(True)
            for qx, qy in qverts[:-1]:
                inr = _pt_in_doc_region(qx, qy, ring, holes)
                q_region_any = q_region_any | inr
                q_region_all = q_region_all & inr
            out["intersects"] = (
                _verts_any(ring, pip) | cross | cross_dh | q_region_any
            )
            # a query hole buried inside the doc part (no crossings)
            # still breaks within: doc area inside the hole is outside
            # the query region
            hole_in_doc = FALSE
            for h in qholes:
                for hx, hy in h[:-1]:
                    from bleve_spark.search.geo import (
                        point_in_doc_polygon,
                    )

                    hole_in_doc = hole_in_doc | point_in_doc_polygon(
                        hx, hy, ring
                    )
            out["within"] = (
                _verts_all(ring, pip) & ~cross & ~hole_in_doc
            )
            # doc region ⊇ query region: all query verts in doc
            # region, no ring crossings (either ring set), and no doc
            # hole poking into the query region
            contains = q_region_all & ~cross & ~cross_dh
            if holes is not None:
                contains = contains & ~F.exists(
                    holes,
                    lambda h: _verts_any(
                        h,
                        lambda v: _in_q_region(
                            F.element_at(v, 1), F.element_at(v, 2),
                            qverts, qholes,
                        ),
                    ),
                )
            out["contains"] = contains
        elif qk == "linestring":
            cross = doc_edges_intersect_query(
                ring, qverts, closed_query=False
            )
            cross_dh = _doc_holes_cross(holes, qverts,
                                        closed_query=False)
            q_region_any = FALSE
            q_region_all = F.lit(True)
            for qx, qy in qverts:
                inr = _pt_in_doc_region(qx, qy, ring, holes)
                q_region_any = q_region_any | inr
                q_region_all = q_region_all & inr
            out["intersects"] = cross | cross_dh | q_region_any
            out["contains"] = q_region_all & ~cross & ~cross_dh
        elif qk == "circle":
            cx, cy = qverts[0]
            center_in = _pt_in_doc_region(cx, cy, ring, holes)
            edge_d = _const_pt_to_docsegs_min_m(cx, cy, ring, True)
            hole_near = FALSE
            hole_far = F.lit(True)
            if holes is not None:
                hole_near = F.exists(
                    holes,
                    lambda h: _const_pt_to_docsegs_min_m(cx, cy, h, True)
                    <= F.lit(qr),
                )
                hole_far = F.forall(
                    holes,
                    lambda h: _const_pt_to_docsegs_min_m(cx, cy, h, True)
                    >= F.lit(qr),
                )
            out["intersects"] = (
                center_in | (edge_d <= F.lit(qr)) | hole_near
            )
            out["contains"] = (
                center_in & (edge_d >= F.lit(qr)) & hole_far
            )
            out["within"] = _verts_all(
                ring,
                lambda v: _hav_m(
                    F.element_at(v, 2), F.element_at(v, 1), cy, cx
                ) <= F.lit(qr),
            )
        return out

    if doc_kind == "circle":
        # doc circle: center = ring[0], radius = rd (meters)
        if qk == "point":
            qx, qy = qverts[0]
            d = _hav_m(fy, fx, qy, qx)
            out["intersects"] = d <= rd
            out["contains"] = d <= rd
        elif qk == "circle":
            cx, cy = qverts[0]
            d = _hav_m(fy, fx, cy, cx)
            out["intersects"] = d <= rd + F.lit(qr)
            out["within"] = d + rd <= F.lit(qr)
            out["contains"] = d + F.lit(qr) <= rd
        elif qk == "polygon":
            pip = _in_q_region(fx, fy, qverts, qholes)
            seg_d = _docpt_to_qsegs_min_m(fx, fy, qverts[:-1], True)
            for h in qholes:
                seg_d = F.least(
                    seg_d, _docpt_to_qsegs_min_m(fx, fy, h[:-1], True)
                )
            out["intersects"] = pip | (seg_d <= rd)
            out["within"] = pip & (seg_d >= rd)
            # contains polygon: every query vertex within the radius
            # (exact — the disc is convex)
            cont = F.lit(True)
            for qx, qy in qverts:
                cont = cont & (_hav_m(fy, fx, qy, qx) <= rd)
            out["contains"] = cont
        elif qk == "linestring":
            seg_d = _docpt_to_qsegs_min_m(fx, fy, qverts, False)
            out["intersects"] = seg_d <= rd
            cont = F.lit(True)
            for qx, qy in qverts:
                cont = cont & (_hav_m(fy, fx, qy, qx) <= rd)
            out["contains"] = cont
        return out

    raise ValueError(f"unsupported doc part kind: {doc_kind!r}")


def _part_dispatch(part: Column, qpart, relation: str) -> Column:
    """Per-part CASE over the doc part's kind."""
    ring = part["ring"]
    rd = part["radius"]
    k = part["kind"]
    holes = part["holes"]
    return (
        F.when(k == "point",
               _pair_preds("point", ring, rd, qpart)[relation])
        .when(k == "linestring",
              _pair_preds("linestring", ring, rd, qpart)[relation])
        .when(k == "polygon",
              _pair_preds("polygon", ring, rd, qpart,
                          holes=holes)[relation])
        .when(k == "circle",
              _pair_preds("circle", ring, rd, qpart)[relation])
        .otherwise(F.lit(False))
    )


def parts_relation_pred(parts_col: Column, query_shape: dict,
                        relation: str, bbox_cols: dict | None = None,
                        prune: bool = True) -> Column:
    """(doc parts RELATION query shape) as one native predicate.

    ``prune`` (default) prepends the coarse bbox pre-filter from
    :mod:`bleve_spark.search.geobbox` — cheap short-circuiting
    conjuncts ahead of the exact part-pair geometry, and parquet
    row-group pruning when ``bbox_cols`` are materialized columns."""
    qparts = geojson_to_parts(query_shape)
    relation = relation.lower()
    if prune:
        from bleve_spark.search import geoshape_np
        from bleve_spark.search.geobbox import (
            parts_prefilter, query_shape_bbox,
        )

        if geoshape_np.ARROW_EXACT:
            # exact pass as ONE Arrow stage — HOFs are CodegenFallback
            # (interpreted per element); the native bbox conjuncts
            # still push into the scan after Catalyst splits the
            # conjunction
            exact = geoshape_np.parts_exact_pred(
                parts_col, query_shape, relation
            )
        else:
            exact = parts_relation_pred(
                parts_col, query_shape, relation, prune=False
            )
        qb = query_shape_bbox(query_shape)
        if qb is None:
            return exact
        return parts_prefilter(parts_col, qb, relation, bbox_cols) & exact
    if relation == "intersects":
        return F.exists(
            parts_col,
            lambda p: _any_q(p, qparts, "intersects"),
        )
    if relation == "within":
        if (len(qparts) > 1
                and all(qp[0] == "polygon" for qp in qparts)):
            # multi-member polygon union: exact edge-splitting test
            return _union_within_pred(parts_col, qparts)
        return F.forall(
            parts_col,
            lambda p: _any_q(p, qparts, "within"),
        ) & (F.size(parts_col) > 0)
    if relation == "contains":
        pred = F.lit(True)
        for qp in qparts:
            pred = pred & F.exists(
                parts_col, _mk_contains(qp)
            )
        return pred
    raise ValueError(f"unsupported relation: {relation!r}")


def _in_union(x, y, qparts) -> Column:
    """Point column inside the UNION of polygon query members (each
    member's region = outer minus its holes)."""
    pred = F.lit(False)
    for qk, qverts, qr, qholes in qparts:
        pred = pred | _in_q_region(x, y, qverts, qholes)
    return pred


def _union_rings(qparts) -> list:
    rings = []
    for qk, qverts, qr, qholes in qparts:
        rings.append(qverts)
        rings.extend(h for h in qholes)
    return rings


def _edge_stays_in_union(ax, ay, bx, by, qparts) -> Column:
    """True iff the segment a→b never leaves the union of the query
    members: split it at every crossing with any member ring and test
    each sub-segment's midpoint for union membership (a segment can
    only change region membership at a ring crossing, so midpoints
    decide exactly)."""
    rx, ry = bx - ax, by - ay
    ts = []
    for ring in _union_rings(qparts):
        for i in range(len(ring) - 1):
            q1x, q1y = float(ring[i][0]), float(ring[i][1])
            q2x, q2y = float(ring[i + 1][0]), float(ring[i + 1][1])
            sx, sy = q2x - q1x, q2y - q1y
            denom = rx * F.lit(sy) - ry * F.lit(sx)
            qpx, qpy = F.lit(q1x) - ax, F.lit(q1y) - ay
            # t along doc edge, u along query edge (guard ÷0: ANSI)
            t = F.when(
                denom != 0, (qpx * F.lit(sy) - qpy * F.lit(sx)) / denom
            ).otherwise(F.lit(-1.0))
            u = F.when(
                denom != 0, (qpx * ry - qpy * rx) / denom
            ).otherwise(F.lit(-1.0))
            ts.append(
                F.when(
                    (t > 0) & (t < 1) & (u > 0) & (u < 1), t
                ).otherwise(F.lit(-1.0))
            )
    if ts:
        raw = F.array_sort(F.filter(F.array(*ts), lambda t: t > 0))
        # merge near-duplicate cuts: a doc edge crossing the SHARED
        # seam of two touching members yields one cut per member's
        # copy of that edge (equal up to an ulp); keeping both leaves
        # a zero-width interval whose midpoint sits exactly ON the
        # seam, where float membership is ambiguous
        cuts = F.element_at(
            F.transform(
                F.array(raw),
                lambda s: F.filter(
                    s,
                    lambda t, i: (i == 0)
                    | (t - F.element_at(s, i) > F.lit(1e-12)),
                ),
            ),
            1,
        )
    else:
        cuts = F.array().cast("array<double>")
    # bind `cuts` ONCE as a lambda variable (transform-over-1-element
    # trick) — inlining its expression at every midpoint reference
    # multiplies the tree ~4× per interval and can exhaust the driver
    # heap during planning; then materialize the midpoint t's as an
    # array and test each against the union with a single-instance
    # lambda body
    def _mids(cb: Column) -> Column:
        n = F.size(cb)
        return F.transform(
            F.sequence(F.lit(0), n),
            lambda i: (
                F.when(i == 0, F.lit(0.0))
                .otherwise(F.element_at(cb, i))
                + F.when(i == F.size(cb), F.lit(1.0))
                .otherwise(F.element_at(cb, i + 1))
            ) / 2,
        )

    return F.element_at(
        F.transform(
            F.array(cuts),
            lambda cb: F.forall(
                _mids(cb),
                lambda m: _in_union(ax + rx * m, ay + ry * m, qparts),
            ),
        ),
        1,
    )


def _ring_within_union(ring: Column, qparts) -> Column:
    """Every vertex of the doc ring in the union AND every edge stays
    inside it."""
    vx = lambda v: F.element_at(v, 1)   # noqa: E731
    vy = lambda v: F.element_at(v, 2)   # noqa: E731
    verts_in = F.forall(
        ring, lambda v: _in_union(vx(v), vy(v), qparts)
    )
    n_edges = F.size(ring) - 1
    edges_in = F.forall(
        F.sequence(F.lit(1), F.greatest(n_edges, F.lit(1))),
        lambda i: _edge_stays_in_union(
            F.element_at(F.element_at(ring, i), 1),
            F.element_at(F.element_at(ring, i), 2),
            F.element_at(
                F.element_at(ring, F.least(i + 1, F.size(ring))), 1
            ),
            F.element_at(
                F.element_at(ring, F.least(i + 1, F.size(ring))), 2
            ),
            qparts,
        ),
    )
    return verts_in & edges_in


def _union_within_pred(parts_col: Column, qparts) -> Column:
    """EXACT within over a MULTI-member polygon query (multipolygon /
    geometrycollection of polygons): a doc part straddling two
    touching members is within the union even though it is within
    neither member alone — the member-wise approximation the round-2
    review documented. Circles keep the member-wise test (a disc
    region spanning members is not vertex-decomposable)."""

    def one(p: Column) -> Column:
        k = p["kind"]
        ring = p["ring"]
        first = F.element_at(ring, 1)
        return (
            F.when(
                k == "point",
                _in_union(
                    F.element_at(first, 1), F.element_at(first, 2),
                    qparts,
                ),
            )
            .when(
                k.isin("linestring", "polygon"),
                _ring_within_union(ring, qparts),
            )
            .when(k == "circle", _any_q(p, qparts, "within"))
            .otherwise(F.lit(False))
        )

    return F.forall(parts_col, one) & (F.size(parts_col) > 0)


def _any_q(p: Column, qparts, relation) -> Column:
    out = _part_dispatch(p, qparts[0], relation)
    for qp in qparts[1:]:
        out = out | _part_dispatch(p, qp, relation)
    return out


def _mk_contains(qp):
    def fn(p):
        return _part_dispatch(p, qp, "contains")

    return fn
