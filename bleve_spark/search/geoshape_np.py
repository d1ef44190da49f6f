"""Arrow-batch exact kernels for the two geoshape engines.

Catalyst higher-order functions (``exists``/``forall``/``aggregate``/
``transform``) are CodegenFallback — they never enter whole-stage
codegen, so the exact relation pass of both geoshape engines ran as
interpreted expression trees per row (the same execution-tier problem
the r3 minhash fold had). This module re-expresses the EXACT passes as
Arrow-batched pandas UDFs over plain Python float arithmetic: doc
rings are tiny (points / short paths / closed rings), so a per-row
scalar kernel beats the interpreted tree by a wide margin while the
coarse bbox pre-filter stays native (Catalyst splits the conjunction:
the bbox conjuncts push into the parquet scan, the Arrow stage only
sees surviving rows).

Semantics are a LINE-FOR-LINE transcription of the Column builders —
:func:`bleve_spark.search.geo.shape_relation_pred` (the flat
kind/coords engine) and
:func:`bleve_spark.search.geoshape.parts_relation_pred` (the parts
engine) — with the same IEEE-754 operation order, so results are
bit-identical (tests/test_geoshape_arrow.py A/Bs the two paths over
every relation). The Column builders remain the spec and the
fallback (set ``ARROW_EXACT = False``).

Reference parity: search/query/geo_shape.go (relations),
geo/README.md (shape model) — via the Column builders' own citations.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, functions as F

from bleve_spark.search.geo import _A, _B, parse_distance

# flip to fall back to the native (interpreted-HOF) exact pass
ARROW_EXACT = True

_M_PER_DEG_LAT = 110540.0
_M_PER_DEG_LON_EQ = 111320.0
_D2R = math.pi / 180.0
_INF = float("inf")


# ------------------------------------------------------ scalar helpers --


def _cyc_edges(pts):
    """Edges of an OPEN vertex list, cyclic wrap — mirrors the fixed
    query-edge unrolls (``qpts[(i + 1) % n]``)."""
    n = len(pts)
    return [(pts[i], pts[(i + 1) % n]) for i in range(n)]


def _consec_edges(pts):
    """Consecutive edges of a stored ring/path (closed rings carry the
    duplicate last vertex, so this covers the cycle) — mirrors the
    ``sequence(0, size-2)`` doc-edge iterations."""
    return [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]


def _pip(px, py, edges):
    """Even-odd ray cast — same straddle + cross-x test as
    ``geo._pip_expr`` / ``geo.point_in_doc_polygon``."""
    inside = False
    for (ax, ay), (bx, by) in edges:
        if ay == by:
            continue
        if ((ay > py) != (by > py)) and (
            px < (bx - ax) * (py - ay) / (by - ay) + ax
        ):
            inside = not inside
    return inside


def _segs_cross(doc_edges, q_edges):
    """Any proper crossing (strict orientation signs) — mirrors
    ``geo.doc_edges_intersect_query``."""
    for (ax, ay), (bx, by) in doc_edges:
        for (cx, cy), (dx, dy) in q_edges:
            d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
            d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
            d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
            if d1 * d2 < 0 and d3 * d4 < 0:
                return True
    return False


def _earth_diam_km(avg_lat_rad):
    lat = abs(avg_lat_rad)
    c, s = math.cos(lat), math.sin(lat)
    a2, b2 = _A * _A, _B * _B
    num = (a2 * c) * (a2 * c) + (b2 * s) * (b2 * s)
    den = (_A * c) * (_A * c) + (_B * s) * (_B * s)
    return 2.0 * math.sqrt(num / den) / 1000.0


def _hav_km(plat, plon, lat, lon):
    """``geo.haversine_km_col`` verbatim (point column → scalar)."""
    x1 = plat * _D2R
    x2 = lat * _D2R
    h1 = 1.0 - math.cos(x1 - x2)
    h2 = 1.0 - math.cos((plon - lon) * _D2R)
    h = (h1 + math.cos(x1) * math.cos(x2) * h2) / 2.0
    avg = (x1 + x2) / 2.0
    return _earth_diam_km(avg) * math.asin(min(1.0, math.sqrt(h)))


def _hav_m(plat, plon, lat, lon):
    return _hav_km(plat, plon, lat, lon) * 1000.0


def _const_pt_to_docsegs_min_m(cx, cy, ring):
    """``geoshape._const_pt_to_docsegs_min_m``: min meters from a
    fixed point to the doc part's consecutive segments, local
    equirectangular projection around the point."""
    kx = _M_PER_DEG_LON_EQ * math.cos(math.radians(cy))
    ky = _M_PER_DEG_LAT
    best = _INF
    for (a0, a1), (b0, b1) in _consec_edges(ring):
        ax = (a0 - cx) * kx
        ay = (a1 - cy) * ky
        bx = (b0 - cx) * kx
        by = (b1 - cy) * ky
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = (-(ax * dx + ay * dy)) / len2 if len2 > 0 else 0.0
        t = max(0.0, min(1.0, t))
        px, py = ax + t * dx, ay + t * dy
        d = math.sqrt(px * px + py * py)
        if d < best:
            best = d
    return best


def _docpt_to_qsegs_min_m(px, py, verts, closed):
    """``geoshape._docpt_to_qsegs_min_m``: min meters from a doc point
    to the FIXED query part's segments (projection around the query
    centroid)."""
    cy = sum(v[1] for v in verts) / len(verts)
    kx = _M_PER_DEG_LON_EQ * math.cos(math.radians(cy))
    ky = _M_PER_DEG_LAT
    n = len(verts)
    best = _INF
    for i in range(n if closed else n - 1):
        ax, ay = verts[i]
        bx, by = verts[(i + 1) % n]
        dxm, dym = (bx - ax) * kx, (by - ay) * ky
        len2 = dxm * dxm + dym * dym
        pxm = (px - ax) * kx
        pym = (py - ay) * ky
        if len2 > 0:
            t = (pxm * dxm + pym * dym) / len2
            t = max(0.0, min(1.0, t))
        else:
            t = 0.0
        ddx = pxm - t * dxm
        ddy = pym - t * dym
        d = math.sqrt(ddx * ddx + ddy * ddy)
        if d < best:
            best = d
    return best


def _in_q_region(x, y, qverts, qholes):
    """``geoshape._in_q_region``: inside the outer ring, outside every
    hole (rings CLOSED; opened with [:-1] exactly as the Column
    code)."""
    if not _pip(x, y, _cyc_edges(qverts[:-1])):
        return False
    for h in qholes:
        if _pip(x, y, _cyc_edges(h[:-1])):
            return False
    return True


def _cross_q_rings(ring, qverts, qholes, closed_query=True):
    """``geoshape._cross_q_rings``: doc edges crossing any query ring
    (outer or hole)."""
    de = _consec_edges(ring)
    qe = _cyc_edges(qverts[:-1]) if closed_query else _consec_edges(qverts)
    if _segs_cross(de, qe):
        return True
    for h in qholes:
        if _segs_cross(de, _cyc_edges(h[:-1])):
            return True
    return False


def _pt_in_doc_region(qx, qy, ring, holes):
    """``geoshape._pt_in_doc_region``: fixed point inside the doc
    polygon part's region (outer minus its holes; doc rings stored
    CLOSED → consecutive edges)."""
    if not _pip(qx, qy, _consec_edges(ring)):
        return False
    for h in holes:
        if _pip(qx, qy, _consec_edges(h)):
            return False
    return True


def _doc_holes_cross(holes, qverts, closed_query=True):
    qe = _cyc_edges(qverts) if closed_query else _consec_edges(qverts)
    for h in holes:
        if _segs_cross(_consec_edges(h), qe):
            return True
    return False


# ------------------------------------------- parts-engine pair kernel --


def _pair_rel(doc_kind, ring, rd, holes, qpart, relation):
    """One doc part RELATION one FIXED query part — transcription of
    ``geoshape._pair_preds`` (computing only the asked relation)."""
    qk, qverts, qr, qholes = qpart
    fx, fy = ring[0][0], ring[0][1]

    if doc_kind == "point":
        if qk == "point":
            qx, qy = qverts[0]
            return fx == qx and fy == qy
        if qk == "polygon":
            if relation == "contains":
                return False
            return _in_q_region(fx, fy, qverts, qholes)
        if qk == "circle":
            if relation == "contains":
                return False
            return _hav_m(fy, fx, qverts[0][1], qverts[0][0]) <= qr
        return False

    if doc_kind == "linestring":
        if qk == "polygon":
            if relation == "contains":
                return False
            cross = _cross_q_rings(ring, qverts, qholes)
            if relation == "intersects":
                if cross:
                    return True
                return any(
                    _in_q_region(v[0], v[1], qverts, qholes) for v in ring
                )
            # within
            if cross:
                return False
            return all(
                _in_q_region(v[0], v[1], qverts, qholes) for v in ring
            )
        if qk == "linestring":
            if relation != "intersects":
                return False
            return _segs_cross(_consec_edges(ring), _consec_edges(qverts))
        if qk == "circle":
            cx, cy = qverts[0]
            if relation == "intersects":
                return _const_pt_to_docsegs_min_m(cx, cy, ring) <= qr
            if relation == "within":
                return all(
                    _hav_m(v[1], v[0], cy, cx) <= qr for v in ring
                )
            return False
        return False

    if doc_kind == "polygon":
        if qk == "point":
            if relation == "within":
                return False
            qx, qy = qverts[0]
            return _pt_in_doc_region(qx, qy, ring, holes)
        if qk == "polygon":
            cross = _cross_q_rings(ring, qverts, qholes)
            if relation == "intersects":
                if cross or _doc_holes_cross(holes, qverts[:-1]):
                    return True
                if any(
                    _in_q_region(v[0], v[1], qverts, qholes) for v in ring
                ):
                    return True
                return any(
                    _pt_in_doc_region(qx, qy, ring, holes)
                    for qx, qy in qverts[:-1]
                )
            if relation == "within":
                if cross:
                    return False
                # a query hole buried inside the doc part still
                # breaks within
                doc_edges = _consec_edges(ring)
                for h in qholes:
                    for hx, hy in h[:-1]:
                        if _pip(hx, hy, doc_edges):
                            return False
                return all(
                    _in_q_region(v[0], v[1], qverts, qholes) for v in ring
                )
            # contains
            if cross or _doc_holes_cross(holes, qverts[:-1]):
                return False
            if not all(
                _pt_in_doc_region(qx, qy, ring, holes)
                for qx, qy in qverts[:-1]
            ):
                return False
            for h in holes:
                if any(
                    _in_q_region(v[0], v[1], qverts, qholes) for v in h
                ):
                    return False
            return True
        if qk == "linestring":
            cross = _segs_cross(_consec_edges(ring), _consec_edges(qverts))
            cross_dh = _doc_holes_cross(holes, qverts, closed_query=False)
            if relation == "intersects":
                if cross or cross_dh:
                    return True
                return any(
                    _pt_in_doc_region(qx, qy, ring, holes)
                    for qx, qy in qverts
                )
            if relation == "contains":
                if cross or cross_dh:
                    return False
                return all(
                    _pt_in_doc_region(qx, qy, ring, holes)
                    for qx, qy in qverts
                )
            return False
        if qk == "circle":
            cx, cy = qverts[0]
            if relation == "within":
                return all(
                    _hav_m(v[1], v[0], cy, cx) <= qr for v in ring
                )
            center_in = _pt_in_doc_region(cx, cy, ring, holes)
            edge_d = _const_pt_to_docsegs_min_m(cx, cy, ring)
            if relation == "intersects":
                if center_in or edge_d <= qr:
                    return True
                return any(
                    _const_pt_to_docsegs_min_m(cx, cy, h) <= qr
                    for h in holes
                )
            # contains
            return (
                center_in
                and edge_d >= qr
                and all(
                    _const_pt_to_docsegs_min_m(cx, cy, h) >= qr
                    for h in holes
                )
            )
        return False

    if doc_kind == "circle":
        if qk == "point":
            if relation == "within":
                return False
            qx, qy = qverts[0]
            return _hav_m(fy, fx, qy, qx) <= rd
        if qk == "circle":
            cx, cy = qverts[0]
            d = _hav_m(fy, fx, cy, cx)
            if relation == "intersects":
                return d <= rd + qr
            if relation == "within":
                return d + rd <= qr
            return d + qr <= rd
        if qk == "polygon":
            if relation == "contains":
                # every query vertex within the radius (disc is
                # convex; iterates the CLOSED list like the Column
                # code)
                return all(
                    _hav_m(fy, fx, qy, qx) <= rd for qx, qy in qverts
                )
            seg_d = _docpt_to_qsegs_min_m(fx, fy, qverts[:-1], True)
            for h in qholes:
                seg_d = min(
                    seg_d, _docpt_to_qsegs_min_m(fx, fy, h[:-1], True)
                )
            pip = _in_q_region(fx, fy, qverts, qholes)
            if relation == "intersects":
                return pip or seg_d <= rd
            return pip and seg_d >= rd
        if qk == "linestring":
            if relation == "intersects":
                return _docpt_to_qsegs_min_m(fx, fy, qverts, False) <= rd
            if relation == "contains":
                return all(
                    _hav_m(fy, fx, qy, qx) <= rd for qx, qy in qverts
                )
            return False
        return False

    return False


# --------------------------------------------- union-within transcription --


def _union_rings(qparts):
    rings = []
    for qk, qverts, qr, qholes in qparts:
        rings.append(qverts)
        rings.extend(qholes)
    return rings


def _in_union(x, y, qparts):
    for qk, qverts, qr, qholes in qparts:
        if _in_q_region(x, y, qverts, qholes):
            return True
    return False


def _edge_stays_in_union(ax, ay, bx, by, qparts, rings):
    """``geoshape._edge_stays_in_union``: split the doc edge at every
    proper crossing with any union ring, test each sub-segment
    midpoint for union membership (cuts deduped against the PREVIOUS
    sorted cut at 1e-12, as the Column code does)."""
    rx, ry = bx - ax, by - ay
    ts = []
    for ring in rings:
        for i in range(len(ring) - 1):
            q1x, q1y = float(ring[i][0]), float(ring[i][1])
            q2x, q2y = float(ring[i + 1][0]), float(ring[i + 1][1])
            sx, sy = q2x - q1x, q2y - q1y
            denom = rx * sy - ry * sx
            if denom == 0:
                continue
            qpx, qpy = q1x - ax, q1y - ay
            t = (qpx * sy - qpy * sx) / denom
            u = (qpx * ry - qpy * rx) / denom
            if 0 < t < 1 and 0 < u < 1:
                ts.append(t)
    ts.sort()
    cuts = [
        t for j, t in enumerate(ts)
        if j == 0 or t - ts[j - 1] > 1e-12
    ]
    n = len(cuts)
    for i in range(n + 1):
        left = 0.0 if i == 0 else cuts[i - 1]
        right = 1.0 if i == n else cuts[i]
        m = (left + right) / 2
        if not _in_union(ax + rx * m, ay + ry * m, qparts):
            return False
    return True


def _ring_within_union(ring, qparts, rings):
    for v in ring:
        if not _in_union(v[0], v[1], qparts):
            return False
    n = len(ring)
    n_edges = n - 1
    for i in range(1, max(n_edges, 1) + 1):
        a = ring[i - 1]
        b = ring[min(i, n - 1)]
        if not _edge_stays_in_union(
            a[0], a[1], b[0], b[1], qparts, rings
        ):
            return False
    return True


def _union_within_part(part, qparts, rings):
    kind, ring, rd, holes = part
    if kind == "point":
        return _in_union(ring[0][0], ring[0][1], qparts)
    if kind in ("linestring", "polygon"):
        return _ring_within_union(ring, qparts, rings)
    if kind == "circle":
        return any(
            _pair_rel(kind, ring, rd, holes, qp, "within")
            for qp in qparts
        )
    return False


# ---------------------------------------------------- parts-engine entry --


def _norm_parts(raw):
    """Deserialized parts-column row (list of part dicts) →
    [(kind, ring, radius, holes)] with plain-float rings."""
    out = []
    for p in raw:
        if p is None:
            continue
        kind = p["kind"]
        ring = [(float(v[0]), float(v[1])) for v in p["ring"]]
        rd = p.get("radius")
        rd = float(rd) if rd is not None else 0.0
        hs = p.get("holes")
        holes = (
            []
            if hs is None
            else [[(float(v[0]), float(v[1])) for v in h] for h in hs]
        )
        out.append((kind, ring, rd, holes))
    return out


def parts_relation_fn(query_shape: dict, relation: str):
    """Row kernel for ``parts RELATION query_shape`` — transcription
    of ``geoshape.parts_relation_pred`` (prune=False body)."""
    from bleve_spark.search.geoshape import geojson_to_parts

    qparts = geojson_to_parts(query_shape)
    relation = relation.lower()

    if relation == "intersects":
        def fn(parts):
            return any(
                _pair_rel(k, r, rd, hs, qp, "intersects")
                for (k, r, rd, hs) in parts
                for qp in qparts
            )
        return fn

    if relation == "within":
        if len(qparts) > 1 and all(qp[0] == "polygon" for qp in qparts):
            rings = _union_rings(qparts)

            def fn(parts):
                if not parts:
                    return False
                return all(
                    _union_within_part(p, qparts, rings) for p in parts
                )
            return fn

        def fn(parts):
            if not parts:
                return False
            return all(
                any(
                    _pair_rel(k, r, rd, hs, qp, "within")
                    for qp in qparts
                )
                for (k, r, rd, hs) in parts
            )
        return fn

    if relation == "contains":
        def fn(parts):
            return all(
                any(
                    _pair_rel(k, r, rd, hs, qp, "contains")
                    for (k, r, rd, hs) in parts
                )
                for qp in qparts
            )
        return fn

    raise ValueError(f"unsupported relation: {relation!r}")


def parts_exact_pred(parts_col: Column, query_shape: dict,
                     relation: str) -> Column:
    """The parts engine's exact pass as ONE Arrow stage.

    The parts column crosses the Arrow boundary as JSON
    (JVM-codegen'd ``to_json``): pyarrow 16.1 SEGFAULTS converting an
    array<struct<...>> whose struct mixes 2- and 3-level nested
    arrays (ring + holes) to pandas, and rings are tiny, so the
    string detour is both the workaround and cheap."""
    import json

    fn = parts_relation_fn(query_shape, relation)

    @F.pandas_udf("boolean")
    def u(parts_json: pd.Series) -> pd.Series:
        return pd.Series(
            [
                False if j is None else fn(_norm_parts(json.loads(j)))
                for j in parts_json
            ],
            dtype=bool,
        )

    return u(F.to_json(parts_col))


# ----------------------------------------------------- flat-engine entry --


def flat_relation_fn(query_shape: dict, relation: str):
    """Row kernel for the FLAT engine (``<field>_kind`` +
    ``<field>_coords`` columns) — transcription of
    ``geo.shape_relation_pred`` (prune=False body)."""
    qtype = query_shape["type"].lower()
    relation = relation.lower()

    if qtype in ("multipolygon", "multilinestring"):
        member_type = qtype[len("multi"):]
        fns = [
            flat_relation_fn(
                {"type": member_type, "coordinates": part}, relation
            )
            for part in query_shape["coordinates"]
        ]
        if relation == "contains":
            return lambda k, c: all(f(k, c) for f in fns)
        return lambda k, c: any(f(k, c) for f in fns)

    if qtype == "linestring":
        qpts = [tuple(map(float, p)) for p in query_shape["coordinates"]]
        q_edges = _consec_edges(qpts)

        if relation == "intersects":
            def fn(kind, coords):
                if kind == "point":
                    return False
                if _segs_cross(_consec_edges(coords), q_edges):
                    return True
                if kind != "polygon":
                    return False
                de = _consec_edges(coords)
                return any(_pip(qx, qy, de) for qx, qy in qpts)
            return fn
        if relation == "contains":
            def fn(kind, coords):
                if kind != "polygon":
                    return False
                de = _consec_edges(coords)
                if not all(_pip(qx, qy, de) for qx, qy in qpts):
                    return False
                return not _segs_cross(de, q_edges)
            return fn
        if relation == "within":
            return lambda kind, coords: False
        raise ValueError(f"unsupported relation: {relation!r}")

    qholes: list = []
    qpts = None
    if qtype == "envelope":
        (tl_lon, tl_lat), (br_lon, br_lat) = query_shape["coordinates"]
        qpts = [
            (float(tl_lon), float(br_lat)), (float(br_lon), float(br_lat)),
            (float(br_lon), float(tl_lat)), (float(tl_lon), float(tl_lat)),
        ]
        qtype = "polygon"
    elif qtype == "polygon":
        qc = query_shape["coordinates"]
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
    elif qtype not in ("circle", "point"):
        raise ValueError(f"unsupported query shape type: {qtype!r}")

    if qtype == "circle":
        lon, lat = map(float, query_shape["coordinates"])
        radius_km = parse_distance(query_shape["radius"]) / 1000.0

        if relation == "within":
            return lambda kind, coords: all(
                _hav_km(v[1], v[0], lat, lon) <= radius_km
                for v in coords
            )
        if relation == "intersects":
            return lambda kind, coords: any(
                _hav_km(v[1], v[0], lat, lon) <= radius_km
                for v in coords
            )
        if relation == "contains":
            return lambda kind, coords: (
                kind == "polygon"
                and _pip(lon, lat, _consec_edges(coords))
            )
        raise ValueError(f"unsupported relation: {relation!r}")

    if qtype == "point":
        px, py = map(float, query_shape["coordinates"])
        if relation == "contains":
            return lambda kind, coords: (
                kind == "polygon"
                and _pip(px, py, _consec_edges(coords))
            )
        if relation in ("intersects", "within"):
            return lambda kind, coords: (
                kind == "point"
                and len(coords) > 0
                and coords[0][0] == px
                and coords[0][1] == py
            )
        raise ValueError(f"unsupported relation: {relation!r}")

    # ---- polygon / envelope query (region = outer minus holes) ----
    q_edges = _cyc_edges(qpts)
    hole_edge_sets = [_cyc_edges(h) for h in qholes]

    def v_in_q(x, y):
        if not _pip(x, y, q_edges):
            return False
        return not any(_pip(x, y, he) for he in hole_edge_sets)

    def edges_cross(coords):
        de = _consec_edges(coords)
        if _segs_cross(de, q_edges):
            return True
        return any(_segs_cross(de, he) for he in hole_edge_sets)

    if relation == "within":
        def fn(kind, coords):
            if kind == "point":
                return any(v_in_q(v[0], v[1]) for v in coords)
            if not all(v_in_q(v[0], v[1]) for v in coords):
                return False
            if edges_cross(coords):
                return False
            if kind == "polygon":
                de = _consec_edges(coords)
                for h in qholes:
                    if any(_pip(hx, hy, de) for hx, hy in h):
                        return False
            return True
        return fn
    if relation == "intersects":
        def fn(kind, coords):
            if kind == "point":
                return any(v_in_q(v[0], v[1]) for v in coords)
            if any(v_in_q(v[0], v[1]) for v in coords):
                return True
            if edges_cross(coords):
                return True
            if kind != "polygon":
                return False
            de = _consec_edges(coords)
            return any(_pip(qx, qy, de) for qx, qy in qpts)
        return fn
    if relation == "contains":
        def fn(kind, coords):
            if kind != "polygon":
                return False
            de = _consec_edges(coords)
            if not all(_pip(qx, qy, de) for qx, qy in qpts):
                return False
            return not edges_cross(coords)
        return fn
    raise ValueError(f"unsupported relation: {relation!r}")


def flat_exact_pred(kind_col: Column, coords_col: Column,
                    query_shape: dict, relation: str,
                    nondet: bool = False) -> Column:
    """The flat engine's exact pass as ONE Arrow stage.

    ``nondet=True`` marks the (deterministic) kernel non-deterministic
    so the optimizer may not push the filter below a preceding
    rebalance exchange (guide §4.4) — callers that widen the
    bbox-surviving rows before the exact pass need the expensive
    kernel to stay ABOVE their repartition."""
    fn = flat_relation_fn(query_shape, relation)

    @F.pandas_udf("boolean")
    def u(kind: pd.Series, coords: pd.Series) -> pd.Series:
        out = []
        for k, c in zip(kind, coords):
            if k is None or c is None:
                out.append(False)
                continue
            pts = [(float(v[0]), float(v[1])) for v in c]
            out.append(bool(fn(k, pts)))
        return pd.Series(out, dtype=bool)

    if nondet:
        u = u.asNondeterministic()
    return u(kind_col, coords_col)
