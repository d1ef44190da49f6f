"""Query AST + JSON parsing.

Mirrors the reference's query model (/root/reference/search/query/) and
its JSON type dispatch (/root/reference/search/query/query.go:128-393):
the set of keys present in the JSON object selects the query type.

Composable; every query carries ``boost`` (leaf boosts enter scoring as
boost·idf·queryNorm; composite boosts only participate via queryNorm —
faithful to the reference, whose composite searchers never multiply
their own boost into scores).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


@dataclass
class Query:
    boost: float = 1.0
    field: str | None = None


@dataclass
class TermQuery(Query):
    """Exact term match, scored (search/query/term.go:57)."""

    term: str = ""


@dataclass
class MatchQuery(Query):
    """Analyze text → term/fuzzy queries joined by operator
    (search/query/match.go:123-186)."""

    match: str = ""
    operator: str = "or"  # "or" | "and"
    analyzer: str | None = None
    fuzziness: int | str = 0  # int or "auto"
    prefix_length: int = 0


@dataclass
class MatchPhraseQuery(Query):
    """Analyzer-aware phrase (search/query/match_phrase.go:76).
    ``fuzziness`` (int or "auto") expands every analyzed position to
    its Levenshtein neighbourhood, prefix length hardcoded 0
    (match_phrase.go:33,64; search_phrase.go:100-102)."""

    match_phrase: str = ""
    analyzer: str | None = None
    slop: int = 0
    fuzziness: int | str = 0


@dataclass
class PhraseQuery(Query):
    """Exact consecutive terms (search/query/phrase.go:74).
    ``fuzziness`` (int or "auto") per-position fuzzy expansion
    (phrase.go:32,54-58,75 Fuzziness/SetAutoFuzziness →
    NewPhraseSearcher per-term fuzzy matching)."""

    terms: list[str] = dc_field(default_factory=list)
    slop: int = 0
    fuzziness: int | str = 0


@dataclass
class MultiPhraseQuery(Query):
    """Phrase with alternatives per position
    (search/query/multi_phrase.go:77); ``fuzziness`` expands every
    alternative (multi_phrase.go Fuzziness → NewMultiPhraseSearcher)."""

    terms: list[list[str]] = dc_field(default_factory=list)
    slop: int = 0
    fuzziness: int | str = 0


@dataclass
class FuzzyQuery(Query):
    """Levenshtein dictionary expansion (search/query/fuzzy.go:79);
    fuzziness="auto": len≤2→0, len≤5→1, else 2
    (search/searcher/search_fuzzy.go:26-39)."""

    term: str = ""
    fuzziness: int | str = 1
    prefix_length: int = 0


@dataclass
class PrefixQuery(Query):
    prefix: str = ""


@dataclass
class RegexpQuery(Query):
    regexp: str = ""


@dataclass
class WildcardQuery(Query):
    """`*` / `?` translated to regexp
    (search/query/wildcard.go:80-86)."""

    wildcard: str = ""


@dataclass
class TermRangeQuery(Query):
    min: str | None = None
    max: str | None = None
    inclusive_min: bool = True
    inclusive_max: bool = False


@dataclass
class NumericRangeQuery(Query):
    """Native range predicate (replaces the reference's numeric-trie
    expansion, search/searcher/search_numeric_range.go:59-120).
    Deliberate scoring divergence: constant score = boost (the
    reference's per-trie-term BM25 scores are an encoding artifact)."""

    min: float | None = None
    max: float | None = None
    inclusive_min: bool = True
    inclusive_max: bool = False


@dataclass
class DateRangeQuery(Query):
    start: str | None = None
    end: str | None = None
    inclusive_start: bool = True
    inclusive_end: bool = False


@dataclass
class BoolFieldQuery(Query):
    """Matches the single token T/F (document/field_boolean.go)."""

    bool_value: bool = True


@dataclass
class DocIDQuery(Query):
    """Explicit external doc ids (search/query/docid.go:49);
    constant-scored."""

    ids: list[str] = dc_field(default_factory=list)


@dataclass
class MatchAllQuery(Query):
    pass


@dataclass
class MatchNoneQuery(Query):
    pass


@dataclass
class ConjunctionQuery(Query):
    conjuncts: list[Query] = dc_field(default_factory=list)


@dataclass
class DisjunctionQuery(Query):
    disjuncts: list[Query] = dc_field(default_factory=list)
    min: int = 0


@dataclass
class BooleanQuery(Query):
    """must=conjunction, should=disjunction(min), must_not excludes,
    filter=unscored semi-join (search/query/boolean.go:135,
    search/searcher/search_boolean.go:209-330)."""

    must: Query | None = None
    should: Query | None = None
    must_not: Query | None = None
    filter: Query | None = None
    min_should: int = 0


@dataclass
class GeoDistanceQuery(Query):
    """Constant-scored haversine radius filter
    (search/query/geo_distance.go:60). ``field`` names the geopoint;
    source columns default to ``{field}_lat`` / ``{field}_lon``."""

    lon: float = 0.0
    lat: float = 0.0
    distance: str = "1km"
    lat_col: str | None = None
    lon_col: str | None = None


@dataclass
class GeoBoundingBoxQuery(Query):
    """Constant-scored bbox filter with dateline wrap
    (search/query/geo_boundingbox.go:60)."""

    top_left_lon: float = 0.0
    top_left_lat: float = 0.0
    bottom_right_lon: float = 0.0
    bottom_right_lat: float = 0.0
    lat_col: str | None = None
    lon_col: str | None = None


@dataclass
class GeoPolygonQuery(Query):
    """Constant-scored point-in-polygon filter
    (search/query/geo_boundingpolygon.go:57)."""

    points: list = dc_field(default_factory=list)  # [(lon, lat), ...]
    lat_col: str | None = None
    lon_col: str | None = None


@dataclass
class GeoShapeQuery(Query):
    """GeoJSON shape query (/root/reference/search/query/
    geo_shape.go:27-108): a query Geometry {shape, relation} evaluated
    against a document shape field as "doc RELATION query". Shape:
    {"type": polygon|envelope|circle|point, "coordinates": ...,
    "radius": ...}; relation: intersects | within | contains.
    Constant-scored filter."""

    shape: dict = dc_field(default_factory=dict)
    relation: str = "intersects"
    kind_col: str | None = None    # default <field>_kind
    coords_col: str | None = None  # default <field>_coords


@dataclass
class IpRangeQuery(Query):
    """CIDR containment over an IPv4 string column
    (search/query/ip_range.go:57); constant-scored."""

    cidr: str = ""


@dataclass
class QueryStringQuery(Query):
    query: str = ""


@dataclass
class CustomScoreQuery(Query):
    """Wrap a sub-query and rescore it with a user Column function
    (the reference's pluggable custom_score parser surface,
    search/query/query.go:311-324). ``score_fn(score_col) -> Column``
    runs JVM-side — a rescoring expression, not a row UDF."""

    sub: Query | None = None
    score_fn: object = None


# user-registered parsers for the reference's custom query kinds
# (query.go:311-324: error when unregistered)
CUSTOM_PARSERS: dict = {}


def register_custom_parser(kind: str, fn) -> None:
    """``fn(dict) -> Query`` for "custom_filter"/"custom_score"/
    "custom_payload" style dispatch keys."""
    CUSTOM_PARSERS[kind] = fn


def parse_query(d: dict) -> Query:
    """JSON dict → Query, following query.go:128-393 key dispatch."""
    for kind, fn in CUSTOM_PARSERS.items():
        if kind in d:
            return fn(d)
    boost = float(d.get("boost", 1.0))
    fld = d.get("field")

    if "match" in d:
        return MatchQuery(
            boost, fld, d["match"],
            operator=d.get("operator", "or"),
            analyzer=d.get("analyzer"),
            fuzziness=d.get("fuzziness", 0),
            prefix_length=int(d.get("prefix_length", 0)),
        )
    if "match_phrase" in d:
        return MatchPhraseQuery(
            boost, fld, d["match_phrase"],
            analyzer=d.get("analyzer"), slop=int(d.get("slop", 0)),
            fuzziness=d.get("fuzziness", 0),
        )
    if "terms" in d:
        terms = d["terms"]
        if terms and isinstance(terms[0], list):
            return MultiPhraseQuery(
                boost, fld, terms, slop=int(d.get("slop", 0)),
                fuzziness=d.get("fuzziness", 0),
            )
        return PhraseQuery(boost, fld, terms, slop=int(d.get("slop", 0)),
                           fuzziness=d.get("fuzziness", 0))
    if "term" in d:
        if "fuzziness" in d:
            return FuzzyQuery(
                boost, fld, d["term"],
                fuzziness=d["fuzziness"],
                prefix_length=int(d.get("prefix_length", 0)),
            )
        return TermQuery(boost, fld, d["term"])
    if "prefix" in d:
        return PrefixQuery(boost, fld, d["prefix"])
    if "regexp" in d:
        return RegexpQuery(boost, fld, d["regexp"])
    if "wildcard" in d:
        return WildcardQuery(boost, fld, d["wildcard"])
    if "must" in d or "should" in d or "must_not" in d or "filter" in d:
        return BooleanQuery(
            boost, fld,
            must=_sub(d.get("must")),
            should=_sub(d.get("should")),
            must_not=_sub(d.get("must_not")),
            filter=_sub(d.get("filter")),
            min_should=int(d.get("min_should", 0)),
        )
    if "conjuncts" in d:
        return ConjunctionQuery(
            boost, fld, [parse_query(c) for c in d["conjuncts"]]
        )
    if "disjuncts" in d:
        return DisjunctionQuery(
            boost, fld,
            [parse_query(c) for c in d["disjuncts"]],
            min=int(d.get("min", 0)),
        )
    if "query" in d:
        return QueryStringQuery(boost, fld, d["query"])
    if "ids" in d:
        return DocIDQuery(boost, fld, list(d["ids"]))
    if "bool" in d:
        return BoolFieldQuery(boost, fld, bool(d["bool"]))
    if "cidr" in d:
        return IpRangeQuery(boost, fld, cidr=d["cidr"])
    if "geometry" in d:
        g = d["geometry"]
        return GeoShapeQuery(
            boost, fld, shape=dict(g["shape"]),
            relation=g.get("relation", "intersects"),
            kind_col=d.get("kind_col"), coords_col=d.get("coords_col"),
        )
    if "distance" in d and "location" in d:
        from bleve_spark.search.geo import parse_geopoint

        lon, lat = parse_geopoint(d["location"])
        return GeoDistanceQuery(
            boost, fld, lon=lon, lat=lat,
            distance=d["distance"],
            lat_col=d.get("lat_col"), lon_col=d.get("lon_col"),
        )
    if "polygon_points" in d:
        from bleve_spark.search.geo import parse_geopoint

        return GeoPolygonQuery(
            boost, fld,
            points=[parse_geopoint(p) for p in d["polygon_points"]],
            lat_col=d.get("lat_col"), lon_col=d.get("lon_col"),
        )
    if "top_left" in d and "bottom_right" in d:
        from bleve_spark.search.geo import parse_geopoint

        tl_lon, tl_lat = parse_geopoint(d["top_left"])
        br_lon, br_lat = parse_geopoint(d["bottom_right"])
        return GeoBoundingBoxQuery(
            boost, fld,
            top_left_lon=tl_lon, top_left_lat=tl_lat,
            bottom_right_lon=br_lon, bottom_right_lat=br_lat,
            lat_col=d.get("lat_col"), lon_col=d.get("lon_col"),
        )
    if "match_all" in d:
        return MatchAllQuery(boost, fld)
    if "match_none" in d:
        return MatchNoneQuery(boost, fld)
    if "start" in d or "end" in d:
        return DateRangeQuery(
            boost, fld, start=d.get("start"), end=d.get("end"),
            inclusive_start=bool(d.get("inclusive_start", True)),
            inclusive_end=bool(d.get("inclusive_end", False)),
        )
    if "min" in d or "max" in d:
        mn, mx = d.get("min"), d.get("max")
        if isinstance(mn, str) or isinstance(mx, str):
            return TermRangeQuery(
                boost, fld, min=mn, max=mx,
                inclusive_min=bool(d.get("inclusive_min", True)),
                inclusive_max=bool(d.get("inclusive_max", False)),
            )
        return NumericRangeQuery(
            boost, fld, min=mn, max=mx,
            inclusive_min=bool(d.get("inclusive_min", True)),
            inclusive_max=bool(d.get("inclusive_max", False)),
        )
    raise ValueError(f"unknown query shape: {sorted(d.keys())}")


def _sub(v):
    if v is None:
        return None
    if isinstance(v, dict):
        return parse_query(v)
    if isinstance(v, list):
        # bare lists inside boolean clauses: must/filter → conjunction,
        # others → disjunction is ambiguous; reference wraps explicitly,
        # so require dict-wrapped {"conjuncts"/"disjuncts": ...} there.
        raise ValueError(
            "wrap boolean clause lists as {'conjuncts': [...]} or "
            "{'disjuncts': [...]}"
        )
    return v
