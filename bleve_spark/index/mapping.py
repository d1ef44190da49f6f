"""IndexMapping / DocumentMapping / FieldMapping — the reference's
``mapping`` package re-expressed over Spark schemas.

The reference maps each document by REFLECTING over its JSON at index
time (mapping/document.go:425 walkDocument, mapping/index.go:369
MapDocument): every value is visited, the mapping tree decides which
typed fields it becomes, and per-value type sniffing (a string that
parses as a date becomes a datetime field) patches over JSON's missing
types. A DataFrame is typed up front, so the Spark-native statement of
the same contract walks the SCHEMA once on the driver and compiles the
whole mapping to a flat projection + analyzer plan — zero per-row
mapping work, every downstream stage stays native:

* nested structs flatten to dotted field names exactly like bleve's
  ``encodePath`` (mapping/document.go:32-39; pathSeparator "." in
  mapping/mapping.go),
* per-type document mappings route rows by the ``type_field`` column
  (mapping/index.go:50,  determineType) as a union of per-type
  projections over one shared flat schema,
* dynamic mapping (document.go:43-54 ``Dynamic``) infers the field
  type from the COLUMN type — the deterministic analogue of bleve's
  per-value sniffing: a string column is text, a timestamp column is
  datetime. (A string column holding RFC3339 dates should either be
  loaded as TimestampType or mapped explicitly with
  ``{"type": "datetime"}`` — per-row sniffing would put the same
  column in two indexes at 100 TB, which bleve itself only tolerates
  because it decides per document.)
* arrays of strings become ONE field whose term frequencies merge
  across elements with member-local positions and summed length —
  bleve indexes each array element as a separate same-name field
  instance whose lengths accumulate (document/document.go:35,173-181;
  index/scorch analysis merges same-name instances), which is the
  composite-field merge :func:`_composite_postings` already models.

The mapping's custom ``analysis`` section (char filters, tokenizers,
token maps, token filters, analyzers defined as JSON config —
mapping/analysis.go) compiles through
:mod:`bleve_spark.analysis.custom`; custom analyzer names shadow
built-ins like the registry cache.

``nested: true`` sub-documents (mapping/document.go:48,489-507) are
supported (r4): each nested array<struct> path explodes into CHILD
ROWS keyed by the parent keys + a `_nested_ctx` string
("path:idx[/path2:idx2…]") — the Spark twin of the reference's nested
child documents; conjunctions join at the deepest common nested
ancestor (search/searcher/search_conjunction_nested.go) and hits fold
children into the root (search/collector/topn.go descAdder). Limits:
nested inside per-type mappings is not supported, and the nested path
is in-memory index_table only (not the at-rest segment layout).

Dynamic mapping over MapType columns (r4): bleve enumerates unseen
JSON object keys by reflection (mapping/document.go:425); Spark
enumerates runtime map keys with explode(map), so string-keyed maps
under a dynamic mapping index as data-driven postings whose `field`
column carries "<path>.<key>" names no static plan ever saw
(build._dynamic_map_postings). Term/match/phrase queries against any
runtime key resolve purely through the postings/dictionary; stored
retrieval returns the whole map column. Not covered: numeric range /
sort over map values (postings are text), maps inside nested child
rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve here
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from bleve_spark.index.build import qcol  # noqa: F401  (re-export)

# defaults: mapping/mapping.go:24-43 + mapping/index.go:160-175
DEFAULT_TYPE_FIELD = "_type"
DEFAULT_TYPE = "_default"
DEFAULT_ANALYZER = "standard"
DEFAULT_FIELD = "_all"
PATH_SEP = "."


@dataclass
class FieldMapping:
    """mapping/field.go:41-89. ``name`` overrides the last path
    element (field.go:395-405 getFieldName)."""

    name: str = ""
    type: str = ""
    analyzer: str = ""
    store: bool = True
    index: bool = True
    include_term_vectors: bool = True
    include_in_all: bool = True
    date_format: str = ""
    docvalues: bool = True
    skip_freq_norm: bool = False
    synonym_source: str = ""   # mapping/field.go:85 SynonymSource
    dims: int = 0              # mapping/field.go:75 (vector fields)
    similarity: str = ""       # l2_norm | dot_product | cosine

    @classmethod
    def from_dict(cls, d: dict) -> "FieldMapping":
        return cls(
            name=d.get("name", ""),
            type=d.get("type", ""),
            analyzer=d.get("analyzer", ""),
            store=d.get("store", True),
            index=d.get("index", True),
            include_term_vectors=d.get("include_term_vectors", True),
            include_in_all=d.get("include_in_all", True),
            date_format=d.get("date_format", ""),
            docvalues=d.get("docvalues", True),
            skip_freq_norm=d.get("skip_freq_norm", False),
            synonym_source=d.get("synonym_source", ""),
            dims=int(d.get("dims", 0)),
            similarity=d.get("similarity", ""),
        )


@dataclass
class DocumentMapping:
    """mapping/document.go:43-54; JSON-absent enabled/dynamic default
    to true (document.go UnmarshalJSON)."""

    enabled: bool = True
    dynamic: bool = True
    nested: bool = False
    properties: dict = dc_field(default_factory=dict)
    fields: list = dc_field(default_factory=list)
    default_analyzer: str = ""
    default_synonym_source: str = ""

    @classmethod
    def from_dict(cls, d: dict) -> "DocumentMapping":
        return cls(
            enabled=d.get("enabled", True),
            dynamic=d.get("dynamic", True),
            nested=d.get("nested", False),
            properties={
                k: DocumentMapping.from_dict(v)
                for k, v in (d.get("properties") or {}).items()
            },
            fields=[
                FieldMapping.from_dict(f) for f in (d.get("fields") or [])
            ],
            default_analyzer=d.get("default_analyzer", ""),
            default_synonym_source=d.get("default_synonym_source", ""),
        )

    # mapping/document.go:184-215 documentMappingForPathElements:
    # returns (exact, closest) — closest is the deepest mapping whose
    # prefix matches the path
    def mapping_for_path(self, path: list[str]):
        current = self
        for i, elem in enumerate(path):
            nxt = current.properties.get(elem)
            if nxt is None:
                return None, current
            current = nxt
        return current, current

    # mapping/document.go:380-395 defaultAnalyzerName: walk the path
    # root→leaf, the LAST non-empty default_analyzer wins
    def default_analyzer_for(self, path: list[str]) -> str:
        rv = self.default_analyzer
        current = self
        for elem in path:
            current = current.properties.get(elem)
            if current is None:
                break
            if current.default_analyzer:
                rv = current.default_analyzer
        return rv

    # mapping/document.go:397-410 defaultSynonymSource — same walk
    def default_synonym_source_for(self, path: list[str]) -> str:
        rv = self.default_synonym_source
        current = self
        for elem in path:
            current = current.properties.get(elem)
            if current is None:
                break
            if current.default_synonym_source:
                rv = current.default_synonym_source
        return rv


@dataclass
class IndexMapping:
    """mapping/index.go:47-62 IndexMappingImpl."""

    type_mapping: dict = dc_field(default_factory=dict)
    default_mapping: DocumentMapping = dc_field(
        default_factory=DocumentMapping
    )
    type_field: str = DEFAULT_TYPE_FIELD
    default_type: str = DEFAULT_TYPE
    default_analyzer: str = DEFAULT_ANALYZER
    default_datetime_parser: str = ""
    default_field: str = DEFAULT_FIELD
    store_dynamic: bool = True
    index_dynamic: bool = True
    docvalues_dynamic: bool = True
    scoring_model: str = ""  # "" → tfidf (index.go:55; util.go scoring)
    # the mapping's custom `analysis` section (mapping/analysis.go):
    # config dicts compiled lazily by custom_analyzers()
    analysis: dict = dc_field(default_factory=dict)
    _custom: dict | None = dc_field(default=None, repr=False)

    def custom_analyzers(self) -> dict:
        if self._custom is None:
            from bleve_spark.analysis.custom import build_custom_analysis

            self._custom = build_custom_analysis(self.analysis)
        return self._custom

    def custom_date_parsers(self) -> dict:
        from bleve_spark.analysis.custom import build_date_time_parsers

        return build_date_time_parsers(self.analysis)

    # mapping/document.go:56-105 Validate + validateFieldType +
    # mapping_vectors.go validation — fail fast on unknown analyzer /
    # field type / date parser / synonym source names
    _FIELD_TYPES = {"text", "datetime", "number", "boolean",
                    "geopoint", "geoshape", "IP", "vector"}
    _SIMILARITIES = {"", "l2_norm", "dot_product", "cosine"}

    def validate(self) -> None:
        from bleve_spark.analysis.analyzers import get_analyzer

        custom = self.custom_analyzers()
        parsers = self.custom_date_parsers()
        ss = (self.analysis or {}).get("synonym_sources") or {}

        def check_analyzer(name, where):
            if not name or name in custom:
                return
            try:
                get_analyzer(name)
            except KeyError:
                raise ValueError(
                    f"{where}: unknown analyzer {name!r}"
                ) from None

        def walk(dm: DocumentMapping, path: str):
            check_analyzer(dm.default_analyzer, path or "<root>")
            for fm in dm.fields:
                where = f"field {path or fm.name or '<anon>'!r}"
                if fm.type and fm.type not in self._FIELD_TYPES:
                    raise ValueError(
                        f"{where}: unknown field type {fm.type!r}"
                    )
                check_analyzer(fm.analyzer, where)
                if fm.date_format and fm.date_format not in parsers:
                    raise ValueError(
                        f"{where}: unknown date parser "
                        f"{fm.date_format!r}"
                    )
                if fm.synonym_source and fm.synonym_source not in ss:
                    raise ValueError(
                        f"{where}: unknown synonym source "
                        f"{fm.synonym_source!r}"
                    )
                if fm.type == "vector":
                    if fm.dims <= 0:
                        raise ValueError(
                            f"{where}: vector field needs dims > 0"
                        )
                    if fm.similarity not in self._SIMILARITIES:
                        raise ValueError(
                            f"{where}: unknown similarity "
                            f"{fm.similarity!r}"
                        )
            for k, sub in dm.properties.items():
                walk(sub, f"{path}.{k}" if path else k)

        check_analyzer(self.default_analyzer, "index default_analyzer")
        walk(self.default_mapping, "")
        for t, dm in self.type_mapping.items():
            walk(dm, f"types.{t}")

    @classmethod
    def from_dict(cls, d: dict) -> "IndexMapping":
        return cls(
            type_mapping={
                k: DocumentMapping.from_dict(v)
                for k, v in (d.get("types") or {}).items()
            },
            default_mapping=DocumentMapping.from_dict(
                d.get("default_mapping") or {}
            ),
            type_field=d.get("type_field", DEFAULT_TYPE_FIELD),
            default_type=d.get("default_type", DEFAULT_TYPE),
            default_analyzer=d.get("default_analyzer", DEFAULT_ANALYZER),
            default_datetime_parser=d.get("default_datetime_parser", ""),
            default_field=d.get("default_field", DEFAULT_FIELD),
            store_dynamic=d.get("store_dynamic", True),
            index_dynamic=d.get("index_dynamic", True),
            docvalues_dynamic=d.get("docvalues_dynamic", True),
            scoring_model=d.get("scoring_model", ""),
            analysis=d.get("analysis") or {},
        )

    @classmethod
    def from_json(cls, s: str) -> "IndexMapping":
        return cls.from_dict(json.loads(s))

    # mapping/index.go mappingForType
    def mapping_for_type(self, doc_type: str) -> DocumentMapping:
        dm = self.type_mapping.get(doc_type)
        if dm is not None:
            return dm
        return self.default_mapping

    # mapping/index.go AnalyzerNameForPath — query-time analyzer
    # resolution with only a field path (used by match/phrase query
    # compilation): explicit field mapping first across all type
    # mappings, then default chain
    def analyzer_name_for_path(self, path: str) -> str:
        elems = path.split(PATH_SEP)
        for dm in [*self.type_mapping.values(), self.default_mapping]:
            exact, _ = dm.mapping_for_path(elems)
            if exact is not None:
                for fm in exact.fields:
                    if (fm.name in ("", elems[-1])) and fm.analyzer:
                        return fm.analyzer
        for dm in [*self.type_mapping.values(), self.default_mapping]:
            # full path: the leaf property's own default_analyzer
            # counts (index.go AnalyzerNameForPath → defaultAnalyzerName
            # with the full decoded path)
            da = dm.default_analyzer_for(elems)
            if da:
                return da
        return self.default_analyzer


@dataclass
class PlannedField:
    """One index field the mapping compiles to: a flattened source
    expression + how to index it."""

    name: str            # postings/source field name (dotted path)
    ftype: str           # text|number|datetime|boolean
    analyzer: str | None
    expr: F.Column
    is_array: bool = False
    store: bool = True
    index: bool = True
    include_in_all: bool = True
    date_format: str = ""
    src_kind: str = ""   # spark column kind the plan reads from
    src_dtype: T.DataType | None = None
    synonym_source: str = ""
    dims: int = 0
    similarity: str = ""
    # nested sub-document context: full dotted paths of the nested
    # ancestors this field lives under, root-first (empty for root
    # fields) — document.go:489-507 nested child documents
    nested_chain: tuple = ()


_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _spark_kind(dt: T.DataType) -> str | None:
    if isinstance(dt, T.StringType):
        return "text"
    if isinstance(dt, _NUMERIC):
        return "number"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return "datetime"
    return None


# which mapping field types can consume which column kinds — mirrors
# processString/processFloat64/processBoolean/processTime silently
# skipping incompatible (value, field-type) pairs
# (mapping/field.go:407-470, document.go:552-616): e.g. a text field
# mapping over a float value indexes nothing, a datetime field mapping
# over a string PARSES it
_COMPAT = {
    "text": {"text"},
    "number": {"number"},
    "boolean": {"boolean"},
    # numeric sources are meaningful for datetime ONLY through the
    # epoch parsers (unix_sec/milli/micro/nano); other formats
    # stringify and fail to parse → index nothing, like the reference
    "datetime": {"datetime", "text", "number"},
    "IP": {"text"},
}


def plan_document_mapping(
    schema: T.StructType, dm: DocumentMapping, im: IndexMapping,
    nested_out: list | None = None,
    base_col: str | None = None,
    dynamic_maps_out: list | None = None,
) -> list[PlannedField]:
    """Compile one DocumentMapping against a Spark schema: the static
    twin of walkDocument/processProperty
    (mapping/document.go:425-520, 533-711).

    When ``nested_out`` is given, ``nested: true`` sub-mappings over
    array<struct> columns are NOT flattened here; instead
    ``(relative_path, sub_mapping, element_struct)`` triples are
    appended to it, and map_table explodes them into child rows
    (document.go:489-507: one nested child document per object array
    element). Without the accumulator the legacy behavior (flatten as
    same-name array instances) is preserved.

    ``base_col`` builds every value expression against a struct COLUMN
    of that name instead of top-level columns (used for the exploded
    nested element)."""
    plans: list[PlannedField] = []

    def resolve_analyzer(fm: FieldMapping | None, path: list[str]) -> str:
        if fm is not None and fm.analyzer:
            return fm.analyzer
        # full path, leaf included — field.go analyzerForField passes
        # the whole path to defaultAnalyzerName
        da = dm.default_analyzer_for(path)
        if da:
            return da
        return im.default_analyzer

    def leaf(path: list[str], dtype: T.DataType, is_array: bool):
        kind = _spark_kind(dtype)
        if kind is None:
            return
        if is_array and kind == "boolean":
            # boolean arrays: match via native EXISTS like numeric /
            # datetime arrays (bool_field queries check the column
            # type); no postings needed
            pass
        # text arrays index per element (same-name instances);
        # numeric/datetime/boolean arrays (r4) keep the array column
        # and predicates compile to native EXISTS over the elements —
        # bleve's one-field-instance-per-element semantics
        exact, closest = dm.mapping_for_path(path)
        if exact is not None and not exact.enabled:
            return
        path_str = PATH_SEP.join(path)
        if exact is not None and exact.fields:
            for fm in exact.fields:
                if not fm.index:
                    continue
                ftype = fm.type or kind
                if kind not in _COMPAT.get(ftype, {ftype}):
                    continue  # silently skipped, like the reference
                # getFieldName: explicit name replaces the LAST path
                # element (field.go:395-405)
                if fm.name:
                    name = PATH_SEP.join([*path[:-1], fm.name])
                else:
                    name = path_str
                plans.append(PlannedField(
                    name=name,
                    # IP fields index the literal address untokenized
                    # (document/field_ip.go); ip_range queries compile
                    # to native predicates on the flat column
                    ftype=ftype if ftype != "IP" else "text",
                    analyzer=(
                        resolve_analyzer(fm, path) if ftype == "text"
                        else ("keyword" if ftype == "IP" else None)
                    ),
                    expr=_path_expr(path, base_col),
                    is_array=is_array,
                    store=fm.store,
                    index=fm.index,
                    include_in_all=fm.include_in_all,
                    date_format=fm.date_format,
                    src_kind=kind,
                    src_dtype=dtype,
                    synonym_source=(
                        fm.synonym_source
                        or dm.default_synonym_source_for(path)
                    ),
                ))
        elif closest.dynamic:
            # dynamic defaults: newTextFieldMappingDynamic et al.
            # (field.go:103-140) — store/index follow the index
            # mapping's *_dynamic flags
            if not im.index_dynamic:
                return
            plans.append(PlannedField(
                name=path_str,
                ftype=kind,
                analyzer=(
                    resolve_analyzer(None, path) if kind == "text"
                    else None
                ),
                expr=_path_expr(path, base_col),
                is_array=is_array,
                store=im.store_dynamic,
                index=True,
                include_in_all=True,
                src_kind=kind,
                src_dtype=dtype,
            ))

    def geopoint(path: list[str], dtype: T.DataType,
                 fm: FieldMapping) -> None:
        """Explicit geopoint field mapping (document.go processProperty
        struct/map cases → processGeoPoint): the value may be a
        struct{lat,lon}, an array [lon, lat] (GeoJSON order), or a
        'lat,lon' string (geo/parse.go ExtractGeoPoint). Emits the
        engine's flat <name>_lat / <name>_lon columns."""
        name = (
            PATH_SEP.join([*path[:-1], fm.name]) if fm.name
            else PATH_SEP.join(path)
        )
        e = _path_expr(path, base_col)
        if isinstance(dtype, T.StructType):
            members = {f.name.lower(): f.name for f in dtype.fields}
            lon_k = next(
                (members[k] for k in ("lon", "lng", "longitude")
                 if k in members), None,
            )
            lat_k = next(
                (members[k] for k in ("lat", "latitude")
                 if k in members), None,
            )
            if lon_k is None or lat_k is None:
                return
            lat, lon = e[lat_k], e[lon_k]
        elif isinstance(dtype, T.ArrayType):
            lon, lat = F.element_at(e, 1), F.element_at(e, 2)
        elif isinstance(dtype, T.StringType):
            parts = F.split(e, ",")
            # Column.try_cast: ANSI-safe (unparseable → null)
            lat = F.trim(F.element_at(parts, 1)).try_cast("double")
            lon = F.trim(F.element_at(parts, 2)).try_cast("double")
        else:
            return
        plans.append(PlannedField(
            name=name, ftype="geopoint", analyzer=None,
            expr=F.struct(
                lat.cast("double").alias("lat"),
                lon.cast("double").alias("lon"),
            ),
            store=fm.store, index=fm.index,
            # recorded honestly (drives the _all member-wise geoshape/
            # geopoint fallback), but excluded from the _all composite
            # TERM membership below — morton/cell terms not modeled
            include_in_all=fm.include_in_all,
            src_kind="geopoint", src_dtype=dtype,
        ))

    def geoshape(path: list[str], dtype: T.DataType,
                 fm: FieldMapping) -> None:
        """Explicit geoshape field mapping: a GeoJSON STRING column
        plans a ``<name>_parts`` column (parts engine,
        search/geoshape.py) parsed once at index time. Like geopoint,
        its terms are not modeled in _all."""
        if not isinstance(dtype, T.StringType):
            return
        name = (
            PATH_SEP.join([*path[:-1], fm.name]) if fm.name
            else PATH_SEP.join(path)
        )
        plans.append(PlannedField(
            name=name, ftype="geoshape", analyzer=None,
            expr=_path_expr(path, base_col), store=fm.store, index=fm.index,
            include_in_all=fm.include_in_all,
            src_kind="geoshape", src_dtype=dtype,
        ))

    def vector(path: list[str], dtype: T.DataType,
               fm: FieldMapping) -> None:
        """Explicit vector field mapping (mapping_vectors.go:139-171):
        similarity defaults to l2_norm; cosine NORMALIZES the raw
        vector at index time (mapping_vectors.go:160-163) so cosine
        queries are plain dot products."""
        if not (isinstance(dtype, T.ArrayType)
                and isinstance(dtype.elementType, _NUMERIC)):
            return
        name = (
            PATH_SEP.join([*path[:-1], fm.name]) if fm.name
            else PATH_SEP.join(path)
        )
        plans.append(PlannedField(
            name=name, ftype="vector", analyzer=None,
            expr=_path_expr(path, base_col), store=fm.store, index=fm.index,
            include_in_all=False,
            src_kind="vector", src_dtype=dtype,
            dims=fm.dims, similarity=fm.similarity or "l2_norm",
        ))

    def walk(st: T.StructType, path: list[str], in_array: bool):
        for f in st.fields:
            p = [*path, f.name]
            exact, _ = dm.mapping_for_path(p)
            if exact is not None and not exact.enabled:
                continue
            dt = f.dataType
            for fm in (exact.fields if exact is not None else []):
                if fm.type == "geopoint" and fm.index:
                    geopoint(p, dt, fm)
                elif fm.type == "geoshape" and fm.index:
                    geoshape(p, dt, fm)
                elif fm.type == "vector" and fm.index:
                    vector(p, dt, fm)
            if isinstance(dt, T.StructType):
                # the reference KEEPS walking a struct that carried a
                # geopoint mapping (processProperty sets walkDocument
                # true) — members still index per dynamic rules
                walk(dt, p, in_array)
            elif isinstance(dt, T.MapType):
                # dynamic mapping over RUNTIME keys: bleve walks the
                # JSON object with reflection (mapping/document.go:425)
                # — Spark's explode(map) enumerates the keys at index
                # time, so a string-keyed map under a dynamic mapping
                # becomes data-driven postings (build._dynamic_map_
                # postings); no static column is planned
                dmn = exact if exact is not None else dm
                if (dynamic_maps_out is not None
                        and isinstance(dt.keyType, T.StringType)
                        and dmn.dynamic and im.index_dynamic):
                    dynamic_maps_out.append((
                        PATH_SEP.join(p),
                        resolve_analyzer(None, p),
                    ))
            elif isinstance(dt, T.ArrayType):
                el = dt.elementType
                if isinstance(el, T.StructType):
                    if (nested_out is not None and exact is not None
                            and exact.nested):
                        # nested: true → child documents, exploded by
                        # map_table; nothing planned at this level
                        nested_out.append((p, exact, el))
                    else:
                        # array<struct>: Spark auto-projects a.b over
                        # the array, sub-leaves surface as
                        # array<atomic>
                        walk(el, p, True)
                else:
                    leaf(p, el, True)
            else:
                leaf(p, dt, in_array)

    if not dm.enabled:
        return []
    walk(schema, [], False)
    return plans


def _geojson_parts_udf():
    """GeoJSON string → parts column (Arrow-batched; the reference
    also parses GeoJSON per document at index time —
    document/field_geoshape.go via geo/geojson). Heterogeneous
    coordinate nesting across shape kinds rules out a static struct
    schema, so geoshape source columns are JSON strings."""
    import json as _json

    from pyspark.sql.functions import pandas_udf

    from bleve_spark.search.geoshape import PARTS_SCHEMA, geojson_to_parts

    @pandas_udf(PARTS_SCHEMA)
    def parse(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None
            else geojson_to_parts(_json.loads(v))
        )

    return parse


def _path_expr(path: list[str], base: str | None = None) -> F.Column:
    if base is not None:
        col = F.col(base)[path[0]]
    else:
        col = F.col(path[0])
    for p in path[1:]:
        col = col[p]
    return col


# analysis/datetime/timestamp registered names → epoch divisor
_UNIX_PARSERS = {
    "unix_sec": 1, "unix_milli": 1_000, "unix_micro": 1_000_000,
    "unix_nano": 1_000_000_000,
}


def _all_disabled(dm: DocumentMapping) -> bool:
    # MapDocument checks documentMappingForPath("_all").Enabled
    # (mapping/index.go:390-396)
    exact, _ = dm.mapping_for_path(["_all"])
    return exact is not None and not exact.enabled


def map_table(
    df: DataFrame, im: IndexMapping, key_cols: list[str] | None = None,
    dynamic_maps_out: list | None = None,
) -> tuple[DataFrame, dict, dict, dict]:
    """Compile ``im`` against ``df``: returns (flat_df, fields,
    composite_fields, planned) where ``flat_df`` carries one column
    per planned field (dotted names preserved), ``fields`` maps text
    field → analyzer for :func:`index_table`, ``composite_fields``
    holds the ``_all`` membership, and ``planned`` maps field name →
    :class:`PlannedField` (store flags etc.).

    Per-type document mappings (mapping/index.go:48 TypeMapping,
    determineType) become a UNION of per-type projections: each row is
    routed by the ``type_field`` column to exactly one DocumentMapping
    — one scan per declared type plus one for the default; Catalyst
    collapses the shared source scan, and at 100 TB this stays one
    pass with per-type column pruning.
    """
    schema = df.schema
    names = set(schema.fieldNames())

    keys = set(key_cols or [])

    def plan_for(dm: DocumentMapping):
        nested0: list = []
        plans = plan_document_mapping(schema, dm, im,
                                      nested_out=nested0,
                                      dynamic_maps_out=dynamic_maps_out)
        # key columns are the _id analogue: bleve's document DATA
        # never contains the external id (index.go:46-65 — id and data
        # are separate arguments), and _id is excluded from _all
        # (newWalkContext). They pass through verbatim below.
        plans = [p for p in plans if p.name not in keys]
        for p in plans:
            if p.name == "_id":
                p.include_in_all = False
        return plans, nested0

    routed: list[tuple[F.Column | None, list[PlannedField], DocumentMapping]]
    # nested specs are collected PER ROUTE: a nested sub-mapping
    # inside a per-type document mapping (r5) explodes only that
    # type's rows — the reference allows nested anywhere in the
    # mapping tree (mapping/document.go walk)
    route_nested: list[tuple[F.Column | None, list]] = []
    if im.type_mapping and im.type_field in names:
        routed = []
        declared = sorted(im.type_mapping)
        for t in declared:
            plans_t, nested_t = plan_for(im.type_mapping[t])
            if nested_t:
                route_nested.append(
                    (F.col(im.type_field) == t, nested_t)
                )
            routed.append((
                F.col(im.type_field) == t, plans_t, im.type_mapping[t],
            ))
        default_dm = im.mapping_for_type(im.default_type)
        plans_d, nested_d = plan_for(default_dm)
        default_cond = (
            ~F.col(im.type_field).isin(declared)
            | F.col(im.type_field).isNull()
        )
        if nested_d:
            route_nested.append((default_cond, nested_d))
        routed.append((default_cond, plans_d, default_dm))
    else:
        dm = im.mapping_for_type(im.default_type)
        plans0, nested_specs = plan_for(dm)
        routed = [(None, plans0, dm)]
        if nested_specs:
            route_nested.append((None, nested_specs))

    # ---- nested: true sub-documents (document.go:489-507) --------
    # each nested array<struct> path becomes a CHILD-ROW group: one
    # row per array element, carrying the element's planned fields
    # (full dotted names), the parent keys, and a `_nested_ctx`
    # string "path:idx[/path2:idx2...]" — the Spark twin of the
    # reference's nested child documents ("%s_$%s_$%d" ids). Children
    # are REAL docs in the index (the reference adds them to the
    # segment; global stats count them), keyed by
    # key_cols + _nested_ctx.
    key_list = list(key_cols or [])
    child_groups: list = []  # (chain, plans, frame, ctx_expr)

    def expand_nested(parent_frame, parent_ctx, base, prefix, chain,
                      specs):
        for rel_path, sub_dm, el_struct in specs:
            full = ((prefix + PATH_SEP) if prefix else "") \
                + PATH_SEP.join(rel_path)
            pos, el = f"_pos{len(chain)}", f"_el{len(chain)}"
            arr = _path_expr(rel_path, base)
            ex_cols = [F.col(k) for k in key_list]
            if parent_ctx is not None:
                ex_cols.append(parent_ctx.alias("_pctx"))
            ex = parent_frame.select(
                *ex_cols, F.posexplode(arr).alias(pos, el)
            )
            seg = F.concat(F.lit(full + ":"),
                           F.col(pos).cast("string"))
            ctx = (F.concat(F.col("_pctx"), F.lit("/"), seg)
                   if parent_ctx is not None else seg)
            deeper: list = []
            cplans = plan_document_mapping(
                el_struct, sub_dm, im, nested_out=deeper, base_col=el
            )
            new_chain = chain + (full,)
            for p in cplans:
                p.name = full + PATH_SEP + p.name
                p.nested_chain = new_chain
            child_groups.append((new_chain, cplans, ex, ctx))
            expand_nested(ex, ctx, el, full, new_chain, deeper)

    if route_nested:
        if not key_list:
            raise ValueError(
                "nested mappings require explicit key_cols (the "
                "parent doc identity)"
            )
        for cond, specs in route_nested:
            base_frame = df.where(cond) if cond is not None else df
            expand_nested(base_frame, None, None, "", (), specs)

    # shared flat schema = union of every route's planned fields
    all_names: list[str] = []
    by_name: dict[str, PlannedField] = {}
    for plan_group in ([plans for _, plans, _dm in routed]
                       + [plans for _, plans, _f, _c in child_groups]):
        for p in plan_group:
            if p.name not in by_name:
                by_name[p.name] = p
                all_names.append(p.name)
            elif by_name[p.name].ftype != p.ftype:
                raise ValueError(
                    f"field {p.name!r} maps to {by_name[p.name].ftype} "
                    f"in one type mapping and {p.ftype} in another — "
                    "bleve shares one field namespace across types"
                )
            elif p.nested_chain and not by_name[p.name].nested_chain:
                # one route plans the field flat (e.g. a dynamic
                # route), another as a nested child: the nested plan
                # carries the chain the searcher's ancestor-join
                # needs, so it wins the planned_fields slot (array
                # shape is unified separately via any_array)
                by_name[p.name] = p

    # original columns survive untouched unless a planned field claims
    # the same name (identity mapping over an already-flat schema)
    passthrough = [
        f.name for f in schema.fields if f.name not in by_name
    ]
    # number fields keep their source Spark type (a long doc_id must
    # stay a long — it is also the doc identity); routes disagreeing
    # on the dtype widen to double
    num_dtype: dict[str, T.DataType] = {}
    for plan_group in ([plans for _, plans, _dm in routed]
                       + [plans for _, plans, _f, _c in child_groups]):
        for p in plan_group:
            if p.ftype != "number" or p.src_dtype is None:
                continue
            prev = num_dtype.get(p.name)
            if prev is None:
                num_dtype[p.name] = p.src_dtype
            elif prev != p.src_dtype:
                num_dtype[p.name] = T.DoubleType()
    date_parsers = im.custom_date_parsers()
    # cross-route array unification: when ANY route plans a field as
    # an array (e.g. the dynamic default route flattening an
    # array<struct> that another route explodes as nested children),
    # every route's column must share the array shape — scalars ride
    # as 1-element arrays, which is rank-identical (element 0 carries
    # stride-0 positions, the same length, the same norm)
    any_array: set[str] = set()
    for plan_group in ([plans for _, plans, _dm in routed]
                       + [plans for _, plans, _f, _c in child_groups]):
        for p in plan_group:
            if p.is_array:
                any_array.add(p.name)
    frames = []
    def mk_value_cols(have: dict) -> list:
        """Per-field value/null columns for one frame, shared between
        the per-type route frames and the nested child frames."""
        cols: list = []
        for n in all_names:
            p = have.get(n)
            if by_name[n].ftype == "vector":
                if p is None:
                    cols.append(
                        F.lit(None).cast("array<float>").alias(n))
                else:
                    e = p.expr.cast("array<float>")
                    if p.dims > 0:
                        # wrong-dimensionality rows index nothing,
                        # like the reference's dims validation
                        e = F.when(F.size(e) == p.dims, e)
                    if p.similarity == "cosine":
                        # mapping_vectors.go:160-163: normalize at
                        # index time; cosine becomes a dot product
                        nrm = F.sqrt(F.aggregate(
                            e, F.lit(0.0),
                            lambda a, x: a + x.cast("double") * x,
                        ))
                        e = F.transform(
                            e, lambda x: (x / nrm).cast("float")
                        )
                    cols.append(e.alias(n))
                continue
            if by_name[n].ftype == "geoshape":
                from bleve_spark.search.geoshape import PARTS_SCHEMA

                if p is None:
                    cols.append(
                        F.lit(None).cast(PARTS_SCHEMA)
                        .alias(f"{n}_parts")
                    )
                else:
                    cols.append(
                        _geojson_parts_udf()(p.expr.cast("string"))
                        .alias(f"{n}_parts")
                    )
                continue
            if by_name[n].ftype == "geopoint":
                # geopoints surface as the engine's flat lat/lon pair
                if p is None:
                    cols.append(
                        F.lit(None).cast("double").alias(f"{n}_lat"))
                    cols.append(
                        F.lit(None).cast("double").alias(f"{n}_lon"))
                else:
                    cols.append(p.expr["lat"].alias(f"{n}_lat"))
                    cols.append(p.expr["lon"].alias(f"{n}_lon"))
                continue
            if p is None:
                ref = by_name[n]
                is_arr = ref.is_array or n in any_array
                if is_arr and ref.ftype == "text":
                    null_t = "array<string>"
                elif is_arr and ref.ftype == "number":
                    null_t = (
                        "array<"
                        + num_dtype.get(n, T.DoubleType()).simpleString()
                        + ">"
                    )
                elif is_arr and ref.ftype == "datetime":
                    null_t = "array<timestamp>"
                elif is_arr and ref.ftype == "boolean":
                    null_t = "array<boolean>"
                elif ref.ftype == "number":
                    null_t = num_dtype.get(
                        n, T.DoubleType()
                    ).simpleString()
                else:
                    null_t = {"text": "string", "boolean": "boolean",
                              "datetime": "timestamp"}[ref.ftype]
                cols.append(F.lit(None).cast(null_t).alias(n))
            else:
                e = p.expr
                if p.ftype == "text" and not p.is_array:
                    e = e.cast("string")
                elif p.ftype == "text" and p.is_array:
                    e = e.cast("array<string>")
                elif p.ftype == "number" and p.is_array:
                    e = e.cast(
                        "array<" + num_dtype[p.name].simpleString()
                        + ">"
                    )
                elif p.ftype == "boolean" and p.is_array:
                    e = e.cast("array<boolean>")
                elif p.ftype == "datetime" and p.is_array:
                    if p.src_kind == "datetime":
                        e = e.cast("array<timestamp>")
                    else:
                        pats = date_parsers.get(p.date_format)
                        if pats:
                            e = F.transform(
                                e.cast("array<string>"),
                                lambda s: F.coalesce(*[
                                    F.try_to_timestamp(s, F.lit(pt))
                                    for pt in pats
                                ]),
                            )
                        else:
                            e = F.transform(
                                e.cast("array<string>"),
                                F.try_to_timestamp,
                            )
                elif p.ftype == "number":
                    e = e.cast(num_dtype[p.name].simpleString())
                elif p.ftype == "datetime":
                    if p.src_kind == "datetime":
                        e = e.cast("timestamp")
                    else:
                        # ANSI-safe: a string column mapped datetime
                        # is PARSED (processString case "datetime");
                        # rows the parser rejects index nothing, like
                        # the reference. date_format naming a custom
                        # date_time_parsers entry cascades ITS layouts
                        # (flexible.go ParseDateTime tries in order).
                        if p.date_format in _UNIX_PARSERS:
                            # analysis/datetime/timestamp: epoch
                            # numbers at second/milli/micro/nano
                            # resolution. Exact decimal math straight
                            # to timestamp micros — a from_unixtime
                            # string round-trip would format at
                            # whole-second resolution and silently
                            # discard sub-second precision, unlike
                            # the reference's exact epoch parsers
                            div = _UNIX_PARSERS[p.date_format]
                            dec = e.cast("string").try_cast(
                                "decimal(38,9)"
                            )
                            # floor (not cast-truncate) so negative
                            # pre-1970 sub-microsecond epochs round
                            # DOWN like the reference's integer
                            # nanosecond division
                            e = F.timestamp_micros(
                                F.floor(F.try_divide(
                                    dec * F.lit(1_000_000),
                                    F.lit(int(div)),
                                )).cast("long")
                            )
                        else:
                            s = e.cast("string")
                            pats = date_parsers.get(p.date_format)
                            if pats:
                                e = F.coalesce(*[
                                    F.try_to_timestamp(s, F.lit(pt))
                                    for pt in pats
                                ])
                            else:
                                # "" / "dateTimeOptional": the
                                # default flexible layout set
                                e = F.try_to_timestamp(s)
                if not p.is_array and n in any_array:
                    # another route plans this field as an array —
                    # a scalar rides as its 1-element array (null
                    # source → null array, not [null]); number/text
                    # casts already applied above
                    if p.ftype == "boolean":
                        e = e.cast("boolean")
                    e = F.when(e.isNotNull(), F.array(e))
                cols.append(e.alias(n))
        return cols

    has_nested = bool(child_groups)
    src_dtypes = {f.name: f.dataType for f in schema.fields}
    for cond, plans, _dm in routed:
        if not _dm.enabled:
            # a disabled document mapping indexes NOTHING for its type
            # — the doc never reaches the index (MapDocument only
            # walks when docMapping.Enabled, mapping/index.go:385-397)
            continue
        cols = [F.col(k) for k in passthrough]
        cols += mk_value_cols({p.name: p for p in plans})
        if has_nested:
            # root rows: EMPTY context (not null — joins and groupBys
            # on the key column must keep root rows)
            cols.append(F.lit("").alias("_nested_ctx"))
        # route filter runs BEFORE the projection: the type column may
        # itself be re-planned (or absent) in this route's flat shape
        part = (df.where(cond) if cond is not None else df).select(*cols)
        frames.append(part)
    for _chain, cplans, frame, ctx in child_groups:
        # child rows: real key columns, NULL for every other
        # passthrough source column, the group's own planned fields,
        # and the nested context key
        cols = [
            (F.col(k) if k in keys
             else F.lit(None).cast(src_dtypes[k]).alias(k))
            for k in passthrough
        ]
        cols += mk_value_cols({p.name: p for p in cplans})
        cols.append(ctx.alias("_nested_ctx"))
        frames.append(frame.select(*cols))
    if not frames:
        raise ValueError(
            "every document mapping is disabled — nothing to index"
        )
    flat = frames[0]
    for fr in frames[1:]:
        flat = flat.unionByName(fr)
    # coarse-pruning bbox columns for geoshape fields, derived in a
    # SEPARATE projection layer: CollapseProject will not duplicate
    # the (expensive, Python) parts-parsing expression, so the parse
    # runs once per row while the 8 bbox columns stay native
    for n, p0 in by_name.items():
        if p0.ftype == "geoshape":
            from bleve_spark.search.geobbox import with_parts_bbox

            flat = with_parts_bbox(flat, f"{n}_parts", f"{n}_parts")

    # custom analyzers from the mapping's `analysis` section shadow
    # built-in names (registry cache precedence); fields carry the
    # compiled Analyzer OBJECT so no global registration is needed
    custom = im.custom_analyzers()
    fields = {
        n: custom.get(p.analyzer, p.analyzer)
        for n, p in by_name.items()
        if p.ftype == "text" and p.index
    }
    # scalar BOOLEAN fields index a single T/F term
    # (document/field_boolean.go) through the boolean analyzer, so
    # bool_field queries resolve via postings like every term query;
    # boolean ARRAYS match via EXISTS instead (searcher handles the
    # array dtype)
    for n, p in by_name.items():
        if p.ftype == "boolean" and p.index and not p.is_array:
            fields.setdefault(n, "boolean")
    if not fields:
        raise ValueError("mapping plans no indexed text field")
    # _all membership: include_in_all fields of any type — numeric /
    # datetime / boolean members contribute their 16 prefix-coded trie
    # terms through _typed_member_postings (field_numeric.go:94-116)
    composite: dict[str, list[str]] = {}
    if not _all_disabled(im.mapping_for_type(im.default_type)):
        members = [
            n for n, p in by_name.items()
            if p.include_in_all and p.index
            # geo fields' cell/morton terms are not modeled as _all
            # TOKENS (their _all queries take the member-wise
            # fallback in the searcher); vectors never carry terms.
            # numeric/datetime/boolean ARRAYS contribute per-element
            # typed terms (r5, _typed_member_postings *_array kinds)
            and p.ftype not in ("geoshape", "geopoint", "vector")
        ]
        if members:
            composite[im.default_field] = members
    return flat, fields, composite, by_name


def index_with_mapping(
    df: DataFrame,
    key_cols: list[str],
    im: IndexMapping,
    scoring: str | None = None,
    persist: bool = True,
    **kw,
):
    """Index ``df`` through an IndexMapping — the Spark twin of
    ``bleve.New(path, mapping)`` + ``Batch.Index``. Scoring defaults
    to the mapping's ``scoring_model`` (empty = bleve's legacy tf-idf,
    index.go:55 / util.go scoring models)."""
    from bleve_spark.index.build import index_table

    dynamic_maps: list = []
    flat, fields, composite, planned = map_table(
        df, im, key_cols, dynamic_maps_out=dynamic_maps
    )
    # nested sub-documents: children are real docs keyed by
    # key_cols + _nested_ctx (the reference's "%s_$%s_$%d" child ids);
    # the searcher joins conjunctions on ctx prefixes and folds child
    # scores into the root hit (collector/topn.go descAdder)
    nested_chains = {
        n: p.nested_chain for n, p in planned.items() if p.nested_chain
    }
    root_keys = list(key_cols)
    if nested_chains:
        key_cols = [*key_cols, "_nested_ctx"]
        # the nested flat table is a UNION of the root frame plus one
        # exploded frame per nested path; every plan the index derives
        # from it re-pays Catalyst analysis of that whole subtree
        # (measured ~10s per derived plan on a 4-level mapping). Cut
        # the lineage once: the flat table IS the index's document
        # store — materializing it here is what the at-rest segment
        # write does anyway.
        flat = flat.localCheckpoint(eager=True)
    # synonym sources (mapping/synonym.go + analysis.synonym_sources):
    # a field's synonym_source names a {collection, analyzer} config;
    # the collection keys the index-time thesaurus the caller passes
    # as `thesaurus=` (index/thesaurus.py)
    ss_cfg = (im.analysis or {}).get("synonym_sources") or {}
    syn_cols = {}
    for n, p in planned.items():
        if p.synonym_source:
            try:
                syn_cols[n] = ss_cfg[p.synonym_source]["collection"]
            except KeyError:
                raise ValueError(
                    f"field {n!r} names unknown synonym source "
                    f"{p.synonym_source!r}"
                ) from None
    if syn_cols:
        kw.setdefault("synonym_collections", syn_cols)
    if dynamic_maps:
        from bleve_spark.index.build import _dynamic_map_postings

        kw.setdefault("extra_postings", [
            _dynamic_map_postings(flat, key_cols, path, an)
            for path, an in dynamic_maps
        ])
    idx = index_table(
        flat,
        key_cols,
        fields,
        scoring=scoring or (im.scoring_model or "tfidf"),
        persist=persist,
        composite_fields=composite or None,
        **kw,
    )
    if dynamic_maps:
        _attach_dynamic_maps(idx, im, dynamic_maps)
    # QUERY-time analyzer for the composite resolves through the
    # mapping like any other path: AnalyzerNameForPath("_all") finds
    # no field mapping and falls through the default-analyzer chain to
    # the index default (how a default_analyzer:"en" mapping makes
    # match queries over _all stem their terms — fosdem fixture)
    custom = im.custom_analyzers()
    for cname in composite:
        an = im.analyzer_name_for_path(cname)
        idx.field_analyzers[cname] = custom.get(an, an)
    idx.mapping = im
    idx.planned_fields = planned
    if nested_chains:
        idx.nested_chains = nested_chains
        idx.root_key_cols = root_keys
    return idx


class _FieldAnalyzers(dict):
    """field → analyzer map whose ``get`` falls through to the mapping
    default for unseen names — match queries against runtime map keys
    ("attrs.color") resolve their analyzer exactly like
    AnalyzerNameForPath on an unmapped path."""

    def __init__(self, base, default):
        super().__init__(base)
        self._default = default

    def get(self, k, d=None):
        if k in self:
            return super().get(k)
        return self._default if self._default else d


def _attach_dynamic_maps(idx, im: IndexMapping, dynamic_maps: list):
    custom0 = im.custom_analyzers()
    dflt = custom0.get(im.default_analyzer, im.default_analyzer)
    idx.field_analyzers = _FieldAnalyzers(idx.field_analyzers, dflt)
    idx.dynamic_map_fields = dict(dynamic_maps)


def index_with_mapping_at_rest(
    df: DataFrame,
    key_cols: list[str],
    im: IndexMapping,
    root: str,
    spark=None,
    n_segments: int = 8,
    scoring: str | None = None,
    persist: bool = True,
):
    """Index ``df`` through an IndexMapping into AT-REST segments and
    return the segment-backed IndexedTable — the durable twin of
    :func:`index_with_mapping`. nested:true child rows are real docs
    in the segments (keyed by key_cols + `_nested_ctx`), so nested
    conjunctions and root-folding work identically from segment
    postings. Dynamic MapType columns ARE built at rest (r5): each
    segment task explodes the map into data-driven "<path>.<key>"
    postings streams with per-doc len_ columns, mirroring the
    reference's reflection-driven dynamic indexing into ordinary
    segment fields (mapping/document.go:425)."""
    from bleve_spark.index.segments import SegmentStore, build_segments

    spark = spark or df.sparkSession
    dynamic_maps: list = []
    flat, fields, composite, planned = map_table(
        df, im, key_cols, dynamic_maps_out=dynamic_maps
    )
    nested_chains = {
        n: p.nested_chain for n, p in planned.items() if p.nested_chain
    }
    root_keys = list(key_cols)
    keys_eff = list(key_cols)
    if nested_chains:
        keys_eff = [*key_cols, "_nested_ctx"]
        flat = flat.localCheckpoint(eager=True)
    build_segments(
        flat, keys_eff, fields, root, n_segments=n_segments,
        composite_fields=composite or None,
        dynamic_maps=dynamic_maps or None,
    )
    idx = SegmentStore(spark, root).to_indexed_table(
        flat, keys_eff, fields,
        scoring=scoring or (im.scoring_model or "tfidf"),
        persist=persist,
    )
    if dynamic_maps:
        _attach_dynamic_maps(idx, im, dynamic_maps)
    custom = im.custom_analyzers()
    for cname in composite:
        an = im.analyzer_name_for_path(cname)
        idx.field_analyzers[cname] = custom.get(an, an)
    idx.mapping = im
    idx.planned_fields = planned
    if nested_chains:
        idx.nested_chains = nested_chains
        idx.root_key_cols = root_keys
    return idx
