"""bleve-style top-level Index API — the reference's ``bleve.New`` /
``bleve.Open`` / ``Index`` contract (index_impl.go, index.go Batch)
over this engine.

Scope: this facade serves bleve-STYLE usage — documents arrive as
Python dicts through ``index``/``batch`` (the reference's
``Index(id, data)``), the mapping lives WITH the index
(``mapping.json`` inside the index path, like the reference persists
its mapping in the index meta — index_meta.go), and searches take full
SearchRequest dicts. Document storage is parquet (generation-stamped
appends + id tombstones — the delete-then-introduce shape of
index.go:35-65); the searchable view compiles lazily through the
IndexMapping layer, so every mapping feature (nested paths, per-type
routing, custom analysis, vectors, geo) applies. Web-scale corpora
should use the DataFrame-native APIs directly
(:func:`bleve_spark.index.mapping.index_with_mapping`,
:mod:`bleve_spark.index.segments`); this class is the drop-in surface
a bleve user switches to first.
"""

from __future__ import annotations

import builtins
import json
import os

from pyspark.sql import SparkSession, functions as F

from bleve_spark.index.mapping import IndexMapping, index_with_mapping

_ID = "_id_key"  # internal doc-identity column (bleve's external _id)
_open = builtins.open  # `open` below shadows the builtin in this module


class Batch:
    """index.go:35-80 Batch: buffered index/delete ops applied
    atomically by :meth:`Index.batch`. One ops map, LAST op per id
    wins (the reference's IndexOps map: Index sets data, Delete sets
    nil) — index-then-delete of the same id deletes it."""

    def __init__(self):
        self._ops: dict[str, dict | None] = {}  # None = delete

    def index(self, id: str, data: dict) -> None:
        if not id:
            raise ValueError("batch: empty document id")
        self._ops[str(id)] = data

    def delete(self, id: str) -> None:
        self._ops[str(id)] = None

    @property
    def _index(self) -> dict:
        return {i: d for i, d in self._ops.items() if d is not None}

    @property
    def _delete(self) -> list:
        return [i for i, d in self._ops.items() if d is None]

    def __len__(self) -> int:
        return len(self._ops)


def new(path: str, mapping: IndexMapping | dict | None = None,
        spark: SparkSession | None = None) -> "Index":
    """bleve.New: create an index at ``path`` with ``mapping``
    (default: an all-dynamic default mapping)."""
    if os.path.exists(os.path.join(path, "mapping.json")):
        raise FileExistsError(f"index already exists at {path!r}")
    os.makedirs(path, exist_ok=True)
    if mapping is None:
        mapping = IndexMapping()
    elif isinstance(mapping, dict):
        mapping = IndexMapping.from_dict(mapping)
    with _open(os.path.join(path, "mapping.json"), "w") as f:
        json.dump(mapping_to_dict(mapping), f)
    return Index(path, mapping, spark)


def open(path: str, spark: SparkSession | None = None) -> "Index":
    """bleve.Open: open an existing index; the PERSISTED mapping wins
    (index_meta.go — the mapping travels with the index)."""
    mp = os.path.join(path, "mapping.json")
    if not os.path.exists(mp):
        raise FileNotFoundError(f"no index at {path!r}")
    with _open(mp) as f:
        mapping = IndexMapping.from_dict(json.load(f))
    return Index(path, mapping, spark)


def mapping_to_dict(im: IndexMapping) -> dict:
    """Serialize an IndexMapping back to the reference's JSON shape."""
    def dm(d):
        out = {"enabled": d.enabled, "dynamic": d.dynamic}
        if d.default_analyzer:
            out["default_analyzer"] = d.default_analyzer
        if d.default_synonym_source:
            out["default_synonym_source"] = d.default_synonym_source
        if d.properties:
            out["properties"] = {k: dm(v) for k, v in d.properties.items()}
        if d.fields:
            out["fields"] = [fm(x) for x in d.fields]
        return out

    def fm(x):
        out = {}
        for k in ("name", "type", "analyzer", "date_format",
                  "synonym_source", "similarity"):
            v = getattr(x, k)
            if v:
                out[k] = v
        for k in ("store", "index", "include_term_vectors",
                  "include_in_all", "docvalues"):
            out[k] = getattr(x, k)
        if x.dims:
            out["dims"] = x.dims
        return out

    out = {
        "default_mapping": dm(im.default_mapping),
        "type_field": im.type_field,
        "default_type": im.default_type,
        "default_analyzer": im.default_analyzer,
        "default_field": im.default_field,
        "store_dynamic": im.store_dynamic,
        "index_dynamic": im.index_dynamic,
    }
    if im.type_mapping:
        out["types"] = {k: dm(v) for k, v in im.type_mapping.items()}
    if im.scoring_model:
        out["scoring_model"] = im.scoring_model
    if im.analysis:
        out["analysis"] = im.analysis
    return out


class Index:
    """The reference's Index interface (index_impl.go) — see module
    docstring for scope.

    Liveness model: every batch gets a GENERATION number; an index op
    writes a tombstone AND a doc row at that generation (the
    delete-then-introduce of index.go:35-65), a delete writes only the
    tombstone. An id is live iff its newest doc generation ≥ its
    newest tombstone generation — so delete→reindex revives and
    index→delete kills, independent of parquet file order.
    """

    def __init__(self, path: str, mapping: IndexMapping,
                 spark: SparkSession | None = None):
        self.path = path
        self._mapping = mapping
        self._spark = spark or SparkSession.builder.getOrCreate()
        self._idx = None  # compiled searchable view, rebuilt on write
        self._closed = False

    # ------------------------------------------------------- writes --

    def index(self, id: str, data: dict) -> None:
        """index_impl.go:311 Index(id, data)."""
        b = Batch()
        b.index(id, data)
        self.batch(b)

    def delete(self, id: str) -> None:
        b = Batch()
        b.delete(id)
        self.batch(b)

    def index_synonym(self, id: str, collection: str,
                      definition: dict) -> None:
        """index_impl.go:336 IndexSynonym: a SynonymDefinition
        ({"input": [...], "synonyms": [...]}, input optional →
        bidirectional) indexed INTO the index under ``collection``;
        it persists next to the docs (same generation liveness:
        re-indexing an id replaces it) and fields wired to a synonym
        source with that collection expand through it at query time."""
        self._check_open()
        if not id:
            raise ValueError("synonym document: empty id")
        syns = definition.get("synonyms") or []
        if not syns:
            raise ValueError("synonym definition: empty synonyms")
        gen = self._next_gen()
        row = json.dumps({
            "_syn_id": str(id), "collection": collection,
            "input": list(definition.get("input") or []),
            "synonyms": list(syns), "_gen": gen,
        })
        self._spark.read.json(
            self._spark.sparkContext.parallelize([row])
        ).write.mode("append").option("mergeSchema", "true").parquet(
            os.path.join(self.path, "synonyms")
        )
        self._idx = None

    def _live_synonym_defs(self):
        d = os.path.join(self.path, "synonyms")
        if not os.path.isdir(d):
            return {}
        from pyspark.sql.window import Window

        df = self._spark.read.option("mergeSchema", "true").parquet(d)
        w = Window.partitionBy("_syn_id").orderBy(
            F.col("_gen").desc()
        )
        rows = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .collect()
        )
        by_coll: dict[str, list] = {}
        for r in rows:
            by_coll.setdefault(r["collection"], []).append({
                "input": list(r["input"] or []),
                "synonyms": list(r["synonyms"] or []),
            })
        return by_coll

    def _next_gen(self) -> int:
        gp = os.path.join(self.path, "gen.txt")
        g = 0
        if os.path.exists(gp):
            with _open(gp) as f:
                g = int(f.read().strip() or 0)
        with _open(gp, "w") as f:
            f.write(str(g + 1))
        return g + 1

    def batch(self, b: Batch) -> None:
        """index_impl.go:422 Batch."""
        self._check_open()
        ids = list(b._ops)
        if not ids:
            return
        gen = self._next_gen()
        self._spark.createDataFrame(
            [(i, gen) for i in ids], f"{_ID} string, _gen long"
        ).write.mode("append").parquet(
            os.path.join(self.path, "deletes")
        )
        to_index = b._index
        if to_index:
            rows = [
                json.dumps({**data, _ID: i, "_gen": gen})
                for i, data in to_index.items()
            ]
            df = self._spark.read.json(
                self._spark.sparkContext.parallelize(rows)
            )
            df.write.mode("append").option("mergeSchema", "true") \
                .parquet(os.path.join(self.path, "docs"))
        self._idx = None

    # -------------------------------------------------------- reads --

    def _live_docs(self):
        d = os.path.join(self.path, "docs")
        if not os.path.isdir(d):
            return None
        from pyspark.sql.window import Window

        docs = self._spark.read.option("mergeSchema", "true").parquet(d)
        w = Window.partitionBy(_ID).orderBy(F.col("_gen").desc())
        newest = (
            docs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn")
        )
        dels = (
            self._spark.read.parquet(os.path.join(self.path, "deletes"))
            .groupBy(_ID).agg(F.max("_gen").alias("_delgen"))
        )
        return (
            newest.join(dels, _ID, "left_outer")
            .where(
                F.col("_delgen").isNull()
                | (F.col("_gen") >= F.col("_delgen"))
            )
            .drop("_delgen", "_gen")
        )

    def _compiled(self):
        self._check_open()
        if self._idx is None:
            docs = self._live_docs()
            if docs is None:
                raise ValueError("index is empty — nothing indexed yet")
            kw = {}
            by_coll = self._live_synonym_defs()
            if by_coll:
                from bleve_spark.index.thesaurus import (
                    build_thesaurus,
                    merge_thesauri,
                )

                ss_cfg = (self._mapping.analysis or {}).get(
                    "synonym_sources"
                ) or {}
                dfs = []
                for coll, defs in by_coll.items():
                    an = "standard"
                    for cfg in ss_cfg.values():
                        if cfg.get("collection") == coll:
                            an = cfg.get("analyzer") or "standard"
                    dfs.append(build_thesaurus(
                        self._spark, defs, analyzer=an,
                        collection=coll,
                    ))
                kw["thesaurus"] = merge_thesauri(dfs)
            self._idx = index_with_mapping(
                docs, [_ID], self._mapping, **kw
            )
        return self._idx

    def search(self, req: dict) -> dict:
        """index_impl.go:488 Search with a SearchRequest dict: query,
        size, from, fields, facets, sort, search_after/before,
        highlight, explain, includeLocations, score, knn +
        knn_operator."""
        from bleve_spark.search.searcher import search, search_df

        idx = self._compiled()
        size = int(req.get("size", 10))
        from_ = int(req.get("from", 0))
        if req.get("knn"):
            from bleve_spark.search.hybrid import knn_request_full_df

            full = knn_request_full_df(
                idx, req["knn"], q=req.get("query"),
                knn_operator=req.get("knn_operator", "or"),
            ).persist()
            try:
                # true match total — the reference's SearchResult.Total
                # counts every match, not the collected page
                total = full.count()
                out = (
                    full.orderBy(
                        F.col("score").desc(), F.col(_ID).asc()
                    )
                    .limit(from_ + size)
                    .collect()[from_:]
                )
            finally:
                full.unpersist()
            return {
                "total_hits": total,
                "hits": [
                    {"id": r[_ID], "score": float(r["score"])}
                    for r in out
                ],
            }
        if req.get("sort") or req.get("search_after") \
                or req.get("search_before"):
            from bleve_spark.search.searcher import compile_query

            # compile ONCE, persist, and share the scored frame
            # between the page and the true-total count — two
            # uncached passes would scan the postings twice
            scored = compile_query(idx, req["query"]).persist()
            try:
                rows = search_df(
                    idx, req["query"], size=size, from_=from_,
                    sort=req.get("sort"),
                    search_after=req.get("search_after"),
                    search_before=req.get("search_before"),
                    precompiled=scored,
                ).collect()
                # true match total (the collected page is capped at
                # from+size and includes skipped rows) — same contract
                # as the default branch / the reference's
                # SearchResult.Total
                total = scored.count()
            finally:
                scored.unpersist()
            return {
                "total_hits": total,
                "hits": [
                    {
                        "id": r[_ID],
                        "score": (
                            float(r["score"])
                            if "score" in r.__fields__ else 0.0
                        ),
                    }
                    for r in rows[from_:]
                ],
            }
        hl = (req.get("highlight") or {}).get("fields") or []
        return search(
            idx, req["query"], size=size, from_=from_,
            facets=req.get("facets"),
            fields=req.get("fields"),
            highlight_field=hl or None,
            explain=bool(req.get("explain")),
            include_locations=bool(req.get("includeLocations")),
            score=req.get("score"),
        )

    def doc_count(self) -> int:
        """index_impl.go:463 DocCount — live docs."""
        self._check_open()
        docs = self._live_docs()
        return 0 if docs is None else docs.count()

    def document(self, id: str) -> dict | None:
        """index_impl.go:437 Document: stored fields of one doc."""
        self._check_open()
        docs = self._live_docs()
        if docs is None:
            return None
        rows = docs.where(F.col(_ID) == str(id)).collect()
        if not rows:
            return None
        d = rows[0].asDict(recursive=True)
        d.pop(_ID, None)
        return d

    def fields(self) -> list[str]:
        """index_impl.go:1223 Fields — indexed field names."""
        idx = self._compiled()
        return sorted(
            k if isinstance(k, str) else str(k)
            for k in idx.field_analyzers
        )

    def field_dict(self, field: str, prefix: str | None = None,
                   start: str | None = None,
                   end: str | None = None) -> list[tuple[str, int]]:
        """FieldDict / FieldDictPrefix / FieldDictRange
        (index_impl.go:1248-1328): (term, doc_freq) sorted by term."""
        idx = self._compiled()
        d = idx.dictionary.where(F.col("field") == field)
        if prefix is not None:
            d = d.where(F.col("term").startswith(prefix))
        if start is not None:
            d = d.where(F.col("term") >= start)
        if end is not None:
            d = d.where(F.col("term") < end)
        return [
            (r["term"], int(r["doc_freq"]))
            for r in d.select("term", "doc_freq")
            .orderBy("term").collect()
        ]

    def mapping(self) -> IndexMapping:
        return self._mapping

    def stats_map(self) -> dict:
        """index_impl.go:1343 StatsMap (subset)."""
        idx = self._compiled()
        return {
            "doc_count": idx.stats.doc_count,
            "field_cardinality": dict(idx.stats.field_cardinality),
            "scoring": idx.stats.scoring,
        }

    def set_internal(self, key: str, val: str) -> None:
        """index_impl.go:1372 SetInternal — app-level KV riding inside
        the index directory (file-per-key; last write wins)."""
        self._check_open()
        d = os.path.join(self.path, "internal")
        os.makedirs(d, exist_ok=True)
        import hashlib as _h

        fn = _h.sha256(key.encode()).hexdigest()[:32] + ".json"
        with _open(os.path.join(d, fn), "w") as f:
            f.write(json.dumps({"k": key, "v": val}))

    def get_internal(self, key: str) -> str | None:
        """index_impl.go:1347 GetInternal."""
        self._check_open()
        import hashlib as _h

        fn = _h.sha256(key.encode()).hexdigest()[:32] + ".json"
        p = os.path.join(self.path, "internal", fn)
        if not os.path.exists(p):
            return None
        with _open(p) as f:
            d = json.load(f)
        return d["v"] if d.get("k") == key else None

    def delete_internal(self, key: str) -> None:
        """index_impl.go:1383 DeleteInternal."""
        self._check_open()
        import hashlib as _h

        fn = _h.sha256(key.encode()).hexdigest()[:32] + ".json"
        p = os.path.join(self.path, "internal", fn)
        if os.path.exists(p):
            os.remove(p)

    def advanced(self):
        """index_impl.go:298 Advanced — the underlying engine handle:
        here, the compiled :class:`IndexedTable` (source, postings,
        dictionary, stats) for callers that want to run DataFrame
        plans directly."""
        return self._compiled()

    def train(self, b: Batch) -> None:
        """index_impl.go:368 Train — vector-index training; only
        meaningful for faiss-backed vector indexes, which are out of
        scope (LSH/IVF at-rest layouts are the ANN scale path here).
        Mirrors the reference's unsupported error."""
        raise NotImplementedError(
            "train is not supported: vector-index training is "
            "faiss-specific; ANN uses the LSH/IVF at-rest layouts"
        )

    def name(self) -> str:
        return os.path.basename(self.path.rstrip("/"))

    def close(self) -> None:
        self._idx = None
        self._closed = True

    def _check_open(self):
        if self._closed:
            raise ValueError("index is closed")


class IndexAlias:
    """bleve.NewIndexAlias (index_alias_impl.go): searches fan out
    across member Index objects with merged global stats (the
    pre-search phase) and fused hit lists. Members must share the doc
    identity scheme (ids are strings everywhere here)."""

    def __init__(self, *indexes: Index):
        if not indexes:
            raise ValueError("alias needs at least one index")
        self._members = list(indexes)

    def add(self, ix: Index) -> None:
        self._members.append(ix)

    def search(self, req: dict) -> dict:
        from bleve_spark.search.alias import AliasIndex
        from bleve_spark.search.searcher import search

        compiled = AliasIndex([m._compiled() for m in self._members])
        return search(
            compiled, req["query"],
            size=int(req.get("size", 10)),
            from_=int(req.get("from", 0)),
            facets=req.get("facets"),
            score=req.get("score"),
        )

    def doc_count(self) -> int:
        return sum(m.doc_count() for m in self._members)


def new_index_alias(*indexes: Index) -> IndexAlias:
    """bleve.NewIndexAlias."""
    return IndexAlias(*indexes)
