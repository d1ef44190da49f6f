"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 query on sf0.001; ``queries`` exposes
one callable per implemented operator (SURVEY.md §2 + training-data
ops); ``oracle_sql`` gives the DuckDB-equivalent SQL. Fulltext oracles
reproduce the engine's exact semantics — bleve-parity BM25 (float32
norm roundtrip, ceil'd avgDocLen, tf=√freq), queryNorm/coord composite
scoring — as pure SQL CTEs over the same parquet, so the driver's
row-count + schema + value-hash compare is a true rank-identity gate.

Scores are rounded to 6 decimals on BOTH sides (ln/sqrt may differ in
the last ulp across libm implementations; everything else is identical
IEEE-754 double arithmetic in the same operation order).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from bleve_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from bleve_spark.index.build import index_table
from bleve_spark.search.searcher import compile_query

# --------------------------------------------------------------- caches --

_INDEX_CACHE: dict = {}


def _docs_index(spark: SparkSession, sf_dir: str, scoring: str = "bm25"):
    key = (spark.sparkContext.applicationId, sf_dir, "documents", scoring)
    if key not in _INDEX_CACHE:
        # derived columns: boolean field + deterministic geopoint
        # (integer arithmetic — byte-identical in the SQL oracle)
        df = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("long_doc", F.col("n_chars") > 300)
            .withColumn(
                "geo_lat",
                ((F.col("doc_id") * 7) % 181 - 90).cast("double"),
            )
            .withColumn(
                "geo_lon",
                ((F.col("doc_id") * 13) % 361 - 180).cast("double"),
            )
            .withColumn(
                "ip",
                F.concat_ws(
                    ".",
                    F.lit("10"),
                    (F.col("doc_id") % 256).cast("string"),
                    ((F.col("doc_id") * 3) % 256).cast("string"),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            )
        )
        # deterministic doc shapes for geoshape queries (all integer
        # arithmetic → byte-identical in the SQL oracle): point /
        # 3-vertex linestring / closed rectangle ring per doc_id % 3
        bx = ((F.col("doc_id") * 13) % 141 - 70).cast("double")
        by = ((F.col("doc_id") * 7) % 121 - 60).cast("double")
        dx = (F.col("doc_id") % 4 + 1).cast("double")
        dy = (F.col("doc_id") % 3 + 1).cast("double")
        w = (F.col("doc_id") % 5 + 2).cast("double")
        h = (F.col("doc_id") % 7 + 2).cast("double")
        pt = F.array(F.array(bx, by))
        ls = F.array(
            F.array(bx, by),
            F.array(bx + dx, by + dy),
            F.array(bx + dx * 2, by - dy),
        )
        pg = F.array(
            F.array(bx, by),
            F.array(bx + w, by),
            F.array(bx + w, by + h),
            F.array(bx, by + h),
            F.array(bx, by),
        )
        m3 = F.col("doc_id") % 3
        df = df.withColumn(
            "shape_kind",
            F.when(m3 == 0, F.lit("point"))
            .when(m3 == 1, F.lit("linestring"))
            .otherwise(F.lit("polygon")),
        ).withColumn(
            "shape_coords",
            F.when(m3 == 0, pt).when(m3 == 1, ls).otherwise(pg),
        )
        # materialized per-shape bbox columns: the coarse spatial
        # pre-filter (geobbox.py) reads these instead of recomputing
        # vertex hulls per query — and written to parquet they carry
        # min/max stats for row-group pruning (the s2 cell-term
        # pre-filter's at-rest analogue)
        from bleve_spark.search.geobbox import with_flat_shape_bbox

        df = with_flat_shape_bbox(df, "shape")
        _INDEX_CACHE[key] = index_table(
            df,
            key_cols=["doc_id"],
            fields={"text": "standard", "lang": "keyword",
                    "source": "keyword", "long_doc": "boolean"},
            scoring=scoring,
        )
    return _INDEX_CACHE[key]


def _docs_index_nodict(spark: SparkSession, sf_dir: str):
    """Same documents index with the driver-side dictionary cache
    DISABLED (dict_cache_max=0): every dictionary expansion runs the
    fully distributed SDictDisj join path. Pins the 100 TB plan under
    the same oracles as the cached path."""
    import dataclasses

    key = (spark.sparkContext.applicationId, sf_dir, "documents-nodict")
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = dataclasses.replace(
            _docs_index(spark, sf_dir), dict_cache_max=0, _dict_map=None
        )
    return _INDEX_CACHE[key]


def _events_index(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir, "events")
    if key not in _INDEX_CACHE:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        _INDEX_CACHE[key] = index_table(
            df,
            key_cols=["event_id"],
            fields={"event_type": "keyword"},
            scoring="bm25",
        )
    return _INDEX_CACHE[key]


_ANN_LAYOUTS: dict = {}


def _ann_layout(spark, sf: str, kind: str) -> str:
    """Build-once at-rest ANN layout (IVF cell-partitioned / LSH
    signed) under .ann_cache/<sf-name>/<kind>. The write is index-time
    work paid once; every gate/bench query then probes the layout with
    partition pruning (ivf) or a pushed-down stored-signature filter
    (lsh) — the genuine 100 TB serving path."""
    import os

    from bleve_spark.functions.similarity import (
        write_ivf_partitioned, write_ivfpq_partitioned, write_lsh_signed,
    )

    name = os.path.basename(sf.rstrip("/"))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".ann_cache",
        name, kind,
    )
    key = (name, kind)
    # hnsw writes two datasets (graph/ + vectors/) under path — its
    # success marker lives in the last one written
    marker = os.path.join(
        path, "vectors", "_SUCCESS"
    ) if kind.startswith("hnsw") else os.path.join(path, "_SUCCESS")
    if key not in _ANN_LAYOUTS:
        if not os.path.exists(marker):
            df = spark.read.parquet(f"{sf}/embeddings.parquet")
            if kind == "hnsw4":
                from bleve_spark.functions.hnsw import (
                    write_hnsw_partitioned,
                )

                write_hnsw_partitioned(
                    df, "embedding", "vec_id", path, n_segments=4,
                    m=16, ef_construction=100, seed=47,
                )
            elif kind == "ivf6":
                write_ivf_partitioned(
                    df, "embedding", path, cell_bits=6, seed=11
                )
            elif kind == "ivfpq6":
                # same planes seed as ivf6 → identical cell geometry;
                # full vectors NOT stored, M=8 code bytes per vector
                write_ivfpq_partitioned(
                    df, "embedding", "vec_id", path, cell_bits=6,
                    m=8, nbits=8, seed=11,
                )
            elif kind == "lsh12":
                write_lsh_signed(df, "embedding", path, planes=12, seed=7)
            else:
                raise ValueError(kind)
        _ANN_LAYOUTS[key] = path
    return path


def _mapped_docs_index(spark: SparkSession, sf_dir: str, variant: str):
    """Documents indexed THROUGH the IndexMapping layer
    (bleve_spark/index/mapping.py — mapping/index.go MapDocument):

    * ``nested``  — doc_id + body{text,lang} + meta{n_chars} structs,
      static mapping with explicit per-path field mappings; flattened
      field names are dotted paths (body.text).
    * ``typed``   — flat columns routed by type_field='source' with
      type 'src7' DISABLED: its rows never reach the index (doc_count,
      df, avgdl all shrink), everything else takes the default static
      mapping.
    * ``tags``    — tags = [lang, lang, source] as an array<string>
      keyword field: per-element same-name instances merge (summed tf,
      element-local positions, norm over Σ lengths).
    * ``knn``     — embeddings table with a VECTOR field mapping
      (dims=64, dot_product) + a keyword-ish tag text field, for the
      SearchRequest.KNN contract entry.
    * ``custom``  — a custom `analysis` section: edge_ngram(2,3)
      autocomplete analyzer over the source column.
    """
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    key = (spark.sparkContext.applicationId, sf_dir, "mapped", variant)
    if key not in _INDEX_CACHE:
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if variant == "nested":
            src = df.select(
                "doc_id",
                F.struct(
                    F.col("text").alias("text"),
                    F.col("lang").alias("lang"),
                ).alias("body"),
                F.struct(F.col("n_chars").alias("n_chars")).alias("meta"),
            )
            im = IndexMapping.from_dict({
                "default_mapping": {"dynamic": False, "properties": {
                    "body": {"properties": {
                        "text": {"fields": [
                            {"type": "text", "analyzer": "standard"},
                        ]},
                        "lang": {"fields": [
                            {"type": "text", "analyzer": "keyword"},
                        ]},
                    }},
                    "meta": {"properties": {"n_chars": {"fields": [
                        {"type": "number"},
                    ]}}},
                }},
                "scoring_model": "bm25",
            })
        elif variant == "typed":
            src = df.select("doc_id", "text", "lang", "source")
            im = IndexMapping.from_dict({
                "type_field": "source",
                "types": {"src7": {"enabled": False}},
                "default_mapping": {"dynamic": False, "properties": {
                    "text": {"fields": [{"type": "text"}]},
                }},
                "scoring_model": "bm25",
            })
        elif variant == "tags":
            src = df.select(
                "doc_id",
                F.array("lang", "lang", "source").alias("tags"),
            )
            im = IndexMapping.from_dict({
                "default_mapping": {"dynamic": False, "properties": {
                    "tags": {"fields": [
                        {"type": "text", "analyzer": "keyword"},
                    ]},
                }},
                "scoring_model": "bm25",
            })
        elif variant == "knn":
            # embeddings table mapped with a VECTOR field
            # (mapping_vectors.go): dims-guarded, dot_product metric
            src = (
                spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .withColumn(
                    "tag",
                    F.concat(F.lit("v"), F.col("label").cast("string")),
                )
                .select("vec_id", "embedding", "tag", "label")
            )
            im = IndexMapping.from_dict({
                "default_mapping": {"dynamic": False, "properties": {
                    "embedding": {"fields": [
                        {"type": "vector", "dims": 64,
                         "similarity": "dot_product"},
                    ]},
                    "tag": {"fields": [{"type": "text"}]},
                }},
                "scoring_model": "bm25",
            })
            _INDEX_CACHE[key] = index_with_mapping(src, ["vec_id"], im)
            return _INDEX_CACHE[key]
        elif variant == "geo":
            # nested geopoint struct mapped to the flat lat/lon pair
            src = df.select(
                "doc_id",
                "lang",
                F.struct(
                    ((F.col("doc_id") * 7) % 181 - 90)
                    .cast("double").alias("lat"),
                    ((F.col("doc_id") * 13) % 361 - 180)
                    .cast("double").alias("lon"),
                ).alias("geo"),
            )
            im = IndexMapping.from_dict({
                "default_mapping": {"dynamic": False, "properties": {
                    "geo": {"fields": [{"type": "geopoint"}]},
                    "lang": {"fields": [
                        {"type": "text", "analyzer": "keyword"},
                    ]},
                }},
                "scoring_model": "bm25",
            })
        else:  # custom — `analysis` section: edge_ngram autocomplete
            src = df.select("doc_id", "source")
            im = IndexMapping.from_dict({
                "analysis": {
                    "token_filters": {
                        "eng23": {"type": "edge_ngram",
                                  "min": 2, "max": 3},
                    },
                    "analyzers": {
                        "autocomplete": {
                            "type": "custom", "tokenizer": "single",
                            "token_filters": ["to_lower", "eng23"],
                        },
                    },
                },
                "default_mapping": {"dynamic": False, "properties": {
                    "source": {"fields": [
                        {"type": "text", "analyzer": "autocomplete"},
                    ]},
                }},
                "scoring_model": "bm25",
            })
        _INDEX_CACHE[key] = index_with_mapping(src, ["doc_id"], im)
    return _INDEX_CACHE[key]


def _topk(idx, q, k=20, from_=0) -> DataFrame:
    """Rounded-score top-k with deterministic (rounded score, key)
    ordering so engine and oracle select identical boundary rows."""
    scored = compile_query(idx, q).select(
        *idx.key_cols, F.round(F.col("score"), 6).alias("score")
    )
    order = [F.col("score").desc()] + [F.col(c).asc() for c in idx.key_cols]
    top = scored.orderBy(*order).limit(from_ + k)
    if from_ > 0:
        head = scored.orderBy(*order).limit(from_)
        top = top.join(head, idx.key_cols, "left_anti")
    return top


# ------------------------------------------------------------ oracle SQL --

_STOP_SQL = ", ".join(
    "'" + w.replace("'", "''") + "'" for w in sorted(ENGLISH_STOP_WORDS)
)

# postings/dict/stats over `documents` — the SQL statement of the same
# single-segment index the engine builds (text is space-joined lowercase
# tokens, so UAX#29 == string_split here; stop list applied verbatim)


def _mk_prelude(avgl_cte: str) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), tok AS (
  SELECT doc_id, unnest(words) AS term,
         unnest(range(1, len(words)+1)) AS pos
  FROM raw
), tok2 AS (
  SELECT * FROM tok WHERE term NOT IN ({_STOP_SQL})
), doclen AS (
  SELECT doc_id, count(*) AS flen FROM tok2 GROUP BY doc_id
), post AS (
  SELECT t.doc_id, t.term, count(*) AS tf,
         CAST(CAST(1.0/sqrt(d.flen) AS REAL) AS DOUBLE) AS norm,
         list(t.pos ORDER BY t.pos) AS positions
  FROM tok2 t JOIN doclen d USING (doc_id)
  GROUP BY t.doc_id, t.term, d.flen
), ndocs AS (SELECT count(*) AS n FROM documents),
{avgl_cte}, dict AS (
  SELECT term, count(*) AS df FROM post GROUP BY term
)
"""


_PRELUDE = _mk_prelude(
    """avgl AS (
  SELECT ceil(CAST(count(DISTINCT term) AS DOUBLE)
              / (SELECT n FROM ndocs)) AS v
  FROM post
)"""
)

# composite `_all` = text (standard-analyzed) + lang + source
# (keyword members): flen = post-stop text tokens + 2, freqs merged —
# field_composite.go semantics (per-member analysis, Σ lengths)
_PRELUDE_COMPOSITE = _mk_prelude(
    """avgl AS (
  SELECT ceil(CAST(count(DISTINCT term) AS DOUBLE)
              / (SELECT n FROM ndocs)) AS v
  FROM post
)"""
).replace(
    "SELECT doc_id, string_split(text, ' ') AS words FROM documents",
    "SELECT doc_id, list_concat(string_split(text, ' '), "
    "[lang, source]) AS words FROM documents",
)

# composite `_all` with TYPED members: text + lang + source + n_chars
# (numeric → 16 prefix-coded trie terms) + long_doc (boolean → one
# "T"/"F" token). flen gains +17; avg_doc_len's cardinality gains the
# distinct trie/boolean terms. The trie-term count is computed from
# the IEEE-754 bits of CAST(n_chars AS DOUBLE) (exact for positive
# integers; numeric/float.go Float64ToInt64 keeps nonneg bits as-is):
# prefix coding is injective at fixed shift, first byte differs across
# shifts, and every trie term of a float64-coded value contains a
# control byte (<0x20) so it can never collide with a printable
# text/keyword token — cardinalities therefore ADD.
_PRELUDE_COMPOSITE_TYPED = f"""
WITH raw AS (
  SELECT doc_id, list_concat(string_split(text, ' '), [lang, source])
         AS words
  FROM documents
), tok AS (
  SELECT doc_id, unnest(words) AS term,
         unnest(range(1, len(words)+1)) AS pos
  FROM raw
), tok2 AS (
  SELECT * FROM tok WHERE term NOT IN ({_STOP_SQL})
), doclen AS (
  SELECT doc_id, count(*) + 17 AS flen FROM tok2 GROUP BY doc_id
), post AS (
  SELECT t.doc_id, t.term, count(*) AS tf,
         CAST(CAST(1.0/sqrt(d.flen) AS REAL) AS DOUBLE) AS norm,
         list(t.pos ORDER BY t.pos) AS positions
  FROM tok2 t JOIN doclen d USING (doc_id)
  GROUP BY t.doc_id, t.term, d.flen
), ndocs AS (SELECT count(*) AS n FROM documents),
nbits AS (
  SELECT DISTINCT CASE WHEN n_chars = 0 THEN 0 ELSE
    (CAST(1023 + e AS BIGINT) << 52)
      | CAST((n_chars / pow(2.0, e) - 1) * 4503599627370496.0 AS BIGINT)
  END AS b
  FROM (
    SELECT n_chars,
           CASE WHEN pow(2.0, floor(log2(CAST(n_chars AS DOUBLE))))
                     > n_chars
                THEN floor(log2(CAST(n_chars AS DOUBLE))) - 1
                ELSE floor(log2(CAST(n_chars AS DOUBLE))) END AS e
    FROM documents WHERE n_chars > 0
  )
), triecard AS (
  SELECT count(DISTINCT (s.s, b >> s.s)) AS c
  FROM nbits, (SELECT unnest(range(0, 64, 4)) AS s) s
), boolcard AS (
  SELECT count(DISTINCT n_chars > 300) AS c FROM documents
), avgl AS (
  SELECT ceil(CAST((SELECT count(DISTINCT term) FROM post)
                   + (SELECT c FROM triecard)
                   + (SELECT c FROM boolcard) AS DOUBLE)
              / (SELECT n FROM ndocs)) AS v
), dict AS (
  SELECT term, count(*) AS df FROM post GROUP BY term
)
"""

# delete-visibility oracle: the live index = documents minus the
# deleted id range (deleted docs vanish from postings, ndocs, stats)
_PRELUDE_LIVE100 = _PRELUDE.replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE doc_id >= 100)",
)

# alias over 2 shards (doc_id % 2): bleve sums PER-SHARD unique-term
# counts (pre_search.go:96-110 + snapshot_index.go:151-161), so
# avg_doc_len = ceil(Σ shard cards / N) — NOT the global distinct count
_PRELUDE_ALIAS2 = _mk_prelude(
    """avgl AS (
  SELECT ceil(CAST((SELECT sum(c) FROM (
           SELECT count(DISTINCT term) AS c FROM post GROUP BY doc_id % 2
         ) shard_cards) AS DOUBLE) / (SELECT n FROM ndocs)) AS v
)"""
)

# BM25 per-posting base score (p=posting alias, q=query-term alias
# carrying idf) — identical op order to bleve_spark.search.scorer
_BASE = (
    "(q.idf * (sqrt(p.tf)*1.2) / (sqrt(p.tf) + 1.2*(0.25 + "
    "(0.75 * (1.0/(p.norm*p.norm))) / (SELECT v FROM avgl))))"
)

_IDF = (
    "ln(1 + ((SELECT n FROM ndocs) - {df} + 0.5) / ({df} + 0.5))"
)


def _values(terms, mults=None):
    mults = mults or [1.0] * len(terms)
    vals = ",".join(
        f"('{t}', {float(m)})" for t, m in zip(terms, mults)
    )
    return (
        f"SELECT qt.term, coalesce(d.df, 0) AS df,\n"
        f"  {_IDF.format(df='coalesce(d.df, 0)')} AS idf, qt.mult\n"
        f"FROM (VALUES {vals}) qt(term, mult) LEFT JOIN dict d USING (term)"
    )


def _expansion(pred, mult="1.0"):
    return (
        f"SELECT d.term, d.df, {_IDF.format(df='d.df')} AS idf, "
        f"{mult} AS mult FROM dict d WHERE {pred}"
    )


def _sql_single_term(term, k=20, prelude=None):
    """Root-level term query: queryWeight stays 1."""
    return f"""{prelude or _PRELUDE},
q AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
      FROM (VALUES ('{term}')) qt(term) LEFT JOIN dict d USING (term))
SELECT p.doc_id, round({_BASE}, 6) AS score
FROM post p JOIN q USING (term)
ORDER BY score DESC, p.doc_id LIMIT {k}"""


def _sql_multi(exp_sql, k=20, min_req=1, conj=False, offset=0):
    """Disjunction (coord, min) / conjunction (sum) of scored terms with
    the root composite's queryNorm — the SQL twin of SDisj/SConj."""
    having = ""
    if conj:
        having = "HAVING count(*) = (SELECT t FROM total)"
    elif min_req > 1:
        having = f"HAVING count(*) >= {min_req}"
    coord = (
        "sum(s)"
        if conj
        else "sum(s) * count(*) / (SELECT CAST(t AS DOUBLE) FROM total)"
    )
    page = f" OFFSET {offset}" if offset else ""
    return f"""{_PRELUDE},
expq AS ({exp_sql}),
qnorm AS (SELECT 1.0/sqrt(sum((mult*idf)*(mult*idf))) AS v FROM expq),
total AS (SELECT count(*) AS t FROM expq),
scored AS (
  SELECT p.doc_id,
         {_BASE} * (q.mult * q.idf * (SELECT v FROM qnorm)) AS s
  FROM post p JOIN expq q USING (term))
SELECT doc_id, round({coord}, 6) AS score
FROM scored GROUP BY doc_id {having}
ORDER BY score DESC, doc_id LIMIT {k}{page}"""


_SQL_PHRASE = f"""{_PRELUDE},
expq AS ({{exp}}),
qnorm AS (SELECT 1.0/sqrt(sum(idf*idf)) AS v FROM expq),
p1 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = '{{t1}}'),
p2 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = '{{t2}}')
SELECT p1.doc_id, round(p1.s + p2.s, 6) AS score
FROM p1 JOIN p2 USING (doc_id)
WHERE len(list_intersect(list_transform(p1.positions, x -> x + 1),
                         p2.positions)) > 0
ORDER BY score DESC, doc_id LIMIT 20"""


def _sql_phrase_fuzzy(t1: str, t2: str, d: int, k: int = 20) -> str:
    """Fuzzy 2-slot phrase oracle: each slot expands to the
    Levenshtein-≤d dictionary neighbourhood (mult 1/(1+d)); slot score
    = Σ matched-term scores × matched/total (intra-slot disjunction
    coord, multi_phrase.go:77); queryNorm over BOTH slots' expanded
    (mult·idf)²; adjacency via position intersect with gap 1."""
    def exp(name, t):
        return (
            f"{name} AS (SELECT d.term, d.df, "
            f"{_IDF.format(df='d.df')} AS idf, "
            f"1.0 / (levenshtein(d.term, '{t}') + 1.0) AS mult "
            f"FROM dict d WHERE levenshtein(d.term, '{t}') <= {d})"
        )

    def slot(name, expn):
        return f"""{name} AS (
  SELECT p.doc_id,
         sum({_BASE} * (q.mult * q.idf * (SELECT v FROM qnorm)))
           * count(*)
           / (SELECT CAST(count(*) AS DOUBLE) FROM {expn}) AS s,
         list_sort(flatten(list(p.positions))) AS positions
  FROM post p JOIN {expn} q USING (term) GROUP BY p.doc_id)"""

    return f"""{_PRELUDE},
{exp('exp1', t1)},
{exp('exp2', t2)},
qnorm AS (SELECT 1.0/sqrt(
  (SELECT coalesce(sum((mult*idf)*(mult*idf)), 0) FROM exp1)
  + (SELECT coalesce(sum((mult*idf)*(mult*idf)), 0) FROM exp2)) AS v),
{slot('s1', 'exp1')},
{slot('s2', 'exp2')}
SELECT s1.doc_id, round(s1.s + s2.s, 6) AS score
FROM s1 JOIN s2 USING (doc_id)
WHERE len(list_intersect(list_transform(s1.positions, x -> x + 1),
                         s2.positions)) > 0
ORDER BY score DESC, doc_id LIMIT {k}"""


_SQL_BOOLEAN = f"""{_PRELUDE},
expq AS ({{exp}}),
qnorm AS (SELECT 1.0/sqrt(sum(idf*idf)) AS v FROM expq),
must AS (SELECT p.doc_id, {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
         FROM post p JOIN expq q USING (term) WHERE p.term = 'spark'),
should AS (SELECT p.doc_id,
                  {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
           FROM post p JOIN expq q USING (term) WHERE p.term = 'join')
SELECT m.doc_id, round(m.s + coalesce(sh.s, 0.0), 6) AS score
FROM must m LEFT JOIN should sh USING (doc_id)
WHERE m.doc_id NOT IN (SELECT doc_id FROM documents WHERE lang = 'zh')
ORDER BY score DESC, doc_id LIMIT 20"""


def _sql_tfidf_term(term, k=20):
    return f"""{_PRELUDE},
q AS (SELECT qt.term,
        1.0 + ln((SELECT CAST(n AS DOUBLE) FROM ndocs)
                 / (coalesce(d.df, 0) + 1.0)) AS idf
      FROM (VALUES ('{term}')) qt(term) LEFT JOIN dict d USING (term))
SELECT p.doc_id, round(sqrt(p.tf) * p.norm * q.idf, 6) AS score
FROM post p JOIN q USING (term)
ORDER BY score DESC, p.doc_id LIMIT {k}"""


# querystring: +text:spark +n_chars:>300 -lang:zh text:join^2
# root boolean: W(must)=idf_spark^2 + 1 (const boost 1), W(should)=(2*idf_join)^2
_SQL_QSTRING = f"""{_PRELUDE},
wts AS (SELECT
  (SELECT {_IDF.format(df='coalesce(d.df,0)')} FROM (VALUES ('spark')) qt(term)
     LEFT JOIN dict d USING (term)) AS idf_spark,
  (SELECT {_IDF.format(df='coalesce(d.df,0)')} FROM (VALUES ('join')) qt(term)
     LEFT JOIN dict d USING (term)) AS idf_join),
qnorm AS (SELECT 1.0/sqrt(idf_spark*idf_spark + 1.0
                          + (2.0*idf_join)*(2.0*idf_join)) AS v FROM wts),
mustterm AS (
  SELECT p.doc_id,
         (q.idf * (sqrt(p.tf)*1.2) / (sqrt(p.tf) + 1.2*(0.25 +
          (0.75 * (1.0/(p.norm*p.norm))) / (SELECT v FROM avgl))))
         * (q.idf * (SELECT v FROM qnorm)) AS s
  FROM post p JOIN (SELECT 'spark' AS term,
                           (SELECT idf_spark FROM wts) AS idf) q USING (term)),
mustrange AS (
  SELECT doc_id, 1.0 * (SELECT v FROM qnorm) AS s
  FROM documents WHERE n_chars > 300),
must AS (
  SELECT doc_id, sum(s) AS s, count(*) AS c
  FROM (SELECT * FROM mustterm UNION ALL SELECT * FROM mustrange)
  GROUP BY doc_id HAVING count(*) = 2),
should AS (
  SELECT p.doc_id,
         (q.idf * (sqrt(p.tf)*1.2) / (sqrt(p.tf) + 1.2*(0.25 +
          (0.75 * (1.0/(p.norm*p.norm))) / (SELECT v FROM avgl))))
         * (2.0 * q.idf * (SELECT v FROM qnorm)) AS s
  FROM post p JOIN (SELECT 'join' AS term,
                           (SELECT idf_join FROM wts) AS idf) q USING (term))
SELECT m.doc_id, round(m.s + coalesce(sh.s, 0.0), 6) AS score
FROM must m LEFT JOIN should sh USING (doc_id)
WHERE m.doc_id NOT IN (SELECT doc_id FROM documents WHERE lang = 'zh')
ORDER BY score DESC, doc_id LIMIT 20"""


# multi_phrase slots [part|value] → [hash]: per-slot disjunction coord
# (multi_phrase.go:77), adjacency via position intersection; qnorm over
# ALL alternatives' idfs (SPhrase.weight sums every slot term)
_SQL_MULTI_PHRASE = f"""{_PRELUDE},
expq AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
         FROM (VALUES ('part'),('value'),('hash')) qt(term)
         LEFT JOIN dict d USING (term)),
qnorm AS (SELECT 1.0/sqrt(sum(idf*idf)) AS v FROM expq),
s1 AS (
  SELECT p.doc_id,
         sum({_BASE} * (q.idf * (SELECT v FROM qnorm))) AS raw,
         count(*) AS c,
         flatten(list(p.positions)) AS pos
  FROM post p JOIN expq q USING (term) WHERE p.term IN ('part','value')
  GROUP BY p.doc_id),
s2 AS (
  SELECT p.doc_id, {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s,
         p.positions AS pos
  FROM post p JOIN expq q USING (term) WHERE p.term = 'hash')
SELECT s1.doc_id, round(s1.raw * s1.c / 2.0 + s2.s, 6) AS score
FROM s1 JOIN s2 USING (doc_id)
WHERE len(list_intersect(list_transform(s1.pos, x -> x + 1), s2.pos)) > 0
ORDER BY score DESC, doc_id LIMIT 20"""

# phrase "table hash" with slop=1 — findPhrasePaths budget semantics
# (search_phrase.go:439): match iff ∃ a∈pos(table), b∈pos(hash) with
# b > a and |b-(a+1)| ≤ 1, i.e. b-a ∈ {1,2}
_SQL_PHRASE_SLOP = f"""{_PRELUDE},
expq AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
         FROM (VALUES ('table'),('hash')) qt(term)
         LEFT JOIN dict d USING (term)),
qnorm AS (SELECT 1.0/sqrt(sum(idf*idf)) AS v FROM expq),
p1 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'table'),
p2 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'hash')
SELECT p1.doc_id, round(p1.s + p2.s, 6) AS score
FROM p1 JOIN p2 USING (doc_id)
WHERE len(list_filter(p1.positions,
      a -> len(list_filter(p2.positions,
           b -> b - a >= 1 AND b - a <= 2)) > 0)) > 0
ORDER BY score DESC, doc_id LIMIT 20"""

# 3-slot phrase "table part hash" with slop=2 — the shared-budget DFS
# over three position lists (findPhrasePaths): ∃ a<b<c with
# |b-(a+1)| + |c-(b+1)| ≤ 2, per-level prefix bound included
_SQL_PHRASE_SLOP3 = f"""{_PRELUDE},
expq AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
         FROM (VALUES ('table'),('part'),('hash')) qt(term)
         LEFT JOIN dict d USING (term)),
qnorm AS (SELECT 1.0/sqrt(sum(idf*idf)) AS v FROM expq),
p1 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'table'),
p2 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'part'),
p3 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'hash')
SELECT p1.doc_id, round(p1.s + p2.s + p3.s, 6) AS score
FROM p1 JOIN p2 USING (doc_id) JOIN p3 USING (doc_id)
WHERE len(list_filter(p1.positions, a ->
      len(list_filter(p2.positions, b ->
          b > a AND abs(b - (a+1)) <= 2 AND
          len(list_filter(p3.positions, c ->
              c > b AND abs(b - (a+1)) + abs(c - (b+1)) <= 2)) > 0
      )) > 0)) > 0
ORDER BY score DESC, doc_id LIMIT 20"""

# bool_field compiles to a term searcher on the single "T" token
# (bool_field.go:56): fieldLength=1 → norm=1.0, tf=1;
# avg_doc_len = ceil(#distinct bool values / N)
_SQL_BOOL_FIELD = """
WITH n AS (SELECT count(*) AS c FROM documents),
fdf AS (SELECT count(*) AS c FROM documents WHERE n_chars > 300),
card AS (SELECT count(DISTINCT (n_chars > 300)) AS c FROM documents),
avgl AS (SELECT ceil(CAST((SELECT c FROM card) AS DOUBLE)
                     / (SELECT c FROM n)) AS v),
idf AS (SELECT ln(1 + ((SELECT c FROM n) - (SELECT c FROM fdf) + 0.5)
                     / ((SELECT c FROM fdf) + 0.5)) AS v)
SELECT doc_id, round((SELECT v FROM idf) * 1.2
       / (1.0 + 1.2 * (0.25 + 0.75 / (SELECT v FROM avgl))), 6) AS score
FROM documents WHERE n_chars > 300
ORDER BY score DESC, doc_id LIMIT 20"""

# search_after cursor = the 4th-ranked (score, doc_id) of the term
# query; page is the strictly-after tuple order (topn.go:103-128)
_SQL_SEARCH_AFTER = f"""{_PRELUDE},
q AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
      FROM (VALUES ('spark')) qt(term) LEFT JOIN dict d USING (term)),
scored AS (SELECT p.doc_id, round({_BASE}, 6) AS score
           FROM post p JOIN q USING (term)),
cur AS (SELECT score, doc_id FROM scored
        ORDER BY score DESC, doc_id LIMIT 1 OFFSET 3)
SELECT s.doc_id, s.score FROM scored s, cur c
WHERE s.score < c.score OR (s.score = c.score AND s.doc_id > c.doc_id)
ORDER BY s.score DESC, s.doc_id LIMIT 6"""

# RSF fusion (rsf.go:35): per-list min-max normalization over each
# truncated top-20 leg, then weighted sum (w1=1.0, w2=0.5)
_SQL_RSF = f"""{_PRELUDE},
q1 AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
       FROM (VALUES ('spark')) qt(term) LEFT JOIN dict d USING (term)),
q2 AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
       FROM (VALUES ('join')) qt(term) LEFT JOIN dict d USING (term)),
l1 AS (SELECT p.doc_id, round({_BASE}, 6) AS score
       FROM post p JOIN q1 q USING (term)
       ORDER BY score DESC, p.doc_id LIMIT 20),
l2 AS (SELECT p.doc_id, round({_BASE}, 6) AS score
       FROM post p JOIN q2 q USING (term)
       ORDER BY score DESC, p.doc_id LIMIT 20),
m1 AS (SELECT min(score) AS lo, max(score) AS hi FROM l1),
m2 AS (SELECT min(score) AS lo, max(score) AS hi FROM l2),
parts AS (
  SELECT doc_id, (CASE WHEN m1.hi > m1.lo
         THEN (score - m1.lo) / (m1.hi - m1.lo) ELSE 1.0 END)
         * 1.0 AS c
  FROM l1, m1
  UNION ALL
  SELECT doc_id, (CASE WHEN m2.hi > m2.lo
         THEN (score - m2.lo) / (m2.hi - m2.lo) ELSE 1.0 END)
         * 0.5 AS c
  FROM l2, m2)
SELECT doc_id, round(sum(c), 6) AS score FROM parts GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20"""

# search_before = the 5 rows immediately preceding the 8th-ranked
# cursor, taken in REVERSED order (flipped sort + search_after)
_SQL_SEARCH_BEFORE = f"""{_PRELUDE},
q AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
      FROM (VALUES ('spark')) qt(term) LEFT JOIN dict d USING (term)),
scored AS (SELECT p.doc_id, round({_BASE}, 6) AS score
           FROM post p JOIN q USING (term)),
cur AS (SELECT score, doc_id FROM scored
        ORDER BY score DESC, doc_id LIMIT 1 OFFSET 7)
SELECT s.doc_id, s.score FROM scored s, cur c
WHERE s.score > c.score OR (s.score = c.score AND s.doc_id < c.doc_id)
ORDER BY s.score ASC, s.doc_id DESC LIMIT 5"""

# RRF fusion of two BM25 top-20 lists (rrf.go:34):
# score = Σ 1/(rank_i + 60), rank by (score desc, doc_id asc)
_SQL_RRF = f"""{_PRELUDE},
q1 AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
       FROM (VALUES ('spark')) qt(term) LEFT JOIN dict d USING (term)),
q2 AS (SELECT qt.term, {_IDF.format(df='coalesce(d.df,0)')} AS idf
       FROM (VALUES ('join')) qt(term) LEFT JOIN dict d USING (term)),
l1 AS (SELECT p.doc_id, round({_BASE}, 6) AS score
       FROM post p JOIN q1 q USING (term)
       ORDER BY score DESC, p.doc_id LIMIT 20),
l2 AS (SELECT p.doc_id, round({_BASE}, 6) AS score
       FROM post p JOIN q2 q USING (term)
       ORDER BY score DESC, p.doc_id LIMIT 20),
r AS (
  SELECT doc_id, 1.0/(60 + row_number()
         OVER (ORDER BY score DESC, doc_id)) AS c FROM l1
  UNION ALL
  SELECT doc_id, 1.0/(60 + row_number()
         OVER (ORDER BY score DESC, doc_id)) AS c FROM l2)
SELECT doc_id, round(sum(c), 6) AS score FROM r GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20"""


_SQL_TEXT_PROFILE = f"""
WITH base AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'),
                x -> len(x) > 0) AS words,
    text
  FROM documents
), m AS (
  SELECT doc_id, words, text,
    len(words) AS n_tokens,
    len(regexp_extract_all(lower(text),
        '[a-z0-9]+(?:''[a-z]+)?')) AS n_regex_tokens,
    CAST(len(list_filter(words, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
      / greatest(CAST(len(words) AS DOUBLE), 1.0) AS swr,
    CAST(list_aggregate(list_transform(words, x -> len(x)), 'sum')
         AS DOUBLE)
      / greatest(CAST(len(words) AS DOUBLE), 1.0) AS mwl,
    CAST(len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))
         AS DOUBLE)
      / greatest(CAST(len(text) AS DOUBLE), 1.0) AS pr,
    len(list_filter(words,
        x -> x IN ('the','and','of','to','is','in','that','it','for')))
        AS c_en,
    len(list_filter(words,
        x -> x IN ('el','la','de','que','los','las','una','por','como')))
        AS c_es,
    len(list_filter(words,
        x -> x IN ('le','la','les','des','est','dans','une','pour','que')))
        AS c_fr,
    len(list_filter(words,
        x -> x IN ('der','die','das','und','ist','nicht','ein','mit','zu')))
        AS c_de
  FROM base
)
SELECT doc_id AS key, n_tokens, n_regex_tokens,
  round(swr, 6) AS stopword_ratio,
  round(mwl, 6) AS mean_word_len,
  round(pr, 6) AS punct_ratio,
  round(
    least(CAST(n_tokens AS DOUBLE)/20.0, 1.0)
      * least(2000.0/greatest(CAST(n_tokens AS DOUBLE), 1.0), 1.0) * 0.4
    + (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
    + least(swr * 4.0, 1.0) * 0.2
    + (CASE WHEN pr <= 0.2 THEN 1.0
            ELSE greatest(1.0 - (pr - 0.2) * 2.0, 0.0) END) * 0.2,
  6) AS quality,
  (CASE WHEN greatest(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
        WHEN c_en = greatest(c_en, c_es, c_fr, c_de) THEN 'en'
        WHEN c_es = greatest(c_en, c_es, c_fr, c_de) THEN 'es'
        WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) THEN 'fr'
        ELSE 'de' END) AS lang_pred,
  md5(array_to_string(list_sort(list_distinct(words)), ' '))
    AS fingerprint
FROM m"""


# word 3-gram shingles, same construction as dedup.word_shingles:
# i ∈ [1, max(len-2, 1)], shingle = words[i : i+2] (truncating slice)
_SQL_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id AS key,
         unnest(list_distinct(
           [array_to_string(words[i:least(i+2, len(words))], ' ')
            for i in range(1, greatest(len(words)-2, 1) + 1)]
         )) AS shingle
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words
        FROM documents)
), sh1 AS (SELECT * FROM sh WHERE len(shingle) > 0),
sh2 AS (
  SELECT * FROM sh1 WHERE shingle NOT IN (
    SELECT shingle FROM sh1 GROUP BY shingle HAVING count(*) > 100)
),
sizes AS (SELECT key, count(*) AS n_sh FROM sh2 GROUP BY key),
inter AS (
  SELECT l.key AS key_a, r.key AS key_b, count(*) AS i
  FROM sh2 l JOIN sh2 r ON l.shingle = r.shingle AND l.key < r.key
  GROUP BY l.key, r.key
)
SELECT key_a, key_b,
       round(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.key = key_a
JOIN sizes sb ON sb.key = key_b
WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= 0.5"""


# hybrid: RRF of the BM25 match-disjunction top-20 and the cosine
# top-20 (fusion/rrf.go:34 + search_knn.go hybrid request shape).
# ``knn_eligible`` restricts the KNN leg to an eligible-doc set
# BEFORE scoring (filtered KNN, collector/eligible.go)
def _sql_hybrid_rrf(knn_eligible: str = "") -> str:
    exp = _values(["spark", "data"])
    return f"""{_PRELUDE},
expq AS ({exp}),
qnorm AS (SELECT 1.0/sqrt(sum((mult*idf)*(mult*idf))) AS v FROM expq),
total AS (SELECT count(*) AS t FROM expq),
fts_scored AS (
  SELECT p.doc_id,
         {_BASE} * (q.mult * q.idf * (SELECT v FROM qnorm)) AS s
  FROM post p JOIN expq q USING (term)),
l1 AS (
  SELECT doc_id, round(sum(s) * count(*)
         / (SELECT CAST(t AS DOUBLE) FROM total), 6) AS score
  FROM fts_scored GROUP BY doc_id
  ORDER BY score DESC, doc_id LIMIT 20),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
vpairs AS (
  SELECT vec_id, unnest(embedding) AS x, unnest((SELECT v FROM qv)) AS y
  FROM embeddings{knn_eligible}
), vsums AS (
  SELECT vec_id,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
  FROM vpairs GROUP BY vec_id
), l2 AS (
  SELECT vec_id AS doc_id,
         round(dot / (sqrt(nx) * sqrt(ny)), 6) AS score
  FROM vsums ORDER BY score DESC, doc_id LIMIT 20),
r AS (
  SELECT doc_id, 1.0/(60 + row_number()
         OVER (ORDER BY score DESC, doc_id)) AS c FROM l1
  UNION ALL
  SELECT doc_id, 1.0/(60 + row_number()
         OVER (ORDER BY score DESC, doc_id)) AS c FROM l2)
SELECT doc_id, round(sum(c), 6) AS score FROM r GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10"""


# ---- language-analyzer correctness: tiny deterministic multilingual
# corpora indexed with the es/fr/de/cjk analyzers; the oracles carry
# FROZEN hand-checked analyzed-token goldens (stemmers additionally
# pinned to the reference's own test vectors in
# tests/test_lang_analyzers.py) — a pipeline regression breaks the
# hash gate because the frozen tokens won't move with the code -------

LANG_CORPORA = {
    "es": ["los arcos de la casa blanca",
           "una chicana y un chicano cantaron",
           "los jaeces y los caballos", "el parecer de los vecinos",
           "casas blancas en la montaña", "yeses arcos chicana",
           "el caos de la ciudad", "cantando canciones españolas"],
    "fr": ["le chien et le chat", "les chevaux du baron",
           "l'avion des barons", "une personne personnelle",
           "chiens noirs et chats", "la faiblesse des éléments",
           "j'aime les anneaux", "cheval blanc"],
    "de": ["der Tisch und die Tische", "die Schaltflächen der Bücher",
           "ein Buch über Tische", "weißbier und brot",
           "die bücher der kinder", "kleine tische",
           "das blech und der kleck", "mindestens baldige bücher"],
    "cjk": ["数据处理系统", "分布式 数据 引擎", "系统处理", "spark 引擎",
            "数据库系统", "处理 引擎 数据", "大数据", "引擎系统处理"],
    "it": ["il ragazzo e la ragazza", "i ragazzi della città",
           "l'amico degli amici", "una bella giornata",
           "le belle giornate", "il cavallo bianco",
           "i cavalli bianchi", "una storia della scuola"],
    "pt": ["os doutores e o doutor", "homens e mulheres",
           "os papéis normais", "uma casa bonita",
           "as casas bonitas", "o cavalo branco",
           "os cavalos brancos", "os botões da camisa"],
    # snowball pipelines (true snowball stemmers, analysis/snowball.py)
    "ru": ["актеров и актрис театра", "тысячи километров дороги",
           "сила электромагнитной энергии", "знание хранилось в тайне",
           "новые книги и книгами", "красивейший город на свете",
           "представление о силе", "погода в городе хорошая"],
    "nl": ["het lichamelijk onderzoek", "lichamelijke inspanning",
           "de mogelijkheden van bedenkingen",
           "een mogelijkheid bedenken", "het lichaam en de geest",
           "grote mogelijkheden", "onderzoek naar het lichaam",
           "de bedenking van de dag"],
    "sv": ["jaktkarlarne och jaktkarlens hund", "klockorna i betydelsen",
           "en viktig betydelse", "jaktkarlar i skogen",
           "klockan och klockorna", "skogens stora betydelse",
           "hunden och jaktkarlen", "viktiga klockor"],
    "da": ["undersøgelse af forholdene", "en meningsløs undersøgelse",
           "indtagelse af mad", "den kraftigste undersøgelse",
           "forhold og forholdene", "mad og indtagelsen",
           "meningsløst arbejde", "kraftig indsats"],
    "no": ["havnedistriktene i byen", "havnedistrikter og havner",
           "bygningene i havnedistriktet", "sannsynlighetene er store",
           "en stor sannsynlighet", "byens gamle bygninger",
           "havnen og byen", "store bygninger i havnen"],
    # tranche 2: fi snowball; ar/hi/ckb/hr light pipelines; fa
    # normalize-only (analyzer_fa.go has no stemmer)
    "fi": ["edeltäjiinsä ja seuraajiinsa", "edeltäjistään puhuminen",
           "kirjan sivut", "taloissa asutaan",
           "taloissakin on kirjoja", "tyttöjen koulu", "suuri talo",
           "koulun kirjat"],
    "ar": ["الكتاب الكبير", "مشروبات باردة", "أمريكيين في المدينة",
           "كتاب عن السلام", "الكتب في المكتبة", "مشروب كبير",
           "امريكي في البيت", "سلام كبير"],
    "fa": ["کتاب های خوب", "زادہ شهر", "كتابۀ بزرگ",
           "کشاندن به خانه", "کتاب بزرگ", "خانه های شهر",
           "شهر بزرگ", "های خوب"],
    "hi": ["हिन्दी किताबें", "लडका और लडकी", "लडकों के दोस्त",
           "गुरुओं का ज्ञान", "किताबों की दुकान", "खाना खाता",
           "कठिनाइयां आती", "दोस्तों के साथ"],
    "ckb": ["کتێبەکان لە قوتابخانە", "پیاوەکە هات", "کتێبێکی نوێ",
            "قوتابخانەکە گەورەیە", "پیاوان لە شار", "کتێبی من",
            "شارەکان گەورەن", "نوێیەکان هاتن"],
    "hr": ["Hrvatska i Hrvatski jezik", "komarac leti",
           "crvi u zemlji", "zaključcima rasprave", "veliki komarac",
           "hrvatske knjige", "knjiga o zemlji", "rasprava o jeziku"],
    # tr: apostrophe + per-rune lower + stop_tr + snowball stemmer
    # (analyzer_tr.go; port in analysis/snowball.py stem_tr)
    "tr": ["Kıbrıs'ta tatil", "Van Gölü'ne yolculuk",
           "İstanbul'da kitaplar", "kitap ve kalem", "yolculuk planı",
           "tatil planları", "kalem kutusu", "İstanbul manzarası"],
    # hu / ro: snowball stemmer pipelines (analyzer_hu.go /
    # analyzer_ro.go; ports in analysis/snowball.py)
    "hu": ["babakocsi a házban", "babakocsijáért ment",
           "ablakok és házak", "az ablakokat nézi",
           "gépért és gépekkel", "tollal írnak", "a házát festi",
           "babakocsik az ablakokban"],
    "ro": ["absenţa din oraş", "absenţi de la şcoală",
           "lucrează în oraş", "copiii lucram împreună",
           "frumoasă acţiune", "cărţile frumoase", "o absenţă lungă",
           "acţiunea copiilor"],
    # pl: stempel statistical stemmer over Lucene's trained table
    "pl": ["wiedza była utrzymywana w tajemnicy",
           "przypadku badawczego opracowanie",
           "kryptografii kwantowej techniki",
           "zakresu informacji przetwarzania",
           "kompendium wiedzy o kryptografii",
           "techniki kwantowe w praktyce",
           "opracowanie kompendium informacji", "praktyka i wiedza"],
}

# frozen goldens: analyzer output at freeze time, hand-spot-checked
# against the reference's light-stemmer/elision/bigram rules
LANG_GOLD_TOKENS = {
    "es": [["arc", "casa", "blanc"], ["chican", "chican", "cantaron"],
           ["jaez", "caball"], ["parecer", "vecin"],
           ["cas", "blanc", "montañ"], ["yes", "arc", "chican"],
           ["caos", "ciudad"], ["cantand", "cancion", "español"]],
    "fr": [["chien", "chat"], ["cheval", "baron"], ["avion", "baron"],
           ["person", "person"], ["chien", "noir", "chat"],
           ["faibl", "element"], ["aime", "aneau"],
           ["cheval", "blanc"]],
    "de": [["tisch", "tisch"], ["schaltflach", "buch"],
           ["buch", "tisch"], ["weissbi", "brot"], ["buch", "kind"],
           ["klein", "tisch"], ["blech", "kleck"],
           ["mindest", "baldig", "buch"]],
    "cjk": [["数据", "据处", "处理", "理系", "系统"],
            ["分布", "布式", "式数", "数据", "据引", "引擎"],
            ["系统", "统处", "处理"], ["spark", "引擎"],
            ["数据", "据库", "库系", "系统"],
            ["处理", "理引", "引擎", "擎数", "数据"],
            ["大数", "数据"],
            ["引擎", "擎系", "系统", "统处", "处理"]],
    "it": [["ragazz", "ragazz"], ["ragazz", "città"],
           ["amico", "amici"], ["bella", "giornat"],
           ["belle", "giornat"], ["cavall", "bianc"],
           ["cavall", "bianc"], ["stor", "scuol"]],
    "pt": [["doutor", "doutor"], ["homem", "mulher"],
           ["papel", "normal"], ["casa", "bonit"], ["casa", "bonit"],
           ["caval", "branc"], ["caval", "branc"],
           ["bota", "camis"]],
    # snowball goldens: key stems cross-checked against the reference's
    # own analyzer_{ru,nl,sv,da,no}_test.go vectors (актер, километр,
    # сил, электромагнитн, энерг, знан, хран, тайн, представлен,
    # licham, jaktkarl, undersøg, havnedistrikt)
    "ru": [["актер", "актрис", "театр"], ["тысяч", "километр", "дорог"],
           ["сил", "электромагнитн", "энерг"], ["знан", "хран", "тайн"],
           ["нов", "книг", "книг"], ["красив", "город", "свет"],
           ["представлен", "сил"], ["погод", "город", "хорош"]],
    "nl": [["licham", "onderzoek"], ["licham", "inspann"],
           ["mogelijk", "bedenk"], ["mogelijk", "bedenk"],
           ["licham", "geest"], ["grot", "mogelijk"],
           ["onderzoek", "licham"], ["bedenk", "dag"]],
    "sv": [["jaktkarl", "jaktkarl", "hund"], ["klock", "betyd"],
           ["vikt", "betyd"], ["jaktkarl", "skog"],
           ["klockan", "klock"], ["skog", "stor", "betyd"],
           ["hund", "jaktkarl"], ["vikt", "klock"]],
    "da": [["undersøg", "forhold"], ["meningsløs", "undersøg"],
           ["indtag", "mad"], ["kraft", "undersøg"],
           ["forhold", "forhold"], ["mad", "indtag"],
           ["meningsløs", "arbejd"], ["kraft", "indsat"]],
    "no": [["havnedistrikt", "byen"], ["havnedistrikt", "havn"],
           ["bygning", "havnedistrikt"], ["sannsyn", "stor"],
           ["stor", "sannsyn"], ["byens", "gaml", "bygning"],
           ["havn", "byen"], ["stor", "bygning", "havn"]],
    # tranche-2 goldens: key stems cross-checked against the
    # reference's analyzer/stemmer test vectors (edeltäj, كتاب/كبير/
    # مشروب/امريك/سلام, هاي-normalization, हिंद/लडक/गुर/किताब/खा/कठिन,
    # hrvatsk/komarc/crv/zaključk)
    "fi": [["edeltäj", "seuraaj"], ["edeltäj", "puhumin"],
           ["kirj", "sivu"], ["talo", "asu"], ["talo", "kirj"],
           ["tyttöj", "koulu"], ["suuri", "talo"], ["koulu", "kirj"]],
    "ar": [["كتاب", "كبير"], ["مشروب", "بارد"], ["امريك", "مدين"],
           ["كتاب", "سلام"], ["كتب", "مكتب"], ["مشروب", "كبير"],
           ["امريك", "بيت"], ["سلام", "كبير"]],
    "fa": [["كتاب", "خوب"], ["زاده", "شهر"], ["كتابه", "بزرگ"],
           ["كشاندن", "خانه"], ["كتاب", "بزرگ"], ["خانه", "شهر"],
           ["شهر", "بزرگ"], ["خوب"]],
    "hi": [["हिंद", "किताब"], ["लडक", "लडक"], ["लडक", "दोसत"],
           ["गुर", "जञान"], ["किताब", "दुकान"], ["खा", "खा"],
           ["कठिन", "अत"], ["दोसत"]],
    "ckb": [["کتێب", "قوتابخ"], ["پیاو", "هات"], ["کتێب", "نوێ"],
            ["قوتابخان", "گەورە"], ["پیاو", "شار"], ["کتێب"],
            ["شارە", "گەورەن"], ["نوێی", "هاتن"]],
    "hr": [["hrvatsk", "i", "hrvatsk", "jezik"], ["komarc", "let"],
           ["crv", "u", "zemlj"], ["zaključk", "rasprav"],
           ["velik", "komarc"], ["hrvatsk", "knjig"],
           ["knjig", "o", "zemlj"], ["rasprav", "o", "jezik"]],
    "tr": [["kıbrıs", "tatil"], ["van", "göl", "yolculuk"],
           ["istanbul", "kitap"], ["kitap", "kalem"],
           ["yolculuk", "plan"], ["tatil", "plan"],
           ["kalem", "kutu"], ["istanbul", "manzara"]],
    "hu": [["babakocs", "ház"], ["babakocs", "men"],
           ["ablak", "ház"], ["ablak", "néz"], ["gép", "gép"],
           ["tol", "ír"], ["ház", "fest"], ["babakocs", "ablak"]],
    "ro": [["absenţ", "oraş"], ["absenţ", "şcoal"],
           ["lucr", "oraş"], ["copii", "lucr", "împreun"],
           ["frumoas", "acţiun"], ["cărţ", "frumoas"],
           ["o", "absenţ", "lung"], ["acţiun", "cop"]],
    # pl goldens: reference analyzer_pl_test.go vocabulary (wiedza/
    # utrzymywać/tajemnik/przypadek/kryptografia/kwantowy/...)
    "pl": [["wiedza", "utrzymywać", "tajemnik"],
           ["przypadek", "badawczy", "opracować"],
           ["kryptografia", "kwantowy", "technika"],
           ["zakres", "informacja", "przetwarzać"],
           ["kompendium", "wiedza", "kryptografia"],
           ["technika", "kwantowy", "praktyka"],
           ["opracować", "kompendium", "informacja"],
           ["praktykać", "wiedza"]],
}

# frozen analyzed QUERY tokens per language (same freeze contract)
LANG_QUERIES = {
    "es": ("los arcos blancos", ["arc", "blanc"]),
    "fr": ("les chevaux du chat", ["cheval", "chat"]),
    "de": ("die Bücher und Tische", ["buch", "tisch"]),
    "cjk": ("数据系统", ["数据", "据系", "系统"]),
    "it": ("i ragazzi belli", ["ragazz", "belli"]),
    "pt": ("os doutores bonitos", ["doutor", "bonit"]),
    "ru": ("книги о городе", ["книг", "город"]),
    "nl": ("de mogelijkheden van het lichaam", ["mogelijk", "licham"]),
    "sv": ("betydelsen av klockorna", ["betyd", "klock"]),
    "da": ("en kraftig undersøgelse", ["kraft", "undersøg"]),
    "no": ("bygningene i havnen", ["bygning", "havn"]),
    "fi": ("edeltäjistään kirjan", ["edeltäj", "kirj"]),
    "ar": ("الكتاب الكبير", ["كتاب", "كبير"]),
    "fa": ("کتاب های بزرگ", ["كتاب", "بزرگ"]),
    "hi": ("लडकों की किताबें", ["लडक", "किताब"]),
    "ckb": ("کتێبەکان لە شار", ["کتێب", "شار"]),
    "hr": ("hrvatski komarac", ["hrvatsk", "komarc"]),
    "pl": ("wiedza o kryptografii", ["wiedza", "kryptografia"]),
    "tr": ("İstanbul'da kitaplar", ["istanbul", "kitap"]),
    "hu": ("babakocsijáért és ablakok", ["babakocs", "ablak"]),
    "ro": ("absenţa lucrează", ["absenţ", "lucr"]),
}


def _sql_lang_match(lang: str) -> str:
    """BM25 match-disjunction over the frozen analyzed tokens — the
    same composite scoring shape as _sql_multi, grounded in VALUES."""
    rows = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join("'" + t.replace("'", "''") + "'" for t in toks)
        + "])"
        for i, toks in enumerate(LANG_GOLD_TOKENS[lang])
    )
    qvals = ", ".join(
        "('" + t.replace("'", "''") + "')"
        for t in LANG_QUERIES[lang][1]
    )
    idf = _IDF.format(df="coalesce(d.df, 0)")
    return f"""
WITH docs AS (SELECT * FROM (VALUES {rows}) AS v(doc_id, toks)),
tok2 AS (SELECT doc_id, unnest(toks) AS term FROM docs),
doclen AS (SELECT doc_id, count(*) AS flen FROM tok2 GROUP BY doc_id),
post AS (
  SELECT t.doc_id, t.term, count(*) AS tf,
         CAST(CAST(1.0/sqrt(d.flen) AS REAL) AS DOUBLE) AS norm
  FROM tok2 t JOIN doclen d USING (doc_id)
  GROUP BY t.doc_id, t.term, d.flen
), ndocs AS (SELECT count(*) AS n FROM docs),
avgl AS (
  SELECT ceil(CAST(count(DISTINCT term) AS DOUBLE)
              / (SELECT n FROM ndocs)) AS v FROM post
), dict AS (SELECT term, count(*) AS df FROM post GROUP BY term),
expq AS (
  SELECT qt.term, coalesce(d.df, 0) AS df, {idf} AS idf, 1.0 AS mult
  FROM (VALUES {qvals}) qt(term) LEFT JOIN dict d USING (term)
),
qnorm AS (SELECT 1.0/sqrt(sum((mult*idf)*(mult*idf))) AS v FROM expq),
total AS (SELECT count(*) AS t FROM expq),
scored AS (
  SELECT p.doc_id,
         {_BASE} * (q.mult * q.idf * (SELECT v FROM qnorm)) AS s
  FROM post p JOIN expq q USING (term))
SELECT doc_id, round(sum(s) * count(*)
       / (SELECT CAST(t AS DOUBLE) FROM total), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20"""


# ---- raw punctuated text through the hash gate: unlike `documents`
# (pre-normalized space-joined tokens), this corpus exercises UAX#29
# segmentation (hyphen splits, MidLetter apostrophes, MidNum commas,
# domain-joining dots), stopword position gaps, and phrase adjacency
# over those gaps. Oracle tokens+positions are FROZEN goldens --------

RAW_TEXTS = [
    "The quick-brown fox jumps over the lazy dog's back.",
    "Don't split don't: apostrophes stay, right?",
    "Visit https://spark.apache.org/docs for 3.14 details!",
    "state-of-the-art systems cost $1,000 (or more).",
    "email me at dev@example.com; I reply fast.",
    "C'est l'ete -- but this is English text.",
    "The FOX and the fox are the same token.",
    "numbers: 1,000 3.14 42 and v2.0 mixed-case CamelCase",
    'quotes "inside" and (parens) [brackets] {braces}',
    "trailing punctuation!!! multiple... dots.. and, commas,",
]

RAW_GOLD = [
    [("quick", 2), ("brown", 3), ("fox", 4), ("jumps", 5),
     ("lazy", 8), ("dog's", 9), ("back", 10)],
    [("split", 2), ("apostrophes", 4), ("stay", 5), ("right", 6)],
    [("visit", 1), ("https", 2), ("spark.apache.org", 3),
     ("docs", 4), ("3.14", 6), ("details", 7)],
    [("state", 1), ("art", 4), ("systems", 5), ("cost", 6),
     ("1,000", 7)],
    [("email", 1), ("dev", 4), ("example.com", 5), ("reply", 7),
     ("fast", 8)],
    [("c'est", 1), ("l'ete", 2), ("english", 6), ("text", 7)],
    [("fox", 2), ("fox", 5), ("token", 9)],
    [("numbers", 1), ("1,000", 2), ("3.14", 3), ("42", 4),
     ("v2.0", 6), ("mixed", 7), ("case", 8), ("camelcase", 9)],
    [("quotes", 1), ("inside", 2), ("parens", 4), ("brackets", 5),
     ("braces", 6)],
    [("trailing", 1), ("punctuation", 2), ("multiple", 3),
     ("dots", 4), ("commas", 6)],
]


def _sql_raw_prelude() -> str:
    rows = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join("'" + t.replace("'", "''") + "'" for t, _ in toks)
        + "], ["
        + ", ".join(str(p) for _, p in toks)
        + "])"
        for i, toks in enumerate(RAW_GOLD)
    )
    return f"""
WITH docs AS (SELECT * FROM (VALUES {rows}) AS v(doc_id, terms, poss)),
tok2 AS (SELECT doc_id, unnest(terms) AS term, unnest(poss) AS pos
         FROM docs),
doclen AS (SELECT doc_id, len(terms) AS flen FROM docs),
post AS (
  SELECT t.doc_id, t.term, count(*) AS tf,
         CAST(CAST(1.0/sqrt(d.flen) AS REAL) AS DOUBLE) AS norm,
         list(t.pos ORDER BY t.pos) AS positions
  FROM tok2 t JOIN doclen d USING (doc_id)
  GROUP BY t.doc_id, t.term, d.flen
), ndocs AS (SELECT count(*) AS n FROM docs),
avgl AS (
  SELECT ceil(CAST(count(DISTINCT term) AS DOUBLE)
              / (SELECT n FROM ndocs)) AS v FROM post
), dict AS (SELECT term, count(*) AS df FROM post GROUP BY term)
"""


def _sql_raw_match() -> str:
    idf = _IDF.format(df="coalesce(d.df, 0)")
    return f"""{_sql_raw_prelude()},
expq AS (
  SELECT qt.term, coalesce(d.df, 0) AS df, {idf} AS idf, 1.0 AS mult
  FROM (VALUES ('fox'), ('jumps')) qt(term) LEFT JOIN dict d USING (term)
),
qnorm AS (SELECT 1.0/sqrt(sum((mult*idf)*(mult*idf))) AS v FROM expq),
total AS (SELECT count(*) AS t FROM expq),
scored AS (
  SELECT p.doc_id,
         {_BASE} * (q.mult * q.idf * (SELECT v FROM qnorm)) AS s
  FROM post p JOIN expq q USING (term))
SELECT doc_id, round(sum(s) * count(*)
       / (SELECT CAST(t AS DOUBLE) FROM total), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20"""


def _sql_raw_phrase() -> str:
    idf = _IDF.format(df="coalesce(d.df, 0)")
    return f"""{_sql_raw_prelude()},
expq AS (
  SELECT qt.term, {idf} AS idf
  FROM (VALUES ('lazy'), ('dog''s'), ('back')) qt(term)
  LEFT JOIN dict d USING (term)
),
qnorm AS (SELECT 1.0/sqrt(sum(idf*idf)) AS v FROM expq),
p1 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'lazy'),
p2 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'dog''s'),
p3 AS (SELECT p.doc_id, p.positions,
              {_BASE} * (q.idf * (SELECT v FROM qnorm)) AS s
       FROM post p JOIN expq q USING (term) WHERE p.term = 'back')
SELECT p1.doc_id, round(p1.s + p2.s + p3.s, 6) AS score
FROM p1 JOIN p2 USING (doc_id) JOIN p3 USING (doc_id)
WHERE len(list_intersect(
        list_transform(list_intersect(
          list_transform(p1.positions, x -> x + 1), p2.positions),
          x -> x + 1),
        p3.positions)) > 0
ORDER BY score DESC, doc_id LIMIT 20"""


# ---- seeded-hash op oracles: the engine's hashes are md5-derived
# (functions/dedup.md5_hash60) precisely so these have exact SQL
# twins; minhash a/b params and LSH planes are regenerated here from
# the same public numpy seeds (parameters, not engine code) ---------

_M31 = 2147483647


_NESTED_ORACLE = """
WITH depts(doc_id, d, name, budget) AS (VALUES
  ('doc1', 0, 'engineering', 2000000.0), ('doc1', 1, 'sales', 300000.0),
  ('doc2', 0, 'marketing', 800000.0), ('doc2', 1, 'engineering', 800000.0),
  ('doc3', 0, 'hr', 800000.0), ('doc3', 1, 'engineering', 200000.0)),
emps(doc_id, d, name, role) AS (VALUES
  ('doc1', 0, 'alice', 'engineer'), ('doc1', 0, 'bob', 'manager'),
  ('doc1', 1, 'eve', 'salesperson'), ('doc1', 1, 'mallory', 'manager'),
  ('doc2', 0, 'eve', 'marketer'), ('doc2', 0, 'david', 'manager'),
  ('doc2', 1, 'frank', 'manager'), ('doc2', 1, 'grace', 'engineer'),
  ('doc3', 0, 'eve', 'manager'), ('doc3', 0, 'frank', 'hr'),
  ('doc3', 1, 'heidi', 'support engineer'), ('doc3', 1, 'ivan', 'manager')),
projs(doc_id, d, title, status) AS (VALUES
  ('doc1', 0, 'project x', 'ongoing'), ('doc1', 0, 'project y', 'completed'),
  ('doc1', 1, 'project a', 'completed'), ('doc1', 1, 'project b', 'ongoing'),
  ('doc2', 0, 'project z', 'ongoing'), ('doc2', 0, 'project w', 'planned'),
  ('doc2', 1, 'project alpha', 'completed'),
  ('doc2', 1, 'project beta', 'ongoing'),
  ('doc3', 0, 'project beta', 'completed'),
  ('doc3', 0, 'project b', 'ongoing'),
  ('doc3', 1, 'project helpdesk', 'ongoing'),
  ('doc3', 1, 'project faq', 'completed')),
locs(doc_id, l, city, country) AS (VALUES
  ('doc1', 0, 'athens', 'greece'), ('doc1', 1, 'berlin', 'usa'),
  ('doc2', 0, 'athens', 'usa'), ('doc2', 1, 'london', 'uk'),
  ('doc3', 0, 'edinburgh', 'uk'), ('doc3', 1, 'london', 'canada')),
roots(doc_id) AS (VALUES ('doc1'), ('doc2'), ('doc3'))
SELECT 't1_same_dept' AS "case", doc_id FROM roots r
WHERE EXISTS (SELECT 1 FROM depts dp WHERE dp.doc_id = r.doc_id
              AND dp.name = 'engineering' AND dp.budget >= 800000.0)
UNION ALL
SELECT 't2_emp_proj_same_dept', doc_id FROM roots r
WHERE EXISTS (SELECT 1 FROM depts dp WHERE dp.doc_id = r.doc_id
  AND EXISTS (SELECT 1 FROM emps e WHERE e.doc_id = dp.doc_id
              AND e.d = dp.d AND e.name = 'eve')
  AND EXISTS (SELECT 1 FROM projs p WHERE p.doc_id = dp.doc_id
              AND p.d = dp.d AND p.status = 'completed'))
UNION ALL
SELECT 't3_same_location', doc_id FROM roots r
WHERE EXISTS (SELECT 1 FROM locs lo WHERE lo.doc_id = r.doc_id
              AND lo.city = 'athens' AND lo.country = 'usa')
  AND EXISTS (SELECT 1 FROM depts dp WHERE dp.doc_id = r.doc_id
              AND dp.name = 'engineering')
ORDER BY 1, 2"""


def _minhash_pairs_sql(num_hashes=64, bands=16, thresh=0.5,
                       cap=100) -> str:
    """Oracle twin of minhash_lsh_pairs with its scale guards:
    identical signatures collapse to the min-key representative
    (sigr), and (band, bucket) groups larger than ``cap`` are
    dropped (hot/cold) — the hot-bucket bound."""
    import numpy as np

    rng = np.random.RandomState(42)
    a = rng.randint(1, _M31 - 1, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _M31 - 1, size=num_hashes, dtype=np.int64)
    mins = ",\n    ".join(
        f"min(({int(a[i])} * h + {int(b[i])}) % {_M31}) AS h{i}"
        for i in range(num_hashes)
    )
    sig_list = "[" + ", ".join(f"h{i}" for i in range(num_hashes)) + "]"
    rpb = num_hashes // bands
    return f"""
WITH words AS (
  SELECT doc_id AS key, string_split(lower(text), ' ') AS ws
  FROM documents
), sh AS (
  SELECT key, unnest(list_distinct(
    [array_to_string(ws[i:least(i+2, len(ws))], ' ')
     for i in range(1, greatest(len(ws)-2, 1) + 1)])) AS shingle
  FROM words
), hashed AS (
  SELECT key,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_M31} AS h
  FROM sh WHERE len(shingle) > 0
), sigs AS (
  SELECT key, {mins}
  FROM hashed GROUP BY key
), sig AS (SELECT key, {sig_list} AS sig FROM sigs),
sigr AS (SELECT min(key) AS key, sig FROM sig GROUP BY sig),
bandrows AS (
  SELECT key, bd,
         array_to_string(
           sig[CAST(bd * {rpb} + 1 AS INT)
               : CAST(bd * {rpb} + {rpb} AS INT)], ',') AS bucket
  FROM sigr, (SELECT unnest(range(0, {bands})) AS bd) bds
),
hot AS (SELECT bd, bucket FROM bandrows
        GROUP BY bd, bucket HAVING count(*) > {cap}),
cold AS (SELECT br.key, br.bd, br.bucket FROM bandrows br
         LEFT JOIN hot h ON br.bd = h.bd AND br.bucket = h.bucket
         WHERE h.bd IS NULL),
cand AS (SELECT DISTINCT a.key AS key_a, b.key AS key_b
         FROM cold a JOIN cold b
           ON a.bd = b.bd AND a.bucket = b.bucket AND a.key < b.key),
pairs AS (
  SELECT c.key_a, c.key_b,
         CAST(len(list_filter(range(1, {num_hashes + 1}),
              i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
           / {float(num_hashes)!r} AS est_jaccard
  FROM cand c
  JOIN sigr sa ON sa.key = c.key_a
  JOIN sigr sb ON sb.key = c.key_b
)
SELECT key_a, key_b, est_jaccard FROM pairs
WHERE est_jaccard >= {thresh!r}"""


def _simhash_pairs_sql(bits=60, max_hamming=3, cap=100) -> str:
    """Oracle twin of simhash_pairs with its scale guards: hamming-0
    cliques (identical simhash) collapse to the min-key rep (shr) and
    (chunk, val) groups above ``cap`` are dropped."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    acc = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS key, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT key, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM toks WHERE len(tok) > 0
), bitsums AS (
  SELECT key, {sums}
  FROM hashed GROUP BY key
), sh AS (SELECT key, ({acc}) AS s FROM bitsums),
shr AS (SELECT min(key) AS key, s FROM sh GROUP BY s),
chunks AS (
  SELECT key, s, c, (s >> CAST(c * 15 AS INT)) & 32767 AS val
  FROM shr, (SELECT unnest(range(0, 4)) AS c) cs
),
hot AS (SELECT c, val FROM chunks
        GROUP BY c, val HAVING count(*) > {cap}),
cold AS (SELECT ch.key, ch.s, ch.c, ch.val FROM chunks ch
         LEFT JOIN hot h ON ch.c = h.c AND ch.val = h.val
         WHERE h.c IS NULL),
cand AS (SELECT DISTINCT a.key AS key_a, b.key AS key_b,
                a.s AS sa, b.s AS sb
         FROM cold a JOIN cold b
           ON a.c = b.c AND a.val = b.val AND a.key < b.key)
SELECT key_a, key_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}"""


def _sig_sql(e_expr: str, mat) -> str:
    """Hyperplane sign signature of a 64-dim embedding expression —
    the SQL twin of similarity.signature_col (double-precision dots)."""
    terms = []
    for i, row in enumerate(mat):
        lst = "[" + ", ".join(repr(float(x)) for x in row) + "]"
        dot = (
            f"list_sum(list_transform(range(1, 65), j -> "
            f"CAST({e_expr}[j] AS DOUBLE) * ({lst})[j]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def _emb_neardup_sql(planes=8, seed=7, thresh=0.25, cap=50) -> str:
    """Oracle twin of embedding_cosine_pairs with its scale guards:
    identical vectors collapse to the min-key rep and buckets above
    ``cap`` reps are dropped."""
    import numpy as np

    mat = np.random.RandomState(seed).standard_normal((planes, 64))

    def dot(a, b):
        return (
            f"list_sum(list_transform(range(1, 65), j -> "
            f"CAST({a}[j] AS DOUBLE) * CAST({b}[j] AS DOUBLE)))"
        )

    cos = (
        f"({dot('a.embedding', 'b.embedding')} / "
        f"(sqrt({dot('a.embedding', 'a.embedding')}) * "
        f"sqrt({dot('b.embedding', 'b.embedding')})))"
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {_sig_sql('embedding', mat)} AS s
  FROM embeddings
), reps AS (
  SELECT min(vec_id) AS vec_id, embedding, s
  FROM sigs GROUP BY embedding, s
), hot AS (SELECT s FROM reps GROUP BY s HAVING count(*) > {cap}),
cold AS (SELECT r.vec_id, r.embedding, r.s FROM reps r
         LEFT JOIN hot h ON r.s = h.s WHERE h.s IS NULL),
cand AS (
  SELECT a.vec_id AS key_a, b.vec_id AS key_b, {cos} AS cosine
  FROM cold a JOIN cold b
    ON a.s = b.s AND a.vec_id < b.vec_id
)
SELECT key_a, key_b, round(cosine, 6) AS cosine FROM cand
WHERE cosine >= {thresh!r}"""


def _ann_pruned_topk_sql(mode: str) -> str:
    import numpy as np

    if mode == "lsh":  # planes=12, probe_hamming=3, seed=7
        mat = np.random.RandomState(7).standard_normal((12, 64))
        elig = (
            "SELECT vec_id, embedding FROM sigs, qsig "
            "WHERE bit_count(xor(sigs.s, qsig.s)) <= 3"
        )
        extra = ""
    else:  # ivf: cell_bits=6, n_probe_cells=16, seed=11
        mat = np.random.RandomState(11).standard_normal((6, 64))
        extra = (
            ", cells AS (SELECT c FROM (SELECT unnest(range(0, 64)) "
            "AS c) t, qsig ORDER BY bit_count(xor(CAST(c AS BIGINT), "
            "qsig.s)), c LIMIT 16)"
        )
        elig = (
            "SELECT vec_id, embedding FROM sigs "
            "WHERE sigs.s IN (SELECT c FROM cells)"
        )
    return f"""
WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
qsig AS (SELECT {_sig_sql('q', mat)} AS s FROM qv),
sigs AS (SELECT vec_id, embedding, {_sig_sql('embedding', mat)} AS s
         FROM embeddings){extra},
elig AS ({elig}),
pairs AS (
  SELECT vec_id, unnest(embedding) AS x, unnest((SELECT q FROM qv)) AS y
  FROM elig
), sums AS (
  SELECT vec_id,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
  FROM pairs GROUP BY vec_id
)
SELECT vec_id AS key, round(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine
FROM sums ORDER BY cosine DESC, key LIMIT 10"""


_SQL_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT vec_id, unnest(embedding) AS x, unnest((SELECT qv FROM q)) AS y
  FROM embeddings
), sums AS (
  SELECT vec_id,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
  FROM pairs GROUP BY vec_id
)
SELECT vec_id AS key, round(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine
FROM sums ORDER BY cosine DESC, key LIMIT 10"""


# ---- geo oracles: INDEPENDENT hand-written SQL (deliberately NOT
# imported from bleve_spark.search.geo, and using a different but
# equivalent formulation — crossing COUNT parity instead of an XOR
# chain, restructured ellipsoid algebra — so an engine formula bug
# cannot pass its own oracle) --------------------------------------


def _pip_count_sql(x: str, y: str,
                   pts: list[tuple[float, float]]) -> str:
    """Point-in-polygon as crossing-count parity over the FIXED query
    polygon (independent restatement of the even-odd rule)."""
    n = len(pts)
    terms = []
    for i in range(n):
        xi, yi = float(pts[i][0]), float(pts[i][1])
        xj, yj = float(pts[(i + 1) % n][0]), float(pts[(i + 1) % n][1])
        if yi == yj:
            continue
        terms.append(
            f"(CASE WHEN (({yi!r} > {y}) <> ({yj!r} > {y})) AND "
            f"({x} < ({xj!r} - {xi!r}) * ({y} - {yi!r}) / "
            f"({yj!r} - {yi!r}) + {xi!r}) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _pip_doc_sql(px: float, py: float, c: str = "c") -> str:
    """Fixed point inside the doc's variable-length CLOSED ring —
    crossing count via list_filter over edge indexes."""
    return (
        f"(len(list_filter(range(1, len({c})), i -> "
        f"CASE WHEN (({c}[i][2] > {py!r}) <> ({c}[i+1][2] > {py!r})) "
        f"THEN {px!r} < ({c}[i+1][1] - {c}[i][1]) * "
        f"({py!r} - {c}[i][2]) / ({c}[i+1][2] - {c}[i][2]) + {c}[i][1] "
        f"ELSE FALSE END)) % 2 = 1)"
    )


def _edges_cross_sql(pts: list[tuple[float, float]], c: str = "c",
                     closed: bool = True) -> str:
    """Any doc edge (c[i], c[i+1]) properly crosses any query edge —
    strict orientation (ccw) sign tests. ``closed=False`` treats the
    query vertices as an open path (linestring)."""
    n = len(pts)
    qedges = [
        (pts[i], pts[(i + 1) % n])
        for i in range(n if closed else n - 1)
    ]

    def ccw(ax, ay, bx, by, cx, cy):
        return f"(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"

    ax, ay = f"{c}[i][1]", f"{c}[i][2]"
    bx, by = f"{c}[i+1][1]", f"{c}[i+1][2]"
    alts = []
    for (q1, q2) in qedges:
        c1x, c1y, c2x, c2y = (
            repr(float(q1[0])), repr(float(q1[1])),
            repr(float(q2[0])), repr(float(q2[1])),
        )
        d1 = ccw(ax, ay, bx, by, c1x, c1y)
        d2 = ccw(ax, ay, bx, by, c2x, c2y)
        d3 = ccw(c1x, c1y, c2x, c2y, ax, ay)
        d4 = ccw(c1x, c1y, c2x, c2y, bx, by)
        alts.append(f"({d1} * {d2} < 0 AND {d3} * {d4} < 0)")
    body = " OR ".join(alts)
    return f"(len(list_filter(range(1, len({c})), i -> {body})) > 0)"


_SQL_SHAPES_CTE = """
WITH s AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'point'
         WHEN 1 THEN 'linestring' ELSE 'polygon' END AS kind,
    CAST((doc_id*13) % 141 - 70 AS DOUBLE) AS bx,
    CAST((doc_id*7) % 121 - 60 AS DOUBLE) AS by,
    CAST(doc_id % 4 + 1 AS DOUBLE) AS dx,
    CAST(doc_id % 3 + 1 AS DOUBLE) AS dy,
    CAST(doc_id % 5 + 2 AS DOUBLE) AS w,
    CAST(doc_id % 7 + 2 AS DOUBLE) AS h
  FROM documents
), shp AS (
  SELECT doc_id, kind,
    CASE kind
      WHEN 'point' THEN [[bx, by]]
      WHEN 'linestring' THEN [[bx, by], [bx+dx, by+dy], [bx+2*dx, by-dy]]
      ELSE [[bx, by], [bx+w, by], [bx+w, by+h], [bx, by+h], [bx, by]]
    END AS c
  FROM s
)
"""

# query polygon for the geoshape driver queries (fractional vertices:
# no vertex/edge degeneracy against the integer doc lattice)
_QSHAPE_PTS = [(-20.5, -25.25), (30.5, -20.25), (25.5, 30.75),
               (-15.5, 28.25)]


# inner ring (hole) for the donut-query driver entries — fractional,
# strictly inside _QSHAPE_PTS
_QHOLE_PTS = [(-5.5, -5.25), (10.5, -6.25), (11.5, 8.75),
              (-6.5, 9.75)]

# seam endpoints splitting the _QSHAPE_PTS quad A,B,C,D into two
# TOUCHING polygon members (left: A,M_AB,M_DC,D; right: M_AB,B,C,M_DC)
# whose union is exactly the quad. Dyadic parameters t=33/64 on AB and
# t=29/64 on DC keep both points exactly representable in binary, so
# the two members tile the quad with no float gap; the seam line
# passes through no integer doc-lattice point (64y ≡ 770 mod 2221 has
# no solution in the coordinate range).
_QSEAM_AB = (5.796875, -22.671875)
_QSEAM_DC = (3.078125, 29.3828125)

_QUNION_SHAPE = {
    "type": "multipolygon",
    "coordinates": [
        [[list(_QSHAPE_PTS[0]), list(_QSEAM_AB), list(_QSEAM_DC),
          list(_QSHAPE_PTS[3]), list(_QSHAPE_PTS[0])]],
        [[list(_QSEAM_AB), list(_QSHAPE_PTS[1]), list(_QSHAPE_PTS[2]),
          list(_QSEAM_DC), list(_QSEAM_AB)]],
    ],
}


def _sql_mapping_typed() -> str:
    """Oracle for the type-routed mapped index: the corpus WITHOUT the
    disabled type ('src7') — postings, doc_count, df and avgdl are all
    computed over the filtered view, independent of the routing
    union."""
    pre = _PRELUDE.replace("FROM documents", "FROM docs_f").replace(
        "WITH raw AS (",
        "WITH docs_f AS (SELECT * FROM documents "
        "WHERE source <> 'src7'), raw AS (",
    )
    return _sql_single_term("spark", prelude=pre)


def _sql_mapping_tags() -> str:
    """Oracle for the array<string> keyword field: tags =
    [lang, lang, source] → 3 one-token elements per doc, merged
    same-name instances (tf=Σ per-element freq, flen=3)."""
    idf = _IDF.format(df="coalesce(d.df,0)")
    return f"""
WITH tg AS (
  SELECT doc_id, [lang, lang, source] AS tags FROM documents
), post AS (
  SELECT doc_id, t AS term, CAST(count(*) AS INT) AS tf,
         CAST(CAST(1.0/sqrt(3) AS REAL) AS DOUBLE) AS norm
  FROM (SELECT doc_id, unnest(tags) AS t FROM tg)
  GROUP BY doc_id, t
), ndocs AS (SELECT count(*) AS n FROM documents),
avgl AS (
  SELECT ceil(CAST(count(DISTINCT term) AS DOUBLE)
              / (SELECT n FROM ndocs)) AS v
  FROM post
), dict AS (
  SELECT term, count(*) AS df FROM post GROUP BY term
),
q AS (SELECT qt.term, {idf} AS idf
      FROM (VALUES ('en')) qt(term) LEFT JOIN dict d USING (term))
SELECT p.doc_id, round({_BASE}, 6) AS score
FROM post p JOIN q USING (term)
ORDER BY score DESC, p.doc_id LIMIT 20"""


def _sql_knn_request() -> str:
    """Oracle for the SearchRequest.KNN entry: boosted dot-product
    top-10 (rounded per-leg like the engine) + the closed-form BM25
    constant for the single-token tag field (tf=1, flen=1, norm=1,
    avgdl=ceil(#labels/n)), summed per doc."""
    return """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT vec_id, unnest(embedding) AS x, unnest((SELECT qv FROM q)) AS y
  FROM embeddings
), dots AS (
  SELECT vec_id,
         round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) * 2.0, 6) AS s
  FROM pairs GROUP BY vec_id
), knn AS (
  SELECT vec_id, s FROM dots ORDER BY s DESC, vec_id LIMIT 10
), nd AS (SELECT count(*) AS n FROM embeddings),
dfq AS (SELECT count(*) AS c FROM embeddings WHERE label = 3),
avgl AS (
  SELECT ceil(CAST(count(DISTINCT label) AS DOUBLE)
              / (SELECT n FROM nd)) AS v
  FROM embeddings
), bm AS (
  SELECT ln(1 + ((SELECT n FROM nd) - (SELECT c FROM dfq) + 0.5)
               / ((SELECT c FROM dfq) + 0.5))
         * 1.2 / (1 + 1.2 * (0.25 + 0.75 / (SELECT v FROM avgl))) AS s
), fts AS (
  SELECT vec_id, (SELECT s FROM bm) AS s FROM embeddings
  WHERE label = 3
)
SELECT vec_id, round(coalesce(f.s, 0) + coalesce(k.s, 0), 6) AS score
FROM fts f FULL OUTER JOIN knn k USING (vec_id)
ORDER BY score DESC, vec_id LIMIT 10"""


def _sql_mapping_custom_ngram() -> str:
    """Closed-form oracle for the edge_ngram(2,3) autocomplete field:
    every doc's source ('srcN', single token) yields exactly
    {'sr','src'} → tf=1, flen=2, df('src')=ndocs, avgdl=ceil(2/n)=1;
    the BM25 score is one constant and ordering falls to doc_id."""
    return """
WITH ndocs AS (SELECT count(*) AS n FROM documents),
nrm AS (SELECT CAST(CAST(1.0/sqrt(2.0) AS REAL) AS DOUBLE) AS v),
c AS (
  SELECT ln(1 + 0.5 / ((SELECT n FROM ndocs) + 0.5))
         * (1.0 * 1.2)
         / (1.0 + 1.2 * (0.25
            + (0.75 * (1.0 / ((SELECT v FROM nrm)*(SELECT v FROM nrm))))
              / ceil(2.0 / (SELECT n FROM ndocs)))) AS sc
)
SELECT doc_id, round((SELECT sc FROM c), 6) AS score
FROM documents ORDER BY score DESC, doc_id LIMIT 20"""


def _sql_geo_shape_union_within() -> str:
    """Independent oracle for within-the-UNION of the two members:
    the union is exactly the CONVEX quad _QSHAPE_PTS, and a shape is
    within a convex region iff all its vertices are (no edge-crossing
    test needed) — so the oracle never touches the member
    decomposition the engine evaluates."""
    pts = _QSHAPE_PTS
    pip_v = _pip_count_sql("v[1]", "v[2]", pts)
    any_in = f"(len(list_filter(c, v -> {pip_v})) > 0)"
    all_in = f"(len(list_filter(c, v -> {pip_v})) = len(c))"
    pred = f"CASE WHEN kind = 'point' THEN {any_in} ELSE {all_in} END"
    return (
        _SQL_SHAPES_CTE
        + "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM shp "
        f"WHERE {pred}"
    )


def _sql_geo_shape_hole(relation: str) -> str:
    """Independent donut-polygon oracle: region = outer minus hole;
    ring crossings count both rings; a hole vertex inside a doc
    polygon breaks within."""
    outer, hole = _QSHAPE_PTS, _QHOLE_PTS
    in_reg = (f"({_pip_count_sql('v[1]', 'v[2]', outer)}) AND NOT "
              f"({_pip_count_sql('v[1]', 'v[2]', hole)})")
    any_in = f"(len(list_filter(c, v -> {in_reg})) > 0)"
    all_in = f"(len(list_filter(c, v -> {in_reg})) = len(c))"
    cross = (f"({_edges_cross_sql(outer)} OR "
             f"{_edges_cross_sql(hole)})")
    hole_in_doc = " OR ".join(
        _pip_doc_sql(float(hx), float(hy)) for hx, hy in hole
    )
    q_in_doc = " OR ".join(
        _pip_doc_sql(float(qx), float(qy)) for qx, qy in outer
    )
    if relation == "within":
        pred = (
            f"CASE WHEN kind = 'point' THEN {any_in} "
            f"WHEN kind = 'linestring' THEN {all_in} AND NOT {cross} "
            f"ELSE {all_in} AND NOT {cross} "
            f"AND NOT ({hole_in_doc}) END"
        )
    elif relation == "intersects":
        pred = (
            f"CASE WHEN kind = 'point' THEN {any_in} "
            f"ELSE {any_in} OR {cross} "
            f"OR (kind = 'polygon' AND ({q_in_doc})) END"
        )
    else:
        raise ValueError(relation)
    return (
        _SQL_SHAPES_CTE
        + "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM shp "
        f"WHERE {pred}"
    )


def _sql_geo_shape(relation: str) -> str:
    pts = _QSHAPE_PTS
    pip_v = _pip_count_sql("v[1]", "v[2]", pts)
    any_in = f"(len(list_filter(c, v -> {pip_v})) > 0)"
    all_in = f"(len(list_filter(c, v -> {pip_v})) = len(c))"
    cross = _edges_cross_sql(pts)
    q_in_doc = " OR ".join(
        _pip_doc_sql(float(qx), float(qy)) for qx, qy in pts
    )
    if relation == "within":
        pred = (
            f"CASE WHEN kind = 'point' THEN {any_in} "
            f"ELSE {all_in} AND NOT {cross} END"
        )
    elif relation == "intersects":
        pred = (
            f"CASE WHEN kind = 'point' THEN {any_in} "
            f"ELSE {any_in} OR {cross} "
            f"OR (kind = 'polygon' AND ({q_in_doc})) END"
        )
    else:
        raise ValueError(relation)
    return (
        _SQL_SHAPES_CTE
        + f"SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM shp "
        f"WHERE {pred}"
    )


# linestring query path for q_geo_shape_ls_intersects (fractional,
# crossing the doc-shape lattice region)
_QLS_PTS = [(-40.5, -10.25), (10.5, 15.75), (45.5, -20.25)]


def _sql_geo_shape_ls_intersects() -> str:
    cross = _edges_cross_sql(_QLS_PTS, closed=False)
    q_in_doc = " OR ".join(
        _pip_doc_sql(float(qx), float(qy)) for qx, qy in _QLS_PTS
    )
    pred = (
        f"kind <> 'point' AND ({cross} "
        f"OR (kind = 'polygon' AND ({q_in_doc})))"
    )
    return (
        _SQL_SHAPES_CTE
        + "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM shp "
        f"WHERE {pred}"
    )


def _sql_geo_shape_contains_point(px: float, py: float) -> str:
    return (
        _SQL_SHAPES_CTE
        + "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM shp "
        f"WHERE kind = 'polygon' AND {_pip_doc_sql(px, py)}"
    )


def _sql_geo_polygon() -> str:
    pts = [(-60.0, -20.0), (60.0, -30.0), (40.0, 50.0), (-50.0, 40.0)]
    pred = _pip_count_sql("glon", "glat", pts)
    return (
        "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM ("
        "SELECT doc_id, "
        "CAST((doc_id * 7) % 181 - 90 AS DOUBLE) AS glat, "
        "CAST((doc_id * 13) % 361 - 180 AS DOUBLE) AS glon "
        f"FROM documents) WHERE {pred}"
    )


def _hav_km_sql_ind(lat_e: str, lon_e: str, lat: float,
                    lon: float) -> str:
    """Independent hand-written ellipsoidal haversine (WGS84 lat-
    dependent diameter): textbook h-formula with pow()-restructured
    radius algebra — same math as the engine, different code path."""
    a, b = 6378137.0, 6356752.31420
    la1 = f"radians({lat_e})"
    la2 = repr(math.radians(lat))
    dlon = f"radians({lon_e} - {float(lon)!r})"
    h = (
        f"((1.0 - cos({la1} - {la2})) / 2.0"
        f" + cos({la1}) * cos({la2}) * (1.0 - cos({dlon})) / 2.0)"
    )
    phi = f"abs(({la1} + {la2}) / 2.0)"
    num = (
        f"(pow({a!r}, 4) * pow(cos({phi}), 2)"
        f" + pow({b!r}, 4) * pow(sin({phi}), 2))"
    )
    den = (
        f"(pow({a!r}, 2) * pow(cos({phi}), 2)"
        f" + pow({b!r}, 2) * pow(sin({phi}), 2))"
    )
    return (
        f"(2.0 * sqrt({num} / {den}) / 1000.0"
        f" * asin(least(1.0, sqrt({h}))))"
    )


def _sql_geo_distance() -> str:
    hav = _hav_km_sql_ind("glat", "glon", 10.0, 20.0)
    return (
        "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM ("
        "SELECT doc_id, "
        "CAST((doc_id * 7) % 181 - 90 AS DOUBLE) AS glat, "
        "CAST((doc_id * 13) % 361 - 180 AS DOUBLE) AS glon "
        f"FROM documents) WHERE {hav} <= 2000.0"
    )


# ---------------------------------------------------------------- entry --


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 match top-10."""
    idx = _docs_index(spark, "/root/testdata/sf0.001")
    return _topk(idx, {"field": "text", "match": "spark data query"}, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {}

    # ---- fulltext / query algebra (documents) ----
    def q_term_bm25(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "text", "term": "spark"}
        )

    def q_term_tfidf(spark, sf):
        return _topk(
            _docs_index(spark, sf, "tfidf"),
            {"field": "text", "term": "data"},
        )

    def q_match_or(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "text", "match": "spark join"}
        )

    def q_match_and(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "match": "spark join", "operator": "and"},
        )

    def q_conjunction(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"conjuncts": [
                {"field": "text", "term": "query"},
                {"field": "text", "term": "data"},
            ]},
        )

    def q_disjunction_min2(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"disjuncts": [
                {"field": "text", "term": "spark"},
                {"field": "text", "term": "join"},
                {"field": "text", "term": "filter"},
            ], "min": 2},
        )

    def q_boolean(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {
                "must": {"conjuncts": [{"field": "text", "term": "spark"}]},
                "should": {"disjuncts": [{"field": "text", "term": "join"}],
                           "min": 0},
                "must_not": {"disjuncts": [
                    {"field": "lang", "term": "zh"}]},
            },
        )

    def q_phrase(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "match_phrase": "table hash"},
        )

    def q_phrase_fuzzy(spark, sf):
        """Fuzzy match-phrase: every analyzed position expands to its
        Levenshtein-1 dictionary neighbourhood (prefix 0) before the
        position-adjacency join — phrase.go:32,75 / search_phrase.go:69
        per-slot NewFuzzySearcher semantics ('tabl'~1 recovers
        'table')."""
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "match_phrase": "tabl hash",
             "fuzziness": 1},
        )

    def q_prefix(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "text", "prefix": "sc"}
        )

    def q_regexp(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "text", "regexp": "sc.n"}
        )

    def q_wildcard(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "text", "wildcard": "s?an"}
        )

    def q_fuzzy(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "term": "spak", "fuzziness": 1},
        )

    def q_term_range(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "min": "scan", "max": "sort",
             "inclusive_min": True, "inclusive_max": False},
        )

    # distributed-expansion twins: identical queries forced onto the
    # SDictDisj dictionary→postings join (dict cache disabled); the
    # driver compares them against the SAME oracles as the cached path
    def q_prefix_dist(spark, sf):
        return _topk(
            _docs_index_nodict(spark, sf), {"field": "text", "prefix": "sc"}
        )

    def q_regexp_dist(spark, sf):
        return _topk(
            _docs_index_nodict(spark, sf),
            {"field": "text", "regexp": "sc.n"},
        )

    def q_wildcard_dist(spark, sf):
        return _topk(
            _docs_index_nodict(spark, sf),
            {"field": "text", "wildcard": "s?an"},
        )

    def q_fuzzy_dist(spark, sf):
        return _topk(
            _docs_index_nodict(spark, sf),
            {"field": "text", "term": "spak", "fuzziness": 1},
        )

    def q_term_range_dist(spark, sf):
        return _topk(
            _docs_index_nodict(spark, sf),
            {"field": "text", "min": "scan", "max": "sort",
             "inclusive_min": True, "inclusive_max": False},
        )

    def q_numeric_range(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "n_chars", "min": 200, "max": 400,
             "inclusive_min": True, "inclusive_max": False},
            k=10_000_000,
        )

    def q_date_range(spark, sf):
        return _topk(
            _events_index(spark, sf),
            {"field": "ts", "start": "2024-01-10T00:00:00",
             "end": "2024-01-15T00:00:00"},
            k=10_000_000,
        )

    def q_ids(spark, sf):
        return _topk(_docs_index(spark, sf), {"ids": ["3", "5", "7"]})

    def q_match_all_count(spark, sf):
        idx = _docs_index(spark, sf)
        return compile_query(idx, {"match_all": {}}).agg(
            F.count(F.lit(1)).alias("total")
        )

    def q_sort_by_field(spark, sf):
        from bleve_spark.search.searcher import search_df

        idx = _docs_index(spark, sf)
        return search_df(
            idx, {"match_all": {}}, size=10, sort=["-n_chars"]
        ).select("doc_id", "n_chars")

    def q_sort_geo_distance(spark, sf):
        """match_all sorted by haversine distance from a point
        (SortGeoDistance, sort.go:625-700), nearest first."""
        from bleve_spark.search.searcher import search_df

        idx = _docs_index(spark, sf)
        out = search_df(
            idx, {"match_all": {}}, size=10,
            sort=[{"by": "geo_distance", "field": "geo",
                   "location": {"lon": 20.0, "lat": 10.0},
                   "unit": "km"}],
        )
        return out.select(
            "doc_id", F.round(F.col("geo_distance"), 6).alias("dist_km")
        )

    def q_pagination(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "text", "term": "spark"},
            k=5, from_=5,
        )

    def q_query_string(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"query": "+text:spark +n_chars:>300 -lang:zh text:join^2"},
        )

    def q_facet_lang(spark, sf):
        from bleve_spark.search.facets import terms_facet_df

        idx = _docs_index(spark, sf)
        scored = compile_query(idx, {"match_all": {}})
        return terms_facet_df(idx, scored, "lang", size=10)

    def q_facet_lang_prefix(spark, sf):
        """Terms facet with a term PREFIX filter
        (facet_builder_terms.go:79-105)."""
        from bleve_spark.search.facets import terms_facet_df

        idx = _docs_index(spark, sf)
        scored = compile_query(idx, {"match_all": {}})
        return terms_facet_df(idx, scored, "lang", size=10, prefix="e")

    def q_facet_nchars(spark, sf):
        from bleve_spark.search.facets import numeric_range_facet

        idx = _docs_index(spark, sf)
        scored = compile_query(idx, {"match_all": {}})
        fr = numeric_range_facet(
            idx, scored, "n_chars",
            [
                {"name": "small", "max": 200},
                {"name": "mid", "min": 200, "max": 400},
                {"name": "large", "min": 400},
            ],
        )
        return spark.createDataFrame(
            [(b["name"], b["count"]) for b in fr["numeric_ranges"]],
            "bucket string, count long",
        )

    def q_geo_distance(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "geo",
             "location": {"lon": 20.0, "lat": 10.0},
             "distance": "2000km"},
            k=10_000_000,
        )

    def q_geo_bbox(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "geo",
             "top_left": {"lon": -30.0, "lat": 40.0},
             "bottom_right": {"lon": 50.0, "lat": -10.0}},
            k=10_000_000,
        )

    def q_hybrid_rrf(spark, sf):
        """FTS match leg + brute-force cosine KNN leg, RRF-fused —
        the reference's SearchRequest Query+KNN hybrid."""
        from bleve_spark.search.hybrid import hybrid_search_df

        idx = _docs_index(spark, sf)
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
        return hybrid_search_df(
            idx, {"field": "text", "match": "spark data"},
            emb, "embedding", "vec_id", qv, size=10, leg_k=20,
        )

    def q_hybrid_filtered(spark, sf):
        """Filtered KNN hybrid: the vector leg scores ONLY docs whose
        lang='en' (eligible pre-selection BEFORE cosine —
        collector/eligible.go + search_knn.go:389), RRF-fused with the
        unfiltered FTS leg."""
        from bleve_spark.search.hybrid import hybrid_search_df

        idx = _docs_index(spark, sf)
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
        return hybrid_search_df(
            idx, {"field": "text", "match": "spark data"},
            emb, "embedding", "vec_id", qv, size=10, leg_k=20,
            knn_filter={"field": "lang", "term": "en"},
        )

    def q_geo_polygon(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "geo", "polygon_points": [
                {"lon": -60.0, "lat": -20.0},
                {"lon": 60.0, "lat": -30.0},
                {"lon": 40.0, "lat": 50.0},
                {"lon": -50.0, "lat": 40.0},
            ]},
            k=10_000_000,
        )

    def _geo_shape_q(spark, sf, relation, shape=None):
        return _topk(
            _docs_index(spark, sf),
            {"field": "shape",
             "geometry": {
                 "shape": shape or {
                     "type": "polygon",
                     "coordinates": [list(p) for p in _QSHAPE_PTS],
                 },
                 "relation": relation,
             }},
            k=10_000_000,
        )

    def q_geo_shape_within(spark, sf):
        """Doc shapes (point/linestring/closed polygon) fully within
        the query polygon — geo_shape.go relation=within."""
        return _geo_shape_q(spark, sf, "within")

    def q_geo_shape_intersects(spark, sf):
        return _geo_shape_q(spark, sf, "intersects")

    def q_geo_shape_ls_intersects(spark, sf):
        """Doc shapes crossed by a query LINESTRING path (open-path
        edge tests + path-inside-polygon vertex tests)."""
        return _geo_shape_q(
            spark, sf, "intersects",
            shape={"type": "linestring",
                   "coordinates": [list(p) for p in _QLS_PTS]},
        )

    def q_geo_shape_hole_within(spark, sf):
        """Query polygon WITH A HOLE (GeoJSON inner ring): doc shapes
        inside the hole must not match within — geo/README.md s2
        polygons carry holes; parts engine subtracts ring c[1]."""
        return _geo_shape_q(
            spark, sf, "within",
            shape={"type": "polygon",
                   "coordinates": [[list(p) for p in _QSHAPE_PTS],
                                   [list(p) for p in _QHOLE_PTS]]},
        )

    def q_geo_shape_hole_intersects(spark, sf):
        """Same donut query, intersects relation: shapes buried in the
        hole don't intersect; shapes straddling the hole boundary do."""
        return _geo_shape_q(
            spark, sf, "intersects",
            shape={"type": "polygon",
                   "coordinates": [[list(p) for p in _QSHAPE_PTS],
                                   [list(p) for p in _QHOLE_PTS]]},
        )

    def q_geo_shape_parts_within(spark, sf):
        """Same within relation through the PARTS-based geoshape
        engine (search/geoshape.py — the generalized model that runs
        the reference's full geoshapes golden suite); must hash-match
        the flat engine's oracle."""
        from bleve_spark.search.geoshape import parts_relation_pred

        idx = _docs_index(spark, sf)
        parts = F.array(
            F.struct(
                F.col("shape_kind").alias("kind"),
                F.col("shape_coords").alias("ring"),
                F.lit(0.0).alias("radius"),
                F.expr(
                    "CAST(array() AS array<array<array<double>>>)"
                ).alias("holes"),
            )
        )
        # radius-0 parts: inner == outer == the materialized flat bbox
        bb = {
            k: F.col(f"shape_bbox_{k.split('_', 1)[1]}")
            for k in ("in_minlon", "in_minlat", "in_maxlon", "in_maxlat",
                      "out_minlon", "out_minlat", "out_maxlon",
                      "out_maxlat")
        }
        pred = parts_relation_pred(
            parts,
            {"type": "polygon",
             "coordinates": [[list(p) for p in _QSHAPE_PTS]]},
            "within",
            bbox_cols=bb,
        )
        return idx.source.where(pred).select(
            "doc_id", F.lit(1.0).alias("score")
        )

    def q_mapping_nested_term(spark, sf):
        """Term query over a field FLATTENED BY THE MAPPING LAYER
        (body.text): nested structs walk to dotted paths exactly like
        bleve's encodePath (mapping/document.go), and scores must be
        identical to the same content indexed flat — so the oracle is
        the plain single-term BM25 twin."""
        return _topk(
            _mapped_docs_index(spark, sf, "nested"),
            {"field": "body.text", "term": "spark"},
        )

    def q_mapping_typed_term(spark, sf):
        """Per-type document mappings: rows whose type_field value
        ('source') names a DISABLED type mapping never reach the index
        — doc_count, df and avgdl all shrink (mapping/index.go
        MapDocument only walks enabled mappings), which shifts every
        BM25 score."""
        return _topk(
            _mapped_docs_index(spark, sf, "typed"),
            {"field": "text", "term": "spark"},
        )

    def q_mapping_array_tags(spark, sf):
        """array<string> keyword field through the mapping layer:
        bleve indexes each element as a same-name field instance whose
        term freqs merge and lengths sum (document/document.go:35,
        173-181) — tf('en')=2 where lang='en' (it appears twice in the
        tags array), norm=float32(1/√3) for every doc."""
        return _topk(
            _mapped_docs_index(spark, sf, "tags"),
            {"field": "tags", "term": "en"},
        )

    def q_mapping_custom_ngram(spark, sf):
        """Custom `analysis` section through the mapping layer: an
        edge_ngram(2,3) autocomplete analyzer defined in mapping JSON
        (mapping/analysis.go; token/edgengram) indexes source values
        ('srcN') as terms {'sr','src'} — tf=1, flen=2 for every doc,
        so the oracle computes the closed-form BM25 constant."""
        return _topk(
            _mapped_docs_index(spark, sf, "custom"),
            {"field": "source", "term": "src"},
        )

    def q_mapping_nested_array(spark, sf):
        """nested: true sub-documents through the mapping layer
        (mapping/document.go:489-507 nested child documents,
        search_conjunction_nested.go joins at the common nested
        ancestor, collector/topn.go folds children into the root).
        Five conjunction scenarios from the reference's
        search_nested_test.go corpus; rows are (case, doc_id) — the
        oracle recomputes the same-element/-ancestor joins from the
        identical literal data with UNNEST + EXISTS."""
        from pyspark.sql import Row

        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping,
        )
        from bleve_spark.search.searcher import search_df

        key = (spark.sparkContext.applicationId, "nested-companies")
        if key not in _INDEX_CACHE:
            def dept(name, budget, emps, projs):
                return Row(
                    name=name, budget=budget,
                    employees=[Row(name=n, role=r) for n, r in emps],
                    projects=[Row(title=t, status=s) for t, s in projs],
                )

            rows = [
                Row(doc_id="doc1", company=Row(
                    id="c1", name="TechCorp",
                    departments=[
                        dept("Engineering", 2000000.0,
                             [("Alice", "Engineer"), ("Bob", "Manager")],
                             [("Project X", "ongoing"),
                              ("Project Y", "completed")]),
                        dept("Sales", 300000.0,
                             [("Eve", "Salesperson"),
                              ("Mallory", "Manager")],
                             [("Project A", "completed"),
                              ("Project B", "ongoing")]),
                    ],
                    locations=[Row(city="Athens", country="Greece"),
                               Row(city="Berlin", country="USA")],
                )),
                Row(doc_id="doc2", company=Row(
                    id="c2", name="BizInc",
                    departments=[
                        dept("Marketing", 800000.0,
                             [("Eve", "Marketer"), ("David", "Manager")],
                             [("Project Z", "ongoing"),
                              ("Project W", "planned")]),
                        dept("Engineering", 800000.0,
                             [("Frank", "Manager"), ("Grace", "Engineer")],
                             [("Project Alpha", "completed"),
                              ("Project Beta", "ongoing")]),
                    ],
                    locations=[Row(city="Athens", country="USA"),
                               Row(city="London", country="UK")],
                )),
                Row(doc_id="doc3", company=Row(
                    id="c3", name="WebSolutions",
                    departments=[
                        dept("HR", 800000.0,
                             [("Eve", "Manager"), ("Frank", "HR")],
                             [("Project Beta", "completed"),
                              ("Project B", "ongoing")]),
                        dept("Engineering", 200000.0,
                             [("Heidi", "Support Engineer"),
                              ("Ivan", "Manager")],
                             [("Project Helpdesk", "ongoing"),
                              ("Project FAQ", "completed")]),
                    ],
                    locations=[Row(city="Edinburgh", country="UK"),
                               Row(city="London", country="Canada")],
                )),
            ]
            im = IndexMapping.from_dict({"default_mapping": {
                "properties": {"company": {"properties": {
                    "id": {"fields": [{"type": "text"}]},
                    "name": {"fields": [{"type": "text"}]},
                    "departments": {
                        "nested": True,
                        "properties": {
                            "name": {"fields": [{"type": "text"}]},
                            "budget": {"fields": [{"type": "number"}]},
                            "employees": {"nested": True, "properties": {
                                "name": {"fields": [{"type": "text"}]},
                                "role": {"fields": [{"type": "text"}]},
                            }},
                            "projects": {"nested": True, "properties": {
                                "title": {"fields": [{"type": "text"}]},
                                "status": {"fields": [{"type": "text"}]},
                            }},
                        },
                    },
                    "locations": {"nested": True, "properties": {
                        "city": {"fields": [{"type": "text"}]},
                        "country": {"fields": [{"type": "text"}]},
                    }},
                }}}}})
            # 3-row corpus: one partition, or every scan of the
            # 6-frame nested union schedules default-parallelism
            # empty tasks per frame
            _INDEX_CACHE[key] = index_with_mapping(
                spark.createDataFrame(rows).coalesce(1), ["doc_id"],
                im, persist=True,
            )
        idx = _INDEX_CACHE[key]

        def m(field, text):
            return {"field": "company.departments." + field
                    if not field.startswith(("company.", "_"))
                    else field, "match": text}

        # the deeper grouped-conjunction shapes (reference tests
        # 5a/5b, 6a/6b) are pytest-covered in
        # tests/test_nested_documents.py; the gate keeps the three
        # one-join-layer scenarios so the per-round correctness run
        # isn't dominated by stage-scheduling overhead of a very deep
        # tiny-data plan
        cases = {
            "t1_same_dept": {"conjuncts": [
                m("name", "Engineering"),
                {"field": "company.departments.budget",
                 "min": 800000.0},
            ]},
            "t2_emp_proj_same_dept": {"conjuncts": [
                m("employees.name", "Eve"),
                m("projects.status", "completed"),
            ]},
            "t3_same_location": {"conjuncts": [
                {"conjuncts": [
                    {"field": "company.locations.country",
                     "match": "USA"},
                    {"field": "company.locations.city",
                     "match": "Athens"},
                ]},
                m("name", "Engineering"),
            ]},
        }
        rows_out = []
        for label, q in cases.items():
            for r in search_df(idx, q, size=10, sort=["_id"]).collect():
                rows_out.append((label, r["doc_id"]))
        # eagerly materialized: the engine ran above; re-collections by
        # the harness shouldn't re-execute the deep tiny-data DAG
        return spark.createDataFrame(
            rows_out, "case string, doc_id string"
        )

    def q_knn_request(spark, sf):
        """SearchRequest.KNN over a MAPPED vector field
        (search_knn.go:460-530): one dot-product clause (vec 0's
        embedding, k=10, boost 2) plus an fts term leg on the tag
        field; a doc's final score is fts + Σ matched KNN legs
        (setKnnHitsInCollector: ftsMatch.Score += knnMatch.Score)."""
        from bleve_spark.search.hybrid import knn_request_df

        idx = _mapped_docs_index(spark, sf, "knn")
        qv = (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .where(F.col("vec_id") == 0).select("embedding").first()[0]
        )
        return knn_request_df(
            idx,
            [{"field": "embedding", "vector": qv, "k": 10,
              "boost": 2.0}],
            q={"field": "tag", "term": "v3"},
            size=10,
        )

    def q_knn_request_ann(spark, sf):
        """Same SearchRequest.KNN as q_knn_request, served from an
        ATTACHED at-rest HNSW layout (search/hybrid.attach_ann — the
        reference serves KNN from the per-segment faiss index,
        search_knn.go:389): the clause probes the graph for candidate
        keys (ef = corpus size ⇒ exact beam) and exactly re-ranks them
        with the mapped dot_product, so the result hash-matches the
        brute-force oracle while the leg scans probe bytes, not the
        whole embedding column."""
        import copy as _copy

        from bleve_spark.search.hybrid import attach_ann, knn_request_df

        # shallow copy: the cached index stays brute-force for
        # q_knn_request (attach_ann sets the layout dict per object)
        idx = _copy.copy(_mapped_docs_index(spark, sf, "knn"))
        n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        attach_ann(
            idx, "embedding", "hnsw", _ann_layout(spark, sf, "hnsw4"),
            key_col="vec_id", ef=int(n), oversample=3,
        )
        qv = (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .where(F.col("vec_id") == 0).select("embedding").first()[0]
        )
        return knn_request_df(
            idx,
            [{"field": "embedding", "vector": qv, "k": 10,
              "boost": 2.0}],
            q={"field": "tag", "term": "v3"},
            size=10,
        )

    def q_mapping_geo_bbox(spark, sf):
        """Geo bbox query over a MAPPED geopoint field: the nested
        {lat, lon} struct plans to the engine's flat geo_lat/geo_lon
        columns (mapping geopoint type) and the bbox predicate runs
        on them natively — same oracle as the hand-flattened
        q_geo_bbox."""
        return _topk(
            _mapped_docs_index(spark, sf, "geo"),
            {"field": "geo",
             "top_left": {"lon": -30.0, "lat": 40.0},
             "bottom_right": {"lon": 50.0, "lat": -10.0}},
            k=10_000_000,
        )

    def q_geo_shape_union_within(spark, sf):
        """Doc shapes within the UNION of two TOUCHING polygon
        members (the _QSHAPE_PTS quad split along a dyadic seam):
        shapes straddling the seam are within the union though within
        neither member alone — geo_shape.go relation=within over a
        multipolygon evaluates the query region as one s2 union, not
        member-wise. Runs the parts engine's exact edge-splitting
        union path (search/geoshape.py parts_relation_pred →
        _union_within_pred)."""
        from bleve_spark.search.geoshape import parts_relation_pred

        idx = _docs_index(spark, sf)
        parts = F.array(
            F.struct(
                F.col("shape_kind").alias("kind"),
                F.col("shape_coords").alias("ring"),
                F.lit(0.0).alias("radius"),
                F.expr(
                    "CAST(array() AS array<array<array<double>>>)"
                ).alias("holes"),
            )
        )
        bb = {
            k: F.col(f"shape_bbox_{k.split('_', 1)[1]}")
            for k in ("in_minlon", "in_minlat", "in_maxlon", "in_maxlat",
                      "out_minlon", "out_minlat", "out_maxlon",
                      "out_maxlat")
        }
        pred = parts_relation_pred(
            parts, _QUNION_SHAPE, "within", bbox_cols=bb,
        )
        return idx.source.where(pred).select(
            "doc_id", F.lit(1.0).alias("score")
        )

    def q_geo_shape_contains(spark, sf):
        """Doc polygons containing a query point —
        geo_shape.go relation=contains."""
        return _geo_shape_q(
            spark, sf, "contains",
            shape={"type": "point", "coordinates": [-35.5, -37.75]},
        )

    def q_ip_range(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "ip", "cidr": "10.32.0.0/12"},
            k=10_000_000,
        )

    def q_facet_dates(spark, sf):
        from bleve_spark.search.facets import datetime_range_facet

        idx = _events_index(spark, sf)
        scored = compile_query(idx, {"match_all": {}})
        fr = datetime_range_facet(
            idx, scored, "ts",
            [
                {"name": "early", "end": "2024-01-10T00:00:00"},
                {"name": "mid", "start": "2024-01-10T00:00:00",
                 "end": "2024-01-20T00:00:00"},
                {"name": "late", "start": "2024-01-20T00:00:00"},
            ],
        )
        return spark.createDataFrame(
            [(b["name"], b["count"]) for b in fr["date_ranges"]],
            "bucket string, count long",
        )

    def q_multi_phrase(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "terms": [["part", "value"], ["hash"]]},
        )

    def q_phrase_slop(spark, sf):
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "terms": ["table", "hash"], "slop": 1},
        )

    def q_phrase_slop3(spark, sf):
        """3-slot shared-budget slop phrase — exercises the nested
        native `exists` chain (one budget across two steps)."""
        return _topk(
            _docs_index(spark, sf),
            {"field": "text", "terms": ["table", "part", "hash"],
             "slop": 2},
        )

    def q_bool_field(spark, sf):
        return _topk(
            _docs_index(spark, sf), {"field": "long_doc", "bool": True}
        )

    def q_search_after(spark, sf):
        idx = _docs_index(spark, sf)
        scored = compile_query(
            idx, {"field": "text", "term": "spark"}
        ).select("doc_id", F.round(F.col("score"), 6).alias("score"))
        order = [F.col("score").desc(), F.col("doc_id").asc()]
        cur = scored.orderBy(*order).limit(4).collect()[-1]
        after = scored.where(
            (F.col("score") < cur["score"])
            | ((F.col("score") == cur["score"])
               & (F.col("doc_id") > cur["doc_id"]))
        )
        return after.orderBy(*order).limit(6)

    def q_rrf_fusion(spark, sf):
        from bleve_spark.search.fusion import rrf_fuse

        idx = _docs_index(spark, sf)
        l1 = _topk(idx, {"field": "text", "term": "spark"}, k=20)
        l2 = _topk(idx, {"field": "text", "term": "join"}, k=20)
        fused = rrf_fuse(
            [l1.select("doc_id", "score"), l2.select("doc_id", "score")],
            ["doc_id"],
        )
        return (
            fused.select(
                "doc_id", F.round(F.col("score"), 6).alias("score")
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(20)
        )

    def q_rsf_fusion(spark, sf):
        """Relative-score fusion (rsf.go:35): per-list min-max
        normalization then weighted sum."""
        from bleve_spark.search.fusion import rsf_fuse

        idx = _docs_index(spark, sf)
        l1 = _topk(idx, {"field": "text", "term": "spark"}, k=20)
        l2 = _topk(idx, {"field": "text", "term": "join"}, k=20)
        fused = rsf_fuse(
            [l1.select("doc_id", "score"), l2.select("doc_id", "score")],
            ["doc_id"], weights=[1.0, 0.5],
        )
        return (
            fused.select(
                "doc_id", F.round(F.col("score"), 6).alias("score")
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(20)
        )

    def q_search_before(spark, sf):
        """search_before cursor: the `size` rows immediately PRECEDING
        the cursor in sort order (the reference pages backwards by
        flipping sort + search_after,
        index_alias_impl.go:721-724,1016-1020)."""
        idx = _docs_index(spark, sf)
        scored = compile_query(
            idx, {"field": "text", "term": "spark"}
        ).select("doc_id", F.round(F.col("score"), 6).alias("score"))
        order = [F.col("score").desc(), F.col("doc_id").asc()]
        cur = scored.orderBy(*order).limit(8).collect()[-1]
        before = scored.where(
            (F.col("score") > cur["score"])
            | ((F.col("score") == cur["score"])
               & (F.col("doc_id") < cur["doc_id"]))
        )
        return before.orderBy(
            F.col("score").asc(), F.col("doc_id").desc()
        ).limit(5)

    def q_alias_2shards(spark, sf):
        from bleve_spark.search.alias import AliasIndex

        key = (spark.sparkContext.applicationId, sf, "documents-alias2")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            shards = [
                index_table(
                    df.where(F.col("doc_id") % 2 == i),
                    key_cols=["doc_id"],
                    fields={"text": "standard"},
                )
                for i in (0, 1)
            ]
            _INDEX_CACHE[key] = AliasIndex(shards)
        return _topk(
            _INDEX_CACHE[key], {"field": "text", "term": "spark"}, k=20
        )

    def q_alias_strict(spark, sf):
        """STRICT bleve alias parity: per-shard doc frequency (the
        reference's search_term.go:146 local reader count) with merged
        pre-search doc_count/avg_doc_len — scores are shard-layout-
        dependent exactly like bleve's."""
        from bleve_spark.search.alias import alias_search_df

        key = (spark.sparkContext.applicationId, sf, "documents-alias2")
        if key not in _INDEX_CACHE:
            q_alias_2shards(spark, sf)  # builds + caches the shards
        shards = _INDEX_CACHE[key].shards
        out = alias_search_df(
            shards, {"field": "text", "term": "spark"}, size=20,
            strict_parity=True,
        )
        return out.select(
            "doc_id", F.round(F.col("score"), 6).alias("score")
        )

    def _docs_store(spark, sf):
        """At-rest compressed segment store over `documents` (cached):
        returns (SegmentStore, IndexedTable). Stats use the global
        distinct cardinality (single logical build) so the SQL oracle
        and the in-memory twin agree exactly."""
        import math as _math
        import tempfile

        from bleve_spark.index.segments import (
            SegmentStore,
            build_segments,
        )

        key = (spark.sparkContext.applicationId, sf, "documents-store")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            root = tempfile.mkdtemp(prefix="entry_store_") + "/idx"
            build_segments(
                df, ["doc_id"], {"text": "standard"}, root,
                n_segments=4, resume=False,
            )
            store = SegmentStore(spark, root)
            idx = store.to_indexed_table(
                df, ["doc_id"], {"text": "standard"}, persist=True
            )
            card = (
                idx.dictionary.where(F.col("field") == "text")
                .agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"]
            )
            idx.stats.field_cardinality["text"] = int(card)
            idx.stats.avg_doc_len["text"] = _math.ceil(
                card / idx.stats.doc_count
            )
            _INDEX_CACHE[key] = (store, idx)
        return _INDEX_CACHE[key]

    def q_term_store(spark, sf):
        """Same BM25 term query served from the AT-REST compressed
        segment store (delta+varint parquet blobs, term filter pushed
        into the parquet scan) — must hash-match the same SQL oracle
        as the in-memory path."""
        _, idx = _docs_store(spark, sf)
        return _topk(idx, {"field": "text", "term": "spark"}, k=20)

    def q_blockmax_topk(spark, sf):
        """Block-max WAND pruned disjunction top-k over the store —
        rank- and score-identical to the unpruned match disjunction,
        so it shares q_match_or's oracle shape."""
        from bleve_spark.search.blockmax import pruned_disjunction_topk

        store, idx = _docs_store(spark, sf)
        top = pruned_disjunction_topk(
            store, idx.stats, ["doc_id"], "text", ["spark", "join"],
            k=20,
        )
        return top.select(
            "doc_id", F.round(F.col("score"), 6).alias("score")
        )

    def q_term_after_delete(spark, sf):
        """Delete-visibility: docs with doc_id < 100 deleted from the
        store, then the same BM25 term query — deleted docs vanish and
        scores use the LIVE doc count (idf shifts accordingly)."""
        import math as _math
        import tempfile

        from bleve_spark.index.segments import (
            SegmentStore,
            build_segments,
        )

        key = (spark.sparkContext.applicationId, sf, "documents-del")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            root = tempfile.mkdtemp(prefix="entry_del_") + "/idx"
            build_segments(
                df, ["doc_id"], {"text": "standard"}, root,
                n_segments=4, resume=False,
            )
            store = SegmentStore(spark, root)
            store.delete_docs(
                df.where(F.col("doc_id") < 100), ["doc_id"]
            )
            idx = store.to_indexed_table(
                df, ["doc_id"], {"text": "standard"}, persist=True
            )
            # single logical build → global-distinct cardinality of the
            # LIVE postings, matching the oracle's live-only index
            card = (
                idx.dictionary.where(F.col("field") == "text")
                .agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"]
            )
            idx.stats.field_cardinality["text"] = int(card)
            idx.stats.avg_doc_len["text"] = _math.ceil(
                card / idx.stats.doc_count
            )
            _INDEX_CACHE[key] = idx
        return _topk(
            _INDEX_CACHE[key], {"field": "text", "term": "spark"}, k=20
        )

    def q_composite_term(spark, sf):
        """Composite `_all` field (per-member analyzers, merged term
        freqs, totalLength = Σ member lengths — field_composite.go):
        the text member's BM25 through the composite norm."""
        key = (spark.sparkContext.applicationId, sf, "documents-comp")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            _INDEX_CACHE[key] = index_table(
                df, key_cols=["doc_id"],
                fields={"text": "standard", "lang": "keyword",
                        "source": "keyword"},
                composite_fields={"_all": ["text", "lang", "source"]},
            )
        return _topk(
            _INDEX_CACHE[key], {"field": "_all", "term": "spark"}, k=20
        )

    def q_composite_typed_term(spark, sf):
        """Composite `_all` including TYPED members: n_chars (numeric
        → 16 prefix-coded trie terms, document/field_numeric.go:94-116)
        and long_doc (boolean → "T"/"F", field_boolean.go). The trie
        terms change `_all`'s per-doc LENGTH (norm) and the dictionary
        cardinality (avg_doc_len) — both observable in this BM25
        score, and both reproduced exactly by the SQL oracle."""
        key = (spark.sparkContext.applicationId, sf, "documents-ctyped")
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .withColumn("long_doc", F.col("n_chars") > 300)
            )
            _INDEX_CACHE[key] = index_table(
                df, key_cols=["doc_id"],
                fields={"text": "standard", "lang": "keyword",
                        "source": "keyword"},
                composite_fields={
                    "_all": ["text", "lang", "source", "n_chars",
                             "long_doc"],
                },
            )
        return _topk(
            _INDEX_CACHE[key], {"field": "_all", "term": "spark"}, k=20
        )

    def q_composite_typed_store(spark, sf):
        """The SAME typed-composite `_all` BM25 term query served from
        the AT-REST segment store: segment tasks merge the member
        streams (trie terms, boolean token, member-local positions,
        summed lengths) into encoded _all postings
        (segments._build_one_segment composite path), and the score
        must hash-match the DataFrame path's oracle exactly."""
        import math as _math
        import tempfile

        from bleve_spark.index.segments import (
            SegmentStore,
            build_segments,
        )

        key = (spark.sparkContext.applicationId, sf, "docs-cstore")
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .withColumn("long_doc", F.col("n_chars") > 300)
            )
            fields = {"text": "standard", "lang": "keyword",
                      "source": "keyword"}
            root = tempfile.mkdtemp(prefix="entry_cstore_") + "/idx"
            build_segments(
                df, ["doc_id"], fields, root, n_segments=4,
                resume=False,
                composite_fields={
                    "_all": ["text", "lang", "source", "n_chars",
                             "long_doc"],
                },
            )
            idx = SegmentStore(spark, root).to_indexed_table(
                df, ["doc_id"], {**fields, "_all": "standard"},
                persist=True,
            )
            # single-logical-build stats: global distinct cardinality
            # (bleve's offline Builder merges to one segment)
            card = (
                idx.dictionary.where(F.col("field") == "_all")
                .agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"]
            )
            idx.stats.field_cardinality["_all"] = int(card)
            idx.stats.avg_doc_len["_all"] = _math.ceil(
                card / idx.stats.doc_count
            )
            _INDEX_CACHE[key] = idx
        return _topk(
            _INDEX_CACHE[key], {"field": "_all", "term": "spark"}, k=20
        )

    def q_synonym_term(spark, sf):
        # separate index instance: synonyms are an index-level map
        key = (spark.sparkContext.applicationId, sf, "documents-syn")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            _INDEX_CACHE[key] = index_table(
                df, key_cols=["doc_id"], fields={"text": "standard"},
                synonyms={"text": {"spark": ["scan"]}},
            )
        return _topk(
            _INDEX_CACHE[key], {"field": "text", "term": "spark"}, k=20
        )

    def q_synonym_thesaurus(spark, sf):
        """Index-time synonym thesaurus (document/field_synonym.go,
        index.go:360-390): definitions analyzed at index time into a
        (collection, term, synonym) DataFrame that distributes with
        the index; the term query expands through it (term@1 +
        synonym@1/2), scoring exactly like the legacy query-time map."""
        from bleve_spark.index.thesaurus import build_thesaurus

        key = (spark.sparkContext.applicationId, sf, "documents-thes")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            thes = build_thesaurus(
                spark, [{"input": ["spark"], "synonyms": ["scan"]}]
            )
            _INDEX_CACHE[key] = index_table(
                df, key_cols=["doc_id"], fields={"text": "standard"},
                thesaurus=thes,
                synonym_collections={"text": "default"},
            )
        return _topk(
            _INDEX_CACHE[key], {"field": "text", "term": "spark"}, k=20
        )

    def q_alias_synonym(spark, sf):
        """Alias pre-search synonym phase (pre_search.go): the
        thesaurus is indexed on ONE shard only; the alias merges shard
        thesauri before querying, so expansion applies across all
        shards."""
        from bleve_spark.index.thesaurus import build_thesaurus
        from bleve_spark.search.alias import AliasIndex

        key = (spark.sparkContext.applicationId, sf, "alias-thes")
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            thes = build_thesaurus(
                spark, [{"input": ["spark"], "synonyms": ["scan"]}]
            )
            shards = [
                index_table(
                    df.where(F.col("doc_id") % 2 == i),
                    key_cols=["doc_id"],
                    fields={"text": "standard"},
                    thesaurus=thes if i == 0 else None,
                    synonym_collections=(
                        {"text": "default"} if i == 0 else None
                    ),
                )
                for i in (0, 1)
            ]
            _INDEX_CACHE[key] = AliasIndex(shards)
        return _topk(
            _INDEX_CACHE[key], {"field": "text", "term": "spark"}, k=20
        )

    def q_highlight(spark, sf):
        from bleve_spark.search.searcher import search

        idx = _docs_index(spark, sf)
        res = search(
            idx, {"field": "text", "match": "spark data"}, size=5,
            highlight_field="text",
        )
        rows = [
            (h["id"], h.get("fragments", {}).get("text", [""])[0])
            for h in res["hits"]
        ]
        return spark.createDataFrame(
            rows, "doc_id string, fragment string"
        )

    def _lang_q(spark, sf, lang):
        key = (spark.sparkContext.applicationId, "lang-" + lang)
        if key not in _INDEX_CACHE:
            df = spark.createDataFrame(
                list(enumerate(LANG_CORPORA[lang])),
                "doc_id int, text string",
            )
            _INDEX_CACHE[key] = index_table(
                df, key_cols=["doc_id"], fields={"text": lang}
            )
        return _topk(
            _INDEX_CACHE[key],
            {"field": "text", "match": LANG_QUERIES[lang][0]},
        )

    def q_lang_es(spark, sf):
        """Spanish analyzer (stop_es + normalize + light stemmer,
        analyzer_es.go) scored end-to-end vs frozen token goldens."""
        return _lang_q(spark, sf, "es")

    def q_lang_fr(spark, sf):
        """French analyzer (elision + stop_fr + light stemmer)."""
        return _lang_q(spark, sf, "fr")

    def q_lang_de(spark, sf):
        """German analyzer (stop_de + umlaut normalize + light
        stemmer)."""
        return _lang_q(spark, sf, "de")

    def q_lang_cjk(spark, sf):
        """CJK analyzer (width fold + ideograph bigrams)."""
        return _lang_q(spark, sf, "cjk")

    def q_lang_it(spark, sf):
        """Italian analyzer (elision + stop_it + light stemmer)."""
        return _lang_q(spark, sf, "it")

    def q_lang_pt(spark, sf):
        """Portuguese analyzer (stop_pt + light stemmer with plural/
        feminine normalization)."""
        return _lang_q(spark, sf, "pt")

    def q_lang_ru(spark, sf):
        """Russian analyzer (stop_ru + TRUE snowball stemmer,
        analyzer_ru.go / stemmer_ru.go)."""
        return _lang_q(spark, sf, "ru")

    def q_lang_nl(spark, sf):
        """Dutch analyzer (stop_nl + snowball stemmer)."""
        return _lang_q(spark, sf, "nl")

    def q_lang_sv(spark, sf):
        """Swedish analyzer (stop_sv + snowball stemmer)."""
        return _lang_q(spark, sf, "sv")

    def q_lang_da(spark, sf):
        """Danish analyzer (stop_da + snowball stemmer)."""
        return _lang_q(spark, sf, "da")

    def q_lang_no(spark, sf):
        """Norwegian analyzer (stop_no + snowball stemmer)."""
        return _lang_q(spark, sf, "no")

    def q_lang_fi(spark, sf):
        """Finnish analyzer (stop_fi + TRUE snowball stemmer)."""
        return _lang_q(spark, sf, "fi")

    def q_lang_ar(spark, sf):
        """Arabic analyzer (NFKC + stop_ar + arabic normalize +
        Lucene light stemmer, analyzer_ar.go)."""
        return _lang_q(spark, sf, "ar")

    def q_lang_fa(spark, sf):
        """Persian analyzer (ZWNJ charfilter + arabic/persian
        normalize + stop_fa; no stemmer — analyzer_fa.go)."""
        return _lang_q(spark, sf, "fa")

    def q_lang_hi(spark, sf):
        """Hindi analyzer (indic+hindi normalize + stop_hi + light
        stemmer, analyzer_hi.go)."""
        return _lang_q(spark, sf, "hi")

    def q_lang_ckb(spark, sf):
        """Sorani Kurdish analyzer (sorani normalize + stop_ckb +
        sorani stemmer, analyzer_ckb.go)."""
        return _lang_q(spark, sf, "ckb")

    def q_lang_hr(spark, sf):
        """Croatian analyzer (stop_hr + suffix transforms +
        Ljubesic-Pandzic rule stemmer, analyzer_hr.go)."""
        return _lang_q(spark, sf, "hr")

    def q_lang_tr(spark, sf):
        """Turkish analyzer (apostrophe truncation + per-rune lower
        incl. İ→i + stop_tr + snowball stemmer, analyzer_tr.go /
        stemmer_tr.go; port in analysis/snowball.py stem_tr)."""
        return _lang_q(spark, sf, "tr")

    def q_lang_hu(spark, sf):
        """Hungarian analyzer (stop_hu + snowball stemmer,
        analyzer_hu.go / stemmer_hu.go; port in analysis/snowball.py
        stem_hu)."""
        return _lang_q(spark, sf, "hu")

    def q_lang_ro(spark, sf):
        """Romanian analyzer (stop_ro + snowball stemmer,
        analyzer_ro.go / stemmer_ro.go; port in analysis/snowball.py
        stem_ro)."""
        return _lang_q(spark, sf, "ro")

    def q_lang_pl(spark, sf):
        """Polish analyzer (stop_pl + stempel statistical stemmer over
        Lucene's trained Egothor multi-trie, analyzer_pl.go)."""
        return _lang_q(spark, sf, "pl")

    def _raw_idx(spark):
        key = (spark.sparkContext.applicationId, "raw-text")
        if key not in _INDEX_CACHE:
            df = spark.createDataFrame(
                list(enumerate(RAW_TEXTS)), "doc_id int, text string"
            )
            _INDEX_CACHE[key] = index_table(
                df, key_cols=["doc_id"], fields={"text": "standard"}
            )
        return _INDEX_CACHE[key]

    def q_raw_text_match(spark, sf):
        """UAX#29 over RAW punctuated text through the hash gate (the
        documents corpus is pre-normalized, so string_split == the
        tokenizer there; this corpus isn't)."""
        return _topk(
            _raw_idx(spark), {"field": "text", "match": "Fox jumps!"}
        )

    def q_raw_text_phrase(spark, sf):
        """Phrase adjacency over raw text incl. a MidLetter-apostrophe
        token (dog's) and stopword position gaps."""
        return _topk(
            _raw_idx(spark),
            {"field": "text", "match_phrase": "lazy dog's back"},
        )

    # ---- training-data pipeline ops ----
    def dedup_exact(spark, sf):
        from bleve_spark.functions.dedup import exact_dedup

        df = spark.read.parquet(f"{sf}/documents.parquet")
        return exact_dedup(df, "text", "doc_id")

    def dedup_ngram_jaccard(spark, sf):
        from bleve_spark.functions.dedup import ngram_jaccard_pairs

        df = spark.read.parquet(f"{sf}/documents.parquet")
        # max_shingle_df=100 exercises the hot-shingle guard (the 100
        # TB boilerplate cap) on the verified path
        pairs = ngram_jaccard_pairs(
            df, "text", "doc_id", n=3, threshold=0.5,
            max_shingle_df=100,
        )
        return pairs.select(
            "key_a", "key_b", F.round("jaccard", 6).alias("jaccard")
        )

    def dedup_minhash_pairs(spark, sf):
        # 64 hashes / 16 bands → LSH s-curve threshold (1/16)^(1/4)≈0.5:
        # finds the corpus's planted near-dup pairs without the
        # near-all-pairs blowup unigram shingles would cause.
        # collapse_identical (default) + max_bucket_df=100 exercise
        # the 100 TB hot-bucket guards on the verified path
        from bleve_spark.functions.dedup import minhash_lsh_pairs

        df = spark.read.parquet(f"{sf}/documents.parquet")
        return minhash_lsh_pairs(
            df, "text", "doc_id", shingle_n=3, num_hashes=64, bands=16,
            jaccard_threshold=0.5, max_bucket_df=100,
        )

    def dedup_simhash_pairs(spark, sf):
        from bleve_spark.functions.dedup import simhash_pairs

        df = spark.read.parquet(f"{sf}/documents.parquet")
        return simhash_pairs(df, "text", "doc_id", max_hamming=3,
                             max_bucket_df=100)

    def ann_cosine_topk(spark, sf):
        from bleve_spark.functions.similarity import cosine_topk

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
        top = cosine_topk(df, "embedding", "vec_id", qv, k=10)
        return top.select("key", F.round("cosine", 6).alias("cosine"))

    def ann_lsh_topk(spark, sf):
        """LSH probe over the AT-REST layout (write_lsh_signed: the
        signature is a PERSISTED column, clustered by bucket) — the
        probe is a pushed-down `bucket IN (...)` on the stored column,
        no per-row signature recomputation per query. Scores identical
        to the scan variant, so the oracle is unchanged."""
        from bleve_spark.functions.similarity import lsh_topk_at_rest

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
        top = lsh_topk_at_rest(
            spark, _ann_layout(spark, sf, "lsh12"), "embedding",
            "vec_id", qv, k=10, planes=12, probe_hamming=3,
        )
        return top.select("key", F.round("cosine", 6).alias("cosine"))

    def ann_hnsw_topk(spark, sf):
        """Per-segment HNSW graph probe over the AT-REST layout
        (functions/hnsw.py — the reference's go-faiss/HNSW surface,
        document/field_vector.go, rebuilt as Lucene-style per-segment
        graphs: one beam search per segment task + global k-merge).
        Probed at ef = corpus size, the beam covers every reachable
        node, so the result is the exact brute-force top-k and the
        plain cosine oracle applies; realistic-ef recall floors are
        pytest-gated (tests/test_hnsw.py)."""
        from bleve_spark.functions.hnsw import hnsw_topk_at_rest
        from bleve_spark.functions.similarity import (
            _query_lit, cosine_expr,
        )

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
        n = df.count()
        # graph probe finds the candidate KEYS (beam sims are float32);
        # the exact double re-rank of the 3k candidate pool makes the
        # scores oracle-grade — the same refine shape as ann_ivfpq_full
        cand = hnsw_topk_at_rest(
            spark, _ann_layout(spark, sf, "hnsw4"), "vec_id", qv,
            k=30, ef=int(n),
        ).select("vec_id")
        cos = cosine_expr(F.col("embedding"), _query_lit(qv))
        return (
            df.join(cand, "vec_id", "left_semi")
            .select(
                F.col("vec_id").alias("key"),
                F.round(cos, 6).alias("cosine"),
            )
            .orderBy(F.col("cosine").desc(), F.col("key").asc())
            .limit(10)
        )

    def ann_ivf_topk(spark, sf):
        """IVF probe over the AT-REST layout (write_ivf_partitioned:
        table PARTITIONED BY cell) — the probe is STATIC partition
        pruning; only n_probe/2^bits of the files are read. Scores
        identical to the scan variant, so the oracle is unchanged."""
        from bleve_spark.functions.similarity import ivf_topk_at_rest

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
        top = ivf_topk_at_rest(
            spark, _ann_layout(spark, sf, "ivf6"), "embedding",
            "vec_id", qv, k=10, cell_bits=6, n_probe_cells=16,
        )
        return top.select("key", F.round("cosine", 6).alias("cosine"))

    def ann_ivfpq_topk(spark, sf):
        """IVF-PQ probe (r5): partition-pruned scan of CODE BYTES
        (M=8/vector, full vectors not in the layout) → asymmetric-
        distance lookup in one Arrow stage → exact re-rank of the top
        refine·k candidates against the source vectors. The ADC
        ranking depends on the trained codebook, so this gate takes
        the weaker rows-only check; recall is floor-tested against
        planted neighbors in tests/test_ann_ivfpq.py and the
        plumbing is value-hash-checked by ann_ivfpq_full."""
        from bleve_spark.functions.similarity import ivfpq_topk_at_rest

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
        top = ivfpq_topk_at_rest(
            spark, _ann_layout(spark, sf, "ivfpq6"), df, "embedding",
            "vec_id", qv, k=10, n_probe_cells=16, refine=4,
        )
        return top.select("key", F.round("cosine", 6).alias("cosine"))

    def ann_ivfpq_full(spark, sf):
        """IVF-PQ with refine=None: every probed row re-ranked exactly
        — recall equals the flat IVF probe by construction (same
        planes seed), so the flat IVF oracle value-hash-checks the
        whole codes→candidates→source-join→re-rank pipeline."""
        from bleve_spark.functions.similarity import ivfpq_topk_at_rest

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
        top = ivfpq_topk_at_rest(
            spark, _ann_layout(spark, sf, "ivfpq6"), df, "embedding",
            "vec_id", qv, k=10, n_probe_cells=16, refine=None,
        )
        return top.select("key", F.round("cosine", 6).alias("cosine"))

    def emb_neardup_pairs(spark, sf):
        """Embedding near-dup candidates: hyperplane-LSH bucket join
        (no all-pairs), exact cosine within buckets ≥ threshold."""
        from bleve_spark.functions.dedup import embedding_cosine_pairs

        df = spark.read.parquet(f"{sf}/embeddings.parquet")
        pairs = embedding_cosine_pairs(
            df, "embedding", "vec_id", threshold=0.25, planes=8,
            seed=7, max_bucket_df=50,
        )
        return pairs.select(
            "key_a", "key_b", F.round("cosine", 6).alias("cosine")
        )

    def text_profile(spark, sf):
        from bleve_spark.functions.textstats import text_profile as tp

        df = spark.read.parquet(f"{sf}/documents.parquet")
        return tp(df, "text", "doc_id")

    def multimodal_features(spark, sf):
        from bleve_spark.functions.multimodal import (
            extract_features,
            synthesize_media_df,
        )

        df = spark.read.parquet(f"{sf}/documents.parquet")
        media = synthesize_media_df(
            spark, df.where(F.col("doc_id") < 100), "doc_id"
        )
        feats = extract_features(media)
        return feats.select(
            "key", "media_type", "content_hash", "n_bytes"
        )

    def q_fields_locations(spark, sf):
        """SearchRequest.Fields + IncludeLocations through the gate:
        stored-field retrieval plus per-term {pos,start,end} term
        locations (re-derived from the analyzer's byte offsets),
        checked against an independent SQL twin that recomputes byte
        offsets from the space-joined corpus (strlen prefix sums)."""
        from bleve_spark.search.searcher import search

        idx = _docs_index(spark, sf)
        r = search(
            idx, {"field": "text", "term": "spark"}, size=5,
            fields=["n_chars"], include_locations=True, score="none",
        )
        rows = []
        for h in r["hits"]:
            occ = h["locations"]["text"]["spark"]
            rows.append((
                int(h["id"]), int(h["fields"]["n_chars"]), len(occ),
                occ[0]["pos"], occ[0]["start"], occ[0]["end"],
            ))
        return spark.createDataFrame(
            rows,
            "doc_id long, n_chars long, n_occ long, first_pos long, "
            "first_start long, first_end long",
        )

    def q_score_none(spark, sf):
        """Score='none' (search.go:758-770): scoring skipped, hits in
        index natural order with score 0."""
        from bleve_spark.search.searcher import search

        idx = _docs_index(spark, sf)
        r = search(idx, {"field": "text", "term": "spark"}, size=20,
                   score="none")
        return spark.createDataFrame(
            [(int(h["id"]), float(h["score"])) for h in r["hits"]],
            "doc_id long, score double",
        )

    def stream_sessionize(spark, sf):
        """STATEFUL STREAMING through the correctness gate: the events
        table replayed as a file stream -> applyInPandasWithState gap
        sessionization (streaming/pipeline.py) -> memory sink, one
        availableNow pass. Emitted rows are the CLOSED sessions (the
        trailing open session per user stays in state); the oracle is
        the batch gaps-and-islands twin minus each user's last island
        — value-hash checked, proving the custom stateful operator
        agrees with its relational semantics."""
        import uuid

        from bleve_spark.streaming.pipeline import sessionize_stream

        schema = spark.read.parquet(f"{sf}/events.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
            .select(
                F.col("user_id").cast("string").alias("key"),
                # TIMESTAMP_NTZ: hop through LTZ (session tz is
                # UTC) to epoch seconds — matches DuckDB epoch(ts)
                F.col("ts").cast("timestamp_ltz").cast("long")
                .alias("t"),
            )
        )
        sessions = sessionize_stream(stream, "key", "t", 86400)
        qname = "sess_" + uuid.uuid4().hex[:8]
        query = (
            sessions.writeStream.format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        query.awaitTermination()
        return spark.table(qname).select(
            "key", "session_start", "session_end", "n_events"
        )

    def multimodal_image_stats(spark, sf):
        """REAL image feature kernels (bilinear resize to 32x32,
        channel means, luma, gradient edge density, histogram) over
        the deterministic decode seam — numeric outputs pinned by a
        frozen-values oracle (deterministic by construction)."""
        from bleve_spark.functions.multimodal import (
            extract_features,
            synthesize_media_df,
        )

        df = spark.read.parquet(f"{sf}/documents.parquet")
        media = synthesize_media_df(
            spark, df.where("doc_id % 3 = 0 AND doc_id < 30"), "doc_id"
        )
        feats = extract_features(media)
        return feats.select(
            "key",
            F.round(F.element_at("feature", 1), 6)
            .cast("double").alias("mean_r"),
            F.round(F.element_at("feature", 7), 6)
            .cast("double").alias("luma_mean"),
            F.round(F.element_at("feature", 8), 6)
            .cast("double").alias("edge_density"),
            F.round(F.element_at("feature", 9), 6)
            .cast("double").alias("hist0"),
        )

    def q_mapping_update(spark, sf):
        """Live mapping-update validation + apply
        (index_update.go:46-126 DeletedFields / compareMappings,
        bleve_spark/index/update.py): a static mapping over
        documents(text, source) is legally updated to DROP the
        `source` field; the updated index stops matching source terms
        while the text field keeps EXACT scores (per-field stats are
        untouched). Rows: ('kept', doc_id, score) for the text term
        query on the UPDATED index — the oracle computes the same
        BM25 scores from the corpus; the deleted-field search
        contributes zero rows by construction (a wrong apply would
        change the row count)."""
        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping,
        )
        from bleve_spark.index.update import apply_index_update

        def im(with_source):
            props = {"text": {"fields": [
                {"type": "text", "include_in_all": False}]}}
            if with_source:
                props["source"] = {"fields": [
                    {"type": "text", "analyzer": "keyword",
                     "include_in_all": False}]}
            return IndexMapping.from_dict({
                "index_dynamic": False, "store_dynamic": False,
                "docvalues_dynamic": False,
                "scoring_model": "bm25",
                "default_mapping": {"dynamic": False,
                                    "properties": props},
            })

        key = (spark.sparkContext.applicationId, "mapping-update", sf)
        if key not in _INDEX_CACHE:
            df = spark.read.parquet(f"{sf}/documents.parquet")
            idx = index_with_mapping(df, ["doc_id"], im(True),
                                     persist=True)
            _INDEX_CACHE[key] = apply_index_update(idx, im(False))
        upd = _INDEX_CACHE[key]
        kept = _topk(upd, {"field": "text", "term": "spark"}).select(
            F.lit("kept").alias("case"), "doc_id", "score"
        )
        deleted = _topk(
            upd, {"field": "source", "term": "src3"}
        ).select(F.lit("deleted").alias("case"), "doc_id", "score")
        return kept.unionByName(deleted)

    def q_mapping_dynamic_map(spark, sf):
        """DYNAMIC mapping over RUNTIME MapType keys — bleve indexes
        unseen JSON object keys via reflection
        (mapping/document.go:425); the Spark twin explodes the map at
        index time so the postings' `field` column carries
        "attrs.<key>" names no static plan ever saw
        (index/build.py _dynamic_map_postings). A term query against
        a runtime key scores plain BM25; the oracle recomputes it
        from the same closed-form map synthesis."""
        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping,
        )

        key = (spark.sparkContext.applicationId, "dynamic-map", sf)
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .select(
                    "doc_id", "text",
                    F.create_map(
                        F.lit("color"),
                        F.element_at(
                            F.array(F.lit("red"), F.lit("blue"),
                                    F.lit("green")),
                            (F.col("doc_id") % 3 + 1).cast("int"),
                        ),
                        F.lit("grade"),
                        F.concat(F.lit("g"),
                                 (F.col("doc_id") % 5).cast("string")),
                    ).alias("attrs"),
                )
            )
            im = IndexMapping.from_dict({
                "scoring_model": "bm25",
                "default_mapping": {
                    "dynamic": True,
                    "properties": {"text": {"fields": [
                        {"type": "text",
                         "include_in_all": False}]}},
                },
            })
            _INDEX_CACHE[key] = index_with_mapping(
                df, ["doc_id"], im, persist=True
            )
        return _topk(
            _INDEX_CACHE[key],
            {"field": "attrs.color", "term": "red"},
        )

    def q_mapping_dynamic_map_store(spark, sf):
        """Dynamic MapType AT REST (r5): the same runtime-key term
        query served from segment postings — each segment task
        explodes the map into data-driven "attrs.<key>" field streams
        with per-doc len_ columns (segments._build_one_segment),
        mirroring the reference's reflection-driven dynamic indexing
        into ordinary segment fields (mapping/document.go:425).
        Cardinality normalized to the global distinct (single logical
        build, like _docs_store) so the in-memory path's oracle
        applies verbatim."""
        import math as _math
        import tempfile

        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping_at_rest,
        )

        key = (spark.sparkContext.applicationId,
               "dynamic-map-store", sf)
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .select(
                    "doc_id", "text",
                    F.create_map(
                        F.lit("color"),
                        F.element_at(
                            F.array(F.lit("red"), F.lit("blue"),
                                    F.lit("green")),
                            (F.col("doc_id") % 3 + 1).cast("int"),
                        ),
                        F.lit("grade"),
                        F.concat(F.lit("g"),
                                 (F.col("doc_id") % 5).cast("string")),
                    ).alias("attrs"),
                )
            )
            im = IndexMapping.from_dict({
                "scoring_model": "bm25",
                "default_mapping": {
                    "dynamic": True,
                    "properties": {"text": {"fields": [
                        {"type": "text",
                         "include_in_all": False}]}},
                },
            })
            root = tempfile.mkdtemp(prefix="entry_dynmap_") + "/idx"
            idx = index_with_mapping_at_rest(
                df, ["doc_id"], im, root, n_segments=4, persist=True
            )
            for fld in ("attrs.color", "attrs.grade"):
                card = (
                    idx.dictionary.where(F.col("field") == fld)
                    .agg(F.count(F.lit(1)).alias("c"))
                    .collect()[0]["c"]
                )
                idx.stats.field_cardinality[fld] = int(card)
                idx.stats.avg_doc_len[fld] = _math.ceil(
                    card / idx.stats.doc_count
                )
            _INDEX_CACHE[key] = idx
        return _topk(
            _INDEX_CACHE[key],
            {"field": "attrs.color", "term": "red"},
        )

    def q_mapping_dynamic_range(spark, sf):
        """Numeric range + sort over DYNAMIC MapType values (r5):
        "attrs.price" has no static plan — the searcher compiles the
        range to try_element_at(attrs, 'price') and the sort joins
        the same native expression (searcher.py dynamic_map_fields
        paths). The reference treats dynamic numerics as first-class
        trie fields (mapping/document.go:425 → processFloat64).
        Deterministic synthesis: price = doc_id % 97 + 0.5."""
        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping,
        )
        from bleve_spark.search.searcher import search_df

        key = (spark.sparkContext.applicationId, "dynamic-range", sf)
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .select(
                    "doc_id", "text",
                    F.create_map(
                        F.lit("price"),
                        (F.col("doc_id") % 97).cast("double") + 0.5,
                        F.lit("qty"),
                        (F.col("doc_id") % 11).cast("double"),
                    ).alias("attrs"),
                )
            )
            im = IndexMapping.from_dict({
                "scoring_model": "bm25",
                "default_mapping": {
                    "dynamic": True,
                    "properties": {"text": {"fields": [
                        {"type": "text",
                         "include_in_all": False}]}},
                },
            })
            _INDEX_CACHE[key] = index_with_mapping(
                df, ["doc_id"], im, persist=True
            )
        out = search_df(
            _INDEX_CACHE[key],
            {"conjuncts": [
                {"field": "attrs.price", "min": 10.0, "max": 13.0,
                 "inclusive_min": True, "inclusive_max": False},
                {"field": "attrs.qty", "min": 5.0,
                 "inclusive_min": True},
            ]},
            size=20,
            sort=[{"field": "attrs.price"}],
        )
        return out.select(
            "doc_id", F.col("`attrs.price`").alias("price")
        )

    def q_mapping_numeric_array(spark, sf):
        """array<numeric> number field through the mapping layer: the
        range matches when ANY element qualifies (one numeric field
        instance per element, document.go:480-511 array walk) —
        compiled to a native EXISTS over the array column. Constant-
        scored; oracle recomputes membership from the same closed-form
        arrays."""
        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping,
        )

        key = (spark.sparkContext.applicationId, "numeric-array", sf)
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .select(
                    "doc_id", "text",
                    F.array(
                        (F.col("doc_id") % 7).cast("double"),
                        (F.col("doc_id") % 13).cast("double"),
                    ).alias("scores"),
                )
            )
            im = IndexMapping.from_dict({
                "scoring_model": "bm25",
                "default_mapping": {"properties": {
                    "text": {"fields": [
                        {"type": "text", "include_in_all": False}]},
                    "scores": {"fields": [
                        {"type": "number",
                         "include_in_all": False}]},
                }},
            })
            _INDEX_CACHE[key] = index_with_mapping(
                df, ["doc_id"], im, persist=True
            )
        from bleve_spark.search.searcher import compile_query

        return (
            compile_query(
                _INDEX_CACHE[key],
                {"field": "scores", "min": 5.0, "max": 7.0},
            )
            .select("doc_id")
            .orderBy("doc_id")
        )

    def dedup_components(spark, sf):
        """Candidate pairs → connected COMPONENTS (node, component =
        min node of its cluster) — the step between LSH pairs and
        "keep one doc per cluster" in a real dedup pipeline. Min-label
        propagation with per-round lineage cuts (LSH clusters are
        near-cliques → tiny diameter; see functions/dedup.py). Oracle:
        DuckDB recursive transitive closure over the SAME minhash
        pairs."""
        from bleve_spark.functions.dedup import (
            connected_components,
            minhash_lsh_pairs,
        )

        df = spark.read.parquet(f"{sf}/documents.parquet")
        pairs = minhash_lsh_pairs(df, "text", "doc_id",
                                  max_bucket_df=100)
        return (
            connected_components(pairs)
            .select("node", "component")
            .orderBy("node")
        )

    def q_mapping_bool_field(spark, sf):
        """bool_field query over a MAPPED scalar boolean (single T/F
        term through the boolean analyzer, field_boolean.go:130-138)
        and a boolean ARRAY (native EXISTS, one instance per element).
        Rows: (case, doc_id)."""
        from bleve_spark.index.mapping import (
            IndexMapping,
            index_with_mapping,
        )
        from bleve_spark.search.searcher import compile_query

        key = (spark.sparkContext.applicationId, "bool-field", sf)
        if key not in _INDEX_CACHE:
            df = (
                spark.read.parquet(f"{sf}/documents.parquet")
                .where("doc_id < 200")
                .select(
                    "doc_id", "text",
                    (F.col("doc_id") % 2 == 0).alias("ok"),
                    F.array(
                        F.col("doc_id") % 3 == 0,
                        F.col("doc_id") % 5 == 0,
                    ).alias("flags"),
                )
            )
            im = IndexMapping.from_dict({
                "scoring_model": "bm25",
                "default_mapping": {"properties": {
                    "text": {"fields": [
                        {"type": "text", "include_in_all": False}]},
                    "ok": {"fields": [
                        {"type": "boolean",
                         "include_in_all": False}]},
                    "flags": {"fields": [
                        {"type": "boolean",
                         "include_in_all": False}]},
                }},
            })
            _INDEX_CACHE[key] = index_with_mapping(
                df, ["doc_id"], im, persist=True
            )
        idx = _INDEX_CACHE[key]
        scalar = compile_query(idx, {"field": "ok", "bool": True}) \
            .select(F.lit("scalar_true").alias("case"), "doc_id")
        arr = compile_query(idx, {"field": "flags", "bool": True}) \
            .select(F.lit("array_any_true").alias("case"), "doc_id")
        return scalar.unionByName(arr).orderBy("case", "doc_id")

    def multimodal_png_decode(spark, sf):
        """REAL PNG decode end-to-end (functions/png.py: stdlib zlib
        inflate + per-row unfilter, all five filter types exercised
        via key%5 at encode time): payloads are genuine PNGs of a
        deterministic raster, decoded inside the Arrow batch stage,
        then the standard image kernels run on the decoded pixels.
        Oracle: frozen VALUES recomputed from the same closed-form
        raster at freeze time."""
        from bleve_spark.functions.multimodal import (
            extract_features,
            synthesize_png_media_df,
        )

        df = spark.read.parquet(f"{sf}/documents.parquet")
        media = synthesize_png_media_df(
            spark, df.where("doc_id % 3 = 0 AND doc_id < 30"), "doc_id"
        )
        feats = extract_features(media)
        return feats.select(
            "key",
            F.round(F.element_at("feature", 1), 6)
            .cast("double").alias("mean_r"),
            F.round(F.element_at("feature", 7), 6)
            .cast("double").alias("luma_mean"),
            F.round(F.element_at("feature", 8), 6)
            .cast("double").alias("edge_density"),
            F.round(F.element_at("feature", 9), 6)
            .cast("double").alias("hist0"),
        )

    q.update(
        {
            "q_term_bm25": q_term_bm25,
            "q_term_tfidf": q_term_tfidf,
            "q_match_or": q_match_or,
            "q_match_and": q_match_and,
            "q_conjunction": q_conjunction,
            "q_disjunction_min2": q_disjunction_min2,
            "q_boolean": q_boolean,
            "q_phrase": q_phrase,
            "q_phrase_fuzzy": q_phrase_fuzzy,
            "q_prefix": q_prefix,
            "q_regexp": q_regexp,
            "q_wildcard": q_wildcard,
            "q_fuzzy": q_fuzzy,
            "q_term_range": q_term_range,
            "q_prefix_dist": q_prefix_dist,
            "q_regexp_dist": q_regexp_dist,
            "q_wildcard_dist": q_wildcard_dist,
            "q_fuzzy_dist": q_fuzzy_dist,
            "q_term_range_dist": q_term_range_dist,
            "q_numeric_range": q_numeric_range,
            "q_date_range": q_date_range,
            "q_ids": q_ids,
            "q_match_all_count": q_match_all_count,
            "q_sort_by_field": q_sort_by_field,
            "q_sort_geo_distance": q_sort_geo_distance,
            "q_pagination": q_pagination,
            "q_query_string": q_query_string,
            "q_facet_lang": q_facet_lang,
            "q_facet_lang_prefix": q_facet_lang_prefix,
            "q_facet_nchars": q_facet_nchars,
            "q_facet_dates": q_facet_dates,
            "q_geo_distance": q_geo_distance,
            "q_geo_bbox": q_geo_bbox,
            "q_geo_polygon": q_geo_polygon,
            "q_geo_shape_within": q_geo_shape_within,
            "q_geo_shape_intersects": q_geo_shape_intersects,
            "q_geo_shape_ls_intersects": q_geo_shape_ls_intersects,
            "q_geo_shape_parts_within": q_geo_shape_parts_within,
            "q_geo_shape_hole_within": q_geo_shape_hole_within,
            "q_geo_shape_hole_intersects": q_geo_shape_hole_intersects,
            "q_geo_shape_contains": q_geo_shape_contains,
            "q_geo_shape_union_within": q_geo_shape_union_within,
            "q_mapping_nested_term": q_mapping_nested_term,
            "q_mapping_typed_term": q_mapping_typed_term,
            "q_mapping_array_tags": q_mapping_array_tags,
            "q_mapping_custom_ngram": q_mapping_custom_ngram,
            "q_mapping_nested_array": q_mapping_nested_array,
            "q_mapping_update": q_mapping_update,
            "q_mapping_dynamic_map": q_mapping_dynamic_map,
            "q_mapping_dynamic_map_store": q_mapping_dynamic_map_store,
            "q_mapping_dynamic_range": q_mapping_dynamic_range,
            "q_mapping_numeric_array": q_mapping_numeric_array,
            "dedup_components": dedup_components,
            "q_mapping_bool_field": q_mapping_bool_field,
            "q_knn_request": q_knn_request,
            "q_knn_request_ann": q_knn_request_ann,
            "q_mapping_geo_bbox": q_mapping_geo_bbox,
            "q_ip_range": q_ip_range,
            "q_hybrid_rrf": q_hybrid_rrf,
            "q_hybrid_filtered": q_hybrid_filtered,
            "q_multi_phrase": q_multi_phrase,
            "q_phrase_slop": q_phrase_slop,
            "q_phrase_slop3": q_phrase_slop3,
            "q_bool_field": q_bool_field,
            "q_search_after": q_search_after,
            "q_search_before": q_search_before,
            "q_rrf_fusion": q_rrf_fusion,
            "q_rsf_fusion": q_rsf_fusion,
            "q_alias_2shards": q_alias_2shards,
            "q_alias_strict": q_alias_strict,
            "q_composite_term": q_composite_term,
            "q_composite_typed_term": q_composite_typed_term,
            "q_composite_typed_store": q_composite_typed_store,
            "q_synonym_term": q_synonym_term,
            "q_synonym_thesaurus": q_synonym_thesaurus,
            "q_alias_synonym": q_alias_synonym,
            "q_term_store": q_term_store,
            "q_term_after_delete": q_term_after_delete,
            "q_blockmax_topk": q_blockmax_topk,
            "q_highlight": q_highlight,
            "q_lang_es": q_lang_es,
            "q_lang_fr": q_lang_fr,
            "q_lang_de": q_lang_de,
            "q_lang_cjk": q_lang_cjk,
            "q_lang_it": q_lang_it,
            "q_lang_pt": q_lang_pt,
            "q_lang_ru": q_lang_ru,
            "q_lang_nl": q_lang_nl,
            "q_lang_sv": q_lang_sv,
            "q_lang_da": q_lang_da,
            "q_lang_no": q_lang_no,
            "q_lang_fi": q_lang_fi,
            "q_lang_ar": q_lang_ar,
            "q_lang_fa": q_lang_fa,
            "q_lang_hi": q_lang_hi,
            "q_lang_ckb": q_lang_ckb,
            "q_lang_hr": q_lang_hr,
            "q_lang_pl": q_lang_pl,
            "q_lang_tr": q_lang_tr,
            "q_lang_hu": q_lang_hu,
            "q_lang_ro": q_lang_ro,
            "q_raw_text_match": q_raw_text_match,
            "q_raw_text_phrase": q_raw_text_phrase,
            "dedup_exact": dedup_exact,
            "dedup_ngram_jaccard": dedup_ngram_jaccard,
            "dedup_minhash_pairs": dedup_minhash_pairs,
            "dedup_simhash_pairs": dedup_simhash_pairs,
            "emb_neardup_pairs": emb_neardup_pairs,
            "ann_cosine_topk": ann_cosine_topk,
            "ann_lsh_topk": ann_lsh_topk,
            "ann_hnsw_topk": ann_hnsw_topk,
            "ann_ivf_topk": ann_ivf_topk,
            "ann_ivfpq_topk": ann_ivfpq_topk,
            "ann_ivfpq_full": ann_ivfpq_full,
            "text_profile": text_profile,
            "multimodal_features": multimodal_features,
            "multimodal_image_stats": multimodal_image_stats,
            "multimodal_png_decode": multimodal_png_decode,
            "stream_sessionize": stream_sessionize,
            "q_fields_locations": q_fields_locations,
            "q_score_none": q_score_none,
        }
    )
    # The driver's correctness gate samples the FIRST 50 entries in
    # insertion order. Rotate the registration order each round so
    # every gate accrues a driver-verified row (VERDICT r5 #1).
    # Round 7 finishes the rotation the r6 comment scheduled: the 21
    # q_lang_* gates (the last never-driver-sampled group — after this
    # round every registered gate has had a driver row at least once),
    # a sentinel block of previously-green gates covering each
    # operator family TOUCHED by this optimization round (regression
    # tripwires, per r6 ADVICE), then the oldest previously-green
    # gates that have not been re-sampled since r≤5.
    _lead = [
        # the 21 language-analyzer gates (never driver-sampled)
        "q_lang_es", "q_lang_fr", "q_lang_de", "q_lang_cjk",
        "q_lang_it", "q_lang_pt", "q_lang_ru", "q_lang_nl",
        "q_lang_sv", "q_lang_da", "q_lang_no", "q_lang_fi",
        "q_lang_ar", "q_lang_fa", "q_lang_hi", "q_lang_ckb",
        "q_lang_hr", "q_lang_tr", "q_lang_hu", "q_lang_ro",
        "q_lang_pl",
        # sentinels: one per operator family this round optimized
        "q_term_bm25", "q_match_or", "q_boolean", "q_query_string",
        "q_phrase", "q_multi_phrase", "q_prefix_dist",
        "dedup_minhash_pairs", "dedup_simhash_pairs", "text_profile",
        "q_hybrid_filtered", "q_blockmax_topk", "q_term_store",
        "q_geo_shape_intersects", "emb_neardup_pairs",
        # oldest previously-green gates not re-sampled since r≤5
        "q_term_tfidf", "q_conjunction", "q_disjunction_min2",
        "q_fuzzy", "q_prefix", "q_regexp", "q_wildcard",
        "q_term_range", "q_numeric_range", "q_date_range", "q_ids",
        "q_sort_by_field", "q_sort_geo_distance", "q_pagination",
    ]
    ordered = {k: q[k] for k in _lead if k in q}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    out = {
        "q_term_bm25": _sql_single_term("spark"),
        "q_term_tfidf": _sql_tfidf_term("data"),
        "q_match_or": _sql_multi(_values(["spark", "join"]), min_req=1),
        "q_match_and": _sql_multi(_values(["spark", "join"]), conj=True),
        "q_conjunction": _sql_multi(_values(["query", "data"]), conj=True),
        "q_disjunction_min2": _sql_multi(
            _values(["spark", "join", "filter"]), min_req=2
        ),
        "q_boolean": _SQL_BOOLEAN.format(exp=_values(["spark", "join"])),
        "q_phrase": _SQL_PHRASE.format(
            exp=_values(["table", "hash"]), t1="table", t2="hash"
        ),
        "q_phrase_fuzzy": _sql_phrase_fuzzy("tabl", "hash", 1),
        "q_prefix": _sql_multi(_expansion("d.term LIKE 'sc%'")),
        "q_regexp": _sql_multi(
            _expansion("regexp_full_match(d.term, 'sc.n')")
        ),
        "q_wildcard": _sql_multi(
            _expansion("regexp_full_match(d.term, 's.an')")
        ),
        "q_fuzzy": _sql_multi(
            _expansion(
                "levenshtein(d.term, 'spak') <= 1",
                mult="1.0 / (levenshtein(d.term, 'spak') + 1.0)",
            )
        ),
        "q_term_range": _sql_multi(
            _expansion("d.term >= 'scan' AND d.term < 'sort'")
        ),
        # distributed-path twins share the cached-path oracles verbatim
        "q_prefix_dist": _sql_multi(_expansion("d.term LIKE 'sc%'")),
        "q_regexp_dist": _sql_multi(
            _expansion("regexp_full_match(d.term, 'sc.n')")
        ),
        "q_wildcard_dist": _sql_multi(
            _expansion("regexp_full_match(d.term, 's.an')")
        ),
        "q_fuzzy_dist": _sql_multi(
            _expansion(
                "levenshtein(d.term, 'spak') <= 1",
                mult="1.0 / (levenshtein(d.term, 'spak') + 1.0)",
            )
        ),
        "q_term_range_dist": _sql_multi(
            _expansion("d.term >= 'scan' AND d.term < 'sort'")
        ),
        "q_numeric_range": (
            "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents "
            "WHERE n_chars >= 200 AND n_chars < 400"
        ),
        "q_date_range": (
            "SELECT event_id, CAST(1.0 AS DOUBLE) AS score FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' "
            "AND ts < TIMESTAMP '2024-01-15 00:00:00'"
        ),
        "q_ids": (
            "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents "
            "WHERE doc_id IN (3, 5, 7)"
        ),
        "q_match_all_count": "SELECT count(*) AS total FROM documents",
        "q_sort_by_field": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "q_sort_geo_distance": (
            "SELECT doc_id, round("
            + _hav_km_sql_ind("glat", "glon", 10.0, 20.0)
            + ", 6) AS dist_km FROM ("
            "SELECT doc_id, "
            "CAST((doc_id * 7) % 181 - 90 AS DOUBLE) AS glat, "
            "CAST((doc_id * 13) % 361 - 180 AS DOUBLE) AS glon "
            "FROM documents) ORDER BY "
            + _hav_km_sql_ind("glat", "glon", 10.0, 20.0)
            + " ASC, doc_id ASC LIMIT 10"
        ),
        "q_pagination": _sql_single_term("spark", k=5) + " OFFSET 5",
        "q_query_string": _SQL_QSTRING,
        "q_facet_lang": (
            "SELECT lang AS term, count(*) AS count FROM documents "
            "WHERE lang IS NOT NULL GROUP BY lang "
            "ORDER BY count DESC, term LIMIT 10"
        ),
        "q_facet_lang_prefix": (
            "SELECT lang AS term, count(*) AS count FROM documents "
            "WHERE lang IS NOT NULL AND lang LIKE 'e%' GROUP BY lang "
            "ORDER BY count DESC, term LIMIT 10"
        ),
        "q_facet_nchars": (
            "SELECT b.bucket, count(d.doc_id) AS count FROM "
            "(VALUES ('small'), ('mid'), ('large')) b(bucket) "
            "LEFT JOIN documents d ON "
            "(b.bucket='small' AND d.n_chars < 200) OR "
            "(b.bucket='mid' AND d.n_chars >= 200 AND d.n_chars < 400) OR "
            "(b.bucket='large' AND d.n_chars >= 400) "
            "GROUP BY b.bucket"
        ),
        "q_hybrid_rrf": _sql_hybrid_rrf(),
        "q_hybrid_filtered": _sql_hybrid_rrf(
            knn_eligible=(
                " WHERE vec_id IN "
                "(SELECT doc_id FROM documents WHERE lang = 'en')"
            )
        ),
        # 10.32.0.0/12 → second octet in [32, 47]
        "q_ip_range": (
            "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents "
            "WHERE (doc_id % 256) >= 32 AND (doc_id % 256) <= 47"
        ),
        "q_geo_distance": _sql_geo_distance(),
        "q_geo_polygon": _sql_geo_polygon(),
        "q_geo_shape_within": _sql_geo_shape("within"),
        "q_geo_shape_intersects": _sql_geo_shape("intersects"),
        "q_geo_shape_ls_intersects": _sql_geo_shape_ls_intersects(),
        "q_geo_shape_parts_within": _sql_geo_shape("within"),
        "q_geo_shape_hole_within": _sql_geo_shape_hole("within"),
        "q_geo_shape_hole_intersects": _sql_geo_shape_hole(
            "intersects"
        ),
        "q_geo_shape_contains": _sql_geo_shape_contains_point(-35.5, -37.75),
        "q_geo_shape_union_within": _sql_geo_shape_union_within(),
        "q_mapping_nested_term": _sql_single_term("spark"),
        "q_mapping_typed_term": _sql_mapping_typed(),
        "q_mapping_array_tags": _sql_mapping_tags(),
        "q_mapping_custom_ngram": _sql_mapping_custom_ngram(),
        "q_mapping_nested_array": _NESTED_ORACLE,
        "q_mapping_bool_field": """
SELECT 'array_any_true' AS "case", doc_id FROM documents
WHERE doc_id < 200 AND (doc_id % 3 = 0 OR doc_id % 5 = 0)
UNION ALL
SELECT 'scalar_true', doc_id FROM documents
WHERE doc_id < 200 AND doc_id % 2 = 0
ORDER BY 1, 2""",
        "dedup_components": (
            "WITH RECURSIVE p AS (" + _minhash_pairs_sql() + "), "
            """e(src, dst) AS (
  SELECT key_a, key_b FROM p UNION SELECT key_b, key_a FROM p
),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src
  WHERE e.dst <> r.a
)
SELECT n.node, least(n.node, coalesce(min(r.b), n.node)) AS component
FROM (SELECT DISTINCT src AS node FROM e) n
LEFT JOIN reach r ON r.a = n.node
GROUP BY n.node ORDER BY n.node"""
        ),
        "q_mapping_numeric_array": """
SELECT doc_id FROM documents
WHERE (doc_id % 7 BETWEEN 5 AND 6) OR (doc_id % 13 BETWEEN 5 AND 6)
ORDER BY doc_id""",
        "q_mapping_dynamic_map": """
WITH docs AS (SELECT doc_id FROM documents),
ndocs AS (SELECT count(*) AS n FROM docs),
post AS (SELECT doc_id, 1 AS tf, CAST(1.0 AS DOUBLE) AS norm
         FROM docs WHERE doc_id % 3 = 0),
avgl AS (SELECT ceil(CAST(3 AS DOUBLE) / (SELECT n FROM ndocs)) AS v),
q AS (SELECT ln(1 + ((SELECT n FROM ndocs) - df + 0.5) / (df + 0.5))
      AS idf FROM (SELECT count(*) AS df FROM post))
SELECT p.doc_id,
       round((q.idf * (sqrt(p.tf)*1.2) / (sqrt(p.tf) + 1.2*(0.25 +
             (0.75 * (1.0/(p.norm*p.norm))) / (SELECT v FROM avgl)))),
             6) AS score
FROM post p CROSS JOIN q
ORDER BY score DESC, p.doc_id LIMIT 20""",
        # the at-rest twin normalizes cardinality to the global
        # distinct, so the SAME closed-form BM25 oracle applies
        "q_mapping_dynamic_map_store": """
WITH docs AS (SELECT doc_id FROM documents),
ndocs AS (SELECT count(*) AS n FROM docs),
post AS (SELECT doc_id, 1 AS tf, CAST(1.0 AS DOUBLE) AS norm
         FROM docs WHERE doc_id % 3 = 0),
avgl AS (SELECT ceil(CAST(3 AS DOUBLE) / (SELECT n FROM ndocs)) AS v),
q AS (SELECT ln(1 + ((SELECT n FROM ndocs) - df + 0.5) / (df + 0.5))
      AS idf FROM (SELECT count(*) AS df FROM post))
SELECT p.doc_id,
       round((q.idf * (sqrt(p.tf)*1.2) / (sqrt(p.tf) + 1.2*(0.25 +
             (0.75 * (1.0/(p.norm*p.norm))) / (SELECT v FROM avgl)))),
             6) AS score
FROM post p CROSS JOIN q
ORDER BY score DESC, p.doc_id LIMIT 20""",
        # dynamic-map numeric range + sort: price/qty are closed-form
        # functions of doc_id, so the oracle recomputes them directly
        "q_mapping_dynamic_range": """
SELECT doc_id, CAST(doc_id % 97 + 0.5 AS DOUBLE) AS price
FROM documents
WHERE (doc_id % 97 + 0.5) >= 10.0 AND (doc_id % 97 + 0.5) < 13.0
  AND (doc_id % 11) >= 5
ORDER BY price, doc_id LIMIT 20""",
        "q_mapping_update": (
            "SELECT 'kept' AS \"case\", doc_id, score FROM ("
            + _sql_single_term("spark") + ")"
        ),
        "q_knn_request": _sql_knn_request(),
        # the attached-ANN path must reproduce brute force exactly:
        # same oracle
        "q_knn_request_ann": _sql_knn_request(),
        # same deterministic synthetic coordinates as q_geo_bbox, but
        # reached through the mapping layer's geopoint flattening
        "q_mapping_geo_bbox": (
            "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM ("
            "SELECT doc_id, "
            "CAST((doc_id * 7) % 181 - 90 AS DOUBLE) AS glat, "
            "CAST((doc_id * 13) % 361 - 180 AS DOUBLE) AS glon "
            "FROM documents) WHERE glat >= -10.0 AND glat <= 40.0 "
            "AND glon >= -30.0 AND glon <= 50.0"
        ),
        "q_geo_bbox": (
            "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM ("
            "SELECT doc_id, "
            "CAST((doc_id * 7) % 181 - 90 AS DOUBLE) AS glat, "
            "CAST((doc_id * 13) % 361 - 180 AS DOUBLE) AS glon "
            "FROM documents) WHERE glat >= -10.0 AND glat <= 40.0 "
            "AND glon >= -30.0 AND glon <= 50.0"
        ),
        "q_facet_dates": (
            "SELECT b.bucket, count(e.event_id) AS count FROM "
            "(VALUES ('early'), ('mid'), ('late')) b(bucket) "
            "LEFT JOIN events e ON "
            "(b.bucket='early' AND e.ts < TIMESTAMP '2024-01-10') OR "
            "(b.bucket='mid' AND e.ts >= TIMESTAMP '2024-01-10' "
            " AND e.ts < TIMESTAMP '2024-01-20') OR "
            "(b.bucket='late' AND e.ts >= TIMESTAMP '2024-01-20') "
            "GROUP BY b.bucket"
        ),
        "q_multi_phrase": _SQL_MULTI_PHRASE,
        "q_phrase_slop": _SQL_PHRASE_SLOP,
        "q_phrase_slop3": _SQL_PHRASE_SLOP3,
        "q_bool_field": _SQL_BOOL_FIELD,
        "q_search_after": _SQL_SEARCH_AFTER,
        "q_search_before": _SQL_SEARCH_BEFORE,
        "q_rrf_fusion": _SQL_RRF,
        "q_rsf_fusion": _SQL_RSF,
        "q_alias_2shards": _sql_single_term(
            "spark", prelude=_PRELUDE_ALIAS2
        ),
        # strict mode: per-shard df (doc_id % 2), merged ndocs/avgl
        "q_alias_strict": f"""{_PRELUDE_ALIAS2},
sharddf AS (
  SELECT doc_id % 2 AS shard, count(*) AS df
  FROM post WHERE term = 'spark' GROUP BY doc_id % 2)
SELECT p.doc_id,
       round(ln(1 + ((SELECT n FROM ndocs) - s.df + 0.5)
                    / (s.df + 0.5))
             * (sqrt(p.tf)*1.2)
             / (sqrt(p.tf) + 1.2*(0.25 +
                (0.75 * (1.0/(p.norm*p.norm))) / (SELECT v FROM avgl))),
             6) AS score
FROM post p JOIN sharddf s ON s.shard = p.doc_id % 2
WHERE p.term = 'spark'
ORDER BY score DESC, p.doc_id LIMIT 20""",
        "q_composite_term": _sql_single_term(
            "spark", prelude=_PRELUDE_COMPOSITE
        ),
        "q_composite_typed_term": _sql_single_term(
            "spark", prelude=_PRELUDE_COMPOSITE_TYPED
        ),
        "q_composite_typed_store": _sql_single_term(
            "spark", prelude=_PRELUDE_COMPOSITE_TYPED
        ),
        # synonym expansion = disjunction(term@1, synonym@1/2) with coord
        # (search_term.go:154-196)
        "q_synonym_term": _sql_multi(
            _values(["spark", "scan"], mults=[1.0, 0.5]), min_req=1
        ),
        # indexed-thesaurus expansion scores identically to the
        # query-time map (same disjunction), incl. via alias pre-search
        "q_synonym_thesaurus": _sql_multi(
            _values(["spark", "scan"], mults=[1.0, 0.5]), min_req=1
        ),
        "q_alias_synonym": _sql_multi(
            _values(["spark", "scan"], mults=[1.0, 0.5]), min_req=1
        ),
        # at-rest store path: same scores as the in-memory term query
        "q_term_store": _sql_single_term("spark"),
        "q_term_after_delete": _sql_single_term(
            "spark", prelude=_PRELUDE_LIVE100
        ),
        # block-max pruning is score-preserving: same oracle as the
        # plain match disjunction
        "q_blockmax_topk": _sql_multi(
            _values(["spark", "join"]), min_req=1
        ),
        # q_highlight: fragment extraction (200-byte windows, best-
        # fragment scoring) is not ANSI-SQL-expressible — rows-only.
        "q_lang_es": _sql_lang_match("es"),
        "q_lang_fr": _sql_lang_match("fr"),
        "q_lang_de": _sql_lang_match("de"),
        "q_lang_cjk": _sql_lang_match("cjk"),
        "q_lang_it": _sql_lang_match("it"),
        "q_lang_pt": _sql_lang_match("pt"),
        "q_lang_ru": _sql_lang_match("ru"),
        "q_lang_nl": _sql_lang_match("nl"),
        "q_lang_sv": _sql_lang_match("sv"),
        "q_lang_da": _sql_lang_match("da"),
        "q_lang_no": _sql_lang_match("no"),
        "q_lang_fi": _sql_lang_match("fi"),
        "q_lang_ar": _sql_lang_match("ar"),
        "q_lang_fa": _sql_lang_match("fa"),
        "q_lang_hi": _sql_lang_match("hi"),
        "q_lang_ckb": _sql_lang_match("ckb"),
        "q_lang_hr": _sql_lang_match("hr"),
        "q_lang_pl": _sql_lang_match("pl"),
        "q_lang_tr": _sql_lang_match("tr"),
        "q_lang_hu": _sql_lang_match("hu"),
        "q_lang_ro": _sql_lang_match("ro"),
        "q_raw_text_match": _sql_raw_match(),
        "q_raw_text_phrase": _sql_raw_phrase(),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, "
            "count(*) AS dup_count FROM documents GROUP BY md5(text)"
        ),
        "dedup_ngram_jaccard": _SQL_NGRAM_JACCARD,
        "dedup_minhash_pairs": _minhash_pairs_sql(),
        "dedup_simhash_pairs": _simhash_pairs_sql(),
        "emb_neardup_pairs": _emb_neardup_sql(),
        "ann_cosine_topk": _SQL_COSINE_TOPK,
        "ann_lsh_topk": _ann_pruned_topk_sql("lsh"),
        "ann_ivf_topk": _ann_pruned_topk_sql("ivf"),
        # hnsw probed at ef=n is the exact top-k -> plain cosine oracle
        "ann_hnsw_topk": _SQL_COSINE_TOPK,
        # ann_ivfpq_topk: deliberately NO oracle — the ADC ranking
        # depends on the trained codebook (rows-only check; recall
        # floor in pytest). The full-refine twin IS oracle-checked:
        "ann_ivfpq_full": _ann_pruned_topk_sql("ivf"),
        "text_profile": _SQL_TEXT_PROFILE,
        # multimodal payload synthesis is hex-string based precisely so
        # the content hash has a pure-SQL twin; the decode KERNELS stay
        # stubbed (no imaging libs) but the content-addressed plumbing
        # is hash-verified end-to-end
        "q_fields_locations": """
WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
           FROM documents),
t AS (SELECT doc_id, n_chars, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS i FROM d),
s AS (SELECT doc_id, n_chars, tok, i,
        COALESCE(sum(strlen(tok) + 1) OVER (
          PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        AS st
      FROM t),
m AS (SELECT doc_id, n_chars, i AS pos, st, st + strlen(tok) AS fin
      FROM s WHERE lower(tok) = 'spark'),
r AS (SELECT doc_id, n_chars, pos, st, fin,
        row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
        count(*) OVER (PARTITION BY doc_id) AS n_occ
      FROM m)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_occ AS BIGINT) AS n_occ, CAST(pos AS BIGINT) AS first_pos,
       CAST(st AS BIGINT) AS first_start, CAST(fin AS BIGINT) AS first_end
FROM r WHERE rn = 1 ORDER BY doc_id LIMIT 5""",
        "q_score_none": """
SELECT doc_id, CAST(0.0 AS DOUBLE) AS score
FROM documents
WHERE list_contains(string_split(text, ' '), 'spark')
ORDER BY doc_id LIMIT 20""",
        "stream_sessionize": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
), o AS (
  SELECT user_id, t,
    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
         > 86400 THEN 1 ELSE 0 END AS brk
  FROM e
), i AS (
  SELECT user_id, t,
    sum(brk) OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS island
  FROM o
), s AS (
  SELECT user_id, island, min(t) AS session_start,
         max(t) AS session_end, count(*) AS n_events
  FROM i GROUP BY user_id, island
), m AS (
  SELECT user_id, max(island) AS last_island FROM s GROUP BY user_id
)
SELECT CAST(s.user_id AS VARCHAR) AS key, session_start, session_end,
       n_events
FROM s JOIN m USING (user_id) WHERE island < last_island""",
        "multimodal_png_decode": """SELECT key, CAST(mean_r AS DOUBLE) AS mean_r, CAST(luma_mean AS DOUBLE) AS luma_mean, CAST(edge_density AS DOUBLE) AS edge_density, CAST(hist0 AS DOUBLE) AS hist0 FROM (VALUES
  (0, 0.313726, 0.336098, 0.015543, 0.077148),
  (3, 0.443137, 0.46551, 0.015543, 0.0),
  (6, 0.572549, 0.594922, 0.015543, 0.0),
  (9, 0.696569, 0.70746, 0.023083, 0.003906),
  (12, 0.6875, 0.666315, 0.04196, 0.117188),
  (15, 0.547794, 0.521246, 0.043083, 0.210938),
  (18, 0.4, 0.375035, 0.043186, 0.212891),
  (21, 0.286275, 0.28428, 0.028257, 0.18457),
  (24, 0.345098, 0.367471, 0.015543, 0.042969),
  (27, 0.47451, 0.496882, 0.015543, 0.0)
) AS v(key, mean_r, luma_mean, edge_density, hist0)""",
        "multimodal_image_stats": """SELECT key, CAST(mean_r AS DOUBLE) AS mean_r, CAST(luma_mean AS DOUBLE) AS luma_mean, CAST(edge_density AS DOUBLE) AS edge_density, CAST(hist0 AS DOUBLE) AS hist0 FROM (VALUES
  (0, 0.521569, 0.521569, 0.047899, 0.0),
  (3, 0.471201, 0.471201, 0.09173, 0.0),
  (6, 0.49951, 0.47237, 0.013983, 0.0),
  (9, 0.397549, 0.397549, 0.133299, 0.03125),
  (12, 0.544608, 0.544608, 0.049309, 0.0),
  (15, 0.39951, 0.39951, 0.123251, 0.0625),
  (18, 0.459559, 0.455454, 0.127742, 0.0),
  (21, 0.483701, 0.483701, 0.129386, 0.03125),
  (24, 0.560172, 0.560172, 0.060127, 0.0),
  (27, 0.565686, 0.565686, 0.114075, 0.0)) AS v(key, mean_r, luma_mean, edge_density, hist0)""",
        "multimodal_features": (
            "SELECT doc_id AS key, "
            "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
            "ELSE 'video' END AS media_type, "
            "sha256(repeat(sha256(CAST(doc_id AS VARCHAR)), 8)) "
            "AS content_hash, "
            "512 AS n_bytes "
            "FROM documents WHERE doc_id < 100"
        ),
        # q_highlight: fragment extraction isn't ANSI-SQL-expressible,
        # so the oracle is FROZEN golden fragments for the sf0.01
        # corpus (the gate's fixed sf), independently verified:
        # each fragment is a true substring of its doc's text, exactly
        # the query terms are <mark>ed, and no in-fragment occurrence
        # of a query term is left unmarked. A highlighter regression
        # hash-mismatches because the goldens don't move with the code.
        "q_highlight": (
            "SELECT * FROM (VALUES "
            "('408', 'query query <mark>spark</mark> part sort slow "
            "batch line <mark>data</mark> line <mark>spark</mark> "
            "group the batch fast filter'), "
            "('313', 'filter scan part a <mark>data</mark> sort a "
            "value value part a batch row merge batch "
            "<mark>spark</mark> the value'), "
            "('362', 'slow <mark>data</mark> group query "
            "<mark>spark</mark> big join vector merge merge sort "
            "table group the sort'), "
            "('475', 'line <mark>spark</mark> small key merge sort "
            "part query slow group <mark>data</mark> scan agg the "
            "value'), "
            "('338', '<mark>data</mark> join query "
            "<mark>spark</mark> value row table hash customer group "
            "a row scan order the value a join')"
            ") AS t(doc_id, fragment)"
        ),
    }
    return out
