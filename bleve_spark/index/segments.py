"""At-rest segment store: immutable, sorted, delta+varint postings.

Mirrors the reference's offline Builder
(/root/reference/index/scorch/builder.go:28-29,116-167): stage 1 builds
partition-local immutable segments (analyze → sort → encode), stage 2
(:mod:`bleve_spark.index.merge`) runs ≤10-way merge rounds. Each
segment carries a manifest with lineage + postings/sec metrics
(persister epochs analogue, /root/reference/index/scorch/persister.go:630)
and builds are resumable: a completed segment's manifest short-circuits
its rebuild.

Layout under ``<root>/``:

* ``postings/seg=<id>/part.parquet`` — one row per (field, term, chunk):
  ``n_docs, doc_blob, tf_blob, pos_blob, max_tf, max_norm, min_doc,
  max_doc`` — blobs are delta+varint (doc-num gaps, tfs, per-doc
  position deltas); ``max_tf``/``max_norm`` are the block-max metadata
  driving WAND-style pruning (bleve's only analogue is the collector
  floor, /root/reference/search/collector/topn.go:584-604 — ours is a
  real pre-join block skip);
* ``docs/seg=<id>/part.parquet`` — doc table: local doc_num → key cols
  + per-field token counts (norms derive as float32(1/√len));
* ``manifest/seg=<id>.json`` — doc_count, postings, unique terms,
  bytes, build seconds, postings/sec.

Doc numbering: ``doc_num = segment_id·2^40 + local`` — stable, unique,
and independent of cluster parallelism (segment assignment hashes the
key columns; within a segment docs sort by key). Query-time tie-breaks
always use the key columns, so doc-num layout is internal only.

Why parquet for blobs: term and field are plain columns, so a term
query's chunk fetch is parquet predicate pushdown + column pruning —
the dictionary-FST role is played by the parquet/row-group index, and
only matching rows' blobs are ever decoded.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from bleve_spark.analysis.analyzers import get_analyzer
from bleve_spark.index.build import IndexedTable, IndexStats
from bleve_spark.index.varint import (
    decode_positions,
    delta_decode_sorted,
    delta_encode_sorted,
    encode_positions,
    varint_decode,
    varint_encode,
)

SEG_SHIFT = 40  # doc_num = seg << 40 | local
DEFAULT_CHUNK_DOCS = 1024


def _posting_schema() -> str:
    return (
        "segment_id int, field string, term string, chunk_id int, "
        "n_docs int, doc_blob binary, tf_blob binary, pos_blob binary, "
        "max_tf int, max_norm float, min_doc long, max_doc long"
    )


def _stats_schema() -> str:
    return (
        "segment_id int, doc_count long, postings long, unique_terms long, "
        "bytes long, seconds double, postings_per_sec double, "
        "resumed boolean"
    )


def _seg_paths(root: str, seg: int):
    return (
        os.path.join(root, "postings", f"seg={seg}"),
        os.path.join(root, "docs", f"seg={seg}"),
        os.path.join(root, "manifest", f"seg={seg}.json"),
    )


def _build_one_segment(
    seg: int,
    pdf: pd.DataFrame,
    key_cols: list[str],
    fields: dict[str, str],
    root: str,
    chunk_docs: int,
) -> dict:
    """Analyze + encode one segment (runs inside an executor task)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    pdf = pdf.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    base = np.int64(seg) << np.int64(SEG_SHIFT)

    doc_tbl = {"doc_num": (base + np.arange(n, dtype=np.int64))}
    for k in key_cols:
        doc_tbl[k] = pdf[k].values

    rows = {
        "segment_id": [], "field": [], "term": [], "chunk_id": [],
        "n_docs": [], "doc_blob": [], "tf_blob": [], "pos_blob": [],
        "max_tf": [], "max_norm": [], "min_doc": [], "max_doc": [],
    }
    n_postings = 0
    uniq_terms = 0

    for fname, aname in fields.items():
        analyzer = get_analyzer(aname)
        analyze = analyzer.analyze_terms
        flens = np.zeros(n, dtype=np.int64)
        # postings accumulation: term -> (doc list, tf list, poslists)
        acc: dict[str, list] = {}
        col = pdf[fname].values
        for i in range(n):
            text = col[i]
            if text is None:
                continue
            pairs = analyze(str(text))
            if not pairs:
                continue
            flens[i] = len(pairs)
            per: dict[str, list[int]] = {}
            for t, p in pairs:
                per.setdefault(t, []).append(p)
            dn = int(base) + i
            for t, ps in per.items():
                e = acc.get(t)
                if e is None:
                    acc[t] = e = ([], [], [])
                e[0].append(dn)
                e[1].append(len(ps))
                e[2].append(np.asarray(ps, dtype=np.uint64))

        doc_tbl[f"len_{fname}"] = flens
        uniq_terms += len(acc)

        norms = np.where(
            flens > 0, 1.0 / np.sqrt(np.maximum(flens, 1)), 0.0
        ).astype(np.float32)

        for term in sorted(acc):
            docs, tfs, plists = acc[term]
            n_postings += len(docs)
            docs_a = np.asarray(docs, dtype=np.uint64)
            tfs_a = np.asarray(tfs, dtype=np.uint64)
            for c0 in range(0, len(docs), chunk_docs):
                c1 = min(c0 + chunk_docs, len(docs))
                dslice = docs_a[c0:c1]
                tslice = tfs_a[c0:c1]
                pslice = plists[c0:c1]
                local = (dslice - np.uint64(int(base))).astype(np.int64)
                rows["segment_id"].append(seg)
                rows["field"].append(fname)
                rows["term"].append(term)
                rows["chunk_id"].append(c0 // chunk_docs)
                rows["n_docs"].append(c1 - c0)
                rows["doc_blob"].append(delta_encode_sorted(dslice))
                rows["tf_blob"].append(varint_encode(tslice))
                rows["pos_blob"].append(encode_positions(pslice))
                rows["max_tf"].append(int(tslice.max()))
                rows["max_norm"].append(float(norms[local].max()))
                rows["min_doc"].append(int(dslice[0]))
                rows["max_doc"].append(int(dslice[-1]))

    pdir, ddir, mpath = _seg_paths(root, seg)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(os.path.dirname(mpath), exist_ok=True)

    ptbl = pa.table(rows)
    pq.write_table(ptbl, os.path.join(pdir, "part.parquet"))
    dtbl = pa.table(doc_tbl)
    pq.write_table(dtbl, os.path.join(ddir, "part.parquet"))

    secs = time.time() - t0
    nbytes = int(
        sum(len(b) for b in rows["doc_blob"])
        + sum(len(b) for b in rows["tf_blob"])
        + sum(len(b) for b in rows["pos_blob"])
    )
    manifest = {
        "segment_id": seg,
        "doc_count": int(n),
        "postings": int(n_postings),
        "unique_terms": int(uniq_terms),
        "bytes": nbytes,
        "seconds": secs,
        "postings_per_sec": (n_postings / secs) if secs > 0 else 0.0,
        "fields": list(fields),
        "key_cols": key_cols,
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)  # atomic commit — the introducer's swap
    return manifest


def build_segments(
    df: DataFrame,
    key_cols: list[str],
    fields: dict[str, str],
    root: str,
    n_segments: int = 8,
    chunk_docs: int = DEFAULT_CHUNK_DOCS,
    resume: bool = True,
    segment_id_offset: int = 0,
) -> list[dict]:
    """Distributed segment build; returns per-segment stats.

    Segment assignment hashes the key columns (deterministic across
    partitionings); each task analyzes + encodes its segments locally
    — the reference's analyze-worker → segment path
    (/root/reference/index/scorch/scorch.go:538-591) with Spark tasks
    as the workers. With ``resume=True`` completed segments (manifest
    present) are skipped and reported with ``resumed=true``.
    """
    os.makedirs(root, exist_ok=True)
    done: set[int] = set()
    if resume:
        mdir = os.path.join(root, "manifest")
        if os.path.isdir(mdir):
            for fn in os.listdir(mdir):
                if fn.startswith("seg=") and fn.endswith(".json"):
                    done.add(int(fn[4:-5]))

    key_concat = F.concat_ws(
        "\x00", *[F.col(k).cast("string") for k in key_cols]
    )
    with_seg = df.withColumn(
        "_seg",
        (
            F.pmod(F.xxhash64(key_concat), F.lit(n_segments))
            + F.lit(segment_id_offset)
        ).cast("int"),
    )
    if done:
        with_seg = with_seg.where(~F.col("_seg").isin(sorted(done)))

    kc = list(key_cols)
    fd = dict(fields)

    def build(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        for seg, grp in pdf.groupby("_seg"):
            m = _build_one_segment(
                int(seg), grp.drop(columns=["_seg"]), kc, fd, root,
                chunk_docs,
            )
            yield pd.DataFrame(
                [{
                    "segment_id": m["segment_id"],
                    "doc_count": m["doc_count"],
                    "postings": m["postings"],
                    "unique_terms": m["unique_terms"],
                    "bytes": m["bytes"],
                    "seconds": m["seconds"],
                    "postings_per_sec": m["postings_per_sec"],
                    "resumed": False,
                }]
            )

    stats = (
        with_seg.repartition(n_segments, "_seg")
        .mapInPandas(build, schema=_stats_schema())
        .collect()
    )
    out = [r.asDict() for r in stats]
    for seg in sorted(done):
        _, _, mpath = _seg_paths(root, seg)
        with open(mpath) as f:
            m = json.load(f)
        out.append({**{k: m[k] for k in (
            "segment_id", "doc_count", "postings", "unique_terms",
            "bytes", "seconds", "postings_per_sec")}, "resumed": True})
    out.sort(key=lambda m: m["segment_id"])
    return out


DECODED_SCHEMA_SUFFIX = (
    "field string, term string, doc_num long, tf int, "
    "positions array<int>"
)


class SegmentStore:
    """Read side of the at-rest index."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- raw chunk rows (blobs stay unopened — column pruning) --------
    def chunk_rows(self, with_blobs: bool = False) -> DataFrame:
        df = self.spark.read.option("basePath", os.path.join(
            self.root, "postings")).parquet(
            os.path.join(self.root, "postings", "seg=*")
        )
        if "segment_id" not in df.columns and "seg" in df.columns:
            # merged levels partition by seg= without a data column
            df = df.withColumn("segment_id", F.col("seg").cast("int"))
        if "seg" in df.columns:
            df = df.drop("seg")
        if not with_blobs:
            df = df.select(
                "segment_id", "field", "term", "chunk_id", "n_docs",
                "max_tf", "max_norm", "min_doc", "max_doc",
            )
        return df

    def doc_table(self) -> DataFrame:
        df = self.spark.read.option("basePath", os.path.join(
            self.root, "docs")).parquet(
            os.path.join(self.root, "docs", "seg=*")
        )
        if "seg" in df.columns:
            df = df.drop("seg")
        return df

    def manifests(self) -> list[dict]:
        mdir = os.path.join(self.root, "manifest")
        out = []
        for fn in sorted(os.listdir(mdir)):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    out.append(json.load(f))
        return out

    # -- decode -------------------------------------------------------
    def decode(self, pred=None) -> DataFrame:
        """Chunk rows (optionally filtered by a Column predicate —
        pushed into the parquet scan) → exploded postings:
        (field, term, doc_num, tf, positions)."""
        rows = self.chunk_rows(with_blobs=True)
        if pred is not None:
            rows = rows.where(pred)

        def dec(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                out = {
                    "field": [], "term": [], "doc_num": [], "tf": [],
                    "positions": [],
                }
                for r in pdf.itertuples():
                    docs = delta_decode_sorted(r.doc_blob)
                    tfs = varint_decode(r.tf_blob)
                    plists = decode_positions(r.pos_blob, len(docs))
                    nd = len(docs)
                    out["field"].extend([r.field] * nd)
                    out["term"].extend([r.term] * nd)
                    out["doc_num"].extend(docs.astype(np.int64).tolist())
                    out["tf"].extend(tfs.astype(np.int64).tolist())
                    out["positions"].extend(
                        [p.astype(np.int64).tolist() for p in plists]
                    )
                yield pd.DataFrame(out)

        return rows.mapInPandas(dec, schema=DECODED_SCHEMA_SUFFIX)

    def postings_df(self, key_cols: list[str],
                    fields: list[str], pred=None) -> DataFrame:
        """Full postings relation (field, term, keys..., tf, positions,
        norm) — the same shape index_table() produces, reconstructed
        from the compressed store."""
        decoded = self.decode(pred)
        docs = self.doc_table()
        # norm per field from stored token counts
        norm_map = F.create_map(
            *[x for fname in fields for x in (
                F.lit(fname),
                F.when(
                    F.col(f"len_{fname}") > 0,
                    (F.lit(1.0) / F.sqrt(F.col(f"len_{fname}")))
                    .cast("float"),
                ).otherwise(F.lit(None).cast("float")),
            )]
        )
        docs2 = docs.select(
            "doc_num", *key_cols, norm_map.alias("_norms")
        )
        return decoded.join(docs2, "doc_num").select(
            "field", "term", *key_cols, "tf", "positions",
            F.element_at("_norms", F.col("field")).alias("norm"),
        )

    def stats(self, fields: list[str], scoring: str = "bm25") -> IndexStats:
        """Bleve-exact multi-segment stats: field cardinality = Σ
        per-segment unique-term counts
        (/root/reference/index/scorch/snapshot_index.go:151-161),
        avg_doc_len = ceil(card / doc_count)."""
        doc_count = sum(m["doc_count"] for m in self.manifests())
        per_seg = (
            self.chunk_rows()
            .groupBy("segment_id", "field")
            .agg(F.count_distinct("term").alias("u"))
            .groupBy("field")
            .agg(F.sum("u").alias("card"))
            .collect()
        )
        card = {r["field"]: int(r["card"]) for r in per_seg}
        avg = {
            f: (math.ceil(c / doc_count) if doc_count else 0.0)
            for f, c in card.items()
        }
        return IndexStats(
            doc_count=doc_count,
            field_cardinality=card,
            avg_doc_len=avg,
            scoring=scoring,
        )

    def to_indexed_table(
        self,
        source: DataFrame,
        key_cols: list[str],
        fields: dict[str, str],
        scoring: str = "bm25",
        persist: bool = False,
    ) -> IndexedTable:
        postings = self.postings_df(key_cols, list(fields))
        idx = IndexedTable(
            source=source,
            postings=postings,
            key_cols=list(key_cols),
            field_analyzers=dict(fields),
            stats=self.stats(list(fields), scoring),
            dictionary=None,
        )
        if persist:
            idx.postings = idx.postings.persist()
            idx._persisted.append(idx.postings)
        idx.dictionary = idx.postings.groupBy("field", "term").agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.max("tf").alias("max_tf"),
            F.min("norm").alias("min_norm"),
        )
        if persist:
            idx.dictionary = idx.dictionary.persist()
            idx._persisted.append(idx.dictionary)
        return idx
