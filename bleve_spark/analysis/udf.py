"""Vectorized Arrow UDFs wrapping the analyzer pipeline.

The reference analyzes documents on a concurrent worker queue
(/root/reference/index/scorch/scorch.go:538-568); our equivalent is a
pandas UDF running data-parallel per partition over Arrow batches — the
per-batch loop below is C-regex-bound, and no per-row Python crosses the
JVM↔Python boundary (one Arrow transfer per batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from bleve_spark.analysis.analyzers import Analyzer, get_analyzer

TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("pos", IntegerType()),
        ]
    )
)

RICH_TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("pos", IntegerType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
        ]
    )
)


def tokens_udf(analyzer: str | Analyzer):
    """text -> array<struct<term,pos>> (index-build fast path)."""
    a = get_analyzer(analyzer)

    @F.pandas_udf(TOKEN_SCHEMA)
    def _analyze(texts: pd.Series) -> pd.Series:
        analyze = a.analyze_terms
        return pd.Series(
            [
                [
                    {"term": t, "pos": p}
                    for (t, p) in analyze(x)
                ]
                if x is not None
                else []
                for x in texts
            ],
            index=texts.index,
        )

    return _analyze


def rich_tokens_udf(analyzer: str | Analyzer):
    """text -> array<struct<term,pos,start,end>> (byte offsets; used for
    golden tests and highlighting of the final top-k rows only)."""
    a = get_analyzer(analyzer)

    @F.pandas_udf(RICH_TOKEN_SCHEMA)
    def _analyze(texts: pd.Series) -> pd.Series:
        analyze = a.analyze
        return pd.Series(
            [
                [t._asdict() for t in analyze(x)] if x is not None else []
                for x in texts
            ],
            index=texts.index,
        )

    return _analyze
