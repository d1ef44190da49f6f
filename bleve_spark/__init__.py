"""bleve_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the query and data-processing capabilities of
blevesearch/bleve (reference at /root/reference, Apache-2.0) in idiomatic
Spark: the analyzer pipeline is a vectorized Arrow UDF, the inverted index
is a postings DataFrame (plus a delta+varint-compressed at-rest segment
format), queries compile to DataFrame plans (joins/unions/groupBy over the
postings relation), and the top-k collector is ORDER BY ... LIMIT k.

Nothing here is a port: the reference tells us WHAT to compute (operator
semantics, scoring formulas with their quirks, tie-breaks); Catalyst and
Tungsten decide HOW.
"""

from bleve_spark.index.build import IndexedTable, index_table
from bleve_spark.index.mapping import IndexMapping, index_with_mapping
from bleve_spark.search.query import parse_query
from bleve_spark.search.searcher import search, search_df

__all__ = [
    "IndexMapping",
    "IndexedTable",
    "index_table",
    "index_with_mapping",
    "parse_query",
    "search",
    "search_df",
]

__version__ = "0.1.0"
