from bleve_spark.search.query import parse_query
from bleve_spark.search.searcher import search, search_df

__all__ = ["parse_query", "search", "search_df"]
