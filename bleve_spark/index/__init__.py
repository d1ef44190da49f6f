from bleve_spark.index.build import IndexedTable, IndexStats, index_table

__all__ = ["IndexedTable", "IndexStats", "index_table"]
