from bleve_spark.analysis.analyzers import (
    REGISTRY,
    Analyzer,
    get_analyzer,
    register_analyzer,
)

__all__ = ["REGISTRY", "Analyzer", "get_analyzer", "register_analyzer"]
