import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("bleve-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    from bleve_spark.corpus import transcripts_df

    return transcripts_df(spark, 40).cache()


@pytest.fixture(scope="session")
def transcripts_pd():
    from bleve_spark.corpus import transcripts_pandas

    return transcripts_pandas(40)


@pytest.fixture(scope="session")
def tindex(spark, transcripts):
    from bleve_spark.index.build import index_table

    return index_table(
        transcripts,
        key_cols=["conv_id", "turn_idx"],
        fields={"text": "standard", "role": "keyword", "tool": "keyword"},
        scoring="bm25",
    )


@pytest.fixture(scope="session")
def toracle(transcripts_pd):
    from tests.oracle import PyIndex

    return PyIndex(
        transcripts_pd.to_dict("records"),
        key_fn=lambda r: (r["conv_id"], int(r["turn_idx"])),
        fields={"text": "standard", "role": "keyword", "tool": "keyword"},
        scoring="bm25",
    )
