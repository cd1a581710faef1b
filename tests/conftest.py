import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("iresearch_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def unit_corpus():
    """sf-unit corpus: 1k docs (FIXTURES.md §1)."""
    from iresearch_spark.fixtures import gen_corpus_pandas

    return gen_corpus_pandas(1000, seed=42)


@pytest.fixture(scope="session")
def unit_index(spark, unit_corpus, tmp_path_factory):
    """Built index over the unit corpus + matching oracle."""
    from iresearch_spark.build import build_index
    from iresearch_spark.oracle import OracleIndex
    from iresearch_spark.store import SnapshotStore

    root = str(tmp_path_factory.mktemp("index_unit"))
    store = SnapshotStore(root)
    sdf = spark.createDataFrame(unit_corpus)
    sid = build_index(spark, sdf, store, n_segments=4, source="unit_corpus")
    oracle = OracleIndex.from_corpus(unit_corpus, n_segments=4)
    return store, sid, oracle
