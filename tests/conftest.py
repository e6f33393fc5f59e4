from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MED = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from gopensearch_spark.session import get_spark

    s = get_spark(app_name="gopensearch-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def docs_small(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))


@pytest.fixture(scope="session")
def index_small(spark, docs_small, tmp_path_factory):
    """Built index over sf0.001 documents, shared across tests."""
    from gopensearch_spark.index import build_index

    out = str(tmp_path_factory.mktemp("idx") / "sf0.001")
    build_index(
        spark, docs_small, out, slices=2, with_positions=True,
        input_lineage="sf0.001/documents.parquet",
    )
    return out


@pytest.fixture(scope="session")
def oracle_small(docs_small):
    from gopensearch_spark.fts5_oracle import Fts5Oracle

    o = Fts5Oracle()
    rows = docs_small.select("doc_id", "text").collect()
    o.load([(int(r["doc_id"]), r["text"]) for r in rows])
    yield o
    o.close()
