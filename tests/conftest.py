from __future__ import annotations

import os

import pytest

from pathways2go_spark.datagen import ensure_fixture
from pathways2go_spark.session import get_spark

FIXTURE_DIR = "/tmp/p2g_fixture_small"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="p2g_tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_paths():
    return ensure_fixture(FIXTURE_DIR, replicas=1)


@pytest.fixture(scope="session")
def documents(spark, fixture_paths):
    from pathways2go_spark.ingest import read_documents

    return read_documents(spark, fixture_paths["documents"])


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
