from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from jobanalytics_bigdataproject_spark.session import get_spark

    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from jobanalytics_bigdataproject_spark.sources.readers import load_star

    return load_star(spark, SF_DIR)
