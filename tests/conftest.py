from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

# Make google.protobuf available (driver + forked Python workers) when the
# env has no protobuf wheel, so the transformWithStateInPandas e2e test can
# run instead of skipping.  Workers pick the shim up through the standard
# `sitecustomize` hook, hence the PYTHONPATH prepend — it must happen before
# the SparkSession (and its worker daemon) starts.
_PBSHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")
try:
    sys.path.insert(0, _PBSHIM_DIR)
    import sitecustomize as _pbshim  # tests/_pbshim/sitecustomize.py

    if _pbshim.install():
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p
            for p in (_PBSHIM_DIR, os.environ.get("PYTHONPATH", ""))
            if p and p not in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ) or os.environ.get("PYTHONPATH", "")
except Exception:
    pass
finally:
    if _PBSHIM_DIR in sys.path:
        sys.path.remove(_PBSHIM_DIR)


@pytest.fixture(scope="session")
def spark():
    from jobanalytics_bigdataproject_spark.session import get_spark

    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from jobanalytics_bigdataproject_spark.sources.readers import load_star

    return load_star(spark, SF_DIR)
