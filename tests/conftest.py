import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ph_ee_nats_importer_rdbms_spark.session import build_session  # noqa: E402
from tests.protobuf_compat import ensure_protobuf  # noqa: E402

# Must run at import time, BEFORE any Spark JVM starts: the shim path has
# to reach PYTHONPATH so transformWithStateInPandas python workers can
# import the state protocol's protobuf runtime (tests/protobuf_compat.py).
ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = build_session(app_name="phee-tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
