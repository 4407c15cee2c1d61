from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from egp_crn_spark.session import get_session  # noqa: E402
from egp_crn_spark.synth import write_fixtures  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_session("egp-crn-spark-tests", cores=int(os.environ.get("TEST_CORES", "8")),
                    driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("fixtures"))
    write_fixtures(d, n_images=1500, seed=42)
    return d
