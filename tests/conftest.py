from __future__ import annotations

import os
import shutil

import pytest

TESTDATA = "/root/testdata"
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from llmap_spark.session import get_spark

    s = get_spark(app_name="llmap-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_smoke(tmp_path_factory) -> str:
    """Generated pages parquet for the smoke tier (sf0.001)."""
    from llmap_spark.corpus import generate_pages

    out = tmp_path_factory.mktemp("pages") / "pages_smoke.parquet"
    return generate_pages(SF_SMOKE, str(out), pages_per_doc=1)


@pytest.fixture()
def out_dir(tmp_path) -> str:
    d = tmp_path / "out"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
