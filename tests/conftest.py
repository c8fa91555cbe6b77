from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from insights_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("insights-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    from insights_spark import synth

    return synth.pages_df(spark, n_pages=30).cache()


@pytest.fixture(scope="session")
def pages_rows():
    from insights_spark import synth

    return synth.gen_pages(30)
