from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from paperoni_spark.pipeline import build_spark

    spark = build_spark(master="local[4]", app_name="paperoni-spark-tests")
    yield spark
    spark.stop()
