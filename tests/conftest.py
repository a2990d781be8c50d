# -*- coding: utf-8 -*-
"""Shared fixtures: one SparkSession per test run (JVM startup ~10 s,
so session scope), small synthetic pages, and the sf0.001 driver
tables when a test needs them."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from knowledge_graph_spark.session import get_spark

    s = get_spark(app="kg-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df(spark):
    from knowledge_graph_spark.sources.pages import generate_spark

    return generate_spark(spark, 120, partitions=4).cache()


@pytest.fixture(scope="session")
def extracted_df(spark, pages_df):
    from knowledge_graph_spark.operators.extraction import extract

    return extract(pages_df).cache()
