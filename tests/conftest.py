from __future__ import annotations

import tempfile

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow_sweep: whole-registry plan sweep (minutes); deselect "
        "with -m 'not slow_sweep' for a quick iteration loop",
    )


@pytest.fixture(scope="session")
def spark():
    from dbeam_spark.session import get_spark

    s = get_spark("dbeam-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def derby_db(spark):
    """Embedded Derby database with a COFFEES fixture table (the
    reference tests use H2 the same way; see DbTestHelper.java)."""
    dbdir = tempfile.mkdtemp(prefix="derby_") + "/db"
    url = f"jdbc:derby:{dbdir};create=true"
    df = spark.range(0, 1000).selectExpr(
        "id AS C_ID",
        "CAST(id * 1.5 AS DOUBLE) AS AMOUNT",
        "CONCAT('name_', id) AS NAME",
        "timestamp_millis(1700000000000 + id * 1000) AS CREATED_AT",
        "id % 2 = 0 AS FLAG",
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("user", "dbeam")
        .option("dbtable", "COFFEES")
        .mode("overwrite")
        .save()
    )
    return f"jdbc:derby:{dbdir}"


SF_DIR = "/root/testdata/sf0.001"
