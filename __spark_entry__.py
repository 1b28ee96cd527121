"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in ``dbeam_spark.queries`` (SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 six-way star join) on sf0.001."""
    from dbeam_spark.queries import QUERIES

    return QUERIES["q5_local_supplier_volume"](spark, "/root/testdata/sf0.001")


def _interleaved_names() -> list[str]:
    """Round-robin the registry across its source suites (tpch /
    events / llm / streaming) so ANY prefix sample of `queries()`
    spans all of SURVEY §2.B/C/D — the driver gates a ~50-query
    sample per round, and pure registration order would leave whole
    suites unsampled."""
    from itertools import zip_longest

    from dbeam_spark.queries import QUERIES

    groups: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        groups.setdefault(fn.__module__, []).append(name)
    return [
        n
        for tup in zip_longest(*groups.values())
        for n in tup
        if n is not None
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dbeam_spark.queries import QUERIES

    return {n: QUERIES[n] for n in _interleaved_names()}


def oracle_sql() -> dict[str, str]:
    from dbeam_spark.queries import ORACLES

    return {n: ORACLES[n] for n in _interleaved_names() if n in ORACLES}
