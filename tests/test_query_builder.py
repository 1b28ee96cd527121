"""Query-generation parity: the expected SQL strings below are the
ones the reference asserts in QueryBuilderArgsTest.java /
QueryBuilderTest.java / ParallelQueryBuilderTest.java."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from dbeam_spark.query_builder import (
    QueryBuilder,
    QueryBuilderArgs,
    generate_ranges,
    queries_for_bounds,
)


def args(table="some_table", **kw):
    from dataclasses import replace

    return replace(QueryBuilderArgs.create(table), **kw)


def test_table_query():
    assert QueryBuilderArgs.create("some_table").build_queries() == [
        "SELECT * FROM some_table WHERE 1=1"
    ]


def test_user_query():
    assert QueryBuilderArgs.create_from_query(
        "SELECT * FROM some_table"
    ).build_queries() == [
        "SELECT * FROM (SELECT * FROM some_table) as user_sql_query WHERE 1=1"
    ]


def test_user_query_strips_trailing_semicolon():
    q = QueryBuilderArgs.create_from_query("SELECT * FROM some_table;")
    assert q.build_queries() == [
        "SELECT * FROM (SELECT * FROM some_table) as user_sql_query WHERE 1=1"
    ]


def test_invalid_table_name():
    with pytest.raises(ValueError):
        QueryBuilderArgs.create("some-table;")


def test_limit():
    assert args(limit=7).build_queries() == [
        "SELECT * FROM some_table WHERE 1=1 LIMIT 7"
    ]


def test_partition_daily():
    a = args(
        partition_column="col",
        partition=datetime(2027, 7, 31, tzinfo=timezone.utc),
    )
    assert a.build_queries() == [
        "SELECT * FROM some_table WHERE 1=1 "
        "AND col >= '2027-07-31' AND col < '2027-08-01'"
    ]


def test_partition_daily_with_limit():
    a = args(
        limit=5,
        partition_column="col",
        partition=datetime(2027, 7, 31, tzinfo=timezone.utc),
    )
    assert a.build_queries() == [
        "SELECT * FROM some_table WHERE 1=1 "
        "AND col >= '2027-07-31' AND col < '2027-08-01' LIMIT 5"
    ]


def test_partition_monthly():
    a = args(
        partition_column="col",
        partition=datetime(2027, 7, 31, tzinfo=timezone.utc),
        partition_period="P1M",
    )
    assert a.build_queries() == [
        "SELECT * FROM some_table WHERE 1=1 "
        "AND col >= '2027-07-31' AND col < '2027-08-31'"
    ]


def test_partition_sub_daily():
    a = args(
        partition_column="col",
        partition=datetime(2027, 7, 31, tzinfo=timezone.utc),
        partition_period=timedelta(hours=1),
    )
    assert a.build_queries() == [
        "SELECT * FROM some_table WHERE 1=1 "
        "AND col >= '2027-07-31T00:00:00Z' AND col < '2027-07-31T01:00:00Z'"
    ]


def test_user_query_with_partition_and_limit():
    from dataclasses import replace

    a = replace(
        QueryBuilderArgs.create_from_query("SELECT * FROM COFFEES WHERE SIZE > 10"),
        limit=7,
        partition_column="col",
        partition=datetime(2027, 7, 31, tzinfo=timezone.utc),
    )
    assert a.build_queries() == [
        "SELECT * FROM (SELECT * FROM COFFEES WHERE SIZE > 10) as user_sql_query WHERE 1=1 "
        "AND col >= '2027-07-31' AND col < '2027-08-01' LIMIT 7"
    ]


def test_limit_one_for_schema():
    assert (
        QueryBuilderArgs.create("t").sql_query_with_limit_one()
        == "SELECT * FROM t WHERE 1=1 LIMIT 1"
    )


def test_generate_ranges_even():
    rs = generate_ranges(0, 100, 4)
    assert [(r.start_incl, r.end, r.end_excl) for r in rs] == [
        (0, 25, True),
        (25, 50, True),
        (50, 75, True),
        (75, 100, False),
    ]


def test_generate_ranges_min_equals_max():
    rs = generate_ranges(42, 42, 5)
    assert [(r.start_incl, r.end, r.end_excl) for r in rs] == [(42, 42, False)]


def test_generate_ranges_uneven():
    rs = generate_ranges(0, 10, 3)
    assert len(rs) <= 3
    # full coverage: start at 0, end at 10 inclusive, contiguous
    assert rs[0].start_incl == 0 and rs[-1].end == 10 and not rs[-1].end_excl
    for prev, nxt in zip(rs, rs[1:]):
        assert prev.end == nxt.start_incl


def test_queries_for_bounds():
    qb = QueryBuilder.from_table("coffees")
    qs = queries_for_bounds(1, 41, 5, "id", qb)
    assert qs[0] == (
        "SELECT * FROM coffees WHERE 1=1 AND id >= 1 AND id < 9"
    )
    assert qs[-1].endswith("AND id >= 33 AND id <= 41")
    assert len(qs) == 5


def test_limit_split_by_parallelism():
    a = args(limit=10, split_column="id", query_parallelism=2)
    qs = a.build_queries(find_bounds=lambda sql: (0, 100))
    assert all("LIMIT 5" in q for q in qs)


def test_min_max_query():
    qb = QueryBuilder.from_table("coffees")
    assert qb.min_max_query("id") == (
        "SELECT MIN(id) as min_s, MAX(id) as max_s FROM coffees WHERE 1=1"
    )
