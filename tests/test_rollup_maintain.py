"""Incremental rollup maintenance (A36): touched-days-only rebuild,
idempotent recomputation, equality with a full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbeam_spark.avro.schema import spark_schema_to_avro
from dbeam_spark.avro.writer import write_avro
from dbeam_spark.jobs.rollup_maintain import maintain_rollup, read_rollup


def _mk_run(spark, root, idx, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, cents long"
    ).coalesce(1)
    schema = spark_schema_to_avro(df.schema, use_logical_types=True)
    out = root / f"run_{idx:05d}"
    out.mkdir(parents=True)
    write_avro(df, str(out), schema)
    return df


def _rows(day, etype, n, base_id, cents):
    from datetime import datetime

    return [
        (base_id + i, datetime(2024, 1, day, 10, i), etype, cents)
        for i in range(n)
    ]


def test_incremental_equals_full_recompute(spark, tmp_path):
    runs = tmp_path / "runs"
    roll = tmp_path / "rollup"
    _mk_run(spark, runs, 0, _rows(1, "view", 3, 0, 10) + _rows(2, "buy", 2, 10, 50))
    r1 = maintain_rollup(
        spark, str(runs), str(roll), "ts", ["event_type"], ["cents"]
    )
    assert r1["new_runs"] == ["run_00000"]
    assert r1["rebuilt_days"] == ["2024-01-01", "2024-01-02"]

    # second run appends to day 2 and opens day 3: day 1 untouched
    _mk_run(spark, runs, 1, _rows(2, "buy", 4, 20, 50) + _rows(3, "view", 1, 30, 7))
    r2 = maintain_rollup(
        spark, str(runs), str(roll), "ts", ["event_type"], ["cents"]
    )
    assert r2["rebuilt_days"] == ["2024-01-02", "2024-01-03"]

    got = {
        (str(r["day"]), r["event_type"]): (r["n_rows"], r["sum_cents"])
        for r in read_rollup(spark, str(roll)).collect()
    }
    # full recompute over both runs
    assert got == {
        ("2024-01-01", "view"): (3, 30),
        ("2024-01-02", "buy"): (6, 300),  # 2 + 4 across runs, NOT doubled
        ("2024-01-03", "view"): (1, 7),
    }


def test_noop_and_crash_replay_idempotent(spark, tmp_path):
    runs = tmp_path / "runs"
    roll = tmp_path / "rollup"
    _mk_run(spark, runs, 0, _rows(1, "view", 2, 0, 5))
    maintain_rollup(spark, str(runs), str(roll), "ts", ["event_type"], ["cents"])
    # no new runs -> no-op
    assert maintain_rollup(
        spark, str(runs), str(roll), "ts", ["event_type"], ["cents"]
    ) == {"new_runs": [], "rebuilt_days": []}

    # simulate a crash BEFORE the state write: delete the state file
    # and re-run — recomputation must converge, not double-count
    (roll / "_ROLLUP_STATE.json").unlink()
    maintain_rollup(spark, str(runs), str(roll), "ts", ["event_type"], ["cents"])
    rows = read_rollup(spark, str(roll)).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 2 and rows[0]["sum_cents"] == 10


def test_multi_group_and_sum_columns(spark, tmp_path):
    runs = tmp_path / "runs"
    roll = tmp_path / "rollup"
    _mk_run(
        spark, runs, 0,
        _rows(1, "view", 2, 0, 10) + _rows(1, "buy", 1, 5, 99),
    )
    maintain_rollup(spark, str(runs), str(roll), "ts", ["event_type"], ["cents", "event_id"])
    df = read_rollup(spark, str(roll))
    assert set(df.columns) == {"day", "event_type", "n_rows", "sum_cents", "sum_event_id"}
    buy = df.filter(F.col("event_type") == "buy").collect()[0]
    assert buy["n_rows"] == 1 and buy["sum_cents"] == 99


def test_rollup_over_real_incremental_export(spark, tmp_path):
    """A26 → A36 composition: the rollup maintained over ACTUAL
    incremental_export run dirs (Derby → watermark deltas → avro
    runs → day rollup), incremental result == full recompute."""
    import tempfile as _tf

    from dbeam_spark.jobs.incremental_export import run_incremental
    from dbeam_spark.options import JdbcExportOptions

    dbdir = _tf.mkdtemp(prefix="derby_roll_") + "/db"
    url = f"jdbc:derby:{dbdir};create=true"

    def append(start, n, mode="append"):
        df = spark.range(start, start + n).selectExpr(
            "id AS C_ID",
            # two calendar days: ids < 50 on day 1, rest on day 2
            "timestamp_millis(1704067200000 + CAST(id >= 50 AS LONG)"
            " * 86400000 + id * 1000) AS CREATED_AT",
            "CAST(id % 3 AS INT) AS KIND",
            "id * 10 AS CENTS",
        )
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("user", "dbeam")
            .option("dbtable", "LEDGER")
            .mode(mode)
            .save()
        )

    append(0, 60, mode="overwrite")
    out = tmp_path / "runs"
    opts = JdbcExportOptions(
        connectionUrl=f"jdbc:derby:{dbdir}",
        table="LEDGER",
        output=str(out),
        username="dbeam",
        skipPartitionCheck=True,
        useAvroLogicalTypes=True,  # CREATED_AT round-trips as timestamp
    )
    run_incremental(spark, opts, "C_ID")
    roll = tmp_path / "rollup"
    r1 = maintain_rollup(
        spark, str(out), str(roll), "CREATED_AT", ["KIND"], ["CENTS"]
    )
    assert r1["rebuilt_days"] == ["2024-01-01", "2024-01-02"]

    append(60, 40)  # all land on day 2
    run_incremental(spark, opts, "C_ID")
    r2 = maintain_rollup(
        spark, str(out), str(roll), "CREATED_AT", ["KIND"], ["CENTS"]
    )
    assert r2["rebuilt_days"] == ["2024-01-02"]  # day 1 untouched

    got = {
        (str(r["day"]), r["KIND"]): (r["n_rows"], r["sum_CENTS"])
        for r in read_rollup(spark, str(roll)).collect()
    }
    # ground truth: full recompute over all 100 rows
    expect: dict = {}
    for i in range(100):
        d = "2024-01-01" if i < 50 else "2024-01-02"
        k = i % 3
        n, s = expect.get((d, k), (0, 0))
        expect[(d, k)] = (n + 1, s + i * 10)
    assert got == expect


def _mk_cdc_run(spark, root, idx, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, event_type string,"
        " cents long, op string",
    ).coalesce(1)
    schema = spark_schema_to_avro(df.schema, use_logical_types=True)
    out = root / f"run_{idx:05d}"
    out.mkdir(parents=True)
    write_avro(df, str(out), schema)


def _cdc_rows(day, etype, n, base_id, cents, op="I"):
    return [r + (op,) for r in _rows(day, etype, n, base_id, cents)]


def test_cdc_rollup_updates_and_deletes(spark, tmp_path):
    """CDC mode: later runs update and delete earlier rows; the rollup
    must equal the live-rows recompute, and only touched days
    rebuild."""
    runs = tmp_path / "cdc_runs"
    roll = tmp_path / "cdc_rollup"
    kw = dict(primary_key="event_id", op_col="op")
    # day1: 3 views @10; day2: 2 buys @50
    _mk_cdc_run(
        spark, runs, 0,
        _cdc_rows(1, "view", 3, 0, 10) + _cdc_rows(2, "buy", 2, 10, 50),
    )
    maintain_rollup(
        spark, str(runs), str(roll), "ts", ["event_type"], ["cents"], **kw
    )
    # run 1: update one day-2 buy to 80 cents, delete one day-1 view
    _mk_cdc_run(
        spark, runs, 1,
        _cdc_rows(2, "buy", 1, 10, 80, op="U")
        + _cdc_rows(1, "view", 1, 0, 10, op="D"),
    )
    r = maintain_rollup(
        spark, str(runs), str(roll), "ts", ["event_type"], ["cents"], **kw
    )
    assert r["rebuilt_days"] == ["2024-01-01", "2024-01-02"]
    got = {
        (str(r2["day"])[:10], r2["event_type"]): (
            r2["n_rows"], r2["sum_cents"],
        )
        for r2 in read_rollup(spark, str(roll)).collect()
    }
    assert got == {
        ("2024-01-01", "view"): (2, 20),   # one view deleted
        ("2024-01-02", "buy"): (2, 130),   # 80 + 50
    }, got
    # crash replay: wipe the state and re-run both batches — identical
    import os

    os.remove(roll / "_ROLLUP_STATE.json")
    maintain_rollup(
        spark, str(runs), str(roll), "ts", ["event_type"], ["cents"], **kw
    )
    got2 = {
        (str(r2["day"])[:10], r2["event_type"]): (
            r2["n_rows"], r2["sum_cents"],
        )
        for r2 in read_rollup(spark, str(roll)).collect()
    }
    assert got2 == got
