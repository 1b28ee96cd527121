"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the machine-read summary as the LAST stdout line (compact —
the driver tail-captures, so this line must stay small):
  {"metric": "headline_queries_total", "value": N, "unit": "sec",
   "queries": {...per-query best sec...}, "sf": ...}
Per-run spreads are emitted on an EARLIER stdout line and mirrored to
BENCH_RUNS.json next to this script.

Mirrors the role of reference jobs/BenchJdbcAvroJob.java (repeatable
timing harness) for the analytics surface.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_orders",
    "window_top_orders",
    "events_window_agg",
    "events_sessionize",
    "asof_join_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "text_tokens",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "interval_join_events",
    "doc_chunks",
    "events_retention",
]

# round-3 flagship additions — reported under "extended_queries" so
# the headline total stays key-for-key comparable across rounds
EXTENDED = [
    "part_skyline",
    "bloom_pruned_revenue",
    "doc_similarity_sparse",
    "knn_triangles",
    "events_attribution",
    "user_balance_floor",
    "customer_survival_km",
    # round-4 flagships
    "dedup_exact_substring",
    "dedup_span_repair",
    "session_hour_overlap",
    "ks_price_by_priority",
    "embedding_pair_cosine_audit",
    # round-4 closing flagships: quantized ANN serving, held-out
    # trigram LM scoring
    "knn_int8_recall",
    "trigram_backoff_fluency",
]


# Fixed-work calibration nominals, pinned on the round-8 bench host
# (quiet, local[32]): the same two kernels re-run at bench time and
# the measured/nominal ratios form host_factor. Round 7 proved the
# need: four same-code runs spread 13.5-18.7s and the driver's 20.2s
# vs r6's 12.5s was pure host state — with no fixed-work key in the
# bench there was no way to TELL a real 20% plan regression from a
# slow afternoon. Normalized numbers (raw / host_factor) are the
# round-over-round comparable ones; raw numbers stay the contract
# keys. Two kernels run: a pure-CPU numpy dgemm chain (BLAS / core
# speed / steal diagnostics) and a query-SHAPED 2-stage shuffle agg
# (the axis host_factor is derived from — it tracked a synthetic
# 1.5x slowdown within 3% where the pure kernels didn't; see
# tools/calib_demo.py and docs/SCALE.md r8).
CALIB_NOMINAL_CPU_SEC = 0.090
CALIB_NOMINAL_SPARK_SEC = 0.620


def calib_spark_once(spark) -> float:
    """One rep of the query-SHAPED fixed-work kernel: map-side
    partial agg -> exchange -> final agg over 997 keys, two stages
    over 32 tasks. Query wall time is dominated by per-stage barrier
    sync, so the kernel needs a shuffle to track real contention (a
    pure map wave moved 1.6x when the suite moved 2.4x)."""
    t0 = time.monotonic()
    (
        spark.range(0, 400_000_000, 1, 32)
        .selectExpr("id % 997 AS k", "id % 31 AS v")
        .groupBy("k")
        .agg({"v": "sum"})
        .agg({"sum(v)": "sum"})
        .collect()
    )
    return time.monotonic() - t0


def run_calibration(spark) -> dict:
    """Time the two fixed-work kernels — several untimed warm runs
    each (first-touch page faults, BLAS pool spin-up, janino/C2 all
    land there; a single warm run measured 8x off steady state), then
    MIN of the timed runs. Min, not median: transient scheduler
    spikes make runs slower never faster, while SUSTAINED contention
    (the thing host_factor must capture) slows every rep including
    the min. This upfront reading is the warm-up + diagnostic;
    main() re-samples the spark kernel INTERLEAVED with the headline
    passes and derives the final host_factor from those same-window
    readings (see the n_runs loop)."""
    import numpy as np

    a = np.random.RandomState(7).standard_normal((768, 768))
    # preallocated ping-pong buffers: a fresh 4.7 MB result per dgemm
    # would measure glibc's mmap-threshold adaptation (first ~0.4 s,
    # steady 0.09 s), not the host
    buf = (np.empty_like(a), np.empty_like(a))

    def cpu_once() -> float:
        t0 = time.monotonic()
        src = a
        for i in range(24):
            dst = buf[i & 1]
            np.matmul(src, a, out=dst)
            # rescale to keep values finite without leaving the kernel
            dst *= 1.0 / np.abs(dst).max()
            src = dst
        return time.monotonic() - t0

    def spark_once() -> float:
        return calib_spark_once(spark)

    for _ in range(4):
        cpu_once()
    cpu = min(cpu_once() for _ in range(5))
    # C2 JIT keeps improving this job for several executions; the
    # 400M-row size keeps the kernel CPU-bound (a 200M variant
    # measured the 32-task SCHEDULER round-trip, which a loaded host
    # barely moves) while 5 warm + 3 timed reps stay under ~5 s.
    for _ in range(5):
        spark_once()
    spk = min(spark_once() for _ in range(3))
    # host_factor derives from the QUERY-SHAPED kernel alone: under a
    # 12-burner 1.5x synthetic slowdown it moved 1.46x (the 4-query
    # demo suite moved 1.50x — tools/calib_demo.py), while the numpy
    # kernel moved 4x (multi-threaded BLAS loses timeslices
    # quadratically) and a geomean over both over-corrected to 0.64x.
    # cpu_sec stays REPORTED as the diagnostic second axis: it tells
    # a pure-CPU/steal slowdown apart from a scheduler-stall one.
    factor = spk / CALIB_NOMINAL_SPARK_SEC
    return {
        "cpu_sec": round(cpu, 3),
        "spark_sec": round(spk, 3),
        "host_factor": round(factor, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dbeam_spark.queries import QUERIES
    from dbeam_spark.session import get_spark

    spark = get_spark("dbeam-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Prove the resolved core count to the driver (r9 verdict #2): the
    # driver benches at a reduced $SPARK_GRAFT_CPUS to measure core
    # scaling, and without the session's ACTUAL master/parallelism in
    # the JSON line it cannot tell "env ignored" from "overhead-bound
    # at this SF" (its suspect_cpus_ignored heuristic false-positived
    # in r9 even though session.py honors the env).
    resolved = {
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }

    calibration = run_calibration(spark)

    # Untimed warm-up pass per key AT THE BENCH SF, outside the timed
    # region: whole-stage-codegen (janino) compiles, file listings and
    # parquet footers cache, and shuffle-size-dependent AQE plans
    # settle. Round 6 measured four headline keys drifting 5-11%
    # round-over-round purely on first-run warm-up (BENCH_RUNS.json
    # spreads showed run-1 dominating) — a small-SF codegen pass
    # doesn't touch the full-SF artifacts, one full-SF pass does.
    for name in HEADLINE + EXTENDED:
        try:
            QUERIES[name](spark, sf_dir).collect()
        except Exception:
            pass  # warmup must never fail the bench

    # Python-worker fleet warmup: the sf0.001 pass only spawns a couple
    # of workers, so the first full-width Arrow stage would otherwise
    # pay ~30 worker spawns × (numpy+pandas import) inside the timed
    # region. Steady-state executors (the thing bench models) have
    # their workers resident — spawn the full fleet once, untimed.
    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    n_workers = spark.sparkContext.defaultParallelism * 2
    spark.range(n_workers).repartition(n_workers).mapInPandas(
        _warm_workers, "id long"
    ).count()

    # Best-of-N per query with per-run spreads recorded: single-shot
    # numbers on a shared VM carry ±40% scheduler noise; the min is
    # the repeatable capability figure (same rationale as the
    # reference BenchJdbcAvroJob's repeated-run collection), and the
    # full runs array makes a real regression attributable the round
    # it lands (vs host-speed drift, which shifts every run together).
    n_runs = 3
    runs: dict[str, list[float]] = {}
    for _ in range(n_runs):
        # one calibration reading per pass, INTERLEAVED with the keys:
        # host contention is nonstationary (the burner demo measured
        # the kernel 3.1x while same-window queries read 1.24x when
        # calibration ran in a different load phase), so the factor
        # must be sampled over the same wall window as the keys and
        # reduced with the same estimator (min = repeatable capability)
        runs.setdefault("__calib_spark__", []).append(
            round(calib_spark_once(spark), 3)
        )
        for name in HEADLINE:
            t0 = time.monotonic()
            n = QUERIES[name](spark, sf_dir).collect()
            el = round(time.monotonic() - t0, 3)
            runs.setdefault(name, []).append(el)
            assert len(n) >= 0
    per_query = {name: min(ts) for name, ts in runs.items()
                 if name != "__calib_spark__"}
    calibration["spark_sec_interleaved"] = min(runs["__calib_spark__"])
    calibration["host_factor"] = round(
        calibration["spark_sec_interleaved"] / CALIB_NOMINAL_SPARK_SEC, 3
    )

    # export-path throughput (the reference's headline dimension:
    # rows/min through the Avro writer — see BenchJdbcAvroJob).
    #
    # The driver's sf0.1 lineitem parquet is a SINGLE row group, so a
    # direct scan has parallelism 1 — an artifact of the generator,
    # not of the design: real export inputs (JDBC range splits, lake
    # files) arrive as many splits and write_avro is map-only over
    # them (no shuffle, the 100 TB posture). The bench therefore
    # prepares a multi-file copy of lineitem UNTIMED — modeling the
    # splits a real source provides — and times the export itself:
    # parallel scan -> Arrow -> encode -> write, zero exchanges.
    # The old forced-repartition measurement (single split + full-row
    # shuffle inside the timed region; what r1-r4 reported) is kept in
    # extended_queries as avro_export_lineitem_single_split for
    # round-over-round continuity.
    import shutil
    import tempfile

    from dbeam_spark.avro.schema import spark_schema_to_avro
    from dbeam_spark.avro.writer import write_avro
    from dbeam_spark.sources.files import load_table

    P = spark.sparkContext.defaultParallelism
    src = tempfile.mkdtemp(prefix="bench_avro_src_")
    load_table(spark, sf_dir, "lineitem").repartition(P).write.mode(
        "overwrite"
    ).parquet(src)
    li = spark.read.parquet(src)
    avro_schema = spark_schema_to_avro(li.schema, "lineitem")
    export_sec, export_rows = None, 0
    runs["avro_export_lineitem"] = []
    # untimed warm-up export (same first-run hygiene as the queries)
    _warm_out = tempfile.mkdtemp(prefix="bench_avro_")
    write_avro(li, _warm_out, avro_schema, codec="deflate6")
    shutil.rmtree(_warm_out, ignore_errors=True)
    for _ in range(n_runs):
        out = tempfile.mkdtemp(prefix="bench_avro_")
        t0 = time.monotonic()
        stats = write_avro(li, out, avro_schema, codec="deflate6")
        el = time.monotonic() - t0
        shutil.rmtree(out, ignore_errors=True)
        runs["avro_export_lineitem"].append(round(el, 3))
        if export_sec is None or el < export_sec:
            export_sec = el
            export_rows = sum(s["rows"] for s in stats)
    per_query["avro_export_lineitem"] = round(export_sec, 3)

    # round-3 flagship additions, timed best-of-N but reported in a
    # SEPARATE dict: the headline total stays key-for-key comparable
    # with BENCH_r1/r2
    extended: dict[str, float] = {}
    li_single = load_table(spark, sf_dir, "lineitem").repartition(P)
    _warm_out = tempfile.mkdtemp(prefix="bench_avro_")
    write_avro(li_single, _warm_out, avro_schema, codec="deflate6")
    shutil.rmtree(_warm_out, ignore_errors=True)
    for _ in range(n_runs):
        for name in EXTENDED:
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).collect()
            el = round(time.monotonic() - t0, 3)
            runs.setdefault(name, []).append(el)
            extended[name] = min(extended.get(name, el), el)
        # legacy r1-r4 export shape: single-split scan + full-row
        # repartition inside the timed region
        out = tempfile.mkdtemp(prefix="bench_avro_")
        t0 = time.monotonic()
        write_avro(li_single, out, avro_schema, codec="deflate6")
        el = round(time.monotonic() - t0, 3)
        shutil.rmtree(out, ignore_errors=True)
        runs.setdefault("avro_export_lineitem_single_split", []).append(el)
        extended["avro_export_lineitem_single_split"] = min(
            extended.get("avro_export_lineitem_single_split", el), el
        )
    shutil.rmtree(src, ignore_errors=True)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    rows_per_minute = int(export_rows * 60 / export_sec)

    # Regression tripwires sized to catch PLAN regressions (a ~2x
    # slowdown from an added shuffle / lost pushdown), not host-speed
    # drift: round-4 measured the same commit at 16.6s and 22.0s
    # total on the same box hours apart (shared-host scheduler), so
    # any floor within ~35% of a healthy reading false-positives. A
    # violation is reported, not fatal: the driver consumes the
    # stdout JSON line regardless.
    regressions = []
    _hf = max(calibration.get("host_factor") or 1.0, 0.25)
    if sf == "0.1":
        # tripwires compare HOST-NORMALIZED values (r8): raw floors
        # false-positived on slow afternoons (r7's 20.2s-vs-12.5s was
        # pure host state) and would mask real regressions on fast ones
        _lsh_n = per_query.get("dedup_minhash_lsh", 0) / _hf
        if _lsh_n > 5.5:
            regressions.append(
                f"dedup_minhash_lsh {_lsh_n:.2f}s normalized > 5.5s"
            )
        if rows_per_minute * _hf < 10_000_000:
            regressions.append(
                f"export {int(rows_per_minute * _hf)} normalized rows/min"
                " < 10M floor"
            )
        # RAW absolute ceilings (r8 ADVICE): a repo-side regression
        # that also slows the calibration kernel (e.g. a session/
        # config change in get_spark touching the shuffle path)
        # inflates host_factor and self-normalizes away. These loose
        # raw bounds (4x the normalized limits — beyond any host
        # state ever measured on this box, max factor on record 1.6x
        # plus 2x shot spread) cannot be masked by calibration.
        _lsh_raw = per_query.get("dedup_minhash_lsh", 0)
        if _lsh_raw > 22.0:
            regressions.append(
                f"dedup_minhash_lsh {_lsh_raw:.2f}s RAW > 22s absolute"
                " ceiling (calibration-independent)"
            )
        if rows_per_minute < 2_500_000:
            regressions.append(
                f"export {rows_per_minute} RAW rows/min < 2.5M absolute"
                " floor (calibration-independent)"
            )
    if regressions:
        import sys

        print(f"BENCH REGRESSION: {regressions}", file=sys.stderr)

    lines = emit_lines(
        total, per_query, extended, runs, sf, sf_dir,
        rows_per_minute, regressions, calibration, resolved,
    )
    write_runs_sidecar(lines[0])
    for line in lines:
        print(line)


# Kept small enough for the driver's tail capture with margin: the
# r5 record went unparseable ("parsed": null) when the single line
# crossed the budget, so the summary size is a tested contract now.
SUMMARY_LINE_BUDGET = 8192


def write_runs_sidecar(runs_payload: str) -> None:
    """Mirror the spreads line to BENCH_RUNS.json next to this script
    (best-effort: the stdout summary line is the contract, the sidecar
    is for round-over-round spread attribution)."""
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_RUNS.json"),
            "w",
        ) as fh:
            fh.write(runs_payload + "\n")
    except OSError:
        pass


def emit_lines(
    total, per_query, extended, runs, sf, sf_dir,
    rows_per_minute, regressions, calibration=None, resolved=None,
) -> list[str]:
    """Build the bench's stdout lines — PURE (the BENCH_RUNS.json
    sidecar is written by main via write_runs_sidecar). CONTRACT
    (tested in tests/test_preflight_tools.py): the LAST line is the
    compact machine-read summary and ALWAYS stays under
    SUMMARY_LINE_BUDGET bytes; per-run spreads ride on an EARLIER
    line and in the sidecar — round 5's oversized single line made
    the driver record 'parsed': null. The shedding ladder drops
    optional payload (extended dict, regressions, then individual
    per-query keys, longest names first) until the line fits, so an
    oversize line is structurally impossible, not just unlikely."""
    factor = (calibration or {}).get("host_factor") or 1.0
    runs_payload = json.dumps({
        "runs": runs,
        "sf_dir": sf_dir,
        **({"calibration": calibration} if calibration else {}),
        # per-key host-normalized numbers (raw / host_factor): the
        # round-over-round comparable view; raw keys stay the contract
        "queries_normalized": {
            k: round(v / factor, 3) for k, v in per_query.items()
        },
    })

    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": dict(per_query),
        "extended_queries": extended,
        "sf": float(sf) if str(sf).replace(".", "").isdigit() else sf,
        "export_rows_per_minute": rows_per_minute,
        # resolved session shape (master string + defaultParallelism):
        # proves to the driver that $SPARK_GRAFT_CPUS was honored
        # (never shed — a constant ~60 bytes)
        **(
            {
                "cpus": resolved["default_parallelism"],
                "master": resolved["master"],
            }
            if resolved
            else {}
        ),
        **(
            {
                "calibration": calibration,
                "value_normalized": round(total / factor, 3),
            }
            if calibration
            else {}
        ),
        **({"regressions": regressions} if regressions else {}),
    }
    line = json.dumps(summary)
    if len(line) > SUMMARY_LINE_BUDGET:
        summary.pop("extended_queries", None)
        line = json.dumps(summary)
    if len(line) > SUMMARY_LINE_BUDGET and "regressions" in summary:
        summary["regressions"] = summary["regressions"][:3]
        line = json.dumps(summary)
        if len(line) > SUMMARY_LINE_BUDGET:
            summary.pop("regressions", None)
            line = json.dumps(summary)
    while len(line) > SUMMARY_LINE_BUDGET and summary["queries"]:
        shed = max(summary["queries"], key=len)
        summary["queries"].pop(shed)
        summary["queries_shed"] = summary.get("queries_shed", 0) + 1
        line = json.dumps(summary)
    assert len(line) <= SUMMARY_LINE_BUDGET, "summary line over budget"
    return [runs_payload, line]


if __name__ == "__main__":
    main()
