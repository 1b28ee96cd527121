"""Scale probe: build a 10x replica of sf0.1 (~sf1) in /tmp and time
the headline operators on it vs sf0.1.

The point is EVIDENCE for the 100 TB posture claims in SURVEY §6: on a
fixed 32-core executor fleet, a well-shaped operator's wall-clock
should grow ~linearly with input (no quadratic pair blowups, no
driver-side collects that OOM, no single-task global sorts). A 10x
step is the smallest one that would expose an O(n²) term (100x cost)
or a driver collect (10x memory) unambiguously.

Replication semantics (keys shifted so semantics survive):
- facts (lineitem/orders/events) x10 with orderkey/custkey/event_id/
  user_id offset per copy — per-key cardinalities stay realistic
  (10x users, same events-per-user), group counts grow 10x.
- customer x10 (it scales WITH facts; the dims region/nation/
  supplier/part stay fixed, as they would at 100 TB).
- documents x10 with doc_id offset AND a per-(token, copy) suffix
  COIN: token t keeps its surface form in copy i iff
  pmod(xxhash64(t) + i, 2) = 0, else becomes t_<i>. Each copy's
  transform is an injective token remap, so within-copy planted
  near-dup Jaccard is preserved EXACTLY; the same original doc in
  two copies shares only shingles whose k tokens all land heads in
  BOTH copies (~(1/2)^k of positions — far below LSH thresholds),
  so near-dup density (the thing LSH cost scales with) stays
  constant instead of every doc gaining 9 identical twins. Unlike
  the old suffix-EVERY-token rule (which diluted each token's
  corpus share by 1/copies — heavy_hitters_cms measured 0 rows at
  30x, keyword_search 0 matches), every token keeps a scale-
  INVARIANT share: present unsuffixed in half the copies, so its
  share is half its base share at every copy count — the Zipf head
  survives, token-frequency probes measure real work.
- embeddings x10 with vec_id offset AND a per-(dim, copy) SIGN FLIP
  (builder v3): copy i multiplies dimension d by -1 iff
  pmod(xxhash64(d || '|' || i), 2) = 1 (copy 0 is the identity). A
  diagonal +-1 matrix is orthogonal, so within-copy norms and ALL
  pairwise cosines are preserved exactly — every cosine-based
  result replicates per copy — while cross-copy cosine collapses
  to ~0 (half the dims flip sign between two copies). Without
  this, every vector has copies-1 EXACT twins: embedding-dedup
  pair counts explode ~(copies^2/2)x instead of copies-x, and the
  kNN graph degenerates into copies-cliques of self-twins — the
  r7 exhaustive sweep measured dedup_embedding at 104k pairs
  (90k of them cross-copy artifacts) before this landed.

Usage:
  python tools/scale_probe.py            # build (if absent) + run
  python tools/scale_probe.py --rebuild  # force rebuild
  SCALE_COPIES=30 python tools/scale_probe.py --queries a,b,c
      # 30x replica (~sf3), probing only the named queries — the
      # second scale point: 10x->30x should stay ~linear (≤3x wall)
      # for every operator whose 10x ratio was already linear.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
OUT = os.environ.get("SCALE_OUT", f"/tmp/scale{COPIES}")

PROBES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q21_waiting_suppliers",
    "events_sessionize",
    "events_retention",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_tokens",
    "knn_bruteforce",
    "lexical_diversity",
    # round-3 additions: LM scoring, sketch, retrieval, history,
    # throttle — each a distinct shuffle/window shape to bound
    "bigram_lm_fluency",
    "heavy_hitters_cms",
    "keyword_search",
    "scd2_history",
    "events_throttle",
    "segment_migration",
    # round-3 continuation: sweep-line skyline, cut-value histogram,
    # sessionized attribution, bloom-pruned join, posting-list
    # similarity, integer OLS, knn triangle census
    "part_skyline",
    "histogram_equidepth",
    "events_attribution",
    "bloom_pruned_revenue",
    "doc_similarity_sparse",
    "brand_trend_slope",
    "knn_triangles",
    "join_cardinality_profile",
    "revenue_islands",
    "user_balance_floor",
    "events_dwell_time",
    "return_rate_wilson",
    "daily_forecast_ewma",
    "orders_benford",
    "customer_survival_km",
    # round-4 additions: K-gram span islands (the suffix-array
    # equivalent's token-position blowup), the two-tier BPE trainer
    # (driver-memory flatness claim), IVF probing, the incremental
    # signature index, and the HLL continuous aggregate
    "dedup_exact_substring",
    "bpe_vocab",
    "knn_ivf",
    "dedup_incremental",
    "hll_rolling_users",
    # round-4 continuation: interval-interval bucket join, the
    # global_cumsum ECDF primitive (KS + Mann-Whitney), the
    # global_ranked pair matching, and the analytic window suite
    "session_hour_overlap",
    "ks_price_by_priority",
    "mannwhitney_price_returns",
    "embedding_pair_cosine_audit",
    "window_suite_orders",
    # round-4 final block: bootstrap grid, sweep line, k-core peel,
    # weighted quantile, CUPED scalar algebra, iterative fixed points
    "bootstrap_median_ci",
    "concurrent_sessions_daily_peak",
    "weighted_median_price",
    "lorenz_deciles_customers",
    "cuped_adjusted_lift",
    "events_markov_stationary",
    "holt_forecast_daily",
    "knn_kcore",
    "knn_ivf_probe_sweep",
    "token_freq_octaves",
    # round-4 statistics/retrieval block: pairwise trend, integer
    # test trio completion, collocation mining, hybrid retrieval,
    # cross-source dup flow
    "theil_sen_trend",
    "pmi_collocations",
    "welch_ttest_priority",
    "chi2_type_dow",
    "rrf_hybrid_search",
    "dedup_source_flow",
    # round-4 closing block: quantized ANN serving, centroid-distance
    # outliers, held-out trigram backoff LM, the IVF maintenance
    # lifecycle, Neyman allocation, and the streaming CMS/dedup-index
    # monitors (streaming queries probe correctly now that the
    # replica's directory-shaped events table streams)
    "knn_int8_recall",
    "embedding_outliers",
    "trigram_backoff_fluency",
    "ivf_maintain_report",
    "sampling_neyman",
    "embedding_health",
    "stream_ewma_alert",
    "stream_cms_heavy_users",
    "stream_dedup_index",
    "embedding_drift",
    "cdc_rollup_demo",
    "keyword_index_maintain",
    "spearman_spend_balance",
    "kfold_cluster_assignment",
    "quantile_normalize_lengths",
    "phrase_search",
    "knn_graph_maintain",
    "shapley_attribution",
    "multi_touch_attribution",
    "markov_removal_attribution",
    "holt_winters_weekly",
    "retrieval_eval",
    "srm_check",
    "did_revenue",
    "experiment_power",
    # round-5 additions: integer-exact source drift, skip-gram fuzzy
    # decontamination, sentence-chunk geometry, real-decode multimodal
    "source_lexical_divergence",
    "contamination_fuzzy",
    "sentence_chunks",
    "multimodal_bmp_decode",
    "multimodal_wav_windows",
    "dedup_ngram_jaccard",
    "vocab_growth_curve",
    "quality_rule_ablation",
    "source_ngram_overlap",
    # round-6 additions: real PNG decode (one Arrow encode+decode
    # pass per doc), roundtrip export audit (content-keyed reuse dir)
    "multimodal_png_decode",
    "avro_roundtrip_audit",
    # round-7 additions: baseline JPEG decode (the heaviest python
    # codec), the key-sampled stream-join completeness audit (the
    # 100x operating mode), and the exact kNN self-join (the r7
    # exhaustive sweep's catch — FLOPs-bound quadratic tier, kept
    # probed so the gate posture stays measured)
    "multimodal_jpeg_decode",
    "stream_join_completeness_sampled",
    "knn_self_join",
    # r7: MP4 structural demux (python mux+walk per doc, row-linear)
    "multimodal_mp4_demux",
]


# Bumped whenever replication SEMANTICS change (not just source data):
# folded into source_key so preflight + the self-rebuild check both
# treat replicas built by an older builder as stale. v2 = the
# Zipf-head-preserving token coin; v3 = the per-copy embedding sign
# flip (both r7).
BUILDER_VERSION = 3


def source_key(base: str = BASE) -> str:
    """Content signature of the probe's source tables: (name, size,
    mtime) per parquet file, prefixed with the builder version. A
    replica whose ``_SOURCE_KEY`` doesn't match this is stale (the
    driver regenerated testdata, or the replication semantics
    changed) and must be rebuilt — tools/preflight.py hard-fails on
    such replicas so a stale one can never quietly flatten a probe
    ratio."""
    return f"builder_v{BUILDER_VERSION}|" + repr(
        sorted(
            (f, os.path.getsize(os.path.join(base, f)),
             int(os.path.getmtime(os.path.join(base, f))))
            for f in os.listdir(base)
            if f.endswith(".parquet")
        )
    )


def build(spark) -> None:
    from pyspark.sql import functions as F

    from dbeam_spark.sources.files import load_table

    os.makedirs(OUT, exist_ok=True)
    # fixed dims: straight copies
    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, BASE, t).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )

    cust = load_table(spark, BASE, "customer")
    orders = load_table(spark, BASE, "orders")
    li = load_table(spark, BASE, "lineitem")
    ev = load_table(spark, BASE, "events")
    docs = load_table(spark, BASE, "documents")
    emb = load_table(spark, BASE, "embeddings")

    c_off = cust.agg(F.max("c_custkey")).first()[0] + 1
    o_off = orders.agg(F.max("o_orderkey")).first()[0] + 1
    e_off = ev.agg(F.max("event_id")).first()[0] + 1
    u_off = ev.agg(F.max("user_id")).first()[0] + 1
    d_off = docs.agg(F.max("doc_id")).first()[0] + 1
    v_off = emb.agg(F.max("vec_id")).first()[0] + 1

    def rep(df, exprs):
        parts = [df.selectExpr(*[e.format(i=i) for e in exprs])
                 for i in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    rep(cust, [
        f"c_custkey + {{i}} * {c_off} AS c_custkey",
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ]).write.mode("overwrite").parquet(f"{OUT}/customer.parquet")

    rep(orders, [
        f"o_orderkey + {{i}} * {o_off} AS o_orderkey",
        f"o_custkey + {{i}} * {c_off} AS o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ]).write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    li_cols = [c for c in li.columns if c != "l_orderkey"]
    rep(li, [f"l_orderkey + {{i}} * {o_off} AS l_orderkey"] + li_cols
        ).write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")

    rep(ev, [
        f"event_id + {{i}} * {e_off} AS event_id",
        "ts",
        f"user_id + {{i}} * {u_off} AS user_id",
        "event_type", "value", "props",
    ]).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    # Per-(token, copy) coin (module docstring): injective remap per
    # copy preserves within-copy Jaccard exactly; every token stays
    # unsuffixed in half the copies so the Zipf head's corpus share
    # is scale-invariant. HOF transform is interpreted-per-element
    # (CLAUDE.md) but the build is one-time and untimed.
    rep(docs, [
        f"doc_id + {{i}} * {d_off} AS doc_id",
        "array_join(transform(split(text, ' '), t -> "
        "CASE WHEN pmod(xxhash64(t) + {i}, 2) = 0 THEN t "
        "ELSE concat(t, '_{i}') END), ' ') AS text",
        "lang", "source", "n_chars",
    ]).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # Per-copy diagonal +-1 sign flip (module docstring): orthogonal,
    # so within-copy cosines/norms are bit-preserved while cross-copy
    # cosine collapses — no exact-twin degeneracy. transform() with
    # the POSITIONAL lambda arg gives the dimension index.
    emb_parts = []
    for i in range(COPIES):
        emb_expr = (
            "embedding" if i == 0 else (
                "transform(embedding, (x, d) -> CASE WHEN "
                f"pmod(xxhash64(concat(cast(d AS STRING), '|', {i})), 2)"
                " = 0 THEN x ELSE -x END) AS embedding"
            )
        )
        emb_parts.append(emb.selectExpr(
            f"vec_id + {i} * {v_off} AS vec_id", emb_expr, "label"
        ))
    emb_out = emb_parts[0]
    for p in emb_parts[1:]:
        emb_out = emb_out.unionByName(p)
    emb_out.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")


# Maintenance queries serve from a persisted, content-keyed artifact
# (knn_graph_artifact): their steady state — the thing maintenance
# models — is "artifact exists, absorb the delta". One untimed run per
# SF pays the one-time index construction so the timed run measures
# maintenance, not construction (construction's own scaling is probed
# separately: knn_self_join's documented exact tier / knn_ivf above
# the gate).
ARTIFACT_WARM = [
    # builds the content-keyed nib-bucketed events staging once; the
    # timed run then measures the pruned-scan serve path
    "stream_join_completeness_sampled",
    "knn_graph_maintain",
    # r9: same build-once/serve-many contract as knn_graph_maintain —
    # cold IVF artifact builds were polluting every timed point
    # (base 53s > 10x 15.8s; the 100x "b=1.25" was the first-ever
    # cold build at that SF, not the maintenance delta)
    "ivf_maintain_report",
    # these four share ONE full-corpus graph artifact; warming any of
    # them builds it once and the rest serve from parquet
    "embedding_pagerank",
    "knn_graph_degrees",
    "knn_kcore",
    "knn_bfs_hops",
]


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# SCALE_JSON_PATH lets parallel sweep shards write disjoint sidecars
# (merged back into SCALE.json by the orchestrator) without
# read-modify-write races on the shared file.
SCALE_JSON = os.environ.get(
    "SCALE_JSON_PATH", os.path.join(REPO_ROOT, "SCALE.json")
)

SCALE_JSON_SCHEMA = (
    "queries.<name> -> {t_base_s (sf0.1 wall), t10x_s/t30x_s/t100x_s "
    "(replica wall at 10x/30x/100x copies), ratioNx (vs t_base_s), "
    "rows_Nx, b (power-law exponent t=a*n^b fitted on the two LARGEST "
    "available scale points; SUPPRESSED — b_suppressed says why — when "
    "the fit would span base+10x with a sub-second base, whose ~0.3-"
    "0.5s fixed per-job floor fakes an exponent), t100x_proj_s "
    "(single-node projection from the largest point at exponent b; "
    "absent when a MEASURED t100x_s exists)}"
)


def _refit(q: dict) -> None:
    """(Re)derive b and the 100x projection from the two LARGEST
    points currently stored for one query. Centralized so a late 30x/
    100x point always replaces an earlier base+10x fit — round 7 left
    heavy_hitters_cms at b=1.34 off a floor-dominated sub-second base
    while its measured 30x/100x points were flat."""
    import math

    pts = [(1.0, q.get("t_base_s"))] + [
        (float(c), q.get(f"t{c}x_s")) for c in (10, 30, 100)
        if q.get(f"t{c}x_s") is not None
    ]
    pts = [(n, t) for n, t in pts if t and t > 0]
    q.pop("b", None)
    q.pop("b_suppressed", None)
    q.pop("t100x_proj_s", None)
    if len(pts) < 2:
        return
    (n0, t0), (n1, t1) = pts[-2], pts[-1]
    if n0 == 1.0 and t0 < 1.0:
        q["b_suppressed"] = (
            "only base+10x points and the sub-second base is fixed-"
            "job-floor-dominated; an exponent here would trend the "
            "floor, not the operator"
        )
        return
    b = math.log(t1 / t0) / math.log(n1 / n0)
    q["b"] = round(b, 2)
    if q.get("t100x_s") is None and n1 < 100:
        q["t100x_proj_s"] = round(t1 * (100.0 / n1) ** b, 1)


def _update_scale_json(
    name: str, t_base: float, t_big: float, rows_big: int, copies: int
) -> None:
    """Merge one probe point into the machine-readable scale record.

    Written incrementally (atomic replace per query) so a crashed
    exhaustive sweep keeps every completed point, and the driver can
    trend exponents across rounds the way it trends bench keys."""
    import json
    import math

    data: dict = {}
    if os.path.exists(SCALE_JSON):
        try:
            with open(SCALE_JSON) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            data = {}
    data["schema"] = SCALE_JSON_SCHEMA
    data["base_sf_dir"] = BASE
    q = data.setdefault("queries", {}).setdefault(name, {})
    q["t_base_s"] = t_base
    q[f"t{copies}x_s"] = t_big
    q[f"ratio{copies}x"] = round(t_big / t_base, 2) if t_base else None
    q[f"rows_{copies}x"] = rows_big
    _refit(q)
    tmp = SCALE_JSON + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    os.replace(tmp, SCALE_JSON)


def drop_stream_sinks(spark) -> None:
    """Measurement hygiene between probes, two parts.

    (a) Release memory-sink tables left by streaming queries: each
    stream run registers a uniquely-named temp view over an in-heap
    MemorySink; in a long-lived probe JVM those pin every batch's
    rows (a 100x sampled-audit warm run left ~1M rows resident).
    Queries never share sinks across calls, so dropping all temp
    views between probes is safe.

    (b) Force a full GC: a 100x-scale shuffle leaves the 24g local
    heap dirty enough that the NEXT big run pays full-GC pauses
    mid-query — measured q21@100x 10.5s on a clean heap, 60.9s on a
    dirty one, 12.0s again right after System.gc(). A real cluster
    runs steady-state per-executor heaps; without this the probe
    measures the previous query's garbage, not the operator."""
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.catalog.dropTempView(t.name)
    spark.sparkContext._jvm.System.gc()


def time_one(spark, sf_dir: str, name: str) -> tuple[float, int]:
    from dbeam_spark.queries import QUERIES

    t0 = time.monotonic()
    rows = QUERIES[name](spark, sf_dir).collect()
    el = round(time.monotonic() - t0, 2)
    drop_stream_sinks(spark)
    return el, len(rows)


def time_export(spark, sf_dir: str) -> tuple[float, int]:
    import tempfile

    from dbeam_spark.avro.schema import spark_schema_to_avro
    from dbeam_spark.avro.writer import write_avro
    from dbeam_spark.sources.files import load_table

    li = load_table(spark, sf_dir, "lineitem").repartition(32)
    out = tempfile.mkdtemp(prefix="scale_avro_")
    t0 = time.monotonic()
    stats = write_avro(
        li, out, spark_schema_to_avro(li.schema, "lineitem"),
        codec="deflate6",
    )
    el = time.monotonic() - t0
    shutil.rmtree(out, ignore_errors=True)
    return round(el, 2), sum(s["rows"] for s in stats)


def ensure_replica(spark) -> None:
    """Build (or rebuild) the COPIES-x replica when absent or stale —
    the single shared entry point for scale_probe and probe_subset so
    every build path stamps `_SOURCE_KEY`."""
    src_key = source_key(BASE)
    key_file = f"{OUT}/_SOURCE_KEY"
    stale = os.path.exists(OUT) and (
        not os.path.exists(key_file)
        or open(key_file).read() != src_key
    )
    if stale:
        print("replica stale vs regenerated testdata/builder - "
              "rebuilding", flush=True)
        shutil.rmtree(OUT)
    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        print(f"building {COPIES}x replica ...", flush=True)
        build(spark)
        with open(key_file, "w") as fh:
            fh.write(src_key)


def refit_all() -> int:
    """Recompute b / t100x_proj_s for EVERY stored query from the
    points on record (no Spark). Run after the fit rule changes or
    after a sweep lands new points out of order."""
    import json

    with open(SCALE_JSON) as fh:
        data = json.load(fh)
    data["schema"] = SCALE_JSON_SCHEMA
    for q in data.get("queries", {}).values():
        _refit(q)
    tmp = SCALE_JSON + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    os.replace(tmp, SCALE_JSON)
    return len(data.get("queries", {}))


def main() -> None:
    global PROBES
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if "--refit" in sys.argv:
        print(f"refit {refit_all()} queries")
        return
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
        PROBES = [n for n in names if n]
    elif "--all" in sys.argv:
        # exhaustive mode: probe EVERY registered query (the default
        # list is the curated heavy set; --all sweeps the long tail
        # where an unprobed data-scaled stage could still hide)
        from dbeam_spark.queries import QUERIES as _Q

        PROBES = sorted(_Q)
    from dbeam_spark.session import get_spark

    # local-mode driver hosts the executors: size the single JVM for
    # the 10x shuffles (the 1g default is tuned for the sf0.1 gates)
    spark = get_spark(
        "scale-probe", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv and os.path.exists(OUT):
        shutil.rmtree(OUT)
    # staleness guard: the driver REGENERATES testdata between rounds
    # (CLAUDE.md), and the builder itself versions its semantics.
    ensure_replica(spark)

    from dbeam_spark.queries import QUERIES

    for name in ARTIFACT_WARM:
        if name in PROBES:
            QUERIES[name](spark, BASE).collect()
            QUERIES[name](spark, OUT).collect()
            drop_stream_sinks(spark)

    # Interleaved per-query (warm at sf0.001 -> time base -> time
    # replica -> print + persist) so a long --all sweep streams
    # results and a crash loses at most one query's points.
    print(f"{'query':28s} {'sf0.1':>8s} {COPIES:>6d}x {'ratio':>6s}"
          "  rows(big)", flush=True)
    for name in PROBES:
        QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        b, _ = time_one(spark, BASE, name)
        g, nrows = time_one(spark, OUT, name)
        ratio = g / b if b else float("nan")
        print(f"{name:28s} {b:8.2f} {g:8.2f} {ratio:6.1f}  {nrows}",
              flush=True)
        _update_scale_json(name, b, g, nrows, COPIES)
    if "--no-export" in sys.argv:
        # short-batch mode: re-probing one query's fit point must not
        # pay (or overwrite) the export timing — the 100x export is
        # ~35-116s depending on host weather and would land as a
        # single-shot point taken at the END of a dirty batch, the
        # exact late-entry inflation the harness notes warn about.
        spark.stop()
        return
    eb, _ = time_export(spark, BASE)
    eg, erows = time_export(spark, OUT)
    ratio = eg / eb if eb else float("nan")
    print(f"{'avro_export_lineitem':28s} {eb:8.2f} {eg:8.2f} "
          f"{ratio:6.1f}  {erows}", flush=True)
    _update_scale_json("avro_export_lineitem", eb, eg, erows, COPIES)
    spark.stop()


if __name__ == "__main__":
    main()
