"""Per-query annotations for the exhaustive scale sweep (SCALE.json).

Merged at RENDER time by tools/render_scale_md.py — SCALE.json stays
a pure measurement record that any probe run can regenerate, and the
explanations live in code review's path.

Reading the ratios: the replica is 10x the base rows, so a perfectly
LINEAR operator shows ratio ≈ 10 minus whatever fixed overhead the
base run amortizes (most sub-second bases carry a ~0.3-0.5s job
floor, which inflates nothing but the BASE side). Entries between 3x
and 10x are therefore at-most-linear and need no defense; the notes
below name the bounded grain for those, and explain every entry that
is structurally super-linear (a quadratic tier, a python codec, a
per-key stateful floor) or that was fixed during the sweep.
"""

NOTES: dict[str, str] = {
    "stream_join_completeness": (
        "r9 third-session catch (#18): the outer-join audit's RAW "
        "match ledger (~30M rows at 100x) sat in the in-heap memory "
        "sink — the catch-#14 shape rule's fourth instance — and "
        "was the fleet's biggest wall (468s, b=1.32). Parquet sink "
        "+ distributed 4-long report: 21.5s at 100x, b=0.07; the "
        "stream-stream join itself was never the problem."
    ),
    "stream_join_completeness_sampled": (
        "nib-bucketed 12.5% key-sample serve path; r9 third session "
        "moved its ledger to the same parquet-sink shape as the "
        "exhaustive twin (flat before and after; the sampled scan "
        "was already the win)."
    ),
    "window_suite_orders": (
        "full analytic-window ladder, ONE shuffle on o_custkey; "
        "output 15M rows at 100x, collect-bound. r9 third session "
        "dropped the terminal range sort (plan: 1 exchange fewer); "
        "62.4s min at 100x in weather-swung windows (weather_note)."
    ),
    "dataset_split": (
        "leakage-safe split re-derives the near-dup component map "
        "(MinHash tier, linear) before assigning; terminal sort "
        "removed r9 third session; 100x point weather-bound "
        "(weather_note)."
    ),
    "stream_session_window_bounded": (
        "day-epoch-bounded sessionizer (r8 skew directive); first "
        "full fit sweep r9 third session on the parquet-sink ledger "
        "shape; 100x point taken in degraded host windows "
        "(weather_note) — its skew posture (0.59x/0.85x under the "
        "mega key) is the designed-for evidence."
    ),
    "multimodal_png_decode": (
        "pure-python zlib/PNG decode, row-linear with a heavy "
        "per-row constant (same declared trade as the JPEG tier); "
        "first measured 100x: 31.1s, b=0.82 — the old b=0.49 "
        "projection (13.4s) undershot; tail-conversion catch, no "
        "code change."
    ),
    # ---- structurally quadratic tiers (kept deliberately) ----
    "knn_self_join": (
        "exact kNN self-join: O(n²d) FLOPs at dgemm speed (bounded "
        "32MB temps since r7); 10x data = 100x FLOPs, 21x wall = "
        "memory-system-friendly. The SCALE path is knn_ivf "
        "(O(n^1.5), b=0.69); this exact tier is the recall oracle."
    ),
    "dedup_embedding": (
        "exact all-pairs cosine under the 500k-row size gate: "
        "quadratic FLOPs at chunked-dgemm speed (was 20.6x with "
        "unbounded 16GB temps, 9.8x after r7 chunking). CORRECTED "
        "r8: the 30x replica holds 60k embedding rows — UNDER the "
        "gate, so every probe point to date ran the exact tier (the "
        "r7 note claimed 600k/gate-crossed, same error the judge "
        "caught on dedup_semantic_clusters). The above-gate RH-LSH "
        "path is exercised and recall-MEASURED by dedup_rh_lsh_recall. "
        "r9 measured 100x directly: 192s for 10^4x the FLOPs (wall "
        "grows ~101x — dgemm efficiency absorbs half the exponent); "
        "the gate_flip block measures the above-gate route it hands "
        "off to at 600k vectors."
    ),
    "dedup_embedding_lsh": (
        "EVAL query: scores the LSH path against the exhaustive "
        "exact twin, so it pays the quadratic ground-truth build by "
        "definition. The LSH side alone is flat (3.4s at 10x; "
        "occupancy-targeted plane count keeps candidates linear). "
        "Audit cadence, not per-batch."
    ),
    "dedup_semantic_clusters": (
        "exact cosine pair tier under the size gate (see "
        "dedup_embedding) + O(log n) component rounds; above the "
        "gate pair-gen is the flat RH-LSH path."
    ),
    "dedup_lsh_recall": (
        "EVAL query: exhaustive shingle-join ground truth is the "
        "cost ceiling by design (audit cadence); the production "
        "MinHash path it scores is b=0.82."
    ),
    "dedup_ngram_jaccard": (
        "exact-Jaccard tier via AllPairs/PPJoin prefix filtering — "
        "candidate volume is data-dependent but df-bounded; 5.5x at "
        "10x data is sub-linear per candidate. The production "
        "near-dup path is dedup_minhash_lsh."
    ),
    # ---- python-codec / Arrow-kernel constants (row-linear) ----
    "multimodal_jpeg_decode": (
        "pure-python baseline JPEG codec: row-linear (7.3x at 10x "
        "rows, 88s at 30x) with the heaviest per-row constant in "
        "the fleet — the declared trade for a sandbox with no image "
        "libs; the Spark plumbing (binary source, Arrow batches, "
        "partitioning) is the part that ships."
    ),
    "avro_roundtrip_audit": (
        "FIXED mid-sweep: a fixed 8-file export serialized the "
        "file-per-task read-back (65s / 15.3x at 10x); export width "
        "now scales with row volume (250k rows/file absolute bound) "
        "and read-back parallelism follows — 25.2s at 10x, 29.1s at "
        "30x (b=0.13: core-bound python OCF decode, widening files "
        "saturates the 32 cores)."
    ),
    # ---- stateful streaming: per-key floor, keys scale with data ----
    "stream_throttle": (
        "applyInPandasWithState costs ~70us/key/batch regardless of "
        "kernel speed; replica keys scale with data, so wall scales "
        "with KEY cardinality (documented CLAUDE.md floor). r9 item "
        "14 pruned the Python boundary to 3 columns and switched to "
        "the template emit: same-window A/B 93.2 -> 74.9s at 100x "
        "(750k user*type keys); what remains IS the API floor."
    ),
    "stream_survival_km": (
        "stateful stream over ~15k custkeys/copy — same per-key "
        "floor as stream_throttle; r9 item 14's template emit cut "
        "the per-key constant: same-window A/B 175.4 -> 93.2s at "
        "100x (1.5M keys)."
    ),
    "stream_stateful_user_stats": (
        "r9 item 14: kernel reads only `value` — 2-column boundary "
        "+ template emit, same-window A/B 53.5 -> 12.3s at 100x "
        "(150k user keys)."
    ),
    "stream_balance_floor": (
        "r9 item 14 vectorized the zero-clamped running fold "
        "(cumsum reflection closed form, exact int64, pinned by "
        "tests/test_stateful_kernel_vectorized.py); per-batch folds "
        "are short (~67 events/key across the run) so the per-key "
        "API floor dominates: same-window A/B 27.5 -> 25.7s at "
        "100x."
    ),
    "stream_markov_stationary": (
        "r9 item 14: per-row transition zip -> np.unique coding + "
        "bincount over coded pairs, 4-column boundary; same-window "
        "A/B 95.6 -> 42.4s at 100x (150k user keys)."
    ),
    # ---- eval/composed pipelines whose grain is the corpus ----
    "cdc_rollup_demo": (
        "r9 fix of the judge's b=1.21 flag: the demo's three export "
        "runs went through write_avro(coalesce(4)) — a 4-task python "
        "OCF encode no matter the run size (20M rows at 100x = the "
        "215.7s wall was serial encode, not the rollup fold). "
        "Full-width repartition before the writer: 44.5s at 100x, "
        "b=0.38."
    ),
    "training_corpus": (
        "five-stage composed pipeline (normalize -> quality -> dedup "
        "-> sample -> pack); every stage individually probed linear; "
        "terminal determinism sort removed r9 third session. Its "
        "100x point is weather-bound (see weather_note: the "
        "unchanged control read 1.88x its committed wall in the "
        "same windows)."
    ),
    "split_contamination": (
        "shingle-overlap check between splits — candidate volume "
        "df-bounded (absolute cap), 3.2x at 10x."
    ),
    "dedup_longest_span": (
        "K-gram position-island spans: token-linear (b=1.05 at 30x "
        "in the r6 memo); 4.2x at 10x."
    ),
    "dedup_clusters": (
        "shingle-Jaccard pairs + O(log n) min-label propagation "
        "rounds; 3.4x at 10x."
    ),
    "dedup_survivorship": (
        "pair tier + per-cluster keep/drop ledger; 3.4x at 10x."
    ),
    "dedup_threshold_sweep": (
        "r9 decade catch #16: the tau>=0.1 band curve needs the RAW "
        "shingle self-join (AllPairs prefixes prune ~nothing at "
        "tau=0.1), which ran corpus-wide with NO df cap — 230s / "
        "b=1.56 at 100x while the 10x point read a flat 2.6x. "
        "Re-tiered onto the key-sampled 20k-doc certification slice "
        "(cap restated in the oracle; exhaustive below the cap): a "
        "threshold curve is a statistic, a fixed-size key sample "
        "estimates it at any corpus size."
    ),
    "dedup_source_flow": (
        "MinHash pair tier + source-pair rollup; 4.6x at 10x."
    ),
    "dedup_span_share": ("token-linear span accounting; 3.1x at 10x."),
    "text_quality": (
        "pure-Catalyst per-doc heuristics; r9 swapped the per-char "
        "[^a-z0-9 ] regex for translate's char map (41.3 -> 4.2s at "
        "100x; the regex was also paid twice via the orderBy range "
        "partitioner's sampling pass). The orderBy itself is gone "
        "since the third session (terminal-sort sweep): no sampling "
        "pass at all, 3.6s min at 100x."
    ),
    "dedup_containment": (
        "r9: naive shingle equi-join (b=2.2, 112s at 30x) -> "
        "one-sided AllPairs prefix (min side prunes, full index on "
        "the large side) + extended-prefix count filter (e=2, "
        "candidates 4.69M -> 9.5k at 30x); exact array verify. "
        "b=0.33, 25s at 100x."
    ),
    "ngram_novelty": ("token-linear n-gram hashing; 4.4x at 10x."),
    "ivf_maintain_report": (
        "build-once/serve-many IVF artifact + LSM maintenance: timed "
        "runs previously included the COLD artifact build at each SF "
        "(the fake b=1.25); warmed via ARTIFACT_WARM since r9 like "
        "knn_graph_maintain, the timed run is the fixed-size-batch "
        "maintenance delta: 38.3s at 100x, b=0.26 (min-of-2 — LSM "
        "compaction cadence makes single shots bimodal)."
    ),
    "source_ngram_overlap": (
        "df-capped posting intersections (absolute cap since r6); "
        "3.1x at 10x."
    ),
    "text_tokens": (
        "token-linear; r9 third session dropped the terminal "
        "determinism sort — the plan is now exchange-FREE map-only "
        "(12.9 -> 6.8s at 100x)."
    ),
    "interval_join_events": (
        "count-only interval join: rank difference over a global "
        "prefix sum (r7 catch #13 — the pair plan was density-"
        "quadratic, 205s at 100x; rank plan 16.6s, size-gated to "
        "the pair plan's lower constant below 1M events). r9 third "
        "session dropped the terminal sort: 16.6 -> 11.7s at 100x."
    ),
    "asof_join_events": (
        "per-key ordered-stream carry, linear; the 100x wall is "
        "dominated by collecting the 2M result rows. r9 third "
        "session dropped the terminal sort: 13.9 -> 7.3s at 100x."
    ),
    "events_session_window": (
        "session windows over user keys, output row-linear (977k "
        "rows at 10x, 9.8M at 100x) — output-bound: the wall is "
        "collecting the sessions. r9 third session removed the "
        "terminal determinism orderBy (range exchange of 9.8M rows "
        "gone from the plan); 55.3s min at 100x in a weather-swung "
        "window (see the entry's weather_note)."
    ),
    "stream_session_hour_overlap": (
        "r9 decade catch: the sealed-session LEDGER (~10M rows at "
        "100x) previously landed in the in-heap memory sink and "
        "ABORTED the 100x run on spark.driver.maxResultSize "
        "(1038 MiB > 1 GiB) — the stream_dedup raw-rows rule, not a "
        "slow path. Re-sunk to parquet + distributed rollup: 21.3s "
        "at 100x, near-flat (b=0.14); only the <=20-row report is "
        "collected."
    ),
    "q12_shipping_delay": (
        "join+agg, shuffle-bound. The first sweep's 17.6s/4.7x point "
        "was co-run contamination (parallel shards); re-measured "
        "quiet: 2.8s / 1.8x at 10x, 3.6s at 30x — flat."
    ),
    # ---- round-8 additions / catches ----
    "kfold_cluster_assignment": (
        "r8 catch at the 100x decade: `pairs` had TWO consumers (CC "
        "absorbs it into its edge checkpoint; the leak join does "
        "not), so the full AllPairs tier ran twice — 1070s at 100x "
        "vs dedup_clusters' 209s. Fixed with an eager localCheckpoint "
        "and re-measured: 1070s -> 89.6s at 100x (ratio 8.8x); the "
        "multi-consumer-lazy-frame rule generalized to expensive "
        "operator outputs."
    ),
    "dedup_incremental": (
        "EVAL query: the operator path (persisted signature index, "
        "per-batch band probe) is what stream_dedup_index times; the "
        "100x wall here is dominated by the declared gate instrument "
        "— the exhaustive AllPairs ground truth at tau-4sigma=0.35, "
        "whose candidate volume grows superlinearly as the loose "
        "threshold lengthens prefixes. Audit cadence, not per-batch."
    ),
    "stream_session_window": (
        "r8 catch: flush_sentinel forced one-file-per-batch, so a "
        "32-file replica ran 33 state-store commits AND silently "
        "dropped most later batches' events as late (rows flat at "
        "196k/198k/204k across 10x/30x/100x = the drop signature). "
        "All real files now land in ONE batch, the sentinel alone in "
        "batch 2: 100x measured 213s -> 114s while emitting the FULL "
        "drop-free 9.78M sessions (48x the survivors) — answers the "
        "r7 394s projection; b was an artifact of the drop regime. "
        "r9 third session: the 9.8M-row session ledger moved from "
        "the in-heap memory sink to a PARQUET sink (catch-#14 shape "
        "rule; the sentinel filter must stay on the batch read or "
        "it is pushed below the watermark and the last sessions "
        "never seal) and the terminal sort was dropped; wall ~flat "
        "(84.5s min) — the session state machine + output volume "
        "dominate, the sink was a driver-safety fix here, not a "
        "wall win."
    ),
    "multimodal_jpeg_sampled_audit": (
        "the 100 TB JPEG posture: structural screen on every asset "
        "(marker walk + scan byte range, no entropy decode) + full "
        "decode on an md5-gated ABSOLUTE-256 sample. Decode work is "
        "constant in corpus size; the linear term is the screen + "
        "(test-scaffolding) asset synthesis."
    ),
    "uniqueness_audit_sampled": (
        "key-sampled DQ audit over the stage_key_buckets layout: "
        "reads ONLY the 2/16 sampled nibble dirs, so audit bytes "
        "scale with the sample fraction. First run per dataset pays "
        "the one-time staging build (content-keyed, shared with the "
        "stream completeness audit)."
    ),
    "stream_dedup_index": (
        "EVAL query: the streaming index topology itself is linear "
        "(3 fixed batches, band probes scale with the batch); like "
        "dedup_incremental, the 100x wall (490s, x8.4 for x3.33 data "
        "in the 30->100 decade) is dominated by the gate instrument "
        "— the exhaustive AllPairs ground truth at tau-4sigma=0.35. "
        "Audit cadence."
    ),
    "dedup_rh_lsh_recall": (
        "EVAL query for the ABOVE-GATE semantic tier: plants a "
        "cos>=0.98 twin per md5-gated vector and measures RH-LSH "
        "recall at threshold 0.95 (floor 0.8, expected ~0.999). "
        "Cost is the LSH path itself (linear bucket shuffle) plus "
        "the planted-twin synthesis."
    ),
}
