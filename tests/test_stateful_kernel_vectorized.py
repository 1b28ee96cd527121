"""Pin the round-9 vectorized stateful-stream kernels against the
row-at-a-time folds they replaced (pure Python/numpy — no Spark).

stream_balance_floor's clamped fold and stream_markov_stationary's
transition counting moved from per-row Python loops to one-pass numpy
(guide §4.2). The oracle hash gate proves end-to-end equality on the
gate SFs; these tests pin the kernel math itself on adversarial
random chunks, including the multi-chunk carry the streaming state
threads across micro-batches."""

from __future__ import annotations

import numpy as np

from dbeam_spark.queries.streaming import (
    _clamped_fold_vec,
    _transition_counts,
)


def _fold_loop(bal: int, ds) -> int:
    for x in ds:
        bal = max(bal + int(x), 0)
    return bal


def test_clamped_fold_matches_row_loop():
    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(1, 60))
        d = rng.integers(-10_000, 10_000, size=n).astype(np.int64)
        bal0 = int(rng.integers(0, 5_000))
        assert _clamped_fold_vec(bal0, d) == _fold_loop(bal0, d)


def test_clamped_fold_edge_cases():
    # all-negative chunk pins to zero; all-positive never clamps;
    # single element both ways; zero deltas are a fixed point
    assert _clamped_fold_vec(0, np.array([-5], dtype=np.int64)) == 0
    assert _clamped_fold_vec(3, np.array([-5], dtype=np.int64)) == 0
    assert _clamped_fold_vec(3, np.array([4], dtype=np.int64)) == 7
    assert (
        _clamped_fold_vec(10, np.array([-100, 40], dtype=np.int64)) == 40
    )
    assert _clamped_fold_vec(9, np.zeros(5, dtype=np.int64)) == 9


def test_clamped_fold_multi_chunk_carry():
    # folding chunk-by-chunk with carry must equal one flat fold —
    # the exact shape the streaming state threads across batches
    rng = np.random.default_rng(11)
    for _ in range(100):
        chunks = [
            rng.integers(
                -100, 100, size=int(rng.integers(1, 25))
            ).astype(np.int64)
            for _ in range(int(rng.integers(2, 5)))
        ]
        bal = int(rng.integers(0, 50))
        carried = bal
        for c in chunks:
            carried = _clamped_fold_vec(carried, c)
        assert carried == _fold_loop(bal, np.concatenate(chunks))


def _transitions_loop(prev, ets) -> dict:
    ref: dict = {}
    last = prev
    for et in ets:
        if last is not None:
            ref[(last, et)] = ref.get((last, et), 0) + 1
        last = str(et)
    return ref


def test_transition_counts_matches_row_loop():
    rng = np.random.default_rng(3)
    types = np.array(
        ["view", "click", "purchase", "refund", "login"], dtype=object
    )
    for trial in range(200):
        n = int(rng.integers(1, 50))
        ets = types[rng.integers(0, len(types), size=n)]
        prev = (
            None
            if trial % 3 == 0
            else str(types[int(rng.integers(0, len(types)))])
        )
        assert _transition_counts(prev, ets) == _transitions_loop(
            prev, ets
        )


def test_transition_counts_degenerate():
    one = np.array(["view"], dtype=object)
    assert _transition_counts(None, one) == {}
    assert _transition_counts("click", one) == {("click", "view"): 1}
    rep = np.array(["view"] * 4, dtype=object)
    assert _transition_counts(None, rep) == {("view", "view"): 3}
