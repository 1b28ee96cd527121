"""Distributed BPE tokenizer training.

The GPT-2/SentencePiece reality at corpus scale: the CORPUS is huge
but the WORD HISTOGRAM is bounded (Heaps' law — a few million types
at 100 TB), so byte-pair-merge training is
  1. ONE distributed pass collapsing the corpus to (word, count) —
     the only data-scaled step, a map-side-combinable groupBy;
  2. a merge loop over the histogram, which fits the driver by
     construction (this is how the reference GPT-2 tokenizer and
     HuggingFace `tokenizers` train too — the corpus never re-scans).

Determinism: merge ties (equal pair counts) break on the
lexicographically smallest pair, so the vocab is reproducible across
engines, partitionings and runs — the property a training pipeline
needs so re-tokenizing yesterday's shards yields identical ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(
    docs: DataFrame, text_col: str = "text", max_types: int = 5_000_000
) -> list[tuple[str, int]]:
    """The distributed step: (word, count) over the corpus, one
    explode + one map-side-combinable groupBy. `max_types` caps the
    driver collect (ordered by count desc, word asc so the cutoff is
    deterministic and drops only the rarest types)."""
    hist = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_types)
    )
    return [(r["w"], r["n"]) for r in hist.collect()]


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges: returns [(left, right, pair_count)]
    in merge order. Word-internal pairs only (the </w> boundary is a
    word end marker, never merged across words)."""
    hist = word_histogram(docs, text_col)
    # each word as a symbol tuple; counts never change, only symbols
    words: list[tuple[list[str], int]] = [
        (list(w) + ["</w>"], n) for w, n in hist
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # deterministic: max count, then lexicographically smallest
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        merged = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i: i + 2] = [merged]
                else:
                    i += 1
    return merges


def bpe_encode_expr(merges: list[tuple[str, str, int]]):
    """Arrow-batched encoder: text -> token count under the learned
    vocab (the metric shard planning consumes). Ships the merge list
    in the closure; map-only."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def encode_word(w: str) -> int:
        syms = list(w) + ["</w>"]
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    def part(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+")
        cache: dict[str, int] = {}
        for pdf in batches:
            out = []
            for txt in pdf["text"]:
                total = 0
                for w in ws.split(txt.lower()):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = encode_word(w)
                    total += cache[w]
                out.append(total)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bpe_tokens": out}
            )

    return part
