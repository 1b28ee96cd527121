"""Text-analysis column expressions for the `documents` table.

Everything here is a pure Catalyst column expression (JVM-side,
whole-stage-codegen) — no Python touches row data, so these run at
scan speed on 100 TB. Regex patterns are kept to the common subset of
Java regex (Spark) and RE2 (DuckDB) so oracles match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Chosen to be disjoint across languages.
LANG_MARKERS = {
    "en": r"\b(the|of|and|is)\b",
    "es": r"\b(el|la|los|es)\b",
    "fr": r"\b(le|les|est|une)\b",
}

_WORD_SPLIT = r"\s+"

# the keep-set for n_symbol_chars: exactly the complement of the
# oracle regex [^a-z0-9 ]
_KEEP_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 "


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(text), _WORD_SPLIT)


def n_ws_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def n_symbol_chars(text: Column) -> Column:
    """Count of characters outside [a-z0-9 ] in the lowercased text —
    value-identical to size(regexp_extract_all(lower, '[^a-z0-9 ]'))
    (each match of that class is exactly one code point, and both
    length() and translate() operate per code point), but via
    translate's O(1) char map instead of the regex engine. Per-char
    regex iteration measured 19.7 s of text_quality's 41 s wall at
    the 100× probe (~20 ns/char over ~1 GB of text); the translate
    form runs at scan speed. DuckDB oracles keep the regex form —
    the counts are equal, so hashes match."""
    low = F.lower(text)
    # translate DELETES the matched (keep-set) chars, so what remains
    # is exactly the symbol characters
    return F.length(F.translate(low, _KEEP_CHARS, ""))


def n_bpe_tokens(text: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    punctuation marks each count as one token."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), 0))
        for lang, pat in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    """Argmax of marker-hit counts with a fixed priority order
    (en > es > fr) on ties; 'und' when nothing matches."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    out = F.lit("und")
    # reversed() so earlier languages win ties via later WHEN override
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((s[lang] > 0) & (s[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]: rewards mid-length
    docs and prose-like word lengths, penalizes symbol soup.

    Built from quality_from_counts over the three count columns; use
    that two-stage form (see text_quality) when scanning a corpus so
    the tokenizing split runs once per row instead of once per
    reference."""
    n_chars = F.length(text)
    n_words = n_ws_tokens(text)
    n_symbols = n_symbol_chars(text)
    return quality_from_counts(n_chars, n_words, n_symbols)


def quality_from_counts(
    n_chars: Column, n_words: Column, n_symbols: Column
) -> Column:
    """quality_score's arithmetic over pre-computed counts. The word
    and symbol counts are each referenced more than once below
    (avg_word_len appears in both BETWEEN comparisons); computing
    them in a SEPARATE upstream projection guarantees one evaluation
    per pass (codegen subexpression elimination usually dedupes the
    inlined form too — the 100× probe measured no difference — but
    the two-stage shape makes it structural rather than
    optimizer-dependent)."""
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    symbol_ratio = n_symbols / n_chars
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_len_score = F.when(
        (avg_word_len >= 3) & (avg_word_len <= 8), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(
        length_score * 0.5 + word_len_score * 0.3 + (1.0 - symbol_ratio) * 0.2, 4
    )


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct vocabulary —
    order-insensitive, whitespace-normalization-insensitive."""
    vocab = F.array_sort(F.array_distinct(tokens(text)))
    return F.md5(F.concat_ws(" ", vocab))


def zlib_compress_stats(df):
    """Per-doc zlib(level 6) compression stats: (doc_id, raw_len,
    comp_len, ratio_x1e4). Map-only Arrow pass, bytes-in/ints-out per
    batch — the Gopher-style "compression filter" signal. Exposed as
    an operator so callers get the raw ratio; the registered query
    wraps it in the gate's invariant form (DuckDB has no deflate)."""
    import pandas as pd  # noqa: F401  (mapInPandas worker import)

    from pyspark.sql import functions as F

    from dbeam_spark.operators.util import rebalance_for_arrow

    def part(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf["text"].fillna("").str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": raw.map(len),
                    "comp_len": comp,
                }
            )

    out = rebalance_for_arrow(df.select("doc_id", "text")).mapInPandas(
        part, "doc_id long, raw_len long, comp_len long"
    )
    return out.withColumn(
        "ratio_x1e4",
        F.round(F.col("comp_len") * 10000.0 / F.col("raw_len")).cast("long"),
    )


def kgram_positions(docs, k: int, id_col: str = "doc_id",
                    text_col: str = "text"):
    """(doc_id, n_tokens, pos, gram) rows for every K-token window —
    the shared frame under exact-substring dedup and its repair
    ledger. Gram identity is a 64-bit wraparound polynomial over
    per-token crc32s, computed VECTORIZED in one Arrow pass (numpy
    sliding-window matmul): the Catalyst formulation
    (transform + slice + md5(concat_ws)) evaluates interpreted per
    position — the HOF cliff CLAUDE.md records — and measured ~2×
    slower at sf0.1. Any injective-enough hash works: downstream only
    GROUPS on gram equality and the gate oracle checks span GEOMETRY,
    never hash values (collision odds across ~10⁶ grams ≈ 1e-7, and a
    collision merely merges two buckets the dup filter then splits by
    doc count). Map-only: no shuffle, output one row per token
    position, the same blowup a suffix array pays."""
    from pyspark.sql import functions as F

    from dbeam_spark.operators.util import rebalance_for_arrow

    def part(batches):
        import re
        import zlib

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+")
        P = np.int64(1000003)
        # kernel[j] = P^(k-1-j) with int64 wraparound — the mod-2^64
        # wrap IS the hash arithmetic (tests/test_properties.py pins
        # the kernel against a big-int reference), so silence numpy's
        # overflow warning by proof, not by luck
        kern = np.ones(k, dtype=np.int64)
        with np.errstate(over="ignore"):
            for j in range(k - 2, -1, -1):
                kern[j] = kern[j + 1] * P
        for pdf in batches:
            ids, nts, poss, grams = [], [], [], []
            for sid, txt in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(txt.lower())
                n = len(toks)
                if n < k:
                    continue
                h = np.fromiter(
                    (zlib.crc32(t.encode()) for t in toks),
                    dtype=np.int64,
                    count=n,
                )
                win = np.lib.stride_tricks.sliding_window_view(h, k)
                with np.errstate(over="ignore"):
                    g = (win * kern).sum(axis=1)
                m = n - k + 1
                ids.append(np.full(m, sid, dtype=np.int64))
                nts.append(np.full(m, n, dtype=np.int64))
                poss.append(np.arange(1, m + 1, dtype=np.int64))
                grams.append(g)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "n_tokens": np.concatenate(nts),
                        "pos": np.concatenate(poss),
                        "gram": np.concatenate(grams),
                    }
                )

    return rebalance_for_arrow(
        docs.select(F.col(id_col), F.col(text_col))
    ).mapInPandas(
        part, "doc_id long, n_tokens long, pos long, gram long"
    )
