"""Property-based tests (hypothesis): the Avro encoder round-trips
arbitrary values and the split-range generator preserves coverage
invariants for any bounds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from dbeam_spark.avro.reader import read_avro_file
from dbeam_spark.avro.schema import spark_schema_to_avro
from dbeam_spark.avro.writer import OcfEncoder
from dbeam_spark.query_builder import generate_ranges

_longs = st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1))
_strings = st.one_of(st.none(), st.text(max_size=80))
_doubles = st.one_of(
    st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)
)
_bools = st.one_of(st.none(), st.booleans())
_blobs = st.one_of(st.none(), st.binary(max_size=64))
_arrays = st.one_of(
    st.none(), st.lists(st.integers(-(2**31), 2**31 - 1), max_size=8)
)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_longs, _strings, _doubles, _bools, _blobs, _arrays),
        max_size=25,
    ),
    codec=st.sampled_from(["null", "deflate1", "deflate6"]),
)
def test_avro_roundtrip_any_values(tmp_path_factory, rows, codec):
    schema = spark_schema_to_avro(
        T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("b", T.StringType()),
                T.StructField("c", T.DoubleType()),
                T.StructField("d", T.BooleanType()),
                T.StructField("e", T.BinaryType()),
                T.StructField("f", T.ArrayType(T.IntegerType())),
            ]
        ),
        "t",
    )
    enc = OcfEncoder(schema, codec)
    cols = [list(c) for c in zip(*rows)] if rows else [[], [], [], [], [], []]
    p = tmp_path_factory.mktemp("avro") / "t.avro"
    p.write_bytes(enc.header() + b"".join(enc.encode_rows(cols)))
    _, got = read_avro_file(str(p))
    assert len(got) == len(rows)
    for (a, b, c, d, e, f), (ga, gb, gc, gd, ge, gf) in zip(rows, got):
        assert ga == a and gb == b and gd == d
        assert gc == c  # exact IEEE754 round-trip
        assert ge == (bytes(e) if e is not None else None)
        assert gf == f


@settings(max_examples=200, deadline=None)
@given(
    min_v=st.integers(-(2**40), 2**40),
    span=st.integers(0, 2**40),
    parallelism=st.integers(1, 64),
)
def test_generate_ranges_invariants(min_v, span, parallelism):
    max_v = min_v + span
    ranges = generate_ranges(min_v, max_v, parallelism)
    # never more splits than requested; at least one
    assert 1 <= len(ranges) <= parallelism
    # full coverage, contiguous, inclusive end
    assert ranges[0].start_incl == min_v
    assert ranges[-1].end == max_v and not ranges[-1].end_excl
    for prev, nxt in zip(ranges, ranges[1:]):
        assert prev.end == nxt.start_incl and prev.end_excl


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_longs, _doubles, _strings, _bools),
        min_size=1,
        max_size=60,
    ),
)
def test_vectorized_encoder_matches_scalar(rows):
    """encode_pdf (numpy fast path) must be byte-identical to the
    scalar encode_rows for any longs/doubles/strings/bools, including
    None, NaN via mask, negative varint edges, and unicode."""
    import numpy as np
    import pandas as pd

    from dbeam_spark.avro.writer import _normalize_series

    schema = spark_schema_to_avro(
        T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("d", T.DoubleType()),
                T.StructField("s", T.StringType()),
                T.StructField("b", T.BooleanType()),
            ]
        ),
        "prop",
    )
    enc = OcfEncoder(schema, "null")
    cols = list(map(list, zip(*rows)))
    scalar = b"".join(enc.encode_rows(cols))

    # pandas frame the way Arrow delivers it: float col holds NaN for
    # null (mask carries true nullness), object cols hold None
    mask = pd.Series([v is None for v in cols[1]])
    pdf = pd.DataFrame(
        {
            "a": pd.Series(cols[0], dtype="object"),
            "d": pd.Series(
                [float("nan") if v is None else v for v in cols[1]],
                dtype="float64",
            ),
            "s": pd.Series(cols[2], dtype="object"),
            "b": pd.Series(cols[3], dtype="object"),
        }
    )
    # object-dtype long column exercises the per-column fallback;
    # ALSO exercise the numpy path when no nulls are present
    fast = b"".join(enc.encode_pdf(pdf, {"d": mask}))
    assert fast == scalar
    if all(v is not None for v in cols[0]):
        pdf2 = pdf.assign(a=np.array(cols[0], dtype=np.int64))
        fast2 = b"".join(enc.encode_pdf(pdf2, {"d": mask}))
        assert fast2 == scalar


@given(
    st.lists(
        st.text(
            alphabet="ab c",  # tiny alphabet forces merges + ties
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=30, deadline=None)
def test_bpe_merge_apply_consistency(texts):
    """Property: applying learned merges never yields more tokens
    than characters(+word marks), at least one token per word, and
    the encoder is deterministic across invocations (the tie-break
    contract that makes re-tokenizing shards reproducible)."""
    import re

    from dbeam_spark.operators.tokenizer import bpe_encode_expr

    # train on a local histogram (pure-python path of bpe_train)
    words: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                words[w] = words.get(w, 0) + 1
    if not words:
        return
    hist = [(list(w) + ["</w>"], n) for w, n in sorted(words.items())]
    merges = []
    for _ in range(10):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in hist:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for syms, _ in hist:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i: i + 2] = [a + b]
                else:
                    i += 1

    part = bpe_encode_expr(merges)
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    out1 = pd.concat(list(part(iter([pdf]))), ignore_index=True)
    out2 = pd.concat(list(part(iter([pdf]))), ignore_index=True)
    assert out1.equals(out2)  # deterministic
    for txt, n_tok in zip(texts, out1["n_bpe_tokens"]):
        ws = [w for w in re.split(r"\s+", txt.lower()) if w]
        assert n_tok >= len(ws) or not ws  # >= one token per word
        assert n_tok <= sum(len(w) + 1 for w in ws)  # <= chars + marks


@settings(max_examples=30, deadline=None)
@given(
    blob=st.binary(max_size=4096),
    chunk=st.integers(1, 512),
)
def test_file_crc32_streaming_equals_whole(tmp_path_factory, blob, chunk):
    """file_crc32 streams in chunks; any chunking must equal the
    one-shot zlib.crc32 of the full content."""
    import zlib

    from dbeam_spark.avro.writer import file_crc32

    p = tmp_path_factory.mktemp("crc") / "f.bin"
    p.write_bytes(blob)
    assert file_crc32(str(p), chunk=chunk) == (zlib.crc32(blob) & 0xFFFFFFFF)
