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
