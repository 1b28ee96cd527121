"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the actual decode is
stubbed (`decode_media` raises NotImplementedError; `fake_decode`
is the deterministic stand-in) — but the Spark-side contract is real:
binary column + metadata struct in, Arrow-batched `mapInPandas` with
an explicit output schema out. Swapping `fake_decode` for a PIL/ffmpeg
call is the only change needed on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real decoder entry point (PIL / soundfile / pyav on a real
    cluster). Deliberately unimplemented in this container."""
    raise NotImplementedError("media codecs are not available in this environment")


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (n_bytes, w, h) from
    the payload alone so tests and oracles are reproducible."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    On a real pipeline the payload arrives from the source (image
    bytes etc.); here it is the utf-8 encoding of the text.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ),
    )


def decode_batch(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over (doc_id, payload).

    Partitioning note: batches arrive as whole input partitions —
    size them with spark.sql.files.maxPartitionBytes so a batch of
    decoded frames fits executor memory.
    """
    cols = docs_with_payload.select("doc_id", "payload", "media_meta.mime")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                }
            )

    return cols.mapInPandas(decode, DECODED_SCHEMA)
