"""Binary-file source for multimodal ingest: raw media files →
(path, mtime, length, content, media_type) rows.

Spark-first: wraps the built-in `binaryFile` datasource (distributed,
column-prunable — a metadata-only query never reads `content`;
`pathGlobFilter`/`recursiveFileLookup` prune at the listing). The
media type is inferred from the extension with magic-byte
verification available downstream (operators/multimodal.py owns
decode; real codecs are stubbed in this environment, so this source
stops at bytes + typed metadata — exactly the opaque-binary-column
contract the 100 TB layout uses).

At scale: one task per file group, no driver listing beyond the
InMemoryFileIndex Spark already maintains; `maxBytesPerTrigger`-less
batch reads are bounded by `spark.sql.files.maxPartitionBytes`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media type for the common training-corpus formats
_MEDIA_TYPES = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "webp": "image/webp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "mkv": "video/x-matroska",
    "webm": "video/webm",
    "txt": "text/plain",
}

#: magic prefixes for cheap payload sanity (first bytes → media type)
_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # also webp (RIFF....WEBP); refined below
    (b"fLaC", "audio/flac"),
    (b"ID3", "audio/mpeg"),
]


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Distributed read of a media directory. Returns
    (path, mtime, length, content, ext, media_type)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    ext = F.lower(
        F.element_at(F.split(F.col("path"), r"\."), -1)
    )
    mt = F.lit(None).cast("string")
    for e, m in sorted(_MEDIA_TYPES.items()):
        mt = F.when(ext == e, m).otherwise(mt)
    return df.select(
        "path",
        F.col("modificationTime").alias("mtime"),
        "length",
        "content",
        ext.alias("ext"),
        mt.alias("media_type"),
    )


def verify_magic(df: DataFrame) -> DataFrame:
    """Adds `magic_ok`: does the payload's magic prefix agree with the
    extension-derived media type? A cheap corruption/mislabel screen
    that reads only the first bytes of the (already loaded) content
    column — the quarantine gate before any decode fan-out."""
    head = F.substring(F.col("content"), 1, 8)
    detected = F.lit(None).cast("string")
    for prefix, m in _MAGIC:
        lit = F.lit(bytearray(prefix))
        detected = F.when(
            F.substring(F.col("content"), 1, len(prefix)) == lit, m
        ).otherwise(detected)
    # RIFF containers: WAVE vs WEBP discriminated at offset 9-12
    detected = F.when(
        (F.substring(F.col("content"), 1, 4) == F.lit(bytearray(b"RIFF")))
        & (F.substring(F.col("content"), 9, 4) == F.lit(bytearray(b"WEBP"))),
        "image/webp",
    ).otherwise(detected)
    return df.withColumn("detected_type", detected).withColumn(
        "magic_ok",
        F.col("detected_type").isNull()
        | (F.col("detected_type") == F.col("media_type")),
    )
