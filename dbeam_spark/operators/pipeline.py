"""End-to-end training-corpus preparation: the composition the engine
exists for, wired from the individual operators.

    raw documents
      → normalize (lower/collapse-ws/trim)
      → exact dedup (keep min doc_id per normalized text)
      → near-dup clustering (shingle-Jaccard pairs → connected
        components) → survivorship (keep richest copy per cluster)
      → leakage-safe split (md5 of cluster representative, so
        near-dups never straddle train/val/test)
      → overlapping chunking of the chosen split

Every stage is one of the registry operators — this module only
composes them, so the 100 TB posture is inherited: normalization and
chunking are map-only, dedup shuffles on shingles/doc_id, the split is
a broadcast-sized join. The whole pipeline is lazy: one action at the
end materializes it, and Catalyst pipelines the map-only stages into
their upstream shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbeam_spark.operators import dedup, sampling


def prepare_training_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    chunk_size: int = 200,
    stride: int = 150,
    split: str = "train",
) -> DataFrame:
    """Docs → deduped, leakage-safe, chunked corpus for `split`.

    Returns (doc_id, split, chunk_idx, chunk_len, chunk_hash) for the
    surviving documents of the requested split.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    normalized = docs.select("doc_id", norm.alias("text"))

    # exact dedup: keep the minimum doc_id per normalized text
    keep_exact = normalized.groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    )

    # near-dup clustering over the exact survivors
    pairs = dedup.ngram_jaccard_pairs(keep_exact, jaccard_threshold)
    clusters = dedup.connected_components(pairs)
    with_cluster = keep_exact.join(clusters, "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep_id"),
    )

    # survivorship: richest copy (longest normalized text) per cluster
    from pyspark.sql import Window

    w = Window.partitionBy("rep_id").orderBy(
        F.length("text").desc(), "doc_id"
    )
    survivors = (
        with_cluster.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # leakage-safe split on the cluster representative
    nib = F.substring(F.md5(F.col("rep_id").cast("string")), 1, 1)
    # eagerly checkpointed: `assigned` has TWO consumers (the chunker
    # and the split join below), and its upstream — the exact-dedup
    # groupBy, the cluster join, the survivorship window — otherwise
    # recomputes once per consumer (the kfold r8 catch's pattern; the
    # 100x probe read training_corpus at b=1.75 in the 30->100 decade
    # before this)
    assigned = (
        survivors.withColumn(
            "split",
            F.when(nib < "c", "train")
            .when(nib < "e", "val")
            .otherwise("test"),
        )
        .filter(F.col("split") == split)
        .localCheckpoint(eager=True)
    )

    chunks = sampling.chunk_documents(
        assigned.select("doc_id", "text"), chunk_size, stride
    )
    return chunks.join(
        assigned.select("doc_id", "split"), "doc_id"
    ).select("doc_id", "split", "chunk_idx", "chunk_len", "chunk_hash")
