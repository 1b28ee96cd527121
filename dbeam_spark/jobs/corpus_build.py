"""Corpus build job: materialize a training-ready corpus from raw
documents — the CLI face of the operators/pipeline.py composition,
in the reference's job-layout style (data + metadata + _SUCCESS).

    python -m dbeam_spark.jobs.corpus_build \
        --input /data/documents_parquet --output /data/corpus \
        [--jaccardThreshold 0.5] [--chunkSize 200] [--stride 150] \
        [--shards 16]

Output layout:
    shards/split=train/shard=00007/*.parquet   chunked training rows
    _SPLITS.json                               per-split doc/chunk counts
    _METRICS.json                              funnel: raw → exact-deduped
                                               → near-dedup survivors,
                                               dedup savings, chunk totals
    _SUCCESS                                   atomic completion marker

Shape at 100 TB: every stage is a registry operator (normalize and
chunking map-only; dedup shuffles on shingles/doc id; the split is a
hash of the cluster representative so near-dups never straddle
splits; shard routing is a deterministic md5 — no RNG, no global
sort). The shard column is the write partitioning, so downstream
loaders read one directory per (split, shard)."""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbeam_spark.operators import dedup, sampling


def build_corpus_frames(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    chunk_size: int = 200,
    stride: int = 150,
    n_shards: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """(chunks, survivors): the chunked, split, shard-routed corpus
    plus the surviving per-doc frame (for metrics). Mirrors
    operators/pipeline.py but keeps ALL splits and adds shard
    routing."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    normalized = docs.select("doc_id", norm.alias("text"))
    keep_exact = normalized.groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    )
    pairs = dedup.ngram_jaccard_pairs(keep_exact, jaccard_threshold)
    clusters = dedup.connected_components(pairs)
    with_cluster = keep_exact.join(clusters, "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep_id"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("rep_id").orderBy(
        F.length("text").desc(), "doc_id"
    )
    survivors = (
        with_cluster.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    nib = F.substring(F.md5(F.col("rep_id").cast("string")), 1, 1)
    assigned = survivors.withColumn(
        "split",
        F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test"),
    )
    chunks = sampling.chunk_documents(
        assigned.select("doc_id", "text"), chunk_size, stride
    )
    routed = (
        chunks.join(assigned.select("doc_id", "split"), "doc_id")
        .withColumn(
            "shard",
            F.pmod(
                F.abs(F.hash(F.md5(F.col("doc_id").cast("string")))),
                F.lit(n_shards),
            ).cast("int"),
        )
    )
    return routed, assigned


def run_corpus_build(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    jaccard_threshold: float = 0.5,
    chunk_size: int = 200,
    stride: int = 150,
    n_shards: int = 16,
) -> dict:
    t0 = time.monotonic()
    docs = spark.read.parquet(input_dir)
    n_raw = docs.count()
    routed, assigned = build_corpus_frames(
        docs, jaccard_threshold, chunk_size, stride, n_shards
    )
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (
        routed.repartition("split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(str(out / "shards"))
    )
    landed = spark.read.parquet(str(out / "shards"))
    split_counts = {
        r["split"]: {
            "docs": r["docs"],
            "chunks": r["chunks"],
            "shards": r["shards"],
        }
        for r in landed.groupBy("split")
        .agg(
            F.count_distinct("doc_id").alias("docs"),
            F.count(F.lit(1)).alias("chunks"),
            F.count_distinct("shard").alias("shards"),
        )
        .collect()
    }
    n_survivors = assigned.count()
    metrics = {
        "rawDocs": n_raw,
        "survivorDocs": n_survivors,
        "dedupRemoved": n_raw - n_survivors,
        "totalChunks": sum(v["chunks"] for v in split_counts.values()),
        "elapsedMs": int((time.monotonic() - t0) * 1000),
        "jaccardThreshold": jaccard_threshold,
        "chunkSize": chunk_size,
        "stride": stride,
        "nShards": n_shards,
    }
    (out / "_SPLITS.json").write_text(
        json.dumps(split_counts, indent=2, sort_keys=True) + "\n"
    )
    (out / "_METRICS.json").write_text(
        json.dumps(metrics, indent=2, sort_keys=True) + "\n"
    )
    (out / "_SUCCESS").write_text("")
    return metrics


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="corpus-build")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--jaccardThreshold", type=float, default=0.5)
    p.add_argument("--chunkSize", type=int, default=200)
    p.add_argument("--stride", type=int, default=150)
    p.add_argument("--shards", type=int, default=16)
    a = p.parse_args(argv)
    from dbeam_spark.session import get_spark

    metrics = run_corpus_build(
        get_spark("corpus-build"),
        a.input,
        a.output,
        a.jaccardThreshold,
        a.chunkSize,
        a.stride,
        a.shards,
    )
    print(json.dumps(metrics, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
