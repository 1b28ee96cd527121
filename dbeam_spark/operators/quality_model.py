"""Learned quality filter: distributed logistic regression over cheap
text features (the CCNet / fastText-classifier stage of an LLM data
pipeline — a model distilled from rule-based signals that then scores
the full corpus in one map pass).

Spark-first: features are Catalyst expressions (no Python in feature
extraction), training is MLlib's LBFGS logistic regression (JVM-side,
distributed gradient aggregation — treeAggregate over partitions),
scoring is the fitted model's map-only transform. At 100 TB the train
set is a deterministic hash sample; scoring streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbeam_spark.operators import text as text_ops


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Map-only feature frame: doc_id, label (rule-based quality
    signal >= 0.5 — the teacher), and cheap Catalyst features."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n_tok = F.size(toks).cast("double")
    distinct_ratio = (
        F.size(F.array_distinct(toks)).cast("double") / n_tok
    )
    avg_wlen = (
        F.length(F.col(text_col)).cast("double") - (n_tok - 1)
    ) / n_tok
    return docs.select(
        "doc_id",
        (text_ops.quality_score(F.col(text_col)) >= 0.5)
        .cast("double")
        .alias("label"),
        n_tok.alias("f_tokens"),
        distinct_ratio.alias("f_distinct_ratio"),
        avg_wlen.alias("f_avg_word_len"),
        F.length(F.col(text_col)).cast("double").alias("f_chars"),
    )


def train_quality_classifier(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Deterministic even/odd doc_id split, LBFGS fit on the even
    half, evaluation on the odd half. Returns a 1-row report frame
    (scalars only): sizes, held-out AUC and accuracy, and the
    model's intercept — enough to decide ship/no-ship for the
    filter."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(docs, text_col)
    cols = ["f_tokens", "f_distinct_ratio", "f_avg_word_len", "f_chars"]
    va = VectorAssembler(inputCols=cols, outputCol="features")
    train = va.transform(feats.filter(F.col("doc_id") % 2 == 0))
    test = va.transform(feats.filter(F.col("doc_id") % 2 == 1))
    lr = LogisticRegression(
        maxIter=25, regParam=0.01, standardization=True
    )
    model = lr.fit(train)
    scored = model.transform(test)
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction"
    ).evaluate(scored)
    acc = scored.filter(
        F.col("prediction") == F.col("label")
    ).count() / max(scored.count(), 1)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                train.count(),
                test.count(),
                round(float(auc), 3),
                round(float(acc), 3),
                round(float(model.intercept), 3),
            )
        ],
        "n_train long, n_test long, auc double, accuracy double, "
        "intercept double",
    )
