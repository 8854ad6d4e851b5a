"""Learned document-quality classifier: hashing-TF + logistic regression.

The rule-based scorers (``textstats.quality_exprs``,
``textstats.heuristic_filters``) are hand-tuned thresholds; production
curation pipelines follow them with a LEARNED filter — a cheap linear
classifier over bag-of-words features (the fastText-style quality model
used to select e.g. "Wikipedia-like" text), trained on weak labels and
applied to the whole corpus. This module is that stage on Spark MLlib:

* features: ``RegexTokenizer`` → ``HashingTF`` (feature hashing — NO
  vocabulary state, so the transform is embarrassingly parallel and the
  model is a fixed-width vector regardless of corpus vocabulary; the
  standard trick for corpus-scale text classification);
* model: ``LogisticRegression`` (L-BFGS) — training cost is a handful of
  ``treeAggregate`` passes over the (sampled) training set, scoring is a
  map-only sparse dot product per document.

Scale shape: train on a bounded labeled sample (weak labels are cheap —
take the sample, not the corpus); score with ``model.transform`` which is
one map-only stage, no shuffle. The model object is a broadcast-sized
coefficient vector (numFeatures doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weak_labels(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Weak supervision from the Gopher+C4 rule set: label = the rules'
    keep/drop verdict. The classic bootstrap — train the learned filter
    on rule labels, then let it generalize past the rules' blind spots.
    Map-only (the rules fuse into the scan)."""
    from whiterrabbit_spark.extensions.textstats import heuristic_filters

    flags = heuristic_filters(df, text_col, id_col)
    return df.join(
        flags.select(id_col, F.col("keep").cast("double").alias("label")),
        id_col,
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    max_iter: int = 20,
    reg_param: float = 1e-3,
):
    """Fit tokenizer→hashingTF→logistic-regression on a labeled frame and
    return the fitted ``PipelineModel``. Deterministic given the same
    data (hashing is seedless murmur3; L-BFGS from a zero start)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\W+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features",
        numFeatures=num_features,
    )
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col,
        maxIter=max_iter, regParam=reg_param,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    model, df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Apply a trained classifier: ``(id, prob_keep, predicted_keep)``.
    Map-only — tokenization, hashing and the sparse dot product all run
    inside one stage; nothing shuffles."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.select(
        F.col(id_col),
        F.element_at(vector_to_array("probability"), 2).alias("prob_keep"),
        (F.col("prediction") > 0.5).alias("predicted_keep"),
    )


def nearest_centroid_eval(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid classification eval over a labeled embedding
    table: per-label mean vectors (one aggregate), every vector scored
    against every centroid (|labels| is small — the centroid frame
    broadcasts), argmin by squared euclidean with a deterministic label
    tie-break; reports the confusion matrix. The zero-training sanity
    baseline any embedding column should beat chance on — and the
    cheapest drift check for embedding refreshes.

    Scale shape: one groupBy(label) over posexploded dims (partial
    aggregation; |labels|·dim rows out), one broadcast join of the
    centroid array, map-side distance fold, one |labels|² rollup.

    Returns ``(true_label, pred_label, n)``.
    """
    dims = vectors.select(
        F.col(label_col).alias("lab"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    )
    cent = (
        dims.groupBy("lab", "i")
        .agg(F.round(F.avg(F.col("x").cast("double")), 9).alias("c"))
        .groupBy("lab")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "c"))
            ).alias("pairs")
        )
        .select(
            "lab",
            F.transform(F.col("pairs"), lambda p: p["c"]).alias("cv"),
        )
    )
    scored = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("true_label"),
        F.col(vec_col).alias("v"),
    ).crossJoin(F.broadcast(cent))
    d2 = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("cv"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vid").orderBy(F.col("d2").asc(), F.col("lab").asc())
    best = (
        scored.withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return best.groupBy(
        "true_label", F.col("lab").alias("pred_label")
    ).agg(F.count(F.lit(1)).alias("n"))
