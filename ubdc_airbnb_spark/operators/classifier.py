"""Trained linear quality/language classifier — the fastText-classifier
analog of LLM data pipelines (GPT-3/LLaMA filter web text with a linear
model over cheap features), expressed as a Spark-native batch algorithm.

Batch perceptron over INTEGER features: prediction is ``sign(w·x)``,
each iteration adds the summed update of every misclassified example

    w ← w + Σ_{i : y_i (w·x_i) ≤ 0}  y_i x_i

All arithmetic is integer (features are counts, weights are sums of
counts), so training is exactly reproducible across engines, partition
orders and partitionings — no float summation order, no sigmoid ulp
drift. That is why this is a perceptron and not logistic regression:
``exp`` differs at the ulp between libm implementations, which would
break the oracle's value-hash parity for no modeling benefit at this
feature scale.

Spark-first design (100 TB):

- One grouped-free aggregate per iteration (map-side partial combine →
  F-sized final reduce), so an iteration costs one pass over the
  features — no shuffle of the corpus itself, no per-row state.
- The weight vector (F longs) is collected to the driver and re-entered
  as literals — bounded by construction, the pattern the k-means trainer
  (similarity.py kmeans_centroids) established.
- Feature extraction is native expressions (no UDF); the scored output
  is a narrow select over the corpus.

No reference analog; training-data-pipeline extension (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import LANG_MARKERS, lang_marker_count, whitespace_token_count


def english_features(text_col: str = "text") -> list[Column]:
    """Integer feature vector for the is-English task: bias, token count,
    and the per-language marker counts the lang-ID heuristic uses."""
    return [
        F.lit(1).cast("long"),
        whitespace_token_count(text_col).cast("long"),
        *[lang_marker_count(text_col, lang).cast("long") for lang in LANG_MARKERS],
    ]


def train_perceptron(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iterations: int = 2,
) -> list[int]:
    """Batch-perceptron training loop. ``feats`` carries integer feature
    columns and a ±1 ``label_col``. Returns the final weight vector.

    Each iteration is ONE aggregate job; misclassification is
    ``y * (w·x) ≤ 0`` (ties count as mistakes, so iteration 1 from w=0
    sums every example — the standard batch update)."""
    w = [0] * len(feature_cols)
    y = F.col(label_col)
    for _ in range(iterations):
        margin = sum(
            (F.col(c) * F.lit(int(wi)) for c, wi in zip(feature_cols, w)),
            F.lit(0).cast("long"),
        )
        mistake = (y * margin) <= 0
        grad_row = feats.agg(
            *[
                F.coalesce(
                    F.sum(F.when(mistake, y * F.col(c)).otherwise(F.lit(0))), F.lit(0)
                ).alias(f"g{i}")
                for i, c in enumerate(feature_cols)
            ]
        ).first()
        w = [wi + int(grad_row[i]) for i, wi in enumerate(w)]
    return w


def score_margin(feature_cols: list[str], weights: list[int]) -> Column:
    """w·x as a long column from literal weights (broadcast-free: F
    integers ride inside the plan)."""
    return sum(
        (F.col(c) * F.lit(int(wi)) for c, wi in zip(feature_cols, weights)),
        F.lit(0).cast("long"),
    )


def classify_english(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_expr: Column | None = None,
    iterations: int = 2,
) -> DataFrame:
    """Train on the corpus itself (label = lang=='en' unless overridden)
    and score every document. Output: (doc_id, margin, pred_en, is_en)."""
    label = label_expr if label_expr is not None else (F.col("lang") == "en")
    names = [f"f{i}" for i in range(len(english_features(text_col)))]
    feats = docs.select(
        F.col(id_col),
        F.when(label, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("y"),
        *[c.alias(n) for c, n in zip(english_features(text_col), names)],
    )
    w = train_perceptron(feats, names, "y", iterations)
    margin = score_margin(names, w)
    return feats.select(
        id_col,
        margin.alias("margin"),
        (margin > 0).alias("pred_en"),
        (F.col("y") > 0).alias("is_en"),
    )
