"""Quality-model training operators: distributed batch gradient descent
for logistic regression — the "train a quality classifier on corpus
features" stage of a curation pipeline (the fastText/logreg quality
filters of GPT-3/CCNet-style pipelines, reduced to its Spark shape).

Like the k-means pair (p42 assignment / p45 update), the LOOP is the
operator: each step is ONE partial-aggregated pass over the corpus
(avg of per-row gradient terms), and the weight vector — a single row —
rides a broadcast crossJoin into the next step's margin computation. No
driver-side collect: `steps` chained aggregations build one lazy plan,
so the same code runs on 100 TB (each step shuffles exactly one
scalar-per-feature aggregate; the corpus is re-scanned per step, which
is the textbook batch-GD access pattern — cache the feature frame for
multi-step fits).

Determinism: with fixed features, label, lr, and step count the result
is exact up to float summation order (aggregation order is engine- and
partitioning-dependent), so consumers comparing across engines must
round. Crucially, the weights feeding each NEXT step's sigmoid must be
canonicalized too, not just the final output — an unrounded step-1 ulp
difference amplifies through exp() and can flip a final 6-dp rounding
(or a >=0 decision) boundary. ``round_dp`` rounds the weight vector
after EVERY step; p65/p70 set it to 6 and their SQL oracles round the
identical intermediate CTEs, the repo's standard for order-dependent
float aggregates at every cross-engine comparison point (ADVICE r7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 2,
    lr: float = 1.0,
    round_dp: int | None = None,
) -> DataFrame:
    """``steps`` unrolled batch-GD updates of logistic regression, starting
    from w = 0. Returns a ONE-ROW DataFrame with columns ``w_<feature>``.

    Update rule (full-batch, mean gradient of the log-likelihood):
        w ← w + lr * avg((y - sigmoid(w·x)) * x)

    ``label_col`` must be 0/1 (numeric). Features should be pre-scaled to
    O(1) magnitudes — batch GD, not a production optimizer; the operator
    exists for its Spark shape (per-step single-aggregate pass + 1-row
    broadcast), mirrored exactly by an unrolled-CTE SQL oracle.

    ``round_dp``: when set, every step's weight vector is rounded to that
    many decimal places BEFORE feeding the next step (and in the returned
    row) — cross-engine consumers must round identically in their oracle's
    intermediate CTEs so step n+1 computes from bit-identical weights."""
    if not feature_cols:
        raise ValueError("fit_logistic needs at least one feature column")
    if steps < 1:
        raise ValueError("fit_logistic needs steps >= 1 (got {})".format(steps))
    wcols = [f"w_{c}" for c in feature_cols]
    weights: DataFrame | None = None  # None = all-zero w (first step)
    for _ in range(steps):
        if weights is None:
            base = df
            margin = F.lit(0.0)
        else:
            base = df.crossJoin(F.broadcast(weights))
            margin = sum(
                (F.col(w) * F.col(c) for w, c in zip(wcols[1:], feature_cols[1:])),
                F.col(wcols[0]) * F.col(feature_cols[0]),
            )
        resid = F.col(label_col).cast("double") - _sigmoid(margin)
        aggs = []
        for w, c in zip(wcols, feature_cols):
            expr = (
                F.lit(0.0) if weights is None else F.first(w)
            ) + F.lit(lr) * F.avg(resid * F.col(c))
            if round_dp is not None:
                expr = F.round(expr, round_dp)
            aggs.append(expr.alias(w))
        weights = base.agg(*aggs)
    return weights


def calibration_bins(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 2,
    lr: float = 1.0,
    round_dp: int = 6,
    bins_per_unit: int = 50,
) -> DataFrame:
    """Calibration audit of a fitted logistic quality classifier: fit with
    :func:`fit_logistic` (``round_dp``-canonicalized weights), score every
    row, and bucket the decision MARGIN into fixed-width bins of
    ``1 / bins_per_unit``; per bin report the observed positive rate and
    the mean predicted probability — the reliability-diagram table a
    quality-filter deployment reviews before trusting its threshold.

    Returns (bin, n_docs, observed_rate, mean_pred), one row per
    non-empty bin.

    Determinism across engines: the bin key comes from the ROUNDED margin
    (weights are rounded after every GD step, features are exact, and the
    dot product is the same left-associated 3-term expression on both
    sides — bit-identical doubles, the p70 decision-boundary argument),
    so floor(round(margin, dp) * bins_per_unit) is reproducible
    bit-for-bit; only the two per-bin float MEANS are order-dependent,
    and both are rounded to ``round_dp`` per repo convention. Scale
    shape: ``steps`` partial-agg passes for the fit, then the 1-row
    weight vector broadcast onto a map-only scoring pass and ONE
    bin-keyed aggregation (bin cardinality is tiny by construction)."""
    w = fit_logistic(df, feature_cols, label_col, steps=steps, lr=lr, round_dp=round_dp)
    wcols = [f"w_{c}" for c in feature_cols]
    margin = sum(
        (F.col(w_) * F.col(c) for w_, c in zip(wcols[1:], feature_cols[1:])),
        F.col(wcols[0]) * F.col(feature_cols[0]),
    )
    scored = df.crossJoin(F.broadcast(w)).select(
        F.col(label_col).cast("double").alias("__y"),
        F.round(margin, round_dp).alias("__m"),
    )
    return (
        scored.select(
            F.floor(F.col("__m") * bins_per_unit).cast("integer").alias("bin"),
            "__y",
            _sigmoid(F.col("__m")).alias("__p"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__y"), round_dp).alias("observed_rate"),
            F.round(F.avg("__p"), round_dp).alias("mean_pred"),
        )
    )
