"""Relevance estimators (SURVEY.md §2.C) — distributed reductions + tiny
driver formulas.

Each estimator is ONE full-scan Arrow reduction (all p columns in a single
pass, float64 accumulation) followed by closed-form driver math. The
formulas and every numerical guard replicate the reference exactly:

- f_regression (relevance.py:12-54): weighted Pearson r per column,
  F = r²/(1−r²)·(Σw − 2), r² clipped at 0.99999, zero-variance → 0.
- f_classif (relevance.py:57-107): weighted one-way ANOVA,
  F = (SSB/(C−1)) / (SSW/(Σw − C)), guards on dfs and SSW < 1e-12.
- ks_classif (relevance.py:110-131): mean one-vs-rest two-sample KS —
  NOTE the reference ignores sample weights here; so do we.
- rf relevance (relevance.py:134-161): random-forest impurity importances
  (approximate tier: Spark ML RF, not sklearn — set-level parity only).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.select import kernels


def _require_finite_y(stats: dict) -> None:
    """Reference y-validation (/root/reference/sift/_preprocess.py:199-201),
    enforced from a counter folded into the existing moment pass — no extra
    scan. Both backends raise identically; without this the single-pass
    kernel would NaN-poison every score (silently empty selection) while
    the JVM two-pass silently dropped null-y rows — divergent and wrong."""
    if float(stats.get("y_nonfinite", 0.0)) > 0:
        raise ValueError("Non-finite values in y are not allowed for regression.")


def f_regression_scores(
    df: DataFrame,
    feature_cols: list[str],
    y_col: str,
    weight_col: str | None = None,
    quantize_f32: bool = True,
    stats: dict | None = None,
) -> dict:
    """Returns {'scores', 'x_ss', 'xy_cov', 'y_ss', 'sw', 'wmeans',
    'wstds', 'impute_means', ...} — the moments are reused by the Gram pass
    so the full classic-mRMR pipeline costs exactly 3 scans. Beyond
    MOMENTS_JVM_MAX_P columns the two JVM moment selects are replaced by
    ONE O(p)-accumulator Arrow scan (kernels.moments_singlepass_pass) —
    the 6p+3 / 3p+1 aggregate plans hit the measured Catalyst planning
    cliff (24 s + janino overflow at p=200)."""
    if stats is None and len(feature_cols) > kernels.MOMENTS_JVM_MAX_P:
        mo = kernels.moments_singlepass_pass(
            df, feature_cols, y_col, weight_col, quantize_f32
        )
        p1 = mo
        sw = mo["sw"]
        y_wmean = mo["wy"] / sw
        x_ss, xy, y_ss = mo["x_ss"], mo["xy_cov"], mo["y_ss"]
        x_ss_unw = mo["x_ss_unw"]
    else:
        p1 = stats or kernels.impute_mean_pass(df, feature_cols, weight_col, y_col, quantize_f32)
        sw = p1["sw"]
        y_wmean = p1["wy"] / sw
        p2 = kernels.centered_moments_pass(
            df, feature_cols, y_col, weight_col,
            p1["impute_means"], p1["col_wmeans"], y_wmean, quantize_f32,
        )
        x_ss, xy, y_ss = p2["x_ss"], p2["xy_cov"], p2["y_ss"]
        x_ss_unw = p2["x_ss_unw"]

    _require_finite_y(p1)
    scores = np.zeros(len(feature_cols), dtype=np.float64)
    ok = (x_ss >= 1e-12) & (y_ss >= 1e-12)
    r = np.zeros_like(scores)
    # errstate: an empty frame (sw = 0) degrades to nan statistics by
    # design — silence only the intended invalid/zero divides
    with np.errstate(invalid="ignore", divide="ignore"):
        r[ok] = xy[ok] / np.sqrt(x_ss[ok] * y_ss)
        r2 = np.minimum(r * r, 0.99999)
        scores[ok] = (r2[ok] / (1.0 - r2[ok])) * (sw - 2.0)
        var = x_ss / sw
        wstds = np.where(var > 1e-12, np.sqrt(var), 1.0)
        y_var = y_ss / sw
    return {
        "scores": scores,
        "sw": sw,
        "wmeans": p1["col_wmeans"],
        "wstds": wstds,
        "impute_means": p1["impute_means"],
        "y_wmean": y_wmean,
        "y_wstd": float(np.sqrt(y_var)) if y_var > 1e-12 else 1.0,
        "x_ss_unw": x_ss_unw,
        "n": p1["n"],
        "pass1": p1,
    }


def fused_regression_stats(
    df: DataFrame,
    feature_cols: list[str],
    y_col: str,
    weight_col: str | None = None,
    quantize_f32: bool = True,
    single_pass: bool = False,
) -> dict:
    """Fused fast path for small/medium p (regression). Returns relevance
    scores AND the full correlation matrix + target-correlation vector —
    everything classic mRMR / JMI-r2 needs.

    Two backends computing the same statistics (parity-tested against each
    other at float64 rounding):

    - ``single_pass=False``: pass 1 = JVM means scan, pass 2 = JVM centered
      Gram scan (zero Python; caller persists the matrix between passes).
    - ``single_pass=True``: ONE ``mapInArrow`` scan via the
      indicator-augmented Gram (kernels.fused_singlepass_stats) — NO
      persist needed; the caller should NOT cache. Halves memory traffic:
      the columnar cache encode it avoids is the dominant phase of the e2e
      pipeline at scale.
    """
    if single_pass:
        st = kernels.fused_singlepass_stats(
            df, feature_cols, y_col, weight_col, quantize_f32
        )
        sw, y_wmean = st["sw"], st["y_wmean"]
        C, c_y, y_ss = st["C"], st["c_y"], st["c_yy"]
        col_wmeans, impute_means, n = st["col_wmeans"], st["impute_means"], st["n"]
        p1 = st
    else:
        if len(feature_cols) > kernels.MOMENTS_JVM_MAX_P:
            # keep the persisted-path pass 1 off the JVM planning cliff too
            p1 = kernels.moments_singlepass_pass(
                df, feature_cols, y_col, weight_col, quantize_f32
            )
        else:
            p1 = kernels.impute_mean_pass(df, feature_cols, weight_col, y_col, quantize_f32)
        sw = p1["sw"]
        y_wmean = p1["wy"] / sw
        cg = kernels.centered_gram_pass(
            df, feature_cols, weight_col, p1["impute_means"], p1["col_wmeans"],
            y_col=y_col, y_wmean=y_wmean, quantize_f32=quantize_f32,
        )
        C, c_y, y_ss = cg["C"], cg["c_y"], cg["c_yy"]
        col_wmeans, impute_means, n = p1["col_wmeans"], p1["impute_means"], p1["n"]

    _require_finite_y(p1)
    x_ss = np.diag(C).copy()
    xy = c_y

    p = len(feature_cols)
    scores = np.zeros(p, dtype=np.float64)
    ok = (x_ss >= 1e-12) & (y_ss >= 1e-12)
    r = np.zeros(p)
    # errstate: an empty frame (sw = 0) degrades to nan statistics by
    # design — silence only the intended invalid/zero divides
    with np.errstate(invalid="ignore", divide="ignore"):
        r[ok] = xy[ok] / np.sqrt(x_ss[ok] * y_ss)
        r2 = np.minimum(r * r, 0.99999)
        scores[ok] = (r2[ok] / (1.0 - r2[ok])) * (sw - 2.0)

        var = x_ss / sw
        wstds = np.where(var > 1e-12, np.sqrt(var), 1.0)
        y_var = y_ss / sw
        y_wstd = float(np.sqrt(y_var)) if y_var > 1e-12 else 1.0

        # standardized correlation structures (driver algebra, z = (x−μ)/σ)
        denom = np.outer(wstds, wstds) * sw
        R = 0.5 * (C + C.T) / denom
        r_y_vec = c_y / (wstds * y_wstd * sw)

    return {
        "scores": scores,
        "sw": sw,
        "wmeans": col_wmeans,
        "wstds": wstds,
        "impute_means": impute_means,
        "y_wmean": y_wmean,
        "y_wstd": y_wstd,
        "n": n,
        "R": R,
        "r_y": r_y_vec,
        "pass1": p1,
    }


def _anova_f_from_moments(
    A: np.ndarray, B: np.ndarray, class_w: np.ndarray, sw: float, n_classes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weighted one-way ANOVA F from per-class centered moments (reference
    relevance.py:57-107 algebra) → (scores, ss_between, ss_within)."""
    live = class_w >= 1e-12
    wc = np.where(live, class_w, 1.0)[:, None]
    ss_between = ((B * B) / wc * live[:, None]).sum(axis=0)
    ss_within = ((A - (B * B) / wc) * live[:, None]).sum(axis=0)

    df_between = n_classes - 1
    df_within = sw - n_classes
    scores = np.zeros(A.shape[1], dtype=np.float64)
    if df_within > 0 and df_between > 0:
        ok = ss_within >= 1e-12
        scores[ok] = (ss_between[ok] / df_between) / (ss_within[ok] / df_within)
    return scores, ss_between, ss_within


def fused_classification_stats(
    df: DataFrame,
    feature_cols: list[str],
    ycode_col: str,
    n_classes: int,
    weight_col: str | None = None,
    quantize_f32: bool = True,
) -> dict:
    """Fused classification fast path: ONE no-persist Arrow scan
    (kernels.fused_singlepass_class_stats) yields the weighted-ANOVA F
    relevance AND the full |corr| redundancy matrix — the classification
    twin of ``fused_regression_stats(single_pass=True)``. Statistic parity
    with the persisted multi-pass path at float64 rounding."""
    st = kernels.fused_singlepass_class_stats(
        df, feature_cols, ycode_col, n_classes, weight_col, quantize_f32
    )
    sw = st["sw"]
    scores, ssb, ssw = _anova_f_from_moments(
        st["A"], st["B"], st["class_w"], sw, n_classes
    )
    C = st["C"]
    x_ss = np.diag(C).copy()
    with np.errstate(invalid="ignore", divide="ignore"):  # sw=0 nan-degrade
        var = x_ss / sw
        wstds = np.where(var > 1e-12, np.sqrt(var), 1.0)
        denom = np.outer(wstds, wstds) * sw
        R = 0.5 * (C + C.T) / denom
    return {
        "scores": scores,
        "sw": sw,
        "wmeans": st["col_wmeans"],
        "wstds": wstds,
        "impute_means": st["impute_means"],
        "n": st["n"],
        "R": R,
        "class_w": st["class_w"],
    }


def f_classif_scores(
    df: DataFrame,
    feature_cols: list[str],
    ycode_col: str,
    n_classes: int,
    weight_col: str | None = None,
    quantize_f32: bool = True,
    stats: dict | None = None,
) -> dict:
    if stats is None and len(feature_cols) > kernels.MOMENTS_JVM_MAX_P:
        # wide frames: one O(C·p) Arrow scan instead of the two JVM
        # aggregate selects (same planning-cliff rationale as regression)
        cm = kernels.class_moments_singlepass_pass(
            df, feature_cols, ycode_col, n_classes, weight_col, quantize_f32
        )
        p1 = cm
        sw = cm["sw"]
    else:
        p1 = stats or kernels.impute_mean_pass(df, feature_cols, weight_col, None, quantize_f32)
        sw = p1["sw"]
        cm = kernels.class_moments_pass(
            df, feature_cols, ycode_col, weight_col, n_classes,
            p1["impute_means"], p1["col_wmeans"], quantize_f32,
        )
    A, B, class_w = cm["A"], cm["B"], cm["class_w"]  # (C,p),(C,p),(C,)

    scores, ss_between, ss_within = _anova_f_from_moments(
        A, B, class_w, sw, n_classes
    )

    # weighted variance for downstream standardization: total SS = SSB + SSW
    var = (ss_between + ss_within) / sw
    wstds = np.where(var > 1e-12, np.sqrt(var), 1.0)
    return {
        "scores": scores,
        "sw": sw,
        "wmeans": p1["col_wmeans"],
        "wstds": wstds,
        "impute_means": p1["impute_means"],
        "n": p1["n"],
        "pass1": p1,
    }


def _imputed_quantized(c: str, mean: float, quantize_f32: bool):
    col = F.col(c).cast("double")
    fin = ~F.isnull(col) & ~F.isnan(col) & (F.abs(col) != float("inf"))
    v = F.when(fin, col).otherwise(F.lit(float(mean)))
    return v.cast("float").cast("double") if quantize_f32 else v


def ks_classif_scores(
    df: DataFrame,
    feature_cols: list[str],
    ycode_col: str,
    n_classes: int,
    impute_means: np.ndarray,
    quantize_f32: bool = True,
) -> np.ndarray:
    """Mean one-vs-rest two-sample KS statistic per feature (C3; reference
    /root/reference/sift/estimators/relevance.py:110-131 — ks_2samp is
    UNWEIGHTED there, classes with <2 members are skipped, and the score is
    the mean over tested classes).

    Spark plan (scipy-free): melt the p imputed columns into (fid, x) rows
    with one generator projection → ONE groupBy (fid, x) with C conditional
    counts → **range-partitioned two-phase cumulative counts** → per-class
    max ECDF gap → a tiny (p × C) collect; the class mean is driver math.

    The cumulative sum is the scale-critical step. A plain
    ``Window.partitionBy(fid).orderBy(x)`` funnels each feature's entire
    distinct-value set through ONE task (the round-2 verdict's
    scale-killer at ``subsample=None``). Instead: ``repartitionByRange``
    on (fid, x) splits every feature's value range across tasks; per-range
    class totals (a tiny #partitions × p frame) are prefix-summed over the
    range ids and broadcast back as offsets, so the in-range window
    partitions by (range, fid) — bounded by partition size regardless of
    per-feature cardinality.

    Cost note (``subsample=None``): the melt materializes n × p rows
    before the (fid, x) groupBy collapses them to distinct values — that
    shuffle volume is INHERENT to the exact global ECDF (every feature's
    full value multiset must be co-sorted somewhere). It is fully parallel
    (no per-feature funnel) but at 10¹² rows × 100s of features it is a
    multi-PB exchange; prefer the reference's own bounded-subsample
    default (50k rows) for KS relevance and reserve ``subsample=None``
    for low-cardinality/heavily-duplicated features where the groupBy
    collapses early via partial aggregation.
    """
    from pyspark.sql.window import Window

    cls = {int(r[0]): float(r[1]) for r in df.groupBy(ycode_col).count().collect()}
    n_tot = sum(cls.values())
    n_c = np.array([cls.get(c, 0.0) for c in range(n_classes)])

    melted = df.select(
        F.col(ycode_col).cast("int").alias("_yc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("fid"),
                        _imputed_quantized(c, impute_means[j], quantize_f32).alias("x"),
                    )
                    for j, c in enumerate(feature_cols)
                ]
            )
        ).alias("fx"),
    ).select(F.col("fx.fid").alias("_fid"), F.col("fx.x").alias("_x"), "_yc")

    counts = melted.groupBy("_fid", "_x").agg(
        *[
            F.count(F.when(F.col("_yc") == c, F.lit(1))).alias(f"n{c}")
            for c in range(n_classes)
        ]
    )
    # phase 1: deterministic range ids; persisted so the range sampling is
    # evaluated once and the totals/offsets join sees the same ids
    ranged = (
        counts.repartitionByRange("_fid", "_x")
        .withColumn("_rid", F.spark_partition_id())
        .persist()
    )
    # materialize BEFORE both consumers read it: the offsets aggregate and
    # the probe join must see ONE _rid assignment. If the cache were lazy
    # and a block got lost, the range exchange could re-sample boundaries
    # and assign different rids per consumer, silently corrupting the
    # cumulative ECDF (same pin rule as copula.rank_gauss_transform).
    ranged.count()
    wo = Window.partitionBy("_fid").orderBy("_rid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("_rid", "_fid")
        .agg(*[F.sum(f"n{c}").alias(f"t{c}") for c in range(n_classes)])
        .select(
            "_rid",
            "_fid",
            *[
                F.coalesce(F.sum(f"t{c}").over(wo), F.lit(0)).alias(f"o{c}")
                for c in range(n_classes)
            ],
        )
    )
    counts = ranged.join(F.broadcast(offsets), ["_rid", "_fid"])
    # phase 2: in-range cumulative counts + the cross-range offset — group
    # sizes bounded by the range-partition size, never one-task-per-feature
    w = Window.partitionBy("_rid", "_fid").orderBy("_x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = [F.sum(f"n{c}").over(w) + F.col(f"o{c}") for c in range(n_classes)]
    cum_tot = sum(cum[1:], cum[0]) if n_classes > 1 else cum[0]
    gaps = []
    for c in range(n_classes):
        if n_c[c] < 2 or n_tot - n_c[c] < 1:
            gaps.append(F.lit(0.0).alias(f"g{c}"))
            continue
        ecdf_c = cum[c] / F.lit(float(n_c[c]))
        ecdf_rest = (cum_tot - cum[c]) / F.lit(float(n_tot - n_c[c]))
        gaps.append(F.abs(ecdf_c - ecdf_rest).alias(f"g{c}"))
    per_fid = (
        counts.select("_fid", *gaps)
        .groupBy("_fid")
        .agg(*[F.max(f"g{c}").alias(f"g{c}") for c in range(n_classes)])
        .collect()
    )
    ranged.unpersist()

    tested = [c for c in range(n_classes) if n_c[c] >= 2 and n_tot - n_c[c] >= 1]
    scores = np.zeros(len(feature_cols), dtype=np.float64)
    for row in per_fid:
        j = int(row["_fid"])
        ks_sum = sum(float(row[f"g{c}"]) for c in tested)
        scores[j] = ks_sum / max(len(tested), 1)
    return scores


def rf_relevance_scores(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    task: str,
    impute_means: np.ndarray,
    weight_col: str | None = None,
    quantize_f32: bool = True,
    n_estimators: int = 100,
    max_depth: int = 5,
    seed: int = 0,
) -> np.ndarray:
    """Random-forest impurity importances as relevance (C4; reference
    /root/reference/sift/estimators/relevance.py:134-161: sklearn RF with
    max_depth=5, n_estimators=100, random_state=0, sample_weight=w).

    Approximate tier (SURVEY.md §7 hard-point 5): Spark ML's
    ``featureImportances`` is the same normalized impurity-importance
    definition but the tree builder differs (bin-based splits, different
    RNG), so the parity target is top-set overlap, not allclose.
    featureSubsetStrategy mirrors sklearn defaults: all features for
    regression, sqrt for classification.
    """
    from pyspark.ml.feature import VectorAssembler

    proj = df.select(
        *[
            _imputed_quantized(c, impute_means[j], quantize_f32).alias(c)
            for j, c in enumerate(feature_cols)
        ],
        F.col(label_col).cast("double").alias("_label"),
        *([F.col(weight_col).alias("_w")] if weight_col else []),
    )
    vec = VectorAssembler(
        inputCols=feature_cols, outputCol="_vec", handleInvalid="keep"
    ).transform(proj)
    kwargs = dict(
        featuresCol="_vec",
        labelCol="_label",
        numTrees=n_estimators,
        maxDepth=max_depth,
        seed=seed,
        subsamplingRate=1.0,
    )
    if weight_col:
        kwargs["weightCol"] = "_w"
    if task == "classification":
        from pyspark.ml.classification import RandomForestClassifier

        model = RandomForestClassifier(featureSubsetStrategy="sqrt", **kwargs).fit(vec)
    else:
        from pyspark.ml.regression import RandomForestRegressor

        model = RandomForestRegressor(featureSubsetStrategy="all", **kwargs).fit(vec)
    return np.asarray(model.featureImportances.toArray(), dtype=np.float64)
