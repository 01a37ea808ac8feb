import numpy as np
import pandas as pd
import pytest

from mrmr_spark.select import select_mrmr
from mrmr_spark.select.autok import AutoKConfig, build_k_grid
from mrmr_spark.select.loops import select_k_elbow


def test_build_k_grid_matches_reference_shape():
    assert build_k_grid(5, 20) == [5, 7, 9, 11, 13, 15, 17, 19, 20]
    g = build_k_grid(5, 100)
    assert g[0] == 5 and g[-1] == 100
    assert 40 in g and 75 in g and 150 not in g


def test_select_k_elbow():
    # strong gains then a plateau from k=6 on
    obj = np.array([1.0, 1.8, 2.4, 2.8, 3.0, 3.02, 3.03, 3.035, 3.04, 3.041])
    k = select_k_elbow(obj, min_k=2, max_k=10, min_rel_gain=0.02, patience=3)
    assert 5 <= k <= 7


@pytest.fixture(scope="module")
def autok_data(spark):
    rng = np.random.default_rng(77)
    n = 1500
    pdf = pd.DataFrame({"grp": np.arange(n) % 25, "t": np.arange(n)})
    for j in range(12):
        pdf[f"x{j}"] = rng.normal(size=n)
    pdf["y"] = 2 * pdf["x0"] + 1.0 * pdf["x1"] + 0.5 * pdf["x2"] + 0.3 * rng.normal(size=n)
    return spark.createDataFrame(pdf).cache()


FEATS = [f"x{j}" for j in range(12)]


def test_auto_k_time_holdout(autok_data):
    cfg = AutoKConfig(k_method="evaluate", strategy="time_holdout", max_k=5, min_k=1)
    res = select_mrmr(
        autok_data, FEATS, "y", "auto", task="regression",
        auto_k_config=cfg, time_col="t",
    )
    assert 2 <= len(res.names) <= 6  # 3 signal features + maybe a stray
    assert {"x0", "x1"}.issubset(set(res.names))


def test_auto_k_group_cv(autok_data):
    cfg = AutoKConfig(k_method="evaluate", strategy="group_cv", max_k=5, min_k=1, n_splits=2)
    res = select_mrmr(
        autok_data, FEATS, "y", "auto", task="regression",
        auto_k_config=cfg, group_col="grp",
    )
    assert {"x0", "x1"}.issubset(set(res.names))
    assert len(res.names) <= 8


def test_group_cv_shared_scan_matches_per_split_loop(autok_data):
    """The shared-scan group-CV path (one fold-keyed fused stats pass + one
    fold-grouped loss pass — 2 scans total) must reproduce the per-split
    loop (3 scans × n_splits) score-for-score: the leave-one-fold-out Chan
    merge of per-fold augmented-Gram accumulators is algebraically the
    train split's own statistics."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import (
        _ridge_group_cv_scores,
        _ridge_path_scores,
        build_k_grid,
    )

    n_splits = 3
    k_grid = build_k_grid(1, 8)
    folded = autok_data.withColumn(
        "_fold", F.pmod(F.xxhash64(F.col("grp")), F.lit(n_splits))
    ).cache()
    metrics = ("rmse", "mae")
    # per-split reference loop: stats/Gram/betas once per split, both
    # metrics' loss passes on those shared models (tuple-metric form)
    loop: dict[str, dict[int, list[float]]] = {
        m: {kk: [] for kk in k_grid} for m in metrics
    }
    for f_ in range(n_splits):
        s = _ridge_path_scores(
            folded.where(F.col("_fold") != f_),
            folded.where(F.col("_fold") == f_),
            FEATS, "y", None, k_grid, metrics,
        )
        for m in metrics:
            for kk, v in s[m].items():
                loop[m][kk].append(v)
    for metric in metrics:
        shared = _ridge_group_cv_scores(
            folded, FEATS, "y", None, k_grid, metric, n_splits
        )
        for kk in k_grid:
            assert shared[kk] == pytest.approx(
                float(np.mean(loop[metric][kk])), rel=1e-9
            )
    folded.unpersist()


def test_classification_group_cv_shared_scan_matches_loop(autok_cls_data):
    """The classification shared-scan group-CV path (fold-keyed fused stats
    + one shared bounded collect + fold-grouped loss — 2 scans + 1 collect)
    must reproduce the per-split loop when n <= fit_subsample (every split
    then fits on its complete train split, so the paths see identical
    data)."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import (
        _logistic_group_cv_scores,
        _logistic_path_scores,
        build_k_grid,
    )
    from mrmr_spark.select.preprocess import factorize_target

    sdf, labels = factorize_target(autok_cls_data, "y", "_y_code")
    C = len(labels)
    n_splits = 3
    k_grid = build_k_grid(1, 6)
    folded = sdf.withColumn(
        "_fold", F.pmod(F.xxhash64(F.col("grp")), F.lit(n_splits))
    ).cache()
    metrics = ("logloss", "error")
    # per-split reference loop: one stats scan + one bounded collect + one
    # set of softmax fits per split, both metrics' loss passes on those
    # shared models (tuple-metric form)
    loop: dict[str, dict[int, list[float]]] = {
        m: {kk: [] for kk in k_grid} for m in metrics
    }
    for f_ in range(n_splits):
        s = _logistic_path_scores(
            folded.where(F.col("_fold") != f_),
            folded.where(F.col("_fold") == f_),
            CLS_FEATS, "_y_code", C, None, k_grid, metrics, 50_000, 42,
        )
        for m in metrics:
            for kk, v in s[m].items():
                loop[m][kk].append(v)
    for metric in metrics:
        shared = _logistic_group_cv_scores(
            folded, CLS_FEATS, "_y_code", C, None, k_grid, metric,
            50_000, 42, n_splits,
        )
        for kk in k_grid:
            assert shared[kk] == pytest.approx(
                float(np.mean(loop[metric][kk])), rel=1e-6
            ), (metric, kk)
    folded.unpersist()


def test_holdout_null_time_rows_are_dropped(autok_data):
    """Rows with a null time_col must be excluded from both splits (the
    former where(t<cut)/where(t>=cut) semantics) — not crash the Arrow
    mapper with a null fold index."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

    with_nulls = autok_data.withColumn(
        "t_n", F.when(F.col("t") % 7 == 0, None).otherwise(F.col("t"))
    )
    cfg = AutoKConfig(k_method="evaluate", strategy="time_holdout",
                      max_k=5, min_k=1)
    bk_n, _, scores_n = select_k_evaluate(
        with_nulls, FEATS, "y", cfg, time_col="t_n", task="regression"
    )
    bk_f, _, scores_f = select_k_evaluate(
        with_nulls.where(F.col("t_n").isNotNull()), FEATS, "y", cfg,
        time_col="t_n", task="regression",
    )
    assert bk_n == bk_f
    for kk in scores_f:
        assert scores_n[kk] == pytest.approx(scores_f[kk], rel=1e-12)


def test_evaluate_raises_on_non_finite_y(autok_data):
    """The shared-scan regression evaluates must enforce the reference's
    y-validation like every other regression backend (select_mrmr raises on
    a NaN y): without the check a single NaN y NaN-poisons the fused Gram,
    every (k, alpha) score goes inf, and select_k_evaluate silently returns
    max_k. The counter is read from the fold accumulators' tail — no extra
    scan."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

    bad = autok_data.withColumn(
        "y_bad", F.when(F.col("t") == 7, float("nan")).otherwise(F.col("y"))
    )
    for strategy, kw in (
        ("time_holdout", {"time_col": "t"}),
        ("group_cv", {"group_col": "grp"}),
    ):
        cfg = AutoKConfig(k_method="evaluate", strategy=strategy,
                          max_k=5, min_k=1, n_splits=2)
        with pytest.raises(ValueError, match="Non-finite values in y"):
            select_k_evaluate(bad, FEATS, "y_bad", cfg, task="regression", **kw)


def test_group_cv_invalid_n_splits_raises(autok_data):
    """n_splits < 2 is a caller bug and must raise — not be silently
    rewritten to 2-fold CV (the pre-scan era raised 'at least 2 groups')."""
    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

    cfg = AutoKConfig(k_method="evaluate", strategy="group_cv",
                      max_k=5, min_k=1, n_splits=1)
    with pytest.raises(ValueError, match="n_splits"):
        select_k_evaluate(
            autok_data, FEATS, "y", cfg, task="regression", group_col="grp"
        )


def test_group_cv_null_group_rows_participate(autok_data):
    """A NULL group is a legitimate group value: its rows must be folded
    (xxhash64 folds null via its seed), not dropped or crash."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

    with_nulls = autok_data.withColumn(
        "g_n", F.when(F.col("grp") % 5 == 0, None).otherwise(F.col("grp"))
    )
    cfg = AutoKConfig(k_method="evaluate", strategy="group_cv",
                      max_k=5, min_k=1, n_splits=3)
    bk, names, scores = select_k_evaluate(
        with_nulls, FEATS, "y", cfg, group_col="g_n", task="regression"
    )
    assert 1 <= bk <= 5 and all(np.isfinite(v) for v in scores.values())


def test_group_cv_tiny_group_count_falls_back_to_round_robin(autok_data):
    """With very few groups, hash folding can collide every group into one
    fold. The scorer must detect this from the fold occupancy (no
    distinct-count pre-scan on the common path) and retry once with an
    exact round-robin group->fold broadcast map instead of raising."""
    from pyspark.sql import functions as F

    # long groups 0/1 with n_splits=5 are a verified xxhash64 collision
    # (both land in one fold), so this deterministically exercises the
    # retry path
    two_grp = autok_data.withColumn("g2", (F.col("grp") % 2).cast("long"))
    assert (
        two_grp.select(
            F.countDistinct(F.pmod(F.xxhash64(F.col("g2")), F.lit(5)))
        ).collect()[0][0] == 1
    ), "fixture no longer collides; pick other group values"
    cfg = AutoKConfig(k_method="evaluate", strategy="group_cv",
                      max_k=5, min_k=1, n_splits=5)
    res = select_mrmr(
        two_grp, FEATS, "y", "auto", task="regression",
        auto_k_config=cfg, group_col="g2",
    )
    assert {"x0", "x1"}.issubset(set(res.names))


def test_evaluate_strategies_kernel_scan_counts(autok_data, monkeypatch):
    """Scan-count regression guard: squared-error group-CV evaluate reads
    the data with ONE kernel scan (fused fold-keyed stats; validation
    losses follow algebraically from the same accumulators), mae group-CV
    and time_holdout with TWO (stats + row-wise loss)."""
    from mrmr_spark.select import kernels
    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

    for strategy, kw, metric, want in (
        ("group_cv", {"group_col": "grp"}, "rmse", 1),
        ("group_cv", {"group_col": "grp"}, "mae", 2),
        ("time_holdout", {"time_col": "t"}, "rmse", 2),
    ):
        cfg = AutoKConfig(k_method="evaluate", strategy=strategy, max_k=5,
                          min_k=1, n_splits=3, metric=metric)
        monkeypatch.setattr(kernels, "PLAN_LOG", [])
        select_k_evaluate(autok_data, FEATS, "y", cfg, task="regression", **kw)
        assert len(kernels.PLAN_LOG) == want, (strategy, metric, len(kernels.PLAN_LOG))


def test_classification_holdout_shared_scan_matches_loop(autok_cls_data):
    """The no-persist classification holdout path must reproduce
    _logistic_path_scores on the physically filtered train/val frames
    (identical fit sample: n <= fit_subsample)."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import (
        _logistic_holdout_scores,
        _logistic_path_scores,
        build_k_grid,
    )
    from mrmr_spark.select.preprocess import factorize_target

    sdf, labels = factorize_target(autok_cls_data, "y", "_y_code")
    C = len(labels)
    k_grid = build_k_grid(1, 6)
    cut = 1200.0
    t = F.col("t").cast("double")
    tagged = sdf.withColumn("_fold", (t >= F.lit(cut)).cast("long"))
    for metric in ("logloss", "error"):
        shared = _logistic_holdout_scores(
            tagged, CLS_FEATS, "_y_code", C, None, k_grid, metric, 50_000, 42
        )
        ref = _logistic_path_scores(
            sdf.where(t < cut), sdf.where(t >= cut),
            CLS_FEATS, "_y_code", C, None, k_grid, metric, 50_000, 42,
        )
        for kk in k_grid:
            assert shared[kk] == pytest.approx(ref[kk], rel=1e-6), (metric, kk)


def test_time_holdout_shared_scan_matches_split_frames(autok_data):
    """The 2-scan no-persist holdout path (fold-tagged fused stats + loss)
    must reproduce _ridge_path_scores on the physically filtered train/val
    frames."""
    from pyspark.sql import functions as F

    from mrmr_spark.select.autok import (
        _ridge_holdout_scores,
        _ridge_path_scores,
        build_k_grid,
    )

    k_grid = build_k_grid(1, 8)
    cut = 1200.0
    t = F.col("t").cast("double")
    tagged = autok_data.withColumn("_fold", (t >= F.lit(cut)).cast("long"))
    for metric in ("rmse", "mae"):
        shared = _ridge_holdout_scores(tagged, FEATS, "y", None, k_grid, metric)
        ref = _ridge_path_scores(
            autok_data.where(t < cut), autok_data.where(t >= cut),
            FEATS, "y", None, k_grid, metric,
        )
        for kk in k_grid:
            assert shared[kk] == pytest.approx(ref[kk], rel=1e-9)


@pytest.fixture(scope="module")
def autok_cls_data(spark):
    rng = np.random.default_rng(31)
    n = 1500
    pdf = pd.DataFrame({"grp": np.arange(n) % 25, "t": np.arange(n)})
    for j in range(10):
        pdf[f"x{j}"] = rng.normal(size=n)
    logit = 1.8 * pdf["x0"] - 1.4 * pdf["x1"] + 0.4 * rng.normal(size=n)
    pdf["y"] = np.where(logit > 0.8, "hi", np.where(logit < -0.8, "lo", "mid"))
    return spark.createDataFrame(pdf).cache()


CLS_FEATS = [f"x{j}" for j in range(10)]


def test_auto_k_classification_logloss(autok_cls_data):
    cfg = AutoKConfig(
        k_method="evaluate", strategy="time_holdout", metric="logloss",
        max_k=5, min_k=1,
    )
    res = select_mrmr(
        autok_cls_data, CLS_FEATS, "y", "auto", task="classification",
        auto_k_config=cfg, time_col="t",
    )
    assert {"x0", "x1"}.issubset(set(res.names))
    assert len(res.names) <= 6  # 2 signal features; noise should not help
    scores = res.extras["auto_k_scores"]
    # logloss at the best k beats the largest (noise-padded) k or ties
    assert min(scores.values()) <= scores[max(scores)] + 1e-9


def test_auto_k_classification_error_group_cv(autok_cls_data):
    cfg = AutoKConfig(
        k_method="evaluate", strategy="group_cv", metric="error",
        max_k=5, min_k=1, n_splits=2,
    )
    res = select_mrmr(
        autok_cls_data, CLS_FEATS, "y", "auto", task="classification",
        auto_k_config=cfg, group_col="grp",
    )
    assert {"x0", "x1"}.issubset(set(res.names))
    scores = res.extras["auto_k_scores"]
    assert all(0.0 <= v <= 1.0 for v in scores.values())
    # the 2-signal model must clearly beat majority-class guessing (~0.55)
    assert min(scores.values()) < 0.35


def test_auto_k_metric_validation(autok_data, autok_cls_data):
    from mrmr_spark.select.autok import resolve_metric

    assert resolve_metric("auto", "regression") == "rmse"
    assert resolve_metric("auto", "classification") == "logloss"
    with pytest.raises(ValueError, match="invalid for task='regression'"):
        resolve_metric("logloss", "regression")
    with pytest.raises(ValueError, match="invalid for task='classification'"):
        resolve_metric("rmse", "classification")


def test_softmax_fit_matches_closed_form_separable():
    # sanity: on a linearly separable 2-class problem the fitted decision
    # boundary must classify training data correctly and logits must align
    # with the generating direction
    from mrmr_spark.select.autok import _softmax_fit

    rng = np.random.default_rng(5)
    n = 800
    Z = rng.normal(size=(n, 4))
    y = (Z[:, 0] - 0.5 * Z[:, 1] > 0).astype(np.int64)
    W, b = _softmax_fit(Z, y, 2, None, lam=1.0 / n)
    margin = Z @ (W[:, 1] - W[:, 0]) + (b[1] - b[0])
    assert np.mean((margin > 0) == (y == 1)) > 0.97
    d = W[:, 1] - W[:, 0]
    assert d[0] > 0 and d[1] < 0 and abs(d[0]) > abs(d[2]) and abs(d[0]) > abs(d[3])


def test_regression_loss_pass_parity(spark):
    """The distributed Arrow loss pass must equal the driver-side numpy
    loss exactly (same impute/standardize/GEMM algebra, float64)."""
    from mrmr_spark.select.autok import _regression_loss_pass

    rng = np.random.default_rng(11)
    n, p, M = 400, 6, 9
    X = rng.normal(size=(n, p))
    X[rng.random(size=(n, p)) < 0.05] = np.nan
    y = rng.normal(size=n)
    w = rng.uniform(0.5, 2.0, size=n)
    pdf = pd.DataFrame(X, columns=[f"x{j}" for j in range(p)])
    pdf["y"], pdf["w"] = y, w
    df = spark.createDataFrame(pdf).repartition(7)

    imput = np.nanmean(X, axis=0)
    mu = rng.normal(size=p)
    sd = rng.uniform(0.5, 2.0, size=p)
    B = rng.normal(size=(p, M))
    ym = 0.37

    Xi = np.where(np.isfinite(X), X, imput[None, :])
    Z = (Xi - mu[None, :]) / sd[None, :]
    R = (y - ym)[:, None] - Z @ B
    for metric, L in (("rmse", R * R), ("mae", np.abs(R))):
        want = (w @ L) / w.sum()
        got = _regression_loss_pass(
            df, [f"x{j}" for j in range(p)], "y", "w", imput, mu, sd, ym, B, metric
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_classification_loss_pass_parity(spark):
    from mrmr_spark.select.autok import _classification_loss_pass

    rng = np.random.default_rng(12)
    n, p, M, C = 300, 5, 4, 3
    X = rng.normal(size=(n, p))
    y = rng.integers(0, C, size=n)
    w = rng.uniform(0.5, 2.0, size=n)
    pdf = pd.DataFrame(X, columns=[f"x{j}" for j in range(p)])
    pdf["yc"], pdf["w"] = y.astype(float), w
    df = spark.createDataFrame(pdf).repartition(5)

    imput = np.zeros(p)
    mu = np.zeros(p)
    sd = np.ones(p)
    Ws = rng.normal(size=(p, M * C))
    bs = rng.normal(size=M * C)

    S = (X @ Ws + bs[None, :]).reshape(n, M, C)
    mx = S.max(axis=2, keepdims=True)
    lse = mx[:, :, 0] + np.log(np.exp(S - mx).sum(axis=2))
    sy = S[np.arange(n)[:, None], np.arange(M)[None, :], y[:, None]]
    want_ll = (w @ (lse - sy)) / w.sum()
    want_er = (w @ (S.argmax(axis=2) != y[:, None]).astype(float)) / w.sum()

    cols = [f"x{j}" for j in range(p)]
    got_ll = _classification_loss_pass(df, cols, "yc", "w", imput, mu, sd, Ws, bs, C, "logloss")
    got_er = _classification_loss_pass(df, cols, "yc", "w", imput, mu, sd, Ws, bs, C, "error")
    np.testing.assert_allclose(got_ll, want_ll, rtol=1e-12)
    np.testing.assert_allclose(got_er, want_er, rtol=1e-12)


def test_auto_k_wide_path_no_codegen_cliff(spark):
    """Round-2 verdict #1: at the default max_k=100 the evaluate path must
    not build |k_grid|x|alphas| aggregate expressions of up to 100 terms
    each (the measured Spark codegen-compile cliff); the Arrow GEMM loss
    pass keeps JVM expression width O(p) regardless of the k grid."""
    from mrmr_spark.select.autok import AutoKConfig, select_k_evaluate

    rng = np.random.default_rng(3)
    n, p = 800, 100
    pdf = pd.DataFrame({f"x{j}": rng.normal(size=n) for j in range(p)})
    pdf["t"] = np.arange(n).astype(float)
    pdf["y"] = 3 * pdf["x0"] - 2 * pdf["x1"] + 0.5 * rng.normal(size=n)
    df = spark.createDataFrame(pdf)

    path = [f"x{j}" for j in range(p)]
    cfg = AutoKConfig(max_k=100, min_k=5)
    best_k, sel, scores = select_k_evaluate(df, path, "y", cfg, time_col="t")
    assert set(scores) == set(build_k_grid(5, 100))
    assert all(np.isfinite(v) for v in scores.values())
    # signal features lead the path: a small prefix must win over the
    # noise-padded k=100 model
    assert best_k < 100 and scores[best_k] <= scores[100]


def test_auto_k_gaussian_elbow(autok_data):
    cfg = AutoKConfig(k_method="elbow", max_k=10, min_k=2)
    res = select_mrmr(
        autok_data, FEATS, "y", "auto", task="regression",
        estimator="gaussian", auto_k_config=cfg, subsample=None,
    )
    assert {"x0", "x1"}.issubset(set(res.names[:4]))
    assert len(res.names) <= 10
