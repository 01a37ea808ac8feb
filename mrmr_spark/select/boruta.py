"""Boruta all-relevant feature selection with Spark ML random forests
(SURVEY.md §2.H H1; reference: /root/reference/sift/boruta.py:535-807).

Per iteration: group/time-aware shadow permutation of the active features
(column-wise, the classic Boruta shadow, boruta.py:503 shadow_mode default)
-> fit a Spark ML RandomForest on [active | shadow] -> per-feature
importances -> shadow percentile threshold -> hit counting. The exact
driver-side statistical machinery is replicated verbatim from the
reference (the *model* is the approximate part — Spark ML RF importances
are not bit-identical to sklearn's, SURVEY.md §7 hard-point 5):

- Laplace-smoothed per-round null p = (k+1)/(m_shadow+2)  (boruta.py:714-718)
- Poisson-binomial tail test over the per-round nulls      (boruta.py:336-365)
- Bonferroni alpha/m over currently-tentative features     (boruta.py:730-745)
- early stop after ``early_stop_rounds`` idle rounds       (boruta.py:764-773)
- tentative resolution vs the median shadow threshold      (boruta.py:782-788)
- max_features cap by mean importance                      (boruta.py:790-797)
- auto n_estimators = clamp(50*sqrt(2p)/depth, 50, 500)    (boruta.py:139-155)
"""

from __future__ import annotations

import time
import zlib
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrmr_spark.operators.permute import permute_columns_arrow, resolve_method


def poisson_binom_pmf(ps: np.ndarray) -> np.ndarray:
    """PMF of a sum of independent Bernoulli(p_i) — O(n²) DP."""
    pmf = np.array([1.0])
    for p in np.asarray(ps, dtype=np.float64).ravel():
        nxt = np.zeros(pmf.size + 1)
        nxt[:-1] += pmf * (1.0 - p)
        nxt[1:] += pmf * p
        pmf = nxt
    return pmf


def tail_pvals(pmf: np.ndarray, h: int) -> tuple[float, float]:
    """(P[S >= h], P[S <= h])."""
    if h < 0:
        return 1.0, 0.0
    if h >= pmf.size:
        return 0.0, 1.0
    cdf = np.cumsum(pmf)
    p_lo = float(cdf[h])
    p_hi = 1.0 if h <= 0 else float(1.0 - cdf[h - 1])
    return p_hi, p_lo


def auto_n_estimators(n_features: int, depth: int = 5) -> int:
    n_est = int(50.0 * np.sqrt(max(n_features, 1) * 2) / max(depth, 1))
    return min(max(n_est, 50), 500)


@dataclass
class BorutaResult:
    selected: list[str]
    status: dict          # feature -> 'accepted' | 'rejected' | 'tentative'
    hits: dict
    n_iter: int
    mean_importance: dict
    extras: dict = field(default_factory=dict)


def _fit_rf(df, feat_cols, target_col, task, n_estimators, max_depth, seed, weight_col):
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=feat_cols, outputCol="_vec", handleInvalid="keep")
    vec = assembler.transform(df)
    kwargs = dict(
        featuresCol="_vec", labelCol=target_col, numTrees=n_estimators,
        maxDepth=max_depth, seed=seed, subsamplingRate=0.8,
    )
    if weight_col:
        kwargs["weightCol"] = weight_col
    if task == "classification":
        from pyspark.ml.classification import RandomForestClassifier

        model = RandomForestClassifier(**kwargs).fit(vec)
    else:
        from pyspark.ml.regression import RandomForestRegressor

        model = RandomForestRegressor(**kwargs).fit(vec)
    return model


def _rf_importances(df, feat_cols, target_col, task, n_estimators, max_depth, seed, weight_col):
    model = _fit_rf(df, feat_cols, target_col, task, n_estimators, max_depth, seed, weight_col)
    return np.array(model.featureImportances.toArray())


def _shap_rf_importances(
    work, model, feat_cols, weight_col, shap_sample_size, seed
):
    """SHAP importances = weighted mean |SHAP| on a ≤shap_sample_size eval
    subsample (reference boruta.py:237-291 / subsample boruta.py:509),
    computed by the driver-side interventional TreeSHAP (treeshap.py —
    derivation + deviation notes there)."""
    from mrmr_spark.select.preprocess import deterministic_subsample
    from mrmr_spark.select.treeshap import shap_importances

    cols = list(feat_cols) + ([weight_col] if weight_col else [])
    eval_df = work.select(*cols)
    n = eval_df.count()
    if n > shap_sample_size:
        eval_df = deterministic_subsample(eval_df, shap_sample_size, seed)
    pdf = eval_df.toPandas()
    X = pdf[feat_cols].to_numpy(dtype=np.float64)
    bad = ~np.isfinite(X)
    if bad.any():
        means = np.nanmean(np.where(np.isfinite(X), X, np.nan), axis=0)
        means = np.where(np.isfinite(means), means, 0.0)
        X[bad] = np.take(means, np.where(bad)[1])
    w = pdf[weight_col].to_numpy(dtype=np.float64) if weight_col else None
    return shap_importances(model, X, w)


def boruta_select(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    task: str = "regression",
    weight_col: str | None = None,
    group_col: str | None = None,
    time_col: str | None = None,
    max_iter: int = 20,
    alpha: float = 0.05,
    perc: int = 100,
    n_estimators: int | str = "auto",
    max_depth: int = 5,
    shadow_method: str = "auto",
    block_size: int | str = "auto",
    resolve_tentative: bool = True,
    max_features: int | None = None,
    early_stop_rounds: int = 5,
    importance: str = "native",
    shap_sample_size: int = 2_000,
    seed: int = 0,
) -> BorutaResult:
    """``importance``: 'native' = Spark ML impurity importances;
    'shap' = driver-side interventional TreeSHAP mean-|φ| on a
    ≤shap_sample_size subsample (reference boruta.py:237-291)."""
    if importance not in ("native", "shap"):
        raise ValueError(f"importance must be 'native' or 'shap', got {importance!r}")
    p = len(feature_cols)
    method = resolve_method(shadow_method, group_col is not None, time_col is not None)
    n_est = auto_n_estimators(p, max_depth) if n_estimators == "auto" else int(n_estimators)

    label = target_col
    work_base = df
    if task == "classification":
        from mrmr_spark.select.preprocess import factorize_target

        work_base, _ = factorize_target(df, target_col, "_y_code")
        label = "_y_code"
    work_base = work_base.persist()
    work_base.count()

    status = np.zeros(p, dtype=np.int64)  # 0 tentative, 1 accepted, -1 rejected
    hits = np.zeros(p, dtype=np.int64)
    imp_sum = np.zeros(p)
    imp_count = np.zeros(p, dtype=np.int64)
    p_trials: list[float] = []
    shadow_thresholds: list[float] = []
    idle = 0
    n_trials = 0
    key_cols = ([group_col] if group_col else []) + ([time_col] if time_col else [])
    # per-iteration cost telemetry: the RF fit over [live | shadow] is where
    # a 100-TB run spends its time (the permutation plan is lazy and lands
    # inside the fit action), so surface it in the result metadata
    iter_seconds: list[dict] = []

    for it in range(max_iter):
        active = np.where(status == 0)[0]
        # accepted features stay in the model (they absorb their signal);
        # importance is tracked for everything not yet rejected
        live = np.where(status >= 0)[0]
        if active.size == 0:
            break
        live_cols = [feature_cols[i] for i in live]

        # ALL shadow columns in ONE group-partitioned Arrow pass — exactly
        # one exchange per iteration (vs one window+join per live column)
        specs = [
            (c, f"_sh_{c}", zlib.crc32(c.encode()) % 997) for c in live_cols
        ]
        work = permute_columns_arrow(
            work_base, specs, method, group=group_col,
            order=[time_col] if time_col else None,
            key_cols=key_cols or live_cols,
            seed=seed * 7919 + it * 101,
            block_size=block_size,
        )
        shadow_cols = [out for _, out, _ in specs]

        all_cols = live_cols + shadow_cols
        t0 = time.perf_counter()
        if importance == "shap":
            model = _fit_rf(
                work, all_cols, label, task, n_est, max_depth, seed + it, weight_col
            )
            imp = _shap_rf_importances(
                work, model, all_cols, weight_col, shap_sample_size, seed + it
            )
        else:
            imp = _rf_importances(
                work, all_cols, label, task, n_est, max_depth, seed + it, weight_col
            )
        iter_seconds.append(
            {
                "iter": it,
                "n_live": len(live_cols),
                "n_model_cols": len(all_cols),
                "fit_s": round(time.perf_counter() - t0, 3),
            }
        )
        imp_live = imp[: len(live_cols)]
        imp_shadow = imp[len(live_cols):]

        thr = float(np.percentile(imp_shadow, perc))
        shadow_thresholds.append(thr)
        k = float(np.sum(imp_shadow > thr))
        m_shadow = float(len(imp_shadow))
        p_trials.append((k + 1.0) / (m_shadow + 2.0))

        for pos, j in enumerate(live):
            if status[j] == 0 and imp_live[pos] > thr:
                hits[j] += 1
            imp_sum[j] += float(imp_live[pos])
            imp_count[j] += 1
        n_trials += 1

        pmf = poisson_binom_pmf(np.asarray(p_trials))
        tent = np.where(status == 0)[0]
        alpha_adj = alpha / max(1, tent.size)
        decided = 0
        for j in tent:
            p_hi, p_lo = tail_pvals(pmf, int(hits[j]))
            if p_hi < alpha_adj:
                status[j] = 1
                decided += 1
            elif p_lo < alpha_adj:
                status[j] = -1
                decided += 1

        if decided == 0:
            idle += 1
            if idle >= early_stop_rounds:
                break
        else:
            idle = 0

    mean_imp = np.full(p, np.nan)
    ok = imp_count > 0
    mean_imp[ok] = imp_sum[ok] / imp_count[ok]

    if resolve_tentative and (status == 0).any() and shadow_thresholds:
        med_thr = float(np.median(shadow_thresholds))
        for j in np.where(status == 0)[0]:
            status[j] = -1 if not np.isfinite(mean_imp[j]) else (1 if mean_imp[j] > med_thr else -1)

    if max_features is not None:
        acc = np.where(status == 1)[0]
        if acc.size > max_features:
            keep = set(acc[np.argsort(-mean_imp[acc])][:max_features].tolist())
            for j in acc:
                if int(j) not in keep:
                    status[j] = -1

    work_base.unpersist()
    names = feature_cols
    smap = {1: "accepted", 0: "tentative", -1: "rejected"}
    return BorutaResult(
        selected=[names[i] for i in np.where(status == 1)[0]],
        status={names[i]: smap[int(s)] for i, s in enumerate(status)},
        hits={names[i]: int(h) for i, h in enumerate(hits)},
        n_iter=n_trials,
        mean_importance={names[i]: float(mean_imp[i]) for i in range(p)},
        extras={
            "n_estimators": n_est,
            "shadow_method": method,
            "iteration_seconds": iter_seconds,
            "total_fit_s": round(sum(d["fit_s"] for d in iter_seconds), 3),
        },
    )
