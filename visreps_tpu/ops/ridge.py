"""Multi-alpha ridge regression with per-target CV — himalaya replacement.

Reference path: visreps/analysis/encoding_score.py:47-62 uses
himalaya.RidgeCV(alphas=logspace(−10,10,20), cv=5, fit_intercept=False)
on a CUDA backend. TPU-native redesign:

  * One Gram matrix G = XᵀX (d×d) rides the MXU; per-fold train Grams
    are computed by SUBTRACTING each fold's contribution
    (G_f = G − X_fᵀX_f), so the 5-fold sweep costs one extra rank-n_f
    product per fold instead of five full refits.
  * eigh(G_f) diagonalizes the problem once per fold; all 20 alphas are
    then pure diagonal reweightings — a lax.map of (val, d)·(d, v)
    matmuls, no per-alpha factorization.
  * Per-target (voxel) alpha selection by mean CV R² across folds,
    matching himalaya's per-target behavior; final weights use each
    voxel's own alpha via a single broadcasted solve.

Folds are contiguous KFold(n_folds) without shuffle (sklearn
check_cv semantics, which himalaya inherits).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class RidgeCVResult:
    weights: jnp.ndarray       # (d, v) — fit_intercept=False
    best_alphas: jnp.ndarray   # (v,)
    cv_scores: jnp.ndarray     # (n_alphas, v) mean R² across folds

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(jnp.float32) @ self.weights

    def tree_flatten(self):
        return (self.weights, self.best_alphas, self.cv_scores), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def default_alphas(n: int = 20) -> np.ndarray:
    """logspace(−10, 10, 20) — reference: encoding_score.py:108."""
    return np.logspace(-10, 10, n)


def _kfold_bounds(n: int, n_folds: int) -> list[tuple[int, int]]:
    """Contiguous KFold boundaries (first n % k folds one larger)."""
    sizes = [n // n_folds + (1 if i < n % n_folds else 0) for i in range(n_folds)]
    bounds, start = [], 0
    for s in sizes:
        bounds.append((start, start + s))
        start += s
    return bounds


def _r2_per_target(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    y_mean = y_true.mean(axis=0, keepdims=True)
    sse = jnp.sum((y_true - y_pred) ** 2, axis=0)
    ss = jnp.sum((y_true - y_mean) ** 2, axis=0)
    ss = jnp.where(ss == 0, 1.0, ss)
    return 1.0 - sse / ss


@partial(jax.jit, static_argnames=("n_folds",))
def _ridge_cv_impl(x, y, alphas, n_folds):
    n, d = x.shape
    hp = jax.lax.Precision.HIGHEST
    g = jax.lax.dot(x.T, x, precision=hp)          # (d, d)
    c = jax.lax.dot(x.T, y, precision=hp)          # (d, v)

    cv_scores = jnp.zeros((alphas.shape[0], y.shape[1]), jnp.float32)
    for start, stop in _kfold_bounds(n, n_folds):
        xv = jax.lax.slice_in_dim(x, start, stop, axis=0)
        yv = jax.lax.slice_in_dim(y, start, stop, axis=0)
        gf = g - jax.lax.dot(xv.T, xv, precision=hp)
        cf = c - jax.lax.dot(xv.T, yv, precision=hp)
        lam, v = jnp.linalg.eigh(gf)
        lam = jnp.maximum(lam, 0.0)                 # f32 roundoff guard
        b = jax.lax.dot(v.T, cf, precision=hp)      # (d, v)
        p = jax.lax.dot(xv, v, precision=hp)        # (n_val, d)

        def score_alpha(a):
            pred = jax.lax.dot(p, b / (lam[:, None] + a), precision=hp)
            return _r2_per_target(yv, pred)

        cv_scores = cv_scores + jax.lax.map(score_alpha, alphas)

    cv_scores = cv_scores / n_folds
    best_idx = jnp.argmax(cv_scores, axis=0)        # (v,)
    best_alpha = alphas[best_idx]

    lam, v = jnp.linalg.eigh(g)
    lam = jnp.maximum(lam, 0.0)
    b = jax.lax.dot(v.T, c, precision=hp)
    w = jax.lax.dot(v, b / (lam[:, None] + best_alpha[None, :]), precision=hp)
    return w, best_alpha, cv_scores


def _wood_cv_scores(x, y, lam, v_eig, c, alphas, n_folds, precision):
    """Per-fold CV R² via Woodbury downdates of the FULL Gram eigh.

    Eigendecompositions dominate RidgeCV cost on TPU (eigh(4096) ≈ 0.7 s
    even batched, vs ~40 ms of matmuls per fold): instead of eigh(G_f)
    per fold, diagonalize G once and express each fold's inverse as a
    rank-n_val downdate in the eigenbasis,

        (G_f + aI)^{-1} = V (D_a − U Uᵀ)^{-1} Vᵀ,   U = Vᵀ X_valᵀ,

    solved with the Woodbury identity through an (n_val, n_val) system.
    Stable when every fold's train block has full column rank (the
    caller gates on n − max_fold ≥ d): then λ_min(D_a − UUᵀ) ≥
    λ_min(G_f) which is O(n) for z-normed features, so the small system
    is well-conditioned even at alpha → 0.
    """
    n = x.shape[0]
    hp = jax.lax.Precision.HIGHEST
    # b = V^T c computed ONCE; each fold's ct = V^T c_f = b - u @ yv
    # (d x nv x v instead of d x d x v per fold — 2/3 fewer FLOPs).
    b_full = jax.lax.dot(v_eig.T, c, precision=hp)               # (d, v)
    cv_scores = jnp.zeros((alphas.shape[0], y.shape[1]), jnp.float32)
    for start, stop in _kfold_bounds(n, n_folds):
        xv = jax.lax.slice_in_dim(x, start, stop, axis=0)
        yv = jax.lax.slice_in_dim(y, start, stop, axis=0)
        nv = stop - start
        u = jax.lax.dot(v_eig.T, xv.T, precision=hp)             # (d, nv)
        ct = b_full - jax.lax.dot(u, yv, precision=hp)           # (d, v)

        # The per-alpha products are the sweep's FLOP bulk (20 alphas x
        # 5 folds x v-wide matmuls); they only RANK alphas per voxel,
        # so they honor the caller's `precision` while the eigh, the
        # Woodbury small system and the final weights stay HIGHEST.
        def score_alpha(a):
            dinv = 1.0 / (lam + a)                               # (d,)
            c1 = ct * dinv[:, None]
            r1 = jax.lax.dot(u.T, c1, precision=precision)       # (nv, v)
            ut = u * jnp.sqrt(dinv)[:, None]
            # k feeds the small-system inverse, so it stays HIGHEST
            # regardless of the sweep precision: reduced-precision k
            # weakens s = I − K exactly where it nears singularity
            # (smallest alphas) and can flip near-tied alpha rankings.
            # Costs ~nv²·d flops per (fold, alpha) — a few % of the
            # sweep's v-wide matmuls, which keep `precision`.
            k = jax.lax.dot(ut.T, ut, precision=jax.lax.Precision.HIGHEST)
            s = jnp.eye(nv, dtype=jnp.float32) - k
            # Triangular solves with v-wide RHS are serial-slow on TPU
            # (TRSM doesn't tile onto the MXU); invert the small
            # well-conditioned system once and apply it as a matmul —
            # the fold gate guarantees λ_min(s) = O(n/λ_max) > 0.
            z = jax.lax.dot(jnp.linalg.inv(s), r1, precision=precision)
            pred = r1 + jax.lax.dot(k, z, precision=precision)
            return _r2_per_target(yv, pred)

        cv_scores = cv_scores + jax.lax.map(score_alpha, alphas)
    return cv_scores / n_folds


@partial(jax.jit, static_argnames=("n_folds", "precision"))
def _ridge_cv_wood_impl(x, y, alphas, n_folds, precision=jax.lax.Precision.HIGHEST):
    hp = jax.lax.Precision.HIGHEST
    g = jax.lax.dot(x.T, x, precision=hp)
    c = jax.lax.dot(x.T, y, precision=hp)
    lam, v_eig = jnp.linalg.eigh(g)
    lam = jnp.maximum(lam, 0.0)
    cv_scores = _wood_cv_scores(x, y, lam, v_eig, c, alphas, n_folds, precision)
    best_idx = jnp.argmax(cv_scores, axis=0)
    best_alpha = alphas[best_idx]
    b = jax.lax.dot(v_eig.T, c, precision=hp)
    w = jax.lax.dot(v_eig, b / (lam[:, None] + best_alpha[None, :]), precision=hp)
    return w, best_alpha, cv_scores


def _woodbury_ok(n: int, d: int, n_folds: int) -> bool:
    """Every fold's train block must have full column rank (with slack)
    for the Woodbury small-system to stay well-conditioned."""
    max_fold = n // n_folds + (1 if n % n_folds else 0)
    return (n - max_fold) >= d


def ridge_cv(
    x: jnp.ndarray,
    y: jnp.ndarray,
    alphas: np.ndarray | None = None,
    n_folds: int = 5,
    solver: str = "auto",
) -> RidgeCVResult:
    """Fit ridge with per-target alpha chosen by n-fold CV (no intercept).

    Callers are expected to pass z-normalized x and y (the reference
    z-norms with fit-only stats and sets fit_intercept=False —
    encoding_score.py:55,129-150).

    solver: "auto" uses the single-eigh Woodbury path when the fold
    structure permits (n − max_fold ≥ d), else the per-fold-eigh path;
    "eigh"/"woodbury" force one.
    """
    if alphas is None:
        alphas = default_alphas()
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    a = jnp.asarray(alphas, jnp.float32)
    use_wood = solver == "woodbury" or (
        solver == "auto" and _woodbury_ok(x.shape[0], x.shape[1], n_folds)
    )
    if use_wood:
        w, best_alpha, cv_scores = _ridge_cv_wood_impl(x, y, a, n_folds)
    else:
        w, best_alpha, cv_scores = _ridge_cv_impl(x, y, a, n_folds)
    return RidgeCVResult(weights=w, best_alphas=best_alpha, cv_scores=cv_scores)


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


@partial(jax.jit, static_argnames=("n_folds", "precision"))
def _val_scores_batched_wood(xs, y, xs_val, y_val, alphas, n_folds, precision):
    """(L, n, d) layers, shared (n, v) targets → (L, v) val Pearson r.

    ONE batched eigh over the L layer Grams (the expensive op — see
    _wood_cv_scores), then a lax.map over layers for the CV sweep,
    per-voxel alpha choice, fit, and validation prediction. This is the
    layer-selection inner loop of the encoding protocol
    (reference: visreps/analysis/encoding_score.py:129-162) with the
    14-layer × 5-fold × 20-alpha sweep restructured for the MXU.
    """
    hp = jax.lax.Precision.HIGHEST
    gs = jnp.einsum("lnd,lne->lde", xs, xs, precision=hp)
    lams, v_eigs = jnp.linalg.eigh(gs)
    lams = jnp.maximum(lams, 0.0)

    def per_layer(args):
        x, x_val, lam, v_eig = args
        c = jax.lax.dot(x.T, y, precision=hp)
        cv = _wood_cv_scores(x, y, lam, v_eig, c, alphas, n_folds, precision)
        best_alpha = alphas[jnp.argmax(cv, axis=0)]
        b = jax.lax.dot(v_eig.T, c, precision=hp)
        w = jax.lax.dot(v_eig, b / (lam[:, None] + best_alpha[None, :]), precision=hp)
        pred = jax.lax.dot(x_val, w, precision=hp)
        return correlation_score(y_val, pred)

    return jax.lax.map(per_layer, (xs, xs_val, lams, v_eigs))


@partial(jax.jit, static_argnames=("n_folds",))
def _val_scores_batched_eigh(xs, y, xs_val, y_val, alphas, n_folds):
    """Per-fold-eigh fallback of _val_scores_batched_wood (small n)."""
    hp = jax.lax.Precision.HIGHEST

    def per_layer(args):
        x, x_val = args
        w, _, _ = _ridge_cv_impl(x, y, alphas, n_folds)
        pred = jax.lax.dot(x_val, w, precision=hp)
        return correlation_score(y_val, pred)

    return jax.lax.map(per_layer, (xs, xs_val))


def ridge_cv_val_scores_batched(
    xs_fit, y_fit, xs_val, y_val,
    alphas=None, n_folds: int = 5, solver: str = "auto",
    precision: str = "highest",
):
    """Stacked-layer RidgeCV selection: (L, v) per-voxel val Pearson r."""
    if alphas is None:
        alphas = default_alphas()
    xs_fit = jnp.asarray(xs_fit, jnp.float32)
    a = jnp.asarray(alphas, jnp.float32)
    use_wood = solver == "woodbury" or (
        solver == "auto" and _woodbury_ok(xs_fit.shape[1], xs_fit.shape[2], n_folds)
    )
    if use_wood:
        return _val_scores_batched_wood(
            xs_fit, jnp.asarray(y_fit, jnp.float32),
            jnp.asarray(xs_val, jnp.float32), jnp.asarray(y_val, jnp.float32),
            a, n_folds, _PRECISIONS[precision],
        )
    return _val_scores_batched_eigh(
        xs_fit, jnp.asarray(y_fit, jnp.float32),
        jnp.asarray(xs_val, jnp.float32), jnp.asarray(y_val, jnp.float32),
        a, n_folds,
    )


def _znorm_cols(x, axis=0):
    """Column z-norm with Bessel std + 1e-8 (ops/znorm semantics),
    returning (normed, mean, std)."""
    m = x.mean(axis=axis, keepdims=True)
    s = x.std(axis=axis, ddof=1, keepdims=True) + 1e-8
    return (x - m) / s, m, s


def _cv_and_predict(x_fit, y_fit, x_val, lam, v_eig, alphas, n_folds, precision,
                    use_wood: bool):
    """Per-layer CV alpha choice + full-fit weights + val predictions."""
    hp = jax.lax.Precision.HIGHEST
    c = jax.lax.dot(x_fit.T, y_fit, precision=hp)
    if use_wood:
        cv = _wood_cv_scores(x_fit, y_fit, lam, v_eig, c, alphas, n_folds, precision)
    else:
        _, _, cv = _ridge_cv_impl(x_fit, y_fit, alphas, n_folds)
    best_alpha = alphas[jnp.argmax(cv, axis=0)]
    b = jax.lax.dot(v_eig.T, c, precision=hp)
    w = jax.lax.dot(v_eig, b / (lam[:, None] + best_alpha[None, :]), precision=hp)
    return jax.lax.dot(x_val, w, precision=hp)


@partial(jax.jit, static_argnames=("n_folds", "precision", "use_wood"))
def _selection_val_r_impl(xs, y, fit_idx, val_idx, alphas, n_folds, precision,
                          use_wood):
    """Raw stacked layers → (L, v) val Pearson r, entirely in ONE jit.

    Does the fit/val gather, fit-stat z-norms, batched eigh, Woodbury
    CV sweep, per-voxel-alpha fit and val prediction on device with no
    host round trips — crucial when dispatch rides a remote relay
    (eager per-op latency) and inputs are device-resident activations.
    """
    xs_fit = jnp.take(xs, fit_idx, axis=1)
    xs_val = jnp.take(xs, val_idx, axis=1)
    y_fit, ym, ysd = _znorm_cols(y[fit_idx])
    y_val = (y[val_idx] - ym) / ysd

    xm = xs_fit.mean(axis=1, keepdims=True)
    xsd = xs_fit.std(axis=1, ddof=1, keepdims=True) + 1e-8
    xs_fit = (xs_fit - xm) / xsd
    xs_val = (xs_val - xm) / xsd

    hp = jax.lax.Precision.HIGHEST
    gs = jnp.einsum("lnd,lne->lde", xs_fit, xs_fit, precision=hp)
    lams, v_eigs = jnp.linalg.eigh(gs)
    lams = jnp.maximum(lams, 0.0)

    def per_layer(args):
        x_fit, x_val, lam, v_eig = args
        pred = _cv_and_predict(x_fit, y_fit, x_val, lam, v_eig, alphas, n_folds,
                               precision, use_wood)
        return correlation_score(y_val, pred)

    return jax.lax.map(per_layer, (xs_fit, xs_val, lams, v_eigs))


def ridge_cv_selection_val_r(xs, y, fit_idx, val_idx, alphas=None,
                             n_folds: int = 5, solver: str = "auto",
                             precision: str = "highest"):
    """(L, n, d) RAW layers + (n, v) RAW targets + fit/val split
    → (L, v) per-voxel validation Pearson r (the encoding selection
    criterion, reference: encoding_score.py:129-162)."""
    if alphas is None:
        alphas = default_alphas()
    n_fit = int(np.asarray(fit_idx).shape[0])
    use_wood = solver == "woodbury" or (
        solver == "auto" and _woodbury_ok(n_fit, xs.shape[2], n_folds)
    )
    return _selection_val_r_impl(
        jnp.asarray(xs, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(fit_idx), jnp.asarray(val_idx),
        jnp.asarray(alphas, jnp.float32), n_folds, _PRECISIONS[precision],
        use_wood,
    )


@partial(jax.jit, static_argnames=("n_folds", "precision", "use_wood"))
def _refit_predict_impl(x_tr, x_te, y_tr, y_te, alphas, n_folds, precision,
                        use_wood):
    """Full-train znorm + RidgeCV + test prediction in one jit.

    Returns (pred, voxel_r, y_te_normed) — pred/y_te_normed feed the
    bootstrap-over-cached-predictions."""
    hp = jax.lax.Precision.HIGHEST
    x_tr, xm, xsd = _znorm_cols(x_tr)
    x_te = (x_te - xm) / xsd
    y_tr, ym, ysd = _znorm_cols(y_tr)
    y_te = (y_te - ym) / ysd

    if use_wood:
        w, _, _ = _ridge_cv_wood_impl(x_tr, y_tr, alphas, n_folds, precision)
    else:
        w, _, _ = _ridge_cv_impl(x_tr, y_tr, alphas, n_folds)
    pred = jax.lax.dot(x_te, w, precision=hp)
    return pred, correlation_score(y_te, pred), y_te


def ridge_cv_refit_predict(x_tr, y_tr, x_te, y_te, alphas=None,
                           n_folds: int = 5, solver: str = "auto",
                           precision: str = "highest"):
    """Refit on the full train split, predict test. Returns
    (pred, voxel_r, y_te_normed) as device arrays."""
    if alphas is None:
        alphas = default_alphas()
    use_wood = solver == "woodbury" or (
        solver == "auto" and _woodbury_ok(x_tr.shape[0], x_tr.shape[1], n_folds)
    )
    return _refit_predict_impl(
        jnp.asarray(x_tr, jnp.float32), jnp.asarray(x_te, jnp.float32),
        jnp.asarray(y_tr, jnp.float32), jnp.asarray(y_te, jnp.float32),
        jnp.asarray(alphas, jnp.float32), n_folds, _PRECISIONS[precision],
        use_wood,
    )


@jax.jit
def _znormed_gram(x):
    xn, _, _ = _znorm_cols(x)
    return jax.lax.dot(xn.T, xn, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("n_folds", "precision"))
def _refit_from_eigh_impl(x_tr, x_te, y_tr, y_te, lam, v_eig, alphas, n_folds,
                          precision):
    """Refit given a precomputed eigh of the z-normed train Gram."""
    hp = jax.lax.Precision.HIGHEST
    x_tr, xm, xsd = _znorm_cols(x_tr)
    x_te = (x_te - xm) / xsd
    y_tr, ym, ysd = _znorm_cols(y_tr)
    y_te = (y_te - ym) / ysd
    c = jax.lax.dot(x_tr.T, y_tr, precision=hp)
    cv = _wood_cv_scores(x_tr, y_tr, lam, v_eig, c, alphas, n_folds, precision)
    best_alpha = alphas[jnp.argmax(cv, axis=0)]
    b = jax.lax.dot(v_eig.T, c, precision=hp)
    w = jax.lax.dot(v_eig, b / (lam[:, None] + best_alpha[None, :]), precision=hp)
    pred = jax.lax.dot(x_te, w, precision=hp)
    return pred, correlation_score(y_te, pred), y_te


def ridge_cv_refit_predict_grouped(jobs, alphas=None, n_folds: int = 5,
                                   solver: str = "auto",
                                   precision: str = "highest"):
    """Refit MANY (x_tr, y_tr, x_te, y_te) jobs with their full-train
    eigendecompositions batched into one call.

    eigh(4096) costs ~12 s solo but ~0.7 s/item batched on TPU; the
    per-(subject, layer) refits across an eval sweep all share d, so
    their Grams stack even when n differs. Jobs that fail the Woodbury
    fold-rank gate fall back to the per-fold-eigh path individually.
    Returns a list of (pred, voxel_r, y_te_normed) in job order.
    """
    if alphas is None:
        alphas = default_alphas()
    a = jnp.asarray(alphas, jnp.float32)

    wood_idx = [i for i, j in enumerate(jobs)
                if solver != "eigh" and (solver == "woodbury" or _woodbury_ok(
                    j["x_tr"].shape[0], j["x_tr"].shape[1], n_folds))]
    results: dict = {}

    def _targets(j):
        if "y_tr" in j:
            return j["y_tr"], j["y_te"]
        from visreps_tpu.analysis.encoding import _job_targets

        return _job_targets(j)

    if wood_idx:
        gs = jnp.stack([
            _znormed_gram(jnp.asarray(jobs[i]["x_tr"], jnp.float32))
            for i in wood_idx
        ])
        lams, v_eigs = jnp.linalg.eigh(gs)
        lams = jnp.maximum(lams, 0.0)
        for k, i in enumerate(wood_idx):
            j = jobs[i]
            y_tr, y_te = _targets(j)
            results[i] = _refit_from_eigh_impl(
                jnp.asarray(j["x_tr"], jnp.float32),
                jnp.asarray(j["x_te"], jnp.float32),
                jnp.asarray(y_tr, jnp.float32),
                jnp.asarray(y_te, jnp.float32),
                lams[k], v_eigs[k], a, n_folds, _PRECISIONS[precision],
            )

    for i, j in enumerate(jobs):
        if i in results:
            continue
        y_tr, y_te = _targets(j)
        results[i] = _refit_predict_impl(
            jnp.asarray(j["x_tr"], jnp.float32), jnp.asarray(j["x_te"], jnp.float32),
            jnp.asarray(y_tr, jnp.float32), jnp.asarray(y_te, jnp.float32),
            a, n_folds, _PRECISIONS[precision], False,
        )
    return [results[i] for i in range(len(jobs))]


@jax.jit
def correlation_score(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Per-column (voxel) Pearson r — himalaya.scoring.correlation_score."""
    yt = y_true - y_true.mean(axis=0, keepdims=True)
    yp = y_pred - y_pred.mean(axis=0, keepdims=True)
    denom = jnp.sqrt(jnp.sum(yt * yt, axis=0) * jnp.sum(yp * yp, axis=0))
    return jnp.where(denom > 0, jnp.sum(yt * yp, axis=0) / denom, 0.0)
