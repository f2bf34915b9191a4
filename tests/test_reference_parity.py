"""Differential parity vs the ACTUAL reference implementation.

Imports `/root/reference/visreps` (torch CPU) and feeds the SAME
synthetic planted-signal fixtures to both pipelines, asserting the
composed protocols agree end to end (VERDICT r2 item 3):

  * RSA (visreps/analysis/rsa.py:132-281): identical selected layer,
    selection + point scores within 1e-4, identical bootstrap index
    streams, CI brackets within 1e-4 — including the n_select subsample
    path where the reference CONTINUES the selection RandomState into
    the bootstrap draws.
  * RDM kernel (rsa.py:59-93): elementwise equality within fp32.
  * Kendall tau-a (rsa.py:22-40): equality on tied data.
  * Encoding (encoding_score.py:65-260): identical selected layer and
    mean-r agreement for the composed split/z-norm/refit/bootstrap
    pipeline. himalaya is not installed in this image, so its RidgeCV
    is backed here by an INDEPENDENT float64 numpy SVD implementation
    of the published spec (logspace(−10,10,20) alphas, contiguous
    5-fold CV, per-target alpha by mean CV R², fit_intercept=False) —
    the reference's own orchestration code runs unmodified.

The reference tree is read-only and UNTRUSTED; only its code behavior
is exercised, nothing from it is executed at import time beyond the
modules under test.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

REF_ROOT = "/root/reference"


# ───────────────────── dependency stubs ──────────────────────
def _stub(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # A None __spec__ breaks importlib.util.find_spec for other
    # packages probing optional deps (e.g. transformers checks wandb).
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    if "omegaconf" not in sys.modules:
        om = _stub("omegaconf")

        class DictConfig(dict):
            pass

        om.DictConfig = DictConfig
        om.OmegaConf = types.SimpleNamespace(
            create=lambda x=None: dict(x or {}),
            merge=lambda a, b: {**dict(a), **dict(b)},
            to_container=lambda x, **k: dict(x),
        )
    if "dotenv" not in sys.modules:
        _stub("dotenv").load_dotenv = lambda *a, **k: None
    if "wandb" not in sys.modules:
        wb = _stub("wandb")
        wb.init = wb.login = wb.log = wb.finish = lambda *a, **k: None

    if "himalaya" not in sys.modules:
        him = _stub("himalaya")
        backend_mod = _stub("himalaya.backend")
        ridge_mod = _stub("himalaya.ridge")
        scoring_mod = _stub("himalaya.scoring")
        him.backend, him.ridge, him.scoring = backend_mod, ridge_mod, scoring_mod

        class _TorchBackend:
            name = "torch_cpu"

            @staticmethod
            def asarray(x):
                if isinstance(x, torch.Tensor):
                    return x
                return torch.as_tensor(np.asarray(x))

        backend_mod.set_backend = lambda *a, **k: _TorchBackend()

        def correlation_score(y_true, y_pred):
            yt = torch.as_tensor(np.asarray(y_true, np.float64))
            yp = torch.as_tensor(np.asarray(y_pred, np.float64))
            yt = yt - yt.mean(dim=0, keepdim=True)
            yp = yp - yp.mean(dim=0, keepdim=True)
            denom = torch.sqrt((yt * yt).sum(0) * (yp * yp).sum(0))
            return torch.where(denom > 0, (yt * yp).sum(0) / denom,
                               torch.zeros_like(denom)).float()

        scoring_mod.correlation_score = correlation_score

        class RidgeCV:
            """float64 numpy SVD RidgeCV with per-target alpha (the
            published himalaya spec; independent of visreps_tpu's
            eigh/Woodbury JAX implementation)."""

            def __init__(self, alphas, cv=5, fit_intercept=False):
                assert not fit_intercept
                self.alphas = np.asarray(alphas, np.float64)
                self.cv = cv

            @staticmethod
            def _folds(n, k):
                sizes = [n // k + (1 if i < n % k else 0) for i in range(k)]
                out, start = [], 0
                for s in sizes:
                    out.append((start, start + s))
                    start += s
                return out

            def fit(self, X, Y):
                X = np.asarray(X, np.float64)
                Y = np.asarray(Y, np.float64)
                n, d = X.shape
                v = Y.shape[1]
                cv_scores = np.zeros((len(self.alphas), v))
                for start, stop in self._folds(n, self.cv):
                    mask = np.ones(n, bool)
                    mask[start:stop] = False
                    Xt, Yt = X[mask], Y[mask]
                    Xv, Yv = X[~mask], Y[~mask]
                    U, s, Vt = np.linalg.svd(Xt, full_matrices=False)
                    UtY = U.T @ Yt
                    var = ((Yv - Yv.mean(0)) ** 2).sum(0)
                    var[var == 0] = 1.0
                    for ai, a in enumerate(self.alphas):
                        w = Vt.T @ (UtY * (s / (s * s + a))[:, None])
                        resid = ((Yv - Xv @ w) ** 2).sum(0)
                        cv_scores[ai] += 1.0 - resid / var
                cv_scores /= self.cv
                best = np.argmax(cv_scores, axis=0)
                U, s, Vt = np.linalg.svd(X, full_matrices=False)
                UtY = U.T @ Y
                W = np.empty((d, v))
                for ai in np.unique(best):
                    cols = best == ai
                    a = self.alphas[ai]
                    W[:, cols] = Vt.T @ (UtY[:, cols] * (s / (s * s + a))[:, None])
                self.coef_ = W
                return self

            def predict(self, X):
                X = np.asarray(X, np.float64)
                return torch.as_tensor(X @ self.coef_).float()

        ridge_mod.RidgeCV = RidgeCV


_install_stubs()
if REF_ROOT not in sys.path:
    # APPEND, not insert: the reference tree also contains top-level
    # `scripts`/`experiments` packages that must not shadow ours.
    sys.path.append(REF_ROOT)

ref_rsa = pytest.importorskip("visreps.analysis.rsa")
ref_alignment = pytest.importorskip("visreps.analysis.alignment")
ref_encoding = pytest.importorskip("visreps.analysis.encoding_score")

from visreps_tpu.analysis.alignment import AlignmentData  # noqa: E402
from visreps_tpu.analysis.encoding import compute_encoding_score  # noqa: E402
from visreps_tpu.analysis.rsa import compute_rsa  # noqa: E402
from visreps_tpu.core.config import Config  # noqa: E402
from visreps_tpu.ops.bootstrap import bootstrap_indices  # noqa: E402
from visreps_tpu.ops.rdm import compute_rdm  # noqa: E402
from visreps_tpu.ops.stats import kendall_tau_a  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _planted(rng, n_train=80, n_test=40, v=16, d=32, tie=False):
    """Identical numpy fixtures for both frameworks."""

    def make(n):
        neural = rng.randn(n, v).astype(np.float32)
        signal = np.hstack([neural, 0.3 * rng.randn(n, d - v)]).astype(np.float32)
        mid = np.hstack([0.5 * neural + 0.5 * rng.randn(n, v),
                         rng.randn(n, d - v)]).astype(np.float32)
        noise = rng.randn(n, d).astype(np.float32)
        if tie:
            neural[:5] = neural[0]
            signal[:5] = signal[0]
        acts = {"noise": noise, "mid": mid, "signal": signal}
        return neural, acts

    return make(n_train), make(n_test)


def _ref_alignment_data(neural, acts, ids):
    return ref_alignment.AlignmentData(
        activations={k: torch.from_numpy(a.copy()) for k, a in acts.items()},
        neural=torch.from_numpy(neural.copy()),
        stimulus_ids=ids,
    )


def _our_alignment_data(neural, acts, ids):
    return AlignmentData(
        activations={k: a.copy() for k, a in acts.items()},
        neural=neural.copy(), stimulus_ids=ids,
    )


class TestRDMParity:
    @pytest.mark.parametrize("correlation", ["pearson", "spearman"])
    def test_rdm_elementwise(self, rng, correlation):
        x = rng.randn(50, 30).astype(np.float32)
        ours = np.asarray(compute_rdm(jnp.asarray(x), correlation=correlation))
        theirs = ref_rsa.compute_rdm(
            torch.from_numpy(x), correlation=correlation).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-6)

    def test_rdm_degenerate_rows(self, rng):
        x = rng.randn(20, 10).astype(np.float32)
        x[3] = 1.0  # zero-variance row hits the std guard
        ours = np.asarray(compute_rdm(jnp.asarray(x)))
        theirs = ref_rsa.compute_rdm(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-6)


class TestKendallParity:
    def test_tau_a_with_ties(self, rng):
        x = np.round(rng.randn(300), 1).astype(np.float32)  # heavy ties
        y = np.round(rng.randn(300), 1).astype(np.float32)
        ours = float(kendall_tau_a(jnp.asarray(x), jnp.asarray(y)))
        theirs, _ = ref_rsa._kendall_tau_a(x, y)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestBootstrapStreamParity:
    def test_index_stream_matches_reference_eval_loop(self):
        """Our precomputed index sets == the reference's serial draws
        (visreps/evals.py:356-364: fresh RandomState(42) per pair)."""
        n_test, n_boot = 37, 25
        ours = bootstrap_indices(n_test, n_boot, seed=42)
        rng = np.random.RandomState(42)
        n_sub = int(n_test * 0.9)
        for i in range(n_boot):
            np.testing.assert_array_equal(
                ours[i], rng.choice(n_test, size=n_sub, replace=False))


class TestRSAParity:
    @pytest.mark.parametrize("method,n_select,tie", [
        ("spearman", None, False),
        ("spearman", 50, False),     # subsample path: continued-rng bootstrap
        ("spearman", None, True),    # tied RDMs: average-tie vs dense ranks
        ("kendall", None, False),
        ("pearson", None, False),
    ])
    def test_compute_rsa_end_to_end(self, rng, method, n_select, tie):
        (tr_neural, tr_acts), (te_neural, te_acts) = _planted(rng, tie=tie)
        ids_tr = [str(i) for i in range(len(tr_neural))]
        ids_te = [str(i) for i in range(len(te_neural))]

        ref_res = ref_rsa.compute_rsa(
            {"compare_method": method},
            _ref_alignment_data(tr_neural, tr_acts, ids_tr),
            _ref_alignment_data(te_neural, te_acts, ids_te),
            n_select=n_select, bootstrap=True, n_bootstrap=60, seed=42,
        )[0]
        our_res = compute_rsa(
            Config({"compare_method": method}),
            _our_alignment_data(tr_neural, tr_acts, ids_tr),
            _our_alignment_data(te_neural, te_acts, ids_te),
            n_select=n_select, bootstrap=True, n_bootstrap=60, seed=42,
        )[0]

        assert our_res["layer"] == ref_res["layer"]
        ref_sel = {s["layer"]: s["score"] for s in ref_res["layer_selection_scores"]}
        our_sel = {s["layer"]: s["score"] for s in our_res["layer_selection_scores"]}
        tol = 5e-4 if tie else 1e-4  # dense vs average selection ranks on ties
        for layer in ref_sel:
            np.testing.assert_allclose(our_sel[layer], ref_sel[layer], atol=tol)
        np.testing.assert_allclose(our_res["score"], ref_res["score"], atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(our_res["bootstrap_scores"]),
            np.asarray(ref_res["bootstrap_scores"]), atol=1e-4)
        np.testing.assert_allclose(our_res["ci_low"], ref_res["ci_low"], atol=1e-4)
        np.testing.assert_allclose(our_res["ci_high"], ref_res["ci_high"], atol=1e-4)


class TestEncodingParity:
    def test_compute_encoding_score_end_to_end(self, rng):
        (tr_neural, tr_acts), (te_neural, te_acts) = _planted(
            rng, n_train=120, n_test=50, v=12, d=20)
        ids_tr = [str(i) for i in range(len(tr_neural))]
        ids_te = [str(i) for i in range(len(te_neural))]

        ref_res = ref_encoding.compute_encoding_score(
            _ref_alignment_data(tr_neural, tr_acts, ids_tr),
            _ref_alignment_data(te_neural, te_acts, ids_te),
            bootstrap=True, n_bootstrap=60, seed=42,
        )[0]
        our_res = compute_encoding_score(
            _our_alignment_data(tr_neural, tr_acts, ids_tr),
            _our_alignment_data(te_neural, te_acts, ids_te),
            bootstrap=True, n_bootstrap=60, seed=42,
        )[0]

        assert our_res["layer"] == ref_res["layer"]
        ref_sel = {s["layer"]: s["score"] for s in ref_res["layer_selection_scores"]}
        our_sel = {s["layer"]: s["score"] for s in our_res["layer_selection_scores"]}
        for layer in ref_sel:
            np.testing.assert_allclose(our_sel[layer], ref_sel[layer], atol=2e-3)
        np.testing.assert_allclose(our_res["score"], ref_res["score"], atol=2e-3)
        np.testing.assert_allclose(our_res["ci_low"], ref_res["ci_low"], atol=3e-3)
        np.testing.assert_allclose(our_res["ci_high"], ref_res["ci_high"], atol=3e-3)
