"""User-facing ``precision="fast"`` mode (bf16 E-step responsibilities).

The round-5 hardware sweep (logs/tpu_queue_r5/tpu_q5_kernel_v3.log) measured
the jo_res_bf16r kernel layout 20%/20%/12% faster per iteration than the
shipped kernel at k=20/100/200 — but its bf16 responsibilities make the
factors non-bit-comparable, so it can never be auto-selected
(ops/kernel_select.py keeps it off the allowlist).  ``precision="fast"`` is
the *explicit* user opt-in: these tests pin

* the resolution precedence (env override > fast request > measured table),
* the VMEM fallback at large n (warn + exact kernel at DEFAULT precision),
* numerical closeness of a fast EM step to the exact step,
* estimator wiring (param round-trips; the fit actually traces the bf16r
  kernel), and
* converged model quality on the 20NG-hard synthetic corpus — the whole
  point of the mode is "same optimum, fewer milliseconds".
"""

import warnings

import numpy as np
import pytest
from sklearn.metrics import adjusted_mutual_info_score, adjusted_rand_score

from enstop_tpu.models.plsa import PLSA
from enstop_tpu.ops import pallas_em
from enstop_tpu.synthetic import synthetic_corpus


def _padded_problem(seed, n=48, m=512, k=5, kp=8):
    rng = np.random.default_rng(seed)
    X = ((rng.random((n, m)) < 0.08) * rng.integers(1, 5, (n, m))).astype(
        np.float32
    )
    zd = np.zeros((n, kp), np.float32)
    zd[:, :k] = rng.random((n, k)) + 0.05
    zd[:, :k] /= zd[:, :k].sum(1, keepdims=True)
    wz = np.zeros((kp, m), np.float32)
    wz[:k] = rng.random((k, m)) + 0.05
    wz[:k] /= wz[:k].sum(1, keepdims=True)
    return X, zd, wz


# ---------------------------------------------------------------------------
# variant resolution precedence
# ---------------------------------------------------------------------------

def test_fast_resolves_to_bf16r_variant(monkeypatch):
    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    assert pallas_em._resolve_variant(20, n=4096, precision="fast") == "jo_res_bf16r"
    # n unknown (None) still opts in — the caller padded to kernel blocks
    assert pallas_em._resolve_variant(20, n=None, precision="fast") == "jo_res_bf16r"


def test_fast_falls_back_when_resident_b_exceeds_vmem(monkeypatch):
    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    # n*kp*4 > 64 MB: kp=24 at k=20 -> n beyond ~700k rows
    with pytest.warns(UserWarning, match="precision='fast'"):
        v = pallas_em._resolve_variant(20, n=2_000_000, precision="fast")
    # off-TPU the measured table never applies, so the fallback is shipped
    assert v is None


def test_env_override_beats_fast_request(monkeypatch):
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "shipped")
    assert pallas_em._resolve_variant(20, n=4096, precision="fast") is None
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "jo_resident")
    assert (
        pallas_em._resolve_variant(20, n=4096, precision="fast") == "jo_resident"
    )


def test_fast_precision_maps_to_default_matmuls():
    import jax

    assert pallas_em._resolve_precision("fast") == jax.lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# numerics: a fast step is the exact step up to bf16 rounding
# ---------------------------------------------------------------------------

def test_fast_step_close_to_exact(monkeypatch):
    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    X, zd, wz = _padded_problem(3)
    a_ref, b_ref, ll_ref = pallas_em.em_accumulators_fused(
        X, zd, wz, compute_ll=True, precision="default"
    )
    a_f, b_f, ll_f = pallas_em.em_accumulators_fused(
        X, zd, wz, compute_ll=True, precision="fast"
    )
    a_ref, b_ref = np.asarray(a_ref), np.asarray(b_ref)
    a_f, b_f = np.asarray(a_f), np.asarray(b_f)
    # bf16 keeps ~8 mantissa bits: elementwise agreement to ~1% of the
    # column/row scale is the expected envelope
    np.testing.assert_allclose(a_f, a_ref, rtol=0.05,
                               atol=0.02 * float(np.abs(a_ref).max()))
    np.testing.assert_allclose(b_f, b_ref, rtol=0.05,
                               atol=0.02 * float(np.abs(b_ref).max()))
    # the LL term stays f32 in the bf16r kernel; only s (bf16-rounded divisor
    # inputs upstream) differs
    assert abs(ll_f - ll_ref) < 1e-2 * abs(ll_ref)


def test_fast_refit_close_to_exact(monkeypatch):
    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    X, zd, wz = _padded_problem(5)
    zd_ref, ll_ref = pallas_em.refit_step_fused(
        X, zd, wz, compute_ll=True, precision="default"
    )
    zd_f, ll_f = pallas_em.refit_step_fused(
        X, zd, wz, compute_ll=True, precision="fast"
    )
    np.testing.assert_allclose(np.asarray(zd_f), np.asarray(zd_ref),
                               rtol=0.05, atol=2e-3)
    assert abs(ll_f - ll_ref) < 1e-2 * abs(ll_ref)


# ---------------------------------------------------------------------------
# estimator wiring
# ---------------------------------------------------------------------------

def test_precision_param_roundtrips():
    from enstop_tpu.models.accelerated import TPUPLSA
    from enstop_tpu.models.ensemble import EnsembleTopics

    for cls in (PLSA, TPUPLSA, EnsembleTopics):
        m = cls()
        assert m.get_params()["precision"] == "default"
        m.set_params(precision="fast")
        assert m.get_params()["precision"] == "fast"


def test_fast_fit_traces_bf16r_kernel(monkeypatch):
    """A PLSA(precision='fast') fit must actually reach the bf16r layout."""
    import enstop_tpu.ops.pallas_em_variants as variants

    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    seen = []
    real = variants.em_accumulators_variant

    def spy(*args, **kwargs):
        seen.append(kwargs.get("variant"))
        return real(*args, **kwargs)

    monkeypatch.setattr(variants, "em_accumulators_variant", spy)
    X, labels = synthetic_corpus(n_docs=96, n_words=256, n_topics=4,
                                 tokens_per_doc=40, seed=11)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        PLSA(n_components=4, n_iter=4, n_iter_per_test=2, random_state=0,
             backend="pallas", precision="fast").fit(X)
    assert "jo_res_bf16r" in seen


# ---------------------------------------------------------------------------
# quality: fast mode reaches the same optimum
# ---------------------------------------------------------------------------

def test_fast_fit_quality_band(monkeypatch):
    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    X, labels = synthetic_corpus(
        n_docs=500, n_words=1200, n_topics=6, tokens_per_doc=90,
        doc_topic_alpha=0.35, background_weight=0.6, seed=777,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        emb = PLSA(n_components=6, n_iter=60, random_state=0,
                   backend="pallas", precision="fast").fit_transform(X)
    pred = np.argmax(np.asarray(emb), axis=1)
    ari = adjusted_rand_score(labels, pred)
    ami = adjusted_mutual_info_score(labels, pred)
    # same bands as tests/test_quality_bands.py (exact kernels measure
    # ARI 0.4277 / AMI 0.4148 here)
    assert ari > 0.30, f"fast-mode ARI {ari:.4f} below band"
    assert ami > 0.30, f"fast-mode AMI {ami:.4f} below band"


# ---------------------------------------------------------------------------
# sparse (SELL) paths cannot honor fast mode: they must say so, not drop it
# ---------------------------------------------------------------------------

def test_fast_on_sparse_paths_warns():
    import scipy.sparse as sp

    from enstop_tpu.models.ensemble import ensemble_of_topics
    from enstop_tpu.ops.driver import plsa_fit, plsa_refit

    X, _ = synthetic_corpus(n_docs=96, n_words=256, n_topics=4,
                            tokens_per_doc=40, seed=5)
    Xs = sp.csr_matrix(X)
    with pytest.warns(UserWarning, match="default precision"):
        _, topics = plsa_fit(Xs, 4, backend="sparse", precision="fast",
                             n_iter=4, n_iter_per_test=2, random_state=0)
    with pytest.warns(UserWarning, match="default precision"):
        plsa_refit(Xs, topics, backend="sparse", precision="fast",
                   n_iter=2, random_state=0)
    with pytest.warns(UserWarning, match="default precision"):
        ensemble_of_topics(Xs, 4, n_runs=2, parallelism="weights",
                           backend="sparse", precision="fast",
                           n_iter=4, random_state=0)
