"""Parity of the experimental EM-kernel grid layouts (ops/pallas_em_variants)
and the interpret-mode aliasing fix in ops/pallas_em.

Background: Pallas INTERPRET mode mishandles ``input_output_aliases`` on
blocks revisited non-consecutively (stale reads of the aliased input), so
aliased-accumulator layouts silently corrupt their accumulator whenever the
grid revisits a block.  On real TPU the aliasing is correct
(device-validated).  Consequences pinned here:

* ``em_accumulators_fused`` routes interpret-mode execution with more than
  one row block through the alias-free ``jo_resident`` layout — its output
  must match the numpy oracle on multi-block grids (it silently did NOT
  before the fix);
* ``jo_resident`` (no aliasing) is oracle-checked on full multi-block grids;
* ``jo`` (aliased B) can only be interpret-checked on grids where each B
  block is visited once (single column strip); its multi-strip accumulation
  is validated on device by scripts/exp_kernel_v3.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from enstop_tpu.ops import pallas_em
from enstop_tpu.ops.pallas_em_variants import em_accumulators_variant


def _padded_problem(seed, n=48, m=512, k=5, kp=8, weighted=False):
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
    w = None
    if weighted:
        w = (rng.random(n) + 0.5).astype(np.float32)
    return X, zd, wz, w


def _oracle(X, zd, wz, w):
    wcol = np.ones((X.shape[0], 1)) if w is None else w[:, None]
    S = np.maximum(zd @ wz, 1e-30)
    R = np.where(X > 0, X / S, 0.0)
    A = (zd * wcol).T @ R
    B = R @ wz.T
    ll = float((X * np.log(S) * wcol).sum())
    return A.astype(np.float32), B.astype(np.float32), ll


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("compute_ll", [True, False])
def test_jo_resident_matches_oracle_multiblock(weighted, compute_ll):
    X, zd, wz, w = _padded_problem(0, weighted=weighted)
    sw = None if w is None else jnp.asarray(w)
    a, b, ll = em_accumulators_variant(
        jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz), sample_weight=sw,
        variant="jo_resident", bd=16, bw=256, compute_ll=compute_ll,
    )
    A0, B0, ll0 = _oracle(X, zd, wz, w)
    np.testing.assert_allclose(np.asarray(a), A0, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), B0, rtol=1e-5, atol=1e-3)
    if compute_ll:
        np.testing.assert_allclose(float(ll), ll0, rtol=1e-5)
    else:
        assert float(ll) == 0.0


def test_fused_interpret_multiblock_matches_oracle():
    """Regression for the interpret aliasing fix: the public fused entry
    point must be oracle-correct with MULTIPLE row blocks (before the fix
    its aliased A accumulator kept only the last row block's contribution
    in interpret mode)."""
    X, zd, wz, w = _padded_problem(2, weighted=True)
    a, b, ll = pallas_em.em_accumulators_fused(
        jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz),
        sample_weight=jnp.asarray(w), bd=16, bw=256,
    )
    A0, B0, ll0 = _oracle(X, zd, wz, w)
    np.testing.assert_allclose(np.asarray(a), A0, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), B0, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(float(ll), ll0, rtol=1e-5)


def test_jo_res_bf16r_close_to_oracle():
    """The bf16-responsibilities variant trades the f32 VPU divide for bf16
    (~2^-8 relative rounding per entry); accumulators are same-sign sums so
    the relative error stays at bf16 rounding scale."""
    X, zd, wz, w = _padded_problem(4, weighted=True)
    a, b, ll = em_accumulators_variant(
        jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz),
        sample_weight=jnp.asarray(w), variant="jo_res_bf16r", bd=16, bw=256,
    )
    A0, B0, ll0 = _oracle(X, zd, wz, w)
    np.testing.assert_allclose(np.asarray(a), A0, rtol=2e-2, atol=0.05)
    np.testing.assert_allclose(np.asarray(b), B0, rtol=2e-2, atol=0.05)
    np.testing.assert_allclose(float(ll), ll0, rtol=1e-4)


def test_jo_single_strip_matches_jo_resident():
    """With one column strip the aliased B block is visited once, so the jo
    layout is interpret-safe; both variants share per-tile math and
    accumulation order, so A and B must be bit-identical."""
    X, zd, wz, w = _padded_problem(1, m=256)
    args = (jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz))
    a1, b1, ll1 = em_accumulators_variant(*args, variant="jo", bd=16, bw=256)
    a2, b2, ll2 = em_accumulators_variant(
        *args, variant="jo_resident", bd=16, bw=256
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_allclose(float(ll1), float(ll2), rtol=1e-6)


def test_env_kernel_variant_routing(monkeypatch):
    """ENSTOP_EM_KERNEL routes the production accumulator entry point to a
    variant layout (read at trace time); unknown names fail loudly."""
    X, zd, wz, _ = _padded_problem(5)
    args = (jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz))
    base = pallas_em.em_accumulators_fused(*args, bd=16, bw=256)
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "jo_resident")
    routed = pallas_em.em_accumulators_fused(*args, bd=16, bw=256)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(routed[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(routed[1]))
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "bogus")
    with pytest.raises(ValueError, match="ENSTOP_EM_KERNEL"):
        pallas_em.em_accumulators_fused(*args, bd=16, bw=256)


def test_refit_variant_matches_shipped_refit():
    """The j-outer resident refit layout must reproduce the shipped refit
    accumulator bit-for-bit in tile order... it accumulates over j in the
    same order, so B is bit-identical; ll order differs (tolerance)."""
    from enstop_tpu.ops.pallas_em_variants import refit_accumulator_variant

    X, zd, wz, w = _padded_problem(6, weighted=True)
    args = (jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz))
    b0, ll0 = pallas_em._fused_refit_call(
        *args, jnp.asarray(w).reshape(-1, 1), 16, 256,
        compute_ll=True, precision_key="default",
    )
    b1, ll1 = refit_accumulator_variant(
        *args, sample_weight=jnp.asarray(w), variant="jo_resident",
        bd=16, bw=256, compute_ll=True,
    )
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_allclose(float(ll0), float(ll1), rtol=1e-5)


def test_refit_env_routing(monkeypatch):
    """transform-path parity through the env switch: refit_step_fused routed
    to the variant produces the same next P(z|d)."""
    X, zd, wz, _ = _padded_problem(7)
    args = (jnp.asarray(X), jnp.asarray(zd), jnp.asarray(wz))
    base, ll_b = pallas_em.refit_step_fused(*args, bd=16, bw=256)
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "jo_resident")
    routed, ll_r = pallas_em.refit_step_fused(*args, bd=16, bw=256)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(routed))


def test_fused_multiblock_em_trajectory_matches_oracle():
    """Three multiplicative-update steps through the fixed interpret path
    track a float64 numpy EM to f32 tolerance on a multi-row-block grid."""
    X, zd, wz, _ = _padded_problem(3)
    zd_j, wz_j = jnp.asarray(zd), jnp.asarray(wz)
    zd_o, wz_o = zd.astype(np.float64), wz.astype(np.float64)
    for _ in range(3):
        a, b, _ = pallas_em.em_accumulators_fused(
            jnp.asarray(X), zd_j, wz_j, bd=16, bw=256, compute_ll=False
        )
        num = wz_j * a
        wz_j = num / jnp.maximum(num.sum(1, keepdims=True), 1e-30)
        num = zd_j * b
        zd_j = num / jnp.maximum(num.sum(1, keepdims=True), 1e-30)

        A0, B0, _ = _oracle(X, zd_o.astype(np.float32), wz_o.astype(np.float32), None)
        num = wz_o * A0
        wz_o = num / np.maximum(num.sum(1, keepdims=True), 1e-30)
        num = zd_o * B0
        zd_o = num / np.maximum(num.sum(1, keepdims=True), 1e-30)

    np.testing.assert_allclose(np.asarray(zd_j), zd_o, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wz_j), wz_o, rtol=5e-4, atol=1e-5)


def test_jo_variant_interpret_guard():
    """The aliased 'jo' layout is device-only on multi-block grids: interpret
    mode stale-reads revisited aliased blocks, so off-TPU it must refuse
    rather than silently corrupt B (the production router falls back to
    jo_resident instead)."""
    import pytest

    from enstop_tpu.ops.pallas_em_variants import em_accumulators_variant

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.poisson(1.0, (48, 512)).astype(np.float32))
    zd = jnp.asarray(rng.rand(48, 8).astype(np.float32))
    wz = jnp.asarray(rng.rand(8, 512).astype(np.float32))
    with pytest.raises(NotImplementedError, match="device-only"):
        em_accumulators_variant(X, zd, wz, variant="jo", bd=16, bw=256)


def test_env_jo_routes_to_resident_off_tpu(monkeypatch):
    """ENSTOP_EM_KERNEL=jo through the production entry point must produce
    the alias-free jo_resident result off-TPU (bit-identical math), keeping
    a CPU re-exec of a jo bench correct."""
    from enstop_tpu.ops import pallas_em

    rng = np.random.RandomState(1)
    X = jnp.asarray(rng.poisson(1.0, (48, 512)).astype(np.float32))
    zd = jnp.asarray(rng.rand(48, 8).astype(np.float32))
    wz = jnp.asarray(rng.rand(8, 512).astype(np.float32))

    base = pallas_em.em_accumulators_fused(X, zd, wz, bd=16, bw=256)
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "jo")
    routed = pallas_em.em_accumulators_fused(X, zd, wz, bd=16, bw=256)
    for got, want in zip(routed, base):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-8)
