"""All-pairs distances between topic distributions (matmul-shaped, JAX).

The reference computes pairwise KL divergence and Hellinger distance with numba
prange double loops (enstop_.py:234-263).  Both are matmul-shaped:

* Hellinger: ``H_ij = sqrt(1 - sum_w sqrt(t_i t_j))`` — one Gram matrix of the
  row-sqrt'd topics.
* KL (base 2): ``KL_ij = sum_w t_i (log2 t_i - log2 t_j)`` over entries where both
  are positive — an inner product of ``t_i`` with ``log2 t_j`` plus a row entropy.

Inputs are small (n_runs · k topic rows), so these run anywhere; on TPU they are
single MXU calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["all_pairs_hellinger_distance", "all_pairs_kl_divergence",
           "hellinger", "kl_divergence"]


def kl_divergence(a, b):
    """KL divergence between two multinomials in BITS (the reference uses
    log2, enstop_.py:235-242), skipping entries where either side is zero."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mask = (a > 0) & (b > 0)
    return float(np.sum(a[mask] * (np.log2(a[mask]) - np.log2(b[mask]))))


def hellinger(a, b):
    """Hellinger distance between two l1-normalized distributions (the metric the
    reference imports from umap.distances, enstop_.py:27)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    sim = np.sum(np.sqrt(a * b))
    l1a, l1b = a.sum(), b.sum()
    if l1a == 0 and l1b == 0:
        return 0.0
    if l1a == 0 or l1b == 0:
        return 1.0
    return float(np.sqrt(max(0.0, 1.0 - sim / np.sqrt(l1a * l1b))))


@jax.jit
def _hellinger_matrix(T):
    sq = jnp.sqrt(jnp.maximum(T, 0.0))
    # HIGHEST: these matrices feed HDBSCAN, whose dendrogram is sensitive to
    # last-ulp tie order; bf16 (TPU DEFAULT) perturbs them ~1e-3 and would
    # silently diverge from the CPU-tested golden-parity pipeline.  They are
    # (n_runs*k)^2-tiny, so full-f32 multiplies are free.
    sim = jnp.dot(sq, sq.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    l1 = T.sum(axis=1)
    denom = jnp.sqrt(jnp.outer(l1, l1))
    both_zero = (l1[:, None] == 0) & (l1[None, :] == 0)
    one_zero = ((l1[:, None] == 0) | (l1[None, :] == 0)) & ~both_zero
    ratio = jnp.where(denom > 0, sim / jnp.maximum(denom, 1e-30), 0.0)
    d = jnp.sqrt(jnp.maximum(0.0, 1.0 - ratio))
    d = jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, d))
    return d


def _as_device_f32(distributions):
    # a jax array stays on device (no host round-trip: the ensemble fan-out
    # hands over device-resident topic stacks)
    if isinstance(distributions, jax.Array):
        return distributions.astype(jnp.float32)
    return jnp.asarray(np.asarray(distributions, dtype=np.float32))


def all_pairs_hellinger_distance(distributions):
    """Pairwise Hellinger distances (reference enstop_.py:257-263)."""
    out = np.asarray(_hellinger_matrix(_as_device_f32(distributions)),
                     dtype=np.float64)
    np.fill_diagonal(out, 0.0)
    return out


@jax.jit
def _kl_matrix(T):
    # terms where either side is zero are skipped by the reference (enstop_.py:238)
    pos = T > 0
    logT = jnp.where(pos, jnp.log2(jnp.maximum(T, 1e-38)), 0.0)
    # cross_ij = sum_w t_i log2 t_j over w where t_i>0 and t_j>0
    cross = jnp.dot(jnp.where(pos, T, 0.0), jnp.where(pos, logT, 0.0).T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    # but t_i entries where t_j == 0 must also drop from the self term:
    # self_term_ij = sum_w t_i log2 t_i * [t_j > 0]
    self_cross = jnp.dot(jnp.where(pos, T * logT, 0.0), pos.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    return self_cross - cross


def all_pairs_kl_divergence(distributions):
    """Pairwise KL divergences in bits (reference enstop_.py:234-253)."""
    out = np.asarray(_kl_matrix(_as_device_f32(distributions)),
                     dtype=np.float64)
    np.fill_diagonal(out, 0.0)
    return out
