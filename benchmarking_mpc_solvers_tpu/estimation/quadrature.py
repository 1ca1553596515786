"""Sigma-point (unscented) quadrature inference.

Pure-function redesign of ``MPCBenchmark/i2c/quadrature_inf.py:4-65``: the
same (α, β, κ) sigma-point construction, Cholesky propagation and
einsum-based moment matching, as jittable functions. The reference zeroes
the center-point weights after construction (``quadrature_inf.py:20-21``) —
reproduced here, since downstream moments depend on it.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SigmaPoints(NamedTuple):
    base_pts: jnp.ndarray  # (2d+1, d) unit directions
    wghts_m: jnp.ndarray  # (2d+1,) mean weights
    wghts_sig: jnp.ndarray  # (2d+1,) covariance weights
    sf: float  # sqrt(d + λ) scale


def make_sigma_points(alpha: float, beta: float, kappa: float, dim: int) -> SigmaPoints:
    lam = alpha**2 * (dim + kappa) - dim
    sf = float(np.sqrt(dim + lam))
    n = 2 * dim + 1
    w_m = np.full((n,), 1.0 / (2.0 * (dim + lam)), np.float32)
    w_m[0] *= 2.0 * lam
    w_sig = w_m.copy()
    w_sig[0] += 1.0 - alpha**2 + beta
    # reference quirk: center weights zeroed after construction
    w_m[0] = 0.0
    w_sig[0] = 0.0
    base = np.vstack([np.zeros((1, dim)), np.eye(dim), -np.eye(dim)]).astype(np.float32)
    return SigmaPoints(jnp.asarray(base), jnp.asarray(w_m), jnp.asarray(w_sig), sf)


def propagate(sp: SigmaPoints, m_x, sig_x):
    """Sigma points m + base·(sf·chol(Σ))ᵀ (``quadrature_inf.py:34-37``)."""
    scale = sp.sf * jnp.linalg.cholesky(sig_x)
    return m_x[None, :] + sp.base_pts @ scale.T


def moments(sp: SigmaPoints, f: Callable, m_x, sig_x):
    """Propagate through f and moment-match: returns (m_y, sig_y, sig_xy)
    (``quadrature_inf.py:44-65``). f maps (n, d) points -> (n, dy)."""
    with jax.default_matmul_precision("highest"):
        x_pts = propagate(sp, m_x, sig_x)
        y_pts = f(x_pts)
        m_y = sp.wghts_m @ y_pts
        sig_y = jnp.einsum("b,bi,bj->ij", sp.wghts_sig, y_pts, y_pts) - jnp.outer(m_y, m_y)
        sig_xy = jnp.einsum("b,bi,bj->ij", sp.wghts_sig, x_pts, y_pts) - jnp.outer(m_x, m_y)
    return m_y, sig_y, sig_xy
