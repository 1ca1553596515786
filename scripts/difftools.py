"""Model diagnostics: print transform/cost/dynamics and validate autodiff.

Working analog of the reference's stale ``scripts/difftools.py`` (which
hand-checked a model's transform/cost/dynamics via prints but imports a
nonexistent module — ``scripts/difftools.py:3-16``). Here every registered
model is exercised, and instead of eyeballing numdifftools output we check
``jax.jacobian`` of the dynamics and cost against central finite
differences — the derivative stack the iLQR/SQP solvers rely on.

Usage: python scripts/difftools.py [--eps 1e-4]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarking_mpc_solvers_tpu.models import (  # noqa: E402
    AcrobotModel,
    CartPoleSwingUpModel,
    DummyModel,
    PendulumModel,
)

MODELS = [PendulumModel, CartPoleSwingUpModel, AcrobotModel, DummyModel]


def central_diff(f, x, eps):
    """Central-difference Jacobian of f at x (columns over x's entries)."""
    x = np.asarray(x, np.float64)
    cols = []
    for i in range(x.size):
        e = np.zeros_like(x)
        e[i] = eps
        hi = np.asarray(f(jnp.asarray(x + e, jnp.float32)), np.float64)
        lo = np.asarray(f(jnp.asarray(x - e, jnp.float32)), np.float64)
        cols.append((hi - lo) / (2 * eps))
    return np.stack(cols, axis=-1)


def check(name, analytic, numeric, tol):
    err = float(np.max(np.abs(np.asarray(analytic, np.float64) - numeric)))
    status = "OK " if err < tol else "FAIL"
    print(f"    {status} {name:22s} max|Δ| = {err:.3e}")
    return err < tol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--tol", type=float, default=5e-2)
    args = ap.parse_args()

    all_ok = True
    for model in MODELS:
        rng = np.random.default_rng(0)
        # interior point away from clips/wraps so finite differences are clean
        x = jnp.asarray(0.3 * rng.standard_normal(model.state_size), jnp.float32)
        u = jnp.asarray(0.3 * rng.standard_normal(model.action_size), jnp.float32)
        g_z = jnp.zeros((model.goal_size,), jnp.float32)

        print(f"model {model.name}: state_size={model.state_size} "
              f"action_size={model.action_size} bounds={model.bounds_low}..{model.bounds_high}")
        print(f"  x          = {np.asarray(x)}")
        print(f"  u          = {np.asarray(u)}")
        print(f"  z(x,u)     = {np.asarray(model.transform(x, u))}")
        print(f"  cost       = {float(model.cost(x, u, g_z)):.6f}")
        print(f"  final_cost = {float(model.final_cost(x, g_z)):.6f}")
        print(f"  x_next     = {np.asarray(model.dynamics(x, u))}")

        print("  autodiff vs central differences:")
        all_ok &= check(
            "df/dx",
            jax.jacobian(model.dynamics, argnums=0)(x, u),
            central_diff(lambda xx: model.dynamics(xx, u), x, args.eps),
            args.tol,
        )
        all_ok &= check(
            "df/du",
            jax.jacobian(model.dynamics, argnums=1)(x, u),
            central_diff(lambda uu: model.dynamics(x, uu), u, args.eps),
            args.tol,
        )
        all_ok &= check(
            "dc/dx",
            jax.grad(lambda xx: model.cost(xx, u, g_z))(x),
            central_diff(lambda xx: model.cost(xx, u, g_z), x, args.eps)[..., :],
            args.tol,
        )
        all_ok &= check(
            "dc/du",
            jax.grad(lambda uu: model.cost(x, uu, g_z))(u),
            central_diff(lambda uu: model.cost(x, uu, g_z), u, args.eps)[..., :],
            args.tol,
        )
        print()

    if not all_ok:
        sys.exit("derivative check FAILED")
    print("all derivative checks passed")


if __name__ == "__main__":
    main()
