"""Result plotting — capability parity with ``ExperimentCore/Plot.py``.

Stacked per-state / per-action / cost / computation-time axes from a result
dict (``Plot.py:7-57``), optional overlay of every intermediate MPC plan at
its start step (``Plot.py:60-82``), and multi-solver comparison on shared
axes (``Plot.py:86-135``). Works directly on the result dicts produced by
``Experiment.run`` / loaded from ``ResultStore``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _dims(result: Dict) -> tuple:
    states = np.asarray(result["env_states"])
    actions = np.asarray(result["env_actions"])
    if actions.ndim == 1:
        actions = actions[:, None]
    return states, actions


def plot_experiment(
    result: Dict,
    figsize=(14, 14),
    plot_planning: bool = False,
    fig: Optional[plt.Figure] = None,
):
    """One experiment: S state rows + A action rows + cost + solve-time."""
    states, actions = _dims(result)
    costs = np.asarray(result["env_costs"])
    comp_time = np.asarray(result["computation_time"])
    S, A = states.shape[1], actions.shape[1]

    fig = fig or plt.figure(figsize=figsize)
    axes = fig.subplots(nrows=S + A + 2)
    for i in range(S):
        axes[i].plot(states[:, i], label=f"$x_{i}$", color="tab:orange", marker="o", ms=2)
        axes[i].set_xlabel("Time step")
        axes[i].set_ylabel("State")
    for j in range(A):
        ax = axes[S + j]
        ax.plot(actions[:, j], label=f"$u_{j}$", color="tab:green", marker="o", ms=2)
        ax.set_xlabel("Time step")
        ax.set_ylabel("Action")
    axes[-2].plot(costs, label="costs")
    axes[-2].axhline(0.0, color="tab:red", linestyle=(0, (5, 10)))
    axes[-2].set_ylabel("Cost")
    axes[-2].set_title(f"Total Cost: {costs.sum():.4g}")
    axes[-1].plot(comp_time, label="Computation Time (s)", marker="h", ms=2)
    axes[-1].set_ylabel("Solve time (s)")
    axes[-1].grid(True)

    if plot_planning and "agent_planning_states" in result:
        # plans are stored densely: step i's plan starts at step i
        mpc_xs = np.asarray(result["agent_planning_states"])  # (N, T+1, S)
        mpc_us = np.asarray(result["agent_planning_actions"])  # (N, T, A)
        for i0 in range(mpc_xs.shape[0]):
            rng_x = range(i0, i0 + mpc_xs.shape[1])
            for i in range(S):
                axes[i].plot(rng_x, mpc_xs[i0, :, i], alpha=0.5,
                             linestyle=(0, (1, 1, 4, 1)), zorder=-1)
            rng_u = range(i0, i0 + mpc_us.shape[1])
            for j in range(A):
                axes[S + j].plot(rng_u, mpc_us[i0, :, j], alpha=0.5,
                                 linestyle=(0, (1, 1, 4, 1)), zorder=-1)

    for ax in axes:
        ax.legend(loc="upper left", fontsize=8)
    fig.tight_layout()
    return fig


def plot_experiments(results: List[Dict], figsize=(14, 14)):
    """Multi-solver comparison on shared axes (``Plot.py:86-135``)."""
    states0, actions0 = _dims(results[0])
    S, A = states0.shape[1], actions0.shape[1]
    fig = plt.figure(figsize=figsize)
    axes = fig.subplots(nrows=S + A + 2)
    for result in results:
        states, actions = _dims(result)
        label = result.get("agent_name", "agent")
        for i in range(S):
            axes[i].plot(states[:, i], label=f"{label} $x_{i}$", marker="o", ms=2)
        for j in range(A):
            axes[S + j].plot(actions[:, j], label=f"{label} $u_{j}$", marker="o", ms=2)
        axes[-2].plot(np.asarray(result["env_costs"]), label=label)
        axes[-1].plot(np.asarray(result["computation_time"]), label=label, marker="h", ms=2)
    for i in range(S):
        axes[i].set_ylabel("State")
    for j in range(A):
        axes[S + j].set_ylabel("Action")
    axes[-2].set_ylabel("Cost")
    axes[-1].set_ylabel("Solve time (s)")
    axes[-1].grid(True)
    for ax in axes:
        ax.legend(loc="upper left", fontsize=7)
    fig.tight_layout()
    return fig


def plot_cost_bands(
    grouped: Dict[str, np.ndarray], xlabel: str, ylabel: str = "total cost", figsize=(8, 5)
):
    """Median + quartile bands across a sweep axis — the summary-plot style
    of the sweep scripts (``scripts/sample_test.py`` mean±band plots)."""
    fig, ax = plt.subplots(figsize=figsize)
    for label, arr in grouped.items():
        xs = np.arange(len(arr["x"]))
        med = np.asarray(arr["median"])
        lo = np.asarray(arr["q25"])
        hi = np.asarray(arr["q75"])
        ax.plot(arr["x"], med, marker="o", label=label)
        ax.fill_between(arr["x"], lo, hi, alpha=0.2)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend()
    fig.tight_layout()
    return fig


def plot_ilqr_line_search(solver, state, x, g_z, out_dir,
                          step_iteration: int = 0):
    """iLQR line-search debug plots — the reference's ``save_plots`` mode
    (``agents/ilqr.py:156-185``): one figure per (outer iteration, alpha)
    showing the pre-line-search trajectory, the current best, and the
    candidate forward pass per state dimension, plus the action rows with
    old/new cost in the title. Runs the solver outer loop at host level
    (python loops over jitted stages) so every candidate is observable;
    returns the written file paths.

    Reproduces the reference's accept/convergence replay (``ilqr.py:149-206``)
    including the μ/δ schedule, so the plotted sequence is the sequence the
    compiled ``reference_accept`` solve executes.
    """
    import os

    import jax
    import jax.numpy as jnp

    model = solver.model
    S, A = model.state_size, model.action_size
    os.makedirs(out_dir, exist_ok=True)
    from ..ops.rollout import simulate_trajectory

    lo = np.asarray(model.lo)
    hi = np.asarray(model.hi)
    alphas = np.asarray(solver.alphas)
    written = []

    with jax.default_matmul_precision("highest"):
        us = jnp.asarray(state.planned_us)
        mu, delta = 1.0, solver.delta_zero
        converged = False
        for it in range(solver.max_iter):
            mu = float(np.clip(mu, solver.mu_min, solver.mu_max))
            xs, cost = simulate_trajectory(model, x, us, g_z)
            d = solver.derivatives(xs, us, g_z, ref_terminal=solver.diag_hessian)
            if solver.diag_hessian:
                ks, Ks, ok = solver.backward_pass_ref(d, jnp.float32(mu))
            else:
                ks, Ks, ok = solver.backward_pass(d, jnp.float32(mu))
            if not bool(ok):
                delta = max(solver.delta_zero, delta * solver.delta_zero)
                mu = max(solver.mu_min, mu * delta)
                continue
            us = jnp.clip(us, model.lo, model.hi)
            test_us, test_xs = us, xs
            cost = float(cost)
            accepted = False
            for j, alpha in enumerate(alphas):
                new_xs, new_us, new_cost = solver.forward_pass(
                    jnp.float32(alpha), ks, Ks, test_xs, test_us, g_z
                )
                new_cost = float(new_cost)

                fig = plt.figure(figsize=(16, 10))
                ax = fig.subplots(nrows=S + A)
                ax[0].set_title(
                    f"Timestep:{step_iteration}  Iteration:{it}  "
                    f"Mu:{mu:g} Alpha:{alpha:g}"
                )
                for i in range(S):
                    ax[i].plot(np.asarray(test_xs)[:, i], alpha=0.4,
                               label=f"org_xs_{i}")
                    ax[i].plot(np.asarray(xs)[:, i], label=f"x_{i}")
                    ax[i].plot(np.asarray(new_xs)[:, i], linestyle="--",
                               label=f"x_hat_forward{i}")
                    ax[i].legend(loc="upper left")
                ax[1].set_title(f"Old Cost: {cost} Cost_Hat: {new_cost}")
                for i in range(A):
                    axi = ax[S + i]
                    axi.plot(np.asarray(test_us)[:, i], alpha=0.4, label="org_u")
                    axi.plot(np.asarray(us)[:, i], label=f"u_{i}")
                    axi.plot(np.asarray(new_us)[:, i], linestyle="--",
                             label=f"u_hat_forward_{i}")
                    axi.set_ylim(float(lo[i]) * 1.1, float(hi[i]) * 1.1)
                    axi.legend(loc="upper left")
                path = os.path.join(
                    out_dir,
                    f"step_{step_iteration}_iter_{it}_alpha_{j}_state_action.png",
                )
                fig.savefig(path)
                plt.close(fig)
                written.append(path)

                if new_cost < cost:
                    cost = new_cost
                    xs, us = new_xs, new_us
                    delta = min(1 / solver.delta_zero, delta / solver.delta_zero)
                    mu = 0.0 if mu * delta < solver.mu_min else mu * delta
                    accepted = True
                if cost != 0 and abs((cost - new_cost) / cost) < solver.threshold:
                    converged = True
                    break
            if not accepted:
                delta = max(solver.delta_zero, delta * solver.delta_zero)
                mu = max(solver.mu_min, mu * delta)
            if converged:
                break
    return written
