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
