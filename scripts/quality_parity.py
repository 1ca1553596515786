"""QUALITY.md: achieved closed-loop cost vs the reference's published medians.

Closes VERDICT r2 item 1's quality half: for every (env, solver, T) cell of
the reference's T-tables (`ResultPlots/time_comparison/*_T_table.tex`,
transcribed in BASELINE.md), aggregate OUR sweep results with the exact
reference semantics (per-step cost clipped to [-20, 20], summed over the
100-step episode, median over all matching runs —
`/root/reference/scripts/table_generation.py:37-43`) and report
match-or-beat. Lower is better everywhere (all costs are positive
accumulations).

Run after the sweep scripts have populated --results-dir.
"""

import pathlib

import numpy as np
from _common import ENV_NAMES, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore
from benchmarking_mpc_solvers_tpu.experiment.tables import aggregate

# Reference median episode costs by (env, T, solver) — BASELINE.md "By
# horizon T" table, sourced from
# ResultPlots/time_comparison/{Pendulum,CartpoleSwingup,Acrobot}Environment_T_table.tex
REF_MEDIANS = {
    ("PendulumEnvironment", 5): {"CEM": 6.6e2, "ILQR": 6.4e2, "MPPI": 9.0e2},
    ("PendulumEnvironment", 10): {"CEM": 4.2e2, "ILQR": 5.6e2, "MPPI": 6.6e2},
    ("PendulumEnvironment", 25): {"CEM": 3.7e2, "ILQR": 3.9e2, "MPPI": 3.8e2},
    ("PendulumEnvironment", 50): {"CEM": 4.7e2, "ILQR": 3.5e2, "MPPI": 4.6e2},
    ("CartpoleSwingupEnvironment", 5): {"CEM": 8.9e2, "ILQR": 1.3e3, "MPPI": 1.0e3},
    ("CartpoleSwingupEnvironment", 10): {"CEM": 3.4e2, "ILQR": 8.8e2, "MPPI": 2.5e2},
    ("CartpoleSwingupEnvironment", 25): {"CEM": 2.7e2, "ILQR": 6.3e2, "MPPI": 2.3e2},
    ("CartpoleSwingupEnvironment", 50): {"CEM": 4.4e2, "ILQR": 6.3e2, "MPPI": 4.4e2},
    # acrobot medians re-checked against the reference .tex (Median column
    # is 1e2-scaled there): T=10 ILQR is 13e2=1.3e3, T=25 ILQR 11e2=1.1e3,
    # T=25 CEM 10e2=1.0e3 (AcrobotEnvironment_T_table.tex:13-18)
    ("AcrobotEnvironment", 5): {"CEM": 1.3e3, "ILQR": 1.2e3, "MPPI": 1.4e3},
    ("AcrobotEnvironment", 10): {"CEM": 9.2e2, "ILQR": 1.3e3, "MPPI": 1.0e3},
    ("AcrobotEnvironment", 25): {"CEM": 1.0e3, "ILQR": 1.1e3, "MPPI": 1.2e3},
    ("AcrobotEnvironment", 50): {"CEM": 1.1e3, "ILQR": 1.2e3, "MPPI": 1.2e3},
}

# Reference Q25/Q75 per (env, T, solver) for the cells where we miss the
# median — the reference's own run-to-run spread is the natural yardstick
# for a miss (same .tex files, Q-columns; BASELINE.md transcription)
REF_IQR = {
    ("PendulumEnvironment", 5): {"CEM": (6.5e2, 6.9e2), "ILQR": (6.4e2, 6.4e2), "MPPI": (8.5e2, 9.1e2)},
    ("PendulumEnvironment", 10): {"CEM": (4.2e2, 5.5e2), "ILQR": (5.6e2, 5.6e2), "MPPI": (5.6e2, 7.0e2)},
    ("PendulumEnvironment", 25): {"CEM": (3.6e2, 3.8e2), "ILQR": (3.9e2, 3.9e2), "MPPI": (3.6e2, 5.0e2)},
    ("PendulumEnvironment", 50): {"CEM": (4.3e2, 5.5e2), "ILQR": (3.5e2, 3.6e2), "MPPI": (3.5e2, 4.9e2)},
    ("CartpoleSwingupEnvironment", 5): {"CEM": (8.5e2, 1.3e3), "ILQR": (1.3e3, 1.3e3), "MPPI": (9.0e2, 1.2e3)},
    ("CartpoleSwingupEnvironment", 10): {"CEM": (2.8e2, 4.0e2), "ILQR": (7.6e2, 1.2e3), "MPPI": (2.4e2, 3.5e2)},
    ("CartpoleSwingupEnvironment", 25): {"CEM": (2.3e2, 4.5e2), "ILQR": (5.8e2, 7.3e2), "MPPI": (1.9e2, 3.3e2)},
    ("CartpoleSwingupEnvironment", 50): {"CEM": (2.8e2, 8.0e2), "ILQR": (4.9e2, 7.1e2), "MPPI": (3.6e2, 4.9e2)},
    ("AcrobotEnvironment", 5): {"CEM": (1.1e3, 1.3e3), "ILQR": (1.2e3, 1.3e3), "MPPI": (1.3e3, 1.5e3)},
    ("AcrobotEnvironment", 10): {"CEM": (8.3e2, 1.1e3), "ILQR": (1.3e3, 1.3e3), "MPPI": (9.5e2, 1.1e3)},
    ("AcrobotEnvironment", 25): {"CEM": (9.0e2, 1.2e3), "ILQR": (1.1e3, 1.1e3), "MPPI": (1.1e3, 1.5e3)},
    ("AcrobotEnvironment", 50): {"CEM": (1.0e3, 1.3e3), "ILQR": (1.2e3, 1.2e3), "MPPI": (1.2e3, 1.5e3)},
}

# Reference median episode costs by (env, K, solver) — BASELINE.md "By
# sample count K", sourced from
# ResultPlots/time_comparison/*Environment_K_table.tex:10-18. The reference
# K-tables pool all horizons T (and, for CEM, all elite ratios) per K cell;
# K=100 rows exist in its raw collections but are not published, and the
# published rows end with an MPPI-only K=500 row.
REF_K_MEDIANS = {
    ("PendulumEnvironment", 10): {"CEM": 5.5e2, "MPPI": 6.7e2},
    ("PendulumEnvironment", 20): {"CEM": 4.8e2, "MPPI": 6.2e2},
    ("PendulumEnvironment", 50): {"CEM": 4.7e2, "MPPI": 5.8e2},
    ("PendulumEnvironment", 200): {"CEM": 4.8e2, "MPPI": 5.4e2},
    ("PendulumEnvironment", 500): {"MPPI": 6.5e2},
    ("CartpoleSwingupEnvironment", 10): {"CEM": 4.9e2, "MPPI": 4.7e2},
    ("CartpoleSwingupEnvironment", 20): {"CEM": 4.0e2, "MPPI": 4.7e2},
    ("CartpoleSwingupEnvironment", 50): {"CEM": 3.7e2, "MPPI": 3.5e2},
    ("CartpoleSwingupEnvironment", 200): {"CEM": 3.8e2, "MPPI": 3.4e2},
    ("CartpoleSwingupEnvironment", 500): {"MPPI": 2.5e2},
    ("AcrobotEnvironment", 10): {"CEM": 1.1e3, "MPPI": 1.3e3},
    ("AcrobotEnvironment", 20): {"CEM": 1.1e3, "MPPI": 1.3e3},
    ("AcrobotEnvironment", 50): {"CEM": 1.1e3, "MPPI": 1.2e3},
    ("AcrobotEnvironment", 200): {"CEM": 1.1e3, "MPPI": 1.2e3},
    ("AcrobotEnvironment", 500): {"MPPI": 1.1e3},
}

# Reference Q25/Q75 per (env, K, solver), for the K-cell miss analysis —
# same .tex files as REF_K_MEDIANS (column scales: pendulum/cartpole
# Q-columns are 1e2-scaled; acrobot Q25 is 1e2- and Q75 1e3-scaled)
REF_K_IQR = {
    ("PendulumEnvironment", 10): {"CEM": (4.2e2, 6.9e2), "MPPI": (4.9e2, 8.7e2)},
    ("PendulumEnvironment", 20): {"CEM": (4.1e2, 6.7e2), "MPPI": (5.1e2, 8.3e2)},
    ("PendulumEnvironment", 50): {"CEM": (4.1e2, 6.5e2), "MPPI": (3.7e2, 7.2e2)},
    ("PendulumEnvironment", 200): {"CEM": (3.7e2, 6.5e2), "MPPI": (3.7e2, 7.3e2)},
    ("PendulumEnvironment", 500): {"MPPI": (3.6e2, 9.0e2)},
    ("CartpoleSwingupEnvironment", 10): {"CEM": (3.4e2, 9.2e2), "MPPI": (4.2e2, 9.5e2)},
    ("CartpoleSwingupEnvironment", 20): {"CEM": (3.2e2, 9.3e2), "MPPI": (3.4e2, 6.7e2)},
    ("CartpoleSwingupEnvironment", 50): {"CEM": (2.7e2, 9.8e2), "MPPI": (2.6e2, 6.1e2)},
    ("CartpoleSwingupEnvironment", 200): {"CEM": (2.7e2, 9.6e2), "MPPI": (2.3e2, 6.5e2)},
    ("CartpoleSwingupEnvironment", 500): {"MPPI": (2.3e2, 6.2e2)},
    ("AcrobotEnvironment", 10): {"CEM": (1.0e3, 1.3e3), "MPPI": (1.1e3, 1.5e3)},
    ("AcrobotEnvironment", 20): {"CEM": (9.9e2, 1.3e3), "MPPI": (1.1e3, 1.4e3)},
    ("AcrobotEnvironment", 50): {"CEM": (9.4e2, 1.3e3), "MPPI": (1.0e3, 1.4e3)},
    ("AcrobotEnvironment", 200): {"CEM": (9.4e2, 1.3e3), "MPPI": (9.6e2, 1.3e3)},
    ("AcrobotEnvironment", 500): {"MPPI": (1.0e3, 1.4e3)},
}

STORES = ["cem_ratios", "mppi_samples", "temperature_exp", "ilqr_runs2",
          "noise_test"]
# the three solver families the reference never had (results/qp_sqp_i2c,
# scripts/new_solver_sweep.py) — compared against the BEST reference
# family per cell in a separate section
EXT_STORE = "qp_sqp_i2c"
# (column label, agent_name, row filter) — QPMPC appears twice: the
# goal-linearized classic linear MPC, and the LTV variant that
# re-linearizes along the previous plan (linearize_at="plan",
# solvers/qp_mpc.py)
EXT_SOLVERS = (
    ("QPMPC", "QPMPC",
     lambda r: r["agent_config"].get("linearize_at", "goal") == "goal"),
    ("QPMPC-LTV", "QPMPC",
     lambda r: r["agent_config"].get("linearize_at") == "plan"),
    ("SQP", "SQP", lambda r: True),
    ("I2C", "I2C", lambda r: True),
)


def our_stats(stores, env_name, solver, T, cfg_key="agent_config.T"):
    results = []
    for store in stores:
        results += store.find({
            "env_name": env_name, "agent_name": solver, cfg_key: T,
            # noise runs would skew the comparison; the reference collections
            # queried by its table generator are all noiseless
            "actuation_noise": False, "sensor_noise": False,
        })
    if not results:
        return None, 0
    agg = aggregate(results)
    n = len(results) + sum(
        max(0, int(np.asarray(r.get("batch_costs", [[0]])).shape[0]) - 1)
        for r in results if r.get("batch_costs") is not None
    )
    return agg, n


def main():
    args = std_parser(__doc__).parse_args()
    stores = [ResultStore(args.results_dir, name) for name in STORES]

    lines = [
        "# QUALITY — achieved closed-loop cost vs the reference's published study",
        "",
        "Median total episode cost (per-step cost clipped to [-20, 20], summed",
        "over the 100-step episode, median over all matching noiseless runs) —",
        "the exact aggregation of the reference's table generator",
        "(`/root/reference/scripts/table_generation.py:37-43`). Reference",
        "medians from BASELINE.md / `ResultPlots/time_comparison/*_T_table.tex`.",
        "`ours/ref` < 1 means we beat the reference's solution quality; <= 1.05",
        "counts as matching it (the reference's own quartile spread per cell is",
        "10-100%).",
        "",
        "| Env | T | Solver | ref median | ours median | ours/ref | runs | verdict |",
        "|---|---|---|---|---|---|---|---|",
    ]
    n_beat = n_match = n_miss = n_absent = 0
    misses = []
    for (env_name, T), ref_row in sorted(REF_MEDIANS.items()):
        for solver, ref_med in sorted(ref_row.items()):
            agg, n = our_stats(stores, env_name, solver, T)
            if agg is None:
                lines.append(
                    f"| {env_name} | {T} | {solver} | {ref_med:.3g} | — | — | 0 | NO DATA |"
                )
                n_absent += 1
                continue
            ours = agg["Median"]
            ratio = ours / ref_med
            if ratio < 1.0:
                verdict, = ("BEAT",); n_beat += 1
            elif ratio <= 1.05:
                verdict, = ("match",); n_match += 1
            else:
                verdict, = ("MISS",); n_miss += 1
                misses.append((env_name, T, solver, ref_med, agg, n))
            lines.append(
                f"| {env_name} | {T} | {solver} | {ref_med:.3g} | {ours:.3g} "
                f"| {ratio:.2f} | {n} | {verdict} |"
            )
    lines += [
        "",
        f"**Summary: {n_beat} beaten, {n_match} matched, {n_miss} missed, "
        f"{n_absent} without data** out of {n_beat + n_match + n_miss + n_absent} "
        "reference table cells.",
    ]
    if misses:
        lines += [
            "",
            "## Miss analysis",
            "",
            "For every missed median, the reference's own interquartile",
            "spread for the same cell (Q-columns of the same .tex tables)",
            "is the yardstick: a miss whose median lies inside the",
            "reference's [Q25, Q75] is within the reference's own",
            "run-to-run variation for that configuration, not a solver",
            "quality gap. Our quartiles are shown for the same comparison.",
            "",
            "| Env | T | Solver | ref median [Q25, Q75] | ours median [Q25, Q75] | inside ref IQR? |",
            "|---|---|---|---|---|---|",
        ]
        for env_name, T, solver, ref_med, agg, n in misses:
            q25, q75 = REF_IQR.get((env_name, T), {}).get(solver, (None, None))
            inside = (
                "yes" if (q25 is not None and q25 <= agg["Median"] <= q75)
                else "NO"
            )
            ref_iqr = (
                f"{ref_med:.3g} [{q25:.3g}, {q75:.3g}]"
                if q25 is not None else f"{ref_med:.3g} [—]"
            )
            lines.append(
                f"| {env_name} | {T} | {solver} | {ref_iqr} "
                f"| {agg['Median']:.3g} [{agg['Q 25']:.3g}, {agg['Q 75']:.3g}] "
                f"| {inside} |"
            )
        # both-path evidence for ILQR misses: the study sweep replicates
        # the reference's numerics (diag_hessian compat,
        # scripts/ilqr_tuning.py); scripts/ilqr_modern_cells.py runs the
        # same cells on the modern path (exact Hessians +
        # terminal-in-objective line search) into results/ilqr_modern
        modern = ResultStore(args.results_dir, "ilqr_modern")
        modern_rows = []
        for env_name, T, solver, ref_med, agg, n in misses:
            if solver != "ILQR":
                continue
            m_agg, m_n = our_stats([modern], env_name, solver, T)
            if m_agg is None:
                continue
            verdict = ("beats the reference cell"
                       if m_agg["Median"] < ref_med else
                       "does not beat the reference cell either")
            modern_rows.append(
                f"| {env_name} | {T} | {ref_med:.3g} | {agg['Median']:.3g} "
                f"| {m_agg['Median']:.3g} ({m_n} runs) | {verdict} |"
            )
        if modern_rows:
            lines += [
                "",
                "### Both-path ILQR evidence",
                "",
                "The compat medians above replicate the reference's own",
                "numerics; the package's modern iLQR path (exact",
                "feature-cost Hessians, terminal-in-objective line search,",
                "`reference_accept=False` — golden-tested in",
                "tests/test_ilqr.py) run over the same cells",
                "(results/ilqr_modern, scripts/ilqr_modern_cells.py):",
                "",
                "| Env | T | ref median | compat median | modern median | verdict |",
                "|---|---|---|---|---|---|",
                *modern_rows,
            ]
    # --- K-cell adjudication (reference *_K_table.tex, sampling solvers) ---
    k_lines = [
        "",
        "## By sample count K (sampling solvers)",
        "",
        "The reference's published K-tables pool every horizon T (and every",
        "CEM elite ratio) per (env, K, solver) cell",
        "(`*Environment_K_table.tex:10-18`; its K loop wraps the ratio loop,",
        "`/root/reference/scripts/sample_test.py:28-33`). Same aggregation,",
        "same verdict rule as above. Our cells pool the identical grid",
        "(results/cem_ratios K∈{10,20,50,100,200}×ratio∈{.1,.25,.5,.75,1},",
        "results/mppi_samples K∈{10,...,500}); like the reference, K=100 is",
        "swept but unpublished and CEM has no K=500 runs.",
        "",
        "| Env | K | Solver | ref median | ours median | ours/ref | runs | verdict |",
        "|---|---|---|---|---|---|---|---|",
    ]
    # K-cells pool exactly the collections the committed K-tables aggregate
    # (scripts/table_generation.py COLLECTIONS — which, like the
    # reference's, exclude the noise sweep): pooling STORES here would let
    # noise_test's noiseless CEM baselines (K=50 at an off-grid
    # n_elite/T config) contaminate the K=50 cells and contradict the
    # methodology text above
    k_stores = [ResultStore(args.results_dir, c)
                for c in ("cem_ratios", "mppi_samples", "temperature_exp",
                          "experiment_test")]
    k_beat = k_match = k_miss = 0
    k_misses = []
    for (env_name, K), ref_row in sorted(REF_K_MEDIANS.items()):
        for solver, ref_med in sorted(ref_row.items()):
            agg, n = our_stats(k_stores, env_name, solver, K,
                               cfg_key="agent_config.K")
            if agg is None:
                k_lines.append(
                    f"| {env_name} | {K} | {solver} | {ref_med:.3g} | — | — | 0 | NO DATA |"
                )
                continue
            ours = agg["Median"]
            ratio = ours / ref_med
            if ratio < 1.0:
                verdict = "BEAT"; k_beat += 1
            elif ratio <= 1.05:
                verdict = "match"; k_match += 1
            else:
                verdict = "MISS"; k_miss += 1
                k_misses.append((env_name, K, solver, ref_med, agg, n))
            k_lines.append(
                f"| {env_name} | {K} | {solver} | {ref_med:.3g} | {ours:.3g} "
                f"| {ratio:.2f} | {n} | {verdict} |"
            )
    k_lines += [
        "",
        f"**K-cells: {k_beat} beaten, {k_match} matched, {k_miss} missed** "
        f"out of {k_beat + k_match + k_miss} published reference K-table cells.",
    ]
    if k_misses:
        k_lines += [
            "",
            "### K-cell miss analysis",
            "",
            "Same yardstick as the T-cell miss analysis: the reference's own",
            "[Q25, Q75] for the cell (Q-columns of the same K-tables).",
            "",
            "| Env | K | Solver | ref median [Q25, Q75] | ours median [Q25, Q75] | inside ref IQR? |",
            "|---|---|---|---|---|---|",
        ]
        for env_name, K, solver, ref_med, agg, n in k_misses:
            q25, q75 = REF_K_IQR.get((env_name, K), {}).get(solver, (None, None))
            inside = (
                "yes" if (q25 is not None and q25 <= agg["Median"] <= q75)
                else "NO"
            )
            ref_iqr = (
                f"{ref_med:.3g} [{q25:.3g}, {q75:.3g}]"
                if q25 is not None else f"{ref_med:.3g} [—]"
            )
            k_lines.append(
                f"| {env_name} | {K} | {solver} | {ref_iqr} "
                f"| {agg['Median']:.3g} [{agg['Q 25']:.3g}, {agg['Q 75']:.3g}] "
                f"| {inside} |"
            )
    lines += k_lines

    ext_store = ResultStore(args.results_dir, EXT_STORE)
    ext_rows = []
    for (env_name, T), ref_row in sorted(REF_MEDIANS.items()):
        best_ref_solver, best_ref = min(ref_row.items(), key=lambda kv: kv[1])
        cells = []
        for _label, agent, keep in EXT_SOLVERS:
            results = [
                r for r in ext_store.find({
                    "env_name": env_name, "agent_name": agent,
                    "agent_config.T": T,
                    "actuation_noise": False, "sensor_noise": False,
                }) if keep(r)
            ]
            if not results:
                cells.append("—")
            else:
                cells.append(f"{aggregate(results)['Median']:.3g}")
        ext_rows.append(
            f"| {env_name} | {T} | {best_ref} ({best_ref_solver}) | "
            + " | ".join(cells) + " |"
        )
    lines += [
        "",
        "## Extension families (no reference counterpart)",
        "",
        "QPMPC / SQP / I2C are the solver families BASELINE owes that the",
        "reference never had (its i2c is a 0-byte stub; it has no QP or SQP",
        "solver at all). Their medians over the same grid",
        "(results/qp_sqp_i2c, 5 reps, warm start 50) against the BEST",
        "reference-family median per cell. QPMPC plans on the linearization",
        "around the goal, so on swing-up tasks its rows document the limit",
        "of linear MPC rather than a tuned controller; QPMPC-LTV",
        "re-linearizes along the previous plan (a globalized",
        "real-time-iteration SQP step per solve, linearize_at='plan') and",
        "competes on swing-up; SQP and I2C are full nonlinear planners.",
        "I2C runs the per-environment configurations documented in",
        "scripts/new_solver_sweep.py (corrected control prior + rollout-cost",
        "line search on pendulum/acrobot; lagged prior on cartpole).",
        "",
        "| Env | T | best ref median (family) | QPMPC | QPMPC-LTV | SQP | I2C |",
        "|---|---|---|---|---|---|---|",
        *ext_rows,
    ]

    out = pathlib.Path("QUALITY.md")
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
