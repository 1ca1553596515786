"""CEM elite-ratio and MPPI sample-count sweeps — parity with
``scripts/sample_test.py:10-51`` (collections cem_ratios / mppi_samples),
with the serial 5-repetition loops replaced by on-device batches.

Full sweep: CEM ratio ∈ {.1,.25,.5,.75,1} × K ∈ {10,20,50,100,200} (the
reference's K loop wraps the ratio loop, ``scripts/sample_test.py:28-33``);
MPPI K ∈ {10,20,50,100,200,500} × T ∈ {5,10,25,50} (the published reference
K-tables end with an MPPI K=500 row,
``ResultPlots/time_comparison/PendulumEnvironment_K_table.tex:18``);
pendulum + cartpole (+ acrobot, see below); 100 steps; warm start 50.
"""

import numpy as np
from _common import START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore, plot_cost_bands


def generate_data(args):
    cem_store = ResultStore(args.results_dir, "cem_ratios")
    mppi_store = ResultStore(args.results_dir, "mppi_samples")
    # the reference script's acrobot line is commented out
    # (sample_test.py:19) yet its published T-table has acrobot CEM rows —
    # we sweep acrobot too so the study table is fully populated
    envs = ["pendulum"] if args.quick else [
        "pendulum", "cartpole_swingup", "acrobot"
    ]
    ratios = [0.25, 0.5] if args.quick else [0.1, 0.25, 0.5, 0.75, 1.0]
    Ks = [8, 16] if args.quick else [10, 20, 50, 100, 200, 500]
    # CEM sweeps the same K grid as MPPI minus K=500 (the reference's CEM
    # half never runs K=500); K=50 is kept first so resumed sweeps hit the
    # already-checkpointed configs before compiling new shapes.
    Ks_cem = [8] if args.quick else [50, 10, 20, 100, 200]
    Ts = [5] if args.quick else [5, 10, 25, 50]
    length = 10 if args.quick else 100
    reps = 2 if args.quick else 5
    warm = 3 if args.quick else 50

    for env in envs:
        start = START_STATES[env]
        for T in Ts:
            for K_cem in Ks_cem:
                for ratio in ratios:
                    run_and_store(
                        cem_store,
                        {
                            "env": env,
                            "agent": "CEM",
                            # max_iter=10 matches the reference's cem_ratios
                            # runs (/root/reference/scripts/sample_test.py:33)
                            # — the published CEM medians come from
                            # 10-iteration solves
                            "agent_config": {"K": K_cem, "T": T,
                                             "max_iter": 1 if args.quick else 10,
                                             "n_elite": max(1, int(K_cem * ratio)),
                                             "elite_ratio": ratio,
                                             "epsilon": 1e-5, "alpha": 0.2, "std": 1.0},
                            "experiment_length": length,
                            "start_state": start,
                            "repetitions": reps,
                            "seed": args.seed,
                        },
                        warmstart=warm,
                    )
            for K in Ks:
                # lam=0.5 is the reference's sample_test temperature
                # (/root/reference/scripts/sample_test.py:44); the 0.1 grid
                # (kept) matches our runtime_comparison configuration. Both
                # pool into the published K cells, like the reference's
                # K-table pools its heterogeneous-lam collections.
                for lam in ([0.1] if args.quick else [0.1, 0.5]):
                    run_and_store(
                        mppi_store,
                        {
                            "env": env,
                            "agent": "MPPI",
                            "agent_config": {"K": K, "T": T, "std": 1.0, "lam": lam},
                            "experiment_length": length,
                            "start_state": start,
                            "repetitions": reps,
                            "seed": args.seed,
                        },
                        warmstart=warm,
                    )


def generate_plots(args):
    import pathlib

    from _common import ENV_NAMES

    mppi_store = ResultStore(args.results_dir, "mppi_samples")
    out = pathlib.Path(args.plots_dir) / "mppi_samples"
    out.mkdir(parents=True, exist_ok=True)
    for env_key, env_name in ENV_NAMES.items():
        grouped = {}
        metas = mppi_store.find({"env_name": env_name}, arrays=False)
        Ts = sorted({m["agent_config"]["T"] for m in metas})
        for T in Ts:
            results = mppi_store.find({"env_name": env_name, "agent_config.T": T})
            if not results:
                continue
            Ks = sorted({r["agent_config"]["K"] for r in results})
            med, q25, q75 = [], [], []
            for K in Ks:
                totals = []
                for r in results:
                    if r["agent_config"]["K"] != K:
                        continue
                    batch = np.asarray(r.get("batch_costs", r["env_costs"][None]))
                    totals += list(np.clip(batch, -20, 20).sum(axis=1))
                med.append(np.median(totals))
                q25.append(np.quantile(totals, 0.25))
                q75.append(np.quantile(totals, 0.75))
            grouped[f"T={T}"] = {"x": Ks, "median": med, "q25": q25, "q75": q75}
        if grouped:
            fig = plot_cost_bands(grouped, xlabel="samples K")
            fig.savefig(out / f"{env_name}_K_cost.png", dpi=80)
            print(f"wrote {out}/{env_name}_K_cost.png")

    # CEM elite-ratio plots (reference: ResultPlots/cem_ratio/,
    # scripts/sample_test.py generate_plots' CEM half)
    cem_store = ResultStore(args.results_dir, "cem_ratios")
    out = pathlib.Path(args.plots_dir) / "cem_ratio"
    out.mkdir(parents=True, exist_ok=True)
    for env_key, env_name in ENV_NAMES.items():
        grouped = {}
        metas = cem_store.find({"env_name": env_name}, arrays=False)
        Ts = sorted({m["agent_config"]["T"] for m in metas})
        for T in Ts:
            results = cem_store.find({"env_name": env_name, "agent_config.T": T})
            if not results:
                continue
            ratios = sorted({r["agent_config"]["elite_ratio"] for r in results})
            med, q25, q75 = [], [], []
            for ratio in ratios:
                totals = []
                for r in results:
                    if r["agent_config"]["elite_ratio"] != ratio:
                        continue
                    batch = np.asarray(r.get("batch_costs", r["env_costs"][None]))
                    totals += list(np.clip(batch, -20, 20).sum(axis=1))
                med.append(np.median(totals))
                q25.append(np.quantile(totals, 0.25))
                q75.append(np.quantile(totals, 0.75))
            grouped[f"T={T}"] = {"x": ratios, "median": med, "q25": q25, "q75": q75}
        if grouped:
            fig = plot_cost_bands(grouped, xlabel="elite ratio")
            fig.savefig(out / f"{env_name}_ratio_cost.png", dpi=80)
            print(f"wrote {out}/{env_name}_ratio_cost.png")


def main():
    args = std_parser(__doc__).parse_args()
    if not args.no_data:
        generate_data(args)
    if not args.no_plots:
        generate_plots(args)


if __name__ == "__main__":
    main()
