"""MPPI temperature (λ) sweep — parity with ``scripts/mppi_temperature.py``
(λ ∈ {0.001,0.01,0.1,0.5,1,10} × T ∈ {5,10,25,50}, K=100, collection
temperature_exp)."""

import numpy as np
from _common import ENV_NAMES, START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore, plot_cost_bands


def generate_data(args):
    store = ResultStore(args.results_dir, "temperature_exp")
    lams = [0.1, 1.0] if args.quick else [0.001, 0.01, 0.1, 0.5, 1.0, 10.0]
    Ts = [5] if args.quick else [5, 10, 25, 50]
    envs = ["pendulum"] if args.quick else list(START_STATES)
    K = 8 if args.quick else 100
    length = 8 if args.quick else 100
    reps = 2 if args.quick else 5
    for env in envs:
        for T in Ts:
            for lam in lams:
                run_and_store(
                    store,
                    {
                        "env": env,
                        "agent": "MPPI",
                        "agent_config": {"K": K, "T": T, "std": 1.0, "lam": lam},
                        "experiment_length": length,
                        "start_state": START_STATES[env],
                        "repetitions": reps,
                        "seed": args.seed,
                    },
                    warmstart=3 if args.quick else 50,
                )


def generate_plots(args):
    import pathlib

    store = ResultStore(args.results_dir, "temperature_exp")
    out = pathlib.Path(args.plots_dir) / "mppi_temperature"
    out.mkdir(parents=True, exist_ok=True)
    for env_key, env_name in ENV_NAMES.items():
        grouped = {}
        metas = store.find({"env_name": env_name}, arrays=False)
        Ts = sorted({m["agent_config"]["T"] for m in metas})
        for T in Ts:
            results = store.find({"env_name": env_name, "agent_config.T": T})
            lams = sorted({r["agent_config"]["lam"] for r in results})
            med, q25, q75 = [], [], []
            for lam in lams:
                totals = []
                for r in results:
                    if r["agent_config"]["lam"] != lam:
                        continue
                    batch = np.asarray(r.get("batch_costs", r["env_costs"][None]))
                    totals += list(np.clip(batch, -20, 20).sum(axis=1))
                med.append(np.median(totals))
                q25.append(np.quantile(totals, 0.25))
                q75.append(np.quantile(totals, 0.75))
            if lams:
                grouped[f"T={T}"] = {"x": lams, "median": med, "q25": q25, "q75": q75}
        if grouped:
            fig = plot_cost_bands(grouped, xlabel="temperature λ")
            ax = fig.axes[0]
            ax.set_xscale("log")
            fig.savefig(out / f"{env_name}_lambda_cost.png", dpi=80)
            print(f"wrote {out}/{env_name}_lambda_cost.png")


def main():
    args = std_parser(__doc__).parse_args()
    if not args.no_data:
        generate_data(args)
    if not args.no_plots:
        generate_plots(args)


if __name__ == "__main__":
    main()
