"""iLQR iteration sweep — parity with ``scripts/ilqr_tuning.py``
(max_iter ∈ {5,10,25} × T, collection ilqr_runs2)."""

import numpy as np
from _common import ENV_NAMES, START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore, plot_cost_bands


def generate_data(args):
    store = ResultStore(args.results_dir, "ilqr_runs2")
    iters = [2] if args.quick else [5, 10, 25]
    Ts = [5] if args.quick else [5, 10, 25, 50]
    envs = ["pendulum"] if args.quick else list(START_STATES)
    length = 6 if args.quick else 100
    for env in envs:
        for T in Ts:
            for mi in iters:
                run_and_store(
                    store,
                    {
                        "env": env,
                        "agent": "ILQR",
                        # threshold=1e-7 matches the reference sweep
                        # (/root/reference/scripts/ilqr_tuning.py:24).
                        # diag_hessian=True: this sweep REPLICATES the
                        # reference study, so it runs the reference's iLQR
                        # numerics (diagonal cost Hessian + terminal-at-
                        # x_{T-1} quirk, agents/ilqr.py:24-27,267-271); the
                        # exact-Hessian modern path is benchmarked separately
                        # (bench_suite config 3) — on cartpole/acrobot the
                        # exact cost Hessian of the feature costs is
                        # indefinite and closed-loop medians degrade ~2x
                        # (QUALITY.md analysis).
                        "agent_config": {"T": T, "max_iter": mi,
                                         "threshold": 1e-7, "closed_loop": False,
                                         "diag_hessian": True},
                        "experiment_length": length,
                        "start_state": START_STATES[env],
                        "repetitions": 1 if args.quick else 5,
                        "seed": args.seed,
                    },
                    warmstart=2 if args.quick else 50,
                )


def generate_plots(args):
    import pathlib

    store = ResultStore(args.results_dir, "ilqr_runs2")
    out = pathlib.Path(args.plots_dir) / "ilqr_iterations"
    out.mkdir(parents=True, exist_ok=True)
    for env_key, env_name in ENV_NAMES.items():
        results = store.find({"env_name": env_name})
        if not results:
            continue
        grouped = {}
        Ts = sorted({r["agent_config"]["T"] for r in results})
        for T in Ts:
            sub = [r for r in results if r["agent_config"]["T"] == T]
            iters = sorted({r["agent_config"]["max_iter"] for r in sub})
            med, q25, q75 = [], [], []
            for mi in iters:
                totals = []
                for r in sub:
                    if r["agent_config"]["max_iter"] != mi:
                        continue
                    batch = np.asarray(r.get("batch_costs", r["env_costs"][None]))
                    totals += list(np.clip(batch, -20, 20).sum(axis=1))
                med.append(np.median(totals))
                q25.append(np.quantile(totals, 0.25))
                q75.append(np.quantile(totals, 0.75))
            grouped[f"T={T}"] = {"x": iters, "median": med, "q25": q25, "q75": q75}
        fig = plot_cost_bands(grouped, xlabel="iLQR max_iter")
        fig.savefig(out / f"{env_name}_iters_cost.png", dpi=80)
        print(f"wrote {out}/{env_name}_iters_cost.png")


def main():
    args = std_parser(__doc__).parse_args()
    if not args.no_data:
        generate_data(args)
    if not args.no_plots:
        generate_plots(args)


if __name__ == "__main__":
    main()
