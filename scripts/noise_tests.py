"""Noise-robustness sweeps — parity with ``scripts/noise_tests.py``:
actuation noise σ ∈ {0.1, 0.5, 1} and sensor noise (with planning-model
noise, ``noise_tests.py:44``) for each solver × env, plus noiseless
baselines, summarized as noise-vs-cost curves."""

import numpy as np
from _common import ENV_NAMES, START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore, plot_cost_bands

SOLVER_CONFIGS = {
    # CEM max_iter / ILQR threshold match the reference's noise sweep
    # (/root/reference/scripts/noise_tests.py:27-30)
    "CEM": {"K": 50, "T": 25, "max_iter": 10, "n_elite": 12, "epsilon": 1e-5,
            "alpha": 0.2, "std": 1.0},
    "MPPI": {"K": 100, "T": 25, "std": 1.0, "lam": 0.1},
    "ILQR": {"T": 25, "max_iter": 5, "threshold": 1e-7, "closed_loop": False},
    # beyond reference parity: the solver family the reference left as a
    # 0-byte stub (agents/i2c.py) joins the robustness study
    "I2C": {"T": 25, "max_iter": 5},
}

QUICK_CONFIGS = {
    "MPPI": {"K": 8, "T": 5, "std": 1.0, "lam": 0.1},
    # ILQR in quick mode exercises the derivative-solver planning-model-noise
    # path (reference noises the planning model for every agent,
    # Experiment.py:58-60)
    "ILQR": {"T": 5, "max_iter": 3, "threshold": 1e-3, "closed_loop": False},
}


def generate_data(args):
    store = ResultStore(args.results_dir, "noise_test")
    sigmas = [0.0, 0.5] if args.quick else [0.0, 0.1, 0.5, 1.0]
    envs = ["pendulum"] if args.quick else list(START_STATES)
    configs = QUICK_CONFIGS if args.quick else SOLVER_CONFIGS
    length = 6 if args.quick else 100
    reps = 2 if args.quick else 5
    for env in envs:
        for agent, cfg in configs.items():
            for sigma in sigmas:
                for mode in ("actuation", "sensor"):
                    if sigma == 0.0 and mode == "sensor":
                        continue  # noiseless baseline recorded once
                    params = {
                        "env": env,
                        "agent": agent,
                        "agent_config": cfg,
                        "experiment_length": length,
                        "start_state": START_STATES[env],
                        "repetitions": reps,
                        "seed": args.seed,
                        "noise_mode": mode if sigma > 0 else "none",
                    }
                    if mode == "actuation":
                        params["actuation_noise"] = sigma
                    else:
                        params["sensor_noise"] = sigma
                        params["model_noise"] = True
                    run_and_store(store, params, warmstart=2 if args.quick else 50)


def generate_plots(args):
    import pathlib

    store = ResultStore(args.results_dir, "noise_test")
    out = pathlib.Path(args.plots_dir) / "noise_test"
    out.mkdir(parents=True, exist_ok=True)
    for env_key, env_name in ENV_NAMES.items():
        results = store.find({"env_name": env_name})
        if not results:
            continue
        for mode, std_key in (("actuation", "actuation_noise_std"),
                              ("sensor", "sensor_noise_std")):
            grouped = {}
            agents = sorted({r["agent_name"] for r in results})
            for agent in agents:
                sub = [
                    r for r in results
                    if r["agent_name"] == agent
                    and (r.get(std_key) or not (r["actuation_noise"] or r["sensor_noise"]))
                ]
                sigmas = sorted({float(r.get(std_key, 0.0) or 0.0) for r in sub})
                med, q25, q75 = [], [], []
                for s in sigmas:
                    totals = []
                    for r in sub:
                        if float(r.get(std_key, 0.0) or 0.0) != s:
                            continue
                        batch = np.asarray(r.get("batch_costs", r["env_costs"][None]))
                        totals += list(np.clip(batch, -20, 20).sum(axis=1))
                    med.append(np.median(totals))
                    q25.append(np.quantile(totals, 0.25))
                    q75.append(np.quantile(totals, 0.75))
                if sigmas:
                    grouped[agent] = {"x": sigmas, "median": med, "q25": q25, "q75": q75}
            if grouped:
                fig = plot_cost_bands(grouped, xlabel=f"{mode} noise σ")
                fig.savefig(out / f"{env_name}_{mode}_cost.png", dpi=80)
                print(f"wrote {out}/{env_name}_{mode}_cost.png")


def main():
    args = std_parser(__doc__).parse_args()
    if not args.no_data:
        generate_data(args)
    if not args.no_plots:
        generate_plots(args)


if __name__ == "__main__":
    main()
