"""Minimal end-to-end benchmark run — parity with the reference smoke test
``scripts/experiment_test.py:23-35`` (CEM + MPPI + iLQR on acrobot, T=50,
K=20, 200 steps, warm start 50), extended with the QP/SQP families.

Quick mode shrinks everything to run in seconds.
"""

from _common import START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore, plot_experiments


def main():
    args = std_parser(__doc__).parse_args()
    T = 10 if args.quick else 50
    length = 10 if args.quick else 200
    K = 8 if args.quick else 20
    warm = 3 if args.quick else 50
    store = ResultStore(args.results_dir, "experiment_test")

    configs = [
        ("CEM", {"K": K, "T": T, "max_iter": 1, "n_elite": max(2, K // 4),
                 "epsilon": 1e-5, "alpha": 0.2, "std": 1.0}),
        ("MPPI", {"K": K, "T": T, "std": 1.0, "lam": 0.1}),
        ("ILQR", {"T": T, "max_iter": 1 if args.quick else 10,
                  "threshold": 1e-3, "closed_loop": False}),
        ("SQP", {"T": T, "max_iter": 2 if args.quick else 8}),
    ]
    results = []
    for agent, cfg in configs:
        results.append(
            run_and_store(
                store,
                {
                    "env": "acrobot",
                    "agent": agent,
                    "agent_config": cfg,
                    "experiment_length": length,
                    "start_state": START_STATES["acrobot"],
                    "seed": args.seed,
                },
                warmstart=warm,
            )
        )
    results = [r for r in results if r is not None]
    if not args.no_plots and results:
        import pathlib

        out = pathlib.Path(args.plots_dir) / "experiment_test"
        out.mkdir(parents=True, exist_ok=True)
        fig = plot_experiments(results)
        fig.savefig(out / "acrobot_comparison.png", dpi=80)
        print(f"wrote {out}/acrobot_comparison.png")


if __name__ == "__main__":
    main()
