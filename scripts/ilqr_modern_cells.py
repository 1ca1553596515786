"""Modern-path iLQR on the two missed cartpole study cells (VERDICT r4
weak #4 / item 3).

The study ILQR sweep replicates the reference's numerics
(``diag_hessian=True`` + reference line-search acceptance,
scripts/ilqr_tuning.py) and misses the reference median on cartpole
T=10 (992 vs 880, 1.13x) and T=25 (677 vs 630, 1.07x) — both inside the
reference's own IQR (QUALITY.md miss analysis). This sweep runs the same
cells on the package's modern path — exact feature-cost Hessians and the
terminal-in-objective line search (``reference_accept=False``), the path
golden-tested against closed-loop LQR (tests/test_ilqr.py) — into the
separate ``ilqr_modern`` collection, so the compat-replication medians
stay untouched and QUALITY.md can report both numbers per cell.

Grid: cartpole x T in {10, 25} x max_iter in {5, 10, 25} (the study's
iteration grid) x 3 seeds x 5 reps = the same population size as the
compat cells.
"""

from _common import START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore


def main():
    args = std_parser(__doc__).parse_args()
    store = ResultStore(args.results_dir, "ilqr_modern")
    Ts = [5] if args.quick else [10, 25]
    iters = [2] if args.quick else [5, 10, 25]
    seeds = [0] if args.quick else [0, 1, 2]
    length = 6 if args.quick else 100
    for seed in seeds:
        for T in Ts:
            for mi in iters:
                run_and_store(
                    store,
                    {
                        "env": "cartpole_swingup",
                        "agent": "ILQR",
                        # threshold matches the study sweep
                        # (scripts/ilqr_tuning.py); diag_hessian=False +
                        # reference_accept=False = the modern path
                        "agent_config": {"T": T, "max_iter": mi,
                                         "threshold": 1e-7,
                                         "closed_loop": False,
                                         "diag_hessian": False,
                                         "reference_accept": False},
                        "experiment_length": length,
                        "start_state": START_STATES["cartpole_swingup"],
                        "repetitions": 1 if args.quick else 5,
                        "seed": seed,
                    },
                    warmstart=2 if args.quick else 50,
                )


if __name__ == "__main__":
    main()
