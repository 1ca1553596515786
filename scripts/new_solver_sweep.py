"""Sweep for the three solver families the reference never had.

The reference's study tables carry CEM/ILQR/MPPI only (its
``table_generation.py`` aggregates the four sweep collections). This
sweep runs the BASELINE-owed extension families — QPMPC (condensed
linear MPC), SQP (Gauss-Newton NMPC) and I2C (input inference, the
reference's 0-byte stub) — over the same (env, T) grid as the reference
sweeps (3 envs x T in {5,10,25,50}, 5 repetitions, 100 steps, warm
start 50, noiseless), into the ``qp_sqp_i2c`` collection so
``table_generation.py`` produces T-tables with all six families.

Expectation note (honest): QPMPC plans on the linearization around the
goal, so on the swing-up tasks (pendulum/acrobot from hanging) its
closed-loop cost documents the limits of linear MPC rather than a tuned
controller; SQP/I2C are full nonlinear planners and compete with the
reference trio.
"""

from _common import START_STATES, run_and_store, std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore

# init_std=1: the swing-up tasks start at symmetric equilibria where a
# zero initial plan has zero gradient and local planners never leave;
# the random init is the same symmetry-break the reference's iLQR uses
# (agents/ilqr.py:90-91). QPMPC solves a convex problem - no init needed.
SOLVER_CONFIGS = {
    "QPMPC": lambda T: {"T": T, "max_iter": 50},
    "SQP": lambda T: {"T": T, "max_iter": 6, "init_std": 1.0},
    "I2C": lambda T: {"T": T, "max_iter": 10, "init_std": 1.0},
}


def main():
    args = std_parser(__doc__).parse_args()
    store = ResultStore(args.results_dir, "qp_sqp_i2c")
    Ts = [5] if args.quick else [5, 10, 25, 50]
    envs = ["pendulum"] if args.quick else list(START_STATES)
    length = 6 if args.quick else 100
    for env in envs:
        for T in Ts:
            for agent, make_cfg in SOLVER_CONFIGS.items():
                run_and_store(
                    store,
                    {
                        "env": env,
                        "agent": agent,
                        "agent_config": make_cfg(T),
                        "experiment_length": length,
                        "start_state": START_STATES[env],
                        "repetitions": 1 if args.quick else 5,
                        "seed": args.seed,
                    },
                    warmstart=2 if args.quick else 50,
                )


if __name__ == "__main__":
    main()
