"""LaTeX table generation — parity with ``scripts/table_generation.py``:
aggregated cost/time tables per (env, solver, T) and (env, solver, K) from
every results collection, written as standalone LaTeX docs."""

from _common import std_parser

from benchmarking_mpc_solvers_tpu.experiment import ResultStore, generate_tables

COLLECTIONS = ["cem_ratios", "mppi_samples", "temperature_exp", "ilqr_runs2",
               "experiment_test", "qp_sqp_i2c"]


def main():
    args = std_parser(__doc__).parse_args()
    stores = [ResultStore(args.results_dir, c) for c in COLLECTIONS]
    written = generate_tables(stores, f"{args.plots_dir}/time_comparison")
    for p in written:
        print("wrote", p)


if __name__ == "__main__":
    main()
