from .episode import (  # noqa: F401
    EpisodeConfig,
    EpisodeResult,
    run_episode,
    run_episodes_batch,
    run_episodes_fused,
)
from .experiment import Experiment, SOLVER_REGISTRY, make_solver  # noqa: F401
from .store import ResultStore, decode_result, encode_result  # noqa: F401
from .plot import plot_cost_bands, plot_experiment, plot_experiments, plot_ilqr_line_search  # noqa: F401
from .tables import aggregate, format_table, generate_tables, write_latex_table  # noqa: F401
