from .rollout import (  # noqa: F401
    rollout,
    rollout_batch,
    rollout_cost,
    rollout_cost_samples,
    simulate_trajectory,
)
