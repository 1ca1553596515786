from .rollout import (  # noqa: F401
    rollout,
    rollout_batch,
    rollout_cost,
    rollout_cost_samples,
    simulate_trajectory,
)
from .linearize import AffineDynamics, QuadCost, linearize_dynamics, quadratize_cost  # noqa: F401
from .qp import CondensedQP, admm_solve, admm_solve_riccati, admm_solve_riccati_batch, condense, ip_solve, kkt_residual, qp_objective  # noqa: F401
from .riccati import RiccatiFactors, TVLQRPolicy, riccati_factors, tvlqr_backward, tvlqr_backward_assoc, tvlqr_rollout, tvlqr_solve, tvlqr_solve_linear_batch, tvlqr_values_assoc  # noqa: F401
