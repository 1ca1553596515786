"""benchmarking_mpc_solvers_tpu — a TPU-native MPC / trajectory-optimization
benchmarking framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the reference
benchmarking harness (MrDiver/Benchmarking-MPC-Solvers): CEM / MPPI / iLQR
solvers (plus QP-based linear MPC, Riccati LQR and SQP families), closed-loop
environments with actuation/sensor noise over pendulum / cartpole-swing-up /
acrobot dynamics, a batched experiment runner with persistence, plotting and
LaTeX table generation — all compiled to single XLA programs, vmapped over
samples and sharded over device meshes for scenario parallelism.
"""

__version__ = "0.1.0"

from .models import (  # noqa: F401
    AcrobotModel,
    CartPoleSwingUpModel,
    DummyModel,
    Model,
    PendulumModel,
    make_linear_model,
)
from .solvers import CEM, I2C, ILQR, MPPI, QPMPC, SQP  # noqa: F401
