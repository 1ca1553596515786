from .env import (  # noqa: F401
    AcrobotEnv,
    CartPoleSwingUpEnv,
    Env,
    EnvStep,
    NoiseConfig,
    PendulumEnv,
    REGISTRY,
    env_step,
)
from .render import render_episode, render_state  # noqa: F401
from .gym_wrapper import GymEnvModel, GymWrapperEnv, HAVE_GYMNASIUM  # noqa: F401
