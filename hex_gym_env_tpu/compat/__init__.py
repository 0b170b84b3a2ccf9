from hex_gym_env_tpu.compat.gym_env import HexEnv, HexEnvV0, register_envs
from hex_gym_env_tpu.compat.selfplay_wrapper import (
    BaseRandomPolicy,
    JaxOpponentPolicy,
    OpponentPolicy,
    selfplay_wrapper,
)

__all__ = [
    "HexEnv", "HexEnvV0", "register_envs",
    "BaseRandomPolicy", "OpponentPolicy", "JaxOpponentPolicy", "selfplay_wrapper",
]
