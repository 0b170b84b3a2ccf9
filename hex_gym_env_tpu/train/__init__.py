from hex_gym_env_tpu.train.bank import OpponentBank, init_bank, sample_opponents, replace_member
from hex_gym_env_tpu.train.gae import compute_gae
from hex_gym_env_tpu.train.rollout import SelfplayRunner, RolloutCarry, Transition
from hex_gym_env_tpu.train.evaluate import Evaluator, EvalResult
from hex_gym_env_tpu.train.selfplay import SelfplayPPO, TrainState, TrainMetrics
from hex_gym_env_tpu.train.trainer import Trainer
from hex_gym_env_tpu.train import ppo

__all__ = [
    "OpponentBank", "init_bank", "sample_opponents", "replace_member",
    "compute_gae", "SelfplayRunner", "RolloutCarry", "Transition",
    "Evaluator", "EvalResult", "SelfplayPPO", "TrainState", "TrainMetrics",
    "Trainer", "ppo",
]
