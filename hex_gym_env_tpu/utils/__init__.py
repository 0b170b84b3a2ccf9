from hex_gym_env_tpu.utils.config import PPOConfig, SelfplayConfig, TrainConfig
from hex_gym_env_tpu.utils.metrics import MetricsLogger, TensorBoardWriter

__all__ = ["PPOConfig", "SelfplayConfig", "TrainConfig", "MetricsLogger", "TensorBoardWriter"]
