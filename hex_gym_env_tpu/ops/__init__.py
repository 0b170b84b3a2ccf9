from hex_gym_env_tpu.ops import connectivity

__all__ = ["connectivity"]
