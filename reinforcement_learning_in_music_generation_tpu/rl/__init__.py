from . import airl, buffers, dqn, env, ppo

__all__ = ["airl", "buffers", "dqn", "env", "ppo"]
