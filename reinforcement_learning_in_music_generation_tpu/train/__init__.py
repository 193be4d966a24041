from . import optim
from . import pretrain as pretrain_lib
from .pretrain import agent_train_step, longformer_lm_step

__all__ = ["optim", "pretrain_lib", "agent_train_step", "longformer_lm_step"]
