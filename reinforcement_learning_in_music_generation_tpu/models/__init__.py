from . import common, critic, linear_transformer, longformer

__all__ = ["common", "critic", "linear_transformer", "longformer"]
