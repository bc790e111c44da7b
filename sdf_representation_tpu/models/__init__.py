from .implicit_net import ImplicitNet, ImplicitNetCompatible
from .ffn import FeedForwardNetwork
from .kan import KAN
from .hash_mlp import HashMLP
from .registry import MODEL_REGISTRY, get_model_class

__all__ = [
    "ImplicitNet",
    "ImplicitNetCompatible",
    "FeedForwardNetwork",
    "KAN",
    "HashMLP",
    "MODEL_REGISTRY",
    "get_model_class",
]
