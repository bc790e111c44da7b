from .implicit_net import ImplicitNet, ImplicitNetCompatible
from .ffn import FeedForwardNetwork
from .kan import KAN
from .registry import MODEL_REGISTRY, get_model_class

__all__ = [
    "ImplicitNet",
    "ImplicitNetCompatible",
    "FeedForwardNetwork",
    "KAN",
    "MODEL_REGISTRY",
    "get_model_class",
]
