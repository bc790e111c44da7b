from .implicit_net import ImplicitNet, ImplicitNetCompatible
from .ffn import FeedForwardNetwork
from .kan import KAN
from .hash_mlp import HashMLP
from .siren import Siren
from .registry import MODEL_REGISTRY, get_model_class

__all__ = [
    "ImplicitNet",
    "ImplicitNetCompatible",
    "FeedForwardNetwork",
    "KAN",
    "HashMLP",
    "Siren",
    "MODEL_REGISTRY",
    "get_model_class",
]
