"""Model registry — replaces the reference's getattr-reflection on a module
(reference configgen/config_reader.py:19) with an explicit, extensible map."""

from .implicit_net import ImplicitNet, ImplicitNetCompatible
from .ffn import FeedForwardNetwork
from .kan import KAN
from .hash_mlp import HashMLP
from .siren import Siren

MODEL_REGISTRY = {
    "ImplicitNet": ImplicitNet,
    "ImplicitNetCompatible": ImplicitNetCompatible,
    "FeedForwardNetwork": FeedForwardNetwork,
    "KAN": KAN,
    "HashMLP": HashMLP,
    "Siren": Siren,
}


def get_model_class(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model '{name}'. Available: {sorted(MODEL_REGISTRY)}"
        ) from None


def register_model(name: str, cls) -> None:
    MODEL_REGISTRY[name] = cls
