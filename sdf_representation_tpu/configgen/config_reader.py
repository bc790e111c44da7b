"""INI configuration — accepts the reference's config files unchanged.

Declarative rebuild of the reference Configuration
(reference configgen/config_reader.py:8-108). Differences by design:

  * The config does NOT eagerly instantiate the model/loss (the reference
    builds live nn.Modules inside the parser, config_reader.py:35,58) —
    ``make_model()`` returns a frozen model spec (architecture only; params
    come from ``model.init(key)``) and ``make_loss()`` a pure loss callable.
  * Model/loss lookup goes through explicit registries instead of
    getattr-reflection on a module (config_reader.py:19,95-106).
  * All section/field names and semantics (including the
    skip_connection==0 -> no-skip + beta=0 rule, config_reader.py:26-32)
    are preserved, so reference .ini files parse identically.
"""

from __future__ import annotations

import configparser
from typing import Tuple

from ..models.registry import get_model_class
from ..models.implicit_net import ImplicitNet
from ..models.ffn import FeedForwardNetwork
from ..models.kan import KAN
from ..losses.losses import get_loss_class


class Configuration:
    def __init__(self, file_path: str = "config.ini"):
        self.config = configparser.ConfigParser()
        read = self.config.read(file_path)
        if not read:
            raise FileNotFoundError(f"Config file not found or unreadable: {file_path}")

        # [Files]
        self.geometry = self.config.get("Files", "geometry")
        self.directory = self.config.get("Files", "directory")
        self.name = self.config.get("Files", "name")

        # [Model]
        self.model_name = self.config.get("Model", "model")
        self.hidden_dim = self.config.getint("Model", "hidden_dim")
        self.num_hidden_layers = self.config.getint("Model", "num_hidden_layers")
        self.input_dim = self.config.getint(
            "Model", "input_dim", fallback=3
        )
        if self.model_name == "ImplicitNet" or self.model_name == "ImplicitNetCompatible":
            val = self.config.getint("Model", "skip_connection")
            if val == 0:
                # skip_connection = 0 disables the skip AND forces beta = 0
                # (ReLU + tanh FCN mode), cf. reference config_reader.py:26-32
                self.skip_connection: Tuple[int, ...] = ()
                self.beta = 0.0
            else:
                self.skip_connection = (val,)
                self.beta = self.config.getfloat("Model", "beta")
            self.geometric_init = self.config.getboolean("Model", "geometric_init")
            # working version of the reference's dead Lipschitz option
            # (networks.py:54,97-98,109-112; arXiv:2202.08345)
            self.lipschitz = self.config.getboolean(
                "Model", "lipschitz", fallback=False
            )
            self.lipschitz_weight = self.config.getfloat(
                "Model", "lipschitz_weight", fallback=1e-6
            )
        else:
            self.skip_connection = ()
            self.beta = 0.0
            self.geometric_init = False
            self.lipschitz = False
            self.lipschitz_weight = 0.0

        # [Loss]
        self.loss_name = self.config.get("Loss", "loss_function")
        self.loss_kwargs = {
            key: float(self.config.get("Loss", key))
            for key in self.config.options("Loss")
            if key != "loss_function"
        }

        # [Training]
        self.lr = self.config.getfloat("Training", "lr")
        self.epochs = self.config.getint("Training", "epochs")
        self.minepochs = self.config.getint("Training", "min_epochs")
        self.batchsize = self.config.getint("Training", "batch_size")
        self.checkpointing = self.config.getint("Training", "checkpointing")
        self.contd = self.config.getboolean("Training", "continue")
        self.patience = self.config.getint("Training", "patience")
        self.two_dim = self.config.getboolean("Training", "two_dim", fallback=False)
        # optional LR schedule: step decay every lr_step epochs by lr_gamma
        # (the reference instantiated torch StepLR but never stepped it —
        # executor.py:139,182-183; this one actually runs)
        self.lr_step = self.config.getint("Training", "lr_step", fallback=0)
        self.lr_gamma = self.config.getfloat("Training", "lr_gamma", fallback=0.5)

        # [Sampling]
        self.samplingonly = self.config.getboolean("Sampling", "samplingonly")
        self.continue_sampling = self.config.getboolean("Sampling", "continue_sampling")
        self.rescale = self.config.getboolean("Sampling", "rescale")
        self.distributed = self.config.getboolean("Sampling", "distributed")
        self.uniform_points = self.config.getint("Sampling", "uniform_points")
        self.surface = self.config.getint("Sampling", "surface")
        self.narrowband = self.config.getint("Sampling", "narrowband")
        self.narrowband_width = self.config.getfloat("Sampling", "narrowband_width")
        self.mismatchuse = self.config.getboolean("Sampling", "mismatchuse")
        self.train_test_split = self.config.getfloat("Sampling", "train_test_split")

        # [Optional]
        self.ppo = self.config.getboolean("Optional", "ppo")
        self.reconstruct = self.config.getboolean("Optional", "reconstruct")
        self.cubesize = self.config.getint("Optional", "cubesize")
        self.ppbatchsize = self.config.getint("Optional", "postprocessbatchsize")

        # [TPU] — extensions beyond the reference schema (all optional)
        self.mesh_devices = self.config.getint("TPU", "mesh_devices", fallback=0)
        self.compute_dtype = self.config.get("TPU", "compute_dtype", fallback="float32")
        self.use_pallas = self.config.getboolean("TPU", "use_pallas", fallback=True)
        # epochs fused into one jitted call (amortises dispatch latency);
        # 1 = exact per-epoch checkpoint/early-stop semantics
        self.epochs_per_call = self.config.getint("TPU", "epochs_per_call", fallback=1)
        self.debug_nans = self.config.getboolean("TPU", "debug_nans", fallback=False)
        # None/'default' = XLA default (f32 multi-pass); 'bfloat16' = mixed
        # precision (f32 master weights, single-pass bf16 matmuls, ~3x step rate)
        tp = self.config.get("TPU", "train_matmul_precision", fallback="default")
        self.train_matmul_precision = None if tp in ("default", "none") else tp

        self._model = None
        self._loss = None

    # -- builders ----------------------------------------------------------
    def make_model(self):
        """Build the (frozen, stateless) model spec from the parsed fields."""
        cls = get_model_class(self.model_name)
        if self.model_name in ("ImplicitNet", "ImplicitNetCompatible"):
            return ImplicitNet(
                d_in=self.input_dim,
                hidden_dims=(self.hidden_dim,) * self.num_hidden_layers,
                skip_in=self.skip_connection,
                beta=self.beta,
                geometric_init=self.geometric_init,
                lipschitz=self.lipschitz,
                lipschitz_weight=self.lipschitz_weight,
            )
        if self.model_name == "FeedForwardNetwork":
            return FeedForwardNetwork(
                d_in=self.input_dim,
                hidden_dim=self.hidden_dim,
                num_layers=self.num_hidden_layers,
            )
        if self.model_name == "KAN":
            layers = (self.input_dim,) + (self.hidden_dim,) * self.num_hidden_layers + (1,)
            return KAN(layers_hidden=layers)
        if self.model_name == "HashMLP":
            from ..models.hash_mlp import HashMLP

            return HashMLP(
                d_in=self.input_dim,
                hidden_dim=self.hidden_dim,
                num_layers=max(2, self.num_hidden_layers),
            )
        if self.model_name == "Siren":
            from ..models.siren import Siren

            return Siren(
                d_in=self.input_dim,
                hidden_dims=(self.hidden_dim,) * self.num_hidden_layers,
                omega_0=self.config.getfloat("Model", "omega_0",
                                             fallback=30.0),
            )
        return cls()

    def make_loss(self):
        return get_loss_class(self.loss_name)(**self.loss_kwargs)

    # -- compat properties (reference exposes live objects) ----------------
    @property
    def model(self):
        if self._model is None:
            self._model = self.make_model()
        return self._model

    @property
    def loss(self):
        if self._loss is None:
            self._loss = self.make_loss()
        return self._loss
