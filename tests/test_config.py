"""Config parsing tests — the working version of the reference's stale
tests/test_config.py (which asserted values that did not match its own ini and
whose ini was missing the [Files] header; see SURVEY.md §4)."""

import configparser

import pytest

from sdf_representation_tpu.configgen import Configuration
from sdf_representation_tpu.models import ImplicitNet
from sdf_representation_tpu.losses import WeightedSmoothL2Loss


def test_parse_all_fields(test_config_path):
    c = Configuration(test_config_path)
    assert c.name == "sphere"
    assert c.model_name == "ImplicitNet"
    assert c.hidden_dim == 512
    assert c.num_hidden_layers == 8
    assert c.input_dim == 3
    # skip_connection = 0 => no skip and beta forced to 0
    assert c.skip_connection == ()
    assert c.beta == 0.0
    assert c.geometric_init is False
    assert c.loss_name == "WeightedSmoothL2Loss"
    assert c.loss_kwargs == {"weight_factor": 0.5, "delta": 0.1}
    assert c.lr == pytest.approx(1e-5)
    assert c.epochs == 20000
    assert c.minepochs == 400
    assert c.batchsize == 4096
    assert c.checkpointing == 100
    assert c.contd is False
    assert c.patience == 1000
    assert c.two_dim is False
    assert c.samplingonly is False
    assert c.continue_sampling is False
    assert c.rescale is True
    assert c.distributed is False
    assert c.uniform_points == 100000
    assert c.surface == 15
    assert c.narrowband == 15
    assert c.narrowband_width == pytest.approx(0.1)
    assert c.mismatchuse is False
    assert c.train_test_split == pytest.approx(0.1)
    assert c.ppo is False
    assert c.reconstruct is False
    assert c.cubesize == 256
    assert c.ppbatchsize == 6460000


def test_declarative_builders(test_config_path):
    c = Configuration(test_config_path)
    model = c.make_model()
    assert isinstance(model, ImplicitNet)
    assert model.hidden_dims == (512,) * 8
    assert model.skip_in == ()
    assert model.beta == 0.0
    loss = c.make_loss()
    assert isinstance(loss, WeightedSmoothL2Loss)
    assert loss.weight_factor == 0.5
    assert loss.delta == 0.1


def test_skip_connection_nonzero(tmp_path, test_config_path):
    text = open(test_config_path).read()
    text = text.replace("skip_connection = 0", "skip_connection = 4")
    text = text.replace("beta = 0", "beta = 100")
    p = tmp_path / "skip.ini"
    p.write_text(text)
    c = Configuration(str(p))
    assert c.skip_connection == (4,)
    assert c.beta == 100.0
    m = c.make_model()
    # layer feeding the skip shrinks by d_in
    assert m.layer_shapes()[3] == (512, 512 - 3)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        Configuration("/nonexistent/nope.ini")


def test_unknown_loss_raises(tmp_path, test_config_path):
    text = open(test_config_path).read().replace(
        "loss_function = WeightedSmoothL2Loss", "loss_function = NopeLoss"
    )
    p = tmp_path / "bad.ini"
    p.write_text(text)
    c = Configuration(str(p))
    with pytest.raises(ValueError, match="Unsupported loss"):
        c.make_loss()


def test_unknown_model_raises(tmp_path, test_config_path):
    text = open(test_config_path).read().replace(
        "model = ImplicitNet", "model = NoSuchNet"
    )
    p = tmp_path / "bad_model.ini"
    p.write_text(text)
    cfg = Configuration(str(p))
    with pytest.raises((KeyError, ValueError)):
        cfg.make_model()


def test_missing_section_raises(tmp_path):
    p = tmp_path / "nosec.ini"
    p.write_text("[Files]\ngeometry = x\ndirectory = y\nname = z\n")
    with pytest.raises(Exception):
        Configuration(str(p))


def test_malformed_value_raises(tmp_path, test_config_path):
    text = open(test_config_path).read().replace("lr = ", "lr = not_a_number")
    p = tmp_path / "badval.ini"
    p.write_text(text)
    with pytest.raises(ValueError):
        Configuration(str(p))
