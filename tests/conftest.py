"""Test configuration: force JAX onto CPU with 8 virtual devices BEFORE any
jax import, so multi-chip sharding code paths are exercised without TPU
hardware (the TPU answer to "test multi-node without a cluster")."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import pathlib

import jax

# The TPU image's sitecustomize force-registers the 'axon' TPU backend before
# conftest runs, so the env var alone is not enough — override via jax.config
# (must happen before any computation).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# persistent compile cache: the exact-SDF / train-step jits are expensive to
# compile on CPU; cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TESTS_DIR = pathlib.Path(__file__).parent
REPO_DIR = TESTS_DIR.parent


@pytest.fixture(scope="session")
def test_config_path(tmp_path_factory):
    """A runnable .ini mirroring the reference tests/test_config.ini schema,
    with paths pointing into a temp directory."""
    root = tmp_path_factory.mktemp("run")
    ini = TESTS_DIR / "test_config.ini"
    text = ini.read_text()
    text = text.replace("@DIR@", str(root))
    out = root / "config.ini"
    out.write_text(text)
    return str(out)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
