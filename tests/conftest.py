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


@pytest.fixture(scope="session")
def native_build(tmp_path_factory):
    """Configure + build the native tree once per session; returns the build
    dir (parity_main, deeptrace, bench_native, libsdfnet_c.so)."""
    import shutil
    import subprocess

    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = tmp_path_factory.mktemp("native_build")
    src = str(REPO_DIR / "native")
    subprocess.run(
        ["cmake", "-S", src, "-B", str(build), "-DCMAKE_BUILD_TYPE=Release"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(build), "-j", "8"],
        check=True, capture_output=True,
    )
    return str(build)
