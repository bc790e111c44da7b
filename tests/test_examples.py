"""The shipped examples must actually run (docs that execute)."""

import sys


def test_library_quickstart(tmp_path):
    sys.path.insert(0, "examples")
    try:
        from library_quickstart import main
    finally:
        sys.path.pop(0)
    acc = main(str(tmp_path))
    assert acc > 0.97


def test_native_embedding_example(tmp_path):
    import os
    import shutil
    import subprocess

    import pytest

    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = tmp_path / "build"
    subprocess.run(
        ["cmake", "-S", "native", "-B", str(build)],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(build), "--target", "sdfnet_c", "-j", "8"],
        check=True, capture_output=True,
    )
    sys.path.insert(0, "examples")
    try:
        from native_embedding import main
    finally:
        sys.path.pop(0)
    err = main(str(tmp_path / "out"),
               lib_path=str(build / "libsdfnet_c.so"))
    assert err < 1e-4
