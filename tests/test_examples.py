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
