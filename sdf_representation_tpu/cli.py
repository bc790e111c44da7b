"""Installed console entry point (`sdf-tpu config.ini`) — same dispatch as
the repo-root main.py."""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: sdf-tpu <config.ini>")
        return 2

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/sdf_representation_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .configgen import Configuration
    from .training import Trainer, PointCloudTrainer

    config = Configuration(argv[0])
    executor = PointCloudTrainer(config) if config.distributed else Trainer(config)
    executor.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
