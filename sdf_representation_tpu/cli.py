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
    mesh = None
    if config.mesh_devices and config.mesh_devices > 1:
        from .parallel import get_mesh

        mesh = get_mesh(config.mesh_devices)
    cls = PointCloudTrainer if config.distributed else Trainer
    executor = cls(config, mesh=mesh)
    executor.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
