"""CLI entry point — `python main.py <config.ini>`, reference-compatible
(cf. reference main.py:6-16: `[Sampling] distributed = True` selects the
point-cloud IGR trainer, which the reference misnames DistributedExecutor)."""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python main.py <config.ini>")
        return 2
    config_file_path = argv[0]
    print(f"Running with config file: {config_file_path}")

    import os

    import jax

    # honor JAX_PLATFORMS even under site customizations that force-register
    # an accelerator backend and ignore the env var (e.g. the axon relay)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # persistent compile cache: first-run jit of the samplers/kernels costs
    # minutes through the remote compiler; subsequent processes hit the cache
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/sdf_representation_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdf_representation_tpu.configgen import Configuration
    from sdf_representation_tpu.training import Trainer, PointCloudTrainer

    config = Configuration(config_file_path)
    mesh = None
    if config.mesh_devices and config.mesh_devices > 1:
        from sdf_representation_tpu.parallel import get_mesh

        mesh = get_mesh(config.mesh_devices)
    cls = PointCloudTrainer if config.distributed else Trainer
    executor = cls(config, mesh=mesh)
    executor.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
