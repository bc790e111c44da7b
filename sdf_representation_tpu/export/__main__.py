"""Export CLI: trained checkpoint -> native formats.

    python -m sdf_representation_tpu.export <config.ini> <out_dir>
        [--quantize] [--no-onnx] [--torchscript] [--fixtures N]

Loads the best checkpoint of the run described by config.ini (same directory
convention as training) and writes model.sdfw (+ model.onnx, optional
implicit_model.pt, parity fixtures) for the native consumers — the role of
running utils/inference_conversion.py in the reference.
"""

import argparse
import os


def _honor_jax_platforms_env():
    """The image's sitecustomize force-registers the axon TPU backend and
    IGNORES the JAX_PLATFORMS env var; apply it through jax.config so
    `JAX_PLATFORMS=cpu python -m ...export` works (and doesn't hang when
    the TPU relay is unavailable). Export needs no TPU."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main():
    _honor_jax_platforms_env()
    p = argparse.ArgumentParser(description="Export a trained model for native consumers.")
    p.add_argument("config", help="config.ini of the trained run")
    p.add_argument("out_dir", help="output directory")
    p.add_argument("--quantize", action="store_true", help="also write int8 .sdfw (v2)")
    p.add_argument("--no-onnx", action="store_true")
    p.add_argument("--torchscript", action="store_true",
                   help="also write implicit_model.pt (LibTorch consumers)")
    p.add_argument("--fixtures", type=int, default=64,
                   help="parity fixture point count (0 = skip)")
    args = p.parse_args()

    from ..configgen import Configuration
    from ..training import Trainer
    from .conversion import save_for_native, write_parity_fixtures

    config = Configuration(args.config)
    trainer = Trainer(config)
    trainable, epoch = trainer.load_model(best=True)
    print(f"loaded checkpoint from epoch {epoch}")

    paths = save_for_native(
        args.out_dir, trainer.model, trainable["params"], onnx=not args.no_onnx
    )
    if args.quantize:
        import os

        from .quantize import save_sdfw_quantized

        paths["sdfw_int8"] = save_sdfw_quantized(
            os.path.join(args.out_dir, "model_int8.sdfw"),
            trainer.model, trainable["params"],
        )
    if args.torchscript:
        from .torchscript_export import save_as_torchscript

        pt, _, _ = save_as_torchscript(
            args.out_dir, trainer.model, trainable["params"],
            n_fixture=max(args.fixtures, 1),
        )
        paths["torchscript"] = pt
    if args.fixtures > 0:
        paths.update(
            write_parity_fixtures(
                args.out_dir, trainer.model, trainable["params"], args.fixtures
            )
        )
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
