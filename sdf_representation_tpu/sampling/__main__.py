"""Standalone sampling CLI (cf. reference data_generator.py:912-939):

    python -m sdf_representation_tpu.sampling geometry.stl \
        --num_uniform 100000 --num_surface 15 --num_narrow_band 15 \
        --dense_width 0.1 [--out DIR] [--area_weighted]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser(
        description="Generate signed distance data for a mesh geometry."
    )
    p.add_argument("geometry", type=str, help="Path to the mesh geometry file")
    p.add_argument("--num_uniform", type=int, default=10)
    p.add_argument("--num_surface", type=int, default=1)
    p.add_argument("--num_narrow_band", type=int, default=1)
    p.add_argument("--dense_width", type=float, default=0.1)
    p.add_argument("--out", type=str, default=".")
    p.add_argument("--area_weighted", action="store_true")
    args = p.parse_args()

    from .sampler import generate_signed_distance_data

    df_uniform, df_surface, df_narrow = generate_signed_distance_data(
        args.geometry, args.num_uniform, args.num_surface,
        args.num_narrow_band, args.dense_width, area_weighted=args.area_weighted,
    )
    for name, df in (
        ("uniform", df_uniform), ("surface", df_surface), ("narrow", df_narrow)
    ):
        path = os.path.join(args.out, f"{name}.csv")
        df.to_csv(path, index=False)
        print(f"wrote {path} ({len(df)} points)")


if __name__ == "__main__":
    main()
