"""Multi-file ("David-scale") geometry sampling walkthrough.

The reference handled its billion-triangle David dataset with a notebook +
resumable shard loop (reference notebooks/david_data_gen.ipynb,
datagenerator/data_generator.py:678-807). The equivalent here is a single
resumable call, optionally sharded across hosts:

    python examples/distributed_geometry_sampling.py /path/to/shards /path/out
"""

import sys

from sdf_representation_tpu.sampling import (
    compute_min_max,
    write_signed_distance_distributed,
)


def main():
    geometry_dir, out_dir = sys.argv[1], sys.argv[2]
    host_id = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    num_hosts = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    lo, hi = compute_min_max(geometry_dir)
    print(f"global vertex bounds: [{lo}, {hi}]")

    csv = write_signed_distance_distributed(
        geometry_dir,
        out_dir,
        num_points_surface=4,      # per-file barycentric samples (0 = vertices only)
        host_id=host_id,
        num_hosts=num_hosts,
    )
    print(f"surface points appended to {csv}")
    print("re-running skips shards already journaled in processed_files.log")


if __name__ == "__main__":
    main()
