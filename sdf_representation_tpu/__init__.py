"""sdf_representation_tpu — a TPU-native neural implicit (SDF) representation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``newton-raphson/sdf-representation`` (reference: /root/reference):

  mesh -> labeled point sampling (uniform / surface / narrow-band, exact signed
  distances + normals computed ON-TPU) -> skip-in MLP ("ImplicitNet") trained with
  SDF / eikonal / normal-consistency losses -> dense-grid evaluation -> isosurface
  extraction -> metrics -> export to native C++ consumers.

Design stance (TPU-first, not a port):
  * Models are pure functional (params pytree + apply fn), jit/grad/shard_map safe.
  * Spatial derivatives via jax.vmap(jax.grad) / jvp instead of torch autograd.
  * Exact signed distance = tiled matmul formulation on the MXU + generalized
    winding number, replacing host-side libigl.
  * Training: whole-epoch lax.scan, dataset resident in HBM, optax Adam,
    data-parallel over a jax.sharding.Mesh.
  * Dense-grid eval: tiled, chunked, optionally bfloat16 via Pallas kernels.
"""

__version__ = "0.1.0"
