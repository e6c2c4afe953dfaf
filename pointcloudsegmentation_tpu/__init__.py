"""TPU-native point-cloud segmentation framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the TF1-era CUDA research stack
``liuyuan-pal/PointCloudSegmentation`` (see SURVEY.md), designed TPU-first:

- Irregular neighborhoods are **static-shape, padded, fixed-degree** tensors
  (``Neighborhood: idx [N,K] int32 + mask [N,K] bool``) instead of ragged CSR
  lists (reference: tf_ops/TFNeighborKernel.h:9-31).
- The voxel pooling hierarchy keeps per-level **segment ids** (gather indices)
  instead of physically sorting points (reference:
  tf_ops/graph_pooling_layer.py:110-146), which removes the re-permutation
  dance entirely and keeps every op XLA-fusable with static shapes.
- Reductions are deterministic (masked segment_sum / max), unlike the
  reference's atomicAdd backward kernels (tf_ops/TFNeighborKernel.cu:83).
- Data parallelism is ``jax.jit`` + ``NamedSharding`` over a device mesh with
  ICI all-reduce, replacing in-graph multi-GPU towers with CPU gradient
  averaging (reference: train_util.py:77-111).
"""

__version__ = "0.1.0"
