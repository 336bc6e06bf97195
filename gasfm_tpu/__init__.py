"""gasfm_tpu — a TPU-native framework for learning Structure-from-Motion with
graph attention networks.

This is a from-scratch JAX/XLA/Pallas implementation providing the full
capability surface of the CVPR 2024 GASFM reference (lucasbrynte/gasfm),
re-designed TPU-first:

- Edge-centric, statically-shaped sparse view-graph container
  (:mod:`gasfm_tpu.graph`) instead of per-sample rebuilt COO tensors.
- Masked segment reductions and segment-softmax attention
  (:mod:`gasfm_tpu.ops`) with Pallas TPU kernels for the hot paths.
- Permutation-equivariant models (:mod:`gasfm_tpu.models`): the DPESFM
  set-of-sets baseline and the GASFM graph-attention network.
- Unsupervised reprojection losses with custom-VJP gradient equalization
  (:mod:`gasfm_tpu.losses`).
- Host geometry + evaluation (:mod:`gasfm_tpu.geometry`,
  :mod:`gasfm_tpu.eval`) and a native C++ bundle adjuster
  (:mod:`gasfm_tpu.ba`).
- Multi-chip edge-partitioned execution over `jax.sharding.Mesh`
  (:mod:`gasfm_tpu.parallel`).
"""

__version__ = "0.1.0"
