"""yoho_tpu — a TPU-native point-cloud registration framework.

A from-scratch JAX/XLA implementation of the full YOHO capability
surface (rotation-equivariant descriptors over the icosahedral group,
sparse-voxel FCGF backbone, mutual-NN matching, rotation-guided RANSAC,
Redwood-protocol evaluation), re-designed TPU-first:

* sorted, statically-shaped sparse voxel engine instead of hash maps
  (reference: MinkowskiEngine ``src/coordinate_map_*``),
* gather-GEMM sparse convolution on the MXU instead of CUDA
  gather-GEMM-scatter (reference: ``src/convolution_kernel.cu``),
* dense batched einsum group convolution over the 60-element icosahedral
  rotation group (reference: ``utils/network.py``),
* fully vmapped on-device RANSAC (reference: ``tests/estimator.py``,
  numpy + multiprocessing),
* device-mesh sharding via ``jax.sharding`` for scale-out (reference has
  none on its main path).
"""

__version__ = "0.1.0"

from yoho_tpu import config  # noqa: F401
