"""surfelmeshing_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of SurfelMeshing.

Real-time surfel-based mesh reconstruction from RGB-D video
(Schöps, Sattler, Pollefeys, PAMI 2019), re-designed for TPU hardware:

- the per-pixel depth preprocessing stack runs as fused XLA/Pallas ops
  (reference: applications/surfel_meshing/src/surfel_meshing/cuda_depth_processing.cu)
- the surfel map is a fixed-capacity structure-of-arrays pytree in HBM and the
  whole per-frame fusion update is one jitted program of gather/segment ops
  (reference: cuda_surfel_reconstruction_kernels.cu)
- the incremental advancing-front triangulation runs in a native C++ engine
  decoupled from device fusion, like the reference's CPU meshing thread
  (reference: surfel_meshing.cc, octree.cc, asynchronous_meshing.cc)
"""

__version__ = "0.1.0"
