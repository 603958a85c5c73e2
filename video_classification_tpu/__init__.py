"""TPU-native ChaLearn IsoGD gesture-recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``zc402/video-classification``: device-side preprocessing (pad/flow/IUV/crop/resize as
batched kernels over uint8 tensors in HBM), a dual-pathway SlowFast 3D-CNN with custom
lateral fusion, per-body-part multi-stream training, per-class sparse ensemble fusion,
and data-parallel scaling over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
