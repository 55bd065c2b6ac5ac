"""mtlx — TPU-native multi-task self-supervised object detection.

A brand-new JAX/XLA/Flax/Pallas framework with the capabilities of the
mtl-ssl reference (CVPR'19 annotation recycling on the TF Object Detection
API). See SURVEY.md for the structural contract this build targets.

Design principles (TPU-first, not a TF port):
  * static shapes everywhere — variable-length box sets are padded to fixed
    maxima and carried with validity masks
  * pure functions + explicit PRNG keys; the whole train step is one jitted
    XLA program
  * data parallelism via `jax.sharding.Mesh` + NamedSharding, gradients
    psum'd over ICI — no parameter servers
  * hot geometry kernels (IoU, NMS, ROI-align) have jnp reference
    implementations and Pallas TPU kernels validated against numpy oracles
"""

__version__ = "0.1.0"
