"""DSRL-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework implementing the full
capabilities of the reference DSRL implementation ("Dual Super-Resolution
Learning for Semantic Segmentation", CVPR 2020).

The public CLI surface and the ``.weights``/``.checkpoint`` file semantics
mirror the reference (``/root/reference/main.py:112-208``,
``/root/reference/settings.py:76-80``); the internals are a ground-up
TPU-first design: NHWC layouts, bf16 compute with f32 parameters, fused
jitted train steps with on-device metric accumulation, data parallelism over
a ``jax.sharding.Mesh``, and MXU-friendly formulations of every hot op.
"""

__version__ = "0.1.0"
