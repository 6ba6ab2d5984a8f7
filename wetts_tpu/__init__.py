"""wetts_tpu: a TPU-native end-to-end TTS framework (JAX/XLA/Pallas).

Built from scratch with the capability set of the WeTTS toolkit
(reference: wenet-e2e/wetts), re-designed TPU-first:

- channel-last [B, T, C] tensors everywhere (lane dim = features),
- pure-functional model code (flax.linen) under jit/pjit,
- static, bucketed shapes with explicit masks,
- Pallas kernels for the hot sequential op (monotonic alignment search),
- data-parallel GAN training over a `jax.sharding.Mesh` with psum
  gradient exchange (replacing the reference's NCCL DDP,
  wetts/vits/train.py:47,212-225).
"""

__version__ = "0.1.0"
