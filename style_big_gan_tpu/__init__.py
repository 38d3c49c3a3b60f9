"""style_big_gan_tpu — a TPU-native universal GAN training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
retir/Style-Big-GAN reference (registry-driven GAN starter: DCGAN, WGAN-GP,
SN-GAN, StyleGAN2-ADA, StyleGAN2+attention, BigGAN), designed TPU-first:

* models are pure functions over param pytrees (flax.linen),
* the hot ops (upfirdn2d, bias_act, modulated conv) are single fused XLA HLOs
  or Pallas kernels instead of custom CUDA,
* data parallelism is one SPMD program over a `jax.sharding.Mesh` (psum'd
  grads via GSPMD) instead of DDP/NCCL,
* R1 / path-length / WGAN-GP regularizers use native `jax.grad`-of-grad
  instead of gradfix autograd hacks,
* activations are NHWC and matmul-heavy blocks run in bfloat16 on the MXU.
"""

__version__ = "0.1.0"
