"""Adversarial losses.

Same registry/API as reference train_parts/losses.py:9-56: each loss has
``calc_loss(pred_real, pred_fake=None)`` — D-mode when both logit sets are
given, G-mode when only one is given (then ``pred_real`` holds the *fake*
logits, as in the reference).  Pure jnp; returns scalar fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from style_big_gan_tpu.registries import losses


def _f32(x):
    return x.astype(jnp.float32)


@losses.add_to_registry("bcew")
class BCEWithLogitsLoss:
    """Binary cross-entropy with logits (reference: losses.py:9-18)."""

    def calc_loss(self, pred_real, pred_fake=None):
        if pred_fake is not None:
            real_loss = jnp.mean(jax.nn.softplus(-_f32(pred_real)))
            fake_loss = jnp.mean(jax.nn.softplus(_f32(pred_fake)))
            return real_loss + fake_loss
        return jnp.mean(jax.nn.softplus(-_f32(pred_real)))


@losses.add_to_registry("hinge")
class HingeLoss:
    """Hinge GAN loss (reference: losses.py:21-30)."""

    def calc_loss(self, pred_real, pred_fake=None):
        if pred_fake is not None:
            return (jnp.mean(jax.nn.relu(1.0 - _f32(pred_real))) +
                    jnp.mean(jax.nn.relu(1.0 + _f32(pred_fake))))
        return -jnp.mean(_f32(pred_real))


@losses.add_to_registry("wasserstein")
class WassersteinLoss:
    """WGAN critic loss (reference: losses.py:33-43)."""

    def calc_loss(self, pred_real, pred_fake=None):
        if pred_fake is not None:
            return jnp.mean(_f32(pred_fake)) - jnp.mean(_f32(pred_real))
        return -jnp.mean(_f32(pred_real))


@losses.add_to_registry("softplus")
class SoftplusLoss:
    """Non-saturating StyleGAN2 loss (reference: losses.py:46-56)."""

    def calc_loss(self, pred_real, pred_fake=None):
        if pred_fake is not None:
            return (jnp.mean(jax.nn.softplus(-_f32(pred_real))) +
                    jnp.mean(jax.nn.softplus(_f32(pred_fake))))
        return jnp.mean(jax.nn.softplus(-_f32(pred_real)))
