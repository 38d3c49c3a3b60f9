"""Optimizer registry (reference: train_parts/optimizers.py).

Factories return `optax.GradientTransformation`s.  Lazy-regularization
hyperparameter rescaling (lr * mb_ratio, betas ** mb_ratio — reference:
trainers.py:619-627) is applied by the trainer via `scaled_for_lazy_reg`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import optax

from style_big_gan_tpu.registries import optimizers


@optimizers.add_to_registry("adam")
class AdamFactory:
    def __init__(self, lr: float = 0.002, betas: Sequence[float] = (0.0, 0.99),
                 eps: float = 1e-8):
        self.lr = float(lr)
        self.betas = tuple(float(b) for b in betas)
        self.eps = float(eps)

    def make(self, mb_ratio: float = 1.0) -> optax.GradientTransformation:
        lr, (b1, b2), eps = self.scaled(mb_ratio)
        return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps)

    def scaled(self, mb_ratio: float) -> Tuple[float, Tuple[float, float], float]:
        """Lazy-reg rescale (reference: trainers.py:619-627)."""
        return (self.lr * mb_ratio,
                (self.betas[0] ** mb_ratio, self.betas[1] ** mb_ratio),
                self.eps)


@optimizers.add_to_registry("sgd")
class SGDFactory:
    def __init__(self, lr: float = 0.01, momentum: float = 0.0):
        self.lr = float(lr)
        self.momentum = float(momentum)

    def make(self, mb_ratio: float = 1.0) -> optax.GradientTransformation:
        return optax.sgd(self.lr * mb_ratio,
                         momentum=self.momentum if self.momentum > 0 else None)


@optimizers.add_to_registry("rmsprop")
class RMSPropFactory:
    def __init__(self, lr: float = 0.002, decay: float = 0.99, eps: float = 1e-8):
        self.lr = float(lr)
        self.decay = float(decay)
        self.eps = float(eps)

    def make(self, mb_ratio: float = 1.0) -> optax.GradientTransformation:
        return optax.rmsprop(self.lr * mb_ratio, decay=self.decay, eps=self.eps)
