"""Per-class sparse ensemble fusion.

The reference's ``SparseModel`` (`/root/reference/train_sparse.py:89-105`) is one
``Linear(num_part -> 1)`` per class applied to the P part-streams' softmax score for
that class — a Python loop of C tiny matmuls on GPU. On TPU that is a single einsum:

    y[n, c] = sum_p w[c, p] * x[n, p, c] + b[c]

which XLA maps onto one batched contraction.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SparseModel(nn.Module):
    num_class: int
    num_part: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, P, C) per-part class scores -> (N, C) fused scores."""
        assert x.shape[1:] == (self.num_part, self.num_class), x.shape
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.num_class, self.num_part),
            self.param_dtype,
        )
        b = self.param("bias", nn.initializers.zeros, (self.num_class,), self.param_dtype)
        y = jnp.einsum("npc,cp->nc", x.astype(self.dtype), w.astype(self.dtype))
        return (y + b).astype(jnp.float32)
