"""Flax building blocks with PyTorch-compatible semantics.

The reference relies on several torch layer behaviors that differ from flax
defaults; this module pins them down once:

  * `TorchLinear` — torch `nn.Linear` init scale: kernel & bias ~
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform(a=sqrt(5)) collapses
    to exactly that bound for 2-D weights).
  * `BatchNorm1d` — torch semantics for both (B, C) and (B, C, L) inputs
    (feature axis 1 for 3-D input; running stats with torch momentum=0.1).
    Running statistics are carried functionally in the `batch_stats`
    collection so whole-epoch `lax.scan` training works.
  * `NodeLayerNorm` — torch `nn.LayerNorm(n_nodes)` applied to a permuted
    (B, F, N) tensor, i.e. normalization over the *node* axis with per-node
    affine (cf. `kernel/go_model.py:102,246`).
  * `node_dropout` — torch `Dropout2d` on a 3-D (B, N, F) tensor zeroes whole
    node rows (channel axis 1), cf. `kernel/go_model.py:104,247`.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def unbiased_var_factor(n_red):
    """Bessel's correction n/(n-1): torch stores the UNBIASED variance in
    `running_var` while normalizing with the biased one — a real divergence
    found (and fixed) by the trajectory-parity suite in round 3. Hoisted to
    a module function so the mutation audit (`tests/mutations.py`) can
    verify that suite still catches the biased-variance misreading."""
    return n_red / jnp.maximum(n_red - 1.0, 1.0)


def pyg_glorot(key, shape, dtype=jnp.float32):
    """PyG glorot init (GCNConv/GATConv/GraphConv weights):
    U(+-sqrt(6 / (fan_in + fan_out)))."""
    bound = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch init.kaiming_uniform_(a=sqrt(5)) on a 2-D tensor: U(-b, b) with
    b = 1/sqrt(fan_in), fan_in = shape[1] (torch dim-1 convention)."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(shape[1], 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(fan_in: int) -> Callable:
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Linear parity: y = x @ W^T + b with torch's default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(fan_in),
                            (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_linear_init(fan_in), (self.features,))
            y = y + bias
        return y


# torch BatchNorm default momentum; steps._dual_pass's sequential-stats
# reconstruction depends on this exact value — keep them in sync.
BN_MOMENTUM = 0.1


class BatchNorm1d(nn.Module):
    """torch.nn.BatchNorm1d parity.

    For 2-D input (B, C): normalize per feature over the batch.
    For 3-D input (B, C, L): normalize per channel C over (B, L).
    `use_running_average=False` (training) updates `batch_stats`.
    Torch semantics throughout (r3): normalization uses the BIASED batch
    variance, but the running-stat update stores the UNBIASED one
    (n/(n-1) correction over the reduced element count) — flax's
    convention of storing the biased estimator made every post-training
    eval-mode normalization differ from the reference by ~n/(n-1).
    """

    momentum: float = BN_MOMENTUM  # torch: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 weight: Optional[jax.Array] = None):
        """`weight`: optional (B,) 0/1 padding mask — batch statistics are
        computed over real rows only, making padded dense batches bit-match
        the reference's ragged final batch."""
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        if x.ndim == 2:
            feat_axis, reduce_axes = 1, (0,)
        elif x.ndim == 3:
            feat_axis, reduce_axes = 1, (0, 2)
        else:
            raise ValueError(f"BatchNorm1d expects 2-D/3-D input, got {x.ndim}-D")
        c = x.shape[feat_axis]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            if weight is None:
                mean = jnp.mean(x, axis=reduce_axes)
                var = jnp.mean(jnp.square(x), axis=reduce_axes) - jnp.square(mean)
                n_red = 1.0
                for a in reduce_axes:
                    n_red *= x.shape[a]
            else:
                w = weight.reshape((-1,) + (1,) * (x.ndim - 1))
                denom = jnp.maximum(jnp.sum(w) * (x.shape[2] if x.ndim == 3 else 1), 1.0)
                mean = jnp.sum(x * w, axis=reduce_axes) / denom
                var = jnp.sum(jnp.square(x) * w, axis=reduce_axes) / denom - jnp.square(mean)
                n_red = denom
            if not self.is_initializing():
                # torch stores the UNBIASED variance in running_var while
                # normalizing with the biased one
                bessel = unbiased_var_factor(n_red)
                new_mean = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                new_var = (1 - self.momentum) * ra_var.value + self.momentum * (var * bessel)
                if weight is not None:
                    # an all-padding batch (possible when folds are padded to
                    # a common size for fold-parallel execution) must not
                    # drag the running stats toward zero
                    has_real = jnp.sum(weight) > 0
                    new_mean = jnp.where(has_real, new_mean, ra_mean.value)
                    new_var = jnp.where(has_real, new_var, ra_var.value)
                ra_mean.value = new_mean
                ra_var.value = new_var

        shape = [1] * x.ndim
        shape[feat_axis] = c
        mean_b = mean.reshape(shape)
        var_b = var.reshape(shape)
        y = (x - mean_b) * jax.lax.rsqrt(var_b + self.epsilon)
        return y * scale.reshape(shape) + bias.reshape(shape)


class NodeLayerNorm(nn.Module):
    """LayerNorm over the node axis of a (B, N, F) tensor with per-node affine.

    Equals torch `nn.LayerNorm(N)` applied to x.permute(0, 2, 1) and permuted
    back (`kernel/go_model.py:246,274`).
    """

    num_nodes: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # x: (B, N, F)
        assert x.shape[1] == self.num_nodes, (x.shape, self.num_nodes)
        scale = self.param("scale", nn.initializers.ones, (self.num_nodes,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_nodes,))
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale[None, :, None] + bias[None, :, None]


def node_dropout(rng: jax.Array, x: jax.Array, rate: float,
                 deterministic: bool = False) -> jax.Array:
    """Dropout2d parity on (B, N, F): zero entire node rows, rescale kept."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], x.shape[1], 1))
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def dropout(rng: jax.Array, x: jax.Array, rate: float,
            deterministic: bool = False) -> jax.Array:
    """Standard elementwise dropout (functional, rng passed explicitly)."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def pyg_glorot_att(key, shape, dtype=None):
    """PyG GATConv attention-vector init: glorot over the (1, heads, C)
    parameter -> uniform(+-sqrt(6 / (heads + C))). Our dense single-head GAT
    stores att vectors as (C,), so heads = 1."""
    import jax
    import jax.numpy as jnp

    c = shape[-1]
    bound = (6.0 / (1 + c)) ** 0.5
    return jax.random.uniform(key, shape, dtype or jnp.float32,
                              -bound, bound)
