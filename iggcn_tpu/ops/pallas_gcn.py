"""Fused Pallas TPU kernel for the imaging GCN stack.

The flagship model's imaging branch is `L` dense GCN layers with a
jumping-knowledge concat (`kernel/sgcn_img_snp.py:218-223` in the reference:
GCNConv stack + JK-cat). As plain XLA this is 2L batched matmuls with the
activations round-tripping HBM between layers. This kernel runs the whole
stack per sample inside VMEM: one HBM read of the propagation matrix and the
input features, one HBM write of the JK-concat output — the (B, N, N)
propagation matrix, by far the largest operand, is touched exactly once.

Sizes (N=90/270, H<=32, B<=64) fit VMEM with huge headroom: a full sample's
prop + activations is < 0.5 MB against ~16 MB of VMEM.

Autodiff: Pallas kernels are not traced by JAX's AD, so `fused_gcn_stack`
carries a custom VJP whose backward re-derives gradients from the jnp
reference implementation (rematerialized forward — cheap at these sizes, and
keeps backward correctness tied to the oracle-tested reference path).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gcn_stack_reference(prop: jax.Array, x: jax.Array,
                        weights: Tuple[jax.Array, ...],
                        biases: Tuple[jax.Array, ...]) -> jax.Array:
    """jnp reference: h_{l+1} = relu(prop @ h_l @ W_l + b_l); returns the
    JK concat of all layer outputs, shape (B, N, sum(H_l))."""
    h = x
    feats = []
    for w, b in zip(weights, biases):
        h = jax.nn.relu(jnp.einsum("bij,bjf,fk->bik", prop, h, w) + b)
        feats.append(h)
    return jnp.concatenate(feats, axis=-1)


def _stack_kernel(num_layers: int, out_dims: Sequence[int], *refs):
    """Kernel body: refs = (prop, x, w0, b0, ..., w_{L-1}, b_{L-1}, out)."""
    prop_ref, x_ref = refs[0], refs[1]
    out_ref = refs[-1]
    p = prop_ref[0]                      # (N, N)
    h = x_ref[0]                         # (N, F0)
    off = 0
    for layer in range(num_layers):
        w = refs[2 + 2 * layer][...]     # (F_in, H)
        b = refs[3 + 2 * layer][...]     # (1, H)
        hw = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = jnp.maximum(
            jnp.dot(p, hw, preferred_element_type=jnp.float32) + b, 0.0)
        out_ref[0, :, off:off + out_dims[layer]] = h
        off += out_dims[layer]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gcn_stack_pallas(prop, x, weights, biases, *, interpret=False):
    b_sz, n, _ = prop.shape
    f0 = x.shape[-1]
    out_dims = tuple(int(w.shape[1]) for w in weights)
    total = sum(out_dims)
    num_layers = len(weights)
    biases2d = tuple(bb.reshape(1, -1) for bb in biases)

    in_specs = [
        pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, f0), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w, bb in zip(weights, biases2d):
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(bb.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    flops_per = sum(2 * n * n * d + 2 * n * prev * d for prev, d in
                    zip((f0,) + out_dims[:-1], out_dims))
    return pl.pallas_call(
        functools.partial(_stack_kernel, num_layers, out_dims),
        grid=(b_sz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, total), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, n, total), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b_sz * flops_per,
            bytes_accessed=4 * b_sz * (n * n + n * f0 + n * total),
            transcendentals=0),
        interpret=interpret,
    )(prop, x, *[a for pair in zip(weights, biases2d) for a in pair])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_gcn_stack(prop, x, weights, biases, interpret=False):
    """Fused L-layer GCN stack with JK-concat output.

    prop: (B, N, N) normalized propagation; x: (B, N, F0);
    weights/biases: tuples per layer. Forward runs the Pallas kernel;
    backward differentiates the jnp reference (identical math).
    Set interpret=True off-TPU (tests run the kernel interpreted on CPU).
    """
    return _gcn_stack_pallas(prop, x, tuple(weights), tuple(biases),
                             interpret=interpret)


def _fwd(prop, x, weights, biases, interpret):
    out = fused_gcn_stack(prop, x, weights, biases, interpret)
    return out, (prop, x, tuple(weights), tuple(biases))


def _bwd(interpret, res, g):
    prop, x, weights, biases = res
    _, vjp = jax.vjp(gcn_stack_reference, prop, x, weights, biases)
    return vjp(g)


fused_gcn_stack.defvjp(_fwd, _bwd)
