"""Pallas TPU fused attention for UNet spatial self-attention.

The reference's attention blocks materialize the (N, N) softmax weights in
HBM between two matmuls (unet_adm.py:381-393 einsums, unet_simple.py:176-184
bmms). At the UNet's attention resolutions N = H*W is 64-4096 tokens, so the
whole computation fits VMEM: this kernel runs one (batch*head) grid cell per
call, computing softmax(Q K^T * scale) V with fp32 logits without ever
writing the weight matrix to HBM.

Shapes: q, k, v (B, H, N, D) -> (B, H, N, D), matching models.layers.attention.
The public entry falls back to the XLA einsum path when the working set
exceeds the VMEM budget or when disabled (NLC_DISABLE_PALLAS_ATTN=1, or on
non-TPU backends where Mosaic is unavailable). Training differentiates
through a matching flash-style Pallas backward (softmax recomputed in VMEM,
no N x N residual in HBM) under its own, tighter VMEM gate.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_VMEM_BUDGET = 12 * 1024 * 1024  # bytes, conservative per-core working set

# Trace-time counters: which backward implementation was staged into the
# compiled program. A chip training run asserts path_counts["pallas_bwd"] > 0
# to prove the kernel (not the einsum recompute) is what actually trained.
path_counts = {"pallas_fwd": 0, "pallas_bwd": 0, "xla_bwd": 0}


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0]                                   # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (N, N) fp32 in VMEM
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention(q, k, v, scale: float):
    return _pallas_attention_fwd_impl(q, k, v, scale)


@functools.partial(jax.jit, static_argnames=("scale",))
def _pallas_attention_fwd_impl(q, k, v, scale: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # note: no CostEstimate — a hand-supplied transcendental count made the
    # Mosaic scheduler serialize this kernel ~80x slower on v5e
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     scale):
    # Flash-style backward: the softmax weights are recomputed from q/k in
    # VMEM (never saved to HBM by the forward), then the three gradients are
    # produced by four MXU matmuls per (batch*head) cell:
    #   dV = P^T g;  dP = g V^T;  dS = P o (dP - rowsum(dP o P)) * scale;
    #   dQ = dS K;   dK = dS^T Q.
    q = q_ref[0]                                   # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (N, N) fp32
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)        # fp32 probs
    pc = p.astype(v.dtype)                            # matmul operand dtype
    dv_ref[0] = jax.lax.dot_general(                  # P^T g  -> (N, D)
        pc, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(                         # g V^T  -> (N, N) fp32
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)   # = rowsum(g o out)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(                  # dS K   -> (N, D)
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(                  # dS^T Q -> (N, D)
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _pallas_attention_bwd_impl(q, k, v, g, scale: float, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    flat = lambda x: x.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b * h, n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape, shape, shape],
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(g))
    unflat = lambda x: x.reshape(b, h, n, d)
    return unflat(dq), unflat(dk), unflat(dv)


def use_pallas_attention_bwd(q_shape, dtype) -> bool:
    """Backward holds three (N, N) fp32 buffers (logits/probs, dP, dS) plus
    eight (N, D) tensors live at once — a larger working set than the
    forward, so it gets its own VMEM gate."""
    if os.environ.get("NLC_DISABLE_PALLAS_ATTN"):
        return False
    b, h, n, d = q_shape
    itemsize = jnp.dtype(dtype).itemsize
    working = 8 * n * d * itemsize + n * n * 4 * 3
    return working <= _VMEM_BUDGET


def _pallas_attention_vjp_fwd(q, k, v, scale):
    # nondiff args stay in their primal positions for the fwd rule; only the
    # bwd rule receives them first
    return _pallas_attention_fwd_impl(q, k, v, scale), (q, k, v)


def _pallas_attention_vjp_bwd(scale, res, g):
    q, k, v = res
    if use_pallas_attention_bwd(q.shape, q.dtype):
        path_counts["pallas_bwd"] += 1
        return _pallas_attention_bwd_impl(q, k, v, g, scale)
    # Working set exceeds VMEM: differentiate through the equivalent XLA
    # einsum formulation instead (recompute, fused by XLA).
    path_counts["xla_bwd"] += 1
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_pallas_attention.defvjp(_pallas_attention_vjp_fwd, _pallas_attention_vjp_bwd)


def use_pallas_attention(q_shape, dtype) -> bool:
    if os.environ.get("NLC_DISABLE_PALLAS_ATTN"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    b, h, n, d = q_shape
    itemsize = jnp.dtype(dtype).itemsize
    working = 4 * n * d * itemsize + n * n * 4 * 2   # q,k,v,o + logits+probs
    return working <= _VMEM_BUDGET


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Drop-in for models.layers.attention: (B,H,N,D) with fp32 softmax."""
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    if use_pallas_attention(q.shape, q.dtype):
        path_counts["pallas_fwd"] += 1
        return _pallas_attention(q, k, v, float(scale))
    return _xla_attention(q, k, v, scale)
