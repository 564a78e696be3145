"""Tuned Pallas self-attention for the diffusion UNet's image tokens.

The SD2 UNet spends most of its FLOPs in non-causal self-attention over
spatial tokens with a *small* head dim (64) and a moderate sequence
(64x64 latents -> S=4096).  The stock `jax.experimental.pallas` flash
kernel runs this shape at <10% MFU on v5e (measured 60.6 ms per
[24,5,4096,64] call vs a ~5 ms matmul bound); its online-softmax
bookkeeping and small default blocks dominate at D=64.  Sequence
lengths here are small enough that a whole [block_q, S] logits tile
fits comfortably in VMEM, so this kernel skips online softmax
entirely: one QK^T matmul, one row softmax (with the 1/l division
deferred to the [block_q, D] output -- 64x less VPU work than
normalizing the probabilities), one PV matmul.  Everything rides the
MXU in bf16 with f32 accumulation.

Used by guidance/unet.py (reference architecture:
/root/reference/threestudio/models/guidance/models/unet_rgbdepth.py --
the attention math is standard scaled-dot-product, diffusers
Attention).  The UNet is never differentiated under SDS (the score is
consumed through a stop-gradient, dual_branch_guidance.py:795-810 in
the reference), but a VJP is provided anyway by recomputing with plain
XLA einsums so the kernel is safe to use in differentiated paths
(e.g. guidance_eval or future latent-space losses).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    q = q_ref[0]  # [bq, D] bf16
    k = k_ref[0]  # [S, D] bf16
    v = v_ref[0]  # [S, D] bf16
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits *= sm_scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)  # [bq, 1]
    out = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (out / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention(q, k, v, sm_scale):
    return _attention_fwd_impl(q, k, v, sm_scale)


def _attention_fwd_impl(q, k, v, sm_scale):
    bh, s, d = q.shape
    block_q = min(256, s)
    interpret = jax.default_backend() != "tpu"
    grid = (bh, s // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # k/v index maps ignore the q-block axis: consecutive grid
            # steps over i reuse the same [S, D] block without refetch
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _xla_attention(q, k, v, sm_scale):
    logits = jnp.einsum(
        "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attention_vjp_fwd(q, k, v, sm_scale):
    return _attention_fwd_impl(q, k, v, sm_scale), (q, k, v)


def _attention_vjp_bwd(sm_scale, res, g):
    # Recompute-based backward in plain XLA: correct and simple; the
    # training path never takes this branch (UNet is behind a
    # stop-gradient in SDS).
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_attention(a, b, c, sm_scale),
                     q, k, v)
    return vjp(g)


_attention.defvjp(_attention_vjp_fwd, _attention_vjp_bwd)


def self_attention(q, k, v, sm_scale: float | None = None):
    """Non-causal multi-head attention, [B, S, H, D] layout.

    Shapes: q [B, S, H, D]; k, v [B, M, H, D] with M == S required
    only to be a multiple of the q block (all UNet self-attention
    sites have M == S).  Returns [B, S, H, D] in q's dtype.
    """
    b, s, h, d = q.shape
    m = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    fold = lambda x, n: (
        x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    )
    out = _attention(fold(q, s), fold(k, m), fold(v, m), float(sm_scale))
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
