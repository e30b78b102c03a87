"""Fused DSCF (DAttentionMM) attention kernel.

Every pixel attends over M (=2*n_sample) deformable keys with a
continuous-rpe bias (reference DAttentionMM, semseg/models/backbones/
swin.py:938-1006).  The XLA formulation materializes the (HW, M) score
tensor plus the same-shaped bias in HBM (~0.7-1.5 GB of traffic per level at
480p batch 8); this kernel tiles the queries, reads the precomputed bias
exactly once, and keeps scores in VMEM — softmax in f32, matmuls with f32
accumulation, identical contraction semantics to the XLA twin below.

Layout contract (group-major, matching the module's channel grouping):
  q:    (BG, HW, GC)        — BG = batch * n_groups, GC = hg * hc channels
  k, v: (BG, Mp, GC)        — Mp = M padded to a lane multiple (128)
  bias: (BG, HW, hg * Mp)   — per-head bias blocks along lanes, padded key
                              columns filled with -1e9 so softmax drops them
Head e of a group lives in channels [e*hc, (e+1)*hc) and bias lanes
[e*Mp, (e+1)*Mp) — both slices are produced reshape-only (no transposes)
by the caller.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _dscf_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, hg):
    q = q_ref[0]  # (QT, GC)
    k = k_ref[0]  # (Mp, GC)
    v = v_ref[0]
    bias = bias_ref[0]  # (QT, hg*Mp)
    mp = k.shape[0]
    hc = q.shape[-1] // hg
    for e in range(hg):
        qe = q[:, e * hc : (e + 1) * hc]
        ke = k[:, e * hc : (e + 1) * hc]
        ve = v[:, e * hc : (e + 1) * hc]
        s = jax.lax.dot_general(
            (qe * scale).astype(qe.dtype),
            ke,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (QT, Mp) f32, VMEM-only
        s = s + bias[:, e * mp : (e + 1) * mp].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, :, e * hc : (e + 1) * hc] = jax.lax.dot_general(
            p.astype(ve.dtype),
            ve,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def dscf_reference(q, k, v, bias, scale, hg):
    """XLA twin of the kernel (same packed layout; also its backward)."""
    bg, hw, gc = q.shape
    mp = k.shape[1]
    hc = gc // hg

    def heads(t, n):  # (BG, N, GC) -> (BG, hg, N, hc)
        return t.reshape(bg, n, hg, hc).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, hw), heads(k, mp), heads(v, mp)
    bh = bias.reshape(bg, hw, hg, mp).transpose(0, 2, 1, 3)
    s = (
        jnp.einsum(
            "behd,bemd->behm", qh * scale, kh, preferred_element_type=jnp.float32
        )
        + bh
    )
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "behm,bemd->behd",
        p.astype(vh.dtype),
        vh,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(bg, hw, gc)


def pallas_dscf_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    scale: float,
    hg: int,
    query_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    bg, hw, gc = q.shape
    mp = k.shape[1]
    qt = min(query_tile, _round_up(hw, 8))
    hw_pad = _round_up(hw, qt)
    if hw_pad != hw:
        q = jnp.pad(q, ((0, 0), (0, hw_pad - hw), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, hw_pad - hw), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dscf_kernel, scale=scale, hg=hg),
        out_shape=jax.ShapeDtypeStruct((bg, hw_pad, gc), q.dtype),
        grid=(bg, hw_pad // qt),
        in_specs=[
            pl.BlockSpec((1, qt, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, hg * mp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, gc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :hw]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def dscf_attention(q, k, v, bias, scale, hg):
    """Fused forward (Pallas) + XLA-recompute backward.

    See module docstring for the packed layout contract."""
    return pallas_dscf_attention(q, k, v, bias, scale, hg)


def _fwd(q, k, v, bias, scale, hg):
    return pallas_dscf_attention(q, k, v, bias, scale, hg), (q, k, v, bias)


def _bwd(scale, hg, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: dscf_reference(a, b, c, d, scale, hg), q, k, v, bias
    )
    return vjp(g)


dscf_attention.defvjp(_fwd, _bwd)
