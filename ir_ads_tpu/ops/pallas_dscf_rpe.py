"""Pallas builder for the DSCF continuous relative-position bias.

Reference semantics: DAttentionMM samples a learned (2*rh-1, 2*rw-1) table
at displacement (q_i - pos_j)/2 per (query pixel, deformable sample) pair
(reference swin.py:938-1006, F.grid_sample on the rpe table).  The exact
separable matmul form (see DAttentionMM.rpe_bias) factorizes the bilinear
interpolation into 1-D hat-weight contractions:

    u_je[s, c]   = sum_t T_e[s, t] * hat(ix[c, j] - t)      (S1, S2)@(S2, W)
    bias_je[r,c] = sum_s hat(iy[r, j] - s) * u_je[s, c]     (H, S1)@(S1, W)

In XLA this materializes u and bias (~92M elements each at level 0, batch 8)
in HBM; this kernel runs both dots per (j, head) entirely in VMEM and only
writes the final bias, in its natural j-major (BG, hg, M, H, W) layout —
every write is a full (H, W) tile, no relayouts.

The caller transposes once to the attention kernel's packed layout
(BG, H*W, hg*Mp); see ir_ads_tpu.ops.pallas_dscf.

Only worthwhile where H*W is large and W maps well onto lanes (levels 0-1
of the Swin pyramid).  Levels 2-3 keep the XLA einsum path (tiny per-j
matmuls there are overhead-bound in a kernel but batch fine in XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _env_interpret() -> bool:
    import os

    return os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"

def _auto_j_chunk(m, h, w, s1, s2, hg, out_size):
    """Largest j-chunk (divisor of m, multiple of 8) within a VMEM budget.

    The grid has bg * (m // jc) steps; at jc=8 the bench forward ran ~9000
    steps across the four pyramid levels and the builder was pure
    per-step overhead (~10 ms for ~1 ms of math + ~1.7 ms of HBM traffic).
    Estimated VMEM per j: the out tile (double-buffered by Mosaic), the
    f32 hat-weight / iota intermediates, u, and the f32 bias accumulator.
    """
    def lanes(v):  # trailing dim pads to the 128-lane vreg width
        return -(-v // 128) * 128

    def subl(v):  # second-to-last dim pads to 8 sublanes
        return -(-v // 8) * 8

    per_j = (
        2 * hg * subl(h) * lanes(w) * out_size  # out block, double-buffered
        + subl(h) * lanes(s1) * 4               # wy
        + subl(s2) * lanes(w) * 4               # wxT
        + subl(w) * lanes(s1) * out_size        # u
        + subl(h) * lanes(w) * 4                # bias (f32 accum)
    )
    budget = 24 * 1024 * 1024
    best = 8 if m % 8 == 0 else m
    for jc in range(8, min(m, 128) + 1, 8):
        if m % jc == 0 and jc * per_j <= budget:
            best = jc
    return best


def _rpe_kernel(pos_ref, table_ref, out_ref, *, h, w, s1, s2, jc, hg, out_dtype):
    """Grid: (BG, M // jc).  Blocks:
    pos_ref:   (1, jc, 2) f32      — (py, px) per sample point
    table_ref: (1, hg, s1, s2) f32 — this group's table, head-major
    out_ref:   (1, hg, jc, h, w)   — bias tiles
    """
    # query grids (static): qy[r] = 2r/(h-1) - 1, iy = (0.5(qy-py)+1)*0.5*(s1-1)
    # expand: iy[r, j] = ay*r + by(j) with ay = (s1-1)/(2*(h-1))
    ay = (s1 - 1.0) / (2.0 * (h - 1.0))
    ax = (s2 - 1.0) / (2.0 * (w - 1.0))
    # Mosaic iota must be integer-typed; cast after
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (h, s1), 0).astype(jnp.float32)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (h, s1), 1).astype(jnp.float32)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 0).astype(jnp.float32)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 1).astype(jnp.float32)

    for j in range(jc):
        py = pos_ref[0, j, 0]
        px = pos_ref[0, j, 1]
        #   qy[r] = 2r/(h-1) - 1
        #   iy    = (0.5*(qy[r]-py) + 1) * 0.5*(s1-1)
        #         = ay*r + (0.5 - 0.5*py) * 0.5*(s1-1)
        by = (0.5 - 0.5 * py) * 0.5 * (s1 - 1.0)
        bx = (0.5 - 0.5 * px) * 0.5 * (s2 - 1.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ay * r_ids + by - s_ids))  # (h, s1)
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(ax * c_ids + bx - t_ids))  # (s2, w)
        for e in range(hg):
            u = jax.lax.dot_general(
                table_ref[0, e], wxT,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (s1, w)
            bias = jax.lax.dot_general(
                wy, u,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (h, w)
            out_ref[0, e, j] = bias.astype(out_dtype)


def dscf_rpe_bias_pallas(
    pos: jax.Array,       # (BG, M, 2) f32, (y, x) in [-1, 1]
    table: jax.Array,     # (G, hg, S1, S2) f32
    h: int,
    w: int,
    out_dtype=jnp.bfloat16,
    j_chunk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns bias (BG, hg, M, h, w).  BG = B * G (group-minor: bg = b*G+g)."""
    bg, m, _ = pos.shape
    g, hg, s1, s2 = table.shape
    if j_chunk is None:
        # Mosaic block rule: the pos block's second-to-last dim must be a
        # multiple of 8 or equal to the full M
        j_chunk = 8 if m % 8 == 0 else m
    assert m % j_chunk == 0, (m, j_chunk)

    kernel = functools.partial(
        _rpe_kernel, h=h, w=w, s1=s1, s2=s2, jc=j_chunk, hg=hg,
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bg, hg, m, h, w), out_dtype),
        grid=(bg, m // j_chunk),
        in_specs=[
            pl.BlockSpec((1, j_chunk, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, s1, s2), lambda i, j, g=g: (i % g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, j_chunk, h, w), lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or _env_interpret(),
    )(pos, table)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dscf_rpe_bias(pos, table, h, w, out_dtype=jnp.bfloat16):
    """Differentiable entry: Pallas forward + XLA-recompute backward."""
    return dscf_rpe_bias_pallas(pos, table, h, w, out_dtype=out_dtype)


def _rpe_fwd(pos, table, h, w, out_dtype):
    return dscf_rpe_bias_pallas(pos, table, h, w, out_dtype=out_dtype), (
        pos,
        table,
    )


def _rpe_bwd(h, w, out_dtype, res, g):
    pos, table = res
    _, vjp = jax.vjp(
        lambda p, t: dscf_rpe_bias_reference(p, t, h, w, out_dtype), pos, table
    )
    return vjp(g)


dscf_rpe_bias.defvjp(_rpe_fwd, _rpe_bwd)


def _rpe_rows_kernel(
    pos_ref, table_ref, out_ref, *, h, w, s1, s2, jc, hg, out_dtype
):
    """Row-interleaved variant.  Grid: (BG, M // jc).  Blocks:
    pos_ref:   (1, jc, 2) f32
    table_ref: (1, hg, s1, s2) f32
    out_ref:   (1, hg, h, jc, w) — a full (h, jc, w) plane stored per head

    Identical math to ``_rpe_kernel``; only the output layout differs.  The
    (BG, hg, h, M, w) array lets the attention consumer slice a full
    (M, w) bias plane per (head, query-row) with NO relayout — the round-2
    finding was that the (BG, hg, M, h, w) -> (BG, HW, hg*Mp) transpose in
    HBM cost more than the whole einsum path (swin.py DAttentionMM notes).

    The whole j-chunk is computed with two batched dots and one
    leading-dims transpose.  An earlier per-j loop storing
    ``out[0, e, :, j, :]`` hit an unsupported Mosaic reshape
    ((h, w) -> (1, 1, h, 1, w) on a rank-5 ref); interior-index stores on
    rank-5 refs do not lower, full-plane stores + tpu.transpose on the
    vreg-array dims do (dev/probe_mosaic.py).
    """
    ay = (s1 - 1.0) / (2.0 * (h - 1.0))
    ax = (s2 - 1.0) / (2.0 * (w - 1.0))
    pos = pos_ref[0]  # (jc, 2)
    by = (0.5 - 0.5 * pos[:, 0:1]) * 0.5 * (s1 - 1.0)  # (jc, 1)
    bx = (0.5 - 0.5 * pos[:, 1:2]) * 0.5 * (s2 - 1.0)
    # 2-D base grids (ay*r - s) / (ax*c - t); the per-j offset is a pure
    # broadcast — materializing 3-D iotas per chunk tripled VMEM use
    r2 = jax.lax.broadcasted_iota(jnp.int32, (h, s1), 0).astype(jnp.float32)
    s_2 = jax.lax.broadcasted_iota(jnp.int32, (h, s1), 1).astype(jnp.float32)
    t2 = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 0).astype(jnp.float32)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 1).astype(jnp.float32)
    base_y = ay * r2 - s_2  # (h, s1)
    base_x = ax * c2 - t2   # (s2, w)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(base_y[None] + by[:, :, None]))
    wxT = jnp.maximum(0.0, 1.0 - jnp.abs(base_x[None] + bx[:, :, None]))
    # MXU operand dtype: when the consumer stores bf16 anyway, run the dots
    # with bf16 operands (f32 accumulation) — the f32-operand path runs the
    # MXU at a fraction of the bf16 rate and rpe is ~315 GFLOP of the bench
    # forward (dev/roofline.py).  The XLA twin stores its intermediates at
    # the same width (swin.py rpe_bias `store`), so precision is unchanged.
    cdt = (
        jnp.bfloat16 if jnp.dtype(out_dtype) == jnp.bfloat16 else jnp.float32
    )
    wy = wy.astype(cdt)
    wxT = wxT.astype(cdt)
    for e in range(hg):
        u = jax.lax.dot_general(
            wxT, table_ref[0, e].astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (jc, w, s1): u[j, c, s] = sum_t hat(ix[c,j]-t) T_e[s,t]
        bias = jax.lax.dot_general(
            wy, u,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (jc, h, w) f32
        out_ref[0, e] = bias.transpose(1, 0, 2).astype(out_dtype)


def dscf_rpe_bias_rows_pallas(
    pos: jax.Array,       # (BG, M, 2) f32, (y, x) in [-1, 1]
    table: jax.Array,     # (G, hg, S1, S2) f32
    h: int,
    w: int,
    out_dtype=jnp.bfloat16,
    j_chunk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns bias (BG, hg, h, M, w).  BG = B * G (group-minor)."""
    bg, m, _ = pos.shape
    g, hg, s1, s2 = table.shape
    if j_chunk is None:
        import os

        ov = os.environ.get("IR_ADS_DSCF_RPE_JC", "")
        if ov and m % int(ov) == 0:
            j_chunk = int(ov)
        else:
            j_chunk = _auto_j_chunk(
                m, h, w, s1, s2, hg, jnp.dtype(out_dtype).itemsize
            )
    assert m % j_chunk == 0, (m, j_chunk)

    kernel = functools.partial(
        _rpe_rows_kernel, h=h, w=w, s1=s1, s2=s2, jc=j_chunk, hg=hg,
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bg, hg, h, m, w), out_dtype),
        grid=(bg, m // j_chunk),
        in_specs=[
            pl.BlockSpec((1, j_chunk, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, s1, s2), lambda i, j, g=g: (i % g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, h, j_chunk, w), lambda i, j: (i, 0, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or _env_interpret(),
    )(pos, table)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dscf_rpe_bias_rows(pos, table, h, w, out_dtype=jnp.bfloat16):
    """Differentiable entry: Pallas forward + XLA-recompute backward."""
    return dscf_rpe_bias_rows_pallas(pos, table, h, w, out_dtype=out_dtype)


def _rpe_rows_fwd(pos, table, h, w, out_dtype):
    return dscf_rpe_bias_rows_pallas(pos, table, h, w, out_dtype=out_dtype), (
        pos,
        table,
    )


def _rpe_rows_bwd(h, w, out_dtype, res, g):
    pos, table = res
    _, vjp = jax.vjp(
        lambda p, t: dscf_rpe_bias_rows_reference(p, t, h, w, out_dtype),
        pos,
        table,
    )
    return vjp(g)


dscf_rpe_bias_rows.defvjp(_rpe_rows_fwd, _rpe_rows_bwd)


def _rpe_packed_kernel(
    pos_ref, table_ref, out_ref, *, h, w, s1, s2, s1p, jc, hg, out_dtype
):
    """Packed-layout builder for the SMALL levels.  Grid: (BG, M // jc).
    Blocks:
    pos_ref:   (1, jc, 2) f32
    table_ref: (1, s2, hg * s1p) f32 — table transposed t-major, e-major
               lanes, s1 zero-padded to s1p = 128 so per-head lane slices
               are 128-aligned
    out_ref:   (1, hg, jc, h * w) — bias with the query plane FLAT on
               lanes (hw >= 300 at L3) instead of w (20 of 128 lanes, the
               reason the rows layout lost at level 3 in round 2)

    Same math as ``_rpe_rows_kernel``; the first dot is ONE flat
    (jc*w, s2) @ (s2, hg*s1p) matmul (no per-j batching), the second the
    usual per-j batched (h, s1) x (w, s1) dot, then the (h, w) minor dims
    merge once per (e, chunk) before the store.  The s1 pad columns are
    harmless: iy <= s1-1 always, so the wy hat weight at s >= s1 is 0 by
    construction (and the table pad lanes are zero anyway).
    """
    ay = (s1 - 1.0) / (2.0 * (h - 1.0))
    ax = (s2 - 1.0) / (2.0 * (w - 1.0))
    pos = pos_ref[0]  # (jc, 2)
    by = (0.5 - 0.5 * pos[:, 0:1]) * 0.5 * (s1 - 1.0)  # (jc, 1)
    bx = (0.5 - 0.5 * pos[:, 1:2]) * 0.5 * (s2 - 1.0)
    cdt = (
        jnp.bfloat16 if jnp.dtype(out_dtype) == jnp.bfloat16 else jnp.float32
    )
    # wx in (jc, w, s2) layout so the flat (jc*w, s2) reshape is free
    c2 = jax.lax.broadcasted_iota(jnp.int32, (w, s2), 0).astype(jnp.float32)
    t2 = jax.lax.broadcasted_iota(jnp.int32, (w, s2), 1).astype(jnp.float32)
    base_x = ax * c2 - t2  # (w, s2)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(base_x[None] + bx[:, :, None]))
    r2 = jax.lax.broadcasted_iota(jnp.int32, (h, s1p), 0).astype(jnp.float32)
    s_2 = jax.lax.broadcasted_iota(jnp.int32, (h, s1p), 1).astype(jnp.float32)
    base_y = ay * r2 - s_2  # (h, s1p)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(base_y[None] + by[:, :, None]))
    wx = wx.astype(cdt)
    wy = wy.astype(cdt)

    u = jax.lax.dot_general(
        wx.reshape(jc * w, s2), table_ref[0].astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)  # (jc*w, hg*s1p)
    u = u.reshape(jc, w, hg * s1p)
    for e in range(hg):
        ue = u[:, :, e * s1p : (e + 1) * s1p]  # 128-aligned lane slice
        bias = jax.lax.dot_general(
            wy, ue,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (jc, h, w) f32
        out_ref[0, e] = bias.reshape(jc, h * w).astype(out_dtype)


def dscf_rpe_bias_packed_pallas(
    pos: jax.Array,       # (BG, M, 2) f32, (y, x) in [-1, 1]
    table: jax.Array,     # (G, hg, S1, S2) f32
    h: int,
    w: int,
    out_dtype=jnp.bfloat16,
    j_chunk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns bias (BG, hg, M, h*w).  BG = B * G (group-minor).

    Built for the small pyramid levels (production: level 3, h*w = 300,
    M = 600) where the rows layout wastes 108 of 128 lanes and the XLA
    einsum path materializes ~91M-element u intermediates in HBM per
    call.  The consumer adds this to (B, heads, HW, M) scores with the
    transpose fused into the add (XLA fuses permutations into
    elementwise consumers)."""
    bg, m, _ = pos.shape
    g, hg, s1, s2 = table.shape
    s1p = _round_up(s1, 128)
    if j_chunk is None:
        import os

        ov = os.environ.get("IR_ADS_DSCF_RPE3_JC", "")
        j_chunk = int(ov) if ov and m % int(ov) == 0 else m
    assert m % j_chunk == 0, (m, j_chunk)

    # (G, hg, S1, S2) -> (G, S2, hg, S1p) -> (G, S2, hg*S1p), zero-pad s1
    t2 = jnp.pad(table, ((0, 0), (0, 0), (0, s1p - s1), (0, 0)))
    t2 = t2.transpose(0, 3, 1, 2).reshape(g, s2, hg * s1p)

    kernel = functools.partial(
        _rpe_packed_kernel, h=h, w=w, s1=s1, s2=s2, s1p=s1p, jc=j_chunk,
        hg=hg, out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bg, hg, m, h * w), out_dtype),
        grid=(bg, m // j_chunk),
        in_specs=[
            pl.BlockSpec((1, j_chunk, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s2, hg * s1p), lambda i, j, g=g: (i % g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, j_chunk, h * w), lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or _env_interpret(),
    )(pos, t2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dscf_rpe_bias_packed(pos, table, h, w, out_dtype=jnp.bfloat16):
    """Differentiable entry: Pallas forward + XLA-recompute backward."""
    return dscf_rpe_bias_packed_pallas(pos, table, h, w, out_dtype=out_dtype)


def _rpe_packed_fwd(pos, table, h, w, out_dtype):
    return dscf_rpe_bias_packed_pallas(
        pos, table, h, w, out_dtype=out_dtype
    ), (pos, table)


def _rpe_packed_bwd(h, w, out_dtype, res, g):
    pos, table = res
    _, vjp = jax.vjp(
        lambda p, t: dscf_rpe_bias_packed_reference(p, t, h, w, out_dtype),
        pos,
        table,
    )
    return vjp(g)


dscf_rpe_bias_packed.defvjp(_rpe_packed_fwd, _rpe_packed_bwd)


def dscf_rpe_bias_packed_reference(pos, table, h, w, out_dtype=jnp.bfloat16):
    """XLA twin of the packed kernel (same layout), for tests + backward."""
    bias = dscf_rpe_bias_reference(pos, table, h, w, out_dtype=jnp.float32)
    bg, hg, m = bias.shape[:3]
    # (BG, hg, M, h, w) -> (BG, hg, M, h*w)
    return bias.reshape(bg, hg, m, h * w).astype(out_dtype)


def dscf_rpe_bias_rows_reference(pos, table, h, w, out_dtype=jnp.bfloat16):
    """XLA twin of the rows kernel (same layout), for tests + backward."""
    bias = dscf_rpe_bias_reference(pos, table, h, w, out_dtype=jnp.float32)
    # (BG, hg, M, h, w) -> (BG, hg, h, M, w)
    return bias.transpose(0, 1, 3, 2, 4).astype(out_dtype)


def dscf_rpe_bias_reference(pos, table, h, w, out_dtype=jnp.bfloat16):
    """XLA twin of the kernel (same layout), for tests and the backward."""
    bg, m, _ = pos.shape
    g, hg, s1, s2 = table.shape
    ay = (s1 - 1.0) / (2.0 * (h - 1.0))
    ax = (s2 - 1.0) / (2.0 * (w - 1.0))
    r = jnp.arange(h, dtype=jnp.float32)
    c = jnp.arange(w, dtype=jnp.float32)
    s = jnp.arange(s1, dtype=jnp.float32)
    t = jnp.arange(s2, dtype=jnp.float32)
    by = (0.5 - 0.5 * pos[..., 0]) * 0.5 * (s1 - 1.0)  # (BG, M)
    bx = (0.5 - 0.5 * pos[..., 1]) * 0.5 * (s2 - 1.0)
    iy = ay * r[None, None, :] + by[..., None]  # (BG, M, h)
    ix = ax * c[None, None, :] + bx[..., None]  # (BG, M, w)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - s))  # (BG, M, h, S1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None] - t))  # (BG, M, w, S2)
    tb = table[jnp.arange(bg) % g]  # (BG, hg, S1, S2)
    u = jnp.einsum("best,bmwt->bmesw", tb, wx, preferred_element_type=jnp.float32)
    bias = jnp.einsum(
        "bmhs,bmesw->bemhw", wy, u, preferred_element_type=jnp.float32
    )  # (BG, hg, M, h, w)
    return bias.astype(out_dtype)
