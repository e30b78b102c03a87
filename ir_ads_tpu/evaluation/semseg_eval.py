"""Segmentation evaluation: single-scale, multi-scale+flip (MSF), and tiled
sliding-window inference (reference val_mm.py:30-120).

This is the headline-benchmark path (BASELINE.md: Swin-B RGB-D
sliding-window frames/sec/chip), so it is designed compiler-first:

  * The reference loops over tiles/scales in python, one CUDA launch chain
    per tile (val_mm.py:44-62).  Here every tile of an image is extracted
    into one batch and run through ONE jitted forward; the overlap-add and
    count normalization happen on device in the same program.
  * Multi-scale resizing uses the matmul-based align_corners resize
    (ir_ads_tpu/ops/layers.py) — MXU work instead of gathers.
  * Softmax accumulation stays on device; only the final argmax leaves.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ir_ads_tpu.ops.layers import resize_bilinear


def make_forward_fn(model, variables, device_norm: bool = False) -> Callable:
    """Jitted eval forward: (rgb, dte) -> fused-head logits (B, H, W, C).

    CRITICAL: variables are passed as jit ARGUMENTS, not captured — a
    closure would embed every parameter as an HLO constant (hundreds of MB
    for Swin-B), blowing compile time and remote-compile payload caps.

    ``device_norm`` moves Normalize in-graph: inputs arrive uint8 (4x fewer
    host->device bytes; pairs with augmentations.get_val_augmentation_device_norm)."""

    @jax.jit
    def _forward(variables, rgb, dte):
        if device_norm:
            from ir_ads_tpu.data.augmentations import device_normalize

            rgb = device_normalize(rgb, "img")
            dte = device_normalize(dte, "depth")
        y, _, _ = model.apply(variables, rgb, dte, train=False)
        return y

    return lambda rgb, dte: _forward(variables, rgb, dte)


def align32(v: float) -> int:
    return int(math.ceil(v / 32.0)) * 32


def msf_logits(
    forward: Callable,
    rgb: jax.Array,
    dte: jax.Array,
    scales: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
    flip: bool = True,
) -> jax.Array:
    """Multi-scale + flip ensembled class probabilities (val_mm.py:87-113).

    Per-scale shapes are static, so each scale compiles once; the flip pass
    reuses the same executable (flip is part of the jitted program).
    """
    b, h, w, _ = rgb.shape

    # pre/post stay model-free jits; the model forward runs between them so
    # its parameters travel as runtime arguments, never as HLO constants.
    @functools.lru_cache(maxsize=None)
    def pre_step(nh: int, nw: int):
        @jax.jit
        def pre(rgb, dte):
            srgb = resize_bilinear(rgb, (nh, nw), align_corners=True)
            sdte = resize_bilinear(dte, (nh, nw), align_corners=True)
            if flip:  # one forward instance per scale via batch doubling
                srgb = jnp.concatenate([srgb, srgb[:, :, ::-1]], axis=0)
                sdte = jnp.concatenate([sdte, sdte[:, :, ::-1]], axis=0)
            return srgb, sdte

        return pre

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def post(logits, acc, nh, nw):
        m = logits.shape[0] // 2 if flip else logits.shape[0]
        if flip:
            logits = jnp.concatenate([logits[:m], logits[m:, :, ::-1]], 0)
        if logits.shape[1:3] != (nh, nw):
            # head-native (H/4) logits from CMNeXt(upsample_logits=False):
            # reproduce the reference two-stage path exactly — the model's
            # align_corners=False upsample to the scaled resolution first
            # (cmnext.py forward), THEN the MSF align_corners=True resize
            # to full size (val_mm.py:100).  Collapsing the two into one
            # resize would silently diverge from the reference numerics.
            logits = resize_bilinear(logits, (nh, nw), align_corners=False)
        logits = resize_bilinear(logits, (h, w), align_corners=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if flip:
            probs = probs[:m] + probs[m:]
        return acc + probs

    acc = None
    for s in scales:
        nh, nw = align32(s * h), align32(s * w)
        srgb, sdte = pre_step(nh, nw)(rgb, dte)
        logits = forward(srgb, sdte)
        if acc is None:
            acc = jnp.zeros((b, h, w, logits.shape[-1]), jnp.float32)
        acc = post(logits, acc, nh, nw)
    return acc


def _tile_grid(size: int, tile: int, stride: int) -> List[int]:
    """Static tile start offsets covering [0, size) (last tile right-aligned)."""
    if size <= tile:
        return [0]
    n = int(math.ceil((size - tile) / stride)) + 1
    starts = [min(i * stride, size - tile) for i in range(n)]
    return sorted(set(starts))


def make_sliding_window_fn(
    forward: Callable,
    image_size: Tuple[int, int],
    tile_size: Tuple[int, int],
    num_classes: int,
    overlap: float = 1.0 / 3.0,
    flip: bool = True,
    tile_batch: Optional[int] = None,
    fuse: bool = False,
) -> Callable:
    """Build a fully-jitted sliding-window predictor.

    All tiles are gathered into a (T*B, th, tw, C) batch, run through the
    model in chunks of ``tile_batch`` tiles, and overlap-added back with zero
    host round-trips per tile (contrast val_mm.py:44-62).

    Default ``fuse=False`` = three small XLA programs (extract / forward /
    overlap-add): the model forward keeps its parameters as runtime
    arguments.  ``fuse=True`` inlines ``forward`` into one program — only
    safe when ``forward`` captures little state (it embeds captured arrays
    as HLO constants).

    Returns fn(rgb, dte) -> (B, H, W, num_classes) accumulated logits.
    """
    h, w = image_size
    th, tw = tile_size
    stride_h = int(math.ceil(th * (1 - overlap)))
    stride_w = int(math.ceil(tw * (1 - overlap)))
    ys = _tile_grid(h, th, stride_h)
    xs = _tile_grid(w, tw, stride_w)
    offsets = [(y, x) for y in ys for x in xs]
    n_tiles = len(offsets)
    # chunk is measured in tile-IMAGES (n_tiles * b of them).  The default
    # must cover at least one full input batch: with n_tiles == 1 (tile ==
    # image, the reference default) a default of n_tiles would split the
    # batch into b sequential B=1 forwards through lax.map — measured
    # +14 ms on the v5e bench vs one batched forward.
    chunk = tile_batch

    if not fuse:
        # Three small XLA programs instead of one monolith: tile-extract,
        # model forward (the only heavy compile — reused executable), and
        # overlap-add.  Use when the compile service caps program size.
        return _make_sliding_window_split(
            forward, (h, w), (th, tw), offsets, num_classes, flip
        )

    @jax.jit
    def predict(rgb: jax.Array, dte: jax.Array) -> jax.Array:
        b = rgb.shape[0]
        # rank-3 = FLAT (B, H, W*3) lane-dense input (round-4 patch-embed
        # layout fix; see ops/layers.PatchEmbed).  W-slices/pads scale by
        # the channel factor; the flip reverses W-groups of 3.
        flat = rgb.ndim == 3
        cf = (rgb.shape[-1] // w) if flat else 1  # channels folded into W
        pad_h, pad_w = max(0, th - h), max(0, tw - w)
        if pad_h or pad_w:
            if flat:
                cfg = ((0, 0), (0, pad_h), (0, pad_w * cf))
            else:
                cfg = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
            rgb_p = jnp.pad(rgb, cfg)
            dte_p = jnp.pad(dte, cfg)
        else:
            rgb_p, dte_p = rgb, dte

        if flat:
            tiles_rgb = jnp.stack(
                [rgb_p[:, y : y + th, x * cf : (x + tw) * cf]
                 for (y, x) in offsets], 0
            ).reshape(n_tiles * b, th, tw * cf)
            tiles_dte = jnp.stack(
                [dte_p[:, y : y + th, x * cf : (x + tw) * cf]
                 for (y, x) in offsets], 0
            ).reshape(n_tiles * b, th, tw * cf)
        else:
            tiles_rgb = jnp.stack(
                [rgb_p[:, y : y + th, x : x + tw] for (y, x) in offsets], 0
            ).reshape(n_tiles * b, th, tw, rgb.shape[-1])
            tiles_dte = jnp.stack(
                [dte_p[:, y : y + th, x : x + tw] for (y, x) in offsets], 0
            ).reshape(n_tiles * b, th, tw, dte.shape[-1])

        def flip_w(t):
            if not flat:
                return t[:, :, ::-1]
            mb, mh, mwc = t.shape
            return t.reshape(mb, mh, mwc // cf, cf)[:, :, ::-1].reshape(
                mb, mh, mwc
            )

        def run(tr, td):
            # flip ensembling via batch doubling: ONE forward instance in the
            # program (a second inlined forward doubles the HLO size and can
            # exceed compile-service payload limits) and better MXU batching.
            m = tr.shape[0]
            if flip:
                tr = jnp.concatenate([tr, flip_w(tr)], axis=0)
                td = jnp.concatenate([td, flip_w(td)], axis=0)
            out = forward(tr, td)
            if flip:
                out = out[:m] + out[m:, :, ::-1]
            if out.shape[1] != th or out.shape[2] != tw:
                # ``forward`` returned the heads' native low-res logits
                # (CMNeXt upsample_logits=False): the flip-ensemble above ran
                # at H/4 — exact by bilinearity (flip commutes with the
                # symmetric align_corners=False grid; sum commutes with a
                # linear map) — and the full-res traffic is paid ONCE here
                # instead of per ensemble member (round-4: ~1 ms of the
                # headline p50 was full-res (2B, H, W, C) flip-add + astype).
                out = resize_bilinear(
                    out.astype(jnp.float32), (th, tw), align_corners=False
                )
            return out

        eff_chunk = chunk or max(n_tiles, b)
        if eff_chunk >= n_tiles * b:
            logits = run(tiles_rgb, tiles_dte)
        else:
            n_chunks = -(-(n_tiles * b) // eff_chunk)
            pad_to = n_chunks * eff_chunk
            bpad = ((0, pad_to - n_tiles * b),) + ((0, 0),) * (
                tiles_rgb.ndim - 1
            )
            tiles_rgb = jnp.pad(tiles_rgb, bpad)
            tiles_dte = jnp.pad(tiles_dte, bpad)
            tr = tiles_rgb.reshape(
                (n_chunks, eff_chunk, th) + tiles_rgb.shape[2:]
            )
            td = tiles_dte.reshape(
                (n_chunks, eff_chunk, th) + tiles_dte.shape[2:]
            )
            logits = jax.lax.map(lambda ab: run(ab[0], ab[1]), (tr, td))
            logits = logits.reshape(pad_to, th, tw, num_classes)[: n_tiles * b]

        logits = logits.reshape(n_tiles, b, th, tw, num_classes).astype(
            jnp.float32
        )
        if n_tiles == 1:
            # tile == image (the reference default): the overlap-add is a
            # no-op divide-by-one — skip its ~1.2 GB of f32 round-trips
            return logits[0][:, :h, :w]
        total = jnp.zeros((b, h + pad_h, w + pad_w, num_classes), jnp.float32)
        count = jnp.zeros((h + pad_h, w + pad_w, 1), jnp.float32)
        for i, (y, x) in enumerate(offsets):
            total = jax.lax.dynamic_update_slice(
                total,
                jax.lax.dynamic_slice(
                    total, (0, y, x, 0), (b, th, tw, num_classes)
                )
                + logits[i],
                (0, y, x, 0),
            )
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (y, x, 0), (th, tw, 1)) + 1.0,
                (y, x, 0),
            )
        total = total / count[None]
        return total[:, :h, :w]

    return predict


def _make_sliding_window_split(
    forward: Callable,
    image_size: Tuple[int, int],
    tile_size: Tuple[int, int],
    offsets,
    num_classes: int,
    flip: bool,
) -> Callable:
    h, w = image_size
    th, tw = tile_size
    n_tiles = len(offsets)
    pad_h, pad_w = max(0, th - h), max(0, tw - w)

    @jax.jit
    def extract(rgb, dte):
        if pad_h or pad_w:
            cfg = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
            rgb = jnp.pad(rgb, cfg)
            dte = jnp.pad(dte, cfg)
        b = rgb.shape[0]
        tr = jnp.stack(
            [rgb[:, y : y + th, x : x + tw] for (y, x) in offsets], 0
        ).reshape(n_tiles * b, th, tw, rgb.shape[-1])
        td = jnp.stack(
            [dte[:, y : y + th, x : x + tw] for (y, x) in offsets], 0
        ).reshape(n_tiles * b, th, tw, dte.shape[-1])
        if flip:
            tr = jnp.concatenate([tr, tr[:, :, ::-1]], 0)
            td = jnp.concatenate([td, td[:, :, ::-1]], 0)
        return tr, td

    @jax.jit
    def accumulate(logits):
        total_rows = logits.shape[0] // (2 if flip else 1)
        b = total_rows // n_tiles
        m = n_tiles * b
        if flip:
            logits = logits[:m] + logits[m:, :, ::-1]
        if logits.shape[1] != th or logits.shape[2] != tw:
            # low-res head logits (upsample_logits=False): ensemble first,
            # upsample once — exact by bilinearity (see fused path)
            logits = resize_bilinear(
                logits.astype(jnp.float32), (th, tw), align_corners=False
            )
        logits = logits.reshape(n_tiles, b, th, tw, num_classes).astype(
            jnp.float32
        )
        if n_tiles == 1:
            # tile == image (the reference default): the overlap-add is a
            # no-op divide-by-one — skip its ~1.2 GB of f32 round-trips
            return logits[0][:, :h, :w]
        total = jnp.zeros((b, h + pad_h, w + pad_w, num_classes), jnp.float32)
        count = jnp.zeros((h + pad_h, w + pad_w, 1), jnp.float32)
        for i, (y, x) in enumerate(offsets):
            total = jax.lax.dynamic_update_slice(
                total,
                jax.lax.dynamic_slice(
                    total, (0, y, x, 0), (b, th, tw, num_classes)
                )
                + logits[i],
                (0, y, x, 0),
            )
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (y, x, 0), (th, tw, 1)) + 1.0,
                (y, x, 0),
            )
        return (total / count[None])[:, :h, :w]

    def predict(rgb, dte):
        tr, td = extract(rgb, dte)
        logits = forward(tr, td)
        return accumulate(logits)

    return predict


def evaluate(
    forward: Callable,
    batches,
    metrics,
    msf: bool = False,
    scales: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
    flip: bool = True,
):
    """Run evaluation over an iterable of (rgb, dte, label) batches."""
    for rgb, dte, label in batches:
        if msf:
            probs = msf_logits(forward, rgb, dte, scales, flip)
        else:
            probs = jax.nn.softmax(forward(rgb, dte).astype(jnp.float32), -1)
        metrics.update(jnp.argmax(probs, -1), label)
    return metrics


def make_spatial_sharded_forward(
    forward: Callable,  # (B, Hl+2*halo, W, C) NHWC-in, NHWC-out, same H
    mesh,
    halo: int,
    axis: str = "space",
) -> Callable:
    """Spatially-sharded whole-image forward over the mesh's ``space`` axis
    (SURVEY.md §5 "space axis for huge images"): the image's H dimension is
    sharded across devices, each shard's strip is padded with ``halo`` rows
    exchanged from its neighbours over ICI (parallel/halo.py ppermute), the
    model runs on the haloed strip, and the halo is cropped off the output.

    Exact equality with the unsharded forward holds at every INTER-SHARD
    boundary when ``halo`` covers the network's receptive-field radius
    (conv stacks, shifted-window attention with bounded shift) — verified
    in tests/test_spatial_shard_eval.py.  The caveat is the image's outer
    top/bottom bands (width ~= depth*window*patch): the outermost rows see
    different boundary conditions than the unsharded model (a cyclically
    shifted window model wrap-masks its global top against its global
    bottom; the strip sees its zero halo instead), and each block widens
    the affected band by one window.  For deeper stacks whose receptive
    field exceeds ``halo``, this is the spatial analogue of sliding-window
    inference with overlap = halo.

    DSCF models (CMNeXt): whole-image equality does NOT hold — DSCF's
    deformable offsets/rpe are predicted in normalized STRIP coordinates
    and its sampling field is global, so no fixed halo covers it (measured
    deviation ~1.5x logit std, tests/test_spatial_shard_cmnext.py).  The
    contract for such models is TILE EQUIVALENCE instead: each strip's
    output exactly equals running the model on that strip's haloed crop —
    the same semantics as the reference's sliding-tile inference
    (val_mm.py:30-62), distributed over chips.  Use whole-image sharding
    for pure-window/conv trunks; treat DSCF spatial sharding as
    distributed tiling.

    ``forward`` must preserve spatial shape (e.g. a logits head upsampled to
    input resolution).  Input H must divide evenly by the axis size.
    """
    from ir_ads_tpu.parallel.halo import spatial_shard_apply

    sharded = spatial_shard_apply(forward, mesh, halo)

    def predict(*mods):
        n = mesh.shape[axis]
        h = mods[0].shape[1]
        assert h % n == 0, (h, n)
        spec = NamedSharding(mesh, P(None, axis))
        mods = tuple(jax.device_put(m, spec) for m in mods)
        if len(mods) == 1:
            return sharded(mods[0])
        # multimodal: stack along channels for one shard_map body
        packed = jnp.concatenate(mods, axis=-1)
        return sharded(packed)

    return predict
