"""DINO deformable transformer (two-stage, box-refining, CDN-ready).

Reference: projects/vCLR_deformable_mask/modeling/dino_transformer.py +
detrex/layers/{transformer,attention,position_embedding}.py — re-designed as
ONE flax module that owns the shared class/bbox heads (the reference shares
``decoder.class_embed`` across the decoder layers and the encoder proposal
head via python aliasing; in flax we get the same sharing by defining the
heads once and indexing).

Static-shape discipline: spatial shapes are python tuples; the token count
sum(H*W), the query count, and CDN group sizes are all static — XLA compiles
one program per padded configuration.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.detection.msdeform_attn import MSDeformAttention

Dtype = Any


def inverse_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def get_sine_pos_embed(
    pos: jax.Array, num_pos_feats: int = 128, temperature: int = 10000,
    exchange_xy: bool = True,
) -> jax.Array:
    """detrex position_embedding.get_sine_pos_embed: (..., K) -> (..., K*num_pos_feats)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    def embed(x):
        x = x * scale / dim_t
        return jnp.stack(
            [jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1
        ).reshape(*x.shape[:-1], -1)

    parts = [embed(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 128, temperature: int = 10000,
    offset: float = -0.5, normalize: bool = True,
) -> np.ndarray:
    """2-D sine position embedding for an unpadded (h, w) map — the detrex
    PositionEmbeddingSine with an all-valid mask, as a compile-time constant.
    Returns (h, w, 2*num_pos_feats)."""
    y = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x = np.cumsum(np.ones((h, w), np.float32), axis=1)
    if normalize:
        eps = 1e-6
        y = (y + offset) / (y[-1:, :] + eps) * 2 * math.pi
        x = (x + offset) / (x[:, -1:] + eps) * 2 * math.pi
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * np.floor(dim_t / 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], -1)
    return np.concatenate(
        [pos_y.reshape(h, w, -1), pos_x.reshape(h, w, -1)], axis=-1
    )


class MLP(nn.Module):
    """ReLU MLP (detrex layers/mlp.py)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(
                nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x)
            )
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        name=f"layer{self.num_layers - 1}")(x)


class MultiheadAttention(nn.Module):
    """Standard MHA where query_pos/key_pos are added to q/k only
    (detrex layers/attention.py MultiheadAttention)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query, key=None, value=None, identity=None,
                 query_pos=None, key_pos=None, attn_mask=None,
                 deterministic=True):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None and key.shape == query.shape:
            key_pos = query_pos
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key
        b, lq, c = q.shape
        hd = c // self.num_heads

        def split(t, name):
            t = nn.Dense(c, dtype=self.dtype, name=name)(t)
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, "q_proj"), split(k, "k_proj"), split(value, "v_proj")
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qh * (hd**-0.5), kh,
            preferred_element_type=jnp.float32,
        )
        if attn_mask is not None:
            # True = masked (torch convention)
            attn = jnp.where(attn_mask[None, None], -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        ).astype(vh.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, c)
        out = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
        if self.dropout > 0 and not deterministic:
            out = nn.Dropout(self.dropout)(out, deterministic=False)
        return identity + out


class FFN(nn.Module):
    ffn_dim: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        identity = x
        h = nn.relu(nn.Dense(self.ffn_dim, dtype=self.dtype)(x))
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        return identity + h


class EncoderLayer(nn.Module):
    """self_attn(MSDeform) -> norm -> ffn -> norm."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    num_levels: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, query_pos, reference_points, spatial_shapes,
                 key_padding_mask=None, deterministic=True):
        x = MSDeformAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            num_levels=self.num_levels, dropout=self.dropout,
            dtype=self.dtype, name="self_attn",
        )(x, x, reference_points, spatial_shapes,
          query_pos=query_pos, key_padding_mask=key_padding_mask,
          deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = FFN(self.ffn_dim, self.dropout, dtype=self.dtype, name="ffn")(
            x, deterministic
        )
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x)


class DecoderLayer(nn.Module):
    """self_attn -> norm -> cross_attn(MSDeform) -> norm -> ffn -> norm."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    num_levels: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, memory, query_pos, reference_points, spatial_shapes,
                 attn_mask=None, key_padding_mask=None, deterministic=True):
        x = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout,
            dtype=self.dtype, name="self_attn",
        )(x, query_pos=query_pos, attn_mask=attn_mask,
          deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = MSDeformAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            num_levels=self.num_levels, dropout=self.dropout,
            dtype=self.dtype, name="cross_attn",
        )(x, memory, reference_points, spatial_shapes,
          query_pos=query_pos, key_padding_mask=key_padding_mask,
          deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = FFN(self.ffn_dim, self.dropout, dtype=self.dtype, name="ffn")(
            x, deterministic
        )
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x)


def make_encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]]
) -> np.ndarray:
    """Per-token per-level normalized reference points, all-valid masks
    (reference get_reference_points, dino_transformer.py:321-351)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, axis=0)  # (sum HW, 2)
    n_levels = len(spatial_shapes)
    return np.tile(ref[:, None, :], (1, n_levels, 1))


def make_output_proposals(
    spatial_shapes: Sequence[Tuple[int, int]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Initial proposal boxes per token (gen_encoder_output_proposals,
    dino_transformer.py:283-319) with all-valid masks.  Returns
    (proposals_unsigmoided (sum HW, 4), valid (sum HW,))."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        grid = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        wh = np.full_like(grid, 0.05 * (2.0**lvl))
        props.append(np.concatenate([grid, wh], -1))
    proposals = np.concatenate(props, axis=0)
    valid = ((proposals > 0.01) & (proposals < 0.99)).all(-1)
    logit = np.log(proposals / (1 - proposals))
    logit[~valid] = np.inf
    return logit, valid


def _remat_policy():
    """Checkpoint policy for the remat-scanned enc/dec stacks: save the
    deformable-sampling outputs (checkpoint_name "msdeform_out" in
    MSDeformAttention) so the backward pass skips re-running the sampling
    gathers — ~20 MB/enc layer at 800x1216 traded against the largest
    single slice of the encoder backward scan (dev/logs/r5a_profile.log).
    IR_ADS_DINO_REMAT_SAVE=none restores full recompute."""
    import os

    if os.environ.get("IR_ADS_DINO_REMAT_SAVE", "msdeform") == "msdeform":
        return jax.checkpoint_policies.save_only_these_names("msdeform_out")
    return None


class _EncoderScanStep(nn.Module):
    """nn.scan body: ONE encoder layer per step with stacked params.

    Six python-unrolled encoder layers emit six copies of the (large)
    deformable-attention graph; at DINO production shapes the train-step
    HLO exceeded the remote compile helper (BENCH_r03 dino_note).  Scanning
    over stacked layer params compiles the layer body once.  Static
    call-geometry (spatial shapes, determinism) lives on the module so the
    scanned call signature carries arrays only."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    num_levels: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    dropout: float = 0.0
    deterministic: bool = True
    use_remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, memory, pos_embed, enc_ref):
        layer = EncoderLayer
        if self.use_remat:
            layer = nn.remat(
                EncoderLayer, static_argnums=(4, 6),
                policy=_remat_policy(),
            )
        memory = layer(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            ffn_dim=self.ffn_dim, num_levels=self.num_levels,
            dropout=self.dropout, dtype=self.dtype, name="layer",
        )(memory, pos_embed, enc_ref, self.spatial_shapes, None,
          self.deterministic)
        return memory, None


class _DecoderScanStep(nn.Module):
    """nn.scan body: ONE box-refining decoder layer per step.

    Carries (x, reference); per-layer params (DecoderLayer + its
    bbox_embed/class_embed heads — per-layer in the reference too,
    dino_transformer.py:213-228) are stacked by nn.scan.  The SHARED
    modules (ref_point_head MLP, decoder_norm) arrive as broadcast param
    pytrees and are applied functionally so their weights stay genuinely
    shared (single copy, summed gradients) — stacking them would fork the
    reference's tied weights."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    num_levels: int
    num_classes: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    dropout: float = 0.0
    deterministic: bool = True
    use_remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, carry, memory, attn_mask, rp_params, norm_params):
        x, reference = carry
        c = self.embed_dim
        ref_input = jnp.broadcast_to(
            reference[:, :, None, :],
            reference.shape[:2] + (self.num_levels, 4),
        )
        sine = get_sine_pos_embed(reference, c // 2)
        query_pos = MLP(c, c, 2, dtype=self.dtype).apply(
            {"params": rp_params}, sine
        )
        layer = DecoderLayer
        if self.use_remat:
            layer = nn.remat(
                DecoderLayer, static_argnums=(5, 8),
                policy=_remat_policy(),
            )
        x = layer(
            embed_dim=c, num_heads=self.num_heads, ffn_dim=self.ffn_dim,
            num_levels=self.num_levels, dropout=self.dropout,
            dtype=self.dtype, name="layer",
        )(x, memory, query_pos, ref_input, self.spatial_shapes, attn_mask,
          None, self.deterministic)
        bbox_head = MLP(c, 4, 3, dtype=self.dtype, name="bbox_embed")
        class_head = nn.Dense(
            self.num_classes, dtype=self.dtype, name="class_embed"
        )
        delta = bbox_head(x)
        new_reference = jax.nn.sigmoid(delta + inverse_sigmoid(reference))
        normed = nn.LayerNorm(dtype=self.dtype).apply(
            {"params": norm_params}, x
        )
        pred_box = jax.nn.sigmoid(
            bbox_head(normed) + inverse_sigmoid(reference)
        )
        logits = class_head(normed)
        carry = (x, jax.lax.stop_gradient(new_reference))
        return carry, (normed, new_reference, pred_box, logits)


class DINOTransformer(nn.Module):
    """Encoder + two-stage proposal selection + box-refining decoder.

    Returns a dict:
      hidden_states: (layers, B, Q, C) decoder intermediates (post-norm)
      references: (layers, B, Q, 4) per-layer refined boxes (sigmoided,
        look-forward-twice)
      init_reference: (B, Q, 4)
      enc_class / enc_coord: encoder-stage predictions on top-k proposals
      memory: (B, sum HW, C) encoder output (for mask heads)
    Class/bbox heads are owned here (index L = encoder head), matching the
    reference's shared decoder.class_embed/bbox_embed lists.
    """

    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_levels: int = 4
    num_queries: int = 900
    num_classes: int = 80
    learnt_init_query: bool = True
    dropout: float = 0.0
    use_remat: bool = False
    # scan_layers compiles the encoder stack as ONE lax.scan over stacked
    # layer params (param tree: encoder_scan/layer/... with a leading
    # num_encoder_layers axis) instead of encoder_{i}/... python unrolling.
    # Cuts the HLO ~6x — required for the production-shape train step to
    # fit the remote compile helper.  utils/torch_import stacks per-layer
    # reference checkpoints into this layout (stack_encoder_layers).
    scan_layers: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],  # list of (B, H, W, C) NHWC
        dn_queries: Optional[jax.Array] = None,  # (B, n_dn, C)
        dn_refs: Optional[jax.Array] = None,  # (B, n_dn, 4) unsigmoided
        attn_mask: Optional[jax.Array] = None,  # (Q_total, Q_total) True=mask
        deterministic: bool = True,
    ):
        b = feats[0].shape[0]
        c = self.embed_dim
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in feats)

        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_levels, c),
        )
        tokens, pos = [], []
        for lvl, f in enumerate(feats):
            h, w = f.shape[1], f.shape[2]
            tokens.append(f.reshape(b, h * w, c))
            p = jnp.asarray(
                position_embedding_sine(h, w, c // 2), f.dtype
            ).reshape(1, h * w, c)
            pos.append(p + level_embeds[lvl][None, None].astype(f.dtype))
        memory = jnp.concatenate(tokens, axis=1)
        pos_embed = jnp.concatenate(
            [jnp.broadcast_to(p, (b,) + p.shape[1:]) for p in pos], axis=1
        )

        enc_ref = jnp.asarray(make_encoder_reference_points(spatial_shapes))
        enc_ref = jnp.broadcast_to(enc_ref[None], (b,) + enc_ref.shape)

        enc_layer_cls = EncoderLayer
        dec_layer_cls = DecoderLayer
        if self.use_remat:
            enc_layer_cls = nn.remat(
                EncoderLayer, static_argnums=(4, 6),
                policy=_remat_policy(),
            )
            dec_layer_cls = nn.remat(
                DecoderLayer, static_argnums=(5, 8),
                policy=_remat_policy(),
            )

        if self.scan_layers:
            scan_cls = nn.scan(
                _EncoderScanStep,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_encoder_layers,
            )
            memory, _ = scan_cls(
                embed_dim=c, num_heads=self.num_heads, ffn_dim=self.ffn_dim,
                num_levels=self.num_levels, spatial_shapes=spatial_shapes,
                dropout=self.dropout, deterministic=deterministic,
                use_remat=self.use_remat, dtype=self.dtype,
                name="encoder_scan",
            )(memory, pos_embed, enc_ref)
        else:
            for i in range(self.num_encoder_layers):
                memory = enc_layer_cls(
                    embed_dim=c, num_heads=self.num_heads,
                    ffn_dim=self.ffn_dim, num_levels=self.num_levels,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"encoder_{i}",
                )(memory, pos_embed, enc_ref, spatial_shapes, None,
                  deterministic)

        # shared heads: [0..L-1] decoder layers, [L] encoder stage.  In
        # scan mode the decoder-layer heads live inside decoder_scan
        # (stacked); only the encoder-stage head is created here.
        nl = self.num_decoder_layers
        if self.scan_layers:
            class_heads = {nl: nn.Dense(
                self.num_classes, dtype=self.dtype, name=f"class_embed_{nl}"
            )}
            bbox_heads = {nl: MLP(
                c, 4, 3, dtype=self.dtype, name=f"bbox_embed_{nl}"
            )}
        else:
            class_heads = [
                nn.Dense(
                    self.num_classes, dtype=self.dtype, name=f"class_embed_{i}"
                )
                for i in range(nl + 1)
            ]
            bbox_heads = [
                MLP(c, 4, 3, dtype=self.dtype, name=f"bbox_embed_{i}")
                for i in range(nl + 1)
            ]

        # two-stage proposals
        proposals_np, valid_np = make_output_proposals(spatial_shapes)
        proposals = jnp.asarray(proposals_np)
        valid = jnp.asarray(valid_np)
        output_memory = jnp.where(valid[None, :, None], memory, 0.0)
        output_memory = nn.Dense(c, dtype=self.dtype, name="enc_output")(
            output_memory
        )
        output_memory = nn.LayerNorm(dtype=self.dtype, name="enc_output_norm")(
            output_memory
        )
        enc_class = class_heads[nl](output_memory)  # (B, S, num_classes)
        enc_coord_unact = bbox_heads[nl](output_memory) + proposals[None]

        # top-k proposal selection (invalid tokens have -inf score via
        # proposals=inf -> mask the class scores instead)
        scores = jnp.where(
            valid[None], enc_class.max(-1), -jnp.inf
        )  # (B, S)
        topk_idx = jax.lax.top_k(scores, self.num_queries)[1]  # (B, K)
        topk_coords_unact = jnp.take_along_axis(
            enc_coord_unact, topk_idx[..., None], axis=1
        )
        topk_class = jnp.take_along_axis(enc_class, topk_idx[..., None], axis=1)
        reference = jax.nn.sigmoid(jax.lax.stop_gradient(topk_coords_unact))

        target_unact = jnp.take_along_axis(
            output_memory, topk_idx[..., None], axis=1
        )
        if self.learnt_init_query:
            tgt_embed = self.param(
                "tgt_embed", nn.initializers.xavier_uniform(),
                (self.num_queries, c),
            )
            target = jnp.broadcast_to(
                tgt_embed[None].astype(memory.dtype), (b, self.num_queries, c)
            )
        else:
            target = jax.lax.stop_gradient(target_unact)

        if dn_queries is not None:
            target = jnp.concatenate([dn_queries, target], axis=1)
            reference = jnp.concatenate(
                [jax.nn.sigmoid(dn_refs), reference], axis=1
            )
        init_reference = reference

        ref_point_head = MLP(c, c, 2, dtype=self.dtype, name="ref_point_head")
        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")

        if self.scan_layers:
            # materializing calls so the SHARED params exist under their
            # unrolled names (ref_point_head/decoder_norm); the results
            # feed nothing and XLA dead-code-eliminates them
            _ = ref_point_head(get_sine_pos_embed(reference, c // 2))
            _ = decoder_norm(target)
            rp_params = ref_point_head.variables["params"]
            norm_params = decoder_norm.variables["params"]
            dec_scan_cls = nn.scan(
                _DecoderScanStep,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 4,
                length=self.num_decoder_layers,
            )
            _, (hidden_stack, ref_stack, box_stack, logit_stack) = (
                dec_scan_cls(
                    embed_dim=c, num_heads=self.num_heads,
                    ffn_dim=self.ffn_dim, num_levels=self.num_levels,
                    num_classes=self.num_classes,
                    spatial_shapes=spatial_shapes, dropout=self.dropout,
                    deterministic=deterministic, use_remat=self.use_remat,
                    dtype=self.dtype, name="decoder_scan",
                )((target, reference), memory, attn_mask, rp_params,
                  norm_params)
            )
            return {
                "hidden_states": hidden_stack,
                "references": ref_stack,
                "init_reference": init_reference,
                "enc_class": topk_class,
                "enc_coord": jax.nn.sigmoid(topk_coords_unact),
                "enc_state": target_unact,
                "memory": memory,
                "pred_logits": logit_stack,
                "pred_boxes": box_stack,
                "spatial_shapes": spatial_shapes,
            }

        hidden_states, references, pred_boxes = [], [], []
        x = target
        for i in range(self.num_decoder_layers):
            ref_input = reference[:, :, None, :]  # (B, Q, 1, 4) -> broadcast
            ref_input = jnp.broadcast_to(
                ref_input, reference.shape[:2] + (self.num_levels, 4)
            )
            sine = get_sine_pos_embed(reference, c // 2)
            query_pos = ref_point_head(sine)
            x = dec_layer_cls(
                embed_dim=c, num_heads=self.num_heads, ffn_dim=self.ffn_dim,
                num_levels=self.num_levels, dropout=self.dropout,
                dtype=self.dtype, name=f"decoder_{i}",
            )(x, memory, query_pos, ref_input, spatial_shapes, attn_mask,
              None, deterministic)
            # bbox delta on the raw layer output drives the refinement
            # (dino_transformer.py:213-228); the reported boxes are
            # recomputed from the NORMED state against the incoming
            # reference (dino.py:856-864) — replicate both.
            delta = bbox_heads[i](x)
            new_reference = jax.nn.sigmoid(delta + inverse_sigmoid(reference))
            normed = decoder_norm(x)
            pred_boxes.append(
                jax.nn.sigmoid(bbox_heads[i](normed) + inverse_sigmoid(reference))
            )
            hidden_states.append(normed)
            references.append(new_reference)  # look_forward_twice
            reference = jax.lax.stop_gradient(new_reference)

        return {
            "hidden_states": jnp.stack(hidden_states),
            "references": jnp.stack(references),
            "init_reference": init_reference,
            "enc_class": topk_class,
            "enc_coord": jax.nn.sigmoid(topk_coords_unact),
            "enc_state": target_unact,
            "memory": memory,
            "pred_logits": jnp.stack(
                [class_heads[i](h) for i, h in enumerate(hidden_states)]
            ),
            "pred_boxes": jnp.stack(pred_boxes),
            "spatial_shapes": spatial_shapes,
        }
