"""PyTorch-checkpoint importer: reference IR-ADS state_dict -> our pytree.

Maps the reference CMNeXt state_dict names (semseg/models/cmnext.py +
backbones/swin.py module tree) onto this framework's flax variables, with
the layout transposes torch->flax requires:

  Linear weight (out, in)        -> Dense kernel (in, out)
  Conv2d weight (O, I, kh, kw)   -> Conv kernel (kh, kw, I, O)
  LayerNorm/BN weight/bias       -> scale/bias
  BN running_mean/var            -> batch_stats mean/var

Also handles the raw upstream Swin pretrained checkpoints
(swin_*_patch4_window12_384_22k, mmseg naming) including the reference's
weight surgery (train_mm.py:59-81): RGB-stream patch_embed/norm weights are
copied into extra_patch_embed/extra_norm*, and the relative-position bias
table is bicubically resized on window-size mismatch (swin.py:1396-1418).

Works on plain numpy arrays: load the .pth with torch on host, pass
``{k: v.numpy() for k, v in sd.items()}``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _linear(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _conv(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _norm(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _bn(sd, prefix):
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return params, stats


def _adapter(sd, prefix):
    return {"D_fc1": _linear(sd, prefix + ".D_fc1"), "D_fc2": _linear(sd, prefix + ".D_fc2")}


def _swin_block(sd, prefix):
    """stages.{i}.blocks.{j} -> blocks_{j} subtree."""
    out = {
        "norm1": _norm(sd, prefix + ".norm1"),
        "norm2": _norm(sd, prefix + ".norm2"),
        "attn": {
            "w_msa": {
                "rel_pos_bias_table": sd[
                    prefix + ".attn.w_msa.relative_position_bias_table"
                ],
                "qkv": _linear(sd, prefix + ".attn.w_msa.qkv"),
                "proj": _linear(sd, prefix + ".attn.w_msa.proj"),
            }
        },
        "ffn": {
            "Dense_0": _linear(sd, prefix + ".ffn.layers.0.0"),
            "Dense_1": _linear(sd, prefix + ".ffn.layers.1"),
        },
    }
    if prefix + ".MLP_RGB_Adapter.D_fc1.weight" in sd:
        out["adapter_rgb"] = _adapter(sd, prefix + ".MLP_RGB_Adapter")
        out["adapter_dte"] = _adapter(sd, prefix + ".MLP_DTE_Adapter")
    return out


def _offset_branch(sd, prefix):
    return {
        "dw": _conv(sd, prefix + ".0"),
        "LayerNorm_0": _norm(sd, prefix + ".1.norm"),
        "pw": _conv(sd, prefix + ".3"),
    }


def _dattention(sd, prefix):
    """DeformMPGBlocks.{i}.deform_atten -> deform_atten subtree.

    Returns (params, batch_stats)."""
    fuse_bn_params, fuse_bn_stats = _bn(sd, prefix + ".fuse_q.conv.1")
    params = {
        "conv_offset_x": _offset_branch(sd, prefix + ".conv_offset_x"),
        "conv_offset_y": _offset_branch(sd, prefix + ".conv_offset_y"),
        "fuse_q_conv": _conv(sd, prefix + ".fuse_q.conv.0"),
        "fuse_q_bn": fuse_bn_params,
        "proj_q": _conv(sd, prefix + ".proj_q"),
        "proj_k": _conv(sd, prefix + ".proj_k"),
        "proj_v": _conv(sd, prefix + ".proj_v"),
        "proj_out": _conv(sd, prefix + ".proj_out"),
        "sample_weight_fc1": _conv(sd, prefix + ".get_sample_weight.0"),
        "sample_weight_fc2": _conv(sd, prefix + ".get_sample_weight.2"),
        "rpe_table": sd[prefix + ".rpe_table"],
        "deform_weight": sd[prefix + ".deform_weight"],
        "identity_weight": sd[prefix + ".identity_weight"],
    }
    return params, {"fuse_q_bn": fuse_bn_stats}


def _patch_embed(sd, prefix):
    out = {"proj": _conv(sd, prefix + ".projection")}
    if prefix + ".norm.weight" in sd:
        out["norm"] = _norm(sd, prefix + ".norm")
    return out


def _segformer_head(sd, prefix, num_levels=4):
    bn_params, bn_stats = _bn(sd, prefix + ".linear_fuse.bn")
    params = {
        "linear_fuse": {
            "kernel": sd[prefix + ".linear_fuse.conv.weight"].transpose(2, 3, 1, 0)
        },
        "fuse_bn": bn_params,
        "linear_pred": _conv(sd, prefix + ".linear_pred"),
    }
    for k in range(1, num_levels + 1):
        params[f"linear_c{k}"] = _linear(sd, f"{prefix}.linear_c{k}.proj")
    return params, {"fuse_bn": bn_stats}


def _resize_bias_table(table: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic-resize a ((2w-1)^2, heads) bias table to a new window size
    (reference swin.py:1396-1418)."""
    l1, nh = table.shape
    s1 = int(round(l1**0.5))
    s2 = int(round(target_len**0.5))
    if s1 * s1 != l1 or s2 * s2 != target_len:
        raise ValueError(f"non-square bias table {l1} -> {target_len}")
    import jax.image

    img = table.reshape(s1, s1, nh)
    out = jax.image.resize(img.astype(np.float32), (s2, s2, nh), method="bicubic")
    return np.asarray(out).reshape(target_len, nh)


def import_cmnext_state_dict(
    sd: Dict[str, np.ndarray], variables: Any
) -> Tuple[Any, List[str]]:
    """Import a full IR-ADS CMNeXt state_dict into our variables.

    Returns (new_variables, warnings).  Missing reference keys leave our
    initialization in place (matching load_state_dict(strict=False)).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    warnings: List[str] = []

    def _flat(sub, trail=()):
        if isinstance(sub, dict):
            for k, v in sub.items():
                yield from _flat(v, trail + (k,))
        else:
            yield trail, sub

    def assign(tree, path, sub):
        """Overwrite leaves under tree[path] with sub's (possibly nested) leaves."""
        for trail, leaf in _flat(sub):
            full = list(path) + list(trail)
            node = tree
            ok = True
            for p in full[:-1]:
                if p not in node:
                    warnings.append(f"no param {'/'.join(full)}")
                    ok = False
                    break
                node = node[p]
            if not ok:
                continue
            key = full[-1]
            if key not in node:
                warnings.append(f"no param {'/'.join(full)}")
            elif node[key].shape != leaf.shape:
                warnings.append(
                    f"shape mismatch {'/'.join(full)}: {node[key].shape} vs {leaf.shape}"
                )
            else:
                node[key] = leaf.astype(node[key].dtype)

    bb = "backbone"
    has_backbone_prefix = any(k.startswith("backbone.") for k in sd)
    pre = "backbone." if has_backbone_prefix else ""

    # patch embeds
    for name in ("patch_embed", "extra_patch_embed"):
        if f"{pre}{name}.projection.weight" in sd:
            assign(params, [bb, name], _patch_embed(sd, pre + name))

    # stages
    stage_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(re.escape(pre) + r"stages\.(\d+)\.", k))
        }
    )
    for i in stage_ids:
        block_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(re.escape(pre) + rf"stages\.{i}\.blocks\.(\d+)\.", k))
            }
        )
        stage_params = params.get(bb, {}).get(f"stages_{i}", {})
        if "pairs" in stage_params:
            # scanned stage: stack per-block torch weights along axis 0
            # (pair index); even blocks -> block0, odd -> block1
            blocks = [
                _swin_block(sd, f"{pre}stages.{i}.blocks.{j}")
                for j in block_ids
            ]
            for slot, parity in (("block0", 0), ("block1", 1)):
                group = [blocks[j] for j in block_ids if j % 2 == parity]
                stacked = jax.tree.map(lambda *xs: np.stack(xs, 0), *group)
                assign(params, [bb, f"stages_{i}", "pairs", slot], stacked)
        else:
            for j in block_ids:
                assign(
                    params,
                    [bb, f"stages_{i}", f"blocks_{j}"],
                    _swin_block(sd, f"{pre}stages.{i}.blocks.{j}"),
                )
        if f"{pre}stages.{i}.downsample.reduction.weight" in sd:
            assign(
                params,
                [bb, f"stages_{i}", "downsample"],
                {
                    "norm": _norm(sd, f"{pre}stages.{i}.downsample.norm"),
                    "reduction": {
                        "kernel": sd[f"{pre}stages.{i}.downsample.reduction.weight"].T
                    },
                },
            )

    # output norms
    for i in range(4):
        for name in (f"norm{i}", f"extra_norm{i}", f"fuse_norm{i}"):
            if f"{pre}{name}.weight" in sd:
                assign(params, [bb, name], _norm(sd, pre + name))

    # MPG blocks
    for i in range(4):
        p = f"{pre}MPGBlocks.{i}"
        if f"{p}.D_fc1.weight" not in sd:
            continue
        assign(
            params,
            [bb, f"mpg_{i}"],
            {
                "D_fc1": _linear(sd, p + ".D_fc1"),
                "D_fc2": _linear(sd, p + ".D_fc2"),
                "P_fc2": _linear(sd, p + ".P_fc2"),
                "U_fc1": _linear(sd, p + ".U_fc1"),
                "tfts_gamma_rgb": sd[p + ".tfts_gamma_rgb"],
                "tfts_beta_rgb": sd[p + ".tfts_beta_rgb"],
                "tfts_gamma_dte": sd[p + ".tfts_gamma_dte"],
                "tfts_beta_dte": sd[p + ".tfts_beta_dte"],
            },
        )

    # DSCF blocks
    for i in range(4):
        p = f"{pre}DeformMPGBlocks.{i}"
        if f"{p}.D_fc1.weight" not in sd:
            continue
        da_params, da_stats = _dattention(sd, p + ".deform_atten")
        assign(
            params,
            [bb, f"deform_mpg_{i}"],
            {
                "D_fc1": _linear(sd, p + ".D_fc1"),
                "D_fc2": _linear(sd, p + ".D_fc2"),
                "U_fc1": _linear(sd, p + ".U_fc1"),
                "deform_atten": da_params,
            },
        )
        assign(stats, [bb, f"deform_mpg_{i}", "deform_atten"], da_stats)

    # decode heads
    for head in ("decode_head", "decode_head_rgb", "decode_head_dte"):
        if f"{head}.linear_pred.weight" in sd:
            h_params, h_stats = _segformer_head(sd, head)
            assign(params, [head], h_params)
            assign(stats, [head], h_stats)

    return {"params": params, "batch_stats": stats}, warnings


def import_pretrained_swin(
    sd: Dict[str, np.ndarray], variables: Any, window_size: int = 12
) -> Tuple[Any, List[str]]:
    """Import an upstream (mmseg-format) Swin checkpoint into the backbone,
    applying the reference's weight surgery: RGB weights duplicated into the
    extra (DTE) stream and output norms (train_mm.py:59-81)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # strip backbone./module. prefixes (reference swin.py:1374-1383)
    sd = {
        (k[9:] if k.startswith("backbone.") else k): v for k, v in sd.items()
    }
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}

    # resize relative-position bias tables to our window size
    target_len = (2 * window_size - 1) ** 2
    for k in list(sd):
        if "relative_position_bias_table" in k and sd[k].shape[0] != target_len:
            sd[k] = _resize_bias_table(sd[k], target_len)

    # weight surgery: duplicate rgb stream -> extra stream
    extra = {}
    for k, v in sd.items():
        if k.startswith("patch_embed."):
            extra["extra_" + k] = v
        if re.match(r"norm\d+\.", k) or k.startswith("norm."):
            extra["extra_" + k] = v
    sd.update(extra)
    sd = {"backbone." + k: v for k, v in sd.items()}
    return import_cmnext_state_dict(sd, variables)


def _msdeform(sd, prefix):
    """detrex MultiScaleDeformableAttention -> MSDeformAttention subtree."""
    return {
        "sampling_offsets": _linear(sd, prefix + ".sampling_offsets"),
        "attention_weights": _linear(sd, prefix + ".attention_weights"),
        "value_proj": _linear(sd, prefix + ".value_proj"),
        "output_proj": _linear(sd, prefix + ".output_proj"),
    }


def _torch_mha(sd, prefix):
    """torch nn.MultiheadAttention (in_proj packed qkv) -> our MHA."""
    w = sd[prefix + ".attn.in_proj_weight"]  # (3C, C)
    b = sd[prefix + ".attn.in_proj_bias"]
    c = w.shape[1]
    return {
        "q_proj": {"kernel": np.ascontiguousarray(w[:c].T), "bias": b[:c]},
        "k_proj": {"kernel": np.ascontiguousarray(w[c : 2 * c].T),
                   "bias": b[c : 2 * c]},
        "v_proj": {"kernel": np.ascontiguousarray(w[2 * c :].T),
                   "bias": b[2 * c :]},
        "out_proj": _linear(sd, prefix + ".attn.out_proj"),
    }


def _mlp3(sd, prefix, n=3):
    return {
        f"layer{i}": _linear(sd, f"{prefix}.layers.{i}") for i in range(n)
    }


def import_dino_state_dict(
    sd: Dict[str, np.ndarray], variables: Any
) -> Tuple[Any, List[str]]:
    """Import a reference vCLR-DINO state_dict (projects/.../modeling/dino.py
    module tree over detrex layers) into DINODetector variables.

    Mapped: d2-R50 backbone, ChannelMapper neck, encoder/decoder layers
    (MSDeformAttn + packed-qkv MHA + FFN + norms), shared class/bbox heads,
    tgt/label embeddings, enc_output, ref_point_head, mask/ROI embeds, and
    the fused-FPN seg mapping convs.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    warnings: List[str] = []

    def _flat(sub, trail=()):
        if isinstance(sub, dict):
            for k, v in sub.items():
                yield from _flat(v, trail + (k,))
        else:
            yield trail, sub

    def assign(tree, path, sub):
        for trail, leaf in _flat(sub):
            full = list(path) + list(trail)
            node = tree
            ok = True
            for p in full[:-1]:
                if p not in node:
                    warnings.append(f"no param {'/'.join(map(str, full))}")
                    ok = False
                    break
                node = node[p]
            if not ok:
                continue
            key = full[-1]
            if key not in node:
                warnings.append(f"no param {'/'.join(map(str, full))}")
            elif node[key].shape != leaf.shape:
                warnings.append(
                    f"shape mismatch {'/'.join(map(str, full))}: "
                    f"{node[key].shape} vs {leaf.shape}"
                )
            else:
                node[key] = leaf.astype(node[key].dtype)

    def d2_conv_norm(prefix):
        """d2 Conv2d with fused FrozenBN (.norm.*) -> conv + BNorm stats."""
        p = {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0)}
        bn_p = {"scale": sd[prefix + ".norm.weight"],
                "bias": sd[prefix + ".norm.bias"]}
        bn_s = {"mean": sd[prefix + ".norm.running_mean"],
                "var": sd[prefix + ".norm.running_var"]}
        return p, bn_p, bn_s

    # --- d2 ResNet-50 backbone (stem + res2..5 bottlenecks)
    if "backbone.stem.conv1.weight" in sd:
        p, bnp, bns = d2_conv_norm("backbone.stem.conv1")
        assign(params, ["backbone", "stem_conv"], p)
        assign(params, ["backbone", "stem_bn", "BatchNorm_0"], bnp)
        assign(stats, ["backbone", "stem_bn", "BatchNorm_0"], bns)
        layer_sizes = {2: 3, 3: 4, 4: 6, 5: 3}
        for res, n_blocks in layer_sizes.items():
            for j in range(n_blocks):
                base = f"backbone.res{res}.{j}"
                if base + ".conv1.weight" not in sd:
                    continue
                tgt = ["backbone", f"layer{res - 1}_{j}"]
                for ci in (1, 2, 3):
                    p, bnp, bns = d2_conv_norm(f"{base}.conv{ci}")
                    assign(params, tgt + [f"conv{ci}"], p)
                    assign(params, tgt + [f"bn{ci}", "BatchNorm_0"], bnp)
                    assign(stats, tgt + [f"bn{ci}", "BatchNorm_0"], bns)
                if f"{base}.shortcut.weight" in sd:
                    p, bnp, bns = d2_conv_norm(f"{base}.shortcut")
                    assign(params, tgt + ["downsample_conv"], p)
                    assign(params, tgt + ["downsample_bn", "BatchNorm_0"], bnp)
                    assign(stats, tgt + ["downsample_bn", "BatchNorm_0"], bns)

    # --- neck (ChannelMapper: convs.{i}.conv/gn, extra_convs.{i})
    for i in range(8):
        if f"neck.convs.{i}.conv.weight" in sd:
            assign(params, ["neck", f"conv_{i}"],
                   _conv(sd, f"neck.convs.{i}.conv"))
            assign(params, ["neck", f"gn_{i}"], _norm(sd, f"neck.convs.{i}.gn"))
        if f"neck.extra_convs.{i}.conv.weight" in sd:
            # extra convs continue the level index after the mapped ones
            n_base = len([k for k in sd if k.startswith("neck.convs.")
                          and k.endswith(".conv.weight")])
            assign(params, ["neck", f"extra_conv_{n_base + i}"],
                   _conv(sd, f"neck.extra_convs.{i}.conv"))
            assign(params, ["neck", f"extra_gn_{n_base + i}"],
                   _norm(sd, f"neck.extra_convs.{i}.gn"))

    tr = "transformer"
    if f"{tr}.level_embeds" in sd:
        assign(params, [tr, "level_embeds"], sd[f"{tr}.level_embeds"])
    if f"{tr}.tgt_embed.weight" in sd:
        assign(params, [tr, "tgt_embed"], sd[f"{tr}.tgt_embed.weight"])
    if f"{tr}.enc_output.weight" in sd:
        assign(params, [tr, "enc_output"], _linear(sd, f"{tr}.enc_output"))
        assign(params, [tr, "enc_output_norm"],
               _norm(sd, f"{tr}.enc_output_norm"))
    if "label_enc.weight" in sd:
        assign(params, ["label_enc"], sd["label_enc.weight"])

    # encoder layers: attentions.0 = MSDeformAttn; norms.{0,1}; ffns.0
    for i in range(12):
        base = f"{tr}.encoder.layers.{i}"
        if f"{base}.attentions.0.sampling_offsets.weight" not in sd:
            continue
        assign(params, [tr, f"encoder_{i}", "self_attn"],
               _msdeform(sd, f"{base}.attentions.0"))
        assign(params, [tr, f"encoder_{i}", "norm1"],
               _norm(sd, f"{base}.norms.0"))
        assign(params, [tr, f"encoder_{i}", "norm2"],
               _norm(sd, f"{base}.norms.1"))
        assign(params, [tr, f"encoder_{i}", "ffn"], {
            "Dense_0": _linear(sd, f"{base}.ffns.0.layers.0.0"),
            "Dense_1": _linear(sd, f"{base}.ffns.0.layers.1"),
        })

    # decoder layers: attentions.0 = MHA self-attn, attentions.1 = MSDeform
    for i in range(12):
        base = f"{tr}.decoder.layers.{i}"
        if f"{base}.attentions.0.attn.in_proj_weight" in sd:
            assign(params, [tr, f"decoder_{i}", "self_attn"],
                   _torch_mha(sd, f"{base}.attentions.0"))
        if f"{base}.attentions.1.sampling_offsets.weight" in sd:
            assign(params, [tr, f"decoder_{i}", "cross_attn"],
                   _msdeform(sd, f"{base}.attentions.1"))
        for k in range(3):
            if f"{base}.norms.{k}.weight" in sd:
                assign(params, [tr, f"decoder_{i}", f"norm{k + 1}"],
                       _norm(sd, f"{base}.norms.{k}"))
        if f"{base}.ffns.0.layers.0.0.weight" in sd:
            assign(params, [tr, f"decoder_{i}", "ffn"], {
                "Dense_0": _linear(sd, f"{base}.ffns.0.layers.0.0"),
                "Dense_1": _linear(sd, f"{base}.ffns.0.layers.1"),
            })

    if f"{tr}.decoder.ref_point_head.layers.0.weight" in sd:
        assign(params, [tr, "ref_point_head"],
               _mlp3(sd, f"{tr}.decoder.ref_point_head", 2))
    if f"{tr}.decoder.norm.weight" in sd:
        assign(params, [tr, "decoder_norm"], _norm(sd, f"{tr}.decoder.norm"))

    # shared heads (class_embed/bbox_embed ModuleLists, dino.py:218-231)
    for i in range(8):
        if f"class_embed.{i}.weight" in sd:
            assign(params, [tr, f"class_embed_{i}"],
                   _linear(sd, f"class_embed.{i}"))
        if f"bbox_embed.{i}.layers.0.weight" in sd:
            assign(params, [tr, f"bbox_embed_{i}"],
                   _mlp3(sd, f"bbox_embed.{i}", 3))
        if f"mask_embed.{i}.layers.0.weight" in sd:
            assign(params, [f"mask_embed_{i}"], _mlp3(sd, f"mask_embed.{i}", 3))
        if f"ROI_embed.{i}.0.layers.0.weight" in sd:
            assign(params, [f"roi_embed_{i}"],
                   _mlp3(sd, f"ROI_embed.{i}.0", 3))

    # fused-FPN seg mapping (dino.py:256-262)
    if "mapping_fpn_features_for_seg.0.weight" in sd:
        assign(params, ["seg_map_conv1"],
               _conv(sd, "mapping_fpn_features_for_seg.0"))
        bn_p, bn_s = _bn(sd, "mapping_fpn_features_for_seg.1")
        assign(params, ["seg_map_bn"], bn_p)
        assign(stats, ["seg_map_bn"], bn_s)
        assign(params, ["seg_map_conv2"],
               _conv(sd, "mapping_fpn_features_for_seg.3"))
        assign(params, ["seg_post_ln"], _norm(sd, "post_layernorm"))

    return {"params": params, "batch_stats": stats}, warnings


def stack_encoder_layers(tr_params: dict) -> dict:
    """Convert a DINOTransformer param tree from the unrolled
    ``encoder_{i}/...`` layout to the scanned ``encoder_scan/layer/...``
    layout (DINOTransformer.scan_layers=True): every leaf gains a leading
    num_encoder_layers axis, stacked in layer order.

    Works on the ``transformer`` subtree of either an imported reference
    checkpoint or a flax-initialized unrolled model.  Returns a NEW dict;
    the input is not mutated.
    """
    import jax

    out = {k: v for k, v in tr_params.items()
           if not k.startswith("encoder_") or k == "encoder_scan"}
    names = sorted(
        (k for k in tr_params if k.startswith("encoder_")
         and k != "encoder_scan" and k.split("_")[-1].isdigit()),
        key=lambda k: int(k.split("_")[-1]),
    )
    if not names:
        return out
    layers = [tr_params[k] for k in names]
    out["encoder_scan"] = {
        "layer": jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)
    }
    return out


def unstack_encoder_layers(tr_params: dict) -> dict:
    """Inverse of :func:`stack_encoder_layers`."""
    import jax

    if "encoder_scan" not in tr_params:
        return dict(tr_params)
    out = {k: v for k, v in tr_params.items() if k != "encoder_scan"}
    stacked = tr_params["encoder_scan"]["layer"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"encoder_{i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x[i]), stacked
        )
    return out


def stack_decoder_layers(tr_params: dict) -> dict:
    """Convert a DINOTransformer param tree from the unrolled
    ``decoder_{i}`` / ``bbox_embed_{i}`` / ``class_embed_{i}`` layout to
    the scanned ``decoder_scan/{layer,bbox_embed,class_embed}`` layout
    (DINOTransformer.scan_layers=True): per-layer leaves gain a leading
    num_decoder_layers axis.  The encoder-stage heads
    (``{bbox,class}_embed_{L}``) stay top-level; the SHARED
    ``ref_point_head``/``decoder_norm`` stay single-copy (the scan step
    consumes them as broadcast arguments).  Returns a NEW dict.
    """
    import jax

    dec = sorted(
        (k for k in tr_params if k.startswith("decoder_")
         and k != "decoder_scan" and k != "decoder_norm"
         and k.split("_")[-1].isdigit()),
        key=lambda k: int(k.split("_")[-1]),
    )
    if not dec:
        return dict(tr_params)
    n = len(dec)
    stacked_names = set(dec)
    stacked_names |= {f"bbox_embed_{i}" for i in range(n)}
    stacked_names |= {f"class_embed_{i}" for i in range(n)}
    out = {k: v for k, v in tr_params.items() if k not in stacked_names}
    out["decoder_scan"] = {
        "layer": jax.tree.map(
            lambda *xs: np.stack(xs, axis=0), *(tr_params[k] for k in dec)
        ),
        "bbox_embed": jax.tree.map(
            lambda *xs: np.stack(xs, axis=0),
            *(tr_params[f"bbox_embed_{i}"] for i in range(n)),
        ),
        "class_embed": jax.tree.map(
            lambda *xs: np.stack(xs, axis=0),
            *(tr_params[f"class_embed_{i}"] for i in range(n)),
        ),
    }
    return out


def unstack_decoder_layers(tr_params: dict) -> dict:
    """Inverse of :func:`stack_decoder_layers`."""
    import jax

    if "decoder_scan" not in tr_params:
        return dict(tr_params)
    out = {k: v for k, v in tr_params.items() if k != "decoder_scan"}
    sc = tr_params["decoder_scan"]
    n = jax.tree.leaves(sc["layer"])[0].shape[0]
    for i in range(n):
        out[f"decoder_{i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x[i]), sc["layer"]
        )
        out[f"bbox_embed_{i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x[i]), sc["bbox_embed"]
        )
        out[f"class_embed_{i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x[i]), sc["class_embed"]
        )
    return out


def stack_transformer_layers(tr_params: dict) -> dict:
    """stack_encoder_layers + stack_decoder_layers in one call — the full
    scan_layers=True layout."""
    return stack_decoder_layers(stack_encoder_layers(tr_params))
