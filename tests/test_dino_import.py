"""DINO checkpoint importer: synthesize a reference-named state_dict with
the right shapes, import, and verify values land in the flax tree."""

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.detection.dino import DINODetector
from ir_ads_tpu.utils.torch_import import import_dino_state_dict
import pytest

pytestmark = pytest.mark.slow  # model-level: compile-dominated


def test_dino_importer_core_paths():
    m = DINODetector(
        num_classes=6, num_queries=10, embed_dim=32,
        num_encoder_layers=1, num_decoder_layers=1, num_levels=3,
        backbone_arch="resnet50", dn_number=0, max_gt=2,
    )
    imgs = jnp.ones((1, 64, 64, 3))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)}, imgs
    )
    p = variables["params"]
    rng = np.random.RandomState(0)

    def t_lin(kernel_tree):  # flax (in, out) -> torch (out, in)
        k = np.asarray(kernel_tree["kernel"])
        return rng.randn(k.shape[1], k.shape[0]).astype(np.float32)

    sd = {}
    # encoder layer 0 msdeform
    enc = p["transformer"]["encoder_0"]["self_attn"]
    for name in ("sampling_offsets", "attention_weights", "value_proj",
                 "output_proj"):
        sd[f"transformer.encoder.layers.0.attentions.0.{name}.weight"] = t_lin(
            enc[name]
        )
        sd[f"transformer.encoder.layers.0.attentions.0.{name}.bias"] = (
            rng.randn(*np.asarray(enc[name]["bias"]).shape).astype(np.float32)
        )
    # encoder norms + ffn
    for i in (0, 1):
        sd[f"transformer.encoder.layers.0.norms.{i}.weight"] = np.ones(32, np.float32)
        sd[f"transformer.encoder.layers.0.norms.{i}.bias"] = np.zeros(32, np.float32)
    ffn = p["transformer"]["encoder_0"]["ffn"]
    sd["transformer.encoder.layers.0.ffns.0.layers.0.0.weight"] = t_lin(ffn["Dense_0"])
    sd["transformer.encoder.layers.0.ffns.0.layers.0.0.bias"] = rng.randn(
        np.asarray(ffn["Dense_0"]["kernel"]).shape[1]
    ).astype(np.float32)
    sd["transformer.encoder.layers.0.ffns.0.layers.1.weight"] = t_lin(ffn["Dense_1"])
    sd["transformer.encoder.layers.0.ffns.0.layers.1.bias"] = rng.randn(32).astype(np.float32)

    # decoder packed-qkv MHA
    sd["transformer.decoder.layers.0.attentions.0.attn.in_proj_weight"] = (
        rng.randn(96, 32).astype(np.float32)
    )
    sd["transformer.decoder.layers.0.attentions.0.attn.in_proj_bias"] = (
        rng.randn(96).astype(np.float32)
    )
    sd["transformer.decoder.layers.0.attentions.0.attn.out_proj.weight"] = (
        rng.randn(32, 32).astype(np.float32)
    )
    sd["transformer.decoder.layers.0.attentions.0.attn.out_proj.bias"] = (
        rng.randn(32).astype(np.float32)
    )
    # shared heads
    ce = p["transformer"]["class_embed_0"]
    sd["class_embed.0.weight"] = t_lin(ce)
    sd["class_embed.0.bias"] = rng.randn(6).astype(np.float32)
    sd["label_enc.weight"] = rng.randn(6, 32).astype(np.float32)

    new_vars, warnings = import_dino_state_dict(sd, variables)
    assert not warnings, warnings[:5]

    # packed qkv split correctly: q rows 0..C
    w = sd["transformer.decoder.layers.0.attentions.0.attn.in_proj_weight"]
    q_kernel = new_vars["params"]["transformer"]["decoder_0"]["self_attn"][
        "q_proj"
    ]["kernel"]
    np.testing.assert_allclose(np.asarray(q_kernel), w[:32].T)
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["label_enc"]), sd["label_enc.weight"]
    )
    # model still runs with imported weights
    out = m.apply(new_vars, imgs, train=False)
    assert bool(jnp.isfinite(out["pred_boxes"]).all())
