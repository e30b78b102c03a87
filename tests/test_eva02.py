"""EVA-02 ViT backbone (reference detrex/modeling/backbone/eva_02.py +
eva_02_utils.py): rope math vs an independent numpy oracle + trunk shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.models.backbones.alt_backbones import (
    EVA02Attention,
    EVA02ViT,
    SwiGLU,
    _apply_rope,
    _rope_freqs,
    _rotate_half,
)


def test_rotate_half_pairs():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    got = _rotate_half(x)
    np.testing.assert_allclose(np.asarray(got), [-2.0, 1.0, -4.0, 3.0])


def test_rope_norm_preserving():
    """Rotary embedding is a rotation: per-pair L2 norms are preserved."""
    cos, sin = _rope_freqs(head_dim=8, seq_len=4, pt_seq_len=16)
    assert cos.shape == (16, 8)
    t = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 8))
    out = _apply_rope(t, cos, sin)
    n_in = np.asarray((t.reshape(1, 2, 16, 4, 2) ** 2).sum(-1))
    n_out = np.asarray((out.reshape(1, 2, 16, 4, 2) ** 2).sum(-1))
    np.testing.assert_allclose(n_out, n_in, rtol=1e-5)


def test_rope_matches_reference_formula():
    """freqs built exactly as VisionRotaryEmbeddingFast
    (eva_02_utils.py:309-351): per-axis lang freqs, t = arange/ft*pt,
    interleaved repeat, y/x broadcast-concat."""
    head_dim, seq, pt = 8, 3, 16
    cos, sin = _rope_freqs(head_dim, seq, pt)
    dim = head_dim // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(seq) / seq * pt
    f = np.einsum("i,j->ij", t, freqs)
    f = np.repeat(f, 2, -1)
    full = np.concatenate(
        [
            np.broadcast_to(f[:, None], (seq, seq, dim)),
            np.broadcast_to(f[None, :], (seq, seq, dim)),
        ],
        -1,
    ).reshape(seq * seq, head_dim)
    np.testing.assert_allclose(np.asarray(cos), np.cos(full), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.sin(full), rtol=1e-6)


def test_swiglu_shapes_and_subln():
    m = SwiGLU(hidden=16)
    x = jnp.zeros((2, 5, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (2, 5, 8)
    assert "ffn_ln" in v["params"]


def test_eva02_attention_shapes():
    attn = EVA02Attention(dim=16, num_heads=2)
    x = jnp.zeros((1, 4, 4, 16))
    rope = _rope_freqs(8, 4)
    v = attn.init(jax.random.PRNGKey(0), x, rope)
    assert attn.apply(v, x, rope).shape == (1, 4, 4, 16)
    # k projection is bias-free (eva_02.py:86), q/v carry biases
    assert "bias" not in v["params"]["k_proj"]
    assert "bias" in v["params"]["q_proj"]


def test_eva02_trunk_forward():
    model = EVA02ViT(
        img_size=64, patch_size=16, dim=32, depth=2, num_heads=2,
        window_size=2, global_indexes=(1,), pt_hw_seq_len=4,
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["last_feat"].shape == (1, 4, 4, 32)
    # SwiGLU + separate qkv params present
    assert "w1" in v["params"]["mlp_0"]
    assert "k_proj" in v["params"]["attn_0"]
