"""v4 fused attention half-block (ops/pallas_swin.py pallas_window_block):
kernel == XLA twin == the unfused module path, including pad+shift cases."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.pallas_swin import (
    _block_reference,
    fused_window_block,
    pallas_window_block,
)
from ir_ads_tpu.ops.pallas_swin import shift_region_ids


def _params(key, c, heads, ws):
    ks = jax.random.split(key, 8)
    r = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.05  # noqa
    n = ws * ws
    return dict(
        ln_scale=1.0 + r(ks[0], c),
        ln_bias=r(ks[1], c),
        wqkv=r(ks[2], c, 3 * c),
        bqkv=r(ks[3], 3 * c),
        wproj=r(ks[4], c, c),
        bproj=r(ks[5], c),
        bias=r(ks[6], heads, n, n),
    )


ORDER = ("ln_scale", "ln_bias", "wqkv", "bqkv", "wproj", "bproj", "bias")


@pytest.mark.parametrize("shift", [0, 2])
def test_kernel_matches_reference(shift):
    ws, c, heads = 4, 32, 2
    b, hp, wp = 2, 8, 12
    key = jax.random.PRNGKey(0)
    p = _params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, hp, wp, c), jnp.float32)
    region = (
        jnp.asarray(shift_region_ids(hp, wp, ws, shift)) if shift else None
    )
    args = [p[k] for k in ORDER]
    got = pallas_window_block(
        x, *args, region, (c // heads) ** -0.5, heads, ws,
        shift=shift, interpret=True,
    )
    want = _block_reference(
        x, *args, region, (c // heads) ** -0.5, heads, ws, shift=shift
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_kernel_pad_zeroing_matches_reference():
    """h_real/w_real < padded dims: the in-kernel LN-output zeroing must
    match the twin's mask (which matches the module path's LN-before-pad)."""
    ws, c, heads = 4, 32, 2
    b, h_real, w_real = 2, 7, 10
    hp = ((h_real + ws - 1) // ws) * ws  # 8
    wp = ((w_real + ws - 1) // ws) * ws  # 12
    shift = 2
    key = jax.random.PRNGKey(2)
    p = _params(key, c, heads, ws)
    x = jax.random.normal(
        jax.random.PRNGKey(3), (b, h_real, w_real, c), jnp.float32
    )
    xm = jnp.pad(x, ((0, 0), (0, hp - h_real), (0, wp - w_real), (0, 0)))
    xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
    args = [p[k] for k in ORDER]
    got = pallas_window_block(
        xm, *args, region, (c // heads) ** -0.5, heads, ws,
        h_real=h_real, w_real=w_real, shift=shift, interpret=True,
    )
    want = _block_reference(
        xm, *args, region, (c // heads) ** -0.5, heads, ws,
        h_real=h_real, w_real=w_real, shift=shift,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "h,w,shifted", [(8, 8, False), (8, 8, True), (7, 10, True)]
)
def test_fused_path_matches_module_path(h, w, shifted):
    """SwinBlockAdapter with IR_ADS_SWIN_ATTN=pallas4 (interpret) == the
    unfused xla path, same params — incl. pad (7x10 -> 8x12) + shift."""
    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    blk = SwinBlockAdapter(
        dim=32, num_heads=2, ffn_dim=128, window_size=4, shift=shifted,
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (2, h, w, 32), jnp.float32)
    old_attn = os.environ.get("IR_ADS_SWIN_ATTN")
    old_ffn = os.environ.get("IR_ADS_FFN")
    try:
        os.environ["IR_ADS_SWIN_ATTN"] = "xla"
        os.environ["IR_ADS_FFN"] = "xla"
        v = blk.init({"params": jax.random.PRNGKey(5)}, x, "rgb", True)
        out_xla = blk.apply(v, x, "rgb", True)
        os.environ["IR_ADS_SWIN_ATTN"] = "pallas4"
        os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
        out_fused = blk.apply(v, x, "rgb", True)
    finally:
        for k, old in (
            ("IR_ADS_SWIN_ATTN", old_attn),
            ("IR_ADS_FFN", old_ffn),
        ):
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=5e-5, rtol=1e-5
    )


def test_param_tree_identical_between_paths():
    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    blk = SwinBlockAdapter(
        dim=32, num_heads=2, ffn_dim=128, window_size=4, shift=True,
    )
    x = jnp.zeros((2, 8, 8, 32), jnp.float32)
    old = os.environ.get("IR_ADS_SWIN_ATTN")
    try:
        os.environ["IR_ADS_SWIN_ATTN"] = "xla"
        v_xla = blk.init({"params": jax.random.PRNGKey(0)}, x, "dte", True)
        os.environ["IR_ADS_SWIN_ATTN"] = "pallas4"
        os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
        v_fused = blk.init({"params": jax.random.PRNGKey(0)}, x, "dte", True)
    finally:
        if old is None:
            os.environ.pop("IR_ADS_SWIN_ATTN", None)
        else:
            os.environ["IR_ADS_SWIN_ATTN"] = old
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
    assert jax.tree_util.tree_structure(v_xla) == jax.tree_util.tree_structure(
        v_fused
    )
    key = lambda pa: jax.tree_util.keystr(pa[0])  # noqa: E731
    for (p1, a1), (p2, a2) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(v_xla["params"]), key=key),
        sorted(
            jax.tree_util.tree_leaves_with_path(v_fused["params"]), key=key
        ),
    ):
        assert p1 == p2
        assert a1.shape == a2.shape
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_gradients_flow_through_custom_vjp():
    os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
    try:
        ws, c, heads = 4, 32, 2
        p = _params(jax.random.PRNGKey(6), c, heads, ws)
        x = jax.random.normal(
            jax.random.PRNGKey(7), (2, 8, 8, c), jnp.float32
        )
        region = jnp.asarray(shift_region_ids(8, 8, ws, 2))
        scale = (c // heads) ** -0.5

        def loss_fused(x, p):
            args = [p[k] for k in ORDER]
            return jnp.sum(
                fused_window_block(
                    x, *args, region, scale, heads, ws, 8, 8, 2
                )
                ** 2
            )

        def loss_ref(x, p):
            args = [p[k] for k in ORDER]
            return jnp.sum(
                _block_reference(
                    x, *args, region, scale, heads, ws, shift=2
                )
                ** 2
            )

        gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
        gx2, gp2 = jax.grad(loss_ref, argnums=(0, 1))(x, p)
        np.testing.assert_allclose(
            np.asarray(gx1), np.asarray(gx2), atol=1e-4
        )
        for k in gp1:
            np.testing.assert_allclose(
                np.asarray(gp1[k]), np.asarray(gp2[k]), atol=1e-4, err_msg=k
            )
    finally:
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)


@pytest.mark.parametrize("fusednorm", ["0", "1", "2"])
@pytest.mark.parametrize("heads,c", [(4, 128), (8, 256)])
def test_packed_heads_matches_per_head(heads, c, fusednorm, monkeypatch):
    """d = C/heads = 32 -> the block-diagonal 4-heads-per-dot packing path
    (_heads_attention packed=True).

    fusednorm=0 (legacy): must be bitwise the per-head loop — the packed QK
    dot only adds exact-zero products to the f32 accumulator.
    fusednorm=1 (round-4 default): the PV dot consumes UNNORMALIZED exp
    scores and the softmax divide fuses into the per-head output extract,
    so normalization rounds in a different order — f32-tolerance only."""
    ws = 4
    key = jax.random.PRNGKey(11)
    p = _params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 8, 8, c), jnp.float32)
    region = jnp.asarray(shift_region_ids(8, 8, ws, 2))
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5

    monkeypatch.setenv("IR_ADS_V6_FUSEDNORM", fusednorm)
    monkeypatch.setenv("IR_ADS_SWIN_PACKED", "0")
    base = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    monkeypatch.setenv("IR_ADS_SWIN_PACKED", "1")
    packed = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    if fusednorm == "0":
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(base), rtol=0, atol=0
        )
    else:
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(base), rtol=1e-5, atol=1e-5
        )
    ref = _block_reference(x, *args, region, scale, heads, ws, shift=2)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("heads,c", [(4, 128), (16, 512)])
@pytest.mark.slow  # opt-in wide layout (PACKED=2, measured a wash)
def test_wide_packed_heads_matches_per_head(heads, c, monkeypatch):
    """IR_ADS_SWIN_PACKED=2: head-minor "wide" score layout (heads packed
    into the score LANES via block-diagonal K/V).  Not bitwise vs the
    per-head loop (global-row-max softmax + post-PV normalization round in
    a different order) but must agree to f32 rounding."""
    ws = 4
    key = jax.random.PRNGKey(21)
    p = _params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(22), (2, 8, 8, c), jnp.float32)
    region = jnp.asarray(shift_region_ids(8, 8, ws, 2))
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5

    monkeypatch.setenv("IR_ADS_SWIN_PACKED", "0")
    base = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    monkeypatch.setenv("IR_ADS_SWIN_PACKED", "2")
    wide = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(wide), np.asarray(base), rtol=1e-5, atol=1e-4
    )
    ref = _block_reference(x, *args, region, scale, heads, ws, shift=2)
    np.testing.assert_allclose(
        np.asarray(wide), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_wide_packed_no_shift(monkeypatch):
    """Wide layout on the unshifted path (region all zeros)."""
    ws, c, heads = 4, 128, 4
    key = jax.random.PRNGKey(23)
    p = _params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(24), (2, 8, 8, c), jnp.float32)
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5
    monkeypatch.setenv("IR_ADS_SWIN_PACKED", "2")
    wide = pallas_window_block(
        x, *args, None, scale, heads, ws, shift=0, interpret=True
    )
    ref = _block_reference(x, *args, None, scale, heads, ws, shift=0)
    np.testing.assert_allclose(
        np.asarray(wide), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize("kind", ["1", "32"])
@pytest.mark.slow  # opt-in IR_ADS_SWIN_MASK8 path (measured a wash)
def test_mask8_precomputed_neq_bitwise(kind, monkeypatch):
    """IR_ADS_SWIN_MASK8: the prebuilt i8/i32 neq-mask operand must be
    BITWISE identical to the in-kernel region-id compare on v4, v5 and v6
    (same where/softmax ops, only the mask's origin changes)."""
    from ir_ads_tpu.ops.pallas_swin import (
        pallas_window_block_full,
        pallas_window_block_v6,
    )
    from tests.test_pallas_swin_v5 import (
        _params as _params_v5,
        _tail_params_v6,
    )

    ws = 4
    key = jax.random.PRNGKey(31)
    # v4 at 128-dim stage-0-like shape
    c, heads = 128, 4
    p = _params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(32), (2, 8, 8, c), jnp.float32)
    region = jnp.asarray(shift_region_ids(8, 8, ws, 2))
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5
    monkeypatch.setenv("IR_ADS_SWIN_MASK8", "0")
    base = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    monkeypatch.setenv("IR_ADS_SWIN_MASK8", kind)
    got = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    # v5 + v6 at a non-divisible map (pad/crop path)
    c6, heads6 = 32, 2
    attn = tuple(_params_v5(jax.random.PRNGKey(8), c6, heads6, ws))
    tail = _tail_params_v6(jax.random.PRNGKey(9), c6, 64, 4)
    x6 = jax.random.normal(
        jax.random.PRNGKey(10), (2, 7, 6, c6), jnp.float32
    )
    region6 = jnp.asarray(shift_region_ids(8, 8, ws, 2))
    scale6 = (c6 // heads6) ** -0.5
    monkeypatch.setenv("IR_ADS_SWIN_MASK8", "0")
    b6 = pallas_window_block_v6(
        x6, attn, tail, region6, scale6, heads6, ws, shift=2, interpret=True
    )
    b5 = pallas_window_block_full(
        x6, *attn, region6, scale6, heads6, ws, shift=2, interpret=True
    )
    monkeypatch.setenv("IR_ADS_SWIN_MASK8", kind)
    g6 = pallas_window_block_v6(
        x6, attn, tail, region6, scale6, heads6, ws, shift=2, interpret=True
    )
    g5 = pallas_window_block_full(
        x6, *attn, region6, scale6, heads6, ws, shift=2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(g6), np.asarray(b6))
    np.testing.assert_array_equal(np.asarray(g5), np.asarray(b5))


@pytest.mark.slow  # ~17 s: typed-mask bitwise matrix; folded-mask parity stays fast
def test_biasmask_typed_bitwise(monkeypatch):
    """IR_ADS_SWIN_BIASMASK=3 (round-5 window-TYPE decomposition): the
    per-row slab + shared column-mask adds produce BITWISE-identical
    softmax outputs to the in-kernel compare (masked entries underflow to
    exact 0.0 in exp either way; unmasked entries see the same adds).
    Covers packed-tall and unpacked, multi-band and single-band, and a
    rows_per_step=2 band containing the wrap row."""
    ws = 4
    key = jax.random.PRNGKey(43)
    c, heads = 128, 4
    p = _params(key, c, heads, ws)
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5
    for hp, wp, rows in ((24, 8, 1), (16, 12, 2), (8, 8, 2)):
        x = jax.random.normal(
            jax.random.PRNGKey(44), (2, hp, wp, c), jnp.float32
        )
        region = jnp.asarray(shift_region_ids(hp, wp, ws, 2))
        for packed in ("1", "0"):
            monkeypatch.setenv("IR_ADS_SWIN_PACKED", packed)
            monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", "0")
            base = pallas_window_block(
                x, *args, region, scale, heads, ws, shift=2,
                rows_per_step=rows, interpret=True,
            )
            monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", "3")
            got = pallas_window_block(
                x, *args, region, scale, heads, ws, shift=2,
                rows_per_step=rows, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


@pytest.mark.parametrize("mode", ["1", "2"])
def test_biasmask_folded_slab_matches_default(mode, monkeypatch):
    """IR_ADS_SWIN_BIASMASK: the folded bias+mask slab (per-band '1' and
    round-4 band-type '2') matches the in-kernel compare path.  Unmasked
    entries are bitwise; masked entries differ only under the -1e9 which
    softmax flushes, so outputs agree to f32 tolerance.  Uses >=3 bands so
    mode '2' exercises both the shared and the last-band slab."""
    ws = 4
    key = jax.random.PRNGKey(41)
    c, heads = 128, 4
    p = _params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(42), (2, 24, 8, c), jnp.float32)
    region = jnp.asarray(shift_region_ids(24, 8, ws, 2))
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5
    monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", "0")
    base = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, rows_per_step=1,
        interpret=True,
    )
    monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", mode)
    got = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, rows_per_step=1,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5
    )
    # unshifted (region None) is untouched by the env
    base_u = pallas_window_block(
        x, *args, None, scale, heads, ws, shift=0, rows_per_step=1,
        interpret=True,
    )
    monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", "0")
    got_u = pallas_window_block(
        x, *args, None, scale, heads, ws, shift=0, rows_per_step=1,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(base_u))


@pytest.mark.slow  # ~30-95 s: fast tier stays under its 10-min budget
def test_train_mode_v4_drop_path_reconstruction(monkeypatch):
    """Train-mode half-block kernels (round 3): with proj dropout 0 the v4
    kernel runs in train via exact branch reconstruction
    x + drop_path(y - x); fwd AND grads must match the module path at
    drop-path rate 0 (nonzero rates differ only by the rng stream)."""
    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    monkeypatch.setenv("IR_ADS_PALLAS_INTERPRET", "1")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))

    def build(impl):
        m = SwinBlockAdapter(
            dim=32, num_heads=2, ffn_dim=64, window_size=4, shift=True,
            drop_rate=0.0, drop_path_rate=0.0, attn_impl=impl, stage_idx=0,
        )
        return m

    m_ref = build("xla")
    v = m_ref.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(5)},
        x, "rgb", False,
    )
    m4 = build("pallas4")

    def f(m, p, xx):
        return m.apply(
            {"params": p}, xx, "rgb", False,
            rngs={"dropout": jax.random.PRNGKey(5)},
        )

    y_ref = f(m_ref, v["params"], x)
    y4 = f(m4, v["params"], x)
    np.testing.assert_allclose(
        np.asarray(y4), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )
    g_ref = jax.grad(lambda p: jnp.sum(f(m_ref, p, x) ** 2))(v["params"])
    g4 = jax.grad(lambda p: jnp.sum(f(m4, p, x) ** 2))(v["params"])
    for (path, want), (_, got) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g4)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
