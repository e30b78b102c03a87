"""Tests for ir_ads_tpu.models.projects — the d2-projects equivalents
(SURVEY.md §2.4 projects row: DeepLab, Panoptic-DeepLab, ViTDet, MViTv2,
TridentNet, TensorMask SwapAlign2Nat, PointSup, DensePose,
Rethinking-BatchNorm/PreciseBN).

Pattern follows the reference's detrex test style (§4): each op is compared
against an independently written numpy reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ir_ads_tpu.models.projects import (
    ASPP,
    DeepLabV3Head,
    DeepLabV3PlusHead,
    DensePoseChartHead,
    MViT,
    PanopticDeepLabInsEmbedHead,
    PanopticDeepLabSemSegHead,
    SimpleFeaturePyramid,
    SwapAlign2Nat,
    TridentBottleneck,
    TridentConv,
    ViTDet,
    deeplab_ce_loss,
    densepose_losses,
    get_panoptic_segmentation,
    get_point_coords_wrt_box,
    panoptic_deeplab_losses,
    point_sup_mask_loss,
    recompute_bn_stats,
    swap_align2nat,
)
from ir_ads_tpu.models.projects.vitdet import (
    window_partition,
    window_unpartition,
)


# ---------------------------------------------------------------- TensorMask
pytestmark = pytest.mark.slow  # model-level: compile-dominated

def _swap_align2nat_np(x, lam, pad_val):
    """Direct numpy port of the CUDA indexing
    (SwapAlign2Nat_cuda.cu:54-158) for verification."""
    n, hin, win, c = x.shape
    vin = int(round(c ** 0.5))
    uin = c // vin
    vout, uout = lam * vin, lam * uin
    hout, wout = -(-hin // lam), -(-win // lam)
    xr = x.reshape(n, hin, win, vin, uin)
    out = np.zeros((n, hout, wout, vout * uout), np.float64)

    def get(ni, y, xx, v, u):
        if y < 0 or y >= hin or xx < 0 or xx >= win or v < 0 or v >= vin \
                or u < 0 or u >= uin:
            return pad_val
        return xr[ni, y, xx, v, u]

    for ni in range(n):
        for v in range(vout):
            for u in range(uout):
                for y in range(hout):
                    for xx in range(wout):
                        ox = xx * lam + u - uout / 2.0 + 0.5
                        oy = y * lam + v - vout / 2.0 + 0.5
                        ou = (u + 0.5) / lam - 0.5
                        ov = (v + 0.5) / lam - 0.5
                        xf, yf = int(np.floor(ox)), int(np.floor(oy))
                        uf, vf = int(np.floor(ou)), int(np.floor(ov))
                        xwc, ywc = ox - xf, oy - yf
                        uwc, vwc = ou - uf, ov - vf
                        val = 0.0
                        for dy, wy in ((0, 1 - ywc), (1, ywc)):
                            for dx, wx in ((0, 1 - xwc), (1, xwc)):
                                for dv, wv in ((0, 1 - vwc), (1, vwc)):
                                    for du, wu in ((0, 1 - uwc), (1, uwc)):
                                        val += wy * wx * wv * wu * get(
                                            ni, yf + dy, xf + dx,
                                            vf + dv, uf + du,
                                        )
                        out[ni, y, xx, v * uout + u] = val
    return out


def test_swap_align2nat_matches_numpy_reference():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 6, 6, 4).astype(np.float32)
    got = np.asarray(swap_align2nat(jnp.asarray(x), 2, pad_val=0.0))
    want = _swap_align2nat_np(x.astype(np.float64), 2, 0.0)
    assert got.shape == (1, 3, 3, 16)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_swap_align2nat_module_and_grad():
    m = SwapAlign2Nat(2)
    x = jnp.ones((2, 4, 4, 4))
    y = m(x)
    assert y.shape == (2, 2, 2, 16)
    g = jax.grad(lambda a: jnp.sum(m(a) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_swap_align2nat_lambda1_identity_interior():
    # λ=1: output == input wherever the (v,u) shift stays in bounds
    x = jnp.asarray(np.random.RandomState(1).rand(1, 5, 5, 9), jnp.float32)
    y = swap_align2nat(x, 1, pad_val=0.0)
    assert y.shape == (1, 5, 5, 9)


# ------------------------------------------------------------------- DeepLab
def test_deeplab_ce_loss_matches_manual():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 3, (2, 4, 4)))
    labels = labels.at[0, 0, 0].set(255)
    got = deeplab_ce_loss(logits, labels, ignore_label=255)
    lp = jax.nn.log_softmax(logits, -1)
    valid = labels != 255
    safe = jnp.where(valid, labels, 0)
    ce = -jnp.take_along_axis(lp, safe[..., None], -1)[..., 0]
    # reference DeepLabCE: pixel_losses.mean() -> denominator = ALL pixels
    want = jnp.sum(jnp.where(valid, ce, 0)) / valid.size
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_deeplab_ce_hard_pixel_mining_takes_top_k():
    logits = jnp.zeros((1, 2, 2, 2))
    logits = logits.at[0, 0, 0, 0].set(10.0)  # one very-confident pixel
    labels = jnp.ones((1, 2, 2), jnp.int32)  # all class 1 -> pixel 0 is hard
    full = deeplab_ce_loss(logits, labels, top_k_percent_pixels=1.0)
    hard = deeplab_ce_loss(logits, labels, top_k_percent_pixels=0.25)
    assert float(hard) > float(full)


def test_deeplab_heads_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 32))
    head = DeepLabV3Head(num_classes=5, aspp_channels=16, common_stride=16)
    v = head.init({"params": key, "dropout": key}, x, train=True)
    y = head.apply(v, x, train=True, mutable=["batch_stats"],
                   rngs={"dropout": key})[0]
    assert y.shape == (1, 8, 8, 5)
    y = head.apply(v, x, train=False)
    assert y.shape == (1, 128, 128, 5)

    feats = [jnp.zeros((1, 16, 16, 24)), jnp.zeros((1, 4, 4, 48))]
    plus = DeepLabV3PlusHead(
        num_classes=5, project_channels=(8,), decoder_channels=(16, 16)
    )
    v = plus.init({"params": key, "dropout": key}, feats, train=True)
    y = plus.apply(v, feats, train=True, mutable=["batch_stats"],
                   rngs={"dropout": key})[0]
    assert y.shape == (1, 16, 16, 5)


def test_aspp_output_shape():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 6, 6, 12))
    m = ASPP(out_channels=8)
    v = m.init({"params": key}, x, train=False)
    assert m.apply(v, x, train=False).shape == (2, 6, 6, 8)


# ---------------------------------------------------------- Panoptic-DeepLab
def test_panoptic_deeplab_heads_and_losses():
    key = jax.random.PRNGKey(0)
    feats = [
        jnp.zeros((1, 16, 16, 16)),
        jnp.zeros((1, 8, 8, 24)),
        jnp.zeros((1, 4, 4, 48)),
    ]
    sem = PanopticDeepLabSemSegHead(
        num_classes=6, head_channels=16,
        project_channels=(8, 8), decoder_channels=(16, 16, 16),
    )
    vs = sem.init({"params": key, "dropout": key}, feats, train=True)
    sem_logits = sem.apply(vs, feats, train=True, mutable=["batch_stats"],
                           rngs={"dropout": key})[0]
    assert sem_logits.shape == (1, 16, 16, 6)

    ins = PanopticDeepLabInsEmbedHead(
        head_channels=8, project_channels=(8, 8),
        decoder_channels=(16, 16, 16),
    )
    vi = ins.init({"params": key, "dropout": key}, feats, train=True)
    (center, offset), _ = ins.apply(
        vi, feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": key},
    )
    assert center.shape == (1, 16, 16, 1)
    assert offset.shape == (1, 16, 16, 2)

    losses = panoptic_deeplab_losses(
        sem_logits, center, offset,
        jnp.zeros((1, 16, 16), jnp.int32),
        jnp.zeros((1, 16, 16)),
        jnp.zeros((1, 16, 16, 2)),
    )
    for k in ("loss_sem_seg", "loss_center", "loss_offset"):
        assert bool(jnp.isfinite(losses[k])), k


def test_panoptic_fusion_two_instances_and_stuff():
    # 16x16 frame: class 0 = stuff everywhere, two class-1 things with
    # centers at (4,4) and (4,12); offsets point each half at its center.
    h = w = 16
    sem = np.zeros((h, w), np.int32)
    sem[:8] = 1  # top half is thing class 1
    center = np.zeros((h, w), np.float32)
    center[4, 4] = 1.0
    center[4, 12] = 1.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cy = np.full((h, w), 4.0)
    cx = np.where(xx < 8, 4.0, 12.0)
    off = np.stack([cy - yy, cx - xx], -1).astype(np.float32)

    thing_mask = jnp.asarray([False, True])
    pan, centers = get_panoptic_segmentation(
        jnp.asarray(sem), jnp.asarray(center), jnp.asarray(off),
        thing_mask, label_divisor=1000, stuff_area=10, top_k=8,
        nms_kernel=3,
    )
    pan = np.asarray(pan)
    # two distinct thing segments in the top half
    top_ids = np.unique(pan[:8])
    assert set(top_ids) == {1001, 1002}
    assert np.all(pan[:8, :8] == pan[4, 4])
    assert np.all(pan[:8, 8:] == pan[4, 12])
    assert pan[4, 4] != pan[4, 12]
    # stuff (class 0) pasted in the bottom half
    assert np.all(pan[8:] == 0)


def test_panoptic_fusion_small_stuff_removed():
    h = w = 8
    sem = np.zeros((h, w), np.int32)
    sem[0, 0] = 2  # tiny stuff region of class 2 (area 1)
    pan, _ = get_panoptic_segmentation(
        jnp.asarray(sem), jnp.zeros((h, w)), jnp.zeros((h, w, 2)),
        jnp.asarray([False, False, False]),
        stuff_area=4, top_k=4,
    )
    pan = np.asarray(pan)
    assert pan[0, 0] == -1  # below stuff_area -> void
    assert pan[1, 1] == 0


# -------------------------------------------------------------------- ViTDet
def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 7, 9, 4), jnp.float32)
    win, pad = window_partition(x, 4)
    assert win.shape[1:] == (4, 4, 4)
    back = window_unpartition(win, 4, pad, (7, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_vitdet_and_simple_fpn_shapes():
    key = jax.random.PRNGKey(0)
    model = ViTDet(
        patch_size=16, dim=32, depth=2, num_heads=2,
        window_size=2, global_attn_indexes=(1,),
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": key}, x)
    out = model.apply(v, x)
    assert out["last_feat"].shape == (1, 4, 4, 32)

    fpn = SimpleFeaturePyramid(out_channels=16)
    vf = fpn.init({"params": key}, out["last_feat"])
    pyr = fpn.apply(vf, out["last_feat"])
    assert pyr["p2"].shape == (1, 16, 16, 16)
    assert pyr["p3"].shape == (1, 8, 8, 16)
    assert pyr["p4"].shape == (1, 4, 4, 16)
    assert pyr["p5"].shape == (1, 2, 2, 16)
    assert pyr["p6"].shape == (1, 1, 1, 16)


# -------------------------------------------------------------------- MViTv2
def test_mvit_pyramid_shapes():
    key = jax.random.PRNGKey(0)
    m = MViT(
        embed_dim=16, depth=4, num_heads=1,
        last_block_indexes=(0, 1, 2, 3),
        adaptive_kv_stride=2, adaptive_window_size=8,
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": key}, x)
    out = m.apply(v, x)
    assert out["scale2"].shape == (1, 16, 16, 16)
    assert out["scale3"].shape == (1, 8, 8, 32)
    assert out["scale4"].shape == (1, 4, 4, 64)
    assert out["scale5"].shape == (1, 2, 2, 128)


# ----------------------------------------------------------------- TridentNet
def test_trident_conv_shares_weights_across_branches():
    key = jax.random.PRNGKey(0)
    m = TridentConv(out_channels=8, dilations=(1, 1, 1))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 4), jnp.float32)
    v = m.init({"params": key}, [x, x, x], train=True)
    outs = m.apply(v, [x, x, x], train=True)
    assert len(outs) == 3
    # same dilation + same weight -> identical outputs
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    # only ONE weight tensor exists
    assert set(v["params"].keys()) == {"weight"}


def test_trident_conv_test_branch_selection():
    key = jax.random.PRNGKey(0)
    m = TridentConv(out_channels=8, dilations=(1, 2, 3), test_branch_idx=1)
    x = jnp.ones((1, 8, 8, 4))
    v = m.init({"params": key}, [x, x, x], train=True)
    outs = m.apply(v, [x], train=False)
    assert len(outs) == 1

    train_outs = m.apply(v, [x, x, x], train=True)
    np.testing.assert_allclose(
        np.asarray(outs[0]), np.asarray(train_outs[1]), rtol=1e-6
    )


def test_trident_bottleneck_shapes():
    key = jax.random.PRNGKey(0)
    m = TridentBottleneck(bottleneck_channels=8, out_channels=32)
    x = jnp.zeros((1, 8, 8, 16))
    v = m.init({"params": key}, x, train=True)
    outs = m.apply(v, x, train=True)
    assert len(outs) == 3 and outs[0].shape == (1, 8, 8, 32)


# ------------------------------------------------------------------ PointSup
def test_point_coords_wrt_box():
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 20.0]])
    pts = jnp.asarray([[[5.0, 10.0], [10.0, 20.0]]])
    got = get_point_coords_wrt_box(boxes, pts)
    np.testing.assert_allclose(
        np.asarray(got[0]), [[0.5, 0.5], [1.0, 1.0]], atol=1e-6
    )


def test_point_sup_mask_loss_ignores_minus_one():
    masks = jnp.full((1, 8, 8), 5.0)  # confident foreground
    pts = jnp.asarray([[[0.5, 0.5], [0.25, 0.25]]])
    labels_pos = jnp.asarray([[1.0, 1.0]])
    labels_ign = jnp.asarray([[1.0, -1.0]])
    l_pos = point_sup_mask_loss(masks, pts, labels_pos)
    l_ign = point_sup_mask_loss(masks, pts, labels_ign)
    np.testing.assert_allclose(float(l_pos), float(l_ign), rtol=1e-6)
    # wrong labels give a big loss
    l_bad = point_sup_mask_loss(masks, pts, jnp.zeros((1, 2)))
    assert float(l_bad) > float(l_pos) + 1.0


# ------------------------------------------------------------------ DensePose
def test_densepose_head_and_losses():
    key = jax.random.PRNGKey(0)
    head = DensePoseChartHead(hidden_dim=16, num_stacked_convs=2)
    x = jnp.zeros((2, 7, 7, 8))
    v = head.init({"params": key}, x)
    out = head.apply(v, x)
    assert out["coarse_segm"].shape == (2, 14, 14, 2)
    assert out["fine_segm"].shape == (2, 14, 14, 25)
    assert out["u"].shape == (2, 14, 14, 25)

    losses = densepose_losses(
        out,
        point_coords=jnp.full((2, 5, 2), 0.5),
        part_labels=jnp.ones((2, 5), jnp.int32),
        u_targets=jnp.full((2, 5), 0.3),
        v_targets=jnp.full((2, 5), 0.7),
        coarse_targets=jnp.ones((2, 14, 14), jnp.int32),
        valid=jnp.ones((2, 5), bool),
    )
    assert set(losses) == {
        "loss_densepose_I", "loss_densepose_U",
        "loss_densepose_V", "loss_densepose_S",
    }
    for k, val in losses.items():
        assert bool(jnp.isfinite(val)), k


# ------------------------------------------------------------------ PreciseBN
class _BNModel(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)


def test_recompute_bn_stats_uniform_average():
    key = jax.random.PRNGKey(0)
    m = _BNModel()
    x0 = jnp.zeros((4, 3))
    variables = m.init({"params": key}, x0, train=True)

    rng = np.random.RandomState(0)
    batches = [(jnp.asarray(rng.randn(16, 3) * (i + 1) + i, jnp.float32),)
               for i in range(4)]

    new_vars = recompute_bn_stats(
        lambda v, b, train, mutable: m.apply(v, b, train=train, mutable=mutable),
        variables, batches, momentum=0.9,
    )
    want_mean = np.mean([np.mean(np.asarray(b[0]), 0) for b in batches], 0)
    got_mean = np.asarray(
        jax.tree_util.tree_leaves(new_vars["batch_stats"])
    )
    bn_mean = np.asarray(new_vars["batch_stats"]["batch_stats"]["mean"]) \
        if "batch_stats" in new_vars["batch_stats"] else None
    # locate the mean leaf generically
    flat = jax.tree_util.tree_flatten_with_path(new_vars["batch_stats"])[0]
    means = [np.asarray(v) for p, v in flat if "mean" in str(p)]
    assert len(means) == 1
    np.testing.assert_allclose(means[0], want_mean, rtol=1e-4, atol=1e-4)
