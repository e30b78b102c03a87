"""Detection stack tests: box ops vs torchvision-formula references,
matcher, criterion sanity, CDN static layout, and a full teacher-student
train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ir_ads_tpu.detection.box_ops import (
    box_cxcywh_to_xyxy,
    box_iou,
    generalized_box_iou,
)
from ir_ads_tpu.detection.cdn import cdn_groups, generate_cdn_queries, make_cdn_attn_mask
from ir_ads_tpu.detection.criterion import (
    dn_criterion,
    set_criterion,
    sigmoid_focal_loss,
)
from ir_ads_tpu.detection.matcher import hungarian_match, match_cost


def _torch_giou(a, b):
    # independent reference (DETR generalized_box_iou formula)
    area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None] - inter
    iou = inter / union
    lt = torch.min(a[:, None, :2], b[None, :, :2])
    rb = torch.max(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def test_giou_matches_reference():
    rng = np.random.RandomState(0)
    a = rng.rand(5, 4).astype(np.float32)
    a[:, 2:] += a[:, :2]  # valid xyxy
    b = rng.rand(7, 4).astype(np.float32)
    b[:, 2:] += b[:, :2]
    ours = generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    ref = _torch_giou(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_focal_loss_matches_torchvision_formula():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 6).astype(np.float32)
    targets = (rng.rand(4, 6) > 0.7).astype(np.float32)
    ours = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        lt, tt, reduction="none"
    )
    p_t = p * tt + (1 - p) * (1 - tt)
    ref = ce * ((1 - p_t) ** 2)
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    ref = alpha_t * ref
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_hungarian_matches_scipy_direct():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(2)
    cost = rng.rand(2, 8, 3).astype(np.float32)
    q_idx, g_idx = jax.jit(hungarian_match)(jnp.asarray(cost))
    for b in range(2):
        r, c = linear_sum_assignment(cost[b])
        expected = {cc: rr for rr, cc in zip(r, c)}
        for g in range(3):
            assert int(q_idx[b, g]) == expected[int(g_idx[b, g])]


def test_set_criterion_perfect_predictions_low_loss():
    """Predictions exactly on GT should cost less than random ones."""
    b, q, g, c = 1, 6, 2, 4
    gt_labels = jnp.asarray([[1, 2]])
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    gt_valid = jnp.ones((1, 2), bool)

    good_logits = jnp.full((b, q, c), -10.0)
    good_logits = good_logits.at[0, 0, 1].set(10.0).at[0, 1, 2].set(10.0)
    good_boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.1, 0.1]]), (q, 1))[None]
    good_boxes = good_boxes.at[0, 0].set(gt_boxes[0, 0]).at[0, 1].set(
        gt_boxes[0, 1]
    )
    good = set_criterion(good_logits, good_boxes, gt_labels, gt_boxes, gt_valid)

    bad_logits = jnp.zeros((b, q, c))
    bad_boxes = jnp.full((b, q, 4), 0.25)
    bad = set_criterion(bad_logits, bad_boxes, gt_labels, gt_boxes, gt_valid)
    assert sum(good.values()) < sum(bad.values())
    assert float(good["loss_bbox"]) < 1e-5
    assert float(good["loss_giou"]) < 1e-5


def test_cdn_layout_and_mask():
    g, groups, nq = 3, 2, 5
    mask = make_cdn_attn_mask(g, groups, nq)
    pad = 2 * g * groups
    assert mask.shape == (pad + nq, pad + nq)
    # matching queries can't see dn queries
    assert mask[pad:, :pad].all()
    # matching queries see each other
    assert not mask[pad:, pad:].any()
    # group 0 can't see group 1 and vice versa
    assert bool(mask[0, 2 * g])
    assert bool(mask[2 * g, 0])
    # within-group visible
    assert not mask[:2 * g, :2 * g].any()

    labels = jnp.asarray([[0, 1, 2]])
    boxes = jnp.full((1, 3, 4), 0.5)
    valid = jnp.asarray([[True, True, False]])
    table = jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8)
    q, r = generate_cdn_queries(
        labels, boxes, valid, table, jax.random.PRNGKey(0), groups,
        label_noise_ratio=0.0, box_noise_scale=0.0, num_classes=4,
    )
    assert q.shape == (1, pad, 8)
    assert r.shape == (1, pad, 4)
    # invalid slot zeroed
    np.testing.assert_array_equal(np.asarray(q[0, 2]), 0)
    # no noise: positive refs = inverse_sigmoid(0.5) = 0
    np.testing.assert_allclose(np.asarray(r[0, 0]), 0.0, atol=1e-6)


def test_dn_criterion_positive_recovery():
    b, g, groups, c = 1, 2, 1, 4
    gt_labels = jnp.asarray([[1, 3]])
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.6, 0.6, 0.3, 0.3]]])
    gt_valid = jnp.ones((1, 2), bool)
    # perfect positive predictions, background negatives
    logits = jnp.full((b, 2 * g * groups, c), -10.0)
    logits = logits.at[0, 0, 1].set(10.0).at[0, 1, 3].set(10.0)
    boxes = jnp.concatenate([gt_boxes, jnp.full((1, 2, 4), 0.1)], axis=1)
    losses = dn_criterion(logits, boxes, gt_labels, gt_boxes, gt_valid, groups)
    assert float(losses["loss_bbox_dn"]) < 1e-5
    assert float(losses["loss_class_dn"]) < 1e-3


@pytest.mark.slow
def test_detection_train_step_end_to_end():
    from ir_ads_tpu.detection.dino import DINODetector
    from ir_ads_tpu.detection.train import (
        DetTrainState,
        detection_optimizer,
        make_detection_train_step,
    )

    m = DINODetector(
        num_classes=6, num_queries=12, embed_dim=32,
        num_encoder_layers=1, num_decoder_layers=2, num_levels=3,
        backbone_arch="resnet18", dn_number=8, max_gt=3,
    )
    b, h, w = 2, 64, 64
    imgs = jnp.ones((b, h, w, 3)) * 127.0
    labels = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    boxes = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (b, 3, 4)) * 0.4 + 0.3, 0.1, 0.9
    )
    valid = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)
    masks = (
        jax.random.uniform(jax.random.PRNGKey(1), (b, 3, 16, 16)) > 0.5
    ).astype(jnp.float32)

    variables = m.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)},
        imgs, labels, boxes, valid, train=True,
    )
    tx = detection_optimizer(variables["params"], total_steps=100)
    state = DetTrainState.create(
        m.apply, variables["params"], variables["batch_stats"], tx
    )
    step = jax.jit(make_detection_train_step(use_teacher=True))
    batch = (imgs, imgs, labels, boxes, valid, masks)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"])), metrics
    assert int(new_state.step) == 1
    # EMA moved toward params
    d_before = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.ema_params, state.params)
    )
    d_after = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     new_state.ema_params, new_state.params)
    )
    assert sum(d_after) > 0  # ema lags params after update


@pytest.mark.slow  # opt-in IR_ADS_DET_CRIT=vmap path, 2 criterion builds
def test_detection_losses_vmap_matches_loop(monkeypatch):
    """IR_ADS_DET_CRIT=vmap (one batched criterion instance over decoder
    levels — the round-4 fix for the train-step HLO exceeding the relay
    compile helper) == the unrolled loop.  Without masks the criterion is
    RNG-free, so values must match to batching-numerics tolerance."""
    from ir_ads_tpu.detection.train import detection_losses

    rng = np.random.RandomState(0)
    L, b, q, c, g = 3, 2, 20, 6, 3
    n_dn = 2 * g * 2  # 2 * G * n_groups (CDN layout)
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(L, b, q, c), jnp.float32),
        "pred_boxes": jax.nn.sigmoid(
            jnp.asarray(rng.randn(L, b, q, 4), jnp.float32)
        ),
        "pred_masks": jnp.asarray(rng.randn(L, b, q, 8, 8), jnp.float32),
        "enc_logits": jnp.asarray(rng.randn(b, q, c), jnp.float32),
        "enc_boxes": jax.nn.sigmoid(
            jnp.asarray(rng.randn(b, q, 4), jnp.float32)
        ),
        "enc_masks": jnp.asarray(rng.randn(b, q, 8, 8), jnp.float32),
        "n_dn": n_dn,
        "n_groups": 2,
    }
    labels = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    boxes = jnp.clip(
        jnp.asarray(rng.rand(b, g, 4), jnp.float32) * 0.4 + 0.3, 0.1, 0.9
    )
    valid = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)

    monkeypatch.setenv("IR_ADS_DET_CRIT", "loop")
    loop = detection_losses(
        outputs, labels, boxes, valid, None, jax.random.PRNGKey(0)
    )
    monkeypatch.setenv("IR_ADS_DET_CRIT", "vmap")
    vm = detection_losses(
        outputs, labels, boxes, valid, None, jax.random.PRNGKey(0)
    )
    assert set(loop) == set(vm)
    for k in loop:
        np.testing.assert_allclose(
            float(vm[k]), float(loop[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_dynamic_k_match():
    from ir_ads_tpu.detection.matcher import dynamic_k_match

    q, g = 8, 2
    # gt0: queries 0,1 overlap well; gt1: queries 4,5
    ious = np.zeros((1, q, g), np.float32)
    ious[0, 0, 0] = ious[0, 1, 0] = 0.8
    ious[0, 4, 1] = ious[0, 5, 1] = 0.9
    cost = 1.0 - ious
    valid = jnp.asarray([[True, True]])
    assign = dynamic_k_match(jnp.asarray(cost), jnp.asarray(ious), valid)
    a = np.asarray(assign[0])
    # each assigned query maps to exactly one gt
    assert (a.sum(-1) <= 1).all()
    # the high-iou queries are assigned to their gts
    assert a[0, 0] and a[1, 0]
    assert a[4, 1] and a[5, 1]


def test_samplers():
    from ir_ads_tpu.detection.samplers import (
        aspect_ratio_group_stream,
        inference_sampler,
        repeat_factor_sampler,
        repeat_factors_from_category_frequency,
        training_sampler,
    )
    import itertools

    s = training_sampler(10, seed=1, shard_idx=0, num_shards=2)
    first = list(itertools.islice(s, 10))
    assert len(first) == 10 and all(0 <= i < 10 for i in first)

    anns = [[0], [0], [0, 1], [], [0]]  # class 1 rare
    rf = repeat_factors_from_category_frequency(anns, 5, repeat_thresh=0.5)
    assert rf[2] > rf[0] >= 1.0

    stream = repeat_factor_sampler(rf, seed=0)
    batch = list(itertools.islice(stream, 50))
    # the rare-class image appears more often than a common one
    assert batch.count(2) >= batch.count(0)

    assert list(inference_sampler(10, 1, 2)) == [5, 6, 7, 8, 9]

    wide = [True, False, True, False, True, True]
    groups = list(
        aspect_ratio_group_stream(iter(range(6)), wide, batch_size=2)
    )
    for g in groups:
        assert len({wide[i] for i in g}) == 1


def test_conditional_attention_modules():
    from ir_ads_tpu.detection.conditional_attn import (
        ConditionalCrossAttention,
        ConditionalSelfAttention,
        PositionEmbeddingLearned,
    )

    q = jnp.ones((2, 5, 32))
    pos = jnp.ones((2, 5, 32)) * 0.1
    sa = ConditionalSelfAttention(32, 4)
    v = sa.init(jax.random.PRNGKey(0), q, pos)
    out = sa.apply(v, q, pos)
    assert out.shape == q.shape and bool(jnp.isfinite(out).all())

    mem = jnp.ones((2, 9, 32))
    mem_pos = jnp.ones((2, 9, 32)) * 0.2
    ca = ConditionalCrossAttention(32, 4)
    vc = ca.init(jax.random.PRNGKey(0), q, mem, mem, pos, mem_pos, pos, True)
    out = ca.apply(vc, q, mem, mem, pos, mem_pos, pos, False)
    assert out.shape == q.shape and bool(jnp.isfinite(out).all())

    pe = PositionEmbeddingLearned(num_pos_feats=16)
    vp = pe.init(jax.random.PRNGKey(0), 7, 9)
    emb = pe.apply(vp, 7, 9)
    assert emb.shape == (7, 9, 16)


def test_auction_matches_hungarian_cost():
    """Auction assignment total cost ~= scipy optimum (eps-optimal)."""
    from scipy.optimize import linear_sum_assignment

    from ir_ads_tpu.detection.matcher import auction_match

    rng = np.random.RandomState(0)
    for trial in range(8):
        q, g = rng.randint(6, 30), rng.randint(1, 6)
        cost = rng.rand(1, q, g).astype(np.float32)
        rows = np.asarray(jax.jit(auction_match)(jnp.asarray(cost)))[0]
        # valid permutation (distinct queries)
        assert len(set(rows.tolist())) == g, rows
        ours = cost[0][rows, np.arange(g)].sum()
        r, c = linear_sum_assignment(cost[0])
        opt = cost[0][r, c].sum()
        assert ours <= opt + g * 2e-3 + 1e-6, (ours, opt)


def test_maskformer_targets():
    from ir_ads_tpu.detection.data import (
        maskformer_instance_targets,
        maskformer_semantic_targets,
    )

    anns = [
        {"category_id": 1, "segmentation": [[0, 0, 4, 0, 4, 4, 0, 4]]},
        {"category_id": 2, "segmentation": [[2, 2, 6, 2, 6, 6, 2, 6]]},
    ]
    c2c = {1: 0, 2: 1}
    sem = maskformer_semantic_targets(anns, 8, 8, 2, c2c)
    assert sem[1, 1] == 0
    assert sem[5, 5] == 1  # later instance overwrites
    assert sem[7, 7] == 255  # uncovered -> ignore

    masks, labels, valid = maskformer_instance_targets(anns, 8, 8, 4, c2c)
    assert valid.tolist() == [True, True, False, False]
    assert labels[:2].tolist() == [0, 1]
    assert masks[0].sum() > 0


@pytest.mark.slow
def test_detection_training_converges():
    """VERDICT r1 item 6: training must actually learn, not just produce a
    finite loss.  ~40 steps of the tiny DINO on one fixed synthetic batch
    must cut the total loss substantially (any sign/matching bug fails)."""
    from ir_ads_tpu.detection.dino import DINODetector
    from ir_ads_tpu.detection.train import (
        DetTrainState,
        detection_optimizer,
        make_detection_train_step,
    )

    m = DINODetector(
        num_classes=4, num_queries=12, embed_dim=32,
        num_encoder_layers=1, num_decoder_layers=2, num_levels=3,
        backbone_arch="resnet18", dn_number=4, max_gt=3,
    )
    b, h, w = 2, 64, 64
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (b, h, w, 3)) * 255.0
    labels = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    boxes = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (b, 3, 4)) * 0.4 + 0.3,
        0.1, 0.9,
    )
    valid = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)
    masks = (
        jax.random.uniform(jax.random.PRNGKey(1), (b, 3, 16, 16)) > 0.5
    ).astype(jnp.float32)

    variables = m.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1)},
        imgs, labels, boxes, valid, train=True,
    )
    tx = detection_optimizer(variables["params"], base_lr=5e-4, total_steps=50)
    state = DetTrainState.create(
        m.apply, variables["params"], variables["batch_stats"], tx
    )
    step = jax.jit(make_detection_train_step(use_teacher=False))
    batch = (imgs, imgs, labels, boxes, valid, masks)
    first = None
    for i in range(40):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)
