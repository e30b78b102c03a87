#!/usr/bin/env python
"""Headline benchmark: Swin-B RGB-D sliding-window eval frames/sec/chip.

Matches BASELINE.md's driver-set target metric: CMNeXt with the dual-stream
Swin-B backbone (embed 128, depths (2,2,18,2), window 12), 480x640 RGB-D
frames, tiled sliding-window inference with 1/3 overlap + horizontal-flip
ensembling (reference val_mm.py:30-62 semantics), bf16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": r}

vs_baseline: the reference publishes no hard numbers (BASELINE.json
"published" is empty).  We use an estimated A100 PyTorch fp16 throughput for
the same workload as denominator: ~880 GFLOPs/frame (2 forwards/frame via
flip x ~220 GFLOPs dual-stream pass at B=4 -> B=8 batch) at an assumed
50 TFLOP/s effective => ~57 fps.  vs_baseline = measured_fps / 57.0.

Robustness: the remote-compile relay intermittently 500s on the largest
fused programs; attempts fall back through kernel configurations
(v3 map kernels -> round-1 v2 kernels -> pure XLA) so the driver always
gets a number.  IR_ADS_BENCH_CONFIG=<name> pins one config.

Compile-time ops note (VERDICT r4 weak 5): compile_s in the output is
CACHE-WARM — the persistent compilation cache (utils/compile_cache.py,
~/.cache/ir_ads_tpu_xla unless IR_ADS_CACHE_DIR overrides) covers Mosaic
remote compiles too (root-caused dev/probe_cache_miss.py: 186.7 s cold vs
2.3 s warm per program).  PREWARM STEP: after any kernel/source change
that shifts HLO, run `python bench.py` once to repopulate the cache before
a recorded run; a cold cache shows up as compile_s in the 700+ s class
(the round-3 789 s regression), not as a perf change.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.evaluation.semseg_eval import make_sliding_window_fn
from ir_ads_tpu.models.cmnext import CMNeXt
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

EST_A100_PYTORCH_FPS = 57.0  # round-1 conservative denominator (kept for
# cross-round comparability; == the TOP of the sourced range)
EST_A100_SOURCED_FPS = 19.5  # BASELINE.md "Sourced A100 denominator":
# Swin paper V100 278 img/s anchor x A100/AMP/resolution/model-overhead
# factors; range 12-34 fps

IMAGE = (480, 640)
TILE = (480, 640)  # reference sliding_predict uses tile = image size (val_mm.py:33)
NUM_CLASSES = 40  # NYU
# throughput batching across frames (the metric is frames/sec/chip, and the
# per-kernel fixed costs amortize with frames in flight)
BATCH = int(os.environ.get("IR_ADS_BENCH_BATCH", "4"))
ITERS = 10

# (name, {env overrides}) in preference order.  Whole-model v5e sweep
# (dev/ablate_full.py, B=8 forward): xla-DSCF 97.1 ms, pallas2 121.2 ms,
# pallas3 62.8 ms — the round-2 rows-layout DSCF path (rpe builder output
# consumed with zero HBM relayout, transposed-score attention kernel) wins
# at every level and is the production config (see DAttentionMM notes).
CONFIGS = [
    # r5: whole-block v6 kernels at the small-map stages (2-3; the whole
    # padded map + packed scores fit VMEM, zero XLA glue per block), banded
    # v4 half-block kernels at stages 0-1 (whole-map kernels there blow up
    # the remote-compile payload), packed-head dots everywhere, fused
    # tails, pallas3 DSCF with packed-slot attention dots at levels 0-2
    # (level 3's whole-plane tile crashes Mosaic; dev/probe_dscf_packed:
    # 80.4 -> 77.6 ms B=8 forward same-session).  In-context v5e B=8
    # forward: 77.6 ms vs 86.3 for the r2 config (sweeps 2026-08-18).
    (
        "r5",
        {
            "IR_ADS_SWIN_ATTN": "pallas4,pallas4,pallas6,pallas6",
            # profile-guided (dev/probe_profile_forward + probe_dscf_levels):
            # the rows-layout kernels waste lanes at level 3 (w=20 of 128;
            # its rpe builder alone was 2.9 ms/forward) — xla einsum wins
            # there (77.6 -> 75.6 ms); level 2 (w=40) still favors pallas3.
            "IR_ADS_DSCF_ATTN": "pallas3,pallas3,pallas3,xla",
            "IR_ADS_FFN": "fused",
            "IR_ADS_SWIN_PACKED": "1",
            "IR_ADS_DSCF_PACKED": "1,1,1,0",
            # round-4: lane-dense FLAT (B, H, W*3) input feed — the NHWC
            # trailing dim of 3 forces (8,128)-tiled buffers padded 42x;
            # flat keeps them dense.  Bitwise vs NHWC
            # (tests/test_flat_input.py); in-context A/B 2026-08-19:
            # 74.15 -> 69.46 ms B=8 forward (dev/run_r4f.sh).
            "IR_ADS_FLAT_INPUT": "1",
            # round-5: typed shift-mask fold — the recorded run that
            # CROSSED vs_baseline 1.0: 57.284 fps / 1.005, forward
            # 68.9 ms, p50 69.8 (dev/logs/bench_r5_bm3.log).  Its sliding
            # program compiles SLOWLY (740 s cold; one earlier attempt
            # during a degraded relay window sat >36 min) — the cache
            # makes reruns cheaper, and the fps is worth the compile_s
            # hit.  v7 whole-block at stages 0-1 (75.02) and DSCF offset
            # shift-FMA (71.46) both measured LOSSES and stay off.
            "IR_ADS_SWIN_BIASMASK": "3",
            # note: IR_ADS_SWIN_V4_ROWS=5 measured 10% faster per stage-0
            # call standalone (dev/probe_v4_cost) but the FULL sliding
            # program with 5-row bands SIGKILLs the remote compile helper
            # (r8 attempt 2026-08-18) — keep the default banding here
        },
    ),
    # r4: v4 half-block kernels with PACKED-HEAD attention dots (4 heads
    # per full-K MXU dot, bitwise-equal; see ops/pallas_swin._heads_attention)
    # + fused block tails + pallas3 DSCF.  81.1 ms B=8 forward.
    (
        "r4",
        {
            "IR_ADS_SWIN_ATTN": "pallas4",
            "IR_ADS_DSCF_ATTN": "pallas3",
            "IR_ADS_FFN": "fused",
            "IR_ADS_SWIN_PACKED": "1",
        },
    ),
    # r3: same but per-head attention dots (round-2 mid state)
    (
        "r3",
        {
            "IR_ADS_SWIN_ATTN": "pallas4",
            "IR_ADS_DSCF_ATTN": "pallas3",
            "IR_ADS_FFN": "fused",
            "IR_ADS_SWIN_PACKED": "0",
        },
    ),
    # production r2: v2 window kernels + pallas3 rows-layout DSCF
    ("r2", {"IR_ADS_SWIN_ATTN": "pallas", "IR_ADS_DSCF_ATTN": "pallas3"}),
    # round-1 production: v2 window kernels, XLA DSCF
    ("r1", {"IR_ADS_SWIN_ATTN": "pallas", "IR_ADS_DSCF_ATTN": "xla"}),
    # pure XLA (always compiles)
    ("xla", {"IR_ADS_SWIN_ATTN": "xla", "IR_ADS_DSCF_ATTN": "xla"}),
]

# w8a8 MXU eval config: qkv/proj/FFN dots in s8 (in-kernel dynamic
# activation quant; ops/pallas_{swin,mlp} int8 variants, parity budget in
# tests/test_pallas_int8.py + tests/test_int8.py).  Opt-in until real-data
# mIoU parity is demonstrated: IR_ADS_BENCH_CONFIG=r4i8.
CONFIGS.append(
    (
        "r4i8",
        {
            "IR_ADS_SWIN_ATTN": "pallas4",
            "IR_ADS_DSCF_ATTN": "pallas3",
            "IR_ADS_FFN": "fused",
            "IR_ADS_SWIN_PACKED": "1",
            "IR_ADS_INT8": "1",
        },
    ),
)


def measure_data_loader(n_imgs: int = 32, batch: int = 4) -> dict:
    """Input-pipeline img/s with real JPEG/PNG decode (VERDICT r2 item 5):
    the UNCACHED eval feed (decode + val transform, uint8 out, device-side
    normalize — what feeds the headline eval cold) and the train-aug
    pipeline.  Images have photographic statistics (noise JPEGs decode ~6x
    slower than any real photo and made round-2 numbers unrepresentative).
    NOTE: this container exposes ONE CPU core (os.cpu_count()==1) — the
    numbers scale with cores on a real host; cpu_count is reported so the
    denominator is explicit."""
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dev.bench_data_real import make_dataset_tree, measure

    with tempfile.TemporaryDirectory() as root:
        make_dataset_tree(root, n_imgs)
        return {
            "eval_img_s": round(
                measure(root, batch, workers=4, mode="thread", epochs=2,
                        pipeline="eval"), 1,
            ),
            "train_img_s": round(
                measure(root, batch, workers=8, mode="thread", epochs=2), 1
            ),
            "host_cpu_cores": os.cpu_count(),
        }


def measure_data_loader_cached(n_imgs: int = 32, batch: int = 4) -> float:
    """Eval-path img/s from the decode-once raw cache (data/cache.py):
    uint8 batches + on-device Normalize — the pipeline that actually feeds
    the headline sliding-window eval."""
    import sys
    import tempfile
    import time as _time

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dev.bench_data_real import make_dataset_tree

    from ir_ads_tpu.data.augmentations import (
        get_val_augmentation_device_norm,
    )
    from ir_ads_tpu.data.cache import RawCache
    from ir_ads_tpu.data.datasets import get_dataset
    from ir_ads_tpu.data.loader import DataLoader

    with tempfile.TemporaryDirectory() as root:
        make_dataset_tree(root, n_imgs)
        ds = get_dataset("NYU")(root, "train", None, ["img", "depth"])
        cached = RawCache.build(
            ds,
            os.path.join(root, "_cache"),
            transform=get_val_augmentation_device_norm((480, 640)),
        )
        cached.modals = ds.modals
        loader = DataLoader(cached, batch, shuffle=False, num_workers=4)
        n = 0
        for e in range(2):  # epoch 0 warms the page cache
            if e == 1:
                t0 = _time.time()
            for b in loader:
                if e == 1:
                    n += b[0].shape[0]
        return n / (_time.time() - t0)


def run_config(env: dict) -> dict:
    """Build + time the whole predict under the given kernel config."""
    for k, v in env.items():
        os.environ[k] = v
    # round-4: heads return H/4 logits; the sliding wrapper flip-ensembles
    # at low res and upsamples ONCE (exact by bilinearity,
    # tests/test_eval_lowres.py) — removes the full-res (2B, H, W, C)
    # flip-add + astype HBM traffic.  Default ON; IR_ADS_EVAL_LOWRES=0 opts out.
    lowres = os.environ.get("IR_ADS_EVAL_LOWRES", "1") not in ("", "0")
    try:
        model = CMNeXt(
            backbone="SwinTransformer-B",
            num_classes=NUM_CLASSES,
            dtype=jnp.bfloat16,
            mmst_mask=False,
            upsample_logits=not lowres,
        )
        # FLAT (B, H, W*3) lane-dense feed (round-4): an NHWC trailing dim
        # of 3 forces (8,128)-tiled device buffers padded 42x; the host
        # reshape is free and PatchEmbed/sliding-eval handle rank-3
        # natively (dev/probe_patchembed.py, tests/test_flat_input.py)
        flat = os.environ.get("IR_ADS_FLAT_INPUT", "0") not in ("", "0")
        shape = (BATCH, IMAGE[0], IMAGE[1] * 3) if flat else (
            BATCH, *IMAGE, 3)
        rgb = jnp.zeros(shape, jnp.bfloat16)
        dte = jnp.zeros(shape, jnp.bfloat16)
        t0 = time.time()
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
        )()
        init_s = time.time() - t0

        # round-5 negative result: emitting the argmax prediction map
        # instead of the full-res logits (the product's real next step,
        # val_mm.py:78) measured WORSE — p50 70.6 -> 71.7 ms: XLA does
        # not fuse the channel argmax into the bilinear-upsample
        # consumer, so it costs an extra full-res pass instead of saving
        # one (/tmp/bench_r5c.log vs r5b, 2026-08-21).  Logits-out stays
        # the recorded workload; IR_ADS_BENCH_LOGITS=0 opts into the
        # argmax variant.
        logits_out = os.environ.get(
            "IR_ADS_BENCH_LOGITS", "1"
        ) not in ("", "0")

        @jax.jit
        def _predict(v, r, d):
            # ONE program for extract + forward + flip-ensemble +
            # overlap-add (multi-dispatch through the relay serializes
            # ~50ms/iter).  ``v`` is a tracer: params stay runtime
            # arguments, never HLO constants.
            fwd = lambda rr, dd: model.apply(v, rr, dd, train=False)[0]
            fn = make_sliding_window_fn(
                fwd, IMAGE, TILE, NUM_CLASSES, overlap=1.0 / 3.0, flip=True,
                fuse=True,
            )
            out = fn(r, d)
            if logits_out:
                return out
            return jnp.argmax(out, axis=-1).astype(jnp.int32)

        # distinct keys per modality: identical stream inputs let XLA CSE
        # dedupe shared-weight work in some configs (see dev/ablate_full.py)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        rgb = jax.random.normal(k1, shape, jnp.bfloat16)
        dte = jax.random.normal(k2, shape, jnp.bfloat16)

        # honest timing: iterate ON DEVICE (scan chains frames through a
        # data dependency) and fetch one scalar; 2-point slope cancels
        # constant costs.  block_until_ready lies through the relay.
        @functools.partial(jax.jit, static_argnums=(0,))
        def many(n, v, r, d):
            def body(carry, _):
                r, d, _ = carry
                out = _predict(v, r, d)
                s = jnp.sum(out).astype(jnp.float32)
                # chain BOTH streams: a loop-invariant dte would let XLA
                # hoist dte-only work out of the scan (see dev/ablate_full)
                z = (s * 0.0).astype(r.dtype)
                return (rgb + z, dte + z, s), None

            (_, _, s_last), _ = jax.lax.scan(
                body, (r, d, jnp.float32(0)), None, length=n
            )
            return s_last

        t0 = time.time()
        checksum = float(many(2, variables, rgb, dte))
        compile_s = time.time() - t0
        check_long = float(many(ITERS, variables, rgb, dte))
        assert abs(check_long - checksum) < abs(checksum) * 1e-2 + 1e-3

        t0 = time.time()
        float(many(2, variables, rgb, dte))
        t_short = time.time() - t0
        t0 = time.time()
        float(many(ITERS, variables, rgb, dte))
        t_long = time.time() - t0
        dt = (t_long - t_short) / (ITERS - 2)

        # bare-forward slope in the SAME session: separates the sliding/
        # flip wrapper cost from relay session variance (the two have been
        # conflated across separate processes before)
        def _flipw(t):  # W-flip for NHWC or flat (B, H, W*3)
            if not flat:
                return t[:, :, ::-1]
            b_, h_, wc = t.shape
            return t.reshape(b_, h_, wc // 3, 3)[:, :, ::-1].reshape(
                b_, h_, wc)

        rgb8 = jnp.concatenate([rgb, _flipw(rgb)], axis=0)
        dte8 = jnp.concatenate([dte, _flipw(dte)], axis=0)

        @functools.partial(jax.jit, static_argnums=(0,))
        def many_fwd(n, v, r, d):
            def body(carry, _):
                r, d, _ = carry
                out = model.apply(v, r, d, train=False)[0]
                s = jnp.sum(out).astype(jnp.float32)
                z = (s * 0.0).astype(r.dtype)
                return (rgb8 + z, dte8 + z, s), None

            (_, _, s_last), _ = jax.lax.scan(
                body, (r, d, jnp.float32(0)), None, length=n
            )
            return s_last

        fwd_ms = None
        try:
            float(many_fwd(2, variables, rgb8, dte8))
            float(many_fwd(ITERS, variables, rgb8, dte8))
            t0 = time.time()
            float(many_fwd(2, variables, rgb8, dte8))
            ts2 = time.time() - t0
            t0 = time.time()
            float(many_fwd(ITERS, variables, rgb8, dte8))
            tl2 = time.time() - t0
            fwd_ms = round(1000.0 * (tl2 - ts2) / (ITERS - 2), 1)
        except Exception:
            pass
        return {
            "fps": BATCH / dt,
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "p50_latency_ms": round(1000.0 * dt, 1),
            "forward_ms": fwd_ms,
        }
    finally:
        for k in env:
            os.environ.pop(k, None)


def main():
    pinned = os.environ.get("IR_ADS_BENCH_CONFIG", "")
    configs = [c for c in CONFIGS if not pinned or c[0] == pinned]
    result = None
    errors = {}
    for name, env in configs:
        try:
            result = run_config(env)
            result["kernel_config"] = name
            break
        except Exception as e:  # compile-relay 500s, OOM, etc.
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
    if result is None:
        raise SystemExit(f"all bench configs failed: {errors}")

    try:
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from dev.roofline import summary as roofline_summary

        roofline = roofline_summary()
    except Exception:
        roofline = None

    try:
        data_ips = measure_data_loader()
    except Exception:
        data_ips = None
    try:
        data_cached_ips = round(measure_data_loader_cached(), 1)
    except Exception:
        data_cached_ips = None

    fps = result.pop("fps")
    print(
        json.dumps(
            {
                "metric": "swinb_rgbd_sliding_window_eval_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / EST_A100_PYTORCH_FPS, 3),
                "detail": {
                    "image": IMAGE,
                    "tile": TILE,
                    "flip": True,
                    "overlap": 0.333,
                    "dtype": "bfloat16",
                    **result,
                    "device": str(jax.devices()[0]),
                    "baseline_note": (
                        "vs_baseline uses the round-1 conservative 57 fps "
                        "denominator; sourced central estimate is 19.5 fps "
                        "[12-34] (BASELINE.md derivation from the Swin "
                        "paper's published V100 throughput)"
                    ),
                    "vs_baseline_sourced": round(
                        fps / EST_A100_SOURCED_FPS, 3
                    ),
                    "data_loader_img_s": data_ips,
                    "data_loader_cached_img_s": data_cached_ips,
                    "roofline": roofline,
                    # single-chip numbers recorded by dev/probe_swinl_dino.py
                    # and dev/probe_profile_train.py on this v5e (2026-08-18;
                    # VERDICT r2 items 6+8) — static here so the headline run
                    # doesn't pay their ~15 min of compiles:
                    "recorded": {
                        "swinl_fwd_b4_ms": 58.2,
                        "swinl_img_s": 68.7,
                        # round-4 (2026-08-19): ms_deform_attn_xla4 (2x2
                        # patch-gather at big levels + fused one-hot MXU
                        # dots at small levels) + scanned enc/dec stacks
                        # — was 699.9 with per-pixel XLA gathers
                        "dino_r50_2000q_fwd_800x1216_ms": 249.0,
                        # round-5: full train step at the production
                        # resolution (VERDICT r5 item 2) — b=1, 800x1216,
                        # model+CDN+criterion+AdamW, loss 6291 -> 320
                        # (dev/logs/r5h.log level_only; itemized budget in
                        # dev/logs/r5i_dino_profile.log + COVERAGE.md):
                        "dino_train_step_800x1216_ms": 2742.0,
                        "dino_note": (
                            "xla4/xla5 deformable sampling (Mosaic "
                            "dynamic-gather kernels kill this relay "
                            "toolchain, dev/probe_dyngather.py). "
                            "Train step was 3551.6 before the round-5 "
                            "matched-mask criterion + msdeform "
                            "remat-save fixes."
                        ),
                        # round-5 train-step record (probe_profile_train
                        # chained instrument, bs4 480x640; r4's 212.0 was
                        # the tools/benchmark.py instrument — the same
                        # code read 257.9 on this instrument):
                        # 257.9 -> 191.2 (attn bwd kernel + tail remat,
                        # all-params) -> 151.1 adapter-only (the
                        # reference's shipped TRAIN_TYPE recipe) ->
                        # 137.2 adapter-only + DSCF rows bwd kernel;
                        # all-params with it: 169.7 (dev/logs/
                        # r5_train_all_dscf.log).
                        "train_step_bs4_ms": 169.7,
                        "train_step_bs4_adapter_ms": 137.2,
                        "train_img_s": 23.6,
                        "train_img_s_adapter": 29.1,
                        "train_mxu_floor_ms_4x_fwd": 51.3,
                        "train_bwd_vs_2x_fwd_bound": 1.31,
                    },
                    "fallback_errors": errors or None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
