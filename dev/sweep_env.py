#!/usr/bin/env python
"""Same-session whole-forward timing under DIFFERENT env configs.

dev/ablate_full.py varies IR_ADS_ABLATE stubs within one env; this varies
the env itself (kernel selection / layout knobs), retracing the forward per
variant in ONE TPU process.  Env is read at trace time throughout
ir_ads_tpu, so setting os.environ between jit traces is sufficient; params
are initialized once (the param tree is kernel-independent).

Usage:
  python dev/sweep_env.py                       # built-in variant list
  python dev/sweep_env.py 'tag=K=V,K2=V2' ...   # explicit variants
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = {
    "IR_ADS_SWIN_ATTN": "pallas4,pallas4,pallas6,pallas6",
    "IR_ADS_DSCF_ATTN": "pallas3,pallas3,pallas3,xla",
    "IR_ADS_FFN": "fused",
    "IR_ADS_SWIN_PACKED": "1",
    "IR_ADS_DSCF_PACKED": "1,1,1,0",
}

VARIANTS = [
    ("base", {}),
    ("v7_01", {"IR_ADS_SWIN_ATTN": "pallas7,pallas7,pallas6,pallas6"}),
    ("wide_23", {"IR_ADS_SWIN_PACKED": "1,1,2,2"}),
    (
        "v7+wide23",
        {
            "IR_ADS_SWIN_ATTN": "pallas7,pallas7,pallas6,pallas6",
            "IR_ADS_SWIN_PACKED": "1,1,2,2",
        },
    ),
]


def parse_cli(args):
    out = []
    for a in args:
        tag, _, kvs = a.partition("=")
        env = {}
        for kv in kvs.split(";"):
            if kv:
                k, _, v = kv.partition("=")
                env[k] = v
        out.append((tag, env))
    return out


def make_calibrator():
    """Chained-matmul device-throughput probe.

    The v5e ramps clocks from idle (first measurement after a pause can read
    8-12x slow) and the axon relay can degrade under load.  Sustained 4096^2
    bf16 chained matmuls should read ~90+ TFLOP/s on a healthy warm chip
    (see .claude/skills/verify/SKILL.md); we warm until >=2 consecutive
    reads above CAL_MIN_TFLOPS and stamp every measurement with the
    calibration so degraded windows are visible in the record.
    """
    import jax
    import jax.numpy as jnp

    n = 4096
    x = jax.random.normal(jax.random.PRNGKey(7), (n, n), jnp.bfloat16)
    f = jax.jit(
        lambda a, k: jax.lax.fori_loop(0, k, lambda i, y: (y @ y) * 1e-2, a),
        static_argnums=1,
    )
    float(jnp.sum(f(x, 2)))

    def measure():
        t0 = time.time()
        float(jnp.sum(f(x, 2)))
        t2 = time.time() - t0
        t0 = time.time()
        float(jnp.sum(f(x, 34)))
        t34 = time.time() - t0
        dt = max((t34 - t2) / 32, 1e-9)
        return 2 * n**3 / dt / 1e12

    return measure


def warm_device(measure, min_tflops, tries=20):
    good, last = 0, 0.0
    for _ in range(tries):
        last = measure()
        good = good + 1 if last >= min_tflops else 0
        if good >= 2:
            return last
    return last


def main():
    iters = int(os.environ.get("SWEEP_ITERS", "8"))
    # ms below divides by (iters - 2): 2 iters would ZeroDivisionError and
    # fewer would go negative (ADVICE r3)
    iters = max(iters, 3)
    batch = int(os.environ.get("SWEEP_BATCH", "8"))
    min_tflops = float(os.environ.get("CAL_MIN_TFLOPS", "80"))
    variants = parse_cli(sys.argv[1:]) or VARIANTS

    for k, v in BASE.items():
        os.environ[k] = v

    import jax
    import jax.numpy as jnp

    from ir_ads_tpu.models.cmnext import CMNeXt
    from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

    setup_compilation_cache()

    calibrate = make_calibrator()
    cal0 = warm_device(calibrate, min_tflops)
    print(json.dumps({"cal_tflops_warm": round(cal0, 1)}), flush=True)

    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=40, dtype=jnp.bfloat16,
        mmst_mask=False,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rgb = jax.random.normal(k1, (batch, 480, 640, 3), jnp.bfloat16)
    dte = jax.random.normal(k2, (batch, 480, 640, 3), jnp.bfloat16)
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    )()
    jax.block_until_ready(variables)
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)

    ref_sum = None
    for tag, env in variants:
        full = dict(BASE)
        full.update(env)
        for k, v in full.items():
            os.environ[k] = v

        @functools.partial(jax.jit, static_argnums=(0,))
        def many(n, v, r, d):
            def body(carry, _):
                rr, dd, _ = carry
                out = model.apply(v, rr, dd, train=False)[0]
                s = jnp.sum(out).astype(jnp.float32)
                z = (s * 0.0).astype(rr.dtype)
                return (rgb + z, dte + z, s), None

            (_, _, s_last), _ = jax.lax.scan(
                body, (r, d, jnp.float32(0)), None, length=n
            )
            return s_last

        try:
            t0 = time.time()
            s2 = float(many(2, variables, rgb, dte))
            compile_s = time.time() - t0
            # CRITICAL: warm the length-N executable too — n is a static
            # argnum, so many(iters) is a DIFFERENT program whose first
            # call pays ~100-440 s of remote compile.  The 2026-08-19
            # sweeps skipped this and timed compilation: every variant
            # read (compile_s/6) ≈ 15-25 "s/forward" while the device
            # plane showed 77 ms.  bench.py always warmed both lengths.
            t0 = time.time()
            float(many(iters, variables, rgb, dte))
            compile_s += time.time() - t0
            sN, ms, cal = None, None, 0.0
            for attempt in range(4):
                cal = warm_device(calibrate, min_tflops, tries=6)
                t0 = time.time()
                float(many(2, variables, rgb, dte))
                t_short = time.time() - t0
                t0 = time.time()
                sN = float(many(iters, variables, rgb, dte))
                t_long = time.time() - t0
                ms = (t_long - t_short) / (iters - 2) * 1000.0
                cal_after = calibrate()
                if cal >= min_tflops and cal_after >= min_tflops:
                    cal = min(cal, cal_after)
                    break
                cal = min(cal, cal_after)
            # 1e-2 relative for bf16 accumulation order differences; the
            # old 5e-2 + 1.0 abs let genuinely mis-masked variants pass
            # (ADVICE r3)
            ok = ref_sum is None or abs(sN - ref_sum) < abs(ref_sum) * 1e-2
            if ref_sum is None:
                ref_sum = sN
            print(
                json.dumps(
                    {
                        "variant": tag,
                        "fwd_ms": round(ms, 2),
                        "compile_s": round(compile_s, 1),
                        "cal_tflops": round(cal, 1),
                        "checksum": sN,
                        "matches_base": ok,
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {"variant": tag, "error": f"{type(e).__name__}: {str(e)[:300]}"}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
