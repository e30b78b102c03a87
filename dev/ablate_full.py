#!/usr/bin/env python
"""Whole-model ablation timing for the bench workload (B=8 480x640 bf16).

Times the FULL CMNeXt forward (fused head only — same DCE as bench.py) with
components stubbed via IR_ADS_ABLATE, using device-side chained-scan timing
with a two-point slope (see bench.py notes: block_until_ready lies through
the relay; constant costs cancel in the slope).

Usage:
  python dev/ablate_full.py                      # baseline
  python dev/ablate_full.py --ablate dscf        # stub all DSCF blocks
  python dev/ablate_full.py --ablate dscf_rpe    # keep DSCF, zero rpe bias
  python dev/ablate_full.py --ablate blocks512   # stub 18-block stage
  python dev/ablate_full.py --list               # known tags

The per-component cost = baseline_ms - ablated_ms (in context).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json
import os
import time

TAGS = [
    "",  # baseline
    "dscf", "dscf_rpe", "dscf_sample", "mpg", "head",
    "dscf_fuseq", "dscf_offsets", "dscf_wgt", "dscf_attncore", "tail",
    "blocks128", "blocks256", "blocks512", "blocks1024",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ablate", default="", help="comma list of tags")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", default="480x640")
    p.add_argument("--list", action="store_true")
    p.add_argument(
        "--env", action="append", default=[],
        help="extra KEY=VAL env (e.g. IR_ADS_INT8=1), applied before tracing",
    )
    p.add_argument(
        "--dual", action="store_true",
        help="dual_batch=True: both modality streams in one stage pass",
    )
    p.add_argument(
        "--each", default="",
        help="semicolon-separated list of ablate tags measured ONE AT A "
        "TIME in this process (saves the ~2.5 min tunnel startup per tag); "
        "'' = baseline.  Semicolon, not comma: a single tag may itself be "
        "a comma list of stubs applied together",
    )
    args = p.parse_args()
    if args.list:
        print(TAGS)
        return
    os.environ["IR_ADS_ABLATE"] = args.ablate
    for kv in args.env:
        k, _, v = kv.partition("=")
        os.environ[k] = v

    import jax  # noqa: F401  (tunnel init)

    if args.each:
        for tag in args.each.split(";"):
            # tag syntax: "ablate_tag[@KEY=VAL[@KEY=VAL...]]" — env vars
            # after '@' are applied before this measurement and PERSIST for
            # later tags (re-state them to sweep).  _measure rebuilds the
            # model and retraces per tag, so trace-time env is honored.
            parts = tag.split("@")
            for kv in parts[1:]:
                k, _, v = kv.partition("=")
                os.environ[k] = v
            os.environ["IR_ADS_ABLATE"] = parts[0]
            try:
                _measure(args, tag)
            except Exception as e:
                import json as _json

                print(
                    _json.dumps(
                        {"ablate": tag,
                         "error": f"{type(e).__name__}: {str(e)[:200]}"}
                    ),
                    flush=True,
                )
    else:
        _measure(args, args.ablate)


def _measure(args, tag):
    import jax
    import jax.numpy as jnp

    from ir_ads_tpu.models.cmnext import CMNeXt
    from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

    setup_compilation_cache()

    h, w = (int(v) for v in args.size.split("x"))
    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=40,
        dtype=jnp.bfloat16, mmst_mask=False,
        backbone_kwargs=dict(dual_batch=True) if args.dual else None,
    )
    # DISTINCT keys: identical rgb/dte once cost a 35 ms phantom in the mpg
    # ablation — with the per-modality prompts stubbed, the two shared-weight
    # streams become structurally identical and XLA CSE dedupes the entire
    # second trunk pass.  Never benchmark a shared-weight multi-stream model
    # with identical stream inputs.
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # FLAT (B, H, W*3) lane-dense feed (round-4, see bench.py): honored so
    # the feed A/B can ride this harness instead of two full bench runs
    flat = os.environ.get("IR_ADS_FLAT_INPUT", "0") not in ("", "0")
    shape = (args.batch, h, w * 3) if flat else (args.batch, h, w, 3)
    rgb = jax.random.normal(k1, shape, jnp.bfloat16)
    dte = jax.random.normal(k2, shape, jnp.bfloat16)
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    )()
    init_s = time.time() - t0

    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, v, r, d):
        def body(carry, _):
            r, d, _ = carry
            out = model.apply(v, r, d, train=False)[0]
            s = jnp.sum(out).astype(jnp.float32)
            # chain BOTH streams through the carry: a loop-invariant dte
            # lets XLA hoist the whole dte trunk out of the scan whenever
            # an ablation disconnects the streams (the "mpg saves 33 ms"
            # artifact was exactly one hoisted trunk pass)
            z = (s * 0.0).astype(r.dtype)
            return (rgb + z, dte + z, s), None

        (_, _, s_last), _ = jax.lax.scan(
            body, (r, d, jnp.float32(0)), None, length=n
        )
        return s_last

    t0 = time.time()
    float(many(2, variables, rgb, dte))
    compile_s = time.time() - t0
    float(many(args.iters, variables, rgb, dte))  # compile long program

    t0 = time.time()
    float(many(2, variables, rgb, dte))
    t_short = time.time() - t0
    t0 = time.time()
    float(many(args.iters, variables, rgb, dte))
    t_long = time.time() - t0
    ms = 1000.0 * (t_long - t_short) / (args.iters - 2)
    print(json.dumps({
        "ablate": tag, "forward_ms": round(ms, 2),
        "batch": args.batch, "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "env": args.env or None,
    }), flush=True)


if __name__ == "__main__":
    main()
