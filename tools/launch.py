#!/usr/bin/env python
"""Fault-tolerant launcher with auto-requeue and checkpoint resume.

TPU-native equivalent of the reference's hydra+submitit SLURM launcher
(tools/hydra_train_net.py:3-34): runs a training command, and on failure or
preemption re-launches it pointing MODEL.RESUME at the latest checkpoint —
the elastic-recovery behavior the reference gets from SLURM requeue.

Works standalone (retry loop) or under any scheduler that restarts the
process (the resume logic is idempotent).  Multi-host JAX initialization is
driven by env (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) before the
training module is imported.

Usage:
  python tools/launch.py --max-restarts 5 -- \\
      python train_mm.py --cfg configs/nyu_rgbd.yaml
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def find_latest_checkpoint(save_dir: str) -> str:
    """Newest checkpoint directory containing a manifest."""
    best = ""
    best_t = -1.0
    for root, dirs, files in os.walk(save_dir):
        if "manifest.json" in files and "weights.msgpack" in files:
            t = os.path.getmtime(os.path.join(root, "manifest.json"))
            if t > best_t:
                best, best_t = root, t
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-restarts", type=int, default=5)
    p.add_argument("--save-dir", default="output")
    p.add_argument("--backoff", type=float, default=30.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    args = p.parse_args()
    cmd = [c for c in args.cmd if c != "--"]
    if not cmd:
        p.error("no command given after --")

    for attempt in range(args.max_restarts + 1):
        env = dict(os.environ)
        run_cmd = list(cmd)
        if attempt > 0:
            ckpt = find_latest_checkpoint(args.save_dir)
            if ckpt:
                env["IR_ADS_RESUME"] = ckpt
                print(f"[launch] restart {attempt}: resuming from {ckpt}")
            else:
                print(f"[launch] restart {attempt}: no checkpoint found, cold start")
        code = subprocess.call(run_cmd, env=env)
        if code == 0:
            print("[launch] completed successfully")
            return 0
        print(f"[launch] exited with code {code}")
        if attempt < args.max_restarts:
            time.sleep(args.backoff)
    print("[launch] giving up after max restarts")
    return 1


if __name__ == "__main__":
    sys.exit(main())
