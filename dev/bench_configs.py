#!/usr/bin/env python
"""Measure EVERY bench kernel config in one TPU process (apples-to-apples).

bench.py stops at the first config that compiles; this sweeps all of them
so config-ordering decisions are based on same-session numbers (the tunnel
day-to-day variance is larger than some config deltas).
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    only = sys.argv[1:] or None
    for name, env in bench.CONFIGS:
        if only and name not in only:
            continue
        try:
            r = bench.run_config(env)
            print(json.dumps({"config": name, **r}), flush=True)
        except Exception as e:
            tb = traceback.format_exc(limit=3)
            print(
                json.dumps(
                    {"config": name, "error": f"{type(e).__name__}: {str(e)[:400]}"}
                ),
                flush=True,
            )
            sys.stderr.write(tb + "\n")


if __name__ == "__main__":
    main()
