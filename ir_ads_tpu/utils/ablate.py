"""Trace-time ablation switches for whole-model perf attribution.

Round-1 lesson (see memory/COVERAGE notes): isolated micro-benchmarks of
modules mislead — XLA's surrounding fusion changes costs in context.  The
reliable method is ablation: stub a component INSIDE the full forward and
time the whole model.  Components check ``ablated("tag")`` at trace time;
set ``IR_ADS_ABLATE=tag1,tag2`` before running a dev timing script.

Never set in production — drivers don't, and the flag defaults to empty.
"""

from __future__ import annotations

import os


def ablated(tag: str) -> bool:
    return tag in os.environ.get("IR_ADS_ABLATE", "").split(",")
