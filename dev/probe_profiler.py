#!/usr/bin/env python
"""Probe: does jax.profiler capture device-side TPU op events through the
axon relay?  If yes, per-fusion timings replace whole-model ablation sweeps
(each of which costs a 100-700 s compile).

Prints the trace dir contents and, if an .xplane.pb appears, the top TPU
ops by self-time (parsed with the bundled tensorflow profiler proto if
available, else just reports the file)."""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    log_dir = tempfile.mkdtemp(prefix="jaxtrace_")
    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def f(x):
        for _ in range(8):
            x = jnp.dot(x, x, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16
            )
        return x

    f(x).block_until_ready()
    with jax.profiler.trace(log_dir):
        for _ in range(4):
            f(x).block_until_ready()
    files = glob.glob(os.path.join(log_dir, "**"), recursive=True)
    print("trace dir:", log_dir)
    for p in sorted(files):
        if os.path.isfile(p):
            print(f"  {os.path.getsize(p):>10d}  {os.path.relpath(p, log_dir)}")
    xplanes = [p for p in files if p.endswith(".xplane.pb")]
    if not xplanes:
        print("NO XPLANE — profiler does not capture through this runtime")
        return
    # try to list plane names to see if device (TPU) planes exist
    try:
        from tensorflow.python.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception:
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2  # type: ignore
        except Exception:
            print("xplane present but no proto parser available;",
                  "check plane content manually")
            return
    with open(xplanes[0], "rb") as f_:
        space = xplane_pb2.XSpace.FromString(f_.read())
    for plane in space.planes:
        n_ev = sum(len(l.events) for l in plane.lines)
        print(f"plane: {plane.name!r} lines={len(plane.lines)} events={n_ev}")


if __name__ == "__main__":
    main()
