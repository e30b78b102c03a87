"""PreciseBN: recompute BatchNorm statistics over N data batches.

Reference: detectron2/engine/hooks.py (PreciseBN :566-640, which wraps
fvcore's update_bn_stats) and the Rethinking-BatchNorm project
(detectron2/projects/Rethinking-BatchNorm/) whose experiments rely on it.

Flax keeps BN running stats in the ``batch_stats`` collection, so the
TPU-native form is a pure function: run ``num_iters`` forward passes in
train mode (mutable batch_stats) with momentum arranged to produce the
TRUE average over the seen batches, and return updated variables.

Reference semantics (fvcore update_bn_stats): running_mean is reset and each
batch's stats are averaged uniformly; we achieve the same by accumulating
E[x] and E[x^2] across batches and writing mean/var back.
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp


def recompute_bn_stats(
    apply_fn: Callable,
    variables: dict,
    batches: Iterable[Tuple],
    *,
    momentum: float,
    num_iters: int = 200,
) -> dict:
    """Return ``variables`` with ``batch_stats`` replaced by the uniform
    average of per-batch statistics over up to ``num_iters`` batches.

    ``momentum`` is REQUIRED and must equal the BatchNorm momentum used by
    every BN layer in the model (flax default 0.99; ir_ads_tpu heads use
    0.9).  The inversion below is exact only for that value — a silent
    mismatch would corrupt the recovered statistics.

    ``apply_fn(variables, *batch, train=True, mutable=["batch_stats"])``
    must return ``(outputs, {"batch_stats": ...})`` — the standard flax
    train-mode call."""
    if not (0.0 < momentum < 1.0):
        raise ValueError(f"momentum must be in (0,1), got {momentum}")
    if "batch_stats" not in variables:
        return variables

    running = None
    seen = 0
    for i, batch in enumerate(batches):
        if i >= num_iters:
            break
        _, mutated = apply_fn(
            variables, *batch, train=True, mutable=["batch_stats"]
        )
        stats = mutated["batch_stats"]
        # momentum-free: extract the *batch* stats this step wrote.  flax BN
        # writes ra = momentum*ra + (1-momentum)*batch; recover batch stats
        # exactly by re-running with the old ra and inverting is fragile —
        # instead accumulate the mutated stats uniformly, equivalent to
        # fvcore's running-average-of-averages when momentum is applied to a
        # fixed starting point (we reset between iterations by always
        # applying from the ORIGINAL variables, so each mutated value is
        # old*m + batch*(1-m), a fixed affine map; averaging and inverting
        # the map yields the uniform batch average).
        if running is None:
            running = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), stats
            )
        else:
            running = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), running, stats
            )
        seen += 1

    if seen == 0:
        return variables

    avg_mutated = jax.tree_util.tree_map(lambda a: a / seen, running)
    # invert the affine map: mutated_avg = old*m + batch_avg*(1-m)
    # flax BatchNorm default momentum 0.99; our heads use 0.9.  We cannot
    # read momentum generically here, so callers should pass batches through
    # models whose BN momentum is constant; solve with m read from the delta
    # when old stats are zero-mean/unit-var fresh inits, else assume the
    # conservative exact route: batch_avg = (mutated_avg - old*m) / (1-m).
    old = variables["batch_stats"]

    m = momentum

    def invert(o, ma):
        return (ma - o.astype(jnp.float32) * m) / (1.0 - m)

    batch_avg = jax.tree_util.tree_map(invert, old, avg_mutated)
    new_vars = dict(variables)
    new_vars["batch_stats"] = jax.tree_util.tree_map(
        lambda o, b: b.astype(o.dtype), old, batch_avg
    )
    return new_vars
