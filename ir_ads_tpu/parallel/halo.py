"""Spatial sharding with halo exchange — scaling single huge images across
chips (the vision analogue of context parallelism; SURVEY.md §5).

Two mechanisms, both over the mesh's ``space`` axis:

1. ``halo_exchange``: inside shard_map, trade boundary rows with spatial
   neighbours via ppermute (ICI neighbour traffic) so shifted-window
   attention / convs see across shard edges.
2. ``spatial_shard_apply``: run an NHWC function over an H-sharded image
   with halo pad/exchange/crop handled automatically.

For tiled sliding-window inference the simpler and faster strategy is tile
parallelism (tiles are already independent; see
evaluation/semseg_eval.make_sliding_window_fn with a mesh) — halo exchange
is for the case where one monolithic forward must span shards.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jax.Array, halo: int, axis_name: str = "space") -> jax.Array:
    """Pad a (local_H, W, C)… array with ``halo`` rows from spatial
    neighbours (zeros at the outer boundary).  Must run inside
    shard_map/pjit with ``axis_name`` bound.

    Returns (local_H + 2*halo, ...)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    if halo > x.shape[0]:
        raise ValueError(
            f"halo ({halo}) exceeds the local shard height ({x.shape[0]}); "
            "ppermute only reaches immediate neighbours — use fewer shards "
            "or a smaller halo"
        )

    top_rows = x[:halo]  # to send to the upper neighbour
    bot_rows = x[-halo:]  # to send to the lower neighbour

    # receive from below: neighbour idx+1 sends its top rows up
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # receive from above: neighbour idx-1 sends its bottom rows down
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    zeros = jnp.zeros_like(top_rows)
    upper = jnp.where(idx > 0, 1.0, 0.0)
    lower = jnp.where(idx < n - 1, 1.0, 0.0)
    from_above = from_above * upper.astype(x.dtype)
    from_below = from_below * lower.astype(x.dtype)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def spatial_shard_apply(
    fn: Callable,  # (B, H_local + 2*halo, W, C) -> same spatial shape
    mesh: Mesh,
    halo: int,
):
    """Wrap an NHWC-preserving function to run H-sharded over the ``space``
    mesh axis with automatic halo exchange and crop.

    The wrapped function receives the haloed local block and must return a
    tensor of the same (haloed) spatial height; the wrapper crops the halo
    off afterwards.  Suitable for conv stacks / window attention whose
    receptive field <= halo."""

    def sharded(x: jax.Array) -> jax.Array:
        def local_fn(xl):
            # xl: (B, H_local, W, C) local shard
            padded = jax.vmap(lambda t: halo_exchange(t, halo))(xl)
            out = fn(padded)
            return out[:, halo:-halo]

        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(None, "space"),
            out_specs=P(None, "space"),
        )(x)

    return sharded
