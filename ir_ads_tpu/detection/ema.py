"""EMA teacher state (reference detrex/modeling/ema.py:36-265).

The torch version swaps EMA weights into the live module around teacher
inference (apply_model_ema_and_restore).  Functionally there is nothing to
swap: the teacher is just a second parameter pytree passed to the same
apply_fn.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    return jax.tree.map(jnp.array, params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )
