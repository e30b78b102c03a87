"""Light Schrödinger Bridge (LightSB) in JAX — the anomaly-separation core.

Capability parity with the reference modules/sb.py:14-227 (which is an
incomplete graft there: its imports `modeling.sb_modules` / geotorch are
missing from the repo — SURVEY.md §0).  Re-designed functionally:

  * Parameters are a plain pytree; every method is a pure function usable
    under jit/grad/vmap.
  * The non-diagonal (rotated-S) case replaces geotorch's orthogonal
    constraint with a QR re-parametrization: the stored matrix is
    unconstrained, Q = qr(raw) is the orthogonal factor.
  * The drift uses the closed-form exp-argument from the reference
    (sb.py:106-161) with jax.grad of the logsumexp.
  * Euler–Maruyama rollout is a lax.scan (one compiled program, any step
    count).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LightSBParams(NamedTuple):
    log_alpha_raw: jax.Array  # (n,)
    r: jax.Array  # (n, dim)
    S_log_diag: jax.Array  # (n, dim)
    S_rot_raw: Optional[jax.Array] = None  # (n, dim, dim), None = diagonal


def init_lightsb(
    key: jax.Array,
    dim: int = 512,
    n_potentials: int = 10,
    epsilon: float = 0.1,
    is_diagonal: bool = True,
    s_diag_init: float = 0.1,
) -> Tuple[LightSBParams, float]:
    k1, k2 = jax.random.split(key)
    params = LightSBParams(
        log_alpha_raw=epsilon * jnp.log(jnp.ones(n_potentials) / n_potentials),
        r=jax.random.normal(k1, (n_potentials, dim)),
        S_log_diag=jnp.log(s_diag_init * jnp.ones((n_potentials, dim))),
        S_rot_raw=None
        if is_diagonal
        else jax.random.normal(k2, (n_potentials, dim, dim)),
    )
    return params, epsilon


def init_r_by_samples(params: LightSBParams, samples: jax.Array) -> LightSBParams:
    assert samples.shape[0] == params.r.shape[0]
    return params._replace(r=jnp.asarray(samples))


def _rotation(params: LightSBParams) -> jax.Array:
    q, _ = jnp.linalg.qr(params.S_rot_raw)
    return q


def get_S(params: LightSBParams) -> jax.Array:
    """Diagonal: (n, dim).  Rotated: (n, dim, dim) = Q diag(e^l) Q^T."""
    diag = jnp.exp(params.S_log_diag)
    if params.S_rot_raw is None:
        return diag
    q = _rotation(params)
    return (q * diag[:, None, :]) @ q.transpose(0, 2, 1)


def get_log_alpha(params: LightSBParams, epsilon: float) -> jax.Array:
    return params.log_alpha_raw / epsilon


def _exp_argument(params: LightSBParams, epsilon: float, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mixture logits + component means for the posterior GMM at x.

    Returns (logits (B, n), r_x (B, n, dim))."""
    S = get_S(params)
    r = params.r
    log_alpha = get_log_alpha(params, epsilon)
    if params.S_rot_raw is None:
        x_S_x = jnp.einsum("bd,nd,bd->bn", x, S, x)
        r_x = r[None] + S[None] * x[:, None, :]
    else:
        Sx = jnp.einsum("nde,be->bnd", S, x)
        x_S_x = jnp.einsum("bd,bnd->bn", x, Sx)
        r_x = r[None] + Sx
    x_r = jnp.einsum("bd,nd->bn", x, r)
    logits = (x_S_x + 2 * x_r) / (2 * epsilon) + log_alpha[None]
    return logits, r_x


def sample_posterior(
    params: LightSBParams, epsilon: float, x: jax.Array, key: jax.Array
) -> jax.Array:
    """Sample y ~ posterior GMM given x (reference forward, sb.py:57-104)."""
    logits, r_x = _exp_argument(params, epsilon, x)
    k1, k2 = jax.random.split(key)
    comp = jax.random.categorical(k1, logits, axis=-1)  # (B,)
    mean = jnp.take_along_axis(r_x, comp[:, None, None], axis=1)[:, 0]  # (B, dim)
    noise = jax.random.normal(k2, mean.shape)
    if params.S_rot_raw is None:
        S = get_S(params)
        std = jnp.sqrt(epsilon * S)[comp]  # (B, dim)
        return mean + std * noise
    S = get_S(params)[comp]  # (B, dim, dim)
    chol = jnp.linalg.cholesky(epsilon * S)
    return mean + jnp.einsum("bde,be->bd", chol, noise)


def get_log_C(params: LightSBParams, epsilon: float, x: jax.Array) -> jax.Array:
    logits, _ = _exp_argument(params, epsilon, x)
    return jax.nn.logsumexp(logits, axis=-1)


def get_log_potential(
    params: LightSBParams, epsilon: float, x: jax.Array
) -> jax.Array:
    """log v(y) = log GMM(y) + logsumexp(log_alpha) (sb.py:183-210)."""
    S = get_S(params)
    r = params.r
    log_alpha = get_log_alpha(params, epsilon)
    d = x.shape[-1]
    if params.S_rot_raw is None:
        var = epsilon * S  # (n, dim)
        diff = x[:, None, :] - r[None]
        log_comp = -0.5 * (
            jnp.sum(diff**2 / var[None], axis=-1)
            + jnp.sum(jnp.log(2 * jnp.pi * var), axis=-1)[None]
        )
    else:
        cov = epsilon * S
        chol = jnp.linalg.cholesky(cov)
        diff = x[:, None, :] - r[None]
        chol_b = jnp.broadcast_to(chol[None], (x.shape[0],) + chol.shape)
        sol = jax.scipy.linalg.solve_triangular(
            chol_b, diff[..., None], lower=True
        )[..., 0]
        logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), -1)
        log_comp = -0.5 * (
            jnp.sum(sol**2, -1) + logdet[None] + d * jnp.log(2 * jnp.pi)
        )
    mix = jax.nn.log_softmax(log_alpha)
    return jax.nn.logsumexp(mix[None] + log_comp, axis=-1) + jax.nn.logsumexp(
        log_alpha
    )


def get_drift(
    params: LightSBParams, epsilon: float, x: jax.Array, t: jax.Array
) -> jax.Array:
    """SDE drift at (x, t) (reference sb.py:106-161, diagonal + rotated)."""
    S_diag = jnp.exp(params.S_log_diag)  # (n, dim)
    log_alpha = get_log_alpha(params, epsilon)
    S_log_det = jnp.sum(params.S_log_diag, axis=-1)  # (n,)

    def lse(x):
        A_diag = (t / (epsilon * (1 - t)))[:, None, None] + 1.0 / (
            epsilon * S_diag
        )[None]
        A_log_det = jnp.sum(jnp.log(A_diag), axis=-1)  # (B, n)
        if params.S_rot_raw is None:
            c = ((1.0 / (epsilon * (1 - t)))[:, None] * x)[:, None, :] + (
                params.r / (epsilon * S_diag)
            )[None]
            r_S_inv_r = jnp.sum(params.r**2 / S_diag, axis=-1) / epsilon  # (n,)
            c_A_inv_c = jnp.sum(c**2 / A_diag, axis=-1)
        else:
            q = _rotation(params)
            S_inv = (q * (1.0 / S_diag)[:, None, :]) @ q.transpose(0, 2, 1)
            A_inv_diag = 1.0 / A_diag  # (B, n, dim)
            c = ((1.0 / (epsilon * (1 - t)))[:, None] * x)[:, None, :] + (
                jnp.einsum("nde,ne->nd", S_inv, params.r) / epsilon
            )[None]
            cq = jnp.einsum("bnd,nde->bne", c, q)
            c_A_inv_c = jnp.sum(cq**2 * A_inv_diag, axis=-1)
            r_S_inv_r = (
                jnp.einsum("nd,nde,ne->n", params.r, S_inv, params.r) / epsilon
            )
        exp_arg = (
            log_alpha[None]
            - 0.5 * S_log_det[None]
            - 0.5 * A_log_det
            - 0.5 * r_S_inv_r[None]
            + 0.5 * c_A_inv_c
        )
        return jnp.sum(jax.nn.logsumexp(exp_arg, axis=-1))

    grad = jax.grad(lse)(x)
    return -x / (1 - t[:, None]) + epsilon * grad


def sample_euler_maruyama(
    params: LightSBParams,
    epsilon: float,
    x: jax.Array,
    key: jax.Array,
    n_steps: int,
) -> jax.Array:
    """SDE rollout; returns trajectory (B, n_steps + 1, dim) (sb.py:163-175)."""
    dt = 1.0 / n_steps

    def step(carry, k):
        x, t = carry
        drift = get_drift(params, epsilon, x, t)
        noise = jax.random.normal(k, x.shape)
        x = x + drift * dt + math.sqrt(dt) * jnp.sqrt(epsilon) * noise
        return (x, t + dt), x

    keys = jax.random.split(key, n_steps)
    t0 = jnp.zeros(x.shape[0])
    (_, _), traj = jax.lax.scan(step, (x, t0), keys)
    return jnp.concatenate([x[:, None], traj.transpose(1, 0, 2)], axis=1)


def sample_at_time_moment(
    params: LightSBParams,
    epsilon: float,
    x: jax.Array,
    t: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """Brownian-bridge interpolant between x and a posterior sample
    (sb.py:177-181)."""
    k1, k2 = jax.random.split(key)
    y = sample_posterior(params, epsilon, x, k1)
    t = jnp.broadcast_to(jnp.asarray(t), (x.shape[0], 1))
    noise = jax.random.normal(k2, x.shape)
    return t * y + (1 - t) * x + jnp.sqrt(t * (1 - t) * epsilon) * noise
