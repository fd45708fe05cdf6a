"""Total-Variation denoising (Chambolle's dual projection algorithm).

The reference imports skimage's ``denoise_tv_chambolle`` (ref
deconvolve.py:63) and keeps a TV-denoise output gallery (img/TV-denoise);
this is the TPU-native implementation: Chambolle 2004's fixed-point dual
iteration, fully jitted as a ``lax.fori_loop`` so the whole denoise runs
on-chip.

    min_u  ||u - f||^2 / (2*weight) + TV(u)

solved in the dual: p_{t+1} = (p + tau grad(div p - f/weight)) /
(1 + tau |grad(...)|), u = f - weight * div(p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["tv_denoise"]


def _grad(u):
    """Forward differences with replicated edge (zero at the far border)."""
    dy = jnp.concatenate([u[1:] - u[:-1], jnp.zeros_like(u[:1])], axis=0)
    dx = jnp.concatenate(
        [u[:, 1:] - u[:, :-1], jnp.zeros_like(u[:, :1])], axis=1
    )
    return dy, dx


def _div(py, px):
    """Adjoint of -_grad: backward differences with boundary handling."""
    dy = jnp.concatenate([py[:1], py[1:-1] - py[:-2], -py[-2:-1]], axis=0)
    dx = jnp.concatenate(
        [px[:, :1], px[:, 1:-1] - px[:, :-2], -px[:, -2:-1]], axis=1
    )
    return dy + dx


@functools.partial(jax.jit, static_argnames=("iterations",))
def _denoise(f, weight, iterations):
    # tau = 1/4: what skimage uses in practice (the parity target); the
    # bound PROVEN in Chambolle 2004 is 1/8, 1/4 is its observed-stable
    # working value
    tau = 0.25

    def body(_, state):
        py, px = state
        gy, gx = _grad(_div(py, px) - f / weight)
        mag = jnp.sqrt(gy * gy + gx * gx)
        denom = 1.0 + tau * mag
        return ((py + tau * gy) / denom, (px + tau * gx) / denom)

    py = jnp.zeros_like(f)
    px = jnp.zeros_like(f)
    py, px = lax.fori_loop(0, iterations, body, (py, px))
    return f - weight * _div(py, px)


def tv_denoise(image, weight: float = 0.1, iterations: int = 50):
    """Denoise (H, W) or (H, W, C) images.

    Each channel's dual field is independent (skimage's channel-wise
    default): ``_grad``/``_div`` only touch axes 0/1 and the projection is
    elementwise, so an (H, W, C) array runs all channels in ONE fused XLA
    program — bit-identical to solving channels separately."""
    image = jnp.asarray(image, jnp.float32)
    return _denoise(image, float(weight), int(iterations))
