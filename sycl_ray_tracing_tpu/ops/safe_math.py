"""Differentiation-safe math helpers.

The integrator must be differentiable end-to-end.  Ops like sqrt(0), acos(±1),
x/0 and normalize(0) have NaN/Inf *gradients* even when the forward value is
masked out by a ``jnp.where`` later — the classic JAX double-where problem.
Every potentially singular op in the renderer goes through these wrappers so
that `jax.grad` of the image w.r.t. materials / env-map / camera stays finite.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7          # Möller–Trumbore parallel-ray epsilon (reference triangle.h:19)
RAY_OFFSET = 1e-4   # shadow/continuation ray origin offset (reference render_kernel.cpp:139)


def safe_sqrt(x):
    """sqrt clamped at 0 with a finite gradient at 0."""
    return jnp.sqrt(jnp.maximum(x, 1e-20))


def safe_div(num, den, eps: float = 1e-12):
    """num/den with |den| floored away from 0 (sign-preserving)."""
    mag = jnp.maximum(jnp.abs(den), eps)
    return num / jnp.where(den < 0, -mag, mag)


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7))


def dot(a, b):
    """Batched 3-vector dot over the last axis, keeps batch shape."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return safe_sqrt(dot(v, v))


def normalize(v):
    """v / |v| with a guard so the gradient at |v|=0 is finite."""
    return v / length(v)[..., None]


def reflect(v, n):
    """Reflect direction ``v`` about normal ``n`` (both [...,3])."""
    return 2.0 * dot(n, v)[..., None] * n - v


def luminance(rgb):
    """Reference luminance weights 0.3086/0.6094/0.0820 (color.h:78-81)."""
    return 0.3086 * rgb[..., 0] + 0.6094 * rgb[..., 1] + 0.0820 * rgb[..., 2]


def where3(mask, a, b):
    """Select full RGB rows by a [...]-shaped mask."""
    return jnp.where(mask[..., None], a, b)
