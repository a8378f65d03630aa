"""Tone mapping: exposure map + gamma, applied at EXPORT only.

Same constants as the reference (render_kernel.cpp:171-180): exposure 1.5,
gamma 2.2, tone = 1 - exp(-hdr * exposure), out = tone^(1/gamma).

Unlike the reference — which overwrites the accumulating framebuffer with the
tonemapped value, destroying linear accumulation (SURVEY.md §5 checkpoint
note) — accumulation here stays linear; tone mapping is a pure export step,
which is also what makes progressive/resumable rendering work.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_EXPOSURE = 1.5
DEFAULT_GAMMA = 2.2


def tonemap(hdr: jnp.ndarray, exposure: float = DEFAULT_EXPOSURE,
            gamma: float = DEFAULT_GAMMA) -> jnp.ndarray:
    """Exposure + gamma tone map of linear HDR radiance [...,3] -> [0,1]."""
    tone = 1.0 - jnp.exp(-jnp.maximum(hdr, 0.0) * exposure)
    return jnp.power(jnp.maximum(tone, 0.0), 1.0 / gamma)


def gamma_only(hdr: jnp.ndarray, gamma: float = DEFAULT_GAMMA) -> jnp.ndarray:
    """Plain gamma correction (reference image_io.cpp gamma utility)."""
    return jnp.power(jnp.clip(hdr, 0.0, 1.0), 1.0 / gamma)
