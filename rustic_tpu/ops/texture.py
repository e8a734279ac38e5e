"""Bilinear texture sampling as explicit gathers.

TPUs have no texture units; the reference's CPU polyfill
(reference: shared_structs/src/image_polyfill.rs:38-55) *is* the right
model: scale UV by the image size, gather the four neighboring texels,
lerp. We use clamp-to-edge addressing — the reference is internally
inconsistent (GPU sampler clamps, src/trace.rs:105; CPU polyfill wraps,
image_polyfill.rs:33-35); we standardize on the GPU behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample image [H, W, C] at uv [..., 2] in [0, 1].

    Matches the polyfill's exact weights: floor/ceil texel pair with
    frac(uv * size) interpolation (image_polyfill.rs:38-55).
    """
    h, w = image.shape[0], image.shape[1]
    flat = image.reshape(h * w, image.shape[2])
    scaled = uv * jnp.asarray([w, h], jnp.float32)
    frac = scaled - jnp.floor(scaled)
    x0 = jnp.floor(scaled[..., 0]).astype(jnp.int32)
    y0 = jnp.floor(scaled[..., 1]).astype(jnp.int32)
    x1 = jnp.ceil(scaled[..., 0]).astype(jnp.int32)
    y1 = jnp.ceil(scaled[..., 1]).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, w - 1)
    x1 = jnp.clip(x1, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    y1 = jnp.clip(y1, 0, h - 1)

    c00 = flat[y0 * w + x0]
    c10 = flat[y0 * w + x1]
    c01 = flat[y1 * w + x0]
    c11 = flat[y1 * w + x1]
    tx = frac[..., 0:1]
    ty = frac[..., 1:2]
    top = c00 * (1.0 - tx) + c10 * tx
    bot = c01 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty


def sample_atlas(atlas: jnp.ndarray, uvst: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample an atlas sub-rect: atlas_uv = uvst.xy + uv * uvst.zw
    (reference: kernels/src/bsdf.rs:356-357)."""
    scaled = uvst[..., 0:2] + uv * uvst[..., 2:4]
    return sample_bilinear(atlas, scaled)
