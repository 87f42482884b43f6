"""On-device image normalization for uint8 canvases.

Hosts ship raw uint8 canvases (4x less H2D than f32 — and in SAD training
ONE canvas serves both the student and teacher normalization streams, 8x
less); the device applies the fused (x - mean*div) * (1/(std*div)) and
forces the canvas padding outside each image's content extent back to
exactly 0.0 — the reference normalizes on the host and pads the canvas
AFTER normalization (lib/utils/blob.py:40 im_list_to_blob), so
normalized-zero padding is the semantic. Bit-identical to the host fast
path (data/minibatch.normalize_image): the same two f32 ops.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def content_mask(shape, content_hw) -> jnp.ndarray:
    """(N,H,W,1) f32 mask: 1 inside each image's (h,w) content extent."""
    n, h, w = shape[0], shape[1], shape[2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (1, h, 1, 1), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w, 1), 2)
    m = (yy < content_hw[:, 0, None, None, None]) & (
        xx < content_hw[:, 1, None, None, None]
    )
    return m.astype(jnp.float32)


def normalize_u8_on_device(
    images: jnp.ndarray,  # (N,H,W,3) uint8
    pixel_means: Sequence[float],
    pixel_div: float,
    pixel_std: Sequence[float],
    content_hw: Optional[jnp.ndarray] = None,  # (N,2) resized content h,w
    mask: Optional[jnp.ndarray] = None,  # precomputed content_mask
) -> jnp.ndarray:
    bias = jnp.asarray([m * pixel_div for m in pixel_means], jnp.float32)
    inv = jnp.asarray([1.0 / (s * pixel_div) for s in pixel_std], jnp.float32)
    out = (images.astype(jnp.float32) - bias) * inv
    if mask is None and content_hw is not None:
        mask = content_mask(images.shape, content_hw)
    if mask is not None:
        out = out * mask
    return out
