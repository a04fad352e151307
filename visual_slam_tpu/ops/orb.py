"""Oriented rBRIEF descriptors, pure JAX.

TPU-native replacement for cv2.ORB's orientation + descriptor stages
(reference: visual_slam/feature/feature.py:21-47, 180-223): intensity-centroid
orientation over a circular patch and a rotated 256-pair binary test pattern,
packed into 8 uint32 words per keypoint.

The sampling pattern is generated from a fixed-seed isotropic Gaussian (the
original BRIEF construction) rather than copying OpenCV's learned table — the
descriptor is not bit-compatible with cv2.ORB, and doesn't need to be: matching
happens within this framework, and the parity target is geometry (SURVEY.md §7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
RADIUS = PATCH // 2  # 15
PATTERN_CLIP = 12  # keep test points within rotation-safe radius
N_BITS = 256
N_WORDS = N_BITS // 32


def _make_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 2, 2) float32: 256 pairs of (y, x) offsets, Gaussian sigma =
    PATCH/5 (BRIEF G-II construction), clipped to a rotation-safe disk."""
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    norms = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norms > PATTERN_CLIP, pts * (PATTERN_CLIP / norms), pts)
    return pts.astype(np.float32)


PATTERN = jnp.asarray(_make_pattern())  # (256, 2 points, 2=(y,x))

# Circular mask for the intensity centroid (disk of radius 15).
_yy, _xx = np.mgrid[-RADIUS : RADIUS + 1, -RADIUS : RADIUS + 1]
DISK = jnp.asarray((_yy**2 + _xx**2 <= RADIUS**2).astype(np.float32))
YY = jnp.asarray(_yy.astype(np.float32))
XX = jnp.asarray(_xx.astype(np.float32))


def extract_patches(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Gather (K, 31, 31) patches centred on integer keypoints ``yx (K, 2)``.

    Out-of-bounds regions replicate the edge (keypoints near the border are
    filtered out upstream by the detector's interior mask anyway)."""
    p = jnp.pad(img, RADIUS + 1, mode="edge")

    def one(c):
        return jax.lax.dynamic_slice(p, (c[0] + 1, c[1] + 1), (PATCH, PATCH))

    return jax.vmap(one)(yx)


def orientations(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch: (K, 31, 31) -> (K,) radians."""
    w = patches * DISK[None]
    m10 = jnp.sum(w * XX[None], axis=(-2, -1))
    m01 = jnp.sum(w * YY[None], axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _bilinear(patch: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample a (31, 31) patch at float coords (already shifted to
    patch frame, i.e. in [0, 30])."""
    y0 = jnp.clip(jnp.floor(ys), 0, PATCH - 2)
    x0 = jnp.clip(jnp.floor(xs), 0, PATCH - 2)
    fy = ys - y0
    fx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    v00 = patch[y0, x0]
    v01 = patch[y0, x0 + 1]
    v10 = patch[y0 + 1, x0]
    v11 = patch[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF: (K, 31, 31) blurred patches + (K,) angles -> (K, 8) uint32."""
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    # Rotate pattern offsets per keypoint: (K, 256, 2, 2)
    py = PATTERN[None, :, :, 0]  # (1, 256, 2)
    px = PATTERN[None, :, :, 1]
    ry = s[:, None, None] * px + c[:, None, None] * py + RADIUS
    rx = c[:, None, None] * px - s[:, None, None] * py + RADIUS

    def sample_one(patch, ys, xs):
        return _bilinear(patch, ys.reshape(-1), xs.reshape(-1)).reshape(N_BITS, 2)

    vals = jax.vmap(sample_one)(patches, ry, rx)  # (K, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K, 256)
    # Pack into 8 uint32 words.
    b = bits.reshape(-1, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(K, 8) uint32 -> (K, 256) 0/1 in ``dtype`` (bf16 feeds the MXU
    Hamming-distance matmul; integers <= 256 are exact in bf16's 8-bit
    mantissa and the MXU accumulates in f32)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], N_BITS).astype(dtype)
