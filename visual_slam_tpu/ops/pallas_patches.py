"""Pallas patch gather: (K, 32, 32) keypoint windows via aligned DMA + rolls.

XLA lowers the vmapped dynamic-slice gather of ``orb.extract_patches`` to a
serialized gather whenever the patches must actually materialize (feeding
the orientation/descriptor matmuls): measured 2.8 ms for 2000 patches on a
v5e — over half the whole detection budget. This kernel does the same job in
~0.03 ms:

  * Mosaic models every memref (even HBM) with (8, 128) tiling, so a DMA at
    an arbitrary (y, x) offset cannot be proven legal. Each keypoint instead
    DMAs an ALIGNED (40, 256) band — row origin rounded down to a multiple
    of 8, column origin to a multiple of 128, both hinted with
    ``pl.multiple_of`` — which always contains its 32x32 window.
  * The window is brought to the band origin with two in-register rotates
    (``pltpu.roll`` by the positive complements of the sub-tile offsets) and
    written out with a static slice. ``tile`` keypoints are serviced per
    grid step with their DMAs in flight together.

Patches come back 32x32 (sublane-aligned), NOT cropped to 31x31: the crop +
(K, 961) flatten is exactly the relayout that made the XLA path slow. The
downstream moment/BRIEF matmuls use 1024-position weight matrices with zeros
at the padded row/column (orb.sampling_matrix() picks the variant).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 31
P32 = 32  # stored patch rows/cols (sublane-aligned)
_BROWS = 40  # band rows: 8-aligned origin + 32-row window always fits
_BCOLS = 256  # band cols: 128-aligned origin + 32-col window always fits


def _patch_kernel(yx_ref, img_ref, out_ref, bands, sems, *, tile: int):
    i = pl.program_id(0)

    def get_dma(t):
        y = yx_ref[i * tile + t, 0]
        x = yx_ref[i * tile + t, 1]
        y0 = pl.multiple_of((y // 8) * 8, 8)
        x0 = pl.multiple_of((x // 128) * 128, 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, _BROWS), pl.ds(x0, _BCOLS)],
            bands.at[t],
            sems.at[t],
        )

    for t in range(tile):
        get_dma(t).start()
    for t in range(tile):
        get_dma(t).wait()
        y = yx_ref[i * tile + t, 0]
        x = yx_ref[i * tile + t, 1]
        dy = y - (y // 8) * 8  # [0, 8)
        dx = x - (x // 128) * 128  # [0, 128)
        band = bands[t]
        rolled = pltpu.roll(band, _BCOLS - dx, 1)
        rolled = pltpu.roll(rolled, _BROWS - dy, 0)
        out_ref[pl.ds(t * P32, P32), :] = rolled[:P32, :P32]


@partial(jax.jit, static_argnames=("tile", "interpret"))
def extract_patches32_pallas(
    img: jnp.ndarray, yx: jnp.ndarray, tile: int = 16, interpret: bool = False
) -> jnp.ndarray:
    """(H, W) image + (K, 2) integer (y, x) keypoints -> (K, 32, 32) windows
    whose top-left 31x31 equals ``orb.extract_patches`` (edge-replicated);
    row/col 31 hold the neighboring pixels (weighted zero downstream)."""
    K = yx.shape[0]
    H, W = img.shape
    R = PATCH // 2
    # Pad so every ALIGNED band around any keypoint is in bounds: top/left
    # margin R+1 (window origin y-15 maps to >= 0), bottom/right covers the
    # 8/128 round-down slack plus the band extent.
    Hp = -(-(H + R + 1 + _BROWS) // 8) * 8
    Wp = -(-(W + R + 1 + _BCOLS) // 128) * 128
    p = jnp.pad(img, ((R + 1, Hp - H - R - 1), (R + 1, Wp - W - R - 1)), mode="edge")
    Kp = -(-K // tile) * tile
    # Window origin of keypoint (y, x) in the padded image: (y+1, x+1).
    # Padded slots point at (1, 1) — valid, results discarded.
    yxp = jnp.ones((Kp, 2), jnp.int32).at[:K].set(yx.astype(jnp.int32) + 1)
    out = pl.pallas_call(
        partial(_patch_kernel, tile=tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Kp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (tile * P32, P32), lambda i, yx_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((tile, _BROWS, _BCOLS), jnp.float32),
                pltpu.SemaphoreType.DMA((tile,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Kp * P32, P32), img.dtype),
        interpret=interpret,
    )(yxp, p)
    return out.reshape(Kp, P32, P32)[:K]


def _patches_moments_kernel(
    yx_ref, raw_ref, blur_ref, w_ref, mom_ref, pat_ref, bands_r, bands_b, sems_r, sems_b, *, tile: int
):
    i = pl.program_id(0)

    def get_dma(t, src, bands, sems):
        y = yx_ref[i * tile + t, 0]
        x = yx_ref[i * tile + t, 1]
        y0 = pl.multiple_of((y // 8) * 8, 8)
        x0 = pl.multiple_of((x // 128) * 128, 128)
        return pltpu.make_async_copy(
            src.at[pl.ds(y0, _BROWS), pl.ds(x0, _BCOLS)], bands.at[t], sems.at[t]
        )

    for t in range(tile):
        get_dma(t, raw_ref, bands_r, sems_r).start()
        get_dma(t, blur_ref, bands_b, sems_b).start()
    for t in range(tile):
        y = yx_ref[i * tile + t, 0]
        x = yx_ref[i * tile + t, 1]
        dy = y - (y // 8) * 8
        dx = x - (x // 128) * 128
        get_dma(t, raw_ref, bands_r, sems_r).wait()
        raw = pltpu.roll(pltpu.roll(bands_r[t], _BCOLS - dx, 1), _BROWS - dy, 0)[:P32, :P32]
        # Intensity-centroid moments in-register: materializing (K, 961)
        # raw patches for the XLA moment matmul costs a ~2.6 ms retiling.
        # The two scalars go to an SMEM output block (VMEM rejects scalar
        # stores; vector-shaped stores of rank-1 values crash Mosaic).
        mom_ref[t, 0] = jnp.sum(raw * w_ref[0])
        mom_ref[t, 1] = jnp.sum(raw * w_ref[1])
        get_dma(t, blur_ref, bands_b, sems_b).wait()
        blur = pltpu.roll(pltpu.roll(bands_b[t], _BCOLS - dx, 1), _BROWS - dy, 0)[:P32, :P32]
        pat_ref[pl.ds(t * P32, P32), :] = blur


@partial(jax.jit, static_argnames=("tile", "interpret"))
def patches_and_moments_pallas(
    img_raw: jnp.ndarray,
    img_blur: jnp.ndarray,
    yx: jnp.ndarray,
    moment_w: jnp.ndarray,
    tile: int = 16,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused detection tail: (K, 2) intensity-centroid moments (m10, m01)
    from the RAW image + (K, 32, 32) BLURRED descriptor patches, one kernel.

    ``moment_w``: (2, 32, 32) disk-masked x/y moment weights
    (``orb._MOMENT_W32`` reshaped; zeros on the padded row/col)."""
    K = yx.shape[0]
    H, W = img_raw.shape
    R = PATCH // 2
    Hp = -(-(H + R + 1 + _BROWS) // 8) * 8
    Wp = -(-(W + R + 1 + _BCOLS) // 128) * 128
    pads = ((R + 1, Hp - H - R - 1), (R + 1, Wp - W - R - 1))
    p_raw = jnp.pad(img_raw, pads, mode="edge")
    p_blur = jnp.pad(img_blur, pads, mode="edge")
    Kp = -(-K // tile) * tile
    yxp = jnp.ones((Kp, 2), jnp.int32).at[:K].set(yx.astype(jnp.int32) + 1)
    mom, pat = pl.pallas_call(
        partial(_patches_moments_kernel, tile=tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Kp // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((2, P32, P32), lambda i, yx_ref: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, 2), lambda i, yx_ref: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((tile * P32, P32), lambda i, yx_ref: (i, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, _BROWS, _BCOLS), jnp.float32),
                pltpu.VMEM((tile, _BROWS, _BCOLS), jnp.float32),
                pltpu.SemaphoreType.DMA((tile,)),
                pltpu.SemaphoreType.DMA((tile,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Kp, 2), jnp.float32),
            jax.ShapeDtypeStruct((Kp * P32, P32), img_raw.dtype),
        ],
        interpret=interpret,
    )(yxp, p_raw, p_blur, moment_w)
    return mom[:K], pat.reshape(Kp, P32, P32)[:K]
