"""Pallas matcher kernel vs the XLA reference (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.ops import matching as m_ops
from visual_slam_tpu.ops.pallas_kernels import match_nn_pallas


def _packed(rng, k):
    return jnp.asarray(rng.integers(0, 2**32, (k, 8), dtype=np.uint32))


def test_pallas_match_equals_xla(rng):
    k1, k2 = 300, 257  # deliberately non-tile-multiple
    d1 = _packed(rng, k1)
    d2 = _packed(rng, k2)
    v1 = jnp.asarray(rng.random(k1) > 0.1)
    v2 = jnp.asarray(rng.random(k2) > 0.1)

    dist = m_ops.hamming_distance_matrix(d1, d2, v1, v2)
    ti_ref, d_ref, ok_ref = m_ops.match_nn(dist, ratio=0.8, cross_check=True)

    ti_p, d_p, ok_p = match_nn_pallas(
        d1, d2, v1, v2, ratio=0.8, cross_check=True, interpret=True
    )
    # Valid matches must agree exactly (distances are integers; argmin ties
    # broken identically by first occurrence).
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_ref))
    sel = np.asarray(ok_ref)
    np.testing.assert_array_equal(np.asarray(ti_p)[sel], np.asarray(ti_ref)[sel])
    np.testing.assert_allclose(np.asarray(d_p)[sel], np.asarray(d_ref)[sel])


def test_pallas_match_self_identity(rng):
    k = 128
    d = _packed(rng, k)
    v = jnp.ones(k, bool)
    ti, dist, ok = match_nn_pallas(d, d, v, v, ratio=0.9, cross_check=True, interpret=True)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(ti), np.arange(k))
    np.testing.assert_array_equal(np.asarray(dist), 0)


def test_pallas_batched_equals_xla_map(rng):
    """Batched candidate matching (loop detection shape) must agree with the
    per-candidate XLA path."""
    from visual_slam_tpu.ops.orb import unpack_bits
    from visual_slam_tpu.ops.pallas_kernels import hamming_top2_batched, BIG

    k1, k2, C = 192, 160, 3
    d1 = _packed(rng, k1)
    v1 = jnp.asarray(rng.random(k1) > 0.1)
    b1 = unpack_bits(d1)
    pop1 = jnp.sum(b1.astype(jnp.float32), -1)
    d2s = [_packed(rng, k2) for _ in range(C)]
    v2s = [jnp.asarray(rng.random(k2) > 0.1) for _ in range(C)]
    b2 = jnp.stack([unpack_bits(d) for d in d2s])
    pop2 = jnp.sum(b2.astype(jnp.float32), -1)
    best, second, bidx, colarg = hamming_top2_batched(
        b1, pop1, v1, b2, pop2, jnp.stack(v2s), interpret=True
    )
    for c in range(C):
        dist = m_ops.hamming_distance_matrix(d1, d2s[c], v1, v2s[c])
        ref_best = np.asarray(jnp.min(dist, axis=1))
        ref_arg = np.asarray(jnp.argmin(dist, axis=1))
        ok = ref_best < BIG * 0.5
        np.testing.assert_allclose(np.asarray(best[c])[ok], ref_best[ok])
        np.testing.assert_array_equal(np.asarray(bidx[c])[ok], ref_arg[ok])
        ref_colarg = np.asarray(jnp.argmin(dist, axis=0))
        col_ok = np.asarray(jnp.min(dist, axis=0)) < BIG * 0.5
        np.testing.assert_array_equal(np.asarray(colarg[c])[col_ok], ref_colarg[col_ok])


def test_pallas_patch_gather_equals_xla(rng):
    """Aligned-DMA + roll patch gather (interpret mode) must reproduce the
    XLA extract_patches windows exactly, and the 1024-position weight
    variants must give identical orientations/descriptors."""
    from visual_slam_tpu.ops.pallas_patches import extract_patches32_pallas
    from visual_slam_tpu.ops.orb import (
        SAMPLING_NP, _IDX_31_IN_32, descriptors, extract_patches, orientations,
    )

    img = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
    yx = jnp.asarray(
        np.stack([rng.integers(0, 120, 40), rng.integers(0, 160, 40)], 1), np.int32
    )
    a = extract_patches(img, yx)
    b = extract_patches32_pallas(img, yx, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[:, :31, :31])
    ang31 = orientations(a)
    np.testing.assert_allclose(
        np.asarray(ang31), np.asarray(orientations(b)), atol=1e-5
    )
    S32 = np.zeros((1024, SAMPLING_NP.shape[1]), np.float32)
    S32[_IDX_31_IN_32] = SAMPLING_NP
    d31 = descriptors(a, ang31, jnp.asarray(SAMPLING_NP))
    d32 = descriptors(b, ang31, jnp.asarray(S32))
    np.testing.assert_array_equal(np.asarray(d31), np.asarray(d32))


def test_pallas_guided_equals_xla(rng):
    """Fused guided matcher (distance + spatial gate + ratio test + kp-
    aligned encoded-min inversion in one kernel) vs the shipped XLA path
    in ops/guided_matching.py — integer Hamming makes every decision exact,
    so lm_idx/valid must agree exactly, including distance ties (duplicated
    descriptors below) broken toward the lower landmark index."""
    import jax
    from visual_slam_tpu.ops.guided_matching import guided_match
    from visual_slam_tpu.ops.orb import unpack_bits
    from visual_slam_tpu.ops.pallas_kernels import guided_top2_pallas
    from visual_slam_tpu.ops.projection import project_points

    M, Kp = 300, 200
    W, H, F = 320.0, 240.0, 260.0
    K = jnp.asarray([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1.0]], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)
    lm_pos = jnp.asarray(np.stack([
        rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(4, 30, M),
    ], 1), jnp.float32)
    lm_desc = _packed(rng, M)
    # Distance ties: landmark i and i+1 share a descriptor for 30 pairs.
    lm_desc = lm_desc.at[1:60:2].set(lm_desc[0:60:2])
    lm_valid = jnp.asarray(rng.random(M) > 0.1)
    kp_xy = jnp.asarray(np.stack([
        rng.uniform(0, W, Kp), rng.uniform(0, H, Kp)], 1), jnp.float32)
    kp_desc = _packed(rng, Kp)
    # Make some keypoints plausible matches: copy landmark descriptors and
    # place them near the landmark's projection.
    uv_np, z_np = project_points(K, T, lm_pos)
    for j in range(0, 120, 3):
        kp_desc = kp_desc.at[j % Kp].set(lm_desc[j])
        kp_xy = kp_xy.at[j % Kp].set(uv_np[j] + rng.uniform(-5, 5, 2))
    kp_valid = jnp.asarray(rng.random(Kp) > 0.1)
    radius = 12.0

    ref = guided_match(lm_pos, lm_desc, lm_valid, T, K, kp_xy, kp_desc,
                       kp_valid, W, H, radius_px=radius)

    uv, z = project_points(K, T, lm_pos)
    visible = (lm_valid & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W)
               & (uv[:, 1] >= 0) & (uv[:, 1] < H))
    b1 = unpack_bits(lm_desc)
    b2 = unpack_bits(kp_desc)
    lm_idx, valid = guided_top2_pallas(
        b1, jnp.sum(b1.astype(jnp.float32), -1), visible, uv,
        b2, jnp.sum(b2.astype(jnp.float32), -1), kp_valid, kp_xy,
        jnp.float32(radius), ratio=0.8, max_distance=80.0, interpret=True,
    )
    valid = valid & kp_valid
    assert np.asarray(ref["valid"]).sum() > 10  # the fixture actually matches
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref["valid"]))
    sel = np.asarray(ref["valid"])
    np.testing.assert_array_equal(
        np.asarray(lm_idx)[sel], np.asarray(ref["lm_idx"])[sel]
    )
