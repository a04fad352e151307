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
