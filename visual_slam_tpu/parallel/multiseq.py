"""Data-parallel multi-sequence visual odometry.

BASELINE.json config 5 ("4 KITTI sequences SLAM'd in parallel"): the fused
per-frame tracking step (pipeline.py) is vmapped over a batch of sequences
and the batch axis is sharded across the device mesh — pure data parallelism
with zero cross-sequence communication; XLA partitions every kernel.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import orb as orb_ops
from ..pipeline import TrackState, make_track_step


def batched_track_step(track_step):
    """vmap a single-sequence track step over a leading batch axis (the
    sampling matrix is broadcast, not batched)."""
    vstep = jax.vmap(track_step.jitted, in_axes=(0, 0, None))
    return lambda states, imgs: vstep(states, imgs, orb_ops.active_sampling())


def make_batched_vo(
    K: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    **track_params,
):
    """Returns a (states, imgs) -> (states, outs) step with the batch
    dimension sharded over ``axis`` of ``mesh``."""
    step = make_track_step(K, **track_params)
    vstep = jax.vmap(step.jitted, in_axes=(0, 0, None))
    batch_sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def _sharded_step(states: TrackState, imgs: jnp.ndarray, sampling: jnp.ndarray):
        imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
        return vstep(states, imgs, sampling)

    def sharded_step(states: TrackState, imgs: jnp.ndarray):
        return _sharded_step(states, imgs, orb_ops.active_sampling())

    return sharded_step


def shard_batch(mesh: Mesh, axis: str, tree):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
