"""Adam (first-order) bundle-adjustment fallback via optax.

API parity with the reference's TorchOptimizer semantics
(visual_slam/optimization/torch_optimizer.py): Adam over landmark positions
and per-pose (so(3) tangent, translation) parameters with Huber loss and the
first keyframe frozen (torch_optimizer.py:54-57, 106-117, 135-143) — but
where the reference iterates a Python loop over observations per step
(its documented bottleneck, torch_optimizer.py:148-178), every step here is
one fused evaluation of the same dense (M, W) residual grid the LM solver
uses. Primarily for parity experiments; LM+Schur is the production solver.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..ops.lie import so3_exp
from .ba import BAProblem, _residuals_and_jacobians
from .optimizer import LMOptimizer


def _huber(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    r = jnp.sqrt(r2 + 1e-12)
    return jnp.where(r <= delta, 0.5 * r2, delta * (r - 0.5 * delta))


@partial(jax.jit, static_argnames=("n_iter",))
def adam_bundle_adjust(
    problem: BAProblem,
    n_iter: int = 150,
    lr: float = 1e-3,
    huber: float = 5e-3,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Returns (T_w2c', points', info) like bundle_adjust."""
    W = problem.n_poses
    w_obs = problem.obs_valid.astype(jnp.float32)
    free = (problem.pose_valid & ~problem.pose_fixed).astype(jnp.float32)[:, None]
    R0 = problem.T_w2c[:, :3, :3]
    t0 = problem.T_w2c[:, :3, 3]

    params = {
        "w": jnp.zeros((W, 3)),  # so(3) tangent around R0 (torch_optimizer.py:119-133)
        "t": t0,
        "X": problem.points,
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def poses_of(params):
        R = so3_exp(params["w"] * free) @ R0
        t = params["t"] * free + t0 * (1.0 - free)
        T = jnp.tile(jnp.eye(4), (W, 1, 1))
        return T.at[:, :3, :3].set(R).at[:, :3, 3].set(t)

    def loss_fn(params):
        T = poses_of(params)
        r, _, _, in_front = _residuals_and_jacobians(T, params["X"], problem.uv, w_obs > 0)
        r2 = jnp.sum(r * r, axis=-1)
        return jnp.sum(_huber(r2, huber) * w_obs * in_front)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    c0 = loss_fn(params)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=n_iter)
    return poses_of(params), params["X"], {"cost0": c0, "cost": losses[-1], "costs": losses}


class AdamOptimizer(LMOptimizer):
    """Drop-in optimizer facade using the Adam solver (config.optimization
    .solver == 'adam')."""

    def _solve_and_writeback(
        self, keyframes, map_points, w_bucket, fixed_flags=None,
        renormalize_scale=False,
    ):
        import numpy as np

        cfg = self.config.optimization
        if fixed_flags is None:
            fixed_flags = [j == 0 for j in range(len(keyframes))]
        from .optimizer import _next_pow2

        map_points = self._select_points(map_points, cfg.max_points)
        m_bucket = min(_next_pow2(len(map_points)), cfg.max_points)
        problem, used_points, kf_slot, _, _ = self._pack(
            keyframes, map_points, w_bucket, m_bucket, fixed_flags
        )
        focal = float(self.camera.K[0, 0])
        T, X, info = adam_bundle_adjust(
            problem, n_iter=cfg.n_iter, lr=cfg.lr, huber=cfg.huber_delta / focal
        )
        T_np = np.array(T)  # writable copies (gauge re-projection mutates)
        X_np = np.array(X)
        gauge_transform = None
        if renormalize_scale and len(keyframes) >= 2:
            # Adam's global BA drifts along the mono scale null direction just
            # like LM's — re-impose the gauge (CLAUDE.md).
            X_np, gauge_transform = self._reimpose_mono_gauge(
                T_np, X_np, keyframes, fixed_flags
            )
        for j, kf in enumerate(keyframes):
            if not kf.is_fixed and not fixed_flags[j]:
                kf.update_pose(T_np[j].astype(np.float64))
        for i, mp in enumerate(used_points):
            mp.update_position(X_np[i].astype(np.float64))
        return {
            "cost0": float(info["cost0"]),
            "cost": float(info["cost"]),
            "n_points": len(used_points),
            "n_keyframes": len(keyframes),
            "solver": "adam",
            "gauge_transform": gauge_transform,
        }
