"""Pose-graph optimization over SE(3), pure JAX.

A working implementation of what the reference stubs out entirely
(visual_slam/loop_closing/* and optimization/g2o_optimizer.py are 0-byte;
README.md:47 lists global optimization as not implemented).

Fixed-shape Gauss-Newton: N pose slots + E edge slots (padded + masked),
residual per edge r_e = log(T_meas^-1 @ T_i @ T_j^-1) in se(3), Jacobians by
forward-mode autodiff of the tangent-space update (6N params — the problem
is small enough that materializing J (6E x 6N) is cheap on TPU), damped
normal-equation solves with a fixed iteration count.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lie import se3_exp, se3_log, inv_T


class PoseGraph(NamedTuple):
    T_w2c: jnp.ndarray  # (N, 4, 4) node poses
    node_valid: jnp.ndarray  # (N,) bool
    node_fixed: jnp.ndarray  # (N,) bool (gauge anchors)
    edge_i: jnp.ndarray  # (E,) int32 source node
    edge_j: jnp.ndarray  # (E,) int32 target node
    T_meas: jnp.ndarray  # (E, 4, 4) measured T_i_w2c @ inv(T_j_w2c)
    edge_weight: jnp.ndarray  # (E,) float32 (0 = padding)


def _edge_residuals(xi: jnp.ndarray, graph: PoseGraph) -> jnp.ndarray:
    """(E*6,) stacked residuals for tangent update xi (N, 6):
    T_n <- exp(xi_n) T_n."""
    T = se3_exp(xi) @ graph.T_w2c  # (N, 4, 4)
    Ti = T[graph.edge_i]
    Tj = T[graph.edge_j]
    rel = Ti @ inv_T(Tj)
    err = se3_log(inv_T(graph.T_meas) @ rel)  # (E, 6)
    return (err * graph.edge_weight[:, None]).reshape(-1)


@partial(jax.jit, static_argnames=("n_iter",))
def optimize_pose_graph(
    graph: PoseGraph, n_iter: int = 10, lam: float = 1e-6
) -> tuple[jnp.ndarray, dict]:
    """Gauss-Newton with autodiff Jacobians. Returns (T_w2c', info)."""
    N = graph.T_w2c.shape[0]
    free = (graph.node_valid & ~graph.node_fixed).astype(jnp.float32)

    def body(carry, _):
        g = carry

        def res_fn(xi):
            return _edge_residuals(xi.reshape(N, 6), g)

        xi0 = jnp.zeros(N * 6)
        r = res_fn(xi0)
        J = jax.jacfwd(res_fn)(xi0)  # (6E, 6N)
        mask = jnp.repeat(free, 6)
        J = J * mask[None, :]
        H = J.T @ J + lam * jnp.eye(N * 6)
        H = H + jnp.diag(1.0 - mask)  # pin fixed/invalid params
        b = J.T @ r
        dxi = -jnp.linalg.solve(H, b) * mask
        T_new = se3_exp(dxi.reshape(N, 6)) @ g.T_w2c
        return g._replace(T_w2c=T_new), jnp.sum(r * r)

    graph_out, costs = jax.lax.scan(body, graph, None, length=n_iter)
    return graph_out.T_w2c, {"costs": costs, "cost": costs[-1]}


class Sim3Graph(NamedTuple):
    """Pose graph over Sim(3): each node carries (T_w2c, log-scale). Mono
    loop closures must correct SCALE drift as well as pose — the classic
    ORB-SLAM essential-graph formulation."""

    T_w2c: jnp.ndarray  # (N, 4, 4)
    log_s: jnp.ndarray  # (N,) log scale per node
    node_valid: jnp.ndarray
    node_fixed: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    T_meas: jnp.ndarray  # (E, 4, 4) measured relative SE(3)
    s_meas: jnp.ndarray  # (E,) measured relative scale s_i / s_j
    edge_weight: jnp.ndarray


def _sim3_edge_residuals(params: jnp.ndarray, graph: Sim3Graph) -> jnp.ndarray:
    """params (N, 7): [rho(3), phi(3), dsigma(1)] tangent update per node.
    Sim(3) node = (exp(xi) T_n, s_n * exp(dsigma)). Edge residual: 6-dof
    SE(3) log of the relative-pose mismatch where the translation of the
    relative measurement is scaled by the nodes' relative scale, plus a
    1-dof log-scale mismatch."""
    xi = params[:, :6]
    dsig = params[:, 6]
    T = se3_exp(xi) @ graph.T_w2c
    s = jnp.exp(graph.log_s + dsig)
    Ti = T[graph.edge_i]
    Tj = T[graph.edge_j]
    rel = Ti @ inv_T(Tj)
    s_rel = s[graph.edge_i] / s[graph.edge_j]
    # Scale-adjusted measurement: rotation unchanged, translation scales.
    T_meas = graph.T_meas
    T_meas_scaled = T_meas.at[:, :3, 3].multiply((s_rel / graph.s_meas)[:, None])
    err6 = se3_log(inv_T(T_meas_scaled) @ rel)  # (E, 6)
    err_s = jnp.log(s_rel / graph.s_meas)[:, None]  # (E, 1)
    err = jnp.concatenate([err6, err_s], axis=-1)
    return (err * graph.edge_weight[:, None]).reshape(-1)


@partial(jax.jit, static_argnames=("n_iter",))
def optimize_sim3_graph(
    graph: Sim3Graph, n_iter: int = 10, lam: float = 1e-6
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Gauss-Newton over Sim(3) nodes. Returns (T_w2c', scales', info).
    Apply the scale correction to each keyframe's local landmarks host-side
    (positions relative to the KF center multiply by its scale)."""
    N = graph.T_w2c.shape[0]
    free = (graph.node_valid & ~graph.node_fixed).astype(jnp.float32)

    def body(carry, _):
        g = carry

        def res_fn(p):
            return _sim3_edge_residuals(p.reshape(N, 7), g)

        p0 = jnp.zeros(N * 7)
        r = res_fn(p0)
        J = jax.jacfwd(res_fn)(p0)
        mask = jnp.repeat(free, 7)
        J = J * mask[None, :]
        H = J.T @ J + lam * jnp.eye(N * 7) + jnp.diag(1.0 - mask)
        dp = -jnp.linalg.solve(H, J.T @ r) * mask
        dp = dp.reshape(N, 7)
        T_new = se3_exp(dp[:, :6]) @ g.T_w2c
        s_new = g.log_s + dp[:, 6]
        return g._replace(T_w2c=T_new, log_s=s_new), jnp.sum(r * r)

    g_out, costs = jax.lax.scan(body, graph, None, length=n_iter)
    return g_out.T_w2c, jnp.exp(g_out.log_s), {"costs": costs, "cost": costs[-1]}


def build_sim3_graph(
    poses: jnp.ndarray,
    loop_edges: list[tuple[int, int, jnp.ndarray, float]] | None = None,
    loop_weight: float = 5.0,
) -> Sim3Graph:
    """Odometry chain (relative scale 1) + loop edges with measured relative
    pose AND scale: [(i, j, T_meas, s_meas), ...]."""
    import numpy as np

    poses = np.asarray(poses)
    N = len(poses)
    loop_edges = loop_edges or []
    E = (N - 1) + len(loop_edges)
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    Tm = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    sm = np.ones(E, np.float32)
    w = np.zeros(E, np.float32)
    for k in range(N - 1):
        ei[k], ej[k] = k, k + 1
        Tm[k] = poses[k] @ np.linalg.inv(poses[k + 1])
        w[k] = 1.0
    for idx, (i, j, T_meas, s_meas) in enumerate(loop_edges):
        k = (N - 1) + idx
        ei[k], ej[k] = i, j
        Tm[k] = np.asarray(T_meas)
        sm[k] = s_meas
        w[k] = loop_weight
    node_fixed = np.zeros(N, bool)
    node_fixed[0] = True
    return Sim3Graph(
        T_w2c=jnp.asarray(poses, jnp.float32),
        log_s=jnp.zeros(N),
        node_valid=jnp.ones(N, bool),
        node_fixed=jnp.asarray(node_fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        T_meas=jnp.asarray(Tm),
        s_meas=jnp.asarray(sm),
        edge_weight=jnp.asarray(w),
    )


def build_sequential_graph(
    poses: jnp.ndarray,
    loop_edges: list[tuple[int, int, jnp.ndarray]] | None = None,
    n_slots: int | None = None,
    e_slots: int | None = None,
    loop_weight: float = 5.0,
) -> PoseGraph:
    """Odometry chain + optional loop-closure edges.

    Args:
      poses: (N, 4, 4) current T_w2c estimates (edge measurements are taken
        from consecutive pairs — the odometry constraints).
      loop_edges: [(i, j, T_meas (4,4)), ...] — T_meas = T_i @ inv(T_j) as
        re-estimated by loop verification.
    """
    import numpy as np

    poses = np.asarray(poses)
    N = len(poses)
    loop_edges = loop_edges or []
    n_slots = n_slots or N
    n_edges = (N - 1) + len(loop_edges)
    e_slots = e_slots or n_edges

    T = np.tile(np.eye(4, dtype=np.float32), (n_slots, 1, 1))
    T[:N] = poses
    node_valid = np.zeros(n_slots, bool)
    node_valid[:N] = True
    node_fixed = np.zeros(n_slots, bool)
    node_fixed[0] = True

    ei = np.zeros(e_slots, np.int32)
    ej = np.zeros(e_slots, np.int32)
    Tm = np.tile(np.eye(4, dtype=np.float32), (e_slots, 1, 1))
    w = np.zeros(e_slots, np.float32)
    for k in range(N - 1):
        ei[k], ej[k] = k, k + 1
        Tm[k] = poses[k] @ np.linalg.inv(poses[k + 1])
        w[k] = 1.0
    for idx, (i, j, T_meas) in enumerate(loop_edges):
        k = (N - 1) + idx
        ei[k], ej[k] = i, j
        Tm[k] = np.asarray(T_meas)
        w[k] = loop_weight

    return PoseGraph(
        T_w2c=jnp.asarray(T),
        node_valid=jnp.asarray(node_valid),
        node_fixed=jnp.asarray(node_fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        T_meas=jnp.asarray(Tm),
        edge_weight=jnp.asarray(w),
    )
