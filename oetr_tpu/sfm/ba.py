"""Bundle adjustment as an XLA program — Schur complement via implicit CG.

Pure new scope mandated by BASELINE.json's north star (the reference only
ships COLMAP file I/O, dloc/core/utils/database.py). Design is TPU-first:

  * Observations are flat static arrays (obs_cam, obs_pt, obs_uv, valid);
    per-camera / per-point reductions are `segment_sum`s — no sparse
    matrices, no dynamic shapes.
  * Levenberg-Marquardt outer loop; the camera Schur system
    S = H_cc - W H_pp^-1 W^T is never materialized: CG runs on an
    *implicit* matvec (two gather/segment-sum sweeps over observations),
    with block-Jacobi preconditioning from H_cc's 6x6 diagonal blocks.
  * Point back-substitution is a batched 3x3 solve.
  * Multi-host: shard observations along a mesh axis; every segment_sum
    is followed by a psum over that axis (`bundle_adjust` takes
    ``axis_name`` and runs unchanged inside shard_map) — the
    "Schur-complement reduction over psum/all-gather" of the north star.

Camera model: world->camera rigid (so3 log + translation, [C, 6]) with
fixed per-camera intrinsics K [C, 3, 3]. Residual = pi(K (R X + t)) - uv.
Gauge freedom is handled with an update mask (fix cameras / components).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.ransac import so3_exp

Array = jnp.ndarray


def project_residual(cam6: Array, K: Array, pt: Array, uv: Array) -> Array:
    """Reprojection residual [2] of one observation."""
    R = so3_exp(cam6[:3])
    p = R @ pt + cam6[3:]
    z = jnp.where(jnp.abs(p[2]) > 1e-9, p[2], 1e-9)
    proj = K @ (p / z)
    return proj[:2] - uv


def residuals(cams: Array, pts: Array, K: Array, obs_cam: Array,
              obs_pt: Array, obs_uv: Array, valid: Array) -> Array:
    """[O, 2] masked residuals."""
    r = jax.vmap(project_residual)(cams[obs_cam], K[obs_cam], pts[obs_pt],
                                   obs_uv)
    return r * valid[:, None]


def _obs_jacobians(cams, pts, K, obs_cam, obs_pt, obs_uv, valid):
    """Per-observation Jacobians Jc [O, 2, 6], Jp [O, 2, 3]."""
    def res_c(c6, Ki, p, uv):
        return project_residual(c6, Ki, p, uv)

    Jc = jax.vmap(jax.jacfwd(res_c, argnums=0))(cams[obs_cam], K[obs_cam],
                                                pts[obs_pt], obs_uv)
    Jp = jax.vmap(jax.jacfwd(res_c, argnums=2))(cams[obs_cam], K[obs_cam],
                                                pts[obs_pt], obs_uv)
    m = valid[:, None, None]
    return Jc * m, Jp * m


def _huber_weights(r: Array, delta: float) -> Array:
    """Per-observation robust IRLS weights (sqrt applied to J and r)."""
    norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, 1e-12))
    return jnp.sqrt(w)


@partial(jax.jit, static_argnames=("iters", "cg_iters", "axis_name",
                                   "huber_delta", "damping"))
def bundle_adjust(cams0: Array, pts0: Array, K: Array, obs_cam: Array,
                  obs_pt: Array, obs_uv: Array, valid: Array,
                  update_mask: Array | None = None,
                  iters: int = 10, cg_iters: int = 30,
                  damping: float = 1e-3, huber_delta: float = 0.0,
                  axis_name: str | None = None):
    """Levenberg-Marquardt BA.

    Args:
      cams0: [C, 6] (so3, t) world->camera; pts0: [P, 3]; K: [C, 3, 3].
      obs_cam/obs_pt: [O] int indices; obs_uv: [O, 2]; valid: [O] bool.
      update_mask: [C, 6] float (0 freezes a component — gauge fixing;
        default fixes camera 0 entirely).
      axis_name: mesh axis observations are sharded over (psum reductions
        across shards); None = single device.

    Returns dict: cams [C, 6], pts [P, 3], cost_history [iters+1].
    """
    C = cams0.shape[0]
    P = pts0.shape[0]
    vf = valid.astype(cams0.dtype)
    if update_mask is None:
        update_mask = jnp.ones((C, 6), cams0.dtype).at[0].set(0.0)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def cost(cams, pts):
        r = residuals(cams, pts, K, obs_cam, obs_pt, obs_uv, vf)
        if huber_delta > 0:
            n = jnp.linalg.norm(r, axis=-1)
            per = jnp.where(n <= huber_delta, 0.5 * n ** 2,
                            huber_delta * (n - 0.5 * huber_delta))
            return _psum(jnp.sum(per * vf))
        return 0.5 * _psum(jnp.sum(r ** 2))

    def lm_step(carry, _):
        cams, pts, lam, prev_cost = carry
        r = residuals(cams, pts, K, obs_cam, obs_pt, obs_uv, vf)
        Jc, Jp = _obs_jacobians(cams, pts, K, obs_cam, obs_pt, obs_uv, vf)
        if huber_delta > 0:
            w = _huber_weights(r, huber_delta) * vf
            r = r * w[:, None]
            Jc = Jc * w[:, None, None]
            Jp = Jp * w[:, None, None]

        # Gradient blocks.
        g_c = _psum(jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jc, r), obs_cam, C))      # [C, 6]
        g_p = _psum(jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jp, r), obs_pt, P))       # [P, 3]

        # Diagonal blocks.
        Hcc = _psum(jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", Jc, Jc), obs_cam, C))   # [C, 6, 6]
        Hpp = _psum(jax.ops.segment_sum(
            jnp.einsum("oia,oib->oab", Jp, Jp), obs_pt, P))    # [P, 3, 3]
        Hcc = Hcc + lam * jnp.eye(6)[None]
        Hpp = Hpp + lam * jnp.eye(3)[None]
        Hpp_inv = jnp.linalg.inv(Hpp)                          # [P, 3, 3]

        # Schur RHS: b = -(g_c - W Hpp^-1 g_p).
        y_p = jnp.einsum("pab,pb->pa", Hpp_inv, g_p)           # [P, 3]
        t = _psum(jax.ops.segment_sum(
            jnp.einsum("oia,oib,ob->oa", Jc, Jp, y_p[obs_pt]),
            obs_cam, C))
        b = -(g_c - t)
        b = b * update_mask

        # Implicit Schur matvec: S v = Hcc v - W Hpp^-1 W^T v.
        def S_mv(v):
            v = v * update_mask
            u1 = jnp.einsum("cab,cb->ca", Hcc, v)
            Jcv = jnp.einsum("oia,oa->oi", Jc, v[obs_cam])     # [O, 2]
            wtv = _psum(jax.ops.segment_sum(
                jnp.einsum("oia,oi->oa", Jp, Jcv), obs_pt, P))  # [P, 3]
            hwtv = jnp.einsum("pab,pb->pa", Hpp_inv, wtv)
            u2 = _psum(jax.ops.segment_sum(
                jnp.einsum("oia,oib,ob->oa", Jc, Jp, hwtv[obs_pt]),
                obs_cam, C))
            return (u1 - u2) * update_mask

        # Block-Jacobi preconditioner from Hcc.
        Hcc_inv = jnp.linalg.inv(Hcc)

        def precond(v):
            return jnp.einsum("cab,cb->ca", Hcc_inv, v) * update_mask

        def cg(b):
            x = jnp.zeros_like(b)
            rr = b - S_mv(x)
            z = precond(rr)
            p = z
            rz = jnp.sum(rr * z)

            def body(carry, _):
                x, rr, p, rz = carry
                Sp = S_mv(p)
                denom = jnp.sum(p * Sp)
                alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
                x = x + alpha * p
                rr = rr - alpha * Sp
                z = precond(rr)
                rz_new = jnp.sum(rr * z)
                beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
                p = z + beta * p
                return (x, rr, p, rz_new), None

            (x, _, _, _), _ = jax.lax.scan(body, (x, rr, p, rz), None,
                                           length=cg_iters)
            return x

        dc = cg(b)                                             # [C, 6]

        # Point back-substitution: dp = Hpp^-1 (-g_p - W^T dc).
        Jcdc = jnp.einsum("oia,oa->oi", Jc, dc[obs_cam])
        wtdc = _psum(jax.ops.segment_sum(
            jnp.einsum("oia,oi->oa", Jp, Jcdc), obs_pt, P))
        dp = jnp.einsum("pab,pb->pa", Hpp_inv, -(g_p + wtdc))

        # Local so3 update for rotations, additive for the rest.
        def apply_cam(c, d):
            R = so3_exp(c[:3]) @ so3_exp(d[:3])
            # Back to log: use the quaternion-free Rodrigues log.
            cos = jnp.clip((jnp.trace(R) - 1) / 2, -1.0, 1.0)
            th = jnp.arccos(cos)
            sin = jnp.sin(th)
            axis = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                              R[1, 0] - R[0, 1]])
            w = jnp.where(sin > 1e-7, axis * th / (2 * sin + 1e-30),
                          axis * 0.5)
            return jnp.concatenate([w, c[3:] + d[3:]])

        # Pin the carry dtype (under x64 a float64 constant upstream
        # would silently widen the scan carry and break tracing).
        cams_new = jax.vmap(apply_cam)(cams, dc * update_mask)
        cams_new = cams_new.astype(cams0.dtype)
        pts_new = (pts + dp).astype(pts0.dtype)

        new_cost = cost(cams_new, pts_new).astype(prev_cost.dtype)
        accept = new_cost < prev_cost
        cams = jnp.where(accept, cams_new, cams)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cur = jnp.where(accept, new_cost, prev_cost)
        return (cams, pts, lam, cur), cur

    c0 = cost(cams0, pts0).astype(cams0.dtype)
    (cams, pts, _, final_cost), hist = jax.lax.scan(
        lm_step, (cams0, pts0, jnp.asarray(damping, cams0.dtype), c0), None,
        length=iters)
    return {"cams": cams, "pts": pts, "cost0": c0, "cost": final_cost,
            "cost_history": jnp.concatenate([c0[None], hist])}


def triangulate_dlt(cams: Array, K: Array, obs_uv: Array,
                    valid: Array) -> Array:
    """Linear multi-view triangulation of ONE point.

    Args:
      cams: [V, 6] observing cameras; K: [V, 3, 3]; obs_uv: [V, 2];
      valid: [V] bool (padded views allowed).
    Returns [3] world point.
    """
    def rows(c6, Ki, uv, v):
        R = so3_exp(c6[:3])
        P = Ki @ jnp.concatenate([R, c6[3:, None]], axis=1)     # [3, 4]
        r1 = uv[0] * P[2] - P[0]
        r2 = uv[1] * P[2] - P[1]
        return jnp.stack([r1, r2]) * v

    A = jax.vmap(rows)(cams, K, obs_uv,
                       valid.astype(cams.dtype)).reshape(-1, 4)
    _, V = jnp.linalg.eigh(A.T @ A)
    X = V[:, 0]
    return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)


triangulate_points = jax.vmap(triangulate_dlt, in_axes=(0, 0, 0, 0))
