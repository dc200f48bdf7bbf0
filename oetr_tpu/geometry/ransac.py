"""Batched RANSAC essential-matrix estimation + pose recovery as XLA programs.

TPU-native replacement for the reference's OpenCV calls
(cv2.findEssentialMat + cv2.recoverPose,
/root/reference/dloc/evaluate/utils/evaluation.py:209-240). Instead of
OpenCV's data-dependent iteration, we evaluate a *fixed budget* of minimal
hypotheses in parallel (vmap over hypotheses), score all of them against all
correspondences with a masked Sampson residual, pick the best by masked
argmax, and locally optimize by re-fitting on inliers — all static shapes,
so the whole pipeline jits, vmaps over pairs, and shards over a device mesh.

Hypotheses use the weighted 8-point algorithm (batched SVD on the MXU);
local-optimization re-fits use all inliers. This matches or exceeds
OpenCV's 5-point RANSAC in accuracy at realistic match counts while being
embarrassingly parallel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .epipolar import sampson_error, skew, to_homogeneous

Array = jnp.ndarray


def essential_8pt(kpts0: Array, kpts1: Array, weights: Array | None = None) -> Array:
    """Weighted 8-point essential matrix from normalized correspondences.

    Builds the epipolar constraint matrix A (N x 9) with rows
    [x1x0, x1y0, x1, y1x0, y1y0, y1, x0, y0, 1], takes the right singular
    vector of the smallest singular value, and projects onto the essential
    manifold (singular values -> (1, 1, 0)).

    Args:
      kpts0, kpts1: [N, 2] normalized camera coordinates.
      weights: optional [N] non-negative weights (0 excludes a row).
    Returns:
      [3, 3] essential matrix (unit Frobenius-scale up to projection).
    """
    x0, y0 = kpts0[:, 0], kpts0[:, 1]
    x1, y1 = kpts1[:, 0], kpts1[:, 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones],
                  axis=-1)  # [N, 9]
    if weights is not None:
        A = A * weights[:, None]
    # Nullspace via eigh of A^T A (9x9): cheaper + TPU-friendlier than SVD(A).
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)       # ascending eigenvalues
    e = V[:, 0]
    E = e.reshape(3, 3)
    # Project to the essential manifold.
    U, _, Vt = jnp.linalg.svd(E)
    S = jnp.array([1.0, 1.0, 0.0], dtype=E.dtype)
    return (U * S[None, :]) @ Vt


def _sample_minimal_sets(rng: Array, n_hyps: int, n_pts: int, valid: Array,
                         sample_size: int = 8) -> Array:
    """Draw [n_hyps, sample_size] indices, biased to valid correspondences.

    Uses Gumbel top-k over the validity mask so padded slots are (almost)
    never selected; fully static-shaped.
    """
    g = jax.random.gumbel(rng, (n_hyps, n_pts))
    scores = g + jnp.where(valid, 0.0, -1e9)[None, :]
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx



def so3_exp(w: Array) -> Array:
    """Rodrigues exponential map, Taylor-safe at ||w|| -> 0 (autodiff-safe:
    no norm() of an exactly-zero vector)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = skew(w)
    A = jnp.sin(th) / th
    B = (1.0 - jnp.cos(th)) / (th * th)
    return jnp.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


def _tangent_basis(t: Array) -> Array:
    """[3, 2] orthonormal basis of the plane orthogonal to unit vector t."""
    a = jnp.where(jnp.abs(t[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0], t.dtype),
                  jnp.array([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def signed_sampson(kpts0: Array, kpts1: Array, E: Array) -> Array:
    """First-order signed Sampson residual (sqrt of sampson_error with sign)."""
    h0 = to_homogeneous(kpts0)
    h1 = to_homogeneous(kpts1)
    Ep0 = h0 @ E.T
    Etp1 = h1 @ E
    num = jnp.sum(h1 * Ep0, axis=-1)
    den = jnp.sqrt(jnp.maximum(
        Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2,
        1e-18))
    return num / den


def refine_pose_sampson(R: Array, t: Array, kpts0n: Array, kpts1n: Array,
                        thresh_sq: Array, valid: Array | None = None,
                        iters: int = 15, damping: float = 1e-10):
    """Gauss-Newton refinement of (R, t) on the essential manifold.

    Minimizes the Sampson error over the 5-DOF parameterization
    (so3 tangent for R, 2-D tangent of the unit sphere for t), re-selecting
    inliers at 2x threshold each iteration and only accepting steps that do
    not reduce the 1x inlier count. This is the accuracy workhorse that
    lifts 8-point hypotheses past OpenCV's 5-point RANSAC
    (replaces cv2's internal refinement, evaluation.py:219-224).
    """
    vmask = jnp.ones(kpts0n.shape[0], bool) if valid is None else valid

    def step(carry, _):
        R, t = carry
        E = skew(t) @ R
        e = sampson_error(kpts0n, kpts1n, E)
        w = ((e < 4.0 * thresh_sq) & vmask).astype(kpts0n.dtype)

        def residuals(p):
            Rn = R @ so3_exp(p[:3])
            tn = t + _tangent_basis(t) @ p[3:]
            tn = tn / jnp.sqrt(jnp.sum(tn * tn) + 1e-24)
            return w * signed_sampson(kpts0n, kpts1n, skew(tn) @ Rn)

        p0 = jnp.zeros(5, kpts0n.dtype)
        J = jax.jacfwd(residuals)(p0)                 # [N, 5]
        r = residuals(p0)
        JTJ = J.T @ J + damping * jnp.eye(5, dtype=kpts0n.dtype)
        delta = -jnp.linalg.solve(JTJ, J.T @ r)
        Rn = R @ so3_exp(delta[:3])
        tn = t + _tangent_basis(t) @ delta[3:]
        tn = tn / jnp.linalg.norm(tn)
        # Accept only non-degrading steps, judged by the MSAC score
        # (truncated quadratic): unlike the raw inlier count it keeps
        # discriminating *within* a fixed consensus set, so refinement
        # continues toward the tight optimum instead of plateauing at
        # the first model that reaches the count (measured round 4:
        # count-acceptance left 5-25 deg errors on pairs whose GT model
        # cv2 reached).
        En = skew(tn) @ Rn
        s_new = jnp.sum(jnp.where(
            vmask, jnp.maximum(1.0 - sampson_error(kpts0n, kpts1n, En)
                               / thresh_sq, 0.0), 0.0))
        s_old = jnp.sum(jnp.where(
            vmask, jnp.maximum(1.0 - e / thresh_sq, 0.0), 0.0))
        better = s_new >= s_old
        return (jnp.where(better, Rn, R), jnp.where(better, tn, t)), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


@partial(jax.jit, static_argnames=("num_hypotheses", "lo_candidates",
                                   "use_5pt"))
def ransac_essential(kpts0n: Array, kpts1n: Array, valid: Array,
                     threshold: float, rng: Array,
                     num_hypotheses: int = 512, lo_candidates: int = 8,
                     use_5pt: bool | None = None):
    """Fixed-budget parallel LO-RANSAC for the essential matrix.

    Pipeline (all static shapes):
      1. ``num_hypotheses`` 8-point minimal fits, scored against every
         correspondence with the Sampson residual (one big batched matmul).
      2. A second sampling round draws minimal sets from the best round-1
         consensus set (LO-RANSAC inner sampling, Chum et al. 2003) —
         8-point needs an inlier_ratio^8 stroke of luck per sample, so at
         high outlier rates round 2's ~clean pool is what saves the fit.
      3. The ``lo_candidates`` best hypotheses across both rounds are
         decomposed to (R, t) and refined by Gauss-Newton on the
         essential manifold minimizing the Sampson error
         (refine_pose_sampson) — this lifts noisy 8-point hypotheses past
         OpenCV's 5-point RANSAC accuracy.
      4. Best candidate by *cheirality-checked* inlier count wins
         (Sampson alone cannot reject the wrong members of the planar
         E-family; depth positivity can).

    Args:
      kpts0n, kpts1n: [N, 2] normalized coords (padded to static N).
      valid: [N] bool mask of real correspondences.
      threshold: inlier threshold on the Sampson distance (normalized
        units; callers pass px_thresh / f_mean like the reference,
        evaluation.py:213-214; squared internally).
      rng: PRNG key.

    Returns:
      dict with E [3,3], R [3,3], t [3], inliers [N] bool,
      num_inliers [], score [].
    """
    if use_5pt is None:
        # The 5-point stage runs a host eigensolve behind pure_callback;
        # the tunneled axon TPU runtime does not support host callbacks,
        # so it only defaults on for host (CPU) backends. The CPU-pinned
        # eval path (evalx/twoview.py) opts in explicitly.
        use_5pt = jax.default_backend() == "cpu"
    n = kpts0n.shape[0]
    thresh_sq = jnp.asarray(threshold, kpts0n.dtype) ** 2
    rng1, rng2, rng5 = jax.random.split(rng, 3)

    def fit_round(key, pool, n_hyps):
        idx = _sample_minimal_sets(key, n_hyps, n, pool)
        Es = jax.vmap(essential_8pt)(kpts0n[idx], kpts1n[idx])   # [H, 3, 3]
        errs = jax.vmap(lambda E: sampson_error(kpts0n, kpts1n, E))(Es)
        # MSAC (truncated-quadratic) score: discriminates between
        # hypotheses with equal inlier counts, so the LO stage starts
        # from the tightest models, not the first to reach the count.
        counts = jnp.sum(jnp.where(valid[None, :],
                                   jnp.maximum(1.0 - errs / thresh_sq, 0.0),
                                   0.0), axis=-1)
        return Es, errs, counts

    Es1, errs1, counts1 = fit_round(rng1, valid, num_hypotheses)

    if use_5pt:
        # Nister 5-point minimal hypotheses (geometry/fivepoint.py): the
        # 8-point fit degenerates on plane-dominated samples (any member
        # of the plane's E-family fits) — the exact minimal solver keeps
        # the true twisted-pair candidates in the pool. Solved in f64 on
        # the host behind pure_callback (no TPU nonsymmetric eig);
        # disable for pure-on-device paths.
        from .fivepoint import five_point_hypotheses
        idx5 = _sample_minimal_sets(rng5, max(num_hypotheses // 4, 32), n,
                                    valid, sample_size=5)
        Es5, ok5 = five_point_hypotheses(kpts0n, kpts1n, idx5)
        Es5 = Es5.astype(kpts0n.dtype)
        errs5 = jax.vmap(lambda E: sampson_error(kpts0n, kpts1n, E))(Es5)
        counts5 = jnp.where(
            ok5,
            jnp.sum(jnp.where(valid[None, :],
                              jnp.maximum(1.0 - errs5 / thresh_sq, 0.0),
                              0.0), axis=-1),
            -1.0)
        Es1 = jnp.concatenate([Es1, Es5])
        errs1 = jnp.concatenate([errs1, errs5])
        counts1 = jnp.concatenate([counts1, counts5])

    # Round 2: resample from the best consensus set (kept only when it is
    # large enough to yield diverse 8-point samples).
    best1 = jnp.argmax(counts1)
    inl1 = (errs1[best1] < thresh_sq) & valid
    pool2 = jnp.where(jnp.sum(inl1) >= 16, inl1, valid)
    Es2, errs2, counts2 = fit_round(rng2, pool2, num_hypotheses // 2)

    Es = jnp.concatenate([Es1, Es2])
    errs = jnp.concatenate([errs1, errs2])
    counts = jnp.concatenate([counts1, counts2])

    _, top_idx = jax.lax.top_k(counts, lo_candidates)
    E_cands = Es[top_idx]                          # [C, 3, 3]
    inl_cands = (errs[top_idx] < thresh_sq) & valid[None, :]

    k0h = to_homogeneous(kpts0n)
    k1h = to_homogeneous(kpts1n)

    def local_optimize(E, inl0):
        # Iterated least-squares refit on the consensus set (classic
        # LO-RANSAC inner step, Chum et al. 2003): re-estimate E from all
        # current inliers by weighted 8-point, update the inlier set, and
        # repeat — this jumps a minimal-sample hypothesis to the
        # least-squares optimum of its whole basin before the manifold GN
        # polishes it (round-4 probe: without it, final inlier counts
        # trailed cv2 by ~7 on multi-plane scenes).
        def ls_step(carry, _):
            E, inl = carry
            E_new = essential_8pt(kpts0n, kpts1n,
                                  inl.astype(kpts0n.dtype))
            inl_new = ((sampson_error(kpts0n, kpts1n, E_new) < thresh_sq)
                       & valid)
            better = jnp.sum(inl_new) >= jnp.sum(inl)
            return (jnp.where(better, E_new, E),
                    jnp.where(better, inl_new, inl)), None

        (E, inl0), _ = jax.lax.scan(ls_step, (E, inl0), None, length=3)
        pose = recover_pose(E, kpts0n, kpts1n, inl0)
        R, t = refine_pose_sampson(pose["R"], pose["t"], kpts0n, kpts1n,
                                   thresh_sq, valid)
        E_ref = skew(t) @ R
        e = sampson_error(kpts0n, kpts1n, E_ref)
        inl = (e < thresh_sq) & valid
        z0, z1 = _cheirality_depths(R, t, k0h, k1h)
        # Cheirality-masked MSAC score (see fit_round).
        good = jnp.sum(jnp.where(inl & (z0 > 0) & (z1 > 0),
                                 1.0 - e / thresh_sq, 0.0))
        return E_ref, R, t, inl, good

    E_lo, R_lo, t_lo, inl_lo, cnt_lo = jax.vmap(local_optimize)(
        E_cands, inl_cands)
    best = jnp.argmax(cnt_lo)
    E_final, inl_final = E_lo[best], inl_lo[best]

    return {
        "E": E_final,
        "R": R_lo[best],
        "t": t_lo[best],
        "inliers": inl_final,
        "num_inliers": jnp.sum(inl_final),
        "score": jnp.sum(jnp.where(inl_final, thresh_sq - jnp.minimum(
            sampson_error(kpts0n, kpts1n, E_final), thresh_sq), 0.0)),
    }


def decompose_essential(E: Array) -> tuple[Array, Array]:
    """E -> 4 candidate (R, t): (R1,t), (R1,-t), (R2,t), (R2,-t).

    Standard SVD decomposition with the W matrix; dets are fixed to +1.
    Returns (Rs [4,3,3], ts [4,3]) with unit-norm t.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _cheirality_depths(R: Array, t: Array, k0h: Array, k1h: Array):
    """Closed-form two-view depths for rays k0h (cam0) and k1h (cam1).

    From x1 ~ R x0 z0 + t:  cross(x1, R x0) z0 = -cross(x1, t).
    Returns (z0, z1) per correspondence.
    """
    Rx0 = k0h @ R.T                               # [N, 3]
    c_a = jnp.cross(k1h, Rx0)
    c_b = jnp.cross(k1h, t[None, :])
    denom = jnp.sum(c_a * c_a, axis=-1)
    z0 = -jnp.sum(c_a * c_b, axis=-1) / jnp.maximum(denom, 1e-12)
    p1 = (k0h * z0[:, None]) @ R.T + t[None, :]
    return z0, p1[:, 2]


def recover_pose(E: Array, kpts0n: Array, kpts1n: Array, inliers: Array):
    """Pick the (R, t) with maximal cheirality support — cv2.recoverPose
    semantics (reference use: evaluation.py:228-239) as one XLA program.

    Returns dict with R [3,3], t [3], num_good [].
    """
    k0h = to_homogeneous(kpts0n)
    k1h = to_homogeneous(kpts1n)
    Rs, ts = decompose_essential(E)

    def support(R, t):
        z0, z1 = _cheirality_depths(R, t, k0h, k1h)
        good = (z0 > 0) & (z1 > 0) & inliers
        return jnp.sum(good)

    counts = jax.vmap(support)(Rs, ts)
    best = jnp.argmax(counts)
    return {"R": Rs[best], "t": ts[best], "num_good": counts[best]}


def decompose_homography(H: Array):
    """Calibrated homography -> 4 candidate (R, t, n) motions.

    Ma-Soatto-Kosecka ("Invitation to 3-D Vision", Thm 5.19) SVD method:
    normalize H by its middle singular value, build the two structure
    solutions from the singular vectors, add the (t, n) sign flips.
    t is returned unit-norm (scale is unobservable).
    """
    _, s_all, _ = jnp.linalg.svd(H)
    Hn = H / jnp.maximum(s_all[1], 1e-12)
    _, s, Vt = jnp.linalg.svd(Hn)
    V = Vt.T
    s1, s3 = s[0], s[2]
    denom = jnp.sqrt(jnp.maximum(s1 ** 2 - s3 ** 2, 1e-12))
    a = jnp.sqrt(jnp.maximum(1.0 - s3 ** 2, 0.0))
    b = jnp.sqrt(jnp.maximum(s1 ** 2 - 1.0, 0.0))
    u1 = (a * V[:, 0] + b * V[:, 2]) / denom
    u2 = (a * V[:, 0] - b * V[:, 2]) / denom
    v2 = V[:, 1]

    def sol(u):
        U1 = jnp.stack([v2, u, jnp.cross(v2, u)], axis=1)
        Hv2 = Hn @ v2
        Hu = Hn @ u
        W1 = jnp.stack([Hv2, Hu, jnp.cross(Hv2, Hu)], axis=1)
        R = W1 @ U1.T
        nrm = jnp.cross(v2, u)
        t = (Hn - R) @ nrm
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, t, nrm

    R1, t1, n1 = sol(u1)
    R2, t2, n2 = sol(u2)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])
    return Rs, ts, ns


@partial(jax.jit, static_argnames=("num_hypotheses", "lo_candidates",
                                   "planar_fallback", "use_5pt"))
def estimate_pose(kpts0: Array, kpts1: Array, valid: Array, K0: Array,
                  K1: Array, rng: Array, thresh_px: float = 1.0,
                  num_hypotheses: int = 512, lo_candidates: int = 8,
                  planar_fallback: bool = True,
                  use_5pt: bool | None = None):
    """End-to-end pose estimation mirroring the reference's estimate_pose
    (dloc/evaluate/utils/evaluation.py:209-240): normalize by intrinsics,
    threshold = thresh_px / f_mean (same duplicated-index mean of
    [K0_fx, K1_fy, K0_fx, K1_fy], :213), RANSAC E, recoverPose.

    ``planar_fallback`` additionally fits a calibrated homography and
    scores its decomposed (R, t) candidates against the E-path by
    cheirality-checked inlier count — for (near-)planar scenes the
    8-point fit lands in the degenerate E-family (every member fits the
    Sampson residuals), and only the H route recovers the true motion
    (COLMAP makes the same E-vs-H model choice).

    Args:
      kpts0, kpts1: [N, 2] pixel coordinates (padded).
      valid: [N] bool mask.
    Returns:
      dict with R, t, inliers, num_inliers, ok (num_inliers >= 5).
    """
    f_mean = (K0[0, 0] + K1[1, 1] + K0[0, 0] + K1[1, 1]) / 4.0
    norm_thresh = thresh_px / f_mean

    c0 = jnp.stack([K0[0, 2], K0[1, 2]])
    f0 = jnp.stack([K0[0, 0], K0[1, 1]])
    c1 = jnp.stack([K1[0, 2], K1[1, 2]])
    f1 = jnp.stack([K1[0, 0], K1[1, 1]])
    k0n = (kpts0 - c0[None]) / f0[None]
    k1n = (kpts1 - c1[None]) / f1[None]

    rngE, rngH, rngP = jax.random.split(rng, 3)
    res = ransac_essential(k0n, k1n, valid, norm_thresh, rngE,
                           num_hypotheses=num_hypotheses,
                           lo_candidates=lo_candidates, use_5pt=use_5pt)
    E_final, R_final, t_final = res["E"], res["R"], res["t"]
    inl_final = res["inliers"]

    if planar_fallback:
        from .homography import ransac_homography
        thresh_sq = jnp.asarray(norm_thresh, k0n.dtype) ** 2
        k0h = to_homogeneous(k0n)
        k1h = to_homogeneous(k1n)
        n = k0n.shape[0]

        resH = ransac_homography(k0n, k1n, valid, norm_thresh * 3.0, rngH,
                                 num_hypotheses=max(num_hypotheses // 2, 64))
        H = resH["H"]
        on_plane = resH["inliers"]
        off_plane = valid & ~on_plane
        Rs, ts, _ = decompose_homography(H)

        # Plane-and-parallax rescue (DEGENSAC, Chum et al. 2005): when the
        # matches are dominated by one scene plane, 8-point samples land in
        # the degenerate E-family of that plane and the true E may never
        # enter the hypothesis pool (measured round 4: GT pose had up to 7
        # more inliers than anything LO-RANSAC found on multi-plane
        # scenes). The dominant-plane H pins the family; each OFF-plane
        # correspondence contributes a residual line l = (H x0) x x1
        # through the epipole e', two lines fix e', and E = [e']x H is the
        # unique compatible essential matrix. Sampled off-plane line pairs
        # give a fixed budget of such candidates, each GN-refined.
        Hx0 = k0h @ H.T
        lines = jnp.cross(Hx0, k1h)
        lines = lines / jnp.maximum(
            jnp.linalg.norm(lines, axis=-1, keepdims=True), 1e-12)
        idx2 = _sample_minimal_sets(rngP, 16, n, off_plane, sample_size=2)
        epipoles = jnp.cross(lines[idx2[:, 0]], lines[idx2[:, 1]])
        S110 = jnp.array([1.0, 1.0, 0.0], k0n.dtype)

        def pp_candidate(e):
            e = e / jnp.maximum(jnp.linalg.norm(e), 1e-12)
            F = skew(e) @ H
            U, _, Vt = jnp.linalg.svd(F)
            E = (U * S110[None, :]) @ Vt
            inl0 = (sampson_error(k0n, k1n, E) < thresh_sq) & valid
            pose = recover_pose(E, k0n, k1n, inl0)
            return refine_pose_sampson(pose["R"], pose["t"], k0n, k1n,
                                       thresh_sq, valid)

        Rp, tp = jax.vmap(pp_candidate)(epipoles)

        # Degeneracy trigger (DEGENSAC): the P&P candidates and the
        # off-plane-weighted vote only engage when the E-route's inlier
        # set is actually dominated by the plane — on well-conditioned
        # scenes the plain cheirality count is the better statistic and
        # the extra machinery measurably regressed pairs (round-4 probe).
        h_dom = (jnp.sum(on_plane & inl_final)
                 / jnp.maximum(jnp.sum(inl_final), 1))
        degenerate = h_dom > 0.7

        # Unified vote over all candidate poses. The RAW H decompositions
        # stay unrefined: within the planar E-family every member fits the
        # Sampson residuals, so GN would drift and destroy exactly the
        # cheirality disambiguation the H route provides. In the
        # degenerate regime, off-plane inliers count double — on-plane
        # points cannot separate family members (every member fits them),
        # so the off-plane points carry all the pose information.
        # Ordering [H, P&P, E] keeps the legacy tie-break (H-route wins
        # an exact tie against the E route).
        R_all = jnp.concatenate([Rs, Rp, R_final[None]], axis=0)
        t_all = jnp.concatenate([ts, tp, t_final[None]], axis=0)
        off_w = jnp.where(degenerate, 2, 0)
        n_cand = R_all.shape[0]
        pp_mask = jnp.zeros((n_cand,), bool).at[4:4 + 16].set(True)

        def score(R, t):
            e = sampson_error(k0n, k1n, skew(t) @ R)
            inl = (e < thresh_sq) & valid
            z0, z1 = _cheirality_depths(R, t, k0h, k1h)
            good = inl & (z0 > 0) & (z1 > 0)
            msac = jnp.where(good, 1.0 - e / thresh_sq, 0.0)
            return inl, jnp.sum(msac) + off_w * jnp.sum(
                jnp.where(good & off_plane, msac, 0.0))

        inl_all, score_all = jax.vmap(score)(R_all, t_all)
        score_all = jnp.where(pp_mask & ~degenerate, -1, score_all)
        b = jnp.argmax(score_all)
        R_final, t_final = R_all[b], t_all[b]
        inl_final = inl_all[b]
        E_final = skew(t_final) @ R_final

    return {
        "E": E_final,
        "R": R_final,
        "t": t_final,
        "inliers": inl_final,
        "num_inliers": jnp.sum(inl_final),
        "ok": (jnp.sum(valid) >= 5) & (jnp.sum(inl_final) >= 5),
    }
