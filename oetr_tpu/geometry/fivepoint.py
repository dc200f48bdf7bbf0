"""Nister/Stewenius 5-point minimal essential-matrix solver.

Round-4 addition: the 8-point minimal solver degenerates when a sample
is dominated by one scene plane (any member of the plane's 2-parameter
E-family fits), which measured as the residual pose-AUC gap vs OpenCV's
5-point RANSAC on multi-plane scenes (BASELINE.md §5, probe_ransac_gap).
The 5-point solver works from exactly the 4-dim nullspace, so planar
samples still yield the true twisted-pair candidates.

Method (Stewenius et al., "Recent developments on direct relative
orientation"): E = x E1 + y E2 + z E3 + E4 over the nullspace basis of
the 5 epipolar constraints; det(E) = 0 and 2 E E^T E - tr(E E^T) E = 0
give 10 cubics in (x, y, z); reducing the 10 degree-3 monomials against
the degree<=2 monomial basis B yields the 10x10 action matrix of
multiplication-by-x on the quotient ring, whose real eigenpairs are the
solutions.

Two implementation twists keep this dependency-light and exact:
  * The 10x20 coefficient matrix is extracted NUMERICALLY: each cubic
    is evaluated at 20 fixed generic points and the coefficients are
    recovered through one precomputed 20x20 inverse-Vandermonde solve —
    no symbolic expansion (the error-prone part of every classical
    implementation).
  * The nonsymmetric 10x10 eigensolve has no TPU lowering, so it runs
    in float64 numpy on the host behind `jax.pure_callback`. The
    batched 8-point + LO machinery (ransac.py) remains the pure-on-TPU
    default; the 5-point rounds are an accuracy add-on used by the
    evaluation harnesses (host-synced once per pair, ~ms).

Reference behaviour being matched: cv2.findEssentialMat's 5-point
RANSAC as used by /root/reference/dloc/evaluate/utils/evaluation.py:219.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Static monomial machinery (f64, precomputed at import)
# ---------------------------------------------------------------------------

# Monomial exponent table: first 10 = degree-3 monomials (the reduced
# set A), last 10 = basis B of the quotient ring (degree <= 2).
_MONOMIALS = [
    (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1), (1, 0, 2),
    (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2),
    (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]

_rng = np.random.default_rng(1234)
_PTS = _rng.normal(size=(20, 3)) * 0.9 + _rng.normal(size=(20, 3)) * 0.1
_V = np.stack([[p[0] ** a * p[1] ** b * p[2] ** c
                for (a, b, c) in _MONOMIALS] for p in _PTS])
_V_INV = np.linalg.inv(_V)
# Conditioning sanity: with the seeded points cond(_V) ~ 2e3, giving
# ~12 accurate digits in f64 coefficient recovery.


def _constraint_values(E: np.ndarray) -> np.ndarray:
    """The 10 cubic constraint values for a batch of E matrices.

    E: [..., 3, 3] -> [..., 10] (det followed by the trace constraint).
    """
    det = np.linalg.det(E)
    EEt = E @ np.swapaxes(E, -1, -2)
    tr = np.trace(EEt, axis1=-2, axis2=-1)
    C = 2.0 * EEt @ E - tr[..., None, None] * E
    return np.concatenate([det[..., None], C.reshape(E.shape[:-2] + (9,))],
                          axis=-1)


def solve_5pt_batch(bases: np.ndarray):
    """Solve the 5-point problem for a batch of nullspace bases.

    Args:
      bases: [H, 4, 9] float — rows are the nullspace basis vectors
        (E1, E2, E3, E4 row-major flattened), e.g. the 4 smallest right
        singular vectors of the 5x9 epipolar constraint matrix.

    Returns:
      (E_out [H, 10, 3, 3] float32, valid [H, 10] bool) — up to 10 real
      solutions per sample, projected onto the essential manifold.
    """
    bases = np.asarray(bases, np.float64)
    h = bases.shape[0]
    Eb = bases.reshape(h, 4, 3, 3)

    # Evaluate each cubic at the 20 generic points: E at point k is
    # x_k E1 + y_k E2 + z_k E3 + E4.
    coeff = np.concatenate([_PTS, np.ones((20, 1))], axis=1)    # [20, 4]
    E_at = np.einsum("kp,hpij->hkij", coeff, Eb)                # [H,20,3,3]
    F = _constraint_values(E_at)                                # [H,20,10]
    # Recover polynomial coefficients: V @ c = F  =>  c = V^-1 F.
    M = np.einsum("mk,hkj->hjm", _V_INV, F)                     # [H,10,20]

    MA, MB = M[:, :, :10], M[:, :, 10:]
    dets = np.abs(np.linalg.det(MA))
    ok_sample = dets > 1e-12
    MA_safe = np.where(ok_sample[:, None, None], MA,
                       np.eye(10)[None])
    X = np.linalg.solve(MA_safe, MB)                            # [H,10,10]

    # Action matrix of multiplication-by-x on basis
    # B = [x^2, xy, xz, y^2, yz, z^2, x, y, z, 1]:
    # x*B[0..5] are the degree-3 monomials A[0..5] == -X[0..5] . B;
    # x*B[6..8] = B[0..2]; x*B[9] = B[6].
    T = np.zeros((h, 10, 10))
    T[:, 0:6] = -X[:, 0:6]
    T[:, 6, 0] = 1.0
    T[:, 7, 1] = 1.0
    T[:, 8, 2] = 1.0
    T[:, 9, 6] = 1.0

    E_out = np.zeros((h, 10, 3, 3), np.float32)
    valid = np.zeros((h, 10), bool)
    for i in range(h):
        if not ok_sample[i]:
            continue
        lam, W = np.linalg.eig(T[i])
        n_found = 0
        for j in range(10):
            if abs(lam[j].imag) > 1e-6 * (1.0 + abs(lam[j].real)):
                continue
            v = W[:, j].real
            if abs(v[9]) < 1e-12:
                continue                       # solution at infinity
            x = float(lam[j].real)
            y = float(v[7] / v[9])
            z = float(v[8] / v[9])
            E = (x * Eb[i, 0] + y * Eb[i, 1] + z * Eb[i, 2] + Eb[i, 3])
            # Project onto the essential manifold (singular values 1,1,0).
            U, _, Vt = np.linalg.svd(E)
            E = (U * np.array([1.0, 1.0, 0.0])) @ Vt
            E_out[i, n_found] = E.astype(np.float32)
            valid[i, n_found] = True
            n_found += 1
    return E_out, valid


def nullspace_bases(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    """[H, 5, 2] normalized correspondence samples -> [H, 4, 9] bases."""
    h = p0.shape[0]
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    ones = np.ones_like(x0)
    A = np.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0,
                  ones], axis=-1)                               # [H, 5, 9]
    # Right-singular vectors of the 4 smallest singular values.
    _, _, Vt = np.linalg.svd(A)
    return Vt[:, 5:9, :]


def solve_5pt_host(p0, p1):
    """numpy host path: [H, 5, 2] x2 -> (E [H, 10, 3, 3], valid [H, 10])."""
    return solve_5pt_batch(nullspace_bases(np.asarray(p0, np.float64),
                                           np.asarray(p1, np.float64)))


def five_point_hypotheses(kpts0n, kpts1n, idx):
    """JAX entry: gather 5-point samples and solve on the host.

    kpts0n/kpts1n: [N, 2] normalized coords (any JAX array);
    idx: [H, 5] int sample indices. Returns (E [H*10, 3, 3] f32,
    valid [H*10] bool) as JAX arrays via pure_callback.
    """
    import jax
    import jax.numpy as jnp

    h = idx.shape[0]
    p0 = kpts0n[idx]                                            # [H, 5, 2]
    p1 = kpts1n[idx]

    def cb(p0_, p1_):
        E, v = solve_5pt_host(p0_, p1_)
        return E.reshape(-1, 3, 3), v.reshape(-1)

    E, valid = jax.pure_callback(
        cb,
        (jax.ShapeDtypeStruct((h * 10, 3, 3), jnp.float32),
         jax.ShapeDtypeStruct((h * 10,), jnp.bool_)),
        p0, p1, vmap_method="sequential")
    return E, valid
