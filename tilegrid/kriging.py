"""Ordinary kriging (from scratch: empirical variogram -> spherical model
fit -> kriging system solve).

Reference: vector/src/main/scala/geotrellis/vector/interpolation/ (Simple/
Ordinary kriging + Semivariogram fitting). Implemented with plain NumPy
linear algebra; the distributed form is per-tile kriging in
operators.interpolate.kriging_grid — each tile solves against the sample
points within its buffered extent (the reference's kriging is likewise a
per-collection computation).
"""

from __future__ import annotations

import numpy as np


def empirical_variogram(
    pts: np.ndarray, vals: np.ndarray, n_bins: int = 12,
    max_dist: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Binned empirical semivariance: gamma(h) = mean((z_i - z_j)^2) / 2
    over point pairs at distance ~h. Returns (bin centers, gamma)."""
    pts = np.asarray(pts, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    d = np.sqrt(
        (pts[:, None, 0] - pts[None, :, 0]) ** 2
        + (pts[:, None, 1] - pts[None, :, 1]) ** 2
    )
    iu = np.triu_indices(len(pts), k=1)
    dist = d[iu]
    gam = 0.5 * (vals[:, None] - vals[None, :])[iu] ** 2
    if max_dist is None:
        max_dist = float(dist.max()) * 0.6
    if max_dist <= 0.0:
        # all points coincident (dist.max() == 0): no spatial structure to
        # bin — fail loudly instead of letting fit_spherical crash on an
        # empty h array downstream
        raise ValueError(
            "empirical_variogram: all sample points are coincident "
            "(max pairwise distance is 0); cannot fit a variogram"
        )
    edges = np.linspace(0.0, max_dist, n_bins + 1)
    centers, gammas = [], []
    for i in range(n_bins):
        m = (dist >= edges[i]) & (dist < edges[i + 1])
        if m.any():
            centers.append((edges[i] + edges[i + 1]) / 2.0)
            gammas.append(float(gam[m].mean()))
    return np.asarray(centers), np.asarray(gammas)


def spherical_model(h, nugget: float, sill: float, rng: float):
    """Spherical semivariogram (Semivariogram.Spherical in the reference)."""
    h = np.asarray(h, dtype=np.float64)
    s = np.clip(h / rng, 0.0, 1.0)
    return nugget + (sill - nugget) * (1.5 * s - 0.5 * s**3)


def fit_spherical(
    h: np.ndarray, gamma: np.ndarray
) -> tuple[float, float, float]:
    """Deterministic least-squares fit of (nugget, sill, range): grid-search
    the range, closed-form for nugget/sill per candidate."""
    best = None
    hmax = float(h.max())
    for rng in np.linspace(hmax * 0.2, hmax * 1.5, 40):
        s = np.clip(h / rng, 0.0, 1.0)
        basis = 1.5 * s - 0.5 * s**3  # gamma = nugget + (sill-nugget)*basis
        A = np.stack([np.ones_like(basis), basis], axis=1)
        coef, *_ = np.linalg.lstsq(A, gamma, rcond=None)
        nugget = max(coef[0], 0.0)
        sill = max(nugget + coef[1], nugget + 1e-12)
        resid = float(((spherical_model(h, nugget, sill, rng) - gamma) ** 2).sum())
        if best is None or resid < best[0]:
            best = (resid, nugget, sill, rng)
    _, nugget, sill, rng = best
    return float(nugget), float(sill), float(rng)


def ordinary_kriging(
    sample_pts: np.ndarray,
    sample_vals: np.ndarray,
    query_pts: np.ndarray,
    model: tuple[float, float, float],
) -> tuple[np.ndarray, np.ndarray]:
    """Ordinary kriging predictions + variances at query points: solve the
    (n+1) system with the Lagrange multiplier per query (one factorization
    of the sample matrix, reused across all queries)."""
    sp = np.unique(
        np.concatenate(
            [np.asarray(sample_pts, np.float64),
             np.asarray(sample_vals, np.float64)[:, None]], axis=1
        ),
        axis=0,
    )
    # dedupe by location (keep the first value per unique point)
    _, keep = np.unique(sp[:, :2], axis=0, return_index=True)
    sp = sp[np.sort(keep)]
    pts, vals = sp[:, :2], sp[:, 2]
    n = len(pts)
    qp = np.asarray(query_pts, dtype=np.float64)
    nugget, sill, rng = model
    d = np.sqrt(
        (pts[:, None, 0] - pts[None, :, 0]) ** 2
        + (pts[:, None, 1] - pts[None, :, 1]) ** 2
    )
    G = spherical_model(d, nugget, sill, rng)
    np.fill_diagonal(G, 0.0)  # gamma(0) = 0 (exact interpolator when nugget->at-point)
    A = np.ones((n + 1, n + 1))
    A[:n, :n] = G
    A[n, n] = 0.0
    dq = np.sqrt(
        (qp[:, None, 0] - pts[None, :, 0]) ** 2
        + (qp[:, None, 1] - pts[None, :, 1]) ** 2
    )
    B = np.ones((len(qp), n + 1))
    B[:, :n] = spherical_model(dq, nugget, sill, rng)
    # at-sample queries: gamma(0) = 0 so the system returns the sample value
    B[:, :n][dq == 0.0] = 0.0
    try:
        W = np.linalg.solve(A, B.T).T  # (q, n+1)
    except np.linalg.LinAlgError:
        W = (np.linalg.pinv(A) @ B.T).T
    pred = W[:, :n] @ vals
    var = np.maximum((W * B).sum(axis=1), 0.0)
    return pred, var


def _dedupe(sample_pts: np.ndarray, sample_vals: np.ndarray):
    sp = np.unique(
        np.concatenate(
            [np.asarray(sample_pts, np.float64),
             np.asarray(sample_vals, np.float64)[:, None]], axis=1
        ),
        axis=0,
    )
    _, keep = np.unique(sp[:, :2], axis=0, return_index=True)
    sp = sp[np.sort(keep)]
    return sp[:, :2], sp[:, 2]


def simple_kriging(
    sample_pts: np.ndarray,
    sample_vals: np.ndarray,
    query_pts: np.ndarray,
    model: tuple[float, float, float],
    mean: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Simple kriging (reference vector/.../interpolation/SimpleKriging
    .scala semantics): KNOWN constant mean — covariance system C w = c,
    prediction mean + w . (z - mean), variance sill - w . c. Unlike
    ordinary kriging there is no unbiasedness constraint, so far from the
    samples predictions relax to `mean` (default: the sample mean)."""
    pts, vals = _dedupe(sample_pts, sample_vals)
    qp = np.asarray(query_pts, np.float64)
    nugget, sill, rng = model
    m = float(vals.mean()) if mean is None else float(mean)
    d = np.sqrt(
        (pts[:, None, 0] - pts[None, :, 0]) ** 2
        + (pts[:, None, 1] - pts[None, :, 1]) ** 2
    )
    # covariance from the semivariogram: C(h) = sill - gamma(h); C(0) = sill
    C = sill - spherical_model(d, nugget, sill, rng)
    np.fill_diagonal(C, sill)
    dq = np.sqrt(
        (qp[:, None, 0] - pts[None, :, 0]) ** 2
        + (qp[:, None, 1] - pts[None, :, 1]) ** 2
    )
    c = sill - spherical_model(dq, nugget, sill, rng)
    c[dq == 0.0] = sill
    try:
        W = np.linalg.solve(C, c.T).T
    except np.linalg.LinAlgError:
        W = (np.linalg.pinv(C) @ c.T).T
    pred = m + W @ (vals - m)
    var = np.maximum(sill - (W * c).sum(axis=1), 0.0)
    return pred, var


def geo_kriging(
    sample_pts: np.ndarray,
    sample_vals: np.ndarray,
    query_pts: np.ndarray,
    degree: int = 2,
    max_iter: int = 100,
    tol: float = 1e-3,
) -> tuple[np.ndarray, np.ndarray]:
    """Geostatistical kriging (reference vector/.../interpolation/
    GeoKriging.scala:85-260 semantics): universal kriging where the drift
    coefficients and the residual variogram are estimated JOINTLY by
    iterated GLS — fit variogram on OLS residuals, re-estimate beta by GLS
    under that covariance, refit the variogram on the new residuals, repeat
    until the relative beta change falls below `tol` (reference stops at
    delta <= 0.001 or 100 rounds). Unlike universal_kriging (one augmented
    solve, variogram supplied by the caller) the model here adapts to the
    drift-removed residual field. Default drift basis is the reference's
    (x, y, x^2, xy, y^2). Returns (predictions, standard errors) — the
    error includes the drift-estimation uncertainty term f' (F'C^-1 F)^-1 f
    like the reference's kVar."""
    pts, vals = _dedupe(sample_pts, sample_vals)
    qp = np.asarray(query_pts, np.float64)
    n = len(pts)
    F = _drift_basis(pts, degree)
    # column scaling for conditioning (reference scales by max |column|)
    col_scale = np.abs(F).max(axis=0)
    col_scale[col_scale == 0.0] = 1.0
    Fs = F / col_scale
    beta, *_ = np.linalg.lstsq(Fs, vals, rcond=None)
    beta = beta / col_scale
    resid = vals - F @ beta
    model = fit_spherical(*empirical_variogram(pts, resid))
    d = np.sqrt(
        (pts[:, None, 0] - pts[None, :, 0]) ** 2
        + (pts[:, None, 1] - pts[None, :, 1]) ** 2
    )
    for _ in range(max_iter):
        nugget, sill, rng = model
        # covariance under the current residual model: C = sill - gamma(h),
        # diagonal gets the nugget back (C(0) = sill + nugget, reference's
        # sill*J - Gamma + nugget*I form)
        C = sill - spherical_model(d, nugget, sill, rng)
        np.fill_diagonal(C, sill + nugget)
        try:
            Ci = np.linalg.inv(C)
        except np.linalg.LinAlgError:
            Ci = np.linalg.inv(C + np.eye(n) * 1e-7)
        FtCi = Fs.T @ Ci
        new_beta, *_ = np.linalg.lstsq(FtCi @ Fs, FtCi @ vals, rcond=None)
        new_beta = new_beta / col_scale
        denom = np.where(new_beta == 0.0, 1.0, np.abs(new_beta))
        delta = float(np.abs(new_beta - beta).max() / denom.max())
        beta = new_beta
        resid = vals - F @ beta
        if delta <= tol:
            break
        model = fit_spherical(*empirical_variogram(pts, resid))
    nugget, sill, rng = model
    C = sill - spherical_model(d, nugget, sill, rng)
    np.fill_diagonal(C, sill + nugget)
    try:
        Ci = np.linalg.inv(C)
    except np.linalg.LinAlgError:
        Ci = np.linalg.inv(C + np.eye(n) * 1e-7)
    dq = np.sqrt(
        (qp[:, None, 0] - pts[None, :, 0]) ** 2
        + (qp[:, None, 1] - pts[None, :, 1]) ** 2
    )
    cq = sill - spherical_model(dq, nugget, sill, rng)  # (q, n)
    cq[dq == 0.0] = sill + nugget  # exact-match: add nugget (reference loop)
    Fq = _drift_basis(qp, degree)
    pred = Fq @ beta + cq @ (Ci @ resid)
    # drift-uncertainty term: u = f_q - F' C^-1 c_q; var += u' (F'C^-1F)^-1 u
    FtCiF = F.T @ Ci @ F
    try:
        FtCiF_inv = np.linalg.inv(FtCiF)
    except np.linalg.LinAlgError:
        FtCiF_inv = np.linalg.pinv(FtCiF)
    U = Fq - cq @ Ci @ F  # (q, k)
    base = sill - np.einsum("qn,nm,qm->q", cq, Ci, cq)
    drift_term = np.einsum("qk,kl,ql->q", U, FtCiF_inv, U)
    var = np.sqrt(np.maximum(base + drift_term, 0.0))
    return pred, var


def _drift_basis(pts: np.ndarray, degree: int) -> np.ndarray:
    x, y = pts[:, 0], pts[:, 1]
    cols = [np.ones(len(pts))]
    if degree >= 1:
        cols += [x, y]
    if degree >= 2:
        cols += [x * y, x * x, y * y]
    return np.stack(cols, axis=1)


def universal_kriging(
    sample_pts: np.ndarray,
    sample_vals: np.ndarray,
    query_pts: np.ndarray,
    model: tuple[float, float, float],
    degree: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Universal kriging (reference vector/.../interpolation/Universal
    Kriging.scala semantics): unknown polynomial drift of `degree` (1 =
    linear, 2 = quadratic) estimated jointly — the augmented system
    [[Gamma, F], [F^T, 0]] [w; b] = [gamma_q; f_q] where F is the drift
    basis at the samples. Ordinary kriging is the degree-0 special case."""
    pts, vals = _dedupe(sample_pts, sample_vals)
    qp = np.asarray(query_pts, np.float64)
    n = len(pts)
    nugget, sill, rng = model
    F = _drift_basis(pts, degree)
    k = F.shape[1]
    d = np.sqrt(
        (pts[:, None, 0] - pts[None, :, 0]) ** 2
        + (pts[:, None, 1] - pts[None, :, 1]) ** 2
    )
    G = spherical_model(d, nugget, sill, rng)
    np.fill_diagonal(G, 0.0)
    A = np.zeros((n + k, n + k))
    A[:n, :n] = G
    A[:n, n:] = F
    A[n:, :n] = F.T
    dq = np.sqrt(
        (qp[:, None, 0] - pts[None, :, 0]) ** 2
        + (qp[:, None, 1] - pts[None, :, 1]) ** 2
    )
    B = np.zeros((len(qp), n + k))
    B[:, :n] = spherical_model(dq, nugget, sill, rng)
    B[:, :n][dq == 0.0] = 0.0
    B[:, n:] = _drift_basis(qp, degree)
    try:
        W = np.linalg.solve(A, B.T).T
    except np.linalg.LinAlgError:
        W = (np.linalg.pinv(A) @ B.T).T
    pred = W[:, :n] @ vals
    var = np.maximum((W * B).sum(axis=1), 0.0)
    return pred, var
