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
