"""Factor initialization strategies.

The reference initializes from files only (seeded uniform random via
matrix_export.py).  This module adds the standard NMF initializations:

  * ``random_init``    — seeded uniform, the reference generator's semantics
  * ``nndsvd_init``    — Boutsidis & Gallopoulos (2008) SVD-based init, with
                         the 'a' (average-fill) and 'ar' (random-fill)
                         variants; deterministic, much better starting cost
  * ``scaled_random``  — uniform scaled so mean(W@H) matches mean(X)

All return NumPy float32 (host-side, one-time setup cost — jnp takes over
from the first iteration).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["random_init", "scaled_random_init", "nndsvd_init"]


def random_init(
    m: int, k: int, n: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform[0,1) W and H, NumPy legacy RandomState (matrix_export.py:4-7)."""
    rng = np.random.RandomState(seed)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return w, h


def scaled_random_init(
    x: np.ndarray, k: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform init scaled so E[W@H] == E[X] (removes the initial scale gap)."""
    m, n = x.shape
    w, h = random_init(m, k, n, seed)
    # E[w]=E[h]=0.5 -> E[(WH)_ij] = k/4 ; rescale each factor by sqrt
    target = float(np.mean(x))
    scale = np.sqrt(max(target, np.finfo(np.float32).tiny) / (k * 0.25))
    return (w * scale).astype(np.float32), (h * scale).astype(np.float32)


def nndsvd_init(
    x: np.ndarray,
    k: int,
    variant: str = "nndsvd",
    seed: int = 0,
    eps: float = 1e-6,
    svd: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Non-Negative Double SVD initialization (Boutsidis & Gallopoulos 2008).

    variants: 'nndsvd' (zeros kept — best for sparse output), 'nndsvda'
    (zeros set to mean(X) — dense, good for KL/MU which cannot escape exact
    zeros), 'nndsvdar' (zeros set to small random — dense, breaks symmetry).

    Note for the multiplicative-update solver: MU cannot move entries that
    start at zero, so prefer 'nndsvda'/'nndsvdar' with it.

    ``svd`` optionally supplies a precomputed ``np.linalg.svd(x,
    full_matrices=False)`` triple — the SVD depends only on X, so rank
    sweeps / multi-member inits compute it once and slice per rank
    (models.selection._member_inits does this).
    """
    if variant not in ("nndsvd", "nndsvda", "nndsvdar"):
        raise ValueError(f"unknown NNDSVD variant {variant!r}")
    x = np.asarray(x, dtype=np.float64)
    m, n = x.shape
    if k > min(m, n):
        raise ValueError(f"rank {k} exceeds min(M, N) = {min(m, n)}")
    u, s, vt = np.linalg.svd(x, full_matrices=False) if svd is None else svd
    u, s, vt = u[:, :k], s[:k], vt[:k]

    w = np.zeros((m, k))
    h = np.zeros((k, n))
    # leading factor: |u1| sqrt(s1), |v1| sqrt(s1) (Perron vector is nonneg)
    w[:, 0] = np.sqrt(s[0]) * np.abs(u[:, 0])
    h[0, :] = np.sqrt(s[0]) * np.abs(vt[0, :])
    for j in range(1, k):
        uj, vj = u[:, j], vt[j, :]
        up, un = np.maximum(uj, 0), np.maximum(-uj, 0)
        vp, vn = np.maximum(vj, 0), np.maximum(-vj, 0)
        n_up, n_un = np.linalg.norm(up), np.linalg.norm(un)
        n_vp, n_vn = np.linalg.norm(vp), np.linalg.norm(vn)
        pos, neg = n_up * n_vp, n_un * n_vn
        if pos >= neg:
            norm, uu, vv = pos, up / max(n_up, 1e-30), vp / max(n_vp, 1e-30)
        else:
            norm, uu, vv = neg, un / max(n_un, 1e-30), vn / max(n_vn, 1e-30)
        scale = np.sqrt(s[j] * norm)
        w[:, j] = scale * uu
        h[j, :] = scale * vv

    if variant == "nndsvda":
        avg = x.mean()
        w[w < eps] = avg
        h[h < eps] = avg
    elif variant == "nndsvdar":
        rng = np.random.RandomState(seed)
        avg = x.mean()
        wz = w < eps
        hz = h < eps
        w[wz] = avg * rng.rand(int(wz.sum())) / 100.0
        h[hz] = avg * rng.rand(int(hz.sum())) / 100.0
    return w.astype(np.float32), h.astype(np.float32)
