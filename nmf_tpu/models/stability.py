"""Consensus-clustering rank selection (Brunet et al., PNAS 2004).

The standard methodology for choosing NMF's rank K: factorize many times per
candidate rank from different random initializations, record for each run
which component dominates each column (its cluster label), and average the
resulting connectivity matrices into a per-rank **consensus matrix**.  If K
matches real structure, cluster assignments are stable across restarts and
the consensus entries concentrate at 0/1; instability smears them.  Two
scalar summaries:

* **cophenetic correlation** — correlation between consensus "distances"
  (1 - consensus) and the cophenetic distances of their average-linkage
  dendrogram; 1.0 = perfectly stable.  Brunet's rule: pick the largest K
  before the coefficient starts to fall.
* **dispersion** (Kim & Park 2007) — ``mean(4 * (C - 1/2)^2)``; 1.0 when
  every consensus entry is 0 or 1.

TPU mapping: the WHOLE study — every rank x every restart — is ONE batched
:func:`nmf_tpu.solve_rank_sweep` call (members embedded at max(ranks) with
exact-zero unused columns), so the factorizations run as one compiled
program on the MXU; only the O(N^2)-per-rank consensus assembly runs on the
host.  N here is the number of data columns — the consensus matrices are
(N, N), so sample or slice very wide X before a stability study.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import numpy as np

from .selection import SelectionResult, solve_rank_sweep
from ..utils.config import SolveConfig

__all__ = ["StabilityResult", "rank_stability", "consensus_matrix"]


def _consensus_from_host(
    h_all: np.ndarray, ranks: np.ndarray, rank: int
) -> np.ndarray:
    idx = [i for i in range(len(ranks)) if int(ranks[i]) == int(rank)]
    if not idx:
        raise ValueError(f"no members with rank {rank} in this result")
    n = h_all.shape[2]
    acc = np.zeros((n, n), np.float64)
    for i in idx:
        labels = h_all[i, : int(rank), :].argmax(axis=0)
        acc += labels[:, None] == labels[None, :]
    return (acc / len(idx)).astype(np.float32)


def consensus_matrix(sel: SelectionResult, rank: int) -> np.ndarray:
    """Average connectivity matrix over ``sel``'s members with this rank.

    A column's label is its dominant component (argmax over the rank axis
    of H); two columns are connected when they share a label.  All member
    factors are fetched in ONE device-to-host transfer (per-member slices
    would pay this platform's high per-transfer latency R times).
    """
    h_all = np.asarray(sel.results.h, np.float32)
    return _consensus_from_host(h_all, sel.ranks, rank)


def _cophenetic(consensus: np.ndarray) -> float:
    """Cophenetic correlation of the consensus matrix (scipy average
    linkage over 1 - consensus)."""
    from scipy.cluster.hierarchy import average, cophenet
    from scipy.spatial.distance import squareform

    d = 1.0 - consensus
    np.fill_diagonal(d, 0.0)
    # symmetrize against fp round-off before condensing
    cond = squareform((d + d.T) / 2.0, checks=False)
    if not np.any(cond):
        return 1.0  # perfectly stable: all restarts agree exactly
    if np.ptp(cond) == 0.0:
        # all pairs equally (un)stable: the correlation is 0/0 — there is
        # no hierarchical structure at all, so report zero stability
        # evidence rather than NaN (which would poison best_rank)
        return 0.0
    z = average(cond)
    coph, _ = cophenet(z, cond)
    return float(coph) if np.isfinite(coph) else 0.0


@dataclasses.dataclass
class StabilityResult:
    """Per-rank stability study.  ``cophenetic``/``dispersion`` align with
    ``ranks``; ``consensus[k]`` is rank k's (N, N) consensus matrix (kept
    only when requested).  ``sweep`` is the underlying batched solve."""

    ranks: np.ndarray
    cophenetic: np.ndarray
    dispersion: np.ndarray
    consensus: Dict[int, np.ndarray]
    sweep: SelectionResult

    def best_rank(self) -> int:
        """Brunet's rule of thumb: the largest rank BEFORE the first drop
        of the cophenetic coefficient (the last index of the initial
        non-increasing... strictly, scan until the coefficient falls)."""
        c = self.cophenetic
        for i in range(1, len(c)):
            if c[i] < c[i - 1] - 1e-9:
                return int(self.ranks[i - 1])
        return int(self.ranks[-1])


def rank_stability(
    x,
    ranks: Sequence[int],
    n_restarts: int = 20,
    config: SolveConfig = SolveConfig(),
    *,
    seed: int = 0,
    init: str = "random",
    mesh=None,
    keep_consensus: bool = False,
) -> StabilityResult:
    """Consensus-clustering stability study over candidate ranks.

    Runs ``len(ranks) * n_restarts`` factorizations as ONE batched
    :func:`nmf_tpu.solve_rank_sweep` program (each member gets seed
    ``seed + member_index``), then assembles per-rank consensus matrices
    and their cophenetic-correlation / dispersion coefficients on the host.

    ``init`` should be seed-sensitive ('random', 'scaled', 'nndsvdar') —
    deterministic inits would make every restart identical and report
    perfect (meaningless) stability.  ``ranks`` are de-duplicated and
    sorted ascending (the first-drop rule needs an ascending scan).
    Memory: O(N^2) per rank host-side.
    """
    # best_rank's first-drop rule needs an ascending scan; duplicates would
    # silently double-weight a rank's consensus
    ranks = sorted({int(k) for k in ranks})
    if not ranks:
        raise ValueError("ranks must be non-empty")
    if n_restarts < 2:
        raise ValueError(
            "a consensus over fewer than 2 restarts cannot measure stability"
        )
    if init not in ("random", "scaled", "nndsvdar"):
        raise ValueError(
            f"init={init!r} is deterministic: every restart would be "
            "identical (use 'random', 'scaled', or 'nndsvdar')"
        )
    members = [k for k in ranks for _ in range(n_restarts)]
    sweep = solve_rank_sweep(
        x, members, config=config, seed=seed, init=init, mesh=mesh
    )
    coph = np.empty(len(ranks), np.float64)
    disp = np.empty(len(ranks), np.float64)
    kept: Dict[int, np.ndarray] = {}
    # one D2H fetch of every member's factors for the whole study
    h_all = np.asarray(sweep.results.h, np.float32)
    for j, k in enumerate(ranks):
        c = _consensus_from_host(h_all, sweep.ranks, k)
        coph[j] = _cophenetic(c)
        disp[j] = float(np.mean(4.0 * (c - 0.5) ** 2))
        if keep_consensus:
            kept[k] = c
    return StabilityResult(
        ranks=np.asarray(ranks, np.int64),
        cophenetic=coph,
        dispersion=disp,
        consensus=kept,
        sweep=sweep,
    )
