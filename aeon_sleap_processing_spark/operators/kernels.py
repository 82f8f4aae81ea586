"""Stateful per-event kernels (SURVEY §2.9, W8/J4).

These are the only two algorithms in the reference that are genuinely
sequential and cannot be expressed as window/join plans:

1. ``greedy_identity_scan`` — frame-to-frame greedy identity tracking with a
   2x2 distance matrix (`social_behaviour_detection.py:306-348` tube test,
   `:650-679` fights). Runs inside ``applyInPandas`` per event; events are
   seconds-to-minutes long so per-group memory is tiny.
2. ``hungarian_assign`` — per-tick optimal bipartite pose↔identity assignment
   (`combine_pose_id_chunk.py:83-143`), scipy ``linear_sum_assignment`` on
   matrices of size <= n_mice.

Catalyst keeps these AFTER the cheap vectorized filters in the DAG (the
reference documents the same staging: "computationally expensive, so only
performed on pre-filtered events", `tube_test_detection_logic.md:35`).
"""

from __future__ import annotations

from itertools import permutations

import numpy as np

try:  # resolved ONCE: a failed import inside the per-tick hot path costs a
    # full sys.path scan per call (~0.25 ms — measured to dominate the kernel)
    from scipy.optimize import linear_sum_assignment as _scipy_lsa
except ImportError:
    _scipy_lsa = None

__all__ = ["greedy_identity_scan", "hungarian_assign"]


def _lsa(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """linear_sum_assignment: scipy if present, else exact permutation search
    (valid for the small matrices this engine produces; guards size)."""
    if _scipy_lsa is not None:
        return _scipy_lsa(cost)
    n_r, n_c = cost.shape
    transposed = n_r > n_c
    c = cost.T if transposed else cost
    n, m = c.shape  # n <= m
    if n > 9:
        raise RuntimeError("scipy unavailable and matrix too large for brute force")
    best, best_cols = np.inf, None
    for cols in permutations(range(m), n):
        tot = c[np.arange(n), cols].sum()
        if tot < best:
            best, best_cols = tot, cols
    rows = np.arange(n)
    cols = np.asarray(best_cols)
    if transposed:
        return cols, rows
    return rows, cols


def greedy_identity_scan(
    c0: np.ndarray, c1: np.ndarray, count_votes: bool = True
) -> tuple[list[int], np.ndarray]:
    """Greedy frame-to-frame identity tracking over two centroid tracks.

    Args:
        c0, c1: arrays of shape (2, n) — x/y per frame for mouse 0 / mouse 1
            (NaN = lost tracking).
        count_votes: accumulate the 2x2 vote matrix (tube-test variant).

    Returns:
        (id_swaps, track_votes): frame indices (relative) where identities are
        swapped, and the vote matrix for the global majority flip.

    Semantics pinned to the reference: frames where BOTH tracks are fully NaN
    are skipped without updating last-known positions; the assignment keeps
    identities when d00+d11 <= d01+d10 (ties keep).
    """
    n = c0.shape[1]
    last0, last1 = c0[:, 0], c1[:, 0]
    id_swaps: list[int] = []
    votes = np.zeros((2, 2), dtype=np.int64)
    if count_votes and not np.isnan(c0[:, 0]).any() and not np.isnan(c1[:, 0]).any():
        votes[0, 0] += 1
        votes[1, 1] += 1
    for i in range(1, n):
        if np.isnan(c0[:, i]).any() and np.isnan(c1[:, i]).any():
            continue
        d00 = np.sqrt(np.sum((c0[:, i] - last0) ** 2))
        d01 = np.sqrt(np.sum((c0[:, i] - last1) ** 2))
        d10 = np.sqrt(np.sum((c1[:, i] - last0) ** 2))
        d11 = np.sqrt(np.sum((c1[:, i] - last1) ** 2))
        if d00 + d11 <= d01 + d10:
            last0, last1 = c0[:, i], c1[:, i]
            if count_votes:
                votes[0, 0] += 1
                votes[1, 1] += 1
        else:
            last0, last1 = c1[:, i], c0[:, i]
            id_swaps.append(i)
            if count_votes:
                votes[0, 1] += 1
                votes[1, 0] += 1
    return id_swaps, votes


def hungarian_assign(
    cost: np.ndarray, feasible: np.ndarray | None = None
) -> list[tuple[int, int]]:
    """Optimal bipartite assignment minimizing total cost.

    ``feasible`` masks allowed (row, col) pairs; infeasible pairs get +inf
    cost, and assignments landing on them are dropped (mirrors the
    reference's feasibility reduction, `combine_pose_id_chunk.py:107-119`).

    Uses scipy's ``linear_sum_assignment`` when available, else an exact
    brute-force permutation search — matrices here are at most a few mice
    wide, so n! is tiny.
    """
    c = cost.astype(float).copy()
    if feasible is not None:
        c[~feasible] = np.inf
    # guard: rows/cols that are fully infeasible would make LSA raise
    valid_rows = np.isfinite(c).any(axis=1)
    valid_cols = np.isfinite(c).any(axis=0)
    sub = c[np.ix_(valid_rows, valid_cols)]
    if sub.size == 0:
        return []
    sub[~np.isfinite(sub)] = 1e12
    ri, ci = _lsa(sub)
    rows = np.where(valid_rows)[0]
    cols = np.where(valid_cols)[0]
    out = []
    for r, cc in zip(ri, ci):
        if sub[r, cc] < 1e12:
            out.append((int(rows[r]), int(cols[cc])))
    return out
