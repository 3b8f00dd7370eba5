"""Vectorized weighted 1-D k-means + any-precision binary upscaling.

Replaces the reference's numba/flash1dkmeans seed quantizer
(``any_precision/quantization/quantize.py:11-195``). Same math — weighted
Lloyd's on sorted values with fp64 prefix sums, then incremental optimal
2-way cluster splits up to the parent bit-width — but vectorized over all
rows at once with numpy instead of a prange row loop:

- 1-D clusters are contiguous intervals in sorted order, so assignment is a
  searchsorted against centroid midpoints and centroid update is a prefix-sum
  difference.
- The *optimal* weighted 2-means split of an interval maximizes
  ``L(j)^2/Wl(j) + R(j)^2/Wr(j)`` over split positions j (the x^2 term is
  constant), so upscaling evaluates every position once per level — a
  segmented argmax, O(rows * n) per bit level.

Everything is fp64 (the reference's precision-loss note, quantize.py:124).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _prefix_sums(sorted_x: np.ndarray, w: np.ndarray):
    """fp64 prefix sums with leading zero: W [R, n+1], WX [R, n+1].

    Rows whose total weight is zero fall back to uniform weights
    (reference quantize.py:128-139).
    """
    R, n = sorted_x.shape
    w = w.astype(np.float64)
    x = sorted_x.astype(np.float64)
    tot = w.sum(axis=1)
    w = np.where((tot == 0)[:, None], 1.0, w)
    W = np.zeros((R, n + 1))
    WX = np.zeros((R, n + 1))
    np.cumsum(w, axis=1, out=W[:, 1:])
    np.cumsum(w * x, axis=1, out=WX[:, 1:])
    return W, WX


def _centroid(W, WX, lo, hi):
    """Weighted mean of interval [lo, hi) per (row, cluster); lo/hi [R, C]."""
    r = np.arange(W.shape[0])[:, None]
    dw = W[r, hi] - W[r, lo]
    dwx = WX[r, hi] - WX[r, lo]
    with np.errstate(invalid="ignore", divide="ignore"):
        c = dwx / dw
    return np.where(dw > 0, c, 0.0), dw


def kmeans_1d(sorted_x: np.ndarray, w: np.ndarray, k: int,
              max_iter: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted k-means on pre-sorted 1-D data, vectorized over rows.

    sorted_x, w: [R, n] (ascending x). Returns (centroids [R, k],
    borders [R, k+1] int64) with cluster c = positions [borders[c],
    borders[c+1]).
    """
    R, n = sorted_x.shape
    if k == 2:
        return _optimal_two_means(sorted_x, w)
    W, WX = _prefix_sums(sorted_x, w)
    # Equal-mass quantile init.
    targets = W[:, -1:] * (np.arange(1, k, dtype=np.float64) / k)  # [R, k-1]
    inner = np.empty((R, k - 1), dtype=np.int64)
    for r in range(R):  # searchsorted has no batched form; this loop is cheap
        inner[r] = np.searchsorted(W[r, 1:], targets[r], side="left")
    borders = np.concatenate(
        [np.zeros((R, 1), np.int64), inner, np.full((R, 1), n, np.int64)], axis=1)
    borders.sort(axis=1)
    cent, _ = _centroid(W, WX, borders[:, :-1], borders[:, 1:])

    for _ in range(max_iter):
        mids = (cent[:, :-1] + cent[:, 1:]) / 2.0  # [R, k-1]
        new_inner = np.empty_like(inner)
        for r in range(R):
            new_inner[r] = np.searchsorted(sorted_x[r], mids[r], side="left")
        new_borders = np.concatenate(
            [borders[:, :1] * 0, new_inner, borders[:, -1:]], axis=1)
        new_borders.sort(axis=1)
        if np.array_equal(new_borders, borders):
            break
        borders = new_borders
        new_cent, dw = _centroid(W, WX, borders[:, :-1], borders[:, 1:])
        cent = np.where(dw > 0, new_cent, cent)  # keep empty-cluster centroids
    return cent, borders


def _optimal_two_means(sorted_x: np.ndarray, w: np.ndarray):
    """Exact optimal weighted 2-means per row (contiguous split)."""
    R, n = sorted_x.shape
    W, WX = _prefix_sums(sorted_x, w)
    starts = np.zeros((R, 1), np.int64)
    stops = np.full((R, 1), n, np.int64)
    split = _best_splits(W, WX, starts, stops)  # [R, 1]
    borders = np.concatenate([starts, split, stops], axis=1)
    cent, _ = _centroid(W, WX, borders[:, :-1], borders[:, 1:])
    return cent, borders


def _best_splits(W: np.ndarray, WX: np.ndarray, starts: np.ndarray,
                 stops: np.ndarray) -> np.ndarray:
    """Optimal 2-means split position for every (row, cluster) interval.

    starts/stops: [R, C]. Returns argmax split [R, C] in (start, stop);
    degenerate intervals (len < 2) return start.
    Segmented evaluation: every in-range position j belongs to exactly one
    cluster, so the whole level costs O(R * n).
    """
    R, C = starts.shape
    n = W.shape[1] - 1
    r = np.arange(R)[:, None]

    # Map each position j in [0, n) to its cluster (or -1).
    labels = np.full((R, n), -1, np.int64)
    # build labels via cumulative add at starts/stops
    inc = np.zeros((R, n + 1), np.int64)
    np.add.at(inc, (np.repeat(np.arange(R), C), starts.ravel()), 1)
    np.add.at(inc, (np.repeat(np.arange(R), C), stops.ravel()), -1)
    inside = np.cumsum(inc[:, :-1], axis=1) > 0
    # cluster id at each position = number of starts <= j  - 1 (clusters are
    # ordered and disjoint)
    sid = np.zeros((R, n + 1), np.int64)
    np.add.at(sid, (np.repeat(np.arange(R), C), starts.ravel()), 1)
    cid = np.cumsum(sid[:, :-1], axis=1) - 1
    labels = np.where(inside, cid, -1)

    j = np.arange(n)[None, :].repeat(R, axis=0)
    lab = np.maximum(labels, 0)
    st = np.where(labels >= 0, starts[r, lab], 0)
    sp = np.where(labels >= 0, stops[r, lab], 0)
    valid = (labels >= 0) & (j > st) & (j < sp)

    Wl = np.where(valid, W[r, j] - W[r, st], 0.0)
    Wr = np.where(valid, W[r, sp] - W[r, j], 0.0)
    L = np.where(valid, WX[r, j] - WX[r, st], 0.0)
    Rs = np.where(valid, WX[r, sp] - WX[r, j], 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        obj = np.where(Wl > 0, L * L / Wl, 0.0) + np.where(Wr > 0, Rs * Rs / Wr, 0.0)
    obj = np.where(valid, obj, -np.inf)

    seg = np.where(labels >= 0, r * C + np.maximum(labels, 0), R * C)
    segmax = np.full(R * C + 1, -np.inf)
    np.maximum.at(segmax, seg.ravel(), obj.ravel())
    is_best = obj == segmax[seg]
    best_j = np.full(R * C + 1, np.iinfo(np.int64).max)
    np.minimum.at(best_j, seg.ravel()[is_best.ravel()], j.ravel()[is_best.ravel()])
    out = best_j[:R * C].reshape(R, C)
    # degenerate intervals -> start (empty right half keeps duplicates)
    out = np.where((stops - starts) >= 2, out, starts)
    out = np.clip(out, starts, stops)
    return out


def upscale_level(W, WX, cent: np.ndarray, borders: np.ndarray):
    """One any-precision doubling: every cluster optimally split in two
    (reference _increment_group, quantize.py:31-74). Empty clusters keep
    duplicated centroids."""
    R, C = cent.shape
    starts, stops = borders[:, :-1], borders[:, 1:]
    split = _best_splits(W, WX, starts, stops)

    new_borders = np.empty((R, 2 * C + 1), np.int64)
    new_borders[:, 0:2 * C:2] = starts
    new_borders[:, 1:2 * C:2] = split
    new_borders[:, -1] = stops[:, -1]

    lo = new_borders[:, :-1]
    hi = new_borders[:, 1:]
    new_cent, dw = _centroid(W, WX, lo, hi)
    # empty halves inherit the parent centroid
    parent = np.repeat(cent, 2, axis=1)
    new_cent = np.where(dw > 0, new_cent, parent)
    return new_cent, new_borders


def seed_and_upscale_rows(x: np.ndarray, weights: np.ndarray, seed_bit: int,
                          parent_bit: int, max_iter: int = 50
                          ) -> Tuple[List[np.ndarray], np.ndarray]:
    """Full per-row pipeline on [R, n] data.

    Returns (luts_by_bit: list of [R, 2^b] for b in seed..parent,
             labels [R, n] uint8 parent codes, in original column order).
    """
    R, n = x.shape
    order = np.argsort(x, axis=1, kind="stable")
    r = np.arange(R)[:, None]
    sx = x[r, order]
    sw = weights[r, order]
    W, WX = _prefix_sums(sx, sw)

    cent, borders = kmeans_1d(sx, sw, 2 ** seed_bit, max_iter=max_iter)
    luts = [cent.astype(np.float32)]
    for b in range(seed_bit, parent_bit):
        cent, borders = upscale_level(W, WX, cent, borders)
        luts.append(cent.astype(np.float32))

    # borders -> labels in sorted order -> unsort
    C = 2 ** parent_bit
    labels_sorted = np.zeros((R, n), np.int64)
    inc = np.zeros((R, n + 1), np.int64)
    np.add.at(inc, (np.repeat(np.arange(R), C - 1), borders[:, 1:-1].ravel()), 1)
    labels_sorted = np.cumsum(inc[:, :-1], axis=1)
    labels = np.empty_like(labels_sorted)
    labels[r, order] = labels_sorted
    return luts, labels.astype(np.uint8)
