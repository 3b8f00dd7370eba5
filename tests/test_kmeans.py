"""Seed quantizer tests: optimal splits vs brute force, upscale invariants,
monotone-MSE any-precision property."""

import numpy as np
import pytest

from guidedquant_tpu.solvers.kmeans1d import (
    _prefix_sums, _optimal_two_means, kmeans_1d, seed_and_upscale_rows)
from guidedquant_tpu.solvers.seed import seed_and_upscale_module, dequant_from_labels


def _sse(x, w, cent, labels):
    return float((w * (x - cent[labels]) ** 2).sum())


def _brute_two_means(x, w):
    """Exhaustive optimal contiguous 2-split of sorted x (per row)."""
    n = len(x)
    best, best_s = np.inf, 1
    for s in range(1, n):
        out = 0.0
        for seg in (slice(0, s), slice(s, n)):
            ww, xx = w[seg], x[seg]
            if ww.sum() > 0:
                c = (ww * xx).sum() / ww.sum()
            else:
                c = xx.mean()
            out += (ww * (xx - c) ** 2).sum()
        if out < best - 1e-12:
            best, best_s = out, s
    return best, best_s


def test_optimal_two_means_matches_bruteforce(rng):
    R, n = 12, 33
    x = np.sort(rng.normal(size=(R, n)), axis=1)
    w = rng.random((R, n)) + 0.01
    cent, borders = _optimal_two_means(x, w)
    for r in range(R):
        ref_sse, ref_s = _brute_two_means(x[r], w[r])
        labels = (np.arange(n) >= borders[r, 1]).astype(int)
        got = _sse(x[r], w[r], cent[r], labels)
        assert got <= ref_sse + 1e-9, (r, got, ref_sse)


def test_kmeans_quality_vs_random_partition(rng):
    R, n, k = 6, 64, 4
    x = np.sort(rng.normal(size=(R, n)), axis=1)
    w = rng.random((R, n)) + 0.01
    cent, borders = kmeans_1d(x, w, k)
    assert cent.shape == (R, k) and borders.shape == (R, k + 1)
    # monotone borders, full coverage
    assert (np.diff(borders, axis=1) >= 0).all()
    assert (borders[:, 0] == 0).all() and (borders[:, -1] == n).all()
    # centroids sorted ascending (1-D contiguous clusters)
    assert (np.diff(cent, axis=1) >= -1e-9).all()
    # better than equal-size partition
    for r in range(R):
        labels = np.searchsorted(borders[r, 1:-1], np.arange(n), side="right")
        got = _sse(x[r], w[r], cent[r], labels)
        eq = np.minimum((np.arange(n) * k) // n, k - 1)
        ceq = np.array([np.average(x[r][eq == c], weights=w[r][eq == c])
                        for c in range(k)])
        assert got <= _sse(x[r], w[r], ceq, eq) + 1e-9


def test_zero_weight_rows_fall_back_to_uniform(rng):
    x = np.sort(rng.normal(size=(3, 16)), axis=1)
    w = np.zeros((3, 16))
    cent, borders = kmeans_1d(x, w, 4)
    assert np.isfinite(cent).all()
    assert (np.diff(borders, axis=1).sum(axis=1) == 16).all()


def test_upscale_monotone_mse(rng):
    """Reconstruction error must be non-increasing in bit-width, and the
    b-bit code must be the MSB prefix of the parent code."""
    N, K = 8, 96
    wgt = rng.normal(size=(N, K)).astype(np.float32)
    grad = (rng.random((N, K)) ** 2).astype(np.float32)
    seed_bit, parent_bit = 2, 6
    luts, labels = seed_and_upscale_module(wgt, grad, seed_bit, parent_bit)
    assert labels.shape == (N, 1, K) and labels.max() < 2 ** parent_bit
    errs = []
    for i, b in enumerate(range(seed_bit, parent_bit + 1)):
        deq = dequant_from_labels(labels, luts[i], b, parent_bit)
        errs.append(float((grad * (deq - wgt) ** 2).sum()))
    assert all(errs[i + 1] <= errs[i] + 1e-6 for i in range(len(errs) - 1)), errs
    # 6-bit on 96 values should be near-exact ordering-wise
    assert errs[-1] < errs[0] * 0.2


def test_upscale_split_is_locally_optimal(rng):
    """Each level's split of each interval must match the brute-force optimal
    2-means split of that interval."""
    from guidedquant_tpu.solvers.kmeans1d import upscale_level
    R, n = 4, 40
    x = np.sort(rng.normal(size=(R, n)), axis=1)
    w = rng.random((R, n)) + 0.05
    W, WX = _prefix_sums(x, w)
    cent, borders = kmeans_1d(x, w, 2)
    cent2, borders2 = upscale_level(W, WX, cent, borders)
    assert cent2.shape == (R, 4) and borders2.shape == (R, 5)
    for r in range(R):
        for c in range(2):
            lo, hi = borders[r, c], borders[r, c + 1]
            if hi - lo < 2:
                continue
            _, s = _brute_two_means(x[r, lo:hi], w[r, lo:hi])
            assert borders2[r, 2 * c + 1] == lo + s, (r, c)


def test_labels_respect_sorted_intervals(rng):
    N, K = 4, 64
    wgt = rng.normal(size=(N, K)).astype(np.float32)
    grad = np.ones((N, K), np.float32)
    luts, labels = seed_and_upscale_module(wgt, grad, 2, 4)
    # codes must be monotone in the weight value within each row
    for r in range(N):
        order = np.argsort(wgt[r])
        lab_sorted = labels[r, 0][order]
        assert (np.diff(lab_sorted.astype(int)) >= 0).all()
