"""LNQ: layerwise non-uniform quantization solver.

JAX re-design of the reference solver
(``any_precision/quantization/layerwise_quantize.py``):

- objective     sum_g  (dW_g) H_g (dW_g)^T            (objective_function :14-50)
- update_P      Gauss-Seidel coordinate descent over columns with 128-column
                blocking and error feedback                    (update_P :52-127)
- update_C      per-row weighted least squares for the codebook.
                The reference builds A = L^T P and runs a giant ridge lstsq
                (update_C :129-208); we solve the *same* minimizer via the
                normal equations  (P^T H P + lam I) c = P^T H w  — no Cholesky
                factor needed, the heavy contractions ride the MXU in f32 and
                the tiny (2^b x 2^b) solves run in f64 on host.
- train_least_squares   damped-PD outer loop with early stop    (:210-292)

Saliency groups partition the *output rows*: row i of W uses Hessian
H[i // (N // G)].
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

CD_BLOCK = 128  # reference cd_block_size (layerwise_quantize.py:91)
LAMBDA_REG = 1e-7  # ridge (:177)


# ---------------------------------------------------------------------------
# Hessian damping (reference :225-241)
# ---------------------------------------------------------------------------

def dampen_hessians(H: np.ndarray, init_damp: float = 1e-5,
                    max_damp: float = 1.0) -> np.ndarray:
    """Ensure each H[g] is positive definite by scaled diagonal damping."""
    H = np.array(H, dtype=np.float64, copy=True)
    G, D, _ = H.shape
    for g in range(G):
        avg_diag = float(np.mean(np.diag(H[g])))
        if avg_diag <= 0:
            avg_diag = 1.0
        damp, prev = init_damp, 0.0
        while True:
            try:
                np.linalg.cholesky(H[g])
                if prev:
                    logger.info("H[%d] dampened with factor %.2e", g, prev)
                break
            except np.linalg.LinAlgError:
                H[g][np.diag_indices(D)] += (damp - prev) * avg_diag
                prev, damp = damp, damp * 10
                if damp > max_damp * 10:
                    raise RuntimeError(f"H[{g}] not PD even at damp {prev:.1e}")
    return H.astype(np.float32)


# ---------------------------------------------------------------------------
# Objective
# ---------------------------------------------------------------------------

@jax.jit
def objective(W: jnp.ndarray, H: jnp.ndarray, labels: jnp.ndarray,
              C: jnp.ndarray) -> jnp.ndarray:
    """mean over rows-within-group of sum_g dW_g H_g dW_g^T (matches
    objective_function's 'nij,njk,nik->i' then mean)."""
    N, D = W.shape
    G = H.shape[0]
    gs = N // G
    What = jnp.take_along_axis(C, labels, axis=1)
    dW = (What - W).reshape(G, gs, D)
    t = jnp.einsum("gij,gjk->gik", dW, H, preferred_element_type=jnp.float32)
    per_row = jnp.einsum("gik,gik->i", t, dW.astype(t.dtype))
    return per_row.mean()


# ---------------------------------------------------------------------------
# update_P: blocked Gauss-Seidel coordinate descent
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cd_cycles",))
def update_P(W: jnp.ndarray, H: jnp.ndarray, labels: jnp.ndarray,
             C: jnp.ndarray, cd_cycles: int = 4) -> jnp.ndarray:
    """W [N, D], H [G, D, D], labels [N, D] int32, C [N, ncl] -> new labels.

    Column ordering, 128-column blocking and error-feedback updates follow
    update_P (layerwise_quantize.py:52-127): B holds sum_{j>k} dW_j Hn[j,k]
    plus contributions of already-updated columns j<k (Gauss-Seidel).
    """
    N, D = W.shape
    G = H.shape[0]
    gs = N // G
    ncl = C.shape[1]
    BS = min(CD_BLOCK, D)
    assert D % BS == 0

    Wg = W.reshape(G, gs, D).astype(jnp.float32)
    Cg = C.reshape(G, gs, ncl).astype(jnp.float32)
    lab = labels.reshape(G, gs, D).astype(jnp.int32)

    diag = jnp.diagonal(H, axis1=1, axis2=2)  # [G, D]
    Hn = H / diag[:, None, :]  # column-normalized (:86-89)
    Hn_tril = jnp.tril(Hn, -1)

    What = jnp.take_along_axis(Cg, lab, axis=2)

    col_ids = jnp.arange(D)

    def one_cycle(carry, _):
        lab, What = carry
        B = jnp.einsum("gid,gdk->gik", What - Wg, Hn_tril,
                       preferred_element_type=jnp.float32)

        def one_block(carry, s):
            lab, What, B = carry
            Hn_blk = jax.lax.dynamic_slice(Hn, (0, s, s), (G, BS, BS))
            B_blk = jax.lax.dynamic_slice(B, (0, 0, s), (G, gs, BS))
            W_blk = jax.lax.dynamic_slice(Wg, (0, 0, s), (G, gs, BS))
            lab_blk = jax.lax.dynamic_slice(lab, (0, 0, s), (G, gs, BS))
            What_blk = jax.lax.dynamic_slice(What, (0, 0, s), (G, gs, BS))

            def one_col(u, st):
                lab_blk, What_blk, B_blk = st
                sol = W_blk[:, :, u] - B_blk[:, :, u]  # [G, gs]
                dist = jnp.abs(sol[:, :, None] - Cg)  # [G, gs, ncl]
                new = jnp.argmin(dist, axis=-1).astype(jnp.int32)
                wnew = jnp.take_along_axis(Cg, new[:, :, None], axis=2)[:, :, 0]
                lab_blk = lab_blk.at[:, :, u].set(new)
                What_blk = What_blk.at[:, :, u].set(wnew)
                delta = wnew - W_blk[:, :, u]  # (What - W) at col u (:115)
                hrow = Hn_blk[:, u, :]  # [G, BS]
                mask = (jnp.arange(BS) > u).astype(B_blk.dtype)
                B_blk = B_blk + delta[:, :, None] * (hrow * mask)[:, None, :]
                return lab_blk, What_blk, B_blk

            lab_blk, What_blk, B_blk = jax.lax.fori_loop(
                0, BS, one_col, (lab_blk, What_blk, B_blk))

            lab = jax.lax.dynamic_update_slice(lab, lab_blk, (0, 0, s))
            What = jax.lax.dynamic_update_slice(What, What_blk, (0, 0, s))
            B = jax.lax.dynamic_update_slice(B, B_blk, (0, 0, s))
            # propagate the block's final (What - W) to later columns (:118)
            Hn_rows = jax.lax.dynamic_slice(Hn, (0, s, 0), (G, BS, D))
            upd = jnp.einsum("gib,gbk->gik", What_blk - W_blk, Hn_rows,
                             preferred_element_type=jnp.float32)
            tail_mask = (col_ids >= s + BS).astype(B.dtype)
            B = B + upd * tail_mask[None, None, :]
            return (lab, What, B), None

        (lab, What, _), _ = jax.lax.scan(
            one_block, (lab, What, B), jnp.arange(0, D, BS))
        return (lab, What), None

    (lab, What), _ = jax.lax.scan(one_cycle, (lab, What), None, length=cd_cycles)
    return lab.reshape(N, D)


# ---------------------------------------------------------------------------
# update_C: codebook least squares via normal equations
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ncl",))
def _normal_eq_chunk(H_g: jnp.ndarray, W_rows: jnp.ndarray,
                     lab_rows: jnp.ndarray, ncl: int):
    """Rows of one group: H_g [D, D], W_rows [R, D], lab_rows [R, D].
    Returns M [R, ncl, ncl] = P^T H P and rhs [R, ncl] = P^T H w."""
    R, D = W_rows.shape
    O = jax.nn.one_hot(lab_rows, ncl, dtype=jnp.float32)  # [R, D, ncl]
    HO = jnp.einsum("jk,rkc->rjc", H_g, O,
                    preferred_element_type=jnp.float32)  # [R, D, ncl]
    M = jnp.einsum("rjb,rjc->rbc", O, HO, preferred_element_type=jnp.float32)
    Hw = jnp.einsum("jk,rk->rj", H_g, W_rows,
                    preferred_element_type=jnp.float32)
    rhs = jnp.einsum("rjc,rj->rc", O, Hw, preferred_element_type=jnp.float32)
    return M, rhs


def update_C(W: np.ndarray, H: np.ndarray, labels: np.ndarray,
             ncl: int, chunk_rows: int = 512) -> np.ndarray:
    """New codebook [N, ncl]: per-row ridge-regularized weighted LS.

    Identical minimizer to the reference's augmented lstsq (A^T A + lam I =
    P^T H P + lam I); contraction on device, tiny solves in f64 on host.
    Empty clusters get a singular row/col — the ridge keeps the system
    solvable and leaves their centroid near zero; rows are then snapped back
    by the next update_P exactly as in the reference.
    """
    N, D = W.shape
    G = H.shape[0]
    gs = N // G
    C_out = np.empty((N, ncl), np.float32)
    Hj = [jnp.asarray(H[g]) for g in range(G)]
    for g in range(G):
        for s in range(g * gs, (g + 1) * gs, chunk_rows):
            e = min(s + chunk_rows, (g + 1) * gs)
            M, rhs = _normal_eq_chunk(Hj[g], jnp.asarray(W[s:e]),
                                      jnp.asarray(labels[s:e]), ncl)
            M = np.asarray(M, np.float64)
            rhs = np.asarray(rhs, np.float64)
            M += LAMBDA_REG * np.eye(ncl)
            sol = np.linalg.solve(M, rhs[..., None])[..., 0]
            if np.isnan(sol).any():
                raise ValueError(f"NaN in update_C rows {s}:{e}")
            C_out[s:e] = sol.astype(np.float32)
    return C_out


# ---------------------------------------------------------------------------
# Shared-shape codebook restriction (TPU fast-kernel family)
# ---------------------------------------------------------------------------

def restrict_shared_shape(C: np.ndarray, rows_per_tile: int = 512):
    """Snap per-row codebooks onto the row-tile-shared-shape family
    C_n = m_n + s_n * g_tile (the family the fast shared-shape decode
    kernel evaluates with scalar coefficients; ops/lut_kernels.py).

    Returns (snapped C, fit dict). Run one more update_P afterwards so the
    assignments adapt to the snapped centroids.
    """
    from ..ops.lut_kernels import fit_shared_shape
    N = C.shape[0]
    rows_per_tile = min(rows_per_tile, N)
    g, s, m, relerr = fit_shared_shape(C, rows_per_tile)
    snapped = (m[:, None] + s[:, None] *
               np.repeat(g, rows_per_tile, axis=0)).astype(np.float32)
    return snapped, {"g": g, "s": s, "m": m, "relerr": relerr,
                     "rows_per_tile": rows_per_tile}


# ---------------------------------------------------------------------------
# Affine codebook restriction (uniform per-row grid; the cheapest TPU
# decode kernel needs no in-kernel LUT resolve at all)
# ---------------------------------------------------------------------------

@jax.jit
def _affine_normal_eq(H_g: jnp.ndarray, W_rows: jnp.ndarray,
                      lab_rows: jnp.ndarray):
    """Exact per-row WLS of the affine codebook GIVEN assignments:
    min_{m,s} (m*1 + s*lab - w) H (m*1 + s*lab - w)^T.

    Design X = [1, lab] (D x 2): returns M [R, 2, 2] = X^T H X and
    rhs [R, 2] = X^T H w."""
    R, D = W_rows.shape
    ones = jnp.ones((R, D), jnp.float32)
    labf = lab_rows.astype(jnp.float32)
    X = jnp.stack([ones, labf], axis=-1)  # [R, D, 2]
    HX = jnp.einsum("jk,rkc->rjc", H_g, X,
                    preferred_element_type=jnp.float32)
    M = jnp.einsum("rjb,rjc->rbc", X, HX, preferred_element_type=jnp.float32)
    Hw = jnp.einsum("jk,rk->rj", H_g, W_rows,
                    preferred_element_type=jnp.float32)
    rhs = jnp.einsum("rjc,rj->rc", X, Hw, preferred_element_type=jnp.float32)
    return M, rhs


def update_C_affine(W: np.ndarray, H: np.ndarray, labels: np.ndarray,
                    ncl: int, chunk_rows: int = 2048) -> np.ndarray:
    """Codebook update restricted to C_n = m_n + s_n * arange(ncl): the
    exact minimizer of the guided objective within the affine family given
    the current assignments."""
    N, D = W.shape
    G = H.shape[0]
    gs = N // G
    C_out = np.empty((N, ncl), np.float32)
    j = np.arange(ncl, dtype=np.float32)
    for g in range(G):
        Hg = jnp.asarray(H[g])
        for s in range(g * gs, (g + 1) * gs, chunk_rows):
            e = min(s + chunk_rows, (g + 1) * gs)
            M, rhs = _affine_normal_eq(Hg, jnp.asarray(W[s:e]),
                                       jnp.asarray(labels[s:e]))
            M = np.asarray(M, np.float64) + LAMBDA_REG * np.eye(2)
            sol = np.linalg.solve(M, np.asarray(rhs, np.float64)[..., None]
                                  )[..., 0]  # [R, 2] = (m, s)
            C_out[s:e] = (sol[:, :1] + sol[:, 1:] * j[None, :]
                          ).astype(np.float32)
    return C_out


# ---------------------------------------------------------------------------
# Outer loop (train_least_squares :210-292)
# ---------------------------------------------------------------------------

def train_least_squares(W: np.ndarray, init_labels: np.ndarray,
                        init_C: np.ndarray, H: np.ndarray,
                        num_iterations: int = 3, cd_cycles: int = 4,
                        shared_shape_tile: Optional[int] = None,
                        codebook_family: str = "free",
                        ) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Alternating minimization with damping + early stop.

    W [N, D], init_labels [N, D], init_C [N, ncl], H [G, D, D].
    Returns (labels, C, log_dict).

    ``shared_shape_tile``: if set, the final codebook is snapped to the
    row-tile-shared-shape family (fast TPU decode kernel) and the
    assignments re-optimized once against the snapped centroids.

    ``codebook_family``: "free" (unrestricted per-row codebook, the
    reference's LNQ) or "affine" (per-row uniform grid m + s*j — the
    cheapest TPU decode kernel: raw code dot on the MXU + O(N) affine
    epilogue, see ops.lut_kernels.lut_matmul_affine). With "affine" every
    C-step is the exact WLS minimizer within the family, so the
    alternation converges to the best affine solution rather than
    snapping a free solution at the end.
    """
    assert codebook_family in ("free", "affine"), codebook_family
    N, D = W.shape
    ncl = init_C.shape[1]
    H = dampen_hessians(H)
    c_step = update_C if codebook_family == "free" else update_C_affine

    Wj = jnp.asarray(W, jnp.float32)
    Hjj = jnp.asarray(H)
    labels = np.asarray(init_labels, np.int32)
    C = np.asarray(init_C, np.float32)
    if codebook_family == "affine":
        # project the (free) seed init into the family before alternating
        C = update_C_affine(W, H, labels, ncl)

    def obj(lab, Cc):
        return float(objective(Wj, Hjj, jnp.asarray(lab),
                               jnp.asarray(Cc)))

    best = obj(labels, C)
    best_labels, best_C = labels.copy(), C.copy()
    log = {"objective": [best], "iteration": [0]}
    logger.info("LNQ initial objective: %.6f", best)

    for it in range(num_iterations):
        # free family: the seed labels are already nearest-neighbor optimal
        # for the seed codebook, so skip the first P-update. affine: the
        # init projection just re-optimized C, so P goes first.
        if it > 0 or codebook_family == "affine":
            prev = labels
            labels = np.asarray(update_P(Wj, Hjj, jnp.asarray(labels),
                                         jnp.asarray(C), cd_cycles))
            changed = (prev != labels).mean() * 100
            logger.info("LNQ iter %d P-update: %.2f%% assignments changed",
                        it + 1, changed)
        o = obj(labels, C)
        log["objective"].append(o)
        log["iteration"].append(it + 1)
        logger.info("LNQ iter %d (P): objective %.6f", it + 1, o)

        C = c_step(W, H, labels, ncl)
        o = obj(labels, C)
        log["objective"].append(o)
        log["iteration"].append(it + 1)
        if o < best:
            best, best_labels, best_C = o, labels.copy(), C.copy()
            logger.info("LNQ iter %d (C): objective %.6f | improved", it + 1, o)
        else:
            logger.info("LNQ iter %d (C): objective %.6f | not improved, "
                        "reverting and stopping", it + 1, o)
            labels, C = best_labels, best_C
            break

    labels, C = best_labels, best_C
    if shared_shape_tile:
        C, fit = restrict_shared_shape(C, shared_shape_tile)
        labels = np.asarray(update_P(Wj, Hjj, jnp.asarray(labels.astype(np.int32)),
                                     jnp.asarray(C), cd_cycles))
        o = obj(labels, C)
        log["objective"].append(o)
        log["iteration"].append(num_iterations + 1)
        log["shared_shape_relerr"] = [fit["relerr"]]
        logger.info("LNQ shared-shape snap (fit relerr %.4f): objective %.6f",
                    fit["relerr"], o)

    return np.asarray(labels, np.uint8), C, log
