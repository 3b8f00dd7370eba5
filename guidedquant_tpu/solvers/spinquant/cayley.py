"""Cayley SGD on the Stiefel manifold — rotation learning optimizer.

Re-design of the reference's ``SGDG`` (stiefel=True path,
``spin_quant/train_utils/optimizer.py``: ``Cayley_loop`` :33-39, qr
retraction :42-50): momentum SGD whose update is the Cayley transform
Y(a) = (I - a/2 A)^{-1} (I + a/2 A) X with A the skew-symmetrized
gradient-momentum, approximated by the fixed-point iteration

    Y_{t+1} = X - a * A @ (X + Y_t) / 2.

Keeps iterates orthogonal without explicit retraction; periodic QR
re-orthonormalization guards drift.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CayleyState(NamedTuple):
    momentum: jax.Array  # pytree of momenta matching the rotation pytree
    step: jax.Array


def _skew(M):
    return (M - M.swapaxes(-1, -2)) / 2.0


def cayley_loop(X, A, lr, iters: int = 6):
    """Fixed-point iteration for the Cayley transform (optimizer.py:33-39).

    Converges for lr*||A|| < 2; more iterations tighten orthogonality when
    gradients are large."""
    Y = X - lr * (A @ X)
    for _ in range(iters):
        Y = X - lr * (A @ ((X + Y) / 2.0))
    return Y


def init(rotations) -> CayleyState:
    return CayleyState(
        momentum=jax.tree_util.tree_map(jnp.zeros_like, rotations),
        step=jnp.zeros((), jnp.int32))


def update(grads, state: CayleyState, rotations, lr: float,
           momentum: float = 0.9, qr_every: int = 0):
    """One Cayley-SGD step; returns (new_rotations, new_state).

    Every leaf must be [..., n, n] with orthonormal [..., :, :].
    """
    def one(g, m, X):
        # momentum in the tangent-ish space
        m_new = momentum * m + g
        # project to skew: A = hat(M) X^T - X hat(M)^T  (left translation)
        MXt = m_new @ X.swapaxes(-1, -2)
        A = _skew(MXt)
        X_new = cayley_loop(X, A, lr)
        return X_new, m_new

    flat_R, treedef = jax.tree_util.tree_flatten(rotations)
    flat_m = treedef.flatten_up_to(state.momentum)
    flat_g = treedef.flatten_up_to(grads)
    new_R, new_m = [], []
    for g, m, X in zip(flat_g, flat_m, flat_R):
        Xn, mn = one(g, m, X)
        new_R.append(Xn)
        new_m.append(mn)
    step = state.step + 1

    rot = jax.tree_util.tree_unflatten(treedef, new_R)
    if qr_every:
        def retract(X):
            Q, R = jnp.linalg.qr(X)
            return Q * jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))[..., None, :]
        rot = jax.lax.cond(
            step % qr_every == 0,
            lambda r: jax.tree_util.tree_map(retract, r),
            lambda r: r, rot)
    return rot, CayleyState(
        momentum=jax.tree_util.tree_unflatten(treedef, new_m), step=step)


def orthogonality_error(rotations) -> float:
    def err(X):
        n = X.shape[-1]
        return jnp.max(jnp.abs(X @ X.swapaxes(-1, -2) - jnp.eye(n)))
    leaves = [err(x) for x in jax.tree_util.tree_leaves(rotations)]
    return jnp.max(jnp.stack(leaves))
