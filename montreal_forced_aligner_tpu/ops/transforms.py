"""Feature-space transform estimation: LDA, MLLT (STC), fMLLR (CMLLR).

Replaces the reference's C++ estimators (``kalpy.feat.lda``
``LdaStatsAccumulator``/``MlltStatsAccumulator``, call sites
``acoustic_modeling/lda.py:83-437``; ``kalpy.feat.fmllr.FmllrComputer``,
``corpus/features.py:422-548``). Statistic accumulation is batched device
math (one-hot matmuls over frames); the small matrix solves run on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# LDA
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("num_classes",))
def accumulate_lda_stats(
    feats: jnp.ndarray,  # (B, T, D) spliced features
    frame_lengths: jnp.ndarray,
    frame_class: jnp.ndarray,  # (B, T) int32 class (pdf) per frame
    num_classes: int,
):
    """Returns (class_counts (C,), class_sums (C, D), total_second (D, D))."""
    B, T, D = feats.shape
    N = B * T
    mask = (jnp.arange(T)[None, :] < frame_lengths[:, None]).reshape(-1)
    cls = jnp.where(mask, frame_class.reshape(-1), 0)
    x = jnp.where(mask[:, None], feats.reshape(N, D), 0.0)
    counts = jax.ops.segment_sum(
        mask.astype(jnp.float32), cls, num_segments=num_classes
    )
    sums = jax.ops.segment_sum(x, cls, num_segments=num_classes)
    second = jnp.einsum("nd,ne->de", x, x, precision=HIGH)
    return counts, sums, second


def estimate_lda(
    class_counts: np.ndarray,  # (C,)
    class_sums: np.ndarray,  # (C, D)
    total_second: np.ndarray,  # (D, D)
    target_dim: int = 40,
    within_floor: float = 1e-6,
) -> np.ndarray:
    """LDA transform (target_dim, D): rows diagonalize between-class scatter
    with unit within-class covariance (Kaldi ``est-lda`` semantics)."""
    import scipy.linalg

    counts = np.maximum(class_counts, 0.0)
    total = counts.sum()
    mean = class_sums.sum(axis=0) / total
    with np.errstate(divide="ignore", invalid="ignore"):
        class_means = class_sums / np.maximum(counts, 1e-10)[:, None]
    between = (
        np.einsum("c,cd,ce->de", counts, class_means, class_means) / total
        - np.outer(mean, mean)
    )
    total_covar = total_second / total - np.outer(mean, mean)
    within = total_covar - between
    # symmetrize + floor
    within = (within + within.T) / 2 + within_floor * np.eye(len(mean))
    between = (between + between.T) / 2
    eigvals, eigvecs = scipy.linalg.eigh(between, within)
    order = np.argsort(eigvals)[::-1][:target_dim]
    M = eigvecs[:, order].T  # rows: generalized eigvecs, v' W v = 1 already
    return M.astype(np.float32)


# ---------------------------------------------------------------------------
# MLLT (semi-tied covariance)
# ---------------------------------------------------------------------------
@jax.jit
def accumulate_mllt_stats(
    feats: jnp.ndarray,  # (B, T, D) current (LDA-space) features
    frame_lengths: jnp.ndarray,
    frame_pdf: jnp.ndarray,  # (B, T)
    means: jnp.ndarray,  # (P, G, D) gaussian means
    inv_vars: jnp.ndarray,  # (P, G, D)
    gconsts: jnp.ndarray,  # (P, G)
    miv: jnp.ndarray,  # (P, G, D) means*invvars (for posteriors)
):
    """MLLT stats: G[d] = sum_frames sum_g gamma * invvar[g, d] *
    (x - mu_g)(x - mu_g)^T and beta = total posterior mass."""
    B, T, D = feats.shape
    P, G, _ = means.shape
    N = B * T
    mask = (jnp.arange(T)[None, :] < frame_lengths[:, None]).reshape(-1)
    pdf = jnp.where(mask, frame_pdf.reshape(-1), 0)
    x = feats.reshape(N, D)
    onehot = jax.nn.one_hot(pdf, P, dtype=jnp.float32)
    sel = lambda arr: jnp.einsum(
        "np,pgd->ngd", onehot, arr, precision=HIGH
    )
    mu = sel(means)  # (N, G, D)
    iv = sel(inv_vars)
    m_iv = sel(miv)
    gc = jnp.einsum(
        "np,pg->ng", onehot, jnp.maximum(gconsts, -1.0e30), precision=HIGH
    )
    quad = (
        jnp.einsum("ngd,nd->ng", m_iv, x, precision=HIGH)
        - 0.5 * jnp.einsum("ngd,nd->ng", iv, x * x, precision=HIGH)
        + gc
    )
    ll = jax.scipy.special.logsumexp(quad, axis=-1)
    post = jnp.where(mask[:, None], jnp.exp(quad - ll[:, None]), 0.0)  # (N, G)
    diff = x[:, None, :] - mu  # (N, G, D)
    w = post[:, :, None] * iv  # (N, G, D) per-dim weights
    M = N * G
    diff_f = diff.reshape(M, D)
    w_f = w.reshape(M, D)

    def per_dim(d, _):
        wd = w_f[:, d]
        g = jnp.einsum("m,me,mf->ef", wd, diff_f, diff_f, precision=HIGH)
        return d + 1, g

    _, G_mats = jax.lax.scan(per_dim, 0, None, length=D)
    beta = post.sum()
    return G_mats, beta  # (D, D, D), scalar


def solve_mllt(G_mats: np.ndarray, beta: float, num_iters: int = 10) -> np.ndarray:
    """Row-wise MLLT update (Kaldi ``est-mllt``): maximize
    beta * log|det M| - 0.5 * sum_d m_d G_d m_d^T."""
    D = G_mats.shape[0]
    M = np.eye(D)
    for _ in range(num_iters):
        for d in range(D):
            inv_Gd = np.linalg.inv(G_mats[d] / beta + 1e-8 * np.eye(D))
            cof = np.linalg.inv(M).T * np.linalg.det(M)
            c = cof[d]
            denom = c @ inv_Gd @ c
            M[d] = c @ inv_Gd / np.sqrt(max(denom, 1e-20))
    return M.astype(np.float32)


# ---------------------------------------------------------------------------
# fMLLR (CMLLR)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("num_speakers",))
def accumulate_fmllr_stats(
    feats: jnp.ndarray,  # (B, T, D)
    frame_lengths: jnp.ndarray,
    frame_pdf: jnp.ndarray,  # (B, T)
    speaker_idx: jnp.ndarray,  # (B,)
    frame_weight: jnp.ndarray,  # (B, T) per-frame weights (silence weighting)
    means: jnp.ndarray,  # (P, G, D)
    inv_vars: jnp.ndarray,  # (P, G, D)
    gconsts: jnp.ndarray,  # (P, G)
    miv: jnp.ndarray,  # (P, G, D)
    num_speakers: int,
):
    """Per-speaker fMLLR sufficient statistics (Kaldi ``gmm-est-fmllr``):

      K[s]    = sum gamma * invvar * mu x+^T          (S, D, D+1)
      G[s, d] = sum gamma * invvar[d] * x+ x+^T        (S, D, D+1, D+1)
      beta[s] = sum gamma
    """
    B, T, D = feats.shape
    P, G, _ = means.shape
    N = B * T
    mask = (jnp.arange(T)[None, :] < frame_lengths[:, None]).reshape(-1)
    pdf = jnp.where(mask, frame_pdf.reshape(-1), 0)
    x = feats.reshape(N, D)
    xp = jnp.concatenate([x, jnp.ones((N, 1))], axis=1)  # (N, D+1)
    fw = jnp.where(mask, frame_weight.reshape(-1), 0.0)
    spk = jnp.repeat(speaker_idx, T)

    onehot_p = jax.nn.one_hot(pdf, P, dtype=jnp.float32)
    sel = lambda arr: jnp.einsum("np,pgd->ngd", onehot_p, arr, precision=HIGH)
    mu = sel(means)
    iv = sel(inv_vars)
    m_iv = sel(miv)
    gc = jnp.einsum(
        "np,pg->ng", onehot_p, jnp.maximum(gconsts, -1.0e30), precision=HIGH
    )
    quad = (
        jnp.einsum("ngd,nd->ng", m_iv, x, precision=HIGH)
        - 0.5 * jnp.einsum("ngd,nd->ng", iv, x * x, precision=HIGH)
        + gc
    )
    ll = jax.scipy.special.logsumexp(quad, axis=-1)
    post = jnp.where(mask[:, None], jnp.exp(quad - ll[:, None]), 0.0)
    post = post * fw[:, None]  # (N, G)

    # frame-level combined quantities (sum over gaussians first)
    w_mu_iv = jnp.einsum("ng,ngd->nd", post, mu * iv, precision=HIGH)  # (N, D)
    w_iv = jnp.einsum("ng,ngd->nd", post, iv, precision=HIGH)  # (N, D)
    gamma_n = post.sum(axis=1)  # (N,)

    onehot_s = jax.nn.one_hot(spk, num_speakers, dtype=jnp.float32)
    beta = jnp.einsum("ns,n->s", onehot_s, gamma_n, precision=HIGH)
    K = jnp.einsum("ns,nd,ne->sde", onehot_s, w_mu_iv, xp, precision=HIGH)

    def per_dim(d, _):
        wd = w_iv[:, d]  # (N,)
        g = jnp.einsum(
            "ns,n,ne,nf->sef", onehot_s, wd, xp, xp, precision=HIGH
        )
        return d + 1, g

    _, G_mats = jax.lax.scan(per_dim, 0, None, length=D)  # (D, S, E, E)
    G_mats = jnp.moveaxis(G_mats, 0, 1)  # (S, D, E, E)
    return K, G_mats, beta


def solve_fmllr(
    K: np.ndarray,  # (D, D+1)
    G_mats: np.ndarray,  # (D, D+1, D+1)
    beta: float,
    num_iters: int = 40,
    min_count: float = 500.0,
) -> Optional[np.ndarray]:
    """Iterative row-wise full fMLLR solve (Kaldi ``FmllrOptions`` defaults);
    returns (D, D+1) transform, or None if under min_count."""
    if beta < min_count:
        return None
    D = K.shape[0]
    E = D + 1
    W = np.hstack([np.eye(D), np.zeros((D, 1))])  # init = identity
    inv_G = [np.linalg.inv(G_mats[d] + 1e-6 * np.eye(E)) for d in range(D)]
    for _ in range(num_iters):
        for d in range(D):
            A = W[:, :D]
            cof = np.linalg.inv(A).T * np.linalg.det(A)
            c = np.concatenate([cof[d], [0.0]])  # extended cofactor row
            cG = c @ inv_G[d]
            a = cG @ c  # quadratic coefficient
            b = cG @ K[d]
            # maximize beta*log|alpha*a + b_term| ... standard quadratic root:
            # alpha^2 * a + alpha * b - beta = 0
            disc = b * b + 4 * a * beta
            if a <= 0 or disc < 0:
                continue
            alpha1 = (-b + np.sqrt(disc)) / (2 * a)
            alpha2 = (-b - np.sqrt(disc)) / (2 * a)

            def objf(alpha):
                w = (K[d] + alpha * c) @ inv_G[d]
                lin = np.abs(w @ c)
                return beta * np.log(max(lin, 1e-20)) - 0.5 * w @ G_mats[d] @ w + w @ K[d]

            alpha = alpha1 if objf(alpha1) >= objf(alpha2) else alpha2
            W[d] = (K[d] + alpha * c) @ inv_G[d]
    return W.astype(np.float32)


def solve_fmllr_batched(
    K: np.ndarray,  # (S, D, D+1)
    G_mats: np.ndarray,  # (S, D, D+1, D+1)
    beta: np.ndarray,  # (S,)
    num_iters: int = 40,
) -> np.ndarray:
    """Dispatch: native C++ row-sweep solver when the toolchain built it
    (1600 sequential row steps per solve are numpy-dispatch-bound — ~0.5 s
    at D=40 vs ~20 ms native, threaded over speakers), numpy otherwise.
    Both run the identical double-precision math; a parity test pins them
    together."""
    native = _solve_fmllr_native(K, G_mats, beta, num_iters)
    if native is not None:
        return native
    return _solve_fmllr_batched_numpy(K, G_mats, beta, num_iters)


def _solve_fmllr_native(K, G_mats, beta, num_iters):
    import ctypes

    from montreal_forced_aligner_tpu.native import fmllr_lib

    lib = fmllr_lib()
    if lib is None:
        return None
    S, D, E = K.shape
    K64 = np.ascontiguousarray(K, np.float64)
    G64 = np.ascontiguousarray(G_mats, np.float64)
    b64 = np.ascontiguousarray(beta, np.float64)
    W = np.tile(
        np.hstack([np.eye(D), np.zeros((D, 1))]), (S, 1, 1)
    ).astype(np.float64)
    threads = min(int(S), max(os.cpu_count() or 1, 1), 16)
    rc = lib.fmllr_solve_batched(
        K64.ctypes.data_as(ctypes.c_void_p),
        G64.ctypes.data_as(ctypes.c_void_p),
        b64.ctypes.data_as(ctypes.c_void_p),
        W.ctypes.data_as(ctypes.c_void_p),
        S, D, int(num_iters), threads,
    )
    if rc != 0:
        return None
    return W.astype(np.float32)


def _solve_fmllr_batched_numpy(
    K: np.ndarray,  # (S, D, D+1)
    G_mats: np.ndarray,  # (S, D, D+1, D+1)
    beta: np.ndarray,  # (S,)
    num_iters: int = 40,
) -> np.ndarray:
    """Row-wise fMLLR solve for S speakers in lockstep: same sweep math as
    :func:`solve_fmllr`, vectorized over the speaker axis so the wall time
    is independent of speaker count (the per-speaker loop costs ~0.2 s per
    speaker at D=40 — minutes on corpora with hundreds of speakers).

    The cofactor row needs det(A) and A^-1 of the current transform each
    row step; those are maintained by Sherman-Morrison rank-1 updates
    (row d is the only row that changed) with an exact batched recompute at
    the top of every sweep to cap drift. Returns (S, D, D+1) float32.
    """
    S, D, E = K.shape
    K = np.ascontiguousarray(K, np.float64)
    G_mats = np.ascontiguousarray(G_mats, np.float64)
    beta = np.asarray(beta, np.float64)
    W = np.tile(np.hstack([np.eye(D), np.zeros((D, 1))]), (S, 1, 1))
    inv_G = np.linalg.inv(
        G_mats + 1e-6 * np.eye(E)
    )  # (S, D, E, E), batched
    for _sweep in range(num_iters):
        W_before = W.copy()
        A = W[:, :, :D]
        invA = np.linalg.inv(A)  # (S, D, D) exact per sweep
        detA = np.linalg.det(A)  # (S,)
        for d in range(D):
            # cofactor row d of A: cof = inv(A)^T * det(A)
            c = np.zeros((S, E))
            c[:, :D] = invA[:, :, d] * detA[:, None]
            iGd = inv_G[:, d]  # (S, E, E)
            cG = np.einsum("se,sef->sf", c, iGd)
            a = np.einsum("se,se->s", cG, c)
            b = np.einsum("se,se->s", cG, K[:, d])
            disc = b * b + 4.0 * a * beta
            ok = (a > 0) & (disc >= 0)
            safe_a = np.where(ok, a, 1.0)
            sq = np.sqrt(np.maximum(disc, 0.0))
            alpha1 = (-b + sq) / (2.0 * safe_a)
            alpha2 = (-b - sq) / (2.0 * safe_a)

            def row(alpha):
                return np.einsum(
                    "se,sef->sf", K[:, d] + alpha[:, None] * c, iGd
                )

            def objf(w):
                lin = np.maximum(
                    np.abs(np.einsum("se,se->s", w, c)), 1e-20
                )
                return (
                    beta * np.log(lin)
                    - 0.5
                    * np.einsum("se,sef,sf->s", w, G_mats[:, d], w)
                    + np.einsum("se,se->s", w, K[:, d])
                )

            w1, w2 = row(alpha1), row(alpha2)
            w_new = np.where(
                (objf(w1) >= objf(w2))[:, None], w1, w2
            )
            old = W[:, d].copy()
            W[:, d] = np.where(ok[:, None], w_new, old)
            # Sherman-Morrison update of invA/detA for the changed row:
            # A_new = A + e_d delta^T  (delta = new - old, first D cols)
            delta = (W[:, d] - old)[:, :D]  # (S, D); zero where not ok
            factor = 1.0 + np.einsum("sd,sd->s", delta, invA[:, :, d])
            degenerate = np.abs(factor) < 1e-12
            safe_f = np.where(degenerate, 1.0, factor)
            colv = invA[:, :, d].copy()  # (S, D) = A^-1 e_d
            rowv = np.einsum("sd,sde->se", delta, invA)  # (S, D)
            invA = invA - colv[:, :, None] * rowv[:, None, :] / safe_f[:, None, None]
            detA = detA * factor
            if degenerate.any():
                # fall back to exact recompute for degenerate speakers
                idx = np.nonzero(degenerate)[0]
                invA[idx] = np.linalg.inv(W[idx][:, :, :D])
                detA[idx] = np.linalg.det(W[idx][:, :, :D])
        # converged sweeps change nothing further (the row objective is
        # concave per row; Kaldi iterates a fixed 40 sweeps — stopping once
        # the update stalls below tolerance yields the same transform and
        # typically cuts the sweep count ~3x)
        if np.max(np.abs(W - W_before)) < 1e-7 * (1.0 + np.max(np.abs(W))):
            break
    return W.astype(np.float32)


def estimate_speaker_fmllr(
    K: np.ndarray,  # (S, D, D+1)
    G_mats: np.ndarray,  # (S, D, D+1, D+1)
    beta: np.ndarray,  # (S,)
    min_count: float = 500.0,
) -> np.ndarray:
    """Per-speaker transforms (identity when under min_count): (S, D, D+1)."""
    S, D, E = K.shape
    out = np.tile(np.hstack([np.eye(D), np.zeros((D, 1))]), (S, 1, 1)).astype(
        np.float32
    )
    valid = np.asarray(beta, np.float64) >= min_count
    if valid.any():
        idx = np.nonzero(valid)[0]
        # chunk the speaker axis: the batched solver holds float64
        # (chunk, D, E, E) inverses (~5.5 MB/speaker at D=40), so an
        # unbounded batch would add gigabytes on large-speaker corpora
        for lo in range(0, len(idx), 64):
            sub = idx[lo : lo + 64]
            out[sub] = solve_fmllr_batched(K[sub], G_mats[sub], beta[sub])
    return out
