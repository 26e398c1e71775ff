"""Training statistic accumulation and GMM maximum-likelihood updates.

Replaces the reference's per-job C++ accumulators + parent-process summation
(``gmm-acc-stats-ali`` semantics; call sites ``alignment/multiprocessing.py:576-666``
and the MLE update contract in ``acoustic_modeling/base.py:769-801``).

On device: per-frame Gaussian posteriors within the aligned pdf are computed
from gathered per-frame GMM parameters and scattered into dense
(num_pdf, num_gauss, …) accumulator tensors with ``segment_sum``. Across a
device mesh these tensors are reduced with ``psum`` (see ``parallel/``); the
reference's equivalent was queue-based accumulator summation in the parent
process (``utils.py:1505-1641``).

On host: the MLE update (weights/means/vars with flooring and Gaussian
mixing-up, reference ``_kalpy.gmm`` ``mle_update(mixup=..., power=0.25)``,
``acoustic_modeling/monophone.py:280-296``) runs in numpy — it is tiny
compared to accumulation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.models.gmm import DiagGmmSet


@partial(jax.jit, static_argnames=("num_pdfs",))
def accumulate_gmm_stats(
    feats: jnp.ndarray,  # (B, T, D)
    frame_lengths: jnp.ndarray,  # (B,)
    frame_pdf: jnp.ndarray,  # (B, T) aligned pdf-id per frame
    miv: jnp.ndarray,  # (P, G, D) means*invvars
    iv: jnp.ndarray,  # (P, G, D) invvars
    gconst: jnp.ndarray,  # (P, G)
    num_pdfs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Viterbi-alignment GMM stats.

    Returns (occupancy (P, G), mean_acc (P, G, D), var_acc (P, G, D),
    total_loglike ()). Posteriors are the within-pdf Gaussian
    responsibilities of each frame's aligned pdf.
    """
    B, T, D = feats.shape
    P, G, _ = miv.shape
    mask = (jnp.arange(T)[None, :] < frame_lengths[:, None]).reshape(-1)
    pdf_flat = jnp.where(mask, frame_pdf.reshape(-1), 0)
    x = feats.reshape(-1, D)
    # per-frame per-gauss log-likes of the aligned pdf
    miv_f = miv[pdf_flat]  # (N, G, D)
    iv_f = iv[pdf_flat]
    gc_f = gconst[pdf_flat]  # (N, G)
    quad = (
        jnp.einsum("ngd,nd->ng", miv_f, x, precision=jax.lax.Precision.HIGHEST)
        - 0.5
        * jnp.einsum("ngd,nd->ng", iv_f, x * x, precision=jax.lax.Precision.HIGHEST)
        + gc_f
    )
    loglike = jax.scipy.special.logsumexp(quad, axis=-1)  # (N,)
    post = jnp.exp(quad - loglike[:, None])  # (N, G)
    post = jnp.where(mask[:, None], post, 0.0)
    occ = jax.ops.segment_sum(post, pdf_flat, num_pdfs)  # (P, G)
    mean_acc = jax.ops.segment_sum(post[:, :, None] * x[:, None, :], pdf_flat, num_pdfs)
    var_acc = jax.ops.segment_sum(
        post[:, :, None] * (x * x)[:, None, :], pdf_flat, num_pdfs
    )
    total = jnp.sum(jnp.where(mask, loglike, 0.0))
    return occ, mean_acc, var_acc, total


@partial(jax.jit, static_argnames=("num_tids",))
def accumulate_transition_stats(
    frame_tid: jnp.ndarray,  # (B, T) transition-id per frame (0 = none)
    frame_lengths: jnp.ndarray,  # (B,)
    num_tids: int,
) -> jnp.ndarray:
    """Counts per transition-id: (num_tids + 1,), entry 0 unused."""
    B, T = frame_tid.shape
    mask = jnp.arange(T)[None, :] < frame_lengths[:, None]
    tid = jnp.where(mask, frame_tid, 0).reshape(-1)
    ones = jnp.ones_like(tid, dtype=jnp.float32)
    return jax.ops.segment_sum(ones, tid, num_tids + 1)


@dataclass
class GmmAccumulators:
    """Host-side accumulator container with summation (the parent-process
    reduction in the reference, ``triphone.py:371-380``)."""

    occ: np.ndarray  # (P, G)
    mean_acc: np.ndarray  # (P, G, D)
    var_acc: np.ndarray  # (P, G, D)
    transition_counts: np.ndarray  # (num_tids + 1,)
    total_loglike: float = 0.0
    total_frames: float = 0.0

    @classmethod
    def zeros(cls, num_pdfs: int, max_gauss: int, dim: int, num_tids: int):
        return cls(
            occ=np.zeros((num_pdfs, max_gauss)),
            mean_acc=np.zeros((num_pdfs, max_gauss, dim)),
            var_acc=np.zeros((num_pdfs, max_gauss, dim)),
            transition_counts=np.zeros(num_tids + 1),
        )

    def add(self, occ, mean_acc, var_acc, tcounts, loglike, frames) -> None:
        self.occ += np.asarray(occ)
        self.mean_acc += np.asarray(mean_acc)
        self.var_acc += np.asarray(var_acc)
        self.transition_counts += np.asarray(tcounts)
        self.total_loglike += float(loglike)
        self.total_frames += float(frames)


def mle_update(
    gmm: DiagGmmSet,
    acc: GmmAccumulators,
    min_gaussian_occupancy: float = 10.0,
    min_variance: float = 0.001,
    remove_low_count_gaussians: bool = False,
    update_flags: str = "mvw",
) -> Tuple[DiagGmmSet, dict]:
    """Maximum-likelihood re-estimation (Kaldi ``MleDiagGmmUpdate`` semantics:
    weights/means/variances from accumulated stats; components under the
    occupancy floor keep their previous parameters). ``update_flags`` selects
    which parameter groups update (m=means, v=variances, w=weights), matching
    the reference's MAP adaptation which updates means only
    (``alignment/adapting.py:86-135``, ``update_flags_str="m"``)."""
    occ = acc.occ  # (P, G)
    P, G = occ.shape
    D = acc.mean_acc.shape[2]
    old_means = gmm.get_means()
    old_vars = gmm.get_vars()
    tot_occ_per_pdf = occ.sum(axis=1, keepdims=True)
    valid = occ > min_gaussian_occupancy

    with np.errstate(divide="ignore", invalid="ignore"):
        new_means = np.where(valid[:, :, None], acc.mean_acc / occ[:, :, None], old_means)
        ex2 = acc.var_acc / np.maximum(occ, 1e-10)[:, :, None]
        new_vars = np.where(
            valid[:, :, None], ex2 - new_means**2, old_vars
        )
    new_vars = np.maximum(new_vars, min_variance)
    weights = np.where(
        tot_occ_per_pdf > 0, occ / np.maximum(tot_occ_per_pdf, 1e-10), gmm.weights
    )
    if "m" not in update_flags:
        new_means = old_means
    if "v" not in update_flags:
        new_vars = old_vars
    if "w" not in update_flags:
        weights = gmm.weights.astype(np.float64)
    # keep padding weights at zero
    pad = np.arange(G)[None, :] >= gmm.num_gauss[:, None]
    weights = np.where(pad, 0.0, weights)
    wsum = weights.sum(axis=1, keepdims=True)
    weights = weights / np.maximum(wsum, 1e-10)

    inv_vars = (1.0 / new_vars).astype(np.float32)
    out = DiagGmmSet(
        weights=weights.astype(np.float32),
        means_invvars=(new_means * (1.0 / new_vars)).astype(np.float32),
        inv_vars=inv_vars,
        gconsts=gmm.gconsts.copy(),
        num_gauss=gmm.num_gauss.copy(),
    )
    out.compute_gconsts()
    info = {
        "tot_occ": float(occ.sum()),
        "updated_gauss": int(valid.sum()),
        "floored_gauss": int((~valid & ~pad).sum()),
    }
    return out, info


def ismooth_stats_from_model(
    gmm: DiagGmmSet, acc: GmmAccumulators, tau: float = 20.0
) -> GmmAccumulators:
    """I-smoothing for MAP adaptation (Kaldi
    ``IsmoothStatsAmDiagGmmFromModel``): add ``tau`` pseudo-counts of each
    Gaussian's own distribution to its statistics (reference
    ``alignment/adapting.py:86-135``, ``mapping_tau=20``)."""
    means = gmm.get_means()
    variances = gmm.get_vars()
    pad = np.arange(gmm.max_gauss)[None, :] >= gmm.num_gauss[:, None]
    tau_occ = np.where(pad, 0.0, tau)
    acc.occ = acc.occ + tau_occ
    acc.mean_acc = acc.mean_acc + tau_occ[:, :, None] * means
    acc.var_acc = acc.var_acc + tau_occ[:, :, None] * (variances + means**2)
    return acc


def split_gaussians(
    gmm: DiagGmmSet,
    occs: np.ndarray,  # (P,) or (P, G) occupancy used to pick split targets
    target_total: int,
    perturb_factor: float = 0.01,
    power: float = 0.25,
    min_count: float = 20.0,
    seed: int = 0,
) -> DiagGmmSet:
    """Mix up to ``target_total`` Gaussians (Kaldi ``gmm-mixup`` semantics:
    pdfs get Gaussian budgets proportional to occupancy**power with a
    min-count floor; each new component splits the heaviest-weight component
    with a +-perturb_factor * stddev perturbation).
    """
    rng = np.random.RandomState(seed)
    P = gmm.num_pdfs
    occ_pdf = occs.sum(axis=1) if occs.ndim == 2 else occs
    raw = np.maximum(occ_pdf, min_count) ** power
    targets = np.maximum(
        1, np.floor(raw / raw.sum() * target_total).astype(int)
    )
    targets = np.maximum(targets, gmm.num_gauss)  # never shrink here

    # pad the gaussian axis to the next power of two: mixup grows counts a
    # little every iteration, and without bucketing every jitted kernel that
    # takes (P, G, ...) model arrays recompiles each iteration (SURVEY §7
    # hard-part 6). Padding rows carry weight 0 / gconst -inf, so numerics
    # are unchanged.
    new_max = int(targets.max())
    new_max = max(int(gmm.max_gauss), 8, 1 << (new_max - 1).bit_length())
    D = gmm.dim
    weights = np.zeros((P, new_max), dtype=np.float64)
    means = np.zeros((P, new_max, D), dtype=np.float64)
    variances = np.ones((P, new_max, D), dtype=np.float64)
    old_means = gmm.get_means().astype(np.float64)
    old_vars = gmm.get_vars().astype(np.float64)
    counts = np.zeros(P, dtype=np.int32)
    for p in range(P):
        n = int(gmm.num_gauss[p])
        weights[p, :n] = gmm.weights[p, :n]
        means[p, :n] = old_means[p, :n]
        variances[p, :n] = old_vars[p, :n]
        tgt = int(targets[p])
        while n < tgt:
            g = int(np.argmax(weights[p, :n]))
            w = weights[p, g] / 2.0
            weights[p, g] = w
            weights[p, n] = w
            std = np.sqrt(variances[p, g])
            delta = perturb_factor * std * rng.randn(D)
            means[p, n] = means[p, g] - delta
            means[p, g] = means[p, g] + delta
            variances[p, n] = variances[p, g]
            n += 1
        counts[p] = n
    inv_vars = 1.0 / variances
    out = DiagGmmSet(
        weights=weights.astype(np.float32),
        means_invvars=(means * inv_vars).astype(np.float32),
        inv_vars=inv_vars.astype(np.float32),
        gconsts=np.full((P, new_max), -np.inf, dtype=np.float32),
        num_gauss=counts,
    )
    out.compute_gconsts()
    return out
