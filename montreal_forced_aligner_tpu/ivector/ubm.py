"""Diagonal universal background model (UBM) training.

Behavioral spec: reference ``ivector/trainer.py:105-389`` (``DubmTrainer``:
256-Gaussian diagonal UBM, 20 initialization iterations with progressive
splitting + 4 full EM iterations, frame subsampling 5). The reference's
Gaussian-selection pruning (gselect 30) exists to make CPU E-steps cheap;
on TPU the dense posterior over all components is one MXU matmul, so the
E-step is exact.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("mfa_tpu")

HIGH = jax.lax.Precision.HIGHEST


@dataclass
class DiagUbm:
    """A single large diagonal GMM: (G,) weights, (G, D) means/vars."""

    weights: np.ndarray
    means: np.ndarray
    variances: np.ndarray

    @property
    def num_gauss(self) -> int:
        return len(self.weights)

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    def device_params(self):
        iv = 1.0 / np.maximum(self.variances, 1e-8)
        miv = self.means * iv
        gconst = (
            np.log(np.maximum(self.weights, 1e-20))
            - 0.5
            * (
                self.dim * math.log(2 * math.pi)
                - np.log(iv).sum(axis=1)
                + (self.means * miv).sum(axis=1)
            )
        )
        W = np.concatenate([miv, -0.5 * iv], axis=1).T.astype(np.float32)
        return jnp.asarray(W), jnp.asarray(gconst.astype(np.float32))

    def split(self, target: int, perturb: float = 0.1, seed: int = 0) -> "DiagUbm":
        rng = np.random.RandomState(seed)
        weights = list(self.weights)
        means = list(self.means)
        variances = list(self.variances)
        while len(weights) < target:
            g = int(np.argmax(weights))
            w = weights[g] / 2
            std = np.sqrt(variances[g])
            delta = perturb * std * rng.randn(self.dim)
            weights[g] = w
            weights.append(w)
            means.append(means[g] - delta)
            means[g] = means[g] + delta
            variances.append(variances[g].copy())
        return DiagUbm(
            np.array(weights), np.stack(means), np.stack(variances)
        )


@partial(jax.jit, static_argnames=())
def _ubm_estep(feats, mask, W, gconst):
    """Posterior-weighted stats for one frame batch: feats (N, D)."""
    xx = jnp.concatenate([feats, feats * feats], axis=1)  # (N, 2D)
    loglikes = (
        jnp.einsum("nd,dg->ng", xx, W, precision=HIGH) + gconst[None, :]
    )  # (N, G)
    norm = jax.scipy.special.logsumexp(loglikes, axis=1)
    post = jnp.where(mask[:, None], jnp.exp(loglikes - norm[:, None]), 0.0)
    occ = post.sum(axis=0)  # (G,)
    mean_acc = jnp.einsum("ng,nd->gd", post, feats, precision=HIGH)
    var_acc = jnp.einsum("ng,nd->gd", post, feats * feats, precision=HIGH)
    ll = jnp.sum(jnp.where(mask, norm, 0.0))
    return occ, mean_acc, var_acc, ll


def _collect_frames(feature_batches, subsample: int = 5):
    """Flatten (feats, lens) batches to one big (N, D) frame matrix."""
    frames = []
    for feats, lens in feature_batches:
        f = np.asarray(feats)
        for row in range(f.shape[0]):
            frames.append(f[row, : int(lens[row]) : subsample])
    return np.concatenate(frames, axis=0)


def train_ubm(
    feature_batches,
    num_gauss: int = 256,
    num_init_iterations: int = 20,
    num_iterations: int = 4,
    subsample: int = 5,
    min_gaussian_weight: float = 1e-4,
    chunk: int = 131072,
    seed: int = 0,
) -> DiagUbm:
    """Train a diagonal UBM with progressive splitting + EM."""
    frames = _collect_frames(feature_batches, subsample)
    N, D = frames.shape
    logger.info("UBM training on %d frames (dim %d)", N, D)
    mean = frames.mean(axis=0)
    var = np.maximum(frames.var(axis=0), 1e-4)
    ubm = DiagUbm(np.ones(1), mean[None, :], var[None, :])

    # progressive split schedule over init iterations
    targets = np.unique(
        np.minimum(
            num_gauss,
            np.round(
                np.exp(
                    np.linspace(0, np.log(num_gauss), num_init_iterations + 1)
                )
            ).astype(int),
        )
    )
    schedule = list(targets[1:]) + [num_gauss] * num_iterations

    pad = (-N) % chunk
    frames_p = np.concatenate([frames, np.zeros((pad, D), np.float32)])
    mask_full = np.concatenate([np.ones(N, bool), np.zeros(pad, bool)])
    # ship frame chunks to device ONCE when they fit a conservative HBM
    # budget (re-uploading every EM iteration cost an h2d pass of the whole
    # frame matrix per iteration — ~24x the corpus size over the schedule);
    # above the budget, stream per iteration as before to avoid OOM on
    # large corpora (override: MFA_TPU_UBM_DEVICE_FRAMES_GB)
    import os as _os

    budget_bytes = float(
        _os.environ.get("MFA_TPU_UBM_DEVICE_FRAMES_GB", 2.0)
    ) * (1 << 30)
    resident = frames_p.nbytes <= budget_bytes

    def iter_chunks():
        for lo in range(0, len(frames_p), chunk):
            yield (
                jnp.asarray(frames_p[lo : lo + chunk]),
                jnp.asarray(mask_full[lo : lo + chunk]),
            )

    device_chunks = list(iter_chunks()) if resident else None
    if not resident:
        logger.info(
            "UBM frames (%.1f GB) exceed the device-residency budget; "
            "streaming per iteration", frames_p.nbytes / (1 << 30),
        )

    prev_ll = None
    for it, target in enumerate(schedule):
        if target > ubm.num_gauss:
            ubm = ubm.split(target, seed=seed + it)
        W, gconst = ubm.device_params()
        G = ubm.num_gauss
        # accumulate on device (one small fetch per iteration); cross-chunk
        # sums use pairwise (tree) reduction so float32 error grows
        # O(log n) rather than O(n) — within-chunk sums were already f32
        # StreamingTreeSum keeps the O(log n) pairwise-summation error
        # profile while holding only O(log n) live stat tuples on device
        from montreal_forced_aligner_tpu.training.base import (
            StreamingTreeSum,
            fetch_all,
        )

        acc = StreamingTreeSum()
        for f_dev, m_dev in (device_chunks or iter_chunks()):
            acc.add(_ubm_estep(f_dev, m_dev, W, gconst))
        occ_d, mean_d, var_d, ll_d = acc.total()

        occ, mean_acc, var_acc, total_ll = fetch_all(
            [occ_d, mean_d, var_d, ll_d]
        )
        occ = np.asarray(occ, np.float64)
        mean_acc = np.asarray(mean_acc, np.float64)
        var_acc = np.asarray(var_acc, np.float64)
        total_ll = float(total_ll)
        # M-step
        keep = occ > max(min_gaussian_weight * N, 2.0)
        occ_k = np.maximum(occ, 1e-10)
        new_means = mean_acc / occ_k[:, None]
        new_vars = np.maximum(
            var_acc / occ_k[:, None] - new_means**2, 1e-4
        )
        weights = occ / occ.sum()
        ubm = DiagUbm(
            weights[keep] / weights[keep].sum(),
            new_means[keep],
            new_vars[keep],
        )
        ll_frame = total_ll / N
        logger.info(
            "UBM iter %d: %d gaussians, loglike/frame %.4f",
            it, ubm.num_gauss, ll_frame,
        )
        prev_ll = ll_frame
    return ubm
