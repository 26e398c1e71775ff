"""i-vector extractor (total-variability T-matrix) training and extraction.

Behavioral spec: reference ``ivector/trainer.py:390-633`` (``IvectorTrainer``:
192-dim extractor, 10 EM iterations, gaussian_min_count 100) and
``corpus/features.py:956-1016`` (``ExtractIvectorsFunction``). Model:

    supervector mean of component c for utterance u:  m_c + T_c w_u,
    w_u ~ N(0, I_R)

E-step per utterance (batched matmuls on TPU):
    L_u     = I + sum_c gamma_uc T_c^T Sigma_c^-1 T_c
    w_hat_u = L_u^-1 sum_c T_c^T Sigma_c^-1 (X_uc - gamma_uc m_c)
M-step per component:
    T_c = (sum_u (X_uc - gamma_uc m_c) w_hat_u^T)
          (sum_u gamma_uc (L_u^-1 + w_hat_u w_hat_u^T))^-1
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.ivector.ubm import DiagUbm

logger = logging.getLogger("mfa_tpu")
HIGH = jax.lax.Precision.HIGHEST


@dataclass
class IvectorExtractor:
    ubm: DiagUbm
    T: np.ndarray  # (C, D, R)
    # PLDA trained on speaker-labeled i-vectors, bundled like the reference's
    # ivector extractor archive (``IvectorExtractorModel``, ``models.py:814``;
    # PldaTrainer stage ``ivector/trainer.py:634``)
    plda: "Optional[object]" = None
    # reference-archive extras (``ivector/kaldi_model.py``): full-covariance
    # Sigma^-1 from a genuine Kaldi final.ie (the E-step uses it exactly
    # when present; None = diagonal from the UBM), the Kaldi prior offset,
    # an optional ivector_lda.mat and the archive meta
    sigma_inv: Optional[np.ndarray] = None  # (C, D, D)
    prior_offset: float = 100.0
    lda: Optional[np.ndarray] = None
    meta: Optional[dict] = None
    # Kaldi-form models (imported final.ie) keep ALL ivector_dim columns
    # of M in T — the UBM mean is folded into column 0 as
    # prior_offset * M[:, :, 0] and the extraction must center by THAT
    # (generally != the dubm's posterior-assignment means). None = native
    # model, center by ubm.means. With this mapping the centered-stat
    # posterior mean equals Kaldi's extracted i-vector after its own
    # prior-offset subtraction, at the archive's full ivector dimension
    # (so the bundled PLDA/ivector_lda dims line up).
    center_means: Optional[np.ndarray] = None  # (C, D)

    @property
    def ivector_dim(self) -> int:
        return self.T.shape[2]

    def save_reference(self, path, meta: Optional[dict] = None):
        """Reference ``IvectorExtractorModel`` zip (Kaldi-binary
        final.ie/final.dubm/plda; reference ``models.py:814-929``)."""
        from montreal_forced_aligner_tpu.ivector.kaldi_model import (
            save_reference_archive,
        )

        return save_reference_archive(self, path, meta=meta)

    def save(self, path) -> None:
        # reference-extension paths get the reference archive form
        # (``.ivector``/``.zip``, reference models.py:831-833) so trained
        # extractors are drop-ins for reference tooling; other paths use
        # the compact npz
        from pathlib import Path as _P

        if _P(path).suffix.lower() in (".ivector", ".zip"):
            self.save_reference(path)
            return
        # np.savez appends ".npz" when the name lacks it; write through a
        # file object so the artifact lands at exactly the requested path
        # (the CLI advertises the path it was given).
        arrays = dict(
            weights=self.ubm.weights,
            means=self.ubm.means,
            variances=self.ubm.variances,
            T=self.T,
        )
        if self.plda is not None:
            arrays.update(
                plda_mean=self.plda.mean,
                plda_transform=self.plda.transform,
                plda_psi=self.plda.psi,
            )
        with open(path, "wb") as f:
            np.savez_compressed(f, **arrays)

    @classmethod
    def load(cls, path) -> "IvectorExtractor":
        from montreal_forced_aligner_tpu.ivector.kaldi_model import (
            is_reference_archive,
            load_reference_archive,
        )

        if is_reference_archive(path):
            # genuine MFA IvectorExtractorModel zip (Kaldi-binary
            # final.ie/final.dubm/plda, reference models.py:814-929)
            return load_reference_archive(path)
        z = np.load(path)
        plda = None
        if "plda_mean" in z:
            from montreal_forced_aligner_tpu.ivector.plda import Plda

            plda = Plda(
                mean=z["plda_mean"],
                transform=z["plda_transform"],
                psi=z["plda_psi"],
            )
        return cls(
            ubm=DiagUbm(z["weights"], z["means"], z["variances"]),
            T=z["T"],
            plda=plda,
        )


@jax.jit
def _utterance_stats(feats, mask, W, gconst, means):
    """Zeroth/centered-first-order UBM stats per utterance.

    feats (B, T, D); returns gamma (B, C), Xc (B, C, D) centered.
    """
    B, T, D = feats.shape
    x = feats.reshape(B * T, D)
    xx = jnp.concatenate([x, x * x], axis=1)
    ll = jnp.einsum("nd,dg->ng", xx, W, precision=HIGH) + gconst[None, :]
    norm = jax.scipy.special.logsumexp(ll, axis=1)
    post = jnp.exp(ll - norm[:, None]) * mask.reshape(-1)[:, None]
    post = post.reshape(B, T, -1)
    gamma = post.sum(axis=1)  # (B, C)
    X = jnp.einsum("btc,btd->bcd", post, feats, precision=HIGH)
    Xc = X - gamma[:, :, None] * means[None, :, :]
    return gamma, Xc


@jax.jit
def _estep(gamma, Xc, T_sig, TT_sig):
    """Posterior ivector mean + covariance per utterance.

    T_sig  (C, D, R) = Sigma_c^-1 T_c  (precomputed)
    TT_sig (C, R, R) = T_c^T Sigma_c^-1 T_c
    Returns (w_hat (B, R), Linv (B, R, R)).
    """
    R = T_sig.shape[2]
    L = jnp.eye(R)[None] + jnp.einsum(
        "bc,crs->brs", gamma, TT_sig, precision=HIGH
    )
    rhs = jnp.einsum("bcd,cdr->br", Xc, T_sig, precision=HIGH)
    chol = jnp.linalg.cholesky(L)
    w_hat = jax.scipy.linalg.cho_solve((chol, True), rhs)
    Linv = jax.scipy.linalg.cho_solve(
        (chol, True), jnp.broadcast_to(jnp.eye(R), L.shape)
    )
    return w_hat, Linv


@jax.jit
def _mstep_accumulate(gamma, Xc, w_hat, Linv):
    """Per-batch M-step accumulators:
    A_c = sum_u Xc_u w_u^T           (C, D, R)
    B_c = sum_u gamma_uc (Linv_u + w w^T)   (C, R, R)
    """
    ww = Linv + jnp.einsum("br,bs->brs", w_hat, w_hat, precision=HIGH)
    A = jnp.einsum("bcd,br->cdr", Xc, w_hat, precision=HIGH)
    Bm = jnp.einsum("bc,brs->crs", gamma, ww, precision=HIGH)
    return A, Bm


def _prep_T(ubm: DiagUbm, T: np.ndarray, sigma_inv: np.ndarray = None):
    """``sigma_inv`` (C, D, D): full-covariance Sigma^-1 from a genuine
    Kaldi final.ie (``ivector/kaldi_model.py``); None = diagonal UBM."""
    if sigma_inv is not None:
        T_sig = np.einsum("cde,cer->cdr", sigma_inv, T)
    else:
        inv_var = 1.0 / np.maximum(ubm.variances, 1e-8)  # (C, D)
        T_sig = T * inv_var[:, :, None]  # Sigma^-1 T
    TT_sig = np.einsum("cdr,cds->crs", T, T_sig)
    return jnp.asarray(T_sig.astype(np.float32)), jnp.asarray(
        TT_sig.astype(np.float32)
    )


def train_ivector_extractor(
    feature_batches,
    ubm: DiagUbm,
    ivector_dim: int = 192,
    num_iterations: int = 10,
    gaussian_min_count: float = 100.0,
    seed: int = 0,
) -> IvectorExtractor:
    """EM training of the T-matrix over utterance batches
    [(feats (B,T,D) device, lens (B,))]."""
    rng = np.random.RandomState(seed)
    C, D = ubm.means.shape
    R = ivector_dim
    T = (rng.randn(C, D, R) * 0.1).astype(np.float32)
    W, gconst = ubm.device_params()
    means_j = jnp.asarray(ubm.means.astype(np.float32))

    # precompute per-utterance UBM stats once (they don't change)
    stats = []
    for feats, lens in feature_batches:
        B, Tmax, _ = feats.shape
        mask = np.arange(Tmax)[None, :] < np.asarray(lens)[:, None]
        gamma, Xc = _utterance_stats(
            feats, jnp.asarray(mask), W, gconst, means_j
        )
        stats.append((gamma, Xc))

    # component occupancy is iteration-independent: reduce it once, on
    # device, and fetch the (C,) vector a single time
    total_gamma = np.zeros(C)
    for gamma, _Xc in stats:
        total_gamma += np.asarray(gamma.sum(axis=0))

    for it in range(num_iterations):
        T_sig, TT_sig = _prep_T(ubm, T)
        # device-resident accumulation across batches: the (C, R, R)
        # B-accumulator alone is ~38 MB at C=256/R=192 — fetching it per
        # batch per iteration swamps the ~10-30 MB/s device->host link;
        # summing on device costs one fetch per iteration instead.
        # StreamingTreeSum folds eagerly (binomial counter) so peak device
        # memory stays O(log n_batches), not one ~45 MB tuple per batch.
        from montreal_forced_aligner_tpu.training.base import (
            StreamingTreeSum,
            fetch_all,
        )

        acc = StreamingTreeSum()
        for gamma, Xc in stats:
            w_hat, Linv = _estep(gamma, Xc, T_sig, TT_sig)
            A_b, B_b = _mstep_accumulate(gamma, Xc, w_hat, Linv)
            acc.add((A_b, B_b, jnp.sum(w_hat**2)))
        A_dev, Bm_dev, aux_dev = acc.total()

        A, Bm, aux = fetch_all([A_dev, Bm_dev, aux_dev])
        A = np.asarray(A, np.float64)
        Bm = np.asarray(Bm, np.float64)
        aux = float(aux)
        for c in range(C):
            if total_gamma[c] < gaussian_min_count:
                continue
            T[c] = np.linalg.solve(
                Bm[c] + 1e-4 * np.eye(R), A[c].T
            ).T.astype(np.float32)
        logger.info("ivector EM iter %d: mean |w|^2 = %.4f", it, aux)
    return IvectorExtractor(ubm=ubm, T=T)


def extract_ivectors(
    extractor: IvectorExtractor, feature_batches
) -> np.ndarray:
    """Posterior-mean i-vectors for every utterance: (N, R)."""
    W, gconst = extractor.ubm.device_params()
    centering = getattr(extractor, "center_means", None)
    if centering is None:
        centering = extractor.ubm.means
    means_j = jnp.asarray(np.asarray(centering, np.float32))
    T_sig, TT_sig = _prep_T(
        extractor.ubm, extractor.T, getattr(extractor, "sigma_inv", None)
    )
    out = []
    for feats, lens in feature_batches:
        B, Tmax, _ = feats.shape
        mask = np.arange(Tmax)[None, :] < np.asarray(lens)[:, None]
        gamma, Xc = _utterance_stats(
            feats, jnp.asarray(mask), W, gconst, means_j
        )
        w_hat, _Linv = _estep(gamma, Xc, T_sig, TT_sig)
        out.append(np.asarray(w_hat))
    return np.concatenate(out, axis=0)


def apply_utterance_cmn(feature_batches):
    """Per-utterance cepstral mean normalization.

    NOT on the production feature path: the i-vector pipeline uses
    :func:`~montreal_forced_aligner_tpu.ops.feats.sliding_cmn` (Kaldi
    ``apply-cmvn-sliding`` semantics). Kept as the simple normalization
    for synthetic-feature tests and API users who want utterance CMN."""
    import jax

    out = []
    for feats, lens in feature_batches:
        T = feats.shape[1]
        mask = (jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None])[..., None]
        denom = jnp.maximum(jnp.asarray(lens)[:, None].astype(jnp.float32), 1.0)
        mean = jnp.where(mask, feats, 0.0).sum(axis=1) / denom
        out.append((feats - mean[:, None, :], lens))
    return out


def length_normalize(ivectors: np.ndarray) -> np.ndarray:
    """Scale to sqrt(dim) norm (Kaldi ``ivector-normalize-length``)."""
    norms = np.linalg.norm(ivectors, axis=1, keepdims=True)
    dim = ivectors.shape[1]
    return ivectors / np.maximum(norms, 1e-10) * np.sqrt(dim)
