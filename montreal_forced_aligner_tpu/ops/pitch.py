"""Pitch tracking (Kaldi-pitch-style NCCF + Viterbi lag smoothing).

Behavioral spec: reference ``kalpy.feat.pitch.PitchComputer``
(``compute-kaldi-pitch``; options ``corpus/features.py:823-861``: f0 range
50-800 Hz, ``penalty_factor=0.1``, ``delta_pitch=0.005``; output features
selected from {pov, normalized-log-pitch, delta-pitch}). The algorithm
follows the published Kaldi pitch tracker (Ghahremani et al., 2014) in a
batched TPU-friendly form:

1. downsample to 4 kHz,
2. NCCF over candidate lags for every frame — one batched matmul-like
   correlation,
3. Viterbi over the lag trellis with an octave-jump cost — the same dense
   max-plus scan as forced alignment,
4. POV (probability-of-voicing) and normalized log-pitch features.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class PitchConfig:
    sample_rate: int = 16000
    resample_rate: int = 4000
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 800.0
    penalty_factor: float = 0.1
    delta_pitch: float = 0.005
    nccf_ballast: float = 7000.0
    soft_min_f0: float = 10.0
    add_pov_feature: bool = True
    add_normalized_log_pitch: bool = True
    add_delta_pitch: bool = True

    @property
    def lags(self) -> np.ndarray:
        min_lag = int(np.floor(self.resample_rate / self.max_f0))
        max_lag = int(np.ceil(self.resample_rate / self.min_f0))
        return np.arange(min_lag, max_lag + 1, dtype=np.int32)

    @property
    def num_feature_dims(self) -> int:
        return int(self.add_pov_feature) + int(self.add_normalized_log_pitch) + int(
            self.add_delta_pitch
        )


def _resample_batch(waves: np.ndarray, lengths: np.ndarray, cfg: PitchConfig):
    """Simple decimating low-pass resample to 4 kHz (host numpy)."""
    factor = cfg.sample_rate // cfg.resample_rate
    # box low-pass then decimate (adequate for F0 < 800 Hz)
    kernel = np.ones(factor, dtype=np.float32) / factor
    out = []
    for b in range(waves.shape[0]):
        x = waves[b, : int(lengths[b])].astype(np.float32)
        sm = np.convolve(x, kernel, mode="same")
        out.append(sm[::factor])
    new_lengths = np.array([len(o) for o in out], dtype=np.int32)
    L = max((len(o) for o in out), default=0)
    padded = np.zeros((len(out), L), dtype=np.float32)
    for b, o in enumerate(out):
        padded[b, : len(o)] = o
    return padded, new_lengths


@partial(jax.jit, static_argnames=("window", "shift", "max_frames", "max_lag"))
def _nccf(waves, window: int, shift: int, max_frames: int, max_lag: int, ballast):
    """NCCF(t, lag) for all frames/lags: (B, T, max_lag + 1) (lag 0 unused)."""
    B, L = waves.shape
    starts = jnp.arange(max_frames) * shift

    def frame_block(offset):
        # (B, T, window) frames starting at t*shift + offset (static gather
        # via reshape trick is overkill here; lag count is small and T*window
        # stays modest at 4 kHz)
        idx = jnp.clip(starts[:, None] + offset + jnp.arange(window)[None, :], 0, L - 1)
        return waves[:, idx.reshape(-1)].reshape(B, max_frames, window)

    base = frame_block(0)
    base = base - base.mean(axis=-1, keepdims=True)
    e1 = jnp.sum(base * base, axis=-1)  # (B, T)
    outs = [jnp.zeros((B, max_frames))]
    for lag in range(1, max_lag + 1):
        other = frame_block(lag)
        other = other - other.mean(axis=-1, keepdims=True)
        e2 = jnp.sum(other * other, axis=-1)
        num = jnp.sum(base * other, axis=-1)
        outs.append(num / jnp.sqrt(e1 * e2 + ballast**2))
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnames=("num_lags",))
def _viterbi_lags(nccf_sel, log_lags, penalty, num_lags: int):
    """Max-plus DP over lag candidates with octave-jump penalty:
    score[t, l] = nccf[t, l] - penalty * (log lag_l - log lag_prev)^2."""
    B, T, D = nccf_sel.shape
    trans = -penalty * (log_lags[:, None] - log_lags[None, :]) ** 2  # (D, D)

    def step(alpha, obs_t):
        cand = alpha[:, :, None] + trans[None, :, :]
        bp = jnp.argmax(cand, axis=1)
        alpha_new = jnp.max(cand, axis=1) + obs_t
        return alpha_new, bp.astype(jnp.int32)

    alpha0 = nccf_sel[:, 0, :]
    alpha_T, bps = jax.lax.scan(step, alpha0, jnp.moveaxis(nccf_sel[:, 1:], 1, 0))
    best_T = jnp.argmax(alpha_T, axis=1).astype(jnp.int32)

    def back(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        return prev, state

    s0, rest = jax.lax.scan(back, best_T, bps[::-1])
    path = jnp.concatenate([s0[:, None], jnp.moveaxis(rest[::-1], 0, 1)], axis=1)
    return path  # (B, T) lag index


def compute_pitch_batch(
    waves: np.ndarray,  # (B, L) int16-scaled float at cfg.sample_rate
    lengths: np.ndarray,
    cfg: PitchConfig = PitchConfig(),
    max_frames: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pitch features per 10 ms frame: (B, T, n_dims), frame counts (B,).

    Dims in order: [pov_feature, normalized_log_pitch, delta_pitch]
    (subset per config), matching the reference's pasted pitch features.
    """
    ds, ds_len = _resample_batch(np.asarray(waves), lengths, cfg)
    shift = int(cfg.resample_rate * cfg.frame_shift_ms / 1000)
    window = int(cfg.resample_rate * cfg.frame_length_ms / 1000)
    frame_counts = np.maximum((ds_len - window) // shift + 1, 1)
    T = int(frame_counts.max()) if max_frames is None else max_frames
    lags = cfg.lags
    max_lag = int(lags.max())
    nccf = _nccf(
        jnp.asarray(ds), window, shift, T, max_lag, cfg.nccf_ballast
    )  # (B, T, max_lag+1)
    nccf_sel = np.asarray(nccf[:, :, lags])  # candidate lags only
    # soft-min-f0: discourage long lags so subharmonics (octave-down errors)
    # lose ties against the true period (Kaldi's soft_min_f0 device)
    lag_weight = 1.0 - cfg.soft_min_f0 * lags / cfg.resample_rate
    nccf_adj = jnp.asarray(nccf_sel * lag_weight[None, None, :])
    log_lags = jnp.asarray(np.log(lags.astype(np.float64)).astype(np.float32))
    path = _viterbi_lags(nccf_adj, log_lags, cfg.penalty_factor, len(lags))
    path = np.asarray(path)
    nccf_best = np.take_along_axis(nccf_sel, path[:, :, None], axis=2)[:, :, 0]
    f0 = cfg.resample_rate / lags[path]  # (B, T)

    # POV mapping (Kaldi's NccfToPovFeature: l = log(p/(1-p)) approximation)
    c = np.clip(nccf_best, -1.0, 1.0)
    ndash = np.abs(c)
    pov = -5.2 + 5.4 * np.exp(7.5 * (ndash - 1)) + 4.8 * ndash - 2.0 * np.exp(
        -10.0 * ndash
    ) + 4.2 * np.exp(20.0 * (ndash - 1))
    pov_feature = 2.0 * (1.0 / (1.0 + np.exp(-pov))) - 1.0

    log_pitch = np.log(np.maximum(f0, 1e-3))
    feats = []
    B = waves.shape[0]
    mask = np.arange(T)[None, :] < frame_counts[:, None]
    if cfg.add_pov_feature:
        feats.append(pov_feature)
    if cfg.add_normalized_log_pitch:
        # mean-subtracted log pitch weighted by POV (approximates Kaldi's
        # online POV-weighted mean normalization over the utterance)
        w = np.where(mask, (pov_feature + 1.0) / 2.0 + 1e-3, 0.0)
        mean = (log_pitch * w).sum(axis=1, keepdims=True) / w.sum(
            axis=1, keepdims=True
        )
        feats.append(log_pitch - mean)
    if cfg.add_delta_pitch:
        d = np.zeros_like(log_pitch)
        d[:, 1:-1] = (log_pitch[:, 2:] - log_pitch[:, :-2]) / 2.0
        feats.append(d)
    out = np.stack(feats, axis=-1).astype(np.float32)
    out[~mask] = 0.0
    return out, frame_counts.astype(np.int32)


def pitch_for_mfcc_frames(
    waves, lengths, mfcc_frame_counts, T_mfcc: int,
    cfg: Optional[PitchConfig] = None,
) -> np.ndarray:
    """Pitch features padded/extended to the MFCC frame grid (B, T_mfcc, P):
    the pitch frame count (snip-edges framing at 4 kHz) can fall short of the
    MFCC count; trailing frames repeat the last voiced estimate (the
    reference pastes archives of equal length after kalpy length
    reconciliation)."""
    cfg = cfg or PitchConfig()
    feats, counts = compute_pitch_batch(waves, lengths, cfg)
    B, T_p, P = feats.shape
    out = np.zeros((len(waves) if isinstance(waves, list) else waves.shape[0], T_mfcc, P), np.float32)
    for b in range(out.shape[0]):
        n = min(int(counts[b]), T_mfcc, T_p)
        out[b, :n] = feats[b, :n]
        want = min(int(mfcc_frame_counts[b]), T_mfcc)
        if n > 0 and want > n:
            out[b, n:want] = feats[b, n - 1]
    return out
