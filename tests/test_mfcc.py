"""MFCC kernel tests against an independent numpy reference implementation
of the Kaldi feature spec (framing/window/mel/DCT semantics from reference
``corpus/features.py:595-661`` defaults)."""

import math

import numpy as np
import pytest

from montreal_forced_aligner_tpu.ops.mfcc import (
    MfccConfig,
    compute_dct_matrix,
    compute_mel_banks,
    compute_mfcc_batch,
    povey_window,
)


def numpy_mfcc_reference(wave: np.ndarray, cfg: MfccConfig) -> np.ndarray:
    """Deliberately naive per-frame implementation for cross-checking."""
    n = len(wave)
    shift, length = cfg.frame_shift, cfg.frame_length
    T = (n + shift // 2) // shift
    window = povey_window(length).astype(np.float64)
    mel = compute_mel_banks(
        cfg.num_mel_bins, cfg.fft_size, cfg.sample_rate, cfg.low_frequency, cfg.high_frequency
    ).astype(np.float64)
    dct = compute_dct_matrix(cfg.num_coefficients, cfg.num_mel_bins).astype(np.float64)
    lifter = 1.0 + 0.5 * cfg.cepstral_lifter * np.sin(
        math.pi * np.arange(cfg.num_coefficients) / cfg.cepstral_lifter
    )
    out = np.zeros((T, cfg.num_coefficients))
    for t in range(T):
        start = t * shift + shift // 2 - length // 2
        frame = np.zeros(length)
        for i in range(length):
            s = start + i
            while s < 0 or s >= n:
                s = -s - 1 if s < 0 else 2 * n - 1 - s
            frame[i] = wave[s]
        frame = frame - frame.mean()
        pre = np.empty_like(frame)
        pre[0] = frame[0] - cfg.preemphasis * frame[0]
        pre[1:] = frame[1:] - cfg.preemphasis * frame[:-1]
        frame = pre * window
        spec = np.fft.rfft(frame, cfg.fft_size)
        power = np.abs(spec) ** 2
        mel_e = power[: cfg.fft_size // 2] @ mel
        log_mel = np.log(np.maximum(mel_e, np.finfo(np.float32).eps))
        out[t] = (dct @ log_mel) * lifter
    return out


def test_mfcc_matches_numpy_reference():
    rng = np.random.RandomState(42)
    wave = (rng.randn(16000) * 1000).astype(np.float32)
    cfg = MfccConfig()
    feats, flens = compute_mfcc_batch([wave], cfg=cfg)
    ref = numpy_mfcc_reference(wave.astype(np.float64), cfg)
    T = int(flens[0])
    assert T == ref.shape[0] == 100
    got = np.asarray(feats)[0, :T]
    assert np.max(np.abs(got - ref)) < 2e-2  # float32 vs float64 tolerance
    rel = np.abs(got - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 1e-3


def test_mfcc_batch_padding_invariance():
    """An utterance's features must not depend on other batch members."""
    rng = np.random.RandomState(0)
    w1 = (rng.randn(8000) * 500).astype(np.float32)
    w2 = (rng.randn(16000) * 500).astype(np.float32)
    cfg = MfccConfig()
    solo, fl_solo = compute_mfcc_batch([w1], cfg=cfg)
    both, fl_both = compute_mfcc_batch([w1, w2], cfg=cfg)
    T = int(fl_solo[0])
    assert T == int(fl_both[0])
    np.testing.assert_allclose(
        np.asarray(solo)[0, :T], np.asarray(both)[0, :T], rtol=1e-5, atol=1e-4
    )


def test_frame_count_formula():
    cfg = MfccConfig()
    # snip_edges=False: round((n + shift/2) / shift) frames
    assert cfg.num_frames(16000) == 100
    assert cfg.num_frames(16079) == 100
    assert cfg.num_frames(16080) == 101
    assert cfg.num_frames(159) == 1
    assert cfg.fft_size == 512
    assert cfg.frame_length == 400


def test_mel_banks_cover_band():
    mel = compute_mel_banks(23, 512, 16000.0, 20.0, 7800.0)
    assert mel.shape == (256, 23)
    # every filter has positive mass and filters tile the band
    assert (mel.sum(axis=0) > 0).all()
    # bins well inside the band are covered by some filter
    inside = mel[5:249].sum(axis=1)
    assert (inside > 0).all()


def test_deltas_match_kaldi_coefficients():
    from montreal_forced_aligner_tpu.ops.feats import compute_deltas, delta_window_scales
    import jax.numpy as jnp

    scales = delta_window_scales(2, 2)
    np.testing.assert_allclose(scales[1], np.array([-2, -1, 0, 1, 2]) / 10.0)
    # order-2 kernel is the convolution of the order-1 kernel with itself
    np.testing.assert_allclose(
        scales[2], np.convolve(scales[1], scales[1]), rtol=1e-6
    )

    rng = np.random.RandomState(1)
    x = rng.randn(1, 20, 3).astype(np.float32)
    lens = jnp.asarray(np.array([20], dtype=np.int32))
    out = np.asarray(compute_deltas(jnp.asarray(x), lens))
    assert out.shape == (1, 20, 9)
    # interior frame: delta = sum_j j*x[t+j]/10
    t = 10
    expect = sum(j * x[0, t + j] for j in range(-2, 3)) / 10.0
    np.testing.assert_allclose(out[0, t, 3:6], expect, rtol=1e-4, atol=1e-5)
    # edge clamping: frame 0's delta uses clamped indices
    expect0 = sum(j * x[0, max(0, 0 + j)] for j in range(-2, 3)) / 10.0
    np.testing.assert_allclose(out[0, 0, 3:6], expect0, rtol=1e-4, atol=1e-5)


def test_pitch_tracking():
    """The pitch tracker must recover known tone frequencies and mark noise
    as unvoiced (reference kalpy PitchComputer semantics)."""
    from montreal_forced_aligner_tpu.ops.pitch import PitchConfig, compute_pitch_batch

    rng = np.random.RandomState(0)
    sr = 16000
    t = np.arange(int(1.0 * sr)) / sr

    def tone(f):
        # F0 with harmonics, like voiced speech
        return (
            6000 * np.sin(2 * np.pi * f * t)
            + 2500 * np.sin(2 * np.pi * 2 * f * t)
            + 900 * np.sin(2 * np.pi * 3 * f * t)
        ).astype(np.float32)

    w120 = tone(120.0)
    w240 = tone(240.0)
    noise = (rng.randn(len(t)) * 500).astype(np.float32)
    waves = np.stack([w120, w240, noise])
    lengths = np.full(3, len(t), np.int32)
    cfg = PitchConfig()
    feats, counts = compute_pitch_batch(waves, lengths, cfg)
    assert feats.shape[2] == 3
    T = int(counts[0])
    # recover f0 from normalized log pitch? use direct: recompute from lags —
    # instead check POV separates voiced from unvoiced
    pov_voiced = feats[0, 5 : T - 5, 0].mean()
    pov_noise = feats[2, 5 : T - 5, 0].mean()
    assert pov_voiced > pov_noise + 0.5
    # pitch ratio between the two tones ~ log(2) in mean-normalized space:
    # compare via delta of their normalized log pitch difference is 0 (both
    # constant) so instead verify via PitchConfig internals
    from montreal_forced_aligner_tpu.ops.pitch import (
        _nccf,
        _viterbi_lags,
        _resample_batch,
    )
    import jax.numpy as jnp

    ds, ds_len = _resample_batch(waves, lengths, cfg)
    shift = int(cfg.resample_rate * cfg.frame_shift_ms / 1000)
    window = int(cfg.resample_rate * cfg.frame_length_ms / 1000)
    lags = cfg.lags
    nccf = _nccf(jnp.asarray(ds), window, shift, T, int(lags.max()), cfg.nccf_ballast)
    lag_weight = 1.0 - cfg.soft_min_f0 * lags / cfg.resample_rate
    path = np.asarray(
        _viterbi_lags(
            jnp.asarray(np.asarray(nccf[:, :, lags]) * lag_weight[None, None, :]),
            jnp.asarray(np.log(lags).astype(np.float32)),
            cfg.penalty_factor,
            len(lags),
        )
    )
    f0_est_120 = np.median(cfg.resample_rate / lags[path[0, 5 : T - 5]])
    f0_est_240 = np.median(cfg.resample_rate / lags[path[1, 5 : T - 5]])
    assert abs(f0_est_120 - 120) < 8
    assert abs(f0_est_240 - 240) < 12


def test_pallas_emission_kernel_interpret():
    """The Pallas likelihood-on-demand kernel must match the XLA emission
    path (run in interpreter mode; the remote-TPU tunnel in CI cannot
    compile Mosaic kernels, real TPU hosts can)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import montreal_forced_aligner_tpu.ops.pallas_emission as PE
    from montreal_forced_aligner_tpu.models.gmm import DiagGmmSet
    from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_loglikes

    orig_call = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    PE.pl.pallas_call = patched
    try:
        rng = np.random.RandomState(0)
        P, G, D = 50, 3, 13
        miv = rng.randn(P, G, D).astype(np.float32) * 0.3
        iv = (0.5 + rng.rand(P, G, D)).astype(np.float32)
        w = rng.rand(P, G).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        gmm = DiagGmmSet(
            weights=w,
            means_invvars=miv,
            inv_vars=iv,
            gconsts=np.zeros((P, G), np.float32),
            num_gauss=np.full(P, G, np.int32),
        )
        gmm.compute_gconsts()
        B, T, S = 2, 64, 130
        feats = rng.randn(B, T, D).astype(np.float32)
        state_pdf = rng.randint(0, P, (B, S)).astype(np.int32)
        W_flat, _ = gmm.flatten_for_device()
        ll_all = np.asarray(
            gmm_loglikes(jnp.asarray(feats), jnp.asarray(W_flat), jnp.asarray(gmm.gconsts))
        )
        ref = np.take_along_axis(ll_all, state_pdf[:, None, :].repeat(T, 1), axis=2)
        W_rows = PE.pack_gmm_for_pallas(gmm)
        out = np.asarray(
            PE.pallas_state_loglikes(
                jnp.asarray(feats), jnp.asarray(state_pdf), jnp.asarray(W_rows)
            )
        )
        assert np.abs(out - ref).max() < 1e-4
    finally:
        PE.pl.pallas_call = orig_call
