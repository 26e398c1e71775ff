"""Energy-based voice activity detection and segmentation.

Behavioral spec: reference ``corpus/features.py:379-419,863-895``
(``ComputeVadFunction`` with Kaldi ``compute-vad`` semantics:
``energy_threshold=5.5``, ``energy_mean_scale=0.5`` — a frame is voiced if
its log-energy exceeds threshold + mean_scale * file-mean log-energy) and
``vad/segmenter.py:56`` (``VadSegmenter``: merge voiced frames into
utterance segments honoring min/max segment lengths and minimum pauses,
defaults from ``vad/models.py:503``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.corpus.corpus import Corpus, Utterance
from montreal_forced_aligner_tpu.io.textgrid import Interval, TextGrid
from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig, pad_waves_for_mfcc, PAD_LEFT


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def _frame_log_energy(waves, cfg: MfccConfig, max_frames: int):
    """Per-frame log energy with the MFCC framing (DC-removed, pre-window)."""
    waves = waves.astype(jnp.float32)
    B, Lp = waves.shape
    shift, length = cfg.frame_shift, cfg.frame_length
    off = PAD_LEFT + shift // 2 - length // 2
    c0, r = off // shift, off % shift
    n_span = -(-(r + length) // shift)
    X = waves.reshape(B, Lp // shift, shift)
    Z = jnp.concatenate(
        [X[:, c0 + i : c0 + i + max_frames] for i in range(n_span)], axis=2
    )
    frames = Z[..., r : r + length]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    energy = jnp.sum(frames * frames, axis=-1)
    return jnp.log(jnp.maximum(energy, jnp.finfo(jnp.float32).tiny))


def compute_energy_vad(
    wave: np.ndarray,
    cfg: Optional[MfccConfig] = None,
    energy_threshold: float = 5.5,
    energy_mean_scale: float = 0.5,
) -> np.ndarray:
    """Boolean voiced mask per 10 ms frame (Kaldi ``compute-vad``)."""
    cfg = cfg or MfccConfig()
    padded, lens = pad_waves_for_mfcc([wave], cfg)
    T = cfg.num_frames(len(wave))
    log_e = np.asarray(_frame_log_energy(jnp.asarray(padded), cfg, T))[0, :T]
    threshold = energy_threshold + energy_mean_scale * log_e.mean()
    return log_e > threshold


@dataclass
class SegmenterConfig:
    max_segment_length: float = 30.0
    min_segment_length: float = 0.333
    min_pause_duration: float = 0.333
    energy_threshold: float = 5.5
    energy_mean_scale: float = 0.5
    frame_shift: float = 0.01


def segments_from_vad(
    voiced: np.ndarray, config: SegmenterConfig
) -> List[Tuple[float, float]]:
    """Merge voiced frames into segments: close pauses shorter than
    ``min_pause_duration``, drop segments shorter than
    ``min_segment_length``, split segments over ``max_segment_length``."""
    fs = config.frame_shift
    # raw voiced runs
    padded = np.concatenate([[False], voiced, [False]])
    starts = np.flatnonzero(~padded[:-1] & padded[1:])
    ends = np.flatnonzero(padded[:-1] & ~padded[1:])
    segs = [(s * fs, e * fs) for s, e in zip(starts, ends)]
    # merge across short pauses
    merged: List[Tuple[float, float]] = []
    for s, e in segs:
        if merged and s - merged[-1][1] < config.min_pause_duration:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    # length constraints
    out: List[Tuple[float, float]] = []
    for s, e in merged:
        if e - s < config.min_segment_length:
            continue
        while e - s > config.max_segment_length:
            out.append((s, s + config.max_segment_length))
            s += config.max_segment_length
        out.append((s, e))
    return out


class VadSegmenter:
    """Segment long audio files into utterances (reference entry point:
    ``mfa create_segments_vad``)."""

    def __init__(self, config: Optional[SegmenterConfig] = None):
        self.config = config or SegmenterConfig()

    def segment_file(self, wav_path) -> List[Tuple[float, float]]:
        from montreal_forced_aligner_tpu.io.wav import read_wave

        wave = read_wave(wav_path)
        voiced = compute_energy_vad(
            wave.samples,
            energy_threshold=self.config.energy_threshold,
            energy_mean_scale=self.config.energy_mean_scale,
        )
        return segments_from_vad(voiced, self.config)

    def segment_corpus(
        self, corpus_directory, output_directory,
        output_format: str = "long_textgrid",
    ) -> List[Path]:
        """Write one TextGrid (or json/csv, per ``output_format``) per file
        with detected speech segments (reference ``--output_format``)."""
        from montreal_forced_aligner_tpu.io.wav import read_wave

        output_directory = Path(output_directory)
        output_directory.mkdir(parents=True, exist_ok=True)
        out_paths = []
        extensions = {
            "long_textgrid": ".TextGrid",
            "short_textgrid": ".TextGrid",
            "json": ".json",
            "csv": ".csv",
        }
        for wav in sorted(Path(corpus_directory).rglob("*.wav")):
            segs = self.segment_file(wav)
            tg = TextGrid()
            tg.xmax = read_wave(wav).duration
            tg.tiers["segments"] = [Interval(s, e, "speech") for s, e in segs]
            out = output_directory / f"{wav.stem}{extensions[output_format]}"
            if output_format == "json":
                tg.write_json(out)
            elif output_format == "csv":
                tg.write_csv(out, default_speaker="speech")
            else:
                tg.write(out, output_format=output_format)
            out_paths.append(out)
        return out_paths


class SpeechbrainVAD:
    """Neural VAD posteriors from a locally available SpeechBrain VAD
    checkpoint (reference ``MfaVAD``, ``vad/models.py:133``; used by
    ``SpeechbrainVadSegmenter``, ``vad/segmenter.py:328``). Gated on the
    speechbrain package + local weights (no network egress here); frame
    posteriors are thresholded and post-processed by the same
    ``segments_from_vad`` pipeline as the energy VAD."""

    def __init__(self, model_path, threshold: float = 0.5):
        try:
            from speechbrain.inference.VAD import VAD as _SbVAD
        except ImportError as e:
            raise RuntimeError(
                "speechbrain is not available; neural VAD needs the "
                "speechbrain package and a local checkpoint directory"
            ) from e
        model_path = Path(model_path)
        if not model_path.exists():
            raise FileNotFoundError(
                f"no local SpeechBrain VAD checkpoint at {model_path}"
            )
        self.model = _SbVAD.from_hparams(
            source=str(model_path), savedir=str(model_path)
        )
        self.threshold = threshold

    def voiced_frames(
        self, samples: np.ndarray, sample_rate: int = 16000,
        frame_shift: float = 0.01,
    ) -> np.ndarray:
        """Boolean per-frame speech decisions at ``frame_shift`` rate."""
        import torch

        if sample_rate != 16000:
            from montreal_forced_aligner_tpu.align.aligner import _resample
            from montreal_forced_aligner_tpu.io.wav import WaveData

            wd = WaveData(
                samples=np.asarray(samples, dtype=np.float32),
                sample_rate=sample_rate,
                num_channels=1,
                duration=len(samples) / sample_rate,
            )
            samples = _resample(wd, 16000).samples
            sample_rate = 16000
        wav = torch.from_numpy(
            np.asarray(samples, dtype=np.float32) / 32768.0
        ).unsqueeze(0)
        with torch.no_grad():
            probs = (
                self.model.get_speech_prob_chunk(wav).numpy().reshape(-1)
            )
        n_out = int(len(samples) / sample_rate / frame_shift)
        if len(probs) == 0 or n_out == 0:
            return np.zeros(n_out, dtype=bool)
        idx = np.minimum(
            (np.arange(n_out) * len(probs) // max(n_out, 1)), len(probs) - 1
        )
        return probs[idx] > self.threshold


class SpeechbrainVadSegmenter(VadSegmenter):
    """``VadSegmenter`` with neural frame decisions (reference
    ``SpeechbrainVadSegmenter``, ``vad/segmenter.py:328``)."""

    def __init__(self, model_path, config: Optional[SegmenterConfig] = None):
        super().__init__(config)
        self.vad = SpeechbrainVAD(model_path)

    def segment_file(self, wav_path) -> List[Tuple[float, float]]:
        from montreal_forced_aligner_tpu.io.wav import read_wave

        wave = read_wave(wav_path)
        voiced = self.vad.voiced_frames(
            wave.samples, wave.sample_rate, self.config.frame_shift
        )
        return segments_from_vad(voiced, self.config)
