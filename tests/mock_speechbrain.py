"""A minimal in-process stand-in for the ``speechbrain`` package.

speechbrain is not installed in this image and model weights cannot be
downloaded (no egress), so the speechbrain-gated code paths (ASR
transcription, neural VAD, x-vector speaker embeddings) are exercised
against this mock: it implements exactly the interface surface our wrappers
consume (``from_hparams`` constructors + the inference calls), with
deterministic signal-derived outputs so clustering/segmentation tests are
meaningful. Install with :func:`install` (uses ``sys.modules``); the real
package, when present, always wins because install() refuses to shadow it.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class _MockASR:
    """EncoderDecoderASR stand-in: 'decodes' a coarse length-based text."""

    @classmethod
    def from_hparams(cls, source=None, savedir=None, run_opts=None):
        return cls()

    def transcribe_batch(self, wav, lens):
        import torch

        n = wav.shape[-1]
        words = ["mock"] * max(1, int(n / 16000))
        return [" ".join(words).upper()], torch.ones(1)


class _MockVAD:
    """speechbrain.inference.VAD stand-in: chunked energy posteriors."""

    CHUNK = 160  # 10 ms at 16 kHz

    @classmethod
    def from_hparams(cls, source=None, savedir=None, run_opts=None):
        return cls()

    def get_speech_prob_chunk(self, wav):
        import torch

        x = wav.numpy().reshape(-1)
        n_chunks = max(1, len(x) // self.CHUNK)
        x = x[: n_chunks * self.CHUNK].reshape(n_chunks, self.CHUNK)
        rms = np.sqrt((x**2).mean(axis=1) + 1e-12)
        # logistic over log-energy: loud chunks -> ~1, silence -> ~0
        logp = np.log(rms + 1e-12)
        probs = 1.0 / (1.0 + np.exp(-(logp - np.median(logp))))
        return torch.from_numpy(probs.astype(np.float32))


class _MockEncoderClassifier:
    """EncoderClassifier stand-in: deterministic spectral-stat embeddings
    (same dominant frequency -> nearby embeddings, so synthetic 'speakers'
    with distinct spectra cluster apart)."""

    DIM = 32

    @classmethod
    def from_hparams(cls, source=None, savedir=None, run_opts=None):
        return cls()

    def encode_batch(self, wav):
        import torch

        x = wav.numpy().reshape(-1)
        spec = np.abs(np.fft.rfft(x[: 1 << 14], n=1 << 14))
        bands = spec[: 4096].reshape(self.DIM, -1).mean(axis=1)
        emb = np.log(bands + 1e-6)
        emb = (emb - emb.mean()) / (emb.std() + 1e-6)
        return torch.from_numpy(emb.astype(np.float32)).reshape(1, 1, -1)


def install() -> None:
    """Register the mock as ``speechbrain`` in ``sys.modules`` (no-op if the
    real package is importable)."""
    try:
        import speechbrain  # noqa: F401

        if not getattr(speechbrain, "__mfa_tpu_mock__", False):
            return  # never shadow a real install
    except ImportError:
        pass
    root = types.ModuleType("speechbrain")
    root.__mfa_tpu_mock__ = True
    inference = types.ModuleType("speechbrain.inference")
    asr = types.ModuleType("speechbrain.inference.ASR")
    asr.EncoderDecoderASR = _MockASR
    vad = types.ModuleType("speechbrain.inference.VAD")
    vad.VAD = _MockVAD
    speaker = types.ModuleType("speechbrain.inference.speaker")
    speaker.EncoderClassifier = _MockEncoderClassifier
    inference.ASR = asr
    inference.VAD = vad
    inference.speaker = speaker
    root.inference = inference
    sys.modules["speechbrain"] = root
    sys.modules["speechbrain.inference"] = inference
    sys.modules["speechbrain.inference.ASR"] = asr
    sys.modules["speechbrain.inference.VAD"] = vad
    sys.modules["speechbrain.inference.speaker"] = speaker


def uninstall() -> None:
    root = sys.modules.get("speechbrain")
    if root is None or not getattr(root, "__mfa_tpu_mock__", False):
        return
    for name in list(sys.modules):
        if name == "speechbrain" or name.startswith("speechbrain."):
            sys.modules.pop(name, None)
