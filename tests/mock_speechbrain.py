"""A minimal in-process stand-in for the ``speechbrain`` package.

speechbrain is not installed in this image and model weights cannot be
downloaded (no egress), so the speechbrain-gated code paths (ASR
transcription, neural VAD, x-vector speaker embeddings) are exercised
against this mock. Two properties make it a meaningful test double rather
than a hand-wave:

- **The interface is the pinned contract**, not an ad-hoc copy: every
  class/method here comes from
  :mod:`montreal_forced_aligner_tpu.speechbrain_surface`
  (``SPEECHBRAIN_SURFACE``), and ``test_torch_gated.py`` holds the mock —
  and the real package, when installed — to that same surface.
- **The models are real ``torch.nn.Module`` networks** with deterministic
  weights, checkpoint-round-tripped through ``torch.save``/``torch.load``
  by ``from_hparams`` (the same real-tiny-checkpoint treatment the whisper
  tests use): the VAD is an energy conv-pool network, the x-vector encoder
  a sinusoid-filterbank conv net whose embeddings are frequency-selective
  (same dominant frequency -> nearby embeddings, so synthetic 'speakers'
  with distinct spectra cluster apart), the ASR a pooling network whose
  output length drives the decoded text.

Install with :func:`install` (uses ``sys.modules``); the real package,
when present, always wins because install() refuses to shadow it.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _checkpoint_round_trip(module, savedir, name):
    """Save + reload the module's weights when a savedir is given —
    from_hparams in the real package materializes checkpoint files; the
    mock exercises the same torch serialization path."""
    if savedir is None:
        return module
    import os

    import torch

    os.makedirs(savedir, exist_ok=True)
    path = os.path.join(savedir, name)
    if not os.path.exists(path):
        torch.save(module.state_dict(), path)
    module.load_state_dict(torch.load(path, weights_only=True))
    return module


def _torch_base():
    import torch

    class _Base(torch.nn.Module):
        @classmethod
        def from_hparams(cls, source=None, savedir=None, run_opts=None):
            torch.manual_seed(0)  # deterministic weights
            model = cls()
            model.eval()
            return _checkpoint_round_trip(
                model, savedir, f"{cls.__name__}.ckpt"
            )

    return torch, _Base


def _build_classes():
    torch, _Base = _torch_base()

    class _MockASR(_Base):
        """EncoderDecoderASR stand-in: a real pooling encoder whose output
        length (one 'token' per second of audio) drives the decode."""

        def __init__(self):
            super().__init__()
            self.pool = torch.nn.AvgPool1d(kernel_size=16000, stride=16000)

        def forward(self, wav):
            return self.pool(wav.reshape(1, 1, -1) ** 2)

        def transcribe_batch(self, wav, lens):
            with torch.no_grad():
                frames = self.forward(wav)
            n_tokens = max(1, int(frames.shape[-1]))
            return [("MOCK " * n_tokens).strip()], torch.ones(1)

    class _MockVAD(_Base):
        """speechbrain.inference.VAD stand-in: chunked energy posteriors
        from a conv-pool energy network (10 ms chunks at 16 kHz)."""

        CHUNK = 160

        def __init__(self):
            super().__init__()
            self.pool = torch.nn.AvgPool1d(
                kernel_size=self.CHUNK, stride=self.CHUNK
            )

        def forward(self, wav):
            energy = self.pool(wav.reshape(1, 1, -1) ** 2).reshape(-1)
            logp = torch.log(torch.sqrt(energy) + 1e-12)
            return torch.sigmoid(logp - logp.median())

        def get_speech_prob_chunk(self, wav):
            with torch.no_grad():
                return self.forward(wav)

    class _MockEncoderClassifier(_Base):
        """EncoderClassifier stand-in: a sinusoid-filterbank conv net.
        Each of the 32 channels is a fixed sine filter at a distinct
        frequency; log band energies -> normalized embedding, so the same
        dominant frequency maps to nearby embeddings."""

        DIM = 32
        KERNEL = 256

        def __init__(self):
            super().__init__()
            self.bank = torch.nn.Conv1d(
                1, self.DIM, kernel_size=self.KERNEL, stride=128, bias=False
            )
            t = np.arange(self.KERNEL)
            filters = np.stack(
                [
                    np.sin(2 * np.pi * (k + 1) * t / self.KERNEL)
                    * np.hanning(self.KERNEL)
                    for k in range(self.DIM)
                ]
            ).astype(np.float32)
            with torch.no_grad():
                self.bank.weight.copy_(
                    torch.from_numpy(filters).unsqueeze(1)
                )

        def forward(self, wav):
            x = wav.reshape(1, 1, -1)[:, :, : 1 << 14]
            resp = self.bank(x) ** 2  # (1, DIM, T')
            emb = torch.log(resp.mean(dim=2) + 1e-6)
            emb = (emb - emb.mean()) / (emb.std() + 1e-6)
            return emb.reshape(1, 1, -1)

        def encode_batch(self, wav):
            with torch.no_grad():
                return self.forward(wav)

    return _MockASR, _MockVAD, _MockEncoderClassifier


def install() -> None:
    """Register the mock as ``speechbrain`` in ``sys.modules`` (no-op if the
    real package is importable)."""
    try:
        import speechbrain  # noqa: F401

        if not getattr(speechbrain, "__mfa_tpu_mock__", False):
            return  # never shadow a real install
    except ImportError:
        pass
    _MockASR, _MockVAD, _MockEncoderClassifier = _build_classes()
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
