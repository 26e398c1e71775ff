"""Optional neural transcription backends (Whisper-family via HF
transformers; torch CPU is baked into this image, model weights are not).

Behavioral spec: reference ``transcription/models.py:29,160``
(``MfaFasterWhisperPipeline``) and the speechbrain workers
(``transcription/multiprocessing.py:583-1001``). These are auxiliary GPU
workloads in the reference (out of the TPU compute path); here they are thin
host-side wrappers that require locally available weights (no network
egress).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger("mfa_tpu")

MODEL_SAMPLE_RATE = 16000  # whisper + speechbrain checkpoints expect 16 kHz


def _iso_language(language) -> Optional[str]:
    """Accepts a ``Language`` enum, a language name, or an ISO code
    (reference passes Language through to whisper, ``data.py:481``).
    The ``unknown``/``multilingual`` sentinels mean "no hint" -> None."""
    if language is None:
        return None
    from montreal_forced_aligner_tpu.data import Language

    if isinstance(language, Language):
        if language in (Language.unknown, Language.multilingual):
            return None
        return language.iso_code
    name = str(language).lower()
    if name in ("unknown", "multilingual"):
        return None
    try:
        return Language[name].iso_code
    except KeyError:
        return name  # assume it is already an ISO code


def _samples_at_model_rate(wav) -> np.ndarray:
    """int16-scaled float samples resampled to the checkpoint rate."""
    if wav.sample_rate != MODEL_SAMPLE_RATE:
        from montreal_forced_aligner_tpu.align.aligner import _resample

        wav = _resample(wav, MODEL_SAMPLE_RATE)
    return np.asarray(wav.samples, dtype=np.float32)


def found_transformers() -> bool:
    try:
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


class WhisperTranscriber:
    """Transcribe with a locally available Whisper checkpoint (reference
    ``WhisperTranscriber``, ``transcription/transcriber.py:1850``)."""

    def __init__(self, model_path, language: Optional[str] = None):
        if not found_transformers():
            raise RuntimeError(
                "transformers is not available; whisper transcription needs "
                "the transformers package and local model weights"
            )
        model_path = Path(model_path)
        if not model_path.exists():
            raise FileNotFoundError(
                f"no local Whisper checkpoint at {model_path}; this "
                "environment has no network egress, so weights must be "
                "provided as a local directory"
            )
        from transformers import (
            WhisperForConditionalGeneration,
            WhisperProcessor,
        )

        self.processor = WhisperProcessor.from_pretrained(str(model_path))
        self.model = WhisperForConditionalGeneration.from_pretrained(
            str(model_path)
        )
        self.language = _iso_language(language)
        gc = self.model.generation_config
        if self.language is not None and not hasattr(gc, "lang_to_id"):
            # minimal / pre-multilingual generation configs cannot condition
            # on a language; decode unconditioned rather than erroring
            logger.warning(
                "whisper checkpoint lacks multilingual token maps; ignoring "
                "language hint %r", self.language,
            )
            self.language = None

    def transcribe(
        self, samples: np.ndarray, sample_rate: int = MODEL_SAMPLE_RATE
    ) -> str:
        import torch

        if sample_rate != MODEL_SAMPLE_RATE:
            raise ValueError(
                f"whisper expects {MODEL_SAMPLE_RATE} Hz input, got "
                f"{sample_rate}; resample first (transcribe_corpus does)"
            )
        inputs = self.processor(
            samples / 32768.0, sampling_rate=sample_rate, return_tensors="pt"
        )
        kwargs = {}
        if self.language:
            kwargs["language"] = self.language
        with torch.no_grad():
            ids = self.model.generate(inputs["input_features"], **kwargs)
        return self.processor.batch_decode(ids, skip_special_tokens=True)[0].strip()

    def transcribe_corpus(self, corpus) -> Dict[int, str]:
        out = {}
        for utt in corpus.utterances:
            wav = corpus.load_audio(utt)
            out[utt.id] = self.transcribe(_samples_at_model_rate(wav))
        return out


def found_speechbrain() -> bool:
    try:
        import speechbrain  # noqa: F401

        return True
    except ImportError:
        return False


class SpeechbrainTranscriber:
    """Transcribe with a locally available SpeechBrain ASR checkpoint
    (reference ``SpeechbrainTranscriber``,
    ``transcription/transcriber.py:1967``; worker spec
    ``transcription/multiprocessing.py:583-1001``)."""

    def __init__(self, model_path, language: Optional[str] = None):
        if not found_speechbrain():
            raise RuntimeError(
                "speechbrain is not available; install it and provide a "
                "local checkpoint directory (no network egress here)"
            )
        model_path = Path(model_path)
        if not model_path.exists():
            raise FileNotFoundError(
                f"no local SpeechBrain checkpoint at {model_path}; this "
                "environment has no network egress, so weights must be "
                "provided as a local directory"
            )
        from speechbrain.inference.ASR import EncoderDecoderASR

        self.model = EncoderDecoderASR.from_hparams(
            source=str(model_path), savedir=str(model_path)
        )
        if language is not None:
            # speechbrain ASR checkpoints are single-language; the hint only
            # documents intent (unlike whisper there is nothing to condition)
            logger.warning(
                "speechbrain checkpoints are single-language; --language "
                "%s has no effect on decoding", language,
            )
        self.language = _iso_language(language)

    def transcribe(
        self, samples: np.ndarray, sample_rate: int = MODEL_SAMPLE_RATE
    ) -> str:
        import torch

        if sample_rate != MODEL_SAMPLE_RATE:
            raise ValueError(
                f"speechbrain expects {MODEL_SAMPLE_RATE} Hz input, got "
                f"{sample_rate}; resample first (transcribe_corpus does)"
            )
        wav = torch.from_numpy(
            np.asarray(samples, dtype=np.float32) / 32768.0
        ).unsqueeze(0)
        lens = torch.ones(1)
        with torch.no_grad():
            preds, _ = self.model.transcribe_batch(wav, lens)
        return preds[0].strip().lower()

    def transcribe_corpus(self, corpus) -> Dict[int, str]:
        out = {}
        for utt in corpus.utterances:
            wav = corpus.load_audio(utt)
            out[utt.id] = self.transcribe(_samples_at_model_rate(wav))
        return out
