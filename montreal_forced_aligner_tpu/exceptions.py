"""Exception hierarchy (reference ``exceptions.py:72-961``, rooted at
``MFAError``; the kaldi-log-scraping machinery is unnecessary since there
are no subprocess workers)."""

from __future__ import annotations

from typing import List, Optional


class MFAError(Exception):
    """Root of the framework's exception hierarchy."""


# -- model errors ------------------------------------------------------------
class ModelError(MFAError):
    pass


class ModelLoadError(ModelError):
    pass


class ModelTypeError(ModelError):
    pass


class PhoneMismatchError(ModelError):
    """Dictionary phones missing from the acoustic model inventory
    (reference ``models.py:790`` validate)."""

    def __init__(self, missing_phones):
        self.missing_phones = sorted(missing_phones)
        super().__init__(
            f"Phones missing from the acoustic model: {self.missing_phones}"
        )


# -- dictionary errors -------------------------------------------------------
class DictionaryError(MFAError):
    pass


class DictionaryPathError(DictionaryError):
    pass


class DictionaryFileError(DictionaryError):
    pass


# -- corpus errors -----------------------------------------------------------
class CorpusError(MFAError):
    pass


class CorpusReadError(CorpusError):
    def __init__(self, file_name, message: str = ""):
        self.file_name = file_name
        super().__init__(f"Error reading {file_name}: {message}")


class SoundFileError(CorpusReadError):
    pass


class TextParseError(CorpusReadError):
    pass


class TextGridParseError(CorpusReadError):
    pass


# -- alignment errors --------------------------------------------------------
class AlignmentError(MFAError):
    pass


class AlignmentExportError(AlignmentError):
    pass


class NoAlignmentsError(AlignmentError):
    def __init__(self, num_utterances: int = 0):
        super().__init__(
            f"No utterances could be aligned (of {num_utterances})"
        )


# -- training / config errors ------------------------------------------------
class TrainerError(MFAError):
    pass


class ConfigError(MFAError):
    pass


class G2PError(MFAError):
    pass


class LanguageModelError(MFAError):
    pass


class KaldiProcessingError(MFAError):
    """Kept for API parity with the reference (``exceptions.py:961``); this
    framework has no Kaldi subprocesses, so it only wraps numerical-pipeline
    failures."""

    def __init__(self, error_logs: Optional[List[str]] = None, message: str = ""):
        self.error_logs = error_logs or []
        super().__init__(message or "Processing error")
