"""Shared data structures (subset of the reference's ``data.py`` enums and
dataclasses that the alignment path needs; reference ``data.py:2018-2085``)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional


class WorkflowType(enum.Enum):
    reference = 0
    alignment = 1
    segmentation = 2
    transcription = 3
    phone_transcription = 4
    speech_classification = 5
    acoustic_training = 6
    g2p = 7
    language_model_training = 8
    tokenizer_training = 9
    online_alignment = 10


class ClusterType(enum.Enum):
    """Clustering algorithms for diarization (reference ``data.py:458``)."""

    affinity = "affinity"
    agglomerative = "agglomerative"
    spectral = "spectral"
    dbscan = "dbscan"
    hdbscan = "hdbscan"
    optics = "optics"
    kmeans = "kmeans"
    meanshift = "meanshift"


class DistanceMetric(enum.Enum):
    """Distance metrics for diarization scoring (reference ``data.py:474``)."""

    cosine = "cosine"
    euclidean = "euclidean"
    plda = "plda"


@dataclass
class CtmInterval:
    """A time-aligned label interval (reference ``data.py:2018``)."""

    begin: float
    end: float
    label: str
    confidence: Optional[float] = None
    phone_id: Optional[int] = None  # position-tagged phone id (internal)

    @property
    def duration(self) -> float:
        return self.end - self.begin


@dataclass
class WordCtmInterval:
    begin: float
    end: float
    label: str
    phones: List[CtmInterval] = field(default_factory=list)


@dataclass
class UtteranceAlignment:
    """Alignment result for one utterance."""

    utterance_id: int
    words: List[WordCtmInterval]
    phones: List[CtmInterval]
    log_likelihood: float
    per_frame_log_likelihood: float
