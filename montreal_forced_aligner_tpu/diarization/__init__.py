from montreal_forced_aligner_tpu.diarization.clustering import (
    agglomerative_cluster,
    kmeans_cluster,
)
from montreal_forced_aligner_tpu.diarization.speaker_diarizer import SpeakerDiarizer

__all__ = ["agglomerative_cluster", "kmeans_cluster", "SpeakerDiarizer"]
