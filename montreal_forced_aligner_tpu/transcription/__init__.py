from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

__all__ = ["Transcriber"]
