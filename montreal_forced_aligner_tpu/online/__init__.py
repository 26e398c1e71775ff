from montreal_forced_aligner_tpu.online.alignment import align_utterance_online

__all__ = ["align_utterance_online"]
