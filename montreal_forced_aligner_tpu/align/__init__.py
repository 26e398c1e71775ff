from montreal_forced_aligner_tpu.align.aligner import PretrainedAligner, AlignerConfig

__all__ = ["PretrainedAligner", "AlignerConfig"]
