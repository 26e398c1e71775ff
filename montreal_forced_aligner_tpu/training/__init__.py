from montreal_forced_aligner_tpu.training.base import TrainingPipeline, TrainerConfig
from montreal_forced_aligner_tpu.training.monophone import MonophoneTrainer

__all__ = ["TrainingPipeline", "TrainerConfig", "MonophoneTrainer"]
