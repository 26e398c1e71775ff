from montreal_forced_aligner_tpu.models.transition_model import HmmTopology, TransitionModel
from montreal_forced_aligner_tpu.models.gmm import DiagGmmSet
from montreal_forced_aligner_tpu.models.tree import ContextDependency
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel

__all__ = [
    "HmmTopology",
    "TransitionModel",
    "DiagGmmSet",
    "ContextDependency",
    "AcousticModel",
]
