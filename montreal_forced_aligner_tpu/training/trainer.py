"""Full training recipe orchestration.

Behavioral spec: reference ``acoustic_modeling/trainer.py`` — the default
recipe chains monophone → triphone → LDA+MLLT → SAT (→ SAT) with growing
subsets and Gaussian budgets (``:193-240``), interleaving each stage with
alignment by the previous stage's model (``:569-642``), and exports the final
model (``:456``).

Differences from the reference's process model: one shared
:class:`TrainingPipeline` holds device-resident features for every stage;
"alignment workflows" between stages are implicit (each stage starts from the
alignments the previous stage left cached on the pipeline batches).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.training.base import TrainerConfig, TrainingPipeline
from montreal_forced_aligner_tpu.training.lda import LdaTrainer
from montreal_forced_aligner_tpu.training.monophone import MonophoneTrainer
from montreal_forced_aligner_tpu.training.sat import SatTrainer
from montreal_forced_aligner_tpu.training.triphone import TriphoneTrainer

logger = logging.getLogger("mfa_tpu")


@dataclass
class StageConfig:
    name: str
    kind: str  # mono | tri | lda | sat
    num_iterations: int
    max_gaussians: int
    num_leaves: int = 0
    subset: int = 0


# Default recipe (reference ``trainer.py:193-240``; subsets are applied when
# the corpus is larger than the subset size)
DEFAULT_RECIPE = [
    StageConfig("monophone", "mono", 40, 1000, subset=10000),
    StageConfig("triphone", "tri", 35, 10000, num_leaves=2000, subset=20000),
    StageConfig("lda", "lda", 35, 10000, num_leaves=2500, subset=20000),
    StageConfig("sat_1", "sat", 35, 10000, num_leaves=2500, subset=20000),
    StageConfig("sat_2", "sat", 35, 15000, num_leaves=4200, subset=50000),
]


class TrainableAligner:
    """Train an acoustic model through the staged recipe (reference entry
    point: ``mfa train``, ``command_line/train_acoustic_model.py``)."""

    def __init__(
        self,
        corpus_directory,
        dictionary_path,
        recipe: Optional[List[StageConfig]] = None,
        base_config: Optional[TrainerConfig] = None,
        batch_size: int = 16,
        position_dependent_phones: bool = False,
    ):
        self.corpus = Corpus.load(corpus_directory)
        self.lexicon = Lexicon.load(
            dictionary_path, position_dependent=position_dependent_phones
        )
        self.recipe = recipe if recipe is not None else DEFAULT_RECIPE
        self.base_config = base_config or TrainerConfig()
        self.batch_size = batch_size
        self.models: Dict[str, AcousticModel] = {}
        self.trainers: Dict[str, object] = {}

    def train(self) -> AcousticModel:
        pipeline = TrainingPipeline(
            self.corpus, self.lexicon, batch_size=self.batch_size
        )
        pipeline.prepare_features()
        topo = None
        lda_mat = None
        model = None
        for stage in self.recipe:
            logger.info("=== stage %s (%s) ===", stage.name, stage.kind)
            cfg = replace(
                self.base_config,
                num_iterations=stage.num_iterations,
                max_gaussians=stage.max_gaussians,
            )
            if stage.kind == "mono":
                trainer = MonophoneTrainer(self.lexicon, cfg)
            elif stage.kind == "tri":
                trainer = TriphoneTrainer(
                    self.lexicon, topo, cfg, num_leaves=stage.num_leaves
                )
            elif stage.kind == "lda":
                trainer = LdaTrainer(
                    self.lexicon, topo, cfg, num_leaves=stage.num_leaves
                )
            elif stage.kind == "sat":
                trainer = SatTrainer(
                    self.lexicon,
                    topo,
                    cfg,
                    num_leaves=stage.num_leaves,
                    lda_mat=lda_mat,
                )
            else:
                raise ValueError(f"unknown stage kind {stage.kind}")
            model = trainer.train(pipeline)
            self.models[stage.name] = model
            self.trainers[stage.name] = trainer
            topo = trainer.tm.topo
            if getattr(trainer, "lda_mat", None) is not None:
                lda_mat = trainer.lda_mat
        return model

    def export_model(self, path) -> None:
        final = self.models[self.recipe[-1].name]
        final.save(path)
