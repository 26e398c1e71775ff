"""MAP adaptation of a pretrained model to a new corpus.

Behavioral spec: reference ``alignment/adapting.py`` (``AdaptingAligner``):
align the corpus with the pretrained model, accumulate GMM stats, I-smooth
with ``mapping_tau=20`` pseudo-counts, MLE-update *means only*; the
speaker-independent alignment model is adapted the same way with
speaker-independent features (two-stage ``adapt()``, ``:200``).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.align.aligner import AlignerConfig, PretrainedAligner
from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.ops.stats import (
    GmmAccumulators,
    ismooth_stats_from_model,
    mle_update,
)
from montreal_forced_aligner_tpu.training.base import (
    TrainerConfig,
    TrainingPipeline,
    _accumulate_batch,
    _align_batch,
)

logger = logging.getLogger("mfa_tpu")


class MapAdapter:
    """Adapt a pretrained acoustic model to a corpus (reference entry point:
    ``mfa adapt``)."""

    def __init__(
        self,
        acoustic_model_path,
        dictionary_path,
        mapping_tau: float = 20.0,
        config: Optional[AlignerConfig] = None,
    ):
        self.aligner = PretrainedAligner(
            acoustic_model_path, dictionary_path, config
        )
        self.mapping_tau = mapping_tau

    def _accumulate_for_model(self, pipeline, gmm, tm):
        W, _ = gmm.flatten_for_device()
        Wj = pipeline.put_rep(W)
        gconsts = pipeline.put_rep(gmm.gconsts)
        acc = GmmAccumulators.zeros(
            gmm.num_pdfs, gmm.max_gauss, gmm.dim, tm.num_transition_ids
        )
        aligned = []
        for fb in pipeline.batches:
            flens_j = pipeline.put_b(fb.frame_lengths)
            state_path, _sc = _align_batch(
                fb.put_b(fb.feats), flens_j, fb.graph, Wj, gconsts,
                self.aligner.config.acoustic_scale,
            )
            aligned.append((fb, flens_j, state_path))
        from montreal_forced_aligner_tpu.training.base import fetch_all

        paths = fetch_all([sp for _fb, _fl, sp in aligned])
        pending = []
        for (fb, flens_j, _sp_dev), sp in zip(aligned, paths):
            b = np.arange(sp.shape[0])[:, None]
            frame_pdf = fb.put_b(fb.garrs["state_pdf"][b, sp])
            out = _accumulate_batch(
                fb.put_b(fb.feats), flens_j, frame_pdf, Wj, gconsts, gmm.num_pdfs
            )
            pending.append(out)
        for occ, mean_acc, var_acc, ll in fetch_all(pending):
            acc.add(
                occ, mean_acc, var_acc,
                np.zeros(tm.num_transition_ids + 1),
                float(ll), 0.0,
            )
        return acc

    def adapt(
        self, corpus_directory, speaker_characters=0, audio_directory=None
    ) -> AcousticModel:
        model = self.aligner.model
        corpus = Corpus.load(
            corpus_directory,
            speaker_characters=speaker_characters,
            audio_directory=audio_directory,
        )
        pipeline = TrainingPipeline(
            corpus,
            self.aligner.lexicon,
            mfcc_config=self.aligner.mfcc_config,
            batch_size=self.aligner.config.batch_size,
            uses_deltas=model.uses_deltas,
            lda_mat=model.lda_mat,
        )
        pipeline.prepare_features()
        pipeline.compile_graphs(self.aligner.compiler)

        # adapt the primary model
        acc = self._accumulate_for_model(
            pipeline, model.gmm, model.transition_model
        )
        total = acc.occ.sum()
        acc = ismooth_stats_from_model(model.gmm, acc, self.mapping_tau)
        new_gmm, _ = mle_update(model.gmm, acc, update_flags="m")
        logger.info("MAP-adapted %d pdfs over %.0f frames", new_gmm.num_pdfs, total)

        adapted = AcousticModel(
            transition_model=model.transition_model,
            gmm=new_gmm,
            tree=model.tree,
            meta=dict(model.meta),
            phone_table=dict(model.phone_table),
            lda_mat=model.lda_mat,
        )
        # adapt the speaker-independent alignment model if present
        if model.alignment_model is not None:
            ali_tm, ali_gmm = model.alignment_model
            acc2 = self._accumulate_for_model(pipeline, ali_gmm, ali_tm)
            acc2 = ismooth_stats_from_model(ali_gmm, acc2, self.mapping_tau)
            new_ali, _ = mle_update(ali_gmm, acc2, update_flags="m")
            adapted.alignment_model = (ali_tm, new_ali)
        return adapted
