"""MAP adaptation of a pretrained model to a new corpus.

Behavioral spec: reference ``alignment/adapting.py`` (``AdaptingAligner``):
run the full alignment workflow — for SAT models that is pass-1 alignment
with the speaker-independent ``final.alimdl``, per-speaker fMLLR
estimation, then pass-2 alignment on the transformed features
(``alignment/base.py:491-558`` via ``AdaptingAligner.align()``,
``adapting.py:200-260``) — then accumulate GMM stats, I-smooth with
``mapping_tau=20`` pseudo-counts and MLE-update *means only*
(``adapting.py:86-135``). The primary model accumulates on the
fMLLR-transformed features; the speaker-independent alignment model
accumulates on SI features under the same (pass-2) alignment — the
two-feats semantics of ``AccStatsTwoFeatsFunction`` (``sat.py:46``).
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
    fetch_all,
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

    # -- alignment over the training pipeline --------------------------------
    def _align_paths(self, pipeline, gmm):
        """Viterbi-align every batch with ``gmm`` on the pipeline's current
        features; stores per-frame pdfs on the batches and returns the host
        state paths. Routed through the mesh machinery when the pipeline is
        distributed (shard_map keeps the Pallas kernels per-shard)."""
        W_h, _ = gmm.flatten_for_device()
        W = pipeline.put_rep(W_h)
        gconsts = pipeline.put_rep(gmm.gconsts)
        scale = self.aligner.config.acoustic_scale
        for fb in pipeline.batches:
            flens_j = pipeline.put_b(fb.frame_lengths)
            if pipeline.mesh is not None:
                fn = pipeline.sharded_align_fn(fb.band_limits, False, scale)
                out = fn(fb.put_b(fb.feats), flens_j, fb.graph, W, gconsts)
            else:
                out = _align_batch(
                    fb.put_b(fb.feats), flens_j, fb.graph, W, gconsts, scale,
                    band_limits=fb.band_limits,
                )
            fb.set_device_alignment(out[0], out[1], fb.graph)

    def _estimate_fmllr(self, pipeline, gmm) -> np.ndarray:
        """Per-speaker fMLLR transforms from the current cached alignment
        (reference ``calc_fmllr`` within the align workflow,
        ``corpus/features.py:422-548``, silence_weight=0)."""
        from montreal_forced_aligner_tpu.ops.transforms import (
            accumulate_fmllr_stats,
            estimate_speaker_fmllr,
        )

        S = getattr(pipeline, "num_speakers_global", None) or len(
            pipeline.corpus.speakers
        )
        spk_offset = getattr(pipeline, "spk_offset", 0)
        from montreal_forced_aligner_tpu.ops.feats import (
            nonsilence_weight as _nonsilence_weight,
            silence_pdf_mask,
        )

        sil_mask = pipeline.put_rep(
            silence_pdf_mask(
                self.aligner._silence_pdfs(), gmm.num_pdfs
            )
        )
        means = pipeline.put_rep(gmm.get_means())
        iv = pipeline.put_rep(gmm.inv_vars)
        gc = pipeline.put_rep(gmm.gconsts)
        miv = pipeline.put_rep(gmm.means_invvars)
        pending = []
        for fb in pipeline.batches:
            weight = _nonsilence_weight(fb.frame_pdf, sil_mask)
            pending.append(
                accumulate_fmllr_stats(
                    fb.put_b(fb.feats),
                    pipeline.put_b(fb.frame_lengths),
                    fb.frame_pdf,
                    pipeline.put_b(fb.speaker_idx + spk_offset),
                    weight,
                    means, iv, gc, miv, S,
                )
            )
        K = np.zeros((S,) + pending[0][0].shape[1:])
        G = np.zeros((S,) + pending[0][1].shape[1:])
        beta = np.zeros(S)
        for k, g, b in fetch_all(pending):
            K += k.astype(np.float64)
            G += g.astype(np.float64)
            beta += b.astype(np.float64)
        return estimate_speaker_fmllr(
            K, G, beta, min_count=self.aligner.config.fmllr_min_count
        )

    def _accumulate_stats(self, pipeline, gmm, tm) -> GmmAccumulators:
        """GMM stats for the pipeline's cached alignment on its *current*
        features (callers switch features for the two-feats pass)."""
        W_h, _ = gmm.flatten_for_device()
        W = pipeline.put_rep(W_h)
        gconsts = pipeline.put_rep(gmm.gconsts)
        acc = GmmAccumulators.zeros(
            gmm.num_pdfs, gmm.max_gauss, gmm.dim, tm.num_transition_ids
        )
        pending = []
        for fb in pipeline.batches:
            pending.append(
                _accumulate_batch(
                    fb.put_b(fb.feats),
                    pipeline.put_b(fb.frame_lengths),
                    fb.frame_pdf,
                    W,
                    gconsts,
                    gmm.num_pdfs,
                )
            )
        for occ, mean_acc, var_acc, ll in fetch_all(pending):
            acc.add(
                occ, mean_acc, var_acc,
                np.zeros(tm.num_transition_ids + 1),
                float(ll), 0.0,
            )
        return acc

    def _map_update(self, gmm, acc) -> "DiagGmmSet":
        acc = ismooth_stats_from_model(gmm, acc, self.mapping_tau)
        new_gmm, _ = mle_update(gmm, acc, update_flags="m")
        return new_gmm

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
            mesh=self.aligner.mesh,
        )
        pipeline.prepare_features()
        pipeline.compile_graphs(self.aligner.compiler)

        two_pass = model.uses_fmllr and model.alignment_model is not None
        if two_pass:
            # reference AdaptingAligner runs the full SAT align workflow:
            # pass 1 with final.alimdl on SI features, per-speaker fMLLR,
            # pass 2 with final.mdl on transformed features
            # (alignment/base.py:491-558)
            ali_tm, ali_gmm = model.alignment_model
            self._align_paths(pipeline, ali_gmm)
            transforms = self._estimate_fmllr(pipeline, model.gmm)
            pipeline.set_feature_transform(
                uses_deltas=model.uses_deltas and model.lda_mat is None,
                lda_mat=model.lda_mat,
                speaker_transforms=transforms,
            )
            self._align_paths(pipeline, model.gmm)
            n_est = int(
                (np.abs(transforms[:, :, -1]).sum(axis=1) > 0).sum()
            )
            logger.info(
                "adapt: estimated fMLLR for %d speakers before pass 2", n_est
            )
        else:
            self._align_paths(pipeline, model.gmm)

        # adapt the primary model on the (possibly transformed) features
        acc = self._accumulate_stats(pipeline, model.gmm, model.transition_model)
        total = acc.occ.sum()
        new_gmm = self._map_update(model.gmm, acc)
        logger.info("MAP-adapted %d pdfs over %.0f frames", new_gmm.num_pdfs, total)

        adapted = AcousticModel(
            transition_model=model.transition_model,
            gmm=new_gmm,
            tree=model.tree,
            meta=dict(model.meta),
            phone_table=dict(model.phone_table),
            lda_mat=model.lda_mat,
        )
        # adapt the speaker-independent alignment model with SI features
        # under the same pass-2 alignment (two-feats stats, sat.py:46)
        if model.alignment_model is not None:
            ali_tm, ali_gmm = model.alignment_model
            if two_pass:
                # keep the alignment, swap the features back to SI
                paths = [fb.host_state_path() for fb in pipeline.batches]
                scores = [fb.host_align_scores() for fb in pipeline.batches]
                tids = [fb.host_frame_tid() for fb in pipeline.batches]
                pipeline.set_feature_transform(
                    uses_deltas=model.uses_deltas and model.lda_mat is None,
                    lda_mat=model.lda_mat,
                )
                for fb, sp, sc, ft in zip(pipeline.batches, paths, scores, tids):
                    fb.set_host_alignment(sp, ft, sc)
            acc2 = self._accumulate_stats(pipeline, ali_gmm, ali_tm)
            adapted.alignment_model = (ali_tm, self._map_update(ali_gmm, acc2))
        return adapted
