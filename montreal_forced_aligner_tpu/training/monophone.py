"""Monophone training (flat start + Viterbi EM).

Behavioral spec: reference ``acoustic_modeling/monophone.py`` —
flat-start init from global feature stats (``:298-339``), equal-spaced first
alignment (``:37-139``), 40 iterations with realignment schedule
(every iteration for the first quarter, every 2nd until half, every 3rd
after; ``:206-217``), Gaussian mixing-up toward ``max_gaussians`` with
linear increments until ``num_iterations - 10`` (``base.py:451-453``),
transition-model MLE updates each iteration.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.graph.compiler import AlignmentGraphCompiler
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.models.gmm import DiagGmmSet
from montreal_forced_aligner_tpu.models.transition_model import (
    HmmTopology,
    TransitionModel,
)
from montreal_forced_aligner_tpu.models.tree import ContextDependency
from montreal_forced_aligner_tpu.ops.stats import (
    GmmAccumulators,
    mle_update,
    split_gaussians,
)
from montreal_forced_aligner_tpu.ops.viterbi import (
    extract_frame_labels_host,
    frame_tids_host,
)
from montreal_forced_aligner_tpu.training.base import (
    TrainerConfig,
    TrainingPipeline,
    _accumulate_batch,
    _align_batch,
    _equal_align_batch,
)

logger = logging.getLogger("mfa_tpu")


class MonophoneTrainer:
    """Flat-start monophone Viterbi-EM trainer."""

    def __init__(
        self,
        lexicon: Lexicon,
        config: Optional[TrainerConfig] = None,
        num_silence_states: int = 5,
        num_non_silence_states: int = 3,
    ):
        self.lexicon = lexicon
        self.config = config or TrainerConfig()
        self.num_silence_states = num_silence_states
        self.num_non_silence_states = num_non_silence_states
        self.tm: Optional[TransitionModel] = None
        self.gmm: Optional[DiagGmmSet] = None
        self.tree: Optional[ContextDependency] = None
        self.iteration_log: List[dict] = []

    # -- schedule ------------------------------------------------------------
    @property
    def realignment_iterations(self) -> List[int]:
        n = self.config.num_iterations
        iters = [0, 1]
        for i in range(2, n):
            if i <= n // 4:
                iters.append(i)
            elif i <= n // 2:
                if i - iters[-1] > 1:
                    iters.append(i)
            else:
                if i - iters[-1] > 2:
                    iters.append(i)
        return iters

    # -- initialization ------------------------------------------------------
    def _silence_phone_ids(self) -> List[int]:
        lex = self.lexicon
        out = set()
        for base in (lex.silence_phone, lex.oov_phone, "sp"):
            for name, pid in lex.phone_table.items():
                if name == base or (
                    name.startswith(base + "_") and len(name) == len(base) + 2
                ):
                    out.add(pid)
        return sorted(out)

    def flat_start(self, pipeline: TrainingPipeline) -> None:
        """``gmm_init_mono``: shared global-stat Gaussian per pdf
        (reference ``monophone.py:298-339``)."""
        phones = sorted(v for k, v in self.lexicon.phone_table.items() if v > 0)
        silence = self._silence_phone_ids()
        topo = HmmTopology.standard(
            phones,
            silence_phones=silence,
            num_non_silence_states=self.num_non_silence_states,
            num_silence_states=self.num_silence_states,
        )
        self.tree = ContextDependency.monophone(phones, topo)
        self.tm = TransitionModel.from_topology_and_tree(topo, self.tree)
        mean, var = pipeline.global_mean_var()
        num_pdfs = self.tree.num_pdfs
        inv_var = 1.0 / var
        self.gmm = DiagGmmSet.from_lists(
            weights_list=[np.ones(1, np.float32)] * num_pdfs,
            miv_list=[(mean * inv_var)[None, :].astype(np.float32)] * num_pdfs,
            iv_list=[inv_var[None, :].astype(np.float32)] * num_pdfs,
        )

    def _device_gmm(self):
        gconsts = self.gmm.gconsts.copy()
        if self.config.boost_silence != 1.0:
            sil_pdfs = []
            for pid in self._silence_phone_ids():
                try:
                    entry = self.tm.topo.entry_for_phone(pid)
                except KeyError:
                    continue
                for cls in range(self.tm.topo.num_pdf_classes(pid)):
                    sil_pdfs.extend(self.tree.pdfs_for_phone_pdf_class(pid, cls))
            gconsts[sorted(set(sil_pdfs))] += math.log(self.config.boost_silence)
        W, _ = self.gmm.flatten_for_device()
        return jnp.asarray(W), jnp.asarray(gconsts)

    # -- core loop -----------------------------------------------------------
    def _realign(self, pipeline: TrainingPipeline, equal: bool = False) -> None:
        W, gconsts = (None, None) if equal else self._device_gmm()
        for fb in pipeline.batches:
            flens_j = jnp.asarray(fb.frame_lengths)
            if equal:
                state_path, _scores = _equal_align_batch(fb.feats, flens_j, fb.graph)
            else:
                state_path, _scores = _align_batch(
                    fb.feats, flens_j, fb.graph, W, gconsts,
                    self.config.acoustic_scale,
                )
            sp = np.asarray(state_path)
            b = np.arange(sp.shape[0])[:, None]
            fb.frame_pdf = jnp.asarray(fb.garrs["state_pdf"][b, sp])
            fb.frame_tid = frame_tids_host(fb.garrs, sp, fb.frame_lengths)

    def _accumulate(self, pipeline: TrainingPipeline) -> GmmAccumulators:
        W, _ = self.gmm.flatten_for_device()
        W = jnp.asarray(W)
        gconsts = jnp.asarray(self.gmm.gconsts)
        acc = GmmAccumulators.zeros(
            self.gmm.num_pdfs, self.gmm.max_gauss, self.gmm.dim,
            self.tm.num_transition_ids,
        )
        pending = []
        for fb in pipeline.batches:
            out = _accumulate_batch(
                fb.feats,
                jnp.asarray(fb.frame_lengths),
                fb.frame_pdf,
                W,
                gconsts,
                self.gmm.num_pdfs,
            )
            pending.append((fb, out))
        for fb, (occ, mean_acc, var_acc, ll) in pending:
            tcounts = np.bincount(
                fb.frame_tid[fb.frame_tid > 0],
                minlength=self.tm.num_transition_ids + 1,
            )
            acc.add(
                occ, mean_acc, var_acc, tcounts, float(ll),
                float(fb.frame_lengths.sum()),
            )
        return acc

    def train(self, pipeline: TrainingPipeline) -> AcousticModel:
        cfg = self.config
        self.flat_start(pipeline)
        compiler = AlignmentGraphCompiler(
            self.tm,
            self.tree,
            self.lexicon,
            transition_scale=cfg.transition_scale,
            self_loop_scale=cfg.self_loop_scale,
        )
        pipeline.compile_graphs(compiler)

        # iteration 0: equal alignment + first update
        self._realign(pipeline, equal=True)
        acc = self._accumulate(pipeline)
        self._update(acc, mixup_target=None)

        initial_gaussians = self.gmm.total_gauss
        final_gauss_iter = max(cfg.num_iterations - 10, 1)
        increment = max(
            int((cfg.max_gaussians - initial_gaussians) / final_gauss_iter), 0
        )
        current_target = initial_gaussians
        realign_iters = set(self.realignment_iterations)

        for it in range(1, cfg.num_iterations + 1):
            if it in realign_iters:
                # NOTE: like the reference (compile-train-graphs once per
                # stage), graph transition weights stay at their initial
                # values; only the GMM evolves between realignments
                self._realign(pipeline)
            acc = self._accumulate(pipeline)
            if it <= final_gauss_iter:
                current_target = min(current_target + increment, cfg.max_gaussians)
            self._update(acc, mixup_target=current_target)
            ll_frame = acc.total_loglike / max(acc.total_frames, 1.0)
            self.iteration_log.append(
                {
                    "iteration": it,
                    "loglike_per_frame": ll_frame,
                    "num_gaussians": int(self.gmm.total_gauss),
                }
            )
            logger.info(
                "mono iter %d: loglike/frame %.4f, %d gaussians",
                it, ll_frame, self.gmm.total_gauss,
            )
        return self.export_model()

    def _update(self, acc: GmmAccumulators, mixup_target: Optional[int]) -> None:
        self.gmm, _info = mle_update(
            self.gmm, acc, min_gaussian_occupancy=self.config.min_gaussian_occupancy
        )
        self.tm.mle_update(acc.transition_counts.astype(np.float64))
        if mixup_target is not None and mixup_target > self.gmm.total_gauss:
            self.gmm = split_gaussians(
                self.gmm,
                acc.occ,
                mixup_target,
                power=self.config.power,
            )

    def export_model(self) -> AcousticModel:
        phones = sorted(
            (v, k) for k, v in self.lexicon.phone_table.items() if v > 0
        )
        meta = {
            "architecture": "gmm-hmm",
            "version": "0.1.0-tpu",
            "train_type": "mono",
            "phones": sorted(
                {k.rsplit("_", 1)[0] if k.endswith(("_B", "_E", "_I", "_S")) else k
                 for _v, k in phones}
                - {self.lexicon.silence_phone, self.lexicon.oov_phone, "sp"}
            ),
            "features": {
                "type": "mfcc",
                "deltas": True,
                "lda": False,
                "fmllr": False,
                "frame_shift": 10,
            },
        }
        return AcousticModel(
            transition_model=self.tm,
            gmm=self.gmm,
            tree=self.tree,
            meta=meta,
            phone_table=dict(self.lexicon.phone_table),
        )
