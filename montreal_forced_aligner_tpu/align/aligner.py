"""Pretrained-model corpus alignment pipeline.

The TPU-native equivalent of the reference's ``PretrainedAligner.align()``
workflow (``alignment/base.py:491-558`` and ``pretrained.py:549``): corpus
load → tokenize → graph compile (host) → MFCC + CMVN + deltas (device) →
batched GMM state likelihoods + dense Viterbi (device) → CTM intervals →
TextGrid export. Per-speaker CMVN is a segment reduction instead of a
per-speaker worker loop; utterances are bucketed by frame count so every
device program has static shapes.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.corpus.corpus import Corpus, Utterance
from montreal_forced_aligner_tpu.data import (
    CtmInterval,
    UtteranceAlignment,
    WordCtmInterval,
)
from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.dictionary.tokenizer import SimpleTokenizer
from montreal_forced_aligner_tpu.graph.compiler import (
    AlignmentGraphCompiler,
    CompiledGraph,
    batch_graphs,
    ship_graph_to_device,
)
from montreal_forced_aligner_tpu.io.textgrid import Interval, TextGrid
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.ops.feats import (
    compute_deltas,
    splice_frames,
    apply_transform,
    frame_mask,
    nonsilence_weight as _nonsilence_weight,
    silence_pdf_mask,
)
from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_loglikes
from montreal_forced_aligner_tpu.ops.mfcc import (
    MfccConfig,
    _mfcc_device,
    pad_waves_for_mfcc,
)
from montreal_forced_aligner_tpu.ops.viterbi import (
    BatchedGraph,
    extract_frame_labels_host,
    viterbi_align_batch,
)

POSITIONS = ("_B", "_E", "_I", "_S")

import logging

_logger = logging.getLogger("mfa_tpu")


from functools import partial

import jax


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def _mfcc_and_sums(padded_waves, frame_lengths, cfg, max_frames):
    """Phase A: MFCC + masked per-utterance feature sums (for CMVN)."""
    feats = _mfcc_device(padded_waves, cfg, max_frames)
    mask = frame_mask(frame_lengths, feats.shape[1])[..., None]
    sums = jnp.where(mask, feats, 0.0).sum(axis=1)
    return feats, sums


@partial(jax.jit, static_argnames=("cfg", "max_frames", "num_speakers"))
def _mfcc_and_spk_stats(
    padded_waves, frame_lengths, spk_idx, cfg, max_frames, num_speakers
):
    """Phase A: MFCC + per-speaker CMVN sums, reduced on device.

    Speaker reduction as a one-hot matmul keeps the whole pipeline async:
    only one tiny (num_speakers, D) array per device crosses back to the
    host (vs per-batch per-utterance sums), which matters on
    remote-attached TPUs where each fetch is a ~0.1 s round trip."""
    feats = _mfcc_device(padded_waves, cfg, max_frames)
    mask = frame_mask(frame_lengths, feats.shape[1])[..., None]
    sums = jnp.where(mask, feats, 0.0).sum(axis=1)  # (B, D)
    onehot = jax.nn.one_hot(spk_idx, num_speakers, dtype=feats.dtype)
    spk_sum = jnp.einsum("bs,bd->sd", onehot, sums)
    return feats, spk_sum


@partial(jax.jit, static_argnames=("num_speakers",))
def _feats_and_spk_stats(feats16, frame_lengths, spk_idx, num_speakers):
    """Phase A for pre-computed (host-MFCC) features shipped f16: cast to
    f32 on device + the same per-speaker CMVN reduction as
    :func:`_mfcc_and_spk_stats` (degraded-tunnel transfer mode)."""
    feats = feats16.astype(jnp.float32)
    mask = frame_mask(frame_lengths, feats.shape[1])[..., None]
    sums = jnp.where(mask, feats, 0.0).sum(axis=1)
    onehot = jax.nn.one_hot(spk_idx, num_speakers, dtype=feats.dtype)
    spk_sum = jnp.einsum("bs,bd->sd", onehot, sums)
    return feats, spk_sum


@jax.jit
def _feats_and_sums(feats16, frame_lengths):
    """Per-utterance-sums variant of :func:`_feats_and_spk_stats` (the
    training pipeline's phase A shape)."""
    feats = feats16.astype(jnp.float32)
    mask = frame_mask(frame_lengths, feats.shape[1])[..., None]
    sums = jnp.where(mask, feats, 0.0).sum(axis=1)
    return feats, sums


# -- adaptive host->device transfer mode -------------------------------------
# The tunnel to a remote-attached TPU swings 1.6 GB/s -> 60 MB/s minute to
# minute (BENCH telemetry, rounds 3-4). int16 waves are ~32 KB per audio
# second; (T, 13) f16 MFCC features are ~2.6 KB — 12x fewer bytes. When a
# quick probe reads a degraded link, phase A computes MFCCs host-side (the
# identical XLA program on the CPU backend) and ships features instead.
# Explicit double-buffering is NOT needed on top: device_put and every
# kernel dispatch are asynchronous and all batches are dispatched before
# any fetch, so batch N+1's transfer already overlaps batch N's compute —
# the degraded regime is transfer-BOUND, which only fewer bytes fixes.

# Default threshold from the measured breakeven on the real chip: the
# features path costs ~3.5 s extra per ~1000 audio-s corpus (host torch
# MFCC + f16 conversion + separate phase-A program) while saving ~28 MB
# over the link, so it only wins below ~10-25 MB/s — i.e. when the tunnel
# has genuinely collapsed, not merely dipped.
_TRANSFER_THRESHOLD_MBPS = float(
    os.environ.get("MFA_TPU_TRANSFER_THRESHOLD_MBPS", 25.0)
)
_transfer_probe_cache = {"t": 0.0, "mode": None}


def _probe_h2d_MBps() -> float:
    """MARGINAL host->device bandwidth: a 4 MB transfer timed against a
    4 KB one, so per-call round-trip latency cancels out. The tunnel has
    two distinct failure modes — bandwidth collapse (big transfers crawl)
    and latency collapse (EVERY call costs 0.15-3 s regardless of size);
    feature shipping only helps the former, so the switch must not
    trigger on the latter (fewer bytes cannot fix per-call latency, and
    the host MFCC adds work)."""
    import time as _time

    import jax as _jax

    dev = _jax.devices()[0]
    small = np.zeros(2 * 1024, np.int16)  # 4 KB
    big = np.zeros(2 * 1024 * 1024, np.int16)  # 4 MB
    w = _jax.device_put(small[:16], dev)
    _jax.block_until_ready(w)  # dispatch path warm
    t0 = _time.perf_counter()
    _jax.block_until_ready(_jax.device_put(small, dev))
    t_small = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    _jax.block_until_ready(_jax.device_put(big, dev))
    t_big = _time.perf_counter() - t0
    return (big.nbytes - small.nbytes) / 1e6 / max(t_big - t_small, 1e-9)


def resolve_transfer_mode(requested: str = "auto", ttl_s: float = 120.0) -> str:
    """Pick "waves" or "features" for phase A.

    ``requested``/env ``MFA_TPU_TRANSFER_MODE`` force a mode; "auto" probes
    the link (cached ``ttl_s``) and switches to feature shipping below
    ``MFA_TPU_TRANSFER_THRESHOLD_MBPS`` (default 25 — the measured
    breakeven; see the constant's note). On the CPU backend
    there is no link to degrade — always waves. The choice is logged and
    recorded by callers (bench telemetry) because f16 features quantize
    (~1e-3 relative): alignments can differ from wave mode at exact ties.
    """
    import time as _time

    import jax as _jax

    env = os.environ.get("MFA_TPU_TRANSFER_MODE")
    if env in ("waves", "features"):
        return env
    if requested in ("waves", "features"):
        return requested
    if _jax.default_backend() == "cpu":
        return "waves"
    now = _time.monotonic()
    if (
        _transfer_probe_cache["mode"] is not None
        and now - _transfer_probe_cache["t"] < ttl_s
    ):
        return _transfer_probe_cache["mode"]
    rate = _probe_h2d_MBps()
    mode = "features" if rate < _TRANSFER_THRESHOLD_MBPS else "waves"
    _transfer_probe_cache.update(t=now, mode=mode)
    if mode == "features":
        _logger.warning(
            "host->device link degraded (%.0f MB/s < %.0f): shipping f16 "
            "MFCC features instead of waves (12x fewer bytes; host CPU "
            "computes the identical MFCC program)",
            rate, _TRANSFER_THRESHOLD_MBPS,
        )
    else:
        _logger.debug("h2d probe %.0f MB/s: shipping waves", rate)
    return mode


@jax.jit
def _final_feats(feats, frame_lengths, mean_rows, lda, pitch=None):
    """CMVN-subtract, optional pitch paste, then deltas or splice+LDA
    (pitch is pasted post-CMVN, reference ``FinalFeatureFunction``,
    ``corpus/features.py:254``)."""
    x = feats - mean_rows[:, None, :]
    if pitch is not None:
        x = jnp.concatenate([x, pitch], axis=-1)
    if lda is None:
        return compute_deltas(x, frame_lengths)
    return apply_transform(splice_frames(x, frame_lengths, 3, 3), lda)


@jax.jit
def _phone_confidence(ff, state_path, graph, W, gconsts):
    """Per-frame confidence margin: aligned pdf log-like minus the best
    pdf log-like (reference ``PhoneConfidenceFunction``,
    ``alignment/multiprocessing.py:1353``). Always <= 0."""
    ll = gmm_loglikes(ff, W, gconsts)  # (B, T, P)
    P = gconsts.shape[0]
    frame_pdf = jnp.take_along_axis(graph.state_pdf, state_path, axis=1)  # (B, T)
    onehot = jax.nn.one_hot(frame_pdf, P, dtype=ll.dtype)  # (B, T, P)
    selected = jnp.einsum(
        "btp,btp->bt", ll, onehot, precision=jax.lax.Precision.HIGHEST
    )
    return selected - ll.max(axis=-1)


def _pallas_emission_eligible(num_pdfs: int, num_gauss: int) -> bool:
    """The Pallas likelihood-on-demand kernel beats the all-pdf one-hot path
    once the model is big enough that evaluating every pdf wastes MXU work
    (measured: 2.5x at P=8000/G=32, 1.4x at P=2000/G=16, parity below).
    Mosaic only compiles for real TPU backends.

    Upper bound: the kernel's VMEM scratch is (S_TILE=128, G, D2p~128)
    float32 per tile, so the padded per-pdf Gaussian count must stay small
    enough to fit (~8 MB). Mixed-up training models can concentrate
    thousands of Gaussians in one pdf (padding every row to that G), which
    would otherwise demand hundreds of MB of VMEM."""
    import jax as _jax

    if _jax.default_backend() in ("cpu", "gpu"):
        return False
    if num_gauss * 128 * 128 * 4 > 8 * 1024 * 1024:  # scratch bytes per tile
        return False
    return num_pdfs * num_gauss >= 16384


@partial(jax.jit, static_argnames=("acoustic_scale", "band_limits", "use_pallas"))
def _emit_and_align(
    ff, frame_lengths, graph, W, gconsts, acoustic_scale,
    band_limits=None, w_rows=None, use_pallas=True,
):
    """Graph-state emissions -> exact Viterbi (band-sparse DP when the
    graph's arc offsets fit a band, dense max-plus otherwise). One device
    program; only the state paths leave the device. The band is densified
    on device from the sparse arc lists (the dense (B, S, D) band never
    crosses the host->device link).

    Emissions: with ``w_rows`` (large models on TPU) the Pallas
    likelihood-on-demand kernel DMAs only each graph state's GMM parameters;
    otherwise all-pdf GMM loglikes -> exact one-hot selection."""
    from montreal_forced_aligner_tpu.ops.viterbi import (
        densify_band,
        viterbi_align_batch_band,
    )

    if w_rows is not None:
        from montreal_forced_aligner_tpu.ops.pallas_emission import (
            pallas_state_loglikes,
        )

        emit = pallas_state_loglikes(ff, graph.state_pdf, w_rows)
    else:
        from montreal_forced_aligner_tpu.ops.gmm_loglikes import (
            select_state_emissions,
        )

        ll = gmm_loglikes(ff, W, gconsts)  # (B, T, P)
        emit = select_state_emissions(ll, graph.state_pdf)
    if band_limits is not None:
        lb, ub = band_limits
        band = densify_band(graph, lb, ub)
        return viterbi_align_batch_band(
            emit, frame_lengths, band, graph.start, graph.final, lb, ub,
            acoustic_scale=acoustic_scale, use_pallas=use_pallas,
        )
    return viterbi_align_batch(emit, frame_lengths, graph, acoustic_scale=acoustic_scale)


@dataclass
class AlignerConfig:
    """Alignment parameters (defaults from reference
    ``alignment/mixins.py:68-95``; beam/retry_beam are subsumed by the exact
    dense DP and kept only for CLI compatibility)."""

    acoustic_scale: float = 0.1
    transition_scale: float = 1.0
    self_loop_scale: float = 0.1
    boost_silence: float = 1.0
    beam: int = 10
    retry_beam: int = 40
    batch_size: int = 16
    frame_bucket_multiple: int = 256
    fmllr_min_count: float = 100.0
    compute_confidence: bool = False
    # reference --single_speaker: disables speaker adaptation (equivalent
    # to uses_speaker_adaptation=False) — SAT models align single-pass with
    # the speaker-independent final.alimdl (command_line/utils.py:127;
    # job-splitting concerns don't apply to the batched pipeline)
    uses_speaker_adaptation: bool = True
    devices: Optional[tuple] = None  # default: all local devices
    # SPMD mode: shard every batch over a device mesh instead of
    # round-robin local placement. None = auto: on for single-process
    # multi-chip TPU hosts (matching TrainableAligner). Multi-process
    # (pod) alignment instead shards the corpus per host at the CLI and
    # keeps each host on its local devices — alignment needs no
    # cross-host reduction, so per-host sharding avoids lockstep.
    distributed: Optional[bool] = None
    # language-specific pre-tokenization (reference --language; english is
    # rule-based, ja/zh/ko/th gate on their segmentation packages)
    language: Optional[str] = None
    # phase-A host->device payload: "waves" (int16 audio, device MFCC),
    # "features" (host MFCC, f16 over the link — 12x fewer bytes), or
    # "auto" (probe the link; features below
    # MFA_TPU_TRANSFER_THRESHOLD_MBPS). See resolve_transfer_mode.
    transfer_mode: str = "auto"
    num_loader_threads: int = 8  # threaded audio decode (native FLAC)
    # host graph compilation fans out over a process pool (0 = in-process);
    # engaged only for corpora with >= 4 utterances per worker, and not with
    # G2P (OOV pronunciations mutate the lexicon mid-run)
    num_graph_workers: int = 0


# The standard MFA silence inventories by size. Phone NAMES are genuinely
# absent from old archives (only the topology's integer ids and the meta's
# non-silence base names survive), so the names come from MFA's fixed
# specials (reference ``dictionary/mixins.py:91-194``: silence_phone "sil",
# oov_phone "spn", optional short pause "sp"); the COUNT, however, is
# derived from the topology arithmetic below, never guessed.
_SILENCE_INVENTORIES = {1: ["sil"], 2: ["sil", "spn"], 3: ["sil", "sp", "spn"]}


def reconstruct_phone_table(meta: Dict, topo) -> Dict[str, int]:
    """Rebuild ``phones.txt`` for old model archives that omit it.

    Layout (reference ``dictionary/multispeaker.py:1966`` numbering scheme):
    <eps>=0, then silence phones (base + positional variants when position
    dependent), then each non-silence phone's positional variants in sorted
    order.

    The silence inventory size ``s`` is solved from the topology's phone
    count: position-dependent archives satisfy ``total = 5*s + 4*n`` (each
    silence base keeps its bare form plus four positional variants; each
    non-silence base has four positional variants only) and
    position-independent ones ``total = s + n``. A layout that fits neither
    raises instead of silently mis-mapping phone ids.
    """
    phones = sorted(meta.get("phones", []))
    total = len(topo.phones)
    n = len(phones)
    table = {"<eps>": 0}

    s_pd = total - 4 * n
    if s_pd > 0 and s_pd % 5 == 0 and (s_pd // 5) in _SILENCE_INVENTORIES:
        sil_bases = _SILENCE_INVENTORIES[s_pd // 5]
        idx = 1
        for base in sorted(sil_bases):
            table[base] = idx
            idx += 1
            for pos in POSITIONS:
                table[base + pos] = idx
                idx += 1
        for base in phones:
            for pos in POSITIONS:
                table[base + pos] = idx
                idx += 1
    elif (total - n) in _SILENCE_INVENTORIES:
        idx = 1
        for base in sorted(_SILENCE_INVENTORIES[total - n]):
            table[base] = idx
            idx += 1
        for base in phones:
            table[base] = idx
            idx += 1
    else:
        raise ValueError(
            "cannot reconstruct the phone table for this archive: topology "
            f"has {total} phones but meta lists {n} non-silence bases — "
            "neither the position-dependent (5*s + 4*n) nor the "
            "position-independent (s + n) layout fits a standard silence "
            "inventory (1-3 phones). Re-export the model with phones.txt."
        )
    if len(table) - 1 != total:
        raise ValueError(
            f"reconstructed phone table has {len(table) - 1} phones but the "
            f"topology defines {total}; archive layout is non-standard — "
            "re-export the model with phones.txt"
        )
    return table


class PretrainedAligner:
    """Aligns a corpus with a pretrained acoustic model + pronunciation
    dictionary (reference entry point: ``mfa align``,
    ``command_line/align.py:164``)."""

    def __init__(
        self,
        acoustic_model_path,
        dictionary_path,
        config: Optional[AlignerConfig] = None,
        g2p_model_path=None,
        rules_path=None,
    ):
        self.config = config or AlignerConfig()
        self.model_path = acoustic_model_path
        self.dictionary_path = dictionary_path
        self.model = AcousticModel.load(acoustic_model_path)
        if not self.model.phone_table:
            self.model.phone_table = reconstruct_phone_table(
                self.model.meta, self.model.transition_model.topo
            )
        from montreal_forced_aligner_tpu.dictionary.lexicon import (
            load_dictionary_argument,
        )

        self.lexicons, self.speaker_dictionary_map, default_key = (
            load_dictionary_argument(
                dictionary_path, phone_table=self.model.phone_table
            )
        )
        self.default_dictionary_key = default_key or next(iter(self.lexicons))
        self.lexicon = self.lexicons[self.default_dictionary_key]
        # NOTE: dictionary-vs-model phone validation happens inside
        # Lexicon.prune_to_phone_inventory (reference AcousticModel.validate
        # semantics, models.py:790): a fully mismatched dictionary raises
        # PhoneMismatchError there; partial mismatches prune with a warning.
        if rules_path is not None:
            from montreal_forced_aligner_tpu.dictionary.rules import (
                PhonologicalRule,
                apply_rules_to_lexicon,
            )

            rules = PhonologicalRule.load_rules(rules_path)
            apply_rules_to_lexicon(self.lexicon, rules)
        self.g2p = None
        if g2p_model_path is not None:
            from montreal_forced_aligner_tpu.g2p.generator import G2PGenerator
            from montreal_forced_aligner_tpu.g2p.trainer import G2PModel

            self.g2p = G2PGenerator(G2PModel.load(g2p_model_path))
        all_words = set()
        for lex in self.lexicons.values():
            all_words |= set(lex.words)
        from montreal_forced_aligner_tpu.tokenization.languages import (
            compose_tokenizer,
            get_language_tokenizer,
        )

        self.tokenizer = compose_tokenizer(
            SimpleTokenizer(word_set=all_words),
            get_language_tokenizer(self.config.language, word_set=all_words),
        )
        self.compilers = {
            key: AlignmentGraphCompiler(
                self.model.transition_model,
                self.model.tree,
                lex,
                transition_scale=self.config.transition_scale,
                self_loop_scale=self.config.self_loop_scale,
            )
            for key, lex in self.lexicons.items()
        }
        self.compiler = self.compilers[self.default_dictionary_key]
        feat_meta = self.model.meta.get("features", {})
        # honor the archive's stored feature configuration (reference
        # models override defaults with their meta, ``pretrained.py:76-79``,
        # ``models.py:494-586``): DSP parameters baked into the model at
        # training time must drive feature extraction here too
        defaults = MfccConfig()
        self.mfcc_config = MfccConfig(
            sample_rate=int(
                feat_meta.get("sample_frequency", defaults.sample_rate)
            ),
            frame_shift_ms=float(feat_meta.get("frame_shift", 10)),
            frame_length_ms=float(
                feat_meta.get("frame_length", defaults.frame_length_ms)
            ),
            num_coefficients=int(
                feat_meta.get(
                    "num_coefficients", defaults.num_coefficients
                )
            ),
            num_mel_bins=int(
                feat_meta.get("num_mel_bins", defaults.num_mel_bins)
            ),
            low_frequency=float(
                feat_meta.get("low_frequency", defaults.low_frequency)
            ),
            high_frequency=float(
                feat_meta.get("high_frequency", defaults.high_frequency)
            ),
            snip_edges=bool(
                feat_meta.get("snip_edges", defaults.snip_edges)
            ),
            use_energy=bool(feat_meta.get("use_energy", False)),
        )
        # own archives write "pitch"; reference archives write "use_pitch"
        self.use_pitch = bool(
            feat_meta.get("pitch", feat_meta.get("use_pitch", False))
        )
        self.frame_shift = self.mfcc_config.frame_shift_ms / 1000.0
        # data parallelism: batches are placed round-robin over local
        # devices (single-host default — alignment is embarrassingly
        # parallel), or sharded over a global mesh in distributed mode
        # (multi-host: one GSPMD program, collectives over ICI/DCN)
        import jax as _jax

        distributed = self.config.distributed
        if distributed is None:
            # auto: engage the mesh on single-process multi-chip TPU hosts
            # (multi-process runs use per-host corpus sharding instead)
            distributed = (
                _jax.process_count() == 1
                and _jax.default_backend() == "tpu"
                and len(_jax.devices()) > 1
            )
        if distributed and _jax.process_count() > 1:
            # multi-host alignment shards the corpus per host instead (see
            # cli.align: each host aligns its own speakers on local devices
            # — embarrassingly parallel, no cross-host sync needed); the
            # mesh path requires single-controller lockstep
            _logger.warning(
                "distributed alignment across processes uses per-host corpus "
                "sharding; running this host's shard on local devices"
            )
            distributed = False
        self.mesh = None
        if distributed and len(_jax.devices()) > 1:
            from montreal_forced_aligner_tpu.parallel.mesh import get_mesh

            self.mesh = get_mesh()
        self.devices = (
            list(self.config.devices)
            if self.config.devices
            else _jax.local_devices()
        )
        if self.mesh is not None:
            self.devices = [None]  # placement flows through _put_b/_put_rep
        self._device_gmm = self._prepare_gmm()
        self._gmm_per_device = {}
        self._graph_pool_obj = None
        self._shard_emit_fns = {}

    def _graph_pool(self, num_items: int):
        """Lazily created persistent graph-compile pool, or None when the
        fan-out is disabled, G2P mutates the lexicon mid-run, or the corpus
        is too small to amortize worker startup."""
        n = self.config.num_graph_workers
        if n <= 0 or self.g2p is not None or num_items < 4 * n:
            return None
        if self._graph_pool_obj is None:
            from montreal_forced_aligner_tpu.graph.parallel import (
                ParallelGraphCompiler,
            )

            self._graph_pool_obj = ParallelGraphCompiler(self.compilers, n)
        return self._graph_pool_obj

    def _sharded_emit_and_align(self, band_limits, with_w_rows):
        """shard_map-wrapped emit+align for mesh mode: each shard runs the
        full single-device program — including the Pallas kernels, which are
        not GSPMD-partitionable but compose fine per shard (the documented
        pallas-under-multi-device pattern). Built once per (band bucket,
        emission path) and cached."""
        key = (band_limits, with_w_rows)
        fn = self._shard_emit_fns.get(key)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec

        from montreal_forced_aligner_tpu.parallel.data_parallel import (
            _NO_REP_CHECK as no_rep,
            shard_map as _shard_map,
        )

        data = PartitionSpec("data")
        rep = PartitionSpec()
        gspecs = BatchedGraph(*([data] * len(BatchedGraph._fields)))

        def local(ff, fl, graph, W, gc, *w):
            return _emit_and_align(
                ff, fl, graph, W, gc, self.config.acoustic_scale,
                band_limits=band_limits,
                w_rows=w[0] if w else None,
                use_pallas=True,
            )

        in_specs = (data, data, gspecs, rep, rep) + ((rep,) if with_w_rows else ())
        fn = jax.jit(
            _shard_map(
                local, mesh=self.mesh, in_specs=in_specs,
                out_specs=(data, data), **no_rep,
            )
        )
        self._shard_emit_fns[key] = fn
        return fn

    def _run_emit_and_align(self, ff, flens_dev, graph, W_d, gc_d, w_rows_d,
                            band_limits):
        """Dispatch emit+align on the right execution path (mesh shard_map
        vs single-device jit)."""
        if self.mesh is not None:
            fn = self._sharded_emit_and_align(band_limits, w_rows_d is not None)
            args = (ff, flens_dev, graph, W_d, gc_d)
            if w_rows_d is not None:
                args = args + (w_rows_d,)
            return fn(*args)
        return _emit_and_align(
            ff, flens_dev, graph, W_d, gc_d, self.config.acoustic_scale,
            band_limits=band_limits, w_rows=w_rows_d, use_pallas=True,
        )

    def _put_b(self, x, device=None):
        """Batch-leading placement: mesh-sharded in distributed mode, else
        on the given local device."""
        import jax as _jax

        if self.mesh is not None:
            from montreal_forced_aligner_tpu.training.base import put_batch

            return put_batch(x, self.mesh)
        return _jax.device_put(x, device)

    def _put_rep(self, x, device=None):
        import jax as _jax

        if self.mesh is not None:
            from montreal_forced_aligner_tpu.training.base import put_replicated

            return put_replicated(x, self.mesh)
        return _jax.device_put(x, device)

    def _row_multiple(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod(self.mesh.devices.shape))

    def _gmm_on(self, device):
        key = "mesh" if self.mesh is not None else device
        if key not in self._gmm_per_device:
            W, gconsts, w_rows = self._device_gmm
            self._gmm_per_device[key] = (
                self._put_rep(W, device),
                self._put_rep(gconsts, device),
                None if w_rows is None else self._put_rep(w_rows, device),
            )
        return self._gmm_per_device[key]

    def _prepare_gmm(self):
        gmm = self.model.gmm
        gconsts = gmm.gconsts.copy()
        if self.config.boost_silence != 1.0:
            sil_pdfs = self._silence_pdfs()
            gconsts[sil_pdfs] += math.log(self.config.boost_silence)
        W, _ = gmm.flatten_for_device()
        w_rows = None
        P, G, _D = gmm.means_invvars.shape
        if _pallas_emission_eligible(P, G):
            from montreal_forced_aligner_tpu.ops.pallas_emission import pack_rows

            w_rows = jnp.asarray(
                pack_rows(gmm.means_invvars, gmm.inv_vars, gconsts)
            )
        return (jnp.asarray(W), jnp.asarray(gconsts), w_rows)

    def _silence_pdfs(self) -> np.ndarray:
        """pdf-ids of silence-family phones (for ``gmm-boost-silence``
        semantics, reference ``alignment/mixins.py:193-203``)."""
        sil_names = {
            n
            for n in self.model.phone_table
            if n.split("_")[0] in ("sil", "sp", "spn")
        }
        pdfs = set()
        tree = self.model.tree
        topo = self.model.transition_model.topo
        for name in sil_names:
            pid = self.model.phone_table[name]
            if topo.phone2idx[pid] < 0:
                continue
            for cls in range(topo.num_pdf_classes(pid)):
                for pdf in tree.pdfs_for_phone_pdf_class(pid, cls):
                    pdfs.add(pdf)
        return np.array(sorted(pdfs), dtype=np.int32)

    def _ali_params_on(self):
        """Device-resident speaker-independent (final.alimdl) tensors for
        alignment passes, cached across ``align_corpus`` calls. Silence
        boosting applies here exactly as to the final model (the reference
        runs ``gmm-boost-silence`` on whichever model aligns,
        ``alignment/mixins.py:193-203``)."""
        if getattr(self, "_ali_device_params", None) is not None:
            return self._ali_device_params
        _ali_tm, ali_gmm = self.model.alignment_model
        gc1_host = ali_gmm.gconsts.copy()
        if self.config.boost_silence != 1.0:
            gc1_host[self._silence_pdfs()] += math.log(
                self.config.boost_silence
            )
        W1_host, _ = ali_gmm.flatten_for_device()
        W1 = self._put_rep(W1_host)
        gc1 = self._put_rep(gc1_host)
        P1, G1, _D1 = ali_gmm.means_invvars.shape
        w_rows1 = None
        if _pallas_emission_eligible(P1, G1):
            from montreal_forced_aligner_tpu.ops.pallas_emission import pack_rows

            w_rows1 = self._put_rep(
                pack_rows(ali_gmm.means_invvars, ali_gmm.inv_vars, gc1_host)
            )
        self._ali_device_params = (W1, gc1, w_rows1)
        return self._ali_device_params

    def _fmllr_params_on(self):
        """Device-resident two-pass model constants, cached across
        ``align_corpus`` calls (the SI alignment model + fMLLR parameter
        tensors are ~200 MB at SAT scale; re-shipping them per call costs
        seconds on remote-attached TPUs)."""
        if getattr(self, "_fmllr_device_params", None) is not None:
            return self._fmllr_device_params
        W1, gc1, w_rows1 = self._ali_params_on()
        gmm = self.model.gmm
        self._fmllr_device_params = (
            W1,
            gc1,
            w_rows1,
            self._put_rep(gmm.get_means()),
            self._put_rep(gmm.inv_vars),
            self._put_rep(gmm.gconsts),
            self._put_rep(gmm.means_invvars),
        )
        return self._fmllr_device_params

    def _fmllr_second_pass_feats(
        self, prepared, corpus, speaker_index, num_speakers
    ):
        """First-pass alignment with the speaker-independent model, then
        per-speaker fMLLR estimation and feature adaptation (reference
        two-pass align, ``alignment/base.py:491-558``; estimation spec
        ``corpus/features.py:422-548`` with silence_weight=0)."""
        from montreal_forced_aligner_tpu.ops.feats import (
            apply_per_speaker_transform,
        )
        from montreal_forced_aligner_tpu.ops.transforms import (
            accumulate_fmllr_stats,
            estimate_speaker_fmllr,
        )

        W1, gc1, w_rows1, means, iv, gc, miv = self._fmllr_params_on()
        sil_pdfs = self._silence_pdfs()
        # (P,) silence mask: the non-silence frame weight becomes a device
        # gather, so pass 1 never fetches a state path to the host
        # (d2h runs at ~10-30 MB/s on remote-attached TPUs)
        sil_mask = self._put_rep(
            silence_pdf_mask(sil_pdfs, self.model.gmm.num_pdfs)
        )

        from montreal_forced_aligner_tpu.training.base import (
            _frame_pdf_device,
            fetch_all,
        )

        import time as _time

        _t0 = _time.time()
        # device-resident (K, G, beta) running sums, one per device (batches
        # are placed round-robin; cross-device adds are not allowed). The
        # whole pass — alignment, frame-pdf gather, silence weighting,
        # statistics — is dispatched without a single host round trip;
        # only the final (num_speakers, ...) K/G/beta blocks are fetched.
        stats_per_dev = {}
        spk_indices = []
        for batch, flens, garrs, graph, ff, flens_dev in prepared:
            state_path, _sc = self._run_emit_and_align(
                ff, flens_dev, graph, W1, gc1, w_rows1,
                garrs.get("_band_limits"),
            )
            frame_pdf = _frame_pdf_device(graph.state_pdf, state_path)
            weight = _nonsilence_weight(frame_pdf, sil_mask)
            spk_idx = np.zeros(len(flens), np.int32)
            spk_idx[: len(batch)] = [
                speaker_index[corpus.utterances[i].speaker] for i in batch
            ]
            spk_dev = self._put_b(spk_idx)
            spk_indices.append(spk_dev)
            out = accumulate_fmllr_stats(
                ff,
                flens_dev,
                frame_pdf,
                spk_dev,
                weight,
                means,
                iv,
                gc,
                miv,
                num_speakers,
            )
            dev = "mesh" if self.mesh is not None else list(ff.devices())[0]
            prev = stats_per_dev.get(dev)
            stats_per_dev[dev] = (
                out
                if prev is None
                else tuple(a + b_ for a, b_ in zip(prev, out))
            )
        _logger.debug(
            "fmllr pass-1 align + stats dispatch took %.3fs",
            _time.time() - _t0,
        )
        _t0 = _time.time()
        # float64 for the host-side row solves (device sums are float32)
        per_dev = fetch_all(list(stats_per_dev.values()))
        K = sum(s[0].astype(np.float64) for s in per_dev)
        G = sum(s[1].astype(np.float64) for s in per_dev)
        beta = sum(s[2].astype(np.float64) for s in per_dev)
        _logger.debug(
            "fmllr stats fetch took %.3fs", _time.time() - _t0
        )
        _t0 = _time.time()
        transforms = estimate_speaker_fmllr(
            K, G, beta, min_count=self.config.fmllr_min_count
        )
        _logger.debug(
            "fmllr host solve took %.3fs", _time.time() - _t0
        )
        trans_dev = self._put_rep(np.asarray(transforms, np.float32))
        out_prepared = []
        for (batch, flens, garrs, graph, ff, flens_dev), spk_dev in zip(
            prepared, spk_indices
        ):
            adapted = apply_per_speaker_transform(ff, spk_dev, trans_dev)
            out_prepared.append(
                (batch, flens, garrs, graph, adapted, flens_dev)
            )
        return out_prepared

    def _add_g2p_pronunciations(self, tokens) -> None:
        """Generate pronunciations for OOV tokens via G2P (reference online
        align, ``online/alignment.py:44-75``)."""
        from montreal_forced_aligner_tpu.dictionary.lexicon import Pronunciation

        known_phones = set()
        for name in self.model.phone_table:
            base = name
            for pos in POSITIONS:
                if base.endswith(pos):
                    base = base[: -len(pos)]
            known_phones.add(base)
        for tok in tokens:
            if tok in self.lexicon.words:
                continue
            for phones, _score in self.g2p.generate(tok, num_pronunciations=1):
                if all(p in known_phones for p in phones):
                    self.lexicon.add_pronunciation(
                        tok, Pronunciation(phones=tuple(phones))
                    )

    # -- pipeline ------------------------------------------------------------
    def align_corpus(
        self, corpus: Corpus, callback=None, profile_dir=None
    ) -> Dict[int, UtteranceAlignment]:
        """Align every utterance; returns {utterance_id: UtteranceAlignment}.

        Two device phases per batch, with features resident on device in
        between (host round-trips are only waves in and state paths out):
        (A) MFCC + per-utterance CMVN sums; (B) mean-normalize -> deltas/LDA
        -> all-pdf likelihoods -> one-hot state selection -> dense Viterbi.

        ``profile_dir`` enables a JAX profiler trace over the run (the
        reference only had timing logs, ``alignment/mixins.py:243``).
        """
        import contextlib
        import time as _time

        import jax as _jax_prof

        trace_cm = (
            _jax_prof.profiler.trace(str(profile_dir))
            if profile_dir
            else contextlib.nullcontext()
        )
        with trace_cm:
            return self._align_corpus_impl(corpus, callback)

    def _align_corpus_impl(
        self, corpus: Corpus, callback=None
    ) -> Dict[int, UtteranceAlignment]:
        import time as _time

        _phase_t0 = _time.time()
        cfg = self.config
        # 1. load audio (graph compilation happens after phase A dispatch so
        # host FST expansion overlaps with device MFCC compute)
        speaker_index = corpus.speaker_index
        num_speakers = len(corpus.speakers)
        waves: List[np.ndarray] = corpus.load_audio_parallel(
            self.mfcc_config.sample_rate, num_workers=cfg.num_loader_threads
        )
        for utt, w in zip(corpus.utterances, waves):
            utt.num_samples = len(w)

        # very long utterances (>~10 min) route through the exact
        # checkpointed chunked kernel instead of the batch path — batching
        # one would pad every row in its batch to T~72k frames and the
        # O(T*S) backpointers/emissions stop fitting HBM (the reference's
        # answer is VAD segmentation, vad/segmenter.py:56; this keeps
        # single-pass exactness at any length). Single-utterance CMVN
        # applies on this path (the online-alignment semantics).
        from montreal_forced_aligner_tpu.online.alignment import (
            LONG_UTTERANCE_FRAMES,
        )

        long_results: Dict[int, UtteranceAlignment] = {}
        long_set = set()
        for i, w in enumerate(waves):
            if self.mfcc_config.num_frames(len(w)) > LONG_UTTERANCE_FRAMES:
                long_set.add(i)
        if long_set:
            from montreal_forced_aligner_tpu.online.alignment import (
                align_utterance_online,
            )

            for i in sorted(long_set):
                utt = corpus.utterances[i]
                utt.num_frames = self.mfcc_config.num_frames(len(waves[i]))
                aln = align_utterance_online(
                    self, waves[i], utt.text, utterance_id=i
                )
                if utt.begin:  # segment-relative times -> file times
                    for iv in list(aln.words) + list(aln.phones):
                        iv.begin += utt.begin
                        iv.end += utt.begin
                long_results[i] = aln
                if callback:
                    callback(1)
            _logger.info(
                "%d long utterance(s) aligned through the chunked exact "
                "kernel", len(long_set),
            )
            if len(long_set) == len(waves):
                return long_results

        order = np.argsort([len(w) for w in waves], kind="stable")
        order = [i for i in order if i not in long_set]
        batches = [
            list(order[i : i + cfg.batch_size])
            for i in range(0, len(order), cfg.batch_size)
        ]

        # phase A: MFCC + per-speaker CMVN stats, reduced on device. All
        # batches are dispatched before any result is fetched so host
        # padding, tunnel transfers, graph compilation and device compute
        # all overlap; only one tiny stats array per device comes back.
        D = self.mfcc_config.num_coefficients
        stashes = []
        dev_totals = {}  # device -> per-speaker feature sums (S, D) on device
        spk_count = np.zeros(num_speakers, dtype=np.float64)
        import jax as _jax

        # adaptive transfer mode: ship f16 features instead of waves when
        # the link probe reads degraded (12x fewer bytes over the tunnel)
        transfer_mode = resolve_transfer_mode(
            getattr(cfg, "transfer_mode", "auto")
        )
        self.last_transfer_mode = transfer_mode
        from montreal_forced_aligner_tpu.ops.mfcc import mfcc_host_batch

        row_mult = self._row_multiple()
        for bi, batch in enumerate(batches):
            dev = self.devices[bi % len(self.devices)]
            wave_list = [waves[i] for i in batch]
            n_real = len(wave_list)
            b_pad = _round_up(n_real, row_mult)
            # pad rows (duplicate wave, frame_length 0) so each batch
            # divides evenly over the mesh's data axis
            wave_list = wave_list + [wave_list[-1]] * (b_pad - n_real)
            L = _round_up(max(len(w) for w in wave_list), 16000)
            padded, lens = pad_waves_for_mfcc(wave_list, self.mfcc_config, L)
            flens = np.array(
                [self.mfcc_config.num_frames(int(n)) for n in lens], np.int32
            )
            flens[n_real:] = 0
            max_frames = self.mfcc_config.num_frames(L)
            spk_idx = np.zeros(b_pad, np.int32)
            spk_idx[:n_real] = [
                speaker_index[corpus.utterances[i].speaker] for i in batch
            ]
            # flens/spk ship ONCE; the device handles are reused by every
            # later phase (each extra device_put is a full round trip
            # under tunnel congestion — measured 0.1-0.5 s apiece while
            # the h2d probe reads collapsed)
            flens_dev = self._put_b(flens, dev)
            spk_dev = self._put_b(spk_idx, dev)
            if transfer_mode == "features":
                feats16 = mfcc_host_batch(
                    padded, self.mfcc_config, max_frames
                ).astype(np.float16)
                feats_dev, bsum = _feats_and_spk_stats(
                    self._put_b(feats16, dev),
                    flens_dev,
                    spk_dev,
                    num_speakers,
                )
            else:
                feats_dev, bsum = _mfcc_and_spk_stats(
                    self._put_b(padded, dev),
                    flens_dev,
                    spk_dev,
                    self.mfcc_config,
                    max_frames,
                    num_speakers,
                )
            dev_totals[dev] = (
                dev_totals[dev] + bsum if dev in dev_totals else bsum
            )
            # frame counts accumulate on host in float64 (flens is already
            # host-side; float32 counts saturate past ~2^24 frames/speaker)
            np.add.at(spk_count, spk_idx, flens.astype(np.float64))
            pitch = None
            if self.use_pitch:
                from montreal_forced_aligner_tpu.ops.pitch import (
                    pitch_for_mfcc_frames,
                )

                wbuf = np.zeros(
                    (len(wave_list), max(len(w) for w in wave_list)), np.float32
                )
                for r, w in enumerate(wave_list):
                    wbuf[r, : len(w)] = w
                pitch = pitch_for_mfcc_frames(
                    wbuf,
                    np.array([len(w) for w in wave_list], np.int32),
                    flens,
                    max_frames,
                )
            stashes.append(
                (batch, feats_dev, flens, pitch, flens_dev, spk_dev)
            )
            for row, i in enumerate(batch):
                corpus.utterances[i].num_frames = int(flens[row])

        # host graph compilation overlaps with the in-flight device work,
        # optionally fanned out over a worker pool (the expansion is the one
        # host stage that scales with corpus size; one host feeding several
        # chips bottlenecks on it)
        items = []
        item_utts = []
        for i, utt in enumerate(corpus.utterances):
            if i in long_set:
                # already aligned through the chunked path (which compiled
                # its own graph); the most expensive graphs in the corpus
                # must not compile a second unused copy
                continue
            tokens = self.tokenizer.tokenize(utt.text)
            utt.normalized_tokens = tokens
            if self.g2p is not None:
                self._add_g2p_pronunciations(tokens)
            key = self.speaker_dictionary_map.get(
                utt.speaker, self.default_dictionary_key
            )
            items.append((key, tokens))
            item_utts.append(i)
        from montreal_forced_aligner_tpu.graph.native_compile import (
            compile_items_native,
        )

        compiled: Optional[List[CompiledGraph]] = compile_items_native(
            self.compilers, items
        )
        if compiled is None:
            pool = self._graph_pool(len(items))
            if pool is not None:
                compiled = pool.compile_all(items)
            else:
                compiled = [self.compilers[k].compile(t) for k, t in items]
        graphs: List[Optional[CompiledGraph]] = [None] * len(
            corpus.utterances
        )
        for i, g in zip(item_utts, compiled):
            graphs[i] = g

        # single-device runs keep the speaker means ON DEVICE (sum/count +
        # a device gather per batch): fetching the sums costs a full d2h
        # round trip — the tunnel's slow direction — and serializes phase
        # A against phase B. Multi-device round-robin and mesh runs keep
        # the host reduction (sums live on several devices).
        spk_mean = spk_mean_dev = None
        if self.mesh is None and len(dev_totals) == 1:
            (bsum,) = dev_totals.values()
            spk_mean_dev = (
                bsum
                / jnp.maximum(
                    jnp.asarray(spk_count.astype(np.float32)), 1.0
                )[:, None]
            ).astype(jnp.float32)
        else:
            spk_sum = np.zeros((num_speakers, D), dtype=np.float64)
            for bsum in dev_totals.values():
                spk_sum += np.asarray(bsum)
            spk_mean = (
                spk_sum / np.maximum(spk_count, 1.0)[:, None]
            ).astype(np.float32)
        _logger.debug(
            "align phase A (audio+MFCC+graphs) took %.3fs", _time.time() - _phase_t0
        )
        _phase_t0 = _time.time()

        # phase B: normalize -> final feats -> emission -> Viterbi -> CTM.
        # SAT models run two passes: first with the speaker-independent
        # alignment model, then per-speaker fMLLR estimation, then the final
        # pass on adapted features (reference ``alignment/base.py:491-558``).
        results: Dict[int, UtteranceAlignment] = {}
        phone_names = self.model.phone_names
        lda = (
            jnp.asarray(self.model.lda_mat)
            if (self.model.uses_lda and self.model.lda_mat is not None)
            else None
        )
        prepared = []
        from montreal_forced_aligner_tpu.ops.viterbi import band_limits_from_arcs

        for batch, feats_dev, flens, pitch, flens_dev, spk_dev in stashes:
            dev = (
                None if self.mesh is not None
                else list(feats_dev.devices())[0]
            )
            glist = [graphs[i] for i in batch]
            glist = glist + [glist[0]] * (len(flens) - len(glist))
            garrs = batch_graphs(glist)
            graph = ship_graph_to_device(garrs, device=dev, mesh=self.mesh)
            garrs["_band_limits"] = band_limits_from_arcs(garrs)
            if spk_mean_dev is not None:
                # spk_dev already holds the per-row speaker ids (phase A)
                mean_rows = spk_mean_dev[spk_dev]
            else:
                spk_rows = np.zeros(len(flens), np.int64)
                spk_rows[: len(batch)] = [
                    speaker_index[corpus.utterances[i].speaker]
                    for i in batch
                ]
                mean_rows = self._put_b(
                    spk_mean[spk_rows].astype(np.float32), dev
                )
            ff = _final_feats(
                feats_dev,
                flens_dev,
                mean_rows,
                None if lda is None else self._put_rep(lda, dev),
                None if pitch is None else self._put_b(pitch, dev),
            )
            prepared.append((batch, flens, garrs, graph, ff, flens_dev))

        _logger.debug(
            "phase B prep (graphs shipped + final feats) took %.3fs",
            _time.time() - _phase_t0,
        )
        _sub_t0 = _time.time()
        two_pass = (
            self.model.uses_fmllr
            and self.model.alignment_model is not None
            and cfg.uses_speaker_adaptation
        )
        if two_pass:
            prepared = self._fmllr_second_pass_feats(
                prepared, corpus, speaker_index, num_speakers
            )

        if two_pass:
            _logger.debug(
                "fmllr two-pass total took %.3fs", _time.time() - _sub_t0
            )
        _sub_t0 = _time.time()
        # --single_speaker SI mode: a SAT model without speaker adaptation
        # aligns with the speaker-independent final.alimdl, matching the
        # reference's first-pass-only behavior (alignment/base.py:491-558
        # with uses_speaker_adaptation False)
        si_mode = (
            not cfg.uses_speaker_adaptation
            and self.model.uses_fmllr
            and self.model.alignment_model is not None
        )
        # SI mode ships only the alignment-model triplet (not the final
        # model's fMLLR estimation tensors, which it never uses)
        si_params = self._ali_params_on() if si_mode else None
        pending = []
        for batch, flens, garrs, graph, ff, flens_dev in prepared:
            dev = (
                None if self.mesh is not None else list(ff.devices())[0]
            )
            if si_params is not None:
                W_d, gc_d, w_rows_d = si_params
            else:
                W_d, gc_d, w_rows_d = self._gmm_on(dev)
            band_limits = garrs.pop("_band_limits", None)
            state_path, scores = self._run_emit_and_align(
                ff, flens_dev, graph, W_d, gc_d, w_rows_d,
                band_limits,
            )
            conf = None
            if cfg.compute_confidence:
                conf = _phone_confidence(ff, state_path, graph, W_d, gc_d)
            # halve the device->host path bytes when state indices fit
            # int16 (alignment graphs: S is a few hundred) — the fetch is
            # the one per-batch d2h transfer and the tunnel's d2h link is
            # the slow direction
            if graph.state_pdf.shape[1] <= 32767:
                state_path = state_path.astype(jnp.int16)
            pending.append((batch, flens, garrs, state_path, scores, conf))

        # start every device->host copy before materializing any: each
        # blocking fetch is a full round trip on remote-attached TPUs
        from montreal_forced_aligner_tpu.training.base import start_host_copies

        # single-device runs go further: pad to a common T and concatenate
        # ON DEVICE so the whole corpus's paths come back in ONE d2h round
        # trip — per-fetch latency (tens to hundreds of ms under tunnel
        # weather) otherwise multiplies by the batch count
        fetched = None
        if pending and self.mesh is None and len(self.devices) == 1:
            Tmax = max(sp.shape[1] for _b, _fl, _g, sp, _sc, _cf in pending)

            def _padT(x):
                return jnp.pad(x, ((0, 0), (0, Tmax - x.shape[1])))

            all_sp = jnp.concatenate(
                [_padT(sp) for _b, _fl, _g, sp, _sc, _cf in pending], axis=0
            )
            all_sc = jnp.concatenate(
                [sc for _b, _fl, _g, _sp, sc, _cf in pending]
            )
            confs = [cf for _b, _fl, _g, _sp, _sc, cf in pending]
            all_cf = (
                jnp.concatenate([_padT(cf) for cf in confs], axis=0)
                if all(cf is not None for cf in confs)
                else None
            )
            start_host_copies((all_sp, all_sc, all_cf))
            fetched = (
                np.asarray(all_sp),
                np.asarray(all_sc),
                None if all_cf is None else np.asarray(all_cf),
            )
        else:
            start_host_copies(
                [(sp, sc, cf) for _b, _fl, _g, sp, sc, cf in pending]
            )
        _logger.debug(
            "final-pass dispatch took %.3fs", _time.time() - _sub_t0
        )
        _sub_t0 = _time.time()

        fetch_row = 0
        for batch, flens, garrs, state_path, scores, conf in pending:
            if fetched is not None:
                nrows = state_path.shape[0]
                state_path = fetched[0][fetch_row : fetch_row + nrows]
                scores = fetched[1][fetch_row : fetch_row + nrows]
                conf = (
                    None
                    if fetched[2] is None
                    else fetched[2][fetch_row : fetch_row + nrows]
                )
                fetch_row += nrows
            else:
                state_path = np.asarray(state_path)
                scores = np.asarray(scores)
                conf = None if conf is None else np.asarray(conf)
            phone_f, word_f, inst_f, _tstate_f = extract_frame_labels_host(
                garrs, state_path
            )
            for row, i in enumerate(batch):
                utt = corpus.utterances[i]
                Lf = int(flens[row])
                results[i] = self._frames_to_ctm(
                    utt,
                    graphs[i],
                    phone_f[row, :Lf],
                    word_f[row, :Lf],
                    inst_f[row, :Lf],
                    float(scores[row]),
                    phone_names,
                    confidence=None if conf is None else conf[row, :Lf],
                )
            if callback:
                callback(len(batch))
        _logger.debug(
            "path fetch + CTM extraction took %.3fs", _time.time() - _sub_t0
        )
        _logger.debug(
            "align phase B (emission+Viterbi+CTM) took %.3fs",
            _time.time() - _phase_t0,
        )
        results.update(long_results)
        return results

    def _frames_to_ctm(
        self,
        utt: Utterance,
        graph: CompiledGraph,
        phones: np.ndarray,
        words: np.ndarray,
        instances: np.ndarray,
        score: float,
        phone_names: Dict[int, str],
        confidence=None,
    ) -> UtteranceAlignment:
        return frames_to_alignment(
            utt,
            graph.words,
            phones,
            words,
            instances,
            score,
            phone_names,
            self.frame_shift,
            confidence=confidence,
        )

    # -- export --------------------------------------------------------------
    def export_textgrids(
        self,
        corpus: Corpus,
        results: Dict[int, UtteranceAlignment],
        output_directory,
        include_silence: bool = False,
        output_format: str = "long_textgrid",
        include_original_text: bool = False,
    ) -> List[Path]:
        """Write one file per corpus file with word/phone tiers per speaker;
        ``output_format`` is one of long_textgrid (default), short_textgrid,
        json, csv (reference ``textgrid.py:279-560``)."""
        extensions = {
            "long_textgrid": ".TextGrid",
            "short_textgrid": ".TextGrid",
            "json": ".json",
            "csv": ".csv",
        }
        if output_format not in extensions:
            raise ValueError(f"unknown output_format: {output_format}")
        output_directory = Path(output_directory)
        output_directory.mkdir(parents=True, exist_ok=True)
        by_file: Dict[str, List[Utterance]] = {}
        for utt in corpus.utterances:
            by_file.setdefault(utt.file_name, []).append(utt)
        out_paths = []
        for file_name, utts in by_file.items():
            tg = TextGrid()
            wav = corpus.files[file_name]
            from montreal_forced_aligner_tpu.io.wav import read_wave

            tg.xmax = read_wave(wav).duration
            speakers = sorted({u.speaker for u in utts})
            for spk in speakers:
                words: List[Interval] = []
                phones: List[Interval] = []
                texts: List[Interval] = []
                for utt in utts:
                    if utt.speaker != spk or utt.id not in results:
                        continue
                    if include_original_text:
                        texts.append(
                            Interval(utt.begin, utt.end or tg.xmax, utt.text)
                        )
                    aln = results[utt.id]
                    for w in aln.words:
                        words.append(Interval(w.begin, w.end, w.label))
                    for p in aln.phones:
                        if not include_silence and p.label in ("sil", "sp"):
                            continue
                        phones.append(Interval(p.begin, p.end, p.label))
                prefix = "" if len(speakers) == 1 else f"{spk} - "
                tg.tiers[f"{prefix}words"] = words
                tg.tiers[f"{prefix}phones"] = phones
                # reference adds an original-utterance tier when requested
                # (``textgrid.py:346``)
                if include_original_text:
                    tg.tiers[f"{prefix}utterances"] = texts
            out = output_directory / f"{file_name}{extensions[output_format]}"
            out.parent.mkdir(parents=True, exist_ok=True)
            if output_format == "json":
                tg.write_json(out)
            elif output_format == "csv":
                tg.write_csv(
                    out, default_speaker=speakers[0] if speakers else "speaker"
                )
            else:
                tg.write(out, output_format=output_format)
            out_paths.append(out)
        return out_paths


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _resample(wav, target_rate: int):
    """Linear-interpolation resample (host; rare path — the reference
    delegates to libsndfile/sox)."""
    from montreal_forced_aligner_tpu.io.wav import WaveData

    ratio = target_rate / wav.sample_rate
    n_out = int(round(len(wav.samples) * ratio))
    x_old = np.arange(len(wav.samples)) / wav.sample_rate
    x_new = np.arange(n_out) / target_rate
    return WaveData(
        samples=np.interp(x_new, x_old, wav.samples).astype(np.float32),
        sample_rate=target_rate,
        num_channels=wav.num_channels,
        duration=wav.duration,
    )


def frames_to_alignment(
    utt: Utterance,
    graph_words: List[str],
    phones: np.ndarray,
    words: np.ndarray,
    instances: np.ndarray,
    score: float,
    phone_names: Dict[int, str],
    frame_shift: float,
    confidence=None,
) -> UtteranceAlignment:
    """Run-length encode frame labels into phone/word intervals
    (replaces the reference's CTM generation + lexicon
    phones-to-pronunciations pass, ``alignment/multiprocessing.py:1573-1741``)."""
    L = len(phones)
    fs = frame_shift
    offset = utt.begin
    boundaries = np.flatnonzero(np.diff(instances)) + 1
    seg_starts = np.concatenate([[0], boundaries])
    seg_ends = np.concatenate([boundaries, [L]])
    phone_intervals: List[CtmInterval] = []
    word_map: Dict[int, WordCtmInterval] = {}
    for s0, s1 in zip(seg_starts, seg_ends):
        pid = int(phones[s0])
        widx = int(words[s0])
        name = phone_names.get(pid, str(pid))
        base = name
        for pos in POSITIONS:
            if base.endswith(pos):
                base = base[: -len(pos)]
                break
        iv = CtmInterval(offset + s0 * fs, offset + s1 * fs, base, phone_id=pid)
        if confidence is not None:
            iv.confidence = round(float(confidence[s0:s1].mean()), 4)
        phone_intervals.append(iv)
        if widx >= 0:
            if widx not in word_map:
                word_map[widx] = WordCtmInterval(
                    iv.begin, iv.end, graph_words[widx], [iv]
                )
            else:
                word_map[widx].end = iv.end
                word_map[widx].phones.append(iv)
    word_intervals = [word_map[k] for k in sorted(word_map)]
    return UtteranceAlignment(
        utterance_id=utt.id,
        words=word_intervals,
        phones=phone_intervals,
        log_likelihood=score,
        per_frame_log_likelihood=score / max(L, 1),
    )
