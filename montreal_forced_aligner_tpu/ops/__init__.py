from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig, compute_mfcc_batch
from montreal_forced_aligner_tpu.ops.feats import (
    apply_cmvn,
    compute_deltas,
    splice_frames,
)
from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_loglikes
from montreal_forced_aligner_tpu.ops.viterbi import viterbi_align_batch

__all__ = [
    "MfccConfig",
    "compute_mfcc_batch",
    "apply_cmvn",
    "compute_deltas",
    "splice_frames",
    "gmm_loglikes",
    "viterbi_align_batch",
]
