"""Multi-host orchestration: per-host corpus sharding + distributed init.

The reference shards speakers onto NUM_JOBS local worker processes by greedy
bin-packing on utterance count (``corpus/base.py:922-1035``) so per-speaker
CMVN/fMLLR statistics stay job-local. Across TPU hosts the same invariant
holds per host: each host feeds its own utterance subset into the global
SPMD step (``parallel/data_parallel.py``), and only the psum-reduced model
statistics cross hosts.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` (idempotent) and return
    ``(process_index, process_count)``.

    With no arguments, relies on the TPU pod runtime's automatic discovery
    (or ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    for manual launches, e.g. the CI multi-process CPU test).
    """
    import jax

    # Detect prior initialization WITHOUT touching the backend:
    # jax.process_count() would initialize XLA and make a subsequent
    # jax.distributed.initialize() raise.
    try:
        from jax._src import distributed as _dist

        already_initialized = (
            getattr(_dist.global_state, "client", None) is not None
        )
    except Exception:  # pragma: no cover - private-API drift
        already_initialized = False

    if not already_initialized and (
        coordinator_address
        or num_processes
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None,
            process_id=process_id
            if process_id is not None
            else (
                int(os.environ["JAX_PROCESS_ID"])
                if "JAX_PROCESS_ID" in os.environ
                else None
            ),
        )
    return jax.process_index(), jax.process_count()


def shard_speakers_for_host(
    speaker_utterance_counts: Dict[str, int],
    process_index: int,
    process_count: int,
) -> List[str]:
    """Greedy bin-packing of speakers onto hosts by utterance count
    (reference ``initialize_jobs``, ``corpus/base.py:994-1015``): speakers
    sorted by descending load, each assigned to the lightest bin. Returns
    the speakers owned by ``process_index`` (deterministic across hosts)."""
    loads = [0] * process_count
    owner: Dict[str, int] = {}
    for spk in sorted(
        speaker_utterance_counts,
        key=lambda s: (-speaker_utterance_counts[s], s),
    ):
        bin_i = min(range(process_count), key=lambda i: (loads[i], i))
        owner[spk] = bin_i
        loads[bin_i] += speaker_utterance_counts[spk]
    return sorted(s for s, b in owner.items() if b == process_index)


def shard_corpus_for_host(
    corpus, process_index: int, process_count: int
) -> List[int]:
    """Utterance ids this host owns: whole speakers, load-balanced
    (per-speaker statistics stay host-local, so CMVN/fMLLR need no
    cross-host gathers; only model stats ride psum)."""
    counts: Dict[str, int] = defaultdict(int)
    for utt in corpus.utterances:
        counts[utt.speaker] += 1
    mine = set(
        shard_speakers_for_host(dict(counts), process_index, process_count)
    )
    return [utt.id for utt in corpus.utterances if utt.speaker in mine]
