"""Multi-chip data-parallel correctness: the sharded SPMD accumulate step
on an 8-device CPU mesh must reproduce the single-device computation
exactly (paths, scores, psum-reduced statistics). This is the pytest
counterpart of the driver's ``__graft_entry__.dryrun_multichip`` compile
check (reference behavior: per-job ``AccStatsFunction`` workers + parent
accumulator summation, ``alignment/multiprocessing.py:576-666``)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF, BatchedGraph
from montreal_forced_aligner_tpu.parallel.data_parallel import (
    make_sharded_accumulate_step,
)


def _toy_inputs(B=8, T=12, S=6, K=2, P=5, G=3, D=4, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, D).astype(np.float32)
    lens = np.full(B, T, np.int32)
    lens[1::2] = T // 2
    in_src = np.zeros((B, S, K), np.int32)
    in_weight = np.full((B, S, K), NEG_INF, np.float32)
    for s in range(S):
        in_src[:, s, 0] = s
        in_weight[:, s, 0] = np.log(0.5)
        if s > 0:
            in_src[:, s, 1] = s - 1
            in_weight[:, s, 1] = np.log(0.5)
    start = np.full((B, S), NEG_INF, np.float32)
    start[:, 0] = 0.0
    final = np.full((B, S), NEG_INF, np.float32)
    final[:, S - 1] = 0.0
    graph = BatchedGraph(
        in_src=jnp.asarray(in_src),
        in_weight=jnp.asarray(in_weight),
        in_tid=jnp.zeros((B, S, K), jnp.int32),
        start=jnp.asarray(start),
        final=jnp.asarray(final),
        final_tid=jnp.zeros((B, S), jnp.int32),
        state_pdf=jnp.asarray(
            np.tile(rng.randint(0, P, S).astype(np.int32), (B, 1))
        ),
        state_phone=jnp.zeros((B, S), jnp.int32),
        state_word=jnp.zeros((B, S), jnp.int32),
        state_hmm_pos=jnp.zeros((B, S), jnp.int32),
        state_tstate=jnp.zeros((B, S), jnp.int32),
        state_instance=jnp.zeros((B, S), jnp.int32),
        num_states=jnp.full(B, S, jnp.int32),
    )
    miv = rng.randn(P, G, D).astype(np.float32)
    iv = (0.5 + rng.rand(P, G, D)).astype(np.float32)
    gconst = rng.randn(P, G).astype(np.float32)
    return feats, lens, graph, miv, iv, gconst


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)
def test_sharded_accumulate_matches_single_device():
    feats, lens, graph, miv, iv, gconst = _toy_inputs()
    devs = np.array(jax.devices()[:8])
    step8 = make_sharded_accumulate_step(Mesh(devs, ("data",)))
    step1 = make_sharded_accumulate_step(Mesh(devs[:1], ("data",)))
    args = (
        jnp.asarray(feats),
        jnp.asarray(lens),
        graph,
        jnp.asarray(miv),
        jnp.asarray(iv),
        jnp.asarray(gconst),
    )
    p8, s8, occ8, mean8, var8, ll8, nf8 = step8(*args)
    p1, s1, occ1, mean1, var1, ll1, nf1 = step1(*args)
    np.testing.assert_array_equal(np.asarray(p8), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=1e-6)
    # psum-reduced stats are replicated and equal to the 1-device sums
    np.testing.assert_allclose(np.asarray(occ8), np.asarray(occ1), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mean8), np.asarray(mean1), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(var8), np.asarray(var1), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(ll8), float(ll1), rtol=1e-5)
    assert float(nf8) == float(nf1) == float(lens.sum())
    # occupancy mass equals the number of aligned frames
    np.testing.assert_allclose(
        float(np.asarray(occ8).sum()), float(lens.sum()), rtol=1e-5
    )


def test_sharded_accumulate_across_processes(tmp_path):
    """Simulated multi-host: two OS processes x 4 virtual CPU devices form
    one 8-device global mesh via jax.distributed; the psum-reduced
    statistics must match an in-process single-mesh run (the cross-process
    channel stands in for DCN between real TPU hosts)."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    import __graft_entry__ as ge

    port = 12000 + (os.getpid() % 2000)
    out_npz = tmp_path / "proc0.npz"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = str(Path(__file__).parent.parent) + (
        ":" + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    worker = Path(__file__).parent / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), str(pid), "2", str(port), str(out_npz)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    got = np.load(out_npz)

    # in-process reference on this process's own 8 virtual devices
    feats, lens, graph, miv, iv, gconst = ge._toy_batch(
        B=16, T=32, S=16, K=4, P=8, G=2, D=13
    )
    step = make_sharded_accumulate_step(
        Mesh(np.array(jax.devices()[:8]), ("data",))
    )
    _sp, _sc, occ, mean_acc, var_acc, ll, frames = step(
        feats, lens, graph, miv, iv, gconst
    )
    np.testing.assert_allclose(got["occ"], np.asarray(occ), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["mean_acc"], np.asarray(mean_acc), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        got["var_acc"], np.asarray(var_acc), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(got["ll"]), float(ll), rtol=1e-5)
    assert float(got["frames"]) == float(frames)


def test_shard_corpus_for_host():
    """Per-host corpus sharding: whole speakers, load-balanced, disjoint,
    exhaustive (reference ``initialize_jobs`` bin packing,
    ``corpus/base.py:994-1015``)."""
    from montreal_forced_aligner_tpu.parallel.multihost import (
        shard_corpus_for_host,
        shard_speakers_for_host,
    )

    class U:
        def __init__(self, i, spk):
            self.id, self.speaker = i, spk

    class C:
        pass

    corpus = C()
    rng = np.random.RandomState(0)
    corpus.utterances = []
    i = 0
    spk_counts = {}
    for s in range(17):
        n = int(rng.randint(1, 40))
        spk_counts[f"spk{s}"] = n
        for _ in range(n):
            corpus.utterances.append(U(i, f"spk{s}"))
            i += 1
    P = 4
    shards = [shard_corpus_for_host(corpus, p, P) for p in range(P)]
    all_ids = sorted(x for sh in shards for x in sh)
    assert all_ids == sorted(u.id for u in corpus.utterances)  # exhaustive
    assert len(set(all_ids)) == len(all_ids)  # disjoint
    # whole speakers per host
    for p, sh in enumerate(shards):
        spks = {corpus.utterances[x].speaker for x in sh}
        owned = set(shard_speakers_for_host(spk_counts, p, P))
        assert spks <= owned
    # balanced within the largest speaker's load
    sizes = sorted(len(sh) for sh in shards)
    assert sizes[-1] - sizes[0] <= max(spk_counts.values())


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)
def test_sharded_fmllr_stats_match_single_device():
    """Per-speaker fMLLR K/G/beta reduced across the mesh equal the
    single-device accumulation (speakers span shards here, the worst case
    for the reduction)."""
    from montreal_forced_aligner_tpu.ops.transforms import (
        accumulate_fmllr_stats,
    )
    from montreal_forced_aligner_tpu.parallel.data_parallel import (
        make_sharded_fmllr_stats_step,
    )

    rng = np.random.RandomState(1)
    B, T, D, P, G, S = 16, 10, 4, 5, 2, 3
    feats = rng.randn(B, T, D).astype(np.float32)
    lens = np.full(B, T, np.int32)
    lens[::3] = T // 2
    frame_pdf = rng.randint(0, P, (B, T)).astype(np.int32)
    spk = rng.randint(0, S, B).astype(np.int32)  # speakers cross shards
    weight = (rng.rand(B, T) > 0.2).astype(np.float32)
    means = rng.randn(P, G, D).astype(np.float32)
    iv = (0.5 + rng.rand(P, G, D)).astype(np.float32)
    gc = rng.randn(P, G).astype(np.float32)
    miv = (means * iv).astype(np.float32)

    args = (
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(frame_pdf),
        jnp.asarray(spk), jnp.asarray(weight),
        jnp.asarray(means), jnp.asarray(iv), jnp.asarray(gc), jnp.asarray(miv),
    )
    K1, G1, b1 = accumulate_fmllr_stats(*args, S)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    step = make_sharded_fmllr_stats_step(mesh)(S)
    K8, G8, b8 = step(*args)
    np.testing.assert_allclose(np.asarray(K8), np.asarray(K1), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(G8), np.asarray(G1), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b8), np.asarray(b1), rtol=1e-6)


def test_shard_corpus_keeps_multi_speaker_files_atomic():
    """A multi-speaker TextGrid's speakers must land on one host (each host
    exports whole files; partial exports would be last-writer-wins), while
    per-speaker statistics stay host-local — so the sharding unit is a
    connected component of the speaker<->file graph."""
    from montreal_forced_aligner_tpu.parallel.multihost import (
        shard_corpus_for_host,
    )

    class U:
        def __init__(self, i, spk, fp):
            self.id, self.speaker, self.file_path = i, spk, fp

    class C:
        pass

    corpus = C()
    corpus.utterances = []
    i = 0
    # files f0..f5; f0 holds spkA+spkB (paired), f1 holds spkB+spkC
    # (chained -> {A,B,C} one component); f2..f5 single-speaker
    layout = [
        ("f0", ["spkA", "spkB"]),
        ("f1", ["spkB", "spkC"]),
        ("f2", ["spkD"]),
        ("f3", ["spkE"]),
        ("f4", ["spkF"]),
        ("f5", ["spkG"]),
    ]
    for fname, spks in layout:
        for spk in spks:
            for _ in range(3):
                corpus.utterances.append(U(i, spk, f"/c/{fname}.TextGrid"))
                i += 1
    P = 3
    shards = [shard_corpus_for_host(corpus, p, P) for p in range(P)]
    all_ids = sorted(x for sh in shards for x in sh)
    assert all_ids == list(range(i))  # disjoint + exhaustive
    # every file is owned by exactly one host
    for fname, _spks in layout:
        owners = {
            p
            for p, sh in enumerate(shards)
            for x in sh
            if corpus.utterances[x].file_path.endswith(f"{fname}.TextGrid")
        }
        assert len(owners) == 1, fname
    # the chained component {A,B,C} stays together
    abc_owner = {
        p
        for p, sh in enumerate(shards)
        for x in sh
        if corpus.utterances[x].speaker in ("spkA", "spkB", "spkC")
    }
    assert len(abc_owner) == 1
    # and every speaker is on exactly one host
    for spk in "ABCDEFG":
        owners = {
            p
            for p, sh in enumerate(shards)
            for x in sh
            if corpus.utterances[x].speaker == f"spk{spk}"
        }
        assert len(owners) == 1
