"""Dense Viterbi kernel tests against a brute-force numpy trellis."""

import numpy as np
import jax.numpy as jnp

from montreal_forced_aligner_tpu.ops.viterbi import (
    NEG_INF,
    BatchedGraph,
    viterbi_align_batch,
)


def brute_force_viterbi(emit, in_src, in_weight, start, final, acoustic_scale):
    """O(T*S*K) numpy DP with explicit backtracking."""
    T, S = emit.shape
    K = in_src.shape[1]
    alpha = start + acoustic_scale * emit[0]
    bps = np.zeros((T, S), dtype=np.int64)
    for t in range(1, T):
        cand = alpha[in_src] + in_weight  # (S, K)
        k = cand.argmax(axis=1)
        alpha = cand[np.arange(S), k] + acoustic_scale * emit[t]
        bps[t] = k
    scores = alpha + final
    s = int(scores.argmax())
    best = scores[s]
    path = [s]
    for t in range(T - 1, 0, -1):
        s = in_src[s, bps[t, s]]
        path.append(s)
    return best, np.array(path[::-1])


def random_graph(rng, S, K):
    """A random connected left-to-right-ish graph."""
    in_src = rng.randint(0, S, size=(S, K)).astype(np.int32)
    # guarantee a self-loop arc so every state is reachable over time
    in_src[:, 0] = np.arange(S)
    for s in range(1, S):
        in_src[s, 1] = s - 1
    in_weight = (-rng.rand(S, K) * 3).astype(np.float32)
    mask = rng.rand(S, K) < 0.2
    mask[:, :2] = False
    in_weight[mask] = NEG_INF
    start = np.full(S, NEG_INF, dtype=np.float32)
    start[0] = 0.0
    start[1] = -0.5
    final = np.full(S, NEG_INF, dtype=np.float32)
    final[S - 1] = 0.0
    final[S - 2] = -1.0
    return in_src, in_weight, start, final


def make_batched(graphs, S, K, T, emits, lens):
    B = len(graphs)
    arrs = dict(
        in_src=np.zeros((B, S, K), np.int32),
        in_weight=np.full((B, S, K), NEG_INF, np.float32),
        start=np.full((B, S), NEG_INF, np.float32),
        final=np.full((B, S), NEG_INF, np.float32),
    )
    emit = np.full((B, T, S), -1.0, np.float32)
    for b, (src, w, st, fi) in enumerate(graphs):
        s, k = src.shape
        arrs["in_src"][b, :s, :k] = src
        arrs["in_weight"][b, :s, :k] = w
        arrs["start"][b, :s] = st
        arrs["final"][b, :s] = fi
        emit[b, : lens[b], :s] = emits[b]
    zeros = np.zeros((B, S), np.int32)
    
    graph = BatchedGraph(
        in_src=jnp.asarray(arrs["in_src"]),
        in_weight=jnp.asarray(arrs["in_weight"]),
        in_tid=jnp.asarray(np.zeros_like(arrs["in_src"])),
        start=jnp.asarray(arrs["start"]),
        final=jnp.asarray(arrs["final"]),
        final_tid=jnp.asarray(zeros),
        state_pdf=jnp.asarray(zeros),
        state_phone=jnp.asarray(zeros),
        state_word=jnp.asarray(zeros),
        state_hmm_pos=jnp.asarray(zeros),
        state_tstate=jnp.asarray(zeros),
        state_instance=jnp.asarray(zeros),
        num_states=jnp.asarray(np.array([g[0].shape[0] for g in graphs], np.int32)),
    )
    return graph, jnp.asarray(emit)


def test_viterbi_matches_brute_force_batched():
    rng = np.random.RandomState(7)
    sizes = [(12, 3, 40), (20, 4, 55), (5, 2, 31)]
    graphs, emits, lens = [], [], []
    for S, K, T in sizes:
        graphs.append(random_graph(rng, S, K))
        emits.append(rng.randn(T, S).astype(np.float32) * 2)
        lens.append(T)
    S = max(s for s, _, _ in sizes)
    K = max(k for _, k, _ in sizes)
    T = max(t for _, _, t in sizes)
    graph, emit = make_batched(graphs, S, K, T, emits, lens)
    paths, scores = viterbi_align_batch(
        emit, jnp.asarray(np.array(lens, np.int32)), graph, acoustic_scale=0.1
    )
    paths = np.asarray(paths)
    scores = np.asarray(scores)
    for b, (S_b, K_b, T_b) in enumerate(sizes):
        src, w, st, fi = graphs[b]
        ref_score, ref_path = brute_force_viterbi(emits[b], src, w, st, fi, 0.1)
        assert abs(scores[b] - ref_score) < 1e-3, f"utt {b} score"
        np.testing.assert_array_equal(paths[b, :T_b], ref_path)


def test_viterbi_linear_chain_forced():
    """A forced linear chain: with emissions strongly favoring a segmentation,
    the path must follow it exactly."""
    S, T = 3, 12
    in_src = np.stack([np.arange(S), np.maximum(np.arange(S) - 1, 0)], axis=1).astype(
        np.int32
    )
    in_weight = np.full((S, 2), np.log(0.5), np.float32)
    in_weight[0, 1] = NEG_INF  # state 0 has no predecessor
    start = np.array([0.0, NEG_INF, NEG_INF], np.float32)
    final = np.array([NEG_INF, NEG_INF, 0.0], np.float32)
    truth = [0] * 4 + [1] * 5 + [2] * 3
    emit = np.full((T, S), -50.0, np.float32)
    for t, s in enumerate(truth):
        emit[t, s] = 0.0
    graph, emit_b = make_batched(
        [(in_src, in_weight, start, final)], S, 2, T, [emit], [T]
    )
    paths, scores = viterbi_align_batch(
        emit_b, jnp.asarray(np.array([T], np.int32)), graph, acoustic_scale=1.0
    )
    np.testing.assert_array_equal(np.asarray(paths)[0], truth)


def test_kbest_viterbi_matches_enumeration():
    """K-best kernel vs exhaustive path enumeration on a small graph."""
    from itertools import product

    from montreal_forced_aligner_tpu.ops.viterbi import (
        nbest_backtrace_host,
        viterbi_nbest_device,
    )

    rng = np.random.RandomState(11)
    S, K_arc, T = 6, 3, 5
    in_src, in_weight, start, final = random_graph(rng, S, K_arc)
    emit = (-rng.rand(T, S) * 4).astype(np.float32)
    # best arc weight per (prev, cur) pair for state-sequence scoring
    W = np.full((S, S), NEG_INF, np.float32)
    for s in range(S):
        for k in range(K_arc):
            W[in_src[s, k], s] = max(W[in_src[s, k], s], in_weight[s, k])

    scored = []
    for path in product(range(S), repeat=T):
        sc = start[path[0]] + emit[0, path[0]]
        for t in range(1, T):
            sc += W[path[t - 1], path[t]] + emit[t, path[t]]
        sc += final[path[-1]]
        if sc > NEG_INF / 2:
            scored.append((float(sc), path))
    scored.sort(key=lambda x: -x[0])

    graph, emit_b = make_batched(
        [(in_src, in_weight, start, final)], S, K_arc, T, [emit], [T]
    )
    fscores, bps = viterbi_nbest_device(
        emit_b, jnp.asarray(np.array([T], np.int32)), graph,
        acoustic_scale=1.0, K=8,
    )
    paths, scores, _events = nbest_backtrace_host(
        {
            "in_src": np.asarray(graph.in_src),
            "state_word": np.asarray(graph.state_word),
        },
        np.asarray(fscores), np.asarray(bps), np.array([T]), 8,
    )
    # dedup kernel output by state sequence (parallel/duplicate arcs can
    # surface the same sequence at a lower rank)
    seen, dedup = set(), []
    for r in range(8):
        key = tuple(paths[0, r, :T].tolist())
        if key in seen or scores[0, r] <= NEG_INF / 2:
            continue
        seen.add(key)
        dedup.append((float(scores[0, r]), key))
    for i in range(min(4, len(dedup), len(scored))):
        assert abs(dedup[i][0] - scored[i][0]) < 1e-3, i
        assert dedup[i][1] == scored[i][1], i


def test_long_viterbi_matches_batched():
    """Checkpointed chunked Viterbi == the batched kernel on a real-style
    alignment problem (synthetic model + tone audio)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import build_synthetic_model, synth_wave

    import jax.numpy as jnp
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
        _emit_and_align,
        _final_feats,
        _mfcc_and_sums,
    )
    from montreal_forced_aligner_tpu.graph.compiler import (
        batch_graphs,
        ship_graph_to_device,
    )
    from montreal_forced_aligner_tpu.ops.long_viterbi import viterbi_align_long
    from montreal_forced_aligner_tpu.ops.mfcc import pad_waves_for_mfcc

    tmp = Path(__import__("tempfile").mkdtemp())
    wave = synth_wave()
    model_path, dict_path = build_synthetic_model(tmp, wave=wave)
    al = PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=1))
    graph = al.compiler.compile(al.tokenizer.tokenize("ab a"))
    garrs = batch_graphs([graph])
    bgraph = ship_graph_to_device(garrs)
    padded, lens = pad_waves_for_mfcc([wave], al.mfcc_config, len(wave))
    T = al.mfcc_config.num_frames(int(lens[0]))
    feats, _ = _mfcc_and_sums(
        jnp.asarray(padded), jnp.asarray([T]), al.mfcc_config,
        al.mfcc_config.num_frames(int(lens[0])),
    )
    mean = feats[0, :T].mean(axis=0)
    ff = _final_feats(feats, jnp.asarray([T]), mean[None], None)
    W, gc = al._device_gmm[0], al._device_gmm[1]

    sp_batch, score_batch = _emit_and_align(
        ff, jnp.asarray([T]), bgraph, W, gc, 0.1
    )
    sp_batch = np.asarray(sp_batch)[0, :T]

    path, score = viterbi_align_long(
        np.asarray(ff[0, :T]), garrs, W, gc, acoustic_scale=0.1, chunk=37
    )
    assert abs(score - float(score_batch[0])) < 1e-2
    np.testing.assert_array_equal(path, sp_batch)


def test_ship_graph_minimal_transfer_and_band_device():
    """ship_graph_to_device ships only the device-consumed arrays (int16 on
    the wire when values fit) and keeps host-only label arrays as numpy;
    densify_band on device matches the host band_from_arcs reference."""
    import jax

    from montreal_forced_aligner_tpu.graph.compiler import (
        batch_graphs,
        ship_graph_to_device,
    )
    from montreal_forced_aligner_tpu.ops.viterbi import (
        band_from_arcs,
        band_limits_from_arcs,
        densify_band,
    )

    rng = np.random.RandomState(3)
    B, S, K = 2, 37, 3
    garrs = dict(
        in_src=np.zeros((B, S, K), np.int32),
        in_weight=np.full((B, S, K), NEG_INF, np.float32),
        in_tid=rng.randint(0, 99, (B, S, K)).astype(np.int32),
        start=np.full((B, S), NEG_INF, np.float32),
        final=np.full((B, S), NEG_INF, np.float32),
        final_tid=np.zeros((B, S), np.int32),
        state_pdf=rng.randint(0, 40, (B, S)).astype(np.int32),
        state_phone=rng.randint(0, 10, (B, S)).astype(np.int32),
        state_word=np.full((B, S), -1, np.int32),
        state_hmm_pos=np.zeros((B, S), np.int32),
        state_tstate=np.zeros((B, S), np.int32),
        state_instance=np.full((B, S), -1, np.int32),
        num_states=np.array([S, S - 5], np.int32),
    )
    # banded arcs: self loops + forward-1..3 + one backward-2
    for b in range(B):
        for s in range(S):
            garrs["in_src"][b, s, 0] = s
            garrs["in_weight"][b, s, 0] = -0.1 * (s + 1)
            if s > 0:
                garrs["in_src"][b, s, 1] = s - 1
                garrs["in_weight"][b, s, 1] = -0.5
            if s >= 3:
                garrs["in_src"][b, s, 2] = s - 3
                garrs["in_weight"][b, s, 2] = -1.5
    graph = ship_graph_to_device(garrs)
    # device arrays widened back to int32; host-only fields stay numpy
    assert graph.in_src.dtype == jnp.int32
    assert isinstance(graph.state_word, np.ndarray)
    assert isinstance(graph.in_tid, np.ndarray)
    np.testing.assert_array_equal(np.asarray(graph.in_src), garrs["in_src"])
    np.testing.assert_array_equal(np.asarray(graph.state_pdf), garrs["state_pdf"])
    np.testing.assert_array_equal(np.asarray(graph.num_states), garrs["num_states"])
    np.testing.assert_allclose(np.asarray(graph.in_weight), garrs["in_weight"])

    band_np, lb, ub = band_from_arcs(garrs)
    limits = band_limits_from_arcs(garrs)
    assert limits == (lb, ub)
    band_dev = jax.jit(densify_band, static_argnames=("lb", "ub"))(
        graph, lb, ub
    )
    np.testing.assert_allclose(np.asarray(band_dev), band_np)

    # values past int16 force the wide path
    garrs_wide = dict(garrs)
    garrs_wide["state_pdf"] = garrs["state_pdf"] + 2**15
    graph_w = ship_graph_to_device(garrs_wide)
    np.testing.assert_array_equal(
        np.asarray(graph_w.state_pdf), garrs_wide["state_pdf"]
    )


def test_batch_graphs_state_bucketing():
    """batch_graphs rounds S up to state_multiple with unreachable padding
    states; alignment results are unchanged vs state_multiple=1."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import build_synthetic_model, synth_wave

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
        _emit_and_align,
        _final_feats,
        _mfcc_and_sums,
    )
    from montreal_forced_aligner_tpu.graph.compiler import (
        batch_graphs,
        ship_graph_to_device,
    )
    from montreal_forced_aligner_tpu.ops.mfcc import pad_waves_for_mfcc

    tmp = Path(__import__("tempfile").mkdtemp())
    wave = synth_wave()
    model_path, dict_path = build_synthetic_model(tmp, wave=wave)
    al = PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=1))
    graph = al.compiler.compile(al.tokenizer.tokenize("ab a"))
    padded, lens = pad_waves_for_mfcc([wave], al.mfcc_config, len(wave))
    T = al.mfcc_config.num_frames(int(lens[0]))
    feats, _ = _mfcc_and_sums(
        jnp.asarray(padded), jnp.asarray([T]), al.mfcc_config, T
    )
    mean = feats[0, :T].mean(axis=0)
    ff = _final_feats(feats, jnp.asarray([T]), mean[None], None)
    W, gc = al._device_gmm[0], al._device_gmm[1]

    out = {}
    for mult in (1, 64):
        garrs = batch_graphs([graph], state_multiple=mult)
        if mult > 1:
            assert garrs["state_pdf"].shape[1] % mult == 0
            assert garrs["state_pdf"].shape[1] >= graph.num_states
        bg = ship_graph_to_device(garrs)
        sp, sc = _emit_and_align(ff, jnp.asarray([T]), bg, W, gc, 0.1)
        out[mult] = (np.asarray(sp)[0, :T], float(np.asarray(sc)[0]))
    np.testing.assert_array_equal(out[1][0], out[64][0])
    assert abs(out[1][1] - out[64][1]) < 1e-3


def test_band_forward_pallas_matches_scan():
    """Pallas band-forward == numpy reference (runs only on real TPU; the
    kernel is gated off on CPU where the XLA scan path serves)."""
    import jax
    import pytest

    if jax.default_backend() in ("cpu", "gpu"):
        pytest.skip("Pallas TPU kernel requires a TPU backend")
    from montreal_forced_aligner_tpu.ops.pallas_viterbi import (
        band_forward_pallas,
    )

    rng = np.random.RandomState(0)
    B, T, S, lb, ub = 8, 40, 64, 4, 16
    D = lb + ub + 1
    band = np.full((B, S, D), NEG_INF, np.float32)
    band[:, :, lb] = np.log(0.5)
    band[:, 1:, lb + 1] = np.log(0.5)
    band[:, 3:, lb + 3] = np.log(0.25)
    start = np.full((B, S), NEG_INF, np.float32)
    start[:, 0] = 0.0
    emit = (rng.randn(B, T, S) * 2).astype(np.float32)
    flens = np.array([T] * 4 + [T - 3, T // 2, 2, 1], np.int32)
    aT, bp = band_forward_pallas(
        jnp.asarray(emit), jnp.asarray(flens), jnp.asarray(band),
        jnp.asarray(start), lb, ub, 0.1,
    )
    a = start + 0.1 * emit[:, 0]
    bps = np.zeros((T - 1, B, S), np.int32)
    for t in range(1, T):
        ap = np.pad(a, ((0, 0), (ub, lb)), constant_values=NEG_INF)
        m = np.full((B, S), NEG_INF, np.float32)
        bpt = np.zeros((B, S), np.int32)
        for j in range(D):
            d = j - lb
            c = ap[:, ub - d : ub - d + S] + band[:, :, j]
            take = c > m
            m = np.where(take, c, m)
            bpt = np.where(take, j, bpt)
        act = (t < flens)[:, None]
        a = np.where(act, m + 0.1 * emit[:, t], a)
        bps[t - 1] = bpt
    np.testing.assert_allclose(np.asarray(aT), a, atol=1e-4)
    mask = (np.arange(1, T)[:, None] < flens[None, :])[:, :, None]
    assert int(((np.asarray(bp) != bps) & mask).sum()) == 0


def test_band_backtrace_pallas_matches_scan():
    """Full Pallas band path (forward kernel + backtrace kernel) must be
    bit-identical to the XLA-scan band path (runs only on real TPU)."""
    import jax
    import pytest

    if jax.default_backend() in ("cpu", "gpu"):
        pytest.skip("Pallas TPU kernel requires a TPU backend")
    from montreal_forced_aligner_tpu.ops import pallas_viterbi as pv
    from montreal_forced_aligner_tpu.ops.viterbi import (
        viterbi_align_batch_band,
    )

    rng = np.random.RandomState(1)
    B, T, S, lb, ub = 8, 48, 64, 4, 16
    D = lb + ub + 1
    band = np.full((B, S, D), NEG_INF, np.float32)
    band[:, :, lb] = np.log(0.5)
    band[:, 1:, lb + 1] = np.log(0.5)
    band[:, 3:, lb + 3] = np.log(0.25)
    start = np.full((B, S), NEG_INF, np.float32)
    start[:, 0] = 0.0
    final = np.full((B, S), NEG_INF, np.float32)
    final[:, S - 4:] = 0.0
    emit = (rng.randn(B, T, S) * 2).astype(np.float32)
    flens = np.array([T] * 4 + [T - 5, T // 2, 3, 1], np.int32)
    args = (
        jnp.asarray(emit), jnp.asarray(flens), jnp.asarray(band),
        jnp.asarray(start), jnp.asarray(final),
    )
    states_pl, score_pl = viterbi_align_batch_band(*args, lb, ub, 0.1)
    # force the scan path by making the eligibility check fail
    orig = pv.band_pallas_eligible
    try:
        pv.band_pallas_eligible = lambda *a: False
        states_sc, score_sc = viterbi_align_batch_band(*args, lb, ub, 0.1)
    finally:
        pv.band_pallas_eligible = orig
    np.testing.assert_array_equal(np.asarray(states_pl), np.asarray(states_sc))
    np.testing.assert_allclose(
        np.asarray(score_pl), np.asarray(score_sc), atol=1e-4
    )
