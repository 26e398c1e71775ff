"""UBM / i-vector / PLDA / diarization tests on synthetic two-speaker audio."""

import numpy as np
import pytest
import jax.numpy as jnp

from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig, compute_mfcc_batch

SR = 16000


CHORDS = [
    [300, 2200],
    [550, 1700],
    [850, 2700],
    [400, 1200],
    [700, 3200],
]


def make_speaker_wave(rng, spk: int, dur: float = 3.0):
    """Two synthetic 'speakers': a shared inventory of 'phones' (tone
    chords) spoken in random order — non-stationary like real speech, so
    per-utterance CMN keeps the speaker signal — with a consistent
    speaker-specific formant shift."""
    shift = 1.0 + 0.10 * spk
    pieces = []
    t_total = 0.0
    while t_total < dur:
        seg = 0.15 + 0.15 * rng.rand()
        n = int(seg * SR)
        t = np.arange(n) / SR
        chord = CHORDS[rng.randint(len(CHORDS))]
        x = sum(
            3000 * np.sin(2 * np.pi * f * shift * (1 + 0.003 * rng.randn()) * t)
            for f in chord
        )
        pieces.append(x)
        t_total += seg
    wave = np.concatenate(pieces) + rng.randn(
        sum(len(p) for p in pieces)
    ) * 200
    return wave.astype(np.float32)


@pytest.fixture(scope="module")
def ivector_setup():
    rng = np.random.RandomState(0)
    waves = []
    speakers = []
    for u in range(12):
        spk = u % 2
        waves.append(make_speaker_wave(rng, spk, 6.0 + 2.0 * rng.rand()))
        speakers.append(spk)
    cfg = MfccConfig()
    batches = []
    for lo in range(0, len(waves), 4):
        chunk = waves[lo : lo + 4]
        feats, flens = compute_mfcc_batch(chunk, cfg=cfg)
        batches.append((feats, flens))
    from montreal_forced_aligner_tpu.ivector.extractor import apply_utterance_cmn

    batches = apply_utterance_cmn(batches)
    return batches, np.array(speakers)


def test_ubm_training(ivector_setup):
    from montreal_forced_aligner_tpu.ivector.ubm import train_ubm

    batches, _spk = ivector_setup
    ubm = train_ubm(batches, num_gauss=8, num_init_iterations=6, num_iterations=2)
    assert 4 <= ubm.num_gauss <= 8
    assert np.all(ubm.variances > 0)
    assert abs(ubm.weights.sum() - 1.0) < 1e-6


def test_ivector_separates_speakers(ivector_setup):
    from montreal_forced_aligner_tpu.ivector.extractor import (
        extract_ivectors,
        length_normalize,
        train_ivector_extractor,
    )
    from montreal_forced_aligner_tpu.ivector.ubm import train_ubm
    from montreal_forced_aligner_tpu.diarization.clustering import (
        agglomerative_cluster,
        cosine_distance_matrix,
        kmeans_cluster,
    )

    batches, spk = ivector_setup
    ubm = train_ubm(batches, num_gauss=8, num_init_iterations=6, num_iterations=2)
    extractor = train_ivector_extractor(
        batches, ubm, ivector_dim=8, num_iterations=4, gaussian_min_count=1.0
    )
    iv = length_normalize(extract_ivectors(extractor, batches))
    assert iv.shape == (12, 8)
    # clustering into 2 groups must largely reproduce the speaker split
    # (synthetic tone "speakers" are a weak proxy for real speaker variation)
    labels = agglomerative_cluster(cosine_distance_matrix(iv), num_clusters=2)
    acc = max((labels == spk).mean(), (labels == 1 - spk).mean())
    labels_km = kmeans_cluster(iv, 2)
    acc_km = max((labels_km == spk).mean(), (labels_km == 1 - spk).mean())
    assert max(acc, acc_km) >= 10 / 12


def test_plda_scoring_and_eer(ivector_setup):
    from montreal_forced_aligner_tpu.ivector.extractor import (
        extract_ivectors,
        length_normalize,
        train_ivector_extractor,
    )
    from montreal_forced_aligner_tpu.ivector.ubm import train_ubm
    from montreal_forced_aligner_tpu.ivector.plda import Plda, compute_eer

    batches, spk = ivector_setup
    ubm = train_ubm(batches, num_gauss=8, num_init_iterations=6, num_iterations=2)
    extractor = train_ivector_extractor(
        batches, ubm, ivector_dim=8, num_iterations=4, gaussian_min_count=1.0
    )
    iv = length_normalize(extract_ivectors(extractor, batches))
    plda = Plda.train(iv, spk)
    scores = plda.log_likelihood_ratio(iv, iv)
    # same-speaker pairs must outscore different-speaker pairs
    same = [scores[i, j] for i in range(12) for j in range(12) if i != j and spk[i] == spk[j]]
    diff = [scores[i, j] for i in range(12) for j in range(12) if spk[i] != spk[j]]
    assert np.mean(same) > np.mean(diff)
    trial_scores = np.array(same + diff)
    trial_labels = np.array([1] * len(same) + [0] * len(diff))
    assert compute_eer(trial_scores, trial_labels) < 0.2


def test_extractor_roundtrip(ivector_setup, tmp_path):
    from montreal_forced_aligner_tpu.ivector.extractor import (
        IvectorExtractor,
        train_ivector_extractor,
    )
    from montreal_forced_aligner_tpu.ivector.ubm import train_ubm

    batches, _ = ivector_setup
    ubm = train_ubm(batches, num_gauss=4, num_init_iterations=3, num_iterations=1)
    ex = train_ivector_extractor(batches, ubm, ivector_dim=4, num_iterations=1,
                                 gaussian_min_count=1.0)
    p = tmp_path / "extractor.npz"
    ex.save(p)
    ex2 = IvectorExtractor.load(p)
    np.testing.assert_allclose(ex2.T, ex.T)
    np.testing.assert_allclose(ex2.ubm.means, ex.ubm.means)


def test_reference_archive_roundtrip(ivector_setup, tmp_path):
    """Reference IvectorExtractorModel interop (reference
    models.py:814-929): write Kaldi-binary final.ie/final.dubm/plda ->
    read back -> identical i-vector extraction; .ivector save paths pick
    the reference form automatically."""
    import zipfile

    from montreal_forced_aligner_tpu.ivector.extractor import (
        IvectorExtractor,
        extract_ivectors,
        length_normalize,
        train_ivector_extractor,
    )
    from montreal_forced_aligner_tpu.ivector.kaldi_model import (
        is_reference_archive,
    )
    from montreal_forced_aligner_tpu.ivector.plda import Plda
    from montreal_forced_aligner_tpu.ivector.ubm import train_ubm

    batches, spk = ivector_setup
    ubm = train_ubm(batches, num_gauss=4, num_init_iterations=3,
                    num_iterations=1)
    ex = train_ivector_extractor(batches, ubm, ivector_dim=4,
                                 num_iterations=2, gaussian_min_count=1.0)
    iv = length_normalize(extract_ivectors(ex, batches))
    ex.plda = Plda.train(iv, spk)
    p = tmp_path / "model.ivector"
    ex.save(p)  # reference extension -> reference archive form
    assert is_reference_archive(p)
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
    assert {"final.ie", "final.dubm", "plda", "meta.json"} <= names
    ex2 = IvectorExtractor.load(p)
    # full-covariance Sigma^-1 comes back from final.ie and is diagonal
    # (this framework trains diagonal)
    assert ex2.sigma_inv is not None
    # Kaldi's ivector_dim counts the folded prior-offset column: the
    # written model is (R+1)-dimensional and self-consistent with its
    # PLDA (reference ivector-extract semantics)
    assert ex2.ivector_dim == ex.ivector_dim + 1
    assert ex2.center_means is not None
    np.testing.assert_allclose(ex2.center_means, ex.ubm.means, atol=1e-5)
    iv_native = extract_ivectors(ex, batches)
    iv2 = extract_ivectors(ex2, batches)
    assert iv2.shape[1] == ex.ivector_dim + 1
    # the written model is the JOINT K-dim Kaldi model (the folded-offset
    # coordinate couples in the posterior), so the free coordinates track
    # the native conditional extraction rather than equal it bit-for-bit
    for d in range(ex.ivector_dim):
        c = np.corrcoef(iv2[:, d + 1], iv_native[:, d])[0, 1]
        assert c > 0.9, f"dim {d}: corr {c}"
    # the padded PLDA scores the K-dim vectors consistently with the
    # native R-dim scoring: same-speaker pairs outscore different ones
    # and the score surfaces correlate strongly
    s_native = ex.plda.log_likelihood_ratio(iv_native, iv_native)
    s2 = ex2.plda.log_likelihood_ratio(iv2, iv2)
    off = ~np.eye(len(iv2), dtype=bool)
    c = np.corrcoef(s2[off], s_native[off])[0, 1]
    assert c > 0.95, f"PLDA score correlation {c}"
    same = np.asarray(spk)[:, None] == np.asarray(spk)[None, :]
    assert s2[same & off].mean() > s2[~same].mean()
    # PLDA free-space members round-trip bit-level (float64 members)
    np.testing.assert_allclose(
        ex2.plda.transform[1:, 1:], ex.plda.transform
    )
    np.testing.assert_allclose(ex2.plda.psi[1:], ex.plda.psi)
    # an imported Kaldi-form model re-exports VERBATIM (genuine archives
    # round-trip exactly)
    p2 = tmp_path / "reexport.ivector"
    ex2.save(p2)
    ex3 = IvectorExtractor.load(p2)
    np.testing.assert_allclose(ex3.T, ex2.T)
    np.testing.assert_allclose(ex3.center_means, ex2.center_means)
    np.testing.assert_allclose(
        extract_ivectors(ex3, batches), iv2, atol=1e-5
    )


def test_reference_archive_full_covariance(tmp_path):
    """A genuine Kaldi final.ie carries FULL-covariance SigmaInv; the
    E-step must honor the off-diagonals (not silently diagonalize)."""
    from montreal_forced_aligner_tpu.ivector.extractor import (
        IvectorExtractor,
        extract_ivectors,
    )
    from montreal_forced_aligner_tpu.ivector.kaldi_model import (
        load_reference_archive,
        save_reference_archive,
    )
    from montreal_forced_aligner_tpu.ivector.ubm import DiagUbm

    rng = np.random.RandomState(3)
    C, D, R = 4, 5, 3
    ubm = DiagUbm(
        weights=np.ones(C) / C,
        means=rng.randn(C, D),
        variances=np.abs(rng.rand(C, D)) + 0.5,
    )
    ex = IvectorExtractor(ubm=ubm, T=rng.randn(C, D, R).astype(np.float32))
    # full Sigma^-1 with real off-diagonal structure
    A = rng.randn(C, D, D) * 0.3
    ex.sigma_inv = np.stack(
        [a @ a.T + np.eye(D) for a in A]
    )
    p = tmp_path / "full_cov.ivector"
    save_reference_archive(ex, p)
    ex2 = load_reference_archive(p)
    np.testing.assert_allclose(ex2.sigma_inv, ex.sigma_inv, atol=1e-12)
    assert ex2.ivector_dim == R + 1  # Kaldi counts the offset column
    feats = rng.randn(2, 50, D).astype(np.float32)
    batches = [(jnp.asarray(feats), np.array([50, 50], np.int32))]
    iv_full = extract_ivectors(ex2, batches)
    ex_diag = IvectorExtractor(ubm=ubm, T=ex.T)  # diagonal fallback
    iv_diag = extract_ivectors(ex_diag, batches)
    assert np.abs(iv_full[:, 1:] - iv_diag).max() > 1e-3


def test_tmatrix_em_recovers_latents():
    """Model-based correctness: synthesize features exactly from the
    total-variability model and verify EM recovers the latent w (up to a
    linear transform)."""
    from montreal_forced_aligner_tpu.ivector.extractor import (
        extract_ivectors,
        train_ivector_extractor,
    )
    from montreal_forced_aligner_tpu.ivector.ubm import DiagUbm

    rng = np.random.RandomState(1)
    C, D, R = 6, 10, 3
    means = rng.randn(C, D) * 5
    variances = np.ones((C, D)) * 0.5
    ubm = DiagUbm(np.ones(C) / C, means, variances)
    T_true = rng.randn(C, D, R)
    batches, true_w = [], []
    n_utts, T_frames = 40, 200
    for lo in range(0, n_utts, 8):
        B = min(8, n_utts - lo)
        feats = np.zeros((B, T_frames, D), np.float32)
        for b in range(B):
            w = rng.randn(R)
            true_w.append(w)
            comps = rng.randint(0, C, T_frames)
            for t, c in enumerate(comps):
                feats[b, t] = (
                    means[c] + T_true[c] @ w + rng.randn(D) * np.sqrt(0.5)
                )
        batches.append((jnp.asarray(feats), np.full(B, T_frames, np.int32)))
    true_w = np.stack(true_w)
    ex = train_ivector_extractor(
        batches, ubm, ivector_dim=R, num_iterations=8, gaussian_min_count=1.0
    )
    w_est = extract_ivectors(ex, batches)
    x = w_est - w_est.mean(0)
    y = true_w - true_w.mean(0)
    proj, *_ = np.linalg.lstsq(x, y, rcond=None)
    r2 = 1 - ((x @ proj - y) ** 2).sum() / (y**2).sum()
    assert r2 > 0.95


def test_clustering_algorithms_on_blobs():
    """Every ClusterType recovers three well-separated gaussian blobs
    (reference dispatch: diarization/multiprocessing.py:245-465)."""
    import numpy as np

    from montreal_forced_aligner_tpu.diarization.clustering import (
        calculate_distance_threshold,
        cluster_matrix,
        euclidean_distance_matrix,
        silhouette_score,
    )

    rng = np.random.RandomState(7)
    centers = np.array([[0.0, 0.0], [8.0, 0.0], [0.0, 8.0]])
    x = np.concatenate(
        [c + 0.4 * rng.randn(20, 2) for c in centers], axis=0
    )
    truth = np.repeat(np.arange(3), 20)

    def purity(labels):
        # fraction of points whose cluster's majority truth matches them,
        # noise (-1) counts as wrong
        correct = 0
        for c in np.unique(labels[labels >= 0]):
            members = labels == c
            vals, counts = np.unique(truth[members], return_counts=True)
            correct += counts.max()
        return correct / len(truth)

    for method, kwargs in [
        ("kmeans", dict(num_clusters=3)),
        ("spectral", dict(num_clusters=3)),
        ("agglomerative", dict(num_clusters=3)),
        ("dbscan", dict(distance_threshold=1.5, min_cluster_size=5)),
        ("optics", dict(distance_threshold=1.5, min_cluster_size=5)),
        ("hdbscan", dict(distance_threshold=1.5, min_cluster_size=5)),
        ("meanshift", dict()),
        ("affinity", dict()),
    ]:
        labels = cluster_matrix(x, method, metric="euclidean", **kwargs)
        found = np.unique(labels[labels >= 0]).shape[0]
        assert found >= 3, (method, found)
        assert purity(labels) >= 0.9, (method, purity(labels))

    # auto threshold: must fall between within-blob and between-blob scales
    D = euclidean_distance_matrix(x)
    thr = calculate_distance_threshold(D, min_samples=5)
    assert 0.1 < thr < 8.0
    # silhouette on the true labels is high for separated blobs
    assert silhouette_score(D, truth) > 0.7


def test_cluster_matrix_auto_threshold_density():
    """dbscan/optics with no explicit threshold derive one from the k-NN
    knee and still find the blobs."""
    import numpy as np

    from montreal_forced_aligner_tpu.diarization.clustering import cluster_matrix

    rng = np.random.RandomState(3)
    centers = np.array([[0.0, 0.0], [10.0, 0.0]])
    x = np.concatenate([c + 0.3 * rng.randn(25, 2) for c in centers], axis=0)
    for method in ("dbscan", "optics"):
        labels = cluster_matrix(x, method, metric="euclidean", min_cluster_size=5)
        assert np.unique(labels[labels >= 0]).shape[0] == 2, method


def test_purity_and_ari():
    from montreal_forced_aligner_tpu.diarization.clustering import (
        adjusted_rand_index,
        cluster_purity,
    )

    truth = ["a", "a", "a", "b", "b", "b"]
    assert cluster_purity(truth, [0, 0, 0, 1, 1, 1]) == 1.0
    assert adjusted_rand_index(truth, [0, 0, 0, 1, 1, 1]) == 1.0
    # label permutation is irrelevant
    assert adjusted_rand_index(truth, [5, 5, 5, 2, 2, 2]) == 1.0
    mixed = cluster_purity(truth, [0, 0, 1, 1, 0, 1])
    assert mixed < 1.0
    assert adjusted_rand_index(truth, [0, 0, 1, 1, 0, 1]) < 0.5
    # everything in one cluster: purity = majority fraction, ARI = 0
    assert cluster_purity(truth, [0] * 6) == 0.5
    assert abs(adjusted_rand_index(truth, [0] * 6)) < 1e-9


def test_train_ivector_cli_plda_and_classify(tmp_path):
    """train_ivector bundles PLDA; diarize --classify reassigns mislabeled
    utterances; --metric plda clustering (reference --classify/--cluster,
    DistanceMetric.plda)."""
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli
    from montreal_forced_aligner_tpu.io.wav import write_wave
    from montreal_forced_aligner_tpu.ivector.extractor import IvectorExtractor

    rng = np.random.RandomState(3)
    corpus = tmp_path / "corpus"
    for spk in (0, 1):
        d = corpus / f"spk{spk}"
        d.mkdir(parents=True)
        for u in range(4):
            write_wave(
                d / f"u{u}.wav", make_speaker_wave(rng, spk, 5.0), SR
            )
            (d / f"u{u}.lab").write_text("x")
    # mislabel one utterance: put a spk1 recording under spk0
    write_wave(
        corpus / "spk0" / "u9.wav", make_speaker_wave(rng, 1, 5.0), SR
    )
    (corpus / "spk0" / "u9.lab").write_text("x")

    model = tmp_path / "ivec.npz"
    runner = CliRunner()
    r = runner.invoke(
        cli,
        ["train_ivector", str(corpus), str(model), "--num_gauss", "8",
         "--ivector_dim", "4", "--num_iterations", "3", "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "Trained PLDA over 2 speakers" in r.output
    assert IvectorExtractor.load(model).plda is not None

    out = tmp_path / "diar"
    r = runner.invoke(
        cli,
        ["diarize_speakers", str(corpus), str(model), str(out),
         "--classify", "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "reassigned" in r.output
    rows = [
        l.split("\t")
        for l in (out / "utt2spk.tsv").read_text().strip().splitlines()
    ]
    by_utt = {r0[0]: r0[3] for r0 in rows}
    # classification labels are real speaker names, and most utterances
    # keep their label (the synthetic "speakers" are a weak proxy, so the
    # planted mislabel is not guaranteed to flip)
    assert set(by_utt.values()) <= {"spk0", "spk1"}
    kept = sum(k.split("/")[0] == v for k, v in by_utt.items())
    assert kept >= len(by_utt) - 3

    # PLDA-metric clustering runs end to end
    r = runner.invoke(
        cli,
        ["diarize_speakers", str(corpus), str(model), str(out),
         "--metric", "plda", "--expected_num_speakers", "2",
         "--batch_size", "4", "--evaluate"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "purity" in r.output


def test_sliding_cmn_matches_kaldi_loop():
    """sliding_cmn reproduces a literal per-frame transcription of Kaldi's
    SlidingWindowCmnInternal (feat/feature-functions.cc) window arithmetic,
    including edge shifting, short utterances, and batch padding."""
    import numpy as np

    from montreal_forced_aligner_tpu.ops.feats import sliding_cmn

    def kaldi_ref(x, cmn_window, min_window, center, norm_var):
        T, D = x.shape
        out = np.empty_like(x)
        for t in range(T):
            if center:
                ws = t - cmn_window // 2
                we = ws + cmn_window
            else:
                ws = t - cmn_window
                we = t + 1
            if ws < 0:
                we -= ws
                ws = 0
            if not center:
                if we > t:
                    we = max(t + 1, min_window)
            if we > T:
                ws -= we - T
                we = T
                if ws < 0:
                    ws = 0
            win = x[ws:we]
            mean = win.mean(axis=0)
            out[t] = x[t] - mean
            if norm_var:
                var = np.maximum(win.var(axis=0), 1e-10)
                out[t] /= np.sqrt(var)
        return out

    rng = np.random.RandomState(3)
    lens = [7, 50, 299, 300, 412]
    T = max(lens)
    D = 5
    feats = rng.randn(len(lens), T, D).astype(np.float32)
    for center in (True, False):
        for norm_var in (False, True):
            got = np.asarray(
                sliding_cmn(
                    feats,
                    np.array(lens, np.int32),
                    cmn_window=300,
                    min_window=100,
                    center=center,
                    normalize_variance=norm_var,
                )
            )
            for b, L in enumerate(lens):
                ref = kaldi_ref(
                    feats[b, :L].astype(np.float64), 300, 100, center, norm_var
                )
                np.testing.assert_allclose(
                    got[b, :L], ref, rtol=2e-4, atol=2e-4,
                    err_msg=f"center={center} var={norm_var} len={L}",
                )
                # padded frames pass through untouched
                np.testing.assert_array_equal(got[b, L:], feats[b, L:])


def test_cluster_visualization(tmp_path):
    """manifold_points produces a 2D embedding for every algorithm and
    plot_clusters writes the tab20 scatter (reference visualize_clusters,
    diarization/multiprocessing.py:113 + speaker_diarizer.py:560)."""
    from montreal_forced_aligner_tpu.diarization.visualization import (
        manifold_points,
        plot_clusters,
    )

    rng = np.random.RandomState(0)
    iv = np.vstack(
        [rng.randn(12, 6) + 4 * off for off in range(3)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 12)
    labels[0] = -1  # noise point renders black
    for algo in ("tsne", "mds", "spectral", "isomap"):
        pts = manifold_points(iv, algorithm=algo, metric="cosine", quick=True)
        assert pts.shape == (36, 2)
    path = plot_clusters(pts, labels, tmp_path / "cluster_plot.png")
    assert path.exists() and path.stat().st_size > 1000


def test_diarize_cli_visualize(tmp_path):
    """diarize_speakers --visualize writes cluster_plot.png."""
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli
    from montreal_forced_aligner_tpu.io.wav import write_wave

    rng = np.random.RandomState(5)
    corpus = tmp_path / "corpus"
    for spk in (0, 1):
        d = corpus / f"spk{spk}"
        d.mkdir(parents=True)
        for u in range(3):
            write_wave(d / f"u{u}.wav", make_speaker_wave(rng, spk, 4.0), SR)
            (d / f"u{u}.lab").write_text("x")
    model = tmp_path / "ivec.npz"
    runner = CliRunner()
    r = runner.invoke(
        cli,
        ["train_ivector", str(corpus), str(model), "--num_gauss", "8",
         "--ivector_dim", "4", "--num_iterations", "2", "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    out = tmp_path / "diar"
    r = runner.invoke(
        cli,
        ["diarize_speakers", str(corpus), str(model), str(out),
         "--expected_num_speakers", "2", "--batch_size", "4",
         "--visualize", "--manifold_algorithm", "tsne"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "cluster plot" in r.output
    assert (out / "cluster_plot.png").exists()


def test_diarize_cli_exports_relabeled_files(tmp_path):
    """diarize_speakers writes parameters.yaml and relabeled transcript
    files (reference SpeakerDiarizer.export_files)."""
    import yaml
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli
    from montreal_forced_aligner_tpu.io.wav import write_wave

    rng = np.random.RandomState(11)
    corpus = tmp_path / "corpus"
    for spk in (0, 1):
        d = corpus / f"spk{spk}"
        d.mkdir(parents=True)
        for u in range(3):
            write_wave(d / f"u{u}.wav", make_speaker_wave(rng, spk, 4.0), SR)
            (d / f"u{u}.lab").write_text("hello there")
    model = tmp_path / "ivec.npz"
    runner = CliRunner()
    r = runner.invoke(
        cli,
        ["train_ivector", str(corpus), str(model), "--num_gauss", "8",
         "--ivector_dim", "4", "--num_iterations", "2", "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    out = tmp_path / "diar"
    r = runner.invoke(
        cli,
        ["diarize_speakers", str(corpus), str(model), str(out),
         "--expected_num_speakers", "2", "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    params = yaml.safe_load((out / "parameters.yaml").read_text())
    assert params["expected_num_speakers"] == 2
    # whole-file (.lab) utterances export relabeled as .lab text files,
    # mirroring the corpus-relative layout
    labs = sorted(out.rglob("*.lab"))
    assert len(labs) == 6
    assert labs[0].read_text() == "hello there"
