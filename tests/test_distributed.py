"""SPMD (mesh-sharded) production pipelines on the 8-virtual-device mesh.

The distributed path is the product path (``mfa-tpu align --distributed`` /
``mfa-tpu train --distributed``), not a library demo: these tests run the
REAL TrainingPipeline / PretrainedAligner batch loops sharded over the mesh
and require the results to match the single-device run (reference scaling
analogue: speaker-sharded worker jobs + parent accumulator sums,
``utils.py:1505-1641``, ``corpus/base.py:922-1035``).
"""

import numpy as np
import pytest

from helpers import build_synthetic_corpus, build_synthetic_model
from test_training import WORD_PHONES, make_training_corpus

from montreal_forced_aligner_tpu.align.aligner import (
    AlignerConfig,
    PretrainedAligner,
)
from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.training.base import TrainerConfig
from montreal_forced_aligner_tpu.training.trainer import (
    StageConfig,
    TrainableAligner,
)

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


RECIPE = [
    StageConfig("monophone", "mono", 4, 40),
    StageConfig("triphone", "tri", 3, 64, num_leaves=48),
]


def _train(corpus_dir, dict_path, distributed):
    ta = TrainableAligner(
        corpus_dir,
        dict_path,
        recipe=RECIPE,
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4,
        variable_length_topology=False,
        distributed=distributed,
    )
    final = ta.train()
    return ta, final


@pytest.fixture(scope="module")
def train_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist_train")
    corpus_dir, truths = make_training_corpus(tmp, n_utts=10)
    dict_path = tmp / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    single = _train(corpus_dir, dict_path, distributed=False)
    dist = _train(corpus_dir, dict_path, distributed=True)
    return single, dist


def test_training_mesh_engaged(train_pair):
    (ta_s, _), (ta_d, _) = train_pair
    assert ta_s.mesh is None
    assert ta_d.mesh is not None
    assert int(np.prod(ta_d.mesh.devices.shape)) == len(jax.devices())


def test_training_matches_single_device(train_pair):
    """The sharded EM run reproduces the single-device run: same tree,
    same transition model, per-iteration loglikes within float tolerance."""
    (ta_s, m_s), (ta_d, m_d) = train_pair
    assert m_s.gmm.num_pdfs == m_d.gmm.num_pdfs
    np.testing.assert_allclose(
        m_s.transition_model.log_probs,
        m_d.transition_model.log_probs,
        atol=1e-4,
    )
    for stage in ("monophone", "triphone"):
        ll_s = [e["loglike_per_frame"] for e in ta_s.trainers[stage].iteration_log]
        ll_d = [e["loglike_per_frame"] for e in ta_d.trainers[stage].iteration_log]
        np.testing.assert_allclose(ll_s, ll_d, atol=2e-3)
        g_s = [e["num_gaussians"] for e in ta_s.trainers[stage].iteration_log]
        g_d = [e["num_gaussians"] for e in ta_d.trainers[stage].iteration_log]
        assert g_s == g_d


def test_aligner_bit_parity(tmp_path):
    """Distributed alignment produces identical intervals and scores."""
    model_path, dict_path = build_synthetic_model(tmp_path)
    corpus_dir, _ = build_synthetic_corpus(tmp_path)
    corpus = Corpus.load(corpus_dir)
    out = {}
    for dist in (False, True):
        al = PretrainedAligner(
            model_path,
            dict_path,
            AlignerConfig(
                batch_size=4, frame_bucket_multiple=32, distributed=dist
            ),
        )
        assert (al.mesh is not None) == dist
        out[dist] = al.align_corpus(corpus)
    assert set(out[False]) == set(out[True])
    for i in out[False]:
        a, b = out[False][i], out[True][i]
        assert [(p.label, p.begin, p.end) for p in a.phones] == [
            (p.label, p.begin, p.end) for p in b.phones
        ]
        assert abs(a.log_likelihood - b.log_likelihood) < 1e-3


def test_sat_model_distributed_two_pass(train_pair, tmp_path):
    """Distributed two-pass (fMLLR) alignment through the mesh: train a tiny
    SAT stage on top, then align distributed and compare to single-device."""
    # reuse the triphone model as the base; run a 2-iteration SAT stage
    (ta_s, _), _ = train_pair
    corpus_dir = ta_s.corpus  # Corpus object
    # build a small SAT model via a fresh recipe including sat
    tmp = tmp_path
    cdir, truths = make_training_corpus(tmp, n_utts=8)
    dict_path = tmp / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    recipe = RECIPE + [StageConfig("sat", "sat", 3, 64, num_leaves=48)]
    ta = TrainableAligner(
        cdir, dict_path, recipe=recipe,
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, variable_length_topology=False, distributed=True,
    )
    final = ta.train()
    assert final.alignment_model is not None
    model_path = tmp / "sat_model.zip"
    final.save(model_path)
    corpus = Corpus.load(cdir)
    out = {}
    for dist in (False, True):
        al = PretrainedAligner(
            model_path, dict_path,
            AlignerConfig(
                batch_size=4, frame_bucket_multiple=32, distributed=dist
            ),
        )
        out[dist] = al.align_corpus(corpus)
    for i in out[False]:
        a, b = out[False][i], out[True][i]
        la = [(p.label, p.begin, p.end) for p in a.phones]
        lb = [(p.label, p.begin, p.end) for p in b.phones]
        # fMLLR estimation reduces in a different order on the mesh; allow
        # single-frame boundary drift on ties but identical phone sequences
        assert [x[0] for x in la] == [x[0] for x in lb]
        drift = [
            max(abs(x[1] - y[1]), abs(x[2] - y[2])) for x, y in zip(la, lb)
        ]
        assert max(drift) <= 0.011, drift


def test_cli_align_distributed(tmp_path):
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli

    model_path, dict_path = build_synthetic_model(tmp_path)
    corpus_dir, _ = build_synthetic_corpus(tmp_path)
    out_dir = tmp_path / "out_tg"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "align", str(corpus_dir), str(dict_path), str(model_path),
            str(out_dir), "--batch_size", "4", "--distributed",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    tgs = list(out_dir.glob("*.TextGrid"))
    assert len(tgs) == 1


def test_cli_train_two_process(tmp_path):
    """Simulated multi-host THROUGH THE CLI: two OS processes x 4 virtual
    CPU devices form one 8-device global mesh via jax.distributed, each
    running ``mfa-tpu train --distributed`` on the shared corpus (speakers
    sharded per host); the resulting models must agree with each other and
    with a single-process run (same global statistics, so the same EM
    trajectory up to float reduction order)."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    import yaml

    from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=8)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    (out_dir / "recipe.yaml").write_text(
        yaml.safe_dump(
            {
                "training": [
                    {"monophone": {"num_iterations": 3, "max_gaussians": 30}},
                    {"pronunciation_probabilities": {}},
                    {
                        "triphone": {
                            "num_iterations": 2,
                            "max_gaussians": 48,
                            "num_leaves": 32,
                        }
                    },
                ]
            }
        )
    )
    # single-process reference (same recipe through the library)
    ref = TrainableAligner(
        corpus_dir, dict_path,
        recipe=[
            StageConfig("monophone", "mono", 3, 30),
            StageConfig("pron_prob", "pron_prob", 0, 0),
            StageConfig("triphone", "tri", 2, 48, num_leaves=32),
        ],
        batch_size=4, variable_length_topology=False, distributed=False,
    )
    m_ref = ref.train()

    port = 14000 + (os.getpid() % 2000)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = str(Path(__file__).parent.parent) + (
        ":" + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    worker = Path(__file__).parent / "multihost_cli_worker.py"
    outs_paths = [out_dir / f"model_p{pid}.zip" for pid in range(2)]
    procs = [
        subprocess.Popen(
            [
                _sys.executable, str(worker), str(pid), "2", str(port),
                str(corpus_dir), str(dict_path), str(outs_paths[pid]),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append((p.returncode, out, err))
    for rc, out, err in results:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    m0 = AcousticModel.load(outs_paths[0])
    m1 = AcousticModel.load(outs_paths[1])
    # both hosts converge to the same model (stats are globally reduced)
    assert m0.gmm.num_pdfs == m1.gmm.num_pdfs == m_ref.gmm.num_pdfs
    np.testing.assert_allclose(
        m0.transition_model.log_probs, m1.transition_model.log_probs,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        m0.transition_model.log_probs, m_ref.transition_model.log_probs,
        atol=1e-3,
    )


def test_cli_align_two_process(tmp_path):
    """Multi-host alignment THROUGH THE CLI: two jax.distributed processes
    align the shared corpus, each exporting its own speakers' files; the
    union equals a single-process run's output."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    from helpers import build_synthetic_model
    from test_training import WORD_PHONES, make_training_corpus

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=6)
    # synthetic model whose phones cover the training corpus' tones
    import numpy as np

    from montreal_forced_aligner_tpu.io.wav import read_wave

    first_wav = sorted(corpus_dir.rglob("*.wav"))[0]
    model_path, dict_path = build_synthetic_model(
        tmp_path, wave=read_wave(first_wav).samples
    )
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    # single-process reference
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    al = PretrainedAligner(
        model_path, dict_path,
        AlignerConfig(batch_size=4, frame_bucket_multiple=32),
    )
    corpus = Corpus.load(corpus_dir)
    results = al.align_corpus(corpus)
    ref_out = tmp_path / "ref_out"
    ref_files = {p.name for p in al.export_textgrids(corpus, results, ref_out)}

    port = 15000 + (os.getpid() % 2000)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = str(Path(__file__).parent.parent) + (
        ":" + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    worker = Path(__file__).parent / "multihost_align_worker.py"
    out_dir = tmp_path / "mh_out"
    procs = [
        subprocess.Popen(
            [
                _sys.executable, str(worker), str(pid), "2", str(port),
                str(corpus_dir), str(dict_path), str(model_path),
                str(out_dir),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    got = {p.name for p in out_dir.rglob("*.TextGrid")}
    assert got == ref_files


def test_cli_validate_two_process(tmp_path):
    """Multi-host ``validate --test_transcriptions`` THROUGH THE CLI: the
    per-speaker-LM decode shards speakers onto hosts (reference analogue:
    speaker-sharded TrainSpeakerLmFunction + PerSpeakerDecodeFunction jobs,
    ``language_modeling/multiprocessing.py:247``,
    ``transcription/multiprocessing.py:1454``); the hosts' decode counts
    partition the corpus."""
    import os
    import re
    import subprocess
    import sys as _sys
    from pathlib import Path

    from helpers import build_synthetic_model

    from montreal_forced_aligner_tpu.io.wav import read_wave

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=6)
    first_wav = sorted(corpus_dir.rglob("*.wav"))[0]
    model_path, dict_path = build_synthetic_model(
        tmp_path, wave=read_wave(first_wav).samples
    )
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    port = 17200 + (os.getpid() % 2000)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = str(Path(__file__).parent.parent) + (
        ":" + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    worker = Path(__file__).parent / "multihost_validate_worker.py"
    procs = [
        subprocess.Popen(
            [
                _sys.executable, str(worker), str(pid), "2", str(port),
                str(corpus_dir), str(dict_path), str(model_path),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    counts = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        m = re.search(r"DECODED (\d+)", out)
        assert m, out
        counts.append(int(m.group(1)))
    # two speakers, six utterances: each host owns one speaker's utterances
    assert sum(counts) == 6
    assert all(0 < c < 6 for c in counts)


def test_cli_train_distributed(tmp_path):
    import yaml
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli

    corpus_dir, _truths = make_training_corpus(tmp_path, n_utts=6)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    cfg = tmp_path / "recipe.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "training": [
                    {"monophone": {"num_iterations": 3, "max_gaussians": 30}},
                ]
            }
        )
    )
    out_model = tmp_path / "model.zip"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "train", str(corpus_dir), str(dict_path), str(out_model),
            "--config_path", str(cfg), "--batch_size", "4",
            "--distributed", "--chain_topology",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert out_model.exists()
    from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel

    m = AcousticModel.load(out_model)
    assert m.gmm.num_pdfs > 0
