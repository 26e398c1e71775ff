"""Per-iteration training checkpoints: a run killed mid-stage resumes from
the last finished iteration and reproduces the uninterrupted run
(reference: <iter>.mdl per iteration + skip-if-exists,
``acoustic_modeling/base.py:820-826``)."""

import numpy as np
import pytest

from test_training import WORD_PHONES, make_training_corpus

from montreal_forced_aligner_tpu.training.base import TrainerConfig
from montreal_forced_aligner_tpu.training.em import ViterbiEmTrainer
from montreal_forced_aligner_tpu.training.trainer import (
    StageConfig,
    TrainableAligner,
)


class _KillAt(Exception):
    pass


def _make(tmp_path, recipe, wd=None):
    corpus_dir = tmp_path / "train_corpus"
    if not corpus_dir.exists():
        make_training_corpus(tmp_path, n_utts=6)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    return TrainableAligner(
        corpus_dir, dict_path, recipe=recipe,
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, variable_length_topology=False, distributed=False,
        working_directory=wd,
    )


@pytest.mark.parametrize(
    "recipe,kill_stage,kill_iter",
    [
        # kill monophone at iteration 4 of 6
        ([StageConfig("monophone", "mono", 6, 40)], "mono", 4),
        # kill SAT at iteration 4 of 5 (after the iter-2 fMLLR estimation,
        # so the checkpoint carries speaker transforms + adapted features)
        (
            [
                StageConfig("monophone", "mono", 4, 30),
                StageConfig("triphone", "tri", 3, 48, num_leaves=32),
                StageConfig("sat", "sat", 5, 64, num_leaves=32),
            ],
            "sat",
            4,
        ),
    ],
)
def test_kill_and_resume_matches_uninterrupted(
    tmp_path, monkeypatch, recipe, kill_stage, kill_iter
):
    # 1. uninterrupted reference run
    ref = _make(tmp_path, recipe)
    m_ref = ref.train()

    # 2. interrupted run: die right after saving checkpoint `kill_iter`
    wd = tmp_path / "work"
    orig_save = ViterbiEmTrainer._save_iter_checkpoint

    def killer(self, it, pipeline, current_target):
        orig_save(self, it, pipeline, current_target)
        if self.train_type == kill_stage and it == kill_iter:
            raise _KillAt()

    monkeypatch.setattr(ViterbiEmTrainer, "_save_iter_checkpoint", killer)
    t1 = _make(tmp_path, recipe, wd=wd)
    with pytest.raises(_KillAt):
        t1.train()
    iters_dir = wd / recipe[-1].name / "iters"
    if kill_stage == recipe[-1].kind or kill_stage == "mono":
        pass  # directory location depends on which stage died
    found = list(wd.rglob("iters/*.npz"))
    assert found, "no per-iteration checkpoint written"

    # 3. resumed run reproduces the reference
    monkeypatch.setattr(ViterbiEmTrainer, "_save_iter_checkpoint", orig_save)
    t2 = _make(tmp_path, recipe, wd=wd)
    m_res = t2.train()
    last = recipe[-1].name
    resumed_trainer = t2.trainers[last]
    # the killed stage must NOT have rerun its early iterations
    logged = [e["iteration"] for e in resumed_trainer.iteration_log]
    assert logged == list(range(1, recipe[-1].num_iterations + 1))
    assert m_res.gmm.num_pdfs == m_ref.gmm.num_pdfs
    np.testing.assert_allclose(
        m_res.transition_model.log_probs,
        m_ref.transition_model.log_probs,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.sort(m_res.gmm.gconsts[np.isfinite(m_res.gmm.gconsts)]),
        np.sort(m_ref.gmm.gconsts[np.isfinite(m_ref.gmm.gconsts)]),
        atol=1e-3,
    )
    if kill_stage == "sat":
        st_ref = ref.trainers[last].speaker_transforms
        st_res = resumed_trainer.speaker_transforms
        np.testing.assert_allclose(st_res, st_ref, atol=1e-4)


def test_resume_skips_to_latest_iteration(tmp_path, monkeypatch):
    """The resumed stage starts exactly after the checkpointed iteration
    (no recomputation of finished iterations)."""
    recipe = [StageConfig("monophone", "mono", 5, 40)]
    wd = tmp_path / "work"
    orig_save = ViterbiEmTrainer._save_iter_checkpoint
    calls = []

    def killer(self, it, pipeline, current_target):
        orig_save(self, it, pipeline, current_target)
        calls.append(it)
        if it == 3:
            raise _KillAt()

    monkeypatch.setattr(ViterbiEmTrainer, "_save_iter_checkpoint", killer)
    t1 = _make(tmp_path, recipe, wd=wd)
    with pytest.raises(_KillAt):
        t1.train()
    assert calls == [1, 2, 3]

    iter_calls = []

    def spy(self, it, pipeline, current_target):
        orig_save(self, it, pipeline, current_target)
        iter_calls.append(it)

    monkeypatch.setattr(ViterbiEmTrainer, "_save_iter_checkpoint", spy)
    t2 = _make(tmp_path, recipe, wd=wd)
    t2.train()
    assert iter_calls == [4, 5]


def test_train_clean_flag_wipes_checkpoints(tmp_path):
    """train --clean removes prior working-directory state so nothing
    resumes (reference --clean semantics)."""
    import yaml
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli
    from test_training import WORD_PHONES, make_training_corpus

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=4)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    cfg = tmp_path / "recipe.yaml"
    cfg.write_text(yaml.safe_dump(
        {"training": [{"monophone": {"num_iterations": 2,
                                     "max_gaussians": 20}}]}
    ))
    wd = tmp_path / "wd"
    out = tmp_path / "m.zip"
    runner = CliRunner()
    args = ["train", str(corpus_dir), str(dict_path), str(out),
            "--config_path", str(cfg), "--batch_size", "4",
            "--chain_topology", "--working_directory", str(wd)]
    r = runner.invoke(cli, args, catch_exceptions=False)
    assert r.exit_code == 0, r.output
    marker = wd / "stale_marker"
    marker.write_text("x")
    r = runner.invoke(cli, args + ["--clean"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert "Cleaned working directory" in r.output
    assert not marker.exists()
    assert out.exists()


def test_run_state_marker(tmp_path, monkeypatch, caplog):
    """A run killed mid-stage leaves a 'running' marker; the resumed run
    warns about the unclean shutdown, and a changed configuration
    fingerprint adds a compatibility warning (reference workflow dirty
    flags + check_previous_run)."""
    import json
    import logging

    recipe = [StageConfig("monophone", "mono", 4, 30)]
    wd = tmp_path / "work"
    orig_save = ViterbiEmTrainer._save_iter_checkpoint

    def killer(self, it, pipeline, current_target):
        orig_save(self, it, pipeline, current_target)
        if it == 2:
            raise _KillAt()

    monkeypatch.setattr(ViterbiEmTrainer, "_save_iter_checkpoint", killer)
    t1 = _make(tmp_path, recipe, wd=wd)
    with pytest.raises(_KillAt):
        t1.train()
    state = json.loads((wd / "run_state.json").read_text())
    assert state["state"] == "running"

    monkeypatch.setattr(ViterbiEmTrainer, "_save_iter_checkpoint", orig_save)
    # resume with a DIFFERENT recipe: both warnings fire
    recipe2 = [StageConfig("monophone", "mono", 4, 40)]
    t2 = _make(tmp_path, recipe2, wd=wd)
    with caplog.at_level(logging.WARNING, logger="mfa_tpu"):
        t2.train()
    msgs = " ".join(r.message for r in caplog.records)
    assert "did not finish cleanly" in msgs
    assert "configuration differs" in msgs
    state = json.loads((wd / "run_state.json").read_text())
    assert state["state"] == "done"
