"""Error-surface tests (VERDICT r2 weak #6 / next-round #9): the top
user-facing failures map to typed exceptions with actionable messages, and
the CLI exits non-zero with a one-paragraph diagnosis instead of a
traceback (reference ``exceptions.py:72-961``)."""

import numpy as np
import pytest
from click.testing import CliRunner

from montreal_forced_aligner_tpu.cli import cli
from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.exceptions import (
    AllOovError,
    DictionaryParseError,
    EmptyCorpusError,
    MFAError,
    NoTranscriptsError,
    PhoneMismatchError,
)
from montreal_forced_aligner_tpu.io.wav import probe_wave, write_wave

SR = 16000


def test_empty_corpus_error(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(EmptyCorpusError) as e:
        Corpus.load(tmp_path / "empty")
    assert "No sound files" in str(e.value)
    assert "--audio_directory" in str(e.value)
    # backwards compatible with callers catching FileNotFoundError
    assert isinstance(e.value, FileNotFoundError)


def test_no_transcripts_error(tmp_path):
    d = tmp_path / "corpus" / "spk"
    d.mkdir(parents=True)
    write_wave(d / "a.wav", np.zeros(SR, np.float32), SR)
    with pytest.raises(NoTranscriptsError) as e:
        Corpus.load(tmp_path / "corpus")
    msg = str(e.value)
    assert "1 sound files" in msg and ".lab" in msg and ".TextGrid" in msg


def test_dictionary_parse_error_line_numbers(tmp_path):
    p = tmp_path / "bad.dict"
    p.write_text("hello HH AH L OW\nworld\n")
    from montreal_forced_aligner_tpu.dictionary.lexicon import (
        parse_dictionary_file,
    )

    with pytest.raises(DictionaryParseError) as e:
        list(parse_dictionary_file(p))
    msg = str(e.value)
    assert "line 2" in msg and "world" in msg and "no pronunciation" in msg
    assert isinstance(e.value, ValueError)  # backwards compatible


def test_phone_mismatch_error(tmp_path):
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    _corpus_dir, wave = build_synthetic_corpus(tmp_path)
    model, _dict_path = build_synthetic_model(tmp_path, wave=wave)
    alien = tmp_path / "alien.dict"
    alien.write_text("hello\tQQ ZZ\n")
    with pytest.raises(PhoneMismatchError) as e:
        PretrainedAligner(model, alien, AlignerConfig())
    msg = str(e.value)
    assert "QQ" in msg and "ZZ" in msg
    assert "phone set" in msg  # names the likely cause


def test_all_oov_error(tmp_path):
    from test_training import make_training_corpus

    from montreal_forced_aligner_tpu.training.trainer import (
        StageConfig,
        TrainableAligner,
    )

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=3)
    d = tmp_path / "alien.dict"
    d.write_text("zzz\taa\n")  # shares no words with the corpus
    ta = TrainableAligner(
        corpus_dir, d, recipe=[StageConfig("monophone", "mono", 2, 10)],
        batch_size=2, variable_length_topology=False, distributed=False,
    )
    with pytest.raises(AllOovError) as e:
        ta.train()
    msg = str(e.value)
    assert "validate" in msg and "g2p" in msg  # actionable next steps


def test_cli_diagnosis_not_traceback(tmp_path):
    """The CLI surfaces MFAErrors as one-paragraph diagnoses with exit
    code != 0 (no raw traceback)."""
    (tmp_path / "empty").mkdir()
    d = tmp_path / "x.dict"
    d.write_text("a\taa\n")
    r = CliRunner().invoke(
        cli,
        ["validate", str(tmp_path / "empty"), str(d)],
    )
    assert r.exit_code != 0
    assert "No sound files" in r.output
    assert "Traceback" not in r.output


def test_probe_wave_truncated_and_unreadable(tmp_path):
    good = tmp_path / "good.wav"
    write_wave(good, np.zeros(SR, np.float32), SR)
    info = probe_wave(good)
    assert info["issue"] is None
    assert info["sample_rate"] == SR
    assert info["duration"] == pytest.approx(1.0, abs=1e-3)

    # truncate: cut the file in half
    trunc = tmp_path / "trunc.wav"
    data = good.read_bytes()
    trunc.write_bytes(data[: len(data) // 2])
    info = probe_wave(trunc)
    assert info["issue"] == "truncated"
    assert "cut short" in info["detail"]

    junk = tmp_path / "junk.wav"
    junk.write_bytes(b"this is not audio at all........")
    info = probe_wave(junk)
    assert info["issue"] == "unreadable"


def test_probe_wave_large_metadata_chunk(tmp_path):
    """A valid WAV whose pre-data LIST chunk exceeds any fixed read buffer
    still probes correctly (chunk-by-chunk seek, not a 64 KiB scan)."""
    import struct as _struct

    n = SR // 2
    pcm = np.zeros(n, np.int16).tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)
    big = b"\x00" * (128 * 1024)  # 128 KiB of metadata before fmt/data
    chunks = (
        b"LIST" + _struct.pack("<I", len(big)) + big
        + b"fmt " + _struct.pack("<I", 16) + fmt
        + b"data" + _struct.pack("<I", len(pcm)) + pcm
    )
    f = tmp_path / "bigmeta.wav"
    f.write_bytes(b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    info = probe_wave(f)
    assert info["issue"] is None, info
    assert info["sample_rate"] == SR
    assert info["duration"] == pytest.approx(0.5, abs=1e-3)


def test_untranscribed_corpus_loads_for_transcription(tmp_path):
    """With require_transcripts=False (transcribe/diarize/VAD workflows),
    untranscribed sound files become whole-file empty-text utterances
    (reference sound-file-only corpus loading) instead of a hard error."""
    d = tmp_path / "corpus" / "spk"
    d.mkdir(parents=True)
    write_wave(d / "a.wav", np.zeros(SR, np.float32), SR)
    corpus = Corpus.load(tmp_path / "corpus", require_transcripts=False)
    assert len(corpus.utterances) == 1
    u = corpus.utterances[0]
    assert u.text == "" and u.speaker == "spk"


def test_validate_reports_file_pathologies(tmp_path):
    """`mfa-tpu validate` surfaces truncated files and per-speaker sample
    rate mixtures in its report (reference corpus_validator wav triage)."""
    corp = tmp_path / "corpus" / "spk0"
    corp.mkdir(parents=True)
    write_wave(corp / "a.wav", np.zeros(SR, np.float32), SR)
    (corp / "a.lab").write_text("hello")
    write_wave(corp / "b.wav", np.zeros(8000, np.float32), 8000)
    (corp / "b.lab").write_text("hello")
    # truncated file
    data = (corp / "a.wav").read_bytes()
    (corp / "c.wav").write_bytes(data[: len(data) // 2])
    (corp / "c.lab").write_text("hello")
    d = tmp_path / "x.dict"
    d.write_text("hello\taa\n")
    out = tmp_path / "report"
    r = CliRunner().invoke(
        cli,
        ["validate", str(tmp_path / "corpus"), str(d), "--ignore_acoustics",
         "--output_directory", str(out)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "Sound file issues" in r.output
    assert "truncated" in r.output
    assert "mixed_sample_rates" in r.output
    report = (out / "sound_file_issues.txt").read_text()
    assert "truncated" in report and "mixed_sample_rates" in report


def test_probe_wave_header_truncated(tmp_path):
    """Files cut short inside their own headers report as unreadable
    rather than crashing the audit."""
    f = tmp_path / "stub.flac"
    f.write_bytes(b"fLaC\x00\x00\x00\x22")  # marker + nothing else
    info = probe_wave(f)
    assert info["issue"] == "unreadable"
    w = tmp_path / "stub.wav"
    w.write_bytes(b"RIFF\x24\x00\x00\x00WAVEfmt ")  # header cut mid-chunk
    info = probe_wave(w)
    assert info["issue"] == "unreadable"


def test_num_jobs_compat_flag(tmp_path):
    """-j/--num_jobs is accepted on the main commands for reference-script
    compatibility (parallelism is batch/device-driven here)."""
    from helpers import build_synthetic_corpus, build_synthetic_model

    corpus_dir, wave = build_synthetic_corpus(tmp_path)
    model, dict_path = build_synthetic_model(tmp_path, wave=wave)
    r = CliRunner().invoke(
        cli,
        ["align", str(corpus_dir), str(dict_path), str(model),
         str(tmp_path / "o"), "-j", "8"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert list((tmp_path / "o").rglob("*.TextGrid"))


def test_untranscribed_corpus_transcribe_requires_lm(tmp_path):
    """Transcribing an untranscribed corpus without --language_model_path
    raises an actionable LanguageModelError instead of silently decoding
    against an empty LM."""
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.exceptions import LanguageModelError
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        Transcriber,
    )

    _, wave = build_synthetic_corpus(tmp_path)
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    d = tmp_path / "untr" / "spk"
    d.mkdir(parents=True)
    write_wave(d / "a.wav", np.zeros(SR, np.float32), SR)
    corpus = Corpus.load(tmp_path / "untr", require_transcripts=False)
    tr = Transcriber(model_path, dict_path, batch_size=4)
    with pytest.raises(LanguageModelError) as e:
        tr.transcribe_corpus(corpus)
    assert "--language_model_path" in str(e.value)


def test_empty_lab_files_become_empty_utterances(tmp_path):
    """With require_transcripts=False, a wav with an EMPTY .lab is
    processed like a wav with no transcript at all (reference
    sound-file-only semantics), not silently dropped."""
    d = tmp_path / "corpus" / "spk"
    d.mkdir(parents=True)
    write_wave(d / "a.wav", np.zeros(SR, np.float32), SR)
    (d / "a.lab").write_text("")  # placeholder export artifact
    write_wave(d / "b.wav", np.zeros(SR, np.float32), SR)
    corpus = Corpus.load(tmp_path / "corpus", require_transcripts=False)
    assert sorted(u.file_name for u in corpus.utterances) == ["a", "b"]
    assert all(u.text == "" for u in corpus.utterances)
