"""Tests for Kaldi-format model parsing and round-tripping."""

import io

import numpy as np
import pytest

from montreal_forced_aligner_tpu.io.kaldi_io import (
    KaldiBinaryReader,
    KaldiBinaryWriter,
)
from montreal_forced_aligner_tpu.models.acoustic_model import (
    AcousticModel,
    read_am_file,
    write_am_file,
)


def test_primitive_roundtrip(tmp_path):
    buf = io.BytesIO()
    w = KaldiBinaryWriter(buf)
    w.write_token("<Foo>")
    w.write_int32(-42)
    w.write_float(3.5)
    w.write_int32_vector([1, 2, 3])
    w.write_vector(np.array([1.0, 2.0], dtype=np.float32))
    w.write_matrix(np.arange(6, dtype=np.float32).reshape(2, 3))
    buf.seek(2)
    r = KaldiBinaryReader(buf)
    r.expect_token("<Foo>")
    assert r.read_int32() == -42
    assert r.read_float() == 3.5
    assert list(r.read_int32_vector()) == [1, 2, 3]
    assert np.allclose(r.read_vector(), [1.0, 2.0])
    assert np.allclose(r.read_matrix(), np.arange(6).reshape(2, 3))


def test_load_reference_mono_model(mono_model_path):
    am = AcousticModel.load(mono_model_path)
    tm = am.transition_model
    # internal consistency: every source agrees on pdf count
    assert tm.num_pdfs == am.gmm.num_pdfs == am.tree.num_pdfs == len(am.occs)
    assert am.gmm.dim == 39  # mfcc 13 + deltas
    assert tm.num_transition_ids > 0
    assert len(tm.id2pdf) == tm.num_transition_ids + 1
    # stored gconsts must match recomputed ones
    stored = am.gmm.gconsts.copy()
    am.gmm.compute_gconsts()
    mask = np.isfinite(stored)
    assert np.abs(stored[mask] - am.gmm.gconsts[mask]).max() < 1e-3
    # transition log-probs are negative log domain
    assert tm.log_probs[1:].max() <= 0.0


def test_model_file_roundtrip(mono_model_path, tmp_path):
    am = AcousticModel.load(mono_model_path)
    out = tmp_path / "roundtrip.mdl"
    write_am_file(out, am.transition_model, am.gmm)
    tm2, gmm2 = read_am_file(out)
    assert tm2.num_transition_ids == am.transition_model.num_transition_ids
    assert np.allclose(tm2.log_probs, am.transition_model.log_probs)
    assert np.array_equal(tm2.phone, am.transition_model.phone)
    assert np.allclose(gmm2.means_invvars, am.gmm.means_invvars)
    assert np.allclose(gmm2.inv_vars, am.gmm.inv_vars)


def test_archive_roundtrip(mono_model_path, tmp_path):
    am = AcousticModel.load(mono_model_path)
    out = tmp_path / "model.zip"
    am.save(out)
    am2 = AcousticModel.load(out)
    assert am2.gmm.num_pdfs == am.gmm.num_pdfs
    assert am2.tree.num_pdfs == am.tree.num_pdfs
    assert np.allclose(
        am2.transition_model.log_probs, am.transition_model.log_probs
    )


def test_tree_lookup(mono_model_path):
    am = AcousticModel.load(mono_model_path)
    tm = am.transition_model
    # every transition-model tuple must agree with the tree
    for s in range(tm.num_transition_states):
        phone = int(tm.phone[s])
        entry = tm.topo.entry_for_phone(phone)
        pdf_class = entry[int(tm.hmm_state[s])].forward_pdf_class
        assert am.tree.compute_pdf([phone], pdf_class) == int(tm.forward_pdf[s])


def test_flac_decoding(reference_data_dir):
    from montreal_forced_aligner_tpu.io.flac import decode_flac
    from montreal_forced_aligner_tpu.io.wav import read_wave

    path = reference_data_dir / "wav" / "61-70968-0000.flac"
    st = decode_flac(path)
    # STREAMINFO carries an MD5 of the raw samples: exact-decode proof
    assert st.md5_ok is True
    assert st.sample_rate == 16000
    wav = read_wave(path)
    assert len(wav.samples) == st.total_samples
    assert wav.sample_rate == 16000


def test_flac_native_matches_python(reference_data_dir, monkeypatch):
    """The C++ frame decoder must be bit-identical to the Python reference."""
    import numpy as np

    import montreal_forced_aligner_tpu.native as native
    from montreal_forced_aligner_tpu.io.flac import decode_flac

    path = reference_data_dir / "wav" / "61-70968-0000.flac"
    st_native = decode_flac(path)
    monkeypatch.setenv("MFA_TPU_NO_NATIVE", "1")
    saved = dict(native._LIBS)
    native._LIBS.clear()
    try:
        st_py = decode_flac(path)
    finally:
        native._LIBS.update(saved)
    assert st_py.md5_ok is True
    if native.load_native("flac_decode") is None:
        return  # no toolchain: both runs used the Python path
    assert st_native.md5_ok is True
    assert np.array_equal(st_native.samples, st_py.samples)


def test_mp3_and_opus_decoding(reference_data_dir, tmp_path):
    """MP3 (libmpg123) and Ogg Opus (libopus) decode via system codecs, and
    the corpus scanner picks both formats up."""
    import shutil

    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.io.wav import read_wave

    mp3 = reference_data_dir / "wav" / "common_voice_en_22058264.mp3"
    opus = reference_data_dir / "wav" / "13697_11991_000000.opus"
    wav = read_wave(mp3)
    assert wav.sample_rate == 48000
    assert 3.5 < wav.duration < 5.0
    assert float(np.abs(wav.samples).max()) > 100  # real audio, not silence
    wav2 = read_wave(opus)
    assert wav2.sample_rate == 48000
    assert 14.0 < wav2.duration < 16.0
    assert float(np.abs(wav2.samples).max()) > 100

    spk = tmp_path / "codec_corpus" / "spk"
    spk.mkdir(parents=True)
    for src in (mp3, opus):
        shutil.copy(src, spk / src.name)
        (spk / src.name).with_suffix(".lab").write_text("hello world")
    corpus = Corpus.load(tmp_path / "codec_corpus")
    assert corpus.num_utterances == 2
    lens = corpus.load_audio_parallel(16000)
    assert abs(len(lens[0]) / 16000 - wav2.duration) < 0.01 or abs(
        len(lens[0]) / 16000 - wav.duration
    ) < 0.01


def test_text_model_roundtrip(mono_model_path, tmp_path):
    """Text-mode .mdl and tree files (gmm-copy --binary=false) load to the
    same arrays as the binary originals."""
    from montreal_forced_aligner_tpu.io.kaldi_io import (
        KaldiTextWriter,
        open_kaldi_stream,
    )
    from montreal_forced_aligner_tpu.models.acoustic_model import read_tree_file
    from montreal_forced_aligner_tpu.models.tree import ContextDependency

    am = AcousticModel.load(mono_model_path)
    out = tmp_path / "text.mdl"
    write_am_file(out, am.transition_model, am.gmm, binary=False)
    head = out.read_bytes()[:2]
    assert head != b"\x00B"  # really text mode
    tm2, gmm2 = read_am_file(out)
    tm = am.transition_model
    assert tm2.num_transition_ids == tm.num_transition_ids
    assert np.array_equal(tm2.phone, tm.phone)
    assert np.array_equal(tm2.hmm_state, tm.hmm_state)
    assert np.array_equal(tm2.forward_pdf, tm.forward_pdf)
    assert np.allclose(tm2.log_probs, tm.log_probs, atol=1e-6)
    # topology structure survives the ForPhones text format
    for p in tm.topo.phones.tolist():
        e1 = tm.topo.entry_for_phone(p)
        e2 = tm2.topo.entry_for_phone(p)
        assert len(e1) == len(e2)
        for s1, s2 in zip(e1, e2):
            assert s1.forward_pdf_class == s2.forward_pdf_class
            assert s1.transitions == [
                (d, pytest.approx(pr, abs=1e-6)) for d, pr in s2.transitions
            ]
    assert np.allclose(gmm2.means_invvars, am.gmm.means_invvars, atol=2e-4)
    assert np.allclose(gmm2.inv_vars, am.gmm.inv_vars, rtol=2e-6)
    assert np.allclose(gmm2.weights, am.gmm.weights, atol=1e-6)

    # tree: text write -> read
    tree_out = tmp_path / "tree.txt"
    with open(tree_out, "w", encoding="utf-8") as f:
        am.tree.write(KaldiTextWriter(f))
    tree2 = read_tree_file(tree_out)
    assert tree2.N == am.tree.N and tree2.P == am.tree.P
    assert tree2.num_pdfs == am.tree.num_pdfs


def test_text_matrix_and_vectors(tmp_path):
    import io as _io

    from montreal_forced_aligner_tpu.io.kaldi_io import (
        KaldiTextReader,
        KaldiTextWriter,
    )

    buf = _io.StringIO()
    w = KaldiTextWriter(buf)
    w.write_token("<X>")
    w.write_int32(-7)
    w.write_float(2.25)
    w.write_int32_vector([4, 5, 6])
    w.write_vector(np.array([0.5, -1.5]))
    w.write_matrix(np.arange(6, dtype=np.float32).reshape(3, 2))
    r = KaldiTextReader(_io.StringIO(buf.getvalue()))
    r.expect_token("<X>")
    assert r.read_int32() == -7
    assert r.read_float() == 2.25
    assert list(r.read_int32_vector()) == [4, 5, 6]
    assert np.allclose(r.read_vector(), [0.5, -1.5])
    assert np.allclose(r.read_matrix(), np.arange(6).reshape(3, 2))
