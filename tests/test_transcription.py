"""Language model training and transcription (decoding) tests."""

import numpy as np
import pytest

from montreal_forced_aligner_tpu.language_modeling.ngram import (
    ArpaModel,
    train_lm_from_texts,
)


def test_lm_normalization_and_ppl(tmp_path):
    texts = ["the cat sat", "the dog sat", "the cat ran", "a dog ran"] * 3
    model, counter = train_lm_from_texts(texts, order=3)
    # conditional distributions sum to one under backoff
    for hist in [(), ("the",), ("the", "cat"), ("dog", "ran")]:
        tot = sum(10 ** model.log_prob(w, hist) for w in model.vocab if w != "<s>")
        assert tot == pytest.approx(1.0, abs=1e-3), hist
    assert model.perplexity([t.split() for t in texts]) < 4.0
    assert model.perplexity([["ran", "a", "the"]]) > 5.0
    # ARPA roundtrip
    p = tmp_path / "lm.arpa"
    model.write(p)
    m2 = ArpaModel.read(p)
    assert m2.order == 3
    for w, h in [("cat", ("the",)), ("sat", ("the", "cat")), ("zzz", ())]:
        assert m2.log_prob(w, h) == pytest.approx(model.log_prob(w, h), abs=1e-5)


@pytest.fixture(scope="module")
def transcriber_setup(tmp_path_factory):
    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tmp = tmp_path_factory.mktemp("transcribe")
    corpus_dir, wave = build_synthetic_corpus(tmp, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp, wave=wave)
    tr = Transcriber(model_path, dict_path, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    return tr, corpus


def test_transcribe_corpus(transcriber_setup):
    tr, corpus = transcriber_setup
    results = tr.transcribe_corpus(corpus)
    assert results[0].text == "ab a"
    words = results[0].words
    assert [w.label for w in words] == ["ab", "a"]
    assert abs(words[0].begin - 0.40) < 0.05
    metrics = tr.evaluate(corpus, results)
    assert metrics["wer"] == 0.0
    assert metrics["cer"] == 0.0


def test_phone_lm_training(tmp_path):
    from montreal_forced_aligner_tpu.data import CtmInterval, UtteranceAlignment
    from montreal_forced_aligner_tpu.transcription.transcriber import train_phone_lm

    results = {}
    for i in range(4):
        phones = [
            CtmInterval(j * 0.1, (j + 1) * 0.1, p)
            for j, p in enumerate(["sil", "aa", "bb", "aa", "sil"])
        ]
        results[i] = UtteranceAlignment(i, [], phones, -10.0, -1.0)
    lm = train_phone_lm(results, order=3)
    # the seen phone sequence must be much more probable than a shuffled one
    seen = lm.sentence_log_prob(["sil", "aa", "bb", "aa", "sil"])
    shuffled = lm.sentence_log_prob(["bb", "sil", "sil", "aa", "bb"])
    assert seen > shuffled


def test_phone_lm_fst_round_trip(tmp_path):
    """phone_lm.fst (the reference's archive member form, binary OpenGrm
    n-gram FST) round-trips: ARPA -> FST -> ARPA preserves sentence log
    probabilities, and an archive whose ONLY phone-LM member is
    phone_lm.fst loads it (reference models.py:367-379)."""
    import zipfile

    from montreal_forced_aligner_tpu.data import CtmInterval, UtteranceAlignment
    from montreal_forced_aligner_tpu.io.openfst import read_fst, write_fst
    from montreal_forced_aligner_tpu.language_modeling.fst_convert import (
        arpa_to_ngram_fst,
        ngram_fst_to_arpa,
    )
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        train_phone_lm,
    )

    results = {}
    seqs = [
        ["sil", "aa", "bb", "aa", "sil"],
        ["sil", "bb", "aa", "sil"],
        ["aa", "bb", "bb", "sil"],
    ]
    for i, seq in enumerate(seqs * 2):
        phones = [
            CtmInterval(j * 0.1, (j + 1) * 0.1, p) for j, p in enumerate(seq)
        ]
        results[i] = UtteranceAlignment(i, [], phones, -10.0, -1.0)
    lm = train_phone_lm(results, order=3)
    table = {"<eps>": 0, "sil": 1, "aa": 2, "bb": 3}
    fst = arpa_to_ngram_fst(lm, table)
    write_fst(fst, tmp_path / "phone_lm.fst")
    lm2 = ngram_fst_to_arpa(read_fst(tmp_path / "phone_lm.fst"), table)
    for seq in seqs + [["bb", "sil", "aa"]]:
        assert lm2.sentence_log_prob(seq) == pytest.approx(
            lm.sentence_log_prob(seq), abs=1e-4
        )

    # an archive carrying only the .fst member loads the phone LM
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.models.acoustic_model import (
        AcousticModel,
    )

    _, wave = build_synthetic_corpus(tmp_path)
    model_path, _ = build_synthetic_model(tmp_path, wave=wave)
    m = AcousticModel.load(model_path)
    m.phone_lm = lm
    m.phone_table = dict(table)
    out = tmp_path / "with_lm.zip"
    m.save(out)
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
    assert {"phone_lm.arpa", "phone_lm.fst"} <= names
    # strip the ARPA so only the reference-form member remains
    stripped = tmp_path / "fst_only"
    with zipfile.ZipFile(out) as zf:
        zf.extractall(stripped)
    (stripped / "phone_lm.arpa").unlink()
    m2 = AcousticModel.load(stripped)
    assert m2.phone_lm is not None
    for seq in seqs:
        assert m2.phone_lm.sentence_log_prob(seq) == pytest.approx(
            lm.sentence_log_prob(seq), abs=1e-4
        )


def test_nbest_and_lm_rescoring(transcriber_setup):
    tr, corpus = transcriber_setup
    results = tr.transcribe_corpus(corpus, nbest=8)
    alts = results[0].alternatives
    assert alts is not None and len(alts) >= 2
    # rank 0 is the 1-best and scores are descending
    assert alts[0][0] == results[0].text == "ab a"
    scores = [s for _t, s in alts]
    assert scores == sorted(scores, reverse=True)
    assert len({t for t, _s in alts}) == len(alts)

    # rescoring with an LM that strongly prefers a competitor must re-rank
    competitor = alts[1][0]
    rescore_lm, _ = train_lm_from_texts([competitor] * 20, order=3)
    rescored = tr.transcribe_corpus(
        corpus, nbest=8, rescore_lm=rescore_lm, rescore_weight=200.0
    )
    assert rescored[0].text == competitor
    # rescoring with the decoding LM itself at the decoding scale is a no-op
    kept = tr.transcribe_corpus(
        corpus, nbest=8, rescore_lm=tr.lm, rescore_weight=tr.lm_scale
    )
    assert kept[0].text == "ab a"
    assert [t for t, _s in kept[0].alternatives] == [t for t, _s in alts]


def test_lvcsr_matches_dense_decoder(transcriber_setup, monkeypatch):
    """The backoff-junction LVCSR decoder must reproduce the exact dense
    decoder's output on a vocabulary both can handle."""
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription import transcriber as tmod

    tr, corpus = transcriber_setup
    dense = tr.transcribe_corpus(corpus)

    tr2 = tmod.Transcriber(
        tr.aligner.model_path, tr.aligner.dictionary_path, lm=tr.lm,
        batch_size=4,
    )
    # force the LVCSR path by making the dense builder refuse
    monkeypatch.setattr(
        tmod.DecodingGraphCompiler,
        "build",
        lambda self: (_ for _ in ()).throw(ValueError("forced")),
    )
    lv = tr2.transcribe_corpus(corpus)
    assert tr2._lvcsr is not None
    for i in dense:
        assert lv[i].text == dense[i].text
        assert abs(lv[i].log_likelihood - dense[i].log_likelihood) < 1e-1
        assert len(lv[i].words) == len(dense[i].words)
        for a, b in zip(lv[i].words, dense[i].words):
            assert a.label == b.label
            assert abs(a.begin - b.begin) < 0.011


def test_lvcsr_large_vocabulary(tmp_path):
    """A vocabulary too large for the dense graph auto-routes to the LVCSR
    decoder and still recovers the transcript."""
    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    rng = np.random.RandomState(7)
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    # grow the dictionary far past the dense-decoder state budget
    extra_words = []
    with open(dict_path, "a") as f:
        for j in range(600):
            w = f"junk{j}"
            pron = " ".join(rng.choice(["aa", "bb"], rng.randint(4, 8)))
            f.write(f"{w}\t{pron}\n")
            extra_words.append(w)
    texts = ["ab a"] * 20 + [" ".join(extra_words[i : i + 5]) for i in range(0, 600, 5)]
    from montreal_forced_aligner_tpu.language_modeling.ngram import (
        train_lm_from_texts,
    )

    lm, _ = train_lm_from_texts(texts, order=2)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    results = tr.transcribe_corpus(corpus)
    assert tr._lvcsr is not None, "expected LVCSR routing"
    assert len(tr._vocab) > 500
    assert results[0].text == "ab a"
    assert [w.label for w in results[0].words] == ["ab", "a"]
    assert abs(results[0].words[0].begin - 0.40) < 0.05


def test_dedup_topk_exact():
    """The K-best merge must find a distinct word sequence even when it is
    outranked by many same-hash duplicates (a truncated top-M pool drops
    it). Candidates are concatenations of internally-distinct K-lists, as
    every kernel call site produces."""
    import jax.numpy as jnp

    from montreal_forced_aligner_tpu.transcription.lvcsr import _dedup_topk

    K = 2
    # 5 groups of K: hash 1 dominates with scores 10..2; the only hash-7
    # candidate scores worst and sits in the last group
    scores = np.array(
        [[10.0, 9.0], [8.0, 7.0], [6.0, 5.0], [4.0, 3.0], [2.0, 1.0]]
    ).reshape(1, -1)
    hashes = np.full((1, 10), 1, np.uint32)
    # keep groups internally distinct: second member of each pair hash 2
    hashes[0, 1::2] = 2
    hashes[0, 9] = 7  # worst-scoring, only member of its sequence
    vals, hsel, idx = _dedup_topk(
        jnp.asarray(scores), jnp.asarray(hashes), K
    )
    vals, hsel, idx = np.asarray(vals), np.asarray(hsel), np.asarray(idx)
    assert vals[0, 0] == 10.0 and hsel[0, 0] == 1
    assert vals[0, 1] == 9.0 and hsel[0, 1] == 2
    # with K=3, the hash-7 candidate must be found despite 8 better dups
    vals3, hsel3, idx3 = _dedup_topk(
        jnp.asarray(scores), jnp.asarray(hashes), 3
    )
    assert 7 in np.asarray(hsel3)[0]
    assert np.asarray(vals3)[0, list(np.asarray(hsel3)[0]).index(7)] == 1.0


def test_lvcsr_nbest_and_rescoring(transcriber_setup, monkeypatch):
    """The K-best junction decoder yields distinct, rank-ordered hypotheses
    agreeing with the dense K-best path, and rescoring re-ranks them."""
    from montreal_forced_aligner_tpu.transcription import transcriber as tmod

    tr, corpus = transcriber_setup
    dense = tr.transcribe_corpus(corpus, nbest=8)

    tr2 = tmod.Transcriber(
        tr.aligner.model_path, tr.aligner.dictionary_path, lm=tr.lm,
        batch_size=4,
    )
    monkeypatch.setattr(
        tmod.DecodingGraphCompiler,
        "build",
        lambda self: (_ for _ in ()).throw(ValueError("forced")),
    )
    lv = tr2.transcribe_corpus(corpus, nbest=8)
    assert tr2._lvcsr is not None
    alts = lv[0].alternatives
    assert alts is not None and len(alts) >= 2
    assert alts[0][0] == lv[0].text == dense[0].text == "ab a"
    scores = [s for _t, s in alts]
    assert scores == sorted(scores, reverse=True)
    assert len({t for t, _s in alts}) == len(alts)
    # 1-best and runner-up agree with the dense decoder's ranking
    dense_alts = dense[0].alternatives
    assert alts[1][0] == dense_alts[1][0]
    assert abs(alts[0][1] - dense_alts[0][1]) < 0.2
    # each hypothesis carries its own word timing; best matches dense words
    for a, b in zip(lv[0].words, dense[0].words):
        assert a.label == b.label
        assert abs(a.begin - b.begin) < 0.011

    # rescoring with an LM preferring the runner-up re-ranks (trigram+
    # context enters the LVCSR decoder through exactly this path)
    competitor = alts[1][0]
    rescore_lm, _ = train_lm_from_texts([competitor] * 20, order=3)
    rescored = tr2.transcribe_corpus(
        corpus, nbest=8, rescore_lm=rescore_lm, rescore_weight=200.0
    )
    assert rescored[0].text == competitor
    # rescoring with the decoding LM itself at the decoding scale is a no-op
    kept = tr2.transcribe_corpus(
        corpus, nbest=8, rescore_lm=tr2.lm, rescore_weight=tr2.lm_scale
    )
    assert kept[0].text == "ab a"
    assert [t for t, _s in kept[0].alternatives] == [t for t, _s in alts]


def test_lm_scale_and_insertion_penalty(transcriber_setup):
    """Decoding knobs: a huge insertion penalty suppresses words; neutral
    values reproduce the default decode."""
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tr, corpus = transcriber_setup
    tr2 = Transcriber(
        tr.aligner.model_path, tr.aligner.dictionary_path, lm=tr.lm,
        batch_size=4, lm_scale=1.0, word_insertion_penalty=0.0,
    )
    assert tr2.transcribe_corpus(corpus)[0].text == "ab a"
    tr3 = Transcriber(
        tr.aligner.model_path, tr.aligner.dictionary_path, lm=tr.lm,
        batch_size=4, word_insertion_penalty=10000.0,
    )
    out = tr3.transcribe_corpus(corpus)[0].text
    assert len(out.split()) < 2  # words priced out


def test_phone_transcription_workflow(tmp_path):
    """`align --use_phone_model`: phone decode + evaluation vs alignment
    (reference WorkflowType.phone_transcription, alignment/base.py:543)."""
    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.phone_transcriber import (
        evaluate_against_alignments,
        transcribe_phones,
    )

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    aligner = PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=4))
    corpus = Corpus.load(corpus_dir)
    results = aligner.align_corpus(corpus)

    transcripts = transcribe_phones(model_path, corpus, results, batch_size=4)
    assert set(transcripts) == set(results)
    hyp = [iv.label for iv in transcripts[0]]
    # the free phone decode should recover the aligned phone sequence
    ref = [p.label for p in results[0].phones if p.label != "sil"]
    assert [h for h in hyp if h != "sil"] == ref

    csv_path = tmp_path / "phone_eval.csv"
    overlap, per = evaluate_against_alignments(
        results, transcripts, corpus, output_path=csv_path
    )
    assert per <= 0.05
    assert overlap is not None and overlap < 0.05
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("file,")
    assert len(lines) == 1 + len(results)


def test_align_cli_use_phone_model(tmp_path):
    from click.testing import CliRunner

    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.cli import cli

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    out = tmp_path / "out"
    runner = CliRunner()
    r = runner.invoke(
        cli,
        ["align", str(corpus_dir), str(dict_path), str(model_path), str(out),
         "--use_phone_model", "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "Phone-transcript evaluation" in r.output
    assert (out / "phone_transcript_evaluation.csv").exists()


def test_transcribe_cli_output_types(tmp_path):
    """transcribe --output_type transcription/alignment exports
    (reference command_line/transcribe.py:69-79)."""
    import json

    from click.testing import CliRunner

    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.cli import cli

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    runner = CliRunner()
    out1 = tmp_path / "o1"
    r = runner.invoke(
        cli,
        ["transcribe", str(corpus_dir), str(dict_path), str(model_path),
         str(out1), "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    tg_text = (out1 / "utt1.TextGrid").read_text()
    assert 'name = "utterances"' in tg_text and "ab a" in tg_text
    assert (out1 / "spk1" / "utt1.lab").read_text().strip() == "ab a"

    out2 = tmp_path / "o2"
    r = runner.invoke(
        cli,
        ["transcribe", str(corpus_dir), str(dict_path), str(model_path),
         str(out2), "--output_type", "alignment", "--output_format", "json",
         "--batch_size", "4"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    data = json.loads((out2 / "utt1.json").read_text())
    assert "words" in data["tiers"] and "phones" in data["tiers"]


def test_relative_entropy_pruning(tmp_path):
    """Stolcke pruning (ngramshrink --method=relative_entropy semantics):
    monotone in the threshold, keeps every history normalized, and barely
    moves perplexity at small thresholds."""
    import numpy as np

    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 9)))
        for _ in range(400)
    ]
    model, _ = train_lm_from_texts(texts, order=3)
    sizes = []
    ppls = []
    held = [t.split() for t in texts[:50]]
    base_ppl = model.perplexity(held)
    for thresh in (0.0, 1e-7, 3e-7, 1e-4):
        pruned = model.prune_relative_entropy(thresh)
        sizes.append(sum(len(pruned.ngrams[n]) for n in range(1, 4)))
        ppls.append(pruned.perplexity(held))
    # threshold 0 keeps everything
    assert sizes[0] == sum(len(model.ngrams[n]) for n in range(1, 4))
    # monotone shrinking
    assert sizes[0] >= sizes[1] >= sizes[2] >= sizes[3]
    # an aggressive threshold actually prunes
    assert sizes[3] < sizes[0]
    # unigrams never pruned
    p4 = model.prune_relative_entropy(1e-4)
    assert len(p4.ngrams[1]) == len(model.ngrams[1])
    # every history still normalizes: sum_w p(w|h) = 1
    for hist in [(), ("w0",), ("w0", "w1")]:
        total = sum(
            10.0 ** p4.log_prob(w, hist)
            for w in p4.vocab
            if w != "<s>"
        )
        assert abs(total - 1.0) < 0.02, (hist, total)
    # light pruning keeps perplexity close
    assert ppls[1] < base_ppl * 1.05


def test_language_model_archive_roundtrip_and_cli(tmp_path):
    """train_lm writes the reference's zip archive (large+medium+small);
    LanguageModelArchive round-trips; transcribe accepts the archive and
    decodes with the small variant."""
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli
    from montreal_forced_aligner_tpu.language_modeling.archive import (
        LanguageModelArchive,
    )

    texts_file = tmp_path / "texts.txt"
    texts_file.write_text(
        "".join(
            f"ab a {'ba ' * (i % 3)}b\n" for i in range(60)
        )
    )
    out_zip = tmp_path / "lm.zip"
    r = CliRunner().invoke(
        cli,
        ["train_lm", str(texts_file), str(out_zip), "--order", "3"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "LM archive" in r.output
    la = LanguageModelArchive.load(out_zip)
    assert la.large is not None and la.medium is not None and la.small is not None
    n_large = sum(len(la.large.ngrams[n]) for n in range(1, 4))
    n_small = sum(len(la.small.ngrams[n]) for n in range(1, 4))
    assert n_small <= n_large
    assert la.meta["order"] == 3
    assert la.decode_model is la.small
    assert la.rescore_model is la.large
    # bare .arpa load path
    arpa = tmp_path / "flat.arpa"
    la.large.write(arpa)
    flat = LanguageModelArchive.load(arpa)
    assert flat.medium is None and flat.decode_model is flat.large


def test_reference_lm_archive_loads():
    """The reference's real LanguageModel zip (meta.yaml + large/_med/_small
    ARPA variants, models.py:1258) loads with every variant in its slot and
    scores text (interop pinned on the checked-in fixture)."""
    import math

    from montreal_forced_aligner_tpu.language_modeling.archive import (
        LanguageModelArchive,
    )

    a = LanguageModelArchive.load(
        "/root/reference/tests/data/lm/test_lm.zip"
    )
    assert a.large is not None and a.large.order == 3
    assert a.medium is not None and a.small is not None
    lp = a.large.sentence_log_prob(["this", "is"])
    assert math.isfinite(lp) and lp < 0
    # pruned variants are genuinely smaller models
    assert len(a.small.ngrams[3]) <= len(a.large.ngrams[3])


def test_lvcsr_device_backtrace_matches_host(transcriber_setup, monkeypatch):
    """The production decode (position-major checkpointed pair) must agree
    with BOTH chain-major references — the record-based device pair and the
    python host backtrace — on scores, word events, and per-frame labels;
    the two chain-major references must additionally agree decision for
    decision (identical state paths)."""
    from montreal_forced_aligner_tpu.transcription import transcriber as tmod
    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        lvcsr_backtrace_host,
    )

    tr, corpus = transcriber_setup
    tr.transcribe_corpus(corpus)  # ensure the LM is trained

    tr2 = tmod.Transcriber(
        tr.aligner.model_path, tr.aligner.dictionary_path, lm=tr.lm,
        batch_size=4,
    )
    monkeypatch.setattr(
        tmod.DecodingGraphCompiler,
        "build",
        lambda self: (_ for _ in ()).throw(ValueError("forced")),
    )
    captured = []
    orig = tmod.Transcriber._lvcsr_decode_device

    def spy(self, ff, flens, W, gconsts):
        handle = orig(self, ff, flens, W, gconsts)
        captured.append((handle, np.array(flens), ff, W, gconsts))
        return handle

    monkeypatch.setattr(tmod.Transcriber, "_lvcsr_decode_device", spy)
    tr2.transcribe_corpus(corpus)
    assert tr2._lvcsr is not None and captured
    import jax.numpy as jnp

    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        lvcsr_backtrace_device,
        lvcsr_decode_device,
    )
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        _lvcsr_emissions,
    )

    g = tr2._lvcsr  # position-major production graph
    lg = tr2._legacy_flat_graph()  # chain-major reference graph
    d = tr2._lvcsr_dev(lg)
    for handle, flens, ff, W, gconsts in captured:
        kind, _payload = handle
        # production path is the position-major checkpointed pair
        assert kind == "pm_ckpt"
        T = int(ff.shape[1])
        pm_bt = tr2._lvcsr_backtrace_device_dispatch(handle, flens, T=T)
        pm_rows = tr2._lvcsr_rows(pm_bt, flens)
        pm_paths = np.asarray(pm_bt[0])
        # reference #1: the chain-major record-based device pair on the
        # same inputs (same W/gconsts the production call used — the fMLLR
        # first pass decodes with the alignment model's)
        emit_pdf = _lvcsr_emissions(ff, W, gconsts, tr2.acoustic_scale)
        alpha_T, recs = lvcsr_decode_device(
            emit_pdf, d["state_pdf"], jnp.asarray(flens), d["band"],
            d["start"], d["exit_idx"], d["exit_w"], d["entry_idx"],
            d["entry_word"], d["entry_w"], d["p1"], d["bo"],
            d["big_pred"], d["big_w"], lg.lb, lg.ub,
        )
        dev_bt = lvcsr_backtrace_device(
            alpha_T, recs, jnp.asarray(flens),
            d["exit_idx"], d["exit_w"], d["eos"], d["entry_word"],
            d["entry_slot_of_state"], d["big_pred"], d["state_word"],
            lg.lb, T,
        )
        rec_rows = tr2._lvcsr_rows(dev_bt, flens)
        # reference #2: the python host backtrace over the records
        host_rows = lvcsr_backtrace_host(
            lg, np.asarray(alpha_T), recs, flens, T=T
        )
        assert len(host_rows) == len(pm_rows) == len(rec_rows)
        for b, ((hp, hs, he), (dp, ds, de), (cp, cs, ce)) in enumerate(
            zip(host_rows, rec_rows, pm_rows)
        ):
            # chain-major device vs host: decision-for-decision identical
            np.testing.assert_array_equal(np.asarray(dp), np.asarray(hp))
            assert abs(ds - hs) < 1e-4
            assert de == he
            # position-major production vs host: same scores/events, and
            # the per-frame word labels agree (paths live in different
            # numberings)
            L = int(flens[b])
            assert abs(cs - hs) < 1e-4
            assert ce == he
            np.testing.assert_array_equal(
                g.state_word[pm_paths[b, :L]],
                lg.state_word[np.asarray(hp)[:L]],
            )
