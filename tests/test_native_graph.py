"""Bit-exactness of the native (C++) mono graph-assembly core vs the Python
compiler (graph/native_compile.py vs AlignmentGraphCompiler.compile)."""

import numpy as np
import pytest

from montreal_forced_aligner_tpu.graph.native_compile import (
    compile_batch_native,
    compile_items_native,
)


def _fields(gr):
    return dict(
        state_pdf=gr.state_pdf,
        state_phone=gr.state_phone,
        state_word=gr.state_word,
        state_hmm_pos=gr.state_hmm_pos,
        state_tstate=gr.state_tstate,
        state_instance=gr.state_instance,
        in_src=gr.in_src,
        in_weight=gr.in_weight,
        in_tid=gr.in_tid,
        start=gr.start,
        final=gr.final,
        final_tid=gr.final_tid,
    )


def _assert_identical(a, b, label):
    fa, fb = _fields(a), _fields(b)
    assert a.words == b.words, label
    for k in fa:
        assert fa[k].shape == fb[k].shape, f"{label}:{k} shape"
        assert fa[k].dtype == fb[k].dtype, f"{label}:{k} dtype"
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=f"{label}:{k}")


@pytest.fixture(scope="module")
def mono_aligner(tmp_path_factory):
    from pathlib import Path

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    ref = Path("/root/reference/tests/data")
    tmp = tmp_path_factory.mktemp("native_graph")
    if (ref / "am" / "mono_model.zip").exists():
        model_path = ref / "am" / "mono_model.zip"
        dict_path = ref / "dictionaries" / "test_basic.txt"
    else:
        import sys

        sys.path.insert(0, str(Path(__file__).parent))
        from helpers import build_synthetic_corpus, build_synthetic_model

        _, wave = build_synthetic_corpus(tmp)
        model_path, dict_path = build_synthetic_model(tmp, wave=wave)
    return PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=4))


def test_native_matches_python(mono_aligner):
    comp = mono_aligner.compiler
    words = sorted(w for w in mono_aligner.lexicon.words if w.isalpha())
    rng = np.random.RandomState(7)
    cases = [
        [],  # empty transcript -> single silence
        [words[0]],
        [words[0], words[0]],  # consecutive repeat
        list(rng.choice(words, 5)),
        list(rng.choice(words, 25)),
        ["definitelynotinthedictionary", words[0]],  # OOV -> <unk>/spn
    ]
    native = compile_batch_native(comp, cases)
    if native is None:
        pytest.skip("native toolchain unavailable")
    for tokens, ng in zip(cases, native):
        pg = comp.compile(list(tokens))
        _assert_identical(ng, pg, " ".join(tokens) or "<empty>")


def test_native_items_grouping(mono_aligner):
    comp = mono_aligner.compiler
    words = sorted(w for w in mono_aligner.lexicon.words if w.isalpha())
    items = [("default", [words[0], words[1]]), ("default", [words[1]])]
    out = compile_items_native({"default": comp}, items)
    if out is None:
        pytest.skip("native toolchain unavailable")
    for (key, tokens), ng in zip(items, out):
        _assert_identical(ng, comp.compile(list(tokens)), " ".join(tokens))
