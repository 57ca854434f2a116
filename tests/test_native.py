"""Native C++ loader/repacker parity vs the numpy reference path."""

import numpy as np
import pytest

from powerserve_tpu.core import gguf as G
from powerserve_tpu.core import quant as Q
from powerserve_tpu.core.native import NativeGGUFReader, get_lib, native_repack

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib not built")


@pytest.mark.parametrize("fmt", [G.GGMLType.Q4_0, G.GGMLType.Q8_0,
                                 G.GGMLType.Q4_K, G.GGMLType.Q6_K])
def test_native_repack_matches_numpy(fmt):
    rng = np.random.default_rng(0)
    n_out, k_in = 8, 512
    w = rng.standard_normal((n_out, k_in)).astype(np.float32)
    payload = Q.quantize(w, fmt)
    ref = Q.repack_gguf_tensor(payload, fmt, (n_out, k_in))
    out = native_repack(payload, fmt, n_out, k_in)
    assert out is not None
    q, scales, bias, group, unsigned = out
    np.testing.assert_allclose(scales, ref.scales, rtol=1e-6, atol=1e-7)
    if fmt == G.GGMLType.Q4_K:
        assert unsigned and bias is not None
        np.testing.assert_allclose(bias, ref.bias, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(Q.unpack_nib4_unsigned(q, group), ref.q)
    elif fmt == G.GGMLType.Q4_0:
        assert not unsigned and bias is None
        np.testing.assert_array_equal(Q.unpack_nib4_signed(q, group), ref.q)
    else:
        np.testing.assert_array_equal(q, ref.q)


def test_native_gguf_reader_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    w = G.GGUFWriter()
    w.metadata["general.architecture"] = "llama"
    w.metadata["llama.block_count"] = 3
    w.metadata["llama.rope.freq_base"] = 500000.0
    w.metadata["tokenizer.ggml.tokens"] = ["a", "b", "c"]
    w.metadata["flag"] = True
    a = rng.standard_normal((4, 64)).astype(np.float32)
    w.add_float_tensor("a.weight", a)
    b = rng.standard_normal((8, 256)).astype(np.float32)
    w.add_tensor("b.weight", (256, 8), G.GGMLType.Q4_K,
                 Q.quantize(b, G.GGMLType.Q4_K))
    path = tmp_path / "t.gguf"
    w.write(path)

    py = G.GGUFReader(path)
    nat = NativeGGUFReader(path)
    assert nat.metadata["general.architecture"] == "llama"
    assert nat.metadata["llama.block_count"] == 3
    assert abs(nat.metadata["llama.rope.freq_base"] - 500000.0) < 1e-3
    assert nat.metadata["tokenizer.ggml.tokens"] == ["a", "b", "c"]
    assert nat.metadata["flag"] is True
    for name in ("a.weight", "b.weight"):
        np.testing.assert_array_equal(nat.tensor_raw(name),
                                      py.tensor_raw(name))
        assert nat.tensors[name][2] == py.tensors[name].ne
    nat.close()
    py.close()


def test_native_fp16_convert():
    import ctypes

    lib = get_lib()
    rng = np.random.default_rng(2)
    x = rng.standard_normal(1000).astype(np.float16)
    out = np.empty(1000, np.float32)
    lib.psv_fp16_to_f32(
        x.view(np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        1000, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    np.testing.assert_array_equal(out, x.astype(np.float32))


def test_native_tokenizer_matches_python(monkeypatch):
    """C++ merge loop == Python heap merge, SPM and BPE, including byte
    fallback, multibyte UTF-8, ties, and no-score vocabs."""
    from powerserve_tpu.tokenizer.vocab import GGUFVocab

    def mk_md(scores=True):
        tokens = ["<unk>", "<s>", "</s>"]
        types = [2, 3, 3]
        tokens += [f"<0x{b:02X}>" for b in range(256)]
        types += [6] * 256
        words = ["▁the", "▁quick", "th", "he", "the", "qu", "ick", "▁",
                 "a", "b", "ab", "ba", "aba", "日", "本", "日本"]
        tokens += words
        types += [1] * len(words)
        md = {
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.token_type": types,
            "tokenizer.ggml.unknown_token_id": 0,
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
        }
        if scores:
            md["tokenizer.ggml.scores"] = [float(-i) for i in
                                           range(len(tokens))]
        return md

    texts = ["the quick", "abab aba ba", "日本 the", "xyz éé",
             "", " ", "ababababab"]
    for scores in (True, False):
        v_nat = GGUFVocab.from_metadata(mk_md(scores))
        assert v_nat._native() is not None, "native lib expected"
        monkeypatch.setenv("POWERSERVE_NATIVE_TOKENIZER", "0")
        v_py = GGUFVocab.from_metadata(mk_md(scores))
        assert v_py._native() is None
        monkeypatch.delenv("POWERSERVE_NATIVE_TOKENIZER")
        for t in texts:
            a = v_nat._spm_encode_fragment(t)
            b = v_py._spm_encode_fragment(t)
            assert a == b, (scores, t, a, b)

    # BPE with merge ranks
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": ["<unk>", "a", "b", "c", "ab", "abc",
                                  "bc", "Ġ", "Ġa"],
        "tokenizer.ggml.token_type": [2] + [1] * 8,
        "tokenizer.ggml.merges": ["a b", "ab c", "b c", "Ġ a"],
        "tokenizer.ggml.unknown_token_id": 0,
    }
    v_nat = GGUFVocab.from_metadata(dict(md))
    monkeypatch.setenv("POWERSERVE_NATIVE_TOKENIZER", "0")
    v_py = GGUFVocab.from_metadata(dict(md))
    monkeypatch.delenv("POWERSERVE_NATIVE_TOKENIZER")
    for w in ["abc", "abcabc", "aabbcc", "Ġaabc", "x"]:
        assert v_nat._bpe_encode_word(w) == v_py._bpe_encode_word(w), w
