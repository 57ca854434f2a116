"""File-loading strategy parity: every strategy yields identical
metadata and tensor bytes (reference src/storage/file_loader.cpp:16-35
MMap/BIO/DIO/UV factory; here mmap/bio/dio/async)."""

import numpy as np
import pytest

from powerserve_tpu.core import gguf as G
from powerserve_tpu.core import quant as Q
from powerserve_tpu.core.native import NativeGGUFReader, get_lib

METHODS = ["mmap", "bio", "dio", "async"]


@pytest.fixture(scope="module")
def sample_gguf(tmp_path_factory):
    rng = np.random.default_rng(7)
    w = G.GGUFWriter()
    w.metadata["general.architecture"] = "llama"
    w.metadata["llama.block_count"] = 2
    a = rng.standard_normal((4, 64)).astype(np.float32)
    w.add_float_tensor("a.weight", a)
    b = rng.standard_normal((8, 256)).astype(np.float32)
    w.add_tensor("b.weight", (256, 8), G.GGMLType.Q4_K,
                 Q.quantize(b, G.GGMLType.Q4_K))
    path = tmp_path_factory.mktemp("storage") / "t.gguf"
    w.write(path)
    return path


@pytest.mark.parametrize("method", METHODS)
def test_python_reader_strategies(sample_gguf, method):
    ref = G.GGUFReader(sample_gguf, method="mmap")
    r = G.GGUFReader(sample_gguf, method=method)
    assert r.metadata == ref.metadata
    assert set(r.tensors) == set(ref.tensors)
    for name in ref.tensors:
        np.testing.assert_array_equal(r.tensor_raw(name),
                                      ref.tensor_raw(name))
    r.close()
    ref.close()


@pytest.mark.skipif(get_lib() is None, reason="native lib not built")
@pytest.mark.parametrize("method", METHODS)
def test_native_reader_strategies(sample_gguf, method):
    ref = G.GGUFReader(sample_gguf, method="mmap")
    r = NativeGGUFReader(sample_gguf, method=method)
    assert r.metadata["general.architecture"] == "llama"
    for name in ref.tensors:
        np.testing.assert_array_equal(r.tensor_raw(name),
                                      ref.tensor_raw(name))
    r.close()
    ref.close()


def test_unknown_method_rejected(sample_gguf):
    with pytest.raises(ValueError):
        G.GGUFReader(sample_gguf, method="carrier-pigeon")
