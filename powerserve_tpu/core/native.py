"""ctypes bindings for the native C++ runtime (csrc/gguf_loader.cpp).

Provides a fast path for GGUF parsing and weight repacking (mmap +
multithreaded transpose/nibble-pack in C++); every entry point has a
pure-numpy fallback in gguf.py/quant.py, so the framework works without
the compiled library. Build on demand with `make -C csrc` (attempted
automatically once)."""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from pathlib import Path

import numpy as np

from .logging import get_logger

log = get_logger("native")

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "build" / "libpowerserve_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", str(_CSRC)], capture_output=True,
                           text=True, timeout=300)
        if r.returncode != 0:
            log.warning(f"native build failed: {r.stderr[-500:]}")
            return False
        return True
    except Exception as e:  # noqa: BLE001
        log.warning(f"native build unavailable: {e}")
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        log.warning(f"native lib load failed: {e}")
        return None
    lib.psv_open.restype = ctypes.c_void_p
    lib.psv_open.argtypes = [ctypes.c_char_p]
    lib.psv_open_ex.restype = ctypes.c_void_p
    lib.psv_open_ex.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.psv_close.argtypes = [ctypes.c_void_p]
    lib.psv_meta_json.restype = ctypes.c_char_p
    lib.psv_meta_json.argtypes = [ctypes.c_void_p]
    lib.psv_tensor_count.restype = ctypes.c_int64
    lib.psv_tensor_count.argtypes = [ctypes.c_void_p]
    lib.psv_tensor_info.restype = ctypes.c_int
    lib.psv_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.psv_tensor_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.psv_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    for name in ("psv_repack_q4_0", "psv_repack_q8_0", "psv_repack_q4_k",
                 "psv_repack_q6_k"):
        getattr(lib, name).restype = None
    lib.psv_repack_q4_0.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float)]
    lib.psv_repack_q8_0.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float)]
    lib.psv_repack_q4_k.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.psv_repack_q6_k.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float)]
    lib.psv_fp16_to_f32.restype = None
    lib.psv_fp16_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    # tokenizer fast path
    lib.psv_vocab_create.restype = ctypes.c_void_p
    lib.psv_vocab_create.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.psv_vocab_set_merges.restype = None
    lib.psv_vocab_set_merges.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.psv_vocab_free.restype = None
    lib.psv_vocab_free.argtypes = [ctypes.c_void_p]
    for name in ("psv_spm_encode", "psv_bpe_encode"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                       ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


class NativeVocab:
    """C++ merge-loop tokenizer (the reference vendors llama.cpp's C++
    tokenizer; semantics mirror tokenizer/vocab.py's Python fallback
    exactly — parity-tested). None-able: callers keep the Python path
    when the lib is unavailable."""

    def __init__(self, tokens: list[str], scores, byte_tokens: dict,
                 unk_id: int, merges: list[str] | None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native lib not built")
        self._lib = lib
        blobs = [t.encode("utf-8") for t in tokens]
        offs = np.zeros(len(blobs) + 1, np.int64)
        for i, b in enumerate(blobs):
            offs[i + 1] = offs[i] + len(b)
        blob = np.frombuffer(b"".join(blobs) or b"\x00", np.uint8).copy()
        sc = None
        if scores is not None:
            sc_arr = np.asarray(scores, np.float32)
            sc = sc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        bt = np.full(256, -1, np.int32)
        for b, tid in byte_tokens.items():
            bt[b] = tid
        self._h = lib.psv_vocab_create(
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(blobs), sc,
            bt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), unk_id)
        if merges:
            mb = [m.encode("utf-8") for m in merges]
            moffs = np.zeros(len(mb) + 1, np.int64)
            for i, b in enumerate(mb):
                moffs[i + 1] = moffs[i] + len(b)
            mblob = np.frombuffer(b"".join(mb) or b"\x00", np.uint8).copy()
            lib.psv_vocab_set_merges(
                self._h, mblob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                moffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(mb))

    def __del__(self):
        try:
            self._lib.psv_vocab_free(self._h)
        except Exception:  # noqa: BLE001
            pass

    def _encode(self, fn, text: str) -> list[int]:
        b = text.encode("utf-8")
        out = np.empty(max(4 * len(b), 8), np.int32)
        n = fn(self._h, b, len(b),
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out[:n].tolist()

    def spm_encode(self, text: str) -> list[int]:
        return self._encode(self._lib.psv_spm_encode, text)

    def bpe_encode(self, word: str) -> list[int]:
        return self._encode(self._lib.psv_bpe_encode, word)


_LOAD_METHODS = {"mmap": 0, "bio": 1, "dio": 2, "async": 3}


class NativeGGUFReader:
    """Drop-in alternative to gguf.GGUFReader backed by the C++ parser.

    method selects the file-loading strategy (reference
    src/storage/file_loader.cpp:16-35 factory): mmap | bio | dio |
    async; default from POWERSERVE_FILE_LOAD."""

    def __init__(self, path: str | os.PathLike, method: str | None = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        method = method or os.environ.get("POWERSERVE_FILE_LOAD", "mmap")
        self._h = lib.psv_open_ex(os.fspath(path).encode(),
                                  _LOAD_METHODS[method])
        if not self._h:
            raise ValueError(f"psv_open failed for {path}")
        self.metadata = json.loads(lib.psv_meta_json(self._h).decode())
        self.tensors: dict[str, tuple[int, int, tuple[int, ...]]] = {}
        self._index: dict[str, int] = {}
        n = lib.psv_tensor_count(self._h)
        for i in range(n):
            name = ctypes.c_char_p()
            ggml_type = ctypes.c_uint32()
            n_dims = ctypes.c_uint32()
            ne = (ctypes.c_uint64 * 4)()
            off = ctypes.c_uint64()
            lib.psv_tensor_info(self._h, i, ctypes.byref(name),
                                ctypes.byref(ggml_type), ctypes.byref(n_dims),
                                ne, ctypes.byref(off))
            nm = name.value.decode()
            dims = tuple(int(ne[d]) for d in range(n_dims.value))
            self._index[nm] = i
            self.tensors[nm] = (int(ggml_type.value), int(off.value), dims)

    def tensor_raw(self, name: str) -> np.ndarray:
        from .gguf import tensor_nbytes

        ggml_type, _, ne = self.tensors[name]
        n_el = int(np.prod(ne)) if ne else 1
        nbytes = tensor_nbytes(ggml_type, n_el)
        ptr = self._lib.psv_tensor_data(self._h, self._index[name])
        return np.ctypeslib.as_array(ptr, shape=(nbytes,))

    def close(self) -> None:
        if self._h:
            self._lib.psv_close(self._h)
            self._h = None


def native_repack(payload: np.ndarray, ggml_type: int, n_out: int,
                  k_in: int):
    """C++ repack -> (q, scales, bias) in the quant.py layout, with
    4-bit formats already nibble-packed. Returns None if unsupported."""
    from .gguf import GGMLType
    from .quant import choose_pack_group

    lib = get_lib()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    pp = payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    kb = k_in // 32
    scales = np.empty((kb, n_out), np.float32)
    sp = scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if ggml_type == GGMLType.Q4_0:
        group = choose_pack_group(k_in)
        q = np.zeros((k_in // 2, n_out), np.uint8)
        lib.psv_repack_q4_0(pp, n_out, k_in, group,
                            q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            sp)
        return q, scales, None, group, False
    if ggml_type == GGMLType.Q8_0:
        q = np.empty((k_in, n_out), np.int8)
        lib.psv_repack_q8_0(pp, n_out, k_in,
                            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                            sp)
        return q, scales, None, 0, False
    if ggml_type == GGMLType.Q4_K:
        group = choose_pack_group(k_in)
        q = np.zeros((k_in // 2, n_out), np.uint8)
        bias = np.empty((kb, n_out), np.float32)
        lib.psv_repack_q4_k(pp, n_out, k_in, group,
                            q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            sp,
                            bias.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return q, scales, bias, group, True
    if ggml_type == GGMLType.Q6_K:
        # dequant + per-32 int8 requant (the largest tensor in real
        # Q4_K_M files is the Q6_K output head)
        q = np.empty((k_in, n_out), np.int8)
        lib.psv_repack_q6_k(pp, n_out, k_in,
                            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                            sp)
        return q, scales, None, 0, False
    return None
