"""End-to-end engine tests on CPU: synthetic GGUF workspace -> load ->
generate; determinism and stop-token behavior."""

import numpy as np
import pytest

from powerserve_tpu.core.config import HyperParams
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.engine.generator import GenerationStats, InferenceEngine
from powerserve_tpu.models.loader import load_gguf_model
from powerserve_tpu.tokenizer import Tokenizer
from powerserve_tpu.tools.synthetic import make_synthetic_gguf


@pytest.fixture(scope="module")
def tiny_ws(tmp_path_factory):
    out = tmp_path_factory.mktemp("ws")
    make_synthetic_gguf(out, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
    return out


def _engine(tiny_ws, **hp_kw):
    cfg, params = load_gguf_model(tiny_ws / "model")
    hp_kw.setdefault("batch_size", 8)
    hp = HyperParams(max_slots=2, **hp_kw)
    hp.sampler.temperature = 0.0
    return InferenceEngine(params, cfg, hp, backend="xla"), cfg


def test_generate_deterministic(tiny_ws):
    engine, cfg = _engine(tiny_ws)
    prompt = [1, 5, 9, 12]
    out1 = list(engine.generate(prompt, 8))
    engine.reset()
    out2 = list(engine.generate(prompt, 8))
    assert out1 == out2
    assert len(out1) == 8
    assert all(0 <= t < cfg.llm.vocab_size for t in out1)


def test_generate_matches_unbatched_prefill(tiny_ws):
    """Chunked prefill (batch_size=2) must give the same continuation as
    batch_size=8 (chunking invariance)."""
    e1, _ = _engine(tiny_ws, batch_size=8)
    e2, _ = _engine(tiny_ws, batch_size=2)
    prompt = [1, 5, 9, 12, 3, 7]
    assert list(e1.generate(prompt, 6)) == list(e2.generate(prompt, 6))


def test_stats_populated(tiny_ws):
    engine, _ = _engine(tiny_ws)
    stats = GenerationStats()
    list(engine.generate([1, 2, 3, 4], 4, stats=stats))
    assert stats.prefill_tokens == 3
    assert stats.decode_tokens == 4
    assert stats.decode_speed > 0


def test_stop_fn(tiny_ws):
    engine, _ = _engine(tiny_ws)
    first = next(iter(engine.generate([1, 2, 3], 8)))
    engine.reset()
    out = list(engine.generate([1, 2, 3], 8, stop_fn=lambda t: t == first))
    assert out == [first]


def test_tokenizer_roundtrip_on_synthetic(tiny_ws):
    tok = Tokenizer.from_model_dir(tiny_ws / "model")
    ids = tok.tokenize("hi")
    assert ids[0] == 1  # bos
    assert len(ids) >= 2


def test_cli_self_draft(tmp_path, capsys):
    """`run --self-draft-layers N` greedy output equals plain greedy."""
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.run import main as run_main
    from powerserve_tpu.tools.synthetic import make_synthetic_gguf

    ws = tmp_path / "ws"
    make_synthetic_gguf(ws, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
    base_args = ["-d", str(ws), "-p", "hello", "-n", "8",
                 "--temperature", "0", "--backend", "xla", "--no-progress"]
    assert run_main(base_args) == 0
    plain = capsys.readouterr().out
    from powerserve_tpu.models.loader import load_gguf_model
    cfg, _ = load_gguf_model(str(ws / "model"))
    n_layers = cfg.llm.n_layers
    assert run_main(base_args + ["--self-draft-layers", str(n_layers)]) == 0
    spec = capsys.readouterr().out
    assert spec.splitlines()[:1] == plain.splitlines()[:1]
