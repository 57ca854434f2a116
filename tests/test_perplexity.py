"""Perplexity tool tests: calculator math + parity with HF transformers
cross-entropy on a tiny model (the reference's own quality gate,
app/perplexity/main.cpp)."""

import math

import numpy as np
import pytest

from powerserve_tpu.tools.perplexity import (
    PerplexityCalculator,
    compute_perplexity,
)

torch = pytest.importorskip("torch")


def test_calculator_uniform():
    V = 8
    calc = PerplexityCalculator()
    logits = np.zeros((5, V), np.float32)  # uniform -> ppl = V
    calc.update(logits, np.arange(5) % V)
    assert abs(calc.ppl - V) < 1e-6


def test_calculator_warmup_skips():
    calc = PerplexityCalculator(warmup_tokens=3)
    logits = np.zeros((3, 4), np.float32)
    calc.update(logits, np.zeros(3, np.int64))
    assert calc.count == 0 and calc.ppl == float("inf")
    calc.update(logits, np.zeros(3, np.int64))
    assert calc.count == 3


def test_perplexity_matches_hf():
    from tests.test_model_golden import _mk_hf_llama, _to_sd
    from powerserve_tpu.core.gguf import GGMLType
    from powerserve_tpu.models import params_from_hf_state_dict

    torch.manual_seed(0)
    model, cfg = _mk_hf_llama()
    params = params_from_hf_state_dict(_to_sd(model), cfg, fmt=GGMLType.Q8_0)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.llm.vocab_size, 48).tolist()

    with torch.no_grad():
        t = torch.tensor([ids])
        out = model(t).logits[0]  # [T, V]
        logp = torch.log_softmax(out.float(), dim=-1)
        lp = logp[torch.arange(len(ids) - 1), torch.tensor(ids[1:])]
        ref_ppl = float(torch.exp(-lp.mean()))

    got = compute_perplexity(params, cfg, ids, batch_size=16, max_seq=64,
                             backend="xla", warmup_batches=0)
    assert abs(got - ref_ppl) / ref_ppl < 0.05, f"{got} vs {ref_ppl}"
