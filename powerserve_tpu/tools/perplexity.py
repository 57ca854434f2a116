"""Perplexity evaluation (reference app/perplexity/main.cpp:13-139).

Same algorithm: slide over the token stream in batches, accumulate
log-softmax of each reference next-token, ppl = exp(-sum log p / n),
skipping the first `warmup_batches * batch_size` predictions
(PPL_START_ID semantics, main.cpp:23)."""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import numpy as np


class PerplexityCalculator:
    """Streaming accumulator (reference perplexity/main.cpp:13-47)."""

    def __init__(self, warmup_tokens: int = 0):
        self.warmup = warmup_tokens
        self.seen = 0
        self.log_prob_sum = 0.0
        self.count = 0

    def update(self, logits: np.ndarray, next_tokens: np.ndarray) -> None:
        """logits [T, V] for positions whose next token is next_tokens [T]."""
        logits = np.asarray(logits, np.float64)
        m = logits.max(axis=-1, keepdims=True)
        logz = m[:, 0] + np.log(np.exp(logits - m).sum(axis=-1))
        logp = logits[np.arange(len(next_tokens)), next_tokens] - logz
        for lp in logp:
            self.seen += 1
            if self.seen <= self.warmup:
                continue
            self.log_prob_sum += lp
            self.count += 1

    @property
    def ppl(self) -> float:
        if self.count == 0:
            return float("inf")
        return math.exp(-self.log_prob_sum / self.count)


def compute_perplexity(params, cfg, token_ids: list[int],
                       batch_size: int = 32, max_seq: int = 0,
                       backend: str = "xla",
                       warmup_batches: int = 1) -> float:
    """Batched forward over the corpus (reference main.cpp:63-139)."""
    import jax
    import jax.numpy as jnp

    from ..kv.cache import KVCache
    from ..models.llama import forward

    llm = cfg.llm
    max_seq = max_seq or llm.seq_len
    n = min(len(token_ids), max_seq)
    toks = np.asarray(token_ids[:n], np.int32)
    calc = PerplexityCalculator(warmup_tokens=warmup_batches * batch_size)
    kv = KVCache.create(llm.n_layers, 1, max_seq, llm.n_kv_heads,
                        llm.head_size, dtype="int8")

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,),
                       static_argnames=("T",))
    def step(params, kv, tokens, positions, T):
        return forward(params, llm, kv, tokens, positions, backend=backend,
                       logits_mode="all")

    for off in range(0, n - 1, batch_size):
        part = toks[off : off + batch_size]
        T = len(part)
        positions = (off + np.arange(T, dtype=np.int32))[None, :]
        logits, kv = step(params, kv, jnp.asarray(part[None, :]),
                          jnp.asarray(positions), T=T)
        logits = np.asarray(logits)[0][:, :llm.vocab_size]  # [T, V]
        # prediction at position off+i scores token off+i+1
        valid = min(T, n - 1 - off)
        calc.update(logits[:valid], toks[off + 1 : off + 1 + valid])
    return calc.ppl


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="powerserve-tpu perplexity")
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("-p", "--prompt-file", required=True)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-seq", type=int, default=0)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args(argv)

    from ..models.loader import load_gguf_model
    from ..tokenizer import Tokenizer

    cfg, params = load_gguf_model(args.model_dir)
    tok = Tokenizer.from_model_dir(args.model_dir)
    text = Path(args.prompt_file).read_text()
    ids = tok.tokenize(text)
    ppl = compute_perplexity(params, cfg, ids, args.batch_size,
                             args.max_seq, args.backend)
    print(json.dumps({"perplexity": ppl, "n_tokens": len(ids)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
