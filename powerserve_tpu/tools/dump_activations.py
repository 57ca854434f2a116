"""Per-layer activation dumping for numerics debugging.

Role of the reference's POWERSERVE_DUMP_TENSORS compile flag
(executor.cpp:52-75 + tools/cos_sim.py): dump per-layer hidden states
to .npy files from two implementations and compare with cos_sim.

  python -m powerserve_tpu.tools.dump_activations -d model_dir \
      -p "prompt" -o dumps/ours
  # then: python -m powerserve_tpu.tools.cos_sim dumps/ours dumps/ref
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def dump_forward(params, cfg, token_ids: list[int], out_dir: str | Path,
                 backend: str = "xla", kv_dtype: str = "bf16") -> Path:
    import jax.numpy as jnp

    from ..kv.cache import KVCache
    from ..models.llama import forward

    llm = cfg.llm
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    T = len(token_ids)
    kv = KVCache.create(llm.n_layers, 1, max(T + 8, 16), llm.n_kv_heads,
                        llm.head_size, dtype=kv_dtype)
    logits, kv, hidden = forward(
        params, llm, kv, jnp.asarray([token_ids], jnp.int32),
        jnp.arange(T, dtype=jnp.int32)[None, :], backend=backend,
        logits_mode="all", return_hidden=True)
    # save f32 — bf16 .npy files don't round-trip without ml_dtypes
    hidden = np.asarray(hidden, dtype=np.float32)  # [L, S, T, dim]
    for layer in range(hidden.shape[0]):
        np.save(out / f"layer_{layer:02d}.npy", hidden[layer, 0])
    np.save(out / "logits.npy", np.asarray(logits, dtype=np.float32)[0])
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="powerserve-tpu dump-activations")
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("-p", "--prompt", default="Hello world")
    ap.add_argument("-o", "--out-dir", required=True)
    ap.add_argument("--backend", default="xla")
    args = ap.parse_args(argv)

    from ..models.loader import load_gguf_model
    from ..tokenizer import Tokenizer

    cfg, params = load_gguf_model(args.model_dir)
    tok = Tokenizer.from_model_dir(args.model_dir)
    ids = tok.tokenize(args.prompt)
    out = dump_forward(params, cfg, ids, args.out_dir, args.backend)
    print(f"dumped {cfg.llm.n_layers} layers + logits to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
