"""Speculative-parameter grid search (reference tools/parameter_search,
P8): sweeps {draft_batch_size, draft_top_k, draft_temperature, p_base,
max_fan_out, min_prob} over a SpeculativeEngine and records a jsonl
database of tokens/step + acceptance rate, like the reference's
dump_file-driven on-device search (token_tree/common.py:17-80)."""

from __future__ import annotations

import argparse
import itertools
import json
from dataclasses import asdict
from pathlib import Path

from ..speculative.engine import SpecStats, SpeculativeEngine
from ..speculative.tree import SpeculativeConfig

DEFAULT_GRID = {
    "draft_batch_size": [8, 12, 16],
    "draft_top_k": [10, 15],
    "draft_temperature": [1.0, 1.5],
    "p_base": [0.8, 0.9],
    "max_fan_out": [2, 3],
    "min_prob": [0.1, 0.2],
}


def run_search(make_engine, prompt_ids: list[int], n_predict: int,
               grid: dict | None = None,
               out_path: str | Path = "spec_search.jsonl") -> list[dict]:
    """make_engine(cfg: SpeculativeConfig) -> SpeculativeEngine."""
    grid = grid or DEFAULT_GRID
    keys = sorted(grid)
    results = []
    with open(out_path, "a") as f:
        for values in itertools.product(*(grid[k] for k in keys)):
            cfg = SpeculativeConfig(**dict(zip(keys, values)))
            engine = make_engine(cfg)
            stats = SpecStats()
            for _ in engine.generate(prompt_ids, n_predict, stats=stats):
                pass
            rec = {**asdict(cfg),
                   "tokens_per_step": stats.tokens_per_step,
                   "accept_rate": stats.accept_rate,
                   "emitted": stats.emitted,
                   "decode_ms": stats.decode_ms}
            if stats.decode_ms:
                rec["decode_speed"] = stats.emitted / stats.decode_ms * 1e3
            results.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()
    results.sort(key=lambda r: -r.get("decode_speed",
                                      r["tokens_per_step"]))
    return results


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="powerserve-tpu param-search")
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("--draft-dir", required=True)
    ap.add_argument("-p", "--prompt", default="Tell me a story about")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-o", "--output", default="spec_search.jsonl")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args(argv)

    from ..models.loader import load_gguf_model
    from ..tokenizer import Tokenizer

    t_cfg, t_params = load_gguf_model(args.model_dir)
    d_cfg, d_params = load_gguf_model(args.draft_dir)
    tok = Tokenizer.from_model_dir(args.model_dir)
    ids = tok.tokenize(args.prompt)

    def make_engine(cfg):
        return SpeculativeEngine(t_params, t_cfg, d_params, d_cfg, cfg,
                                 backend=args.backend)

    results = run_search(make_engine, ids, args.n_predict,
                         out_path=args.output)
    best = results[0]
    print(json.dumps({"best": best}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
