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


# on-device engine grids (chain k, tree widths — the knobs that set
# the tokens/step vs per-step-cost tradeoff)
CHAIN_GRID = {"k": [3, 4, 6]}
TREE_GRID = {"widths": ["1,1,1", "2,1,1", "2,2,1", "3,1,1"]}


def run_engine_search(make_engine, grid: dict, prompt_ids: list[int],
                      n_predict: int,
                      out_path: str | Path = "spec_search.jsonl"
                      ) -> list[dict]:
    """Grid search over an on-device engine factory
    (make_engine(**params) -> object with .generate(ids, n, stats=))."""
    keys = sorted(grid)
    results = []
    with open(out_path, "a") as f:
        for values in itertools.product(*(grid[k] for k in keys)):
            import time

            params = dict(zip(keys, values))
            engine = make_engine(**params)
            stats = SpecStats()
            # warm-up run compiles the scan; the timed run measures it
            for _ in engine.generate(prompt_ids, min(n_predict, 8),
                                     stats=SpecStats()):
                pass
            t0 = time.perf_counter()
            for _ in engine.generate(prompt_ids, n_predict, stats=stats):
                pass
            dt = time.perf_counter() - t0
            rec = {**params,
                   "tokens_per_step": stats.tokens_per_step,
                   "accept_rate": stats.accept_rate,
                   "emitted": stats.emitted,
                   "wall_s": round(dt, 3),
                   "wall_tok_s": round(stats.emitted / max(dt, 1e-9), 1)}
            results.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()
    results.sort(key=lambda r: -r["wall_tok_s"])
    return results


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="powerserve-tpu param-search")
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("--draft-dir", default=None)
    ap.add_argument("--engine", default="tree",
                    choices=["tree", "chain", "device-tree", "eagle"],
                    help="tree: host token tree (reference knobs); "
                         "chain/device-tree/eagle: on-device engines "
                         "(k / tree-width grids)")
    ap.add_argument("--self-draft-layers", type=int, default=0,
                    help="chain/device-tree: LayerSkip self-draft depth "
                         "instead of --draft-dir")
    ap.add_argument("-p", "--prompt", default="Tell me a story about")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-o", "--output", default="spec_search.jsonl")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args(argv)

    from ..models.loader import load_gguf_model
    from ..tokenizer import Tokenizer

    t_cfg, t_params = load_gguf_model(args.model_dir)
    tok = Tokenizer.from_model_dir(args.model_dir)
    ids = tok.tokenize(args.prompt)

    if args.engine == "tree":
        d_cfg, d_params = load_gguf_model(args.draft_dir)

        def make_engine(cfg):
            return SpeculativeEngine(t_params, t_cfg, d_params, d_cfg, cfg,
                                     backend=args.backend)

        results = run_search(make_engine, ids, args.n_predict,
                             out_path=args.output)
    elif args.engine == "eagle":
        from ..models.loader import load_eagle_gguf
        from ..speculative.eagle import EagleChainEngine

        e_llm, ep = load_eagle_gguf(args.draft_dir, t_params, t_cfg.llm)

        def mk_eagle(k):
            return EagleChainEngine(t_params, t_cfg, ep, e_llm, k=k,
                                    backend=args.backend)

        results = run_engine_search(mk_eagle, CHAIN_GRID, ids,
                                    args.n_predict, out_path=args.output)
    else:
        dkw: dict = {}
        if args.self_draft_layers:
            dkw["self_draft_layers"] = args.self_draft_layers
        else:
            d_cfg, d_params = load_gguf_model(args.draft_dir)
            dkw.update(draft_params=d_params, draft_cfg=d_cfg)
        if args.engine == "chain":
            from ..speculative.chain import ChainSpecEngine

            def mk_chain(k):
                return ChainSpecEngine(t_params, t_cfg, k=k,
                                       backend=args.backend, **dkw)

            results = run_engine_search(mk_chain, CHAIN_GRID, ids,
                                        args.n_predict,
                                        out_path=args.output)
        else:
            from ..speculative.device_tree import (
                DeviceTreeEngine,
                TreeTemplate,
            )

            def mk_tree(widths):
                tpl = TreeTemplate.from_widths(
                    [int(w) for w in widths.split(",")])
                return DeviceTreeEngine(t_params, t_cfg, template=tpl,
                                        backend=args.backend, **dkw)

            results = run_engine_search(mk_tree, TREE_GRID, ids,
                                        args.n_predict,
                                        out_path=args.output)
    best = results[0]
    print(json.dumps({"best": best}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
