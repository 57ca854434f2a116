"""`python -m powerserve_tpu.run` — CLI generation app.

TPU counterpart of `powerserve-run` (reference app/run/run.cpp:34-170):
loads a workspace, streams tokens to stdout, and prints prefill/decode
tok/s in the same spirit (run.cpp:126-140), plus an optional speed-info
JSON dump compatible with the parameter-search tooling
(POWERSERVE_DUMP_SPEEDINFO, run.cpp:141-156).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

from .core.config import HyperParams, WorkspaceConfig
from .core.logging import get_logger
from .engine.generator import GenerationStats, InferenceEngine
from .models.loader import load_gguf_model
from .tokenizer import Tokenizer

log = get_logger("run")


def build_engine(model_dir: str, hp: HyperParams,
                 backend: str = "auto") -> tuple[InferenceEngine, Tokenizer]:
    cfg, params = load_gguf_model(model_dir)
    tok = Tokenizer.from_model_dir(model_dir)
    try:
        nl_id = tok.tokenize("\n", add_bos=False)[-1]
    except Exception:
        nl_id = -1
    engine = InferenceEngine(params, cfg, hp, backend=backend,
                             eos_id=tok.eos_id, nl_id=nl_id)
    return engine, tok


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="powerserve-tpu run")
    ap.add_argument("-d", "--work-folder", required=True,
                    help="workspace dir (workspace.json) or model dir")
    ap.add_argument("-p", "--prompt", default="Hello, world")
    ap.add_argument("--prompt-file", default=None)
    ap.add_argument("-n", "--n-predicts", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--use-chat-template", action="store_true")
    ap.add_argument("--no-progress", action="store_true")
    ap.add_argument("--image", action="append", default=None,
                    help="image file for a VLM workspace (repeatable); "
                         "routed through the multimodal engine")
    ap.add_argument("--load-kv", default=None,
                    help="persistent system-prompt KV (.npz) to preload")
    ap.add_argument("--save-kv", default=None,
                    help="save the prompt's KV prefix after prefill")
    ap.add_argument("--draft", default=None,
                    help="draft model dir: speculative decoding "
                         "(reference run.cpp target+draft role)")
    ap.add_argument("--self-draft-layers", type=int, default=0,
                    help="LayerSkip self-draft depth (no draft model "
                         "needed; chain engine only)")
    ap.add_argument("--draft-head-rank", type=int, default=0,
                    help="factor the draft's lm_head to this rank "
                         "(lossless emitted stream; trades acceptance)")
    ap.add_argument("--spec-engine", default="chain",
                    choices=["chain", "tree", "device-tree", "eagle"],
                    help="chain: on-device loop (fast over remote "
                         "links); tree: host-driven token tree; "
                         "device-tree: on-device batched token tree; "
                         "eagle: feature-level draft head (--draft "
                         "must be a converted EAGLE head; auto-"
                         "selected when the draft GGUF arch is eagle)")
    ap.add_argument("--spec-k", type=int, default=4,
                    help="chain draft length per speculative step")
    ap.add_argument("--spec-tree", default="2,1,1",
                    help="device-tree widths per depth (node at depth d "
                         "spawns widths[d] draft children)")
    args = ap.parse_args(argv)

    root = Path(args.work_folder)
    if (root / "workspace.json").exists():
        ws = WorkspaceConfig.load(root)
        model_dir, hp = ws.main_model_dir, ws.hyper_params
    else:
        model_dir, hp = root, HyperParams()
    if args.temperature is not None:
        hp.sampler.temperature = args.temperature
    if args.top_k is not None:
        hp.sampler.top_k = args.top_k
    if args.top_p is not None:
        hp.sampler.top_p = args.top_p

    prompt = args.prompt
    if args.prompt_file:
        prompt = Path(args.prompt_file).read_text()

    log.info(f"loading model from {model_dir}")
    if args.image:
        return _run_vlm_cli(args, model_dir, hp, prompt)
    if args.draft or args.self_draft_layers:
        return _run_speculative(args, model_dir, hp)
    engine, tok = build_engine(str(model_dir), hp, args.backend)
    if args.use_chat_template:
        prompt = tok.apply_chat_template([{"role": "user", "content": prompt}])
    ids = tok.tokenize(prompt)
    log.info(f"prompt tokens: {len(ids)}")

    if args.load_kv:
        from .kv import load_prefix

        engine.kv, n_prefix = load_prefix(engine.kv, args.load_kv)
        log.info(f"loaded {n_prefix}-token KV prefix from {args.load_kv}")

    stats = GenerationStats()
    out_ids: list[int] = []
    print(prompt, end="", flush=True)
    for t in engine.generate(ids, args.n_predicts, stop_fn=tok.should_stop,
                             stats=stats):
        out_ids.append(t)
        piece = tok.to_string([t])
        print(piece, end="", flush=True)
    print()
    if args.save_kv:
        from .kv import save_prefix

        n = save_prefix(engine.kv, args.save_kv)
        log.info(f"saved {n}-token KV prefix to {args.save_kv}")
    log.info(f"prefill speed: {stats.prefill_speed:.2f} tokens/s")
    log.info(f"decode speed: {stats.decode_speed:.2f} tokens/s")

    dump = os.environ.get("POWERSERVE_DUMP_SPEEDINFO")
    if dump:
        with open(dump, "a") as f:
            json.dump({"prefill_speed": stats.prefill_speed,
                       "decode_speed": stats.decode_speed,
                       "n_prefill": stats.prefill_tokens,
                       "n_decode": stats.decode_tokens}, f)
            f.write("\n")
    return 0


def _run_vlm_cli(args, model_dir, hp, prompt: str) -> int:
    """CLI multimodal generation (reference's InternVL runs NPU-only
    via its apps; here `run --image cat.png -p "describe"` drives the
    same VLM engine the server uses)."""
    from PIL import Image

    from .engine.vlm import VLMEngine
    from .models.internvl import internvl_from_workspace

    d = Path(model_dir)
    if (d / "vision.gguf").exists():
        ivl = internvl_from_workspace(d)
    else:
        import torch
        from transformers import InternVLForConditionalGeneration

        from .models.internvl import internvl_from_hf

        m = InternVLForConditionalGeneration.from_pretrained(
            d, torch_dtype=torch.float32)
        ivl = internvl_from_hf(m)
        del m
    tok = Tokenizer.from_model_dir(str(model_dir))
    if args.use_chat_template:
        prompt = tok.apply_chat_template([{"role": "user", "content": prompt}])
    ids = tok.tokenize(prompt)
    images = [Image.open(p) for p in args.image]
    eng = VLMEngine(ivl, hp, args.backend)
    from .core.logging import Timer

    timer = Timer()
    n = 0
    print(prompt, end="", flush=True)
    for t in eng.generate(ids, images, args.n_predicts,
                          stop_fn=tok.should_stop):
        n += 1
        print(tok.to_string([t]), end="", flush=True)
    print()
    dt = timer.elapsed_time_ms() / 1e3
    log.info(f"generated {n} tokens in {dt:.2f}s "
             f"({n / max(dt, 1e-9):.2f} tokens/s)")
    return 0


def _run_speculative(args, model_dir, hp) -> int:
    """Speculative CLI path (reference speculative app role)."""
    from .models.loader import load_gguf_model
    from .speculative.engine import SpecStats

    cfg, params = load_gguf_model(str(model_dir))
    tok = Tokenizer.from_model_dir(str(model_dir))
    prompt = args.prompt
    if args.prompt_file:
        prompt = Path(args.prompt_file).read_text()
    if args.use_chat_template:
        prompt = tok.apply_chat_template([{"role": "user", "content": prompt}])
    ids = tok.tokenize(prompt)
    log.info(f"prompt tokens: {len(ids)}")

    if args.draft and args.spec_engine in ("chain", "eagle", "device-tree"):
        # an EAGLE head GGUF auto-selects the eagle engine
        from .core.gguf import GGUFReader

        dp = Path(args.draft)
        rd = GGUFReader(dp / "weights.gguf" if dp.is_dir() else dp)
        draft_arch = rd.metadata.get("general.architecture")
        rd.close()
        if draft_arch == "eagle" or args.spec_engine == "eagle":
            if draft_arch != "eagle":
                log.error(f"--spec-engine eagle needs an eagle head GGUF "
                          f"(got arch={draft_arch})")
                return 1
            from .models.loader import load_eagle_gguf
            from .speculative.eagle import EagleChainEngine

            e_llm, ep = load_eagle_gguf(args.draft, params, cfg.llm)
            # --spec-engine device-tree + eagle head = EAGLE-2-style
            # tree drafting over --spec-tree widths
            tpl = None
            if args.spec_engine == "device-tree":
                from .speculative.device_tree import TreeTemplate

                tpl = TreeTemplate.from_widths(
                    [int(w) for w in args.spec_tree.split(",")])
            eng = EagleChainEngine(params, cfg, ep, e_llm, k=args.spec_k,
                                   backend=args.backend, template=tpl)
            return _spec_generate(args, tok, eng, prompt, ids)
    elif args.spec_engine == "eagle":
        log.error("--spec-engine eagle needs --draft <eagle head dir>")
        return 1

    if args.spec_engine == "tree":
        from .speculative.engine import SpeculativeEngine
        from .speculative.tree import SpeculativeConfig

        if not args.draft:
            log.error("tree engine needs --draft")
            return 1
        d_cfg, d_params = load_gguf_model(args.draft)
        eng = SpeculativeEngine(params, cfg, d_params, d_cfg,
                                SpeculativeConfig(), backend=args.backend)
    elif args.spec_engine == "device-tree":
        from .speculative.device_tree import DeviceTreeEngine, TreeTemplate

        tpl = TreeTemplate.from_widths(
            [int(w) for w in args.spec_tree.split(",")])
        kw = {}
        if args.self_draft_layers:
            kw["self_draft_layers"] = args.self_draft_layers
        else:
            d_cfg, d_params = load_gguf_model(args.draft)
            kw.update(draft_params=d_params, draft_cfg=d_cfg)
        eng = DeviceTreeEngine(params, cfg, template=tpl,
                               backend=args.backend, **kw)
    else:
        from .speculative.chain import ChainSpecEngine

        if args.self_draft_layers:
            eng = ChainSpecEngine(params, cfg,
                                  self_draft_layers=args.self_draft_layers,
                                  k=args.spec_k, backend=args.backend)
        else:
            d_cfg, d_params = load_gguf_model(args.draft)
            eng = ChainSpecEngine(params, cfg, d_params, d_cfg,
                                  k=args.spec_k, backend=args.backend)

    return _spec_generate(args, tok, eng, prompt, ids)


def _apply_draft_head_rank(args, eng) -> None:
    """--draft-head-rank: factor the DRAFT's lm_head (lossless emitted
    stream; trades acceptance — speculative/draft_head.py)."""
    if not getattr(args, "draft_head_rank", 0):
        return
    import dataclasses

    from .speculative.draft_head import make_draft_head

    if hasattr(eng, "ep"):  # EagleChainEngine
        eng.ep = dataclasses.replace(eng.ep, lm_head_lr=make_draft_head(
            eng.ep.lm_head, rank=args.draft_head_rank))
    elif hasattr(eng, "dp"):  # ChainSpecEngine / DeviceTreeEngine
        eng.dp = dataclasses.replace(eng.dp, lm_head_lr=make_draft_head(
            eng.dp.lm_head, rank=args.draft_head_rank))


def _spec_generate(args, tok, eng, prompt, ids) -> int:
    from .core.logging import Timer
    from .speculative.engine import SpecStats

    _apply_draft_head_rank(args, eng)
    stats = SpecStats()
    timer = Timer()
    print(prompt, end="", flush=True)
    n_out = 0
    for t in eng.generate(ids, args.n_predicts, stop_fn=tok.should_stop,
                          stats=stats):
        n_out += 1
        print(tok.to_string([t]), end="", flush=True)
    print()
    dt = timer.elapsed_time_ms() / 1e3
    log.info(stats.summary())
    log.info(f"decode speed: {n_out / max(dt, 1e-9):.2f} tokens/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
