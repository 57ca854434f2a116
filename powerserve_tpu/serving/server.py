"""OpenAI-compatible HTTP server (aiohttp) with continuous batching.

API surface mirrors the reference server (reference app/server/
simple_server.cpp:27-37, openai_api.hpp):
  POST /completion, /completions, /v1/completions
  POST /chat/completions, /v1/chat/completions
  GET  /v1/models
SSE streaming emits `data: {...}` chunks then `data: [DONE]`
(openai_api.hpp:284-332) with UTF-8-safe text chunking
(server_handler.hpp:455-506). The reference's "target+draft" model-name
syntax selects speculative decoding (server_handler.hpp:250-262).

Unlike the reference (one sequence at a time behind a mutex), plain AND
speculative requests share continuous-batching schedulers (batched chain
speculation); `--tp/--dp/--distributed` shard serving over a device mesh
(GSPMD), net-new scale-out vs the single-device reference.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from dataclasses import dataclass
from pathlib import Path

from aiohttp import web

from ..core.config import HyperParams, WorkspaceConfig
from ..core.logging import get_logger
from ..engine.scheduler import BatchScheduler, Request
from ..models.loader import load_gguf_model
from ..speculative.engine import SpecStats, SpeculativeEngine
from ..speculative.tree import SpeculativeConfig
from ..tokenizer import Tokenizer

log = get_logger("server")


class IncrementalDecoder:
    """UTF-8-safe streaming detokenizer: holds back text that ends in a
    partial multibyte sequence (reference server_handler.hpp:455-506)."""

    def __init__(self, tokenizer: Tokenizer):
        self.tok = tokenizer
        self.ids: list[int] = []
        self.emitted = 0

    def push(self, token_id: int) -> str:
        self.ids.append(token_id)
        text = self.tok.to_string(self.ids)
        if text.endswith("�"):
            return ""
        out = text[self.emitted:]
        self.emitted = len(text)
        return out

    def flush(self) -> str:
        text = self.tok.to_string(self.ids)
        out = text[self.emitted:]
        self.emitted = len(text)
        return out


@dataclass
class ModelContext:
    name: str
    scheduler: BatchScheduler | None
    tokenizer: Tokenizer
    spec: SpeculativeEngine | None = None
    spec_lock: asyncio.Lock | None = None
    # InternVLModel for multimodal requests (vision tower + embedding
    # injection); generation runs on the shared scheduler in mm mode,
    # so VLM requests batch continuously instead of serializing
    vlm: object | None = None


class ServerContext:
    """Model registry (reference ServerContext, server_handler.hpp:250-343).

    Model names resolve to dirs under `model_root`; "main+draft" syntax
    builds a speculative engine pair."""

    def __init__(self, model_root: str | Path, default_model: str = "",
                 hp: HyperParams | None = None, backend: str = "auto",
                 mesh=None, max_models: int = 0, pp: bool = False,
                 shard_map: bool = True):
        self.root = Path(model_root)
        self.hp = hp or HyperParams()
        self.backend = backend
        # multichip serving over this device mesh. Default path is the
        # EXPLICIT shard_map one (parallel/tp.py): every scheduler step
        # runs the fused Pallas dequant kernel on local weight shards
        # with megatron collectives. shard_map=False (serve --gspmd)
        # falls back to GSPMD auto-partitioning, which forces
        # backend="xla" because Pallas calls are GSPMD-opaque; models
        # whose shapes or modes the shard_map path can't handle (EAGLE
        # drafts, non-divisible head counts) fall back per-model.
        # pp=True treats the mesh as PIPELINE stages instead (layers +
        # KV slices over "pp", parallel/pp.py)
        self.mesh = mesh
        self.pp = bool(pp)
        self.sm = bool(shard_map) and mesh is not None and not self.pp \
            and mesh.shape.get("pp", 1) == 1
        hp_ = hp or HyperParams()
        if self.sm and getattr(hp_, "paged_pages", 0) > 0 and (
                mesh.shape.get("dp", 1) > 1 or mesh.shape.get("sp", 1) > 1):
            log.warning("paged pool x shard_map tp needs dp == sp == 1; "
                        "falling back to GSPMD serving")
            self.sm = False
        self.models: dict[str, ModelContext] = {}
        # HBM eviction budget: > 0 caps loaded model contexts, evicting
        # the least-recently-used IDLE one (reference keeps a single
        # model unless POWERSERVE_SERVER_MULTIMODEL,
        # server_handler.hpp:268-270; here the cap is a count)
        self.max_models = int(max_models)
        self._lru: list[str] = []
        self.default_model = default_model
        # HTTP sessions: named, pinned KV prefixes (agent workloads
        # resume a long system prompt / conversation without re-prefill;
        # the reference's converter-time persistent system-prompt KV —
        # graph_interface.cpp:218-260 — generalized to a runtime API)
        self.sessions: dict[str, dict] = {}

    def _load(self, d, sm: bool | None = None):
        """Load + shard one model. Returns (cfg, params, used_sm):
        used_sm=True means params carry the shard_map layout
        (parallel/tp.py prepare+shard — fused columns PERMUTED per
        shard, only valid through tp_forward / a tp_mesh scheduler)."""
        cfg, params = load_gguf_model(d)
        sm = self.sm if sm is None else sm
        if self.mesh is not None and self.pp:
            from ..parallel.pp import shard_params_pp

            params = shard_params_pp(params, self.mesh, cfg.llm)
        elif self.mesh is not None and sm:
            from ..parallel.tp import shard_params_tp

            try:
                return cfg, shard_params_tp(params, self.mesh,
                                            cfg.llm), True
            except ValueError as e:
                log.warning(f"{d}: shard_map tp layout unavailable "
                            f"({e}); falling back to GSPMD")
                from ..parallel.mesh import shard_params

                params = shard_params(params, self.mesh)
        elif self.mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        return cfg, params, False

    def resolve_dir(self, name: str) -> Path:
        p = self.root / name
        if p.is_dir():
            return p
        if (self.root / name / "weights.gguf").exists():
            return self.root / name
        if name in ("", "default") and (self.root / "weights.gguf").exists():
            return self.root
        raise web.HTTPNotFound(text=f"unknown model '{name}'")

    def _is_vlm_dir(self, d: Path) -> bool:
        if (d / "vision.gguf").exists():  # GGUF-native VLM workspace
            return True
        cfg = d / "config.json"
        if not cfg.exists():
            return False
        try:
            archs = json.loads(cfg.read_text()).get("architectures", [])
        except json.JSONDecodeError:
            return False
        return any("InternVL" in a for a in archs)

    def _is_eagle_dir(self, d: Path) -> bool:
        gg = d / "weights.gguf" if d.is_dir() else d
        if not gg.exists():
            return False
        from ..core.gguf import GGUFReader

        rd = GGUFReader(gg)
        try:
            return rd.metadata.get("general.architecture") == "eagle"
        finally:
            rd.close()

    def _load_ivl(self, d: Path):
        """VLM bundle from a GGUF workspace (vision.gguf, preferred) or
        an InternVL HF checkpoint dir (reference loads its VLM from NPU
        context binaries; here from GGUF or the HF checkpoint)."""
        if (d / "vision.gguf").exists():
            from ..models.internvl import internvl_from_workspace

            return internvl_from_workspace(d)
        import torch
        from transformers import InternVLForConditionalGeneration

        from ..models.internvl import internvl_from_hf

        m = InternVLForConditionalGeneration.from_pretrained(
            d, torch_dtype=torch.float32)
        ivl = internvl_from_hf(m)
        del m
        return ivl

    def _load_vlm(self, name: str, d: Path) -> ModelContext:
        ivl = self._load_ivl(d)
        tok = Tokenizer.from_model_dir(d)
        params, mesh_kw = ivl.llm_params, dict(mesh=self.mesh)
        if self.sm:
            from ..parallel.tp import shard_params_tp

            try:
                params = shard_params_tp(params, self.mesh, ivl.cfg.llm)
                mesh_kw = dict(tp_mesh=self.mesh)
            except ValueError as e:
                log.warning(f"{d}: shard_map tp layout unavailable "
                            f"({e}); VLM falls back to GSPMD")
        sched = BatchScheduler(params, ivl.cfg, self.hp,
                               self.backend, mm_dim=ivl.cfg.llm.dim,
                               **mesh_kw)
        sched.start()
        return ModelContext(name, sched, tok, vlm=ivl)

    def _touch(self, name: str) -> None:
        if name in self._lru:
            self._lru.remove(name)
        self._lru.append(name)

    def _evict_to_budget(self) -> None:
        """Drop least-recently-used IDLE model contexts past the cap
        (an in-flight model is skipped, never killed)."""
        if self.max_models <= 0:
            return
        for name in list(self._lru):
            if len(self.models) <= self.max_models:
                return
            ctx = self.models.get(name)
            if ctx is None:
                self._lru.remove(name)
                continue
            sched = ctx.scheduler
            busy = sched is not None and (
                sched.n_active > 0 or not sched.pending.empty())
            # a "main+draft" context shares its base model's scheduler;
            # never stop a scheduler another live context points at
            shared = sum(1 for c in self.models.values()
                         if c.scheduler is sched) > 1
            if busy or shared or name == self._lru[-1]:
                continue
            if sched is not None:
                sched.stop()
            del self.models[name]
            self._lru.remove(name)
            log.info(f"evicted idle model context '{name}' "
                     f"(budget {self.max_models})")

    def get(self, name: str) -> ModelContext:
        name = name or self.default_model or "default"
        if name in self.models:
            self._touch(name)
            return self.models[name]
        if "+" not in name:
            d = self.resolve_dir(name)
            if self._is_vlm_dir(d):
                ctx = self._load_vlm(name, d)
                self.models[name] = ctx
                self._touch(name)
                self._evict_to_budget()
                return ctx
        if "+" in name:
            import os

            main_name, draft_name = name.split("+", 1)
            engine_kind = os.environ.get("POWERSERVE_SPEC_ENGINE", "chain")
            is_self = draft_name.startswith("self:")
            draft_dir = None if is_self else self.resolve_dir(draft_name)
            is_eagle = draft_dir is not None \
                and self._is_eagle_dir(draft_dir)
            # the host tree engine runs outside the shard_map path
            # (plain forward); spec x sequence-parallel is also
            # unsupported there. EAGLE rides shard_map (tp_eagle_*).
            main_dir = self.resolve_dir(main_name)
            is_vlm_main = self._is_vlm_dir(main_dir)
            want_sm = (self.sm and engine_kind != "tree"
                       and not is_vlm_main
                       and (self.mesh is None
                            or self.mesh.shape.get("sp", 1) == 1))
            ivl = None
            if is_vlm_main:
                # VLM x speculation (net-new vs the reference's
                # single-stream VLM): spec requests carry injected
                # image embeddings through BOTH models' prefills
                # (scheduler _spec_mm_prefill_chunk)
                if engine_kind == "tree" or is_eagle or self.pp:
                    raise web.HTTPBadRequest(
                        text="VLM speculation supports the batched "
                             "chain/tree scheduler only (no host tree "
                             "engine, EAGLE, or --pp)")
                ivl = self._load_ivl(main_dir)
                t_cfg, t_params, t_sm = ivl.cfg, ivl.llm_params, False
                if self.mesh is not None:
                    from ..parallel.mesh import shard_params

                    t_params = shard_params(t_params, self.mesh)
            else:
                t_cfg, t_params, t_sm = self._load(main_dir, sm=want_sm)
            tok = Tokenizer.from_model_dir(main_dir)
            if engine_kind == "tree":
                # host-driven token tree, single-stream behind a lock
                d_cfg, d_params, _ = self._load(draft_dir, sm=False)
                spec = SpeculativeEngine(t_params, t_cfg, d_params, d_cfg,
                                         SpeculativeConfig(),
                                         kv_dtype=self.hp.kv_dtype,
                                         backend=self.backend)
                base = self.get(main_name)
                ctx = ModelContext(name, base.scheduler, tok, spec,
                                   asyncio.Lock())
            else:
                # batched chain speculation: spec requests share a
                # continuous-batching scheduler (each tick drafts a
                # chain per slot and verifies all slots in one target
                # forward) instead of serializing behind a lock.
                # "model+self:N" runs a LayerSkip self-draft over the
                # target's own stacked weights, N layers deep.
                from ..speculative.chain import self_draft_config

                if is_self:
                    if self.pp:
                        raise web.HTTPBadRequest(
                            text="self-draft speculation does not "
                                 "compose with --pp (layer truncation "
                                 "breaks the stage layout); use a "
                                 "separate draft model")
                    d_params = t_params
                    d_llm = self_draft_config(t_cfg.llm,
                                              int(draft_name[5:]))
                elif is_eagle:
                    # EAGLE feature-level draft head: every tick drafts
                    # a spec_k chain per slot with the head and one
                    # batched target verify covers all slots (EAGLE x
                    # continuous batching, no serializing lock)
                    from ..models.loader import load_eagle_gguf

                    def _mk_eagle(tp_):
                        e_llm, ep = load_eagle_gguf(
                            draft_dir, tp_, t_cfg.llm)
                        rank = int(getattr(self.hp, "draft_head_rank", 0))
                        if rank:
                            import dataclasses as _dc

                            from ..speculative.draft_head import (
                                make_draft_head,
                            )

                            ep = _dc.replace(
                                ep, lm_head_lr=make_draft_head(
                                    ep.lm_head, rank=rank))
                        return e_llm, ep

                    e_llm, ep = _mk_eagle(t_params)
                    mesh_kw = dict(mesh=self.mesh)
                    if self.pp:
                        # eagle x pipeline: target pp-sharded, head
                        # replicated (scheduler pp branch)
                        mesh_kw = dict(pp_mesh=self.mesh)
                    elif t_sm:
                        # EAGLE x shard_map tp: the head shards like a
                        # target layer (parallel/tp.py shard_eagle_tp);
                        # if its geometry won't split, the PAIR falls
                        # back to GSPMD (both must run the same path)
                        from ..parallel.tp import shard_eagle_tp

                        try:
                            ep = shard_eagle_tp(ep, self.mesh, e_llm)
                            mesh_kw = dict(tp_mesh=self.mesh)
                        except ValueError as e:
                            log.warning(
                                f"eagle head not shard_map-shardable "
                                f"({e}); pair falls back to GSPMD")
                            t_cfg, t_params, t_sm = self._load(
                                main_dir, sm=False)
                            e_llm, ep = _mk_eagle(t_params)
                    sched = BatchScheduler(t_params, t_cfg, self.hp,
                                           self.backend,
                                           eagle_params=ep, eagle_llm=e_llm,
                                           **mesh_kw)
                    sched.start()
                    ctx = ModelContext(name, sched, tok)
                    self.models[name] = ctx
                    self._touch(name)
                    self._evict_to_budget()
                    return ctx
                else:
                    d_cfg, d_params, d_sm = self._load(draft_dir, sm=t_sm)
                    if t_sm and not d_sm:
                        # the draft can't take the shard_map layout:
                        # both models must run the same path — reload
                        # the target with GSPMD shardings
                        log.warning(f"draft '{draft_name}' not shard_map-"
                                    f"shardable; pair falls back to GSPMD")
                        t_cfg, t_params, t_sm = self._load(
                            self.resolve_dir(main_name), sm=False)
                    d_llm = d_cfg.llm
                    # acceptance compares token IDS: a vocab mismatch
                    # would silently accept nonsense, not error
                    if d_llm.vocab_size != t_cfg.llm.vocab_size:
                        raise web.HTTPBadRequest(
                            text=f"draft vocab ({d_llm.vocab_size}) != "
                                 f"target vocab ({t_cfg.llm.vocab_size})")
                if t_sm:
                    mesh_kw = dict(tp_mesh=self.mesh)
                elif self.pp:
                    # chain-spec x pipeline (the scheduler rejects tree
                    # templates under pp); both models are pp-sharded
                    mesh_kw = dict(pp_mesh=self.mesh)
                else:
                    mesh_kw = dict(mesh=self.mesh)
                rank = int(getattr(self.hp, "draft_head_rank", 0))
                if rank:
                    # factored DRAFT head: the per-draft lm_head read is
                    # the measured spec bottleneck (.bench_eagle_ablate)
                    import dataclasses as _dc

                    from ..speculative.draft_head import make_draft_head

                    d_params = _dc.replace(
                        d_params, lm_head_lr=make_draft_head(
                            d_params.lm_head, rank=rank))
                sched = BatchScheduler(t_params, t_cfg, self.hp,
                                       self.backend,
                                       draft_params=d_params,
                                       draft_llm=d_llm,
                                       mm_dim=(t_cfg.llm.dim
                                               if ivl is not None else 0),
                                       **mesh_kw)
                sched.start()
                ctx = ModelContext(name, sched, tok, vlm=ivl)
        else:
            cfg, params, used_sm = self._load(self.resolve_dir(name))
            if self.pp:
                sched = BatchScheduler(params, cfg, self.hp, self.backend,
                                       pp_mesh=self.mesh)
            elif used_sm:
                sched = BatchScheduler(params, cfg, self.hp, self.backend,
                                       tp_mesh=self.mesh)
            else:
                sched = BatchScheduler(params, cfg, self.hp, self.backend,
                                       mesh=self.mesh)
            sched.start()
            tok = Tokenizer.from_model_dir(self.resolve_dir(name))
            ctx = ModelContext(name, sched, tok)
        self.models[name] = ctx
        self._touch(name)
        self._evict_to_budget()
        return ctx


def _now_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


def _session_prefix_ids(server_ctx: ServerContext, body: dict) -> list[int]:
    """Token ids of the session named in the request body (prepended to
    the request's own prompt so the pinned KV prefix is reused)."""
    sid = body.get("session")
    if not sid:
        return []
    sess = server_ctx.sessions.get(sid)
    if sess is None:
        raise web.HTTPNotFound(text=f"unknown session '{sid}'")
    return list(sess["ids"])


def _save_session_npz(path: str, ids: list[int], saved: dict) -> None:
    """Serialize a prefix-cache entry ({"kv": {...}[, "d": {...}]}) to
    .npz (kv/persist.py's format, extended with the token ids and the
    optional draft-cache prefix)."""
    import numpy as np

    flat = {"ids": np.asarray(ids, np.int64)}
    for group, sub in saved.items():
        for k, v in sub.items():
            flat[f"{group}.{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def _load_session_npz(path: str) -> tuple[list[int], dict]:
    import jax.numpy as jnp
    import numpy as np

    z = np.load(path)
    ids = [int(t) for t in z["ids"]]
    saved: dict = {}
    for key in z.files:
        if key == "ids":
            continue
        group, _, name = key.partition(".")
        arr = z[key]
        saved.setdefault(group, {})[name] = (
            int(arr) if name == "n" else jnp.asarray(arr))
    return ids, saved


class StopMatcher:
    """Stop-string detection over streamed text with holdback: text that
    could be the prefix of a stop string is buffered until disambiguated
    (so `.push("<|e") -> ""` then `.push("nd|>") -> stop`)."""

    def __init__(self, stops: list[str]):
        self.stops = [s for s in stops if s]
        self.buf = ""
        self.stopped = False

    def push(self, piece: str) -> str:
        """Returns text safe to emit; sets .stopped when a stop string
        matched (emitted text excludes it)."""
        if not self.stops:
            return piece
        self.buf += piece
        hits = [(self.buf.find(s), s) for s in self.stops if s in self.buf]
        if hits:
            i, _ = min(hits)
            out, self.buf = self.buf[:i], ""
            self.stopped = True
            return out
        hold = 0
        for s in self.stops:
            for ln in range(min(len(s) - 1, len(self.buf)), 0, -1):
                if self.buf.endswith(s[:ln]):
                    hold = max(hold, ln)
                    break
        cut = len(self.buf) - hold
        out, self.buf = self.buf[:cut], self.buf[cut:]
        return out

    def flush(self) -> str:
        out, self.buf = self.buf, ""
        return out


def _stops_from_body(body: dict) -> list[str]:
    stop = body.get("stop")
    if stop is None:
        return []
    if isinstance(stop, str):
        return [stop]
    return [s for s in stop if isinstance(s, str)]


def _logprobs_from_body(body: dict, chat: bool) -> int:
    """Normalize the two OpenAI shapes to a top-N count (0 = off).
    Completions: `logprobs: <int|null>`. Chat: `logprobs: <bool>` +
    `top_logprobs: <int>`. The chosen token's logprob is always
    reported when enabled."""
    lp = body.get("logprobs")
    if chat:
        if not lp:
            return 0
        return max(int(body.get("top_logprobs", 0)), 1)
    if lp is None or lp is False:
        return 0
    return max(int(lp), 1)


def _sampling_from_body(body: dict, chat: bool = False) -> dict:
    """OpenAI `frequency_penalty`/`presence_penalty` map to the
    sampler's TRUE subtractive penalties (sampling/sampler.py
    sample_dist_batched; reference sampler.cpp:76-150) — they are no
    longer folded into repeat_penalty. `repeat_penalty` stays the
    native multiplicative llama.cpp-style knob."""
    seed = body.get("seed")
    return dict(
        temperature=float(body.get("temperature", 0.8)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        penalty_repeat=float(body.get("repeat_penalty", 1.0)),
        penalty_freq=float(body.get("frequency_penalty", 0.0)),
        penalty_present=float(body.get("presence_penalty", 0.0)),
        max_tokens=int(body.get("max_tokens", body.get("n_predict", 128))),
        seed=None if seed is None else int(seed),
        logprobs=_logprobs_from_body(body, chat),
    )


async def _run_batched(ctx: ModelContext, prompt_ids: list[int],
                       sampling: dict, stop_ids: set[int]):
    """Submit to the scheduler; async-iterate generated token ids."""
    loop = asyncio.get_running_loop()
    q: asyncio.Queue = asyncio.Queue()

    def sink(tok):
        loop.call_soon_threadsafe(q.put_nowait, tok)

    req = Request(prompt_ids=prompt_ids, stop_ids=stop_ids, sink=sink,
                  **sampling)
    ctx.scheduler.submit(req)
    while True:
        tok = await q.get()
        if tok is None:
            break
        yield tok, req


async def _run_speculative(ctx: ModelContext, prompt_ids: list[int],
                           sampling: dict, stop_ids: set[int]):
    """Speculative path (greedy target verification)."""
    assert ctx.spec is not None and ctx.spec_lock is not None
    loop = asyncio.get_running_loop()
    async with ctx.spec_lock:
        ctx.spec.reset()
        stats = SpecStats()
        req = Request(prompt_ids=prompt_ids, **sampling)

        def gen():
            return list(ctx.spec.generate(
                prompt_ids, sampling["max_tokens"],
                stop_fn=lambda t: t in stop_ids, stats=stats))

        tokens = await loop.run_in_executor(None, gen)
        log.info(stats.summary())
        for t in tokens:
            req.n_generated += 1
            yield t, req
        req.finish_reason = "stop" if (tokens and tokens[-1] in stop_ids) \
            else "length"


def _decode_data_image(url: str):
    """data: URI -> PIL image (the reference's MMMU path ships images to
    the server the same way)."""
    import base64
    import io

    from PIL import Image

    if not url.startswith("data:"):
        raise web.HTTPBadRequest(text="only data: image URIs supported")
    _, _, b64 = url.partition(",")
    return Image.open(io.BytesIO(base64.b64decode(b64)))


def _split_multimodal(messages: list[dict]) -> tuple[list[dict], list]:
    """Normalize OpenAI content arrays: returns (text-only messages,
    images in order of appearance)."""
    images = []
    out = []
    for m in messages:
        content = m.get("content", "")
        if isinstance(content, list):
            parts = []
            for p in content:
                if p.get("type") == "text":
                    parts.append(p.get("text", ""))
                elif p.get("type") == "image_url":
                    u = p.get("image_url")
                    u = u.get("url") if isinstance(u, dict) else u
                    images.append(_decode_data_image(u))
            content = "".join(parts)
        out.append({"role": m.get("role", "user"), "content": content})
    return out, images


async def _run_vlm(ctx: ModelContext, prompt_ids: list[int], images: list,
                   sampling: dict, stop_ids: set[int]):
    """Multimodal request: encode images + build injected prompt
    embeddings (one device call, off the event loop), then submit to
    the SHARED mm scheduler — concurrent VLM/text requests batch
    together instead of serializing behind a lock (the reference's VLM
    path is single-stream, internvl_model.cpp)."""
    import numpy as np

    from ..models.internvl import preprocess_image

    model = ctx.vlm
    assert model is not None
    loop = asyncio.get_running_loop()
    embeds = None
    if images:
        def encode():
            import jax.numpy as jnp

            tiles = [preprocess_image(img, tile=model.image_size,
                                      max_num=12) for img in images]
            px = np.concatenate(tiles, axis=0)
            ids = model.expand_image_tokens(prompt_ids, px.shape[0])
            emb = model.embed_multimodal(
                jnp.asarray(np.asarray(ids, np.int32)[None]),
                jnp.asarray(px))
            # fp16 halves host memory for long multimodal prompts; the
            # scheduler's prefill overlay upcasts per chunk
            return ids, np.asarray(emb[0], np.float16)

        prompt_ids, embeds = await loop.run_in_executor(None, encode)
        # the scheduler's decode feed embeds the LAST prompt token via
        # the text table; a trailing image token would condition the
        # first generated token on the meaningless placeholder row
        if prompt_ids and prompt_ids[-1] == model.image_token_id:
            raise web.HTTPBadRequest(
                text="multimodal prompt must end with text after the "
                     "image (add a question or use a chat template)")

    q: asyncio.Queue = asyncio.Queue()

    def sink(tok):
        loop.call_soon_threadsafe(q.put_nowait, tok)

    req = Request(prompt_ids=prompt_ids, stop_ids=stop_ids, sink=sink,
                  embeds=embeds, **sampling)
    ctx.scheduler.submit(req)
    while True:
        tok = await q.get()
        if tok is None:
            break
        yield tok, req


def _check_spec_compat(ctx: ModelContext, sampling: dict) -> None:
    """Speculative serving verifies whole draft chains/trees against
    the target's penalty-free distribution — per-token repeat/freq/
    presence penalties and logprob records are not applied there
    (engine/scheduler.py spec ticks). Reject such requests explicitly
    instead of silently degrading (reference behavior: speculation is
    a separate mode with its own sampler, spec_model.hpp:96-113)."""
    sched = ctx.scheduler
    is_spec = ctx.spec is not None or (
        sched is not None and (getattr(sched, "d_kv", None) is not None
                               or getattr(sched, "is_eagle", False)))
    if not is_spec:
        return
    bad = []
    if sampling.get("logprobs", 0):
        bad.append("logprobs")
    if sampling.get("penalty_repeat", 1.0) != 1.0:
        bad.append("repeat_penalty")
    if sampling.get("penalty_freq", 0.0) != 0.0:
        bad.append("frequency_penalty")
    if sampling.get("penalty_present", 0.0) != 0.0:
        bad.append("presence_penalty")
    if bad:
        raise web.HTTPBadRequest(
            text=f"{', '.join(bad)} unsupported with speculative models "
                 f"('main+draft'); retry without them or use the plain "
                 f"model name")


def _runner(ctx: ModelContext, prompt_ids, sampling, stop_ids, images=None):
    _check_spec_compat(ctx, sampling)
    if ctx.vlm is not None:
        return _run_vlm(ctx, prompt_ids, images or [], sampling, stop_ids)
    if ctx.spec is not None:
        return _run_speculative(ctx, prompt_ids, sampling, stop_ids)
    return _run_batched(ctx, prompt_ids, sampling, stop_ids)


def _logprobs_payload(tok: Tokenizer, ids: list[int], req, chat: bool):
    """OpenAI logprobs object from the scheduler's per-token records."""
    n = min(len(ids), len(req.token_logprobs))
    if chat:
        content = []
        for i in range(n):
            content.append({
                "token": tok.to_string([ids[i]]),
                "logprob": req.token_logprobs[i],
                "top_logprobs": [
                    {"token": tok.to_string([t]), "logprob": lp}
                    for t, lp in req.top_logprobs[i]],
            })
        return {"content": content}
    toks, offs, off = [], [], 0
    for i in range(n):
        s = tok.to_string([ids[i]])
        toks.append(s)
        offs.append(off)
        off += len(s)
    return {
        "tokens": toks,
        "token_logprobs": req.token_logprobs[:n],
        "top_logprobs": [
            {tok.to_string([t]): lp for t, lp in req.top_logprobs[i]}
            for i in range(n)],
        "text_offset": offs,
    }


async def _respond(request: web.Request, ctx: ModelContext,
                   prompt_ids: list[int], sampling: dict, chat: bool,
                   stream: bool, model_name: str,
                   images: list | None = None,
                   stop_strings: list[str] | None = None
                   ) -> web.StreamResponse:
    tok = ctx.tokenizer
    stop_ids = set(tok.stop_ids)
    rid = _now_id("chatcmpl" if chat else "cmpl")
    created = int(time.time())
    obj_stream = "chat.completion.chunk" if chat else "text_completion"
    obj_full = "chat.completion" if chat else "text_completion"
    want_logprobs = sampling.get("logprobs", 0) > 0
    matcher = StopMatcher(stop_strings or [])

    if stream:
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        dec = IncrementalDecoder(tok)
        finish = "stop"
        last_req = None
        gen_ids: list[int] = []
        if chat:
            first = {"id": rid, "object": obj_stream, "created": created,
                     "model": model_name,
                     "choices": [{"index": 0,
                                  "delta": {"role": "assistant"},
                                  "finish_reason": None}]}
            await resp.write(f"data: {json.dumps(first)}\n\n".encode())
        async for t, req in _runner(ctx, prompt_ids, sampling, stop_ids,
                                    images):
            last_req = req
            gen_ids.append(t)
            piece = dec.push(t) if t not in stop_ids else ""
            piece = matcher.push(piece)
            if matcher.stopped:
                req.cancelled = True
            if piece:
                delta = ({"content": piece} if chat else None)
                chunk = {"id": rid, "object": obj_stream, "created": created,
                         "model": model_name,
                         "choices": [{"index": 0,
                                      **({"delta": delta} if chat
                                         else {"text": piece}),
                                      "finish_reason": None}]}
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            if matcher.stopped:
                break
        if matcher.stopped:
            tail = ""
        else:
            tail = matcher.push(dec.flush())
            if matcher.stopped and last_req is not None:
                last_req.cancelled = True
            else:
                tail += matcher.flush()
        if tail:
            chunk = {"id": rid, "object": obj_stream, "created": created,
                     "model": model_name,
                     "choices": [{"index": 0,
                                  **({"delta": {"content": tail}} if chat
                                     else {"text": tail}),
                                  "finish_reason": None}]}
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        if matcher.stopped:
            finish = "stop"
        elif last_req is not None and last_req.finish_reason:
            finish = last_req.finish_reason
        choice = {"index": 0,
                  **({"delta": {}} if chat else {"text": ""}),
                  "finish_reason": finish}
        if want_logprobs and last_req is not None:
            choice["logprobs"] = _logprobs_payload(tok, gen_ids, last_req,
                                                   chat)
        final = {"id": rid, "object": obj_stream, "created": created,
                 "model": model_name,
                 "choices": [choice],
                 "usage": {"prompt_tokens": len(prompt_ids),
                           "completion_tokens":
                               last_req.n_generated if last_req else 0,
                           "total_tokens": len(prompt_ids) + (
                               last_req.n_generated if last_req else 0)}}
        await resp.write(f"data: {json.dumps(final)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    # non-streaming
    ids: list[int] = []
    gen_ids = []
    finish = "stop"
    last_req = None
    async for t, req in _runner(ctx, prompt_ids, sampling, stop_ids, images):
        last_req = req
        gen_ids.append(t)
        if t not in stop_ids:
            ids.append(t)
        if stop_strings:
            # decode-so-far check; cancel at the first stop-string match
            if any(s in tok.to_string(ids) for s in stop_strings):
                req.cancelled = True
                break
    text = tok.to_string(ids)
    if matcher.stops:
        out = matcher.push(text)
        if not matcher.stopped:
            out += matcher.flush()
        text = out
    if matcher.stopped:
        finish = "stop"
    elif last_req is not None and last_req.finish_reason:
        finish = last_req.finish_reason
    usage = {"prompt_tokens": len(prompt_ids),
             "completion_tokens": last_req.n_generated if last_req else 0,
             "total_tokens": len(prompt_ids) + (
                 last_req.n_generated if last_req else 0)}
    lp_obj = (_logprobs_payload(tok, gen_ids, last_req, chat)
              if want_logprobs and last_req is not None else None)
    if chat:
        body = {"id": rid, "object": obj_full, "created": created,
                "model": model_name,
                "choices": [{"index": 0,
                             "message": {"role": "assistant", "content": text},
                             **({"logprobs": lp_obj} if lp_obj else {}),
                             "finish_reason": finish}],
                "usage": usage}
    else:
        body = {"id": rid, "object": obj_full, "created": created,
                "model": model_name,
                "choices": [{"index": 0, "text": text,
                             **({"logprobs": lp_obj} if lp_obj else {}),
                             "finish_reason": finish}],
                "usage": usage}
    return web.json_response(body)


def _error_response(exc: Exception, status: int = 500) -> web.Response:
    """OpenAI-style error body (reference converts exceptions to HTTP
    error JSON, openai_api.hpp:286-300)."""
    return web.json_response(
        {"error": {"message": str(exc), "type": type(exc).__name__}},
        status=status)


def build_app(server_ctx: ServerContext) -> web.Application:
    app = web.Application()

    @web.middleware
    async def error_middleware(request, handler):
        try:
            return await handler(request)
        except web.HTTPException:
            raise
        except Exception as exc:  # noqa: BLE001
            log.exception("request failed")
            return _error_response(exc)

    app.middlewares.append(error_middleware)

    async def handle_completion(request: web.Request) -> web.StreamResponse:
        body = await request.json()
        model_name = body.get("model", server_ctx.default_model)
        loop = asyncio.get_running_loop()
        ctx = await loop.run_in_executor(None, server_ctx.get, model_name)
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt = "".join(prompt)
        prompt_ids = ctx.tokenizer.tokenize(
            prompt, parse_special=bool(body.get("parse_special", True)))
        prompt_ids = _session_prefix_ids(server_ctx, body) + prompt_ids
        sampling = _sampling_from_body(body)
        return await _respond(request, ctx, prompt_ids, sampling,
                              chat=False, stream=bool(body.get("stream")),
                              model_name=model_name or ctx.name,
                              stop_strings=_stops_from_body(body))

    async def handle_chat(request: web.Request) -> web.StreamResponse:
        body = await request.json()
        model_name = body.get("model", server_ctx.default_model)
        loop = asyncio.get_running_loop()
        ctx = await loop.run_in_executor(None, server_ctx.get, model_name)
        messages, images = _split_multimodal(body.get("messages", []))
        prompt = ctx.tokenizer.apply_chat_template(messages)
        prompt_ids = _session_prefix_ids(server_ctx, body) \
            + ctx.tokenizer.tokenize(prompt)
        sampling = _sampling_from_body(body, chat=True)
        return await _respond(request, ctx, prompt_ids, sampling,
                              chat=True, stream=bool(body.get("stream")),
                              model_name=model_name or ctx.name,
                              images=images,
                              stop_strings=_stops_from_body(body))

    async def handle_models(request: web.Request) -> web.Response:
        names = list(server_ctx.models) or [server_ctx.default_model or "default"]
        data = []
        for n in names:
            entry = {"id": n, "object": "model", "created": 0,
                     "owned_by": "powerserve_tpu"}
            ctx = server_ctx.models.get(n)
            if ctx is not None and ctx.scheduler is not None:
                llm = ctx.scheduler.cfg.llm
                entry["meta"] = {
                    "n_ctx": ctx.scheduler.max_seq,
                    "n_params_embd": llm.dim,
                    "n_layers": llm.n_layers,
                    "vocab_size": llm.vocab_size,
                }
            data.append(entry)
        return web.json_response({"object": "list", "data": data})

    async def handle_health(request: web.Request) -> web.Response:
        """Liveness + readiness (reference has no health endpoint;
        standard for serving deployments)."""
        ok = all(m.scheduler is None or m.scheduler.n_active >= 0
                 for m in server_ctx.models.values())
        return web.json_response(
            {"status": "ok" if ok else "error",
             "models_loaded": list(server_ctx.models)})

    async def handle_session_create(request: web.Request) -> web.Response:
        """Create (or load from disk) a named pinned KV-prefix session.

        Body: {"model": ..., "prompt": ... | "messages": [...],
               "id": optional, "save_path": optional, "load_path": optional}.
        Later /completions-style requests pass {"session": id} to resume
        on the cached prefix (their prompt is appended to the session's
        tokens)."""
        body = await request.json()
        model_name = body.get("model", server_ctx.default_model)
        loop = asyncio.get_running_loop()
        ctx = await loop.run_in_executor(None, server_ctx.get, model_name)
        if ctx.scheduler is None:
            raise web.HTTPBadRequest(
                text="sessions require a scheduler-backed model")
        if ctx.scheduler.prefix_cache is None:
            raise web.HTTPBadRequest(
                text="prefix cache disabled (hp.prefix_cache = 0)")
        sid = body.get("id") or _now_id("sess")

        if body.get("load_path"):
            ids, saved = _load_session_npz(body["load_path"])
            if ("d" in saved) != (ctx.scheduler.d_kv is not None):
                raise web.HTTPBadRequest(
                    text="session draft-cache mismatch with model")
            ctx.scheduler.insert_prefix(ids, saved, pin=True)
        else:
            if body.get("messages"):
                messages, _ = _split_multimodal(body["messages"])
                prompt = ctx.tokenizer.apply_chat_template(
                    messages, add_assistant_prompt=False)
            else:
                prompt = body.get("prompt", "")
            if not prompt:
                raise web.HTTPBadRequest(text="empty session prompt")
            ids = ctx.tokenizer.tokenize(prompt)
            if len(ids) >= ctx.scheduler.max_seq - 2:
                raise web.HTTPBadRequest(text="session prompt exceeds n_ctx")
            ctx.scheduler.pin_prefix(ids)
            # priming request: prefill ids (+ a dummy feed token) so the
            # scheduler snapshots and pins the prefix; 1 junk decode
            # token is discarded
            sampling = dict(temperature=0.0, top_k=1, top_p=1.0,
                            penalty_repeat=1.0, max_tokens=1, seed=0,
                            logprobs=0)
            async for _tok, _req in _run_batched(
                    ctx, ids + [ids[-1]], sampling, set()):
                pass
            if tuple(ids) not in ctx.scheduler.prefix_cache.entries:
                raise web.HTTPInternalServerError(
                    text="session prefill did not produce a prefix")
        if body.get("save_path"):
            _save_session_npz(body["save_path"], ids,
                              ctx.scheduler.prefix_cache.entries[tuple(ids)])
        server_ctx.sessions[sid] = {
            "id": sid, "model": model_name or ctx.name, "ids": ids,
            "created": int(time.time())}
        return web.json_response({"id": sid, "object": "session",
                                  "model": model_name or ctx.name,
                                  "tokens": len(ids)})

    async def handle_session_list(request: web.Request) -> web.Response:
        data = [{"id": s["id"], "object": "session", "model": s["model"],
                 "tokens": len(s["ids"]), "created": s["created"]}
                for s in server_ctx.sessions.values()]
        return web.json_response({"object": "list", "data": data})

    async def handle_session_delete(request: web.Request) -> web.Response:
        sid = request.match_info["sid"]
        sess = server_ctx.sessions.pop(sid, None)
        if sess is None:
            raise web.HTTPNotFound(text=f"unknown session '{sid}'")
        ctx = server_ctx.models.get(sess["model"])
        if ctx is not None and ctx.scheduler is not None:
            ctx.scheduler.drop_prefix(sess["ids"])
        return web.json_response({"id": sid, "deleted": True})

    async def handle_metrics(request: web.Request) -> web.Response:
        """Prometheus-style text metrics aggregated over schedulers."""
        lines = []
        for name, m in server_ctx.models.items():
            if m.scheduler is None:
                continue
            for k, v in m.scheduler.metrics().items():
                lines.append(
                    f'powerserve_{k}{{model="{name}"}} {v}')
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    for route in ("/completion", "/completions", "/v1/completions"):
        app.router.add_post(route, handle_completion)
    for route in ("/chat/completions", "/v1/chat/completions"):
        app.router.add_post(route, handle_chat)
    app.router.add_get("/v1/models", handle_models)
    app.router.add_post("/v1/sessions", handle_session_create)
    app.router.add_get("/v1/sessions", handle_session_list)
    app.router.add_delete("/v1/sessions/{sid}", handle_session_delete)
    app.router.add_get("/health", handle_health)
    app.router.add_get("/metrics", handle_metrics)
    return app


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(prog="powerserve-tpu serve")
    ap.add_argument("-d", "--model-root", required=True,
                    help="dir containing model dirs (or one model dir)")
    ap.add_argument("--model", default="default")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--max-slots", type=int, default=4)
    ap.add_argument("--pp", type=int, default=0,
                    help="pipeline stages: shard LAYERS (and their KV "
                         "slices) over pp devices instead of tensor "
                         "parallelism (parallel/pp.py)")
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel ways: shard the model over a "
                         "device mesh (multichip serving; 0 = off). "
                         "Default path is shard_map (fused Pallas "
                         "kernel per shard, parallel/tp.py)")
    ap.add_argument("--gspmd", action="store_true",
                    help="use GSPMD auto-partitioning for --tp instead "
                         "of the shard_map path (forces the XLA dequant "
                         "fallback; Pallas calls are GSPMD-opaque)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel ways (slots sharded across; "
                         "used with --tp)")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel ways: shard the KV cache's "
                         "time axis (long-context memory/bandwidth "
                         "split across chips; used with --tp)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize from "
                         "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                         "JAX_PROCESS_ID (auto-detected on TPU pods)")
    ap.add_argument("--spec-tree", default="",
                    help="speculation-tree widths per depth for "
                         "\"main+draft\" models, e.g. 2,1,1 "
                         "(default: chain)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help="chain draft length for \"main+draft\" models "
                         "(0 = hparams default)")
    ap.add_argument("--spec-wor", action="store_true",
                    help="tree speculation verifies sampled-without-"
                         "replacement children (recursive rejection) "
                         "instead of exact-match on greedy top-k")
    ap.add_argument("--draft-head-rank", type=int, default=0,
                    help="factor the DRAFT's lm_head to this rank at "
                         "load (lossless emitted stream, trades "
                         "acceptance; the per-draft lm_head read is "
                         "the measured spec bottleneck). 0 = exact")
    ap.add_argument("--paged-pages", type=int, default=0,
                    help="paged KV pool size in pages (0 = dense "
                         "per-slot KV); slots share the pool with "
                         "recompute preemption on exhaustion")
    ap.add_argument("--page-size", type=int, default=64,
                    help="tokens per KV page (with --paged-pages)")
    ap.add_argument("--max-models", type=int, default=0,
                    help="evict least-recently-used idle model contexts "
                         "past this count (0 = keep all; reference "
                         "POWERSERVE_SERVER_MULTIMODEL semantics)")
    args = ap.parse_args(argv)

    mesh = None
    if args.distributed:
        from ..parallel.distributed import init_distributed, make_multihost_mesh

        init_distributed()
        mesh = make_multihost_mesh(tp=args.tp or None)
    elif args.pp:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh({"pp": args.pp},
                         __import__("jax").devices()[:args.pp])
    elif args.tp:
        import jax

        from ..parallel.mesh import make_mesh

        n = args.dp * args.sp * args.tp
        mesh = make_mesh({"dp": args.dp, "sp": args.sp, "tp": args.tp},
                         jax.devices()[:n])

    root = Path(args.model_root)
    hp = HyperParams(max_slots=args.max_slots)
    if (root / "workspace.json").exists():
        ws = WorkspaceConfig.load(root)
        hp = ws.hyper_params
        hp.max_slots = args.max_slots
        root_dir, default = ws.main_model_dir.parent, ws.main_model_dir.name
    else:
        root_dir, default = root, args.model
    if args.spec_tree:
        hp.spec_tree = args.spec_tree
    if args.spec_k:
        hp.spec_k = args.spec_k
    if args.paged_pages:
        hp.paged_pages = args.paged_pages
        hp.page_size = args.page_size
    if args.spec_wor:
        hp.spec_wor = True
    if args.draft_head_rank:
        hp.draft_head_rank = args.draft_head_rank
    ctx = ServerContext(root_dir, default, hp, args.backend, mesh=mesh,
                        max_models=args.max_models, pp=bool(args.pp),
                        shard_map=not args.gspmd)
    app = build_app(ctx)
    log.info(f"serving on http://{args.host}:{args.port}")
    try:
        web.run_app(app, host=args.host, port=args.port, print=None)
    finally:
        for m in ctx.models.values():
            if m.scheduler is not None:
                m.scheduler.stop()


if __name__ == "__main__":
    main()
