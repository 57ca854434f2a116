"""In-process serving API — the reference `LocalServer` role
(app/server/local_server.cpp:6-176: the same handlers behind an
in-process queue for JNI/embedding, no HTTP).

`LocalServer` wraps the model registry + continuous-batching scheduler
behind a small synchronous surface, so Python hosts (notebooks, agent
frameworks, test harnesses) embed the engine directly:

    from powerserve_tpu.serving.local import LocalServer

    srv = LocalServer("/path/to/models", model="llama8b")
    text = srv.completion("The capital of France is", max_tokens=16)
    for piece in srv.completion("Tell me a story", stream=True):
        print(piece, end="", flush=True)
    reply = srv.chat([{"role": "user", "content": "hi"}])
    srv.close()

Same semantics as the HTTP server: chat templates, UTF-8-safe
streaming, stop strings/ids, per-request sampling (incl. the true
frequency/presence penalties), speculation via "main+draft" names, and
multimodal messages (OpenAI content arrays with data: image URIs) on
VLM models. Thread-safe: requests ride the scheduler's own queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from ..core.config import HyperParams
from ..engine.scheduler import Request
from .server import (
    IncrementalDecoder,
    ServerContext,
    StopMatcher,
    _split_multimodal,
)


class LocalServer:
    """Synchronous in-process front end over ServerContext."""

    def __init__(self, model_root, model: str = "", hp=None,
                 backend: str = "auto", mesh=None, max_models: int = 0,
                 pp: bool = False, shard_map: bool = True):
        self.ctx = ServerContext(model_root, model, hp or HyperParams(),
                                 backend, mesh=mesh,
                                 max_models=max_models, pp=pp,
                                 shard_map=shard_map)
        self.default_model = model

    # -- internals -----------------------------------------------------------

    def _stream(self, mctx, prompt_ids, sampling: dict,
                stop_strings: list[str], embeds=None) -> Iterator[str]:
        tok = mctx.tokenizer
        stop_ids = set(tok.stop_ids)
        if mctx.spec is not None:
            # host tree engine: single-stream, synchronous
            dec = IncrementalDecoder(tok)
            mctx.spec.reset()
            for t in mctx.spec.generate(
                    prompt_ids, sampling.get("max_tokens", 128),
                    stop_fn=lambda t: t in stop_ids):
                piece = dec.push(t) if t not in stop_ids else ""
                if piece:
                    yield piece
            tail = dec.flush()
            if tail:
                yield tail
            return
        q: "queue.Queue[int | None]" = queue.Queue()
        req = Request(prompt_ids=list(prompt_ids), stop_ids=stop_ids,
                      sink=q.put, embeds=embeds, **sampling)
        mctx.scheduler.submit(req)
        dec = IncrementalDecoder(tok)
        matcher = StopMatcher(stop_strings or [])
        while True:
            t = q.get()
            if t is None:
                break
            piece = dec.push(t) if t not in stop_ids else ""
            piece = matcher.push(piece)
            if matcher.stopped:
                req.cancelled = True
            if piece:
                yield piece
        if not matcher.stopped:
            # end of stream: release the decoder's held-back bytes and
            # the stop-matcher's unmatched tail
            tail = matcher.push(dec.flush()) + matcher.flush()
            if tail:
                yield tail

    def _sampling(self, kw: dict) -> dict:
        s = dict(
            max_tokens=int(kw.pop("max_tokens", 128)),
            temperature=float(kw.pop("temperature", 0.8)),
            top_k=int(kw.pop("top_k", 40)),
            top_p=float(kw.pop("top_p", 0.95)),
            penalty_repeat=float(kw.pop("repeat_penalty", 1.0)),
            penalty_freq=float(kw.pop("frequency_penalty", 0.0)),
            penalty_present=float(kw.pop("presence_penalty", 0.0)),
        )
        seed = kw.pop("seed", None)
        if seed is not None:
            s["seed"] = int(seed)
        if kw:
            raise TypeError(f"unknown sampling params: {sorted(kw)}")
        return s

    # -- public API ----------------------------------------------------------

    def completion(self, prompt: str, model: str | None = None,
                   stream: bool = False, stop: list[str] | None = None,
                   **sampling):
        """Plain completion. stream=False -> str; True -> piece iterator."""
        mctx = self.ctx.get(model or self.default_model)
        ids = mctx.tokenizer.tokenize(prompt)
        it = self._stream(mctx, ids, self._sampling(sampling), stop or [])
        return it if stream else "".join(it)

    def chat(self, messages: list[dict], model: str | None = None,
             stream: bool = False, stop: list[str] | None = None,
             **sampling):
        """Chat completion: applies the model's chat template; OpenAI
        content arrays with data: image URIs run the VLM path."""
        mctx = self.ctx.get(model or self.default_model)
        text_messages, images = _split_multimodal(messages)
        prompt = mctx.tokenizer.apply_chat_template(text_messages)
        if images and mctx.vlm is not None:
            import jax.numpy as jnp
            import numpy as np

            from ..models.internvl import preprocess_image

            model = mctx.vlm
            ids = mctx.tokenizer.tokenize(prompt)
            tiles = [preprocess_image(img, tile=model.image_size,
                                      max_num=12) for img in images]
            px = np.concatenate(tiles, axis=0)
            ids = model.expand_image_tokens(ids, px.shape[0])
            emb = model.embed_multimodal(
                jnp.asarray(np.asarray(ids, np.int32)[None]),
                jnp.asarray(px))
            embeds = np.asarray(emb[0], np.float16)
            if ids and ids[-1] == model.image_token_id:
                raise ValueError("multimodal prompt must end with text "
                                 "after the image")
            it = self._stream(mctx, ids, self._sampling(sampling),
                              stop or [], embeds=embeds)
        else:
            ids = mctx.tokenizer.tokenize(prompt)
            it = self._stream(mctx, ids, self._sampling(sampling),
                              stop or [])
        return it if stream else "".join(it)

    def metrics(self, model: str | None = None) -> dict:
        sched = self.ctx.get(model or self.default_model).scheduler
        return sched.metrics() if sched is not None else {}

    def close(self) -> None:
        for m in self.ctx.models.values():
            if m.scheduler is not None:
                m.scheduler.stop()
        self.ctx.models.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
