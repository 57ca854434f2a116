"""OpenAI server API tests using aiohttp's test utilities (reference
surface: app/server/simple_server.cpp:27-37, openai_api.hpp).
No pytest-asyncio in the image, so each test drives its own event loop."""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from powerserve_tpu.core.config import HyperParams  # noqa: E402
from powerserve_tpu.core.gguf import GGMLType  # noqa: E402
from powerserve_tpu.serving.server import (  # noqa: E402
    IncrementalDecoder,
    ServerContext,
    build_app,
)
from powerserve_tpu.tools.synthetic import make_synthetic_gguf  # noqa: E402

_CTX = {}


@pytest.fixture(scope="module")
def ws_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ws")
    make_synthetic_gguf(out, "tiny", GGMLType.Q8_0, seed=0, seq_len=128)
    return out


def _run(ws_dir, coro_fn):
    """Create app+client, run coro_fn(client), tear down — one loop."""

    async def runner():
        if "ctx" not in _CTX:
            _CTX["ctx"] = ServerContext(
                ws_dir, "model", HyperParams(max_slots=2, batch_size=8),
                backend="xla")
        ctx = _CTX["ctx"]
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            return await coro_fn(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def test_completion_nonstream(ws_dir):
    async def go(client):
        resp = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 4,
            "temperature": 0.0,
        })
        assert resp.status == 200
        body = await resp.json()
        assert body["object"] == "text_completion"
        assert body["choices"][0]["finish_reason"] in ("stop", "length")
        assert body["usage"]["completion_tokens"] >= 1
        assert isinstance(body["choices"][0]["text"], str)

    _run(ws_dir, go)


def test_chat_nonstream(ws_dir):
    async def go(client):
        resp = await client.post("/v1/chat/completions", json={
            "model": "model",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0,
        })
        assert resp.status == 200
        body = await resp.json()
        assert body["choices"][0]["message"]["role"] == "assistant"
        assert body["usage"]["prompt_tokens"] > 0

    _run(ws_dir, go)


def test_chat_stream_sse(ws_dir):
    async def go(client):
        resp = await client.post("/v1/chat/completions", json={
            "model": "model",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0, "stream": True,
        })
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        raw = (await resp.read()).decode()
        events = [line[6:] for line in raw.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
        assert "usage" in chunks[-1]

    _run(ws_dir, go)


def test_models_endpoint(ws_dir):
    async def go(client):
        await client.post("/v1/completions", json={
            "model": "model", "prompt": "x", "max_tokens": 1})
        resp = await client.get("/v1/models")
        body = await resp.json()
        assert body["object"] == "list"
        assert any(m["id"] == "model" for m in body["data"])

    _run(ws_dir, go)


def test_legacy_completion_route(ws_dir):
    async def go(client):
        resp = await client.post("/completion", json={
            "model": "model", "prompt": "y", "n_predict": 2,
            "temperature": 0.0,
        })
        assert resp.status == 200
        body = await resp.json()
        assert body["usage"]["completion_tokens"] >= 1

    _run(ws_dir, go)


def test_incremental_decoder_utf8(ws_dir):
    """Multibyte chars split across byte-fallback tokens must not emit
    partial UTF-8."""
    from powerserve_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_model_dir(ws_dir / "model")
    ids = tok.vocab.encode("世", add_bos=False)
    assert len(ids) >= 3  # byte-fallback pieces
    dec = IncrementalDecoder(tok)
    pieces = [dec.push(i) for i in ids]
    # the last 3 ids are the bytes of 世: nothing emitted mid-character
    assert pieces[-3] == "" and pieces[-2] == ""
    assert pieces[-1].endswith("世")
    full = "".join(pieces) + dec.flush()
    assert full == tok.to_string(ids)
    assert "�" not in full


def teardown_module(module):
    ctx = _CTX.pop("ctx", None)
    if ctx:
        for m in ctx.models.values():
            m.scheduler.stop()
