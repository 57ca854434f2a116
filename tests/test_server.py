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


def test_health_and_metrics(ws_dir):
    async def go(client):
        resp = await client.get("/health")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "ok"
        await client.post("/v1/completions", json={
            "model": "model", "prompt": "m", "max_tokens": 2,
            "temperature": 0.0})
        resp = await client.get("/metrics")
        assert resp.status == 200
        text = await resp.text()
        assert 'powerserve_requests_total{model="model"}' in text
        assert "powerserve_generated_tokens_total" in text

    _run(ws_dir, go)


def test_models_metadata(ws_dir):
    async def go(client):
        await client.post("/v1/completions", json={
            "model": "model", "prompt": "x", "max_tokens": 1})
        resp = await client.get("/v1/models")
        body = await resp.json()
        entry = next(m for m in body["data"] if m["id"] == "model")
        assert entry["meta"]["n_ctx"] > 0
        assert entry["meta"]["vocab_size"] > 0

    _run(ws_dir, go)


def test_stop_string(ws_dir):
    async def go(client):
        # no stop: get the greedy text first
        r0 = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 0.0})
        base = (await r0.json())["choices"][0]["text"]
        assert len(base) > 1
        stop = base[1]  # a character that will definitely occur
        r1 = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 0.0, "stop": stop})
        body = await r1.json()
        out = body["choices"][0]["text"]
        assert stop not in out
        assert out == base[:base.index(stop)]
        assert body["choices"][0]["finish_reason"] == "stop"

    _run(ws_dir, go)


def test_stop_string_stream(ws_dir):
    async def go(client):
        r0 = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 0.0})
        base = (await r0.json())["choices"][0]["text"]
        stop = base[1]
        resp = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 0.0, "stop": stop, "stream": True})
        raw = (await resp.read()).decode()
        events = [line[6:] for line in raw.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        text = "".join(c["choices"][0].get("text", "") for c in chunks)
        assert stop not in text
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"

    _run(ws_dir, go)


def test_seed_reproducible(ws_dir):
    async def go(client):
        outs = []
        for _ in range(2):
            r = await client.post("/v1/completions", json={
                "model": "model", "prompt": "hello", "max_tokens": 8,
                "temperature": 1.0, "seed": 1234})
            outs.append((await r.json())["choices"][0]["text"])
        r = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 1.0, "seed": 99})
        other = (await r.json())["choices"][0]["text"]
        assert outs[0] == outs[1]
        # different seed should (overwhelmingly) differ at temp 1.0
        assert other != outs[0]

    _run(ws_dir, go)


def test_logprobs_completions(ws_dir):
    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 4,
            "temperature": 0.0, "logprobs": 3})
        body = await r.json()
        lp = body["choices"][0]["logprobs"]
        n = body["usage"]["completion_tokens"]
        assert len(lp["token_logprobs"]) == n
        assert len(lp["tokens"]) == n
        # dict keyed by token text: distinct ids may decode to the same
        # string (byte-fallback pieces), so <= rather than ==
        assert all(1 <= len(d) <= 3 for d in lp["top_logprobs"])
        assert all(v <= 0.0 for v in lp["token_logprobs"])
        # greedy: the chosen token's logprob equals the max top logprob
        assert abs(max(lp["top_logprobs"][0].values())
                   - lp["token_logprobs"][0]) < 1e-4

    _run(ws_dir, go)


def test_logprobs_chat(ws_dir):
    async def go(client):
        r = await client.post("/v1/chat/completions", json={
            "model": "model",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0.0,
            "logprobs": True, "top_logprobs": 2})
        body = await r.json()
        content = body["choices"][0]["logprobs"]["content"]
        assert len(content) == body["usage"]["completion_tokens"]
        assert all(len(c["top_logprobs"]) == 2 for c in content)

    _run(ws_dir, go)


def test_stop_matcher_holdback():
    from powerserve_tpu.serving.server import StopMatcher

    m = StopMatcher(["<|end|>"])
    assert m.push("hello ") == "hello "
    assert m.push("<|e") == ""          # could be a stop prefix: held
    assert not m.stopped
    assert m.push("nd|> extra") == ""   # stop matched: nothing after
    assert m.stopped
    m2 = StopMatcher(["STOP"])
    assert m2.push("abcST") == "abc"
    assert m2.push("xy") == "STxy"      # disambiguated: released
    assert m2.flush() == ""


def test_self_draft_spec_model(ws_dir):
    """"model+self:N" selects the on-device chain engine with a
    LayerSkip self-draft; greedy output must equal the plain model's
    (full-depth self-draft -> 100% acceptance, same numerics)."""
    async def go(client):
        r0 = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 0.0})
        base = (await r0.json())["choices"][0]["text"]
        from powerserve_tpu.core.gguf import GGMLType  # noqa: F401
        n_layers = _CTX["ctx"].models["model"].scheduler.cfg.llm.n_layers
        r = await client.post("/v1/completions", json={
            "model": f"model+self:{n_layers}", "prompt": "hello",
            "max_tokens": 8, "temperature": 0.0})
        assert r.status == 200
        body = await r.json()
        assert body["usage"]["completion_tokens"] >= 1
        assert body["choices"][0]["text"] == base

    _run(ws_dir, go)


def test_spec_concurrent_requests(ws_dir):
    """4 concurrent speculative requests run through the shared
    continuous-batching scheduler (no serializing lock) and each
    matches the plain greedy output for its prompt."""
    async def go(client):
        prompts = ["hello", "the fox", "a b c", "zzz"]
        base = []
        for p in prompts:
            r = await client.post("/v1/completions", json={
                "model": "model", "prompt": p, "max_tokens": 6,
                "temperature": 0.0})
            base.append((await r.json())["choices"][0]["text"])

        n_layers = _CTX["ctx"].models["model"].scheduler.cfg.llm.n_layers

        async def one(p):
            r = await client.post("/v1/completions", json={
                "model": f"model+self:{n_layers}", "prompt": p,
                "max_tokens": 6, "temperature": 0.0})
            return (await r.json())["choices"][0]["text"]

        import asyncio as aio
        outs = await aio.gather(*[one(p) for p in prompts])
        assert list(outs) == base

    _run(ws_dir, go)


def test_sharded_serving_matches_single(ws_dir):
    """A server whose ServerContext carries a (dp=2, tp=4) mesh serves
    byte-identical greedy output to the unsharded server (GSPMD
    multichip serving path)."""
    from powerserve_tpu.parallel.mesh import make_mesh

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 6,
            "temperature": 0.0})
        return (await r.json())["choices"][0]["text"]

    base = _run(ws_dir, go)

    async def sharded():
        ctx = ServerContext(ws_dir, "model",
                            HyperParams(max_slots=2, batch_size=8),
                            backend="xla",
                            mesh=make_mesh({"dp": 2, "tp": 4}))
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            out = await go(client)
        finally:
            await client.close()
            for m in ctx.models.values():
                if m.scheduler is not None:
                    m.scheduler.stop()
        return out

    assert asyncio.run(sharded()) == base


def test_sessions_api(ws_dir, tmp_path):
    """HTTP sessions: pinned KV-prefix create/use/save/delete/load.
    Correctness: output with a session cache HIT equals output after the
    prefix cache is cleared (full recompute of the same token stream),
    and equals output restored from the on-disk .npz."""
    async def go(client):
        sess_prompt = "You are a terse assistant with strong opinions."
        r = await client.post("/v1/sessions", json={
            "model": "model", "prompt": sess_prompt, "id": "s1",
            "save_path": str(tmp_path / "s1.npz")})
        assert r.status == 200
        body = await r.json()
        assert body["id"] == "s1" and body["tokens"] > 0

        lst = await (await client.get("/v1/sessions")).json()
        assert any(s["id"] == "s1" for s in lst["data"])

        async def ask():
            r = await client.post("/v1/completions", json={
                "model": "model", "session": "s1", "prompt": " hello",
                "max_tokens": 6, "temperature": 0.0})
            assert r.status == 200
            return (await r.json())["choices"][0]["text"]

        sched = _CTX["ctx"].models["model"].scheduler
        hits0 = sched.prefix_cache.hits
        hit_text = await ask()
        assert sched.prefix_cache.hits > hits0

        # clear the cache (keep the session registered): same request
        # now fully re-prefills the identical token stream
        sched.prefix_cache.entries.clear()
        sched.prefix_cache.pinned.clear()
        sched.prefix_cache._order.clear()
        assert await ask() == hit_text

        # delete, then restore from disk; output must still match
        r = await client.delete("/v1/sessions/s1")
        assert (await r.json())["deleted"] is True
        r = await client.post("/v1/completions", json={
            "model": "model", "session": "s1", "prompt": " hello",
            "max_tokens": 6, "temperature": 0.0})
        assert r.status == 404

        r = await client.post("/v1/sessions", json={
            "model": "model", "id": "s1",
            "load_path": str(tmp_path / "s1.npz")})
        assert r.status == 200
        assert (await r.json())["tokens"] == body["tokens"]
        assert await ask() == hit_text

    _run(ws_dir, go)


def test_spec_prefix_cache(ws_dir, tmp_path):
    """Prefix cache in SPEC mode snapshots both target and draft caches;
    a session on a "model+self:N" spec scheduler restores both, and the
    output matches a cleared-cache recompute."""
    async def go(client):
        n_layers = _CTX["ctx"].models["model"].scheduler.cfg.llm.n_layers
        name = f"model+self:{n_layers}"
        r = await client.post("/v1/sessions", json={
            "model": name, "prompt": "A long shared system preamble.",
            "id": "sp1"})
        assert r.status == 200

        async def ask():
            r = await client.post("/v1/completions", json={
                "model": name, "session": "sp1", "prompt": " go",
                "max_tokens": 6, "temperature": 0.0})
            assert r.status == 200
            return (await r.json())["choices"][0]["text"]

        sched = _CTX["ctx"].models[name].scheduler
        key = tuple(_CTX["ctx"].sessions["sp1"]["ids"])
        assert "d" in sched.prefix_cache.entries[key]  # draft prefix too
        hit_text = await ask()
        sched.prefix_cache.entries.clear()
        sched.prefix_cache.pinned.clear()
        sched.prefix_cache._order.clear()
        assert await ask() == hit_text
        await client.delete("/v1/sessions/sp1")

    _run(ws_dir, go)


def test_metrics_latency_percentiles(ws_dir):
    async def go(client):
        await client.post("/v1/completions", json={
            "model": "model", "prompt": "x", "max_tokens": 2,
            "temperature": 0.0})
        text = await (await client.get("/metrics")).text()
        for k in ("ttft_seconds_p50", "ttft_seconds_p99",
                  "request_latency_seconds_p50",
                  "request_latency_seconds_p90"):
            line = [ln for ln in text.splitlines() if k in ln
                    and 'model="model"' in ln]
            assert line, f"missing {k}"
            assert float(line[0].split()[-1]) > 0.0

    _run(ws_dir, go)


def test_eagle_draft_spec_model(ws_dir):
    """"model+eagle" (an EAGLE-arch draft GGUF) routes to the
    feature-level head engine; greedy output equals the plain model's
    regardless of head quality (lossless verification)."""
    import numpy as np

    from powerserve_tpu.core.gguf import GGUFWriter
    from powerserve_tpu.core.quant import quantize

    # head GGUF matching the tiny workspace geometry (dim=64, 4 heads,
    # 2 kv heads), random weights — written directly (the converter path
    # is covered by tests/test_eagle.py)
    dim, H, Hkv, hd = 64, 4, 2, 16
    rng = np.random.default_rng(9)
    w = GGUFWriter()
    md = w.metadata
    md["general.architecture"] = "eagle"
    md["eagle.embedding_length"] = dim
    md["eagle.feed_forward_length"] = 2 * dim
    md["eagle.block_count"] = 1
    md["eagle.attention.head_count"] = H
    md["eagle.attention.head_count_kv"] = Hkv
    md["eagle.rope.dimension_count"] = hd
    md["eagle.rope.freq_base"] = 10000.0
    md["eagle.attention.layer_norm_rms_epsilon"] = 1e-5

    def q8(name, arr):
        w.add_tensor(name, tuple(reversed(arr.shape)), GGMLType.Q8_0,
                     quantize(arr.astype(np.float32), GGMLType.Q8_0))

    q8("fc.weight", rng.standard_normal((dim, 2 * dim)) * 0.05)
    q8("blk.0.attn_q.weight", rng.standard_normal((H * hd, dim)) * 0.05)
    q8("blk.0.attn_k.weight", rng.standard_normal((Hkv * hd, dim)) * 0.05)
    q8("blk.0.attn_v.weight", rng.standard_normal((Hkv * hd, dim)) * 0.05)
    q8("blk.0.attn_output.weight", rng.standard_normal((dim, H * hd)) * 0.05)
    q8("blk.0.ffn_gate.weight", rng.standard_normal((2 * dim, dim)) * 0.05)
    q8("blk.0.ffn_up.weight", rng.standard_normal((2 * dim, dim)) * 0.05)
    q8("blk.0.ffn_down.weight", rng.standard_normal((dim, 2 * dim)) * 0.05)
    w.add_float_tensor("blk.0.ffn_norm.weight", np.ones(dim, np.float32))
    eagle_dir = ws_dir / "eagle"
    eagle_dir.mkdir(exist_ok=True)
    w.write(eagle_dir / "weights.gguf")

    async def go(client):
        r0 = await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 8,
            "temperature": 0.0})
        base = (await r0.json())["choices"][0]["text"]
        r = await client.post("/v1/completions", json={
            "model": "model+eagle", "prompt": "hello",
            "max_tokens": 8, "temperature": 0.0})
        assert r.status == 200
        body = await r.json()
        assert body["choices"][0]["text"] == base

    _run(ws_dir, go)


def test_model_eviction_budget(tmp_path):
    """max_models evicts the least-recently-used IDLE context; busy and
    shared-scheduler contexts are never stopped."""
    out = tmp_path / "root"
    for name in ("a", "b", "c"):
        make_synthetic_gguf(out / name, "tiny", GGMLType.Q8_0, seed=0,
                            seq_len=64)
        # resolve_dir expects the model dir directly under the root
        (out / name / "model" / "weights.gguf").rename(
            out / name / "weights.gguf")
        for f in (out / name / "model").iterdir():
            f.rename(out / name / f.name)

    ctx = ServerContext(out, "a", HyperParams(max_slots=2, batch_size=8),
                        backend="xla", max_models=2)
    ctx.get("a")
    ctx.get("b")
    assert set(ctx.models) == {"a", "b"}
    a_sched = ctx.models["a"].scheduler
    ctx.get("c")  # a is LRU and idle -> evicted
    assert set(ctx.models) == {"b", "c"}
    assert a_sched._thread is None  # stopped
    # touching keeps a model alive: b is now LRU but gets re-used
    ctx.get("b")
    ctx.get("a")  # reload a; c is LRU -> evicted
    assert set(ctx.models) == {"b", "a"}


def test_session_npz_roundtrip_with_eagle_feat(tmp_path):
    """Session persistence keeps all prefix-cache groups, including the
    EAGLE carried-feature ("feat": {"v": ...}) and per-group "n"."""
    import numpy as np

    from powerserve_tpu.serving.server import (_load_session_npz,
                                               _save_session_npz)

    saved = {
        "kv": {"k": np.arange(12, dtype=np.int8).reshape(3, 4), "n": 7},
        "d": {"k": np.ones((2, 2), np.int8), "n": 7},
        "feat": {"v": np.linspace(0, 1, 8, dtype=np.float32)},
    }
    path = tmp_path / "sess.npz"
    _save_session_npz(str(path), [3, 1, 4], saved)
    ids, loaded = _load_session_npz(str(path))
    assert ids == [3, 1, 4]
    assert set(loaded) == {"kv", "d", "feat"}
    assert loaded["kv"]["n"] == 7 and isinstance(loaded["kv"]["n"], int)
    np.testing.assert_array_equal(np.asarray(loaded["feat"]["v"]),
                                  saved["feat"]["v"])
    np.testing.assert_array_equal(np.asarray(loaded["kv"]["k"]),
                                  saved["kv"]["k"])


def test_presence_penalty_end_to_end(ws_dir):
    """True subtractive penalties reach the device sampler: a huge
    presence_penalty under greedy decoding bans every token already in
    the window (prompt tokens included — the window is seeded with the
    prompt at admission), so prompt+generated must be all-distinct;
    the unpenalized run must differ once it repeats anything."""
    async def go(client):
        base = await (await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 12,
            "temperature": 0.0, "logprobs": 0})).json()
        pen = await (await client.post("/v1/completions", json={
            "model": "model", "prompt": "hello", "max_tokens": 12,
            "temperature": 0.0, "presence_penalty": 1000.0})).json()
        return base, pen

    base, pen = _run(ws_dir, go)
    # the penalty actually changed the greedy stream over HTTP
    assert pen["choices"][0]["text"] != base["choices"][0]["text"]

    # exact distinctness semantics on raw token ids (text round-trips
    # don't recover generated ids): banned window = prompt + generated
    import threading

    from powerserve_tpu.engine.scheduler import Request

    sched = _CTX["ctx"].get("model").scheduler
    prompt_ids = [5, 9, 5]
    done = threading.Event()
    out = []
    sched.submit(Request(
        prompt_ids=prompt_ids, max_tokens=12, temperature=0.0,
        penalty_present=1000.0,
        sink=lambda t: out.append(t) if t is not None else done.set()))
    assert done.wait(timeout=120)
    seen = set(prompt_ids)
    for t in out:
        assert t not in seen, f"banned token {t} re-emitted: {out}"
        seen.add(t)


def test_frequency_penalty_is_subtractive(ws_dir):
    """frequency_penalty=0 must be a no-op (the old mapping folded it
    into repeat_penalty = fp + 1.0, which changed nothing at 0 but
    proved the field was never plumbed; now a tiny nonzero value must
    still reproduce greedy until a repeat actually occurs)."""
    async def go(client):
        a = await (await client.post("/v1/completions", json={
            "model": "model", "prompt": "abc", "max_tokens": 6,
            "temperature": 0.0})).json()
        b = await (await client.post("/v1/completions", json={
            "model": "model", "prompt": "abc", "max_tokens": 6,
            "temperature": 0.0, "frequency_penalty": 0.0})).json()
        return a, b

    a, b = _run(ws_dir, go)
    assert a["choices"][0]["text"] == b["choices"][0]["text"]


def test_spec_model_rejects_logprobs_and_penalties(ws_dir):
    """Speculative serving doesn't apply penalties/logprobs; the server
    must 400 instead of silently degrading (VERDICT r2 item 6)."""
    async def go(client):
        r1 = await client.post("/v1/completions", json={
            "model": "model+self:1", "prompt": "hi", "max_tokens": 4,
            "temperature": 0.0, "logprobs": 2})
        r2 = await client.post("/v1/completions", json={
            "model": "model+self:1", "prompt": "hi", "max_tokens": 4,
            "temperature": 0.0, "presence_penalty": 0.5})
        r3 = await client.post("/v1/completions", json={
            "model": "model+self:1", "prompt": "hi", "max_tokens": 4,
            "temperature": 0.0, "frequency_penalty": 0.0})
        return r1.status, r2.status, r3.status

    s1, s2, s3 = _run(ws_dir, go)
    assert s1 == 400 and s2 == 400
    assert s3 == 200  # zero-valued penalty fields stay accepted


def test_local_server_in_process(ws_dir):
    """In-process embedding API (serving/local.py — the reference
    LocalServer role, local_server.cpp:6-176): blocking + streaming
    completion and chat must match the HTTP server's greedy output."""
    from powerserve_tpu.serving.local import LocalServer

    async def go(client):
        r = await client.post("/v1/completions", json={
            "model": "model", "prompt": "The quick brown fox",
            "max_tokens": 8, "temperature": 0.0})
        return (await r.json())["choices"][0]["text"]

    http_text = _run(ws_dir, go)

    with LocalServer(ws_dir, model="model", backend="xla",
                     hp=HyperParams(max_slots=2, batch_size=8)) as srv:
        blocking = srv.completion("The quick brown fox", max_tokens=8,
                                  temperature=0.0)
        streamed = "".join(srv.completion("The quick brown fox",
                                          stream=True, max_tokens=8,
                                          temperature=0.0))
        chat_out = srv.chat([{"role": "user", "content": "hello"}],
                            max_tokens=4, temperature=0.0)
        m = srv.metrics()
    assert blocking == http_text
    assert streamed == http_text
    assert isinstance(chat_out, str) and len(chat_out) > 0
    assert m["requests_total"] >= 3
