"""VLM serving path: tiny InternVL checkpoint served over the OpenAI
chat API with a base64 image (exercises multimodal content parsing, the
VLM engine, and the MMMU harness client format)."""

import asyncio
import base64
import io
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
aiohttp = pytest.importorskip("aiohttp")

from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from powerserve_tpu.core.config import HyperParams  # noqa: E402
from powerserve_tpu.engine.vlm import VLMEngine  # noqa: E402
from powerserve_tpu.models.internvl import internvl_from_hf  # noqa: E402
from powerserve_tpu.serving.server import ServerContext, build_app  # noqa: E402


def _png_data_uri(size=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                       dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def vlm_dir(tmp_path_factory):
    from tests.test_internvl import _mk_hf_internvl

    d = tmp_path_factory.mktemp("vlm") / "ivl"
    m = _mk_hf_internvl()
    m.save_pretrained(d, safe_serialization=True)
    # a tokenizer for the tiny vocab (HF tokenizers BPE on bytes)
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.trainers import BpeTrainer
    from tokenizers.decoders import ByteLevel as BLD

    tok = HFTok(BPE(unk_token=None))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    tok.decoder = BLD()
    trainer = BpeTrainer(vocab_size=256, special_tokens=["<s>", "</s>"],
                         initial_alphabet=ByteLevel.alphabet())
    tok.train_from_iterator(["what is in the picture", "hello"], trainer)
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>", "chat_template": "chatml"}))
    return d


def test_vlm_engine_generates(vlm_dir):
    from transformers import InternVLForConditionalGeneration

    m = InternVLForConditionalGeneration.from_pretrained(vlm_dir)
    ivl = internvl_from_hf(m)
    eng = VLMEngine(ivl, HyperParams(max_seq_len=128, kv_dtype="bf16"),
                    backend="xla")
    from PIL import Image

    img = Image.fromarray(np.zeros((60, 60, 3), np.uint8))
    out = list(eng.generate([1, 5, 9], [img], 4, max_tiles=2))
    assert len(out) == 4
    assert all(0 <= t < 256 for t in out)


def test_vlm_batched_concurrency_deterministic(vlm_dir):
    """VLM requests run on the shared mm scheduler: a multimodal
    request's greedy output must be identical alone and when batched
    with a concurrent text request (continuous batching correctness for
    the embedding-overlay prefill)."""
    async def go():
        ctx = ServerContext(vlm_dir.parent, vlm_dir.name,
                            HyperParams(max_seq_len=128, kv_dtype="bf16"),
                            backend="xla")
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        img_payload = {
            "model": vlm_dir.name,
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": _png_data_uri()}},
                {"type": "text", "text": "describe"},
            ]}],
            "max_tokens": 6, "temperature": 0.0,
        }
        txt_payload = {
            "model": vlm_dir.name,
            "messages": [{"role": "user", "content": "hello there"}],
            "max_tokens": 6, "temperature": 0.0,
        }
        try:
            r = await client.post("/v1/chat/completions", json=img_payload)
            assert r.status == 200
            alone = (await r.json())["choices"][0]["message"]["content"]
            ri, rt = await asyncio.gather(
                client.post("/v1/chat/completions", json=img_payload),
                client.post("/v1/chat/completions", json=txt_payload))
            assert ri.status == 200 and rt.status == 200
            batched = (await ri.json())["choices"][0]["message"]["content"]
            assert batched == alone, (batched, alone)
            # scheduler mode: VLM model context carries a scheduler
            mctx = ctx.get(vlm_dir.name)
            assert mctx.scheduler is not None and mctx.scheduler.mm_dim > 0
        finally:
            await client.close()

    asyncio.run(go())


def test_vlm_chat_over_http(vlm_dir):
    async def go():
        ctx = ServerContext(vlm_dir.parent, vlm_dir.name,
                            HyperParams(max_seq_len=128, kv_dtype="bf16"),
                            backend="xla")
        client = TestClient(TestServer(build_app(ctx)))
        await client.start_server()
        try:
            resp = await client.post("/v1/chat/completions", json={
                "model": vlm_dir.name,
                "messages": [{"role": "user", "content": [
                    {"type": "image_url",
                     "image_url": {"url": _png_data_uri()}},
                    {"type": "text", "text": "describe"},
                ]}],
                "max_tokens": 3, "temperature": 0.0,
            })
            assert resp.status == 200
            body = await resp.json()
            assert body["choices"][0]["message"]["role"] == "assistant"
            assert body["usage"]["completion_tokens"] >= 1
        finally:
            await client.close()

    asyncio.run(go())
