"""Vision-language generation engine (single-sequence, like the
reference's NPU-only InternVL path, internvl_model.cpp + CausalVLM).

Prefill embeds the expanded prompt with projected image features
injected at IMG_CONTEXT positions; decode steps are ordinary text
tokens through the same KV cache."""

from __future__ import annotations

import functools
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HyperParams
from ..kv.cache import KVCache
from ..models.internvl import InternVLModel, preprocess_image
from ..models.llama import forward


class VLMEngine:
    def __init__(self, model: InternVLModel, hp: HyperParams | None = None,
                 backend: str = "auto"):
        self.model = model
        self.hp = hp or HyperParams()
        self.backend = backend
        llm = model.cfg.llm
        self.max_seq = self.hp.max_seq_len or llm.seq_len
        self.kv = KVCache.create(llm.n_layers, 1, self.max_seq,
                                 llm.n_kv_heads, llm.head_size,
                                 self.hp.kv_dtype)
        self._decode = None

    def reset(self) -> None:
        self.kv = self.kv.reset_slot(0)

    def _decode_fn(self):
        if self._decode is None:
            llm = self.model.cfg.llm
            backend = self.backend
            params = self.model.llm_params

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(kv, token, pos):
                logits, kv = forward(params, llm, kv, token, pos,
                                     backend=backend, logits_mode="last")
                return jnp.argmax(logits[:, :llm.vocab_size], -1), kv

            self._decode = step
        return self._decode

    def generate(self, prompt_ids: list[int], images: list | None,
                 n_predict: int,
                 stop_fn: Callable[[int], bool] | None = None,
                 max_tiles: int = 12) -> Iterator[int]:
        """prompt_ids may contain ONE image placeholder (the model's
        image_token_id); images = list of PIL images / HWC arrays."""
        pixel_values = None
        if images:
            tiles = [preprocess_image(img, tile=self.model.image_size,
                                      max_num=max_tiles)
                     for img in images]
            pixel_values = np.concatenate(tiles, axis=0)
            n_tiles = pixel_values.shape[0]
            prompt_ids = self.model.expand_image_tokens(prompt_ids, n_tiles)
        if len(prompt_ids) >= self.max_seq:
            raise ValueError(f"prompt ({len(prompt_ids)}) exceeds context "
                             f"({self.max_seq})")
        logits, self.kv = self.model.prefill_multimodal(
            self.kv, np.asarray(prompt_ids, np.int32), pixel_values,
            backend=self.backend)
        cur = int(np.argmax(np.asarray(logits)[0]))
        pos = len(prompt_ids)
        yield cur
        if stop_fn is not None and stop_fn(cur):
            return
        step = self._decode_fn()
        for i in range(n_predict - 1):
            tok, self.kv = step(self.kv, jnp.asarray([[cur]], jnp.int32),
                                jnp.asarray([[pos]], jnp.int32))
            cur = int(np.asarray(tok)[0])
            pos += 1
            yield cur
            if stop_fn is not None and stop_fn(cur):
                return
