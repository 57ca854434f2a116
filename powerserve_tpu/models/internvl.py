"""InternVL vision-language model (reference C23, src/model/internvl/).

Pipeline (reference internvl_model.cpp:41-105 + qnn_backend.cpp:99-183,
re-expressed TPU-first):
  1. preprocess the prompt: expand each "<img>" into
     <img> + <IMG_CONTEXT> * (tokens_per_tile * n_tiles) + </img>
     (reference preprocess expands into IMG_CONTEXT pads)
  2. dynamic-tile the image into 448x448 patches + optional thumbnail
     (reference process_image_internvl2.hpp dynamic-patch resize)
  3. run the jitted vision encoder + projector -> per-tile embeddings
  4. embed text tokens, scatter image embeddings over the IMG_CONTEXT
     positions, and run the plain llama/qwen2 forward with
     `embeds=` (reference injects embeddings via qnn_forward_vl)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..kv.cache import KVCache
from .llama import LlamaParams, forward
from .vit import VisionParams, encode_images, vision_params_from_hf

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# image preprocessing (reference process_image_internvl2.hpp, 213 LoC)
# ---------------------------------------------------------------------------

def find_best_tile_grid(width: int, height: int, tile: int = 448,
                        min_num: int = 1, max_num: int = 12
                        ) -> tuple[int, int]:
    """Pick the (cols, rows) tile grid whose aspect ratio best matches
    the image (InternVL dynamic preprocessing)."""
    aspect = width / height
    best, best_diff = (1, 1), float("inf")
    for total in range(min_num, max_num + 1):
        for cols in range(1, total + 1):
            if total % cols:
                continue
            rows = total // cols
            diff = abs(aspect - cols / rows)
            area = width * height
            if diff < best_diff or (
                    diff == best_diff and area > 0.5 * tile * tile * cols * rows):
                best, best_diff = (cols, rows), diff
    return best


def preprocess_image(img, tile: int = 448, max_num: int = 12,
                     use_thumbnail: bool = True) -> np.ndarray:
    """PIL image (or HWC uint8 array) -> [n_tiles, 3, tile, tile] f32
    normalized pixel values."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    cols, rows = find_best_tile_grid(img.width, img.height, tile,
                                     max_num=max_num)
    resized = img.resize((cols * tile, rows * tile), Image.BICUBIC)
    tiles = []
    for r in range(rows):
        for c in range(cols):
            box = (c * tile, r * tile, (c + 1) * tile, (r + 1) * tile)
            tiles.append(resized.crop(box))
    if use_thumbnail and len(tiles) > 1:
        tiles.append(img.resize((tile, tile), Image.BICUBIC))
    out = np.stack([np.asarray(t, np.float32) / 255.0 for t in tiles])
    out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return out.transpose(0, 3, 1, 2).astype(np.float32)  # [N, 3, H, W]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

@dataclass
class InternVLModel:
    """VLM bundle: vision tower + projector + language model."""

    vision: VisionParams
    llm_params: LlamaParams
    cfg: ModelConfig
    image_token_id: int
    tokens_per_tile: int  # image_seq_length (e.g. 256 for 448/14 ds 0.5)
    image_size: int = 448  # native tile resolution of the vision tower

    def expand_image_tokens(self, token_ids: list[int], n_tiles: int,
                            img_placeholder_id: int | None = None
                            ) -> list[int]:
        """Replace a single placeholder id with n_tiles*tokens_per_tile
        IMG_CONTEXT ids (reference preprocess internvl_model.cpp:41-72).
        If no placeholder present, image tokens are prepended."""
        pad = [self.image_token_id] * (n_tiles * self.tokens_per_tile)
        pid = img_placeholder_id if img_placeholder_id is not None \
            else self.image_token_id
        if pid in token_ids:
            i = token_ids.index(pid)
            return token_ids[:i] + pad + token_ids[i + 1:]
        return pad + token_ids

    def embed_multimodal(self, token_ids: jax.Array,
                         pixel_values: jax.Array | None) -> jax.Array:
        """[S, T] ids (+ [N, 3, H, W] pixels) -> [S, T, dim] embeddings
        with image features scattered over IMG_CONTEXT positions."""
        embeds = self.llm_params.embed.lookup(token_ids)  # [S, T, dim]
        if pixel_values is None:
            return embeds
        feats = encode_images(self.vision, pixel_values)  # [N, P, dim]
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = token_ids == self.image_token_id  # [S, T]
        # scatter: k-th image token (row-major over [S, T]) gets flat[k]
        idx = jnp.cumsum(mask.reshape(-1)) - 1
        idx = jnp.clip(idx, 0, flat.shape[0] - 1)
        repl = flat[idx].reshape(embeds.shape)
        return jnp.where(mask[..., None], repl, embeds)

    def prefill_multimodal(self, kv: KVCache, token_ids: np.ndarray,
                           pixel_values: np.ndarray | None,
                           backend: str = "auto"
                           ) -> tuple[jax.Array, KVCache]:
        """Single-slot multimodal prefill returning last-token logits."""
        S, T = 1, len(token_ids)
        ids = jnp.asarray(np.asarray(token_ids, np.int32)[None, :])
        px = None if pixel_values is None else jnp.asarray(pixel_values)
        embeds = self.embed_multimodal(ids, px)
        positions = jnp.arange(T, dtype=jnp.int32)[None, :]
        return forward(self.llm_params, self.cfg.llm, kv, ids, positions,
                       backend=backend, logits_mode="last", embeds=embeds)


def internvl_from_workspace(model_dir) -> InternVLModel:
    """Load a VLM from a GGUF workspace: text weights from weights.gguf
    (standard loader) + vision tower/projector from vision.gguf (HF
    tensor names, vlm.* metadata) — written by
    tools/convert_hf.py:convert_internvl. The reference loads its VLM
    from NPU context binaries; here the whole model is GGUF-native."""
    from pathlib import Path

    from ..core.gguf import GGUFReader
    from .loader import load_gguf_model
    from .vit import vision_params_from_hf

    model_dir = Path(model_dir)
    cfg_text, llm_params = load_gguf_model(model_dir)
    with GGUFReader(model_dir / "vision.gguf") as r:
        md = r.metadata
        sd = {name: r.tensor_float(name) for name in r.tensors}
        vision = vision_params_from_hf(
            sd, int(md["vlm.block_count"]),
            int(md["vlm.attention.head_count"]),
            int(md["vlm.patch_size"]),
            float(md["vlm.layer_norm_epsilon"]),
            float(md["vlm.downsample_ratio"]))
        return InternVLModel(
            vision=vision, llm_params=llm_params, cfg=cfg_text,
            image_token_id=int(md["vlm.image_token_id"]),
            tokens_per_tile=int(md["vlm.image_seq_length"]),
            image_size=int(md["vlm.image_size"]))


def internvl_from_hf(model, cfg_text: ModelConfig | None = None
                     ) -> InternVLModel:
    """Build from a transformers InternVLForConditionalGeneration."""
    from ..core.gguf import GGMLType
    from .loader import params_from_hf_state_dict

    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    hf = model.config
    vc = hf.vision_config
    tc = hf.text_config
    if cfg_text is None:
        cfg_text = ModelConfig(arch="qwen2" if "qwen2" in type(tc).__name__.lower()
                               else "llama")
        llm = cfg_text.llm
        llm.dim = tc.hidden_size
        llm.hidden_dim = tc.intermediate_size
        llm.n_layers = tc.num_hidden_layers
        llm.n_heads = tc.num_attention_heads
        llm.n_kv_heads = tc.num_key_value_heads
        llm.head_size = tc.hidden_size // tc.num_attention_heads
        llm.seq_len = tc.max_position_embeddings
        llm.vocab_size = tc.vocab_size
        llm.kv_dim = llm.n_kv_heads * llm.head_size
        llm.rope.n_dims = llm.head_size
        llm.rope.freq_base = float(getattr(tc, "rope_theta", 10000.0))
        llm.norm_eps = float(getattr(tc, "rms_norm_eps", 1e-5))
        from .loader import apply_hf_rope_scaling
        apply_hf_rope_scaling(llm.rope, getattr(tc, "rope_scaling", None),
                              tc.max_position_embeddings)
    # text weights use the language_model.* prefix; strip to match loader
    tsd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            tsd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            tsd[k] = v
    llm_params = params_from_hf_state_dict(tsd, cfg_text, fmt=GGMLType.Q8_0)
    patch = vc.patch_size[0] if isinstance(vc.patch_size, (list, tuple)) \
        else vc.patch_size
    vision = vision_params_from_hf(
        sd, vc.num_hidden_layers, vc.num_attention_heads, patch,
        vc.layer_norm_eps, hf.downsample_ratio)
    img_size = vc.image_size[0] if isinstance(vc.image_size, (list, tuple)) \
        else vc.image_size
    return InternVLModel(
        vision=vision, llm_params=llm_params, cfg=cfg_text,
        image_token_id=hf.image_token_id,
        tokens_per_tile=hf.image_seq_length,
        image_size=img_size)
