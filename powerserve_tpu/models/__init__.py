from .llama import LayerWeights, LlamaParams, QEmbedding, forward
from .loader import (
    config_from_gguf_metadata,
    load_gguf_model,
    params_from_hf_state_dict,
    stack_layers,
)

__all__ = [
    "LayerWeights", "LlamaParams", "QEmbedding", "forward",
    "config_from_gguf_metadata", "load_gguf_model",
    "params_from_hf_state_dict", "stack_layers",
]
from .internvl import InternVLModel, internvl_from_hf, preprocess_image
from .vit import VisionParams, encode_images, vision_encode

__all__ += ["InternVLModel", "internvl_from_hf", "preprocess_image",
            "VisionParams", "encode_images", "vision_encode"]
