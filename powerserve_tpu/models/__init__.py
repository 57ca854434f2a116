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
