from .config import (
    HyperParams,
    LLMConfig,
    ModelConfig,
    RopeConfig,
    SamplerConfig,
    WorkspaceConfig,
)
from .gguf import GGMLType, GGUFReader, GGUFWriter
from .logging import Timer, get_logger, timestamp_ms
from .quant import QuantizedTensor, dequantize, quantize, repack_gguf_tensor

__all__ = [
    "HyperParams", "LLMConfig", "ModelConfig", "RopeConfig", "SamplerConfig",
    "WorkspaceConfig", "GGMLType", "GGUFReader", "GGUFWriter", "Timer",
    "get_logger", "timestamp_ms", "QuantizedTensor", "dequantize", "quantize",
    "repack_gguf_tensor",
]
