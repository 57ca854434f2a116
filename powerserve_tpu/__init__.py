"""powerserve_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
PowerServe (powerserve-project/PowerServe): GGUF-family weight-only
quantization (Q4_0/Q8_0/Q4_K) with dequantization fused into Pallas
matmul kernels, a single jitted static-shape decode program, paged INT8
KV-cache attention with mask/move/rollback semantics rich enough for
token-tree speculative decoding, an OpenAI-compatible streaming server
with continuous batching, and perplexity/MMLU evaluation parity.

Unlike the single-device reference, weights and KV-cache shard across
multi-chip TPU meshes (ICI + DCN) via jax.sharding.
"""

__version__ = "0.1.0"
