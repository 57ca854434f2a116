import dataclasses
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms", "cpu")
from powerserve_tpu.tools.bench_params import make_device_params
from powerserve_tpu.tools.synthetic import PRESETS
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.models.llama import forward

PRESETS.setdefault("agree", dict(dim=256, ffn=512, layers=8, heads=8,
                                 kv_heads=4, vocab=2048, arch="llama", bias=False))
cfg, params = make_device_params("agree", "q4_k")
llm = cfg.llm

def run(llm_cfg, n_steps=60):
    kv = KVCache.create(llm.n_layers, 1, 128, llm.n_kv_heads, llm.head_size)
    toks = [3]
    outs = []
    for i in range(n_steps):
        t = jnp.asarray([[toks[-1]]], jnp.int32)
        p = jnp.asarray([[i]], jnp.int32)
        logits, kv = forward(params, llm_cfg, kv, t, p, backend="xla")
        nxt = int(jnp.argmax(logits[0]))
        outs.append(nxt)
        toks.append(nxt)
    return outs

full = run(llm)
# teacher-forced agreement: feed the FULL model's sequence to the truncated model
for ld in (2, 4, 6):
    llm_d = dataclasses.replace(llm, n_layers=ld)
    kv = KVCache.create(llm.n_layers, 1, 128, llm.n_kv_heads, llm.head_size)
    agree = 0
    seq = [3] + full
    for i in range(len(full)):
        t = jnp.asarray([[seq[i]]], jnp.int32)
        p = jnp.asarray([[i]], jnp.int32)
        logits, kv = forward(params, llm_d, kv, t, p, backend="xla")
        if int(jnp.argmax(logits[0])) == full[i]:
            agree += 1
    print(f"draft layers {ld}/8: teacher-forced argmax agreement {agree}/{len(full)}")
