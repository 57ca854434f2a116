import time, statistics, functools
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.ops.qmatmul import QLinear, qmatmul
from powerserve_tpu.ops.elementwise import rms_norm, apply_rope, rope_cos_sin, silu_hadamard
from powerserve_tpu.ops.attention import gqa_attention_quant, build_visibility
from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.core.config import RopeConfig

rng = np.random.default_rng(0)
def mk(K, N):
    return QLinear.from_float(rng.standard_normal((K, N)).astype(np.float32) * 0.05, GGMLType.Q4_K)

qkv_w, wo_w, gu_w, down_w = mk(4096, 6144), mk(4096, 4096), mk(4096, 28672), mk(14336, 4096)
S, Tq, H, Hkv, D, T = 1, 1, 32, 8, 128, 1024
norm_w = jnp.ones(4096, jnp.float32)
kq0 = jnp.asarray(rng.integers(-127, 127, (S, Hkv, T, D)), jnp.int8)
vq0 = jnp.asarray(rng.integers(-127, 127, (S, Hkv, T, D)), jnp.int8)
ks0 = jnp.ones((S, Hkv, T), jnp.float32) * 0.01
vs0 = jnp.ones((S, Hkv, T), jnp.float32) * 0.01
vis = jnp.ones((S, Tq, T), bool)
pos = jnp.full((S, Tq), 500, jnp.int32)
cos, sin = rope_cos_sin(pos, RopeConfig(), D)

def body(x, level):
    xb = x.reshape(S * Tq, 4096)
    if level >= 1:
        h = rms_norm(x, norm_w, 1e-5).astype(jnp.bfloat16).reshape(S * Tq, -1)
    else:
        h = xb
    qkv = qmatmul(h, qkv_w, backend="pallas")
    q = qkv[:, :H * D].reshape(S, Tq, H, D)
    knew = qkv[:, H * D:(H + Hkv) * D].reshape(S, Tq, Hkv, D)
    vnew = qkv[:, (H + Hkv) * D:].reshape(S, Tq, Hkv, D)
    if level >= 1:
        q = apply_rope(q, cos, sin, "llama")
        knew = apply_rope(knew, cos, sin, "llama")
    kl, vl, ksl, vsl = kq0, vq0, ks0, vs0
    if level >= 2:
        kq, kss = KVCache.quantize_kv(knew)
        vq, vss = KVCache.quantize_kv(vnew)
        safe = pos
        def scat(c, n, p): return c.at[:, p].set(n.astype(c.dtype), mode="drop")
        kl = jax.vmap(scat)(kq0, kq.transpose(0, 2, 1, 3), safe)
        vl = jax.vmap(scat)(vq0, vq.transpose(0, 2, 1, 3), safe)
        ksl = jax.vmap(scat)(ks0, kss.transpose(0, 2, 1), safe)
        vsl = jax.vmap(scat)(vs0, vss.transpose(0, 2, 1), safe)
    if level >= 3:
        attn = gqa_attention_quant(q, kl, ksl, vl, vsl, vis, 0.088, backend="pallas")
        a_in = attn.reshape(S * Tq, -1).astype(jnp.bfloat16)
    else:
        a_in = q.reshape(S * Tq, -1).astype(jnp.bfloat16)
    b = qmatmul(a_in, wo_w, backend="pallas")
    h2 = b[:, :4096].astype(jnp.bfloat16)
    if level >= 1:
        h2 = rms_norm(h2.reshape(S, Tq, -1), norm_w, 1e-5).astype(jnp.bfloat16).reshape(S * Tq, -1)
    c = qmatmul(h2, gu_w, backend="pallas")
    if level >= 1:
        act = silu_hadamard(c[:, :14336], c[:, 14336:]).astype(jnp.bfloat16)
    else:
        act = c[:, :14336].astype(jnp.bfloat16)
    d = qmatmul(act, down_w, backend="pallas")
    out = x + d[:, :4096].reshape(S, Tq, -1).astype(x.dtype) * 1e-6
    if level >= 2:
        out = out + (kl.astype(jnp.float32).sum() * 0).astype(x.dtype)
    return out.astype(x.dtype)

def marginal(fn, x, n1=32, n2=256, reps=5):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), ()), x, None, length=n)
        return out
    np.asarray(loop(x, n1)); np.asarray(loop(x, n2))
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(loop(x, n1))
        t1 = time.perf_counter(); np.asarray(loop(x, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)

x = jnp.asarray(rng.standard_normal((S, Tq, 4096)), jnp.bfloat16)
for lvl, name in [(0, "matmuls only"), (1, "+norms/rope/silu"),
                  (2, "+kv quant/scatter"), (3, "+attention")]:
    t = marginal(functools.partial(body, level=lvl), x)
    print(f"level {lvl} ({name}): {t:.1f} us/layer", flush=True)
