import time, functools, statistics
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.ops.attention import gqa_attention_quant
from powerserve_tpu.ops.flash_decode import flash_decode_quant

H, Hkv, D = 32, 8, 128

def make(S, T, Tq, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(k[0], (S, Tq, H, D), jnp.bfloat16)
    kq = jax.random.randint(k[1], (S, Hkv, T, D), -127, 128, jnp.int8)
    vq = jax.random.randint(k[2], (S, Hkv, T, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(k[3], (S, Hkv, T), jnp.float32, 0.01, 0.02)
    vs = jax.random.uniform(k[4], (S, Hkv, T), jnp.float32, 0.01, 0.02)
    vis = jnp.ones((S, Tq, T), bool)
    return q, kq, ks, vq, vs, vis

def make_loop(fn, args):
    S, Tq = args[0].shape[:2]
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        q0, kq, ks, vq, vs, vis = args
        def body(q, _):
            out = fn(q, kq, ks, vq, vs, vis)
            q = q + (out.reshape(S, Tq, H, D) * 1e-6).astype(q.dtype)
            return q, None
        q, _ = jax.lax.scan(body, q0, None, length=n)
        return q.astype(jnp.float32).sum()
    return loop

def marginal(fn, args, n1=256, n2=2048, reps=5):
    loop = make_loop(fn, args)
    np.asarray(loop(args, n1)); np.asarray(loop(args, n2))  # compile
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(loop(args, n1))
        t1 = time.perf_counter(); np.asarray(loop(args, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)

import sys
cases = [(8, 1024, 1), (1, 1024, 1), (8, 2048, 1), (8, 1024, 12), (1, 4096, 1)]
for S, T, Tq in cases:
    args = make(S, T, Tq)
    x = marginal(functools.partial(gqa_attention_quant, scale=0.088), args)
    f = marginal(functools.partial(flash_decode_quant, scale=0.088), args)
    kvmb = 2 * S * Hkv * T * D / 1e6
    roof = kvmb / 819e3 * 1e6
    print(f"S={S} T={T:5d} Tq={Tq:2d}: xla {x:7.1f}  flash {f:7.1f} us/iter"
          f"  (KV {kvmb:.0f}MB, roofline {roof:.0f}us)", flush=True)

print("--- boundary sweep ---")
for S, T, Tq in [(1, 2048, 1), (8, 4096, 1), (1, 8192, 1), (8, 8192, 1),
                 (4, 4096, 1)]:
    args = make(S, T, Tq)
    x = marginal(functools.partial(gqa_attention_quant, scale=0.088), args)
    f = marginal(functools.partial(flash_decode_quant, scale=0.088), args)
    kvmb = 2 * S * Hkv * T * D / 1e6
    roof = kvmb / 819e3 * 1e6
    print(f"S={S} T={T:5d} Tq={Tq:2d}: xla {x:7.1f}  flash {f:7.1f} us/iter"
          f"  (roofline {roof:.0f}us)", flush=True)
