"""Marginal-cost bench: flash_prefill_quant vs XLA gqa_attention_quant
at prefill shapes (run on real TPU; see CLAUDE.md micro-bench trap —
the scan body feeds out back into q so nothing hoists)."""
import time, functools, statistics
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.ops.attention import gqa_attention_quant, build_visibility
from powerserve_tpu.ops.flash_prefill import flash_prefill_quant

H, Hkv, D = 32, 8, 128

def make(S, T, Tq, start, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(k[0], (S, Tq, H, D), jnp.bfloat16)
    kq = jax.random.randint(k[1], (S, Hkv, T, D), -127, 128, jnp.int8)
    vq = jax.random.randint(k[2], (S, Hkv, T, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(k[3], (S, Hkv, T), jnp.float32, 0.01, 0.02)
    vs = jax.random.uniform(k[4], (S, Hkv, T), jnp.float32, 0.01, 0.02)
    col = jnp.arange(T)[None, :]
    cache_mask = jnp.broadcast_to(col < start, (S, T))
    starts = jnp.full((S,), start, jnp.int32)
    positions = start + jnp.arange(Tq)[None, :] + jnp.zeros((S, 1), jnp.int32)
    vis = build_visibility(cache_mask, positions, None)
    return q, kq, ks, vq, vs, vis, cache_mask, starts

def make_loop(fn, args, flash):
    S, Tq = args[0].shape[:2]
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        q0, kq, ks, vq, vs, vis, cm, st = args
        def body(q, _):
            if flash:
                out = fn(q, kq, ks, vq, vs, cm, st)
            else:
                out = fn(q, kq, ks, vq, vs, vis)
            q = q + (out.reshape(S, Tq, H, D) * 1e-6).astype(q.dtype)
            return q, None
        q, _ = jax.lax.scan(body, q0, None, length=n)
        return q.astype(jnp.float32).sum()
    return loop

def marginal(fn, args, flash, n1=64, n2=512, reps=5):
    loop = make_loop(fn, args, flash)
    np.asarray(loop(args, n1)); np.asarray(loop(args, n2))
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(loop(args, n1))
        t1 = time.perf_counter(); np.asarray(loop(args, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)

# (S, T_cache, Tq_chunk, committed_start): scheduler/engine prefill shapes
for S, T, Tq, start in [(1, 1024, 512, 400), (1, 4096, 512, 3000),
                        (1, 8192, 512, 7000), (4, 2048, 128, 1500),
                        (1, 4096, 128, 3900), (8, 1024, 128, 800)]:
    args = make(S, T, Tq, start)
    x = marginal(functools.partial(gqa_attention_quant, scale=0.088),
                 args, False)
    f = marginal(functools.partial(flash_prefill_quant, scale=0.088),
                 args, True)
    kvmb = 2 * S * Hkv * T * D / 1e6
    print(f"S={S} T={T:5d} Tq={Tq:3d} start={start:5d}: "
          f"xla {x:8.1f}  flash {f:8.1f} us/iter  (KV {kvmb:.0f}MB)",
          flush=True)
