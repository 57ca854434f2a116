import time, statistics, functools, dataclasses
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.ops.qmatmul import QLinear, qmatmul
from powerserve_tpu.core.gguf import GGMLType

rng = np.random.default_rng(0)
L = 2  # stacked layers (memory: keep small, dynamics identical)

def mk(K, N, stacked):
    lin = QLinear.from_float(rng.standard_normal((K, N)).astype(np.float32) * 0.05, GGMLType.Q4_K)
    if not stacked:
        return lin
    return dataclasses.replace(
        lin,
        q=jnp.broadcast_to(lin.q[None], (L,) + lin.q.shape).copy(),
        scales=jnp.broadcast_to(lin.scales[None], (L,) + lin.scales.shape).copy(),
        bias=jnp.broadcast_to(lin.bias[None], (L,) + lin.bias.shape).copy())

def chain(stacked):
    qkv, wo = mk(4096, 6144, stacked), mk(4096, 4096, stacked)
    gu, down = mk(4096, 28672, stacked), mk(14336, 4096, stacked)
    def step(carry):
        x, i = carry
        lay = (i % L) if stacked else None
        a = qmatmul(x, qkv, backend="pallas", layer=lay)
        b = qmatmul(a[:, :4096].astype(jnp.bfloat16), wo, backend="pallas", layer=lay)
        c = qmatmul(b[:, :4096].astype(jnp.bfloat16), gu, backend="pallas", layer=lay)
        d = qmatmul(c[:, :14336].astype(jnp.bfloat16), down, backend="pallas", layer=lay)
        return (x + d[:, :4096].astype(x.dtype) * 1e-6, i + 1)
    return step

def marginal(fn, c0, n1=16, n2=128, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(c, n):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), ()), c, None, length=n)
        return out[0]
    np.asarray(loop(c0, n1)); np.asarray(loop(c0, n2))
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(loop(c0, n1))
        t1 = time.perf_counter(); np.asarray(loop(c0, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)

x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.bfloat16)
c0 = (x, jnp.int32(0))
pass  # direct already measured: 302-308 us/layer
print(f"prefetch : {marginal(chain(True), c0):.1f} us/layer", flush=True)
