import time, statistics, functools
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.ops.qmatmul import QLinear, qmatmul
from powerserve_tpu.core.gguf import GGMLType

rng = np.random.default_rng(0)
def mk(K, N):
    return QLinear.from_float(rng.standard_normal((K, N)).astype(np.float32) * 0.05, GGMLType.Q4_K)

qkv = mk(4096, 6144)
wo = mk(4096, 4096)
gu = mk(4096, 28672)
down = mk(14336, 4096)

def layer_mm(x):
    a = qmatmul(x, qkv, backend="pallas")          # [1, 6144]
    b = qmatmul(a[:, :4096].astype(jnp.bfloat16), wo, backend="pallas")
    c = qmatmul(b[:, :4096].astype(jnp.bfloat16), gu, backend="pallas")
    d = qmatmul(c[:, :14336].astype(jnp.bfloat16), down, backend="pallas")
    return (x + d[:, :4096].astype(x.dtype) * 1e-6)

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

x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.bfloat16)
print(f"4-matmul chain: {marginal(layer_mm, x):.1f} us/layer", flush=True)
