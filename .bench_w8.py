import functools, statistics, time, os
import jax, jax.numpy as jnp, numpy as np
from powerserve_tpu.ops.qmatmul import QLinear, qmatmul, _qmatmul_xla
from powerserve_tpu.core.quant import QuantizedTensor, quantize, repack_gguf_tensor
from powerserve_tpu.core.gguf import GGMLType

K, N, M = 4096, 14336, 1
rng = np.random.default_rng(0)
w = rng.standard_normal((K, N)).astype(np.float32) * 0.1

# Q8_0 baseline
lin8 = QLinear.from_float(w, GGMLType.Q8_0)
# W8 MXU format
payload = quantize(np.ascontiguousarray(w.T), GGMLType.Q8_0)
qt = repack_gguf_tensor(payload, GGMLType.Q8_0, (N, K))
linw8 = QLinear.from_quantized(qt, mxu=True)
print("w8 scale_group:", linw8.scale_group, "q dtype:", linw8.q.dtype)

x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

def marginal(fn, x, n1=128, n2=1024, reps=5):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(c, _):
            y = fn(c)
            c = c.at[:, :K].add(y[:, :K].astype(c.dtype) * 1e-6)
            return c, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    np.asarray(loop(x, n1)); np.asarray(loop(x, n2))
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(loop(x, n1))
        t1 = time.perf_counter(); np.asarray(loop(x, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms)

ref = np.asarray(_qmatmul_xla(x, lin8, jnp.bfloat16))
import importlib; qm = importlib.import_module('powerserve_tpu.ops.qmatmul')

t = marginal(lambda c: qmatmul(c, lin8, backend="pallas"), x)
print(f"q8_0 dequant kernel: {t:7.1f} us  {lin8.nbytes()/(t*1e-6)/1e9:6.1f} GB/s", flush=True)

for a8 in (True, False):
    fn = lambda c: qm._qmatmul_pallas_mxu8(c, linw8, a8)
    got = np.asarray(fn(x))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    t = marginal(fn, x)
    print(f"w8 mxu a8={a8}:  {t:7.1f} us  {linw8.nbytes()/(t*1e-6)/1e9:6.1f} GB/s  relerr {err:.2e}", flush=True)
