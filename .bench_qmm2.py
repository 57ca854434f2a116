import functools, statistics, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from powerserve_tpu.ops.qmatmul import QLinear, _qmatmul_xla
from powerserve_tpu.core.gguf import GGMLType

K, N, M = 4096, 14336, 1
BN = 512
G, HALF, GPT = 2048, 1024, 2

rng = np.random.default_rng(0)
w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
lin = QLinear.from_float(w, GGMLType.Q4_K)
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
s_bf = lin.scales.astype(jnp.bfloat16)
b_bf = lin.bias.astype(jnp.bfloat16)
bf_bytes = lin.q.nbytes + s_bf.nbytes + b_bf.nbytes
ref = np.asarray(_qmatmul_xla(x, lin, jnp.bfloat16))

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

def kernel_bf16(x_ref, xb_ref, q_ref, s_ref, b_ref, o_ref):
    x32 = x_ref[...]
    acc = None
    for gi in range(GPT):
        part = q_ref[gi * HALF:(gi + 1) * HALF, :]
        qf = part.astype(jnp.int32).astype(jnp.bfloat16)
        hi = jnp.floor(qf * jnp.bfloat16(1.0 / 16.0))
        lo = qf - hi * jnp.bfloat16(16.0)
        kbh = HALF // 32
        s0 = gi * 2 * kbh
        s_lo = jnp.repeat(s_ref[s0:s0 + kbh, :], 32, axis=0)
        s_hi = jnp.repeat(s_ref[s0 + kbh:s0 + 2 * kbh, :], 32, axis=0)
        p = jnp.dot(x32[:, gi * G:gi * G + HALF], lo * s_lo,
                    preferred_element_type=jnp.float32) \
            + jnp.dot(x32[:, gi * G + HALF:(gi + 1) * G], hi * s_hi,
                      preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    acc = acc - jnp.dot(xb_ref[...], b_ref[...],
                        preferred_element_type=jnp.float32)
    o_ref[...] = acc

def run_bf16(x):
    bm = 16
    xp = jnp.pad(x, ((0, bm - x.shape[0]), (0, 0)))
    xb = (xp.astype(jnp.float32).reshape(bm, K // 32, 32).sum(-1)
          .astype(jnp.bfloat16))
    out = pl.pallas_call(
        kernel_bf16,
        grid=(1, N // BN, 1),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j, t: (i, t)),
            pl.BlockSpec((bm, K // 32), lambda i, j, t: (i, t)),
            pl.BlockSpec((K // 2, BN), lambda i, j, t: (t, j)),
            pl.BlockSpec((K // 32, BN), lambda i, j, t: (t, j)),
            pl.BlockSpec((K // 32, BN), lambda i, j, t: (t, j)),
        ],
        out_specs=pl.BlockSpec((bm, BN), lambda i, j, t: (i, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, xb, lin.q, s_bf, b_bf)
    return out[:x.shape[0]]

try:
    got = np.asarray(run_bf16(x))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    t = marginal(run_bf16, x)
    print(f"bf16arith: {t:7.1f} us  {bf_bytes/(t*1e-6)/1e9:6.1f} GB/s  relerr {err:.2e}", flush=True)
except Exception as e:
    print("bf16arith FAILED:", str(e)[:300], flush=True)
