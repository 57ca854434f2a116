"""Dequant-chain experiments for the Q4_K kernel (honest marginal bench).

Variants on 4096x14336 M=1 (the decode ffn shape):
  base  — production kernel (qmatmul backend=pallas)
  nocat — per-piece dots: no concat of lo/hi nibbles, x sliced instead
  bsum  — nocat + bias applied via x-blocksum dot (no bias repeat/fma)
  bcast — bsum + scale expansion via broadcast-reshape (no jnp.repeat)
"""
import functools, statistics, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from powerserve_tpu.ops.qmatmul import QLinear, qmatmul, _qmatmul_xla
from powerserve_tpu.core.gguf import GGMLType

K, N, M = 4096, 14336, 1
BN = 512
G = 2048          # pack group for K=4096
HALF = G // 2     # packed rows per group
GPT = K // G      # groups per (full-K) tile


def make_variant_kernel(variant):
    def kernel(x_ref, xb_ref, q_ref, s_ref, b_ref, o_ref):
        x32 = x_ref[...]
        acc = None
        for gi in range(GPT):
            part = q_ref[gi * HALF:(gi + 1) * HALF, :]
            qf = part.astype(jnp.int32).astype(jnp.float32)
            hi = jnp.floor(qf * (1.0 / 16.0))
            lo = qf - hi * 16.0
            kbh = HALF // 32  # scale blocks per piece
            s0 = gi * 2 * kbh
            s_lo = s_ref[s0:s0 + kbh, :]
            s_hi = s_ref[s0 + kbh:s0 + 2 * kbh, :]

            def rep(s):
                if variant == "bcast":
                    return jnp.broadcast_to(
                        s[:, None, :], (kbh, 32, s.shape[-1])
                    ).reshape(kbh * 32, s.shape[-1])
                return jnp.repeat(s, 32, axis=0)

            if variant in ("bsum", "bcast"):
                w_lo = (lo * rep(s_lo)).astype(jnp.bfloat16)
                w_hi = (hi * rep(s_hi)).astype(jnp.bfloat16)
            else:  # nocat: bias folded per piece with fma
                b_lo = rep(b_ref[s0:s0 + kbh, :])
                b_hi = rep(b_ref[s0 + kbh:s0 + 2 * kbh, :])
                w_lo = (lo * rep(s_lo) - b_lo).astype(jnp.bfloat16)
                w_hi = (hi * rep(s_hi) - b_hi).astype(jnp.bfloat16)
            x_lo = x32[:, gi * G:gi * G + HALF]
            x_hi = x32[:, gi * G + HALF:(gi + 1) * G]
            p = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32) \
                + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        if variant in ("bsum", "bcast"):
            # bias term: -sum_k x[k] b[k//32] = -dot(blocksum(x), b)
            acc = acc - jnp.dot(xb_ref[...], b_ref[...].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        o_ref[...] = acc
    return kernel


def run_variant(variant, x, lin):
    bm = 16
    xp = jnp.pad(x, ((0, bm - x.shape[0]), (0, 0)))
    xb = xp.astype(jnp.float32).reshape(bm, K // 32, 32).sum(-1)
    xb = xb.astype(jnp.bfloat16)
    out = pl.pallas_call(
        make_variant_kernel(variant),
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
    )(xp, xb, lin.q, lin.scales, lin.bias)
    return out[:x.shape[0]]


rng = np.random.default_rng(0)
w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
lin = QLinear.from_float(w, GGMLType.Q4_K)
assert lin.packed and lin.pack_group == G, (lin.pack_group,)
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

ref = np.asarray(_qmatmul_xla(x, lin, jnp.bfloat16))
for v in ("nocat", "bsum", "bcast"):
    got = np.asarray(run_variant(v, x, lin))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"{v}: relerr {err:.2e}", flush=True)


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

qbytes = lin.nbytes()
base = marginal(lambda c: qmatmul(c, lin, backend="pallas"), x)
print(f"base : {base:7.1f} us  {qbytes/ (base*1e-6) / 1e9:6.1f} GB/s", flush=True)
for v in ("nocat", "bsum", "bcast"):
    t = marginal(functools.partial(run_variant, v, lin=lin), x)
    print(f"{v:5s}: {t:7.1f} us  {qbytes / (t*1e-6) / 1e9:6.1f} GB/s", flush=True)

# --- extra variants: direct u8->f32 convert; bf16 scales/bias ---
def make_kernel2(direct_cvt):
    def kernel(x_ref, xb_ref, q_ref, s_ref, b_ref, o_ref):
        x32 = x_ref[...]
        acc = None
        for gi in range(GPT):
            part = q_ref[gi * HALF:(gi + 1) * HALF, :]
            if direct_cvt:
                qf = part.astype(jnp.float32)
            else:
                qf = part.astype(jnp.int32).astype(jnp.float32)
            hi = jnp.floor(qf * (1.0 / 16.0))
            lo = qf - hi * 16.0
            kbh = HALF // 32
            s0 = gi * 2 * kbh
            s_lo = jnp.repeat(s_ref[s0:s0 + kbh, :].astype(jnp.float32), 32, axis=0)
            s_hi = jnp.repeat(s_ref[s0 + kbh:s0 + 2 * kbh, :].astype(jnp.float32), 32, axis=0)
            w_lo = (lo * s_lo).astype(jnp.bfloat16)
            w_hi = (hi * s_hi).astype(jnp.bfloat16)
            x_lo = x32[:, gi * G:gi * G + HALF]
            x_hi = x32[:, gi * G + HALF:(gi + 1) * G]
            p = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32) \
                + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        acc = acc - jnp.dot(xb_ref[...], b_ref[...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        o_ref[...] = acc
    return kernel


def run_v2(x, q, s, b, direct_cvt):
    bm = 16
    xp = jnp.pad(x, ((0, bm - x.shape[0]), (0, 0)))
    xb = xp.astype(jnp.float32).reshape(bm, K // 32, 32).sum(-1)
    xb = xb.astype(jnp.bfloat16)
    out = pl.pallas_call(
        make_kernel2(direct_cvt),
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
    )(xp, xb, q, s, b)
    return out[:x.shape[0]]

s_bf = lin.scales.astype(jnp.bfloat16)
b_bf = lin.bias.astype(jnp.bfloat16)
bf_bytes = lin.q.nbytes + s_bf.nbytes + b_bf.nbytes

cases = [
    ("bf16s     ", lambda c: run_v2(c, lin.q, s_bf, b_bf, False), bf_bytes),
]
for name, fn, nb in cases:
    got = np.asarray(fn(x))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    t = marginal(fn, x)
    print(f"{name}: {t:7.1f} us  {nb / (t*1e-6) / 1e9:6.1f} GB/s  relerr {err:.2e}", flush=True)

# --- bf16-arithmetic unpack (saves the final cast) ---
def make_kernel_bf16(variant):
    def kernel(x_ref, xb_ref, q_ref, s_ref, b_ref, o_ref):
        x32 = x_ref[...]
        acc = None
        for gi in range(GPT):
            part = q_ref[gi * HALF:(gi + 1) * HALF, :]
            qf = part.astype(jnp.int32).astype(jnp.bfloat16)
            hi = jnp.floor(qf * jnp.bfloat16(1.0 / 16.0))
            lo = qf - hi * jnp.bfloat16(16.0)
            kbh = HALF // 32
            s0 = gi * 2 * kbh
            s_lo = jnp.repeat(s_ref[s0:s0 + kbh, :].astype(jnp.bfloat16), 32, axis=0)
            s_hi = jnp.repeat(s_ref[s0 + kbh:s0 + 2 * kbh, :].astype(jnp.bfloat16), 32, axis=0)
            w_lo = lo * s_lo
            w_hi = hi * s_hi
            x_lo = x32[:, gi * G:gi * G + HALF]
            x_hi = x32[:, gi * G + HALF:(gi + 1) * G]
            p = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32) \
                + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        acc = acc - jnp.dot(xb_ref[...], b_ref[...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        o_ref[...] = acc
    return kernel

def run_bf16(x, q, s, b):
    bm = 16
    xp = jnp.pad(x, ((0, bm - x.shape[0]), (0, 0)))
    xb = (xp.astype(jnp.float32).reshape(bm, K // 32, 32).sum(-1)
          .astype(jnp.bfloat16))
    out = pl.pallas_call(
        make_kernel_bf16("b"),
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
    )(xp, xb, q, s, b)
    return out[:x.shape[0]]

try:
    fn = lambda c: run_bf16(c, lin.q, s_bf, b_bf)
    got = np.asarray(fn(x))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    t = marginal(fn, x)
    print(f"bf16arith : {t:7.1f} us  {bf_bytes/(t*1e-6)/1e9:6.1f} GB/s  relerr {err:.2e}", flush=True)
except Exception as e:
    print("bf16arith FAILED:", str(e)[:200], flush=True)
