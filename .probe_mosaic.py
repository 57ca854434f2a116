#!/usr/bin/env python
"""Retry round-2's Mosaic/jax dead-ends on the CURRENT toolchain
(CLAUDE.md perf log says 'retry on newer Mosaic/jax'):
  a. bf16-arithmetic nibble unpack (floor/fma chain in bf16)
  b. XLA-native jnp.int4 (S4) array dispatch
  c. i16 vector shifts in a kernel
  d. int8 x int8 dot with preferred_element_type=f32
Each prints OK (with a micro-timing sanity value) or the failure class.
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, "device", jax.devices()[0], flush=True)
K, N = 1024, 512


def run_kernel(kernel, out_dtype=jnp.float32, extra=None):
    q = jax.random.bits(jax.random.PRNGKey(0), (K // 2, N), jnp.uint8)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, K), lambda i: (0, 0)),
                  pl.BlockSpec((K // 2, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, N), out_dtype),
    )(x, q)
    return np.asarray(out)


def probe(name, fn):
    try:
        v = fn()
        print(f"{name}: OK ({v})", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
        print(f"{name}: FAIL {msg}", flush=True)


def bf16_unpack():
    def kernel(x_ref, q_ref, o_ref):
        qf = q_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
        hi = jnp.floor(qf * jnp.bfloat16(1.0 / 16.0))
        lo = qf - hi * jnp.bfloat16(16.0)
        w = jnp.concatenate([lo, hi], axis=0) - jnp.bfloat16(8.0)
        o_ref[...] = jnp.dot(x_ref[...], w,
                             preferred_element_type=jnp.float32)

    return float(run_kernel(kernel).sum())


def int4_native():
    q4 = jnp.arange(64, dtype=jnp.int8).reshape(8, 8).astype(jnp.int4)
    y = (q4.astype(jnp.bfloat16) * 2.0).sum()
    return float(np.asarray(y))


def i16_shift():
    def kernel(x_ref, q_ref, o_ref):
        p16 = q_ref[...].astype(jnp.int16)
        lo = (p16 & 0xF).astype(jnp.float32)
        hi = (p16 >> 4).astype(jnp.float32)
        w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(x_ref[...], w,
                             preferred_element_type=jnp.float32)

    return float(run_kernel(kernel).sum())


def int8_f32_dot():
    def kernel(x_ref, q_ref, o_ref):
        x8 = jnp.clip(x_ref[...] * 16.0, -127, 127).astype(jnp.int8)
        w8 = q_ref[...].astype(jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            x8[:, : K // 2], w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return float(run_kernel(kernel).sum())


probe("a. bf16-arith unpack kernel", bf16_unpack)
probe("b. jnp.int4 native dispatch", int4_native)
probe("c. i16 vector shifts kernel", i16_shift)
probe("d. int8 dot preferred f32", int8_f32_dot)
