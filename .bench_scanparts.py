#!/usr/bin/env python
"""P0.1 attribution: per-layer cost of the REAL deferred decode layer
body inside lax.scan, built up piecewise (marginal-cost method).

  A matmuls only                     (measured 302.6 us/layer, .bench_unroll)
  B + norms / rope / head reshapes / residual structure
  C + quantize_kv + transposes emitted as scan ys
  D + deferred attention, cache slabs as scan xs  (== full layer body)

D should land near the real forward's ~410-450 us/layer; the deltas
attribute the ~110 us/layer in-scan overhead that P0.1 chases.
"""
import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.kv.cache import KVCache
from powerserve_tpu.ops.attention import gqa_attention_quant_deferred
from powerserve_tpu.ops.elementwise import apply_rope, rms_norm
from powerserve_tpu.ops.qmatmul import qmatmul
from powerserve_tpu.tools.bench_params import _rand_qlinear

import os

L = int(os.environ.get("SCANPARTS_L", 8))
DIM, FFN = 4096, 14336
H, Hkv, D = 32, 8, 128
S, Tq, T = 1, 1, 1024
QKV_N = (H + 2 * Hkv) * D
SCALE = 1.0 / float(np.sqrt(D))


def stacked(key, k, n):
    return jax.vmap(lambda kk: _rand_qlinear(kk, k, n, "q4_k"))(
        jax.random.split(key, L))


def make_loop(variant):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(W, norms, rope, cache, x0, n):
        wqkv, wo, wgu, wdn = W
        an, fn = norms
        cos, sin = rope
        if variant == 5:
            (ka_c, kb_c, va_c, vb_c, ksa_c, ksb_c, vsa_c, vsb_c,
             mask) = cache
        else:
            kq_c, ks_c, vq_c, vs_c, mask = cache
        intra = jnp.ones((S, Tq, Tq), bool)

        def layer(x, inputs):
            if variant == 4:  # cache as closure constant, in-body slice
                idx = inputs
                k_l = jnp.take(kq_c, idx, axis=0)
                v_l = jnp.take(vq_c, idx, axis=0)
                ks_l = jnp.take(ks_c, idx, axis=0)
                vs_l = jnp.take(vs_c, idx, axis=0)
            elif variant == 5:  # H: k/v split in two sub-2^25 buffers
                (idx, ka_l, kb_l, va_l, vb_l, ksa_l, ksb_l, vsa_l,
                 vsb_l) = inputs
            else:
                idx, k_l, v_l, ks_l, vs_l = inputs
            h = rms_norm(x, jnp.take(an, idx, axis=0)).astype(jnp.bfloat16)
            hf = h.reshape(S * Tq, -1)
            qkv = qmatmul(hf, wqkv, backend="pallas", layer=idx)
            q = qkv[:, : H * D].reshape(S, Tq, H, D)
            knew = qkv[:, H * D : (H + Hkv) * D].reshape(S, Tq, Hkv, D)
            vnew = qkv[:, (H + Hkv) * D :].reshape(S, Tq, Hkv, D)
            q = apply_rope(q, cos, sin)
            knew = apply_rope(knew, cos, sin)
            ys = None
            if variant >= 2:  # + quantize_kv + transposes as ys
                kqn, ksn = KVCache.quantize_kv(knew)
                vqn, vsn = KVCache.quantize_kv(vnew)
                kqh = kqn.transpose(0, 2, 1, 3)
                vqh = vqn.transpose(0, 2, 1, 3)
                ksh = ksn.transpose(0, 2, 1)
                vsh = vsn.transpose(0, 2, 1)
                ys = (kqh, vqh, ksh, vsh)
            if variant == 5:  # H: attention per kv-head half, concat
                hh = Hkv // 2
                g = H // Hkv
                qa, qb = q[:, :, : hh * g], q[:, :, hh * g :]
                aa = gqa_attention_quant_deferred(
                    qa, ka_l, ksa_l, va_l, vsa_l, mask,
                    kqh[:, :hh], ksh[:, :hh], vqh[:, :hh], vsh[:, :hh],
                    intra, SCALE)
                ab = gqa_attention_quant_deferred(
                    qb, kb_l, ksb_l, vb_l, vsb_l, mask,
                    kqh[:, hh:], ksh[:, hh:], vqh[:, hh:], vsh[:, hh:],
                    intra, SCALE)
                attn = jnp.concatenate([aa, ab], axis=-1)
                af = attn.reshape(S * Tq, -1).astype(jnp.bfloat16)
            elif variant >= 3:  # + deferred attention over the cache slab
                attn = gqa_attention_quant_deferred(
                    q, k_l, ks_l, v_l, vs_l, mask, kqh, ksh, vqh, vsh,
                    intra, SCALE)
                af = attn.reshape(S * Tq, -1).astype(jnp.bfloat16)
            else:
                af = q.reshape(S * Tq, H * D).astype(jnp.bfloat16)
            a = qmatmul(af, wo, backend="pallas", layer=idx)
            x = x + a.reshape(S, Tq, -1).astype(x.dtype)
            h2 = rms_norm(x, jnp.take(fn, idx, axis=0)).astype(jnp.bfloat16)
            gu = qmatmul(h2.reshape(S * Tq, -1), wgu, backend="pallas",
                         layer=idx)
            g = gu[:, :FFN] * jax.nn.sigmoid(gu[:, :FFN]) * gu[:, FFN:]
            d = qmatmul(g.astype(jnp.bfloat16), wdn, backend="pallas",
                        layer=idx)
            return x + d.reshape(S, Tq, -1).astype(x.dtype), ys

        def step(x, _):
            if variant == 4:
                x, _ys = jax.lax.scan(layer, x, jnp.arange(L))
            elif variant == 5:
                x, _ys = jax.lax.scan(
                    layer, x, (jnp.arange(L), ka_c, kb_c, va_c, vb_c,
                               ksa_c, ksb_c, vsa_c, vsb_c))
            else:
                x, _ys = jax.lax.scan(
                    layer, x, (jnp.arange(L), kq_c, vq_c, ks_c, vs_c))
            return x, None

        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x.astype(jnp.float32).sum()

    return loop


def make_step_loop(with_head, dus=False):
    """Variant E/F: replicate decode_scan — kv carried across outer
    steps, deferred commit + advance per step; F adds embed-lookup,
    final norm, lm_head and argmax feedback. dus=True commits via
    per-slot dynamic_update_slice instead of the vmapped scatter
    (alias-friendliness probe for the L=32 cliff)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(W, norms, rope, cache, head, x0, n):
        wqkv, wo, wgu, wdn = W
        an, fn = norms
        cos, sin = rope
        embed, out_norm, lm_head = head
        intra = jnp.ones((S, Tq, Tq), bool)

        def layer(x, inputs):
            idx, k_l, v_l, ks_l, vs_l = inputs
            h = rms_norm(x, jnp.take(an, idx, axis=0)).astype(jnp.bfloat16)
            hf = h.reshape(S * Tq, -1)
            qkv = qmatmul(hf, wqkv, backend="pallas", layer=idx)
            q = qkv[:, : H * D].reshape(S, Tq, H, D)
            knew = qkv[:, H * D : (H + Hkv) * D].reshape(S, Tq, Hkv, D)
            vnew = qkv[:, (H + Hkv) * D :].reshape(S, Tq, Hkv, D)
            q = apply_rope(q, cos, sin)
            knew = apply_rope(knew, cos, sin)
            kqn, ksn = KVCache.quantize_kv(knew)
            vqn, vsn = KVCache.quantize_kv(vnew)
            kqh = kqn.transpose(0, 2, 1, 3)
            vqh = vqn.transpose(0, 2, 1, 3)
            ksh = ksn.transpose(0, 2, 1)
            vsh = vsn.transpose(0, 2, 1)
            mask = jnp.ones((S, T), bool)
            attn = gqa_attention_quant_deferred(
                q, k_l, ks_l, v_l, vs_l, mask, kqh, ksh, vqh, vsh,
                intra, SCALE)
            af = attn.reshape(S * Tq, -1).astype(jnp.bfloat16)
            a = qmatmul(af, wo, backend="pallas", layer=idx)
            x = x + a.reshape(S, Tq, -1).astype(x.dtype)
            h2 = rms_norm(x, jnp.take(fn, idx, axis=0)).astype(jnp.bfloat16)
            gu = qmatmul(h2.reshape(S * Tq, -1), wgu, backend="pallas",
                         layer=idx)
            g = gu[:, :FFN] * jax.nn.sigmoid(gu[:, :FFN]) * gu[:, FFN:]
            d = qmatmul(g.astype(jnp.bfloat16), wdn, backend="pallas",
                        layer=idx)
            return (x + d.reshape(S, Tq, -1).astype(x.dtype),
                    (kqh, vqh, ksh, vsh))

        def step(carry, _):
            kq_c, ks_c, vq_c, vs_c, pos, tok = carry
            if with_head:
                x = jnp.take(embed, tok, axis=0).astype(
                    jnp.bfloat16).reshape(S, Tq, DIM)
            else:
                x = x0
            x, ys = jax.lax.scan(
                layer, x, (jnp.arange(L), kq_c, vq_c, ks_c, vs_c))
            k_new, v_new, ks_new, vs_new = ys
            safe = jnp.where(pos < T, pos, T)  # [S, Tq]

            if dus:
                def commit_dus(cache, new):
                    # per-slot dynamic_update_slice at the (clamped)
                    # scalar position; Tq == 1 here
                    for s in range(S):
                        blk = new[:, s : s + 1].astype(cache.dtype)
                        start = (0, s, 0, jnp.minimum(safe[s, 0], T - 1),
                                 ) + (0,) * (cache.ndim - 4)
                        cache = jax.lax.dynamic_update_slice(
                            cache, blk, start)
                    return cache

                kq_c = commit_dus(kq_c, k_new)
                vq_c = commit_dus(vq_c, v_new)
                ks_c = commit_dus(ks_c, ks_new)
                vs_c = commit_dus(vs_c, vs_new)
            else:
                def commit(cache, new, pos_s):
                    return cache.at[:, :, pos_s].set(
                        new.astype(cache.dtype), mode="drop")

                scat_all = jax.vmap(commit, in_axes=(1, 1, 0), out_axes=1)
                kq_c = scat_all(kq_c, k_new, safe)
                vq_c = scat_all(vq_c, v_new, safe)
                ks_c = scat_all(ks_c, ks_new, safe)
                vs_c = scat_all(vs_c, vs_new, safe)
            pos = (pos + 1) % (T - 1)
            if with_head:
                xf = rms_norm(x, out_norm).astype(jnp.bfloat16)
                logits = qmatmul(xf.reshape(S * Tq, -1), lm_head,
                                 backend="pallas")
                tok = jnp.argmax(logits[:, :], axis=-1).astype(jnp.int32)
                tok = tok.reshape(S, Tq)[:, -1]
            else:
                tok = tok + 1
            out = x.astype(jnp.float32).sum()
            return (kq_c, ks_c, vq_c, vs_c, pos, tok), out

        kq_c, ks_c, vq_c, vs_c, _ = cache
        pos0 = jnp.zeros((S, Tq), jnp.int32)
        tok0 = jnp.zeros(S, jnp.int32)
        _, outs = jax.lax.scan(step, (kq_c, ks_c, vq_c, vs_c, pos0, tok0),
                               None, length=n)
        return outs.sum()

    return loop


def main():
    import sys

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    if "--dg" in sys.argv:
        # reuse make_device_params' device-side build (fits at L=32
        # where the vmapped _rand_qlinear generation RESOURCE_EXHAUSTS)
        import gc

        from powerserve_tpu.tools.bench_params import make_device_params
        from powerserve_tpu.tools.synthetic import PRESETS

        p = dict(PRESETS["llama-8b"]); p["layers"] = L
        PRESETS[f"probe{L}"] = p
        _, params = make_device_params(f"probe{L}", "q4_k", stacked=True)
        lw = params.layers
        W = (lw.wqkv, lw.wo, lw.wgu, lw.w_down)
        del params, lw
        gc.collect()
    else:
        W = (stacked(ks[0], DIM, QKV_N), stacked(ks[1], DIM, DIM),
             stacked(ks[2], DIM, 2 * FFN), stacked(ks[3], FFN, DIM))
    norms = (jax.random.normal(ks[4], (L, DIM), jnp.float32) * 0.01 + 1,
             jax.random.normal(ks[5], (L, DIM), jnp.float32) * 0.01 + 1)
    half = D // 2
    ang = jax.random.uniform(ks[6], (S, Tq, half), jnp.float32) * 6.28
    rope = (jnp.cos(ang), jnp.sin(ang))
    kq_c = jax.random.randint(ks[7], (L, S, Hkv, T, D), -127, 127,
                              jnp.int8)
    vq_c = jax.random.randint(ks[0], (L, S, Hkv, T, D), -127, 127,
                              jnp.int8)
    ks_c = jnp.abs(jax.random.normal(ks[1], (L, S, Hkv, T))) * 0.02
    vs_c = jnp.abs(jax.random.normal(ks[2], (L, S, Hkv, T))) * 0.02
    mask = jnp.ones((S, T), bool).at[:, -1].set(False)
    cache = (kq_c, ks_c, vq_c, vs_c, mask)
    hh = Hkv // 2  # H-variant: per-half buffers created independently
    cache_h = (jnp.asarray(kq_c[:, :, :hh]), jnp.asarray(kq_c[:, :, hh:]),
               jnp.asarray(vq_c[:, :, :hh]), jnp.asarray(vq_c[:, :, hh:]),
               jnp.asarray(ks_c[:, :, :hh]), jnp.asarray(ks_c[:, :, hh:]),
               jnp.asarray(vs_c[:, :, :hh]), jnp.asarray(vs_c[:, :, hh:]),
               mask)
    x0 = jax.random.normal(jax.random.PRNGKey(9), (S, Tq, DIM),
                           jnp.bfloat16)

    head = None
    if "--step" in sys.argv:
        V = 128256
        embed = (jax.random.normal(ks[3], (V, DIM), jnp.bfloat16) * 0.02)
        out_norm = jnp.ones(DIM, jnp.float32)
        lm_head = _rand_qlinear(ks[4], DIM, V, "q4_k")
        head = (embed, out_norm, lm_head)

    def marginal_ms(fn, n1=8, n2=40, reps=5):
        np.asarray(fn(n1)); np.asarray(fn(n2))
        ms = []
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(fn(n1))
            t1 = time.perf_counter(); np.asarray(fn(n2))
            t2 = time.perf_counter()
            ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
        return statistics.median(ms)

    if "--step" in sys.argv:
        runs = (("E inner+commit+carry", False, False),
                ("F full step (embed+lm_head+argmax)", True, False))
        if "--dus" in sys.argv:
            runs = (("E-dus commit via dynamic_update_slice", False, True),
                    ("F-dus full step, dus commit", True, True))
        for name, wh, du in runs:
            lp = make_step_loop(wh, dus=du)
            t0 = time.time()
            ms = marginal_ms(lambda n: lp(W, norms, rope, cache, head,
                                          x0, n))
            print(f"{name}: {ms:.3f} ms/step ({L} layers; 32-layer "
                  f"equiv {ms / L * 32:.2f} ms)  [{time.time()-t0:.0f}s]",
                  flush=True)
        return

    variants = (("B norms+rope", 1), ("C +kvquant+ys", 2),
                ("D +deferred-attn (full body)", 3))
    if "--dg" in sys.argv:  # cliff A/B: whole cache vs split halves
        variants = (("D cache-as-xs", 3),
                    ("H split-Hkv sub-2^25 buffers", 5))
    for name, v in variants:
        lp = make_loop(v)
        cc = cache_h if v == 5 else cache
        t0 = time.time()
        ms = marginal_ms(lambda n: lp(W, norms, rope, cc, x0, n))
        print(f"{name}: {ms:.3f} ms / {L}-layer chain "
              f"({ms / L * 1e3:.1f} us/layer)  [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
