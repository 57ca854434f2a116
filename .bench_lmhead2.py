"""lm_head decode-cost hunt (r5, VERDICT item 4a): the 8B lm_head
[4096, 128256] Q4_K reads 263MB; at the kernel's standalone 565 GB/s it
should cost ~465us but the r3 measurement said 707. Marginal-method
sweep over bn (128256 = 768*167, 167 prime — only small bns divide)
plus an N-PADDED variant (129024 = 1024*126 = 512*252) to test whether
fewer/larger N tiles close the gap. Anchor: 4096x14336 same-process."""
import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerserve_tpu.ops.qmatmul import _qmatmul_pallas
from powerserve_tpu.tools.bench_params import _rand_qlinear

K = 4096


def make_lin(n, seed=0):
    return jax.jit(lambda k: _rand_qlinear(k, K, n, "q4_k"),
                   static_argnums=())(jax.random.PRNGKey(seed))


def marginal(lin, bn=None, n1=16, n2=128, reps=5):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x0, lin, n):
        def body(x, _):
            y = _qmatmul_pallas(x, lin, jnp.bfloat16, block_n=bn)
            x = x * 0.0 + y[:, :K].astype(jnp.float32) * 1e-6
            return x.astype(jnp.bfloat16), None

        x, _ = jax.lax.scan(body, x0, None, length=n)
        return x.astype(jnp.float32).sum()

    x0 = jnp.ones((1, K), jnp.bfloat16)
    np.asarray(loop(x0, lin, n1))
    np.asarray(loop(x0, lin, n2))
    ms = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(loop(x0, lin, n1))
        t1 = time.perf_counter(); np.asarray(loop(x0, lin, n2))
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
    return statistics.median(ms), ms


def gbs(n, us):
    return (K * n // 2 + K * n // 32 * 2 * 2) / us / 1e3


for n, bns in ((14336, (512,)),
               (128256, (768, 384, 256, 128)),
               (129024, (1024, 768, 512)),
               (130048, (2048, 1024))):  # 130048 = 2048*63.5? check
    if n % 2048 and 2048 in bns:
        bns = tuple(b for b in bns if n % b == 0)
    try:
        lin = make_lin(n)
    except Exception as e:  # noqa: BLE001
        print(f"N={n}: build failed {e}", flush=True)
        continue
    for bn in bns:
        if n % bn:
            continue
        try:
            med, ms = marginal(lin, bn)
            print(f"N={n:6d} bn={bn:4d}: {med:7.1f} us "
                  f"({gbs(n, med):5.0f} GB/s)  "
                  f"[{', '.join(f'{m:.0f}' for m in ms)}]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"N={n} bn={bn}: FAILED {type(e).__name__}", flush=True)
