"""Per-shape qmatmul autotuner (roadmap P0: autotune (bn, groups) per
weight shape at load; persist in the workspace).

Sweeps the fused-kernel knobs for every distinct weight shape of a
model (or an explicit shape list) at decode (M=1) and prefill (M=256)
activations, using the marginal-cost method from CLAUDE.md — a jitted
lax.scan whose body feeds the output back into the activation, timed as
the cost difference between two scan lengths, so XLA cannot hoist the
loop-invariant matmul and the ~25 ms tunnel dispatch overhead cancels.

Writes `<workspace>/qmm_tune.json`:

    {"decode:4096:14336": {"bn": 512, "groups": 8, "us": 78.1}, ...}

which models/loader.py feeds to ops/qmatmul.py's per-shape override
table on every subsequent load of that workspace.

Counterpart of the reference's offline AOT tuning stage (the QNN
converter bakes per-SoC HTP settings at compile time,
tools/qnn_converter/generate_binary.py:53-101); here tuning is a
one-off post-deploy step against the actual chip.
"""

from __future__ import annotations

import functools
import json
import statistics
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger

log = get_logger("autotune")

BN_CANDIDATES = (256, 512, 1024)
GROUP_CANDIDATES = (1, 2, 4, 8)


def _marginal_us(lin, m: int, k: int, bn: int, groups: int,
                 n1: int = 64, n2: int = 512, reps: int = 3) -> float:
    """Median marginal cost (us/iter) of the kernel at (bn, groups)."""
    from ..ops.qmatmul import qmatmul

    x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)

    # NOTE lin rides as a jit ARGUMENT: closing over the weight arrays
    # bakes them into the lowered program as multi-MB constants — slow
    # remote compiles, and the 8B lm_head (263 MB of nibbles) overflows
    # the tunnel's compile-payload limit entirely (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(lin, x0, n):
        def body(x, _):
            y = qmatmul(x, lin, backend="pallas")
            # serial dependence: fold y back into x (shape-preserving)
            x = x + (y[:, :k] * 1e-6).astype(x.dtype) if y.shape[1] >= k \
                else x + (jnp.pad(y, ((0, 0), (0, k - y.shape[1])))
                          * 1e-6).astype(x.dtype)
            return x, None
        x, _ = jax.lax.scan(body, x0, None, length=n)
        return x.astype(jnp.float32).sum()

    import importlib

    # NB: `import powerserve_tpu.ops.qmatmul as qmm` would bind the
    # FUNCTION (ops/__init__ rebinds the attribute); need the module
    qmm = importlib.import_module("powerserve_tpu.ops.qmatmul")
    old = qmm._TUNE.copy()
    key = f"{qmm.mclass(m)}:{k}:{lin.out_features}"
    qmm._TUNE[key] = {"bn": bn, "groups": groups}
    try:
        np.asarray(loop(lin, x0, n1))
        np.asarray(loop(lin, x0, n2))
        ms = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(lin, x0, n1))
            t1 = time.perf_counter()
            np.asarray(loop(lin, x0, n2))
            t2 = time.perf_counter()
            ms.append(((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6)
        return statistics.median(ms)
    finally:
        qmm._TUNE.clear()
        qmm._TUNE.update(old)


def tune_model(model_dir: str | Path, out: str | Path | None = None,
               m_classes: tuple[int, ...] = (1, 256),
               bn_candidates=BN_CANDIDATES,
               group_candidates=GROUP_CANDIDATES) -> dict:
    """Tune every distinct (K, N) weight shape of a loaded model; write
    qmm_tune.json next to weights.gguf (or to `out`)."""
    from ..models.loader import load_gguf_model
    from ..ops.qmatmul import QLinear, mclass

    model_dir = Path(model_dir)
    cfg, params = load_gguf_model(model_dir)

    shapes: dict[tuple[int, int], QLinear] = {}

    def visit(lin):
        if isinstance(lin, QLinear):
            shapes.setdefault((lin.in_features, lin.out_features), lin)

    lws = params.layers if isinstance(params.layers, (tuple, list)) \
        else [params.layers]
    for lw in lws:
        for f in ("wq", "wk", "wv", "wo", "wqkv", "wgu", "w_gate", "w_up",
                  "w_down"):
            visit(getattr(lw, f, None))
    visit(params.lm_head)

    table: dict[str, dict] = {}
    for (k, n), lin in sorted(shapes.items()):
        # stacked weights [L, ...]: tune the single-layer slice
        if lin.q.ndim == 3:
            import dataclasses

            lin = dataclasses.replace(
                lin, q=lin.q[0], scales=lin.scales[0],
                bias=None if lin.bias is None else lin.bias[0])
        for m in m_classes:
            # the kernel clamps groups-per-tile to 2 for bm > 16
            # (VMEM; ops/qmatmul.py), so larger candidates would time
            # identical kernels and record unreachable knob values
            g_cands = [g for g in group_candidates if m <= 16 or g <= 2]
            best = None
            for bn in bn_candidates:
                if n % bn:
                    continue
                for g in g_cands:
                    try:
                        us = _marginal_us(lin, m, k, bn, g)
                    except Exception as e:  # noqa: BLE001
                        log.debug(f"{k}x{n} m={m} bn={bn} g={g}: {e}")
                        continue
                    if best is None or us < best[0]:
                        best = (us, bn, g)
            if best is not None:
                key = f"{mclass(m)}:{k}:{n}"
                table[key] = {"bn": best[1], "groups": best[2],
                              "us": round(best[0], 2)}
                log.info(f"{key}: bn={best[1]} groups={best[2]} "
                         f"({best[0]:.1f} us)")
    if out:
        out = Path(out)
    else:  # beside weights.gguf whether model_dir is the dir or the file
        base = model_dir if model_dir.is_dir() else model_dir.parent
        out = base / "qmm_tune.json"
    out.write_text(json.dumps(table, indent=1))
    log.info(f"wrote {len(table)} tuned shapes -> {out}")
    return table


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="autotune qmatmul knobs for a workspace model")
    ap.add_argument("model_dir", help="model dir containing weights.gguf")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--prefill-m", type=int, default=256)
    args = ap.parse_args(argv)
    tune_model(args.model_dir, args.out, m_classes=(1, args.prefill_m))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
