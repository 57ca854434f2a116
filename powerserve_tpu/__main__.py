"""Unified CLI: `python -m powerserve_tpu <command>` (counterpart of
the reference's app binaries + `powerserve` script).

Commands:
  run          generate from a prompt (app/run)
  serve        OpenAI-compatible HTTP server (app/server)
  perplexity   perplexity eval (app/perplexity)
  mmlu         MMLU harness over the HTTP API (tools/mmlu)
  convert      HF checkpoint -> workspace (tools/gguf_export + converter)
  workspace    assemble a workspace (powerserve create)
  synthetic    random-weight workspace for testing
  param-search speculative knob grid search (tools/parameter_search)
  mmmu         multimodal eval harness over the HTTP API
  cos-sim      compare activation dumps (numerics debugging)
  dump-activations  per-layer hidden-state dumps
  bench-kernels     quantized-matmul microbenchmarks
  autotune     tune qmatmul knobs per weight shape; persist in workspace
  deploy       launch serving across a TPU pod slice (docs/DEPLOY.md)
"""

from __future__ import annotations

import os
import sys


def _honor_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu python -m powerserve_tpu ...` work even
    when a site plugin pre-imports jax and overrides the env var (the
    axon TPU-tunnel environment does): re-assert the requested
    platforms via jax.config, which still takes effect post-import as
    long as no backend has initialized yet."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:  # noqa: BLE001 — never block the CLI on this
        pass


def main() -> int:
    _honor_platform_env()
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "run":
        from .run import main as m
        return m(argv) or 0
    if cmd == "serve":
        from .serving.server import main as m
        m(argv)
        return 0
    if cmd == "perplexity":
        from .tools.perplexity import main as m
        return m(argv)
    if cmd == "mmlu":
        from .tools.mmlu import main as m
        return m(argv)
    if cmd == "convert":
        from .tools.convert_hf import main as m
        return m(argv)
    if cmd == "workspace":
        from .tools.workspace import main as m
        return m(argv)
    if cmd == "synthetic":
        from .tools.synthetic import main as m
        sys.argv = [sys.argv[0]] + argv
        m()
        return 0
    if cmd == "param-search":
        from .tools.param_search import main as m
        return m(argv)
    if cmd == "mmmu":
        from .tools.mmmu import main as m
        return m(argv)
    if cmd == "cos-sim":
        from .tools.cos_sim import main as m
        return m(argv)
    if cmd == "dump-activations":
        from .tools.dump_activations import main as m
        return m(argv)
    if cmd == "bench-kernels":
        from .tools.bench_kernels import main as m
        return m(argv)
    if cmd == "autotune":
        from .tools.autotune import main as m
        return m(argv)
    if cmd == "deploy":
        from .tools.deploy import main as m
        return m(argv)
    if cmd == "gate":
        from .tools.gate import main as m
        return m(argv)
    print(f"unknown command '{cmd}'\n{__doc__}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
