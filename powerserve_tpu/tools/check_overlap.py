"""Collective-overlap / collective-cost audit for the tp decode step.

VERDICT r3 item 5: the >=85% tp-scaling claim (docs/SCALING.md) needs
HLO-level evidence, not just arithmetic. This tool AOT-compiles ONE
tp decode step for a REAL multi-chip TPU topology (no chips needed —
`jax.experimental.topologies` compiles against a topology description)
and audits the optimized HLO:

  * inventory of collectives (kind, payload shape/bytes, sync vs
    async start/done pairs, inside vs outside the layer scan)
  * the analytic per-layer collective cost (ring all-reduce:
    2*(tp-1)/tp * bytes / ICI_BW + hop latency) vs the measured
    per-layer compute (CLAUDE.md L-curve: ~315 us/layer on 8B Q4_K)
  * a verdict: at decode the psum payloads are [S, dim] bf16 — KB-
    scale, LATENCY-bound (~1-5 us/hop) — so even fully-synchronous
    collectives cost <3% of a layer and the scaling claim does NOT
    rest on overlap; at prefill (M = chunk) payloads are MB-scale and
    bandwidth-bound — there XLA's collective-matmul / async passes
    (or explicit shard_map pipelining) become the lever.

Reference n/a (the reference is single-device NPU); the mental model
is the public scaling-book recipe: annotate shardings, let XLA insert
collectives, AUDIT what it inserted.

Usage: python -m powerserve_tpu.tools.check_overlap --workspace <dir>
       (or --preset tiny for synthetic params) [--topology v5e:2x2]
"""

from __future__ import annotations

import json
import re

# v5e ICI: ~45 GB/s per link per direction, ~1 us hop latency (public
# numbers; the audit only needs the order of magnitude)
ICI_BW = 45e9
ICI_HOP_US = 1.0


def audit_hlo(txt: str, tp: int) -> dict:
    """Parse optimized HLO text into a collective inventory."""
    coll_re = re.compile(
        r"%\S+ = (\S+?) (all-reduce|all-gather|reduce-scatter|"
        r"collective-permute)(-start|-done)?\(", re.M)
    shape_re = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    DT = {"bf16": 2, "f32": 4, "f16": 2, "s8": 1, "u8": 1, "s32": 4,
          "pred": 1, "u32": 4}
    out = []
    for m in coll_re.finditer(txt):
        shape, kind, phase = m.group(1), m.group(2), m.group(3)
        sm = shape_re.match(shape)
        nbytes = 0
        if sm:
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes = n * DT.get(dt, 4)
        # inside the decode layer scan? (while-body metadata)
        line = txt[txt.rfind("\n", 0, m.start()) + 1:m.end() + 400]
        in_scan = "/while/body/" in line
        out.append({"kind": kind + (phase or ""), "shape": shape,
                    "bytes": nbytes, "in_layer_scan": in_scan,
                    "async": phase is not None})
    ring_factor = 2 * (tp - 1) / tp
    for c in out:
        c["ring_us"] = round(
            c["bytes"] * ring_factor / ICI_BW * 1e6
            + (tp - 1) * ICI_HOP_US, 2)
    return {
        "collectives": out,
        "n_sync": sum(1 for c in out if not c["async"]),
        "n_async_pairs": sum(1 for c in out if c["kind"].endswith(
            "-start")),
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default=None)
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--quant", default="q8_0")
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--layer-us", type=float, default=315.0,
                    help="measured per-layer decode compute for the "
                         "verdict ratio (CLAUDE.md L-curve, 8B Q4_K)")
    ap.add_argument("--dump", default=None, help="write HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..kv.cache import KVCache
    from ..parallel.tp import kv_specs, param_specs, tp_forward

    if args.workspace:
        from ..models.loader import load_gguf_model

        cfg, params = load_gguf_model(args.workspace + "/model")
    else:
        from .bench_params import make_device_params

        cfg, params = make_device_params(args.preset, args.quant)
    llm = cfg.llm

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devs = np.array(topo.devices).reshape(args.dp, args.tp, 1)
    mesh = Mesh(devs, ("dp", "tp", "sp"))

    def absify(tree, specs):
        is_leaf = lambda x: x is None or isinstance(x, P)  # noqa: E731
        leaves, treedef = jax.tree_util.tree_flatten(specs,
                                                     is_leaf=is_leaf)
        subtrees = treedef.flatten_up_to(tree)

        def mk(spec, sub):
            if sub is None:
                return None
            return jax.tree.map(lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=NamedSharding(
                    mesh, spec if spec is not None else P())), sub)

        return jax.tree_util.tree_unflatten(
            treedef, [mk(s, t) for s, t in zip(leaves, subtrees)])

    S = args.dp
    kv = KVCache.create(llm.n_layers, S, 64, llm.n_kv_heads,
                        llm.head_size, "int8")
    p_abs = absify(params, param_specs(params, args.tp))
    kv_abs = absify(kv, kv_specs(kv))
    tok = jax.ShapeDtypeStruct((S, 1), jnp.int32,
                               sharding=NamedSharding(mesh, P("dp", None)))

    def step(p, kv, tok, pos):
        return tp_forward(p, llm, kv, tok, pos, mesh=mesh,
                          backend="xla", logits_mode="last")

    txt = jax.jit(step).lower(p_abs, kv_abs, tok, tok).compile().as_text()
    if args.dump:
        open(args.dump, "w").write(txt)

    audit = audit_hlo(txt, args.tp)
    per_layer = [c for c in audit["collectives"]
                 if c["in_layer_scan"] and "start" not in c["kind"]
                 and "done" not in c["kind"]]
    layer_coll_us = sum(c["ring_us"] for c in per_layer)
    ratio = layer_coll_us / args.layer_us
    audit.update({
        "metric": "tp_collective_audit",
        "topology": args.topology, "dp": args.dp, "tp": args.tp,
        "per_layer_collectives": len(per_layer),
        "per_layer_collective_us": round(layer_coll_us, 2),
        "layer_compute_us": args.layer_us,
        "collective_fraction": round(ratio, 4),
        "scaling_efficiency_bound": round(1 / (1 + ratio), 4),
        "verdict": ("decode psums are latency-bound; sync collectives "
                    "cost <{:.1%} of a layer — the >=85% claim holds "
                    "WITHOUT overlap".format(ratio)
                    if ratio < 0.15 else
                    "collectives are a material fraction of a layer — "
                    "needs async/collective-matmul overlap"),
    })
    print(json.dumps(audit))


if __name__ == "__main__":
    main()
