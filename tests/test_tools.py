"""Tool-layer tests: workspace assembly, param search, CLI dispatch,
MMLU prompt building."""

import json

import numpy as np
import pytest

from powerserve_tpu.core.gguf import GGMLType
from powerserve_tpu.tools.mmlu import build_prompt, parse_choice
from powerserve_tpu.tools.synthetic import make_synthetic_gguf
from powerserve_tpu.tools.workspace import create_workspace


def test_workspace_create_from_gguf(tmp_path):
    src = tmp_path / "src"
    make_synthetic_gguf(src, "tiny", GGMLType.Q8_0)
    out = create_workspace(tmp_path / "ws", src / "model",
                           draft_model=src / "model")
    ws = json.loads((out / "workspace.json").read_text())
    assert ws["model_main"] == "model_main"
    assert ws["model_draft"] == "model_draft"
    assert (out / "model_main" / "weights.gguf").exists()
    assert (out / "model_draft" / "weights.gguf").exists()
    assert (out / "hparams.json").exists()

    # loadable end to end
    from powerserve_tpu.core.config import WorkspaceConfig

    cfg = WorkspaceConfig.load(out)
    assert cfg.draft_model_dir is not None


def test_param_search_grid(tmp_path):
    """Small grid over the tiny HF model pair."""
    from tests.test_speculative import _mk_model
    from powerserve_tpu.speculative.engine import SpeculativeEngine
    from powerserve_tpu.tools.param_search import run_search

    t_params, t_cfg = _mk_model(0)
    d_params, d_cfg = _mk_model(1, layers=1)

    def make_engine(cfg):
        return SpeculativeEngine(t_params, t_cfg, d_params, d_cfg, cfg,
                                 max_seq=128, kv_dtype="bf16",
                                 backend="xla")

    grid = {"draft_batch_size": [4, 6], "draft_top_k": [3],
            "draft_temperature": [1.0], "p_base": [0.9],
            "max_fan_out": [2], "min_prob": [0.1]}
    out = tmp_path / "search.jsonl"
    results = run_search(make_engine, [1, 5, 9], 6, grid, out)
    assert len(results) == 2
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert "tokens_per_step" in rec and "accept_rate" in rec


def test_mmlu_prompt_and_parse():
    p = build_prompt("What is 2+2?", ["3", "4", "5", "6"],
                     example=("What is 1+1?", ["1", "2", "3", "4"], "B"))
    assert "Answer: B" in p
    assert p.endswith("Answer:")
    assert parse_choice(" B. because...") == "B"
    assert parse_choice("the answer is C") == "C"
    assert parse_choice("unclear") is None


def test_cli_dispatch_unknown():
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "-m", "powerserve_tpu", "nope"],
                       capture_output=True, text=True, cwd="/root/repo",
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "HOME": "/root"})
    assert r.returncode == 1
    assert "unknown command" in r.stdout


def test_dump_activations_and_cos_sim(tmp_path):
    from powerserve_tpu.models.loader import load_gguf_model
    from powerserve_tpu.tools.cos_sim import compare
    from powerserve_tpu.tools.dump_activations import dump_forward

    src = tmp_path / "m"
    make_synthetic_gguf(src, "tiny", GGMLType.Q8_0)
    cfg, params = load_gguf_model(src / "model")
    out1 = dump_forward(params, cfg, [1, 5, 9], tmp_path / "d1")
    out2 = dump_forward(params, cfg, [1, 5, 9], tmp_path / "d2")
    assert (out1 / "layer_00.npy").exists()
    assert (out1 / "logits.npy").exists()
    rows = compare(out1, out2)
    assert len(rows) == cfg.llm.n_layers + 1
    assert all(abs(cs - 1.0) < 1e-5 for _, cs, _ in rows)


def test_deploy_print_only(capsys):
    """deploy --print-only emits the per-host gcloud/serve commands."""
    from powerserve_tpu.tools.deploy import main as deploy_main

    assert deploy_main(["-d", "/models/m", "--tp", "4", "--print-only"]) == 0
    out = capsys.readouterr().out
    assert "powerserve_tpu serve" in out and "--tp 4" in out

    assert deploy_main(["-d", "/models/m", "--tpu", "myslice",
                        "--zone", "us-east1-d", "--multihost", "--tp", "4",
                        "--print-only"]) == 0
    out = capsys.readouterr().out
    assert "gcloud compute tpus tpu-vm ssh" in out
    assert "--worker=all" in out and "--distributed" in out


def test_gate_smoke_workspace(tmp_path):
    """The eval gate must accept a WORKSPACE dir (workspace.json ->
    model subdir, like run/serve) and produce perplexity + real
    speculation-acceptance numbers — it rotted on exactly this in the
    r5 smoke run (VERDICT r4 item 9: keep the gate standing)."""
    from powerserve_tpu.tools.gate import main as gate_main

    src = tmp_path / "src"
    make_synthetic_gguf(src, "tiny", GGMLType.Q8_0)
    ws = create_workspace(tmp_path / "ws", src / "model")
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("The quick brown fox jumps over the lazy dog. "
                      * 20)
    out = tmp_path / "gate.json"
    rc = gate_main(["-d", str(ws), "--backend", "xla",
                    "--prompt-file", str(corpus),
                    "--draft", "self:1", "--spec-tokens", "16",
                    "-o", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["pass"] is True
    assert rep["checks"]["perplexity"]["perplexity"] > 0
    spec = rep["checks"]["speculation"]
    assert spec["generated"] == 16
    assert 0.0 <= spec["accept_rate"] <= 1.0
