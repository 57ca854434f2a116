"""Exercise the deploy helper (reference tools/end_to_end role, P5).

The reference's deploy story is adb push + run scripts
(reference tools/end_to_end/deploy_to_phone.sh, powerserve.py); ours
wraps `gcloud compute tpus tpu-vm ssh --worker=all` around the serve
CLI. No pod exists in this environment, so these tests exercise the
full command-construction surface plus the --print-only execution path
end-to-end (the only part that can run without gcloud/a pod).
"""

import shlex
import subprocess
import sys

from powerserve_tpu.tools.deploy import (build_host_commands,
                                         build_serve_command, main)


def _args(**kw):
    import argparse
    defaults = dict(workspace="/ws", tpu=None, zone="us-central1-a",
                    port=8080, tp=0, dp=1, multihost=False,
                    backend="auto", workdir="~", log="powerserve.log",
                    python="python")
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_serve_command_minimal():
    cmd = build_serve_command(_args())
    assert "-m powerserve_tpu serve" in cmd
    assert "-d /ws" in cmd and "--port 8080" in cmd
    assert "--tp" not in cmd and "--distributed" not in cmd
    # daemonized with log redirection on the remote host
    assert cmd.startswith("cd ") and "nohup" in cmd and "2>&1 &" in cmd


def test_serve_command_full_flags():
    cmd = build_serve_command(_args(tp=4, dp=2, multihost=True,
                                    backend="xla", port=9000,
                                    workspace="/models/llama 8b"))
    assert "--tp 4" in cmd and "--dp 2" in cmd
    assert "--distributed" in cmd and "--backend xla" in cmd
    # path with a space survives shell quoting round-trip
    inner = shlex.split(cmd.split("nohup ", 1)[1].rsplit(">", 1)[0])
    assert inner[inner.index("-d") + 1] == "/models/llama 8b"


def test_host_commands_local_vs_pod():
    local = build_host_commands(_args())
    assert len(local) == 1 and "gcloud" not in local[0]
    pod = build_host_commands(_args(tpu="my-pod", zone="europe-west4-b",
                                    multihost=True))
    assert len(pod) == 1
    assert pod[0].startswith("gcloud compute tpus tpu-vm ssh my-pod")
    assert "--zone europe-west4-b" in pod[0]
    assert "--worker=all" in pod[0]
    # the serve command rides inside --command, fully quoted
    inner = shlex.split(pod[0])
    assert "--command" in inner
    serve = inner[inner.index("--command") + 1]
    assert "--distributed" in serve and "powerserve_tpu" in serve


def test_main_print_only_runs_nothing(capsys):
    rc = main(["-d", "/ws", "--tpu", "pod", "--print-only"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("gcloud compute tpus tpu-vm ssh pod")


def test_main_print_only_subprocess():
    # the real CLI entry, as a user would run it
    out = subprocess.run(
        [sys.executable, "-m", "powerserve_tpu", "deploy", "-d", "/ws",
         "--tp", "2", "--print-only"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "powerserve_tpu serve" in out.stdout and "--tp 2" in out.stdout


def test_main_local_executes_command(monkeypatch):
    calls = []
    monkeypatch.setattr(subprocess, "call",
                        lambda c, shell: calls.append((c, shell)) or 0)
    rc = main(["-d", "/ws"])
    assert rc == 0 and len(calls) == 1
    cmd, shell = calls[0]
    assert shell is True and "powerserve_tpu" in cmd
