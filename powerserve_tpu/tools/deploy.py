"""TPU pod-slice deploy helper (`powerserve-tpu deploy`).

The reference's end-to-end deploy script pushes binaries to a phone
over adb (reference tools/end_to_end/deploy.sh role); the TPU
equivalent launches the serving command on every host of a pod slice
via `gcloud compute tpus tpu-vm ssh --worker=all`, relying on JAX's
pod auto-detection (or explicit JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID) for multi-host init.

See docs/DEPLOY.md for the full runbook.
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys


def build_serve_command(args) -> str:
    parts = [args.python, "-m", "powerserve_tpu", "serve",
             "-d", args.workspace, "--port", str(args.port)]
    if args.tp:
        parts += ["--tp", str(args.tp)]
    if args.dp != 1:
        parts += ["--dp", str(args.dp)]
    if args.multihost:
        parts.append("--distributed")
    if args.backend != "auto":
        parts += ["--backend", args.backend]
    inner = " ".join(shlex.quote(p) for p in parts)
    return (f"cd {shlex.quote(args.workdir)} && "
            f"nohup {inner} > {shlex.quote(args.log)} 2>&1 &")


def build_host_commands(args) -> list[str]:
    serve = build_serve_command(args)
    if not args.tpu:
        return [serve]
    return [
        "gcloud compute tpus tpu-vm ssh "
        f"{shlex.quote(args.tpu)} --zone {shlex.quote(args.zone)} "
        f"--worker=all --command {shlex.quote(serve)}"
    ]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="powerserve-tpu deploy",
        description="launch serving across a TPU pod slice")
    ap.add_argument("-d", "--workspace", required=True,
                    help="model workspace path ON the hosts")
    ap.add_argument("--tpu", default=None,
                    help="TPU VM name (gcloud); omit to print/run the "
                         "local command only")
    ap.add_argument("--zone", default="us-central1-a")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel ways per host (0 = single chip)")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--multihost", action="store_true",
                    help="add --distributed (multi-host pod slice)")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--workdir", default="~")
    ap.add_argument("--log", default="powerserve.log")
    ap.add_argument("--python", default="python")
    ap.add_argument("--print-only", action="store_true",
                    help="print the commands instead of running them")
    args = ap.parse_args(argv)

    cmds = build_host_commands(args)
    if args.print_only:
        for c in cmds:
            print(c)
        return 0
    rc = 0
    for c in cmds:
        print(f"+ {c}", file=sys.stderr)
        rc |= subprocess.call(c, shell=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
