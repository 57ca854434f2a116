"""MMLU evaluation harness over the OpenAI HTTP API (reference
tools/mmlu/mmlu_test.py:52-185: 1-shot prompts against the running
server, per-subject accuracy JSON). Dataset: local CSV dir in the
standard MMLU layout (subject_test.csv with question,A,B,C,D,answer) —
no network fetch."""

from __future__ import annotations

import argparse
import csv
import json
import re
from pathlib import Path

import httpx

CHOICES = ["A", "B", "C", "D"]


def build_prompt(question: str, options: list[str],
                 example: tuple[str, list[str], str] | None = None) -> str:
    """1-shot multiple-choice prompt (reference mmlu_test.py prompt)."""
    parts = ["The following is a multiple choice question. Answer with "
             "just the letter of the correct option.\n"]
    if example:
        eq, eopts, eans = example
        parts.append(eq + "\n")
        for c, o in zip(CHOICES, eopts):
            parts.append(f"{c}. {o}\n")
        parts.append(f"Answer: {eans}\n\n")
    parts.append(question + "\n")
    for c, o in zip(CHOICES, options):
        parts.append(f"{c}. {o}\n")
    parts.append("Answer:")
    return "".join(parts)


def parse_choice(text: str) -> str | None:
    """Robust letter extraction (reference mmmu_test.py choice parsing)."""
    m = re.search(r"\b([ABCD])\b", text.strip().upper())
    return m.group(1) if m else None


def ask_server(base_url: str, model: str, prompt: str,
               timeout: float = 120.0) -> str:
    r = httpx.post(f"{base_url}/v1/chat/completions", json={
        "model": model,
        "messages": [{"role": "user", "content": prompt}],
        "max_tokens": 8, "temperature": 0.0,
    }, timeout=timeout)
    r.raise_for_status()
    return r.json()["choices"][0]["message"]["content"]


def run_subject(base_url: str, model: str, csv_path: Path,
                limit: int = 0) -> dict:
    rows = []
    with open(csv_path) as f:
        for row in csv.reader(f):
            if len(row) >= 6:
                rows.append((row[0], row[1:5], row[5].strip().upper()))
    example = rows[0] if rows else None
    rows_eval = rows[1:] if len(rows) > 1 else rows
    if limit:
        rows_eval = rows_eval[:limit]
    correct = 0
    for q, opts, ans in rows_eval:
        out = ask_server(base_url, model, build_prompt(q, opts, example))
        if parse_choice(out) == ans:
            correct += 1
    n = len(rows_eval)
    return {"subject": csv_path.stem.replace("_test", ""),
            "n": n, "correct": correct,
            "accuracy": correct / n if n else 0.0}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="powerserve-tpu mmlu")
    ap.add_argument("--data-dir", required=True,
                    help="dir of MMLU *_test.csv files")
    ap.add_argument("--url", default="http://127.0.0.1:8080")
    ap.add_argument("--model", default="",
                    help="model name ('' = the server's default — a "
                         "workspace-launched server names its main "
                         "model after the model subdir, not 'default')")
    ap.add_argument("--limit", type=int, default=0,
                    help="max questions per subject")
    ap.add_argument("-o", "--output", default="mmlu_results.json")
    args = ap.parse_args(argv)

    results = []
    for csv_path in sorted(Path(args.data_dir).glob("*_test.csv")):
        res = run_subject(args.url, args.model, csv_path, args.limit)
        results.append(res)
        print(f"{res['subject']}: {res['accuracy']:.2%} ({res['correct']}/{res['n']})")
    total_n = sum(r["n"] for r in results)
    total_c = sum(r["correct"] for r in results)
    summary = {"subjects": results, "total_n": total_n,
               "total_correct": total_c,
               "accuracy": total_c / total_n if total_n else 0.0}
    Path(args.output).write_text(json.dumps(summary, indent=2))
    print(f"overall: {summary['accuracy']:.2%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
