"""Corpus-scale CLI end-to-end: drive the ACTUAL `memo` launcher at 1M
records (VERDICT r4 missing #3 — the verbs were byte-parity tested at
memo scale and the kernels measured at 1M/10M, but never the integrated
YAML-source-of-truth + device-index product at corpus scale).

Generates a 1M-record save input (synthetic note bodies + mixed
metadata), then times each verb as a real subprocess of the `memo`
launcher with C99VDB_INDEX=ivf_flat C99VDB_SCAN_DTYPE=int8:

  save     — parse input YAML, batched embed (native tokenizer), index
             build on TPU, canonical YAML + TPUVDB01 writes
  recall   — load DB + index, embed query, device ranking, O(k) stream
  recall --filter / -k 100 / --yaml variants
  analyze  — metadata-only scan (+ --stats)
  reindex  — compact + re-embed + rebuild
  second save — INCREMENTAL append of 10k records to the 1M DB

Usage: python benchmarks/cli_corpus_scale.py [--n 1000000]
       [--workdir /tmp/cli1m] [--keep]
       (spawns TPU subprocesses — run alone; CLAUDE.md hazard #5)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu deploy dashboard grafana retro "
    "standup kubernetes postgres redis vector index recall memory note "
    "meeting project release incident oncall metric latency throughput"
).split()


def gen_yaml(path: Path, n: int, start_id: int | None = None,
             seed: int = 0) -> None:
    import random

    rng = random.Random(seed)
    sources = ["user", "agent", "import", "sync"]
    t0 = time.perf_counter()
    with path.open("w") as f:
        for i in range(n):
            w = rng.sample(WORDS, 6)
            body = " ".join(w)
            src = sources[i % 4]
            pri = (i * 7) % 5
            f.write("---\n")
            if start_id is not None:
                f.write(f"id: {start_id + i}\n")
            f.write(
                f"metadata: {{source: {src}, priority: {pri}, "
                f"day: {i % 365}}}\n"
            )
            f.write(f"body: {body}\n")
    print(f"generated {n} records -> {path} "
          f"({path.stat().st_size / 2**20:.0f} MB, "
          f"{time.perf_counter() - t0:.1f}s)", flush=True)


def run_verb(label: str, args: list[str], env: dict, cwd: Path,
             results: dict, tail_lines: int = 2) -> None:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [str(REPO / "memo"), *args], env=env, cwd=cwd,
        capture_output=True, text=True,
    )
    dt = time.perf_counter() - t0
    results[label] = round(dt, 2)
    out = proc.stdout.strip().splitlines()
    shown = out[:1] + (["..."] if len(out) > tail_lines + 1 else []) + \
        out[-tail_lines:] if len(out) > tail_lines + 1 else out
    print(f"{label:<28s} {dt:8.2f}s  rc={proc.returncode}", flush=True)
    for line in shown[:4]:
        print(f"    | {line[:100]}", flush=True)
    if proc.returncode != 0:
        print(f"    STDERR: {proc.stderr.strip()[:500]}", flush=True)
        raise SystemExit(f"{label} failed")


def measure_serve(env: dict, cwd: Path, results: dict,
                  queries: int = 16) -> None:
    """Drive `memo serve` (resident-index REPL): time the first answer
    (cold: load + host->device push + compile) and the steady per-query
    latency on the SAME process — the CLI-reachable serving story."""
    import random

    rng = random.Random(42)
    proc = subprocess.Popen(
        [str(REPO / "memo"), "-f", "db", "serve", "-k", "2"],
        env=env, cwd=cwd, text=True, bufsize=1,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )

    def ask(q: str) -> float:
        t0 = time.perf_counter()
        proc.stdin.write(q + "\n")
        proc.stdin.flush()
        saw_block = False
        while True:
            line = proc.stdout.readline()
            if line == "":
                raise RuntimeError("serve process ended early")
            if line == "\n":  # EXACT empty line = plain-mode terminator
                if saw_block:  # (in-block lines are always prefixed,
                    return time.perf_counter() - t0  # even empty ones)
            else:
                saw_block = True

    cold = ask(" ".join(rng.sample(WORDS, 3)))
    lats = sorted(ask(" ".join(rng.sample(WORDS, 3))) for _ in range(queries))
    proc.stdin.close()
    proc.wait(timeout=60)
    results["serve_cold_s"] = round(cold, 2)
    results["serve_steady_p50_s"] = round(lats[len(lats) // 2], 3)
    results["serve_steady_p90_s"] = round(lats[int(len(lats) * 0.9)], 3)
    print(f"{'serve_cold':<28s} {cold:8.2f}s  rc=0", flush=True)
    print(f"{'serve_steady_p50':<28s} {results['serve_steady_p50_s']:8.3f}s "
          f"(p90 {results['serve_steady_p90_s']:.3f}s over {queries})",
          flush=True)


def measure_serve_batch(env: dict, cwd: Path, results: dict,
                        sizes: tuple = (8, 32, 128)) -> None:
    """Drive `memo serve --batch`: B queries per flush, ONE device
    ranking program per flush (ranked_many_device). Per-query serving is
    dispatch-bound (~90 ms/program on this relay regardless of work), so
    batch throughput is the serving headline for burst traffic."""
    import random

    rng = random.Random(43)
    proc = subprocess.Popen(
        [str(REPO / "memo"), "-f", "db", "serve", "-k", "2",
         "--batch", str(max(sizes))],
        env=env, cwd=cwd, text=True, bufsize=1,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )

    def ask_batch(qs: list[str]) -> float:
        t0 = time.perf_counter()
        proc.stdin.write("".join(q + "\n" for q in qs) + "\n")  # blank = flush
        proc.stdin.flush()
        done = 0
        saw_block = False
        while done < len(qs):
            line = proc.stdout.readline()
            if line == "":
                raise RuntimeError("serve process ended early")
            if line == "\n":  # plain-mode block terminator
                if saw_block:
                    done += 1
                    saw_block = False
            else:
                saw_block = True
        return time.perf_counter() - t0

    def qset(b: int) -> list[str]:
        return [" ".join(rng.sample(WORDS, 3)) for _ in range(b)]

    cold = ask_batch(qset(1))
    results["serve_batch_cold_s"] = round(cold, 2)
    print(f"{'serve_batch_cold':<28s} {cold:8.2f}s  rc=0", flush=True)
    for b in sizes:
        ask_batch(qset(b))  # compile this pow2 batch shape
        dt = min(ask_batch(qset(b)) for _ in range(3))
        results[f"serve_batch{b}_s"] = round(dt, 3)
        results[f"serve_batch{b}_qps"] = round(b / dt, 1)
        print(f"{f'serve_batch{b}':<28s} {dt:8.3f}s  "
              f"{b / dt:8.1f} QPS", flush=True)
    proc.stdin.close()
    proc.wait(timeout=60)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--add", type=int, default=10_000)
    p.add_argument("--workdir", type=str, default="/tmp/cli1m")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--json-out", type=str, default=None)
    p.add_argument("--serve-only", action="store_true",
                   help="skip generation/verbs; run the serve phase "
                        "against an existing --workdir DB (from --keep)")
    p.add_argument("--db-only", action="store_true",
                   help="generate + save the DB into --workdir (kept), "
                        "skip the other verbs — a fast way to rebuild "
                        "the fixture for --serve-only")
    args = p.parse_args()

    wd = Path(args.workdir)
    results: dict = {"config": vars(args)}

    env = dict(os.environ)
    env.update(
        C99VDB_INDEX="ivf_flat",
        C99VDB_SCAN_DTYPE="int8",
        C99VDB_NLIST="2048",
        C99VDB_NPROBE="8",
    )

    if args.serve_only:
        if not (wd / "db.yaml").exists():
            raise SystemExit(f"--serve-only: no DB at {wd}/db.yaml")
        measure_serve(env, wd, results)
        measure_serve_batch(env, wd, results)
        line = json.dumps(results)
        print(line, flush=True)
        if args.json_out:
            Path(args.json_out).write_text(line)
        return 0

    if wd.exists():
        shutil.rmtree(wd)
    wd.mkdir(parents=True)

    notes = wd / "notes.yaml"
    gen_yaml(notes, args.n)
    results["input_mb"] = round(notes.stat().st_size / 2**20, 1)

    run_verb("save_1m", ["-f", "db", "save", str(notes)], env, wd, results)
    results["db_yaml_mb"] = round((wd / "db.yaml").stat().st_size / 2**20, 1)
    results["db_memo_mb"] = round((wd / "db.memo").stat().st_size / 2**20, 1)

    if args.db_only:
        line = json.dumps(results)
        print(line, flush=True)
        if args.json_out:
            Path(args.json_out).write_text(line)
        return 0

    run_verb("recall_k2", ["-f", "db", "recall", "deploy dashboard"],
             env, wd, results)
    run_verb("recall_k2_warm", ["-f", "db", "recall", "grafana metric"],
             env, wd, results)
    run_verb("recall_k100",
             ["-f", "db", "recall", "-k", "100", "vector index recall"],
             env, wd, results, tail_lines=1)
    run_verb("recall_filtered",
             ["-f", "db", "recall", "-k", "10", "--filter",
              "{source: user, priority: {$gte: 3}}", "release incident"],
             env, wd, results, tail_lines=1)
    run_verb("recall_yaml",
             ["-f", "db", "recall", "--yaml", "-k", "5", "standup retro"],
             env, wd, results, tail_lines=1)
    run_verb("analyze_table",
             ["-f", "db", "analyze", "--filter", "{priority: {$gte: 4}}",
              "--limit", "5"],
             env, wd, results, tail_lines=1)
    run_verb("analyze_stats",
             ["-f", "db", "analyze", "--filter", "{}", "--stats", "source"],
             env, wd, results, tail_lines=2)
    run_verb("reindex_1m", ["-f", "db", "reindex"], env, wd, results)

    more = wd / "more.yaml"
    gen_yaml(more, args.add, seed=7)
    run_verb(f"save_append_{args.add}", ["-f", "db", "save", str(more)],
             env, wd, results, tail_lines=1)
    run_verb("recall_after_append",
             ["-f", "db", "recall", "oncall incident"], env, wd, results)

    measure_serve(env, wd, results)
    measure_serve_batch(env, wd, results)

    line = json.dumps(results)
    print(line, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(line)
    if not args.keep:
        shutil.rmtree(wd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
