"""Embedded serving at corpus scale: MemoDB resident-index recall QPS.

The CLI is a fresh process per verb, so a corpus-scale recall pays the
~1.5 GB host->device push every time (the verb IS the push — BASELINE.md
round-5 CLI table). MemoDB is the serving surface: it keeps the loaded
store + staged index resident across calls (stat-keyed; round-5 fix —
previously it reloaded BOTH per call). This measures what that buys:

  cold   — first recall_many on a fresh MemoDB (load + push + compile)
  steady — repeated recall_many batches on the resident index (QPS)
  single — per-call latency of 1-query recall_many on the resident index

Usage:
  python benchmarks/exp_serving.py [--db /tmp/cli1m/db] [--batch 128]
                                   [--rounds 5] [--k 2] [--json-out F]

Requires a built DB (benchmarks/cli_corpus_scale.py --keep leaves one at
/tmp/cli1m). TPU job — run alone (CLAUDE.md hazard #5).
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu deploy dashboard grafana retro "
    "standup kubernetes postgres redis vector index recall memory note "
    "meeting project release incident oncall metric latency throughput"
).split()


def queries(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    return [" ".join(rng.sample(WORDS, 3)) for _ in range(n)]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--db", default="/tmp/cli1m/db")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--singles", type=int, default=32)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(args.db)
    res: dict = {"config": vars(args), "n_records": len(db)}
    print(f"records: {res['n_records']}", flush=True)

    t0 = time.perf_counter()
    first = db.recall_many(queries(args.batch, 0), k=args.k)
    res["cold_batch_s"] = round(time.perf_counter() - t0, 3)
    assert all(len(h) == args.k for h in first)
    print(f"cold first batch ({args.batch} queries): {res['cold_batch_s']} s",
          flush=True)

    times = []
    for r in range(args.rounds):
        qs = queries(args.batch, 100 + r)
        t0 = time.perf_counter()
        out = db.recall_many(qs, k=args.k)
        times.append(time.perf_counter() - t0)
        assert all(len(h) == args.k for h in out)
    times.sort()
    med = times[len(times) // 2]
    res["steady_batch_s"] = [round(t, 4) for t in times]
    res["steady_qps"] = round(args.batch / med, 1)
    print(f"steady recall_many: median {med*1e3:.1f} ms/batch "
          f"-> {res['steady_qps']} QPS (min-max {times[0]*1e3:.1f}-"
          f"{times[-1]*1e3:.1f} ms)", flush=True)

    lat = []
    for i, q in enumerate(queries(args.singles, 999)):
        t0 = time.perf_counter()
        out = db.recall_many([q], k=args.k)
        lat.append(time.perf_counter() - t0)
        assert len(out[0]) == args.k
    lat.sort()
    res["single_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 2)
    res["single_p90_ms"] = round(lat[int(len(lat) * 0.9)] * 1e3, 2)
    print(f"single-query latency: p50 {res['single_p50_ms']} ms, "
          f"p90 {res['single_p90_ms']} ms", flush=True)

    line = json.dumps(res)
    print(line, flush=True)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
