"""Full-contract 10x scaling sweep (r11 verdict item 4 — a STANDING
gate, not a one-off): run every contract query at two SF dirs and emit
a per-query scaling exponent table, so a regression in any operator's
scale shape is caught the round it happens instead of trusting the
exponent measured the round the operator landed.

exponent = log(T_big / T_small) / log(factor)

T is warm executor task CPU (min over the measured repeats, first run
discarded as JIT warmup) — the same noise-robust signal bench.py
grades on; wall time on this shared box swings +/-2x and would drown
the exponents. Sub-linear exponents (< 1.0) mean the operator's work
grows slower than the data; ~1.0 is scan-bound linear; > 1.0 is the
red flag (superlinear shuffle/pair blowup) this sweep exists to catch.
Queries whose small-side CPU is under --min-cpu-s are reported but
flagged `tiny` — a 0.05 s numerator is quantization noise, not signal.

Usage:
  python tools/gen_scale_data.py              # once: writes .scale/sf1
  python tools/scale_sweep.py [--queries a,b] [--repeat 2]
      [--small /root/testdata/sf0.1] [--big /root/repo/.scale/sf1]
      [--factor 10] [--out SCALE_SWEEP.json]

Prints a markdown table (paste into SCALING.md) and one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--min-cpu-s", type=float, default=0.2)
    ap.add_argument("--out", default=None, help="write the JSON record here too")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bench import TaskTimeProbe

    from imitation_learning_data_pipeline_spark.session import get_spark

    qs = entry.queries()
    names = args.queries.split(",") if args.queries else sorted(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark = get_spark("scale-sweep")
    spark.range(1000).selectExpr("sum(id)", "max(lower(string(id)))").collect()
    probe = TaskTimeProbe(spark)

    def measure(fn, sf_dir: str) -> float:
        """Warm task CPU: run repeat+1 times, drop run 1 (JIT), min of
        the rest. clearCache between runs drops plan-internal pins."""
        best = None
        for i in range(args.repeat + 1):
            m0 = probe.total_ms()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cpu = (probe.total_ms() - m0) / 1000.0
            if i > 0 and (best is None or cpu < best):
                best = cpu
            spark.catalog.clearCache()
        return best if best is not None else cpu

    rows = []
    for name in names:
        fn = qs[name]
        t0 = time.time()
        t_small = measure(fn, args.small)
        t_big = measure(fn, args.big)
        exp = (
            math.log(max(t_big, 1e-3) / max(t_small, 1e-3))
            / math.log(args.factor)
        )
        tiny = t_small < args.min_cpu_s
        rows.append(
            {
                "query": name,
                "cpu_small_s": round(t_small, 3),
                "cpu_big_s": round(t_big, 3),
                "exponent": round(exp, 2),
                "tiny": tiny,
            }
        )
        print(
            f"# {name}: {t_small:.2f}s -> {t_big:.2f}s  exp {exp:+.2f}"
            f"{'  (tiny)' if tiny else ''}  [{time.time() - t0:.0f}s]",
            flush=True,
        )

    rows.sort(key=lambda r: -r["exponent"])
    print("\n| query | cpu@small (s) | cpu@10x (s) | exponent | note |")
    print("|---|---|---|---|---|")
    for r in rows:
        note = "tiny numerator" if r["tiny"] else ""
        print(
            f"| {r['query']} | {r['cpu_small_s']} | {r['cpu_big_s']} "
            f"| {r['exponent']} | {note} |"
        )
    over = [r for r in rows if r["exponent"] > 1.0 and not r["tiny"]]
    record = {
        "metric": "scale_sweep_exponents",
        "factor": args.factor,
        "n_queries": len(rows),
        "n_superlinear": len(over),
        "superlinear": [r["query"] for r in over],
        "rows": rows,
    }
    print(json.dumps(record), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(record, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
