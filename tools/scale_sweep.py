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
    ap.add_argument(
        "--lib",
        type=int,
        default=None,
        metavar="N",
        help="sweep the top-N most expensive NON-CONTRACT library rows "
        "instead of the contract set (r12 verdict item 5: the standing "
        "gate covered the 50 contract queries; the other ~86 library "
        "rows had only landing-round pairings). Ranking = one cold "
        "task-CPU run each at --small; the top N then get the full "
        "pair protocol.",
    )
    ap.add_argument(
        "--lib-exclude-from",
        default="auto",
        metavar="PATHS",
        help="rotation for --lib (r13 verdict item 7): exclude rows "
        "already measured by prior lib sweeps so coverage ACCUMULATES "
        "instead of re-measuring the same top-10 every round. 'auto' "
        "(default) globs SCALE_SWEEP_LIB_*.json at the repo root; "
        "'none' disables; otherwise a comma-separated list of sweep "
        "JSON files. When every lib row has been measured, the "
        "exclusion resets and the sweep starts a second pass.",
    )
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--min-cpu-s", type=float, default=0.2)
    ap.add_argument("--out", default=None, help="write the JSON record here too")
    ap.add_argument(
        "--isolate",
        action="store_true",
        help="run EACH query pair in its own fresh JVM (subprocess) — "
        "slow but immune to in-session degradation; use to adjudicate "
        "queries the shared-session sweep flagged (a 50-query session "
        "accumulates GC/broadcast state that inflated late queries up "
        "to 8x in the r12 sweep)",
    )
    args = ap.parse_args()

    if args.lib and args.queries:
        # ADVICE r13: --lib used to silently overwrite an explicit
        # --queries subset (and still cold-rank every lib row first);
        # rejected HERE, before a Spark session spins up
        raise SystemExit(
            "--lib ranks and selects its own row set; pass --queries "
            "WITHOUT --lib to sweep an explicit subset"
        )

    if args.isolate:
        import subprocess

        names = (args.queries or "").split(",") if args.queries else None
        if not names:
            raise SystemExit("--isolate needs --queries (the flagged set)")
        rows = []
        for name in names:
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--queries", name, "--small", args.small, "--big", args.big,
                "--factor", str(args.factor), "--repeat", str(args.repeat),
                "--min-cpu-s", str(args.min_cpu_s),
            ]
            out = subprocess.run(cmd, capture_output=True, text=True)
            last = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if not last:
                raise SystemExit(f"{name}: no JSON line\n{out.stderr[-2000:]}")
            rows.extend(json.loads(last[-1])["rows"])
        record = {
            "metric": "scale_sweep_exponents_isolated",
            "factor": args.factor,
            "n_queries": len(rows),
            "rows": rows,
        }
        print(json.dumps(record), flush=True)
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(record, fh, indent=1)
        return 0

    import __spark_entry__ as entry
    from bench import TaskTimeProbe

    from imitation_learning_data_pipeline_spark.session import get_spark

    qs = dict(entry.queries())
    names = args.queries.split(",") if args.queries else sorted(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        # explicitly-named queries may be cap-parked library rows —
        # resolve them from the full registry (the default full-sweep
        # scope stays the 50-query contract)
        from imitation_learning_data_pipeline_spark.plans import QUERIES

        for n in list(missing):
            if n in QUERIES:
                qs[n] = QUERIES[n]
                missing.remove(n)
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # Calibration: a KNOWN-linear plan (md5 over the spread documents
    # table) measured at both dirs. CPU-time exponents carry a
    # systematic UP-bias on this box: the small-SF run schedules fewer
    # concurrent tasks (spread() sizes partitions to input bytes), and
    # per-row CPU of string/regex work inflates with concurrency
    # (memory-bandwidth contention — measured up to 8x at 32 vs 3
    # tasks). The calibration exponent makes that bias visible; the
    # superlinear flag triggers only ABOVE it.
    def _calibration(sf_dir: str):
        from pyspark.sql import functions as F

        from imitation_learning_data_pipeline_spark.sources.readers import (
            load_table,
            spread,
        )

        return spread(load_table(spark, sf_dir, "documents")).select(
            F.md5(F.encode(F.col("text"), "UTF-8")).alias("h")
        )

    # retainedStages must outlast the whole sweep: the TaskTimeProbe
    # sums over RETAINED stages, so the default 1000-stage eviction
    # makes before/after deltas go NEGATIVE once long multi-job queries
    # (pagerank iterations, funnels) roll the window mid-measure.
    spark = get_spark(
        "scale-sweep",
        extra_conf={
            "spark.ui.retainedStages": "1000000",
            "spark.ui.retainedJobs": "1000000",
        },
    )
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

    if args.lib:
        from imitation_learning_data_pipeline_spark.plans import QUERIES

        lib_names = sorted(n for n in QUERIES if n not in entry.queries())
        measured: set[str] = set()
        if args.lib_exclude_from != "none":
            import glob as _glob

            repo_root = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
            explicit = args.lib_exclude_from != "auto"
            paths = (
                sorted(_glob.glob(
                    os.path.join(repo_root, "SCALE_SWEEP_LIB_*.json")
                ))
                if not explicit
                # ADVICE r14: resolve relative names against the repo
                # root (where the sweep artifacts live), and FAIL on an
                # unreadable explicit path — a typo that silently
                # disabled the rotation made the sweep re-measure
                # already-covered rows
                else [
                    p if os.path.isabs(p) else os.path.join(repo_root, p)
                    for p in args.lib_exclude_from.split(",")
                    if p.strip()
                ]
            )
            for pth in paths:
                try:
                    rec = json.load(open(pth))
                except (OSError, ValueError) as e:
                    if explicit:
                        raise SystemExit(
                            f"--lib-exclude-from: cannot read {pth}: {e}"
                        )
                    continue
                measured |= {
                    r["query"] for r in rec.get("rows", []) if "query" in r
                }
            fresh = [n for n in lib_names if n not in measured]
            if fresh:
                print(
                    f"# lib rotation: {len(measured & set(lib_names))} "
                    f"rows already measured by {len(paths)} prior "
                    f"sweep(s) excluded; ranking the {len(fresh)} "
                    "unmeasured",
                    flush=True,
                )
                lib_names = fresh
            else:
                print(
                    "# lib rotation: every library row measured at least "
                    "once — exclusion reset, starting a second pass",
                    flush=True,
                )
        print(
            f"# ranking {len(lib_names)} library rows by one cold "
            f"task-CPU run at {args.small}",
            flush=True,
        )
        costs = []
        for n in lib_names:
            m0 = probe.total_ms()
            QUERIES[n](spark, args.small).write.format("noop").mode(
                "overwrite"
            ).save()
            cpu = (probe.total_ms() - m0) / 1000.0
            spark.catalog.clearCache()
            costs.append((cpu, n))
            print(f"#   {n}: {cpu:.2f}s", flush=True)
        costs.sort(reverse=True)
        names = [n for _c, n in costs[: args.lib]]
        qs = dict(QUERIES)
        print(f"# top-{args.lib} lib rows: {', '.join(names)}", flush=True)

    cal_small = measure(lambda s, d: _calibration(d), args.small)
    cal_big = measure(lambda s, d: _calibration(d), args.big)
    cal_exp = math.log(max(cal_big, 1e-3) / max(cal_small, 1e-3)) / math.log(
        args.factor
    )
    print(
        f"# calibration (known-linear md5 scan): {cal_small:.2f}s -> "
        f"{cal_big:.2f}s  exp {cal_exp:+.2f}",
        flush=True,
    )
    flag_at = max(1.0, cal_exp) + 0.1

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
    over = [r for r in rows if r["exponent"] > flag_at and not r["tiny"]]
    record = {
        "metric": (
            "scale_sweep_exponents_lib" if args.lib else "scale_sweep_exponents"
        ),
        "factor": args.factor,
        "n_queries": len(rows),
        "calibration_exponent": round(cal_exp, 2),
        "flag_threshold": round(flag_at, 2),
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
