#!/usr/bin/env python
"""Supplementary measurement harness (guide §1) — NOT part of the driver
contract.  `bench.py` is frozen for measurement; this file exists so the
optimization loop can time individual battery queries, capture
`.explain("formatted")` plans, and isolate computation with the noop sink
without touching the frozen harness.

Usage:
  python bench_extra.py [--repeat N] [--noop] [--explain DIR] [--json OUT] \
        [query ...]

With no query names, times every registered query (same sorted order and
same `.count()` action as bench.py's run_queries, same session config).
`--noop` swaps the action for `df.write.format("noop")` so every column is
computed (guide §1.4).  `--explain DIR` writes `<query>.txt` plan dumps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CPUS, SF_DIR, build  # noqa: E402  (frozen harness, reused)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, metavar="DIR")
    ap.add_argument("--json", default=None, metavar="OUT")
    args = ap.parse_args()

    spark = build(CPUS)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.names or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        if args.explain:
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for _ in range(max(args.repeat, 1)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"{name}: {samples}", flush=True)

    result = {
        "sf": SF_DIR,
        "cpus": CPUS,
        "action": "noop" if args.noop else "count",
        "samples": out,
        "total_first_run_sec": round(sum(v[0] for v in out.values()), 2),
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in result.items() if k != "samples"}))


if __name__ == "__main__":
    main()
