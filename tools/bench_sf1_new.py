"""Per-gate sf0.1-vs-sf1 supplemental timing for late-round gates.

Protocol (BENCH_SF1_r09 methodology): per gate per SF, a FRESH process
runs one warmup rep + 2 timed reps and reports the min — long-session
persist/checkpoint pressure must not contaminate the measurement.

    python tools/bench_sf1_new.py GATE [GATE ...]         # orchestrator
    python tools/bench_sf1_new.py --one GATE SF_DIR       # single measure
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_one(gate: str, sf_dir: str) -> None:
    import time

    from iceberg_demo_spark import registry
    from iceberg_demo_spark.session import get_spark

    registry.load_all()
    spark = get_spark("sf1-supplement")
    from iceberg_demo_spark.cache import release_pins

    fn = registry.QUERIES[gate]
    fn(spark, sf_dir).collect()  # warmup
    release_pins()
    best, rows = None, 0
    for _ in range(2):
        t0 = time.monotonic()
        rows = len(fn(spark, sf_dir).collect())
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
        release_pins()  # outside the timed span
    print(json.dumps({"secs": round(best, 3), "rows": rows}))


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__.strip())
    if sys.argv[1] == "--one":
        measure_one(sys.argv[2], sys.argv[3])
        return
    from iceberg_demo_spark.scratch import scratch_path

    sf1 = scratch_path("glacier_sf1")
    out = {}
    for gate in sys.argv[1:]:
        entry = {}
        for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 gate, d],
                capture_output=True, text=True, check=True)
            entry[label] = json.loads(r.stdout.strip().splitlines()[-1])
        entry["ratio"] = round(entry["sf1"]["secs"]
                               / max(entry["sf0.1"]["secs"], 1e-9), 2)
        out[gate] = entry
        print(gate, json.dumps(entry), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
