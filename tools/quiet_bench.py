"""Quiet-host benchmark artifact (VERDICT r6 #4).

Every round the driver's BENCH_r{N}.json shows 2-4 phantom regressions
that SCALE.md then explains away with an unrecorded quiet rerun. This
tool makes the quiet rerun an auditable artifact: it refuses to start
while the host is busy (1-minute load average above the threshold),
runs ``bench.py`` at min-of-5 reps, and writes
``BENCH_QUIET_r{NN}.json`` containing the bench payload plus the load
readings that qualify it.

Usage:  python tools/quiet_bench.py 7            # writes BENCH_QUIET_r07.json
        python tools/quiet_bench.py 7 --max-wait 900 --load-limit 2.0
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_quiet(limit: float, max_wait: float) -> list[float] | None:
    """Block until the 1-min load average drops to ``limit`` (poll every
    15s); None if it never does within ``max_wait``."""
    deadline = time.time() + max_wait
    while True:
        load = os.getloadavg()
        if load[0] <= limit:
            return list(load)
        if time.time() >= deadline:
            return None
        print(f"# load {load[0]:.2f} > {limit} — waiting", file=sys.stderr)
        time.sleep(15)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int, help="round number (artifact suffix)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--load-limit", type=float, default=2.0)
    ap.add_argument("--max-wait", type=float, default=600.0,
                    help="seconds to wait for the host to go quiet")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    load_before = wait_for_quiet(args.load_limit, args.max_wait)
    if load_before is None:
        print(f"REFUSED: 1-min load stayed above {args.load_limit} for "
              f"{args.max_wait:.0f}s — not recording a contended number",
              file=sys.stderr)
        return 1

    env = dict(os.environ,
               SPARK_GRAFT_BENCH_REPS=str(args.reps),
               SPARK_GRAFT_SF_DIR=args.sf_dir)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True)
    wall = round(time.time() - t0, 1)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"bench.py failed (rc {proc.returncode})", file=sys.stderr)
        return proc.returncode
    if not proc.stdout.strip():
        print("bench.py exited 0 but produced no stdout; cannot parse a "
              "payload line", file=sys.stderr)
        return 1
    payload = json.loads(proc.stdout.strip().splitlines()[-1])

    out = {
        "round": args.round,
        "methodology": f"min-of-{args.reps} per query after warmup, "
                       f"started only once 1-min load <= {args.load_limit}",
        "loadavg_before": load_before,
        "loadavg_after": list(os.getloadavg()),
        "wall_clock_sec": wall,
        **payload,
    }
    path = os.path.join(REPO, f"BENCH_QUIET_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"written": path, "value": payload["value"],
                      "value_r4_comparable": payload.get(
                          "value_r4_comparable")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
