"""Quiet-host benchmark artifact (VERDICT r6 #4).

Every round the driver's BENCH_r{N}.json shows 2-4 phantom regressions
that SCALE.md then explains away with an unrecorded quiet rerun. This
tool makes the quiet rerun an auditable artifact: it refuses to start
while the host is busy (1-minute load average above the threshold),
runs ``bench.py`` at min-of-5 reps, and writes
``BENCH_QUIET_r{NN}.json`` containing the bench payload plus the load
readings that qualify it.

Round 10 (VERDICT r9 #7 — institutionalize the r9 drift adjudication):
three UNTOUCHED r2-era relational queries run as CANARIES immediately
before and after the main bench, in their own fresh processes. The
artifact records both canary totals and ``canary_ratio``
(after/before): a ratio far from 1.0 means the host drifted DURING the
window and the main numbers inherit that error bar; comparing one
round's canary total against another's calibrates ROUND-over-round
host drift without a 37-query control run.

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

#: canaries: r2-era relational gates whose implementation has not
#: changed since round 2 — pure host-drift thermometers
CANARIES = ["flagship_revenue_by_region", "q1_pricing_summary",
            "q6_forecast_revenue"]


def run_canaries(env: dict, reps: int = 3) -> dict | None:
    """One fresh bench.py process restricted to the canary queries;
    returns its payload (or None on failure — recorded, not fatal)."""
    cenv = dict(env, SPARK_GRAFT_BENCH_ONLY=",".join(CANARIES),
                SPARK_GRAFT_BENCH_REPS=str(reps))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=cenv, capture_output=True, text=True)
    if proc.returncode != 0 or not proc.stdout.strip():
        sys.stderr.write(proc.stderr)
        return None
    return json.loads(proc.stdout.strip().splitlines()[-1])


def cross_round_normalization(repo: str, current_round: int,
                              payload: dict, canary_total: float | None,
                              ) -> dict:
    """Round-over-round adjudication as NUMBERS in the artifact
    (VERDICT r10 #3 — previously prose in SCALE.md): find the latest
    earlier BENCH_QUIET_r{NN}.json with canary totals, compute the
    cross-round canary ratio (pure host drift — the canaries' code has
    not changed since round 2), and emit the shared-query subtotal both
    raw and normalized by that drift. A normalized ratio near 1.0 means
    the engine is flat; the raw ratio alone conflates code and host."""
    import glob as _glob
    import re as _re

    prev, prev_round = None, None
    for path in sorted(_glob.glob(os.path.join(repo,
                                               "BENCH_QUIET_r*.json"))):
        m = _re.search(r"_r(\d+)\.json$", path)
        if m is None:  # diagnostic variants, e.g. _r09_control37.json
            continue
        rnd = int(m.group(1))
        if rnd >= current_round:
            continue
        data = json.load(open(path))
        if data.get("canary_before_total") or data.get(
                "canary_after_total"):
            if prev_round is None or rnd > prev_round:
                prev, prev_round = data, rnd
    if prev is None or not canary_total:
        return {"canary_prev_round": None}
    prev_totals = [t for t in (prev.get("canary_before_total"),
                               prev.get("canary_after_total")) if t]
    prev_canary = sum(prev_totals) / len(prev_totals)
    ratio = round(canary_total / prev_canary, 3) if prev_canary else None
    shared = sorted(set(payload.get("queries", {}))
                    & set(prev.get("queries", {})))
    this_sub = round(sum(payload["queries"][q] for q in shared), 3)
    prev_sub = round(sum(prev["queries"][q] for q in shared), 3)
    raw = round(this_sub / prev_sub, 3) if prev_sub else None
    return {
        "canary_prev_round": prev_round,
        "canary_prev_total": round(prev_canary, 3),
        "canary_cross_round_ratio": ratio,
        "shared_query_count": len(shared),
        "shared_subtotal_sec": this_sub,
        "shared_subtotal_prev_sec": prev_sub,
        "shared_ratio_raw": raw,
        "shared_ratio_normalized": (round(raw / ratio, 3)
                                    if raw and ratio else None),
    }


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
    canary_before = run_canaries(env)
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
    canary_after = run_canaries(env)
    canary_ratio = None
    if canary_before and canary_after and canary_before["value"] > 0:
        canary_ratio = round(canary_after["value"]
                             / canary_before["value"], 3)
    canary_totals = [d["value"] for d in (canary_before, canary_after)
                     if d and d.get("value")]
    canary_total = (sum(canary_totals) / len(canary_totals)
                    if canary_totals else None)
    norm = cross_round_normalization(REPO, args.round, payload,
                                     canary_total)

    out = {
        "round": args.round,
        "methodology": f"min-of-{args.reps} per query after warmup, "
                       f"started only once 1-min load <= {args.load_limit}",
        "loadavg_before": load_before,
        "loadavg_after": list(os.getloadavg()),
        "wall_clock_sec": wall,
        "canaries": CANARIES,
        "canary_before": (canary_before or {}).get("queries"),
        "canary_before_total": (canary_before or {}).get("value"),
        "canary_after": (canary_after or {}).get("queries"),
        "canary_after_total": (canary_after or {}).get("value"),
        "canary_ratio": canary_ratio,
        **norm,
        **payload,
    }
    path = os.path.join(REPO, f"BENCH_QUIET_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"written": path, "value": payload["value"],
                      "canary_ratio": canary_ratio,
                      "value_r4_comparable": payload.get(
                          "value_r4_comparable")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
