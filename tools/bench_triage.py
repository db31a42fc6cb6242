"""Round-over-round bench triage (VERDICT r7 item 7).

Automates the manual >25% + 0.3 s protocol from BASELINE.md: compare
the per-query times of two driver bench records (default: the two
newest BENCH_r{N}.json in the repo root), annotate each regression with
the median/spread from BENCH_DETAIL.json (the committed median-of-3
record), and emit the watch list the verdict reads.

A delta is FLAGGED when new > old * 1.25 AND new - old > 0.3 s (the
repo's documented noise band). A flagged delta is downgraded to
"within spread" when it is smaller than the query's measured
median-of-3 spread — that is the documented host-variance case and
needs no interleaved A/B; everything else is the actual watch list.

Usage:
    python tools/bench_triage.py                # newest two rounds
    python tools/bench_triage.py 6 7            # explicit rounds
    python tools/bench_triage.py --json         # machine-readable

Exit code: 0 always (a triage reports; the human decides).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FACTOR = 1.25  # >25%
ABS_FLOOR = 0.3  # +0.3 s


def _load_round(n: int) -> dict[str, float]:
    path = os.path.join(REPO, f"BENCH_r{n:02d}.json")
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed") or rec
    return dict(parsed.get("queries", {})), parsed.get("value")


def _latest_rounds() -> tuple[int, int]:
    ns = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    )
    if len(ns) < 2:
        raise SystemExit("need at least two BENCH_r{N}.json records")
    return ns[-2], ns[-1]


def triage(old_n: int, new_n: int) -> dict:
    old_q, old_total = _load_round(old_n)
    new_q, new_total = _load_round(new_n)
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = {}
    if os.path.exists(detail_path):
        with open(detail_path) as f:
            detail = json.load(f).get("detail", {})

    shared = sorted(set(old_q) & set(new_q))
    watch, variance = [], []
    for name in shared:
        o, n = old_q[name], new_q[name]
        delta = n - o
        if n > o * FACTOR and delta > ABS_FLOOR:
            d = detail.get(name, {})
            spread = d.get("spread")
            entry = {
                "query": name,
                f"r{old_n}": o,
                f"r{new_n}": n,
                "delta": round(delta, 3),
                "median3": d.get("median"),
                "spread": spread,
            }
            # the committed BENCH_DETAIL only describes the round it was
            # recorded at — spread-downgrade only applies when it covers
            # the delta on the NEW side
            if spread is not None and delta <= spread:
                entry["verdict"] = "within measured spread"
                variance.append(entry)
            else:
                entry["verdict"] = "TRIAGE: interleaved quiet-box A/B"
                watch.append(entry)
    return {
        "old_round": old_n,
        "new_round": new_n,
        "old_total": old_total,
        "new_total": new_total,
        "shared_queries": len(shared),
        "watch": watch,
        "within_spread": variance,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_json = "--json" in sys.argv
    if len(args) == 2:
        old_n, new_n = int(args[0]), int(args[1])
    else:
        old_n, new_n = _latest_rounds()
    rep = triage(old_n, new_n)
    if as_json:
        print(json.dumps(rep, indent=2))
        return
    print(
        f"bench triage r{old_n} -> r{new_n}: totals "
        f"{rep['old_total']} -> {rep['new_total']} s over "
        f"{rep['shared_queries']} shared queries"
    )
    for bucket, rows in [("WATCH", rep["watch"]), ("within-spread", rep["within_spread"])]:
        print(f"\n{bucket} ({len(rows)}):")
        for e in rows:
            print(
                f"  {e['query']:36s} {e[f'r{old_n}']:6.2f} -> {e[f'r{new_n}']:6.2f} "
                f"(+{e['delta']:.2f})  median3={e['median3']} spread={e['spread']}  {e['verdict']}"
            )
    if not rep["watch"]:
        print("\nno deltas outside the noise band need triage")


if __name__ == "__main__":
    main()
