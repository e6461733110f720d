#!/usr/bin/env python
"""Per-entry ratio table between two bench artifacts.

Compares the ``queries`` maps of two bench JSON files (either the
driver's BENCH_r{N}.json singles or the committed BENCH_MEDIANS_r{N}
medians) and prints one line per entry: old, new, new/old ratio —
sorted by ratio descending so regressions lead. Entries present in
only one file are listed separately (new coverage / retired entries),
never silently dropped. Both artifacts' loadavg (and any ``degraded``
stamp from bench.py's load gate) print above the table, because the
recurring adjudication question is "is this uniform drift host load?"
— the answer starts with the two runs' load conditions side by side.

Ratios divide by max(old, 1e-3) — one rounding quantum, since bench
timings are rounded to 3 decimals a sub-millisecond entry is exactly
0.0 — and the TOTAL line is skipped when the shared set is empty
(different-format files), both per the r11 advice.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]
Exit code 1 when any shared entry's ratio exceeds the threshold, so
the round close-out can gate on it.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    def artifact(path: str) -> dict:
        d = json.load(open(path))
        if "parsed" in d:  # driver BENCH_r{N}.json wraps the bench line
            d = d["parsed"]
        return d

    old_art, new_art = artifact(args.old), artifact(args.new)
    old, new = old_art["queries"], new_art["queries"]

    for label, art, path in (("old", old_art, args.old), ("new", new_art, args.new)):
        load = art.get("loadavg")
        deg = " DEGRADED(load-gated)" if art.get("degraded") else ""
        print(f"{label}: {path}  loadavg={load}{deg}")

    def ratio(n: str) -> float:
        return new[n] / max(old[n], 1e-3)

    shared = sorted(set(old) & set(new), key=ratio, reverse=True)

    flagged = []
    print(f"{'entry':<34} {'old_s':>8} {'new_s':>8} {'ratio':>6}")
    for n in shared:
        r = ratio(n)
        mark = " <-- " + f">{args.threshold}x" if r > args.threshold else ""
        if r > args.threshold:
            flagged.append(n)
        print(f"{n:<34} {old[n]:>8.3f} {new[n]:>8.3f} {r:>6.2f}{mark}")
    if shared:
        tot_old = sum(old[n] for n in shared)
        tot_new = sum(new[n] for n in shared)
        print(f"{'TOTAL (shared ' + str(len(shared)) + ')':<34} "
              f"{tot_old:>8.1f} {tot_new:>8.1f} {tot_new / max(tot_old, 1e-3):>6.2f}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("retired:", ", ".join(only_old))
    if only_new:
        print("new coverage:", ", ".join(f"{n} ({new[n]:.3f}s)" for n in only_new))
    raise SystemExit(1 if flagged else 0)


if __name__ == "__main__":
    main()
