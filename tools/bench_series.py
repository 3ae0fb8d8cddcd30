"""Probe-normalized round-over-round bench series (VERDICT r6 item 8).

Joins every BENCH_r0*.json in the repo root into one table so
round-over-round claims stop re-litigating host-tenancy noise: each
round's per-query medians are shown raw and normalized by the
in-artifact host probe (median of pre/post µs-per-pair vs the ~3.7
idle reference).  Artifacts only — no re-runs.

Usage: python tools/bench_series.py [--markdown]
"""

from __future__ import annotations

import glob
import json
import os
import sys

IDLE_PROBE_US = 3.7  # documented idle-host reference (bench.py)


def load_rounds(root: str) -> list[tuple[str, dict]]:
    out = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r0*.json"))):
        try:
            raw = json.load(open(p))
        except Exception:
            continue
        parsed = raw.get("parsed") or raw
        if not isinstance(parsed, dict) or "queries" not in parsed:
            continue
        out.append((os.path.basename(p)[len("BENCH_"):-len(".json")], parsed))
    return out


def probe_factor(parsed: dict) -> float | None:
    pre = parsed.get("host_probe_us_pre")
    post = parsed.get("host_probe_us_post")
    vals = [v for v in (pre, post) if isinstance(v, (int, float))]
    if not vals:
        return None
    probe = sorted(vals)[len(vals) // 2] if len(vals) == 1 else sum(vals) / len(vals)
    return IDLE_PROBE_US / probe


def main() -> int:
    rounds = load_rounds(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if not rounds:
        print("no BENCH_r0*.json artifacts found")
        return 1
    queries = []
    for _, parsed in rounds:
        for q in parsed["queries"]:
            if q not in queries:
                queries.append(q)
    md = "--markdown" in sys.argv
    sep = " | " if md else "  "
    hdr = ["query"] + [f"{name}@sf{parsed.get('sf', '?')}"
                       for name, parsed in rounds]
    lines = []
    if md:
        lines.append("| " + " | ".join(hdr) + " |")
        lines.append("|" + "---|" * len(hdr))
    else:
        lines.append(sep.join(f"{h:>22s}" if i else f"{h:24s}"
                              for i, h in enumerate(hdr)))
    rows = [("total", [(p.get("value"), probe_factor(p))
                       for _, p in rounds])]
    for q in queries:
        rows.append((q, [(p["queries"].get(q), probe_factor(p))
                         for _, p in rounds]))
    for q, cells in rows:
        vals = []
        for raw, f in cells:
            if raw is None:
                vals.append("-")
            elif f is None:
                vals.append(f"{raw:.3f}")
            else:
                vals.append(f"{raw:.3f} (~{raw * f:.3f})")
        if md:
            lines.append("| " + " | ".join([q] + vals) + " |")
        else:
            lines.append(sep.join([f"{q:24s}"] + [f"{v:>22s}" for v in vals]))
    print("\n".join(lines))
    print("\nraw seconds (probe-normalized seconds = raw * 3.7/probe_us);"
          "\nnormalization only meaningful where the round recorded the"
          " in-artifact host probe (r6+), and across EQUAL sf values.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
