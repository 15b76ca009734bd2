"""Compare BENCH_DETAIL.json per-query timings against a previous round's
record and flag regressions > FACTOR (VERDICT round-1 item 9: the prior
bench is the baseline; regressions need a plan-diff note in PLANS.md).

The round-1 record (BENCH_r01.json) only survives as the driver's
truncated 2000-char tail, so prior timings are recovered from the
"tail" string with a regex.

Usage: python tools/bench_compare.py [PREV_JSON] [FACTOR]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def prev_timings(path: Path) -> dict[str, float]:
    raw = json.loads(path.read_text())
    if isinstance(raw, dict) and isinstance(raw.get("parsed"), dict):
        return dict(raw["parsed"].get("queries", {}))
    # a raw BENCH_DETAIL.json from a prior round (git show <sha>:BENCH_DETAIL.json)
    if isinstance(raw, dict) and isinstance(raw.get("queries"), dict):
        return dict(raw["queries"])
    text = raw.get("tail", "") if isinstance(raw, dict) else ""
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', text)
        if m.group(1) not in ("sf", "value", "n")
    }


def main() -> None:
    prev_path = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "BENCH_r01.json"
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    cur = json.loads((ROOT / "BENCH_DETAIL.json").read_text())["queries"]
    prev = prev_timings(prev_path)
    shared = sorted(set(cur) & set(prev))
    flagged = []
    for name in shared:
        if prev[name] > 0 and cur[name] / prev[name] > factor:
            flagged.append((name, prev[name], cur[name], cur[name] / prev[name]))
    print(f"{len(shared)} shared queries; {len(flagged)} regress > {factor}x")
    for name, p, c, r in sorted(flagged, key=lambda t: -t[3]):
        print(f"  {name}: {p:.3f}s -> {c:.3f}s ({r:.1f}x)")
    if not flagged:
        print("  (none)")


if __name__ == "__main__":
    main()
