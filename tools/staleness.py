"""Emit the staleness-ordered driver-window priority list.

The grading driver records correctness rows for only the first ~50
entries of the suite registry, and regenerates the parquet testdata
between rounds — so a row earned in an old round may have been earned on
a previous data generation. This tool reads every ``CORRECTNESS_r*.json``
in the repo root, classifies each registered query by the most recent
round that recorded it, and prints the priority ordering the registry
should use next round: never-recorded first, then oldest-round rows,
then the freshest. A query absent from the registry (renamed/merged
away) is reported so stale history isn't mistaken for live coverage.

Usage: python tools/staleness.py [--window N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_python_spark.suite import ALL_QUERIES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> dict[str, list[tuple[int, bool]]]:
    """name -> [(round, passed)], ascending by round."""
    hist: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            hist.setdefault(name, []).append((rnd, ok))
    return hist


def main() -> None:
    window = 50
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    hist = load_history()
    latest_pass: dict[str, int] = {}
    for name, rounds in hist.items():
        passes = [r for r, ok in rounds if ok]
        if passes:
            latest_pass[name] = max(passes)

    names = list(ALL_QUERIES)
    # staleness key: never-recorded first (-inf), then ascending round of
    # the latest green row; ties keep current registry order.
    ordered = sorted(
        range(len(names)), key=lambda i: (latest_pass.get(names[i], -1), i)
    )
    print(f"# registry: {len(names)} queries; window: first {window}")
    for pos, i in enumerate(ordered):
        name = names[i]
        tag = (
            "NEVER"
            if name not in latest_pass
            else f"r{latest_pass[name]:02d}"
        )
        marker = "*" if pos < window else " "
        print(f"{marker} {pos + 1:3d}  {tag:5s}  {name}")

    ghosts = sorted(set(hist) - set(names))
    if ghosts:
        print(f"\n# rows for queries no longer registered (renamed/merged): ")
        for g in ghosts:
            print(f"    {g} (last r{max(r for r, _ in hist[g]):02d})")
    stale = [n for n in names if n not in latest_pass]
    print(f"\n# never-recorded: {len(stale)}; outside-window stale: "
          f"{sum(1 for pos, i in enumerate(ordered) if pos >= window and latest_pass.get(names[i], -1) < max(latest_pass.values(), default=0))}")


if __name__ == "__main__":
    main()
