#!/usr/bin/env python3
"""Regenerate BASELINE.md's extension ledger (q102+) from a Bench
bench_detail.json — the round-close flow (r14 precedent): one quiet-iron
min-of-N run at final HEAD becomes the extension table, three (query, sec)
pairs per row, plus a refreshed LEDGER_SEGMENTS entry for the regenerated
range carrying that run's calib_md5.

Usage: python3 tools/regen_ledger.py bench_detail.json [--from=102]

Prints the replacement table + segments line to stdout; does NOT patch
BASELINE.md (the surrounding prose differs per round — paste by hand or
with a round-specific edit).
"""
import json
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    lo = 102
    for a in sys.argv[2:]:
        if a.startswith("--from="):
            lo = int(a.split("=", 1)[1])
    d = json.loads(open(path).read())
    calib = d["config"]["calib_md5_3e6_sec"]
    rows = []
    for name, q in d["queries"].items():
        m = re.match(r"q(\d+)", name)
        if not m or int(m.group(1)) < lo:
            continue
        if q.get("min", -1) < 0:
            print(f"WARNING: {name} FAILED in this run — no line emitted", file=sys.stderr)
            continue
        rows.append((int(m.group(1)), f"q{m.group(1)}", q["min"]))
    rows.sort()
    hi = rows[-1][0] if rows else lo
    print(f'LEDGER_SEGMENTS entry: {{"from": {lo}, "to": {hi}, "calib_md5": {calib}}}')
    print(f"calib_md5 {calib} / calib_md5_mt {d['config'].get('calib_md5_mt_sec')} / "
          f"calib_sched {d['config'].get('calib_sched_pingpong_sec')}")
    print()
    print("| query | sec | query | sec | query | sec |")
    print("|---|---|---|---|---|---|")
    # column-major like the existing tables: q102 | q133 | q164
    n = len(rows)
    per = (n + 2) // 3
    for i in range(per):
        cells = []
        for c in range(3):
            j = i + c * per
            if j < n:
                cells.append(f"{rows[j][1]} | {rows[j][2]:.3f}")
            else:
                cells.append(" | ")
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
