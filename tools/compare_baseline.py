#!/usr/bin/env python3
"""Grade a BENCH_r{N}.json (or a raw Bench stdout JSON line) against
BASELINE.md's per-query ledger.

Usage: python3 tools/compare_baseline.py BENCH_r07.json [--threshold=2.0]

Prints per-query ratio vs baseline (sorted worst-first), the total, and
a summary of lines over the threshold. Queries absent from the ledger
(added after round 5) are listed separately. Exit code 0 always — this
is a report, not a gate; the known-weak carve-outs in BASELINE.md need
human judgment.
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_baseline():
    text = (REPO / "BASELINE.md").read_text()
    base = {}
    # Ledger rows look like: | q01 | 1.158 | | q35 | 0.463 | | q69 | 0.214 |
    for m in re.finditer(r"\|\s*(q\d+)\s*\|\s*([0-9.]+)\s*", text):
        base[m.group(1)] = float(m.group(2))
    return base


def load_segments():
    """Per-segment ledger calibration (BASELINE.md LEDGER_SEGMENTS line):
    [(from_q, to_q, calib_md5)] — the iron constant of the machine that
    produced each table segment, so ratios can be normalized by
    segment_calib / run_calib and the 2x bar means the same thing on
    every segment (mirrors Bench.parseLedgerSegments)."""
    text = (REPO / "BASELINE.md").read_text()
    i = text.find("LEDGER_SEGMENTS:")
    if i < 0:
        return []
    line = text[i:].split("\n", 1)[0]
    return [(int(m.group(1)), int(m.group(2)), float(m.group(3)))
            for m in re.finditer(
                r'\{\s*"from"\s*:\s*(\d+)\s*,\s*"to"\s*:\s*(\d+)\s*,'
                r'\s*"calib_md5"\s*:\s*([0-9.]+)\s*\}', line)]


def segment_calib(segments, q):
    try:
        n = int(q[1:])
    except ValueError:
        return None
    for lo, hi, c in segments:
        if lo <= n <= hi:
            return c
    return None


def load_bench(path):
    """Accept any of: the round-9 two-line Bench stdout (queries_full line
    + compact total line — merged so the full per-query map rides with the
    total/calib), a single-line pre-r9 record, or the driver's wrapper
    ({"parsed": {...}} — whose `queries` holds only the 20 slowest, so a
    sibling queries_full line, if present, replaces it)."""
    text = Path(path).read_text()
    try:
        # driver-wrapper records (BENCH_r{N}.json) are ONE pretty-printed doc
        docs = [json.loads(text)]
    except json.JSONDecodeError:
        docs = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
    full, total = None, None
    for d in docs:
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        if d.get("metric") == "queries_full":
            full = d
        elif "queries" in d or "value" in d:
            total = d
    if total is None:
        raise SystemExit(f"{path}: no bench record found in {len(docs)} JSON line(s)")
    if full is not None:
        total = {**total, "queries": full["queries"]}
    elif len(total.get("queries", {})) <= 20 and total.get("n_queries", 0) > 20:
        # Round-10 records drop the queries_full stdout line entirely
        # (it was what overran the driver's tail window); the full map
        # lives in bench_detail.json beside the record. Reconstruct the
        # short-name -> min map from it when present.
        detail = Path(path).parent / total.get("detail", "bench_detail.json")
        if detail.exists():
            d = json.loads(detail.read_text())
            qmin = {name.split("_")[0]: v["min"]
                    for name, v in d.get("queries", {}).items()
                    if isinstance(v, dict) and v.get("min", -1) >= 0}
            if len(qmin) >= total.get("n_queries", 0) - total.get("n_failed", 0):
                total = {**total, "queries": qmin}
        if len(total.get("queries", {})) <= 20 and total.get("n_queries", 0) > 20:
            print(f"WARNING: {path} carries only the {len(total['queries'])} slowest "
                  f"queries of {total['n_queries']} — no queries_full line or "
                  "bench_detail.json found; ratios below cover that subset only.\n")
    return total


def compare_runs(cur_path, prev_path, threshold):
    """Round-over-round diff of two Bench JSONs, calibration-normalized:
    ratio = (sec / calib) / (prev_sec / prev_calib). This is how
    post-ledger queries (no BASELINE.md row) get a like-for-like
    comparison across containers of different speed."""
    cur, prev = load_bench(cur_path), load_bench(prev_path)
    ccal = float(cur.get("calib_md5") or 1.0)
    pcal = float(prev.get("calib_md5") or 1.0)
    print(f"current:  {cur_path}  total={cur.get('value')}s calib={ccal}")
    print(f"previous: {prev_path}  total={prev.get('value')}s calib={pcal}")
    print(f"machine factor (cur/prev): {ccal / pcal:.2f}x — ratios below are normalized\n")
    rows = []
    for q, sec in cur["queries"].items():
        p = prev["queries"].get(q)
        if p is None or p < 0 or sec < 0:
            continue
        rows.append(((sec / ccal) / (p / pcal), q, sec, p))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > threshold]
    print(f"{len(over)} / {len(rows)} common queries over {threshold}x (normalized):")
    for ratio, q, sec, p in over:
        print(f"  {q:6s} {sec:8.3f}s vs {p:8.3f}s = {ratio:5.2f}x")
    if rows:
        tot_c = sum(r[2] for r in rows)
        tot_p = sum(r[3] for r in rows)
        print(f"\ncommon total: {tot_c:.1f}s vs {tot_p:.1f}s "
              f"= {tot_c / tot_p:.2f}x raw, {(tot_c / ccal) / (tot_p / pcal):.2f}x normalized")
    only_c = sorted(set(cur["queries"]) - set(prev["queries"]))
    if only_c:
        print(f"\nnew since previous: {', '.join(only_c)}")


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r07.json"
    threshold = 2.0
    prev_path = None
    for a in sys.argv[2:]:
        if a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])
        elif a.startswith("--prev="):
            prev_path = a.split("=", 1)[1]
    if prev_path:
        compare_runs(bench_path, prev_path, threshold)
        return
    base = load_baseline()
    segments = load_segments()
    bench = load_bench(bench_path)
    queries = bench["queries"]
    run_calib = float(bench.get("calib_md5") or 0) or None

    def norm_factor(q):
        c = segment_calib(segments, q)
        return (c / run_calib) if (c and run_calib and run_calib > 0) else 1.0

    rows, new = [], []
    for q, sec in queries.items():
        if sec < 0:
            rows.append((float("inf"), q, sec, base.get(q)))
        elif q in base:
            # calibration-normalized: the statistic the retry protocol keys on
            rows.append((sec * norm_factor(q) / base[q], q, sec, base[q]))
        else:
            new.append((q, sec))

    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > threshold]
    print(f"bench: {bench_path}  total={bench.get('value')}s  "
          f"calib_md5={bench.get('calib_md5', 'n/a')}  stat={bench.get('stat', 'median')}")
    print(f"baseline total: {sum(base.values()):.1f}s over {len(base)} queries")
    if segments and run_calib:
        facs = sorted({round(norm_factor(q), 3) for _, q, _, b in rows if b})
        print(f"ratios are CALIB-NORMALIZED (x segment_calib/run_calib; factors {facs})")
    print(f"\n{len(over)} / {len(rows)} ledger queries over {threshold}x baseline (normalized):")
    for ratio, q, sec, b in over:
        bs = f"{b:6.3f}s" if b is not None else "  (not in ledger)"
        rs = f"{ratio:5.1f}x" if ratio != float("inf") else " FAILED"
        print(f"  {q:6s} {sec:8.3f}s vs {bs}  = {rs}")
    ok = [r for r in rows if r[0] <= threshold]
    if ok:
        worst_ok = max(ok)
        print(f"\nwithin threshold: {len(ok)} (worst {worst_ok[1]} at {worst_ok[0]:.2f}x)")
    if new:
        print("\nnot in ledger (post-r5 queries):")
        for q, sec in sorted(new):
            print(f"  {q:6s} {sec:8.3f}s")
    # Failed queries (sec == -1) are EXCLUDED from both sides of the
    # ledger-common ratio — a -1 sentinel would otherwise *reduce* the
    # measured total and flatter the speedup. They are reported loudly
    # above instead.
    common_total = sum(sec for _, q, sec, b in rows if b and sec >= 0)
    base_total = sum(b for _, q, sec, b in rows if b and sec >= 0)
    if base_total:
        print(f"\nledger-common total: {common_total:.1f}s vs {base_total:.1f}s "
              f"= {common_total / base_total:.2f}x")


if __name__ == "__main__":
    main()
