#!/usr/bin/env python3
"""Train the checked-in BPE merge fixture (dev tool, driver-side python).

Classic byte-pair-encoding training (Sennrich et al. 2016, the public
GPT-2-style merge-rank algorithm) over the fixture corpus's
whitespace-word frequencies, at CHARACTER alphabet (the engine's
documented contract — byte-level alphabets need a byte<->unicode
table that DuckDB can't replay cheaply; characters both engines
segment identically via code points).

Determinism contract (the Scala runtime + DuckDB oracle replay this
EXACTLY):
  - pair counting: every adjacent symbol pair, overlapping allowed,
    weighted by word frequency;
  - merge pick: highest count, ties broken (left ASC, right ASC);
  - merge apply: single left-to-right non-overlapping fold pass
    (after merging positions i,i+1 the cursor skips to i+2);
  - stop: after --merges merges or when no pair count >= 2.

Merges containing control chars (< 0x20) are skipped so the oracle's
chr(1) pair encoding can never collide.

--bytes mode (the production GPT-2 form, BpeTokens.scala byte kernel):
  - pre-tokenize via DuckDB's regexp_extract_all with the SAME
    RE2∩Java pattern the engine uses (BpeTokens.preTokenPattern), so
    the training universe is exactly the query-time pre-token universe;
  - base symbols are the pre-token's UTF-8 BYTES, each mapped to the
    single code point chr(256 + b) (the oracle rebuilds this from
    hex(encode(word))); merges are written in that mapped alphabet to
    bpe_merges_bytes.txt. Control-char constraint holds by
    construction (all symbols >= U+0100).

Usage: python3 tools/make_bpe.py [sfDir] [--merges=N] [--out=path] [--bytes]
Defaults: /root/testdata/sf0.01, 48, src/main/resources/graft/bpe_merges.txt
(--bytes defaults: 64 merges, src/main/resources/graft/bpe_merges_bytes.txt)
"""
import sys
from collections import Counter

import duckdb

# Keep in sync with BpeTokens.preTokenPattern (single authoritative copy
# in Scala; this is its python-string rendering).
PRE_TOKEN_PATTERN = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"
)


def fold_merge(syms, l, r):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def main():
    sf_dir = "/root/testdata/sf0.01"
    n_merges = None
    out = None
    byte_mode = False
    for a in sys.argv[1:]:
        if a.startswith("--merges="):
            n_merges = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a == "--bytes":
            byte_mode = True
        else:
            sf_dir = a
    if n_merges is None:
        n_merges = 64 if byte_mode else 48
    if out is None:
        out = (
            "src/main/resources/graft/bpe_merges_bytes.txt"
            if byte_mode
            else "src/main/resources/graft/bpe_merges.txt"
        )
    con = duckdb.connect()
    if byte_mode:
        rows = con.execute(
            "SELECT w, COUNT(*) AS n FROM ("
            "SELECT unnest(regexp_extract_all(text, ?)) AS w "
            f"FROM read_parquet('{sf_dir}/documents.parquet') WHERE text IS NOT NULL) "
            "WHERE len(w) > 0 GROUP BY 1 ORDER BY 1",
            [PRE_TOKEN_PATTERN],
        ).fetchall()
        words = {
            w: ([chr(0x100 + b) for b in w.encode("utf-8")], n) for w, n in rows
        }
    else:
        rows = con.execute(
            "SELECT w, COUNT(*) AS n FROM (SELECT unnest(string_split(text,' ')) AS w "
            f"FROM read_parquet('{sf_dir}/documents.parquet') WHERE text IS NOT NULL) "
            "WHERE len(w) > 0 GROUP BY 1 ORDER BY 1"
        ).fetchall()
        words = {w: (list(w), n) for w, n in rows}
    merges = []
    while len(merges) < n_merges:
        counts = Counter()
        for syms, n in words.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        legal = {
            p: c
            for p, c in counts.items()
            if c >= 2 and not any(ord(ch) < 0x20 for ch in p[0] + p[1])
        }
        if not legal:
            break
        best = min(legal.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        words = {w: (fold_merge(s, *best), n) for w, (s, n) in words.items()}
    with open(out, "w", encoding="utf-8") as f:
        for l, r in merges:
            f.write(f"{l}\t{r}\n")
    tok_sizes = Counter(len(s) for s, _ in words.values())
    print(f"wrote {len(merges)} merges to {out}")
    print("final word token-count histogram:", dict(sorted(tok_sizes.items())))
    for w, (s, _) in list(words.items())[:10]:
        print(f"  {w!r} -> {s}")


if __name__ == "__main__":
    main()
