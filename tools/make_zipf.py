#!/usr/bin/env python3
"""Zipf-vocabulary document fixture (dev tool, driver-side python).

The driver fixture's ~30-word vocabulary makes EVERY token common, so
prefix filtering degenerates to near-all-pairs (measured 12.5 M
candidates at sf0.1) — it cannot demonstrate the selectivity the
AllPairs/PPJoin family exists for. This generator writes a
documents.parquet with a realistic Zipf-shaped vocabulary (default
10^4 words, exponent ~1.07) and PLANTED NEAR-TWINS (every 20th doc is
a ~5% token-replacement copy of its predecessor, so the exact
similarity join has true positives to find), for
`graft.SimJoinProbe` to measure candidates-vs-all-pairs on.

Deterministic under --seed. Schema matches the driver fixture
(doc_id, text, lang, source, n_chars) so Tables.documents reads it.

Usage: python3 tools/make_zipf.py <outDir> [--docs=5000] [--vocab=10000] [--seed=11]
"""
import os
import random
import sys

import pandas as pd


def main():
    out = None
    n_docs, n_vocab, seed = 5000, 10000, 11
    for a in sys.argv[1:]:
        if a.startswith("--docs="):
            n_docs = int(a.split("=", 1)[1])
        elif a.startswith("--vocab="):
            n_vocab = int(a.split("=", 1)[1])
        elif a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        else:
            out = a
    if out is None:
        sys.exit("usage: make_zipf.py <outDir> [--docs=N] [--vocab=V] [--seed=S]")
    rnd = random.Random(seed)
    # word-like vocab: syllable soup, rank-indexed so ids are stable
    syl = ["ka", "to", "ri", "ne", "su", "mo", "ba", "le", "di", "wu", "fa", "zo"]
    vocab = []
    seen = set()
    i = 0
    while len(vocab) < n_vocab:
        w = "".join(rnd.choice(syl) for _ in range(2 + (i % 3))) + str(i % 7)
        if w not in seen:
            seen.add(w)
            vocab.append(w)
        i += 1
    weights = [1.0 / (r + 1) ** 1.07 for r in range(n_vocab)]
    rows = []
    prev_tokens = None
    for d in range(n_docs):
        if d % 20 == 19 and prev_tokens:
            # planted near-twin: ~5% of positions re-drawn
            toks = list(prev_tokens)
            for j in range(len(toks)):
                if rnd.random() < 0.05:
                    toks[j] = rnd.choices(vocab, weights=weights, k=1)[0]
        else:
            n = rnd.randint(60, 180)
            toks = rnd.choices(vocab, weights=weights, k=n)
        prev_tokens = toks
        text = " ".join(toks)
        rows.append(
            (d, text, rnd.choice(["en", "de", "es", "fr"]), f"src{d % 5}", len(text))
        )
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    os.makedirs(out, exist_ok=True)
    df.to_parquet(os.path.join(out, "documents.parquet"), index=False)
    print(f"wrote {n_docs} docs, vocab {n_vocab}, to {out}/documents.parquet")


if __name__ == "__main__":
    main()
