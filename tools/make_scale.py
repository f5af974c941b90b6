#!/usr/bin/env python3
"""Synthesize an N-times-scaled copy of a driver sf directory for LOCAL
PERFORMANCE testing only (the correctness gates always run on the
driver-provisioned data).

Each table is unioned N times with id columns offset per replica so keys
stay unique and joins keep their selectivity; text/embedding payloads
repeat (fine for timing — the operators hash/scan them either way).
Multi-row-group output (row_group_size) so Spark can parallelize the
scan, unlike the single-row-group originals.

Usage: python3 tools/make_scale.py <srcSfDir> <destDir> <N> [--vocab-grow] [--tables=a,b]

--vocab-grow: append a per-replica PURE-LETTER suffix to every letter
run of documents.text, so DISTINCT pre-tokens grow ~N x instead of
repeating. --vocab-grow=doc appends a per-DOCUMENT letter-mapped
doc_id suffix instead (replica 0 verbatim), making the vocabulary grow
~linearly with the CORPUS -- the web regime where the word->tokens map
can never broadcast (the r12 `weak` finding's actual stress case). Plain replicas fix the BPE vocabulary by construction (the
text repeats), which leaves the budgeting family's real growth axis --
vocabulary -- untested (r12 verdict Next #2). Letters only: the GPT-2
pre-tokenizer keeps a letter-suffixed word one pre-token. Replica 0
stays verbatim, so the grown corpus CONTAINS the original vocabulary.

--tables=documents: restrict output to the named tables (the
vocab-growth runs only read documents; skipping the 100x lineitem
replica saves most of the build).
"""
import sys

import duckdb

OFFSETS = {
    "region":    [("r_regionkey", 100)],
    "nation":    [("n_nationkey", 100), ("n_regionkey", 100)],
    "customer":  [("c_custkey", 10_000_000), ("c_nationkey", 0)],
    "supplier":  [("s_suppkey", 10_000_000), ("s_nationkey", 0)],
    "part":      [("p_partkey", 10_000_000)],
    "orders":    [("o_orderkey", 100_000_000), ("o_custkey", 10_000_000)],
    "lineitem":  [("l_orderkey", 100_000_000), ("l_partkey", 10_000_000),
                  ("l_suppkey", 10_000_000)],
    "events":    [("event_id", 100_000_000), ("user_id", 10_000_000)],
    "documents": [("doc_id", 10_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
}


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    src, dest, n = pos[0], pos[1], int(pos[2])
    vocab_grow = any(fl.startswith("--vocab-grow") for fl in flags)
    vocab_doc = "--vocab-grow=doc" in flags
    only = None
    for fl in flags:
        if fl.startswith("--tables="):
            only = set(fl.split("=", 1)[1].split(","))
    con = duckdb.connect()
    import os
    os.makedirs(dest, exist_ok=True)

    # two base-26 letter positions bound the per-replica suffix space;
    # past it chr() would leak non-letters and the GPT-2 pre-tokenizer
    # would split the suffixed word (breaking the letters-only
    # invariant --vocab-grow documents). Plain and per-doc modes don't
    # use the replica suffix, so they stay unbounded.
    if vocab_grow and not vocab_doc:
        assert n <= 26 * 26 + 1, \
            f"--vocab-grow supports at most {26*26+1} replicas; got {n}"

    def suffix(i):
        # replica 1 -> "qaa", 2 -> "qab", ... pure letters, 'q' leading
        # so suffixed words rarely collide with real corpus words
        return "q" + chr(97 + (i - 1) // 26) + chr(97 + (i - 1) % 26)

    for table, offs in OFFSETS.items():
        if only is not None and table not in only:
            continue
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        offmap = dict(offs)
        selects = []
        for i in range(n):
            def colexpr(c):
                if c in offmap and offmap[c] > 0 and i > 0:
                    return f"{c} + {offmap[c] * i} AS {c}"
                if vocab_grow and table == "documents" and c == "text" and i > 0:
                    if vocab_doc:
                        # replacement is per-ROW: each doc's words get a
                        # unique letter-mapped id suffix. Use the
                        # REPLICA-OFFSET id (the bare column still names
                        # the source value in this projection), so
                        # replicas don't repeat suffixes.
                        off = offmap.get("doc_id", 0) * i
                        return ("regexp_replace(text, '([A-Za-z]+)', "
                                f"'\\1q' || translate(CAST(doc_id + {off} AS VARCHAR), "
                                "'0123456789', 'abcdefghij'), 'g') AS text")
                    return (f"regexp_replace(text, '([A-Za-z]+)', "
                            f"'\\1{suffix(i)}', 'g') AS text")
                return c
            proj = ", ".join(colexpr(c) for c in cols)
            selects.append(f"SELECT {proj} FROM '{path}'")
        q = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({q}) TO '{dest}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 50000)")
        rows = con.execute(f"SELECT COUNT(*) FROM '{dest}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {rows} rows")


if __name__ == "__main__":
    main()
