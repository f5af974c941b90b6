#!/usr/bin/env python3
"""Synthesize an ADVERSARIAL variant of a scale-factor directory.

Usage: python3 tools/make_adversarial.py <srcSfDir> <outDir>

Copies every fixture table and APPENDS crafted rows to the three
content-bearing tables (documents / embeddings / events). The point is
to make the repo's recurring review finding — "parity is green on the
driver fixtures but X would bite on adversarial data" — executable:
run `graft.Verify <outDir>` + `tools/check_parity.py <outDir>` and the
166-query cross-engine gate now covers the corners the driver corpus
(ASCII text, post-2024 timestamps, no exact ties) never reaches.

Additive-only by design: every Verify non-vacuity guard is a
"something exists" assertion, so appending rows can never re-vacuate a
gate, and all new ids sit far above the fixture id ranges.

Adversarial axes (each row is a named probe):
  documents  — one-to-many case mappings (U+0130, ß), NFC-vs-NFD byte
               divergence, CJK mixed with ASCII, empty / 1-token /
               whitespace-run texts (empty-token splits), quote /
               backslash / percent metacharacters through generated
               SQL, \\b word-boundary traps, exact + near duplicates of
               EXISTING docs (cross-range dedup tie-breaks), degenerate
               repetition, a 400-char single token, astral emoji
               (UTF-8 4-byte / UTF-16 surrogate pairs).
  embeddings — exact duplicate of an existing vector, its negation
               (cosine −1), a twice-duplicated new vector (all
               distances tie EXACTLY → id tie-breaks decide),
               axis-aligned one-hot vectors (zero products), all under
               the documented near-unit-norm contract.
  events     — exact (user, ts) ties differing only by event_id,
               .000000/.999999 microsecond boundaries, a pre-2024 row
               (q147's anchor guard), midnight day-boundary rows,
               value 0.0 and an extreme value, JSON-metachar props.
"""
import shutil
import sys
import unicodedata
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def append_rows(src: Path, out: Path, rows: dict):
    t = pq.read_table(src)
    extra = pa.table(rows).cast(pa.schema([f.remove_metadata() for f in t.schema]))
    merged = pa.concat_tables([t.cast(extra.schema), extra])
    pq.write_table(merged, out)
    return len(t), len(merged)


def adversarial_documents(src: Path, out: Path):
    base = pq.read_table(src)
    texts = base.column("text").to_pylist()
    dup_src = texts[7]            # exact cross-range duplicate
    near = texts[11].split(" ")
    near[len(near) // 2] = "adversarial"
    probes = [
        # one-to-many case mappings: lower('İ') expands, upper('ß') -> 'SS'
        "İstanbul İ file ß STRASSE groß İİ",
        # NFC vs NFD: same rendering, different bytes — engines must agree per byte
        unicodedata.normalize("NFC", "café résumé naïve"),
        unicodedata.normalize("NFD", "café résumé naïve"),
        # CJK mixed with the corpus vocabulary
        "深度学习 spark 训练 join 数据 去重 hash 分区",
        # tokenization edges: empty text, 1 token, whitespace runs
        "",
        "x",
        "  leading and trailing  ",
        "a  b   c    d",
        # SQL / regex metacharacters through every generated-SQL path
        "it's a \"test\" with 100% _like_ and \\ backslash '' quotes",
        # \b word-boundary trap (q161: 'customers' must NOT match \bcustomer\b)
        "customers customering customer. customer, customer",
        # phrase-search alignment multiples + conjunctive-only decoy
        "hash join hash join hash join",
        "join something hash elsewhere join hash",
        # degenerate repetition (max-run / Gopher metrics saturation)
        "spam " * 59 + "spam",
        # one 400-char token (shingle windows, winnowing, token counting)
        "q" * 400,
        # astral-plane emoji: UTF-16 surrogate pairs vs UTF-8 4-byte
        "🚀 data 🚀🚀 pipeline 🧪",
        # exact duplicate + near duplicate of EXISTING fixture docs
        dup_src,
        " ".join(near),
        # --- round-12 encoding-screen probes (q179) ---
        # U+FFFD: what a strict decoder leaves behind for truncated /
        # invalid UTF-8 (raw invalid bytes can't ride VARCHAR — DuckDB
        # rejects the parquet — so the REPLACEMENT residue is planted)
        "truncated tail looks like � and a lone �� pair",
        # latin-1 double-encode: 'café résumé' utf-8 bytes read as latin-1
        "café résumé naïve".encode("utf-8").decode("latin-1"),
        # CP-1252 double-encode: smart quote / em dash artifacts (â€™ â€”).
        # NOTE ” (U+201D) avoided: its middle byte 0x9D is UNMAPPED in
        # cp1252 — a real decoder errors there instead of emitting mojibake.
        "it’s a test — with ‘smart’ quotes".encode("utf-8").decode("cp1252"),
        # the classic &nbsp; artifact: U+00A0 double-encoded to 'Â '
        "spaced out text".encode("utf-8").decode("latin-1"),
        # 4-byte (astral) double-encode: emoji read back as latin-1
        "rocket 🚀 launch".encode("utf-8").decode("latin-1"),
        # FALSE-POSITIVE guard: legitimate text full of accented LATIN
        # LEAD-RANGE chars followed by ASCII — must NOT fire moji counts
        "Ã la carte Ãberration Ã propos",
        # --- round-12 HTML-extraction probes (q178) ---
        # raw markup INSIDE document text: the <p> wrapping must survive
        # a text that itself contains tags, an unterminated <, and bare &
        "text with <b>inline bold</b> and <em>emphasis</em> markers",
        "unterminated < bracket and bare & ampersand stay literal",
        "a fake </p><script>alert(1)</script><p> injection inside text",
        # pre-encoded entities in text: decode must not double-fire
        "already encoded &amp;lt; stays as literal &lt; after one decode",
        # the entity-site trigger phrase in hostile positions
        " data  data data  data ",
    ]
    # Seeded random soup: 40 docs over a mixed-script alphabet with
    # uppercase (ASCII and non-ASCII), digits, punctuation, whitespace
    # runs — the probabilistic sweep behind the named probes above.
    import random
    rnd = random.Random(1729)
    soup_alphabet = (
        "abcdefghij ABCDEFGHIJ 0123456789 "
        "àéîõüßÀÉÎÕÜ İı 中文漢字 -'\".,%_\\ ")
    for _ in range(40):
        n = rnd.randint(0, 120)
        probes.append("".join(rnd.choice(soup_alphabet) for _ in range(n)))
    rows = {
        "doc_id": [9000 + i for i in range(len(probes))],
        "text": probes,
        "lang": [["en", "de", "fr", "zh", "es"][i % 5] for i in range(len(probes))],
        "source": [f"src{i % 20}" for i in range(len(probes))],
        "n_chars": [len(t) for t in probes],
    }
    # NULL probes: a failed extraction (NULL text + NULL n_chars) and an
    # unlabeled document (NULL lang). These pin the catalog's null
    # contract — corpus statistics run over readable/labeled rows, and
    # per-row operators coalesce null text to the empty-content value.
    rows["doc_id"] += [9900, 9901]
    rows["text"] += [None, "unlabeled but readable text"]
    rows["lang"] += ["en", None]
    rows["source"] += ["src0", "src1"]
    rows["n_chars"] += [None, 27]
    return append_rows(src, out, rows)


def adversarial_embeddings(src: Path, out: Path):
    base = pq.read_table(src)
    v7 = base.column("embedding").to_pylist()[7]
    dim = len(v7)
    import struct
    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]
    onehot0 = [1.0] + [0.0] * (dim - 1)
    onehot1 = [0.0, 1.0] + [0.0] * (dim - 2)
    tie = [f32((1.0 / dim) ** 0.5)] * dim  # duplicated twice below
    vecs = [
        v7,                        # exact duplicate of an existing vector
        [f32(-x) for x in v7],     # its negation: cosine exactly -1
        tie, tie,                  # identical pair: every distance ties, id breaks
        onehot0, onehot1,          # axis-aligned: zero products dominate
    ]
    rows = {
        "vec_id": [9000 + i for i in range(len(vecs))],
        "embedding": vecs,
        "label": [i % 3 for i in range(len(vecs))],
    }
    return append_rows(src, out, rows)


def adversarial_events(src: Path, out: Path):
    from datetime import datetime
    ts = [
        datetime(2024, 6, 1, 12, 0, 0, 0),        # exact (user, ts) tie pair —
        datetime(2024, 6, 1, 12, 0, 0, 0),        #   only event_id differs
        datetime(2024, 6, 1, 12, 0, 0, 999999),   # µs boundary .999999
        datetime(2024, 6, 2, 0, 0, 0, 0),         # midnight day boundary
        datetime(2023, 12, 31, 23, 59, 59, 0),    # pre-2024: q147 anchor guard
        datetime(2024, 6, 3, 8, 30, 15, 1),       # .000001
    ]
    rows = {
        "event_id": [90000 + i for i in range(len(ts))],
        "ts": ts,
        "user_id": [3, 3, 3, 7, 7, 12],
        "event_type": ["view", "click", "view", "purchase", "view", "error"],
        "value": [0.0, 1.0, 2.5, 99999.99, 1.0, -1.0],
        "props": ['{"k":"v\'s \\"q\\""}', "{}", '{"emoji":"🚀"}', "{}", "{}", "{}"],
    }
    # NULL value/props probe (a dropped payload)
    rows["event_id"].append(90006)
    rows["ts"].append(datetime(2024, 7, 1, 1, 2, 3))
    rows["user_id"].append(5)
    rows["event_type"].append("view")
    rows["value"].append(None)
    rows["props"].append(None)
    # NULL EVENT-TIME probe (round 10): a row whose ts is NULL — the
    # watermark-operator fuzz axis at the batch/oracle layer. Every
    # ts-deriving query must treat it identically on both engines
    # (filters drop it via NULL comparison; LEAD/LAG window ORDER BY
    # over a NULL ts is the Spark-NULLS-FIRST vs DuckDB-NULLS-LAST
    # trap this probe exists to catch).
    rows["event_id"].append(90007)
    rows["ts"].append(None)
    rows["user_id"].append(3)
    rows["event_type"].append("view")
    rows["value"].append(1.0)
    rows["props"].append("{}")
    # EXTREME-LATE probe: an event years behind the rest of its user's
    # timeline (the streaming late-data axis, batch-visible as a huge
    # negative inter-arrival that must not wrap any day/gap arithmetic)
    rows["event_id"].append(90008)
    rows["ts"].append(datetime(2019, 1, 1, 0, 0, 1, 0))
    rows["user_id"].append(3)
    rows["event_type"].append("click")
    rows["value"].append(2.0)
    rows["props"].append("{}")
    return append_rows(src, out, rows)


def adversarial_customer(src: Path, out: Path):
    rows = {
        "c_custkey": [9000, 9001, 9002],
        # apostrophe / unicode names through the dim/get-or-create and
        # join paths; never template-interpolated into oracle SQL, but
        # they must survive parquet->engine->hash identically
        "c_name": ["O'Brien & Co \"North\"", "Müller Straße GmbH", "顧客 株式会社"],
        "c_nationkey": [0, 1, 2],
        # .005 at the cent boundary: double->decimal rounding-tie bait
        "c_acctbal": [0.005, -0.005, 9999.995],
        "c_mktsegment": ["MACHINERY", "BUILDING", "FURNITURE"],
    }
    return append_rows(src, out, rows)


def adversarial_supplier(src: Path, out: Path):
    rows = {
        "s_suppkey": [9000, 9001],
        "s_name": ["Supplier#00000000ß", "O'Hare Supply 中文"],
        "s_nationkey": [0, 1],
        "s_acctbal": [0.005, -1.115],
    }
    return append_rows(src, out, rows)


def adversarial_part(src: Path, out: Path):
    rows = {
        "p_partkey": [9000, 9001, 9002],
        # last-token "widget" joins the q158 blocking universe at small
        # edit distances; the unicode variant exercises cross-engine
        # code-point (not byte) Levenshtein
        "p_name": ["cold widgett", "çold widget", "it's widget"],
        "p_brand": ["Brand#13", "Brand#5", "Brand#13"],
        "p_type": ["ECONOMY", "ECONOMY", "ECONOMY"],
        "p_size": [1, 50, 7],
        "p_retailprice": [0.005, 1234.565, 99.995],
    }
    return append_rows(src, out, rows)


def adversarial_orders(src: Path, out: Path):
    from datetime import datetime
    rows = {
        "o_orderkey": [9000, 9001, 9002],
        "o_custkey": [0, 149, 9000],  # existing edge keys + a new customer
        "o_orderstatus": ["O", "F", "P"],
        # cent-boundary ties again, plus a zero
        "o_totalprice": [12345.005, 0.0, 0.015],
        # fixture date range boundaries
        "o_orderdate": [datetime(1995, 1, 1), datetime(2001, 8, 1), datetime(1998, 2, 28)],
        "o_orderpriority": ["1-URGENT", "5-LOW", "3-MEDIUM"],
    }
    return append_rows(src, out, rows)


def adversarial_lineitem(src: Path, out: Path):
    from datetime import datetime
    rows = {
        "l_orderkey": [9000, 9000, 9001, 9002],
        "l_partkey": [0, 9000, 199, 9002],
        "l_suppkey": [0, 9000, 9, 9001],
        "l_linenumber": [1, 2, 1, 1],
        "l_quantity": [1.0, 50.0, 1.0, 7.0],
        # 4th-decimal .00005 ties bait the DECIMAL(18,4) cast recipe;
        # repeating-9 doubles bait shortest-repr formatting
        "l_extendedprice": [0.0001, 1234.56785, 9999.99999999, 0.005],
        "l_discount": [0.0, 0.1, 0.05, 0.1],
        "l_tax": [0.0, 0.08, 0.04, 0.08],
        "l_returnflag": ["N", "A", "R", "N"],
        "l_linestatus": ["O", "F", "F", "O"],
        "l_shipdate": [datetime(1995, 1, 2), datetime(2001, 11, 4),
                       datetime(1996, 12, 31), datetime(2000, 2, 29)],
    }
    return append_rows(src, out, rows)


def main():
    src_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    out_dir.mkdir(parents=True, exist_ok=True)
    special = {
        "documents": adversarial_documents,
        "embeddings": adversarial_embeddings,
        "events": adversarial_events,
        "customer": adversarial_customer,
        "supplier": adversarial_supplier,
        "part": adversarial_part,
        "orders": adversarial_orders,
        "lineitem": adversarial_lineitem,
    }
    for t in TABLES:
        src, out = src_dir / f"{t}.parquet", out_dir / f"{t}.parquet"
        if t in special:
            n0, n1 = special[t](src, out)
        else:
            shutil.copyfile(src, out)
            n0 = n1 = "-"
        print(f"{t}: {n0} -> {n1}")


if __name__ == "__main__":
    main()
