#!/usr/bin/env python3
"""Train the checked-in linear quality-classifier fixture (dev tool,
driver-side python) — the DCLM/fastText-style learned-filter stage:
logistic regression over hashed word-bigram bucket counts (the q111
DSIR feature space: h32(bigram) % buckets), predicting the target
slice (lang = 'en' on the fixture corpus).

The ENGINE runs inference only (TextAnalysis.linearClassifierScore);
this trainer exists so the weights are reproducible from the corpus.
Determinism contract: features come from DuckDB with the exact q111
bucket SQL, docs iterate in doc_id order, plain full-batch gradient
descent with a fixed epoch count and learning rate — no RNG anywhere.
Weights quantize to integer micro-units (x 1e6) so the engine-side
score is exact integer arithmetic both engines reproduce bit-for-bit.

Usage: python3 tools/make_classifier.py [sfDir] [--buckets=N] [--epochs=N]
Defaults: /root/testdata/sf0.01, 1024, 400
Output: src/main/resources/graft/quality_classifier.txt
  line 1: "bias<TAB><int>"; then one "<bucket><TAB><int>" per bucket.

--int mode (the q177 cross-implementation artifact): the EXACT-INTEGER
fixed-point trainer the engine's ClassifierTrainer reproduces
bit-for-bit — hard-sigmoid full-batch GD where every quantity is an
integer and every division is a floor division, so Spark, DuckDB, and
this python agree on every weight after every epoch. The bias rides as
bucket -1 with constant feature 10^6, making each epoch one uniform
gradient aggregate. Output: quality_classifier_int.txt with one
"<bucket><TAB><int>" line per bucket from -1 (bias) to B-1.
"""
import math
import sys

import duckdb


def train_int(feats, labels, buckets, epochs, lr_micro):
    """Exact-integer hard-sigmoid GD — the q177 contract.

    feats: {doc_id: [(bucket, x_ppm)]} INCLUDING the (-1, 10^6) bias
    feature per doc; labels: {doc_id: 0|1}. Returns {bucket: w_micro}.
    All arithmetic is integer; all divisions are python // (floor) —
    mirrored by (a - pmod(a, m)) div m on the Spark side and
    (a - ((a % m + m) % m)) // m in the DuckDB oracle.
    """
    ids = sorted(feats)
    n = len(ids)
    n_pos = sum(1 for i in ids if labels[i] == 1)
    n_neg = n - n_pos
    assert n_pos > 0 and n_neg > 0, "degenerate label split"
    cw = {1: (n * 10**6) // (2 * n_pos), 0: (n * 10**6) // (2 * n_neg)}
    w = {b: 0 for b in range(-1, buckets)}
    for _ in range(epochs):
        g = {b: 0 for b in range(-1, buckets)}
        for i in ids:
            dot = sum(w[b] * x for b, x in feats[i])  # micro * ppm = 1e-12 units
            p4 = min(max(2 * 10**12 + dot, 0), 4 * 10**12)  # 4e12 * hard_sigmoid
            e1 = (p4 - 4 * 10**12 * labels[i]) // 10**6
            e2 = (e1 * cw[labels[i]]) // 10**6
            for b, x in feats[i]:
                g[b] += e2 * x
        for b in range(-1, buckets):
            w[b] -= (lr_micro * g[b]) // (n * 4 * 10**12)
    return w


def main():
    sf_dir = "/root/testdata/sf0.01"
    buckets, epochs, lr = 1024, 400, 0.8
    int_mode = False
    out = "src/main/resources/graft/quality_classifier.txt"
    for a in sys.argv[1:]:
        if a.startswith("--buckets="):
            buckets = int(a.split("=", 1)[1])
        elif a.startswith("--epochs="):
            epochs = int(a.split("=", 1)[1])
        elif a == "--int":
            int_mode = True
            out = "src/main/resources/graft/quality_classifier_int.txt"
            epochs = 48
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        else:
            sf_dir = a
    con = duckdb.connect()
    # Distillation target = the q26 marker-heuristic verdict
    # "predicted language is en" (PipelineQueries.q26Sql's CASE) — the
    # FineWeb-Edu / DCLM pattern of distilling an expensive labeler
    # into a cheap hashed linear filter. The fixture's lang COLUMN is
    # assigned independently of the text (unlearnable by construction);
    # the marker verdict is text-derived, hence learnable.
    mk = {
        "en": ("the", "a", "and", "of", "to", "is"),
        "es": ("el", "la", "de", "y", "que", "es"),
        "de": ("der", "die", "das", "und", "ist", "ein"),
        "fr": ("le", "la", "et", "les", "des", "est"),
    }
    def hits(l):
        return ("len(list_filter(ws, t -> t IN ("
                + ", ".join(f"'{w}'" for w in mk[l]) + ")))")
    rows = con.execute(
        f"""WITH w AS (SELECT doc_id, text, string_split(text,' ') AS ws
                      FROM read_parquet(?) WHERE text IS NOT NULL),
           lab AS (SELECT doc_id, ws,
                     (len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) = 0
                      AND NOT ({hits("de")} >= {hits("en")} AND {hits("de")} >= {hits("es")}
                               AND {hits("de")} >= {hits("fr")})
                      AND {hits("en")} >= {hits("es")} AND {hits("en")} >= {hits("fr")}) AS tgt
                   FROM w),
           g AS (SELECT doc_id, tgt,
                        unnest([ws[i]||' '||ws[i+1] for i in range(1, CAST(len(ws) AS BIGINT))]) AS bigram
                 FROM lab)
           SELECT doc_id, tgt,
                  CAST('0x' || substr(md5(bigram),1,8) AS BIGINT) % ? AS bucket,
                  COUNT(*) AS n
           FROM g GROUP BY 1, 2, 3 ORDER BY doc_id, bucket""",
        [f"{sf_dir}/documents.parquet", buckets],
    ).fetchall()
    docs = {}
    labels = {}
    for doc_id, tgt, bucket, n in rows:
        docs.setdefault(doc_id, []).append((int(bucket), float(n)))
        labels[doc_id] = 1.0 if tgt else 0.0
    ids = sorted(docs)

    if int_mode:
        feats_i = {}
        labels_i = {}
        for i in ids:
            total = sum(int(c) for _, c in docs[i])
            feats_i[i] = [(-1, 10**6)] + [
                (b, (int(c) * 10**6) // total) for b, c in docs[i]]
            labels_i[i] = 1 if labels[i] > 0.5 else 0
        w = train_int(feats_i, labels_i, buckets, epochs, lr_micro=800000)
        tp = sum(1 for i in ids if labels_i[i] == 1
                 and sum(w[b] * x for b, x in feats_i[i]) > 0)
        n_posi = sum(1 for i in ids if labels_i[i] == 1)
        tn = sum(1 for i in ids if labels_i[i] == 0
                 and sum(w[b] * x for b, x in feats_i[i]) <= 0)
        n_negi = len(ids) - n_posi
        with open(out, "w", encoding="utf-8") as f:
            for b in range(-1, buckets):
                f.write(f"{b}\t{w[b]}\n")
        nz = sum(1 for b in range(-1, buckets) if w[b] != 0)
        print(f"[int] wrote {buckets}+bias weights ({nz} nonzero) to {out}; "
              f"epochs {epochs}; tp {tp}/{n_posi} tn {tn}/{n_negi} "
              f"balanced acc {(tp / n_posi + tn / n_negi) / 2:.3f}")
        return
    # normalize counts per doc (fastText-style mean of bucket embeddings
    # degenerates to count/len for a linear model)
    feats = {i: [(b, c / sum(c2 for _, c2 in docs[i])) for b, c in docs[i]] for i in ids}
    w = [0.0] * buckets
    bias = 0.0
    # Class-balanced loss: the marker-verdict target runs ~9:1
    # positive on the fixture corpus, and an unweighted fit collapses
    # to the constant-true classifier (a vacuous verdict the q174
    # anti-vacuity guard rejects). Weighting each class by the inverse
    # prevalence makes the decision boundary sit at the BALANCED prior,
    # so the kept/dropped split is informative.
    n_pos = sum(1 for i in ids if labels[i] > 0.5)
    n_neg = len(ids) - n_pos
    cw = {1.0: len(ids) / (2.0 * n_pos), 0.0: len(ids) / (2.0 * n_neg)}
    n_docs = float(len(ids))
    for _ in range(epochs):
        gw = [0.0] * buckets
        gb = 0.0
        for i in ids:
            z = bias + sum(w[b] * x for b, x in feats[i])
            p = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
            err = (p - labels[i]) * cw[labels[i]]
            gb += err
            for b, x in feats[i]:
                gw[b] += err * x
        bias -= lr * gb / n_docs
        for b in range(buckets):
            w[b] -= lr * (gw[b] / n_docs + 1e-4 * w[b])
    # report balanced training diagnostics
    tp = sum(1 for i in ids if labels[i] > 0.5
             and bias + sum(w[b] * x for b, x in feats[i]) > 0)
    tn = sum(1 for i in ids if labels[i] < 0.5
             and bias + sum(w[b] * x for b, x in feats[i]) <= 0)
    with open(out, "w", encoding="utf-8") as f:
        f.write(f"bias\t{round(bias * 1e6)}\n")
        for b in range(buckets):
            f.write(f"{b}\t{round(w[b] * 1e6)}\n")
    nz = sum(1 for x in w if round(x * 1e6) != 0)
    print(f"wrote {buckets} weights ({nz} nonzero) + bias to {out}; "
          f"tp {tp}/{n_pos} tn {tn}/{n_neg} "
          f"balanced acc {(tp / n_pos + tn / n_neg) / 2:.3f}")


if __name__ == "__main__":
    main()
