#!/usr/bin/env python3
"""Synthesize a ~10x sf0.1-shaped dataset for the second decade of the
scaling curve (SURVEY §6.1): documents and embeddings tile 10x under
per-tile structure-preserving transforms; every other table copies
through unchanged.

Construction (why it is the right 10x shape):
 - documents: each non-zero tile applies one random PERMUTATION of the
   corpus vocabulary to every doc (tile 0 is verbatim). A permutation
   is a bijection on words, so every intra-tile Jaccard/containment/
   minhash relationship — exact dups included — is preserved EXACTLY
   at sf0.1's density, while cross-tile similarity collapses to the
   permutation's fixed-point rate (~1/|V|): near-dup candidate counts
   scale linearly with corpus size, as in a real 10x corpus, with no
   accidental cross-tile quadratic blowup. Word-shingle vocabulary
   grows ~10x (sequences permute), so shingle df stays tile-local —
   the realistic regime for the PPJoin cost probe.
 - embeddings: each non-zero tile applies one random dimension
   permutation with independent sign flips — an orthogonal transform,
   so every intra-tile distance/cosine (and the label cluster
   geometry) is preserved exactly, while a vector and its cross-tile
   images are decorrelated (E[cos] ~ 0).

Seed fixed; output deterministic.
Usage: python3 tools/gen_scale10.py [outdir] [--dupclass=EXACT,NEAR]
       (default outdir /tmp/graft-sf1)
--dupclass=EXACT,NEAR plants the duplicate-class skew hazard the permutation
tiling deliberately does NOT grow: EXACT bit-identical copies of the
min-id document (ids 90_000_000+) and NEAR near-identical copies (one
unique trailing token each, pairwise J = n/(n+2); ids 95_000_000+) —
e.g. --dupclass=10000,1000 for the 10k/1k certificate corpus. Flat
wall time across --dupclass sizes is the measured evidence that
minhashComponents' collapse + bucket-star guards hold.
Driver-side tooling only (duckdb/pyarrow) - not part of the library.
"""
import os
import random
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = "/root/testdata/sf0.1"
OUT = ARGS[0] if ARGS else "/tmp/graft-sf1"
TILES = 10
SEED = 20260815
DUP_EXACT, DUP_NEAR = 0, 0
for a in sys.argv[1:]:
    if a.startswith("--dupclass="):
        DUP_EXACT, DUP_NEAR = (int(x) for x in
                               a.split("=", 1)[1].split(","))
    if a.startswith("--tiles="):
        # --tiles=100 builds the THIRD decade (same per-tile
        # structure-preserving transforms, more tiles)
        TILES = int(a.split("=", 1)[1])


def gen_documents(con):
    base = con.sql(
        f"select doc_id, text, lang, source, n_chars "
        f"from '{SRC}/documents.parquet' order by doc_id"
    ).fetchall()
    vocab = sorted({w for (_, t, _, _, _) in base if t
                    for w in t.split(" ") if w})
    n = len(base)
    rng = random.Random(SEED)
    out = {"doc_id": [], "text": [], "lang": [], "source": [],
           "n_chars": []}
    for tile in range(TILES):
        if tile == 0:
            wmap = None
        else:
            img = vocab[:]
            rng.shuffle(img)
            wmap = dict(zip(vocab, img))
        for (doc_id, text, lang, source, n_chars) in base:
            if wmap is None or text is None:
                t = text
            else:
                t = " ".join(wmap.get(w, w) for w in text.split(" "))
            out["doc_id"].append(tile * n + doc_id)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t) if t is not None else None)
    if DUP_EXACT or DUP_NEAR:
        seed_text = base[0][1]
        lang, source = base[0][2], base[0][3]
        for i in range(DUP_EXACT):
            out["doc_id"].append(90_000_000 + i)
            out["text"].append(seed_text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(seed_text))
        for i in range(DUP_NEAR):
            t = f"{seed_text} zzdup{i}"
            out["doc_id"].append(95_000_000 + i)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t))
    table = pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    })
    # realistic row groups: pyarrow's default writes the whole tiling as
    # ONE row group, which serializes every engine's scan of the file on
    # a single task (one column chunk = one decompression unit) — a
    # degenerate layout no real lake has. 8k-row groups make the
    # measurement corpus splittable the way a 100 TB corpus actually is
    # (r14 probe: the 100x documents scan cost 150 s on one task under
    # the single-row-group layout).
    pq.write_table(table, f"{OUT}/documents.parquet",
                   row_group_size=8192)
    return len(out["doc_id"])


def gen_embeddings(con):
    base = con.sql(
        f"select vec_id, embedding, label "
        f"from '{SRC}/embeddings.parquet' order by vec_id"
    ).fetchall()
    dims = next(len(e) for (_, e, _) in base if e is not None)
    n = len(base)
    rng = random.Random(SEED + 1)
    ids, vecs, labels = [], [], []
    for tile in range(TILES):
        if tile == 0:
            perm, sign = list(range(dims)), [1.0] * dims
        else:
            perm = list(range(dims))
            rng.shuffle(perm)
            sign = [1.0 if rng.random() < 0.5 else -1.0
                    for _ in range(dims)]
        for (vec_id, emb, label) in base:
            v = (None if emb is None
                 else [sign[i] * emb[perm[i]] for i in range(dims)])
            ids.append(tile * n + vec_id)
            vecs.append(v)
            labels.append(label)
    table = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(table, f"{OUT}/embeddings.parquet",
                   row_group_size=8192)
    return len(ids)


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    nd = gen_documents(con)
    ne = gen_embeddings(con)
    # all other tables pass through unchanged (the scaled keys only
    # touch documents/embeddings; copying keeps the dir Bench-complete)
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet") and f not in ("documents.parquet",
                                                "embeddings.parquet"):
            shutil.copyfile(f"{SRC}/{f}", f"{OUT}/{f}")
    dup = (f" dupclass={DUP_EXACT},{DUP_NEAR}"
           if DUP_EXACT or DUP_NEAR else "")
    print(f"wrote {OUT}: documents={nd} embeddings={ne} "
          f"(sf0.1 x {TILES} tiles, seed {SEED}{dup})")


if __name__ == "__main__":
    main()
