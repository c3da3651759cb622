#!/usr/bin/env python3
"""Scale-sweep fixture generator (driver-side tooling, like oracle_check).

Replicates the driver's sf0.1 fixtures K times with key shifts that
preserve referential integrity, so time-vs-rows slopes can be measured
beyond the largest driver-provided SF:

  python3 tools/scale_gen.py 5 /tmp/sfscale/x5   # ~sf0.5

Tables and key handling:
  region, nation                  copied as-is (fixed domains)
  customer  c_custkey             += copy * (max+1)
  orders    o_orderkey, o_custkey += copy * (max+1 of each)
  lineitem  l_orderkey, l_partkey, l_suppkey shifted to match
  part      p_partkey             shifted
  supplier  s_suppkey             shifted
  events    event_id, user_id     shifted (ts kept: same time span,
                                  K x the events per hour -- the correct
                                  shape for a throughput sweep)
  documents doc_id shifted; text Caesar-shifted by copy index (translate
                                  a..z -> alphabet rotated by c, digits
                                  0..9 rotated by c). Token lengths, word
                                  boundaries, and per-copy dup structure
                                  are preserved, but copies are DISJOINT
                                  in shingle space for any shingle that
                                  contains a letter or (for copies not
                                  congruent mod 10) a digit, so near-dup
                                  pairs scale linearly (K x within-copy),
                                  not quadratically (the artifact a plain
                                  K x text replication would create).
                                  Residual collision surface: shingles of
                                  ONLY punctuation, or only digits between
                                  copies c = c' (mod 10) -- negligible in
                                  the prose corpus. K <= 26 is ASSERTED:
                                  at K = 27 copy 26 would share ALL letter
                                  shingles with copy 0 (digits still differ
                                  unless c = c' mod 10), reintroducing the
                                  quadratic near-dup artifact. Relaxing the
                                  bound to lcm(26,10)=130 on the strength
                                  of the digit rotation would be wrong:
                                  letter-only shingles dominate prose.
                                  Vocab grows K x -- correct for BM25 /
                                  tf-idf / BPE-train slope measurement.
  embeddings vec_id shifted; vector circularly ROTATED by copy index
                                  (norms, component distribution, and
                                  within-copy cluster geometry preserved;
                                  cross-copy cosine ~ random), so
                                  cosine-dedup pair counts scale linearly
                                  and ANN corpus size scales K x.
                                  K <= dims ASSERTED (rotation by c % dims
                                  repeats at K = dims + 1).
"""
import os
import sys

import duckdb

K = int(sys.argv[1])
OUT = sys.argv[2]
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def copy_asis(name):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO "
                f"'{OUT}/{name}.parquet' (FORMAT PARQUET)")

def span(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

def replicate(name, shifts):
    """shifts: {col: span}; each copy c adds c*span to col."""
    base = con.execute(
        f"SELECT * FROM '{SRC}/{name}.parquet' LIMIT 0").df().columns
    parts = []
    for c in range(K):
        cols = [f"({col} + {c * int(shifts[col])}) AS {col}"
                if col in shifts else col for col in base]
        parts.append(f"SELECT {', '.join(cols)} FROM '{SRC}/{name}.parquet'")
    union = " UNION ALL ".join(parts)
    con.execute(f"COPY ({union}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")

copy_asis("region")
copy_asis("nation")

ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGIT = "0123456789"

def scale_documents():
    # K=27 would give copy 26 the same letter rotation as copy 0: every
    # letter shingle collides cross-copy (digits still differ unless
    # c = c' mod 10, but letter-only shingles dominate prose), silently
    # reintroducing the quadratic cross-copy dup-pair artifact
    assert K <= 26, f"documents: K={K} > 26 rotations -- copies would repeat"
    did = span("documents", "doc_id")
    parts = []
    for c in range(K):
        rot = ALPHA[c % 26:] + ALPHA[:c % 26]
        rotd = DIGIT[c % 10:] + DIGIT[:c % 10]
        src_map = ALPHA + ALPHA.upper() + DIGIT
        dst_map = rot + rot.upper() + rotd
        parts.append(
            f"SELECT doc_id + {c * int(did)} AS doc_id, "
            f"translate(text, '{src_map}', '{dst_map}') AS text, "
            f"lang, source, n_chars "
            f"FROM '{SRC}/documents.parquet'")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{OUT}/documents.parquet' (FORMAT PARQUET)")

def scale_embeddings():
    vid = span("embeddings", "vec_id")
    dims = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    assert K <= dims, f"embeddings: K={K} > dims={dims} -- rotations would repeat"
    parts = []
    for c in range(K):
        r = c % dims
        vec = ("embedding" if r == 0 else
               f"(embedding[{r + 1}:{dims}] || embedding[1:{r}])::FLOAT[]")
        parts.append(
            f"SELECT vec_id + {c * int(vid)} AS vec_id, {vec} AS embedding, "
            f"label FROM '{SRC}/embeddings.parquet'")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{OUT}/embeddings.parquet' (FORMAT PARQUET)")

scale_documents()
scale_embeddings()

cust = span("customer", "c_custkey")
orde = span("orders", "o_orderkey")
part = span("part", "p_partkey")
supp = span("supplier", "s_suppkey")
evid = span("events", "event_id")
usid = span("events", "user_id")

replicate("customer", {"c_custkey": cust})
replicate("orders", {"o_orderkey": orde, "o_custkey": cust})
replicate("lineitem", {"l_orderkey": orde, "l_partkey": part, "l_suppkey": supp})
replicate("part", {"p_partkey": part})
replicate("supplier", {"s_suppkey": supp})
replicate("events", {"event_id": evid, "user_id": usid})

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n}")
print(f"wrote K={K} replica of {SRC} to {OUT}")
