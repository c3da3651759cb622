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
                                  the prose corpus. Copies 0..25 use the
                                  Caesar rotation (existing fixtures stay
                                  byte-identical); copies >= 26 switch to
                                  a seeded random letter PERMUTATION (see
                                  letter_perm), so K is unbounded -- a
                                  plain rotation would repeat at K = 27
                                  and share ALL letter shingles with
                                  copy 0, reintroducing the quadratic
                                  near-dup artifact.
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

# --plant-media-pairs=N (VERDICT r18 #5): plant N perturbed copies of
# every media-audit probe doc (doc_id % 40 = 0, doc_id < 5000) as fresh
# docs above the replica id range, and write the (probe_id, planted_id)
# labels to planted_pairs.parquet. These are GENUINE near-dups (byte
# perturbations of copy-0 text: j=0 one tail char -- identical feature
# head, cosine exactly 1; j>=1 one head char at a per-j position -- one
# feature chunk moves, cosine ~0.999), NOT key-shifted replicas, so the
# audit recall floor measured on them has a panel of O(hundreds) honest
# pairs instead of the 23 the de-siblinged x20 truth set leaves.
PLANT = 0
_argv = []
for _a in sys.argv[1:]:
    if _a.startswith("--plant-media-pairs="):
        PLANT = int(_a.split("=", 1)[1])
    else:
        _argv.append(_a)

K = int(_argv[0])
OUT = _argv[1]
SRC = _argv[2] if len(_argv) > 2 else "/root/testdata/sf0.1"
# Optional 4th arg: comma-separated table subset to SCALE; every other
# table is copied through at x1 (ops-focused sweeps -- an x100 point for
# two document/embedding operators does not need a 60M-row lineitem, and
# the x1 passthrough keeps warmup lanes runnable at x1 cost).
ONLY = set(_argv[3].split(",")) if len(_argv) > 3 else None

def scaled(name):
    return ONLY is None or name in ONLY

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
    if not scaled(name):
        copy_asis(name)
        return
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

def letter_perm(c):
    """Per-copy letter substitution. Copies 0..25 keep the original Caesar
    rotation (existing x5/x20 fixtures stay byte-identical); copies >= 26
    use a deterministic seeded Fisher-Yates permutation of the alphabet
    (26! >> any K), so K is unbounded. Cross-copy shingle collisions need
    the two substitutions to agree on EVERY letter of the shingle --
    ~26^-k per k-distinct-letter shingle for independent permutations, so
    near-dup pairs still scale linearly (within-copy only) rather than
    quadratically. Rotations 0..25 are pairwise non-agreeing on every
    letter; a random permutation agreeing with a rotation on a whole
    prose shingle is the same ~26^-k event."""
    if c < 26:
        return ALPHA[c:] + ALPHA[:c]
    # LCG-seeded Fisher-Yates: stable across runs and python versions
    state = 0x9E3779B9 * (c + 1) & 0xFFFFFFFF
    def rnd(n):
        nonlocal state
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        return state % n
    letters = list(ALPHA)
    for i in range(25, 0, -1):
        j = rnd(i + 1)
        letters[i], letters[j] = letters[j], letters[i]
    return "".join(letters)

def scale_documents():
    if not scaled("documents"):
        copy_asis("documents")
        return
    did = span("documents", "doc_id")
    parts = []
    for c in range(K):
        rot = letter_perm(c)
        rotd = DIGIT[c % 10:] + DIGIT[:c % 10]
        src_map = ALPHA + ALPHA.upper() + DIGIT
        dst_map = rot + rot.upper() + rotd
        parts.append(
            f"SELECT doc_id + {c * int(did)} AS doc_id, "
            f"translate(text, '{src_map}', '{dst_map}') AS text, "
            f"lang, source, n_chars "
            f"FROM '{SRC}/documents.parquet'")
    base = K * int(did)  # planted ids live above every replica id
    probes = (f"SELECT doc_id, text, lang, source, n_chars "
              f"FROM '{SRC}/documents.parquet' "
              f"WHERE doc_id % 40 = 0 AND doc_id < 5000")
    for j in range(PLANT):
        if j % 2 == 0:
            # one TAIL char (past the 64-byte feature head): feature
            # vector identical (cosine exactly 1 -- guaranteed exact-tier
            # rank), aHash hamming <= 1. Two tail copies (j=0,2) pin the
            # top-2 slots so the panel is never starved by near-1 Caesar
            # siblings.
            pos = 70 + 5 * j
            perturb = (f"CASE WHEN length(text) >= {pos + 1} THEN "
                       f"substr(text, 1, {pos - 1}) || 'q' || "
                       f"substr(text, {pos + 1}) ELSE text END")
        else:
            # one HEAD char at a per-j position: exactly one feature
            # chunk moves (cosine ~0.999), at most one LSH band bit flips
            # -- the HARDER class; it competes with the nearest sibling
            # for the remaining exact-tier slot and wins only when
            # genuinely nearer
            pos = 4 + 7 * j
            perturb = (f"CASE WHEN length(text) >= {pos} THEN "
                       f"substr(text, 1, {pos - 1}) || 'q' || "
                       f"substr(text, {pos + 1}) ELSE text END")
        parts.append(
            f"SELECT doc_id * 10 + {base + j} AS doc_id, "
            f"{perturb} AS text, lang, source, n_chars FROM ({probes}) p{j}")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{OUT}/documents.parquet' (FORMAT PARQUET)")
    if PLANT:
        labels = " UNION ALL ".join(
            f"SELECT doc_id AS probe_id, doc_id * 10 + {base + j} AS "
            f"planted_id, {j} AS j FROM ({probes}) l{j}"
            for j in range(PLANT))
        con.execute(f"COPY ({labels}) TO '{OUT}/planted_pairs.parquet' "
                    f"(FORMAT PARQUET)")

def sign_pattern(c, dims):
    """Deterministic per-copy +-1 pattern (LCG bits). Copies < dims use
    all-ones so existing fixtures (x5/x20/x50) stay byte-identical."""
    if c < dims:
        return [1] * dims
    # BALANCED pattern (dims/2 of each sign), LCG-shuffled: an imbalanced
    # random pattern d gives E[cos(x, x*s)] = sum(s_i x_i^2) ~ d/dims --
    # a systematic cross-copy correlation (measured -0.25 at d=-16);
    # balance pins the expectation at ~0.
    state = 0x85EBCA6B * (c + 1) & 0xFFFFFFFF
    def rnd(n):
        nonlocal state
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        return (state >> 7) % n
    pat = [1, -1] * (dims // 2) + [1] * (dims % 2)
    for i in range(dims - 1, 0, -1):
        j = rnd(i + 1)
        pat[i], pat[j] = pat[j], pat[i]
    return pat

def scale_embeddings():
    if not scaled("embeddings"):
        copy_asis("embeddings")
        return
    vid = span("embeddings", "vec_id")
    dims = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    # Copy transform = SIGNED circular rotation: rotate by c % dims, then
    # (for copies >= dims, where the bare rotation would repeat and
    # reintroduce the quadratic cross-copy artifact) flip a per-copy
    # deterministic sign pattern. Rotation+sign-flip is a signed
    # permutation matrix -- orthogonal, so norms and within-copy geometry
    # are exactly preserved -- and two copies collide only on (same
    # rotation AND same pattern), which distinct copy indices never
    # produce; cross-copy cosines stay ~random. Unbounded K.
    parts = []
    for c in range(K):
        r = c % dims
        vec = ("embedding" if r == 0 else
               f"(embedding[{r + 1}:{dims}] || embedding[1:{r}])")
        pat = sign_pattern(c, dims)
        if any(x < 0 for x in pat):
            lit = "[" + ", ".join(str(x) for x in pat) + "]"
            vec = (f"list_transform(generate_series(1, {dims}), "
                   f"i -> ({vec}[i] * ({lit})[i])::FLOAT)")
        else:
            vec = f"({vec})::FLOAT[]"
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
