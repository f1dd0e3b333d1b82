"""Independent pure-Python reference checks for the dedup tier.

The DuckDB oracles replay the engine's own arithmetic, so a bug in the
*algorithm* (not its translation) would pass t2. These tests recompute
shingle Jaccard and MinHash signatures from scratch in Python —
different code path, same spec — over a seeded random corpus.
"""

from __future__ import annotations

import hashlib
import random

from vsphere_event_streaming_spark.functions.dedup import (
    MINHASH_PARAMS,
    MINHASH_PRIME,
    SHINGLE_P1,
    SHINGLE_P2,
    jaccard_pairs,
    minhash_signatures,
)
from vsphere_event_streaming_spark.functions.text import HASH_MOD

VOCAB = [f"w{i}" for i in range(30)]


def _corpus(n_docs: int, seed: int = 7) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randrange(3, 25))]
        docs.append((i, " ".join(words)))
    # planted near-duplicate: doc n = doc 0 with one word changed
    base = docs[0][1].split()
    base[len(base) // 2] = "wX"
    docs.append((n_docs, " ".join(base)))
    return docs


def _py_word_hash(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % HASH_MOD


def _py_shingles(text: str) -> set[int]:
    ws = text.split()
    return {
        (
            _py_word_hash(ws[i]) * SHINGLE_P1
            + _py_word_hash(ws[i + 1]) * SHINGLE_P2
            + _py_word_hash(ws[i + 2])
        )
        % HASH_MOD
        for i in range(len(ws) - 2)
    }


def test_jaccard_pairs_match_pure_python(spark):
    docs = _corpus(40)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.3).collect()
    }
    sh = {i: _py_shingles(t) for i, t in docs if len(t.split()) >= 3}
    expect = {}
    ids = sorted(sh)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = round(inter / len(sh[a] | sh[b]), 6)
            if j >= 0.3:
                expect[(a, b)] = j
    assert got == expect
    assert (0, 40) in got  # the planted near-dup survives the threshold


def test_minhash_signatures_match_pure_python(spark):
    docs = _corpus(15)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in minhash_signatures(df).collect()}
    for i, t in docs:
        sh = _py_shingles(t)
        if not sh:
            assert i not in got
            continue
        for j, (a, b) in enumerate(MINHASH_PARAMS):
            expect = min((a * s + b) % MINHASH_PRIME for s in sh)
            assert got[i][f"mh{j}"] == expect, (i, j)


def test_simhash_hamming_probe_invariants(spark):
    """Hamming-probe pairing: (1) k=0 reduces exactly to the
    equal-fingerprint pairs; (2) k=1 is a superset of k=0 and every
    extra pair differs in exactly one fingerprint bit; (3) pigeonhole
    completeness — a brute-force scan of all fingerprint pairs finds
    no Hamming<=1 pair the banded probes missed."""
    from vsphere_event_streaming_spark.functions.dedup import (
        simhash_pairs,
        simhash_pairs_hamming,
        simhash_table,
    )

    docs = spark.createDataFrame(_corpus(60), "doc_id long, text string")

    eq_pairs = {
        (r["id_a"], r["id_b"]) for r in simhash_pairs(docs).collect()
    }
    k0 = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs_hamming(docs, max_hamming=0).collect()
    }
    assert k0 == eq_pairs

    h1 = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_hamming(docs, max_hamming=1).collect()
    }
    assert eq_pairs <= set(h1)
    assert all(
        d == (0 if p in eq_pairs else 1) for p, d in h1.items()
    )

    fps = {r["id"]: r["simhash"] for r in simhash_table(docs).collect()}
    brute = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 1
    }
    assert set(h1) == brute
