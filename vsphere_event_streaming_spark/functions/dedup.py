"""Deduplication operators (SURVEY §2.11 L1-L2).

Four strategies, each chosen for a different scale/recall point:

- **exact**: hash-groupBy on normalized text. One shuffle on the
  group key; at 100 TB, group keys are hashes so the shuffle carries
  ~16 bytes/row, not documents.
- **n-gram Jaccard (exact pairwise)**: shingle-explode → self-join on
  shingle (inverted-index blocking) → per-pair intersection counts →
  exact Jaccard. Only pairs sharing ≥1 shingle are ever materialized;
  no cross join exists anywhere in the plan.
- **MinHash + LSH**: arithmetic minhash signatures (`(a*h+b) mod p`
  over shingle hashes — engine-reproducible, no library hash), banded
  into buckets; candidate pairs are bucket-collisions only. The scale
  path: signature size is constant per doc, the band join carries
  band-hash keys.
- **SimHash**: 16-bit fingerprints from word-hash bit votes; equal
  fingerprints ⇒ near-dup candidates. Cheapest, lowest recall.

All computation is column expressions (split/transform/aggregate/
explode) — JVM-side, codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import HASH_MOD, HASH_MULT, rolling_hash, words

#: (a, b) parameters for the minhash family h_i(x) = (a_i*x + b_i) mod p.
#: Fixed, public constants — determinism across engines and runs.
MINHASH_PARAMS = [
    (2971215073, 433494437),
    (2654435761, 97531),
    (2246822519, 514229),
    (3266489917, 39916801),
    (668265263, 28657),
    (374761393, 75025),
    (3103515807, 17711),
    (1540483477, 121393),
]
MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def exact_dedup_keepers(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """L1: one keeper (min id) per normalized-text group."""
    return (
        df.groupBy(normalize_text(F.col(text_col)).alias("__norm"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("copies"),
        )
        .drop("__norm")
        .select("keeper_id", "copies")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle strings of a document."""
    ws = words(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def shingle_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) inverted-index rows + per-doc shingle count."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    return sh.select(
        "id",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"),
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """L2 exact: all pairs (a<b) with shingle-Jaccard ≥ threshold.

    Inverted-index self-join: a pair is produced once per *shared*
    shingle, aggregated to an intersection count, then scored. Pairs
    sharing nothing never exist in the plan. Skew note: a shingle
    shared by k docs contributes k² pair rows — for web-scale corpora
    drop ubiquitous shingles first (stop-shingle pruning); the test
    corpus needs no pruning and the oracle does none.
    """
    sh = shingle_table(docs, text_col, id_col, n)
    a = sh.select(
        F.col("id").alias("id_a"),
        F.col("n_shingles").alias("na"),
        "shingle",
    )
    b = sh.select(
        F.col("id").alias("id_b"),
        F.col("n_shingles").alias("nb"),
        "shingle",
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    ).cast("double")
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_hash(shingle: Column) -> Column:
    """Shingle string → int via the engine's rolling hash."""
    return rolling_hash(shingle)


def minhash_signature(text: Column, n: int = 3) -> Column:
    """Array of minhash values, one per (a,b) in MINHASH_PARAMS.

    min over shingles of (a * rolling_hash(shingle) + b) mod p — pure
    integer arithmetic, byte-identical in any engine.
    """
    hashes = F.transform(word_shingles(text, n), shingle_hash)
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME
                )
            )
            for a, b in MINHASH_PARAMS
        ]
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    band_size: int = 2,
) -> DataFrame:
    """L2 approximate: MinHash-LSH candidate pairs (a<b).

    Bands of ``band_size`` signature slots; docs sharing any full band
    collide. The band join shuffles (band_idx, band_values) keys only
    — constant bytes per doc, independent of document length.
    """
    n_bands = len(MINHASH_PARAMS) // band_size
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n).alias("sig"),
    ).filter(F.size("sig") > 0)
    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.slice(F.col("sig"), i * band_size + 1, band_size).alias(
                            "band_val"
                        ),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_val")
    x = bands.select(F.col("id").alias("id_a"), "band_idx", "band_val")
    y = bands.select(F.col("id").alias("id_b"), "band_idx", "band_val")
    return (
        x.join(y, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash fingerprint from word rolling-hashes.

    bit_i = sign of Σ_words (±1 by word-hash bit i); near-identical
    token multisets get identical fingerprints. Kept to 16 bits so the
    oracle arithmetic stays in exact int64 everywhere.
    """
    hs = F.transform(words(text), rolling_hash)
    bits = [
        F.when(
            F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
            )
            > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(16)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total
