"""Deterministic sampling and sequence packing for training-data prep.

The reference engine (a vSphere event-stream proxy) has no sampling
tier; these are beyond-reference operators a large training-data
pipeline needs (SURVEY.md §2 L13/L14), built CONTENT-KEYED so every
decision is reproducible across engines, retries, and partitionings.
``rand()``/``df.sample`` cannot give that: a re-executed task redraws
its randomness, so a 100 TB job that loses an executor mid-run emits
a different corpus. Hash-of-key sampling makes the keep decision a
pure function of the row — Spark and the DuckDB oracle agree exactly,
and so do two runs of the same job.

Scale posture:

- ``stratified_sample`` is one codegen'd filter — no shuffle, no
  driver state, no per-stratum pass; rates arrive as a literal CASE
  chain (strata counts are small by definition).
- ``pack_sequences`` windows per ``part_col`` partition (language
  here), so packing parallelizes across strata; at 100 TB the
  partition key is a shard id and each shard packs independently —
  there is deliberately NO global-order variant, which would funnel
  the corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import md5_hash, token_count

#: Keep-decision granularity: rates resolve to 1 / 10^6.
SAMPLE_MOD = 1_000_000


def keep_bucket(key: Column, seed: str) -> Column:
    """Deterministic ~uniform bucket in [0, SAMPLE_MOD) from a key.

    Same 60-bit md5 arithmetic as the dedup tier (byte-identical in
    DuckDB), seed-prefixed so independent samples of the same corpus
    decorrelate by changing ``seed``, never by re-rolling RNG state.
    """
    return (
        md5_hash(F.concat(F.lit(seed + ":"), key.cast("string")))
        % SAMPLE_MOD
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    rate — deterministic per-stratum downsampling (the dataset-mixing
    primitive: rates are the mixture weights)."""
    thr = F.lit(int(round(default_rate * SAMPLE_MOD)))
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} not in [0,1]: {rate}")
        thr = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(rate * SAMPLE_MOD))),
        ).otherwise(thr)
    return df.filter(keep_bucket(F.col(key_col), seed) < thr)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training-sequence pack: concatenate
    the stream (per ``part_col``, in ``order_col`` order) and cut
    every ``budget_tokens`` — a doc's pack is where its first token
    lands (docs may straddle a boundary, as sequence packing does).

    Returns (part_col, order_col, n_tokens, pack_id). One window per
    stratum partition; the running sum is the only state.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        part_col,
        order_col,
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("double")
    return d.withColumn(
        "pack_id",
        F.floor(start / F.lit(float(budget_tokens))).cast("bigint"),
    )
