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


def temperature_rates(
    docs: DataFrame, strata_col: str = "lang"
) -> DataFrame:
    """(strata, r): micro-unit keep rates derived IN-PLAN so kept
    mass ∝ sqrt(n) per stratum (temperature mixing, alpha = 0.5 — the
    GPT-3/T5 n^alpha recipe) with the total budget pinned at half the
    corpus:

        r = min(SAMPLE_MOD, floor(SAMPLE_MOD · (N//2) · w / n / W))
        with w = floor(sqrt(n)·1e6), W = Σw, N = Σn

    Exact-integer inputs below 2^53, then ONE fixed left-assoc chain
    of IEEE-correctly-rounded double mul/divs — overflow-free at any
    corpus size and bit-identical to the DuckDB replay
    (pipeline_queries._dataset_mix_temp_oracle). Plan: per-stratum
    count aggregate → 1-row totals → k-row broadcast rate table; no
    driver collect, no Python. Shared by q_dataset_mix_temp and the
    corpus_prep mixing stage so the two can never drift."""
    cnt = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    wq = cnt.withColumn(
        "w",
        F.floor(
            F.sqrt(F.col("n").cast("double")) * F.lit(1000000.0)
        ).cast("long"),
    )
    tot = wq.agg(F.sum("w").alias("tw"), F.sum("n").alias("tn"))
    return wq.join(F.broadcast(tot)).select(
        strata_col,
        F.least(
            F.lit(SAMPLE_MOD).cast("long"),
            # T = tn // 2 as an exact integer-valued double
            # (tn < 2^53: /2.0 is exact, floor == integer div),
            # then the SAME left-assoc double chain as the
            # oracle: ((((1e6 * T) * w) / n) / W)
            F.floor(
                F.lit(float(SAMPLE_MOD))
                * F.floor(F.col("tn").cast("double") / F.lit(2.0))
                * F.col("w").cast("double")
                / F.col("n").cast("double")
                / F.col("tw").cast("double")
            ).cast("long"),
        ).alias("r"),
    )


def temperature_sample(
    docs: DataFrame,
    seed: str,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff its content-keyed bucket falls under its
    stratum's TEMPERATURE-derived rate (:func:`temperature_rates`) —
    the data-derived form of :func:`stratified_sample`: no externally
    fixed mixture weights, the corpus's own stratum sizes set the
    rates. One broadcast join + codegen filter past the two tiny
    aggregates; deterministic under retries and re-partitioning."""
    rates = temperature_rates(docs, strata_col=strata_col)
    return (
        docs.join(F.broadcast(rates), strata_col)
        .filter(keep_bucket(F.col(key_col), seed) < F.col("r"))
        .drop("r")
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
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign each document to a training-sequence pack: concatenate
    the stream (per ``part_col``, in ``order_col`` order) and cut
    every ``budget_tokens`` — a doc's pack is where its first token
    lands (docs may straddle a boundary, as sequence packing does).

    The budget meters whitespace tokens by default; pass
    ``n_tokens_col`` to meter a precomputed per-doc count instead —
    the trained-subword budget a real packer uses (compose with
    ``bpe.bpe_token_counts``: see ``tests/test_bpe.py``).

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
    # A caller-supplied count column is untrusted: a negative count
    # would silently invert spans (tok_end < tok_start) and shift
    # every later doc's offset in the stratum (ADVICE r7). Clamp to
    # 0 — the zero-token contract already keeps such a doc
    # represented with one empty span, the only sane reading of
    # corrupt input (the derived token_count path is non-negative by
    # construction).
    n_tokens = (
        F.greatest(F.lit(0), F.col(n_tokens_col))
        if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    d = docs.select(
        part_col,
        order_col,
        n_tokens.cast("bigint").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("double")
    return d.withColumn(
        "pack_id",
        F.floor(start / F.lit(float(budget_tokens))).cast("bigint"),
    )


def pack_chunked(
    docs: DataFrame,
    budget_tokens: int,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Document-SPLITTING sequence packing (VERDICT_r6 #4): where
    :func:`pack_sequences` assigns each whole doc to the pack its
    first token lands in, this emits one ``(pack_id, tok_start,
    tok_end)`` span per pack a doc intersects — what real trainers
    do: a doc longer than the budget (or straddling a boundary)
    splits across packs at token granularity, so every pack holds
    EXACTLY ``budget_tokens`` tokens (the stratum's last pack
    excepted).

    Pure window arithmetic, same single shuffle as the parent: the
    per-stratum running sum places each doc at stream offset
    ``[start, start + n)``; packs are the fixed grid ``[k·B,
    (k+1)·B)``; the spans are the grid cells the doc's interval
    intersects (``explode(sequence(first, last))`` — at most
    ``n/B + 1`` rows per doc, so output rows ≈ docs + total_tokens/B).
    Zero-token docs keep one empty span at their offset's pack, so
    every doc stays represented (the pack_sequences contract).

    Spans partition each doc by construction: consecutive spans are
    cut at grid boundaries, ``tok_start`` of the first is 0 and
    ``tok_end`` of the last is ``n``. The double division is exact
    below 2^53 stream tokens per stratum (~25T tokens is 2^44.5) —
    and mirrors the DuckDB oracle's arithmetic exactly.

    Returns (part_col, order_col, pack_id, tok_start, tok_end).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A caller-supplied count column is untrusted: a negative count
    # would silently invert spans (tok_end < tok_start) and shift
    # every later doc's offset in the stratum (ADVICE r7). Clamp to
    # 0 — the zero-token contract already keeps such a doc
    # represented with one empty span, the only sane reading of
    # corrupt input (the derived token_count path is non-negative by
    # construction).
    n_tokens = (
        F.greatest(F.lit(0), F.col(n_tokens_col))
        if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    d = docs.select(
        part_col,
        order_col,
        n_tokens.cast("bigint").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    base = d.select(
        part_col,
        order_col,
        "n_tokens",
        (cum - F.col("n_tokens")).alias("tok_offset"),
        cum.alias("cum"),
    )
    b = float(budget_tokens)
    first = F.floor(
        F.col("tok_offset").cast("double") / F.lit(b)
    ).cast("bigint")
    last = F.greatest(
        first,
        F.floor(
            (F.col("cum") - F.lit(1)).cast("double") / F.lit(b)
        ).cast("bigint"),
    )
    return (
        base.withColumn("pack_id", F.explode(F.sequence(first, last)))
        .select(
            part_col,
            order_col,
            "pack_id",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.col("pack_id") * F.lit(budget_tokens)
                - F.col("tok_offset"),
            )
            .cast("bigint")
            .alias("tok_start"),
            F.least(
                F.col("n_tokens"),
                (F.col("pack_id") + F.lit(1)) * F.lit(budget_tokens)
                - F.col("tok_offset"),
            )
            .cast("bigint")
            .alias("tok_end"),
        )
    )


def corpus_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "split1",
) -> DataFrame:
    """Leakage-free train/val/test split: a PARTITION of the corpus,
    not a sample — every row gets exactly one split label, splits are
    disjoint and exhaustive BY CONSTRUCTION (consecutive bucket
    ranges of one content-keyed hash), and membership is a pure
    function of (seed, key): rerun-, engine-, partitioning- and
    append-stable, so a doc can never drift from test into train when
    the corpus grows — the train/test-contamination guarantee random
    splitters give up.

    ``fractions`` maps split name → fraction; must sum to 1 (±1e-9).
    Returns df + a ``split`` column. One codegen projection — no
    shuffle, no RNG state.
    """
    return df.withColumn(
        "split", split_label(F.col(key_col), fractions, seed)
    )


def split_label(key: Column, fractions: dict[str, float], seed: str) -> Column:
    """The split-membership expression :func:`corpus_split` assigns —
    factored out (r12) so queries that need a label for an arbitrary
    key column (e.g. both ids of a near-dup PAIR in
    q_split_leakage_pairs) use the byte-identical arithmetic and can
    never drift from the assignment itself."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"negative fraction in {fractions}")
    bucket = keep_bucket(key, seed)
    expr = None
    hi = 0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        hi += int(round(frac * SAMPLE_MOD))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))
