"""Training-corpus curation operators: PII redaction, benchmark
contamination checking, repetition (quality) signals, sequence packing,
and deterministic global shuffle.

These are the north-star pipeline ops (BASELINE.json) with no reference
counterpart — the reference's only text handling is CSV field extraction
(internal/writer/writer.go:93-99). Everything here is built-in
`pyspark.sql.functions` (WholeStageCodegen, no Python in the hot path),
so each op scales linearly with executors:

* redaction / repetition — pure per-row projections: no shuffle at all;
* contamination — one shuffle to distinct the benchmark n-grams plus a
  hash join; the benchmark side is bounded (a benchmark suite does not
  grow with the corpus), so AQE turns it into a broadcast join at scale;
* packing — window cum-sum partitioned by source shard: each partition
  is one shard, never the whole corpus;
* shuffle — a single range-partitioned global sort by a seeded hash,
  the same cost as any ORDER BY; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .text import tokens


def redact_pii(
    df: DataFrame,
    name_col: str,
    numeric_col: str,
    bucket: int = 500,
) -> DataFrame:
    """Pseudonymize direct identifiers, keep analytic utility.

    - ``name_token``: stable md5 of the identifier (joinable, not
      reversible);
    - ``name_masked``: every digit except the last 4 characters masked
      with 'X' (the last-4 display form used for phone/account numbers —
      applied to whatever string column carries the identifying digits);
    - ``<numeric>_bucket``: the numeric quasi-identifier generalized to
      a coarse bucket (k-anonymity-style coarsening).

    Pure projection — no shuffle, fully codegen'd.
    """
    s = F.col(name_col)
    # Strings of <= 4 chars get fully masked: substr with a non-positive
    # start counts from the string END in Spark, silently truncating
    # short identifiers instead of masking them.
    masked = F.when(
        F.length(s) <= 4, F.regexp_replace(s, "[0-9]", "X")
    ).otherwise(
        F.concat(
            F.regexp_replace(
                s.substr(F.lit(1), F.length(s) - 4), "[0-9]", "X"
            ),
            s.substr(F.length(s) - 3, F.lit(4)),
        )
    )
    return (
        df.withColumn("name_token", F.md5(s))
        .withColumn("name_masked", masked)
        .withColumn(
            f"{numeric_col}_bucket",
            (F.floor(F.col(numeric_col) / bucket) * bucket).cast("bigint"),
        )
    )


def word_ngrams(text_col: str, n: int) -> F.Column:
    """ALL word n-grams of a text column, duplicates preserved, in
    order (contrast dedup.shingles, which distincts and explodes)."""
    t = tokens(text_col)
    # Zip n shifted slices instead of element_at(t, i + j) inside a
    # transform lambda: a captured expression is re-evaluated per
    # element, so the lambda form re-tokenizes the text n times per
    # gram position (quadratic in document length), while each slice
    # argument below is evaluated once per row. F.concat (unlike the
    # pre-r16 concat_ws) yields a NULL gram if a token were NULL —
    # safe because tokens() (split of a non-null trim) never produces
    # NULL elements, an assumption this function depends on.
    length = F.size(t) - (n - 1)
    grams = F.slice(t, 1, length)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(t, 1 + j, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    # CaseWhen evaluates branches lazily, so the negative-length slice
    # a short document would produce is never constructed
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def with_repetition_ratio(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of word n-grams that
    are repeats of an earlier n-gram in the same document
    (1 - distinct/total). High values flag boilerplate / spam /
    degenerate generations. Rows with fewer than n tokens are dropped
    (no n-grams exist). Per-row arrays only — no shuffle."""
    grams = word_ngrams(text_col, n)
    return (
        df.withColumn("_g", grams)
        .filter(F.size("_g") > 0)
        .withColumn("n_grams", F.size("_g").cast("bigint"))
        .withColumn(
            "n_distinct_grams", F.size(F.array_distinct("_g")).cast("bigint")
        )
        .withColumn(
            "dup_gram_ratio",
            F.round(1 - F.col("n_distinct_grams") / F.col("n_grams"), 4),
        )
        .drop("_g")
    )


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination check (the n-gram overlap test used for
    pretraining-set hygiene): for each training document, the fraction
    of its distinct k-gram shingles that appear anywhere in the
    benchmark corpus.

    Plan shape: benchmark → distinct shingles (one small shuffle; the
    benchmark is bounded so at scale AQE broadcasts it), train →
    exploded distinct shingles → hash left-join → per-doc re-aggregate.
    The train side is never collected or crossed with itself.
    """
    from .dedup import shingles

    ev = (
        shingles(benchmark, id_col=id_col, text_col=text_col, k=k)
        .select(F.col("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = shingles(train, id_col=id_col, text_col=text_col, k=k)
    ratio = F.col("n_hits") / F.col("n_shingles")
    return (
        tr.join(ev, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .withColumn("contamination_ratio", F.round(ratio, 4))
        .withColumn("is_contaminated", ratio >= threshold)
    )


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    shard_col: str,
    order_col: str,
    seq_len: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    a deterministic order within each shard and sliced into fixed
    ``seq_len``-token training sequences; each document learns its token
    offset and the first/last sequence index it lands in.

    The cum-sum window is partitioned by shard — the unit a writer task
    owns — so no executor ever sees more than one shard's documents and
    there is no global single-partition bottleneck. (A corpus-global
    offset, when wanted, is the standard two-level fix: per-shard totals
    are tiny — one row per shard — broadcast back as base offsets.)
    """
    w = (
        W.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    n = F.col(token_count_col)
    offset = F.sum(token_count_col).over(w) - n
    return (
        df.withColumn("tok_offset", offset.cast("bigint"))
        .withColumn(
            "seq_first", F.floor(F.col("tok_offset") / seq_len).cast("bigint")
        )
        .withColumn(
            "seq_last",
            F.floor((F.col("tok_offset") + n - 1) / seq_len).cast("bigint"),
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: tuple[int, int] = (80, 90),
    seed: str = "split=1",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket 0-99 from the md5
    of the seeded id, split by ``boundaries`` ([0, b0) train, [b0, b1)
    val, [b1, 100) test).

    Hash-based (not random) so the assignment is stable under corpus
    growth — a document keeps its split when new data arrives, the
    property that prevents silent train/test leakage across pipeline
    re-runs. Pure projection: no shuffle, no RNG state; the md5-prefix
    idiom matches portable_hash60 so the oracle reproduces it exactly.
    """
    b0, b1 = boundaries
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 100
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < b0, "train")
        .when(F.col("split_bucket") < b1, "val")
        .otherwise("test"),
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: str = "seed=42"
) -> DataFrame:
    """Seeded, reproducible global training order: rank by
    md5(seed || id). Identical output on every run and engine (no RNG
    state), which is what makes training runs resumable/comparable.

    A naive ``row_number() OVER (ORDER BY key)`` is a single-partition
    window — the classic global-sequence bottleneck. Instead the rank is
    computed two-level: the first hex byte of the hash pre-buckets rows
    into 256 uniform groups (lowercase-hex lexicographic order equals
    the byte's numeric order, so (bucket, key) sorts identically to
    key); ranks are local per bucket, and each bucket's base offset
    comes from a 256-row cum-sum broadcast back. Both shuffles are
    256-way parallel; nothing ever funnels through one task.
    """
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    keyed = df.withColumn("shuffle_key", key).withColumn(
        "_bkt", F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("int")
    )
    local = keyed.withColumn(
        "_local",
        F.row_number().over(
            W.partitionBy("_bkt").orderBy("shuffle_key", id_col)
        ),
    )
    bases = (
        keyed.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_n").over(
                    W.orderBy("_bkt").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_base")
    )
    return (
        local.join(F.broadcast(bases), "_bkt")
        .withColumn(
            "shuffle_pos", (F.col("_base") + F.col("_local")).cast("bigint")
        )
        .drop("_bkt", "_local", "_base")
    )


def dense_sequence(
    df: DataFrame,
    order_col: str,
    out_col: str = "seq",
    n_buckets: int = 64,
) -> DataFrame:
    """1-based dense global sequence — the exact value of
    ``row_number() OVER (ORDER BY order_col)`` — WITHOUT the
    single-partition window that form compiles to (the classic
    global-sequence bottleneck: every row funnels through one task).

    Same two-level construction as ``deterministic_shuffle``, but the
    order key is an arbitrary NUMERIC column rather than a uniform
    hash, so the pre-bucketing cuts the key domain at sampled
    quantiles: ``approxQuantile`` fetches n_buckets-1 cut points ONCE
    (one driver action at build time), and the bucket id is a pure
    expression of the key VALUE against those literal bounds. NOT
    ``repartitionByRange`` + ``spark_partition_id()``: the rank and
    the offset arms both re-evaluate the bucketing, and range
    sampling is not stable across evaluations — two arms disagreeing
    on a row's bucket assigns duplicate/skipped ranks (observed at
    sf0.1: ~4k duplicate ids per 150k rows). A value-based bucket is
    identical in every arm and every re-run by construction; where
    the cut points land only affects balance, never the rank. Ranks
    are local per bucket (n_buckets-way parallel window), and each
    bucket's base offset is the sum of the EARLIER buckets' counts —
    a triangular self-join over the n_buckets-row count table
    (O(n_buckets²) on ≤64 rows) rather than an unpartitioned cum-sum
    window, so the plan carries NO single-partition window at all.

    Requires ``order_col`` to be numeric, non-null, and UNIQUE (ties
    would make row_number nondeterministic)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(set(df.approxQuantile(order_col, probs, 0.001)))
    pid = "_ds_pid"
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(
            F.col(order_col) > F.lit(c), 1
        ).otherwise(0)
    local = df.withColumn(pid, bucket).withColumn(
        "_ds_local",
        F.row_number().over(W.partitionBy(pid).orderBy(order_col)),
    )
    counts = local.groupBy(pid).agg(F.count("*").alias("_ds_n"))
    bases = (
        counts.alias("a")
        .join(
            counts.alias("b"),
            F.col(f"b.{pid}") < F.col(f"a.{pid}"),
            "left",
        )
        .groupBy(F.col(f"a.{pid}").alias(pid))
        .agg(
            F.coalesce(F.sum("b._ds_n"), F.lit(0)).alias("_ds_base")
        )
    )
    return (
        local.join(F.broadcast(bases), pid)
        .withColumn(
            out_col,
            (F.col("_ds_base") + F.col("_ds_local")).cast("bigint"),
        )
        .drop(pid, "_ds_local", "_ds_base")
    )
