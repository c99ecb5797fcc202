"""Text analysis for large-scale training-data pipelines: tokenization,
token counting, quality scoring, language ID, document fingerprinting.

Everything here is built-in `pyspark.sql.functions` only — no Python UDFs —
so the whole pipeline stays inside WholeStageCodegen and scales linearly
with executors. These ops have no counterpart in the reference (its only
string work is CSV field extraction, internal/writer/writer.go:93-99);
they exist per the project north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Small closed-class stopword list (public knowledge; overlaps the fixture
# vocabulary deliberately so ratios are non-degenerate).
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (the CSV-era baseline; a BPE-ish regex
    tokenizer is in token_count_bpe below)."""
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_chars_nospace, avg_token_len."""
    t = tokens(text_col)
    nospace = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    return (
        df.withColumn("n_tokens", F.size(t).cast("bigint"))
        .withColumn("n_chars_nospace", nospace.cast("bigint"))
        .withColumn(
            "avg_token_len",
            F.round(nospace / F.size(t), 4),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: stopword ratio, uppercase ratio,
    punctuation ratio, and a composite score in [0,1].

    The composite mirrors common pretraining-data filters (C4/Gopher
    style): docs with a reasonable stopword ratio and low symbol noise
    score high.
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
    upper = F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
    stop_ratio = stop_hits / n_tok
    punct_ratio = punct / n_chars
    upper_ratio = upper / n_chars
    score = (
        F.least(stop_ratio * 5, F.lit(1.0)) * 0.5
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.25
        + (1 - F.least(upper_ratio * 10, F.lit(1.0))) * 0.25
    )
    return (
        df.withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("upper_ratio", F.round(upper_ratio, 4))
        .withColumn("quality_score", F.round(score, 4))
    )


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token estimate: word-boundary pieces + digit runs + symbol
    singles (the regex families GPT-style tokenizers pre-split on), ×1.3
    subword inflation. A cheap, deterministic proxy when the real
    tokenizer isn't on the cluster."""
    pieces = F.size(
        F.filter(
            F.split(F.col(text_col), r"(?=[^\w])|(?<=[^\w])"),
            lambda x: (F.length(F.trim(x)) > 0),
        )
    )
    return df.withColumn("n_tokens_bpe_est", F.ceil(pieces * 1.3).cast("bigint"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over normalized text + a 60-bit numeric
    prefix for compact joins (content-addressable dedup key)."""
    norm = F.lower(F.trim(F.col(text_col)))
    h = F.md5(norm)
    return df.withColumn("fp_md5", h).withColumn(
        "fp_id", F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    )


def portable_hash60(col: Column) -> Column:
    """60-bit content hash from the md5 hex prefix — bit-identical in any
    engine with md5 (DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT)),
    which keeps hash-based operators (winnowing, SimHash) oracle-checkable
    end-to-end. xxhash64 is the faster production default."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def winnow_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 4, window: int = 5, portable_hash: bool = False,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash every
    k-token shingle, keep the minimum hash in each sliding window of
    ``window`` shingles. Output: (id, fingerprint) — a shift-resistant
    signature set for plagiarism/near-dup detection.

    Docs with at least one shingle but fewer than ``window`` of them
    emit the min hash over the shingles they do have, so short-but-valid
    docs stay visible to winnowing dedup.

    Pure built-ins: shingle via transform/sequence, per-window min via a
    ranged window function. One shuffle on id (both window functions
    share the same partition key).

    ``portable_hash=True`` swaps xxhash64 for the md5-derived 60-bit
    hash, making the whole fingerprint set reproducible in DuckDB.
    """
    # Tokens are projected to a real column first: an expression
    # captured inside the transform lambda would be re-evaluated per
    # element, re-running the regex split k times per shingle position
    # (quadratic in document length).
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    t = F.col("_toks")
    hash_fn = portable_hash60 if portable_hash else F.xxhash64
    # Guard short docs: sequence(1, n) with n < 1 yields a DESCENDING
    # sequence ([1, 0]), and element_at(t, 0) aborts the query.
    sh = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (k - 1)),
            lambda i: hash_fn(
                F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)])
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    exploded = (
        base.select(F.col(id_col), F.posexplode(sh).alias("pos", "h"))
    )
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    return (
        exploded.withColumn("fp", F.min("h").over(w))
        .withColumn("__maxpos", F.max("pos").over(W.partitionBy(id_col)))
        .filter(
            F.col("pos") >= F.least(F.lit(window - 1), F.col("__maxpos"))
        )
        .select(id_col, "fp")
        .distinct()
    )


# --- language identification -------------------------------------------------

# Marker-token profiles (public linguistic knowledge). Weight = how
# distinctive the token is for the language.
_LANG_MARKERS: list[tuple[str, str, float]] = [
    ("en", "the", 3.0), ("en", "and", 2.0), ("en", "of", 2.0), ("en", "is", 1.5),
    ("en", "with", 1.5), ("en", "a", 1.0),
    ("de", "der", 3.0), ("de", "und", 3.0), ("de", "die", 2.5), ("de", "ist", 2.0),
    ("de", "mit", 2.0), ("de", "das", 2.0),
    ("es", "el", 2.5), ("es", "los", 3.0), ("es", "que", 2.5), ("es", "es", 1.5),
    ("es", "con", 2.0), ("es", "una", 2.0),
    ("fr", "le", 2.5), ("fr", "les", 3.0), ("fr", "des", 3.0), ("fr", "est", 2.0),
    ("fr", "avec", 2.5), ("fr", "une", 2.0),
]


def lang_markers_df(spark) -> DataFrame:
    return spark.createDataFrame(
        _LANG_MARKERS, "lang string, marker string, weight double"
    )


def with_lang_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """N-gram/marker-token language ID heuristic.

    CJK text short-circuits via a codepoint-range check (no token overlap
    with Latin scripts); otherwise marker tokens vote, weighted, and the
    argmax wins (ties broken alphabetically for determinism). Docs with
    no markers → 'unknown'.

    Scale: explode(tokens) ⋈ broadcast(markers) → groupBy(doc) — one
    shuffle on doc_id; the marker table is tiny and broadcast.
    """
    spark = df.sparkSession
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    votes = (
        toks.join(
            F.broadcast(lang_markers_df(spark)),
            F.col("tok") == F.col("marker"),
        )
        .groupBy(id_col, "lang")
        .agg(F.sum("weight").alias("score"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("lang"))
    best = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col(id_col), F.col("lang").alias("lang_pred_latin"),
                F.round("score", 2).alias("lang_score"))
    )
    return (
        df.join(best, id_col, "left")
        .withColumn(
            "lang_pred",
            F.when(has_cjk, F.lit("zh")).otherwise(
                F.coalesce(F.col("lang_pred_latin"), F.lit("unknown"))
            ),
        )
        .withColumn("lang_score", F.coalesce(F.col("lang_score"), F.lit(0.0)))
        .drop("lang_pred_latin")
    )


def term_rows(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, term occurrence) — the exploded form feeding
    corpus-level term statistics. Explode happens before any shuffle, so
    the groupBys downstream aggregate map-side first."""
    return df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 20,
) -> DataFrame:
    """Build a (truncated) inverted index: term → document frequency +
    the head of the posting list (first ``max_postings`` doc ids in
    ascending order, comma-joined).

    Scale shape: the posting-list head is selected with a per-term
    ranked window BEFORE any collect_list, so no task ever materializes
    a full posting list — for a stopword-like term at 100 TB that list
    is corpus-sized, and the naive ``sort_array(collect_set(id))`` dies
    exactly there. Two shuffles on ``term`` (same key, AQE-coalesced);
    the df count rides the same window.
    """
    dt = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).distinct()
    wt = W.partitionBy("term")
    rk = dt.withColumn(
        "rn", F.row_number().over(wt.orderBy(id_col))
    ).withColumn("df", F.count("*").over(wt).cast("bigint"))
    return (
        rk.filter(F.col("rn") <= max_postings)
        .groupBy("term", "df")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(id_col)),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings_head")
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms (Robertson & Spärck Jones; the Lucene-default scoring form
    with idf = ln(1 + (N - df + 0.5) / (df + 0.5))).

    Scale shape: tf is aggregated only for the query's terms (the
    explode is pre-filtered, so the shuffled volume is hits-only, not
    the whole corpus); df/N/avgdl are term- or scalar-sized and
    broadcast. Per-term contributions are cast DECIMAL(18,6) before the
    final per-doc sum so the result is reduction-order-independent, and
    the idf is quantized to DECIMAL(12,4) right after the ln() — libm
    and JVM ln differ in the last ulp, and without the quantization
    that ulp cascades through the rounding boundaries into a visible
    1e-4 flip. Documents containing none of the query terms score no
    row (filter them in, at zero, with a left join from ``df`` if
    needed).
    """
    terms = term_rows(df, id_col, text_col).filter(
        F.col("term").isin(*query_terms)
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = terms.groupBy("term").agg(
        F.countDistinct(id_col).cast("bigint").alias("df")
    )
    stats = df.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(F.size(tokens(text_col))).alias("_avgdl"),
    )
    dl = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("double").alias("dl")
    )
    idf = (
        F.log(1.0 + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        .cast("decimal(12,4)")
        .cast("double")
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("_c", contrib.cast("decimal(18,6)"))
        .groupBy(id_col)
        .agg(
            (F.round(F.sum("_c").cast("double"), 4) + 0.0).alias("bm25"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
    )


def tfidf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus tf-idf: tf(doc,term) × ln(N/df(term)).

    Three aggregates over one exploded projection: tf by (doc, term),
    df by term (distinct docs), N a broadcast scalar. The df side is
    vocabulary-sized — orders of magnitude smaller than the corpus — so
    its join back to tf broadcasts at scale; nothing here performs a
    quadratic or corpus-wide single-task step.
    """
    terms = term_rows(df, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = terms.groupBy("term").agg(
        F.countDistinct(id_col).cast("bigint").alias("df")
    )
    n = df.agg(F.count("*").alias("_n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 4) + 0.0)
            .alias("tfidf"),
        )
    )
