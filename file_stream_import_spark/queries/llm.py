"""LLM-data-pipeline query registrations: dedup family, similarity
search, text analysis, multimodal metadata — each a thin adapter from the
operators in ``operators/`` to the driver's (spark, sf_dir) contract.

Oracle notes: Jaccard/quality/knn oracles recompute the same arithmetic
in DuckDB with identical operand types (integer ratios divide in double,
embeddings cast to DOUBLE[]), so values match bit-for-bit before the
defensive ROUND. minhash_lsh shares the exact-Jaccard oracle on purpose:
with 128 hashes × 32 bands the probability of missing a pair at the 0.8
threshold is ~1e-7, i.e. LSH+verify provably reproduces the quadratic
algorithm's output (see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..operators import curation, dedup, multimodal, similarity, text
from . import register
from ._oracle_gen import (
    frame_sample_oracle,
    lang_id_oracle,
    lsh_knn_oracle,
    lsh_pairs_oracle,
    simhash_pairs_oracle,
    winnow_oracle,
)

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
      CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_chars_nospace,
      ROUND(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
            / len(string_split_regex(trim(text), '\s+')), 4) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting over documents (whitespace tokenizer)."""
    d = load_table(spark, sf_dir, "documents")
    return text.with_token_stats(d).select(
        "doc_id", "n_tokens", "n_chars_nospace", "avg_token_len"
    )


@register(
    "text_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
        string_split_regex(trim(text), '\s+') AS toks,
        length(text) AS n_chars,
        length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
        length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents
    ), r AS (
      SELECT doc_id,
        len(list_filter(toks, x -> x IN
          ('the','a','of','and','in','to','is','on','for','with'))) * 1.0
          / len(toks) AS stop_r,
        n_punct * 1.0 / n_chars AS punct_r,
        n_upper * 1.0 / n_chars AS upper_r
      FROM t
    )
    SELECT doc_id,
      ROUND(stop_r, 4)  AS stopword_ratio,
      ROUND(punct_r, 4) AS punct_ratio,
      ROUND(upper_r, 4) AS upper_ratio,
      ROUND(LEAST(stop_r * 5, 1.0) * 0.5
            + (1 - LEAST(punct_r * 10, 1.0)) * 0.25
            + (1 - LEAST(upper_r * 10, 1.0)) * 0.25, 4) AS quality_score
    FROM r
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (stopword/punct/upper ratios)."""
    d = load_table(spark, sf_dir, "documents")
    return text.with_quality_score(d).select(
        "doc_id", "stopword_ratio", "punct_ratio", "upper_ratio", "quality_score"
    )


@register(
    "text_lang_profile",
    oracle="""
    SELECT lang,
      COUNT(*) AS n_docs,
      CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      ROUND(AVG(n_chars), 4) AS avg_chars,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (the aggregate view a pipeline uses to
    set per-language sampling rates)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fp_md5
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text)."""
    d = load_table(spark, sf_dir, "documents")
    return text.with_fingerprint(d).select("doc_id", "fp_md5")


@register("text_lang_id", oracle=lang_id_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (deterministic argmax vote,
    CJK short-circuit) — fully oracle-checked since round 3: the vote
    arithmetic and tie-breaks are replicated in SQL."""
    d = load_table(spark, sf_dir, "documents")
    return text.with_lang_id(d).select("doc_id", "lang_pred", "lang_score")


@register("text_winnow_fingerprints", oracle=winnow_oracle())
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (bounded to 20 docs to keep output small).
    Uses the portable md5-derived hash so the exact fingerprint VALUES
    are oracle-checked, not just row counts."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return text.winnow_fingerprints(d, portable_hash=True)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter * 1.0 / (x.n + y.n - inter), 4) AS jaccard
    FROM pairs p
    JOIN sizes x ON p.doc_a = x.doc_id
    JOIN sizes y ON p.doc_b = y.doc_id
    WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.8
    """


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (canonical id + copy count)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d)


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard near-dup pairs (threshold 0.8)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, threshold=0.8)


@register("dedup_minhash_lsh", oracle=_JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified — same output contract
    as dedup_ngram_jaccard (and the same oracle), linear-time candidate
    generation. The 100 TB dedup path."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, threshold=0.8)


_CLUSTER_ORACLE = r"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    praw AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT doc_a, doc_b FROM praw p
      JOIN sizes x ON p.doc_a = x.doc_id
      JOIN sizes y ON p.doc_b = y.doc_id
      WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM jp
      UNION ALL SELECT doc_b, doc_a FROM jp
    ),
    cc(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, cc.label FROM edges e JOIN cc ON cc.id = e.dst
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(MIN(label) AS BIGINT) AS cluster_id
    FROM cc GROUP BY id
    """


@register("dedup_clusters", oracle=_CLUSTER_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: MinHash-LSH pairs (threshold 0.8)
    → connected components → smallest-id representative per cluster —
    the 100 TB composition (linear-time candidate generation feeding the
    cluster step). The oracle computes the same components from exact
    Jaccard pairs with a recursive CTE; LSH reproduces the exact pair
    set at 0.8 with ~1e-7 miss probability (see operators/dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.8)
    return dedup.cluster_pairs(pairs)


@register("dedup_simhash", oracle=simhash_pairs_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance 3, portable-hash
    form: banding finds candidates, the oracle brute-forces all pairs —
    identical sets because pigeonhole banding is complete. Signature
    bits, Hamming distances, and pair membership are all hash-checked."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(d, max_hamming=3, portable_hash=True)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "knn_cosine_bruteforce",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, FLOOR(cos * 1e6 + 0.5) / 1e6 + 0.0 AS cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors against all embeddings."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_bruteforce(e, e.filter(F.col("vec_id") < 10), k=5)


@register(
    "knn_topk_partial",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, FLOOR(cos * 1e6 + 0.5) / 1e6 + 0.0 AS cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def knn_topk_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 via per-batch partial top-k — same results (and same
    brute-force oracle) as knn_cosine_bruteforce, but the per-query rank
    shuffle carries only the k·batches local survivors instead of every
    scored pair (operators/similarity.py:knn_topk_partial)."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_topk_partial(
        e, e.filter(F.col("vec_id") < 10), k=5
    )


@register("ann_cosine_lsh_knn", oracle=lsh_knn_oracle(num_planes=6))
def ann_cosine_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 probing only the query's hyperplane bucket.
    The md5-derived planes are deterministic, so the oracle reproduces
    the same buckets, candidates, cosines, and ranks — fully checked."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_knn(
        e, e.filter(F.col("vec_id") < 10), k=5, num_planes=6
    )


@register(
    "ann_cosine_ivf_knn",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    assign AS (
      SELECT vec_id, v, cid,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS ark
      FROM e CROSS JOIN cent
    ),
    a AS (SELECT vec_id, v, cid FROM assign WHERE ark = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    probes AS (
      SELECT query_id, qv, cid,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY list_cosine_similarity(qv, cv) DESC, cid) AS prk
      FROM q CROSS JOIN cent
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(a.v, p.qv) AS cos
      FROM (SELECT * FROM probes WHERE prk <= 2) p
      JOIN a ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM cand
    )
    SELECT query_id, neighbor_id, FLOOR(cos * 1e6 + 0.5) / 1e6 + 0.0 AS cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def ann_cosine_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: md5-sampled coarse quantizer (C=8), probe
    the 2 nearest inverted lists per query. Deterministic end-to-end, so
    unlike the LSH variants the full pipeline is oracle-checked —
    centroid choice, list assignment, probe order, and final ranking."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_knn(
        e, e.filter(F.col("vec_id") < 10), k=5, n_centroids=8, nprobe=2
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id
    FROM e a
    WHERE NOT EXISTS (
      SELECT 1 FROM e b
      WHERE b.vec_id < a.vec_id
        AND list_cosine_similarity(a.v, b.v) >= 0.4
    )
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal, keep-smallest-id rule (exact
    pairwise form for the oracle; the LSH-bucketed form is the 100 TB
    path — see operators.similarity.cosine_neardup_dedup)."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_dedup(e, min_cos=0.4, exact=True)


@register(
    "ann_cosine_lsh_pairs",
    oracle=lsh_pairs_oracle(num_planes=4, min_cos=0.25),
)
def ann_cosine_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-neighbor pairs via hyperplane LSH buckets (embedding
    near-dup detection shape). Deterministic planes ⇒ the oracle
    reproduces bucket membership and exact cosines — fully checked."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_pairs(e, num_planes=4, min_cos=0.25)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_meta",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction via Arrow-batched mapInPandas
    (decode is a deterministic stub; byte length is oracle-checked)."""
    d = load_table(spark, sf_dir, "documents")
    meta = multimodal.extract_image_metadata(multimodal.attach_fake_payload(d))
    return meta.select("doc_id", "n_bytes")


@register("multimodal_frame_sample", oracle=frame_sample_oracle())
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out over binary payloads (bounded to 20 docs).
    The frame checksum hashes the hex form of each byte window, so the
    mapInPandas fan-out output is reproduced exactly by the oracle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return multimodal.sample_frames(multimodal.attach_fake_payload(d))


# ---------------------------------------------------------------------------
# Training-corpus curation: deterministic sampling + corpus reporting
# ---------------------------------------------------------------------------


@register(
    "sample_systematic",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE doc_id % 20 = 0
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-20 systematic sample keyed on doc_id.

    Training pipelines need REPRODUCIBLE samples; rand()-based sampling
    differs per run and per engine. A key-modulus (or hash-modulus)
    predicate is stable, pushes down to the scan, and needs no shuffle
    at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ) t
    WHERE rn <= 20
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: a fixed quota of documents per language
    (equal-representation curation for low-resource langs). Deterministic
    order key (doc_id) instead of rand() for cross-run reproducibility;
    the per-stratum quota bounds output regardless of stratum skew."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("doc_id")
    return (
        d.select("doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


@register(
    "corpus_report",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY lang, source
    """,
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per (lang, source) — the summary every
    dataset card needs. Pure map-side-combined aggregation; the shuffle
    carries |lang|x|source| partial rows only."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


@register(
    "text_length_stats_by_lang",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS mean_chars,
           ROUND(STDDEV_SAMP(n_chars), 4) AS sd_chars,
           ROUND(CAST(quantile_cont(n_chars, 0.5) AS DOUBLE), 4) AS median_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_length_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via applyInPandas (the UDAF path).

    Each language group arrives as ONE Arrow-backed pandas frame, so
    arbitrary Python statistics run per group; pandas ddof=1 std and
    linear-interpolated median match STDDEV_SAMP / quantile_cont exactly.

    Scale: one shuffle on the group key, like any aggregation — but NO
    map-side combine and the whole group materializes in one task's
    memory. Correct tool for bounded groups (languages); for
    unbounded/skewed keys use built-in aggregates or sketches instead.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        chars = pdf["n_chars"].astype("float64")
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "mean_chars": [round(chars.mean(), 4)],
                "sd_chars": [round(chars.std(ddof=1), 4)],
                "median_chars": [round(chars.median(), 4)],
            }
        )

    return d.groupBy("lang").applyInPandas(
        stats,
        "lang string, n_docs long, mean_chars double, sd_chars double, "
        "median_chars double",
    )


@register(
    "text_bigrams_udtf",
    oracle=r"""
    SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
           t[u.i] || ' ' || t[u.i + 1] AS bigram
    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE doc_id < 50) x,
         UNNEST(range(1, len(t))) AS u(i)
    """,
)
def text_bigrams_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram expansion via a Python UDTF (1 row → N rows table
    function), lateral-joined to the documents scan — the UDTF member of
    the UDF/UDAF/UDTF triple (SURVEY §2.2).

    Scale: the UDTF runs Arrow-batched per partition like any Python
    worker; no shuffle is introduced — the lateral join is a per-row
    expansion. Prefer F.explode over built-in arrays when expressible;
    a UDTF earns its place when the expansion logic is genuinely
    imperative (parsers, tokenizers, decoders).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class Bigrams:
        def eval(self, doc_id, text):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield doc_id, i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams_udtf", Bigrams)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT b.* FROM _udtf_docs, LATERAL bigrams_udtf(doc_id, text) b"
    )


@register(
    "text_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(
        text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+')) AS BIGINT)
        AS n_bpe_tokens,
      CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        AS n_ws_tokens,
      ROUND(len(regexp_extract_all(
        text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+')) * 1.0
        / len(string_split_regex(trim(text), '\s+')), 4)
        AS bpe_per_ws
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: letter runs / digit runs / punctuation runs
    as separate tokens (the pre-tokenization split every BPE vocabulary
    applies), next to the whitespace count and their ratio — the signal a
    training pipeline uses to estimate token budgets per document. The
    pattern sticks to a regex subset Java and RE2 interpret identically.
    """
    d = load_table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+"), 0
        )
    )
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        bpe.cast("bigint").alias("n_bpe_tokens"),
        ws.cast("bigint").alias("n_ws_tokens"),
        F.round(bpe * F.lit(1.0) / ws, 4).alias("bpe_per_ws"),
    )


@register(
    "agg_approx_quantiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
           ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95_exact,
           COUNT(*) AS n_orders,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of order totals per status via Spark's
    Greenwald-Khanna sketch (single pass, mergeable partials — the scale
    path where exact quantiles' full sort is unaffordable).

    Oracle-checkable sketch accuracy: at test SF the exact percentile IS
    affordable, so the query emits the exact values plus a Spark-side
    bound check |approx - exact| / exact <= 5%. The oracle hash-checks
    the exact values and all-TRUE bound columns — a sketch drifting past
    the bound fails the hash (this query was rows-only before r5).
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("_p50e"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("_p95e"),
        F.approx_percentile("o_totalprice", 0.5, 1000).alias("_p50a"),
        F.approx_percentile("o_totalprice", 0.95, 1000).alias("_p95a"),
        F.count("*").alias("n_orders"),
    )

    def within(approx: str, exact: str):
        return F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= F.lit(0.05)

    return agg.select(
        "o_orderstatus",
        F.round("_p50e", 2).alias("p50_exact"),
        F.round("_p95e", 2).alias("p95_exact"),
        "n_orders",
        within("_p50a", "_p50e").alias("p50_within_bound"),
        within("_p95a", "_p95e").alias("p95_within_bound"),
    )


# ---------------------------------------------------------------------------
# Corpus curation (operators/curation.py)
# ---------------------------------------------------------------------------


@register(
    "pii_redaction",
    oracle="""
    SELECT c_custkey,
      md5(c_name) AS name_token,
      CASE WHEN length(c_name) <= 4
           THEN regexp_replace(c_name, '[0-9]', 'X', 'g')
           ELSE concat(
             regexp_replace(substr(c_name, 1, length(c_name) - 4),
                            '[0-9]', 'X', 'g'),
             substr(c_name, length(c_name) - 3, 4))
      END AS name_masked,
      CAST(FLOOR(c_acctbal / 500) * 500 AS BIGINT) AS c_acctbal_bucket
    FROM customer
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pseudonymization over the customer table: stable md5 token,
    identifying digit run masked to last-4, account balance generalized
    to a $500 bucket. Pure codegen projection — no shuffle (see
    operators/curation.py)."""
    c = load_table(spark, sf_dir, "customer")
    return curation.redact_pii(c, "c_name", "c_acctbal", bucket=500).select(
        "c_custkey", "name_token", "name_masked", "c_acctbal_bucket"
    )


@register(
    "text_repetition",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
        list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1]) AS grams
      FROM t WHERE len(toks) >= 2
    )
    SELECT doc_id,
      CAST(len(grams) AS BIGINT) AS n_grams,
      CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
      ROUND(1 - len(list_distinct(grams)) * 1.0 / len(grams), 4)
        AS dup_gram_ratio
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repeated-bigram ratio per document (boilerplate /
    spam signal). Per-row arrays only — no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return curation.with_repetition_ratio(d).select(
        "doc_id", "n_grams", "n_distinct_grams", "dup_gram_ratio"
    )


@register(
    "contamination_check",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM t WHERE len(toks) >= 3)
    ), ev AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    )
    SELECT s.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_shingles,
      CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_hits,
      ROUND(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0
            / COUNT(*), 4) AS contamination_ratio,
      SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0
        / COUNT(*) >= 0.2 AS is_contaminated
    FROM sh s LEFT JOIN ev e USING (shingle)
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination n-gram overlap: every 97th document plays
    the held-out benchmark; each training doc reports what fraction of
    its distinct 3-gram shingles appear in the benchmark corpus."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return curation.contamination_report(train, bench, k=3, threshold=0.2)


@register(
    "seq_packing",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
        len(string_split_regex(trim(text), '\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
          AS tok_offset
      FROM t
    )
    SELECT doc_id, source,
      CAST(n_tokens AS BIGINT) AS n_tokens,
      CAST(tok_offset AS BIGINT) AS tok_offset,
      CAST(FLOOR(tok_offset / 256.0) AS BIGINT) AS seq_first,
      CAST(FLOOR((tok_offset + n_tokens - 1) / 256.0) AS BIGINT) AS seq_last
    FROM c
    """,
)
def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 256-token training
    sequences, cum-sum windowed per source shard (never a global
    single-partition window — see operators/curation.py)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.withColumn("n_tokens", F.size(text.tokens()).cast("bigint"))
    return curation.pack_sequences(
        t, "n_tokens", shard_col="source", order_col="doc_id", seq_len=256
    ).select("doc_id", "source", "n_tokens", "tok_offset", "seq_first", "seq_last")


@register(
    "train_shuffle",
    oracle="""
    SELECT doc_id,
      md5(concat('seed=42:', CAST(doc_id AS VARCHAR))) AS shuffle_key,
      CAST(ROW_NUMBER() OVER (
        ORDER BY md5(concat('seed=42:', CAST(doc_id AS VARCHAR))), doc_id)
        AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global training order (md5 rank), computed
    two-level (256 hash-prefix buckets + broadcast base offsets) so no
    single task ever ranks the whole corpus."""
    d = load_table(spark, sf_dir, "documents")
    return curation.deterministic_shuffle(d, "doc_id").select(
        "doc_id", "shuffle_key", "shuffle_pos"
    )


@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
      ROUND(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
      ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        / len(embedding), 4) + 0.0 AS mean_val,
      ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)
        AS max_val
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene stats via higher-order array functions (transform/
    aggregate/array_max) — all JVM-side, no UDF: the pre-normalization
    pass an embedding pipeline runs before cosine retrieval."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.round(F.sqrt(fsum(sq)), 4).alias("l2_norm"),
        (F.round(fsum(dbl) / F.size("embedding"), 4) + 0.0).alias("mean_val"),
        F.round(F.array_max(dbl), 4).alias("max_val"),
    )


@register(
    "corpus_mix_weights",
    oracle="""
    WITH s AS (
      SELECT source,
        COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, total_chars,
      ROUND((SELECT SUM(total_chars) * 1.0 / COUNT(*) FROM s)
            / total_chars, 4) AS mix_weight
    FROM s
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixing weights: the per-source sampling multiplier that
    equalizes character mass across sources (the knob a pretraining
    pipeline turns to hit a target data mixture). One aggregate produces
    one row per source; the global mean rides along as a broadcast
    scalar subquery — nothing here scales with corpus size except the
    first aggregate."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    mean_chars = s.agg(
        (F.sum("total_chars") * 1.0 / F.count("*")).alias("_m")
    )
    return s.crossJoin(F.broadcast(mean_chars)).select(
        "source",
        "n_docs",
        "total_chars",
        F.round(F.col("_m") / F.col("total_chars"), 4).alias("mix_weight"),
    )


@register(
    "text_term_frequencies",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      FROM documents
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM tok GROUP BY term
    ORDER BY n_occurrences DESC, term LIMIT 20
    """,
)
def text_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-20 terms by occurrence (the view a
    pipeline inspects for stopword/boilerplate leakage). TakeOrdered
    top-k, never a full sort."""
    d = load_table(spark, sf_dir, "documents")
    return (
        text.term_rows(d)
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "term")
        .limit(20)
    )


@register(
    "text_tfidf",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term
    )
    SELECT doc_id, term, tf, df,
      ROUND(tf * ln((SELECT COUNT(*) FROM documents) * 1.0 / df), 4) + 0.0
        AS tfidf
    FROM tf JOIN dfreq USING (term)
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus tf-idf (SURVEY §7 phase-2 item): tf × ln(N/df) per
    (doc, term); the df relation is vocabulary-sized and broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    return text.tfidf(d)


# ---------------------------------------------------------------------------
# Round 3 additions: sub-document dedup, retrieval (inverted index + BM25),
# deterministic splits, quality filter chain
# ---------------------------------------------------------------------------


@register(
    "chunk_dedup_exact",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
      SELECT doc_id, i.i AS chunk_idx,
        array_to_string(list_slice(w, i.i*8+1, i.i*8+8), ' ') AS chunk
      FROM d CROSS JOIN LATERAL (
        SELECT unnest(range(0, CAST(ceil(len(w)/8.0) AS BIGINT))) AS i) i
    ), rk AS (
      SELECT doc_id, chunk_idx, chunk,
        ROW_NUMBER() OVER (
          PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
      FROM ch
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      md5(COALESCE(string_agg(chunk, ' ' ORDER BY chunk_idx)
          FILTER (WHERE rn = 1), '')) AS kept_md5
    FROM rk GROUP BY doc_id
    """,
)
def chunk_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: 8-token chunks, global first-occurrence
    wins (C4-style span removal). Only (hash, id, idx) triples shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.chunk_dedup(d, chunk_tokens=8)


@register(
    "inverted_index_postings",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      FROM documents
    ), dt AS (
      SELECT DISTINCT doc_id, term FROM tok
    ), rk AS (
      SELECT term, doc_id,
        ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
        COUNT(*) OVER (PARTITION BY term) AS df
      FROM dt
    )
    SELECT term, CAST(df AS BIGINT) AS df,
      string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_head
    FROM rk WHERE rn <= 20 GROUP BY term, df
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated inverted index: term → df + first-20 posting head. The
    head is ranked BEFORE any collect, so no task holds a full posting
    list (corpus-sized for stopword terms at scale)."""
    d = load_table(spark, sf_dir, "documents")
    return text.inverted_index(d, max_postings=20)


@register(
    "bm25_scores",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      FROM documents
    ), hit AS (
      SELECT doc_id, term FROM tok WHERE term IN ('spark', 'join', 'dup')
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM hit GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM hit GROUP BY term
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        AVG(len(string_split_regex(trim(text), '\s+'))) AS avgdl
      FROM documents
    ), dl AS (
      SELECT doc_id,
        CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS dl
      FROM documents
    )
    SELECT tf.doc_id,
      ROUND(CAST(SUM(CAST(
        CAST(CAST(ln(1.0 + (n - df + 0.5) / (df + 0.5))
             AS DECIMAL(12,4)) AS DOUBLE)
        * (tf * (1.2 + 1.0)
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
        AS DECIMAL(18,6))) AS DOUBLE), 4) + 0.0 AS bm25,
      CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    """,
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 over a 3-term query; per-term contributions summed as
    DECIMAL(18,6) so the score is reduction-order-independent."""
    d = load_table(spark, sf_dir, "documents")
    return text.bm25_scores(d, ["spark", "join", "dup"])


@register(
    "train_split_assign",
    oracle="""
    SELECT doc_id,
      CAST(('0x' || substr(md5('split=1:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 100 AS split_bucket,
      CASE
        WHEN CAST(('0x' || substr(md5('split=1:' || CAST(doc_id AS VARCHAR)),
             1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
        WHEN CAST(('0x' || substr(md5('split=1:' || CAST(doc_id AS VARCHAR)),
             1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
        ELSE 'test'
      END AS split
    FROM documents
    """,
)
def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by seeded md5 bucket
    — stable under corpus growth (no RNG), pure projection."""
    d = load_table(spark, sf_dir, "documents")
    return curation.hash_split(d, "doc_id").select(
        "doc_id", "split_bucket", "split"
    )


@register(
    "quality_filter_chain",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
        string_split_regex(trim(text), '\s+') AS toks,
        length(text) AS n_chars,
        length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
        length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents
    ), r AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
        LEAST(len(list_filter(toks, x -> x IN
          ('the','a','of','and','in','to','is','on','for','with'))) * 1.0
          / len(toks) * 5, 1.0) * 0.5
        + (1 - LEAST(n_punct * 1.0 / n_chars * 10, 1.0)) * 0.25
        + (1 - LEAST(n_upper * 1.0 / n_chars * 10, 1.0)) * 0.25 AS score
      FROM t
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN n_tokens BETWEEN 30 AND 80 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_pass_len,
      CAST(SUM(CASE WHEN score >= 0.65 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_pass_quality,
      CAST(SUM(CASE WHEN n_tokens BETWEEN 30 AND 80 AND score >= 0.65
        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
      ROUND(SUM(CASE WHEN n_tokens BETWEEN 30 AND 80 AND score >= 0.65
        THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS pass_rate
    FROM r GROUP BY source
    """,
)
def quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style filter funnel per source: length gate × quality-score
    gate, with the survival rate a pipeline uses to budget its mixture.
    One aggregate over per-row projections — no extra shuffle."""
    d = load_table(spark, sf_dir, "documents")
    scored = text.with_quality_score(text.with_token_stats(d))
    len_ok = F.col("n_tokens").between(30, 80)
    # the unrounded score, same arithmetic as with_quality_score
    t = text.tokens("text")
    stop_r = F.size(F.filter(t, lambda x: x.isin(*text.STOPWORDS))) / F.size(t)
    punct_r = F.length(
        F.regexp_replace(F.col("text"), r"[^!-/:-@\[-`{-~]", "")
    ) / F.length("text")
    upper_r = F.length(
        F.regexp_replace(F.col("text"), r"[^A-Z]", "")
    ) / F.length("text")
    score = (
        F.least(stop_r * 5, F.lit(1.0)) * 0.5
        + (1 - F.least(punct_r * 10, F.lit(1.0))) * 0.25
        + (1 - F.least(upper_r * 10, F.lit(1.0))) * 0.25
    )
    qual_ok = score >= 0.65
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(len_ok.cast("int")).cast("bigint").alias("n_pass_len"),
        F.sum(qual_ok.cast("int")).cast("bigint").alias("n_pass_quality"),
        F.sum((len_ok & qual_ok).cast("int")).cast("bigint").alias("n_pass_all"),
        F.round(
            F.sum((len_ok & qual_ok).cast("int")) * 1.0 / F.count("*"), 4
        ).alias("pass_rate"),
    )


@register("dedup_clusters_largestar", oracle=_CLUSTER_ORACLE)
def dedup_clusters_largestar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as dedup_clusters (MinHash-LSH pairs → connected
    components → smallest-id representative) but clustered with the
    alternating large-star/small-star algorithm (Kiveris et al.,
    SoCC'14) — O(log n) rounds on ANY graph shape, where min-label
    propagation needs O(diameter). This is the variant to run when the
    dup graph may contain long chains (mirror sites chaining near-dups)
    rather than shallow stars. Shares the recursive-CTE oracle: both
    algorithms compute the same components."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.8)
    return dedup.cluster_pairs_star(pairs)
