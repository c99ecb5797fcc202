"""Deduplication family for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash — all as DataFrame compositions (no Python
UDFs, no driver-side loops), designed so only *candidate* pairs are ever
joined at scale.

The reference's only dedup is keyed last-writer-wins on `locid`
(internal/db/db.go:63-72 — see operators/upsert.py); the content-based
family here is a north-star addition (BASELINE.json).

Scale architecture (the standard web-scale dedup pipeline):
  exact     — one hash-aggregate on md5(text): a single shuffle of
              (hash, id), never the text bodies.
  jaccard   — quadratic in documents *sharing a shingle*; document-
              frequency capping (drop shingles with df > cap) bounds the
              worst-case bucket, the classic guard against "the the the".
  minhash   — O(n·k) signature pass + banded LSH bucketing: the shuffle
              carries (band_hash, id) pairs only; exact Jaccard verify
              runs on candidates only. This is the 100 TB path.
  simhash   — 64-bit signatures via weighted bit voting; hamming-ball
              lookup by 16-bit band exact-match (any pair within distance
              3 shares at least one of 4 bands, pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import portable_hash60, tokens

# MinHash parameters: 128 hashes = 32 bands × 4 rows. For Jaccard j the
# candidate-recall is 1-(1-j^4)^32: j=0.8 → 0.99998, j=0.5 → 0.87.
# Misses at the 0.8 threshold are ~1e-7 — the LSH output equals the
# exact-Jaccard output with near-certainty, which is why the registry can
# share the oracle SQL between minhash and exact.
NUM_HASHES = 128
BANDS = 32
ROWS_PER_BAND = NUM_HASHES // BANDS


def lsh_candidate_probability(jaccard: float, bands: int, rows_per_band: int) -> float:
    """P(a pair with this Jaccard shares >=1 LSH band): 1-(1-j^r)^b."""
    return 1.0 - (1.0 - jaccard ** rows_per_band) ** bands


def band_params(
    threshold: float,
    num_hashes: int = NUM_HASHES,
    fp_jaccard: float | None = None,
    fp_budget: float = 0.05,
) -> tuple[int, int]:
    """Derive (bands, rows_per_band) for a target Jaccard threshold —
    the tunable a real dedup user reaches for instead of fixed 32x4.

    The banded S-curve's midpoint sits at (1/b)^(1/r) (where candidate
    probability ~= 1-1/e); among splits with b*r <= num_hashes, pick the
    one whose midpoint is closest to ``threshold``. When ``fp_jaccard``
    is given, only splits whose candidate probability at that (lower)
    similarity stays within ``fp_budget`` are eligible — the false-
    positive knob: each FP candidate costs an exact-Jaccard verify, so
    at 100 TB the budget bounds verify-stage work. Raises when no split
    can satisfy the budget (the caller must raise num_hashes).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best: tuple[float, int, int] | None = None
    for r in range(1, num_hashes + 1):
        b = num_hashes // r
        if b < 1:
            break
        if (
            fp_jaccard is not None
            and lsh_candidate_probability(fp_jaccard, b, r) > fp_budget
        ):
            continue
        mid = (1.0 / b) ** (1.0 / r)
        cand = (abs(mid - threshold), b, r)
        if best is None or cand < best:
            best = cand
    if best is None:
        raise ValueError(
            f"no (bands, rows) split of {num_hashes} hashes keeps the "
            f"candidate rate at jaccard={fp_jaccard} under {fp_budget}; "
            "increase num_hashes"
        )
    return best[1], best[2]


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct k-token shingles per document (built-ins only).

    The token array is projected to a real column before the shingle
    transform: expressions captured inside a higher-order-function
    lambda are re-evaluated per element, so ``element_at(tokens(text),
    i + j)`` would re-run the whole regex split k times per shingle
    position — quadratic in document length. An attribute reference
    keeps it one tokenization per row.
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    t = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)]),
    )
    return (
        base.filter(F.size(t) >= k)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via content-hash group-by: one row per distinct
    normalized text, with the canonical (minimum) id and the copy count.
    Only (hash, id) shuffles — text bodies never move."""
    norm = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(norm.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _pair_jaccard(sh: DataFrame, id_col: str, pairs: DataFrame | None) -> DataFrame:
    """Exact Jaccard for doc pairs sharing ≥1 shingle (optionally
    restricted to a candidate ``pairs`` frame with doc_a/doc_b).

    When ``pairs`` is given the pruning happens BEFORE the quadratic
    work, not after: each side of the shingle self-join is semi-joined
    down to the candidate doc ids first, and the joined co-shingle rows
    are semi-joined to candidate (doc_a, doc_b) before the groupBy — so
    the self-join and aggregation touch candidate docs only (the
    property the incremental LSH mode depends on for O(|new|) dailies).
    Per-doc shingle sizes still come from the FULL frame (a linear
    aggregate): Jaccard's denominator needs each doc's total count.
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    if pairs is not None:
        a = a.join(pairs.select("doc_a").distinct(), "doc_a", "left_semi")
        b = b.join(pairs.select("doc_b").distinct(), "doc_b", "left_semi")
    joined = a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
    if pairs is not None:
        joined = joined.join(pairs, ["doc_a", "doc_b"], "left_semi")
    inter = joined.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (the quadratic baseline).

    ``max_df`` drops shingles appearing in more than that many docs
    before the self-join — the standard bound on hot-shingle blowup at
    scale (a shingle in f docs contributes f² join rows).
    """
    sh = shingles(df, id_col, text_col, k)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    return _pair_jaccard(sh, id_col, None).filter(F.col("jaccard") >= threshold)


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.7,
    max_df: int | None = None,
) -> DataFrame:
    """Directed shingle *containment* C(src,dst) = |S(src)∩S(dst)|/|S(src)|.

    The asymmetric complement to Jaccard: catches subset duplication
    (page + boilerplate, doc + quoted excerpt) that a symmetric ratio
    dilutes — a 100-shingle doc fully contained in a 10000-shingle doc
    has Jaccard ≈ 0.01 but containment 1.0. Same bounded candidate
    generation as :func:`ngram_jaccard_pairs` (shingle equi-join,
    optional df cap against hot shingles); the undirected intersection
    is computed once and unfolded into both directions, so the join
    work doesn't double.
    """
    sh = shingles(df, id_col, text_col, k)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    both = inter.join(
        sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n", "na"),
        "doc_a",
    ).join(
        sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n", "nb"),
        "doc_b",
    )
    # Unfold the two directions with explode INSIDE one lineage — a
    # union of two selects over `both` would duplicate the whole
    # shingle-join subtree (2× the scans and shuffles at scale).
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"),
                    F.col("doc_b").alias("dst"),
                    F.round(F.col("inter") / F.col("na"), 4).alias(
                        "containment"
                    ),
                ),
                F.struct(
                    F.col("doc_b").alias("src"),
                    F.col("doc_a").alias("dst"),
                    F.round(F.col("inter") / F.col("nb"), 4).alias(
                        "containment"
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return directed.filter(F.col("containment") >= threshold)


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = NUM_HASHES
) -> DataFrame:
    """One aggregation pass computes the whole signature: for seed i,
    sig_i = min over shingles of xxhash64(i, shingle). xxhash64 is
    JVM-side and deterministic — no Python, no randomness at runtime."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _band_hash_array(bands: int, rows_per_band: int):
    """Array of (band, xxhash64 of that band's signature rows) structs."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection, exact-verified.

    Pipeline: shingle → ``num_hashes``-hash signature (one groupBy) →
    ``bands`` band hashes → explode → bucket join on (band, band_hash)
    → candidate pairs → exact Jaccard verify → threshold filter.

    The only all-pairs work happens inside LSH buckets; everything else
    is linear. This is the operator you run at 100 TB where
    ngram_jaccard_pairs is the small-data oracle. The default 32×4
    split's S-curve midpoint is ~0.56 (high recall at 0.8); derive a
    tuned split for another threshold/FP budget with ``band_params`` and
    pass it here.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band < 1:
        raise ValueError(f"bands={bands} > num_hashes={num_hashes}")
    sh = shingles(df, id_col, text_col, k)
    sig = minhash_signatures(sh, id_col, num_hashes=num_hashes)
    bucketed = sig.select(
        F.col(id_col),
        F.explode(_band_hash_array(bands, rows_per_band)).alias("e"),
    ).select(
        id_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    left = bucketed.select(F.col(id_col).alias("doc_a"), "band", "bh")
    right = bucketed.select(F.col(id_col).alias("doc_b"), "band", "bh")
    candidates = (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _pair_jaccard(sh, id_col, candidates).filter(
        F.col("jaccard") >= threshold
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """64-bit SimHash per document with token-frequency weights.

    Bit i of the signature is the sign of Σ_tokens w(t)·(±1 given bit i
    of hash(t)). Expressed as 64 conditional sums in ONE aggregation
    (columnar, codegen'd); the shuffle carries (id, token, weight).

    ``portable_hash=True`` swaps xxhash64 for the md5-derived 60-bit
    token hash (operators/text.py:portable_hash60) — bits 60-63 then
    vote 0 in every signature, and the whole signature set is
    reproducible in DuckDB for oracle checking. xxhash64 stays the
    production default (faster, full 64 bits).
    """
    hash_fn = portable_hash60 if portable_hash else F.xxhash64
    toks = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").cast("double").alias("w"))
        .withColumn("h", hash_fn(F.col("tok")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"s{i}")
        for i in range(64)
    ]
    summed = toks.groupBy(id_col).agg(*bit_sums)
    simhash = None
    for i in range(64):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        simhash = term if simhash is None else simhash.bitwiseOR(term)
    return summed.select(F.col(id_col), simhash.alias("simhash"))


def hamming_neardup_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs within a hamming ball over ANY 64-bit signature
    column (SimHash over text, aHash over images, ...).

    Pigeonhole banding: any two signatures within hamming distance 3
    agree exactly on ≥1 of 4 disjoint 16-bit bands, so bucket-joining on
    band value finds all such pairs without an all-pairs scan; verify
    with bit_count(xor). Banding is a complete (not approximate)
    candidate generator, so the output equals the brute-force pair set.
    """
    if max_hamming > 3:
        raise ValueError(
            "4x16-bit banding is complete only for max_hamming <= 3; "
            f"got {max_hamming} (use more, narrower bands)"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(sig_col, 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bv"),
            )
            for b in range(4)
        ]
    )
    bucketed = sig.select(id_col, sig_col, F.explode(bands).alias("e")).select(
        id_col, sig_col, F.col("e.band").alias("band"), F.col("e.bv").alias("bv")
    )
    left = bucketed.select(
        F.col(id_col).alias("doc_a"), F.col(sig_col).alias("sig_a"), "band", "bv"
    )
    right = bucketed.select(
        F.col(id_col).alias("doc_b"), F.col(sig_col).alias("sig_b"), "band", "bv"
    )
    return (
        left.join(right, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    portable_hash: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs within a hamming ball (see
    hamming_neardup_pairs for the banding/completeness argument)."""
    sig = simhash_signatures(df, id_col, text_col, portable_hash)
    return hamming_neardup_pairs(sig, id_col, "simhash", max_hamming)


def cluster_pairs(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs: every document that
    appears in a pair gets a ``cluster_id`` = the smallest doc id
    reachable through the dup graph (the canonical representative a
    dedup pipeline keeps).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels; converges in O(component
    diameter) rounds — near-dup clusters are shallow (dups of a common
    source), so 3-5 rounds in practice. Each round is one shuffle of the
    (src, label) edge join; lineage is cut with localCheckpoint so the
    plan doesn't grow superlinearly. At 100 TB scale swap the loop body
    for the large-star/small-star iteration (Kiveris et al.) — same
    driver-loop skeleton, provably O(log n) rounds on adversarial
    graphs.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                labels["id"],
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint(eager=True)
        changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        labels = stepped.select("id", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """Sub-document exact dedup (the C4/RefinedWeb span-removal form):
    split each document into fixed ``chunk_tokens``-token chunks, hash
    each chunk, and drop every chunk whose content already occurred
    earlier in the corpus (global first occurrence by (doc_id, position)
    wins). Catches boilerplate shared across otherwise-distinct pages —
    the duplication mode whole-document dedup cannot see.

    Returns one row per surviving document: total / duplicated chunk
    counts and the md5 of the re-assembled deduplicated text.

    Scale shape: the only corpus-sized shuffle carries (chunk_hash,
    doc_id, idx) triples — chunk TEXT never shuffles (the hash is
    recomputed per row, text stays columnar at the scan); first-
    occurrence choice is one ranked window per hash partition, then one
    re-aggregate per document. No collect, no quadratic step; hot
    chunks (a boilerplate banner on every page) skew one hash partition,
    which AQE's skew-join/partition splitting absorbs.
    """
    from pyspark.sql import Window as W

    # Blank docs tokenize to [''] (split of an empty string), not [] —
    # drop them up front so they emit no chunks at all.
    df = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    # Project tokens to a column: a captured expression inside the
    # transform lambda is re-evaluated per element, so slice(tokens(..))
    # would re-tokenize the document once per chunk.
    if "_toks" in df.columns:
        # withColumn REPLACES an existing column of the same name —
        # guard instead of silently clobbering caller data (ADVICE r16)
        raise ValueError(
            "chunk_dedup: column '_toks' already exists on the input "
            "(reserved for the projected token array)"
        )
    df = df.withColumn("_toks", tokens(text_col))
    t = F.col("_toks")
    n_chunks = F.ceil(F.size(t) / F.lit(chunk_tokens))
    # sequence(0, n-1): lazy CaseWhen guards the n==0 descending-sequence
    # trap (empty text ⇒ sequence(0,-1) would yield [0,-1], not []).
    chunks = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(t, i * chunk_tokens + 1, chunk_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ch = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    first = W.partitionBy(F.md5("chunk")).orderBy(id_col, "chunk_idx")
    rk = ch.withColumn("rn", F.row_number().over(first))
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(
                F.col("rn") == 1,
                F.struct(F.col("chunk_idx"), F.col("chunk")),
            )
        )
    )
    return rk.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum((F.col("rn") > 1).cast("int")).cast("bigint").alias("n_dup_chunks"),
        F.md5(
            F.concat_ws(
                " ", F.transform(kept_sorted, lambda s: s.getField("chunk"))
            )
        ).alias("kept_md5"),
    )


def cluster_pairs_star(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the adversarial-graph upgrade over min-label propagation
    (cluster_pairs): O(log n) rounds on ANY graph, including the long
    chains and high-diameter components where label propagation needs
    O(diameter) rounds.

    Each round is two groupBy-min + join passes over the edge set:

    * large-star: every node links its LARGER neighbors to its minimum
      neighbor (tree flattening);
    * small-star: every node links its smaller-or-equal neighbors to
      the minimum (star contraction).

    At the fixpoint the edge set IS the component map (node → component
    minimum). Same output contract as cluster_pairs: (doc_id,
    cluster_id = smallest reachable id). Per-round lineage is cut with
    localCheckpoint; convergence is an exact edge-set checksum, not a
    driver collect of the edges.
    """

    def _dedup(e: DataFrame) -> DataFrame:
        return e.filter(F.col("src") != F.col("dst")).distinct()

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        m = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return _dedup(
            sym.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        hi_lo = e.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        ).distinct()
        m = hi_lo.groupBy("u").agg(F.min("v").alias("m"))
        linked = hi_lo.join(m, "u")
        return _dedup(
            linked.select(F.col("v").alias("src"), F.col("m").alias("dst")).union(
                linked.select(F.col("u").alias("src"), F.col("m").alias("dst"))
            )
        )

    def checksum(e: DataFrame):
        # bit_xor, not sum: a sum of 64-bit hashes overflows under ANSI
        # mode; xor is overflow-free and exact for a DISTINCT edge set.
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).collect()[0]
        return row.n, row.h

    edges = _dedup(
        pairs.select(
            F.col(id_a).cast("bigint").alias("src"),
            F.col(id_b).cast("bigint").alias("dst"),
        )
    ).localCheckpoint(eager=True)
    prev = checksum(edges)
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur
    # fixpoint edges: (node, component-min). Roots appear only as dst.
    nodes = edges.select("src").union(edges.select("dst")).distinct()
    return (
        nodes.join(edges, "src", "left")
        .select(
            F.col("src").cast("bigint").alias("doc_id"),
            F.coalesce(F.col("dst"), F.col("src")).cast("bigint").alias("cluster_id"),
        )
    )


def minhash_lsh_pairs_incremental(
    df: DataFrame,
    new_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> DataFrame:
    """Incremental MinHash-LSH: near-dup pairs between the NEW slice
    (rows where ``new_pred`` holds) and the EXISTING corpus — the daily
    ingest form of dedup at 100 TB, where re-running all-pairs over the
    whole corpus every day is not an option.

    Candidate generation joins new-side band buckets against old-side
    band buckets only (no old×old, no new×new), so daily work is
    O(|new| + matching buckets). In production the old side's
    signatures and band buckets are precomputed state loaded from the
    signature store; here both sides derive in one lineage so the
    operator stays oracle-checkable end-to-end. Candidates are
    canonicalized to (min, max) id order before the exact-Jaccard
    verify, which scores candidates only (the shingle self-join is
    semi-joined down to candidate docs first — see _pair_jaccard).
    Tune (num_hashes, bands) per threshold/FP budget via ``band_params``.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band < 1:
        raise ValueError(f"bands={bands} > num_hashes={num_hashes}")
    sh = shingles(df, id_col, text_col, k)
    sig = minhash_signatures(sh, id_col, num_hashes=num_hashes)
    flags = df.select(F.col(id_col), new_pred.alias("__is_new"))
    bucketed = (
        sig.join(flags, id_col)
        .select(
            F.col(id_col),
            "__is_new",
            F.explode(_band_hash_array(bands, rows_per_band)).alias("e"),
        )
        .select(
            id_col,
            "__is_new",
            F.col("e.band").alias("band"),
            F.col("e.bh").alias("bh"),
        )
    )
    old = bucketed.filter(~F.col("__is_new")).select(
        F.col(id_col).alias("old_id"), "band", "bh"
    )
    new = bucketed.filter(F.col("__is_new")).select(
        F.col(id_col).alias("new_id"), "band", "bh"
    )
    candidates = (
        old.join(new, ["band", "bh"])
        .select(
            F.least("old_id", "new_id").alias("doc_a"),
            F.greatest("old_id", "new_id").alias("doc_b"),
        )
        .distinct()
    )
    return _pair_jaccard(sh, id_col, candidates).filter(
        F.col("jaccard") >= threshold
    )
