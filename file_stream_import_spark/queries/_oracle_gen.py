"""Programmatically generated DuckDB oracle SQL for hash-parameterized
operators (SimHash bit voting, hyperplane-LSH buckets, winnowing).

These operators were rows-only in rounds 1-2 because their hot path used
xxhash64 (JVM-only). Round 3 switches the registered queries to the
portable 60-bit md5 hash (operators/text.py:portable_hash60), which
DuckDB reproduces exactly — so candidate generation AND metric values
are now fully oracle-checked. The SQL below is long (60 bit-vote sums,
per-plane dot products) so it is built by loops rather than written out.
"""

from __future__ import annotations

from ..operators.similarity import _hyperplane_signs

# DuckDB twin of operators/text.py:portable_hash60.
_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def simhash_pairs_oracle(max_hamming: int = 3) -> str:
    """Brute-force all-pairs SimHash (portable 60-bit token hash) —
    exactly the pair set the banded Spark operator emits (banding is a
    complete candidate generator by pigeonhole)."""
    sums = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN w ELSE -w END) AS s{i}"
        for i in range(60)
    )
    bits = "\n        | ".join(
        f"((CASE WHEN s{i} > 0 THEN 1 ELSE 0 END)::BIGINT << {i})"
        for i in range(60)
    )
    h = _H60.format(x="tok")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), tw AS (
      SELECT doc_id, tok, COUNT(*)::DOUBLE AS w FROM tok GROUP BY doc_id, tok
    ), h AS (
      SELECT doc_id, w, {h} AS h FROM tw
    ), bits AS (
      SELECT doc_id,
        {sums}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id,
        {bits} AS simhash
      FROM bits
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def winnow_oracle(k: int = 4, window: int = 5, max_doc_id: int = 20) -> str:
    """Winnowing fingerprints with the portable hash: per-doc sliding
    min over shingle hashes; docs with < window shingles emit the min
    over what they have (matches operators/text.py:winnow_fingerprints)."""
    shingle = " || ' ' || ".join(f"t[u.i + {j}]" if j else "t[u.i]" for j in range(k))
    h = _H60.format(x=f"({shingle})")
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < {max_doc_id}
    ), sh AS (
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, {h} AS h
      FROM tok, UNNEST(range(1, len(t) - {k - 2})) AS u(i)
      WHERE len(t) >= {k}
    ), win AS (
      SELECT doc_id, pos,
        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS fp,
        MAX(pos) OVER (PARTITION BY doc_id) AS maxpos
      FROM sh
    )
    SELECT DISTINCT doc_id, fp FROM win
    WHERE pos >= LEAST({window - 1}, maxpos)
    """


def _bucket_expr(num_planes: int, dim: int, vec: str) -> str:
    """Hyperplane sign-pattern bucket — same md5-derived Rademacher
    planes as operators/similarity.py:_hyperplane_signs, inlined as
    array literals."""
    planes = _hyperplane_signs(num_planes, dim)
    terms = []
    for p, signs in enumerate(planes):
        arr = "[" + ", ".join(f"{s:.1f}" for s in signs) + "]"
        terms.append(
            f"((CASE WHEN list_dot_product({vec}, {arr}) > 0 "
            f"THEN 1 ELSE 0 END)::BIGINT << {p})"
        )
    return "\n        | ".join(terms)


def lsh_pairs_oracle(
    num_planes: int = 4, dim: int = 64, min_cos: float = 0.25
) -> str:
    bucket = _bucket_expr(num_planes, dim, "v")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (
      SELECT vec_id, v,
        {bucket} AS bucket
      FROM e
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           FLOOR(list_cosine_similarity(a.v, c.v) * 1e6 + 0.5) / 1e6 + 0.0 AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE list_cosine_similarity(a.v, c.v) >= {min_cos}
    """


def lsh_knn_oracle(
    num_planes: int = 6, dim: int = 64, k: int = 5, max_query_id: int = 10
) -> str:
    bucket = _bucket_expr(num_planes, dim, "v")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (
      SELECT vec_id, v,
        {bucket} AS bucket
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
          WHERE vec_id < {max_query_id}),
    cand AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(b.v, q.qv) AS cos
      FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM cand
    )
    SELECT query_id, neighbor_id, FLOOR(cos * 1e6 + 0.5) / 1e6 + 0.0 AS cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {k}
    """


def frame_sample_oracle(every_n_bytes: int = 64, max_doc_id: int = 20) -> str:
    """Byte-window frame sampling over the fake payload (UTF-8 of text):
    checksum = 60-bit md5 of the frame's uppercase-hex form, computable
    without blob slicing (operators/multimodal.py:_frame_checksum)."""
    sub = f"substring(hx, u.i * 2 + 1, {every_n_bytes * 2})"
    h = _H60.format(x=sub)
    return f"""
    WITH d AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             GREATEST(octet_length(encode(text)), 1) AS nb
      FROM documents WHERE doc_id < {max_doc_id}
    )
    SELECT doc_id, CAST(u.i // {every_n_bytes} AS INT) AS frame_idx,
           {h} AS frame_checksum
    FROM d, UNNEST(range(0, nb, {every_n_bytes})) AS u(i)
    """


_MARKER_VALUES = None


def lang_id_oracle() -> str:
    """Marker-vote language ID: weighted token votes, argmax with
    alphabetical tie-break, CJK codepoint short-circuit — the exact
    logic of operators/text.py:with_lang_id."""
    from ..operators.text import _LANG_MARKERS

    vals = ",\n      ".join(
        f"('{lang}', '{marker}', {weight})"
        for lang, marker, weight in _LANG_MARKERS
    )
    return f"""
    WITH m(lang, marker, weight) AS (VALUES
      {vals}
    ),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    votes AS (
      SELECT doc_id, lang, SUM(weight) AS score
      FROM tok JOIN m ON tok = marker
      GROUP BY doc_id, lang
    ),
    best AS (
      SELECT doc_id, lang, ROUND(score, 2) AS lang_score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
      FROM votes
    )
    SELECT d.doc_id,
      CASE WHEN regexp_matches(d.text, '[一-鿿]') THEN 'zh'
           ELSE COALESCE(b.lang, 'unknown') END AS lang_pred,
      COALESCE(b.lang_score, 0.0) AS lang_score
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
    """


def gen_locations_oracle(n_rows: int, seed: int = 0) -> str:
    """DuckDB twin of io/generator.py:generate_locations — every column
    is a pure md5 function of (seed, id), so the generator itself (O13,
    cmd/gen_file/main.go) is fully oracle-checked."""
    from ..io.generator import BUSINESSES, COUNTRIES, LOCNAMES, TIMEZONES

    def h(field: str) -> str:
        return _H60.format(x=f"'{seed}:{field}:' || CAST(id AS VARCHAR)")

    def pick(field: str, domain: tuple[str, ...]) -> str:
        lst = "[" + ", ".join(f"'{x}'" for x in domain) + "]"
        return f"list_extract({lst}, CAST({h(field)} % {len(domain)} AS INT) + 1)"

    def suffixed(field: str, domain: tuple[str, ...]) -> str:
        return (
            f"{pick(field, domain)} || '_' || "
            f"CAST({h(field + '_n')} % 1000 AS VARCHAR)"
        )

    return f"""
    SELECT
      'LOC' || lpad(CAST(id AS VARCHAR), 12, '0') AS locid,
      {pick("tz", TIMEZONES)} AS loctimezone,
      {pick("country", COUNTRIES)} AS country,
      {suffixed("locname", LOCNAMES)} AS locname,
      {suffixed("business", BUSINESSES)} AS business
    FROM (SELECT range AS id FROM range(1, {n_rows + 1}))
    """
