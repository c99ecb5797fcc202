"""Deterministic pagination + JSON page aggregation.

Reference behavior (internal/db/db.go:111-137):
  * ``SELECT * FROM locations LIMIT $1 OFFSET $2`` — NO order by, so the
    reference's pages are nondeterministic (db.go:115-117). A distributed
    engine must impose a total order or pages overlap between runs; we
    always sort by an explicit key (documented deviation, SURVEY.md §7).
  * The page is returned as one JSON array; an empty page is ``[]`` not
    null (COALESCE(json_agg(...), '[]'), db.go:113).

Scale: orderBy+limit compiles to TakeOrderedAndProject (no global sort
materialization); offset pages deep into 100 TB should instead use
keyset pagination (``WHERE key > last_seen LIMIT n``) — provided here as
``paginate_after`` — because OFFSET must still scan+discard offset rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def paginate(
    df: DataFrame, order_by: list[str | Column], limit: int = 10, offset: int = 0
) -> DataFrame:
    """LIMIT/OFFSET page with a deterministic total order (reference O7)."""
    out = df.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def paginate_after(
    df: DataFrame, key: str, after: object | None, limit: int = 10
) -> DataFrame:
    """Keyset pagination — the scalable form of O7: seek past the last key
    of the previous page instead of discarding ``offset`` rows."""
    out = df if after is None else df.filter(F.col(key) > F.lit(after))
    return out.orderBy(key).limit(limit)


def to_json_page(df: DataFrame) -> str:
    """Render a (small, already-paginated) DataFrame as one JSON array
    string; empty input yields ``[]`` (reference O8, db.go:113-118)."""
    rows = df.toJSON().collect()
    return "[" + ",".join(rows) + "]"
