"""Query registry — the single source of truth consumed by __spark_entry__.py.

Every implemented operator registers here as a named callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. The driver hash-compares
the two at sf0.01 (columns sorted by name, order-insensitive value hash),
so:

  * every computed column is aliased IDENTICALLY in both forms;
  * double aggregates are rounded identically on both sides (a sum of
    600k doubles differs in the last ulp between engines depending on
    reduction order — rounding to a fixed scale makes the hash stable);
  * dates/timestamps in output are formatted to strings identically
    (sidesteps ns-vs-us precision and tz-serialization differences);
  * integer-valued computed columns are cast to BIGINT on both sides
    (DuckDB SUM(int) yields HUGEINT, which pandas renders as float).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        prev = QUERIES.get(name)
        # Allow re-registration of the SAME function (module reloads in
        # tests); a DIFFERENT function under an existing name silently
        # replaced it once (round-5 retention_cohorts collision) — fail
        # loudly instead.
        if prev is not None and getattr(prev, "__module__", None) != getattr(
            fn, "__module__", None
        ):
            raise ValueError(
                f"query name {name!r} already registered by "
                f"{prev.__module__}; pick a distinct name"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    # NOTE: `stats` is imported LAST on purpose — registration order is
    # the tiebreak within the rank-0 (never-driver-checked) cohort, and
    # new queries must queue BEHIND the existing rank-0 entries so they
    # don't displace them from the driver's ~50-query window.
    from . import (  # noqa: F401
        analytics,
        graph,
        llm,
        mlprep,
        relational,
        streaming_batch,
        tpch,
        stats,
        round4,
        round5,
        round6,
        round7,
        round9,
        round10,
        round11,
        round12,
        round13,
        round14,
        round15,
        round16,
    )


# Staleness-driven evaluation order. The driver checks only the first
# ~50 registry entries per round, so ordering decides which queries get
# fresh correctness evidence. driver_evidence.json records, per query,
# the round of its most recent driver row and a hash of the query's
# source + oracle SQL *as of that run*. Ordering:
#   rank 0 — no evidence, or the current source hash differs from the
#            recorded one (code/oracle changed since last verified);
#   rank N — evidence from round N, oldest rounds first (rotation).
# Regenerate the file after each driver round — BEFORE editing any
# query — with tools/update_evidence.py.


def _src_hash(name: str) -> str:
    """Hash of the registered fn's source + its oracle SQL."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(QUERIES[name])
    except (OSError, TypeError):  # pragma: no cover — REPL-defined fn
        src = repr(QUERIES[name])
    blob = src + "\x00" + ORACLE.get(name, "")
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _load_evidence() -> dict:
    import json
    from pathlib import Path

    path = Path(__file__).with_name("driver_evidence.json")
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):  # pragma: no cover — missing file
        return {}


_ORDER_CACHE: list[str] | None = None
_ORDER_CACHE_KEY: tuple[str, ...] | None = None


def _ordered(d: dict) -> dict:
    # Source-hashing every registered fn costs ~1 ms each; the order is
    # stable within a process, so compute it once (all_queries +
    # all_oracle_sql would otherwise pay it twice per harness start).
    # Keyed on the full membership tuple, not len(): a same-length
    # re-registration (tests swapping a query) must invalidate too.
    global _ORDER_CACHE, _ORDER_CACHE_KEY
    key = tuple(QUERIES)
    if _ORDER_CACHE is None or _ORDER_CACHE_KEY != key:
        _ORDER_CACHE_KEY = key
        evidence = _load_evidence()

        def rank(name: str) -> int:
            row = evidence.get(name)
            if row is None or row.get("src_hash") != _src_hash(name):
                return 0  # never checked, or changed since its last check
            return int(row.get("round", 0))

        names = list(QUERIES)  # registration order as the stable tiebreak
        _ORDER_CACHE = sorted(names, key=lambda n: (rank(n), names.index(n)))
    return {n: d[n] for n in _ORDER_CACHE if n in d}


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return _ordered(ORACLE)
