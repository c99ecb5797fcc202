"""Custom Python DataSource (Spark 4 DSv2-Python API): the reference's
synthetic locations generator (cmd/gen_file/main.go, O13) as a true
pluggable SOURCE — ``spark.read.format("locations_gen")`` — instead of a
DataFrame helper.

Why this exists alongside io/generator.py (the spark.range form): the
DataSource API is the engine's extension point for sources Spark has no
built-in reader for (internal services, proprietary formats, synthetic
feeds). Implementing the generator through it exercises the full
contract — name/schema/reader registration, PLANNED PARTITIONS (each
``InputPartition`` carries an id range, so parallelism is the planner's
choice, not the data's), and Arrow-batch emission from ``read`` so rows
cross the Python→JVM boundary columnar, not row-at-a-time.

Determinism contract shared with io/generator.py: every field is a pure
function of (seed, field, id) through md5, so the SAME (n_rows, seed)
yields byte-identical tables from either implementation at any
partitioning — asserted in tests/test_reference_core.py. That also keeps
this source oracle-checkable by the same DuckDB SQL as gen_locations.

Scale: partitions are independent id ranges (no shared RNG state — the
reference's per-worker ``rand`` seeding, main.go:49-50, made parallel
determinism impossible); a 10^9-row synthetic feed is just more
partitions. Batches are built with pyarrow in ROWS_PER_BATCH chunks to
bound per-task memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .generator import BUSINESSES, COUNTRIES, LOCNAMES, TIMEZONES

SCHEMA = (
    "locid string, loctimezone string, country string, "
    "locname string, business string"
)
ROWS_PER_BATCH = 30_000  # the reference generator's batch size (main.go:17)


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


def _h60(field: str, idx: int, seed: int) -> int:
    """Python twin of generator._h60: first 15 md5 hex chars as int —
    identical draws to the JVM expression form (and DuckDB's)."""
    s = f"{seed}:{field}:{idx}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _row(idx: int, seed: int) -> tuple[str, str, str, str, str]:
    def pick(field: str, domain: tuple[str, ...]) -> str:
        return domain[_h60(field, idx, seed) % len(domain)]

    def suffixed(field: str, domain: tuple[str, ...]) -> str:
        return (
            f"{pick(field, domain)}_"
            f"{_h60(field + '_n', idx, seed) % 1000}"
        )

    return (
        f"LOC{idx:012d}",
        pick("tz", TIMEZONES),
        pick("country", COUNTRIES),
        suffixed("locname", LOCNAMES),
        suffixed("business", BUSINESSES),
    )


class LocationsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1_000_000))
        self.seed = int(options.get("seed", 0))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> list[InputPartition]:
        per = -(-self.n_rows // self.num_partitions)
        return [
            _IdRange(lo, min(lo + per, self.n_rows + 1), self.seed)
            for lo in range(1, self.n_rows + 1, per)
        ]

    def read(self, partition: _IdRange) -> Iterator:
        import pyarrow as pa

        for lo in range(partition.start, partition.end, ROWS_PER_BATCH):
            hi = min(lo + ROWS_PER_BATCH, partition.end)
            rows = [_row(i, partition.seed) for i in range(lo, hi)]
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[c] for r in rows]) for c in range(5)],
                names=[
                    "locid", "loctimezone", "country", "locname", "business",
                ],
            )


class LocationsDataSource(DataSource):
    """``spark.dataSource.register(LocationsDataSource)`` then
    ``spark.read.format("locations_gen").option("rows", n).load()``."""

    @classmethod
    def name(cls) -> str:
        return "locations_gen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> LocationsReader:
        return LocationsReader(self.options)
