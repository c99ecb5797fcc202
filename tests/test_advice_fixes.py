"""Regression tests for the round-1 ADVICE findings:

1. winnow_fingerprints crashed on docs with < k tokens (descending
   sequence(1, 0) → element_at out of bounds).
2. asof_join could stitch payload values from DIFFERENT right rows when
   a payload column held NULL (per-column last(ignorenulls) is not
   row-atomic).
3. _pg_connect's pg8000 fallback returned a class that could never work;
   now psycopg2-only with a clear error, and the emitted upsert SQL is
   testable on a fake connection (see test_reference_core.py for the
   full chunking parity test).
4. redact_pii mangled identifiers of <= 4 chars (non-positive substr
   start counts from the string end in Spark).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.operators import text
from file_stream_import_spark.operators.asof import asof_join
from file_stream_import_spark.operators.curation import redact_pii


class TestWinnowShortDocs:
    def test_short_docs_yield_no_fingerprints_and_dont_crash(self, spark):
        df = spark.createDataFrame(
            [
                (1, "only two"),                      # < k=4 tokens
                (2, "three tokens here"),             # still < k
                (3, ""),                              # empty
                (4, "alpha beta gamma delta epsilon zeta eta theta"),
            ],
            "doc_id long, text string",
        )
        fps = text.winnow_fingerprints(df).collect()
        ids = {r["doc_id"] for r in fps}
        assert ids == {4}  # short docs silently contribute nothing

    def test_exactly_k_tokens_yields_one_fingerprint(self, spark):
        # Round-2 ADVICE: docs with >= 1 but < window shingles used to be
        # invisible to winnowing; now they emit the min hash over the
        # shingles they do have.
        df = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string"
        )
        rows = text.winnow_fingerprints(df).collect()
        assert len(rows) == 1
        expected = df.select(
            F.xxhash64(F.lit("a b c d")).alias("h")
        ).collect()[0]["h"]
        assert rows[0]["fp"] == expected

    def test_between_k_and_window_shingles(self, spark):
        # 6 tokens, k=4 -> 3 shingles (< window=5): fingerprint = min of
        # all 3 shingle hashes, emitted exactly once.
        df = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        rows = text.winnow_fingerprints(df).collect()
        assert len(rows) == 1
        hashes = df.select(
            *[
                F.xxhash64(F.lit(s)).alias(f"h{i}")
                for i, s in enumerate(["a b c d", "b c d e", "c d e f"])
            ]
        ).collect()[0]
        assert rows[0]["fp"] == min(hashes)

    def test_long_docs_unchanged_by_short_doc_fix(self, spark):
        # >= window shingles: identical output to the classic algorithm
        # (the maxpos branch of the filter only relaxes short docs).
        df = spark.createDataFrame(
            [(4, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        rows = text.winnow_fingerprints(df).collect()
        # 8 tokens -> 5 shingles -> exactly one full window position
        assert len(rows) == 1


class TestUpsertIdentifierQuoting:
    def test_plain_identifiers_stay_bare(self):
        from file_stream_import_spark.io.jdbc import build_upsert_sql

        sql = build_upsert_sql("locations", "locid", ["locid", "lat"], 2)
        assert sql == (
            "INSERT INTO locations (locid, lat) VALUES (%s, %s), (%s, %s) "
            "ON CONFLICT (locid) DO UPDATE SET lat = EXCLUDED.lat"
        )

    def test_hostile_identifiers_are_quoted(self):
        from file_stream_import_spark.io.jdbc import build_upsert_sql

        sql = build_upsert_sql(
            't; DROP TABLE x--', "locid", ["locid", 'evil"col'], 1
        )
        assert '"t; DROP TABLE x--"' in sql
        assert '"evil""col" = EXCLUDED."evil""col"' in sql
        assert "DROP TABLE x-- (" not in sql  # never emitted bare

    def test_schema_qualified_table(self):
        from file_stream_import_spark.io.jdbc import build_upsert_sql

        sql = build_upsert_sql("public.locations", "locid", ["locid"], 1)
        assert sql.startswith("INSERT INTO public.locations ")


class TestAsofDottedColumns:
    def test_payload_column_with_dot_roundtrips(self, spark):
        # Round-2 ADVICE: DDL-string struct types + dotted-path getattr
        # broke payload names containing dots; the StructType/getField
        # form must carry them through.
        left = spark.createDataFrame([(1, 20)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 10, 7.5)], "user_id long, ts long, `price.usd` double"
        )
        row = asof_join(left, right, on="ts", by="user_id").collect()[0]
        assert row["price.usd_right"] == 7.5


class TestAsofAtomicity:
    def test_null_payload_column_does_not_mix_rows(self, spark):
        # right rows: t=10 has (price=NULL, qty=1); t=20 has (price=5, qty=2).
        # A left row at t=25 must see (5, 2) — per-column carry would
        # produce (5, 2) here, so also check left at t=15 sees (NULL, 1),
        # and a right row with NULL price at the LATEST ts keeps its NULL
        # rather than inheriting the older row's price.
        left = spark.createDataFrame(
            [(1, 15), (1, 25), (1, 35)], "user_id long, ts long"
        )
        right = spark.createDataFrame(
            [(1, 10, None, 1), (1, 20, 5.0, 2), (1, 30, None, 3)],
            "user_id long, ts long, price double, qty long",
        )
        out = {
            r["ts"]: (r["price_right"], r["qty_right"])
            for r in asof_join(left, right, on="ts", by="user_id").collect()
        }
        assert out[15] == (None, 1)
        assert out[25] == (5.0, 2)
        # t=35 matches the t=30 right row ATOMICALLY: price must be NULL,
        # not 5.0 carried over from t=20.
        assert out[35] == (None, 3)

    def test_no_prior_right_row_keeps_nulls(self, spark):
        left = spark.createDataFrame([(7, 5)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(7, 100, 1.0)], "user_id long, ts long, price double"
        )
        row = asof_join(left, right, on="ts", by="user_id").collect()[0]
        assert row["price_right"] is None


class TestPgConnectFallback:
    def test_missing_driver_raises_clear_error(self, monkeypatch):
        import builtins

        from file_stream_import_spark.io.jdbc import _pg_connect

        real_import = builtins.__import__

        def no_psycopg2(name, *a, **kw):
            if name.startswith("psycopg2"):
                raise ImportError(name)
            return real_import(name, *a, **kw)

        monkeypatch.setattr(builtins, "__import__", no_psycopg2)
        with pytest.raises(RuntimeError, match="merge_upsert"):
            _pg_connect("postgresql://x")


class TestRedactShortStrings:
    def test_short_identifiers_fully_masked(self, spark):
        df = spark.createDataFrame(
            [(1, "ab12", 0.0), (2, "9", 0.0), (3, "", 0.0), (4, "abc1234", 0.0)],
            "k long, name string, bal double",
        )
        out = {r["k"]: r["name_masked"] for r in redact_pii(df, "name", "bal").collect()}
        assert out[1] == "abXX"      # <=4 chars: digits masked, nothing leaked
        assert out[2] == "X"
        assert out[3] == ""
        assert out[4] == "abc1234"   # >4 chars: last 4 kept verbatim


class TestZorderBitCap:
    """r4 ADVICE: bits*n_cols > 63 put the top bit in the bigint sign
    bit (negative keys sort first) and 5+ cols wrapped shiftleft mod 64.
    bits is now auto-capped to 63 // n_cols."""

    def test_four_and_five_columns_stay_nonnegative(self, spark):
        from file_stream_import_spark.io.layout import add_zorder_key

        df = spark.createDataFrame(
            [(i, i * 2, i * 3, 100 - i, i % 7) for i in range(50)],
            "a long, b long, c long, d long, e long",
        )
        for cols in (["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]):
            keyed = add_zorder_key(df, cols, bits=16)
            stats = keyed.agg(
                F.min("__zkey").alias("lo"), F.max("__zkey").alias("hi")
            ).first()
            assert stats["lo"] >= 0, f"negative z-key with {len(cols)} cols"
            n = len(cols)
            capped_bits = 63 // n
            assert stats["hi"] < (1 << (capped_bits * n))

    def test_two_column_keys_unchanged_by_cap(self, spark):
        # 2 cols x 16 bits = 32 <= 63: the cap must be a no-op
        from file_stream_import_spark.io.layout import add_zorder_key

        df = spark.createDataFrame(
            [(0, 0), (3, 3), (0, 3), (3, 0)], "x long, y long"
        )
        got = {
            (r["x"], r["y"]): r["__zkey"]
            for r in add_zorder_key(df, ["x", "y"], bits=2).collect()
        }
        # classic 2-bit Morton corners: (0,0)=0, (3,3)=15
        assert got[(0, 0)] == 0 and got[(3, 3)] == 15

    def test_zero_or_too_many_columns_raise(self, spark):
        from file_stream_import_spark.io.layout import add_zorder_key

        df = spark.createDataFrame([(1,)], "a long")
        with pytest.raises(ValueError):
            add_zorder_key(df, [], bits=16)


class TestCompactStatsViaHadoopFs:
    def test_local_files_sized_and_compacted(self, spark, tmp_path):
        """The Hadoop-FS sizing path must agree with local reality: many
        small files in, ~one file out, counts reported correctly."""
        from file_stream_import_spark.io.layout import compact_small_files

        src = str(tmp_path / "small")
        dst = str(tmp_path / "compact")
        spark.range(10_000).repartition(16).write.parquet(src)
        before, after = compact_small_files(
            spark, src, dst, target_bytes=1 << 30
        )
        assert before == 16
        assert after == 1
        assert spark.read.parquet(dst).count() == 10_000
