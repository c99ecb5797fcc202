"""Unit tests for the reference's own operator surface: CSV ingest with
header-order independence (O1/O2), last-writer-wins upsert with id
stability (O5), deterministic pagination (O7), JSON page output (O8),
and the end-to-end flagship path (SURVEY.md §3.1-3.2)."""

from __future__ import annotations

import json

import pytest

from file_stream_import_spark.io.csv_ingest import ingest_locations_csv
from file_stream_import_spark.operators import merge_upsert, paginate, to_json_page
from file_stream_import_spark.operators.paginate import paginate_after


def make_locations(spark, rows):
    return spark.createDataFrame(
        rows, "locid string, loctimezone string, country string, "
        "locname string, business string"
    )


LOC1 = ("LOC000000000001", "Europe/London", "UK", "Springfield_1", "TechCorp_1")
LOC2 = ("LOC000000000002", "Asia/Tokyo", "Japan", "Lakeside_2", "CoffeeCo_2")
LOC3 = ("LOC000000000003", "America/New_York", "USA", "Bayport_3", "EduWise_3")


class TestUpsert:
    def test_fresh_import_generates_ids(self, spark):
        out = merge_upsert(None, make_locations(spark, [LOC1, LOC2])).collect()
        assert len(out) == 2
        ids = {r["id"] for r in out}
        assert all(ids) and len(ids) == 2  # non-null, unique

    def test_last_writer_wins_on_reimport(self, spark):
        first = merge_upsert(None, make_locations(spark, [LOC1, LOC2]))
        changed = ("LOC000000000001", "Europe/Berlin", "Germany", "Hillview_9", "GreenBuild_9")
        second = merge_upsert(first, make_locations(spark, [changed, LOC3]))
        rows = {r["locid"]: r for r in second.collect()}
        assert len(rows) == 3
        assert rows["LOC000000000001"]["country"] == "Germany"
        assert rows["LOC000000000002"]["country"] == "Japan"
        assert rows["LOC000000000003"]["country"] == "USA"

    def test_id_preserved_on_update_generated_on_insert(self, spark):
        first = merge_upsert(None, make_locations(spark, [LOC1, LOC2]))
        ids_before = {r["locid"]: r["id"] for r in first.collect()}
        changed = ("LOC000000000001", "Europe/Berlin", "Germany", "X", "Y")
        second = merge_upsert(first, make_locations(spark, [changed, LOC3]))
        ids_after = {r["locid"]: r["id"] for r in second.collect()}
        # updated + untouched rows keep their id (db.go:67-71 omits id)
        assert ids_after["LOC000000000001"] == ids_before["LOC000000000001"]
        assert ids_after["LOC000000000002"] == ids_before["LOC000000000002"]
        assert ids_after["LOC000000000003"] not in ids_before.values()

    def test_intra_batch_duplicate_last_wins(self, spark):
        dup_a = ("LOCX", "Asia/Tokyo", "Japan", "A", "A")
        dup_b = ("LOCX", "Europe/London", "UK", "B", "B")
        out = merge_upsert(
            None, make_locations(spark, [LOC1, dup_a, dup_b])
        ).collect()
        rows = {r["locid"]: r for r in out}
        assert len(rows) == 2
        assert rows["LOCX"]["locname"] == "B"  # later row in file order wins


class TestCsvIngest:
    def test_header_order_independence(self, spark, tmp_path):
        p = tmp_path / "shuffled.csv"
        p.write_text(
            "COUNTRY,BUSINESS,LOCID,LOCNAME,LOCTIMEZONE\n"
            "UK,TechCorp_1,LOC1,Springfield_1,Europe/London\n"
            "Japan,CoffeeCo_2,LOC2,Lakeside_2,Asia/Tokyo\n"
        )
        df = ingest_locations_csv(spark, str(p))
        assert df.columns == ["locid", "loctimezone", "country", "locname", "business"]
        rows = {r["locid"]: r for r in df.collect()}
        assert rows["LOC1"]["country"] == "UK"
        assert rows["LOC2"]["business"] == "CoffeeCo_2"

    def test_missing_header_raises(self, spark, tmp_path):
        p = tmp_path / "bad.csv"
        p.write_text("LOCID,COUNTRY\nLOC1,UK\n")
        with pytest.raises(ValueError, match="missing required headers"):
            ingest_locations_csv(spark, str(p))

    def test_header_only_file_yields_zero_rows(self, spark, tmp_path):
        p = tmp_path / "empty.csv"
        p.write_text("LOCID,LOCTIMEZONE,COUNTRY,LOCNAME,BUSINESS\n")
        assert ingest_locations_csv(spark, str(p)).count() == 0


class TestPaginate:
    def test_pages_are_deterministic_and_disjoint(self, spark):
        df = make_locations(
            spark, [(f"LOC{i:012d}", "tz", "C", f"N{i}", f"B{i}") for i in range(37)]
        )
        seen: list[str] = []
        for page in range(4):
            rows = paginate(df, ["locid"], limit=10, offset=page * 10).collect()
            seen.extend(r["locid"] for r in rows)
        assert len(seen) == 37  # 10+10+10+7 — short last page, O16 contract
        assert seen == sorted(seen) and len(set(seen)) == 37

    def test_keyset_pagination_matches_offset(self, spark):
        df = make_locations(
            spark, [(f"LOC{i:012d}", "tz", "C", f"N{i}", f"B{i}") for i in range(25)]
        )
        page1 = paginate_after(df, "locid", None, limit=10).collect()
        page2 = paginate_after(df, "locid", page1[-1]["locid"], limit=10).collect()
        offset_page2 = paginate(df, ["locid"], limit=10, offset=10).collect()
        assert [r["locid"] for r in page2] == [r["locid"] for r in offset_page2]

    def test_json_page_and_empty_page(self, spark):
        df = make_locations(spark, [LOC1])
        doc = json.loads(to_json_page(df.select("locid", "country")))
        assert doc == [{"locid": "LOC000000000001", "country": "UK"}]
        empty = to_json_page(df.filter("locid = 'nope'"))
        assert empty == "[]"  # db.go:113 COALESCE contract


class TestFlagshipPath:
    def test_csv_to_upsert_to_page_end_to_end(self, spark, tmp_path):
        """SURVEY.md §3.1+3.2: upload → upsert → paginated JSON read."""
        f1 = tmp_path / "batch1.csv"
        f1.write_text(
            "LOCID,LOCTIMEZONE,COUNTRY,LOCNAME,BUSINESS\n"
            + "".join(f"LOC{i:04d},tz,US,N{i},B{i}\n" for i in range(30))
        )
        f2 = tmp_path / "batch2.csv"  # overwrites 5, adds 5
        f2.write_text(
            "LOCNAME,LOCID,LOCTIMEZONE,COUNTRY,BUSINESS\n"
            + "".join(f"NEW{i},LOC{i:04d},tz2,CA,B2\n" for i in range(5))
            + "".join(f"N{i},LOC{i:04d},tz,US,B{i}\n" for i in range(30, 35))
        )
        state = merge_upsert(None, ingest_locations_csv(spark, str(f1)))
        state = merge_upsert(state, ingest_locations_csv(spark, str(f2)))
        assert state.count() == 35
        page = json.loads(to_json_page(paginate(state, ["locid"], 10, 0)))
        assert [r["locid"] for r in page] == [f"LOC{i:04d}" for i in range(10)]
        assert page[0]["locname"] == "NEW0" and page[0]["country"] == "CA"
        assert page[9]["locname"] == "N9"


class TestCsvRfc4180:
    def test_quoted_commas_and_doubled_quotes(self, spark, tmp_path):
        """Go's encoding/csv (writer.go:48) parses these; so must we."""
        from file_stream_import_spark.io.csv_ingest import ingest_locations_csv

        p = tmp_path / "quoted.csv"
        p.write_text(
            'LOCID,LOCTIMEZONE,COUNTRY,LOCNAME,BUSINESS\n'
            'L1,UTC,"US","Name, with comma","He said ""hi"""\n'
            'L2,UTC,DE,plain,also plain\n'
        )
        rows = {
            r["locid"]: r
            for r in ingest_locations_csv(spark, str(p)).collect()
        }
        assert rows["L1"]["locname"] == "Name, with comma"
        assert rows["L1"]["business"] == 'He said "hi"'
        assert rows["L2"]["locname"] == "plain"

    def test_embedded_newline_with_multiline(self, spark, tmp_path):
        from file_stream_import_spark.io.csv_ingest import ingest_locations_csv

        p = tmp_path / "nl.csv"
        p.write_text(
            'LOCID,LOCTIMEZONE,COUNTRY,LOCNAME,BUSINESS\n'
            'L1,UTC,US,"line1\nline2",biz\n'
        )
        got = ingest_locations_csv(spark, str(p), multiline=True).collect()
        assert len(got) == 1 and got[0]["locname"] == "line1\nline2"


class TestPostgresUpsertSqlParity:
    """The executor-side ON CONFLICT path (io/jdbc.py) must emit the exact
    statement shape and 12k chunking of the reference's batch writer
    (internal/db/db.go:63-72, writer.go:19) — asserted on a fake DB-API
    connection, no live Postgres needed."""

    def test_statement_text_matches_reference_shape(self):
        from file_stream_import_spark.io.jdbc import build_upsert_sql

        sql = build_upsert_sql(
            "locations", "locid",
            ["locid", "loctimezone", "country"], n_rows=2,
        )
        assert sql == (
            "INSERT INTO locations (locid, loctimezone, country) "
            "VALUES (%s, %s, %s), (%s, %s, %s) "
            "ON CONFLICT (locid) DO UPDATE SET "
            "loctimezone = EXCLUDED.loctimezone, country = EXCLUDED.country"
        )

    def test_chunking_and_dedup_on_fake_connection(self, spark, tmp_path):
        from file_stream_import_spark.io.jdbc import upsert_postgres

        log_dir = str(tmp_path)

        class FakeCursor:
            def __init__(self, path):
                self.path = path

            def execute(self, sql, params):
                import json as _json
                import os as _os
                import uuid as _uuid

                rec = {
                    "n_tuples": sql.count("(%s"),
                    "n_params": len(params),
                    "on_conflict": "ON CONFLICT (locid) DO UPDATE SET" in sql,
                    "keys": [params[i] for i in range(0, len(params), 3)],
                }
                fn = _os.path.join(self.path, f"{_uuid.uuid4().hex}.json")
                with open(fn, "w") as fh:
                    fh.write(_json.dumps(rec))

            def close(self):
                pass

        class FakeConn:
            def __init__(self, path):
                self.path = path

            def cursor(self):
                return FakeCursor(self.path)

            def commit(self):
                pass

            def close(self):
                pass

        # 25 distinct keys, chunk_size=10, one partition -> chunks 10/10/5.
        rows = [(f"L{i:03d}", f"tz{i}", "US") for i in range(25)]
        df = spark.createDataFrame(
            rows, "locid string, loctimezone string, country string"
        )
        upsert_postgres(
            df, "postgresql://fake", "locations", "locid",
            ["loctimezone", "country"],
            chunk_size=10, num_partitions=1,
            connect=lambda dsn: FakeConn(log_dir),
        )

        import glob
        import json as _json

        recs = [
            _json.loads(open(f).read())
            for f in glob.glob(log_dir + "/*.json")
        ]
        assert len(recs) == 3
        assert all(r["on_conflict"] for r in recs)
        assert sorted(r["n_tuples"] for r in recs) == [5, 10, 10]
        assert all(r["n_params"] == r["n_tuples"] * 3 for r in recs)
        all_keys = [k for r in recs for k in r["keys"]]
        assert len(all_keys) == 25 and len(set(all_keys)) == 25

        # Intra-chunk duplicate keys: last write wins within one statement
        # (chunk_size > n rows so the dup is guaranteed in-chunk).
        log2 = str(tmp_path / "dedup")
        import os as _os

        _os.makedirs(log2)
        dup_rows = rows + [("L004", "tz-dup", "US")]
        df2 = spark.createDataFrame(
            dup_rows, "locid string, loctimezone string, country string"
        )
        upsert_postgres(
            df2, "postgresql://fake", "locations", "locid",
            ["loctimezone", "country"],
            chunk_size=100, num_partitions=1,
            connect=lambda dsn: FakeConn(log2),
        )
        recs2 = [
            _json.loads(open(f).read())
            for f in glob.glob(log2 + "/*.json")
        ]
        assert len(recs2) == 1 and recs2[0]["n_tuples"] == 25  # 26 rows dedup to 25


class TestGenerator:
    def test_shape_domains_and_determinism(self, spark):
        from file_stream_import_spark.io.generator import (
            BUSINESSES, COUNTRIES, LOCNAMES, TIMEZONES, generate_locations,
        )

        rows = generate_locations(spark, 500, seed=0, num_partitions=3).collect()
        assert len(rows) == 500
        assert rows[0].__fields__ == [
            "locid", "loctimezone", "country", "locname", "business",
        ]
        ids = sorted(r["locid"] for r in rows)
        assert ids[0] == "LOC000000000001" and ids[-1] == "LOC000000000500"
        assert all(len(i) == 15 for i in ids)  # LOC + 12 digits
        for r in rows:
            assert r["loctimezone"] in TIMEZONES
            assert r["country"] in COUNTRIES
            name, n = r["locname"].rsplit("_", 1)
            assert name in LOCNAMES and 0 <= int(n) < 1000
            biz, n = r["business"].rsplit("_", 1)
            assert biz in BUSINESSES and 0 <= int(n) < 1000
        # pure function of (n, seed): repartitioning must not change rows
        again = generate_locations(spark, 500, seed=0, num_partitions=11).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
        # different seed → different payloads, same ids
        other = generate_locations(spark, 500, seed=1).collect()
        assert sorted(map(tuple, other)) != sorted(map(tuple, rows))

    def test_csv_roundtrip_through_ingest_and_upsert(self, spark, tmp_path):
        from file_stream_import_spark.io.csv_ingest import ingest_locations_csv
        from file_stream_import_spark.io.generator import (
            generate_locations, write_locations_csv,
        )
        from file_stream_import_spark.operators.upsert import merge_upsert

        p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        write_locations_csv(generate_locations(spark, 300, seed=0), p1)
        write_locations_csv(generate_locations(spark, 100, seed=1), p2)
        wave1 = ingest_locations_csv(spark, p1)
        assert wave1.columns == ["locid", "loctimezone", "country", "locname", "business"]
        state = merge_upsert(None, wave1)
        final = merge_upsert(state, ingest_locations_csv(spark, p2))
        got = {r["locid"]: r for r in final.collect()}
        assert len(got) == 300  # 100 updates overlap, no new keys
        seed1 = {r["locid"]: r for r in generate_locations(spark, 100, seed=1).collect()}
        seed0 = {r["locid"]: r for r in generate_locations(spark, 300, seed=0).collect()}
        for lid, row in got.items():
            want = seed1.get(lid) or seed0[lid]  # last writer (wave 2) wins
            assert row["locname"] == want["locname"]
            assert row["business"] == want["business"]
            assert row["id"] is not None


class TestPythonDataSource:
    """The Spark 4 Python DataSource form of the generator (O13):
    registration, planned partitions, Arrow-batch reads, and
    byte-identity with the spark.range implementation."""

    def test_equals_generator_dataframe_form(self, spark):
        from file_stream_import_spark.io.generator import generate_locations
        from file_stream_import_spark.io.pysource import LocationsDataSource

        spark.dataSource.register(LocationsDataSource)
        via_source = (
            spark.read.format("locations_gen")
            .option("rows", 3000)
            .option("seed", 7)
            .option("numpartitions", 5)
            .load()
        )
        via_range = generate_locations(spark, n_rows=3000, seed=7)
        a = sorted(tuple(r) for r in via_source.collect())
        b = sorted(tuple(r) for r in via_range.collect())
        assert a == b
        assert via_source.rdd.getNumPartitions() == 5

    def test_partitioning_does_not_change_content(self, spark):
        from file_stream_import_spark.io.pysource import LocationsDataSource

        spark.dataSource.register(LocationsDataSource)

        def load(parts):
            return sorted(
                tuple(r)
                for r in spark.read.format("locations_gen")
                .option("rows", 1000)
                .option("seed", 3)
                .option("numpartitions", parts)
                .load()
                .collect()
            )

        assert load(1) == load(7)


class TestJsonlShardWriter:
    """Custom Python DataSource WRITER: per-task shard + driver-side
    manifest commit — data round-trips and the manifest is the
    authoritative shard list."""

    def test_write_manifest_roundtrip(self, spark, tmp_path):
        import glob
        import gzip
        import json
        import os

        from file_stream_import_spark.io.pysource import JsonlShardDataSource

        spark.dataSource.register(JsonlShardDataSource)
        out = str(tmp_path / "shards")
        df = spark.range(0, 500).selectExpr(
            "id", "CAST(id % 7 AS STRING) AS grp"
        ).repartition(4)
        df.write.format("jsonl_shard").option("path", out).mode(
            "append"
        ).save()

        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest["total_rows"] == 500
        listed = {s["shard"] for s in manifest["shards"]}
        on_disk = {
            os.path.basename(p)
            for p in glob.glob(os.path.join(out, "part-*.jsonl.gz"))
        }
        assert listed == on_disk and len(listed) == 4
        rows = []
        for s in sorted(listed):
            with gzip.open(os.path.join(out, s), "rt") as f:
                rows += [json.loads(line) for line in f]
        assert sorted(r["id"] for r in rows) == list(range(500))
        assert sum(s["n_rows"] for s in manifest["shards"]) == 500

    def test_overwrite_removes_stale_shards(self, spark, tmp_path):
        import glob
        import json
        import os

        from file_stream_import_spark.io.pysource import JsonlShardDataSource

        spark.dataSource.register(JsonlShardDataSource)
        out = str(tmp_path / "shards2")
        for n in (300, 100):
            spark.range(0, n).repartition(3).write.format(
                "jsonl_shard"
            ).option("path", out).mode("overwrite").save()
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest["total_rows"] == 100
        on_disk = {
            os.path.basename(p)
            for p in glob.glob(os.path.join(out, "part-*.jsonl.gz"))
        }
        assert on_disk == {s["shard"] for s in manifest["shards"]}

    def test_zero_rows_source_is_empty_not_crash(self, spark):
        from file_stream_import_spark.io.pysource import LocationsDataSource

        spark.dataSource.register(LocationsDataSource)
        df = (
            spark.read.format("locations_gen")
            .option("rows", 0)
            .load()
        )
        assert df.count() == 0
