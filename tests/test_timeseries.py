"""Unit tests for the gap-fill resample operator on handcrafted series
with known gaps (the fixture-scale oracle test covers the full pipeline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_stream_import_spark.operators.timeseries import resample_ffill


def make_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestResampleFfill:
    def test_gap_hours_are_zero_filled_and_value_carried(self, spark):
        ev = make_events(
            spark,
            [
                ("click", "2024-01-01 10:15:00", 1.0),
                ("click", "2024-01-01 10:45:00", 2.0),
                # 11:00 and 12:00 silent
                ("click", "2024-01-01 13:05:00", 7.0),
            ],
        )
        out = {
            r["bucket_start"]: (r["n_events"], r["sum_value_ffill"])
            for r in resample_ffill(ev).collect()
        }
        assert out == {
            "2024-01-01 10:00:00": (2, 3.0),
            "2024-01-01 11:00:00": (0, 3.0),  # gap: zero count, locf value
            "2024-01-01 12:00:00": (0, 3.0),
            "2024-01-01 13:00:00": (1, 7.0),
        }

    def test_grid_is_per_key(self, spark):
        ev = make_events(
            spark,
            [
                ("click", "2024-01-01 10:00:00", 1.0),
                ("click", "2024-01-01 12:00:00", 1.0),
                ("view", "2024-01-01 20:00:00", 5.0),
            ],
        )
        got = resample_ffill(ev).collect()
        clicks = [r for r in got if r["event_type"] == "click"]
        views = [r for r in got if r["event_type"] == "view"]
        # click grid spans its own 3 hours; view's single hour stays alone
        assert len(clicks) == 3 and len(views) == 1
        assert views[0]["bucket_start"] == "2024-01-01 20:00:00"
