"""Property-based tests (hypothesis) for the reference-core semantics:
last-writer-wins upsert and pagination invariants must hold for ANY
input shape, not just the examples in test_reference_core.py.

Examples are kept small and the Spark work is driver-light (collect on
tens of rows) so each property run stays fast; deadline is disabled
because JVM warmup makes the first example slow.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from file_stream_import_spark.operators.paginate import paginate, paginate_after
from file_stream_import_spark.operators.upsert import merge_upsert

KEYS = st.text(alphabet="abcd", min_size=1, max_size=2)
VALS = st.text(alphabet="xyz0", min_size=0, max_size=3)

prop = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def mk_batch(spark, rows):
    return spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "locid string, payload string, seq long",
    )


class TestUpsertProperties:
    @prop
    @given(batch=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=12))
    def test_last_writer_wins_within_batch(self, spark, batch):
        got = {
            r["locid"]: r["payload"]
            for r in merge_upsert(
                None, mk_batch(spark, batch), key="locid", arrival_col="seq"
            ).collect()
        }
        want = {k: v for k, v in batch}  # dict insertion: later wins
        assert got == want

    @prop
    @given(
        first=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8),
        second=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8),
    )
    def test_reimport_replaces_payload_and_keeps_id(self, spark, first, second):
        state = merge_upsert(
            None, mk_batch(spark, first), key="locid", arrival_col="seq"
        ).cache()
        ids_before = {r["locid"]: r["id"] for r in state.collect()}
        merged = merge_upsert(
            state, mk_batch(spark, second), key="locid", arrival_col="seq"
        )
        rows = merged.collect()
        got = {r["locid"]: (r["id"], r["payload"]) for r in rows}
        # keys survive from both sides, payload reflects the later batch
        want_payload = {k: v for k, v in first} | {k: v for k, v in second}
        assert {k: p for k, (_, p) in got.items()} == want_payload
        # ids are stable across re-import and unique
        for k, (id_, _) in got.items():
            if k in ids_before:
                assert id_ == ids_before[k], f"id changed for re-imported key {k}"
        assert len({id_ for id_, _ in got.values()}) == len(got)


class TestPaginationProperties:
    @prop
    @given(
        n_rows=st.integers(min_value=0, max_value=30),
        page_size=st.integers(min_value=1, max_value=7),
    )
    def test_offset_pages_partition_the_table(self, spark, n_rows, page_size):
        df = spark.range(n_rows).selectExpr(
            "format_string('K%03d', CAST(id AS INT)) AS k", "id AS v"
        )
        seen = []
        offset = 0
        while True:
            page = paginate(df, ["k"], limit=page_size, offset=offset).collect()
            seen.extend(r["k"] for r in page)
            if len(page) < page_size:  # reference UI's last-page rule
                break
            offset += page_size
        assert seen == sorted(seen)
        assert len(seen) == n_rows and len(set(seen)) == n_rows

    @prop
    @given(
        n_rows=st.integers(min_value=0, max_value=30),
        page_size=st.integers(min_value=1, max_value=7),
    )
    def test_keyset_pages_equal_offset_pages(self, spark, n_rows, page_size):
        df = spark.range(n_rows).selectExpr(
            "format_string('K%03d', CAST(id AS INT)) AS k", "id AS v"
        )
        via_offset, offset = [], 0
        while True:
            page = paginate(df, ["k"], limit=page_size, offset=offset).collect()
            via_offset.extend(r["k"] for r in page)
            if len(page) < page_size:
                break
            offset += page_size
        via_keyset, after = [], None
        while True:
            page = paginate_after(df, "k", after, limit=page_size).collect()
            via_keyset.extend(r["k"] for r in page)
            if len(page) < page_size:
                break
            after = page[-1]["k"]
        assert via_keyset == via_offset


class TestClusterProperties:
    @prop
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),
                st.integers(min_value=0, max_value=15),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=20,
        )
    )
    def test_components_match_union_find(self, spark, edges):
        from file_stream_import_spark.operators.dedup import cluster_pairs

        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges],
            "doc_a long, doc_b long",
        )
        got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}

        # reference: classic union-find over the same edges
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for n in parent}
        assert got == want


class TestRound4Properties:
    @prop
    @given(
        texts=st.lists(
            st.text(alphabet="ab ", min_size=10, max_size=40),
            min_size=2,
            max_size=8,
        )
    )
    def test_containment_bounds_and_jaccard_relation(self, spark, texts):
        # 0 < containment <= 1 on every emitted pair, and for any pair
        # emitted in both directions, max-direction containment >=
        # jaccard of the same pair (containment divides by the smaller
        # of the union's parts)
        from file_stream_import_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        cont = {
            (r["src"], r["dst"]): r["containment"]
            for r in containment_pairs(df, threshold=0.0).collect()
        }
        assert all(0 < v <= 1.0 for v in cont.values())
        jac = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
        }
        for (a, b), j in jac.items():
            both = [v for k, v in cont.items() if k in ((a, b), (b, a))]
            if both:
                # rounding on both sides is 4dp, allow one ulp of the grid
                assert max(both) >= j - 1e-4

    @prop
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=1000),
            min_size=4,
            max_size=24,
        ),
        bits=st.integers(min_value=2, max_value=8),
    )
    def test_zorder_key_bounds_and_extremes(self, spark, vals, bits):
        # the z-key is within [0, 4^bits) for two dims, minimal at the
        # per-column minima and maximal at the maxima
        from file_stream_import_spark.io.layout import add_zorder_key

        rows = [(v, (v * 13 + 7) % 1001) for v in vals]
        df = spark.createDataFrame(rows, "x long, y long")
        got = [r["__zkey"] for r in add_zorder_key(df, ["x", "y"], bits=bits).collect()]
        assert all(0 <= z < 4**bits for z in got)
        lo = min(r[0] for r in rows), min(r[1] for r in rows)
        hi = max(r[0] for r in rows), max(r[1] for r in rows)
        by_row = {
            (r["x"], r["y"]): r["__zkey"]
            for r in add_zorder_key(df, ["x", "y"], bits=bits).collect()
        }
        if lo in by_row:
            assert by_row[lo] == min(got)
        if hi in by_row:
            assert by_row[hi] == max(got)


class TestRound4QueryProperties:
    @prop
    @given(
        deltas=st.lists(
            st.integers(min_value=0, max_value=90_000),
            min_size=1,
            max_size=25,
        )
    )
    def test_sweepline_matches_bruteforce(self, spark, tmp_path, deltas):
        # max_concurrent_sessions (day-clipped sweep) must equal the
        # O(n^2) brute force "count intervals covering each start point"
        # on arbitrary event times spanning a midnight
        import datetime as dt
        import json
        import os

        from file_stream_import_spark.queries import all_queries

        base = dt.datetime(2024, 3, 1, 23, 0, 0)
        times = [base + dt.timedelta(seconds=s) for s in deltas]
        rows = [
            (i, t, 1, "click", 1.0, "{}") for i, t in enumerate(times)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        d = str(tmp_path / f"sf_{abs(hash(tuple(deltas))) % 10**8}")
        os.makedirs(d, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            r["day_s"]: r["max_concurrent"]
            for r in all_queries()["max_concurrent_sessions"](spark, d).collect()
        }

        # brute force: for each day, max over piece-start points of the
        # number of live [s, s+5min) intervals, with day clipping
        iv = [(t, t + dt.timedelta(minutes=5)) for t in times]
        points = []
        for s, e in iv:
            mid = (s + dt.timedelta(days=1)).replace(
                hour=0, minute=0, second=0, microsecond=0
            )
            points.append((s.date(), s))
            if e > mid:
                points.append((mid.date(), mid))
        want: dict = {}
        for day, p in points:
            live = sum(1 for s, e in iv if s <= p < e)
            key = day.strftime("%Y-%m-%d")
            want[key] = max(want.get(key, 0), live)
        assert got == want

    @prop
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=9999),
                st.integers(min_value=1, max_value=20),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_weighted_median_crossing_bruteforce(self, spark, vals):
        # the cumulative-crossing rule must pick the smallest value v
        # such that weight{x <= v} * 2 >= total weight
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(c, w, i) for i, (c, w) in enumerate(vals)],
            "cents long, wt long, rid long",
        )
        wc = (
            W.partitionBy(F.lit(1))
            .orderBy("cents", "rid")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        wa = W.partitionBy(F.lit(1))
        got = (
            df.select(
                "cents",
                F.sum("wt").over(wc).alias("cum"),
                F.sum("wt").over(wa).alias("total"),
            )
            .filter(F.col("cum") * 2 >= F.col("total"))
            .agg(F.min("cents"))
            .collect()[0][0]
        )
        total = sum(w for _, w in vals)
        acc = 0
        want = None
        for c, w in sorted(vals, key=lambda t: t[0]):
            acc += w
            if acc * 2 >= total:
                want = c
                break
        assert got == want


class TestRollupAndPQInvariants:
    def test_hierarchy_rollup_conserves_mass(self, spark, sf_dir):
        # every level of the digit tree partitions the leaves: the sum
        # over any complete level equals the all-parts total
        from pyspark.sql import functions as F

        from file_stream_import_spark.io.tables import load_table
        from file_stream_import_spark.queries import all_queries

        # part key 0 has no positive ancestor and is excluded from the
        # tree by the ancestor > 0 filter — the invariant holds for the
        # keyed (k >= 1) population
        p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") >= 1)
        total = p.select(
            F.sum(
                F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
        ).collect()[0][0]
        n_parts = p.count()
        rows = all_queries()["part_hierarchy_rollup"](spark, sf_dir).collect()
        # leaves (= ancestors that are part keys with n_desc counting
        # themselves only once each) all have positive sums; stronger:
        # the level-1 nodes (single digit 1..9) cover every part exactly
        # once
        lvl1 = [r for r in rows if 1 <= r["ancestor"] <= 9]
        assert sum(r["n_desc"] for r in lvl1) == n_parts
        assert sum(r["sum_cents"] for r in lvl1) == total

    def test_pq_codes_in_codebook_and_residual_nonneg(self, spark, sf_dir):
        from file_stream_import_spark.queries import all_queries

        rows = all_queries()["embedding_pq_codes"](spark, sf_dir).collect()
        assert rows
        codes = {r["code"] for r in rows}
        assert len(codes) <= 16  # codes come from the 16-entry codebook
        assert all(r["dist2_q"] >= 0 for r in rows)
        assert all(0 <= r["si"] <= 7 for r in rows)
        # every vector emits exactly 8 subspace rows
        from collections import Counter

        per_vec = Counter(r["vec_id"] for r in rows)
        assert set(per_vec.values()) == {8}


class TestBandParams:
    """band_params derives an LSH (bands, rows) split whose S-curve
    brackets the requested threshold — pure math, no Spark."""

    @prop
    @given(
        threshold=st.floats(min_value=0.15, max_value=0.95),
        num_hashes=st.sampled_from([64, 128, 256]),
    )
    def test_midpoint_is_optimal_and_curve_brackets(self, threshold, num_hashes):
        from file_stream_import_spark.operators.dedup import (
            band_params,
            lsh_candidate_probability,
        )

        b, r = band_params(threshold, num_hashes)
        assert b >= 1 and r >= 1 and b * r <= num_hashes
        mid = (1.0 / b) ** (1.0 / r)
        # optimality: no other feasible split's midpoint is closer
        for r2 in range(1, num_hashes + 1):
            b2 = num_hashes // r2
            if b2 < 1:
                break
            assert abs(mid - threshold) <= abs(
                (1.0 / b2) ** (1.0 / r2) - threshold
            ) + 1e-12
        # bracketing: the S-curve is high above the midpoint, low below
        assert lsh_candidate_probability(min(mid + 0.2, 0.999), b, r) > 0.5
        assert lsh_candidate_probability(max(mid - 0.2, 0.001), b, r) < 0.7

    @prop
    @given(
        threshold=st.floats(min_value=0.5, max_value=0.9),
        fp_jaccard=st.floats(min_value=0.05, max_value=0.3),
    )
    def test_fp_budget_respected_or_raises(self, threshold, fp_jaccard):
        import pytest as _pytest

        from file_stream_import_spark.operators.dedup import (
            band_params,
            lsh_candidate_probability,
        )

        try:
            b, r = band_params(
                threshold, 128, fp_jaccard=fp_jaccard, fp_budget=0.05
            )
        except ValueError:
            # must only raise when NO split satisfies the budget
            for r2 in range(1, 129):
                b2 = 128 // r2
                if b2 < 1:
                    break
                assert lsh_candidate_probability(fp_jaccard, b2, r2) > 0.05
            return
        assert lsh_candidate_probability(fp_jaccard, b, r) <= 0.05

    def test_default_equivalence_and_tuned_run(self, spark):
        """A tuned (num_hashes, bands) actually runs end-to-end and
        still finds the planted near-dup pair."""
        from file_stream_import_spark.operators.dedup import (
            band_params,
            minhash_lsh_pairs,
        )

        base = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [
                (0, base),
                (1, base + " tail"),
                (2, "completely different words describing other things here"),
            ],
            "doc_id long, text string",
        )
        b, r = band_params(0.7, num_hashes=64)
        got = {
            (x["doc_a"], x["doc_b"])
            for x in minhash_lsh_pairs(
                df, threshold=0.7, num_hashes=64, bands=b
            ).collect()
        }
        assert (0, 1) in got


class TestHashSplitStability:
    @prop
    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1, max_size=30, unique=True,
        ),
        extra=st.lists(
            st.integers(min_value=10_001, max_value=20_000),
            min_size=0, max_size=10, unique=True,
        ),
    )
    def test_assignment_stable_under_corpus_growth(self, spark, ids, extra):
        """hash_split's pitch is that a document KEEPS its split when new
        data arrives (no leakage across pipeline re-runs) — assert it:
        the assignment of the original ids is identical after appending
        new rows, and buckets respect the 80/90 boundaries."""
        from file_stream_import_spark.operators.curation import hash_split

        df1 = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        df2 = spark.createDataFrame(
            [(i,) for i in ids + extra], "doc_id long"
        )
        s1 = {
            r["doc_id"]: (r["split"], r["split_bucket"])
            for r in hash_split(df1, "doc_id").collect()
        }
        s2 = {
            r["doc_id"]: (r["split"], r["split_bucket"])
            for r in hash_split(df2, "doc_id").collect()
        }
        assert all(s2[i] == s1[i] for i in ids)
        for split, bucket in s2.values():
            assert 0 <= bucket < 100
            assert split == (
                "train" if bucket < 80 else "val" if bucket < 90 else "test"
            )


class TestHeavyHittersProperties:
    """Candidate pruning must be invisible: for ANY multiset and ANY
    partitioning, the two-pass result equals the brute-force HAVING."""

    @prop
    @given(
        counts=st.lists(
            st.tuples(st.integers(0, 9), st.integers(1, 30)),
            min_size=1,
            max_size=8,
        ),
        denom=st.sampled_from([4, 10, 25]),
        parts=st.sampled_from([1, 3, 7]),
    )
    def test_matches_bruteforce_groupby(self, spark, counts, denom, parts):
        from pyspark.sql import functions as F

        from file_stream_import_spark.operators.heavy import heavy_hitters

        rows = [(k,) for k, c in counts for _ in range(c)]
        df = spark.createDataFrame(rows, "k long").repartition(parts)
        got = sorted(
            (r.k, r.n_rows)
            for r in heavy_hitters(df, "k", num=1, denom=denom).collect()
        )
        total = len(rows)
        expect = sorted(
            (r.k, r["count"])
            for r in df.groupBy("k")
            .count()
            .filter(F.col("count") * denom >= total)
            .collect()
        )
        assert got == expect


class TestHammingBandingProperties:
    """4x16-bit banding is a COMPLETE candidate generator for hamming
    <= 3: banded pairs must equal brute-force pairs for ANY signature
    set, including adversarial ones differing only inside one band."""

    @prop
    @given(
        base=st.integers(-(2**63), 2**63 - 1),
        flips=st.lists(
            st.lists(st.integers(0, 63), min_size=0, max_size=4),
            min_size=2,
            max_size=8,
        ),
    )
    def test_matches_bruteforce_pairs(self, spark, base, flips):
        from file_stream_import_spark.operators.dedup import (
            hamming_neardup_pairs,
        )

        sigs = []
        for bits in flips:
            h = base
            for b in bits:
                h ^= 1 << b
                if h >= 1 << 63:
                    h -= 1 << 64
                elif h < -(1 << 63):
                    h += 1 << 64
            sigs.append(h)
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(sigs)], "doc_id long, sig long"
        )
        got = sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in hamming_neardup_pairs(
                df, "doc_id", "sig", max_hamming=3
            ).collect()
        )
        expect = []
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                d = bin((sigs[i] ^ sigs[j]) & ((1 << 64) - 1)).count("1")
                if d <= 3:
                    expect.append((i, j, d))
        assert got == sorted(expect)


class TestPoissonBootstrap:
    def test_replicate_totals_center_on_observed(self, spark):
        """Poisson(1) weights have mean 1, so replicate totals must
        center on the observed total (loose 10% band at n=2000) in BOTH
        rng modes, and the portable md5 mode must be deterministic."""
        from pyspark.sql import functions as F

        from file_stream_import_spark.operators.bootstrap import (
            poisson_bootstrap_totals,
        )

        df = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("cents")
        )
        obs = df.agg(F.sum("cents")).first()[0]
        for rng in ("md5", "xxhash64"):
            out = poisson_bootstrap_totals(
                df, "k", "cents", n_replicates=16, rng=rng
            ).collect()
            assert len(out) == 16
            assert all(r["oc"] == obs for r in out)
            mean_bt = sum(r["bt"] for r in out) / 16
            assert abs(mean_bt - obs) / obs < 0.10, (rng, mean_bt, obs)
        a = poisson_bootstrap_totals(df, "k", "cents", 8, "md5").collect()
        b = poisson_bootstrap_totals(df, "k", "cents", 8, "md5").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_unknown_rng_rejected(self, spark):
        from file_stream_import_spark.operators.bootstrap import (
            poisson_bootstrap_totals,
        )

        df = spark.range(1).selectExpr("id AS k", "id AS cents")
        with pytest.raises(KeyError):
            poisson_bootstrap_totals(df, "k", "cents", 4, rng="lcg")


class TestRound6Properties:
    @prop
    @given(
        base=st.lists(
            st.tuples(st.integers(0, 60), st.text("ab", max_size=2)),
            min_size=1,
            max_size=14,
            unique_by=lambda t: t[0],
        ),
        splits=st.integers(1, 3),
        upd=st.lists(
            st.tuples(st.integers(0, 80), st.text("cd", max_size=2)),
            min_size=1,
            max_size=6,
            unique_by=lambda t: t[0],
        ),
    )
    def test_pruned_merge_equals_full_rewrite(
        self, spark, tmp_path_factory, base, splits, upd
    ):
        """File-pruned MERGE must be RESULT-identical to the
        conservative full rewrite for ANY key layout — including
        updates straddling group boundaries, pure inserts, and
        all-groups-touched cases."""
        import json as _json
        import os as _os

        from file_stream_import_spark.io.versioned import (
            VersionedTable,
            _manifest_path,
            merge_into,
        )

        mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
        tmp = tmp_path_factory.mktemp("pm")
        results = []
        for arm in ("pruned", "full"):
            t = VersionedTable(str(tmp / arm))
            # commit the base in `splits` chunks -> several groups
            chunk = -(-len(base) // splits)
            for i in range(0, len(base), chunk):
                t.commit(mk(base[i : i + chunk]))
            if arm == "full":
                mp = _manifest_path(t.path, t.latest_version())
                m = _json.load(open(mp))
                m.pop("stats", None)
                _json.dump(m, open(mp, "w"))
            merge_into(t, spark, mk(upd), key="k")
            results.append(
                sorted((r.k, r.v) for r in t.read(spark).collect())
            )
        assert results[0] == results[1]
        # and both equal the model: update overlays base
        model = dict(base)
        model.update(dict(upd))
        assert results[0] == sorted(model.items())

    @prop
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(-50, 50),
                st.one_of(st.none(), st.integers(-50, 50)),
            ),
            min_size=1,
            max_size=16,
        ),
        lo=st.one_of(st.none(), st.integers(-40, 40)),
        hi=st.one_of(st.none(), st.integers(-40, 40)),
    )
    def test_stats_pruned_read_equals_filtered_read(
        self, spark, tmp_path_factory, rows, lo, hi
    ):
        """read(where=...) group pruning must NEVER change results vs
        the unpruned read + the same filter — for any data (including
        NULL key values) and any half-open or closed bound."""
        from pyspark.sql import functions as F

        from file_stream_import_spark.io.versioned import VersionedTable

        tmp = tmp_path_factory.mktemp("pr")
        t = VersionedTable(str(tmp / "t"))
        mk = lambda rs: spark.createDataFrame(rs, "i long, k long")
        half = len(rows) // 2 or 1
        t.commit(mk([(i, k) for i, (_, k) in enumerate(rows[:half])]))
        if rows[half:]:
            t.commit(
                mk([(half + i, k) for i, (_, k) in enumerate(rows[half:])])
            )
        pruned = t.read(spark, where={"k": (lo, hi)})
        plain = t.read(spark)
        if lo is not None:
            plain = plain.filter(F.col("k") >= lo)
        if hi is not None:
            plain = plain.filter(F.col("k") <= hi)
        assert sorted(
            (r.i, r.k) for r in pruned.collect()
        ) == sorted((r.i, r.k) for r in plain.collect())

    @prop
    @given(payload=st.binary(min_size=0, max_size=400))
    def test_bmp_roundtrip_any_bytes(self, payload):
        from file_stream_import_spark.operators.multimodal import (
            bmp_decode,
            bmp_encode,
        )

        p = payload or b"\x00"
        w, h, px = bmp_decode(bmp_encode(p, width=30))
        assert (w, h) == (30, max(1, -(-len(p) // 30)))
        assert px[: len(p)] == p and set(px[len(p):]) <= {0}

    @prop
    @given(
        base=st.lists(
            st.tuples(st.integers(0, 30), st.text("ab", max_size=2)),
            min_size=1,
            max_size=10,
            unique_by=lambda t: t[0],
        ),
        changes=st.lists(
            st.tuples(
                st.integers(0, 40),
                st.text("cd", max_size=2),
                st.sampled_from(["I", "U", "D"]),
            ),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        ),
    )
    def test_snapshot_diff_reconstructs_applied_changelog(
        self, spark, tmp_path_factory, base, changes
    ):
        """diff(v, apply(v, changelog)) must equal the EFFECTIVE
        changelog: deletes of absent keys and upserts equal to the old
        value are no-ops; everything else comes back with the correct
        I/U/D tag and payloads — for ANY base/changelog."""
        from file_stream_import_spark.io.versioned import (
            VersionedTable,
            apply_changes,
            snapshot_diff,
        )

        tmp = tmp_path_factory.mktemp("sd")
        t = VersionedTable(str(tmp / "t"))
        t.commit(spark.createDataFrame(base, "k long, v string"))
        v0 = t.latest_version()
        v1 = apply_changes(
            t,
            spark,
            spark.createDataFrame(changes, "k long, v string, op string"),
            key="k",
        )
        got = {
            r.k: (r.change,
                  None if r.old is None else r.old.v,
                  None if r.new is None else r.new.v)
            for r in snapshot_diff(t, spark, v0, v1, key="k").collect()
        }
        model_base = dict(base)
        expect = {}
        for k, v, op in changes:
            if op == "D":
                if k in model_base:
                    expect[k] = ("D", model_base[k], None)
            elif k not in model_base:
                expect[k] = ("I", None, v)
            elif model_base[k] != v:
                expect[k] = ("U", model_base[k], v)
        assert got == expect

    @prop
    @given(
        base=st.lists(
            st.tuples(st.integers(0, 20), st.text("ab", max_size=2)),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        ),
        changes=st.lists(
            st.tuples(
                st.integers(0, 25),
                st.text("cd", max_size=2),
                st.sampled_from(["I", "U", "D"]),
                st.integers(0, 5),
            ),
            min_size=1,
            max_size=10,
        ),
    )
    def test_apply_changes_lww_matches_model(
        self, spark, tmp_path_factory, base, changes
    ):
        """With duplicate keys in the changelog, seq-column
        last-writer-wins must pick the highest-seq change per key
        (ties broken identically to the window's deterministic order)
        — final state equals the sequential model for ANY input."""
        from file_stream_import_spark.io.versioned import (
            VersionedTable,
            apply_changes,
        )

        # make (key, seq) unique so LWW is well-defined
        seen = set()
        dedup = []
        for k, v, op, seq in changes:
            if (k, seq) not in seen:
                seen.add((k, seq))
                dedup.append((k, v, op, seq))
        tmp = tmp_path_factory.mktemp("lww")
        t = VersionedTable(str(tmp / "t"))
        t.commit(spark.createDataFrame(base, "k long, v string"))
        apply_changes(
            t,
            spark,
            spark.createDataFrame(
                dedup, "k long, v string, op string, seq long"
            ),
            key="k",
            seq_col="seq",
        )
        got = sorted((r.k, r.v) for r in t.read(spark).collect())
        model = dict(base)
        final = {}
        for k, v, op, seq in dedup:
            if k not in final or seq > final[k][2]:
                final[k] = (v, op, seq)
        for k, (v, op, _) in final.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        assert got == sorted(model.items())


class TestAvroCodecProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(-(2**62), 2**62),
                st.one_of(st.none(), st.text(max_size=8)),
                st.floats(allow_nan=False, allow_infinity=False,
                          width=64),
                st.booleans(),
                st.binary(max_size=16),
            ),
            max_size=25,
        ),
        codec=st.sampled_from(["null", "deflate"]),
        block=st.integers(1, 7),
    )
    def test_container_roundtrip_any_rows(self, rows, codec, block):
        """Pure-python property: any record batch survives the
        container round trip bit-exactly under either codec and any
        block size — zigzag extremes, NULL union branches, empty
        strings/bytes, negative zero included."""
        import os
        import tempfile

        from file_stream_import_spark.io.avro_local import (
            read_container,
            write_container,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "i", "type": "long"},
                {"name": "s", "type": ["null", "string"]},
                {"name": "d", "type": "double"},
                {"name": "b", "type": "boolean"},
                {"name": "raw", "type": "bytes"},
            ],
        }
        fd, p = tempfile.mkstemp(suffix=".avro")
        os.close(fd)
        try:
            write_container(
                p, schema, rows, codec=codec, records_per_block=block
            )
            _, got = read_container(p)
            assert got == rows
        finally:
            os.unlink(p)


class TestRebaseProperties:
    """Group-disjoint optimistic concurrency (r7): for ANY pair of
    disjoint update sets computed against the same snapshot, applying
    them in either order — the second always rebasing — yields the
    same final table, and equals the sequential (no-pin) result."""

    @prop
    @given(
        ups_a=st.dictionaries(
            st.integers(min_value=0, max_value=9),
            st.text(alphabet="AB", min_size=1, max_size=2),
            min_size=1,
            max_size=4,
        ),
        ups_b=st.dictionaries(
            st.integers(min_value=100, max_value=109),
            st.text(alphabet="CD", min_size=1, max_size=2),
            min_size=1,
            max_size=4,
        ),
    )
    def test_disjoint_pinned_merges_commute(
        self, spark, tmp_path_factory, ups_a, ups_b
    ):
        from file_stream_import_spark.io.versioned import (
            VersionedTable,
            merge_into,
        )

        def mk(rows):
            return spark.createDataFrame(rows, "k long, v string")

        def build(order):
            t = VersionedTable(
                str(tmp_path_factory.mktemp("rebase_prop") / "t")
            )
            t.commit(mk([(i, f"lo{i}") for i in range(10)]))
            t.commit(mk([(100 + i, f"hi{i}") for i in range(10)]))
            pinned = t.latest_version()
            frames = {
                "a": mk(sorted(ups_a.items())),
                "b": mk(sorted(ups_b.items())),
            }
            for tag in order:
                merge_into(
                    t, spark, frames[tag], key="k", expected_parent=pinned
                )
            return dict(
                (r.k, r.v) for r in t.read(spark).collect()
            ), t._load_manifest(t.latest_version())

        got_ab, m_ab = build("ab")
        got_ba, m_ba = build("ba")
        assert got_ab == got_ba
        # the second writer really rebased (no silent recompute path)
        assert m_ab.get("rebased_from") is not None
        assert m_ba.get("rebased_from") is not None
        # and equals the plain sequential result
        expect = {i: f"lo{i}" for i in range(10)}
        expect.update({100 + i: f"hi{i}" for i in range(10)})
        expect.update(ups_a)
        expect.update(ups_b)
        assert got_ab == expect


class TestPrunePlannerProperties:
    """Round-9: derive_prune_bounds soundness for ARBITRARY predicate
    trees — condition TRUE for a row ⇒ every derived bound holds for
    that row. Random trees mix derivable leaves (comparisons, IN),
    opaque leaves (modulo arithmetic — the planner must yield nothing
    for them), and AND/OR/NOT combinators; Spark's own filter is the
    ground truth."""

    LEAF = st.one_of(
        st.tuples(
            st.just("cmp"),
            st.sampled_from(["k", "m"]),
            st.sampled_from(["<", "<=", ">", ">=", "=="]),
            st.integers(min_value=-5, max_value=65),
        ),
        st.tuples(
            st.just("cmp"),
            st.just("v"),
            st.sampled_from(["<", "<=", ">", ">=", "=="]),
            st.sampled_from(["v0", "v2", "v4", "zz"]),
        ),
        st.tuples(
            st.just("in"),
            st.just("k"),
            st.lists(
                st.integers(min_value=-2, max_value=62),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(
            st.just("opaque"),
            st.just("k"),
            st.integers(min_value=2, max_value=7),
            st.integers(min_value=0, max_value=6),
        ),
    )
    TREE = st.recursive(
        LEAF,
        lambda sub: st.one_of(
            st.tuples(st.just("and"), sub, sub),
            st.tuples(st.just("or"), sub, sub),
            st.tuples(st.just("not"), sub),
        ),
        max_leaves=6,
    )

    @staticmethod
    def _to_column(spec):
        from pyspark.sql import functions as F

        tag = spec[0]
        if tag == "cmp":
            _, col, op, val = spec
            c = F.col(col)
            return {
                "<": c < val, "<=": c <= val, ">": c > val,
                ">=": c >= val, "==": c == val,
            }[op]
        if tag == "in":
            return F.col(spec[1]).isin(*spec[2])
        if tag == "opaque":
            _, col, mod, rem = spec
            return F.col(col) % mod == rem
        if tag == "and":
            return TestPrunePlannerProperties._to_column(spec[1]) & (
                TestPrunePlannerProperties._to_column(spec[2])
            )
        if tag == "or":
            return TestPrunePlannerProperties._to_column(spec[1]) | (
                TestPrunePlannerProperties._to_column(spec[2])
            )
        return ~TestPrunePlannerProperties._to_column(spec[1])

    @prop
    @given(spec=TREE)
    def test_derived_bounds_are_implied(self, spark, spec):
        from pyspark.sql import functions as F

        from file_stream_import_spark.io.versioned import (
            derive_prune_bounds,
        )

        cond = self._to_column(spec)
        bounds = derive_prune_bounds(cond)
        df = spark.range(60).select(
            F.col("id").alias("k"),
            (F.col("id") % 9).alias("m"),
            F.concat(F.lit("v"), F.col("id") % 5).alias("v"),
        )
        for r in df.filter(cond).collect():
            for col, b in bounds.items():
                val = r[col]
                assert val is not None, (spec, col)
                if isinstance(b, list):
                    assert val in b, (spec, col, val, b)
                else:
                    lo, hi = b
                    if lo is not None and type(lo) == type(val):
                        assert val >= lo, (spec, col, val, b)
                    if hi is not None and type(hi) == type(val):
                        assert val <= hi, (spec, col, val, b)
