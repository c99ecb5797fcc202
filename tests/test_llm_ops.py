"""Behavioral unit tests for the LLM-pipeline operators on handcrafted
inputs with known answers (complementing the fixture-scale oracle tests)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from file_stream_import_spark.operators import dedup, similarity, text
from file_stream_import_spark.operators.multimodal import (
    attach_fake_payload,
    extract_image_metadata,
    sample_frames,
)


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows = [
        (0, base),
        (1, near),  # near-dup of 0 (one token differs at the end)
        (2, base),  # exact dup of 0
        (3, "completely different words about spark shuffles and partitions"),
        (4, "der hund und die katze sind mit der maus im haus und der garten"),
        (5, "los gatos y los perros que viven con una familia es con el sol"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact_duplicates_groups_identical_text(self, spark, docs):
        out = dedup.exact_duplicates(docs).collect()
        by_copies = {r["n_copies"]: r for r in out}
        assert by_copies[2]["canonical_id"] == 0  # docs 0 and 2 collapse
        assert sum(r["n_copies"] for r in out) == 6

    def test_ngram_jaccard_finds_planted_pair(self, spark, docs):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
        assert pairs[(0, 2)] == 1.0  # exact dup
        assert not any(3 in p or 4 in p for p in pairs)

    def test_cluster_pairs_transitive_multi_hop(self, spark):
        # Chain 1-2, 2-3, plus isolated pair 10-11: components must close
        # transitively (1,2,3 share a cluster even with no 1-3 edge).
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.cluster_pairs(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_cluster_pairs_long_chain_converges(self, spark):
        # Path graph 0-1-...-9: worst-case diameter for label propagation.
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
        )
        got = dedup.cluster_pairs(pairs).collect()
        assert {r["cluster_id"] for r in got} == {0}
        assert len(got) == 10

    def test_minhash_lsh_matches_exact_jaccard(self, spark, docs):
        exact = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        )
        lsh = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
        )
        assert lsh == exact

    def test_simhash_close_for_neardups_far_for_different(self, spark, docs):
        sigs = {
            r["doc_id"]: r["simhash"]
            for r in dedup.simhash_signatures(docs).collect()
        }
        ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")
        assert ham(0, 2) == 0  # identical text → identical signature
        assert ham(0, 1) < ham(0, 3)  # near-dup closer than unrelated
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.simhash_neardup_pairs(docs, max_hamming=3).collect()
        }
        assert (0, 2) in pairs

    def test_max_df_drops_hot_shingles(self, spark):
        # every doc shares the hot shingle; distinct tails → no pair survives
        rows = [(i, f"aaa bbb ccc unique{i} tail{i} end{i}") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        with_hot = dedup.ngram_jaccard_pairs(df, threshold=0.01)
        without = dedup.ngram_jaccard_pairs(df, threshold=0.01, max_df=3)
        assert with_hot.count() == 10  # all pairs share 'aaa bbb ccc'
        assert without.count() == 0


class TestText:
    def test_token_stats(self, spark):
        df = spark.createDataFrame([(1, "one two  three")], "doc_id long, text string")
        r = text.with_token_stats(df).collect()[0]
        assert r["n_tokens"] == 3
        assert r["n_chars_nospace"] == 11
        assert abs(r["avg_token_len"] - round(11 / 3, 4)) < 1e-9

    def test_lang_id_markers(self, spark, docs):
        out = {r["doc_id"]: r["lang_pred"] for r in text.with_lang_id(docs).collect()}
        assert out[0] == "en" and out[4] == "de" and out[5] == "es"

    def test_lang_id_cjk_and_unknown(self, spark):
        df = spark.createDataFrame(
            [(1, "你好 世界 数据 引擎"), (2, "zzz qqq xxx")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["lang_pred"] for r in text.with_lang_id(df).collect()}
        assert out[1] == "zh" and out[2] == "unknown"

    def test_winnow_shift_resistance(self, spark):
        # same content shifted by a prefix shares most fingerprints
        a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        df = spark.createDataFrame(
            [(1, a), (2, "prefix " + a)], "doc_id long, text string"
        )
        fps = text.winnow_fingerprints(df)
        f1 = {r["fp"] for r in fps.filter("doc_id = 1").collect()}
        f2 = {r["fp"] for r in fps.filter("doc_id = 2").collect()}
        assert len(f1 & f2) / len(f1) > 0.5

    def test_quality_score_orders_sanely(self, spark):
        clean = "the cat sat on the mat and the dog lay in the sun"
        noisy = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) !!!!"
        df = spark.createDataFrame(
            [(1, clean), (2, noisy)], "doc_id long, text string"
        )
        s = {r["doc_id"]: r["quality_score"] for r in text.with_quality_score(df).collect()}
        assert s[1] > 0.8 > s[2]


class TestSimilarity:
    @pytest.fixture()
    def vectors(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.99, 0.1, 0.0, 0.0]),   # ~0.995 cosine with 0
            (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
            (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
            (4, [0.7, 0.7, 0.0, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_knn_bruteforce_ranks_correctly(self, spark, vectors):
        out = similarity.knn_bruteforce(
            vectors, vectors.filter(F.col("vec_id") == 0), k=4
        ).collect()
        order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rk"])]
        assert order == [1, 4, 2, 3]
        assert out[0]["cos_sim"] == pytest.approx(0.994937, abs=1e-5)

    def test_knn_topk_partial_equals_bruteforce(self, spark, vectors, sf_dir):
        from file_stream_import_spark.io.tables import load_table

        # tiny hand-built set: results must be identical
        q = vectors.filter(F.col("vec_id") == 0)
        want = {tuple(r) for r in similarity.knn_bruteforce(vectors, q, k=4).collect()}
        got = {tuple(r) for r in similarity.knn_topk_partial(vectors, q, k=4).collect()}
        assert got == want and got
        # fixture embeddings, multiple queries and real batch boundaries
        e = load_table(spark, sf_dir, "embeddings").repartition(7)
        q = e.filter(F.col("vec_id") < 5)
        want = {tuple(r) for r in similarity.knn_bruteforce(e, q, k=3).collect()}
        got = {tuple(r) for r in similarity.knn_topk_partial(e, q, k=3).collect()}
        assert got == want and len(got) == 15

    def test_ann_lsh_knn_subset_of_bruteforce_space(self, spark, vectors):
        out = similarity.ann_lsh_knn(
            vectors, vectors.filter(F.col("vec_id") == 0), k=4, num_planes=2, dim=4
        ).collect()
        assert all(r["neighbor_id"] != 0 for r in out)
        ranks = sorted(r["rk"] for r in out)
        assert ranks == list(range(1, len(ranks) + 1))

    def test_ivf_assign_uses_only_centroid_ids(self, spark, vectors):
        cents = similarity.ivf_centroids(vectors, n_centroids=3)
        assert len(cents) == 3
        cids = {cid for cid, _ in cents}
        assigned = similarity.ivf_assign(vectors, cents)
        assert {r["ivf_cid"] for r in assigned.collect()} <= cids

    def test_ivf_assign_picks_max_cosine_centroid(self, spark, vectors):
        # Force known centroids: 0 (x-axis) and 2 (y-axis).
        cents = [(0, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
        got = {
            r["vec_id"]: r["ivf_cid"]
            for r in similarity.ivf_assign(vectors, cents).collect()
        }
        assert got[1] == 0  # near x-axis
        assert got[2] == 2  # on y-axis
        assert got[4] == 0  # 45° tie -> smallest cid

    def test_ivf_knn_full_probe_matches_bruteforce(self, spark, vectors):
        # nprobe == n_centroids -> every list probed -> exact result.
        q = vectors.filter(F.col("vec_id") == 0)
        exact = {
            (r["query_id"], r["neighbor_id"], r["rk"])
            for r in similarity.knn_bruteforce(vectors, q, k=4).collect()
        }
        ivf = {
            (r["query_id"], r["neighbor_id"], r["rk"])
            for r in similarity.ivf_knn(
                vectors, q, k=4, n_centroids=3, nprobe=3
            ).collect()
        }
        assert ivf == exact

    def test_ann_pairs_finds_close_pair(self, spark, vectors):
        pairs = {
            (r["id_a"], r["id_b"]): r["cos_sim"]
            for r in similarity.ann_lsh_pairs(
                vectors, num_planes=1, min_cos=0.9, dim=4
            ).collect()
        }
        assert (0, 1) in pairs


class TestApproxQuantiles:
    def test_sketch_tracks_exact_quantiles(self, spark, sf_dir):
        from file_stream_import_spark.queries.llm import agg_approx_quantiles

        got = {
            r["o_orderstatus"]: r for r in agg_approx_quantiles(spark, sf_dir).collect()
        }
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        exact = {
            r["o_orderstatus"]: r
            for r in o.groupBy("o_orderstatus")
            .agg(
                F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
                F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            )
            .collect()
        }
        for status, row in got.items():
            # GK sketch with accuracy=1000 is within 1/1000 rank error;
            # the query itself emits the bound check (|approx-exact| /
            # exact <= 5%) that the oracle hash verifies — assert it
            # holds, and that the exact values agree with a direct
            # percentile computation
            assert row["p50_within_bound"] and row["p95_within_bound"]
            assert abs(row["p50_exact"] - exact[status]["p50"]) <= 0.01
            assert abs(row["p95_exact"] - exact[status]["p95"]) <= 0.01


class TestMultimodal:
    def test_metadata_deterministic_and_complete(self, spark, docs):
        meta = extract_image_metadata(attach_fake_payload(docs))
        rows = {r["doc_id"]: r for r in meta.collect()}
        assert len(rows) == 6
        r0 = rows[0]
        assert r0["n_bytes"] > 0 and r0["format"] in ("png", "jpeg", "webp")
        assert r0["width"] >= 64 and r0["height"] >= 64 and r0["channels"] == 3
        again = {r["doc_id"]: r for r in
                 extract_image_metadata(attach_fake_payload(docs)).collect()}
        assert again[0] == r0  # deterministic stub

    def test_strict_mode_raises_not_implemented(self, spark, docs):
        with pytest.raises(Exception, match="NotImplementedError|real image decoding"):
            extract_image_metadata(
                attach_fake_payload(docs), strict=True
            ).collect()

    def test_frame_sample_fanout(self, spark, docs):
        frames = sample_frames(attach_fake_payload(docs), every_n_bytes=16)
        counts = {
            r["doc_id"]: r["n"]
            for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }
        assert all(c >= 3 for c in counts.values())  # texts ≥ 48 bytes


class TestCuration:
    def test_redact_pii_masks_all_but_last4(self, spark):
        from file_stream_import_spark.operators.curation import redact_pii

        df = spark.createDataFrame(
            [(1, "Customer#000000042", 1234.56), (2, "Customer#000099999", -50.0)],
            "k long, name string, bal double",
        )
        out = {r["k"]: r for r in redact_pii(df, "name", "bal").collect()}
        assert out[1]["name_masked"] == "Customer#XXXXX0042"
        assert out[2]["name_masked"] == "Customer#XXXXX99999"[:9] + "XXXXX" + "9999"
        assert out[1]["bal_bucket"] == 1000
        assert out[2]["bal_bucket"] == -500  # floor, not trunc
        assert len(out[1]["name_token"]) == 32

    def test_repetition_ratio_known_answer(self, spark):
        from file_stream_import_spark.operators.curation import (
            with_repetition_ratio,
        )

        df = spark.createDataFrame(
            [(0, "a b a b a b"), (1, "all distinct words here"), (2, "solo")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in with_repetition_ratio(df).collect()}
        # bigrams of doc 0: ab ba ab ba ab -> 5 total, 2 distinct
        assert rows[0]["n_grams"] == 5 and rows[0]["n_distinct_grams"] == 2
        assert rows[0]["dup_gram_ratio"] == 0.6
        assert rows[1]["dup_gram_ratio"] == 0.0
        assert 2 not in rows  # <2 tokens -> no bigrams -> dropped

    def test_contamination_flags_planted_overlap(self, spark):
        from file_stream_import_spark.operators.curation import (
            contamination_report,
        )

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        train = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon"),  # fully contaminated
                (1, "zeta eta theta iota kappa lambada"),  # clean
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               contamination_report(train, bench).collect()}
        assert out[0]["contamination_ratio"] == 1.0 and out[0]["is_contaminated"]
        assert out[1]["n_hits"] == 0 and not out[1]["is_contaminated"]

    def test_pack_sequences_offsets_contiguous_per_shard(self, spark):
        from file_stream_import_spark.operators.curation import pack_sequences

        rows = [(i, f"s{i % 2}", 100 + 30 * i) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n long")
        out = pack_sequences(df, "n", "source", "doc_id", seq_len=256)
        by_shard: dict[str, list] = {}
        for r in sorted(out.collect(), key=lambda r: (r["source"], r["doc_id"])):
            by_shard.setdefault(r["source"], []).append(r)
        for shard_rows in by_shard.values():
            expect = 0
            for r in shard_rows:
                assert r["tok_offset"] == expect
                assert r["seq_first"] == r["tok_offset"] // 256
                assert r["seq_last"] == (r["tok_offset"] + r["n"] - 1) // 256
                assert r["seq_first"] <= r["seq_last"]
                expect += r["n"]

    def test_deterministic_shuffle_is_stable_permutation(self, spark):
        from file_stream_import_spark.operators.curation import (
            deterministic_shuffle,
        )

        df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
        out = deterministic_shuffle(df, "doc_id").collect()
        # exact permutation of 1..N
        assert sorted(r["shuffle_pos"] for r in out) == list(range(1, 301))
        # two-level rank == plain rank by (key, id)
        by_key = sorted(out, key=lambda r: (r["shuffle_key"], r["doc_id"]))
        assert [r["shuffle_pos"] for r in by_key] == list(range(1, 301))
        # rerun identical (no RNG state)
        again = deterministic_shuffle(df, "doc_id").collect()
        assert {r["doc_id"]: r["shuffle_pos"] for r in again} == {
            r["doc_id"]: r["shuffle_pos"] for r in out
        }


class TestAnnRecall:
    """recall@5 floors for the ANN family vs the brute-force oracle —
    the falsifiable form of 'scales to 100 TB' (structure alone isn't).

    Two data regimes, deliberately:
    - PLANTED CLUSTERS (seeded numpy): real neighbor structure, where an
      ANN index must reach a recall floor or it is broken.
    - THE FIXTURE: i.i.d. random 64-dim vectors, where cosine contrast
      vanishes (the curse of dimensionality) and NO sublinear index can
      reach high recall — measured r5: single-table LSH 0.03-0.13, IVF
      at nprobe=C/2 only 0.65. There we assert the structural
      properties instead: recall grows with probe width, and probing
      every list reproduces brute force exactly.
    """

    K = 5

    @pytest.fixture(scope="class")
    def planted(self, spark):
        import numpy as np

        rng = np.random.RandomState(42)
        cents = rng.randn(25, 64)
        rows = []
        vid = 0
        for c in range(25):
            for _ in range(20):
                v = cents[c] + 0.15 * rng.randn(64)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).cache()
        q = df.filter(F.col("vec_id") % 25 == 0)
        return df, q

    @staticmethod
    def _topsets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    @classmethod
    def _recall(cls, pred, truth):
        hit = sum(len(pred.get(q, set()) & t) for q, t in truth.items())
        return hit / (cls.K * len(truth))

    def test_ivf_recall_floor_on_clustered_data(self, planted):
        df, q = planted
        truth = self._topsets(similarity.knn_bruteforce(df, q, k=self.K))
        got = self._topsets(
            similarity.ivf_knn(df, q, k=self.K, n_centroids=16, nprobe=2)
        )
        assert self._recall(got, truth) >= 0.8  # measured r5: 0.91

    def test_lsh_amplified_recall_floor_on_clustered_data(self, planted):
        df, q = planted
        truth = self._topsets(similarity.knn_bruteforce(df, q, k=self.K))
        one = self._recall(
            self._topsets(
                similarity.ann_lsh_knn(df, q, k=self.K, num_planes=8)
            ),
            truth,
        )
        three = self._recall(
            self._topsets(
                similarity.ann_lsh_knn(
                    df, q, k=self.K, num_planes=8, num_tables=3
                )
            ),
            truth,
        )
        # measured r5: 0.62 single-table -> 0.94 with 3 tables
        assert three >= 0.8
        assert three > one  # OR-amplification must actually amplify

    def test_ivf_full_probe_is_exact_on_fixture(self, spark, sf_dir):
        from file_stream_import_spark.io.tables import load_table

        e = load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 20)
        truth = self._topsets(similarity.knn_bruteforce(e, q, k=self.K))
        full = self._topsets(
            similarity.ivf_knn(e, q, k=self.K, n_centroids=8, nprobe=8)
        )
        assert self._recall(full, truth) == 1.0
        # and recall is monotone in probe width (deterministic pipeline,
        # so these are fixed values: ~0.34 at nprobe=2, ~0.65 at 4)
        r2 = self._recall(
            self._topsets(
                similarity.ivf_knn(e, q, k=self.K, n_centroids=8, nprobe=2)
            ),
            truth,
        )
        r4 = self._recall(
            self._topsets(
                similarity.ivf_knn(e, q, k=self.K, n_centroids=8, nprobe=4)
            ),
            truth,
        )
        assert r4 > r2


class TestPqQuantizationQuality:
    def test_argmin_codes_beat_constant_assignment(self, spark, sf_dir):
        """The PQ residuals emitted by embedding_pq_codes must be
        strictly smaller in total than assigning every subvector to one
        fixed centroid — i.e. the argmin actually discriminates. (The
        code-validity and residual>=0 invariants are property-tested in
        test_properties.py; this adds the quality direction.)"""
        from file_stream_import_spark.io.tables import load_table
        from file_stream_import_spark.queries.round4 import embedding_pq_codes

        codes = embedding_pq_codes(spark, sf_dir)
        total_argmin = codes.agg(F.sum("dist2_q")).first()[0]

        e = load_table(spark, sf_dir, "embeddings")
        v = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        c0 = (
            v.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(1)
            .select(F.col("v").alias("cv"))
        )
        joined = v.crossJoin(F.broadcast(c0))
        total_const = joined.agg(
            F.sum(
                F.aggregate(
                    F.zip_with(
                        "v", "cv", lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
            )
        ).first()[0]
        assert total_argmin < 0.9 * total_const


class TestIvfKmeansTraining:
    def test_objective_monotone_and_recall_not_worse(self, spark):
        """Spherical k-means refinement must (a) monotonically improve
        the mean assigned-centroid cosine objective over iterations and
        (b) not hurt recall@5 vs the sampled init on clustered data."""
        import numpy as np

        rng = np.random.RandomState(7)
        cents = rng.randn(12, 32)
        rows = []
        vid = 0
        for c in range(12):
            for _ in range(25):
                v = cents[c] + 0.2 * rng.randn(32)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).cache()

        init = similarity.ivf_centroids(df, n_centroids=12)
        obj = [similarity.ivf_quantization_cosine(df, init)]
        for iters in (1, 2, 3):
            cents_i = similarity.ivf_train_kmeans(df, n_centroids=12, iters=iters)
            obj.append(similarity.ivf_quantization_cosine(df, cents_i))
        for a, b in zip(obj, obj[1:]):
            assert b >= a - 1e-9, obj

        q = df.filter(F.col("vec_id") % 30 == 0)
        truth = TestAnnRecall._topsets(similarity.knn_bruteforce(df, q, k=5))
        base = TestAnnRecall._topsets(
            similarity.ivf_knn(df, q, k=5, n_centroids=12, nprobe=2)
        )
        cents3 = similarity.ivf_train_kmeans(df, n_centroids=12, iters=3)
        ref = TestAnnRecall._topsets(
            similarity.ivf_knn(df, q, k=5, n_centroids=12, nprobe=2, cents=cents3)
        )
        K = 5
        r_base = sum(len(base.get(k_, set()) & t) for k_, t in truth.items()) / (K * len(truth))
        r_ref = sum(len(ref.get(k_, set()) & t) for k_, t in truth.items()) / (K * len(truth))
        assert r_ref >= r_base - 1e-9, (r_base, r_ref)
        assert r_ref >= 0.8


class TestIvfPq:
    """IVF-PQ composed read path: full-probe equals pure-PQ ranking
    (the IVF restriction must be exactly a candidate filter), recall
    floor on clustered data, and recall monotonicity in nprobe."""

    K = 5

    @pytest.fixture(scope="class")
    def planted(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        cents = rng.randn(25, 64)
        rows = []
        vid = 0
        for c in range(25):
            for _ in range(20):
                v = cents[c] + 0.15 * rng.randn(64)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).cache()
        q = df.filter(F.col("vec_id") % 25 == 0)
        return df, q

    @staticmethod
    def _topsets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    @classmethod
    def _recall(cls, pred, truth):
        hit = sum(len(pred.get(q, set()) & t) for q, t in truth.items())
        return hit / (cls.K * len(truth))

    def test_full_probe_equals_pure_pq_adc(self, planted):
        """With nprobe = n_centroids the IVF restriction admits every
        vector, so the ranking must equal PQ-ADC over the whole corpus
        (computed here with numpy from the same salted codebook)."""
        import numpy as np

        df, q = planted
        got = similarity.ivfpq_knn(
            df, q, k=self.K, n_centroids=8, nprobe=8
        ).collect()
        codebook = similarity.ivf_centroids(df, 16, salt="pq:")
        vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
        # positional codes: index into the codebook LIST, tie toward
        # the lower position — mirror pq_encode exactly
        cb = [np.array(cv) for _cid, cv in codebook]
        width = 64 // 8

        def codes(v):
            return [
                min(
                    range(len(cb)),
                    key=lambda pos: (
                        float(
                            np.sum(
                                (
                                    v[s * width : (s + 1) * width]
                                    - cb[pos][s * width : (s + 1) * width]
                                )
                                ** 2
                            )
                        ),
                        pos,
                    ),
                )
                for s in range(8)
            ]

        all_codes = {vid: codes(v) for vid, v in vecs.items()}
        for qid in {r.query_id for r in got}:
            qv = vecs[qid]
            adc = {}
            for vid, cs in all_codes.items():
                if vid == qid:
                    continue
                adc[vid] = sum(
                    float(
                        np.sum(
                            (
                                qv[s * width : (s + 1) * width]
                                - cb[c][s * width : (s + 1) * width]
                            )
                            ** 2
                        )
                    )
                    for s, c in enumerate(cs)
                )
            expect = sorted(adc, key=lambda v: (adc[v], v))[: self.K]
            mine = [
                r.neighbor_id
                for r in sorted(
                    (r for r in got if r.query_id == qid),
                    key=lambda r: r.rk,
                )
            ]
            assert mine == expect, (qid, mine, expect)

    def test_recall_floor_and_probe_monotonicity(self, planted):
        df, q = planted
        truth = self._topsets(similarity.knn_bruteforce(df, q, k=self.K))
        narrow = self._recall(
            self._topsets(
                similarity.ivfpq_knn(df, q, k=self.K, n_centroids=16, nprobe=1)
            ),
            truth,
        )
        wide = self._recall(
            self._topsets(
                similarity.ivfpq_knn(
                    df, q, k=self.K, n_centroids=16, nprobe=16
                )
            ),
            truth,
        )
        assert wide >= narrow
        # pure ADC cannot resolve within-cluster order with 16 coarse
        # codewords (measured ~0.3) — the two-stage shortlist + exact
        # re-rank is the production read path and must hit the floor
        reranked = self._recall(
            self._topsets(
                similarity.ivfpq_knn(
                    df, q, k=self.K, n_centroids=16, nprobe=4, rerank=50
                )
            ),
            truth,
        )
        assert reranked >= 0.8, reranked


def test_image_ahash_strict_marks_codec_plug_point(spark):
    from file_stream_import_spark.operators.multimodal import (
        attach_fake_payload,
        image_ahash,
    )

    df = attach_fake_payload(
        spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    )
    with pytest.raises(Exception, match="NotImplementedError|aHash"):
        image_ahash(df, strict=True).collect()


class TestRealContainerCodecs:
    """WAV (RIFF via stdlib wave) and PNG (zlib IDAT + CRC chunks) are
    REAL codecs — these pin the round-trip contract the oracle queries
    rely on: decode(encode(x)) == x for arbitrary bytes, and corrupted
    containers are rejected, not silently mis-decoded."""

    def test_wav_roundtrip_arbitrary_bytes(self):
        from file_stream_import_spark.operators.multimodal import (
            wav_decode,
            wav_encode,
        )

        for payload in [b"", b"\x00", bytes(range(256)), b"x" * 12345]:
            rate, n, pcm = wav_decode(wav_encode(payload, 16000))
            assert (rate, n, pcm) == (16000, len(payload), payload)
            assert len(wav_encode(payload, 16000)) == len(payload) + 44

    def test_png_roundtrip_and_padding(self):
        from file_stream_import_spark.operators.multimodal import (
            png_decode,
            png_encode,
        )

        for payload in [b"\x07", bytes(range(256)), b"z" * 31, b"q" * 32]:
            w, h, px = png_decode(png_encode(payload, width=32))
            assert w == 32 and h == max(1, -(-len(payload) // 32))
            assert px[: len(payload)] == payload
            assert set(px[len(payload):]) <= {0}

    def test_png_crc_tamper_detected(self):
        from file_stream_import_spark.operators.multimodal import (
            png_decode,
            png_encode,
        )

        c = bytearray(png_encode(b"hello png", width=32))
        # flip one byte inside the IDAT payload (after sig+IHDR chunk)
        idat_at = bytes(c).index(b"IDAT") + 4
        c[idat_at] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            png_decode(bytes(c))

    def test_png_rejects_non_png(self):
        from file_stream_import_spark.operators.multimodal import png_decode

        with pytest.raises(ValueError, match="not a PNG"):
            png_decode(b"GIF89a....")

    def test_bmp_roundtrip_stride_and_row_order(self):
        from file_stream_import_spark.operators.multimodal import (
            bmp_decode,
            bmp_encode,
        )

        for payload in [b"\x07", bytes(range(256)), b"z" * 29, b"q" * 30]:
            w, h, px = bmp_decode(bmp_encode(payload, width=30))
            assert w == 30 and h == max(1, -(-len(payload) // 30))
            # row order and stride de-padding must reconstruct exactly
            assert px[: len(payload)] == payload
            assert set(px[len(payload):]) <= {0}

    def test_bmp_rejects_malformed(self):
        from file_stream_import_spark.operators.multimodal import (
            bmp_decode,
            bmp_encode,
        )

        with pytest.raises(ValueError, match="not a BMP"):
            bmp_decode(b"PNG?" + b"\x00" * 60)
        good = bytearray(bmp_encode(b"hello bmp"))
        # corrupt a palette entry: grayscale identity check must fire
        bad_pal = bytearray(good)
        bad_pal[14 + 40 + 4 * 10] ^= 0x01
        with pytest.raises(ValueError, match="palette"):
            bmp_decode(bytes(bad_pal))
        # truncate pixel data: size consistency check must fire
        with pytest.raises(ValueError, match="size mismatch"):
            bmp_decode(bytes(good[:-3]))

    @given(payload=st.binary(min_size=0, max_size=500))
    @settings(max_examples=60, deadline=None)
    def test_codec_roundtrip_property(self, payload):
        from file_stream_import_spark.operators.multimodal import (
            png_decode,
            png_encode,
            wav_decode,
            wav_encode,
        )

        _, n, pcm = wav_decode(wav_encode(payload))
        assert pcm == payload and n == len(payload)
        w, h, px = png_decode(png_encode(payload))
        assert px[: len(payload)] == payload
        assert w * h == len(px) and len(px) >= max(1, len(payload))


class TestTopPcPowerIteration:
    def test_recovers_planted_direction(self, spark):
        """Vectors drawn along a planted axis u plus small noise: three
        power iterations must align with u (|cos| > 0.95) — the
        eigenvector claim, not just determinism."""
        import math
        import random

        from file_stream_import_spark.operators.pca import (
            top_pc_power_iteration,
        )

        rnd = random.Random(7)
        dim = 16
        u = [rnd.gauss(0, 1) for _ in range(dim)]
        nu = math.sqrt(sum(c * c for c in u))
        u = [c / nu for c in u]
        rows = []
        for i in range(300):
            a = rnd.gauss(0, 3.0)  # strong signal along u
            vec = [
                a * u[d] + rnd.gauss(0, 0.3) for d in range(dim)
            ]
            rows.append((i, [float(c) for c in vec]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = top_pc_power_iteration(df).collect()
        v = {r["dim"]: r["pc1_ppm"] for r in out}
        vv = [v[d + 1] for d in range(dim)]
        dot = sum(a * b for a, b in zip(vv, u))
        cos = dot / math.sqrt(sum(c * c for c in vv))
        assert abs(cos) > 0.95, cos

    def test_deterministic_across_partitionings(self, spark):
        from file_stream_import_spark.operators.pca import (
            top_pc_power_iteration,
        )

        rows = [
            (i, [float((i * 31 + d * 7) % 13 - 6) for d in range(8)])
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = sorted(map(tuple, top_pc_power_iteration(df.repartition(1)).collect()))
        b = sorted(map(tuple, top_pc_power_iteration(df.repartition(7)).collect()))
        assert a == b
