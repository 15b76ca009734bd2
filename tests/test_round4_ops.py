"""Round-4 operator additions: temperature mixture, bigram-LM scoring,
co-occurrence link prediction, grid spatial join, streaming dedup.

Each operator gets (a) a semantics check against an in-test brute-force
or closed-form reference, and (b) where the scale story IS the operator
(geo1's broadcast 9-cell join, g5's basket-bounded pairs), a physical
plan gate in the same spirit as test_plans.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.plans import executed_plan
from ml_feature_store_spark.suite import table

SF = "/root/testdata/sf0.001"


class TestTemperatureMixture:
    def test_rates_closed_form(self, spark):
        """Replay the allocation in Python over the collected counts."""
        import math

        from ml_feature_store_spark.operators.sampling import (
            temperature_mixture_rates,
        )

        docs = table(spark, SF, "documents")
        rates = {
            r["source"]: r
            for r in temperature_mixture_rates(docs, "source").collect()
        }
        counts = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        n_total = sum(counts.values())
        weights = {s: math.isqrt(n) for s, n in counts.items()}
        w_total = sum(weights.values())
        for s, n in counts.items():
            row = rates[s]
            assert row["n_before"] == n
            assert row["weight"] == weights[s]
            expect_target = min(n, (n_total // 2) * weights[s] // w_total)
            assert row["target"] == expect_target
            assert row["keep_rate_e6"] == expect_target * 1_000_000 // n

    def test_temperature_flattens_vs_proportional(self, spark):
        """The point of alpha<1: the keep RATE of a larger domain never
        exceeds that of a smaller domain (sqrt compresses the head)."""
        from ml_feature_store_spark.operators.sampling import (
            temperature_mixture_rates,
        )

        # crafted sizes: rate ~ isqrt(n)/n is only monotone up to isqrt's
        # integer steps, so compare well-separated domains (4x apart)
        rows = [(f"d{i}", j) for i, n in enumerate([400, 100, 25]) for j in range(n)]
        df = spark.createDataFrame(rows, "dom string, id long")
        out = {
            r["dom"]: r for r in temperature_mixture_rates(df, "dom").collect()
        }
        assert out["d0"]["keep_rate_e6"] <= out["d1"]["keep_rate_e6"]
        assert out["d1"]["keep_rate_e6"] <= out["d2"]["keep_rate_e6"]
        # head domains lose MORE than proportionally: d0 is 4x d1's size
        # but gets strictly less than 4x d1's target rows
        assert out["d0"]["target"] < 4 * out["d1"]["target"]
        # the smallest domain hits the per-domain cap: kept whole
        assert out["d2"]["target"] == 25 and out["d2"]["keep_rate_e6"] == 1_000_000


class TestBigramLmScore:
    def test_every_doc_reported_and_bigram_counts(self, spark):
        from ml_feature_store_spark.operators.text import bigram_lm_doc_score

        docs = table(spark, SF, "documents")
        out = bigram_lm_doc_score(docs)
        assert out.count() == docs.count()
        joined = out.join(
            docs.select(
                "doc_id",
                F.size(
                    F.filter(
                        F.split(F.lower("text"), " "),
                        lambda t: F.length(t) > 0,
                    )
                ).alias("n_toks"),
            ),
            "doc_id",
        )
        bad = joined.filter(
            F.col("n_bigrams") != F.greatest(F.col("n_toks") - 1, F.lit(0))
        )
        assert bad.isEmpty()

    def test_score_bounds_and_short_doc(self, spark):
        from ml_feature_store_spark.operators.text import bigram_lm_doc_score

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "solo"), (3, "")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in bigram_lm_doc_score(df).collect()}
        # p_e6 is a scaled probability: 0 <= p <= 1e6, so avg too
        assert 0 <= rows[1]["lm_avg_e6"] <= 1_000_000
        assert rows[2]["n_bigrams"] == 0 and rows[2]["lm_sum_e6"] == 0
        assert rows[3]["n_bigrams"] == 0 and rows[3]["lm_avg_e6"] == 0
        # doc 1: bigrams (a b), (b a), (a b); V=3 (a, b, solo)... vocab is
        # corpus-wide: tokens {a, b, solo}. c(a)=2? no: corpus tokens
        # a,b,a,b,solo -> c(a)=2, c(b)=2, c(solo)=1, V=3.
        # p(a b)=(2+1)*1e6 div (2+3)=600000; p(b a)=(1+1)*1e6 div (2+3)=400000
        assert rows[1]["lm_sum_e6"] == 600000 + 400000 + 600000


class TestCooccurrenceJaccard:
    def test_matches_bruteforce(self, spark):
        from ml_feature_store_spark.operators.graph import cooccurrence_jaccard

        li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
        out = {
            (r["item_a"], r["item_b"]): r
            for r in cooccurrence_jaccard(
                li, "l_orderkey", "l_partkey", min_common=2
            ).collect()
        }
        # brute force in python
        import collections

        baskets = collections.defaultdict(set)
        for r in li.collect():
            baskets[r["l_orderkey"]].add(r["l_partkey"])
        deg = collections.Counter()
        common = collections.Counter()
        for items in baskets.values():
            for i in items:
                deg[i] += 1
            s = sorted(items)
            for i, a in enumerate(s):
                for b in s[i + 1 :]:
                    common[(a, b)] += 1
        expect = {
            p: c for p, c in common.items() if c >= 2
        }
        assert set(out) == set(expect)
        for (a, b), c in expect.items():
            row = out[(a, b)]
            assert row["common"] == c
            assert row["deg_a"] == deg[a] and row["deg_b"] == deg[b]
            assert row["jaccard_e6"] == c * 1_000_000 // (deg[a] + deg[b] - c)

    def test_max_basket_cap_drops_hubs(self, spark):
        from ml_feature_store_spark.operators.graph import cooccurrence_jaccard

        rows = [(1, i) for i in range(10)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
        df = spark.createDataFrame(rows, "b long, item long")
        capped = cooccurrence_jaccard(df, "b", "item", min_common=2, max_basket=5)
        got = {(r["item_a"], r["item_b"]): r["common"] for r in capped.collect()}
        # the 10-item hub basket is dropped: pair (1,2) co-occurs only in
        # baskets 2 and 3; degrees exclude the hub
        assert got == {(1, 2): 2}

    def test_degree_dims_broadcast(self, spark):
        from ml_feature_store_spark.operators.graph import cooccurrence_jaccard

        li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
        plan = executed_plan(
            cooccurrence_jaccard(li, "l_orderkey", "l_partkey", min_common=2)
        )
        assert plan.count("BroadcastHashJoin") >= 2


class TestRadiusJoin:
    def test_matches_bruteforce_crossjoin(self, spark):
        from ml_feature_store_spark.operators.spatial import (
            radius_count_join,
            synth_grid_points,
        )

        cust = synth_grid_points(
            table(spark, SF, "customer").select("c_custkey"),
            "c_custkey",
            extent=10_000,
            prefix="c",
        ).cache()
        supp = synth_grid_points(
            table(spark, SF, "supplier").select("s_suppkey"),
            "s_suppkey",
            extent=10_000,
            prefix="s",
        ).cache()
        fast = radius_count_join(
            cust, supp, radius=1000, point_key="c_custkey", center_key="s_suppkey"
        )
        r2 = 1000 * 1000
        brute = (
            supp.select("s_suppkey", F.col("x").alias("sx"), F.col("y").alias("sy"))
            .crossJoin(cust)
            .filter(
                (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
                + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
                <= F.lit(r2)
            )
            .groupBy("s_suppkey")
            .agg(
                F.count("*").alias("n_within"),
                F.sum("c_custkey").cast("long").alias("sum_point_keys"),
            )
        )
        brute_full = (
            supp.select("s_suppkey")
            .join(brute, "s_suppkey", "left")
            .select(
                "s_suppkey",
                F.coalesce("n_within", F.lit(0)).cast("long").alias("n_within"),
                F.coalesce("sum_point_keys", F.lit(0))
                .cast("long")
                .alias("sum_point_keys"),
            )
        )
        assert fast.exceptAll(brute_full).isEmpty()
        assert brute_full.exceptAll(fast).isEmpty()
        # sanity: the radius actually captures a nontrivial neighborhood
        assert fast.agg(F.sum("n_within")).collect()[0][0] > 0

    def test_points_never_shuffled_before_join(self, spark):
        """The 9-cell centers side broadcasts; the points side reaches the
        join straight from the scan (no Exchange under the join's big
        side) — the decon1 broadcast-banlist shape."""
        from ml_feature_store_spark.operators.spatial import (
            radius_count_join,
            synth_grid_points,
        )

        cust = synth_grid_points(
            table(spark, SF, "customer").select("c_custkey"),
            "c_custkey",
            extent=10_000,
            prefix="c",
        )
        supp = synth_grid_points(
            table(spark, SF, "supplier").select("s_suppkey"),
            "s_suppkey",
            extent=10_000,
            prefix="s",
        )
        out = radius_count_join(
            cust, supp, radius=1000, point_key="c_custkey", center_key="s_suppkey"
        )
        plan = executed_plan(out)
        assert "BroadcastHashJoin" in plan
        # allowed exchanges: the partial-agg rollup on center key and the
        # final left join's small sides; the hits-side join itself must
        # not SortMergeJoin (which would shuffle every point on cell key)
        assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]

    def test_negative_coordinates_match_bruteforce(self, spark):
        """Floor cell keys keep the 9-cell cover exact on negative
        coordinates (grid spanning the origin)."""
        from ml_feature_store_spark.operators.spatial import radius_count_join

        pts = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(
                [(-25, -25), (-12, 0), (-1, -1), (0, 0), (3, -9), (11, 4),
                 (-11, 9), (9, -11), (25, 25), (-19, 18)]
            )],
            "p long, x long, y long",
        )
        ctr = spark.createDataFrame(
            [(1, -10, -10), (2, 0, 0), (3, 10, 10), (4, -20, 20)],
            "k long, x long, y long",
        )
        fast = {
            r["k"]: (r["n_within"], r["sum_point_keys"])
            for r in radius_count_join(
                pts, ctr, radius=10, point_key="p", center_key="k"
            ).collect()
        }
        brute = {}
        for k, cx, cy in [(1, -10, -10), (2, 0, 0), (3, 10, 10), (4, -20, 20)]:
            hits = [
                (i, x, y) for i, (x, y) in enumerate(
                    [(-25, -25), (-12, 0), (-1, -1), (0, 0), (3, -9), (11, 4),
                     (-11, 9), (9, -11), (25, 25), (-19, 18)]
                )
                if (x - cx) ** 2 + (y - cy) ** 2 <= 100
            ]
            brute[k] = (len(hits), sum(h[0] for h in hits))
        assert fast == brute

    def test_radius_validation(self, spark):
        from ml_feature_store_spark.operators.spatial import radius_count_join

        df = spark.createDataFrame([(1, 0, 0)], "k long, x long, y long")
        with pytest.raises(ValueError):
            radius_count_join(df, df, radius=0, point_key="k", center_key="k")


class TestStreamDedup:
    def test_stream_equals_batch_distinct(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark over two ordered batches must
        equal batch DISTINCT when the watermark outlives the feed."""
        from ml_feature_store_spark.suite_common import _write_ordered_feed

        ev = table(spark, SF, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        d = str(tmp_path / "feed")
        mid = F.lit("2024-01-16").cast("timestamp")
        _write_ordered_feed(
            d, ev.filter(F.col("ts") < mid), ev.filter(F.col("ts") >= mid)
        )
        from ml_feature_store_spark.streaming.ingest import stream_events

        stream = stream_events(spark, d)
        q = (
            stream.withWatermark("ts", "60 days")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
            .writeStream.format("memory")
            .queryName("t_sd4")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        got = spark.table("t_sd4")
        want = ev.select("user_id", "event_type").distinct()
        assert got.exceptAll(want).isEmpty()
        assert want.exceptAll(got).isEmpty()


class TestRandomWalks:
    def test_matches_python_replay(self, spark):
        """Replay the md5-argmax policy in Python over a toy graph."""
        import hashlib

        from ml_feature_store_spark.operators.graph import random_walks

        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
            "src string, dst string",
        )
        starts = spark.createDataFrame([("a",), ("d",)], "node string")
        got = {
            r["walker"]: (r["n1"], r["n2"], r["n3"])
            for r in random_walks(edges, starts, steps=3).collect()
        }

        adj = {}
        for s, d in [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)

        def pick(walker, step, cur):
            return max(
                adj[cur],
                key=lambda v: (
                    hashlib.md5(f"w:{walker}:{step}:{v}".encode()).hexdigest(),
                    v,
                ),
            )

        for w in ("a", "d"):
            cur, hops = w, []
            for s in (1, 2, 3):
                cur = pick(w, s, cur)
                hops.append(cur)
            assert got[w] == tuple(hops)

    def test_walker_without_edges_dropped(self, spark):
        from ml_feature_store_spark.operators.graph import random_walks

        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        starts = spark.createDataFrame([("a",), ("z",)], "node string")
        out = random_walks(edges, starts, steps=2).collect()
        assert {r["walker"] for r in out} == {"a"}


class TestMatryoshkaRecall:
    def test_full_width_truncation_is_exact(self, spark):
        """Slicing to the FULL dimension must reproduce the exact top-10
        (identity case), and the declared arms stay within [0, 10]."""
        from ml_feature_store_spark.operators.similarity import knn_brute_force
        from ml_feature_store_spark.suite import QUERIES

        emb = table(spark, SF, "embeddings")
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        rest = emb.filter(F.col("vec_id") != 0)
        dim = len(qvec)
        trunc = rest.withColumn("tv", F.slice(F.col("embedding"), 1, dim))
        exact = {r["vec_id"] for r in knn_brute_force(rest, qvec, k=10).collect()}
        same = {
            r["vec_id"]
            for r in knn_brute_force(trunc, qvec, k=10, vec_col="tv").collect()
        }
        assert exact == same

        rows = QUERIES["emb2_matryoshka_recall"](spark, SF).collect()
        assert [r["dims"] for r in rows] == [8, 16, 32]
        for r in rows:
            assert 0 <= r["n_overlap"] <= 10
            assert r["recall_pct"] == r["n_overlap"] * 10
