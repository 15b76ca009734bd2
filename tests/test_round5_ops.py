"""Round-5 operator additions: mapInArrow table function (token_runs),
Unicode NFC normalization, and two-pass global row numbering.

Each gets a semantics check against an in-test brute-force reference,
plus the physical property that motivates the operator (fe6: no
single-partition global-window exchange; udtf1: lossless expansion)."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.text import normalize_nfc, token_runs
from ml_feature_store_spark.operators.util import global_row_number
from ml_feature_store_spark.suite import table

SF = "/root/testdata/sf0.001"


def brute_runs(text):
    """Reference run-length expansion: (run_idx, token, run_start, run_len)."""
    toks = text.split(" ")
    out, i, ri = [], 0, 0
    while i < len(toks):
        j = i + 1
        while j < len(toks) and toks[j] == toks[i]:
            j += 1
        out.append((ri, toks[i], i, j - i))
        ri += 1
        i = j
    return out


class TestTokenRuns:
    def test_matches_brute_force(self, spark):
        rows = [
            (1, "a a a b b c"),
            (2, "x y x y"),
            (3, "solo"),
            (4, ""),  # ''.split(' ') == [''] -> one run of the empty token
            (5, None),  # NULL expands to zero rows, like unnest(NULL)
            (6, "t t t t t t t t"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_id"], r["run_idx"]): (r["token"], r["run_start"], r["run_len"])
            for r in token_runs(df).collect()
        }
        want = {}
        for did, text in rows:
            if text is None:
                continue
            for ri, tok, st, ln in brute_runs(text):
                want[(did, ri)] = (tok, st, ln)
        assert got == want

    def test_lossless_expansion(self, spark):
        """sum(run_len) per doc must rebuild the doc's token count —
        the generator drops and invents nothing."""
        docs = table(spark, SF, "documents").limit(50)
        runs = token_runs(docs)
        rebuilt = {
            r["doc_id"]: r["n"]
            for r in runs.groupBy("doc_id")
            .agg(F.sum("run_len").alias("n"))
            .collect()
        }
        truth = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id",
                F.size(F.split("text", " ", -1)).cast("long").alias("n"),
            ).collect()
        }
        assert rebuilt == truth

    def test_run_starts_partition_positions(self, spark):
        """Within a doc, runs tile [0, n_tokens): each run starts where
        the previous ended and run_idx follows run_start order."""
        docs = table(spark, SF, "documents").limit(20)
        rows = token_runs(docs).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for did, rs in by_doc.items():
            rs.sort(key=lambda r: r["run_idx"])
            pos = 0
            for r in rs:
                assert r["run_start"] == pos
                assert r["run_len"] >= 1
                pos += r["run_len"]


class TestNormalizeNfc:
    def test_composes_decomposed(self, spark):
        decomposed = "café Å"
        df = spark.createDataFrame(
            [(1, decomposed), (2, "plain ascii"), (3, None)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["text_nfc"] for r in normalize_nfc(df).collect()
        }
        assert got[1] == unicodedata.normalize("NFC", decomposed)
        assert got[1] == "café Å"
        assert got[2] == "plain ascii"
        assert got[3] is None

    def test_idempotent_and_dedup_unifying(self, spark):
        """The operator's purpose: precomposed and decomposed spellings
        hash identically after NFC, so exact dedup catches the pair."""
        df = spark.createDataFrame(
            [(1, "café"), (2, "café")], "doc_id long, text string"
        )
        out = normalize_nfc(df)
        hashes = (
            out.select(F.sha2(F.encode("text_nfc", "UTF-8"), 256).alias("h"))
            .distinct()
            .count()
        )
        assert hashes == 1
        # idempotent: a second pass is a no-op
        twice = normalize_nfc(out.drop("text").withColumnRenamed("text_nfc", "text"))
        assert twice.filter(F.col("text") != F.col("text_nfc")).count() == 0


class TestGlobalRowNumber:
    def test_equals_window_form(self, spark):
        o = table(spark, SF, "orders").select("o_orderkey")
        got = {
            r["o_orderkey"]: r["row_no"]
            for r in global_row_number(o, "o_orderkey").collect()
        }
        keys = sorted(got)
        assert got == {k: i + 1 for i, k in enumerate(keys)}

    def test_contiguous_from_one(self, spark):
        df = spark.createDataFrame(
            [(v,) for v in (7, 3, 99, 12, 5)], "k long"
        )
        rows = global_row_number(df, "k", num_partitions=8).collect()
        assert sorted(r["row_no"] for r in rows) == [1, 2, 3, 4, 5]
        assert {r["k"]: r["row_no"] for r in rows} == {3: 1, 5: 2, 7: 3, 12: 4, 99: 5}

    def test_more_partitions_than_rows(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "k long")
        rows = global_row_number(df, "k", num_partitions=16).collect()
        assert {r["k"]: r["row_no"] for r in rows} == {1: 1, 2: 2}

    def test_no_single_partition_window(self, spark):
        """The physical point: the plan must not contain a Window node
        (the ORDER-BY-everything frame that collapses to one task)."""
        o = table(spark, SF, "orders").select("o_orderkey")
        plan = global_row_number(o, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan


class TestQuantileBinning:
    def test_matches_brute_force(self, spark):
        from ml_feature_store_spark.operators.encoding import quantile_binning

        o = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        got = {
            r["o_orderkey"]: r["bin"]
            for r in quantile_binning(o, "o_totalprice", n_bins=4).collect()
        }
        rows = o.collect()
        cents = sorted(round(r["o_totalprice"] * 100) for r in rows)
        n = len(cents)
        # exact interpolated percentile (numpy 'linear' / SQL percentile)
        def pct(f):
            idx = f * (n - 1)
            lo, hi = int(idx), min(int(idx) + 1, n - 1)
            return round(cents[lo] + (cents[hi] - cents[lo]) * (idx - lo))
        bounds = [pct(k / 4) for k in (1, 2, 3)]
        for r in rows:
            c = round(r["o_totalprice"] * 100)
            assert got[r["o_orderkey"]] == sum(1 for b in bounds if b < c)

    def test_equal_frequency_and_validation(self, spark):
        from ml_feature_store_spark.operators.encoding import quantile_binning

        df = spark.createDataFrame(
            [(float(v),) for v in range(1, 101)], "x double"
        )
        counts = {
            r["bin"]: r["n"]
            for r in quantile_binning(df, "x", n_bins=5)
            .groupBy("bin")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert set(counts) == {0, 1, 2, 3, 4}
        assert all(c == 20 for c in counts.values())
        with pytest.raises(ValueError):
            quantile_binning(df, "x", n_bins=1)


class TestWeightedPrioritySample:
    def test_matches_brute_force_replay(self, spark):
        import hashlib

        from ml_feature_store_spark.operators.sampling import (
            weighted_priority_sample,
        )

        docs = table(spark, SF, "documents").select("doc_id", "n_chars")
        got = [
            r["doc_id"]
            for r in weighted_priority_sample(docs, "doc_id", "n_chars", k=25)
            .orderBy(F.col("priority").desc(), "doc_id")
            .collect()
        ]
        rows = docs.collect()
        def u(did):
            return int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) + 1
        ranked = sorted(
            rows, key=lambda r: (-(r["n_chars"] * float(1 << 60) / u(r["doc_id"])), r["doc_id"])
        )
        assert got == [r["doc_id"] for r in ranked[:25]]

    def test_weighting_prefers_heavy_items(self, spark):
        """A weight-1000 item set vs a weight-1 item set of equal size:
        the heavy half must dominate the sample (the property that
        distinguishes this from uniform bottom-k)."""
        from ml_feature_store_spark.operators.sampling import (
            weighted_priority_sample,
        )

        rows = [(i, 1000 if i < 200 else 1) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, w long")
        samp = weighted_priority_sample(df, "id", "w", k=100).collect()
        heavy = sum(1 for r in samp if r["w"] == 1000)
        assert heavy >= 90

    def test_validates_k(self, spark):
        from ml_feature_store_spark.operators.sampling import (
            weighted_priority_sample,
        )

        df = spark.createDataFrame([(1, 1)], "id long, w long")
        with pytest.raises(ValueError):
            weighted_priority_sample(df, "id", "w", k=0)


class TestImputeMedian:
    def test_fills_with_group_median(self, spark):
        from ml_feature_store_spark.operators.encoding import impute_median

        rows = [
            ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
            ("b", 10.0), ("b", None), ("b", 30.0),
        ]
        df = spark.createDataFrame(rows, "g string, value double")
        out = {
            (r["g"], r["cents"]): r["cents_imputed"]
            for r in impute_median(df, "value", "g").collect()
        }
        assert out[("a", None)] == 200   # median of 100,200,300
        assert out[("b", None)] == 2000  # median of 1000,3000
        assert out[("a", 100)] == 100    # observed values untouched

    def test_all_null_group_stays_null(self, spark):
        from ml_feature_store_spark.operators.encoding import impute_median

        df = spark.createDataFrame(
            [("a", 1.0), ("z", None)], "g string, value double"
        )
        row = {
            r["g"]: r for r in impute_median(df, "value", "g").collect()
        }
        assert row["z"]["cents_imputed"] is None
        assert row["z"]["median_cents"] is None


class TestRound5Plans:
    """Physical-plan gates for the round-5 operators, test_plans.py style:
    the scale property each docstring claims must be visible in the
    executed plan, not just argued."""

    def test_x29_topk_no_global_sort(self, spark):
        from ml_feature_store_spark.operators.sampling import (
            weighted_priority_sample,
        )
        from ml_feature_store_spark.plans import executed_plan

        docs = table(spark, SF, "documents").select("doc_id", "n_chars")
        plan = executed_plan(
            weighted_priority_sample(docs, "doc_id", "n_chars", k=25)
        )
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan  # no global sort

    def test_j6_broadcasts_nullsafe_dim(self, spark):
        from ml_feature_store_spark.plans import executed_plan
        from ml_feature_store_spark.suite import QUERIES

        plan = executed_plan(QUERIES["j6_nullsafe_join"](spark, SF))
        assert "BroadcastHashJoin" in plan
        # fact side must reach the join without an exchange of its own
        assert "SortMergeJoin" not in plan

    def test_fe7_fe8_broadcast_dims_no_fact_shuffle(self, spark):
        from ml_feature_store_spark.operators.encoding import (
            impute_median,
            quantile_binning,
        )
        from ml_feature_store_spark.plans import executed_plan

        o = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        p7 = executed_plan(quantile_binning(o, "o_totalprice", n_bins=10))
        assert "BroadcastNestedLoopJoin" in p7  # scalar boundary dim
        ev = table(spark, SF, "events").select("event_id", "event_type", "value")
        p8 = executed_plan(impute_median(ev, "value", "event_type"))
        assert "BroadcastHashJoin" in p8
        assert "SortMergeJoin" not in p8


class TestObservedMetrics:
    def test_observe_equals_direct_aggregate(self, spark):
        """The dq11 contract: metrics piggybacked on a pass via observe()
        equal a dedicated aggregate scan."""
        from pyspark.sql import Observation

        ev = table(spark, SF, "events")
        obs = Observation("t_obs")
        observed = ev.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        )
        observed.write.format("noop").mode("overwrite").save()
        m = obs.get
        direct = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        ).collect()[0]
        assert (m["n"], m["lo"], m["hi"]) == (
            direct["n"], direct["lo"], direct["hi"]
        )


class TestPythonDataSource:
    def test_rows_match_formula(self, spark):
        from ml_feature_store_spark.sources.pyds import (
            SyntheticFeedDataSource,
            synthetic_row,
        )

        spark.dataSource.register(SyntheticFeedDataSource)
        rows = (
            spark.read.format("synthetic_feed")
            .option("partitions", 3)
            .option("rowsperpartition", 50)
            .load()
            .collect()
        )
        assert len(rows) == 150
        for r in rows:
            i, key, cents = synthetic_row(r["i"])
            assert (r["key"], r["amount_cents"]) == (key, cents)
            assert r["part"] == r["i"] // 50

    def test_pushdown_prunes_partitions(self, spark):
        """pushFilters on part must drop non-matching partitions BEFORE
        scheduling: asserted both at the reader level (partitions()
        shrinks) and end-to-end (results still correct)."""
        from pyspark.sql.datasource import EqualTo, InputPartition

        from ml_feature_store_spark.sources.pyds import (
            SyntheticFeedDataSource,
            SyntheticFeedReader,
        )

        r = SyntheticFeedReader({"partitions": "8", "rowsperpartition": "10"})
        leftover = list(r.pushFilters([EqualTo(("part",), 5)]))
        assert leftover == []  # fully handled
        assert [p.value for p in r.partitions()] == [5]
        # an unsupported filter is returned to Spark untouched
        r2 = SyntheticFeedReader({"partitions": "4", "rowsperpartition": "10"})
        other = EqualTo(("key",), 1)
        assert list(r2.pushFilters([other])) == [other]
        assert len(r2.partitions()) == 4

        spark.dataSource.register(SyntheticFeedDataSource)
        df = (
            spark.read.format("synthetic_feed")
            .option("partitions", 8)
            .option("rowsperpartition", 10)
            .load()
        )
        got = df.filter(F.col("part") == 5).agg(
            F.count("*").alias("n"), F.min("i").alias("lo"), F.max("i").alias("hi")
        ).collect()[0]
        assert (got["n"], got["lo"], got["hi"]) == (10, 50, 59)


class TestVariantExtract:
    def test_variant_equals_from_json_lane(self, spark):
        """The x30 contract: variant_get over try_parse_json extracts the
        same typed values as the from_json path, and malformed input
        yields NULL through both."""
        df = spark.createDataFrame(
            [(1, '{"k": 7}'), (2, '{"k":'), (3, None), (4, '{"k": -3}')],
            "id long, js string",
        )
        v = F.try_parse_json(F.col("js"))
        got = {
            r["id"]: r["k"]
            for r in df.select(
                "id", F.variant_get(v, "$.k", "long").alias("k")
            ).collect()
        }
        want = {
            r["id"]: r["k"]
            for r in df.select(
                "id", F.from_json("js", "k long").getField("k").alias("k")
            ).collect()
        }
        assert got == want == {1: 7, 2: None, 3: None, 4: -3}


def brute_kcore(edges, k):
    """Reference fixpoint k-core: peel until stable, return {node: degree}."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, ps in adj.items() if len(ps) < k]:
            for p in adj[n]:
                adj[p].discard(n)
            del adj[n]
            changed = True
    return {n: len(ps) for n, ps in adj.items()}


class TestKcoreFixpoint:
    # A chain hanging off a clique: peeling the chain takes one round per
    # link, so the 4-round default is provably NOT the fixpoint here while
    # until_converged is — the case the flag exists for.
    EDGES = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique (3-core)
        (4, 10), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),  # chain
        (20, 21), (21, 22), (20, 22),  # triangle (2-core)
    ]

    def test_matches_brute_force_and_flags_converged(self, spark):
        from ml_feature_store_spark.operators.graph import kcore

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        for k in (2, 3):
            rows = kcore(e, k=k, until_converged=True).collect()
            assert all(r["converged"] for r in rows)
            got = {r["node"]: r["degree"] for r in rows}
            assert got == brute_kcore(self.EDGES, k)

    def test_fixpoint_stable_under_one_more_peel(self, spark):
        """The self-certifying property: every surviving node already has
        degree >= k, so one more peel removes nothing."""
        from ml_feature_store_spark.operators.graph import kcore

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        out = kcore(e, k=2, until_converged=True)
        assert out.filter(F.col("degree") < 2).count() == 0
        survivors = {r["node"] for r in out.collect()}
        # replay one peel in python over the surviving subgraph
        sub = [
            (a, b) for a, b in self.EDGES
            if a in survivors and b in survivors
        ]
        assert brute_kcore(sub, 2).keys() == survivors

    def test_bounded_default_unchanged(self, spark):
        """The oracle's contract — exactly `rounds` peels, no flag column."""
        from ml_feature_store_spark.operators.graph import kcore

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        out = kcore(e, k=2, rounds=2)
        assert out.columns == ["node", "degree"]
        # after only 2 peels the 6-link chain is not fully peeled yet
        assert out.count() > len(brute_kcore(self.EDGES, 2))

    def test_max_rounds_cap_reports_not_converged(self, spark):
        from ml_feature_store_spark.operators.graph import kcore

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        rows = kcore(e, k=2, until_converged=True, max_rounds=1).collect()
        assert rows and all(r["converged"] is False for r in rows)


class TestParagraphDedup:
    def test_first_occurrence_keep(self, spark):
        """Globally-first occurrence (min doc_id, then min pos) is kept;
        every other occurrence of the same trimmed paragraph is dropped,
        including repeats WITHIN one document."""
        from ml_feature_store_spark.operators.dedup import paragraph_dedup

        rows = [
            (1, "alpha beta|boiler|gamma"),
            (2, "boiler|alpha beta|delta"),
            (3, "boiler|boiler|  alpha beta "),  # trim normalizes
            (4, "unique only"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            (r["doc_id"], r["pos"]): (r["par"], r["keep"])
            for r in paragraph_dedup(df, delim="|").collect()
        }
        assert out[(1, 0)] == ("alpha beta", True)
        assert out[(1, 1)] == ("boiler", True)
        assert out[(1, 2)] == ("gamma", True)
        assert out[(2, 0)] == ("boiler", False)
        assert out[(2, 1)] == ("alpha beta", False)
        assert out[(2, 2)] == ("delta", True)
        assert out[(3, 0)] == ("boiler", False)
        assert out[(3, 1)] == ("boiler", False)
        assert out[(3, 2)] == ("alpha beta", False)
        assert out[(4, 0)] == ("unique only", True)

    def test_empty_and_null_segments_dropped(self, spark):
        from ml_feature_store_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "a|| |b"), (2, None)], "doc_id long, text string"
        )
        got = sorted(
            (r["doc_id"], r["pos"], r["par"])
            for r in paragraph_dedup(df, delim="|").collect()
        )
        # empties (from '||' and ' ') vanish; NULL text expands to no rows
        assert got == [(1, 0, "a"), (1, 3, "b")]

    def test_no_paragraph_window_sort(self, spark):
        """The first-occurrence rule must be the min-struct AGGREGATE, not
        a row_number window partitioned by paragraph — the hot-boilerplate
        key would serialize a corpus-sized partition through one task's
        sort. No Window node may appear in the plan."""
        from ml_feature_store_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame([(1, "a|b")], "doc_id long, text string")
        plan = paragraph_dedup(df, delim="|")._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan


class TestSessionGapsUdtf:
    def test_matches_window_brute_force(self, spark):
        from ml_feature_store_spark.operators.sessionize import (
            register_session_gaps_udtf,
        )

        gap = 30 * 60 * 1_000_000
        rows = [
            (1, 0), (1, 100), (1, 100 + gap),          # ==gap: same session
            (1, 100 + gap + gap + 1),                   # >gap: break
            (2, 50),                                    # single event
            (3, 7), (3, 7),                             # tie: gap 0
        ]
        df = spark.createDataFrame(rows, "user_id long, us long")
        df.createOrReplaceTempView("tsg_ev")
        name = register_session_gaps_udtf(spark)
        got = {
            r["user_id"]: (r["n_events"], r["n_sessions"], r["max_gap_us"])
            for r in spark.sql(
                f"SELECT * FROM {name}(TABLE(tsg_ev) "
                "PARTITION BY user_id ORDER BY us)"
            ).collect()
        }
        assert got == {
            1: (4, 2, gap + 1),
            2: (1, 1, 0),
            3: (2, 1, 0),
        }

    def test_partition_isolation(self, spark):
        """State must reset per partition: two users with interleaved
        timestamps never leak gaps across the boundary."""
        from ml_feature_store_spark.operators.sessionize import (
            register_session_gaps_udtf,
        )

        df = spark.createDataFrame(
            [(1, 0), (2, 10**12), (1, 5), (2, 10**12 + 5)],
            "user_id long, us long",
        )
        df.createOrReplaceTempView("tsg_iso")
        name = register_session_gaps_udtf(spark)
        got = {
            r["user_id"]: (r["n_events"], r["n_sessions"], r["max_gap_us"])
            for r in spark.sql(
                f"SELECT * FROM {name}(TABLE(tsg_iso) "
                "PARTITION BY user_id ORDER BY us)"
            ).collect()
        }
        assert got == {1: (2, 1, 5), 2: (2, 1, 5)}


class TestRecursiveTree:
    def test_depth_counts_are_binary_tree(self, spark):
        """Over keys 1..N the parent=floor(k/2) tree has exactly
        min(2^d, remaining) nodes per depth, and path sums accumulate
        along the recursion."""
        from ml_feature_store_spark.relational import q_q24_recursive_tree

        out = {
            r["depth"]: (r["n_nodes"], r["min_key"], r["max_key"])
            for r in q_q24_recursive_tree(spark, SF).collect()
        }
        assert out[0] == (1, 1, 1)
        assert out[1] == (2, 2, 3)
        assert out[2] == (4, 4, 7)
        # every level is the contiguous key block [2^d, 2^(d+1))
        for d, (n, lo, hi) in out.items():
            assert lo == 2**d
            assert n == hi - lo + 1


class TestSessionWindowBatch:
    def test_gap_boundary_is_inclusive(self, spark):
        """An event arriving EXACTLY gap after the previous one MERGES
        into the session (merge condition: new start <= session end =
        last+gap); only a strictly larger gap breaks — the boundary
        semantic the w3 oracle's strict-> break replays. Pinned by
        experiment: the half-open-[start, end) intuition is about
        TUMBLING window membership, not session merging."""
        gap_s = 30 * 60
        rows = [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:30:00"),  # == gap after -> SAME session
            (1, "2024-01-01 11:00:01"),  # gap+1s after -> NEW session
            (2, "2024-01-01 10:00:00"),
            (2, "2024-01-01 10:29:59"),  # < gap -> same session
        ]
        df = spark.createDataFrame(rows, "u long, s string").select(
            "u", F.col("s").cast("timestamp").alias("ts")
        )
        out = (
            df.groupBy("u", F.session_window("ts", f"{gap_s} seconds"))
            .count()
            .groupBy("u")
            .agg(F.count("*").alias("n_sessions"))
        )
        got = {r["u"]: r["n_sessions"] for r in out.collect()}
        assert got == {1: 2, 2: 1}


class TestDecimalExact:
    def test_sum_is_exact_and_order_independent(self, spark):
        """Decimal aggregation must yield the same digits under any
        partitioning (associative); the witness emits strings so this is
        the property the hash gate rides on."""
        from ml_feature_store_spark.suite_rel import q_num1_decimal_exact

        a = {
            (r["l_returnflag"], r["l_linestatus"]): (
                r["sum_base"], r["sum_disc"], r["sum_charge"], r["n"]
            )
            for r in q_num1_decimal_exact(spark, SF).collect()
        }
        # brute-force with python Decimal (exact) over the raw rows
        from decimal import Decimal

        rows = (
            table(spark, SF, "lineitem")
            .select("l_returnflag", "l_linestatus",
                    "l_extendedprice", "l_discount", "l_tax")
            .collect()
        )
        want = {}
        q2 = Decimal("0.01")
        for r in rows:
            k = (r["l_returnflag"], r["l_linestatus"])
            p = Decimal(str(r["l_extendedprice"])).quantize(q2)
            d = Decimal(str(r["l_discount"])).quantize(q2)
            t = Decimal(str(r["l_tax"])).quantize(q2)
            s1, s2, s3, n = want.get(k, (Decimal(0), Decimal(0), Decimal(0), 0))
            disc = p * (1 - d)
            want[k] = (s1 + p, s2 + disc, s3 + disc * (1 + t), n + 1)
        for k, (s1, s2, s3, n) in want.items():
            g1, g2, g3, gn = a[k]
            assert Decimal(g1) == s1
            assert Decimal(g2) == s2
            assert Decimal(g3) == s3
            assert gn == n


class TestSqlVariables:
    def test_variable_folds_to_literal(self, spark):
        """The consuming query must not re-run the cutoff subquery: the
        variable reference resolves to a foldable literal, so the
        optimized plan contains no scalar subquery."""
        from ml_feature_store_spark.suite_rel import q_q25_sql_variables

        df = q_q25_sql_variables(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Subquery" not in plan
        rows = df.collect()
        assert len(rows) >= 1
        cut = rows[0]["cutoff_cents"]
        # cutoff is the discrete median: an actual observed cents value
        cents = [
            int(r["o_totalprice"] * 100 + 0.5)
            for r in table(spark, SF, "orders").select("o_totalprice").collect()
        ]
        assert cut in cents


class TestDynamicPartitionOverwrite:
    def test_untouched_partitions_survive(self, spark, tmp_path):
        d = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "b", 30)], "id long, p string, v long"
        )
        df.write.partitionBy("p").parquet(d)
        fix = spark.createDataFrame([(9, "a", 99)], "id long, p string, v long")
        (
            fix.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("p")
            .parquet(d)
        )
        got = sorted(
            (r["id"], r["p"], r["v"]) for r in spark.read.parquet(d).collect()
        )
        # partition a replaced wholesale; partition b untouched
        assert got == [(2, "b", 20), (3, "b", 30), (9, "a", 99)]

    def test_static_mode_would_wipe(self, spark, tmp_path):
        """Contrast pin: the default static overwrite truncates ALL
        partitions — the failure mode io16's dynamic lane exists to
        avoid."""
        d = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, p string, v long"
        )
        df.write.partitionBy("p").parquet(d)
        fix = spark.createDataFrame([(9, "a", 99)], "id long, p string, v long")
        (
            fix.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("p")
            .parquet(d)
        )
        got = sorted(
            (r["id"], r["p"], r["v"]) for r in spark.read.parquet(d).collect()
        )
        assert got == [(9, "a", 99)]


class TestAesTokenize:
    def test_gcm_random_iv_is_nondeterministic_but_roundtrips(self, spark):
        """The confidentiality-grade contrast to t15's deterministic CBC
        lane: GCM draws a random IV per call, so equal plaintexts yield
        DIFFERENT ciphertexts (no joinability — by design), while
        decrypt still recovers the plaintext."""
        df = spark.sql(
            """SELECT aes_encrypt('secret', '0123456789abcdef', 'GCM') AS c1,
                      aes_encrypt('secret', '0123456789abcdef', 'GCM') AS c2"""
        ).collect()[0]
        assert bytes(df["c1"]) != bytes(df["c2"])
        back = spark.sql(
            """SELECT CAST(aes_decrypt(
                 aes_encrypt('secret', '0123456789abcdef', 'GCM'),
                 '0123456789abcdef', 'GCM') AS STRING) AS p"""
        ).collect()[0]["p"]
        assert back == "secret"

    def test_cbc_fixed_iv_deterministic(self, spark):
        r = spark.sql(
            """SELECT base64(aes_encrypt('x', '0123456789abcdef', 'CBC',
                     'DEFAULT', unhex('00000000000000000000000000000000'))) AS a,
                      base64(aes_encrypt('x', '0123456789abcdef', 'CBC',
                     'DEFAULT', unhex('00000000000000000000000000000000'))) AS b"""
        ).collect()[0]
        assert r["a"] == r["b"]


class TestBitmapDistinct:
    def test_multibucket_ids_need_bucket_in_key(self, spark):
        """ids 32768 apart share a bit POSITION but live in different
        buckets: the two-level (group, bucket) discipline counts both;
        OR-ing bitmaps across buckets would conflate them to one. This
        is the bug a single-bucket toy corpus can never catch."""
        df = spark.createDataFrame(
            [(1,), (1 + 32768,), (1 + 2 * 32768,)], "k long"
        )
        df.createOrReplaceTempView("bm_t")
        two_level = spark.sql(
            """SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM (
                 SELECT bitmap_count(bitmap_construct_agg(
                          bitmap_bit_position(k))) AS cnt
                 FROM bm_t GROUP BY bitmap_bucket_number(k))"""
        ).collect()[0]["n"]
        assert two_level == 3
        conflated = spark.sql(
            """SELECT bitmap_count(bitmap_or_agg(bm)) AS n FROM (
                 SELECT bitmap_construct_agg(bitmap_bit_position(k)) AS bm
                 FROM bm_t GROUP BY bitmap_bucket_number(k))"""
        ).collect()[0]["n"]
        assert conflated == 1  # the documented anti-pattern, pinned


class TestCrossDocSpans:
    def test_finds_injected_shared_span(self, spark):
        from ml_feature_store_spark.operators.dedup import cross_doc_spans

        quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"  # 10 tokens
        rows = [
            (1, "a b c d e f g h i j " + quote),
            (2, quote + " k l m n o p q r s t"),
            (3, "u v w x y z aa bb cc dd"),  # no overlap
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spans = {
            (r["doc_id"]): (r["span_start"], r["span_len"], r["n_grams"])
            for r in cross_doc_spans(df, k=8).collect()
        }
        # 10-token quote with k=8 -> 3 anchored grams per doc
        assert spans == {1: (10, 10, 3), 2: (0, 10, 3)}

    def test_short_docs_and_sub_k_spans_invisible(self, spark):
        from ml_feature_store_spark.operators.dedup import cross_doc_spans

        rows = [
            (1, "shared seven tokens only right here now"),   # 7 tokens < k
            (2, "shared seven tokens only right here now"),
            (3, "x y"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert cross_doc_spans(df, k=8).count() == 0
        # at k=7 the same pair IS found (span == whole doc)
        got = {
            r["doc_id"]: (r["span_start"], r["span_len"])
            for r in cross_doc_spans(df, k=7).collect()
        }
        assert got == {1: (0, 7), 2: (0, 7)}

    def test_two_separate_spans_not_merged(self, spark):
        from ml_feature_store_spark.operators.dedup import cross_doc_spans

        s1 = "a1 a2 a3 a4 a5 a6 a7 a8"
        s2 = "b1 b2 b3 b4 b5 b6 b7 b8"
        gap = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"
        rows = [
            (1, s1 + " " + gap + " " + s2),
            (2, s1 + " v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12 " + s2),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        by_doc = {}
        for r in cross_doc_spans(df, k=8).collect():
            by_doc.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_len"])
            )
        for d in (1, 2):
            assert sorted(by_doc[d]) == [(0, 8), (20, 8)]


class TestRound5LatePlans:
    def test_w3_session_merge_has_no_join(self, spark):
        """session_window must merge during the sort-aggregate — a plan
        with a Join (the self-join sessionization workaround) or a
        Window (the lag/cumsum form) means the built-in lane regressed."""
        from ml_feature_store_spark.suite_rel import q_w3_session_window_batch

        plan = (
            q_w3_session_window_batch(spark, SF)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Join" not in plan
        assert "Window" not in plan

    def test_x31_gram_generation_is_map_only(self, spark):
        """Gram slicing must ride transform/slice on the token array —
        no Window before the shared-gram aggregate (the lag-concat form
        would add a per-doc sort pass ahead of the explode)."""
        from ml_feature_store_spark.operators.dedup import cross_doc_spans

        df = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
        # The islands pass is two Window NODES (lag + running sum) sharing
        # ONE doc-partitioned sort; what must never appear is a window
        # partitioned by the gram/content (corpus-sized hot partition) or
        # a third pass from gram generation.
        plan = (
            cross_doc_spans(df, k=8)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        win_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
        assert 1 <= len(win_lines) <= 2
        for l in win_lines:
            assert "windowspecdefinition(doc_id" in l


class TestKmvOverlap:
    def test_exact_mode_small_sets(self, spark):
        """Sets smaller than k: the sketch IS the set, estimates are
        exact and sketch_exact flags it."""
        from ml_feature_store_spark.operators.agg import kmv_segment_overlap

        rows = [("A", i) for i in range(40)] + [("B", i) for i in range(20, 70)]
        df = spark.createDataFrame(rows, "seg string, el long")
        r = kmv_segment_overlap(df, "seg", "el", k=256).collect()[0]
        assert r["sketch_exact"]
        assert r["union_est"] == 70.0
        assert r["inter_est"] == 20.0

    def test_duplicates_do_not_crowd_the_sketch(self, spark):
        """The same element repeated a million-ish times must occupy ONE
        sketch slot (distinct-before-sample), or heavy hitters destroy
        the estimate."""
        from ml_feature_store_spark.operators.agg import kmv_segment_overlap

        rows = [("A", 1)] * 500 + [("A", i) for i in range(50)] + [
            ("B", i) for i in range(30, 80)
        ]
        df = spark.createDataFrame(rows, "seg string, el long")
        r = kmv_segment_overlap(df, "seg", "el", k=256).collect()[0]
        assert r["sketch_exact"]
        assert r["union_est"] == 80.0
        assert r["inter_est"] == 20.0

    def test_estimation_mode_within_analytic_error(self, spark):
        """Past k the estimator engages; on a known 3000/1000-overlap
        construction the estimates must land within 3 sigma of truth."""
        from ml_feature_store_spark.operators.agg import kmv_segment_overlap

        rows = [("A", i) for i in range(2000)] + [
            ("B", i) for i in range(1000, 4000)
        ]
        df = spark.createDataFrame(rows, "seg string, el long")
        r = kmv_segment_overlap(df, "seg", "el", k=256).collect()[0]
        assert not r["sketch_exact"]
        assert abs(r["union_est"] - 4000) / 4000 < 0.20
        assert abs(r["inter_est"] - 1000) / 1000 < 0.40


class TestPythonDataSourceWriter:
    def test_roundtrip_and_manifest(self, spark, tmp_path):
        import json
        import os

        from ml_feature_store_spark.sources.pyds import JsonLinesSinkDataSource

        spark.dataSource.register(JsonLinesSinkDataSource)
        d = str(tmp_path / "out")
        df = spark.range(50).selectExpr("id", "id * 2 AS v")
        df.repartition(4).write.format("jsonlines_sink").option(
            "path", d
        ).mode("overwrite").save()
        files = sorted(os.listdir(d))
        assert "_SUCCESS" in files
        assert not any(f.startswith("_staging") for f in files)
        manifest = json.load(open(os.path.join(d, "_SUCCESS")))
        assert manifest["rows"] == 50
        back = spark.read.schema("id long, v long").json(d + "/part-*.jsonl")
        assert back.count() == 50
        assert back.selectExpr("sum(v)").collect()[0][0] == 2450

    def test_stray_staged_file_never_promoted(self, spark, tmp_path):
        """Exactly-once pin: a file staged by ANOTHER job (simulated as
        a pre-existing stray in a foreign _staging-* dir) is NOT
        promoted by commit() — only this job's task-commit-message
        files are — and the foreign job's staging dir is left alone
        (per-job staging scoping: concurrent appends into the same path
        cannot delete each other's staged files)."""
        import os

        from ml_feature_store_spark.sources.pyds import JsonLinesSinkDataSource

        spark.dataSource.register(JsonLinesSinkDataSource)
        d = str(tmp_path / "out2")
        foreign = os.path.join(d, "_staging-otherjob")
        os.makedirs(foreign)
        with open(os.path.join(foreign, "task-DEAD.jsonl"), "w") as f:
            f.write('{"id": 999999, "v": 999999}\n')
        df = spark.range(10).selectExpr("id", "id AS v")
        df.repartition(2).write.format("jsonlines_sink").option(
            "path", d
        ).mode("append").save()
        back = spark.read.schema("id long, v long").json(d + "/part-*.jsonl")
        assert back.count() == 10
        assert back.filter("id = 999999").count() == 0
        # this job's staging dir is cleaned up; the foreign one survives
        own = [
            f for f in os.listdir(d)
            if f.startswith("_staging") and f != "_staging-otherjob"
        ]
        assert own == []
        assert os.path.exists(os.path.join(foreign, "task-DEAD.jsonl"))


class TestPhashDedup:
    def test_band_blocking_and_clique_clustering(self, spark):
        """Identical payloads collapse to the min-id canonical through
        the band/verify/min-neighbor pipeline; distinct payloads stay
        singletons (random 64-bit codes differ by ~32 bits, failing the
        hamming threshold even when a band happens to collide)."""
        from ml_feature_store_spark.multimodal import (
            attach_binary_payload,
            perceptual_hash_stub,
        )

        rows = [
            (1, "same content"),
            (2, "same content"),
            (5, "same content"),
            (9, "other content"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ph = perceptual_hash_stub(attach_binary_payload(df, "text"))
        got = {
            r["doc_id"]: (r["ph_b0"], r["ph_b1"], r["ph_b2"], r["ph_b3"])
            for r in ph.collect()
        }
        assert got[1] == got[2] == got[5]
        assert got[9] != got[1]
        # bands match the sha-256 hex prefix of the payload bytes
        import hashlib

        hx = hashlib.sha256(b"same content").hexdigest()
        assert got[1] == tuple(int(hx[4 * b : 4 * b + 4], 16) for b in range(4))

    def test_kernel_rejects_real_decode_without_codec(self, spark):
        from ml_feature_store_spark.multimodal import (
            attach_binary_payload,
            perceptual_hash_stub,
        )
        import pytest as _pytest

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        ph = perceptual_hash_stub(
            attach_binary_payload(df, "text"), deterministic_fake=False
        )
        with _pytest.raises(Exception):
            ph.collect()


def brute_bfs(edges, seeds, max_hops):
    """Reference multi-source BFS: {node: min hop distance <= max_hops}."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = h
        if not nxt:
            break
        frontier = nxt
    return dist


class TestBfsDistances:
    # Two components: a path graph seeded at one end (distances 0..n,
    # capped), plus an unreachable triangle; a second seed inside the path
    # exercises the MIN-over-seeds semantics.
    EDGES = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
        ("x", "y"), ("y", "z"), ("x", "z"),  # unreachable component
    ]

    def _run(self, spark, seeds, max_hops):
        from ml_feature_store_spark.operators.graph import bfs_distances

        e = spark.createDataFrame(self.EDGES, "src string, dst string")
        s = spark.createDataFrame([(n,) for n in seeds], "node string")
        got = {
            r["node"]: r["dist"]
            for r in bfs_distances(e, s, max_hops=max_hops).collect()
        }
        assert got == brute_bfs(self.EDGES, seeds, max_hops)
        return got

    def test_single_seed_depth_cap(self, spark):
        got = self._run(spark, ["a"], 3)
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e, f beyond cap

    def test_multi_seed_takes_min(self, spark):
        got = self._run(spark, ["a", "e"], 2)
        # d is 3 hops from a but 1 from e -> min wins; f adjacent to e
        assert got["d"] == 1 and got["f"] == 1 and got["a"] == 0

    def test_early_exit_when_frontier_drains(self, spark):
        # component exhausted in 2 hops; max_hops=10 must still terminate
        got = self._run(spark, ["x"], 10)
        assert got == {"x": 0, "y": 1, "z": 1}

    def test_isolated_seed_and_empty_seeds(self, spark):
        got = self._run(spark, ["ghost"], 4)  # seed with no edges
        assert got == {"ghost": 0}
        from ml_feature_store_spark.operators.graph import bfs_distances

        e = spark.createDataFrame(self.EDGES, "src string, dst string")
        empty = spark.createDataFrame([], "node string")
        assert bfs_distances(e, empty, max_hops=3).count() == 0


class TestFileSinkExactlyOnce:
    """sd7 semantics: FileStreamSink table membership is the _spark_metadata
    commit log, not the directory listing. The orphan must carry rows (the
    witness has teeth) yet be invisible to the log-based batch read."""

    def test_orphan_part_file_excluded(self, spark, tmp_path):
        import os

        import pyarrow.parquet as pq

        feed, sink, ck = str(tmp_path / "feed"), str(tmp_path / "sink"), str(
            tmp_path / "ck"
        )
        src = spark.createDataFrame(
            [(i, f"k{i % 2}") for i in range(8)], "id long, k string"
        )
        src.coalesce(1).write.parquet(feed)
        q = (
            spark.readStream.schema("id long, k string")
            .parquet(feed)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        parts = [
            f
            for f in os.listdir(sink)
            if f.startswith("part-") and f.endswith(".parquet")
        ]
        orphan = os.path.join(sink, "part-99999-orphan.snappy.parquet")
        pq.write_table(pq.read_table(os.path.join(sink, parts[0])), orphan)
        # teeth: the orphan really holds rows a listing-based reader would see
        assert spark.read.parquet(orphan).count() > 0
        # log-based read: membership from _spark_metadata, orphan excluded
        assert os.path.isdir(os.path.join(sink, "_spark_metadata"))
        assert spark.read.parquet(sink).count() == 8
