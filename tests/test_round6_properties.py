"""Property-based tests (hypothesis) for the round-6 operators, each
checked against a pure-Python executable spec of the documented
fixed-point semantics: Bradley-Terry MM strengths and majority-vote
label aggregation."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.preference import bradley_terry

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ITEMS = ["a", "b", "c", "d"]

# unordered pairs with smoothed-legal counts: n >= 2 matches, 0 < w < n
matchups = st.dictionaries(
    st.sampled_from([(x, y) for i, x in enumerate(ITEMS) for y in ITEMS[i + 1:]]),
    st.tuples(st.integers(2, 50), st.integers(1, 49)).filter(lambda t: t[1] < t[0]),
    min_size=1,
    max_size=6,
)


def spec_bradley_terry(pairs, iterations=3, scale=10**6, precision=10**12):
    """Pure-Python replay of operators/preference.py bradley_terry:
    identical int64 fixed-point floor divisions, per-round mean-scale
    normalization with a >=1 floor."""
    directed = defaultdict(list)  # item -> [(opp, n, w)]
    for (a, b), (n, w) in pairs.items():
        directed[a].append((b, n, w))
        directed[b].append((a, n, n - w))
    pu = precision // scale
    s = {i: scale for i in directed}
    out = {}
    for _ in range(iterations):
        raw = {}
        for i, opps in directed.items():
            d = sum(n * precision // (s[i] + s[j]) for j, n, _ in opps)
            wins = sum(w for _, _, w in opps)
            nm = sum(n for _, n, _ in opps)
            raw[i] = (wins * scale // max(d // pu, 1), wins, nm)
        tot = sum(v[0] for v in raw.values())
        cnt = len(raw)
        s = {i: max(v[0] * cnt * scale // tot, 1) for i, v in raw.items()}
        out = {i: (s[i], raw[i][1], raw[i][2]) for i in raw}
    return out


class TestBradleyTerryProperty:
    @SETTINGS
    @given(pairs=matchups)
    def test_matches_python_spec(self, spark, pairs):
        rows = [(a, b, n, w) for (a, b), (n, w) in pairs.items()]
        df = spark.createDataFrame(rows, "a string, b string, n long, w long")
        got = {
            r["item"]: (r["strength"], r["wins"], r["n_matches"])
            for r in bradley_terry(df, iterations=3).collect()
        }
        assert got == spec_bradley_terry(pairs)

    @SETTINGS
    @given(pairs=matchups)
    def test_scale_invariance_of_order(self, spark, pairs):
        """Multiplying every match count by a constant preserves the
        strength ORDERING for items separated by a real margin. BT is
        exactly count-scale invariant in the reals; in int64 fixed-point
        the per-term floor divisions shift by a few micro-units, so the
        property is asserted only where BOTH runs separate the pair by
        > 1000 micro-units (0.1%) — near-ties may legitimately flip."""
        rows = [(a, b, n, w) for (a, b), (n, w) in pairs.items()]
        rows4 = [(a, b, 4 * n, 4 * w) for (a, b), (n, w) in pairs.items()]
        df1 = spark.createDataFrame(rows, "a string, b string, n long, w long")
        df4 = spark.createDataFrame(rows4, "a string, b string, n long, w long")
        s1 = {r["item"]: r["strength"] for r in bradley_terry(df1).collect()}
        s4 = {r["item"]: r["strength"] for r in bradley_terry(df4).collect()}
        assert set(s1) == set(s4)
        items = sorted(s1)
        for i, x in enumerate(items):
            for y in items[i + 1:]:
                d1, d4 = s1[x] - s1[y], s4[x] - s4[y]
                if abs(d1) > 1000 and abs(d4) > 1000:
                    assert (d1 > 0) == (d4 > 0), (x, y, d1, d4)


votes_lists = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["click", "view", "buy"])),
    min_size=1,
    max_size=30,
)


def spec_majority(votes):
    out = {}
    per_user = defaultdict(Counter)
    for u, label in votes:
        per_user[u][label] += 1
    for u, c in per_user.items():
        n_votes = sum(c.values())
        label, n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out[u] = (label, n, n_votes, n * 10000 // n_votes)
    return out


class TestMajorityVoteProperty:
    @SETTINGS
    @given(votes=votes_lists)
    def test_matches_python_spec(self, spark, votes):
        df = spark.createDataFrame(votes, "user_id long, event_type string")
        counts = df.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
        w = Window.partitionBy("user_id").orderBy(
            F.col("n").desc(), F.col("event_type").asc()
        )
        tot = Window.partitionBy("user_id")
        got = {
            r["user_id"]: (
                r["event_type"],
                r["n"],
                r["n_votes"],
                r["agreement_e4"],
            )
            for r in counts.withColumn("rn", F.row_number().over(w))
            .withColumn("n_votes", F.sum("n").over(tot))
            .filter(F.col("rn") == 1)
            .withColumn("agreement_e4", F.expr("(n * 10000) div n_votes"))
            .collect()
        }
        assert got == spec_majority(votes)
