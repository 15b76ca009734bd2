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

    # NOTE (deliberate non-test): BT is count-scale invariant in the
    # reals, but the int64 fixed-point ITERATE is not at small counts —
    # `d // (precision//scale)` quantizes the per-item denominator to
    # ~n units, so single-digit match counts carry up to ~50% rounding
    # per round and 4x-scaled runs can legitimately flip large-margin
    # orders (hypothesis found {ab:(3,1), bc:(2,1)}: b>c at 1x, c>b at
    # 4x). The invariance is asymptotic in the counts, not a property
    # of the implementation; the implementation pin is
    # test_matches_python_spec (exact equality to the quantized spec)
    # plus the bt1 driver oracle. Do not resurrect a margin-gated
    # variant — any fixed margin has a count regime that defeats it.

    @SETTINGS
    @given(pairs=matchups)
    def test_winner_of_dominant_pairing(self, spark, pairs):
        """Implementation-level ordering pin that IS stable under the
        quantization: within a single pair's head-to-head, the item with
        the strictly higher smoothed win share never ends with the
        LOWER strength when the pair is the only evidence involving
        both (checked on disjoint-pair inputs only)."""
        items = [x for ab in pairs for x in ab]
        if len(set(items)) != len(items):
            return  # overlapping pairs: relative strengths couple, skip
        rows = [(a, b, n, w) for (a, b), (n, w) in pairs.items()]
        df = spark.createDataFrame(rows, "a string, b string, n long, w long")
        s = {r["item"]: r["strength"] for r in bradley_terry(df).collect()}
        for (a, b), (n, w) in pairs.items():
            if 2 * w > n:  # a strictly ahead
                assert s[a] >= s[b], (a, b, n, w, s)
            elif 2 * w < n:
                assert s[b] >= s[a], (a, b, n, w, s)


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
