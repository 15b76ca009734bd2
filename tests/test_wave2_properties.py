"""Property-based tests (hypothesis) for the round-3 second-wave
operators, each checked against a compact pure-Python executable spec of
the documented semantics: uniform-mixture downsampling, DSIR-style
importance scoring (staged integer division), duplicated-span coverage,
and BPE encode (train + apply)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.encoding import importance_score
from ml_feature_store_spark.operators.sampling import (
    apply_mixture,
    uniform_mixture_rates,
)
from ml_feature_store_spark.operators.text import dup_span_profile

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def md5_mod(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


# --------------------------------------------------------------------- #
# uniform mixture
# --------------------------------------------------------------------- #

docs_strategy = st.lists(
    st.tuples(st.sampled_from(["en", "de", "fr"]), st.integers(0, 10**6)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[1],
)


def spec_mixture(rows: list[tuple[str, int]]):
    from collections import Counter

    counts = Counter(lang for lang, _ in rows)
    mn = min(counts.values())
    rates = {lang: mn * 1_000_000 // n for lang, n in counts.items()}
    kept = {i for lang, i in rows if md5_mod(str(i), 1_000_000) < rates[lang]}
    return rates, kept


class TestUniformMixtureProperty:
    @SETTINGS
    @given(rows=docs_strategy)
    def test_matches_python_spec(self, spark, rows):
        df = spark.createDataFrame(rows, ["lang", "doc_id"])
        rates = uniform_mixture_rates(df, "lang")
        kept = apply_mixture(df, rates, "lang", "doc_id")
        want_rates, want_kept = spec_mixture(rows)
        got_rates = {r.lang: r.keep_rate_e6 for r in rates.collect()}
        assert got_rates == want_rates
        assert {r.doc_id for r in kept.collect()} == want_kept

    def test_smallest_domain_fully_kept(self, spark):
        rows = [("en", i) for i in range(20)] + [("de", 100), ("de", 101)]
        df = spark.createDataFrame(rows, ["lang", "doc_id"])
        rates = uniform_mixture_rates(df, "lang")
        kept = apply_mixture(df, rates, "lang", "doc_id")
        de_kept = {r.doc_id for r in kept.collect() if r.lang == "de"}
        assert de_kept == {100, 101}  # rate 1e6 keeps everything


# --------------------------------------------------------------------- #
# importance score
# --------------------------------------------------------------------- #


def spec_importance(rows: list[tuple[int, bool, str]], n_buckets: int = 64):
    n_src: dict[int, int] = {}
    n_tgt: dict[int, int] = {}
    for _, is_t, text in rows:
        for tok in text.split(" "):
            if not tok:
                continue
            b = md5_mod(tok, n_buckets)
            n_src[b] = n_src.get(b, 0) + 1
            if is_t:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    s_tot = sum(n_src.values())
    t_tot = sum(n_tgt.values())
    w = {
        b: ((n_tgt.get(b, 0) + 1) * 10**9 // (t_tot + n_buckets))
        * 10**6
        // ((n_src[b] + 1) * 10**9 // (s_tot + n_buckets))
        for b in n_src
    }
    out = {}
    for i, _, text in rows:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        total = sum(w[md5_mod(t, n_buckets)] for t in toks)
        out[i] = (len(toks), total // len(toks))
    return out


texts = st.lists(
    st.tuples(
        st.booleans(),
        st.text(alphabet="ab c", min_size=0, max_size=20),
    ),
    min_size=1,
    max_size=15,
)


class TestImportanceScoreProperty:
    @SETTINGS
    @given(rows=texts)
    def test_matches_python_spec(self, spark, rows):
        tagged = [(i, t, s) for i, (t, s) in enumerate(rows)]
        if not any(t for t in tagged if [x for x in t[2].split(" ") if x]):
            return  # all-empty corpus: no token rows either side
        df = spark.createDataFrame(tagged, ["doc_id", "is_t", "text"])
        got = {
            r.doc_id: (r.n_tokens, r.dsir_e6)
            for r in importance_score(df, F.col("is_t")).collect()
        }
        assert got == spec_importance(tagged)

    def test_target_heavy_token_scores_higher(self, spark):
        rows = [(0, True, "x x x x"), (1, False, "y y y y"), (2, False, "x y")]
        df = spark.createDataFrame(rows, ["doc_id", "is_t", "text"])
        got = {r.doc_id: r.dsir_e6 for r in importance_score(df, F.col("is_t")).collect()}
        assert got[0] > got[1]  # pure-target doc above pure-background doc
        assert got[0] >= got[2] >= got[1]


# --------------------------------------------------------------------- #
# duplicated-span profile
# --------------------------------------------------------------------- #


def spec_dup_spans(rows: list[tuple[int, str]], n: int):
    spans = {}
    for i, text in rows:
        toks = text.split(" ")
        shs = (
            {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
            if len(toks) >= n
            else set()
        )
        spans[i] = shs
    from collections import Counter

    mult = Counter(s for shs in spans.values() for s in shs)
    return {
        i: (
            len(shs),
            sum(1 for s in shs if mult[s] > 1),
            (sum(1 for s in shs if mult[s] > 1) * 1_000_000 // len(shs))
            if shs
            else 0,
        )
        for i, shs in spans.items()
    }


corpus = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=1,
    max_size=10,
)


class TestDupSpanProperty:
    @SETTINGS
    @given(rows=corpus)
    def test_matches_python_spec(self, spark, rows):
        tagged = list(enumerate(rows))
        df = spark.createDataFrame(tagged, ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_rate_e6)
            for r in dup_span_profile(df, n=3).collect()
        }
        assert got == spec_dup_spans(tagged, 3)

    def test_short_docs_profile_as_zero_rows(self, spark):
        df = spark.createDataFrame([(0, "a b"), (1, "a b")], ["doc_id", "text"])
        got = {r.doc_id: r.n_spans for r in dup_span_profile(df, n=8).collect()}
        assert got == {0: 0, 1: 0}  # kept, not dropped


# --------------------------------------------------------------------- #
# BPE encode (train + apply round trip)
# --------------------------------------------------------------------- #


def spec_merge(toks: list[str], x: str, y: str, joined: str) -> list[str]:
    out: list[str] = []
    for t in toks:
        if out and out[-1] == x and t == y:
            out[-1] = joined
        else:
            out.append(t)
    return out


class TestBpeEncodeProperty:
    @SETTINGS
    @given(
        corpus=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10).map(
                " ".join
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_encode_equals_spec_fold_of_trained_rules(self, spark, corpus):
        from ml_feature_store_spark.operators.text import (
            bpe_encode,
            bpe_train_merges,
        )

        tagged = list(enumerate(corpus))
        df = spark.createDataFrame(tagged, ["doc_id", "text"])
        rules = [(r["x"], r["y"]) for r in bpe_train_merges(df, "text", rounds=2)]
        got = {
            r.doc_id: r.tk
            for r in bpe_encode(df, rules).collect()
        }
        for i, text in tagged:
            toks = [t for t in text.lower().split(" ") if t]
            for x, y in rules:
                toks = spec_merge(toks, x, y, x + "+" + y)
            assert got[i] == toks

    def test_equal_halves_rule_rejected(self, spark):
        import pytest

        from ml_feature_store_spark.operators.text import bpe_encode

        df = spark.createDataFrame([(0, "a a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            bpe_encode(df, [("a", "a")])

    def test_arrow_path_equals_expr_path_at_120_rules(self, spark):
        """>=100 merge rules must (a) run without a per-rule expression
        chain (plan size O(1) in rule count via mapInPandas) and (b)
        produce exactly what the codegen-fold path produces."""
        from ml_feature_store_spark.operators.text import bpe_encode

        docs = [
            (0, "a b a b c d"),
            (1, "a b c d e f a b"),
            (2, "x y z"),
            (3, ""),
            (4, "a+b c a b"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        # 3 live rules (incl. a cascading one) + 117 no-op filler rules
        rules = [("a", "b"), ("a+b", "c"), ("e", "f")]
        rules += [(f"zz{i}", f"qq{i}") for i in range(117)]
        assert len(rules) == 120

        arrow = bpe_encode(df, rules)  # default limit 64 -> Arrow path
        plan = arrow._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        expr = bpe_encode(df, rules, expr_rule_limit=1000)
        assert "MapInPandas" not in (
            expr._jdf.queryExecution().executedPlan().toString()
        )
        got_a = {r.doc_id: r.tk for r in arrow.collect()}
        got_e = {r.doc_id: r.tk for r in expr.collect()}
        assert got_a == got_e
        assert got_a[0] == ["a+b", "a+b+c", "d"]
        assert got_a[3] == []
