"""Property-based tests (hypothesis) for the late round-5 operators,
each checked against a pure-Python executable spec of the documented
semantics: paragraph-level first-occurrence dedup, k-gram-anchored
cross-document span detection, and exact-mode KMV overlap."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ml_feature_store_spark.operators.agg import kmv_segment_overlap
from ml_feature_store_spark.operators.dedup import cross_doc_spans, paragraph_dedup

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

PAR_WORDS = ["aa", "bb", "cc"]
paragraphs = st.lists(
    st.lists(st.sampled_from(PAR_WORDS), min_size=0, max_size=3).map(" ".join),
    min_size=0,
    max_size=5,
)
corpus = st.lists(paragraphs, min_size=1, max_size=4)


def spec_paragraph_dedup(docs):
    """(doc_id, pos, par, keep) for trimmed non-empty paragraphs; keep =
    globally-first occurrence by (doc_id, pos)."""
    rows = []
    for did, pars in docs:
        for pos, par in enumerate(pars):
            par = par.strip()
            if par:
                rows.append((did, pos, par))
    first = {}
    for did, pos, par in sorted(rows):
        first.setdefault(par, (did, pos))
    return {(d, p): (par, first[par] == (d, p)) for d, p, par in rows}


class TestParagraphDedupProperty:
    @SETTINGS
    @given(docs=corpus)
    def test_matches_python_spec(self, spark, docs):
        rows = [(i, "|".join(pars)) for i, pars in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_id"], r["pos"]): (r["par"], r["keep"])
            for r in paragraph_dedup(df, delim="|").collect()
        }
        assert got == spec_paragraph_dedup(list(enumerate(docs)))


TOKENS = ["x", "y", "z"]
docs_tokens = st.lists(
    st.lists(st.sampled_from(TOKENS), min_size=0, max_size=12),
    min_size=1,
    max_size=3,
)


def spec_cross_doc_spans(docs, k):
    """(doc_id -> sorted [(span_start, span_len, n_grams)]) per the
    operator contract: maximal chains of k-grams shared by >= 2 docs,
    islands broken when successive positions differ by more than k."""
    grams = {}
    for did, toks in docs:
        for i in range(len(toks) - k + 1):
            grams.setdefault(tuple(toks[i : i + k]), set()).add(did)
    shared = {g for g, ds in grams.items() if len(ds) >= 2}
    out = {}
    for did, toks in docs:
        hits = [
            i
            for i in range(len(toks) - k + 1)
            if tuple(toks[i : i + k]) in shared
        ]
        spans = []
        for pos in hits:
            if spans and pos - spans[-1][1] <= k:
                s, _, n = spans[-1]
                spans[-1] = (s, pos, n + 1)
            else:
                spans.append((pos, pos, 1))
        if spans:
            out[did] = sorted((s, e - s + k, n) for s, e, n in spans)
    return out


class TestCrossDocSpansProperty:
    @SETTINGS
    @given(docs=docs_tokens, k=st.sampled_from([2, 3]))
    def test_matches_python_spec(self, spark, docs, k):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in cross_doc_spans(df, k=k).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_len"], r["n_grams"])
            )
        got = {d: sorted(v) for d, v in got.items()}
        assert got == spec_cross_doc_spans(list(enumerate(docs)), k)


seg_sets = st.fixed_dictionaries(
    {
        "A": st.sets(st.integers(min_value=0, max_value=60), max_size=40),
        "B": st.sets(st.integers(min_value=0, max_value=60), max_size=40),
    }
)


class TestKmvExactModeProperty:
    @SETTINGS
    @given(sets=seg_sets)
    def test_small_sets_are_exact(self, spark, sets):
        rows = [(s, e) for s, els in sets.items() for e in els]
        if not sets["A"] or not sets["B"]:
            return  # no pair emitted when a segment is absent
        df = spark.createDataFrame(rows, "seg string, el long")
        out = kmv_segment_overlap(df, "seg", "el", k=256).collect()
        assert len(out) == 1
        r = out[0]
        assert r["sketch_exact"]
        assert r["union_est"] == float(len(sets["A"] | sets["B"]))
        assert r["inter_est"] == float(len(sets["A"] & sets["B"]))
