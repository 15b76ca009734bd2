"""Dedup operator tests: exact, MinHash LSH, SimHash, Jaccard, embedding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_feature_store_spark.operators.dedup import (
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_signatures,
    ngram_jaccard,
)


@pytest.fixture
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "The Quick Brown Fox Jumps Over The Lazy Dog"),          # case dup of 1
        (4, "the quick brown fox jumps over the sleepy dog"),        # near dup
        (5, "completely different content about spark engines here"),
        (6, "another unrelated document with its own words entirely"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_case_insensitive_dedup(self, docs):
        out = dedup_exact(docs).collect()
        by_id = {r["doc_id"]: r["n_copies"] for r in out}
        assert by_id[1] == 3  # docs 1,2,3 collapse
        assert len(out) == 4

    def test_case_sensitive(self, docs):
        out = dedup_exact(docs, normalize=False).collect()
        by_id = {r["doc_id"]: r["n_copies"] for r in out}
        assert by_id[1] == 2  # only 1,2
        assert len(out) == 5


class TestMinHash:
    def test_signature_shape_and_determinism(self, docs):
        a = minhash_signatures(docs, num_hashes=16).select("doc_id", "minhash").collect()
        b = minhash_signatures(docs, num_hashes=16).select("doc_id", "minhash").collect()
        assert sorted((r.doc_id, tuple(r.minhash)) for r in a) == sorted(
            (r.doc_id, tuple(r.minhash)) for r in b
        )
        assert all(len(r.minhash) == 16 for r in a)

    def test_identical_docs_identical_signatures(self, docs):
        sigs = {
            r.doc_id: tuple(r.minhash)
            for r in minhash_signatures(docs).select("doc_id", "minhash").collect()
        }
        assert sigs[1] == sigs[2]

    def test_lsh_finds_dups_not_unrelated(self, docs):
        pairs = {
            (r.id_a, r.id_b) for r in dedup_minhash_lsh(docs, num_hashes=16, bands=8).collect()
        }
        assert (1, 2) in pairs              # exact dup always collides
        assert (5, 6) not in pairs          # unrelated docs don't
        assert (1, 4) in pairs or (2, 4) in pairs  # near dup shares most shingles

    def test_jaccard_verification(self, docs):
        pairs = dedup_minhash_lsh(docs, num_hashes=16, bands=8)
        verified = ngram_jaccard(docs, pairs).collect()
        j = {(r.id_a, r.id_b): r.jaccard for r in verified}
        assert j[(1, 2)] == 1.0
        for (a, b), v in j.items():
            assert 0.0 <= v <= 1.0


class TestSimHash:
    def test_exact_dups_same_simhash(self, docs):
        out = {r.doc_id: r.simhash for r in dedup_simhash(docs).collect()}
        assert out[1] == out[2]
        assert out[5] != out[1]

    def test_group_keep_id(self, docs):
        out = dedup_simhash(docs).collect()
        g = {r.doc_id: (r.group_size, r.keep_id) for r in out}
        assert g[1] == (2, 1) and g[2] == (2, 1)

    def test_long_document_correct_signature(self, spark):
        # 2^16-token docs overflowed the old 16-bit SWAR lanes (ANSI crash
        # or corrupt signature); 32-bit lanes must handle them correctly —
        # identical long docs share a signature, a different one doesn't
        big = " ".join(f"t{i}" for i in range(1 << 16))
        df = spark.createDataFrame(
            [(1, big), (2, big), (3, big + " extra " * 2000)], ["doc_id", "text"]
        )
        out = {r.doc_id: r.simhash for r in dedup_simhash(df).collect()}
        assert out[1] == out[2]
        assert out[3] != out[1]

    def test_swar_decode_matches_per_bit_reference(self, spark, docs):
        # independent per-bit formulation (64 conditional sums, no lane
        # packing) must produce bit-identical signatures
        from pyspark.sql import functions as F
        from ml_feature_store_spark.operators.text import tokens

        ex = docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        ).withColumn("h", F.xxhash64("tok"))
        per_bit = [
            F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1))).alias(f"b{i}")
            for i in range(64)
        ]
        agg = ex.groupBy("doc_id").agg(F.count("*").alias("n"), *per_bit)
        sig = sum(
            (
                F.when(
                    F.col(f"b{i}") * 2 > F.col("n"),
                    F.shiftleft(F.lit(1).cast("long"), i),
                ).otherwise(F.lit(0).cast("long"))
                for i in range(1, 64)
            ),
            F.when(
                F.col("b0") * 2 > F.col("n"), F.lit(1).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        expected = {r.doc_id: r.s for r in agg.select("doc_id", sig.alias("s")).collect()}
        got = {r.doc_id: r.simhash for r in dedup_simhash(docs).collect()}
        assert got == expected


class TestEmbeddingDedup:
    def test_cosine_near_dup_pairs(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0], "a"),
            (2, [0.999, 0.001, 0.0], "a"),   # near-dup of 1
            (3, [0.0, 1.0, 0.0], "a"),
            (4, [1.0, 0.0, 0.0], "b"),       # same vector, different block
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "blk"])
        out = {(r.id_a, r.id_b) for r in dedup_embedding_cosine(df, threshold=0.99).collect()}
        assert (1, 2) in out and (1, 4) in out and (1, 3) not in out
        blocked = {
            (r.id_a, r.id_b)
            for r in dedup_embedding_cosine(df, threshold=0.99, block_col="blk").collect()
        }
        assert (1, 2) in blocked and (1, 4) not in blocked  # cross-block pruned


class TestConnectedComponents:
    def test_matches_union_find(self, spark):
        """Distributed min-label propagation == driver union-find on the
        same edges (executable spec)."""
        from ml_feature_store_spark.operators.dedup import connected_components

        edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4), (30, 31)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }

        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in edges:
            union(a, b)
        want = {n: find(n) for n in parent}
        assert got == want

    def test_long_chain_converges(self, spark):
        """A 30-node path graph needs many propagation rounds — pins that
        the loop iterates to the true fixpoint, not a fixed round count."""
        from ml_feature_store_spark.operators.dedup import connected_components

        chain = [(i, i + 1) for i in range(30)]
        df = spark.createDataFrame(chain, ["id_a", "id_b"])
        out = connected_components(df, max_iter=50)
        assert out.select("component").distinct().count() == 1
        assert out.count() == 31


class TestPageRank:
    def test_matches_hand_computed_integer_recurrence(self, spark):
        """Tiny graph a->b, a->c, b->c, c->a: replay the exact integer
        recurrence in Python and demand bit-equality."""
        from ml_feature_store_spark.operators.graph import pagerank

        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.node: r.r for r in pagerank(df, iterations=4).collect()}

        import math

        scale, d = 10**12, 0.85
        base = int(math.floor((1 - d) * scale))
        deg = {"a": 2, "b": 1, "c": 1}
        rank = {n: scale for n in "abc"}
        for _ in range(4):
            s = {n: 0 for n in "abc"}
            for u, v in edges:
                s[v] += rank[u] // deg[u]
            rank = {n: base + int(math.floor(d * s[n])) for n in "abc"}
        assert got == rank

    def test_partition_invariant(self, spark):
        """Integer arithmetic makes the result independent of the edge
        partitioning (float PageRank would differ in low bits)."""
        from ml_feature_store_spark.operators.graph import pagerank

        edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
        df1 = spark.createDataFrame(edges, ["src", "dst"])
        df2 = df1.repartition(17)
        r1 = sorted(map(tuple, pagerank(df1, iterations=3).collect()))
        r2 = sorted(map(tuple, pagerank(df2, iterations=3).collect()))
        assert r1 == r2


class TestContamination:
    def test_flags_exact_ngram_overlap_only(self, spark):
        from ml_feature_store_spark.operators.dedup import detect_contamination

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over")], ["doc_id", "text"]
        )
        corpus = spark.createDataFrame(
            [
                (1, "a quick brown fox jumps happily"),   # shares 'quick brown fox jumps'
                (2, "the slow brown fox sits down low"),  # no shared 4-gram
                (3, "x quick brown fox jumps y quick brown fox jumps z"),
            ],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.n_shared
            for r in detect_contamination(corpus, bench, shingle_k=4).collect()
        }
        # doc 3's two occurrences are ONE distinct shingle
        assert got == {1: 1, 3: 1}
