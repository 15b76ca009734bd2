"""Shared helpers, constants and oracle-SQL fragments for the query
suite family modules (split from the original single-module suite.py;
see suite.py for assembly and SURVEY.md §2 for the inventory)."""

from __future__ import annotations

import math  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .operators.asof import asof_join  # noqa: F401
from .operators.pit import (  # noqa: F401
    entity_filter,
    latest_per_entity,
    temporal_filter,
    top_k_per_group,
)


# --------------------------------------------------------------------------- #
# session + table helpers
# --------------------------------------------------------------------------- #


def ensure_conf(spark: SparkSession) -> None:
    """Runtime-settable conf the suite depends on — the driver builds its own
    SparkSession, so we cannot rely on session.py's builder config. These
    mirror session.py's builder values and form the suite's SESSION
    CONTRACT: set identically before every query, so plans can never depend
    on suite order. Confs that deliberately DIVERGE from this contract for
    one query (io19's autoBucketedScan) must be query-scoped via
    ``session_conf`` instead."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive parquet timestamps -> session-tz TIMESTAMP (UTC), never NTZ.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Python Data Source API pushdown (session.py:47): consulted at
    # EXECUTION time in the Python planning worker, so it cannot be
    # query-scoped-and-restored around io14 — it is part of the uniform
    # contract instead (it only affects Python data sources).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


from contextlib import contextmanager


@contextmanager
def session_conf(spark: SparkSession, confs: dict):
    """Query-scoped session confs: set for the duration of the block, then
    restore the prior values, so suite order can never change a LATER
    query's plan (round-6 advice — io14/io19 used to leak their confs into
    the shared driver session).

    Spark plans lazily at action time — AFTER the query function returns —
    so any plan that depends on one of these confs must be pinned INSIDE
    the block with :func:`pin_plan` before the restore runs."""
    prior = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)


def stream_conf(spark: SparkSession):
    """:func:`session_conf` preset for STATEFUL streaming lanes (r12
    optimization): scope ``spark.sql.shuffle.partitions`` to the
    micro-batch volume for the stream's start/await window. A streaming
    query pins its state partitioning at start, and every micro-batch
    runs one task + one state-store instance (+ one Python worker
    dispatch for applyInPandasWithState) per partition — sizing it to
    the per-batch volume, not the cluster width, is the same rule that
    sizes batch shuffle partitions to ~100 MB. Parameterized via
    ``SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS`` (streaming/tuning.py);
    production ingest raises it with sustained batch volume
    (SCALE-100TB.md). Results are partitioning-invariant."""
    from .streaming.tuning import STREAM_SHUFFLE_PARTITIONS

    return session_conf(
        spark,
        {"spark.sql.shuffle.partitions": str(STREAM_SHUFFLE_PARTITIONS)},
    )


def pin_plan(df: DataFrame) -> DataFrame:
    """Force analysis + physical planning NOW, under the session confs
    currently in effect. ``QueryExecution`` caches its plans (lazy vals on
    the Dataset's one QE object), so a later action — or a plan-gate test
    reading ``executedPlan`` — replays THIS plan even after a
    ``session_conf`` block has restored the conf."""
    df._jdf.queryExecution().executedPlan()
    return df


def _scratch_path(name: str, sf_dir: str) -> str:
    """The deterministic per-(query, sf_dir) scratch location, WITHOUT
    wiping or creating it. Tests that inspect a query's written output
    use this instead of duplicating the md5-tag layout (round-3 advice:
    a private-scheme copy silently desynchronizes if the layout
    changes)."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), "mlfs_scratch", f"{name}_{tag}")


def _scratch_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf_dir) scratch path for sink round-trips
    and throwaway stores. Repeated bench/correctness runs reuse (wipe and
    rewrite) the same directory instead of leaking a fresh mkdtemp per
    invocation (round-2 advice). Not safe for two concurrent sessions
    running the SAME query on the SAME sf_dir — the suite never does."""
    import os
    import shutil

    d = _scratch_path(name, sf_dir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def _write_ordered_feed(d: str, *batches: DataFrame) -> None:
    """Write each batch as parquet part files into ``d`` with strictly
    increasing file mtimes (all in the past). FileStreamSource orders
    replay by modification time with undefined tie-breaking; two
    sub-millisecond appends — or a coarse-mtime filesystem — could
    otherwise feed the later time-slice first and break a state fold's
    per-key-ordered assumption (round-3 advice)."""
    import os
    import time as _time

    seen: set[str] = set()
    base = _time.time()
    n = len(batches)
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(d)
        mt = base - (n - i) * 10
        for f in os.listdir(d):
            if f.startswith("part-") and f not in seen:
                os.utime(os.path.join(d, f), (mt, mt))
                seen.add(f)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Keep the raw nanos long under __ts_ns__: temporal_filter uses it
        # for a pushable scan predicate (see operators/pit.py docstring).
        df = df.withColumn("__ts_ns__", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def events_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events mapped to the feature-table shape: entity_id=user_id,
    timestamp=ts, tie-break id = event_id (deterministic input order)."""
    return table(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("timestamp"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("event_id").alias("__row_id__"),
    )


_US = F.unix_micros

# Shared by t2's Spark query and its oracle (the synthetic corpus's
# function words).
STOPWORDS = ("a", "the", "of", "and")

# Oracle-side view of events with us-truncated timestamp.
_EV = "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"


# Hour-step exponential decay weights in integer micro-units, shared by
# f15's Spark query and oracle: weight[h] = round(0.97^h * 1e6) for ages of
# h whole hours, 7-day horizon. A Python-computed literal table makes the
# decay BIT-EXACT on every engine (libm pow/exp differ in ulps across
# engines; integer table lookups cannot).
_DECAY_HOURS = 7 * 24
_DECAY_MICRO = [int(round((0.97**h) * 1_000_000)) for h in range(_DECAY_HOURS + 1)]


_7D_US = 7 * 24 * 3600 * 1_000_000


def _cosine(a, b):  # double-precision cosine over two array<double> columns
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


_30MIN_US = 30 * 60 * 1_000_000


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


_BM25_TERMS = ("table", "query", "scan")
_BM25_K1, _BM25_B = 1.2, 0.75


def build_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by q_b1 and the plan gate: write orders+lineitem ONCE as
    bucketed/sorted managed tables on the join key, return the joined
    (pre-agg) frame. The `merge` hint pins SortMergeJoin so the plan
    shape is the bucket zipper regardless of broadcast thresholds."""
    import shutil
    from urllib.parse import urlparse

    n_buckets = 8
    cols = {
        "orders": ["o_orderkey", "o_orderpriority"],
        "lineitem": ["l_orderkey", "l_extendedprice", "l_discount"],
    }
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"b1_{name}_bkt"
        # The catalog is in-memory per-session but the warehouse dir is on
        # disk: drop both so a fresh session can recreate the table.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
        (
            table(spark, sf_dir, name)
            .select(*cols[name])
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(tbl)
        )
    o = spark.table("b1_orders_bkt")
    li = spark.table("b1_lineitem_bkt")
    return o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)


_NDCG_DISC_E6 = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 11)]


def _cents_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events features with value quantized to integer cents — the
    float-free shape every store-mutation witness query uses so the
    DuckDB oracle can replay checksums and sums exactly."""
    return (
        events_features(spark, sf_dir)
        .drop("__row_id__")
        .withColumn(
            "value_cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        .drop("value")
    )


_F15_SQL = f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM ({_EV})
    ),
    s AS (SELECT user_id, ts, event_id AS spine_id FROM ev
          WHERE event_id % 10 = 0),
    w AS (SELECT * FROM (VALUES {", ".join(f"({h}, {wgt})" for h, wgt in enumerate(_DECAY_MICRO))})
               AS t(h, wt))
    SELECT s.user_id, epoch_us(s.ts) AS ts_us, s.spine_id,
           CAST(COUNT(e.cents) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(e.cents * w.wt), 0) AS BIGINT) AS decayed_micro
    FROM s LEFT JOIN ev e
      ON e.user_id = s.user_id
     AND e.ts <= s.ts
     AND e.ts > s.ts - INTERVAL 7 DAY
    LEFT JOIN w
      ON w.h = CAST(floor((epoch_us(s.ts) - epoch_us(e.ts)) / 3600000000.0)
                    AS INT)
    GROUP BY s.user_id, s.ts, s.spine_id
"""


# x2/x11/x15 block their pair self-joins on (label, sign-LSH bucket); the
# oracle recomputes the bucket from the SAME seeded hyperplanes inlined as
# SQL literals (Python float repr round-trips exactly) with the SAME
# left-fold dot order as functions/vector.dot — the x8 recipe — so bucket
# membership, and therefore the candidate-pair set, matches bit-for-bit.
from .operators.similarity import _random_hyperplanes  # noqa: E402


def _lsh_bucket_sql(vec: str = "v", dim: int = 64, bits: int = 4, seed: int = 42) -> str:
    planes = _random_hyperplanes(dim=dim, bits=bits, seed=seed)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + {vec}[{j + 1}] * {p!r})"
        return expr

    return "CAST(" + " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    ) + " AS BIGINT)"


_LSH4_BUCKET = _lsh_bucket_sql()


# m3's oracle reproduces the Python stub kernel bit-for-bit: hex bytes of
# sha256 -> raw_i = byte/255 - 0.5, norm = sqrt of the LEFT-FOLD sum of
# squares (same order as the kernel's sum()), float32 cast via REAL, then
# the same floor(x*1e4 + 0.5) quantization as the Spark side.
_M3_RAW = [
    f"(('0x' || substr(hx, {2 * k + 1}, 2))::BIGINT / 255.0 - 0.5)" for k in range(16)
]
_M3_NORM_SUM = _M3_RAW[0] + " * " + _M3_RAW[0]
for _k in range(1, 16):
    _M3_NORM_SUM = f"({_M3_NORM_SUM} + {_M3_RAW[_k]} * {_M3_RAW[_k]})"

# x6/x6b oracles regenerate the portable MinHash family exactly: h32 =
# first 8 md5 hex digits, h_i = (A_i*h32 + B_i) mod P, per-doc mins,
# md5 band buckets, bucket-equality candidate join (+ exact Jaccard
# verify for x6b). Same constants as the Spark side by construction.
from .operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P  # noqa: E402

_MH_MINS = ", ".join(
    f"MIN((h32 * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS mh{i}"
    for i in range(16)
)
_MH_BANDS = "\n            UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({key}) AS bucket FROM m".format(
        b=b,
        key="||','||".join(f"CAST(mh{b * 4 + i} AS VARCHAR)" for i in range(4)),
    )
    for b in range(4)
)
def _mh_ctes(source: str = "documents") -> str:
    """The portable MinHash CTE chain against an arbitrary source
    relation (pipe3 runs it on the already-filtered corpus)."""
    return _MH_CTES.replace("FROM documents)", f"FROM {source})", 1)


_MH_CTES = f"""
        t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(tk) >= 3
                        THEN list_transform(generate_series(1, len(tk) - 2),
                             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
                        ELSE [array_to_string(tk, ' ')] END AS shs
            FROM t
        ),
        e AS (
            SELECT doc_id, ('0x' || substr(md5(u.s), 1, 8))::BIGINT AS h32
            FROM sh, LATERAL unnest(shs) AS u(s)
        ),
        m AS (SELECT doc_id, {_MH_MINS} FROM e GROUP BY doc_id),
        bd AS (
            {_MH_BANDS}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bd a JOIN bd b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
        )"""

# x9's oracle recomputes SimHash bits relationally (per-bit vote sums +
# the 2*ones > n majority rule) over the same portable 60-bit md5 hash —
# independent of the Spark side's SWAR lane packing.
_SH_ONES = ", ".join(f"SUM((h >> {b}) & 1) AS o{b}" for b in range(60))
_SH_SIG = " + ".join(
    f"(CASE WHEN 2 * o{b} > n THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
    for b in range(60)
)

# x8's oracle inlines the seeded hyperplanes as SQL literals (Python
# float repr round-trips exactly) and rebuilds the bucket with the SAME
# left-fold dot-product order as functions/vector.dot, so signs — and
# therefore bucket membership and the probed candidate set — match
# bit-for-bit. Cosine + top-k follow the x1 formulation.
from .operators.similarity import _random_hyperplanes  # noqa: E402


def _x8_sql() -> str:
    planes = _random_hyperplanes(dim=64, bits=6, seed=42)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + v[{j + 1}] * {p!r})"
        return expr

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 6) AS sim
        FROM b CROSS JOIN q
        WHERE bucket IN (qb, xor(qb, 1), xor(qb, 2))
        ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10
    """


def _rag2_sql() -> str:
    """rag2's oracle: x8's inlined-hyperplane candidate set, ranked and
    scored against the x1 exact top-10 with the same integer discount
    table the Spark side inlines."""
    planes = _random_hyperplanes(dim=64, bits=6, seed=42)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + v[{j + 1}] * {p!r})"
        return expr

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    disc = "[" + ", ".join(str(d) for d in _NDCG_DISC_E6) + "]"
    idcg = sum(_NDCG_DISC_E6)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
        exact10 AS (
            SELECT vec_id, 1 AS rel FROM e CROSS JOIN q
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT 10
        ),
        cand AS (
            SELECT vec_id, list_cosine_similarity(v, qv) AS s
            FROM b CROSS JOIN q
            WHERE bucket IN (qb, xor(qb, 1), xor(qb, 2)) AND vec_id <> 0
        ),
        ranked AS (
            SELECT c.vec_id, COALESCE(x.rel, 0) AS rel,
                   rnk, ({disc})[rnk] AS disc
            FROM (SELECT vec_id, s,
                         row_number() OVER (ORDER BY s DESC, vec_id ASC)
                             AS rnk
                  FROM cand) c
            LEFT JOIN exact10 x USING (vec_id)
            WHERE rnk <= 10
        ),
        a AS (SELECT CAST(SUM(rel * disc) AS BIGINT) AS dcg_e6,
                     MIN(CASE WHEN rel = 1 THEN rnk END) AS fr
              FROM ranked)
        SELECT CAST(10 AS BIGINT) AS k, dcg_e6,
               CAST({idcg} AS BIGINT) AS idcg_e6,
               CAST(dcg_e6 * 1000000 // {idcg} AS BIGINT) AS ndcg_e6,
               CAST(COALESCE(fr, 0) AS BIGINT) AS first_rel_rank,
               CAST(CASE WHEN fr IS NULL THEN 0
                         ELSE 1000000 // fr END AS BIGINT) AS mrr_e6
        FROM a
    """
def _g2_sql(
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 10**12,
    dangling: bool = False,
) -> str:
    import math as _math

    base = int(_math.floor((1 - damping) * scale))
    iters = []
    prev = "r0"
    for i in range(1, iterations + 1):
        pool_cte = f"""
        p{i} AS (
            SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS pool
            FROM {prev} JOIN dang USING (node)
        ),""" if dangling else ""
        incoming = (
            f"(COALESCE(c{i}.s, 0) + p{i}.pool // nn.n)"
            if dangling
            else f"COALESCE(c{i}.s, 0)"
        )
        tail = " CROSS JOIN p" + str(i) + " CROSS JOIN nn" if dangling else ""
        iters.append(f"""
        {pool_cte}
        c{i} AS (
            SELECT e.dst AS node, CAST(SUM({prev}.r // d.deg) AS BIGINT) AS s
            FROM e JOIN d ON e.src = d.src
                   JOIN {prev} ON {prev}.node = e.src
            GROUP BY e.dst
        ),
        r{i} AS (
            SELECT n.node,
                   CAST({base} + CAST(floor({damping!r} * {incoming})
                                      AS BIGINT) AS BIGINT) AS r
            FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node{tail}
        )""")
        prev = f"r{i}"
    dang_ctes = """
        dang AS (SELECT node FROM nodes
                 WHERE node NOT IN (SELECT src FROM e)),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),""" if dangling else ""
    return f"""
        WITH e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                            's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),{dang_ctes}
        r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes),
        {",".join(iters)}
        SELECT node, r AS rank FROM {prev}
        ORDER BY r DESC, node ASC LIMIT 20
    """


def _x14_sql(k: int = 8, dim: int = 64, iters: int = 2, grid: int = 10**6) -> str:
    """Integer-Lloyd oracle: replays kmeans_quantized exactly. Assignment
    is an argmin over integer distances (cross join q x centroids, k rows
    per vec); the update repacks per-dim floor(sum/n) components with
    list(... ORDER BY i). Every arithmetic step is order-independent."""
    dist = (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT)"
    )

    def assign(a: str, csrc: str) -> str:
        return f"""
    {a} AS (
        SELECT vec_id, cluster, d FROM (
            SELECT q.vec_id, c.cluster, {dist} AS d,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {dist}, c.cluster) AS rk
            FROM q CROSS JOIN {csrc} c
        ) WHERE rk = 1
    )"""

    def update(cnew: str, asrc: str, cprev: str) -> str:
        return f"""
    {cnew}_raw AS (
        SELECT cluster, list(comp ORDER BY i) AS cv FROM (
            SELECT a.cluster, g.i,
                   CAST(floor(CAST(SUM(q.qv[g.i]) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS comp
            FROM {asrc} a JOIN q USING (vec_id),
                 LATERAL unnest(generate_series(1, {dim})) AS g(i)
            GROUP BY a.cluster, g.i
        ) GROUP BY cluster
    ),
    {cnew} AS (
        SELECT p.cluster, COALESCE(r.cv, p.cv) AS cv
        FROM {cprev} p LEFT JOIN {cnew}_raw r USING (cluster)
    )"""

    parts = [
        f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x * {grid} + 0.5) AS BIGINT))
                     AS qv
          FROM e),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
           FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k}))""",
        assign("a0", "c0"),
    ]
    prev_c, prev_a = "c0", "a0"
    for it in range(1, iters + 1):
        parts.append(update(f"c{it}", prev_a, prev_c))
        parts.append(assign(f"a{it}", f"c{it}"))
        prev_c, prev_a = f"c{it}", f"a{it}"
    return f"""
    WITH {",".join(parts)}
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(vec_id) AS min_vec,
           CAST(SUM(d) AS BIGINT) AS inertia_q
    FROM {prev_a} GROUP BY cluster
    """


def _pq_sub_dist(sub_dim: int, xv: str, cv: str) -> str:
    """Integer squared distance between two sub_dim integer lists."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {sub_dim}), "
        f"i -> ({xv}[i] - {cv}[i]) * ({xv}[i] - {cv}[i]))) AS BIGINT)"
    )


def _pq_fit_chain(
    s: int, sub_dim: int, k_codes: int, src_cte: str = "q",
    src_vec: str = "qv",
) -> str:
    """Shared oracle front half for ONE PQ subspace (used by _x17_sql,
    the batch-ADC oracle and the IVF-PQ oracle): slice the integer
    vectors, replay the 1-iteration integer-Lloyd codebook fit
    (first-k_codes init by vec_id, argmin assign with lowest-cluster
    ties, floor-mean update), then the FROZEN encode. Produces CTEs
    s{s}q, s{s}c0, s{s}a0, s{s}c1raw, s{s}c1 (the codebook) and
    s{s}code (vec_id -> cluster)."""
    a, b = s * sub_dim + 1, (s + 1) * sub_dim
    d_qc0 = _pq_sub_dist(sub_dim, "x.sv", "c.cv")
    return f"""
    s{s}q AS (SELECT vec_id, list_slice({src_vec}, {a}, {b}) AS sv
              FROM {src_cte}),
    s{s}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                      sv AS cv
               FROM (SELECT vec_id, sv FROM s{s}q ORDER BY vec_id
                     LIMIT {k_codes})),
    s{s}a0 AS (
        SELECT vec_id, cluster FROM (
            SELECT x.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d_qc0}, c.cluster) AS rk
            FROM s{s}q x CROSS JOIN s{s}c0 c
        ) WHERE rk = 1
    ),
    s{s}c1raw AS (
        SELECT cluster, list(comp ORDER BY i) AS cv FROM (
            SELECT a1.cluster, g.i,
                   CAST(floor(CAST(SUM(x.sv[g.i]) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS comp
            FROM s{s}a0 a1 JOIN s{s}q x USING (vec_id),
                 LATERAL unnest(generate_series(1, {sub_dim})) AS g(i)
            GROUP BY a1.cluster, g.i
        ) GROUP BY cluster
    ),
    s{s}c1 AS (
        SELECT p.cluster, COALESCE(r.cv, p.cv) AS cv
        FROM s{s}c0 p LEFT JOIN s{s}c1raw r USING (cluster)
    ),
    s{s}code AS (
        SELECT vec_id, cluster FROM (
            SELECT x.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d_qc0}, c.cluster) AS rk
            FROM s{s}q x CROSS JOIN s{s}c1 c
        ) WHERE rk = 1
    )"""


def _x17_sql(
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 16,
    k: int = 10,
    grid: int = 10**6,
    query_id: int = 0,
    exclude_query: bool = False,
) -> str:
    """PQ-ANN oracle: per subspace, replay the 1-iteration integer-Lloyd
    codebook fit, encode every vector against the updated codebook, build
    the query's distance table relationally, and rank by the joined sum.
    All-integer arithmetic — same fixpoint as pq_ann_topk."""
    chains = []
    joins = []
    for s in range(m):
        d_dt = _pq_sub_dist(sub_dim, "x.sv", "c.cv")
        chains.append(f"""{_pq_fit_chain(s, sub_dim, k_codes)},
    s{s}dt AS (
        SELECT c.cluster, {d_dt} AS dd
        FROM s{s}c1 c CROSS JOIN (SELECT vec_id, sv FROM s{s}q
                                  WHERE vec_id = {query_id}) x
    ),
    s{s}d AS (
        SELECT e.vec_id, t.dd FROM s{s}code e JOIN s{s}dt t USING (cluster)
    )""")
        joins.append(f"JOIN s{s}d USING (vec_id)" if s else "s0d")
    total = " + ".join(f"s{s}d.dd" for s in range(m))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x * {grid} + 0.5) AS BIGINT))
                     AS qv
          FROM e),
    {",".join(chains)}
    SELECT vec_id, CAST({total} AS BIGINT) AS adist
    FROM {" ".join(joins)}
    {f"WHERE vec_id <> {query_id}" if exclude_query else ""}
    ORDER BY adist, vec_id LIMIT {k}
    """

def _vidx_int_dist(xv: str, cv: str, dim: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({xv}[i] - {cv}[i]) * ({xv}[i] - {cv}[i]))) AS BIGINT)"
    )


def _vidx_ivf_fit_ctes(
    n_cells: int, iters: int, grid: int, dim: int, fit_pred: str,
    assign_src: str = "q", extra: list[str] | None = None,
) -> tuple[str, str]:
    """The shared oracle front half for every persisted-IVF lane: quantize,
    fit integer-Lloyd centroids over ``fit_pred`` rows, assign ALL rows to
    the frozen model. Returns (cte_block, final_model_cte) — the block
    ends with ``enc`` (vec_id, cell). ``assign_src`` + ``extra`` support
    the re-encode lane (vidx10): fit on the ORIGINAL corpus (``q``),
    assign a REWRITTEN corpus defined by the extra CTEs."""
    d_fit = _vidx_int_dist("x.qv", "c.cv", dim)
    parts = [
        f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id, v,
                 list_transform(v, x -> CAST(floor(x * {grid} + 0.5) AS BIGINT))
                     AS qv
          FROM e),
    fit AS (SELECT vec_id, qv FROM q WHERE {fit_pred}),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
           FROM (SELECT vec_id, qv FROM fit ORDER BY vec_id LIMIT {n_cells}))"""
    ]
    prev_c = "c0"
    for it in range(1, iters + 1):
        parts.append(f"""
    a{it} AS (
        SELECT vec_id, cell FROM (
            SELECT x.vec_id, c.cell,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d_fit}, c.cell) AS rk
            FROM fit x CROSS JOIN {prev_c} c
        ) WHERE rk = 1
    ),
    c{it}raw AS (
        SELECT cell, list(comp ORDER BY i) AS cv FROM (
            SELECT a.cell, g.i,
                   CAST(floor(CAST(SUM(x.qv[g.i]) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS comp
            FROM a{it} a JOIN fit x USING (vec_id),
                 LATERAL unnest(generate_series(1, {dim})) AS g(i)
            GROUP BY a.cell, g.i
        ) GROUP BY cell
    ),
    c{it} AS (
        SELECT p.cell, COALESCE(r.cv, p.cv) AS cv
        FROM {prev_c} p LEFT JOIN c{it}raw r USING (cell)
    )""")
        prev_c = f"c{it}"
    parts.extend(extra or [])
    parts.append(f"""
    enc AS (
        SELECT vec_id, cell FROM (
            SELECT x.vec_id, c.cell,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d_fit}, c.cell) AS rk
            FROM {assign_src} x CROSS JOIN {prev_c} c
        ) WHERE rk = 1
    )""")
    return ",".join(parts), prev_c


def _vidx_ivf_sql(
    query_id: int,
    n_cells: int = 16,
    iters: int = 1,
    nprobe: int = 2,
    k: int = 10,
    grid: int = 10**6,
    dim: int = 64,
    fit_pred: str = "TRUE",
) -> str:
    """Persisted-IVF-index oracle: replay the stored model EXACTLY —
    integer-Lloyd coarse centroids fitted over ``fit_pred`` rows (the
    build-time corpus; refresh lanes fit on a subset and encode
    everything), frozen-centroid integer argmin assignment of ALL rows,
    integer probe selection, exact cosine top-k inside the probed cells
    (query row excluded). Mirrors store.create_vector_index(method=
    'ivf') + refresh_vector_index + knn."""
    ctes, model = _vidx_ivf_fit_ctes(n_cells, iters, grid, dim, fit_pred)
    d_fit = _vidx_int_dist("x.qv", "c.cv", dim)
    return f"""
    WITH {ctes},
    probes AS (
        SELECT c.cell FROM {model} c
        CROSS JOIN (SELECT qv FROM q WHERE vec_id = {query_id}) x
        ORDER BY {d_fit}, c.cell LIMIT {nprobe}
    ),
    qv AS (SELECT v AS qvec FROM e WHERE vec_id = {query_id})
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, qvec), 6) AS sim
    FROM e JOIN enc USING (vec_id) CROSS JOIN qv
    WHERE enc.cell IN (SELECT cell FROM probes)
      AND e.vec_id <> {query_id}
    ORDER BY list_cosine_similarity(e.v, qvec) DESC, e.vec_id ASC LIMIT {k}
    """


def _vidx_batch_sql(
    query_ids: list[int],
    n_cells: int = 16,
    iters: int = 1,
    nprobe: int = 2,
    k: int = 5,
    grid: int = 10**6,
    dim: int = 64,
    fit_pred: str = "TRUE",
) -> str:
    """Batch-knn-through-the-index oracle: per query row, the nprobe
    nearest cells by the same integer distance, candidates via the cell
    equi join, exact cosine, per-query top-k window (self-match
    excluded). Mirrors store.knn_batch(method='ivf'); ``fit_pred``
    restricts the model FIT corpus (refresh lanes: frozen model from
    the initial rows, assignment over everything)."""
    ctes, model = _vidx_ivf_fit_ctes(n_cells, iters, grid, dim, fit_pred)
    d_fit = _vidx_int_dist("x.qv", "c.cv", dim)
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH {ctes},
    qs AS (SELECT vec_id AS q_id, v AS qvec, qv FROM q
           WHERE vec_id IN ({ids})),
    qprobes AS (
        SELECT q_id, cell FROM (
            SELECT x.q_id, c.cell,
                   row_number() OVER (PARTITION BY x.q_id
                                      ORDER BY {d_fit}, c.cell) AS rk
            FROM qs x CROSS JOIN {model} c
        ) WHERE rk <= {nprobe}
    ),
    cand AS (
        SELECT p.q_id, e.vec_id, list_cosine_similarity(e.v, qs.qvec) AS s
        FROM qprobes p
        JOIN enc ON enc.cell = p.cell
        JOIN e USING (vec_id)
        JOIN qs USING (q_id)
        WHERE e.vec_id <> p.q_id
    )
    SELECT q_id, vec_id, ROUND(s, 6) AS sim FROM (
        SELECT q_id, vec_id, s,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY s DESC, vec_id ASC) AS rk
        FROM cand
    ) WHERE rk <= {k}
    """


def _vidx_lsh_sql(
    query_id: int,
    bits: int = 8,
    seed: int = 42,
    multiprobe: int = 2,
    k: int = 10,
    dim: int = 64,
) -> str:
    """Persisted-LSH-index oracle: the stored hyperplanes are the seeded
    Python constants, inlined as literals with the identical left-to-
    right fold order (x8's recipe), so bucket membership, the multiprobe
    candidate set and the final exact-cosine top-k all hash-match the
    store's knn."""
    planes = _random_hyperplanes(dim=dim, bits=bits, seed=seed)

    def dot_sql(plane: list[float]) -> str:
        expr = "0.0"
        for j, p in enumerate(plane):
            expr = f"({expr} + v[{j + 1}] * {p!r})"
        return expr

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql(plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    probe_list = ", ".join(
        ["qb"] + [f"xor(qb, {1 << i})" for i in range(min(multiprobe, bits))]
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = {query_id})
        SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 6) AS sim
        FROM b CROSS JOIN q
        WHERE bucket IN ({probe_list}) AND vec_id <> {query_id}
        ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC LIMIT {k}
    """


def _vidx_pq_batch_sql(
    query_ids: list[int],
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 16,
    k: int = 5,
    grid: int = 10**6,
    exclude_self: bool = True,
) -> str:
    """Batch-ADC-through-the-stored-PQ-codes oracle (vidx7): the shared
    codebook fit + frozen encode, then PER QUERY ROW a relational
    distance table (cluster -> dd) and the m-lookup sum, per-query
    top-k ascending with vec_id tie-break — mirrors
    store.knn_batch(method='pq') / operators.similarity.pq_adc_batch."""
    ids = ", ".join(str(i) for i in query_ids)
    chains, joins = [], []
    for s in range(m):
        d_dt = _pq_sub_dist(sub_dim, "x.sv", "c.cv")
        chains.append(f"""{_pq_fit_chain(s, sub_dim, k_codes)},
    s{s}bdt AS (
        SELECT x.vec_id AS q_id, c.cluster, {d_dt} AS dd
        FROM s{s}c1 c CROSS JOIN (SELECT vec_id, sv FROM s{s}q
                                  WHERE vec_id IN ({ids})) x
    ),
    s{s}bd AS (
        SELECT t.q_id, e.vec_id, t.dd
        FROM s{s}code e JOIN s{s}bdt t USING (cluster)
    )""")
        joins.append(f"JOIN s{s}bd USING (q_id, vec_id)" if s else "s0bd")
    total = " + ".join(f"s{s}bd.dd" for s in range(m))
    self_pred = "AND vec_id <> q_id" if exclude_self else ""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x * {grid} + 0.5) AS BIGINT))
                     AS qv
          FROM e),
    {",".join(chains)},
    tot AS (
        SELECT q_id, vec_id, CAST({total} AS BIGINT) AS adist
        FROM {" ".join(joins)}
    )
    SELECT q_id, vec_id, adist FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adist, vec_id) AS rk
        FROM tot WHERE TRUE {self_pred}
    ) WHERE rk <= {k}
    """


def _vidx_ivfpq_sql(
    query_id: int,
    n_cells: int = 16,
    iters: int = 1,
    nprobe: int = 2,
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 16,
    k: int = 10,
    grid: int = 10**6,
    dim: int = 64,
    fit_pred: str = "TRUE",
    exclude_query: bool = True,
) -> str:
    """Persisted IVF-PQ oracle (vidx8): replay the FULL composite model —
    coarse integer-Lloyd centroids over ``fit_pred`` rows + frozen cell
    assignment of all rows (the shared _vidx_ivf_fit_ctes front half),
    INTEGER RESIDUALS (quantized vector minus assigned centroid), the
    per-subspace residual codebook fits (shared _pq_fit_chain over the
    residual CTE), the frozen residual encode, then the query path:
    nprobe nearest cells, CELL-SPECIFIC query residuals and distance
    tables, ADC over candidates in the probed cells only. Mirrors
    store.create_vector_index(method='ivfpq') + knn."""
    ctes, model = _vidx_ivf_fit_ctes(n_cells, iters, grid, dim, fit_pred)
    d_fit = _vidx_int_dist("x.qv", "c.cv", dim)
    chains, joins = [], []
    for s in range(m):
        a, b = s * sub_dim + 1, (s + 1) * sub_dim
        d_dt = _pq_sub_dist(sub_dim, "list_slice(qr.rv, %d, %d)" % (a, b),
                            "c.cv")
        chains.append(f"""{_pq_fit_chain(s, sub_dim, k_codes,
                                         src_cte="res", src_vec="rv")},
    s{s}qdt AS (
        SELECT qr.cell, c.cluster, {d_dt} AS dd
        FROM qres qr CROSS JOIN s{s}c1 c
    ),
    s{s}ad AS (
        SELECT e.vec_id, t.dd
        FROM s{s}code e
        JOIN enc ON enc.vec_id = e.vec_id
        JOIN s{s}qdt t ON t.cell = enc.cell AND t.cluster = e.cluster
    )""")
        joins.append(f"JOIN s{s}ad USING (vec_id)" if s else "s0ad")
    total = " + ".join(f"s{s}ad.dd" for s in range(m))
    self_pred = f"AND vec_id <> {query_id}" if exclude_query else ""
    return f"""
    WITH {ctes},
    res AS (
        SELECT x.vec_id,
               list_transform(generate_series(1, {dim}),
                              i -> x.qv[i] - c.cv[i]) AS rv
        FROM q x JOIN enc ON enc.vec_id = x.vec_id
        JOIN {model} c ON c.cell = enc.cell
    ),
    probes AS (
        SELECT c.cell, c.cv FROM {model} c
        CROSS JOIN (SELECT qv FROM q WHERE vec_id = {query_id}) x
        ORDER BY {d_fit}, c.cell LIMIT {nprobe}
    ),
    qres AS (
        SELECT p.cell,
               list_transform(generate_series(1, {dim}),
                              i -> x.qv[i] - p.cv[i]) AS rv
        FROM probes p
        CROSS JOIN (SELECT qv FROM q WHERE vec_id = {query_id}) x
    ),
    {",".join(chains)}
    SELECT vec_id, CAST({total} AS BIGINT) AS adist
    FROM {" ".join(joins)}
    WHERE TRUE {self_pred}
    ORDER BY adist, vec_id LIMIT {k}
    """


def _vidx_ivfpq_batch_sql(
    query_ids: list[int],
    n_cells: int = 16,
    iters: int = 1,
    nprobe: int = 2,
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 16,
    k: int = 5,
    grid: int = 10**6,
    dim: int = 64,
    exclude_self: bool = True,
) -> str:
    """Batch IVF-PQ oracle (vidx9): per query row, the nprobe nearest
    coarse cells, the CELL-SPECIFIC query residual + distance tables,
    ADC over candidates in that query's probed cells, per-query top-k
    ascending. Mirrors store.knn_batch(method='ivfpq') /
    operators.similarity.ivfpq_adc_batch."""
    ctes, model = _vidx_ivf_fit_ctes(n_cells, iters, grid, dim, "TRUE")
    d_fit = _vidx_int_dist("x.qv", "c.cv", dim)
    ids = ", ".join(str(i) for i in query_ids)
    chains, joins = [], []
    for s in range(m):
        a, b = s * sub_dim + 1, (s + 1) * sub_dim
        d_dt = _pq_sub_dist(sub_dim, f"list_slice(qr.rv, {a}, {b})", "c.cv")
        chains.append(f"""{_pq_fit_chain(s, sub_dim, k_codes,
                                         src_cte="res", src_vec="rv")},
    s{s}qdt AS (
        SELECT qr.q_id, qr.cell, c.cluster, {d_dt} AS dd
        FROM qres qr CROSS JOIN s{s}c1 c
    ),
    s{s}ad AS (
        SELECT t.q_id, e.vec_id, t.dd
        FROM s{s}code e
        JOIN enc ON enc.vec_id = e.vec_id
        JOIN s{s}qdt t ON t.cell = enc.cell AND t.cluster = e.cluster
    )""")
        joins.append(f"JOIN s{s}ad USING (q_id, vec_id)" if s else "s0ad")
    total = " + ".join(f"s{s}ad.dd" for s in range(m))
    self_pred = "AND vec_id <> q_id" if exclude_self else ""
    return f"""
    WITH {ctes},
    res AS (
        SELECT x.vec_id,
               list_transform(generate_series(1, {dim}),
                              i -> x.qv[i] - c.cv[i]) AS rv
        FROM q x JOIN enc ON enc.vec_id = x.vec_id
        JOIN {model} c ON c.cell = enc.cell
    ),
    qs AS (SELECT vec_id AS q_id, qv FROM q WHERE vec_id IN ({ids})),
    qprobes AS (
        SELECT q_id, cell, cv FROM (
            SELECT x.q_id, c.cell, c.cv,
                   row_number() OVER (PARTITION BY x.q_id
                                      ORDER BY {d_fit}, c.cell) AS rk
            FROM qs x CROSS JOIN {model} c
        ) WHERE rk <= {nprobe}
    ),
    qres AS (
        SELECT p.q_id, p.cell,
               list_transform(generate_series(1, {dim}),
                              i -> x.qv[i] - p.cv[i]) AS rv
        FROM qprobes p JOIN qs x USING (q_id)
    ),
    {",".join(chains)},
    tot AS (
        SELECT q_id, vec_id, CAST({total} AS BIGINT) AS adist
        FROM {" ".join(joins)}
    )
    SELECT q_id, vec_id, adist FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adist, vec_id) AS rk
        FROM tot WHERE TRUE {self_pred}
    ) WHERE rk <= {k}
    """


def _vidx_reencode_sql(
    query_id: int,
    n_cells: int = 16,
    iters: int = 1,
    nprobe: int = 2,
    k: int = 10,
    grid: int = 10**6,
    dim: int = 64,
) -> str:
    """Frozen-model re-encode oracle (vidx10): centroids fitted on the
    ORIGINAL corpus, every row of the REWRITTEN corpus (upsert: vec_id
    < 50 takes vec_id+100's embedding) assigned to the frozen model,
    probe + exact cosine over the rewritten vectors. Mirrors
    create_vector_index + upsert + reencode_vector_index + knn."""
    extra = [f"""
    e2 AS (
        SELECT a.vec_id,
               CASE WHEN a.vec_id < 50 THEN b.v ELSE a.v END AS v
        FROM e a LEFT JOIN e b ON b.vec_id = a.vec_id + 100
    ),
    q2 AS (SELECT vec_id,
                  list_transform(v, x -> CAST(floor(x * {grid} + 0.5)
                                              AS BIGINT)) AS qv
           FROM e2)"""]
    ctes, model = _vidx_ivf_fit_ctes(
        n_cells, iters, grid, dim, "TRUE", assign_src="q2", extra=extra
    )
    d_fit = _vidx_int_dist("x.qv", "c.cv", dim)
    return f"""
    WITH {ctes},
    probes AS (
        SELECT c.cell FROM {model} c
        CROSS JOIN (SELECT qv FROM q WHERE vec_id = {query_id}) x
        ORDER BY {d_fit}, c.cell LIMIT {nprobe}
    ),
    qv AS (SELECT v AS qvec FROM e WHERE vec_id = {query_id})
    SELECT e2.vec_id, ROUND(list_cosine_similarity(e2.v, qvec), 6) AS sim
    FROM e2 JOIN enc USING (vec_id) CROSS JOIN qv
    WHERE enc.cell IN (SELECT cell FROM probes)
      AND e2.vec_id <> {query_id}
    ORDER BY list_cosine_similarity(e2.v, qvec) DESC, e2.vec_id ASC
    LIMIT {k}
    """


def _vidx_sq_sql(
    query_id: int,
    k: int = 10,
    dim: int = 64,
    exclude_query: bool = True,
) -> str:
    """SQ8 scalar-quantization oracle (vidx12): per-dimension min/max
    train (comparison aggregates — exact), the one-IEEE-expression level
    assignment, exhaustive integer-L2 vs the quantized query. Mirrors
    store.create_vector_index(method='sq') + knn bit-for-bit (the level
    formula is written in the identical operation order on both
    engines)."""
    self_pred = f"AND c.vec_id <> {query_id}" if exclude_query else ""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    st AS (SELECT g.i AS i, MIN(v[g.i]) AS mn, MAX(v[g.i]) AS mx
           FROM e, LATERAL unnest(generate_series(1, {dim})) g(i)
           GROUP BY g.i),
    mna AS (SELECT list(mn ORDER BY i) AS a FROM st),
    mxa AS (SELECT list(mx ORDER BY i) AS a FROM st),
    c AS (SELECT vec_id,
                 list_transform(generate_series(1, {dim}), i ->
                     CASE WHEN mxa.a[i] = mna.a[i] THEN 0
                          ELSE CAST(floor((v[i] - mna.a[i])
                                          / (mxa.a[i] - mna.a[i])
                                          * 255.0 + 0.5) AS BIGINT)
                     END) AS codes
          FROM e, mna, mxa),
    q AS (SELECT codes AS qc FROM c WHERE vec_id = {query_id})
    SELECT c.vec_id,
           CAST(list_sum(list_transform(generate_series(1, {dim}),
                i -> (c.codes[i] - q.qc[i]) * (c.codes[i] - q.qc[i])))
                AS BIGINT) AS qdist
    FROM c CROSS JOIN q
    WHERE TRUE {self_pred}
    ORDER BY qdist, c.vec_id LIMIT {k}
    """


def _vidx_pq_refine_sql(
    query_id: int,
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 16,
    k: int = 10,
    refine: int = 3,
    grid: int = 10**6,
) -> str:
    """PQ + exact re-rank oracle (vidx11, FAISS IndexRefineFlat): the
    ADC shortlist of k*refine ids, exact-cosine re-ranked against the
    raw vectors, top-k descending. Mirrors knn(refine=)."""
    shortlist = _x17_sql(
        m=m, sub_dim=sub_dim, k_codes=k_codes, k=k * refine, grid=grid,
        query_id=query_id, exclude_query=True,
    )
    return f"""
    WITH sl AS (SELECT vec_id FROM ({shortlist}) t),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    qq AS (SELECT v AS qvec FROM e WHERE vec_id = {query_id})
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, qvec), 6) AS sim
    FROM e JOIN sl USING (vec_id) CROSS JOIN qq
    ORDER BY list_cosine_similarity(e.v, qvec) DESC, e.vec_id ASC
    LIMIT {k}
    """


# x21: per-round CTE chain — counts -> 1-row argmax -> window mark/drop/
# renumber merge. Parallel unnest (positions + tokens) zips in lockstep.
def _x21_round(r: int) -> str:
    return f"""
    c{r} AS (SELECT tok AS x,
                    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS y
             FROM p{r}),
    r{r} AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM c{r}
             WHERE y IS NOT NULL AND x <> y GROUP BY x, y
             ORDER BY cnt DESC, x, y LIMIT 1),
    m{r} AS (SELECT p.doc_id, p.pos,
                    CASE WHEN p.tok = r.x AND lead(p.tok) OVER w = r.y
                         THEN r.x || '+' || r.y ELSE p.tok END AS tok,
                    CASE WHEN p.tok = r.y AND lag(p.tok) OVER w = r.x
                         THEN 1 ELSE 0 END AS dropped
             FROM p{r} p CROSS JOIN r{r} r
             WINDOW w AS (PARTITION BY p.doc_id ORDER BY p.pos)),
    p{r + 1} AS (SELECT doc_id,
                        row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                            AS pos,
                        tok
                 FROM m{r} WHERE dropped = 0)"""

# Shared oracle view for the store-mutation witnesses (f22/f23/f24):
# events in the feature-table shape with integer-cents values.
_FEATS_CENTS = f"""
    SELECT user_id AS entity_id, ts, event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
    FROM ({_EV})
"""

_F24_CHK = (
    "CAST(SUM(('0x' || substr(md5(CAST(entity_id AS VARCHAR) || ',' "
    "|| CAST(epoch_us(ts) AS VARCHAR) || ',' "
    "|| CAST(event_id AS VARCHAR)), 1, 8))::BIGINT "
    "% 2147483648) AS BIGINT)"
)


def _fh_oracle_elem(bucket: int, cols: list[str]) -> str:
    """One element of the feature-hash vector: same md5-derived bucket and
    sign-bit expressions as operators/encoding.py feature_hash."""
    terms = []
    for c in cols:
        u = (
            f"CAST(('0x' || substr(md5('{c}=' || CAST({c} AS VARCHAR)), 1, 15)) "
            "AS BIGINT)"
        )
        terms.append(
            f"CASE WHEN {u} % 16 = {bucket} THEN "
            f"(CASE WHEN ({u} >> 59) % 2 = 0 THEN 1 ELSE -1 END) ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"

_TOKS_CTE = """
    toks AS (
        SELECT list_filter(string_split(lower(text), ' '),
                           t -> length(t) > 0) AS tk
        FROM documents
    )
"""

# a17: all-integer covariance numerators; every SUM wrapped back to BIGINT
# (DuckDB sums BIGINT into HUGEINT).
_A17_QCOLS = ", ".join(
    f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000) AS BIGINT) AS q{i}"
    for i in range(8)
)
_A17_AGGS = (
    "CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}" for i in range(8))
    + ", "
    + ", ".join(
        f"CAST(SUM(q{i} * q{j}) AS BIGINT) AS p{i}_{j}"
        for i in range(8)
        for j in range(i, 8)
    )
)
_A17_ARMS = " UNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS i, CAST({j} AS BIGINT) AS j, "
    f"CAST(p{i}_{j} * n - s{i} * s{j} AS BIGINT) AS cov_num, n FROM a"
    for i in range(8)
    for j in range(i, 8)
)


def _g4_sql(rounds: int = 3) -> str:
    peels = []
    prev = "adj0"
    for i in range(1, rounds + 1):
        peels.append(f"""
        d{i} AS (SELECT node, COUNT(*) AS deg FROM {prev} GROUP BY node),
        k{i} AS (SELECT node FROM d{i}, kv WHERE deg >= kv.k),
        adj{i} AS (SELECT a.node, a.peer FROM {prev} a
                   JOIN k{i} x ON a.node = x.node
                   JOIN k{i} y ON a.peer = y.node)""")
        prev = f"adj{i}"
    return f"""
        WITH e0 AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS lo,
                            's' || CAST(l_suppkey AS VARCHAR) AS hi
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        adj0 AS (SELECT lo AS node, hi AS peer FROM e0
                 UNION ALL SELECT hi, lo FROM e0),
        kv AS (
            SELECT CAST(((SELECT COUNT(*) FROM e0)
                         + (SELECT COUNT(DISTINCT node) FROM adj0) - 1)
                        // (SELECT COUNT(DISTINCT node) FROM adj0)
                   AS BIGINT) AS k
        ),
        {",".join(peels)},
        core AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
                 FROM {prev} GROUP BY node),
        sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_core FROM core)
        SELECT node, degree, sz.n_core
        FROM core CROSS JOIN sz
        ORDER BY degree DESC, node ASC LIMIT 30
    """


def _bt1_sql(
    iterations: int = 3, scale: int = 1_000_000, precision: int = 10**12
) -> str:
    """Unrolled fixed-point Bradley-Terry MM rounds — the DuckDB twin of
    operators/preference.py bradley_terry over the bt1 matchup build.
    Every floor division (`//` here, `div` in Spark) is replayed on the
    same int64 values, so the strengths must match bit-for-bit."""
    pu = precision // scale
    rounds = []
    prev = "s0"
    for i in range(1, iterations + 1):
        rounds.append(f"""
        d{i} AS MATERIALIZED (SELECT m.item,
                        SUM(m.n * {precision} // (si.s + sj.s)) AS d,
                        CAST(SUM(m.w) AS BIGINT) AS wins,
                        CAST(SUM(m.n) AS BIGINT) AS n_matches
                 FROM m JOIN {prev} si ON m.item = si.item
                        JOIN {prev} sj ON m.opp = sj.item
                 GROUP BY m.item),
        r{i} AS MATERIALIZED (SELECT item, wins, n_matches,
                        (wins * {scale}) // GREATEST(d // {pu}, 1) AS s_raw
                 FROM d{i}),
        s{i} AS MATERIALIZED (SELECT item,
                        GREATEST((s_raw * (SELECT COUNT(*) FROM r{i})
                                  * {scale})
                                 // (SELECT SUM(s_raw) FROM r{i}), 1) AS s
                 FROM r{i})""")
        prev = f"s{i}"
    return f"""
        WITH ob AS MATERIALIZED (
            SELECT l_orderkey AS ok, p_brand AS brand,
                   MAX(l_extendedprice) AS price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
        ),
        pm AS MATERIALIZED (
            SELECT x.brand AS a, y.brand AS b,
                   CAST(COUNT(*) + 2 AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN x.price >= y.price THEN 1 ELSE 0 END)
                        + 1 AS BIGINT) AS w
            FROM ob x JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
            GROUP BY 1, 2
        ),
        m AS MATERIALIZED (SELECT a AS item, b AS opp, n, w FROM pm
              UNION ALL SELECT b, a, n, n - w FROM pm),
        s0 AS MATERIALIZED (SELECT DISTINCT item, CAST({scale} AS BIGINT) AS s FROM m),
        {",".join(rounds)}
        SELECT r.item AS brand,
               CAST(s.s AS BIGINT) AS strength,
               r.wins, r.n_matches
        FROM r{iterations} r JOIN s{iterations} s ON r.item = s.item
    """


def _rag3_sql(n_select: int = 5) -> str:
    q6 = "CAST(floor(round(list_cosine_similarity({a}, {b}), 6) * 1000000 + 0.5) AS BIGINT)"
    rounds = []
    for i in range(1, n_select + 1):
        if i == 1:
            rounds.append("""
        s1 AS (SELECT vec_id, rel_e6, CAST(7 * rel_e6 AS BIGINT) AS mmr_e6
               FROM cand ORDER BY 7 * rel_e6 DESC, vec_id ASC LIMIT 1),
        sel1 AS (SELECT vec_id FROM s1)""")
        else:
            rounds.append(f"""
        s{i} AS (
            SELECT c.vec_id, c.rel_e6,
                   CAST(7 * c.rel_e6 - 3 * (
                       SELECT MAX(p.sim_e6) FROM pairs p
                       JOIN sel{i - 1} s ON p.ib = s.vec_id
                       WHERE p.ia = c.vec_id
                   ) AS BIGINT) AS mmr_e6
            FROM cand c
            WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
            ORDER BY mmr_e6 DESC, c.vec_id ASC LIMIT 1
        ),
        sel{i} AS (SELECT vec_id FROM sel{i - 1}
                   UNION ALL SELECT vec_id FROM s{i})""")
        prev_sel = f"sel{i}"
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, rel_e6, mmr_e6 FROM s{i}"
        for i in range(1, n_select + 1)
    )
    rel_q = q6.format(a="e.v", b="q.qv")
    pair_q = q6.format(a="x.v", b="y.v")
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        cand AS (
            SELECT e.vec_id, {rel_q} AS rel_e6, e.v
            FROM e CROSS JOIN q WHERE e.vec_id <> 0
            ORDER BY rel_e6 DESC, e.vec_id ASC LIMIT 20
        ),
        pairs AS (
            SELECT x.vec_id AS ia, y.vec_id AS ib, {pair_q} AS sim_e6
            FROM cand x JOIN cand y ON x.vec_id <> y.vec_id
        ),
        {",".join(rounds)}
        {finals}
    """


__all__ = [
    '_BM25_K1',
    '_BM25_B',
    'ensure_conf',
    'session_conf',
    'stream_conf',
    'pin_plan',
    '_scratch_path',
    '_scratch_dir',
    '_write_ordered_feed',
    'table',
    'events_features',
    '_US',
    'STOPWORDS',
    '_EV',
    '_DECAY_HOURS',
    '_DECAY_MICRO',
    '_7D_US',
    '_cosine',
    '_30MIN_US',
    '_EVENT_TYPES',
    '_BM25_TERMS',
    'build_bucketed_join',
    '_NDCG_DISC_E6',
    '_cents_features',
    '_F15_SQL',
    '_lsh_bucket_sql',
    '_LSH4_BUCKET',
    '_M3_RAW',
    '_M3_NORM_SUM',
    '_MH_MINS',
    '_MH_BANDS',
    '_mh_ctes',
    '_MH_CTES',
    '_SH_ONES',
    '_SH_SIG',
    '_x8_sql',
    '_rag2_sql',
    '_g2_sql',
    '_x14_sql',
    '_x17_sql',
    '_vidx_ivf_sql',
    '_vidx_ivf_fit_ctes',
    '_vidx_int_dist',
    '_vidx_batch_sql',
    '_vidx_lsh_sql',
    '_vidx_pq_batch_sql',
    '_vidx_ivfpq_sql',
    '_vidx_ivfpq_batch_sql',
    '_vidx_reencode_sql',
    '_vidx_sq_sql',
    '_vidx_pq_refine_sql',
    '_x21_round',
    '_FEATS_CENTS',
    '_F24_CHK',
    '_fh_oracle_elem',
    '_TOKS_CTE',
    '_A17_QCOLS',
    '_A17_AGGS',
    '_A17_ARMS',
    '_g4_sql',
    '_bt1_sql',
    '_rag3_sql',
]
