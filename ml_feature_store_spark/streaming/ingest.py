"""Structured Streaming feature ingest.

The reference is batch-only ("Streaming features: No", reference
README.md:108; late data = "recompute next batch", README.md:142). Here the
same feature definitions run continuously:

* :func:`stream_events` — file-source stream over the events parquet
  (stands in for Kafka; swap ``readStream.format``).
* :func:`streaming_feature_agg` — watermarked tumbling/sliding window
  aggregation; late rows beyond the watermark are dropped by Spark's state
  store instead of corrupting completed windows.
* :func:`streaming_sessionize` — ``session_window`` gap sessions, the
  streaming twin of operators/sessionize.py.
* :func:`streaming_register` — foreachBatch upsert: every micro-batch
  computes latest-per-entity and registers the running snapshot into a
  FeatureStore table, turning the PIT store into a continuously-updated
  online view.

Batch equivalence: each streaming agg has the same logical plan as its
batch twin in suite.py (w1_tumbling_window, x7_sessionize), which is what
the DuckDB oracle checks — the streaming tests assert stream(availableNow)
== batch on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# Streams cannot infer schemas; both testdata vintages are supported:
# parquet TIMESTAMP(NANOS) read as long (ns->us floor conversion applied,
# same as the batch loader) and plain us TIMESTAMP read as-is.
EVENTS_SCHEMA = _events_schema(LongType())
EVENTS_SCHEMA_US = _events_schema(TimestampType())


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of events, normalized to a us ``ts`` timestamp.

    A one-off batch peek at the directory's footer picks the schema (file
    streams must declare one up front); the ns-long vintage gets the same
    floor division the batch loader applies. An empty/not-yet-populated
    source directory falls back to the us-timestamp schema so the stream
    can start before the first file lands (files arriving later with the
    ns vintage need a restart — schema is fixed at stream start by
    design)."""
    try:
        ns_vintage = dict(spark.read.parquet(events_dir).dtypes).get("ts") == "bigint"
    except Exception:
        ns_vintage = False
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA if ns_vintage else EVENTS_SCHEMA_US)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    if ns_vintage:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def streaming_feature_agg(
    events: DataFrame,
    window_duration: str = "1 day",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation per (window, event_type)."""
    win = F.window("ts", window_duration, slide) if slide else F.window("ts", window_duration)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation with ``session_window`` — state is
    per (user, open session); the watermark bounds state size."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    band: str = "INTERVAL 2 HOURS",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: purchases within ``band`` AFTER a
    view by the same user (the streaming twin of the batch
    r2_interval_join / r3_interval_left_join queries in suite.py).

    Both sides are watermarked and the join carries an explicit time-band
    condition — that is what lets Spark BOUND the join state: a buffered
    view row can be evicted once the right-side watermark passes
    ``view.ts + band``, so state is O(rate x band), not O(stream). At
    cluster scale both streams shuffle on user_id once; the band
    predicate rides the equi join as a residual, exactly like the batch
    plan.

    ``how="left_outer"`` adds the abandonment lane: a view with NO
    purchase in its band is emitted null-padded — but only once the
    watermark proves the band empty (eviction time), so null rows trail
    real time by ``band + watermark``. That delay is the semantic price
    of a correct streaming outer join; the batch twin
    (r3_interval_left_join) emits the same rows with no delay."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    views = (
        left.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    buys = (
        right.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("b_ts", watermark)
    )
    j = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr(band)),
        how,
    )
    return j.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "buy_id",
        F.unix_micros("v_ts").alias("view_us"),
        F.unix_micros("b_ts").alias("buy_us"),
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Exactly-once ingestion on top of at-least-once delivery: drop
    duplicate key arrivals with ``dropDuplicatesWithinWatermark``.

    State is keyed on ``keys`` (default ``event_id``) and bounded by the
    watermark: a key's dedup entry is evicted once the watermark passes
    its event time + interval, so state is O(rate x watermark window),
    not O(stream history) — the property that makes streaming dedup
    viable on an unbounded 100 TB/day feed. Within the window the first
    arrival wins; replays and redeliveries are filtered before any
    downstream agg sees them."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def streaming_register(
    events: DataFrame,
    store,
    table_name: str,
    checkpoint_dir: str,
    mode: str = "snapshot",
    idempotent: bool = True,
    feature_select=None,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """foreachBatch upsert: per micro-batch, fold the batch into the
    feature table as a new version.

    ``feature_select`` optionally maps a raw micro-batch to the
    feature-table shape (default: the events feed's
    user_id/ts/event_type/value mapping). COMPOSITE-key tables work in
    both modes: ``append`` composes the tuple key inside ``store.append``;
    ``snapshot`` composes before the latest-per-entity argmax and
    re-registers the struct-keyed snapshot directly (the struct key is
    self-describing, so the re-register preserves the key with no
    entity_cols round-trip). The table must be seeded with an initial
    ``register(..., entity_cols=...)`` before streaming into it —
    streaming cannot guess a tuple key from a first batch.

    ``mode="snapshot"`` (default): each version holds latest-per-entity of
    everything seen so far — a continuously-updated online view; PIT
    ``get`` sees only the latest value per entity.

    ``mode="append"``: each micro-batch is ``store.append``-ed verbatim,
    so the table keeps FULL event history and PIT lookups / as-of training
    joins over the streamed table carry exact batch semantics at any
    cutoff. This is the production shape: the stream writes history, the
    online view is materialized separately (``materialize_online``).

    Either way the streaming->PIT bridge makes the version history a
    sequence of consistent snapshots.

    ``idempotent=True`` (default) makes the sink EXACTLY-ONCE under
    micro-batch replay: foreachBatch re-delivers a batch when the job
    dies between the sink commit and the checkpoint write, which would
    double-append history. Each committed version records its
    ``stream batch <id>`` marker in the version metadata, whose save is
    the store's atomic commit point (data parquet lands first; a crash
    before the meta save leaves the version invisible and the rerun
    overwrites it) — so "marker present" == "batch fully applied", and
    the replayed batch is skipped. Assumes one writer per table and a
    version-retention window at least as deep as the replay window (a
    replay only ever re-delivers the most recent batches).
    """
    from ..operators.pit import latest_per_entity

    if mode not in ("snapshot", "append"):
        raise ValueError(f"mode must be 'snapshot' or 'append', got {mode!r}")

    def batch_already_applied(batch_id: int) -> bool:
        if not store._backend.exists(table_name):
            return False
        marker = f"stream batch {batch_id}"
        return any(
            rec.description == marker
            for rec in store._backend.meta(table_name).versions.values()
        )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if idempotent and batch_already_applied(batch_id):
            return
        if feature_select is not None:
            feats = feature_select(batch_df)
        else:
            feats = batch_df.select(
                F.col("user_id").alias("entity_id"),
                F.col("ts").alias("timestamp"),
                "event_type",
                "value",
            )
        if mode == "append":
            # append composes composite keys itself from the stored schema
            store.append(table_name, feats, description=f"stream batch {batch_id}")
            return
        exists = store._backend.exists(table_name)
        key_cols = (
            store._entity_key_cols(store._current(table_name)) if exists else None
        )
        if key_cols:
            feats = store._compose_entity_key(
                feats, key_cols, f"streaming_register('{table_name}')"
            )
        if exists:
            current = store._current(table_name).select(*feats.columns)
            feats = current.unionByName(feats)
        snapshot = latest_per_entity(feats)
        # a struct-keyed snapshot re-registers as composite directly: the
        # key self-describes from the schema, no entity_cols needed
        store.register(table_name, snapshot, description=f"stream batch {batch_id}")

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment: join a live event stream against a static
    (batch) dimension/feature snapshot — the serving-side pattern for
    attaching slowly-changing features to events in flight.

    Spark re-plans the static side EVERY micro-batch, so swapping the
    snapshot under the same path picks up new features without restarting
    the query; with ``broadcast_dim`` (the default — right for dims that
    fit the driver) the per-batch join is map-side, no stream shuffle.
    Pass ``broadcast_dim=False`` for a large dimension table to avoid
    force-broadcasting it (same escape hatch as pagerank's
    ``broadcast_ranks``). State: none — stream-static inner joins are
    stateless, unlike stream-stream.
    """
    return stream.join(F.broadcast(dim) if broadcast_dim else dim, key)


def stream_pit_enrich(
    stream: DataFrame,
    features: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    entity_col: str = "entity_id",
    ts_col: str = "timestamp",
    how: str = "inner",
    strategy: str = "union",
):
    """POINT-IN-TIME streaming enrichment: each micro-batch of spine rows
    is as-of joined (operators/asof.py — latest ``feature.ts <=
    spine.ts`` per entity) against the offline feature table, and the
    enriched rows land in an idempotent per-batch parquet sink. This is
    the Tecton/Feast "streaming training data" shape: labels/requests
    arrive as a stream, the PIT-correct feature vector is attached IN
    FLIGHT, and the output is ready for training without a later batch
    backfill.

    Equi-key stream-static joins are stateless and built in (sd8's
    ``stream_static_enrich``); the PIT variant is NOT streaming-
    expressible (the per-row inequality argmax needs a window over the
    static side), so it runs as ``foreachBatch`` — the documented escape
    hatch for batch-only semantics per micro-batch. Correctness does not
    depend on how the stream is micro-batched: each spine row's match is
    a pure function of (row, static features), so any batch split unions
    to the same result as one batch join (the sd15 witness pins stream
    == batch bit-for-bit).

    Exactly-once: foreachBatch is at-least-once on retry, so each batch
    OVERWRITES its own ``batch_id=<n>`` subdirectory — a replayed batch
    rewrites the same rows instead of appending duplicates (same
    idempotence contract as sd9's upsert / io18's committer).

    Scale (100 TB): per micro-batch cost is one as-of join of |batch|
    spine rows against the feature table — with the default union
    strategy that re-shuffles features every batch (right for a witness;
    wrong for a hot loop). For production rates, pass
    ``strategy="union_bucketed"`` so the features side is pre-bucketed
    on the entity key and each micro-batch only shuffles its own rows,
    or pre-filter features to the stream's entity universe.
    """
    from ..operators.asof import asof_join

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            features,
            entity_col=entity_col,
            ts_col=ts_col,
            strategy=strategy,
            keep_spine_ts=True,
            how=how,
        )
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_index_enrich(
    stream: DataFrame,
    store,
    index: str,
    sink_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
    exclude_self: bool = False,
    refresh: str = "strict",
    filter_expr: str | None = None,
    nprobe: int | None = None,
    refine: int | None = None,
    drift_threshold: float | None = None,
    max_fragments: int = 16,
):
    """Streaming ANN enrichment through a PERSISTED vector index: each
    micro-batch of query vectors resolves via ``store.knn_batch`` —
    map-only probes from the stored model, an equi join against the
    encoded state table on the probe key, a per-query top-k — and the
    neighbor lists land in an idempotent per-batch parquet sink. The
    retrieval sibling of :func:`stream_pit_enrich`: requests stream in,
    the nearest-neighbor context attaches IN FLIGHT (the RAG / online
    candidate-generation shape), and nothing refits or re-encodes per
    batch.

    Per-row output is a pure function of (query row, stored index), so
    the result is micro-batch-split invariant — stream == batch
    bit-for-bit (the sd15 contract; the sd18 witness pins it against
    the vidx5 batch oracle). The stored index also carries its
    staleness guard into the hot loop: if the source table changes
    mid-stream, the NEXT batch's knn_batch refuses loudly rather than
    serving a half-covering index.

    Exactly-once: foreachBatch is at-least-once on retry, so each batch
    OVERWRITES its own ``batch_id=<n>`` subdirectory (sd9/io18's
    idempotence contract).

    ``refresh`` (round-11; r10 verdict next-round #4 — the production
    maintenance loop wants refresh-then-continue, not a mid-stream
    crash):

    * ``"strict"`` (default) — inherit knn_batch's staleness refusal:
      if the source table changes mid-stream, the NEXT batch raises.
    * ``"auto"`` — before each micro-batch, probe the index's staleness
      (metadata-only) and fold appended source rows through
      ``refresh_vector_index`` (O(delta), FROZEN model — neighbor
      rankings for old vectors never change, so stream output still
      equals the batch replay over the final index). History REWRITES
      still refuse (refresh_vector_index's rewrite guard): a frozen
      model must not silently pretend to cover re-registered vectors.

    ``filter_expr`` / ``nprobe`` / ``refine`` pass straight through to
    ``knn_batch`` (round-11 serving knobs) — per-row output stays a pure
    function of (query row, stored index, knobs), so the stream==batch
    invariant holds for every combination.

    ``drift_threshold`` (round-12; r11 verdict next-round #2) — the
    rebuild-policy REFUSAL on the auto path: before folding a stale
    batch, ``store.vector_index_drift_stat`` compares the build-time
    cell-occupancy histogram against what the index would serve AFTER
    the fold (pending delta included, encoded map-only against the
    frozen model); PSI above the threshold raises instead of
    refreshing — auto-refresh must not keep folding into a model the
    data has left behind (recall decays silently; only a re-train
    fixes a moved distribution). ``None`` (default) keeps the
    unconditional r11 fold behavior. Only meaningful with
    ``refresh='auto'``.

    ``max_fragments`` (round-12) — auto-refresh appends one delta-only
    state FRAGMENT per fold (append-mode refresh), so a long-lived
    stream would grow the serving union without bound; when the chain
    reaches this length the fold is followed by
    ``compact_vector_index`` (serving-invariant, publish-then-prune) —
    the stream is its own maintenance job. Only meaningful with
    ``refresh='auto'``.

    Scale (100 TB): per-batch cost is |batch| x nprobe probe rows
    joined against only the probed cells/buckets of the encoded table —
    partition the state table by the probe key and each micro-batch
    touches a sliver of it; the model itself is literals, shipped once
    per plan, never per row; an auto-refresh adds one map-only encode
    of the delta."""
    if refresh not in ("strict", "auto"):
        raise ValueError(
            f"stream_index_enrich: refresh must be 'strict' or 'auto', "
            f"got {refresh!r}."
        )

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        if refresh == "auto" and store.vector_index_stale(index):
            if drift_threshold is not None:
                stat = store.vector_index_drift_stat(
                    index, threshold=drift_threshold
                )
                if stat["recommend_rebuild"]:
                    from ..errors import FeatureStoreError

                    raise FeatureStoreError(
                        f"stream_index_enrich('{index}'): occupancy "
                        f"drift PSI {stat['psi']:.4f} exceeds the "
                        f"rebuild threshold {drift_threshold} — "
                        f"refusing to auto-refresh a frozen model the "
                        f"data has left behind; re-train with "
                        f"create_vector_index()."
                    )
            store.refresh_vector_index(index)
            if (
                store.get_vector_index_info(index)["n_fragments"]
                >= max_fragments
            ):
                store.compact_vector_index(index)
        out = store.knn_batch(
            index,
            batch_df,
            k=k,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            exclude_self=exclude_self,
            filter_expr=filter_expr,
            nprobe=nprobe,
            refine=refine,
        )
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_enrich(
    stream: DataFrame,
    store,
    index: str,
    sink_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    content_col: str | None = None,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    refresh: str = "strict",
    max_fragments: int = 16,
):
    """Streaming ingest dedup THROUGH the persisted signature index
    (round-12) — the dedup twin of :func:`stream_index_enrich`:
    documents stream in, each micro-batch resolves its dedup manifest
    via ``store.dedup_batch`` (batch signed with the FROZEN family,
    16-byte-hash exact arm, band buckets equi-joined against buckets
    derived map-only from the STORED signatures — the corpus is never
    re-signed, never self-joined), and the per-doc manifests land in an
    idempotent per-batch parquet sink. This is the nightly-crawl hot
    loop made continuous: admit / quarantine decisions per document, at
    the cost of one serving join per batch.

    Per-row output is a pure function of (document, stored index), so
    the result is micro-batch-split invariant — stream == batch
    bit-for-bit (the sd15/sd18 contract; the sd20 lane pins it against
    x34's oracle).

    ``refresh``:

    * ``"strict"`` (default) — inherit dedup_batch's staleness refusal:
      if the corpus table changes mid-stream, the NEXT batch raises.
    * ``"auto"`` — before each micro-batch, probe staleness
      (metadata-only) and fold appended corpus rows through
      ``refresh_dedup_index`` (O(delta) signing, frozen family — old
      signatures never change, so stream output still equals the batch
      replay over the final index). History REWRITES still refuse.

    ``max_bucket_size`` passes through (the hot-bucket boilerplate cap
    — SKEW.md); exactly-once via per-batch overwrite (sd9/io18).
    ``max_fragments``: each auto fold appends a delta-only signature
    fragment — at this chain length the fold compacts
    (``compact_dedup_index``, serving-invariant), so a long-lived
    stream bounds its own state layout.

    Scale (100 TB): per-batch cost is signing the BATCH (explode +
    partial agg) + the bucket equi join against ~200 B/doc of stored
    signatures + the candidate-bounded verify — corpus size prices the
    join's build side once, not per batch; an auto-refresh adds one
    O(delta) sign."""
    if refresh not in ("strict", "auto"):
        raise ValueError(
            f"stream_dedup_enrich: refresh must be 'strict' or 'auto', "
            f"got {refresh!r}."
        )

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        if refresh == "auto" and store.dedup_index_stale(index):
            store.refresh_dedup_index(index)
            if (
                store.get_dedup_index_info(index)["n_fragments"]
                >= max_fragments
            ):
                store.compact_dedup_index(index)
        out = store.dedup_batch(
            index,
            batch_df,
            id_col=id_col,
            content_col=content_col,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
        )
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_probe_score(
    stream: DataFrame,
    weights,
    feature_cols,
    sink_dir: str,
    checkpoint_dir: str,
    min_p: int | None = None,
):
    """Continuous corpus filtering at ingest — the streaming twin of
    the cls1 linear probe (round-12): score every arriving document
    with FROZEN trained weights (operators/classifier.probe_score — a
    pure integer projection, the weights ride the streaming plan as
    literals) and land (row, p, pred) in an append-mode parquet sink.
    Scoring is STATELESS, so unlike the foreachBatch enrich loops this
    is a straight streaming transformation: no state store, no
    per-batch join, exactly-once from the file-sink commit log; at
    100 TB/day of ingest the cost is the scan itself — the filter adds
    a codegen'd projection, nothing else.

    ``min_p``: when set, rows below the threshold are dropped in-stream
    (the admit gate — the DCLM-style quality filter applied before the
    corpus ever lands); when None, everything lands with its score and
    the decision stays downstream. Per-row output is a pure function of
    (row, weights), so stream == batch bit-for-bit (the sd21 lane pins
    it against the unrolled-GD oracle)."""
    from ..operators.classifier import probe_score

    scored = probe_score(stream, weights, feature_cols)
    if min_p is not None:
        scored = scored.filter(F.col("p") >= int(min_p))
    return (
        scored.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_contract_gate(
    stream: DataFrame,
    checks: dict[str, str],
    good_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
):
    """Streaming DATA CONTRACT gate with a dead-letter queue: each
    micro-batch is split row-wise against ``checks`` (name -> SQL bool
    expr, f33's register-time contract surface applied IN FLIGHT) —
    passing rows land in ``good_dir``, violating rows in
    ``quarantine_dir`` with a ``failed_checks`` array naming every
    violated check (the triage key a reprocessing job routes on). A
    NULL check result counts as a violation (three-valued logic must
    not wave rows through — same rule as register(checks=)).

    The split is ONE map-side projection (no shuffle): the row's
    failed-check array is computed once, then two filtered writes fan
    out from the cached micro-batch. Both sinks overwrite their own
    ``batch_id=<n>`` subdir, so a replayed batch is idempotent (the
    sd15/io18 contract). At 100 TB rates the gate adds zero exchanges
    to ingest — quarantine cost is proportional to the violation rate,
    and the good path stays whole-stage-codegen.
    """
    failed = F.filter(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(sql), F.lit(False)), F.lit(name)
                ).otherwise(F.lit(None))
                for name, sql in checks.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("failed_checks", failed).persist()
        try:
            tagged.filter(F.size("failed_checks") == 0).drop(
                "failed_checks"
            ).write.mode("overwrite").parquet(f"{good_dir}/batch_id={batch_id}")
            tagged.filter(F.size("failed_checks") > 0).write.mode(
                "overwrite"
            ).parquet(f"{quarantine_dir}/batch_id={batch_id}")
        finally:
            tagged.unpersist()

    return (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
