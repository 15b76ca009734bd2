"""IO-family witnesses: source/sink roundtrips, layout, pruning and custom
Python Data Source connectors.

Split from suite_rel.py (round 6 hygiene); assembled by suite.py."""

from __future__ import annotations

import math  # noqa: F401
import tempfile  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .suite_common import *  # noqa: F401,F403


def q_io1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format coverage: project events, write CSV with a header,
    read it back with an explicit schema, aggregate. Proves the non-parquet
    I/O path end-to-end; the oracle sees only the logical result."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("value").cast("double").alias("value")
    )
    d = _scratch_dir("io1_csv", sf_dir)
    ev.write.mode("overwrite").option("header", "true").csv(d)
    back = (
        spark.read.option("header", "true")
        .schema("event_id long, user_id long, event_type string, value double")
        .csv(d)
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def q_io2_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source/sink coverage: write a projection as JSON lines, read it
    back with an explicit schema, aggregate. The props column round-trips
    as a raw JSON string and is re-parsed with get_json_object."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "props")
    d = _scratch_dir("io2_json", sf_dir)
    ev.write.mode("overwrite").json(d)
    back = (
        spark.read.schema("event_id long, user_id long, event_type string, props string")
        .json(d)
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("event_id").alias("min_event_id"),
    )


def q_io3_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source roundtrip (columnar alternative to parquet): project
    lineitem, write ORC, read back, aggregate. Predicate pushdown and
    column pruning work on the ORC reader the same as parquet."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    d = _scratch_dir("io3_orc", sf_dir)
    li.write.mode("overwrite").orc(d)
    back = spark.read.orc(d).filter(F.col("l_quantity") >= 25)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_io4_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source/sink: write document bodies as line-oriented text
    files, read them back with spark.read.text, re-derive stats. The
    documents corpus is newline-free so lines == documents; proves the
    fourth non-parquet format end-to-end (CSV/JSON/ORC are io1-io3)."""
    docs = table(spark, sf_dir, "documents")
    d = _scratch_dir("io4_text", sf_dir)
    docs.select("text").write.mode("overwrite").text(d)
    back = spark.read.text(d)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.sum(F.size(F.split("value", " ")).cast("long")).alias("total_tokens"),
        F.min(F.length("value")).cast("long").alias("min_len"),
        F.max(F.length("value")).cast("long").alias("max_len"),
    )


def q_io5_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning — the data-layout
    primitive that makes 100 TB scans affordable. Events are written
    ``partitionBy(event_type)`` (directory-per-value); the read back with
    an event_type predicate lists ONLY that directory — pruning happens at
    file listing, before any parquet footer is opened. Plan-gated: the
    scan shows ``PartitionFilters: [... (event_type = purchase)]`` and the
    predicate never appears as a data filter. Mirrors the store's
    date-partition layout (sources/registry.py:174, store.py get())."""
    ev = table(spark, sf_dir, "events")
    d = _scratch_dir("io5_part", sf_dir)
    ev.select("event_id", "ts", "user_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(d)
    back = spark.read.parquet(d).filter(F.col("event_type") == "purchase")
    return back.groupBy(_US(F.date_trunc("day", "ts")).alias("day_us")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_io6_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches — the mid-stream producer
    upgrade case: batch 1 lacks the ``discount_pct`` column batch 2 adds.
    ``mergeSchema=true`` unions the footers (schema-on-read, no rewrite
    of old files), old rows surface NULL, and the aggregate coalesces a
    default. At 100 TB this is why you never rewrite history for an
    additive schema change; per-file pruning and pushdown still work on
    the shared columns."""
    li = table(spark, sf_dir, "lineitem")
    d = _scratch_dir("io6_evo", sf_dir)
    li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).write.mode("overwrite").parquet(f"{d}/b1")
    li.filter(F.col("l_orderkey") % 2 == 1).select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        F.round(F.col("l_discount") * 100, 2).alias("discount_pct"),
    ).write.mode("overwrite").parquet(f"{d}/b2")
    back = spark.read.option("mergeSchema", "true").parquet(f"{d}/b1", f"{d}/b2")
    return back.groupBy((F.col("l_orderkey") % 10).alias("bucket")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("discount_pct").isNull(), 1).otherwise(0)).alias(
            "n_legacy_rows"
        ),
        F.round(F.sum(F.coalesce("discount_pct", F.lit(0.0))), 2).alias(
            "sum_discount_pct"
        ),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q_io7_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record ingest accounting: a CSV feed where every row
    whose event_id % 97 == 0 is corrupted (non-numeric id). PERMISSIVE
    mode parses what it can, routes the rest to _corrupt_record, and the
    aggregate reports good/corrupt counts plus sums over the clean rows —
    the quarantine pattern every 100 TB ingest needs (fail-fast mode
    would abort the whole feed for one bad producer)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    # corrupt deterministically: event_id -> 'bad<id>' (unparseable long)
    lines = ev.select(
        F.concat_ws(
            ",",
            F.when(F.col("event_id") % 97 == 0, F.concat(F.lit("bad"), "event_id"))
            .otherwise(F.col("event_id").cast("string")),
            F.col("user_id").cast("string"),
            F.round(F.col("value"), 2).cast("string"),
        ).alias("value")
    )
    d = _scratch_dir("io7_badcsv", sf_dir)
    lines.coalesce(4).write.mode("overwrite").text(d)
    back = (
        spark.read.schema(
            "event_id long, user_id long, value double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(d)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(F.col("event_id").isNotNull().cast("long")).alias("n_good"),
        F.round(F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("value"))), 2).alias(
            "sum_good_value"
        ),
    )


def q_io10_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) multi-dimensional clustering — the layout
    answer when ONE partition column isn't enough (io5 prunes on a
    single dim; real feature scans filter on entity AND time). The
    16-bit interleave of (user_id, day index) is pure JVM bit math;
    repartitionByRange + sortWithinPartitions on the z-value co-locates
    rows close in BOTH dims into the same files, so parquet row-group
    min/max stats on the ORIGINAL columns skip most files for a 2-D
    predicate — Delta/Iceberg OPTIMIZE ZORDER does exactly this. The
    z-value is a write-time ordering key only (never stored); the read
    back applies the 2-D predicate and aggregates, which the oracle
    recomputes from the source table. tests/test_plans.py gates that
    both predicates are PUSHED to the scan and that per-file day spans
    are actually narrow (the clustering, not just the roundtrip)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    z = (
        ev.withColumn("ux", (F.col("user_id") % 65536).cast("long"))
        .withColumn(
            "dy",
            (F.expr("unix_micros(date_trunc('day', ts)) div 86400000000L") % 65536).cast(
                "long"
            ),
        )
        .withColumn(
            "z",
            F.expr(
                "aggregate(sequence(0, 15), 0L, (acc, i) -> acc"
                " + shiftleft(CAST(shiftright(ux, i) % 2 AS BIGINT), 2 * i)"
                " + shiftleft(CAST(shiftright(dy, i) % 2 AS BIGINT), 2 * i + 1))"
            ),
        )
    )
    d = _scratch_dir("io10_zorder", sf_dir)
    z.repartitionByRange(16, "z").sortWithinPartitions("z").drop(
        "ux", "dy", "z"
    ).write.mode("overwrite").parquet(d)
    back = spark.read.parquet(d).filter(
        (F.col("user_id").between(4, 11))
        & (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    )
    return back.agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_cents"
        ),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def q_io11_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file multimodal ingestion via the built-in ``binaryFile``
    source — the step that brings image/audio/document FILES into the
    engine as (path, length, content-bytes) rows before any decode
    kernel runs (multimodal/columns.py consumes exactly this shape).
    The witness writes one file per document (text write partitioned by
    doc_id), reads the directory back with binaryFile +
    recursiveFileLookup + a glob that skips _SUCCESS markers, parses the
    id from the partition path, and reports per-doc file count, byte
    size and content md5 — all replayable by the oracle because the file
    bytes are exactly utf8(text) + a trailing newline. At 100 TB this
    source lists and reads millions of objects with normal Spark
    parallelism; the decode stays in the downstream Arrow kernel, and
    tiny-file overhead is the documented reason production pipelines
    compact raw files into parquet payload columns (m1-m6) after ONE
    binaryFile pass."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d = _scratch_dir("io11_binfiles", sf_dir)
    (
        docs.select(F.col("doc_id"), F.col("text"))
        .repartition("doc_id")
        .write.mode("overwrite")
        .partitionBy("doc_id")
        .text(d)
    )
    back = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "false")
        .option("pathGlobFilter", "*.txt")
        .load(d)
    )
    return (
        back.select(
            F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("long").alias("doc_id"),
            F.length("content").alias("file_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("file_bytes").cast("long").alias("file_bytes"),
            F.min("content_md5").alias("content_md5"),
        )
        .orderBy("doc_id")
    )


def q_io12_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-feed ingestion: CSV written with gzip, read back
    transparently by codec extension — the wire format most external
    data drops arrive in. The 100 TB lesson this witness encodes: gzip
    is NOT SPLITTABLE — a .gz file can never be divided across tasks
    (tiny files still PACK together under maxPartitionBytes, but a
    single 100 GB .gz is one task reading 100 GB), so the first thing a
    real pipeline does after a gzip read is repartition (or re-land as
    parquet/zstd) so downstream stages parallelize. Output:
    per-event_type row accounting + integer checksums proving the
    lossless roundtrip through the codec."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    d = _scratch_dir("io12_gz", sf_dir)
    lines = ev.select(
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("cents").cast("string"),
        ).alias("value")
    )
    lines.coalesce(4).write.mode("overwrite").option("compression", "gzip").text(d)
    back = spark.read.schema(
        "event_id long, user_id long, event_type string, cents long"
    ).csv(d)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("event_id").cast("long").alias("sum_ids"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


def q_io13_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline ``VALUES`` relation as a first-class source (the last
    unwitnessed source form after parquet/CSV/JSON/ORC/text/binaryFile/
    gzip): a literal 3-row quantity-tier table declared in the query
    text itself — the idiom for small config/bracket dims that live in
    code, not storage (reference analog: the literal entity lists fed to
    ``get`` at store.py:218). The tier table is a LocalRelation, so
    Catalyst constant-folds it and the non-equi bracket join runs as a
    BroadcastNestedLoopJoin over 3 rows — map-side, no shuffle, no scan;
    at 100 TB the fact side streams through unchanged. Brackets are
    half-open [lo, hi) so every quantity lands in exactly one tier."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("io13_lineitem")
    return spark.sql(
        """
        SELECT t.tier,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM io13_lineitem l
        JOIN VALUES ('low', 0, 10), ('mid', 10, 25), ('high', 25, 1000)
             AS t(tier, lo, hi)
          ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
        GROUP BY t.tier
        ORDER BY t.tier
        """
    )


def q_io14_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Python Data Source API — Spark 4's
    answer for feeds with no built-in reader (sources/pyds.py:
    partition-planned, executor-side readers, planner-driven
    pushFilters partition pruning). The witness reads the deterministic
    synthetic feed (8 partitions x 2000 rows, pure integer formulas of
    the global index) and rolls up per key; because the generator is
    formula-defined, DuckDB replays it as range() algebra and the
    value-hash gate proves the connector path loses nothing. The
    pruning lane is pinned separately in tests (an EqualTo on `part`
    drops 7 of 8 partitions before any task is scheduled)."""
    from .sources.pyds import SyntheticFeedDataSource

    # Runtime-settable SQL conf: the reader implements pushFilters(), and
    # Spark 4 refuses to EXECUTE such a source unless the pushdown conf is
    # on — checked in the Python planning worker at action time, after
    # this function returns, so it cannot be query-scoped-and-restored.
    # It lives in the suite's uniform session contract instead
    # (ensure_conf — set identically before every query, order-free).
    ensure_conf(spark)
    spark.dataSource.register(SyntheticFeedDataSource)
    df = (
        spark.read.format("synthetic_feed")
        .option("partitions", 8)
        .option("rowsperpartition", 2000)
        .load()
    )
    return df.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("amount_cents").cast("long").alias("sum_cents"),
        F.min("i").cast("long").alias("first_i"),
        F.max("i").cast("long").alias("last_i"),
    )


def q_io15_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source/sink (built into Spark 4 — the former spark-xml
    package): write an event projection as <events><event>...</event>
    rows, read it back with an explicit schema + rowTag, and aggregate
    with integer checksums proving the lossless roundtrip — the last
    text wire format after CSV/JSON/ORC/text/binaryFile/gzip. Values
    ride as cents BIGINTs so float formatting can't leak into the
    comparison. Scale note: like JSON lines, XML files split per FILE
    (a row can't span files but one huge file parses as a stream);
    land-as-parquet after one pass remains the steady-state answer."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    d = _scratch_dir("io15_xml", sf_dir)
    (
        ev.write.mode("overwrite")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .format("xml")
        .save(d)
    )
    back = (
        spark.read.schema(
            "event_id long, user_id long, event_type string, cents long"
        )
        .option("rowTag", "event")
        .format("xml")
        .load(d)
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("event_id").cast("long").alias("min_event_id"),
        F.max("user_id").cast("long").alias("max_user"),
    )


def q_io16_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (``partitionOverwriteMode=dynamic``) —
    THE idempotent-backfill primitive for partitioned lakes: rewriting
    one recomputed partition must replace exactly the partitions the
    incoming frame contains and leave every other partition's files
    untouched (static mode — the default — would truncate the whole
    table root first; the witness would collapse to the click rows
    only and the hash gate would catch it). Lane: land events
    partitioned by event_type, recompute the 'click' partition with
    corrected (doubled) cents, dynamic-overwrite it, read the table
    back. At 100 TB this is the daily-reprocess pattern: the overwrite
    job's cost is the recomputed partition's size, not the table's,
    and concurrent readers of other partitions never see missing
    files. Oracle replays the final state arithmetically (clicks
    doubled, rest intact)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    d = _scratch_dir("io16_dynovr", sf_dir)
    ev.write.mode("overwrite").partitionBy("event_type").parquet(d)
    fixed = ev.filter(F.col("event_type") == "click").withColumn(
        "cents", F.col("cents") * 2
    )
    (
        fixed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(d)
    )
    back = spark.read.parquet(d)
    return back.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def q_io17_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hostile-CSV roundtrip: fields containing embedded NEWLINES, the
    delimiter, and the quote character itself — the shape that silently
    corrupts naive line-split ingestion (every web-scraped CSV has it).
    Each doc's text gets newlines injected plus a quoted/comma-laden
    wrapper; the write quotes RFC-4180-style (escape = quote) and the
    read runs ``multiLine=true`` with the matching options; per-source
    checksums (chars, newline count, id-weighted digest) prove the
    parse loses nothing — the oracle recomputes them from the raw
    columns, never touching CSV. THE SCALE CLIFF, named: multiLine=true
    makes a CSV file UNSPLITTABLE (a record may span any line, so one
    task parses each whole file — io12's gzip cliff in text form);
    production either guarantees newline-free fields (then the default
    line-splittable reader is safe) or lands multiline feeds as
    parquet in one pass. The witness writes per-source files so even
    the unsplittable parse keeps task-level parallelism."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.lit('say "'),
            F.regexp_replace(F.col("text"), " the ", "\n"),
            F.lit('", okay'),
        ).alias("body"),
    )
    d = _scratch_dir("io17_csvml", sf_dir)
    (
        docs.repartition("source")
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .partitionBy("source")
        .csv(d)
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema("doc_id long, body string, source string")
        .csv(d)
    )
    nl = F.size(F.split(F.col("body"), "\n", -1)) - 1
    return back.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("body")).cast("long").alias("sum_chars"),
        F.sum(nl).cast("long").alias("sum_newlines"),
        F.sum(F.col("doc_id") * F.length("body")).cast("long").alias("digest"),
    )


def q_io18_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom EGRESS connector via the Python Data Source writer API
    (sources/pyds.py JsonLinesSinkDataSource) — io14's other half: when
    the destination has no built-in sink (vendor API, internal index),
    the Python writer still gets the real exactly-once discipline:
    per-task executor-side staging, driver-side commit() that promotes
    ONLY the files named in task commit messages (retried/speculative
    attempts stage dead files that are never promoted — pinned by
    pytest), atomic _SUCCESS manifest, abort() cleanup. The witness
    pushes an orders projection through the connector, reads the
    committed JSON back, and rolls it up; the oracle computes the same
    rollup from the table directly — byte-loss or double-commit breaks
    the hash. Scale: parallelism = task count (one staged file each);
    commit is O(#tasks) renames on the driver, the same shape as the
    parquet committer."""
    from .sources.pyds import JsonLinesSinkDataSource

    spark.dataSource.register(JsonLinesSinkDataSource)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    d = _scratch_dir("io18_pyds_w", sf_dir) + "/out"
    (
        o.repartition(8)
        .write.format("jsonlines_sink")
        .option("path", d)
        .mode("overwrite")
        .save()
    )
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, cents long"
    ).json(d + "/part-*.jsonl")
    return back.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum(F.col("o_orderkey") * (F.col("cents") % 1000))
        .cast("long")
        .alias("digest"),
    )


def q_io19_bucket_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket PRUNING — the hash-layout sibling of io5's partition
    pruning: with events bucketed by user_id, an equality predicate on
    the bucketing column lets the scan select ONE bucket's files
    (``SelectedBucketsCount: 1 out of 8`` in the executed plan, gated in
    tests/test_plans.py) instead of reading the table — the serving-read
    layout for entity-keyed tables where date partitioning doesn't help.
    b1 witnesses the JOIN side of bucketing (zero-exchange zipper);
    this witnesses the SCAN side (point reads priced at 1/N of the
    files at any table size). The oracle replays the filter over the
    raw events, so the pruned read must still see every matching row —
    a bucket-assignment drift (wrong hash, wrong modulus) loses rows
    and breaks the hash.

    Conf note (the io14 lesson, set QUERY-SCOPED so the driver's vanilla
    session behaves like the builder's without leaking to later queries):
    Spark's DisableUnnecessaryBucketedScan rule turns OFF the bucketed
    read when no downstream operator needs the distribution — which also
    forfeits bucket pruning ('Bucketed: false (disabled by query
    planner)' and a full-table scan). autoBucketedScan=false keeps the
    bucketed layout active so the pruning fires; a real deployment sets
    this on point-read serving sessions. The physical plan is pinned
    inside the conf scope (pin_plan) so the restore can't unplan it."""
    import shutil
    from urllib.parse import urlparse

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tbl = "io19_events_bkt"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    (
        ev.write.mode("overwrite")
        .bucketBy(8, "user_id")
        .sortBy("user_id")
        .format("parquet")
        .saveAsTable(tbl)
    )
    with session_conf(
        spark,
        {"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false"},
    ):
        t = spark.table(tbl)
        return pin_plan(
            t.filter(F.col("user_id") == 7)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("sum_cents"),
                F.min("event_id").cast("long").alias("min_event_id"),
                F.max("event_id").cast("long").alias("max_event_id"),
            )
        )


def q_io20_training_shards_export(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STORE-LEVEL deterministic shard export (round-12;
    store.export_training_shards): the curated corpus lands as
    ``shard=K`` parquet dirs + an atomic integrity manifest — the
    hand-off to the training job (shuf1 proves the seeded-permutation
    SEMANTICS as a query; this witnesses the ARTIFACT: real files, real
    manifest, store-managed). The witness registers documents, exports
    8 shards, READS THE WRITTEN FILES BACK and rolls them up per shard
    alongside the manifest's own counts — a dropped row, a double
    write, or an assignment drift between manifest and data breaks the
    hash. Oracle: the portable md5 assignment replayed relationally.
    Scale: one hash-partitioned exchange (the unavoidable shuffle of a
    permutation export) + an n_shards-row manifest agg."""
    from .store import FeatureStore

    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("entity_id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
        "n_chars",
    )
    fs = FeatureStore(spark)
    fs.register("corpus", feats)
    d = _scratch_dir("io20_shards", sf_dir) + "/out"
    manifest = fs.export_training_shards("corpus", d, n_shards=8)
    back = spark.read.parquet(d)
    per_shard = back.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("entity_id").cast("long").alias("sum_ids"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    mrows = [
        (int(k), int(v["n_rows"]), int(v["key_checksum"]))
        for k, v in manifest["shards"].items()
    ]
    mdf = spark.createDataFrame(
        mrows, "shard int, manifest_n long, manifest_checksum long"
    )
    return per_shard.join(mdf, "shard")


QUERIES = {
    'io20_training_shards_export': q_io20_training_shards_export,
    'io1_csv_roundtrip': q_io1_csv_roundtrip,
    'io2_json_roundtrip': q_io2_json_roundtrip,
    'io3_orc_roundtrip': q_io3_orc_roundtrip,
    'io4_text_roundtrip': q_io4_text_roundtrip,
    'io5_partitioned_pruning': q_io5_partitioned_pruning,
    'io6_schema_evolution': q_io6_schema_evolution,
    'io7_corrupt_records': q_io7_corrupt_records,
    'io10_zorder_layout': q_io10_zorder_layout,
    'io11_binary_ingest': q_io11_binary_ingest,
    'io12_gzip_roundtrip': q_io12_gzip_roundtrip,
    'io13_values_inline': q_io13_values_inline,
    'io14_python_datasource': q_io14_python_datasource,
    'io15_xml_roundtrip': q_io15_xml_roundtrip,
    'io16_dynamic_overwrite': q_io16_dynamic_overwrite,
    'io17_csv_multiline': q_io17_csv_multiline,
    'io18_python_datasource_writer': q_io18_python_datasource_writer,
    'io19_bucket_pruning': q_io19_bucket_pruning,
}

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["io1_csv_roundtrip"] = """
        SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value,
               MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id
        FROM events GROUP BY event_type
    """

ORACLE_SQL["io2_json_roundtrip"] = """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(event_id) AS min_event_id
        FROM events GROUP BY event_type
    """

ORACLE_SQL["io3_orc_roundtrip"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem WHERE l_quantity >= 25
        GROUP BY 1, 2
    """

ORACLE_SQL["io4_text_roundtrip"] = """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(MIN(length(text)) AS BIGINT) AS min_len,
               CAST(MAX(length(text)) AS BIGINT) AS max_len
        FROM documents
    """

ORACLE_SQL["io5_partitioned_pruning"] = f"""
    SELECT epoch_us(date_trunc('day', ts)) AS day_us,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ({_EV})
    WHERE event_type = 'purchase'
    GROUP BY 1
"""

ORACLE_SQL["io6_schema_evolution"] = """
    SELECT l_orderkey % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_legacy_rows,
           ROUND(SUM(CASE WHEN l_orderkey % 2 = 1
                          THEN round(l_discount * 100, 2) ELSE 0 END), 2)
               AS sum_discount_pct,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY l_orderkey % 10
"""

ORACLE_SQL["io7_corrupt_records"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           CAST(SUM(CASE WHEN event_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
           ROUND(SUM(CASE WHEN event_id % 97 <> 0
                          THEN round(value, 2) END), 2) AS sum_good_value
    FROM ({_EV})
"""

ORACLE_SQL["io10_zorder_layout"] = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ({_EV})
    WHERE user_id BETWEEN 4 AND 11
      AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
"""

ORACLE_SQL["io11_binary_ingest"] = """
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_files,
           CAST(octet_length(encode(text)) + 1 AS BIGINT) AS file_bytes,
           md5(text || chr(10)) AS content_md5
    FROM documents WHERE doc_id < 20
    ORDER BY doc_id
"""

ORACLE_SQL["io12_gzip_roundtrip"] = f"""
    WITH ev AS ({_EV})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM ev GROUP BY event_type ORDER BY event_type
"""

ORACLE_SQL["io13_values_inline"] = """
    SELECT t.tier,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN (VALUES ('low', 0, 10), ('mid', 10, 25), ('high', 25, 1000))
         AS t(tier, lo, hi)
      ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
    GROUP BY t.tier
    ORDER BY t.tier
"""

ORACLE_SQL["io14_python_datasource"] = """
    WITH g AS (SELECT range AS i FROM range(0, 16000))
    SELECT i % 97 AS key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((i * i) % 10007) AS BIGINT) AS sum_cents,
           CAST(MIN(i) AS BIGINT) AS first_i,
           CAST(MAX(i) AS BIGINT) AS last_i
    FROM g GROUP BY i % 97
"""

ORACLE_SQL["io15_xml_roundtrip"] = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
"""

ORACLE_SQL["io16_dynamic_overwrite"] = """
    WITH c AS (
        SELECT event_type, user_id,
               CASE WHEN event_type = 'click'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) * 2
                    ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
               END AS cents
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY event_type
"""

ORACLE_SQL["io17_csv_multiline"] = """
    WITH d AS (
        SELECT doc_id, source,
               'say "' || replace(text, ' the ', chr(10)) || '", okay' AS body
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(body)) AS BIGINT) AS sum_chars,
           CAST(SUM(length(body) - length(replace(body, chr(10), '')))
                AS BIGINT) AS sum_newlines,
           CAST(SUM(doc_id * length(body)) AS BIGINT) AS digest
    FROM d GROUP BY source
"""

ORACLE_SQL["io18_python_datasource_writer"] = """
    WITH o AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(o_orderkey * (cents % 1000)) AS BIGINT) AS digest
    FROM o GROUP BY o_orderstatus
"""


# io19: the pruned bucketed read must see every matching row — the oracle
# filters the raw events, so hash/modulus drift in bucket assignment
# (rows landing in unselected buckets) breaks the hash.
ORACLE_SQL["io19_bucket_pruning"] = f"""
    WITH e AS ({_EV})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM e WHERE user_id = 7
    GROUP BY event_type
"""


# io20: the portable md5 shard assignment replayed relationally — the
# manifest columns must agree with the read-back data (the lane joins
# them), so the oracle computes BOTH from the same assignment.
ORACLE_SQL["io20_training_shards_export"] = """
    WITH a AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-42'), 1, 8))
                   ::BIGINT AS h
        FROM documents
    ),
    s AS (SELECT doc_id, n_chars, h, CAST(h % 8 AS INT) AS shard FROM a)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(*) AS BIGINT) AS manifest_n,
           CAST(SUM(h) AS BIGINT) AS manifest_checksum
    FROM s GROUP BY shard
"""
