"""The oracle-checked query surface (driver contract, __spark_entry__.py).

One entry per operator family from SURVEY.md §2 + the training-data pipeline
operators (dedup / similarity / text-analysis / multimodal), each expressed
twice with identical semantics:

- a Spark DataFrame plan ``(spark, sf_dir) -> DataFrame`` (this module)
- an ANSI-SQL twin DuckDB runs on the same parquet (``ORACLE_SQL``)

Cross-engine determinism rules used throughout (see operators/similarity.py
for the rationale):
- the only hash is MD5 (identical in Spark and DuckDB)
- float aggregation is avoided: sums of doubles are rounded to cents-scale,
  vector math is quantized to int64 via floor(x*10000) before any arithmetic
- no raw timestamps/arrays in output — strings/scalars only
- every computed column aliased identically on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawld_spark.functions.extract import extract_links, extract_text, wrap_html
from crawld_spark.functions.url import canonicalize_url
from crawld_spark.operators import dedup, similarity, textstats, urlfilter
from crawld_spark.operators.multimodal import decode_meta_stub

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Unsplittable-input repair for per-row-heavy lanes (guide §2.5, "one
    huge unsplittable file → repartition immediately after the read"): the
    testdata parquet files are written as a SINGLE row group, so a scan
    yields one populated partition no matter how small maxPartitionBytes is,
    and every downstream per-row computation runs on one core. Round-robin
    repartition to the session's default parallelism — but ONLY when the
    source has fewer partitions, so at production scale (many real splits)
    this is a no-op and no payload shuffle is added. Measured (sf1.0,
    local[32]): the minhash bucket pass drops 8.3 s → 2.7 s on top of the
    staged-projection fix; the repartition itself moves ~6 MB once.

    The probe uses inputFiles() sizing (a file listing, ~30 ms) rather than
    df.rdd.getNumPartitions() (a full physical-plan compile, ~150-250 ms
    per lane): local inputs that could not feed ``target`` scan tasks even
    at maxPartitionBytes granularity get the repartition; big or non-local
    (cluster-storage) inputs are left alone."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        import os as _os

        total = 0
        for f in df.inputFiles():
            if not f.startswith("file:"):
                return df  # cluster storage: assume splittable, leave alone
            total += _os.path.getsize(f[len("file:"):])
        max_pb = int(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
            .lower().rstrip("b")
        )
        if total >= target * max_pb:
            return df
    except Exception:
        if df.rdd.getNumPartitions() >= target:
            return df
    return df.repartition(target)


_Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_SQL: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        _Q[name] = fn
        if sql is not None:
            _SQL[name] = sql
        return fn

    return deco


# =====================================================================
# 1. crawld operator semantics on the TPC-H-ish corpus (SURVEY.md §2)
# =====================================================================

@q(
    "frontier_scan_filter",
    # ≙ S7: work-list scan with pushed-down predicates + projection
    # (crawld.go:265-304). Note the reference lowercases the COLUMN only
    # (crawld.go:267-272) — mirrored here.
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderkey >= 1000 AND lower(o_orderpriority) IN ('1-urgent', '2-high')
    """,
)
def frontier_scan_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderkey") >= 1000)
            & F.lower(F.col("o_orderpriority")).isin("1-urgent", "2-high")
        )
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


@q(
    "topk_per_group",
    # ≙ S2: top-N per language sorted by stars (crawlers/github.go:226-291)
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
    WHERE rk <= 5
    """,
)
def topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            "o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "rk"
        )
    )


@q(
    "global_limit",
    # ≙ F6 global-limit semantics (crawlers/github.go:121,128-129)
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def global_limit(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@q(
    "point_lookup_enrich",
    # ≙ S3/S5 point lookups + J1 entity↔extension join — broadcast-hash join
    """
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey IN (1, 2, 3, 5, 8, 13, 21)
    """,
)
def point_lookup_enrich(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_custkey").isin(1, 2, 3, 5, 8, 13, 21)
    )
    nation = _t(spark, sf_dir, "nation")
    return cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")


@q(
    "set_expansion",
    # ≙ S6: one key → set of members (org members / contributors)
    """
    SELECT c_custkey, o_orderkey
    FROM customer JOIN orders ON o_custkey = c_custkey
    WHERE c_custkey < 50
    """,
)
def set_expansion(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 50)
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "o_orderkey"
    )


@q(
    "link_if_absent",
    # ≙ J3/A6: insert-if-absent via left-anti join (crawlers/github.go:809-842)
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def link_if_absent(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, how="left_anti"
    ).select("c_custkey")


@q(
    "seen_probe",
    # ≙ J4: seen-set membership — the keys not yet known
    """
    SELECT DISTINCT user_id AS new_key FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def seen_probe(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey, how="left_anti")
        .select(F.col("user_id").alias("new_key"))
        .distinct()
    )


@q(
    "merge_upsert",
    # ≙ A1-A5/S11: MERGE INTO (insert-or-update). Updates win over target.
    """
    WITH t AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
         u AS (SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice
               FROM orders WHERE o_orderkey % 3 = 0)
    SELECT o_orderkey, round(o_totalprice, 2) AS total FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn FROM (
        SELECT o_orderkey, o_totalprice, 1 AS src FROM u
        UNION ALL
        SELECT o_orderkey, o_totalprice, 2 AS src FROM t))
    WHERE rn = 1
    """,
)
def merge_upsert(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    target = orders.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    updates = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice")
    )
    survivors = target.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = survivors.unionByName(updates)
    return merged.select("o_orderkey", F.round("o_totalprice", 2).alias("total"))


@q(
    "count_exists",
    # ≙ A8: COUNT(*) existence aggregate (crawlers/github.go:811-813)
    """
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey HAVING count(*) > 5
    """,
)
def count_exists(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 5)
    )


@q(
    "validation_filter",
    # ≙ F5 verifyRepo: reject rows with null essential fields, count both
    # lanes (log-and-continue ⇒ reject *count*, crawlers/github.go:190-193)
    """
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
                          AND o_orderdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(count(*) AS BIGINT) AS n_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def validation_filter(spark, sf_dir):
    valid = (
        F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & F.col("o_orderdate").isNotNull()
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
            F.count("*").alias("n_total"),
        )
    )


@q(
    "scalar_funcs",
    # ≙ C1 lowercase-join, C2 RFC3339 + zero-time sentinel, C4 bytes→GB
    # decimal, C5 zero-pad-20 (crawlers/util.go:63-71, crawld.go:252-254,451)
    """
    SELECT o_orderkey,
           lower(concat(o_orderstatus, '/', o_orderpriority)) AS path,
           strftime(coalesce(o_orderdate, TIMESTAMP '0001-01-01 00:00:00'),
                    '%Y-%m-%dT%H:%M:%S') || 'Z' AS rfc3339,
           round(o_totalprice / 1e9, 12) AS gb,
           printf('%020d', o_orderkey) AS padded
    FROM orders WHERE o_orderkey <= 500
    """,
)
def scalar_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.lower(F.concat_ws("/", "o_orderstatus", "o_orderpriority")).alias("path"),
            F.concat(
                F.date_format(
                    F.coalesce(F.col("o_orderdate"), F.lit("0001-01-01").cast("timestamp")),
                    "yyyy-MM-dd'T'HH:mm:ss",
                ),
                F.lit("Z"),
            ).alias("rfc3339"),
            F.round(F.col("o_totalprice") / 1e9, 12).alias("gb"),
            F.format_string("%020d", F.col("o_orderkey")).alias("padded"),
        )
    )


@q(
    "error_taxonomy",
    # ≙ C7: error classification by code + message substring
    # (crawlers/github.go:1005-1026)
    """
    SELECT CASE WHEN event_type = 'error' AND props LIKE '%"k": 6%' THEN 'too_many_calls'
                WHEN event_type = 'error' THEN 'unavailable'
                ELSE 'ok' END AS klass,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def error_taxonomy(spark, sf_dir):
    klass = (
        F.when(
            (F.col("event_type") == "error") & F.col("props").like('%"k": 6%'),
            F.lit("too_many_calls"),
        )
        .when(F.col("event_type") == "error", F.lit("unavailable"))
        .otherwise(F.lit("ok"))
    )
    return (
        _t(spark, sf_dir, "events")
        .groupBy(klass.alias("klass"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "two_phase_lang_filter",
    # ≙ F4 exactly: stage-1 case-SENSITIVE primary match
    # (crawlers/util.go:96-99), stage-2 case-INSENSITIVE fallback
    # (crawlers/util.go:85), null → reject (crawlers/util.go:76-78)
    """
    SELECT doc_id,
           CASE WHEN lang IS NULL THEN 'reject'
                WHEN lang IN ('en', 'de') THEN 'primary'
                WHEN lower(lang) IN ('fr', 'zh') THEN 'fallback'
                ELSE 'reject' END AS verdict
    FROM documents
    """,
)
def two_phase_lang_filter(spark, sf_dir):
    verdict = (
        F.when(F.col("lang").isNull(), F.lit("reject"))
        .when(F.col("lang").isin("en", "de"), F.lit("primary"))
        .when(F.lower(F.col("lang")).isin("fr", "zh"), F.lit("fallback"))
        .otherwise(F.lit("reject"))
    )
    return _t(spark, sf_dir, "documents").select("doc_id", verdict.alias("verdict"))


@q(
    "round_metrics",
    # ≙ the rounds-lineage aggregation shape (north_rule: per-partition
    # lineage + fetch/parse counters) — hash aggregate, map-side combine
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%S') AS hour,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def round_metrics(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@q(
    "events_windowed_agg",
    # the streaming windowed-metrics operator
    # (streaming/metrics_stream.windowed_event_metrics) run in batch mode:
    # tumbling 15-min event-time windows × event_type. DuckDB's time_bucket
    # aligns to the same epoch-multiple boundaries as Spark's window() under
    # the UTC session timezone. The streaming variant (watermark, late-row
    # drop) is asserted separately in tests/test_streaming_metrics.py.
    """
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%dT%H:%M:%S')
             AS window_start,
           strftime(time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes',
                    '%Y-%m-%dT%H:%M:%S') AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def events_windowed_agg(spark, sf_dir):
    from crawld_spark.streaming.metrics_stream import windowed_event_metrics

    m = windowed_event_metrics(
        _t(spark, sf_dir, "events"), window_duration="15 minutes"
    )
    return m.select(
        F.date_format("window_start", "yyyy-MM-dd'T'HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd'T'HH:mm:ss").alias("window_end"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


@q(
    "fetch_order",
    # ≙ O1: the canonical fetch order `ORDER BY id` (crawld.go:275) as an
    # explicit rank column
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS fetch_rank
    FROM orders WHERE o_custkey < 100
    """,
)
def fetch_order(spark, sf_dir):
    """Canonical fetch order as the ENGINE computes it: the two-phase
    range-partitioned prefix-sum rank (plans/rank.global_rank — the round
    loop's real ordering path), not a single-partition window. The oracle's
    row_number states the same total order; the Spark plan shuffles into
    `shuffle.partitions` sorted ranges and stitches per-partition offsets,
    so no executor ever holds the whole order."""
    from crawld_spark.plans.rank import global_rank

    d = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    ranked = global_rank(
        d, [F.desc("o_totalprice"), F.asc("o_orderkey")], out="fetch_rank"
    )
    return ranked.select("o_orderkey", "fetch_rank")


@q(
    "politeness_window",
    # ≙ the native politeness scheduler's core plan (operators/politeness.py
    # schedule_round): per-host rank → virtual-time arithmetic → round-window
    # + budget cut. Hosts ≙ custkey buckets; delay varies per host.
    """
    SELECT host, o_orderkey, seq_in_host,
           round(seq_in_host * delay_s, 6) AS sched_vt
    FROM (
      SELECT (o_custkey % 50) AS host,
             o_orderkey,
             CAST(1 + (o_custkey % 50) % 3 AS DOUBLE) AS delay_s,
             row_number() OVER (PARTITION BY (o_custkey % 50)
                                ORDER BY o_totalprice DESC, o_orderkey) - 1 AS seq_in_host
      FROM orders)
    WHERE seq_in_host * delay_s < 60.0 AND seq_in_host < 40
    """,
)
def politeness_window(spark, sf_dir):
    host = (F.col("o_custkey") % 50).alias("host")
    w = Window.partitionBy(F.col("o_custkey") % 50).orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    delay = (F.lit(1) + (F.col("o_custkey") % 50) % 3).cast("double")
    k = (F.row_number().over(w) - F.lit(1)).cast("long")
    vt = k.cast("double") * delay
    return (
        _t(spark, sf_dir, "orders")
        .select(
            host,
            "o_orderkey",
            k.alias("seq_in_host"),
            F.round(vt, 6).alias("sched_vt"),
            (vt < F.lit(60.0)).alias("_in_window"),
        )
        .where(F.col("_in_window") & (F.col("seq_in_host") < 40))
        .drop("_in_window")
    )


# =====================================================================
# 2. training-data pipeline operators (dedup / similarity / text)
# =====================================================================

_DOCS_WITH_DUPS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
"""


def _docs_with_dups(spark, sf_dir, spread: bool = True):
    d = _t(spark, sf_dir, "documents")
    out = d.select("doc_id", "text").unionByName(
        d.where(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return _spread(out) if spread else out


@q(
    "dedup_exact",
    f"""
    WITH d AS ({_DOCS_WITH_DUPS})
    SELECT md5(text) AS digest, min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM d GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    # no _spread: one digest groupBy with map-side partial aggregation —
    # the repartition would be a second, pure-overhead shuffle
    out = dedup.exact_dedup(_docs_with_dups(spark, sf_dir, spread=False))
    return out.select("digest", "keeper_id", "n_copies")


_SHINGLES_SQL = """
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM d)
"""

_MINHASH_SQL = f"""
    WITH d AS ({_DOCS_WITH_DUPS}),
    sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, s -> md5('seed0:' || s))) AS mh0,
             list_min(list_transform(sh, s -> md5('seed1:' || s))) AS mh1,
             list_min(list_transform(sh, s -> md5('seed2:' || s))) AS mh2,
             list_min(list_transform(sh, s -> md5('seed3:' || s))) AS mh3
      FROM sh),
    bands AS (
      SELECT 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key, doc_id FROM sig
      UNION ALL
      SELECT 1 AS band_id, md5(mh2 || '|' || mh3) AS band_key, doc_id FROM sig)
"""


@q(
    "dedup_minhash_lsh",
    _MINHASH_SQL
    + """
    SELECT band_id, band_key, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM bands GROUP BY band_id, band_key HAVING count(*) > 1
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    buckets = dedup.minhash_lsh_buckets(
        _docs_with_dups(spark, sf_dir), n_hashes=4, band_size=2, shingle_k=2
    )
    return dedup.minhash_candidate_groups(buckets)


@q(
    "dedup_neardup_mark",
    _MINHASH_SQL
    + """
    , mins AS (
      SELECT band_id, band_key, min(doc_id) AS min_id
      FROM bands GROUP BY band_id, band_key
    )
    SELECT b.doc_id, bool_or(min_id < b.doc_id) AS is_dup
    FROM bands b JOIN mins USING (band_id, band_key)
    GROUP BY b.doc_id
    """,
)
def dedup_neardup_mark(spark, sf_dir):
    """Keep-first near-dup verdicts (dedup.neardup_mark): dup ⟺ some
    MinHash-LSH band is shared with a lower-id document. The prefix-stable
    rule the streaming form (streaming/neardup_stream.py) applies
    incrementally with bit-identical results."""
    return dedup.neardup_mark(
        _docs_with_dups(spark, sf_dir), n_hashes=4, band_size=2, shingle_k=2
    )


_SIMHASH_SQL = f"""
    WITH d AS ({_DOCS_WITH_DUPS}),
    tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM d),
    tb AS (SELECT doc_id, md5(w) AS h FROM tok),
    bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN substr(h, b + 1, 1) IN ('8','9','a','b','c','d','e','f')
                      THEN 1 ELSE -1 END) AS wgt
      FROM tb CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bs
      GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(CASE WHEN wgt > 0 THEN (1 << b) ELSE 0 END) AS INT) AS simhash
    FROM bits GROUP BY doc_id
"""

# 64-bit SimHash (production width — operators/dedup.simhash64_hex is the
# single source of truth): SimHash bit b reads md5 hex digit b//4
# (1-based b//4+1), bit-in-digit b%4, tested with a portable IN-list per
# bit position; output = 16-hex-char string (hex sidesteps BIGINT sign
# semantics differing across engines at bit 63).
_SIMHASH64_CORE = """
    tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM d),
    tb AS (SELECT doc_id, md5(w) AS h FROM tok),
    bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN (
                   (b % 4 = 0 AND substr(h, b // 4 + 1, 1) IN ('1','3','5','7','9','b','d','f'))
                OR (b % 4 = 1 AND substr(h, b // 4 + 1, 1) IN ('2','3','6','7','a','b','e','f'))
                OR (b % 4 = 2 AND substr(h, b // 4 + 1, 1) IN ('4','5','6','7','c','d','e','f'))
                OR (b % 4 = 3 AND substr(h, b // 4 + 1, 1) IN ('8','9','a','b','c','d','e','f'))
             ) THEN 1 ELSE -1 END) AS wgt
      FROM tb CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bs
      GROUP BY doc_id, b),
    hexdigits AS (
      SELECT doc_id, b // 4 AS dg,
             sum(CASE WHEN wgt > 0 THEN (1 << (b % 4)) ELSE 0 END) AS val
      FROM bits GROUP BY doc_id, b // 4),
    sim AS (
      SELECT doc_id, string_agg(lower(to_hex(val)), '' ORDER BY dg) AS simhash
      FROM hexdigits GROUP BY doc_id)
"""

_SIMHASH64_SQL = (
    f"WITH d AS ({_DOCS_WITH_DUPS}),"
    + _SIMHASH64_CORE
    + "SELECT doc_id, simhash FROM sim"
)

# Hamming-ball banding over the 64-bit SimHash: 4 bands × 16 bits (4 hex
# chars); any pair within Hamming distance 3 shares ≥1 band (pigeonhole) —
# candidate groups are band buckets with >1 doc, exactly the MinHash-LSH
# candidate shape but for Hamming space.
_SIMHASH64_BANDS_SQL = (
    f"WITH d AS ({_DOCS_WITH_DUPS}),"
    + _SIMHASH64_CORE
    + """
    , bands AS (
      SELECT b AS band_id, substr(simhash, b * 4 + 1, 4) AS band_key, doc_id
      FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) bs)
    SELECT band_id, band_key, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM bands GROUP BY band_id, band_key HAVING count(*) > 1
    """
)


@q(
    "dedup_clusters",
    # near-dup clustering: LSH buckets → star edges (bucket-min → member) →
    # connected components. The oracle computes components by transitive
    # closure (recursive CTE); Spark runs iterative min-label propagation —
    # both yield component = min reachable doc_id.
    _MINHASH_SQL.replace("WITH d AS", "WITH RECURSIVE d AS", 1)
    + """
    , roots AS (
      SELECT band_id, band_key, min(doc_id) AS root
      FROM bands GROUP BY band_id, band_key),
    star AS (
      SELECT r.root AS src, b.doc_id AS dst
      FROM bands b JOIN roots r USING (band_id, band_key)
      WHERE b.doc_id <> r.root),
    sym AS (
      SELECT src AS a, dst AS b FROM star
      UNION SELECT dst AS a, src AS b FROM star
      UNION SELECT doc_id AS a, doc_id AS b FROM d),
    reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b)
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark, sf_dir):
    return dedup.dedup_clusters(
        _docs_with_dups(spark, sf_dir), n_hashes=4, band_size=2, shingle_k=2
    )


@q("dedup_simhash", _SIMHASH64_SQL)
def dedup_simhash(spark, sf_dir):
    # production 64-bit SimHash (r3; the 16-bit demo construction remains
    # as operators/dedup.simhash16 with its oracle in _SIMHASH_SQL)
    # no _spread: the signature projection is column-pruned under the
    # bench's count(), so the lane would only pay the repartition
    d = _docs_with_dups(spark, sf_dir, spread=False)
    return d.select("doc_id", dedup.simhash64_hex(F.col("text")).alias("simhash"))


@q("dedup_simhash_bands", _SIMHASH64_BANDS_SQL)
def dedup_simhash_bands(spark, sf_dir):
    # Hamming-ball LSH candidates: every pair within Hamming distance 3
    # (4 bands × 16 bits) is guaranteed to surface in ≥1 bucket
    buckets = dedup.simhash_band_buckets(_docs_with_dups(spark, sf_dir), n_bands=4)
    return dedup.minhash_candidate_groups(buckets)


@q(
    "ngram_jaccard",
    """
    WITH d AS (SELECT doc_id, text FROM documents),
    sh AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS sh FROM d),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.sh AS sh1, b.sh AS sh2
              FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1)
    SELECT d1, d2,
           CAST(len(list_intersect(sh1, sh2)) AS INT) AS inter,
           CAST(len(list_distinct(list_concat(sh1, sh2))) AS INT) AS uni,
           round(CASE WHEN len(list_distinct(list_concat(sh1, sh2))) > 0
                 THEN len(list_intersect(sh1, sh2)) * 1.0
                      / len(list_distinct(list_concat(sh1, sh2)))
                 ELSE 0.0 END, 6) AS jaccard
    FROM pairs
    """,
)
def ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("d1")).join(
        docs.select(F.col("doc_id").alias("d2")),
        F.col("d2") == F.col("d1") + 1,
    )
    return dedup.ngram_jaccard_pairs(docs, pairs, n=1)


_QUANT_SQL = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"

_COS_PAIR_SQL = f"""
    WITH v AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings),
    pairs AS (SELECT a.vec_id AS v1, b.vec_id AS v2, a.qv AS qv1, b.qv AS qv2
              FROM v a JOIN v b ON b.vec_id = a.vec_id + 1),
    flat AS (SELECT v1, v2, unnest(qv1) AS x, unnest(qv2) AS y FROM pairs),
    dots AS (SELECT v1, v2, CAST(sum(x * y) AS BIGINT) AS dot,
                    CAST(sum(x * x) AS BIGINT) AS n1, CAST(sum(y * y) AS BIGINT) AS n2
             FROM flat GROUP BY v1, v2)
    SELECT v1, v2, round(dot / (sqrt(n1) * sqrt(n2)), 6) AS cos,
           dot / (sqrt(n1) * sqrt(n2)) > 0.8 AS is_neardup
    FROM dots
"""


@q("embedding_neardup", _COS_PAIR_SQL)
def embedding_neardup(spark, sf_dir):
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("v1"), similarity.quantize("embedding").alias("qv1"))
    b = emb.select(F.col("vec_id").alias("v2"), similarity.quantize("embedding").alias("qv2"))
    pairs = a.join(b, F.col("v2") == F.col("v1") + 1)
    cos = similarity.dot_i(F.col("qv1"), F.col("qv2")) / (
        F.sqrt(similarity.norm2_i(F.col("qv1")).cast("double"))
        * F.sqrt(similarity.norm2_i(F.col("qv2")).cast("double"))
    )
    return pairs.select(
        "v1", "v2", F.round(cos, 6).alias("cos"), (cos > 0.8).alias("is_neardup")
    )


# SRP-LSH: the deterministic ±1 hyperplane matrix, shared verbatim with the
# DuckDB oracle (single source of truth: similarity.srp_sign_matrix)
_SRP_DIM, _SRP_BITS, _SRP_BAND = 64, 16, 4
_SRP_SIGNS = similarity.srp_sign_matrix(_SRP_DIM, _SRP_BITS)
_SRP_VALUES = ",\n           ".join(
    f"({j}, {_SRP_SIGNS[j]})" for j in range(_SRP_BITS)
)

_SRP_SQL = f"""
    WITH signs(j, sgn) AS (VALUES
           {_SRP_VALUES}),
    v AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings),
    bits AS (SELECT v.vec_id, s.j,
                    CASE WHEN list_sum(list_transform(range(1, {_SRP_DIM + 1}),
                                                      i -> qv[i] * sgn[i])) >= 0
                         THEN 1 ELSE 0 END AS bit
             FROM v CROSS JOIN signs s),
    bands AS (SELECT vec_id, j // {_SRP_BAND} AS band_id,
                     CAST(sum(bit << (j % {_SRP_BAND})) AS INT) AS band_key
              FROM bits GROUP BY vec_id, j // {_SRP_BAND}),
    pairs AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
                   AND b.vec_id > a.vec_id),
    flat AS (SELECT v1, v2, unnest(va.qv) AS x, unnest(vb.qv) AS y
             FROM pairs JOIN v va ON va.vec_id = v1 JOIN v vb ON vb.vec_id = v2),
    dots AS (SELECT v1, v2, CAST(sum(x * y) AS BIGINT) AS dot,
                    CAST(sum(x * x) AS BIGINT) AS n1, CAST(sum(y * y) AS BIGINT) AS n2
             FROM flat GROUP BY v1, v2)
    SELECT v1, v2, round(dot / (sqrt(n1) * sqrt(n2)), 6) AS cos
    FROM dots
    ORDER BY dot / (sqrt(n1) * sqrt(n2)) DESC, v1, v2 LIMIT 20
"""


@q("srp_neardup", _SRP_SQL)
def srp_neardup(spark, sf_dir):
    """Embedding near-dup via signed-random-projection LSH banding: bucket
    join → candidate pairs → exact integer cosine → global top-20. The
    banding path replaces the all-pairs scan at corpus scale (the MinHash
    analog for cosine space)."""
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    local = similarity.srp_topk_neardup(
        emb, dim=_SRP_DIM, n_bits=_SRP_BITS, band_size=_SRP_BAND, k=20
    )
    # per-bucket top-20 provably contains the global distinct top-20 (see
    # srp_topk_neardup); duplicate cross-band pairs carry identical exact
    # cosines, so dropDuplicates + re-sort reproduces the r2 plan's answer
    return (
        local.dropDuplicates(["v1", "v2"])
        .orderBy(F.desc("cos"), F.asc("v1"), F.asc("v2"))
        .limit(20)
        .select("v1", "v2", F.round("cos", 6).alias("cos"))
    )


_ANN_SQL = f"""
    WITH q AS (SELECT vec_id AS qid, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS nid, {_QUANT_SQL} AS nv FROM embeddings WHERE vec_id >= 3),
    flat AS (SELECT qid, nid, unnest(qv) AS x, unnest(nv) AS y FROM q CROSS JOIN c),
    dots AS (SELECT qid, nid, CAST(sum(x * y) AS BIGINT) AS dot,
                    CAST(sum(x * x) AS BIGINT) AS nq, CAST(sum(y * y) AS BIGINT) AS nn
             FROM flat GROUP BY qid, nid),
    ranked AS (SELECT qid, nid, dot / (sqrt(nq) * sqrt(nn)) AS cos,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY dot / (sqrt(nq) * sqrt(nn)) DESC, nid) AS rank
               FROM dots)
    SELECT qid, rank, nid, round(cos, 6) AS cos FROM ranked WHERE rank <= 5
"""


@q("ann_brute_topk", _ANN_SQL)
def ann_brute_topk(spark, sf_dir):
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    return similarity.brute_force_topk(
        emb.where(F.col("vec_id") < 3), emb.where(F.col("vec_id") >= 3), k=5
    )


# IVF twin: the oracle replays the whole algorithm — integer centroids
# (elementwise floor-MEAN of the quantized vectors per label cell, exact
# integer floor division so centroid norms cannot overflow int64 at any
# cell size — ADVICE r3), top-n_probe cells per query by centroid cosine,
# then exact top-k within the probed cells' union. The quantized-int math
# makes every probing decision bit-identical across engines.
_ANN_IVF_SQL = f"""
    WITH q AS (SELECT vec_id AS qid, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS nid, label, {_QUANT_SQL} AS nv FROM embeddings WHERE vec_id >= 3),
    cflat AS (SELECT label, unnest(nv) AS v,
                     unnest(generate_series(1, len(nv))) AS pos
              FROM c),
    centf AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
              FROM cflat GROUP BY label, pos),
    cent AS (SELECT label, list((s - ((s % n + n) % n)) // n ORDER BY pos) AS cv
             FROM centf GROUP BY label),
    pflat AS (SELECT qid, label, unnest(qv) AS x, unnest(cv) AS y FROM q CROSS JOIN cent),
    pdots AS (SELECT qid, label, CAST(sum(x * y) AS BIGINT) AS dot,
                     CAST(sum(x * x) AS BIGINT) AS nq, CAST(sum(y * y) AS BIGINT) AS nc
              FROM pflat GROUP BY qid, label),
    probed AS (
      SELECT qid, label FROM (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, label) AS r
        FROM pdots)
      WHERE r <= 2),
    sflat AS (SELECT q.qid, c.nid, unnest(q.qv) AS x, unnest(c.nv) AS y
              FROM probed p JOIN q ON q.qid = p.qid JOIN c ON c.label = p.label),
    sdots AS (SELECT qid, nid, CAST(sum(x * y) AS BIGINT) AS dot,
                     CAST(sum(x * x) AS BIGINT) AS nq, CAST(sum(y * y) AS BIGINT) AS nn
              FROM sflat GROUP BY qid, nid),
    ranked AS (SELECT qid, nid, dot / (sqrt(nq) * sqrt(nn)) AS cos,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY dot / (sqrt(nq) * sqrt(nn)) DESC, nid) AS rank
               FROM sdots)
    SELECT qid, rank, nid, round(cos, 6) AS cos FROM ranked WHERE rank <= 5
"""


@q("ann_ivf_topk", _ANN_IVF_SQL)
def ann_ivf_topk(spark, sf_dir):
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    return similarity.ivf_topk(
        emb.where(F.col("vec_id") < 3), emb.where(F.col("vec_id") >= 3), k=5, n_probe=2
    )


# k-means IVF twin (r4 — closes the last no_oracle lane): the Lloyd loop is
# deterministic with a FIXED iteration count, so the oracle UNROLLS it —
# seed selection by md5 rank, then per iteration one assignment CTE (argmax
# of dot(q,c)/|c| over the previous centroids, ties to the lowest label; the
# |q| denominator cancels in the argmax and is never computed — same formula
# as similarity.assign_nearest) and one floor-mean centroid-update CTE
# (empty cells keep their previous centroid via the LEFT JOIN coalesce).
# The final assignment feeds the identical multi-probe search as the
# per-label IVF twin. All arithmetic is exact ints + one IEEE double
# division per score, so every training decision is bit-identical across
# engines — no inlined trained constants, valid at any scale factor.
_KM_K, _KM_ITER, _KM_DIM = 8, 4, 64
# ANN trainings run their Lloyd updates over a deterministic hash-ordered
# sample of this many rows (VERDICT r4 item 4) — the final assignment /
# encode still covers the full corpus. 256 < the sf0.01 corpus (497), so
# the oracle comparison exercises the sampled path, not a degenerate
# sample == corpus case.
_TRAIN_SAMPLE = 256


def _kmeans_train_ctes(
    src: str, k: int, n_iter: int, dim: int, sample: int | None = None
) -> list[str]:
    """CTE chain replaying kmeans_assign verbatim over a corpus CTE named
    ``src`` (columns vec_id, qv): md5-ranked seeds, then per iteration one
    argmax-assignment CTE and one floor-mean centroid-update CTE. The
    final assignment is CTE ``a{n_iter}`` (vec_id, qv, label). Shared by
    the ann_ivf_kmeans and semantic_dedup twins. ``sample`` mirrors
    kmeans_assign(train_sample=...): the update iterations run over the
    first ``sample`` rows in (md5(vec_id), vec_id) order — a prefix of
    the seed ordering, so cent0 is untouched — and only the FINAL
    assignment touches the full ``src``."""

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {dim + 1}),"
            f" i -> {a}[i] * {b}[i])) AS BIGINT)"
        )

    def nsq(a: str) -> str:
        return f"CAST(list_sum(list_transform({a}, x -> x * x)) AS BIGINT)"

    def score(qv: str, cv: str) -> str:
        return (
            f"{dot(qv, cv)} / (CASE WHEN {nsq(cv)} = 0 THEN 1.0"
            f" ELSE sqrt(CAST({nsq(cv)} AS DOUBLE)) END)"
        )

    # floor-mean: exact integer floor division (Python // semantics)
    mean = "(s - ((s % n + n) % n)) // n"
    ctes = [
        f"""cent0 AS (
      SELECT label, cv FROM (
        SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                    AS INT) AS label,
               qv AS cv
        FROM {src}) WHERE label < {k})""",
    ]
    tsrc = src
    if sample is not None:
        tsrc = f"{src}ts"
        ctes.append(
            f"""{tsrc} AS (
      SELECT vec_id, qv FROM {src}
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {sample})"""
        )
    for i in range(1, n_iter + 1):
        isrc = src if i == n_iter else tsrc  # final pass: full corpus
        ctes.append(
            f"""a{i} AS (
      SELECT vec_id, qv, label FROM (
        SELECT {isrc}.vec_id, {isrc}.qv, t.label,
               row_number() OVER (PARTITION BY {isrc}.vec_id
                                  ORDER BY {score(f'{isrc}.qv', 't.cv')} DESC, t.label) AS r
        FROM {isrc} CROSS JOIN cent{i - 1} t) WHERE r = 1)"""
        )
        if i < n_iter:  # the final assignment needs no further update
            ctes.append(
                f"""u{i} AS (
      SELECT label, list({mean} ORDER BY pos) AS cv FROM (
        SELECT label, pos, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        FROM (SELECT label, unnest(qv) AS v,
                     unnest(generate_series(1, len(qv))) AS pos FROM a{i})
        GROUP BY label, pos)
      GROUP BY label)"""
            )
            ctes.append(
                f"""cent{i} AS (
      SELECT p.label, coalesce(u.cv, p.cv) AS cv
      FROM cent{i - 1} p LEFT JOIN u{i} u ON u.label = p.label)"""
            )
    return ctes


def _kmeans_ivf_sql(k: int = _KM_K, n_iter: int = _KM_ITER, dim: int = _KM_DIM) -> str:
    # floor-mean: exact integer floor division (Python // semantics)
    mean = "(s - ((s % n + n) % n)) // n"
    ctes = [
        f"q AS (SELECT vec_id AS qid, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id < 3)",
        f"c AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id >= 3)",
    ]
    ctes += _kmeans_train_ctes("c", k, n_iter, dim, sample=_TRAIN_SAMPLE)
    # multi-probe IVF search over the trained cells — identical shape to
    # _ANN_IVF_SQL (floor-mean centroids recomputed from the labeled corpus,
    # exactly what ivf_topk does with kmeans_assign's output)
    ctes.append(f"lc AS (SELECT vec_id AS nid, label, qv AS nv FROM a{n_iter})")
    ctes.append(
        """cflat AS (SELECT label, unnest(nv) AS v,
                     unnest(generate_series(1, len(nv))) AS pos FROM lc)"""
    )
    ctes.append(
        "centf AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS s, count(*) AS n"
        " FROM cflat GROUP BY label, pos)"
    )
    ctes.append(
        f"cent AS (SELECT label, list({mean} ORDER BY pos) AS cv"
        " FROM centf GROUP BY label)"
    )
    ctes.append(
        "pflat AS (SELECT qid, label, unnest(qv) AS x, unnest(cv) AS y"
        " FROM q CROSS JOIN cent)"
    )
    ctes.append(
        """pdots AS (SELECT qid, label, CAST(sum(x * y) AS BIGINT) AS dot,
                     CAST(sum(x * x) AS BIGINT) AS nq, CAST(sum(y * y) AS BIGINT) AS nc
              FROM pflat GROUP BY qid, label)"""
    )
    ctes.append(
        """probed AS (
      SELECT qid, label FROM (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, label) AS r
        FROM pdots)
      WHERE r <= 2)"""
    )
    ctes.append(
        """sflat AS (SELECT q.qid, lc.nid, unnest(q.qv) AS x, unnest(lc.nv) AS y
              FROM probed p JOIN q ON q.qid = p.qid JOIN lc ON lc.label = p.label)"""
    )
    ctes.append(
        """sdots AS (SELECT qid, nid, CAST(sum(x * y) AS BIGINT) AS dot,
                     CAST(sum(x * x) AS BIGINT) AS nq, CAST(sum(y * y) AS BIGINT) AS nn
              FROM sflat GROUP BY qid, nid)"""
    )
    ctes.append(
        """ranked AS (SELECT qid, nid, dot / (sqrt(nq) * sqrt(nn)) AS cos,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY dot / (sqrt(nq) * sqrt(nn)) DESC, nid) AS rank
               FROM sdots)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    SELECT qid, rank, nid, round(cos, 6) AS cos FROM ranked WHERE rank <= 5"
    )


@q("ann_ivf_kmeans", _kmeans_ivf_sql())
def ann_ivf_kmeans(spark, sf_dir):
    # production IVF: deterministic md5-seeded k-means cells (r3) feeding
    # the same multi-probe search — recall vs brute pinned ≥ the per-label
    # variant in tests/test_similarity.py::TestKMeansIVF; since r4 the
    # DuckDB twin replays the whole unrolled training (no rows-only lane)
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    return similarity.ivf_topk_trained(
        emb.where(F.col("vec_id") < 3),
        emb.where(F.col("vec_id") >= 3).select("vec_id", "embedding"),
        k=5, n_probe=2, n_cells=_KM_K, n_iter=_KM_ITER,
        train_sample=_TRAIN_SAMPLE,
    )


# the synthetic embeddings are near-orthogonal (max pairwise cosine ~0.51),
# so the lane INJECTS exact duplicates — every 17th vector re-enters under
# id+100000, identically on both engines (the pii_scrub/dedup_paragraphs
# injection pattern) — and the dedup must find and drop exactly the copies.
_SEMDUP_SRC_SQL = (
    "SELECT vec_id, embedding FROM embeddings "
    "UNION ALL "
    "SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 17 = 0"
)


def _semantic_dedup_sql(
    tau: float = 0.8, k: int = _KM_K, n_iter: int = _KM_ITER, dim: int = _KM_DIM
) -> str:
    ctes = [
        f"c AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM ({_SEMDUP_SRC_SQL}))"
    ]
    ctes += _kmeans_train_ctes("c", k, n_iter, dim)
    ctes += [
        f"lab AS (SELECT vec_id, qv, label FROM a{n_iter})",
        """p AS (SELECT a.vec_id AS x, b.vec_id AS y, a.qv AS q1, b.qv AS q2
      FROM lab a JOIN lab b ON a.label = b.label AND a.vec_id < b.vec_id)""",
        "flat AS (SELECT x, y, unnest(q1) AS u, unnest(q2) AS v FROM p)",
        """dots AS (SELECT x, y, CAST(sum(u * v) AS BIGINT) AS dot,
             CAST(sum(u * u) AS BIGINT) AS n1, CAST(sum(v * v) AS BIGINT) AS n2
      FROM flat GROUP BY x, y)""",
        f"e AS (SELECT x, y FROM dots WHERE dot / (sqrt(n1) * sqrt(n2)) >= {tau})",
        """t AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_similar
      FROM (SELECT x AS vec_id FROM e UNION ALL SELECT y FROM e) GROUP BY 1)""",
        "l AS (SELECT DISTINCT y AS vec_id FROM e)",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT lab.vec_id, CAST(label AS BIGINT) AS label,
      CAST(coalesce(n_similar, 0) AS BIGINT) AS n_similar,
      (l.vec_id IS NOT NULL) AS dropped
    FROM lab LEFT JOIN t USING (vec_id) LEFT JOIN l USING (vec_id)"""
    )


@q("semantic_dedup", _semantic_dedup_sql())
def semantic_dedup(spark, sf_dir):
    """SemDeDup-style embedding near-dup removal
    (similarity.semantic_dedup): deterministic k-means cells (the trained
    IVF quantizer) bound the pair space; within a cell, cosine ≥ 0.8 pairs
    mark the higher id dropped (keep-lowest-id greedy). The DuckDB twin
    replays the whole unrolled training — no inlined constants. Injected
    exact copies (every 17th vector under id+100000) are the planted
    ground truth the dedup must recover."""
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    injected = emb.select("vec_id", "embedding").unionAll(
        emb.where(F.col("vec_id") % 17 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    return similarity.semantic_dedup(
        injected, tau=0.8, k_cells=_KM_K, n_iter=_KM_ITER,
    )


@q(
    "lang_id",
    """
    WITH s AS (
      SELECT doc_id,
        CAST((length(p) - length(replace(p, ' the ', ''))) / 5
           + (length(p) - length(replace(p, ' and ', ''))) / 5
           + (length(p) - length(replace(p, ' of ', ''))) / 4 AS INT) AS s_en,
        CAST((length(p) - length(replace(p, ' der ', ''))) / 5
           + (length(p) - length(replace(p, ' und ', ''))) / 5
           + (length(p) - length(replace(p, ' die ', ''))) / 5 AS INT) AS s_de,
        CAST((length(p) - length(replace(p, ' le ', ''))) / 4
           + (length(p) - length(replace(p, ' et ', ''))) / 4
           + (length(p) - length(replace(p, ' les ', ''))) / 5 AS INT) AS s_fr,
        CAST((length(p) - length(replace(p, ' el ', ''))) / 4
           + (length(p) - length(replace(p, ' y ', ''))) / 3
           + (length(p) - length(replace(p, ' los ', ''))) / 5 AS INT) AS s_es
      FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents))
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS guess
    FROM s
    """,
)
def lang_id(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", textstats.lang_id_guess(F.col("text")).alias("guess")
    )


@q(
    "quality_score",
    """
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct,
             CAST((length(p) - length(replace(p, ' the ', ''))) / 5
                + (length(p) - length(replace(p, ' and ', ''))) / 5
                + (length(p) - length(replace(p, ' of ', ''))) / 4
                + (length(p) - length(replace(p, ' der ', ''))) / 5
                + (length(p) - length(replace(p, ' und ', ''))) / 5
                + (length(p) - length(replace(p, ' die ', ''))) / 5
                + (length(p) - length(replace(p, ' le ', ''))) / 4
                + (length(p) - length(replace(p, ' et ', ''))) / 4
                + (length(p) - length(replace(p, ' les ', ''))) / 5
                + (length(p) - length(replace(p, ' el ', ''))) / 4
                + (length(p) - length(replace(p, ' y ', ''))) / 3
                + (length(p) - length(replace(p, ' los ', ''))) / 5 AS INT) AS stop_hits
      FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM documents)),
    g AS (
      SELECT doc_id, n_chars, n_tokens,
             CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) * 1.0 / n_tokens
                  ELSE 0.0 END AS avg_tok_len,
             CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS punct_ratio,
             CASE WHEN n_tokens > 0 THEN stop_hits * 1.0 / n_tokens ELSE 0.0 END AS stop_ratio
      FROM f)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(avg_tok_len, 6) AS avg_tok_len,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_ratio, 6) AS stop_ratio,
           round(CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 0.4 ELSE 0.0 END
               + CASE WHEN avg_tok_len >= 3 AND avg_tok_len <= 12 THEN 0.3 ELSE 0.0 END
               + CASE WHEN punct_ratio < 0.2 THEN 0.2 ELSE 0.0 END
               + CASE WHEN stop_ratio > 0.01 THEN 0.1 ELSE 0.0 END, 2) AS quality
    FROM g
    """,
)
def quality_score(spark, sf_dir):
    feats = textstats.quality_features(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id", *[c.alias(k) for k, c in feats.items()]
    )


@q(
    "token_counts",
    """
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS INT)
             AS n_bpe
    FROM documents
    """,
)
def token_counts(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        textstats.token_count_ws(F.col("text")).cast("int").alias("n_ws"),
        textstats.token_count_bpe_ish(F.col("text")).cast("int").alias("n_bpe"),
    )


# real vocab-driven BPE (r3): the rank-ordered merge table lives in
# operators/textstats.BPE_MERGES (single source of truth) and is rendered
# into the oracle's VALUES list here. The oracle replays the identical
# algorithm as a recursive CTE: per word, segmentation starts as chars
# joined by chr(31); merge rank rk is applied to FIXPOINT (replace-all,
# re-checked — the recursion stays on rk while the pair still occurs, a
# merge can create new occurrences of itself), then advances to rk+1.
_BPE_VALUES = ", ".join(
    f"({i + 1}, '{x}', '{y}')"
    for i, (x, y) in enumerate(textstats.BPE_MERGES)
)

_BPE_SQL = f"""
    WITH RECURSIVE merges(mrank, x, y) AS (VALUES {_BPE_VALUES}),
    words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
      WHERE w <> ''),
    init AS (
      SELECT doc_id, w,
             chr(31) || array_to_string(list_transform(generate_series(1, length(w)),
                                                       i -> substr(w, i, 1)), chr(31))
                     || chr(31) AS seg
      FROM words),
    steps AS (
      SELECT doc_id, w, seg, 1 AS rk FROM init
      UNION ALL
      SELECT s.doc_id, s.w,
             CASE WHEN contains(s.seg, chr(31) || m.x || chr(31) || m.y || chr(31))
                  THEN replace(s.seg, chr(31) || m.x || chr(31) || m.y || chr(31),
                               chr(31) || m.x || m.y || chr(31))
                  ELSE s.seg END,
             CASE WHEN contains(s.seg, chr(31) || m.x || chr(31) || m.y || chr(31))
                  THEN s.rk ELSE s.rk + 1 END
      FROM steps s JOIN merges m ON m.mrank = s.rk),
    done AS (
      SELECT doc_id, seg FROM steps
      WHERE rk = (SELECT max(mrank) + 1 FROM merges)),
    counts AS (
      SELECT doc_id,
             sum(length(seg) - length(replace(seg, chr(31), '')) - 1) AS n
      FROM done GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens_bpe
    FROM documents d LEFT JOIN counts c USING (doc_id)
"""


@q("token_counts_bpe", _BPE_SQL)
def token_counts_bpe(spark, sf_dir):
    cnt = textstats.token_count_bpe_udf()
    return _t(spark, sf_dir, "documents").select(
        "doc_id", cnt(F.col("text")).alias("n_tokens_bpe")
    )


@q(
    "fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_doc,
           list_min(list_transform(generate_series(1, greatest(length(text) - 3, 1)),
                                   i -> md5(substr(text, i, 4)))) AS fp_kgram
    FROM documents
    """,
)
def fingerprint(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        textstats.fingerprint_md5(F.col("text")).alias("fp_doc"),
        textstats.fingerprint_kgram_min(F.col("text"), 4).alias("fp_kgram"),
    )


@q(
    "stratified_sample",
    # deterministic hash-ordered stratified sampling: ≤20 docs per language,
    # selected by md5(doc_id) — reproducible, RNG-free, engine-portable
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) WHERE rk <= 20
    """,
)
def stratified_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return textstats.stratified_sample(docs, per_group=20).select("doc_id", "lang")


@q(
    "decontaminate",
    # benchmark decontamination: docs sharing any 3-word shingle with the
    # 'benchmark' subset (doc_id < 25); shingles travel as md5
    """
    WITH d AS (SELECT doc_id, text FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM d)),
    corpus AS (SELECT doc_id, md5(unnest(sh)) AS h FROM sh),
    bench AS (SELECT DISTINCT md5(unnest(sh)) AS h FROM sh WHERE doc_id < 25)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM corpus WHERE h IN (SELECT h FROM bench)
    GROUP BY doc_id
    """,
)
def decontaminate(spark, sf_dir):
    docs = _spread(_t(spark, sf_dir, "documents"))
    return textstats.decontaminate(
        docs, docs.where(F.col("doc_id") < 25), k=3
    )


@q(
    "decontaminate_fuzzy",
    # NEAR-dup decontamination: the corpus contains perturbed copies of
    # benchmark docs (doc_id+200000 = bench text + an appended tail, which
    # breaks exact-duplicate checks but leaves most minhash bands intact);
    # flag docs sharing ANY band with the benchmark subset (doc_id < 25)
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text || ' znear tail words'
      FROM documents WHERE doc_id < 10
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM d)
    ),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, s -> md5('seed0:' || s))) AS mh0,
             list_min(list_transform(sh, s -> md5('seed1:' || s))) AS mh1,
             list_min(list_transform(sh, s -> md5('seed2:' || s))) AS mh2,
             list_min(list_transform(sh, s -> md5('seed3:' || s))) AS mh3
      FROM sh),
    bands AS (
      SELECT 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key, doc_id FROM sig
      UNION ALL
      SELECT 1 AS band_id, md5(mh2 || '|' || mh3) AS band_key, doc_id FROM sig),
    bench AS (
      SELECT DISTINCT band_id, band_key FROM bands WHERE doc_id < 25
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bands_hit
    FROM bands JOIN bench USING (band_id, band_key)
    GROUP BY doc_id
    """,
)
def decontaminate_fuzzy(spark, sf_dir):
    """Near-dup benchmark decontamination (textstats.decontaminate_fuzzy):
    MinHash-band overlap against the broadcast benchmark band set — the
    recall companion to the exact k-gram pass (a perturbed copy of an eval
    doc keeps most bands while losing its exact shingles)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = _spread(
        docs.select("doc_id", "text").unionByName(
            docs.where(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" znear tail words")).alias("text"),
            )
        )
    )
    return textstats.decontaminate_fuzzy(
        corpus, corpus.where(F.col("doc_id") < 25)
    )


# end-to-end curation pipeline: the composed pass a training-data user
# actually runs — language gate → quality gate → exact dedup → benchmark
# decontamination → per-language stratified sample — as ONE declarative
# Catalyst plan. The SQL twin composes the SAME proven fragments as the
# stage-level oracles (lang_id, quality_score, dedup_exact, decontaminate,
# stratified_sample), so a mismatch localizes to composition, not stages.
_CURATION_SQL = r"""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, lang, text FROM documents WHERE doc_id < 50),
    feat AS (
      SELECT doc_id, lang, text, ' ' || lower(text) || ' ' AS p,
             length(text) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct
      FROM d),
    lid AS (
      SELECT doc_id, lang, text, n_chars, n_tokens, n_punct,
        CAST((length(p) - length(replace(p, ' the ', ''))) / 5
           + (length(p) - length(replace(p, ' and ', ''))) / 5
           + (length(p) - length(replace(p, ' of ', ''))) / 4 AS INT) AS s_en,
        CAST((length(p) - length(replace(p, ' der ', ''))) / 5
           + (length(p) - length(replace(p, ' und ', ''))) / 5
           + (length(p) - length(replace(p, ' die ', ''))) / 5 AS INT) AS s_de,
        CAST((length(p) - length(replace(p, ' le ', ''))) / 4
           + (length(p) - length(replace(p, ' et ', ''))) / 4
           + (length(p) - length(replace(p, ' les ', ''))) / 5 AS INT) AS s_fr,
        CAST((length(p) - length(replace(p, ' el ', ''))) / 4
           + (length(p) - length(replace(p, ' y ', ''))) / 3
           + (length(p) - length(replace(p, ' los ', ''))) / 5 AS INT) AS s_es
      FROM feat),
    sc AS (
      SELECT doc_id, lang, text, n_tokens,
        CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'unknown'
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es' END AS lang_guess,
        round(CAST(
            CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN (CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) * 1.0 / n_tokens ELSE 0.0 END) >= 3
                  AND (CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) * 1.0 / n_tokens ELSE 0.0 END) <= 12
                 THEN 0.3 ELSE 0.0 END
          + CASE WHEN (CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END) < 0.2 THEN 0.2 ELSE 0.0 END
          + CASE WHEN (CASE WHEN n_tokens > 0 THEN (s_en + s_de + s_fr + s_es) * 1.0 / n_tokens ELSE 0.0 END) > 0.01
                 THEN 0.1 ELSE 0.0 END AS DOUBLE), 2) AS quality
      FROM lid),
    kept AS (SELECT * FROM sc WHERE lang_guess <> 'unknown' AND quality >= 0.95),
    uniq AS (
      SELECT doc_id, lang, lang_guess, quality, n_tokens, text FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM kept)
      WHERE doc_id = keeper),
    bsh AS (
      SELECT DISTINCT md5(sh) AS h FROM (
        SELECT unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 1)),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS sh
        FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE doc_id < 25))),
    cont AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, md5(unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 1)),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))))) AS h
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM uniq))
      WHERE h IN (SELECT h FROM bsh)),
    clean AS (SELECT * FROM uniq WHERE doc_id NOT IN (SELECT doc_id FROM cont))
    SELECT doc_id, lang, lang_guess, quality, CAST(n_tokens AS BIGINT) AS n_tokens FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM clean) WHERE rk <= 10
"""


@q("curation_pipeline", _CURATION_SQL)
def curation_pipeline(spark, sf_dir):
    """The whole training-data curation pass as one declarative plan:
    language-ID gate -> quality gate -> exact dedup (lowest-id survivor per
    digest) -> benchmark decontamination (3-gram shingle overlap with the
    doc_id<25 eval set) -> deterministic per-language stratified sample.

    Scale shape (100 TB corpus): the lang/quality stages are pure
    whole-stage-codegen projections fused into the scan (filters push
    down); dedup is ONE shuffle keyed on md5(text) (16-byte key, text
    never travels as the shuffle key); decontamination broadcasts the
    benchmark shingle set and anti-joins the (tiny) contaminated id set;
    the sample is ONE shuffle on lang with a per-group window. Total: two
    data shuffles + two broadcasts for five pipeline stages — each stage's
    individual operator is separately oracled, this entry pins their
    COMPOSITION (filter ordering, survivor selection, join semantics).
    """
    d = _t(spark, sf_dir, "documents")
    docs = _spread(
        d.select("doc_id", "lang", "text").unionByName(
            d.where(F.col("doc_id") < 50).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "lang", "text"
            )
        )
    )
    feats = textstats.quality_features(F.col("text"))
    scored = docs.select(
        "doc_id", "lang", "text",
        textstats.lang_id_guess(F.col("text")).alias("lang_guess"),
        feats["quality"].alias("quality"),
        feats["n_tokens"].alias("n_tokens"),
    )
    # materialize the gate columns BEFORE filtering on them: pushing the
    # filter through the projection substitutes both full gate expression
    # trees into one Filter, which has no subexpression elimination and
    # exceeds the JIT method-size limit (interpreted bytecode — measured
    # 10 s for the filter alone at sf1.0 vs ~1 s for the projection); after
    # the barrier the filter tests two attributes (r6)
    from crawld_spark.operators.ckpt import ckpt_lazy

    scored = ckpt_lazy(scored)
    kept = scored.where(
        (F.col("lang_guess") != "unknown") & (F.col("quality") >= 0.95)
    )
    uniq = (
        kept.withColumn(
            "_keeper", F.min("doc_id").over(Window.partitionBy(F.md5("text")))
        )
        .where(F.col("doc_id") == F.col("_keeper"))
        .drop("_keeper")
    )
    # three consumers (decontaminate shingles, the anti-join, the sample):
    # materialize the gated+deduped frame once (r6)
    uniq = ckpt_lazy(uniq)
    bench = d.where(F.col("doc_id") < 25)
    cont = textstats.decontaminate(uniq, bench, k=3).select("doc_id")
    clean = uniq.join(F.broadcast(cont), on="doc_id", how="left_anti")
    return textstats.stratified_sample(
        clean, per_group=10, group_col="lang"
    ).select("doc_id", "lang", "lang_guess", "quality", "n_tokens")


@q(
    "quality_rules",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ), g AS (
      SELECT doc_id, len(ws) AS n_words,
        round(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 6) AS dup_word_frac,
        round(list_max(list_transform(list_distinct(ws),
              u -> len(list_filter(ws, x -> x = u)))) * 1.0 / len(ws), 6)
          AS top_word_frac,
        list_transform(generate_series(1, len(ws) - 1),
              i -> ws[i] || ' ' || ws[i+1]) AS bg
      FROM w
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, dup_word_frac,
      top_word_frac,
      round(list_max(list_transform(list_distinct(bg),
            u -> len(list_filter(bg, x -> x = u)))) * 1.0 / len(bg), 6)
        AS top_2gram_frac,
      (dup_word_frac <= 0.6 AND top_word_frac <= 0.2
       AND n_words BETWEEN 10 AND 10000) AS keep
    FROM g
    """,
)
def quality_rules(spark, sf_dir):
    """Gopher/C4-style repetition gates (textstats.repetition_features):
    duplicate-word fraction, top-word share, top-2-gram share, composite
    keep — one shuffle-free whole-stage-codegen projection."""
    feats = textstats.repetition_features(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id", *[c.alias(k) for k, c in feats.items()]
    )


# The synthetic corpus carries no PII, so the query *injects* a
# deterministic email + phone per document (pure concat, identical on both
# engines) and then scrubs it — the oracle checks detection counts AND the
# redacted text byte-for-byte (via md5).
_PII_INJECT_SQL = (
    "text || ' contact user' || doc_id || '@mail' || (doc_id % 7) || "
    "'.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "|| ' now'"
)

@q(
    "pii_scrub",
    f"""
    WITH i AS (SELECT doc_id, {_PII_INJECT_SQL} AS t FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(t, '{textstats.PII_EMAIL_RE}')) AS BIGINT)
        AS n_emails,
      CAST(len(regexp_extract_all(t, '\\+1-555-[0-9]{{4}}')) AS BIGINT)
        AS n_phones,
      md5(regexp_replace(regexp_replace(t, '{textstats.PII_EMAIL_RE}',
          '<EMAIL>', 'g'), '\\+1-555-[0-9]{{4}}', '<PHONE>', 'g'))
        AS scrub_md5
    FROM i
    """,
)
def pii_scrub(spark, sf_dir):
    """PII redaction pass (textstats.pii_scrub): typed placeholder
    substitution + redaction counts, JVM regexp only — a pure mapper."""
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    s = textstats.pii_scrub(injected)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        s["n_emails"].alias("n_emails"),
        s["n_phones"].alias("n_phones"),
        F.md5(s["scrubbed"]).alias("scrub_md5"),
    )


# Paragraph dedup needs cross-document duplicate paragraphs, which the
# random-word corpus lacks — so the query prepends a per-source boilerplate
# chunk (the 'same nav-bar on every page of a site' reality), identically
# on both engines, then dedups chunks corpus-wide keep-first.
_PARA_BOILER_SQL = (
    "'promo ' || source || ' official portal best content visit our site "
    "today ' || text"
)

@q(
    "dedup_paragraphs",
    f"""
    WITH w AS (
      SELECT doc_id,
        list_filter(string_split({_PARA_BOILER_SQL}, ' '), x -> x <> '') AS ws
      FROM documents
    ), c AS (
      SELECT doc_id, i AS pos,
        array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM w, unnest(generate_series(0, CAST(ceil(len(ws)/8.0) AS INT) - 1))
             AS t(i)
    ), r AS (
      SELECT doc_id, pos, chunk,
        row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) AS rn
      FROM c
    )
    SELECT doc_id,
      count(*) AS n_chunks,
      count(*) FILTER (WHERE rn = 1) AS n_kept,
      md5(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
                   '')) AS clean_md5
    FROM r GROUP BY doc_id
    """,
)
def dedup_paragraphs(spark, sf_dir):
    """Dolma-style corpus-wide paragraph dedup (dedup.paragraph_dedup):
    keep-first exact chunk dedup + per-document reassembly. The oracle's
    window formulation is semantically identical to the engine's
    skew-immune groupBy(min-struct)+join shape (see the operator
    docstring for why the engine never windows by chunk hash)."""
    docs = _spread(
        _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.lit("promo "), F.col("source"),
                F.lit(" official portal best content visit our site today "),
                F.col("text"),
            ).alias("text"),
        )
    )
    return dedup.paragraph_dedup(docs, chunk_words=8)


_HOST_SYNTH_SQL = (
    "'sub' || (doc_id % 5) || '.site' || (doc_id % 11) || '.example.com'"
)
_NAV_WORDS = (
    "home about contact privacy terms careers promo offers banner footer"
    " sitemap login search help"
)


@q(
    "boilerplate_strip",
    # every doc gets its HOST's 16-word nav prefix (2 full 8-word chunks
    # shared by all docs of the host) ahead of its unique text: the
    # host-conditioned frequency gate must strip exactly those chunks
    f"""
    WITH d AS (
      SELECT doc_id, {_HOST_SYNTH_SQL} AS host,
             'nav ' || {_HOST_SYNTH_SQL} || ' {_NAV_WORDS} ' || text AS text
      FROM documents
    ), w AS (
      SELECT doc_id, host,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM d
    ), c AS (
      SELECT doc_id, host, i AS pos,
             array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM w, unnest(generate_series(0, CAST(ceil(len(ws)/8.0) AS INT) - 1))
             AS t(i)
    ), nd AS (
      SELECT host, md5(chunk) AS h, count(DISTINCT doc_id) AS ndc
      FROM c GROUP BY host, md5(chunk)
    ), hd AS (
      SELECT host, count(DISTINCT doc_id) AS hn FROM d GROUP BY host
    ), bl AS (
      SELECT host, h FROM nd JOIN hd USING (host)
      WHERE hn >= 3 AND ndc * 2 >= hn
    ), m AS (
      SELECT c.doc_id, c.pos, c.chunk, (bl.h IS NOT NULL) AS boiler
      FROM c LEFT JOIN bl ON bl.host = c.host AND bl.h = md5(c.chunk)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      CAST(count(*) FILTER (WHERE boiler) AS BIGINT) AS n_boiler,
      md5(coalesce(string_agg(chunk, ' ' ORDER BY pos)
                     FILTER (WHERE NOT boiler), '')) AS clean_md5
    FROM m GROUP BY doc_id
    """,
)
def boilerplate_strip(spark, sf_dir):
    """Per-host boilerplate removal (dedup.boilerplate_strip): chunks
    frequent within a HOST are stripped site-wide — the RefinedWeb/CCNet
    line-dedup discipline, host-conditioned (corpus-global paragraph_dedup
    keeps one copy; this keeps none on the offending host and leaves other
    hosts alone). Pure-integer frequency gate, no float ratio."""
    host = F.concat(
        F.lit("sub"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".site"), (F.col("doc_id") % 11).cast("string"),
        F.lit(".example.com"),
    )
    d = _spread(
        _t(spark, sf_dir, "documents").select(
            "doc_id",
            host.alias("host"),
            F.concat(
                F.lit("nav "), host, F.lit(f" {_NAV_WORDS} "), F.col("text")
            ).alias("text"),
        )
    )
    return dedup.boilerplate_strip(d, chunk_words=8)


@q(
    "lm_familiarity",
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ), b AS (
      SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS bg
      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    ), cb AS (
      SELECT bg, any_value(w1) AS w1, count(*) AS cb FROM b GROUP BY bg
    ), cw AS (
      SELECT w1, count(*) AS cw FROM b GROUP BY w1
    ), m AS (
      SELECT bg, CAST(floor(ln(cb * 1.0 / cw) * 1000000.0) AS BIGINT) AS qlp
      FROM cb JOIN cw USING (w1)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(qlp) AS BIGINT) AS sum_qlp,
           round(CAST(sum(qlp) AS BIGINT) * 1.0 / count(*) / 1000000.0, 6)
             AS lm_score
    FROM b JOIN m USING (bg)
    GROUP BY doc_id
    """,
)
def lm_familiarity(spark, sf_dir):
    """CCNet-style corpus-self-trained bigram LM familiarity
    (textstats.lm_bigram_scores): per-doc mean conditional log-prob,
    integer-quantized at the bigram-type level so cross-engine sums are
    order-independent. The perplexity-bucket quality split standard in
    web-corpus curation, closed-world on the documents table."""
    return textstats.lm_bigram_scores(_spread(_t(spark, sf_dir, "documents")))


# The corpus has no host column, so the lane synthesizes a 4-label host per
# document (identically on both engines) and marks it against a small
# deterministic blocklist with UT1 suffix semantics.
_BLOCKLIST = ["site3.example.com", "sub2.site7.example.com", "spam.example.org"]

@q(
    "host_blocklist",
    f"""
    WITH d AS (
      SELECT doc_id, {_HOST_SYNTH_SQL} AS host FROM documents
    ), bl(entry) AS (
      VALUES {", ".join(f"('{e}')" for e in _BLOCKLIST)}
    )
    SELECT doc_id, host,
      EXISTS (SELECT 1 FROM bl
              WHERE host = entry OR ends_with(host, '.' || entry)) AS blocked
    FROM d
    """,
)
def host_blocklist(spark, sf_dir):
    """UT1-style domain-blocklist marking (urlfilter.blocklist_mark): a
    listed domain blocks itself and every subdomain. Engine shape: K
    chained BroadcastHashJoins (one per label depth) — zero corpus
    shuffle, no row explosion, no O(rows x entries) nested loop (see the
    operator's module docstring); the oracle states the same suffix
    semantics declaratively."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("sub"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".site"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
    )
    from crawld_spark.session import local_df

    bl = local_df(spark, [(e,) for e in _BLOCKLIST], "entry string", ["entry"])
    return urlfilter.blocklist_mark(d, bl, max_labels=4).select(
        "doc_id", "host", "blocked"
    )


# ExactSubstr-style duplicated spans need corpus-wide repeated 5-grams,
# which the random-word corpus lacks — reuse dedup_paragraphs' boilerplate
# injection (the shared nav-bar prefix every page of a site carries).
@q(
    "dedup_spans",
    f"""
    WITH i AS (
      SELECT doc_id, {_PARA_BOILER_SQL} AS text FROM documents
    ), w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM i
    ), o AS (
      SELECT doc_id, i - 1 AS pos, md5(array_to_string(ws[i:i+4], ' ')) AS h
      FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)
      WHERE len(ws) >= 5
    ), d AS (SELECT h FROM o GROUP BY h HAVING count(*) > 1),
    m AS (SELECT o.doc_id, o.pos FROM o JOIN d USING (h)),
    cov AS (
      SELECT doc_id, count(DISTINCT pos) AS n_dup_kgrams,
             count(DISTINCT wi) AS n_covered_words
      FROM m, unnest(generate_series(pos, pos + 4)) AS t(wi)
      GROUP BY doc_id
    ), base AS (
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             CAST(greatest(len(ws) - 4, 0) AS BIGINT) AS n_kgrams
      FROM w
    )
    SELECT base.doc_id, n_words, n_kgrams,
      CAST(coalesce(n_dup_kgrams, 0) AS BIGINT) AS n_dup_kgrams,
      CAST(coalesce(n_covered_words, 0) AS BIGINT) AS n_covered_words,
      round(coalesce(n_covered_words, 0) * 1.0 / greatest(n_words, 1), 6)
        AS covered_frac
    FROM base LEFT JOIN cov USING (doc_id)
    """,
)
def dedup_spans(spark, sf_dir):
    """ExactSubstr-style duplicated-span detection (dedup.duplicated_spans,
    Lee et al. 2022 relational form): corpus-wide repeated 5-grams mark
    their occurrences; per-doc covered-word fraction drives the span-cut
    decision. Hash-aggregation stands in for the paper's suffix array —
    shuffle keys are digests and (id, int) pairs, text never shuffles."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("promo "), F.col("source"),
            F.lit(" official portal best content visit our site today "),
            F.col("text"),
        ).alias("text"),
    )
    return dedup.duplicated_spans(docs, k=5)


@q(
    "quality_classifier",
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ), s AS (
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        CAST(coalesce(list_sum(list_transform(ws,
          w -> (CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 4096)
               * 2654435761 % 4001 - 2000)), 0) AS BIGINT) AS score_sum
      FROM w
    )
    SELECT doc_id, n_tokens, score_sum,
      round(score_sum * 1.0 / greatest(n_tokens, 1), 6) AS clf_score,
      (round(score_sum * 1.0 / greatest(n_tokens, 1), 6) > 0) AS keep
    FROM s
    """,
)
def quality_classifier(spark, sf_dir):
    """Model-based quality filter, fastText/VW inference shape
    (textstats.hashed_classifier_features): feature-hashed token buckets →
    per-bucket weight → mean score → keep gate. Pure whole-stage-codegen
    mapper — zero shuffle, zero Python; a trained weight vector drops in
    without changing the plan shape (see the operator docstring)."""
    feats = textstats.hashed_classifier_features(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id", *[c.alias(k) for k, c in feats.items()]
    )


@q(
    "recrawl_priority",
    # synthesized fetch history: every doc observed at rounds 1..6, its
    # content version bumping every (doc_id % 3)+1 rounds — three distinct
    # ground-truth change rates the estimator must recover exactly
    """
    WITH h AS (
      SELECT 'http://d/' || doc_id AS url, r AS round_id,
             md5(doc_id || '|' || (r // ((doc_id % 3) + 1))) AS digest
      FROM documents, unnest(generate_series(1, 6)) AS t(r)
    ), p AS (
      SELECT url, round_id, digest,
             lag(digest) OVER (PARTITION BY url ORDER BY round_id) AS prev
      FROM h
    ), a AS (
      SELECT url, CAST(count(*) AS BIGINT) AS n_obs,
        CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> digest
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
        CAST(max(round_id) AS BIGINT) AS last_round
      FROM p GROUP BY url
    )
    SELECT url, n_obs, n_changes, last_round,
      CAST((1000000 * n_changes) // greatest(n_obs - 1, 1) AS BIGINT)
        AS lambda_q,
      CAST(8 - last_round AS BIGINT) AS staleness,
      CAST(((1000000 * n_changes) // greatest(n_obs - 1, 1))
           * (8 - last_round) AS BIGINT) AS priority_q
    FROM a
    """,
)
def recrawl_priority(spark, sf_dir):
    """Freshness-driven recrawl scheduling (freshness.change_rate): the
    per-URL change-rate estimate from fetch history, int64-quantized, and
    the staleness-weighted recrawl ordering key. The history window
    partitions by URL (state bounded by revisit count); digests travel,
    never bytes."""
    from crawld_spark.operators import freshness

    hist = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .select(
            F.concat(F.lit("http://d/"), F.col("doc_id").cast("string")).alias("url"),
            F.explode(F.sequence(F.lit(1), F.lit(6))).alias("round_id"),
            F.col("doc_id"),
        )
        .select(
            "url",
            "round_id",
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.expr("round_id div ((doc_id % 3) + 1)").cast("string"),
                )
            ).alias("digest"),
        )
    )
    return freshness.change_rate(hist, now_round=8)


# deterministic synthetic link graph over documents: two arithmetic
# out-links per doc plus a hub edge to node 0 (everyone links the
# homepage — the hot-key case PageRank must survive at web scale)
_PR_ITER = 5


def _pagerank_ctes(n_iter: int = _PR_ITER) -> list[str]:
    ctes = [
        """e AS (
      SELECT doc_id AS src,
             unnest([(doc_id * 7 + 1) % n, (doc_id * 13 + 3) % n,
                     CAST(0 AS BIGINT)]) AS dst
      FROM documents, (SELECT count(*) AS n FROM documents))""",
        """nodes AS (SELECT DISTINCT node FROM
      (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src)",
        """base AS (SELECT node, coalesce(out_deg, 0) AS out_deg
      FROM nodes LEFT JOIN deg ON node = src)""",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_q FROM base)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""c{i} AS (
      SELECT dst, sum(rank_q // out_deg) AS in_sum
      FROM r{i - 1} r JOIN base USING (node) JOIN e ON node = e.src
      WHERE out_deg > 0 GROUP BY dst)"""
        )
        ctes.append(
            f"""r{i} AS (
      SELECT node, CAST(150000 + (coalesce(in_sum, 0) * 85) // 100 AS BIGINT)
               AS rank_q
      FROM base LEFT JOIN c{i} ON node = dst)"""
        )
    return ctes


def _pagerank_sql(n_iter: int = _PR_ITER) -> str:
    return (
        "WITH "
        + ",\n    ".join(_pagerank_ctes(n_iter))
        + f"""
    SELECT node, rank_q, out_deg FROM r{n_iter} JOIN base USING (node)"""
    )


@q("pagerank", _pagerank_sql())
def pagerank(spark, sf_dir):
    """Integer-exact PageRank over a deterministic link graph
    (operators/graph.pagerank): int64 micro-unit ranks, exact `div`
    arithmetic, fixed iterations — the DuckDB twin unrolls the loop and
    must match bit-for-bit. Node 0 is a hub (every doc links it): the
    hot-key inbound sum is exactly the map-side-combinable case."""
    from crawld_spark.operators import graph

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                (F.col("doc_id") * 7 + 1) % n,
                (F.col("doc_id") * 13 + 3) % n,
                F.lit(0).cast("long"),
            )
        ).alias("dst"),
    )
    return graph.pagerank(edges, n_iter=_PR_ITER)


@q(
    "sequence_packing",
    """
    WITH w AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
        sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM w
    )
    SELECT doc_id, n_tokens,
      CAST(cum - n_tokens AS BIGINT) AS start_off,
      CAST(CASE WHEN n_tokens > 0 THEN (cum - n_tokens) // 256 END
           AS BIGINT) AS first_seq,
      CAST(CASE WHEN n_tokens > 0 THEN (cum - 1) // 256 END
           AS BIGINT) AS last_seq,
      CAST(CASE WHEN n_tokens > 0
           THEN (cum - 1) // 256 - (cum - n_tokens) // 256 + 1
           ELSE 0 END AS BIGINT) AS n_seqs,
      CASE WHEN n_tokens > 0
           THEN (cum - 1) // 256 > (cum - n_tokens) // 256
           ELSE FALSE END AS crosses_boundary
    FROM c
    """,
)
def sequence_packing(spark, sf_dir):
    """Training-sequence packing manifest (textstats.pack_sequences):
    concat-and-chunk documents in doc_id order into 256-token sequences.
    The oracle's ORDER BY window IS the scale trap the engine avoids — the
    Spark side runs the two-phase range-partitioned prefix sum
    (plans/rank.global_prefix_sum), no single-partition exchange."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).cast("long").alias("n_tokens"),
    )
    return textstats.pack_sequences(d, seq_len=256)


@q(
    "materialize_sequences",
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ), c AS (
      SELECT doc_id, ws,
        sum(len(ws)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - len(ws) AS start_off
      FROM w
    ), t AS (
      SELECT doc_id, start_off + i - 1 AS gpos, ws[i] AS w
      FROM c, unnest(generate_series(1, len(ws))) AS u(i)
    )
    SELECT CAST(gpos // 256 AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           md5(string_agg(w, ' ' ORDER BY gpos)) AS seq_md5
    FROM t GROUP BY 1
    """,
)
def materialize_sequences(spark, sf_dir):
    """Materialized 256-token training sequences
    (textstats.materialize_sequences): the concat-and-chunk stream cut
    into blocks and reassembled, md5 per block. The oracle replays it one
    word at a time; the engine emits per-FRAGMENT rows (a doc adds
    ceil(n/L)+1 rows max) and assembles with a seq_len-bounded groupBy —
    each token's text shuffles exactly once, keyed by an integer."""
    return textstats.materialize_sequences(
        _t(spark, sf_dir, "documents"), seq_len=256
    )


@q(
    "length_percentile_filter",
    """
    WITH w AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS BIGINT) AS n_tokens
      FROM documents
    ), t AS (
      SELECT quantile_cont(n_tokens, 0.05) AS lo,
             quantile_cont(n_tokens, 0.95) AS hi
      FROM w
    )
    SELECT doc_id, n_tokens,
      round(lo, 6) AS lo_thresh, round(hi, 6) AS hi_thresh,
      (n_tokens >= lo AND n_tokens <= hi) AS keep
    FROM w, t
    """,
)
def length_percentile_filter(spark, sf_dir):
    """Corpus-percentile length trimming (textstats.
    percentile_length_filter): keep docs inside the [P5, P95] token-count
    band computed from the corpus itself. Spark's exact `percentile` and
    DuckDB's `quantile_cont` share the linear-interpolation definition —
    the oracle gates that equivalence; the threshold frame broadcasts."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).cast("long").alias("n_tokens"),
    )
    return textstats.percentile_length_filter(d, lo=0.05, hi=0.95)


@q(
    "tfidf_top_terms",
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(ws) AS term FROM w
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY 1
    ), n AS (SELECT count(*) AS n FROM documents),
    idf AS (
      SELECT term, df,
             CAST(floor(ln(n * 1.0 / df) * 1000000.0) AS BIGINT) AS idf_q
      FROM df, n
    ), s AS (
      SELECT doc_id, tf.term AS term, tf, df, tf * idf_q AS score_q
      FROM tf JOIN idf USING (term)
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_q DESC, term ASC) AS rank
      FROM s
    )
    SELECT doc_id, term, tf, df, CAST(score_q AS BIGINT) AS score_q,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by TF-IDF
    (textstats.tfidf_top_terms). IDF is int64-quantized at the term-type
    level (floor(ln(N/df)*1e6), the lm_familiarity trick) so scores and
    ranks are integer-exact across engines; ties break on the term."""
    # no _spread: the lane is bound by the (doc, term) aggregation
    # shuffle, not per-row compute — the repartition only added overhead
    return textstats.tfidf_top_terms(
        _t(spark, sf_dir, "documents"), k=3
    )


# =====================================================================
# 3. engine UDFs under the oracle gate (canonicalization + extraction)
# =====================================================================

@q(
    "url_canonicalize",
    # oracle states the *specification* (functions/url.py rules) for the
    # constructed inputs; Spark runs the real pandas UDF
    """
    SELECT doc_id,
           'HTTP://Host' || (doc_id % 7) || '.Example.COM:80/Path/' || doc_id
             || CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END AS raw_url,
           'http://host' || (doc_id % 7) || '.example.com/Path/' || doc_id AS canon_url
    FROM documents
    """,
)
def url_canonicalize(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTP://Host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM:80/Path/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        raw.alias("raw_url"),
        canonicalize_url(raw).alias("canon_url"),
    )


@q(
    "warc_roundtrip",
    # WARC (ISO 28500) ingest gate: Spark serializes each Arrow batch of
    # documents into ONE multi-record WARC blob (sources/warc.warc_bytes_of
    # — real framing, HTTP envelopes, Content-Length walk), parses it back
    # (parse_warc_bytes) and extracts the text; the oracle asserts byte
    # identity end-to-end (the input_hint invariant through a WARC hop).
    """
    SELECT doc_id,
           'http://d/' || doc_id AS roundtrip_url,
           text AS extracted
    FROM documents
    """,
)
def warc_roundtrip(spark, sf_dir):
    from crawld_spark.functions.extract import extract_text_one, wrap_html_one
    from crawld_spark.sources.warc import parse_warc_bytes, warc_bytes_of

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def rt(batches):
        import pandas as pd

        base = pd.Timestamp("2024-01-01", tz="UTC")
        for b in batches:
            if not len(b):
                continue
            recs = [
                (
                    f"http://d/{int(i)}",
                    base + pd.Timedelta(seconds=int(i)),
                    wrap_html_one(f"http://d/{int(i)}", t, []),
                )
                for i, t in zip(b["doc_id"], b["text"])
            ]
            parsed, skipped = parse_warc_bytes(warc_bytes_of(recs))
            assert skipped == 0 and len(parsed) == len(recs)
            yield pd.DataFrame(
                {
                    "doc_id": [int(r["url"].rsplit("/", 1)[1]) for r in parsed],
                    "roundtrip_url": [r["url"] for r in parsed],
                    "extracted": [extract_text_one(r["html"]) for r in parsed],
                }
            )

    return d.mapInPandas(
        rt, schema="doc_id long, roundtrip_url string, extracted string"
    )


@q(
    "sitemap_roundtrip",
    # sitemap (sitemaps.org) ingest gate: Spark serializes each Arrow batch
    # of documents into ONE <urlset> (functions/sitemap.sitemap_xml_of),
    # parses it back (parse_sitemap_bytes) — loc/lastmod/priority must
    # survive the XML hop exactly (incl. &-escaping in the URL)
    """
    SELECT doc_id,
           'http://site' || (doc_id % 7) || '.com/page?id=' || doc_id
             || '&ref=sm' AS loc,
           strftime(TIMESTAMP '2024-01-01 00:00:00'
                    + INTERVAL (doc_id % 60) SECOND,
                    '%Y-%m-%dT%H:%M:%SZ') AS lastmod,
           (doc_id % 10) / 10.0 AS priority
    FROM documents
    """,
)
def sitemap_roundtrip(spark, sf_dir):
    from crawld_spark.functions.sitemap import (
        parse_sitemap_bytes,
        sitemap_xml_of,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def rt(batches):
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            ids = [int(i) for i in b["doc_id"]]
            xml = sitemap_xml_of(
                [
                    (
                        f"http://site{i % 7}.com/page?id={i}&ref=sm",
                        f"2024-01-01T00:00:{i % 60:02d}Z",
                        (i % 10) / 10.0,
                    )
                    for i in ids
                ]
            )
            parsed, skipped = parse_sitemap_bytes(xml)
            assert skipped == 0 and len(parsed) == len(ids)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "loc": [r["loc"] for r in parsed],
                    "lastmod": [
                        r["lastmod"].strftime("%Y-%m-%dT%H:%M:%SZ")
                        for r in parsed
                    ],
                    "priority": [r["priority"] for r in parsed],
                }
            )

    return d.mapInPandas(
        rt, schema="doc_id long, loc string, lastmod string, priority double"
    )


@q(
    "extract_text_roundtrip",
    # byte-identity through the driver's value-hash: Spark wraps text into
    # HTML and extracts it back; oracle asserts identity (input_hint gate)
    "SELECT doc_id, text AS extracted FROM documents",
)
def extract_text_roundtrip(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://d/"), F.col("doc_id").cast("string"))
    links = F.array().cast("array<string>")
    html = wrap_html(url, F.col("text"), links)
    return d.select("doc_id", extract_text(html).alias("extracted"))


@q(
    "extract_links_roundtrip",
    """
    SELECT doc_id, 'http://a.example.com/' || doc_id || '|http://b.example.com/' || doc_id
             AS links_joined
    FROM documents
    """,
)
def extract_links_roundtrip(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://d/"), F.col("doc_id").cast("string"))
    links = F.array(
        F.concat(F.lit("http://a.example.com/"), F.col("doc_id").cast("string")),
        F.concat(F.lit("http://b.example.com/"), F.col("doc_id").cast("string")),
    )
    html = wrap_html(url, F.col("text"), links)
    return d.select(
        "doc_id", F.concat_ws("|", extract_links(html)).alias("links_joined")
    )


# =====================================================================
# 4. multimodal plumbing (binary columns through mapInPandas)
# =====================================================================

@q(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST((octet_length(encode(text)) * 31) % 480 AS INT) AS height,
           3 AS channels
    FROM documents
    """,
)
def multimodal_meta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return decode_meta_stub(d, id_col="doc_id", payload_col="payload")


@q(
    "frame_sample",
    # REAL animation frame sampling (VERDICT r4 item 3): the engine encodes
    # a multi-frame GIF89a per doc (1 + doc_id%5 full-screen frames, local
    # palettes), decodes ALL frames back (full LZW + palette parse), and
    # keeps every 2nd source frame capped at 3 — the oracle states the
    # sampled (frame_idx → src_frame) mapping and per-doc geometry
    # arithmetically; pixel-level exactness (frame_md5 of decoded RGB) is
    # pinned by the engine golden (tests/test_similarity.py TestGifFrames).
    """
    WITH p AS (SELECT doc_id, CAST(1 + doc_id % 5 AS INT) AS nf,
                      CAST(3 + doc_id % 4 AS INT) AS w,
                      CAST(2 + doc_id % 3 AS INT) AS h
               FROM documents),
    f AS (SELECT doc_id, w, h, nf,
                 unnest(generate_series(0, least((nf + 1) // 2, 3) - 1)) AS k
          FROM p)
    SELECT doc_id, CAST(k AS INT) AS frame_idx, CAST(k * 2 AS INT) AS src_frame,
           w AS width, h AS height, nf AS n_frames
    FROM f
    """,
)
def frame_sample(spark, sf_dir):
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from crawld_spark.operators.multimodal import encode_gif_anim, frame_sample_gif

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"))
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for i in b["doc_id"]:
                i = int(i)
                nf, w, h = 1 + i % 5, 3 + i % 4, 2 + i % 3
                yy, xx = np.mgrid[0:h, 0:w]
                frames = []
                for f in range(nf):
                    v = (((i + 5 * f + 3 * xx + 7 * yy) % 6) * 40).astype(np.uint8)
                    frames.append(np.stack([v, 255 - v, (v * 2) % 256], axis=-1).astype(np.uint8))
                payloads.append(encode_gif_anim(frames))
            yield pd.DataFrame({"doc_id": b["doc_id"].values, "payload": payloads})

    gifs = d.mapInPandas(build, schema)
    return frame_sample_gif(
        gifs, id_col="doc_id", payload_col="payload", every_n=2, max_frames=3
    ).select("doc_id", "frame_idx", "src_frame", "width", "height", "n_frames")


@q(
    "multimodal_decode_roundtrip",
    # REAL decoder gate (r3): the engine builds a 24-bit BMP per doc with
    # doc_id-derived geometry (pure-numpy encode_bmp), then decodes it back
    # with the pure-numpy decoder; the oracle states the expected metadata
    # arithmetically (BMP size = 54 header bytes + 4-byte-padded rows).
    # Pixel-level exactness is asserted by the engine golden
    # (tests/test_similarity.py TestRealDecoders).
    """
    SELECT doc_id,
           CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           3 AS channels,
           'bmp' AS format
    FROM (SELECT doc_id, 2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h FROM documents)
    """,
)
def multimodal_decode_roundtrip(spark, sf_dir):
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from crawld_spark.operators.multimodal import decode_meta, encode_bmp

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"))
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for i in b["doc_id"]:
                i = int(i)
                w, h = 2 + i % 7, 1 + i % 5
                yy, xx = np.mgrid[0:h, 0:w]
                pix = ((i + xx + yy) % 256).astype(np.uint8)
                payloads.append(encode_bmp(np.stack([pix] * 3, axis=-1)))
            yield pd.DataFrame({"doc_id": b["doc_id"].values, "payload": payloads})

    bmps = d.mapInPandas(build, schema)
    return decode_meta(bmps, id_col="doc_id", payload_col="payload")


@q(
    "png_decode_roundtrip",
    # REAL PNG decoder gate (r4): the engine builds a non-interlaced 8-bit
    # PNG per doc — doc_id-derived geometry, alternating RGB/RGBA, and the
    # row FILTER TYPE cycling over all five (doc_id % 5), so every unfilter
    # path (none/sub/up/average/paeth) is exercised under the oracle gate —
    # then decodes it back (zlib inflate + numpy unfilter). n_bytes is
    # zlib-stream-dependent and has no arithmetic twin, so the oracle
    # checks the decoded geometry/channels/format columns. Pixel-level
    # exactness is asserted by the engine golden (tests/test_similarity.py
    # TestPngDecoder).
    """
    SELECT doc_id,
           CAST(2 + doc_id % 9 AS INT) AS width,
           CAST(1 + doc_id % 6 AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS INT) AS channels,
           'png' AS format
    FROM documents
    """,
)
def png_decode_roundtrip(spark, sf_dir):
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from crawld_spark.operators.multimodal import decode_meta, encode_png

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"))
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for i in b["doc_id"]:
                i = int(i)
                w, h, c = 2 + i % 9, 1 + i % 6, 3 if i % 2 == 0 else 4
                yy, xx = np.mgrid[0:h, 0:w]
                pix = np.stack(
                    [((i + xx + yy * (ch + 1)) % 256) for ch in range(c)], axis=-1
                ).astype(np.uint8)
                payloads.append(encode_png(pix, filter_type=i % 5))
            yield pd.DataFrame({"doc_id": b["doc_id"].values, "payload": payloads})

    pngs = d.mapInPandas(build, schema)
    return decode_meta(pngs, id_col="doc_id", payload_col="payload").select(
        "doc_id", "width", "height", "channels", "format"
    )


@q(
    "perplexity_buckets",
    # lm_familiarity's bigram-LM scores -> per-language tertile thresholds
    # (quantile_cont ≡ Spark's exact interpolated percentile) -> bucket
    """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ), b AS (
      SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS bg
      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    ), cb AS (
      SELECT bg, any_value(w1) AS w1, count(*) AS cb FROM b GROUP BY bg
    ), cw AS (
      SELECT w1, count(*) AS cw FROM b GROUP BY w1
    ), m AS (
      SELECT bg, CAST(floor(ln(cb * 1.0 / cw) * 1000000.0) AS BIGINT) AS qlp
      FROM cb JOIN cw USING (w1)
    ), sc AS (
      SELECT b.doc_id, d.lang,
             round(CAST(sum(qlp) AS BIGINT) * 1.0 / count(*) / 1000000.0, 6)
               AS lm_score
      FROM b JOIN m USING (bg) JOIN documents d ON d.doc_id = b.doc_id
      GROUP BY b.doc_id, d.lang
    ), th AS (
      SELECT lang,
             quantile_cont(lm_score, [CAST(1 AS DOUBLE)/3,
                                      CAST(2 AS DOUBLE)/3]) AS t
      FROM sc GROUP BY lang
    )
    SELECT doc_id, sc.lang, lm_score,
           round(t[1], 6) AS lo_thresh, round(t[2], 6) AS hi_thresh,
           CASE WHEN lm_score >= t[2] THEN 'head'
                WHEN lm_score >= t[1] THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc JOIN th ON th.lang = sc.lang
    """,
)
def perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus split (textstats.perplexity_buckets)
    over the self-trained bigram-LM familiarity score, thresholds computed
    per language — the standard perplexity-bucketed quality partition of a
    web corpus before LM training."""
    d = _t(spark, sf_dir, "documents")
    scored = textstats.lm_bigram_scores(_spread(d)).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    return textstats.perplexity_buckets(scored)


def _pq_ctes(
    m: int,
    ksub: int,
    n_iter: int,
    dim: int,
    include_source: bool = True,
    sample: int | None = None,
) -> list[str]:
    """CTE chain replaying pq.pq_train + pq_encode + the per-(qid, nid) ADC
    scores, verbatim: md5-ranked seed rows (subvector slices), per
    iteration one L2-argmin assignment over (vec_id, subspace) and one
    floor-mean codeword update, then ADC = sum over subspaces of
    dot(query subvector, assigned codeword). Ends with CTE ``padcs``
    (qid, nid, adc, nrec) and ``pqn`` (qid, nq). All internal CTEs are
    p-prefixed so the chain composes with _kmeans_train_ctes (the IVF-PQ
    twin); ``include_source=False`` skips the ``q``/``c`` source CTEs when
    the caller defines them. ``sample`` mirrors pq_train(train_sample=...):
    the codeword-update iterations run over the first ``sample`` corpus
    rows in (md5(vec_id), vec_id) order (a prefix of the seed ordering —
    pbook0 untouched); the FINAL assignment (= the encode, pa{n_iter})
    still covers the full corpus."""
    dsub = dim // m

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {dsub + 1}),"
            f" i -> {a}[i] * {b}[i])) AS BIGINT)"
        )

    def nsq(a: str) -> str:
        return f"CAST(list_sum(list_transform({a}, x -> x * x)) AS BIGINT)"

    mean = "(sm - ((sm % n + n) % n)) // n"
    subspaces = f"(SELECT unnest(generate_series(0, {m - 1})) AS s)"
    ctes = []
    if include_source:
        ctes += [
            f"q AS (SELECT vec_id AS qid, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id < 3)",
            f"c AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id >= 3)",
        ]
    ctes += [
        f"""pbook0 AS (
      SELECT t.s, sd.code, sd.qv[t.s * {dsub} + 1 : (t.s + 1) * {dsub}] AS cv
      FROM (
        SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                    AS INT) AS code, qv
        FROM c) sd CROSS JOIN {subspaces} t
      WHERE sd.code < {ksub})""",
        f"""psub AS (
      SELECT vec_id, t.s, qv[t.s * {dsub} + 1 : (t.s + 1) * {dsub}] AS sv
      FROM c CROSS JOIN {subspaces} t)""",
    ]
    tsub = "psub"
    if sample is not None:
        tsub = "psubts"
        ctes.append(
            f"""psubts AS (
      SELECT psub.* FROM psub JOIN (
        SELECT vec_id FROM c
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {sample}) ts
      ON ts.vec_id = psub.vec_id)"""
        )
    for i in range(1, n_iter + 1):
        isub = "psub" if i == n_iter else tsub  # final pass = the encode
        ctes.append(
            f"""pa{i} AS (
      SELECT vec_id, s, sv, code FROM (
        SELECT {isub}.vec_id, {isub}.s, {isub}.sv, b.code,
               row_number() OVER (PARTITION BY {isub}.vec_id, {isub}.s
                                  ORDER BY {nsq('b.cv')} - 2 * {dot(f'{isub}.sv', 'b.cv')} ASC,
                                           b.code) AS r
        FROM {isub} JOIN pbook{i - 1} b ON b.s = {isub}.s) WHERE r = 1)"""
        )
        if i < n_iter:
            ctes.append(
                f"""pu{i} AS (
      SELECT s, code, list({mean} ORDER BY pos) AS cv FROM (
        SELECT s, code, pos, CAST(sum(v) AS BIGINT) AS sm, count(*) AS n
        FROM (SELECT s, code, unnest(sv) AS v,
                     unnest(generate_series(1, len(sv))) AS pos FROM pa{i})
        GROUP BY s, code, pos)
      GROUP BY s, code)"""
            )
            ctes.append(
                f"""pbook{i} AS (
      SELECT p.s, p.code, coalesce(u.cv, p.cv) AS cv
      FROM pbook{i - 1} p LEFT JOIN pu{i} u ON u.s = p.s AND u.code = p.code)"""
            )
    ctes += [
        f"penc AS (SELECT vec_id, s, code FROM pa{n_iter})",
        f"""pqsub AS (
      SELECT qid, t.s, qv[t.s * {dsub} + 1 : (t.s + 1) * {dsub}] AS sv
      FROM q CROSS JOIN {subspaces} t)""",
        f"pqn AS (SELECT qid, {nsq('qv')} AS nq FROM q)",
        f"""pterms AS (
      SELECT qs.qid, e.vec_id AS nid,
             {dot('qs.sv', 'b.cv')} AS pd, {nsq('b.cv')} AS pn
      FROM penc e JOIN pbook{n_iter - 1} b ON b.s = e.s AND b.code = e.code
      JOIN pqsub qs ON qs.s = e.s)""",
        """padcs AS (
      SELECT qid, nid, CAST(sum(pd) AS BIGINT) AS adc,
             CAST(sum(pn) AS BIGINT) AS nrec
      FROM pterms GROUP BY qid, nid)""",
    ]
    return ctes


_PQ_M, _PQ_KSUB, _PQ_ITER, _PQ_DIM = 4, 8, 2, 64
_PQ_COS = (
    "adc / (sqrt(CAST(nq AS DOUBLE)) *"
    " sqrt(CAST(CASE WHEN nrec <= 0 THEN 1 ELSE nrec END AS DOUBLE)))"
)


def _pq_adc_sql() -> str:
    ctes = _pq_ctes(_PQ_M, _PQ_KSUB, _PQ_ITER, _PQ_DIM, sample=_TRAIN_SAMPLE)
    ctes.append(
        f"""ranked AS (
      SELECT a.qid, nid, {_PQ_COS} AS cos,
             row_number() OVER (PARTITION BY a.qid
                                ORDER BY {_PQ_COS} DESC, nid) AS rank
      FROM padcs a JOIN pqn ON pqn.qid = a.qid)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    SELECT qid, rank, nid, round(cos, 6) AS cos FROM ranked WHERE rank <= 5"
    )


def _pq_rerank_sql(k: int = 5, rfactor: int = 3) -> str:
    ctes = _pq_ctes(_PQ_M, _PQ_KSUB, _PQ_ITER, _PQ_DIM, sample=_TRAIN_SAMPLE)
    dim = _PQ_DIM

    def dotf(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {dim + 1}),"
            f" i -> {a}[i] * {b}[i])) AS BIGINT)"
        )

    def nsqf(a: str) -> str:
        return f"CAST(list_sum(list_transform({a}, x -> x * x)) AS BIGINT)"

    ctes += [
        f"""cand AS (
      SELECT qid, nid FROM (
        SELECT a.qid, nid,
               row_number() OVER (PARTITION BY a.qid
                                  ORDER BY {_PQ_COS} DESC, nid) AS r
        FROM padcs a JOIN pqn ON pqn.qid = a.qid) WHERE r <= {k * rfactor})""",
        f"""exact AS (
      SELECT cand.qid, cand.nid,
             {dotf('q.qv', 'c.qv')} /
               (sqrt(CAST({nsqf('q.qv')} AS DOUBLE)) *
                sqrt(CAST({nsqf('c.qv')} AS DOUBLE))) AS cos
      FROM cand JOIN q ON q.qid = cand.qid JOIN c ON c.vec_id = cand.nid)""",
        """rr AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM exact)""",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT qid, rank, nid, round(cos, 6) AS cos FROM rr WHERE rank <= {k}"
    )


_IVFPQ_CELLS, _IVFPQ_CITER, _IVFPQ_PROBE = 4, 2, 2
_IVFPQ_M, _IVFPQ_KSUB, _IVFPQ_PITER, _IVFPQ_RF = 4, 8, 2, 3


def _ivf_pq_sql(
    k: int = 5,
    n_cells: int = _IVFPQ_CELLS,
    cell_iter: int = _IVFPQ_CITER,
    n_probe: int = _IVFPQ_PROBE,
    m: int = _IVFPQ_M,
    ksub: int = _IVFPQ_KSUB,
    pq_iter: int = _IVFPQ_PITER,
    rfactor: int = _IVFPQ_RF,
    dim: int = _PQ_DIM,
) -> str:
    """The IVFADC twin: composes the two training replays — coarse cells
    via _kmeans_train_ctes (cent*/a*/u* names) and PQ via _pq_ctes
    (p-prefixed names) — then probes top-n_probe cells per query, ranks
    the ADC scores WITHIN probed cells for k·rfactor candidates, and
    exact-reranks against raw vectors."""
    mean = "(s - ((s % n + n) % n)) // n"

    def dotf(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {dim + 1}),"
            f" i -> {a}[i] * {b}[i])) AS BIGINT)"
        )

    def nsqf(a: str) -> str:
        return f"CAST(list_sum(list_transform({a}, x -> x * x)) AS BIGINT)"

    ctes = [
        f"q AS (SELECT vec_id AS qid, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id < 3)",
        f"c AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings WHERE vec_id >= 3)",
    ]
    ctes += _kmeans_train_ctes("c", n_cells, cell_iter, dim, sample=_TRAIN_SAMPLE)
    ctes += _pq_ctes(m, ksub, pq_iter, dim, include_source=False, sample=_TRAIN_SAMPLE)
    ctes += [
        f"lc AS (SELECT vec_id AS nid, label, qv AS nv FROM a{cell_iter})",
        """cflat AS (SELECT label, unnest(nv) AS v,
                     unnest(generate_series(1, len(nv))) AS pos FROM lc)""",
        "centf AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS s, count(*) AS n"
        " FROM cflat GROUP BY label, pos)",
        f"cent AS (SELECT label, list({mean} ORDER BY pos) AS cv"
        " FROM centf GROUP BY label)",
        "pflat AS (SELECT qid, label, unnest(qv) AS x, unnest(cv) AS y"
        " FROM q CROSS JOIN cent)",
        """pdots AS (SELECT qid, label, CAST(sum(x * y) AS BIGINT) AS dot,
                     CAST(sum(x * x) AS BIGINT) AS nq2, CAST(sum(y * y) AS BIGINT) AS nc
              FROM pflat GROUP BY qid, label)""",
        f"""probed AS (
      SELECT qid, label FROM (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dot / (sqrt(nq2) * sqrt(nc)) DESC, label) AS r
        FROM pdots)
      WHERE r <= {n_probe})""",
        f"""cand AS (
      SELECT qid, nid FROM (
        SELECT a.qid, a.nid,
               row_number() OVER (PARTITION BY a.qid
                                  ORDER BY {_PQ_COS} DESC, a.nid) AS r
        FROM padcs a JOIN pqn ON pqn.qid = a.qid
        JOIN lc ON lc.nid = a.nid
        JOIN probed p ON p.qid = a.qid AND p.label = lc.label)
      WHERE r <= {k * rfactor})""",
        f"""exact AS (
      SELECT cand.qid, cand.nid,
             {dotf('q.qv', 'lc.nv')} /
               (sqrt(CAST({nsqf('q.qv')} AS DOUBLE)) *
                sqrt(CAST({nsqf('lc.nv')} AS DOUBLE))) AS cos
      FROM cand JOIN q ON q.qid = cand.qid JOIN lc ON lc.nid = cand.nid)""",
        """rr AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM exact)""",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT qid, rank, nid, round(cos, 6) AS cos FROM rr WHERE rank <= {k}"
    )


@q("ann_ivf_pq", _ivf_pq_sql())
def ann_ivf_pq(spark, sf_dir):
    """The full IVFADC composition (pq.ivf_pq_topk): coarse k-means cells
    bound WHICH rows are scanned (n_probe probed cells, partition-prunable
    code table), PQ codes bound the BYTES per scanned row (ADC lookups),
    exact rerank of k·rfactor candidates restores recall. The oracle
    replays BOTH trainings via the shared CTE builders plus the probe,
    within-cell ADC ranking, and rerank."""
    from crawld_spark.operators import pq

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    corpus = emb.where(F.col("vec_id") >= 3)
    qs = emb.where(F.col("vec_id") < 3)
    return pq.ivf_pq_topk(
        qs,
        corpus,
        k=5,
        n_cells=_IVFPQ_CELLS,
        n_probe=_IVFPQ_PROBE,
        m=_IVFPQ_M,
        ksub=_IVFPQ_KSUB,
        cell_iter=_IVFPQ_CITER,
        pq_iter=_IVFPQ_PITER,
        rfactor=_IVFPQ_RF,
        train_sample=_TRAIN_SAMPLE,
    )


@q("ann_pq_adc", _pq_adc_sql())
def ann_pq_adc(spark, sf_dir):
    """Product-quantization ADC top-k (operators/pq.py): the corpus is
    searched through its m-code compressed form — per-row cost is m array
    lookups against the query's precomputed LUT, and only the codes column
    travels. The oracle replays the deterministic per-subspace training,
    encoding, and ADC scoring verbatim in SQL."""
    from crawld_spark.operators import pq

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    corpus = emb.where(F.col("vec_id") >= 3)
    qs = emb.where(F.col("vec_id") < 3)
    books = pq.pq_train(
        corpus, m=_PQ_M, ksub=_PQ_KSUB, n_iter=_PQ_ITER, train_sample=_TRAIN_SAMPLE
    )
    codes = pq.pq_encode(corpus, books)
    return pq.pq_topk_adc(qs, codes, books, k=5)


@q("ann_pq_rerank", _pq_rerank_sql())
def ann_pq_rerank(spark, sf_dir):
    """PQ-filter + exact re-rank (operators/pq.pq_topk_rerank) — the
    deployed form at 10^10 vectors: ADC over compressed codes retrieves
    k*rfactor candidates, then only those rows' raw vectors are scored
    exactly (candidates broadcast into the raw-vector scan; the big table
    never shuffles)."""
    from crawld_spark.operators import pq

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    corpus = emb.where(F.col("vec_id") >= 3)
    qs = emb.where(F.col("vec_id") < 3)
    books = pq.pq_train(
        corpus, m=_PQ_M, ksub=_PQ_KSUB, n_iter=_PQ_ITER, train_sample=_TRAIN_SAMPLE
    )
    return pq.pq_topk_rerank(qs, corpus, books, k=5, rfactor=3)


def _frontier_prioritize_sql(k: int = 50, n_iter: int = _PR_ITER) -> str:
    ctes = _pagerank_ctes(n_iter)
    ctes += [
        """ap AS (
      SELECT doc_id AS asrc, 'http://t/' || (doc_id % 7) AS target,
             'l0' AS anchor
      FROM documents
      UNION ALL
      SELECT doc_id, 'http://t/' || (doc_id % 13), 'l1' FROM documents)""",
        """aa AS (
      SELECT target, CAST(count(*) AS BIGINT) AS n_inlinks,
             CAST(count(DISTINCT asrc) AS BIGINT) AS n_srcs
      FROM ap GROUP BY target)""",
        """an AS (
      SELECT CAST(regexp_extract(target, '([0-9]+)$', 1) AS BIGINT) AS node,
             n_inlinks, n_srcs
      FROM aa)""",
        f"""j AS (
      SELECT r.node, rank_q,
             coalesce(n_inlinks, 0) AS n_inlinks,
             coalesce(n_srcs, 0) AS n_srcs,
             rank_q + coalesce(n_inlinks, 0) * 1000 AS priority
      FROM r{n_iter} r LEFT JOIN an ON an.node = r.node)""",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, rank_q, n_inlinks, n_srcs, priority,
      CAST(row_number() OVER (ORDER BY priority DESC, node) AS BIGINT)
        AS pri_rank
    FROM j
    QUALIFY pri_rank <= {k}"""
    )


@q("frontier_prioritize", _frontier_prioritize_sql())
def frontier_prioritize(spark, sf_dir):
    """Crawl-side signal composition: integer-exact PageRank (centrality)
    joined with inbound anchor-text counts (off-page relevance) into ONE
    int64 frontier priority, top-50 — the graph-signal flavor of
    curation_pipeline, showing the graft's link-graph operators compose in
    a single Catalyst plan. HTML parses executor-side (anchor pairs), the
    PageRank frame joins on the integer node key, and the final cut is an
    orderBy().limit(K) (bounded K by contract) with the rank assigned over
    the K survivors only — never a corpus-wide single-partition window."""
    from crawld_spark.operators import graph

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                (F.col("doc_id") * 7 + 1) % n,
                (F.col("doc_id") * 13 + 3) % n,
                F.lit(0).cast("long"),
            )
        ).alias("dst"),
    )
    pr = graph.pagerank(edges, n_iter=_PR_ITER).select("node", "rank_q")

    url = F.concat(F.lit("http://d/"), F.col("doc_id").cast("string"))
    links = F.array(
        F.concat(F.lit("http://t/"), (F.col("doc_id") % 7).cast("string")),
        F.concat(F.lit("http://t/"), (F.col("doc_id") % 13).cast("string")),
    )
    pages = d.select("doc_id", wrap_html(url, F.col("text"), links).alias("html"))
    an = graph.anchor_text_agg(pages, html_col="html", id_col="doc_id").select(
        F.regexp_extract("target", r"([0-9]+)$", 1).cast("long").alias("node"),
        "n_inlinks",
        "n_srcs",
    )
    j = pr.join(an, "node", "left").select(
        "node",
        "rank_q",
        F.coalesce("n_inlinks", F.lit(0)).alias("n_inlinks"),
        F.coalesce("n_srcs", F.lit(0)).alias("n_srcs"),
        (F.col("rank_q") + F.coalesce("n_inlinks", F.lit(0)) * 1000).alias(
            "priority"
        ),
    )
    top = j.orderBy(F.desc("priority"), F.asc("node")).limit(50)
    w = Window.orderBy(F.desc("priority"), F.asc("node"))
    return top.withColumn(
        "pri_rank", F.row_number().over(w).cast("long")
    )


_BM25_TERMS = ["hash", "join", "window"]


@q(
    "bm25_topk",
    # Okapi BM25 with k1=6/5, b=3/4 multiplied through to the all-integer
    # denominator 10·tf·L + 3·L + 9·dl·N; idf quantized at the term level,
    # per-doc totals are integer sums (order-independent cross-engine)
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
      FROM documents
    ), stats AS (
      SELECT (SELECT count(*) FROM documents) AS n,
             (SELECT count(*) FROM tok) AS lt
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM tok
      WHERE w IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY doc_id, w
    ), dft AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
    ), idf AS (
      SELECT w,
             CAST(floor(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0)
                  AS BIGINT) AS qidf,
             n, lt
      FROM dft CROSS JOIN stats
    ), sc AS (
      SELECT tf.doc_id,
             CAST(floor((CAST(qidf AS DOUBLE) * 22 * tf * lt) /
                        CAST(10 * tf * lt + 3 * lt + 9 * dl.dl * n AS DOUBLE))
                  AS BIGINT) AS qscore
      FROM tf JOIN idf USING (w) JOIN dl ON dl.doc_id = tf.doc_id
    ), tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
             CAST(sum(qscore) AS BIGINT) AS qtotal
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_terms_hit, qtotal,
      round(qtotal / 1000000.0, 6) AS score,
      CAST(row_number() OVER (ORDER BY qtotal DESC, doc_id) AS BIGINT) AS rank
    FROM tot
    QUALIFY rank <= 10
    """,
)
def bm25_topk(spark, sf_dir):
    """Okapi BM25 top-k retrieval (textstats.bm25_topk) for a literal term
    list — lexical search over the corpus with rational (k1, b) multiplied
    through to an all-integer denominator and term-level idf quantization,
    so per-document totals are integer sums and the DuckDB twin matches
    bit-for-bit."""
    return textstats.bm25_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=10
    )


_ZBITS = 16
_ZFOLD = 1 << _ZBITS
_ZORDER_TERMS = " + ".join(
    f"((((a >> {i}) & 1) << {2 * i}) + (((b >> {i}) & 1) << {2 * i + 1}))"
    for i in range(_ZBITS)
)


@q(
    "zorder_key",
    # Morton interleave of two hash-folded dimensions — the ZORDER OPTIMIZE
    # clustering key, as closed-form bit arithmetic both engines state
    # identically (DuckDB >> / & / << on BIGINT ≡ Spark shiftright/
    # bitwiseAND/shiftleft on long)
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(doc_id % {_ZFOLD} AS BIGINT) AS a,
             CAST((doc_id * 2654435761) % {_ZFOLD} AS BIGINT) AS b
      FROM documents
    )
    SELECT doc_id, a, b, CAST({_ZORDER_TERMS} AS BIGINT) AS zkey
    FROM d
    """,
)
def zorder_key(spark, sf_dir):
    """Z-order clustering key (operators/layout.zorder_key): the
    bit-interleaved sort key behind Delta/Iceberg ZORDER OPTIMIZE — one
    range sort gives BOTH dimensions zone-map locality (the frontier's
    host+url case). Pure int64 bit arithmetic, exchange-free."""
    from crawld_spark.operators import layout

    a = (F.col("doc_id") % _ZFOLD).cast("long")
    b = ((F.col("doc_id") * 2654435761) % _ZFOLD).cast("long")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        a.alias("a"),
        b.alias("b"),
        layout.zorder_key(a, b, bits=_ZBITS).alias("zkey"),
    )


_SESS_GAP_S = 28_800  # 480 min ≈ the corpus's median inter-event gap
_SESS_LAG_SQL = f"""
    e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
    sb AS (
      SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) > {_SESS_GAP_S * 1_000_000}
                     THEN 1 ELSE 0 END AS brk
      FROM e),
    ss AS (
      SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS session_seq
      FROM sb)
"""


@q(
    "sessionize",
    f"""
    WITH {_SESS_LAG_SQL}
    SELECT event_id, user_id, ts_us, session_seq,
      CAST(row_number() OVER (PARTITION BY user_id, session_seq
                              ORDER BY ts_us, event_id) - 1 AS BIGINT)
        AS event_seq
    FROM ss
    """,
)
def sessionize(spark, sf_dir):
    """Gap-based per-event sessionization (operators/sessions.sessionize):
    per-user lag + running break count — the classic event-log operator
    (per-HOST fetch bursts in the crawl loop are the same shape). Window
    state is one user's events; timestamps travel as epoch micros."""
    from crawld_spark.operators import sessions

    return sessions.sessionize(
        _t(spark, sf_dir, "events"), gap_s=_SESS_GAP_S
    )


@q(
    "session_window_agg",
    # the ORACLE states the first-principles lag/cumsum rollup; the engine
    # answers with Spark's NATIVE session_window — a cross-check that the
    # built-in streaming-session primitive implements exactly gap-merge
    # semantics (boundary: diff == gap merges, strictly-greater breaks)
    f"""
    WITH {_SESS_LAG_SQL}
    SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
      CAST(count(*) AS BIGINT) AS n_events,
      max(ts_us) - min(ts_us) AS duration_us
    FROM ss GROUP BY user_id, session_seq
    """,
)
def session_window_agg(spark, sf_dir):
    """Per-session rollup via the NATIVE ``session_window`` primitive
    (operators/sessions.session_rollup) — the exact expression Structured
    Streaming runs under a watermark, exercised in batch and pinned
    against the lag-based oracle."""
    from crawld_spark.operators import sessions

    return sessions.session_rollup(
        _t(spark, sf_dir, "events"), gap_s=_SESS_GAP_S
    )


# =====================================================================
# 8. corpus rollups + link-graph anchor signal (operators/corpus, graph)
# =====================================================================

@q(
    "host_stats",
    # per-host curation prior: duplicate mass forced by giving every
    # doc_id % 5 == 0 page identical boilerplate text (those pages all land
    # on host sub0.siteX, so each such host sees a real digest collision)
    f"""
    WITH d AS (
      SELECT {_HOST_SYNTH_SQL} AS host,
             md5(CASE WHEN doc_id % 5 = 0 THEN 'BOILER' ELSE text END) AS dig,
             lang, n_chars
      FROM documents
    ), g AS (
      SELECT host, dig, count(*) AS cnt, sum(n_chars) AS chars
      FROM d GROUP BY host, dig
    ), h AS (
      SELECT host, CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(sum(chars) AS BIGINT) AS total_chars,
             CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
               AS dup_docs
      FROM g GROUP BY host
    ), l AS (
      SELECT host, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM d GROUP BY host
    )
    SELECT host, n_docs, total_chars, dup_docs, n_langs
    FROM h JOIN l USING (host)
    """,
)
def host_stats(spark, sf_dir):
    """Per-host curation rollup (operators/corpus.host_stats): doc count,
    char mass, within-host exact-duplicate mass, language spread — the
    FineWeb-style domain prior. Engine shuffles only (host, md5, ints);
    text never moves."""
    from crawld_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("sub"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".site"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("BOILER"))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "n_chars",
    )
    return corpus.host_stats(d)


@q(
    "snapshot_diff",
    # two synthetic crawl snapshots of the same URL space: doc_id%10==0
    # absent from old (-> added), %10==1 absent from new (-> removed),
    # %7==0 re-fetched with different bytes (-> changed)
    """
    WITH o AS (
      SELECT 'http://d/' || doc_id AS url, md5(text) AS old_digest
      FROM documents WHERE doc_id % 10 <> 0
    ), n AS (
      SELECT 'http://d/' || doc_id AS url,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || 'v2' ELSE text END)
               AS new_digest
      FROM documents WHERE doc_id % 10 <> 1
    )
    SELECT coalesce(o.url, n.url) AS url,
      CASE WHEN old_digest IS NULL THEN 'added'
           WHEN new_digest IS NULL THEN 'removed'
           WHEN old_digest = new_digest THEN 'unchanged'
           ELSE 'changed' END AS status,
      coalesce(old_digest, '') AS old_digest,
      coalesce(new_digest, '') AS new_digest
    FROM o FULL OUTER JOIN n ON o.url = n.url
    """,
)
def snapshot_diff(spark, sf_dir):
    """Cross-snapshot recrawl diff (operators/corpus.snapshot_diff): one
    full-outer equi-join on the URL key, digest-only payloads (~50
    bytes/row regardless of page size). Feeds freshness.change_rates and
    recrawl scheduling; the reference's per-repo clone-vs-update branch
    (crawld.go:109-249) is the row-at-a-time form of this set operator."""
    from crawld_spark.operators import corpus

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://d/"), F.col("doc_id").cast("string"))
    old = d.where(F.col("doc_id") % 10 != 0).select(
        url.alias("url"), F.md5("text").alias("dig")
    )
    new = d.where(F.col("doc_id") % 10 != 1).select(
        url.alias("url"),
        F.md5(
            F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("v2")))
            .otherwise(F.col("text"))
        ).alias("dig"),
    )
    # nulls (absent side) -> '' for the cross-engine compare, which sorts
    # rows and cannot order None against str (module determinism rules)
    return corpus.snapshot_diff(old, new).select(
        "url",
        "status",
        F.coalesce("old_digest", F.lit("")).alias("old_digest"),
        F.coalesce("new_digest", F.lit("")).alias("new_digest"),
    )


@q(
    "anchor_text_agg",
    # wrap_html renders anchor i as <a href="...">l{i}</a>; each doc links
    # target doc_id%7 (anchor l0) and doc_id%13 (anchor l1), so targets
    # 0..6 collect {l0,l1} and 7..12 only {l1}; docs with
    # doc_id%7 == doc_id%13 link the same target twice from one src
    # (n_inlinks counts both, n_srcs counts one)
    """
    WITH p AS (
      SELECT doc_id AS src, 'http://t/' || (doc_id % 7) AS target,
             'l0' AS anchor
      FROM documents
      UNION ALL
      SELECT doc_id, 'http://t/' || (doc_id % 13), 'l1' FROM documents
    )
    SELECT target, CAST(count(*) AS BIGINT) AS n_inlinks,
           CAST(count(DISTINCT src) AS BIGINT) AS n_srcs,
           array_to_string(list_sort(list(DISTINCT anchor))[1:8], '|')
             AS anchors_joined
    FROM p GROUP BY target
    """,
)
def anchor_text_agg(spark, sf_dir):
    """Inbound anchor-text aggregation (operators/graph.anchor_text_agg):
    how OTHER pages describe a URL — the classic off-page relevance signal
    for frontier ranking. HTML is parsed executor-side in one Arrow hop;
    only (target, short anchor) pairs shuffle."""
    from crawld_spark.operators import graph

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://d/"), F.col("doc_id").cast("string"))
    links = F.array(
        F.concat(F.lit("http://t/"), (F.col("doc_id") % 7).cast("string")),
        F.concat(F.lit("http://t/"), (F.col("doc_id") % 13).cast("string")),
    )
    pages = d.select("doc_id", wrap_html(url, F.col("text"), links).alias("html"))
    return graph.anchor_text_agg(pages, html_col="html", id_col="doc_id")


@q(
    "jpeg_decode_roundtrip",
    # REAL baseline-JPEG decoder gate (r4): the engine encodes a JPEG per
    # doc — doc_id-derived geometry, alternating grayscale/RGB, 4:2:0
    # subsampling on every third doc, Annex-K vs flat quant alternating —
    # and decodes it back (full marker parse, DHT canonical Huffman,
    # dequant + IDCT, chroma upsampling). n_bytes is entropy-stream
    # dependent, so the oracle checks decoded geometry/channels/format;
    # pixel-level tolerance is pinned by the engine tests
    # (tests/test_similarity.py TestJpegCodec).
    """
    SELECT doc_id,
           CAST(8 + doc_id % 21 AS INT) AS width,
           CAST(8 + doc_id % 13 AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
           'jpeg' AS format
    FROM documents
    """,
)
def jpeg_decode_roundtrip(spark, sf_dir):
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from crawld_spark.operators.jpeg import encode_jpeg
    from crawld_spark.operators.multimodal import decode_meta

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"))
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for i in b["doc_id"]:
                i = int(i)
                w, h = 8 + i % 21, 8 + i % 13
                yy, xx = np.mgrid[0:h, 0:w]
                if i % 2 == 0:
                    pix = np.stack(
                        [(20 + 3 * xx + (k + 1) * yy) % 200 for k in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                    payloads.append(
                        encode_jpeg(
                            pix,
                            quant=None if i % 4 == 0 else 1,
                            subsample=(i % 3 == 0),
                        )
                    )
                else:
                    pix = ((20 + 3 * xx + 5 * yy) % 200).astype(np.uint8)
                    payloads.append(encode_jpeg(pix, quant=None if i % 4 == 1 else 1))
            yield pd.DataFrame({"doc_id": b["doc_id"].values, "payload": payloads})

    jpgs = d.mapInPandas(build, schema)
    return decode_meta(jpgs, id_col="doc_id", payload_col="payload").select(
        "doc_id", "width", "height", "channels", "format"
    )


@q(
    "surt_cdx_index",
    # SURT/CDX index keys (r5): the engine PARSES canonical urls into
    # reversed-host sort keys with JVM built-ins; the oracle states the
    # expected key arithmetically from doc_id (the frame_sample pattern —
    # parse vs ground truth, not parse vs parse)
    """
    SELECT doc_id,
           'https://www.sub' || (doc_id % 5) || '.host' || (doc_id % 7)
             || '.example.com/p/' || doc_id
             || CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
           'com,example,host' || (doc_id % 7) || ',sub' || (doc_id % 5)
             || ')/p/' || doc_id
             || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt
    FROM documents
    """,
)
def surt_cdx_index(spark, sf_dir):
    """Common-Crawl CDX index keys: SURT (reversed-host) sort keys over
    canonical urls — functions/url.surt_key. One domain's captures (and
    every subdomain's) become a contiguous key range, so the CDX store,
    range-partitioned by this key, answers "all captures under
    example.com" with a partition-pruned range scan at 10^10 captures.
    Pure codegen projection (regexp + split/reverse/sort_array), no UDF,
    no shuffle; query-string params are sorted into the key."""
    from crawld_spark.functions.url import surt_key

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://WWW.Sub"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".Host"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM/p/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        canonicalize_url(raw).alias("url"),
    ).select("doc_id", "url", surt_key(F.col("url")).alias("surt"))


@q(
    "temperature_resample",
    # mT5/XLM-R alpha-sampling at T=2 (alpha = 1/2): quotas ∝ isqrt(n_lang),
    # integer-exact (isqrt + integer division, no float aggregation), keep
    # per-lang quota by md5 order
    """
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang),
    w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
          FROM c),
    t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
    q AS (SELECT lang, CAST((200 * w) // tw AS BIGINT) AS quota
          FROM w CROSS JOIN t),
    r AS (SELECT d.doc_id, d.lang, q.quota,
                 row_number() OVER (PARTITION BY d.lang
                                    ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                             d.doc_id) AS rk
          FROM documents d JOIN q USING (lang))
    SELECT doc_id, lang, quota FROM r WHERE rk <= quota
    """,
)
def temperature_resample(spark, sf_dir):
    """Language-balanced corpus resampling (textstats.temperature_resample):
    per-language quotas proportional to sqrt(n) — the T=2 temperature
    sampling mT5/XLM-R use to keep tail languages represented — selected
    deterministically by hash order. Head languages shed volume, tail
    languages keep theirs; integer-exact end to end."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return textstats.temperature_resample(d, total=200)


@q(
    "mirror_hosts",
    # mirror/CDN detection (r5): planted ground truth — every doc_id % 5
    # == 0 page carries identical boilerplate text and lands on host
    # sub0.site(doc_id % 11), so the BOILER digest sits on 11 hosts →
    # C(11,2) = 55 planted mirror pairs, plus whatever organic exact-dup
    # pairs the corpus contributes. Digest fanout capped at 16 hosts
    # BEFORE the pair join (power-law boilerplate guard).
    f"""
    WITH d AS (
      SELECT DISTINCT {_HOST_SYNTH_SQL} AS host,
             md5(CASE WHEN doc_id % 5 = 0 THEN 'BOILER' ELSE text END) AS dig
      FROM documents
    ), fan AS (
      SELECT dig FROM d GROUP BY dig HAVING count(*) BETWEEN 2 AND 16
    ), e AS (SELECT d.host, d.dig FROM d JOIN fan USING (dig))
    SELECT a.host AS host_a, b.host AS host_b,
           CAST(count(*) AS BIGINT) AS shared_digests
    FROM e a JOIN e b USING (dig)
    WHERE a.host < b.host
    GROUP BY a.host, b.host
    """,
)
def mirror_hosts(spark, sf_dir):
    """Host pairs serving identical content (operators/corpus.mirror_hosts):
    the corpus-level dual of exact dedup — a crawler that knows host A
    mirrors host B stops paying fetch budget twice. Pages collapse to
    distinct (host, md5) first (text never shuffles), digests on >16 hosts
    are dropped before the self-join (one viral boilerplate digest on 10^6
    hosts would otherwise emit 10^12 pairs), and the surviving pair space
    is K^2-bounded per digest."""
    from crawld_spark.operators import corpus

    d = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("sub"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".site"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("BOILER"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus.mirror_hosts(
        d, min_shared=1, max_hosts_per_digest=16
    )


@q(
    "cdx_prefix_scan",
    # CDX domain range scan (r5): "every capture under host3.example.com"
    # as a SARGABLE surt-key range [lo, hi) — the predicate form zone maps
    # and range partitioning prune on ('-' is the successor byte of ',').
    # Oracle states both the key and the range arithmetically from doc_id.
    """
    WITH cdx AS (
      SELECT doc_id,
             'com,example,host' || (doc_id % 7) || ',sub' || (doc_id % 5)
               || ')/p/' || doc_id
               || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt
      FROM documents
    )
    SELECT split_part(surt, ')', 1) AS rhost,
           CAST(count(*) AS BIGINT) AS n_captures,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM cdx
    WHERE surt >= 'com,example,host3,' AND surt < 'com,example,host3-'
    GROUP BY rhost
    """,
)
def cdx_prefix_scan(spark, sf_dir):
    """CDX index range scan: all captures under one registrable domain
    (every subdomain included) via a sargable range on the SURT key —
    lo = 'com,example,host3,' ≤ surt < hi = 'com,example,host3-' (the
    successor string: ',' + 1 = '-'). Because surt_key reverses host
    labels, the domain's captures are a CONTIGUOUS key range: over a
    CDX store range-partitioned and sorted by this key the same two
    bounds become partition pruning + parquet zone-map skips instead of
    a 10^10-row full-index filter (plan-asserted in
    tests/test_layout.py::TestCdxPrefixScan). Per-subdomain rollup keys
    are reversed-host strings; one partial-agg-collapsible groupBy."""
    from crawld_spark.functions.url import surt_key

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("https://sub"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".host"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    cdx = d.select(
        "doc_id", surt_key(canonicalize_url(raw)).alias("surt")
    )
    scanned = cdx.where(
        (F.col("surt") >= F.lit("com,example,host3,"))
        & (F.col("surt") < F.lit("com,example,host3-"))
    )
    return scanned.groupBy(
        F.substring_index("surt", ")", 1).alias("rhost")
    ).agg(
        F.count("*").cast("long").alias("n_captures"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


@q(
    "warc_to_wet",
    # WARC→WET conversion (r5): the Common-Crawl derivation — response
    # records in, text-conversion records out (url, word/char counts,
    # text digest). The WARC hop is byte-exact (warc_roundtrip gate), so
    # the oracle states the WET stats directly from documents.text.
    """
    SELECT doc_id,
           'http://d/' || doc_id AS wet_url,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
             AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars,
           md5(text) AS text_md5
    FROM documents
    """,
)
def warc_to_wet(spark, sf_dir):
    """WARC→WET derivation (Common Crawl's text-conversion sidecar): each
    Arrow batch of documents is serialized into ONE multi-record WARC blob
    (sources/warc.warc_bytes_of — real framing + HTTP envelopes), parsed
    back, and the extracted text becomes a WET record. The Python hop
    carries only the WARC parse + extract_text (the parts Spark cannot
    express); every WET statistic — whitespace word count, char count,
    content digest — is a JVM codegen projection OVER the extracted
    column, so the stats stage is shuffle-free and whole-stage-compiled."""
    from crawld_spark.functions.extract import extract_text_one, wrap_html_one
    from crawld_spark.sources.warc import parse_warc_bytes, warc_bytes_of

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def wet(batches):
        import pandas as pd

        base = pd.Timestamp("2024-01-01", tz="UTC")
        for b in batches:
            if not len(b):
                continue
            recs = [
                (
                    f"http://d/{int(i)}",
                    base + pd.Timedelta(seconds=int(i)),
                    wrap_html_one(f"http://d/{int(i)}", t, []),
                )
                for i, t in zip(b["doc_id"], b["text"])
            ]
            parsed, skipped = parse_warc_bytes(warc_bytes_of(recs))
            assert skipped == 0 and len(parsed) == len(recs)
            yield pd.DataFrame(
                {
                    "doc_id": [
                        int(r["url"].rsplit("/", 1)[1]) for r in parsed
                    ],
                    "wet_url": [r["url"] for r in parsed],
                    "wet_text": [extract_text_one(r["html"]) for r in parsed],
                }
            )

    w = d.mapInPandas(
        wet, schema="doc_id long, wet_url string, wet_text string"
    )
    return w.select(
        "doc_id",
        "wet_url",
        textstats.token_count_ws(F.col("wet_text")).cast("long").alias("n_words"),
        F.length("wet_text").cast("long").alias("n_chars"),
        F.md5("wet_text").alias("text_md5"),
    )


@q(
    "robots_audit",
    # robots.txt compliance audit (r5): bodies are synthesized per host
    # (deterministic in h = doc_id % 11), the ENGINE parses them with the
    # real pandas-UDF parser (functions/robots.py) and prefix-matches;
    # the oracle states the same rules arithmetically — parse vs ground
    # truth. h % 5 == 0 hosts carry an agent-specific 'crawld' record
    # (Disallow: /) that must WIN over '*' for agent crawld-spark/1.0;
    # h % 3 picks the prefix rules; '/admin' never matches anything.
    """
    WITH u AS (
      SELECT doc_id, doc_id % 11 AS h, '/p/' || doc_id AS path
      FROM documents
    )
    SELECT doc_id,
           'site' || h || '.example.com' AS host,
           CASE WHEN h % 5 = 0 THEN true
                WHEN h % 3 = 0 THEN path LIKE '/p/1%'
                WHEN h % 3 = 1 THEN path LIKE '/p/7%'
                ELSE false END AS denied,
           CASE WHEN h % 5 <> 0 AND h % 3 = 1 THEN 2.0 ELSE -1.0 END
             AS crawl_delay_s
    FROM u
    """,
)
def robots_audit(spark, sf_dir):
    """Fleet-wide robots.txt compliance audit: which frontier URLs would
    the current robots rules deny, and at what crawl delay — the batch
    form of the per-round politeness gate (north rule: "politeness,
    robots"). Scale shape: robots bodies are HOST-cardinality (10^8 rows
    against 10^10 URLs), parsed ONCE per host by the Arrow-batched pandas
    UDF (functions/robots.robots_table), and the parsed rules broadcast
    into the URL scan — the per-URL work is a codegen `exists` prefix
    probe over a small array, no shuffle of the URL table at all."""
    from crawld_spark.functions.robots import robots_table

    def body_of(h: int) -> str:
        lines = ["User-agent: *", "Disallow: /admin"]
        if h % 3 == 0:
            lines.append("Disallow: /p/1")
        if h % 3 == 1:
            lines.extend(["Disallow: /p/7", "Crawl-delay: 2"])
        if h % 5 == 0:
            lines.extend(["", "User-agent: crawld", "Disallow: /"])
        return "\n".join(lines)

    from crawld_spark.session import local_df

    rb = local_df(
        spark,
        [(f"site{h}.example.com", body_of(h)) for h in range(11)],
        "host string, body string", ["host", "body"],
    )
    rules = robots_table(rb, agent="crawld-spark/1.0")
    u = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.concat(F.lit("/p/"), F.col("doc_id").cast("string")).alias("path"),
    )
    j = u.join(F.broadcast(rules), "host", "left")
    return j.select(
        "doc_id",
        "host",
        F.coalesce(
            F.exists(
                "disallow_prefixes", lambda p: F.col("path").startswith(p)
            ),
            F.lit(False),
        ).alias("denied"),
        F.coalesce(F.col("crawl_delay_s"), F.lit(-1.0)).alias("crawl_delay_s"),
    )


@q(
    "robots_rfc_audit",
    # RFC 9309 robots audit (r5): Allow/Disallow + '*' and '$' wildcards
    # with longest-pattern-wins (Allow beats Disallow on ties). Bodies
    # synthesized per host (h = doc_id % 12), ENGINE parses with the RFC
    # pandas-UDF parser and evaluates the pure-JVM glob fold
    # (functions/robots.rfc_verdict); oracle states the verdicts
    # arithmetically — parse + match vs ground truth. Families:
    # h%4==0: Disallow /*.php$ overridden by the MORE specific
    #         Allow /p/1*.php$; h%4==1: mid-pattern wildcard /p/*2 plus
    # Crawl-delay; h%4==2: Disallow / beaten by Allow /p/ beaten by
    # Disallow /p/9*; h%4==3: agent-specific 'crawld' group (wildcard
    # rule) must win over the '*' group's Disallow: /.
    """
    WITH u AS (
      SELECT doc_id, doc_id % 12 AS h,
             '/p/' || doc_id ||
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '.php'
                    WHEN 1 THEN '.html' ELSE '' END AS path
      FROM documents
    )
    SELECT doc_id,
           'rfc' || h || '.example.com' AS host,
           CASE CAST(h % 4 AS INT)
             WHEN 0 THEN path LIKE '%.php' AND path NOT LIKE '/p/1%'
             WHEN 1 THEN path LIKE '/p/%2%'
             WHEN 2 THEN path LIKE '/p/9%'
             ELSE path LIKE '%.html' END AS denied,
           CASE WHEN h % 4 = 1 THEN 1.5 ELSE -1.0 END AS crawl_delay_s
    FROM u
    """,
)
def robots_rfc_audit(spark, sf_dir):
    """RFC 9309 robots compliance audit — the allow/deny half of the
    north rule's "politeness, robots" at full wildcard semantics.
    Same scale shape as robots_audit (host-cardinality parse, rules
    broadcast into the URL scan) but the per-URL verdict is the glob
    segment fold of functions/robots.rfc_verdict: higher-order array
    functions over pre-split literal segments — startswith/locate only,
    no regex, no Python, and the URL table never shuffles."""
    from crawld_spark.functions.robots import rfc_verdict, robots_rfc_table

    def body_of(h: int) -> str:
        lines = ["User-agent: *"]
        f = h % 4
        if f == 0:
            lines += ["Disallow: /*.php$", "Allow: /p/1*.php$"]
        elif f == 1:
            lines += ["Disallow: /p/*2", "Crawl-delay: 1.5"]
        elif f == 2:
            lines += ["Disallow: /", "Allow: /p/", "Disallow: /p/9*"]
        else:
            lines += [
                "Disallow: /",
                "",
                "User-agent: crawld",
                "Disallow: /p/*.html$",
            ]
        return "\n".join(lines)

    from crawld_spark.session import local_df

    rb = local_df(
        spark,
        [(f"rfc{h}.example.com", body_of(h)) for h in range(12)],
        "host string, body string", ["host", "body"],
    )
    rules = robots_rfc_table(rb, agent="crawld-spark/1.0")
    u = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("rfc"), (F.col("doc_id") % 12).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.concat(
            F.lit("/p/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(".php"))
            .when(F.col("doc_id") % 3 == 1, F.lit(".html"))
            .otherwise(F.lit("")),
        ).alias("path"),
    )
    j = u.join(F.broadcast(rules), "host", "left")
    return j.select(
        "doc_id",
        "host",
        rfc_verdict("path", "rules").alias("denied"),
        F.coalesce(F.col("crawl_delay_s"), F.lit(-1.0)).alias("crawl_delay_s"),
    )


@q(
    "pld_stats",
    # registrable-domain (pay-level-domain) rollup (r5): the ENGINE
    # parses hosts with functions/url.registrable_domain (PSL-style
    # multi-label suffixes); the oracle states the expected PLD
    # arithmetically from doc_id — parse vs ground truth. Three host
    # families: deep subdomain under a plain TLD, deep subdomain under
    # a multi-label suffix (shop.co.uk), and a host directly under a
    # multi-label suffix (siteN.com.au = its own PLD).
    """
    WITH u AS (
      SELECT CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'a' || CAST(doc_id % 7 AS VARCHAR)
                           || '.sub.example.com'
               WHEN 1 THEN 'b' || CAST(doc_id % 5 AS VARCHAR)
                           || '.shop.co.uk'
               ELSE 'site' || CAST(doc_id % 4 AS VARCHAR) || '.com.au'
             END AS host,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'example.com'
               WHEN 1 THEN 'shop.co.uk'
               ELSE 'site' || CAST(doc_id % 4 AS VARCHAR) || '.com.au'
             END AS pld
      FROM documents
    )
    SELECT pld, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(*) AS BIGINT) AS n_pages
    FROM u GROUP BY pld
    """,
)
def pld_stats(spark, sf_dir):
    """Pay-level-domain rollup (functions/url.registrable_domain): the
    grain politeness budgets and host reputation aggregate at —
    blog/www/shop subdomains of one registrant are ONE budget bucket.
    The PLD is a pure codegen projection (split/slice/array_join + a
    literal isin over the multi-label suffix set — no UDF, no join), so
    the rollup costs exactly one host-grain aggregation."""
    from crawld_spark.functions.url import registrable_domain

    d = _t(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("a"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".sub.example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("b"), (F.col("doc_id") % 5).cast("string"),
                F.lit(".shop.co.uk"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("site"), (F.col("doc_id") % 4).cast("string"),
                F.lit(".com.au"),
            )
        )
        .alias("host")
    )
    return (
        d.select("host", registrable_domain("host").alias("pld"))
        .groupBy("pld")
        .agg(
            F.count_distinct("host").cast("long").alias("n_hosts"),
            F.count("*").cast("long").alias("n_pages"),
        )
    )


def _hits_ctes(n_iter: int) -> list[str]:
    ctes = [
        """e AS (
      SELECT doc_id AS src,
             unnest([(doc_id * 7 + 1) % n, (doc_id * 13 + 3) % n,
                     CAST(0 AS BIGINT)]) AS dst
      FROM documents, (SELECT count(*) AS n FROM documents))""",
        """nodes AS (SELECT DISTINCT node FROM
      (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub_q FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""ar{i} AS (
      SELECT dst, sum(hub_q) AS raw
      FROM h{i - 1} JOIN e ON node = e.src GROUP BY dst)"""
        )
        ctes.append(
            f"am{i} AS (SELECT coalesce(max(raw), 0) AS rmax FROM ar{i})"
        )
        ctes.append(
            f"""a{i} AS (
      SELECT node, CAST(coalesce(raw, 0) // (rmax // 1000000 + 1) AS BIGINT)
               AS auth_q
      FROM nodes LEFT JOIN ar{i} ON node = dst CROSS JOIN am{i})"""
        )
        ctes.append(
            f"""hr{i} AS (
      SELECT src, sum(auth_q) AS raw
      FROM a{i} JOIN e ON node = e.dst GROUP BY src)"""
        )
        ctes.append(
            f"hm{i} AS (SELECT coalesce(max(raw), 0) AS rmax FROM hr{i})"
        )
        ctes.append(
            f"""h{i} AS (
      SELECT node, CAST(coalesce(raw, 0) // (rmax // 1000000 + 1) AS BIGINT)
               AS hub_q
      FROM nodes LEFT JOIN hr{i} ON node = src CROSS JOIN hm{i})"""
        )
    return ctes


_HITS_ITER = 3


def _hits_sql(n_iter: int = _HITS_ITER) -> str:
    return (
        "WITH "
        + ",\n    ".join(_hits_ctes(n_iter))
        + f"""
    SELECT node, hub_q, auth_q FROM h{n_iter} JOIN a{n_iter} USING (node)"""
    )


@q("link_hits", _hits_sql())
def link_hits(spark, sf_dir):
    """Integer-exact HITS hubs/authorities over the same deterministic
    link graph as the pagerank lane (operators/graph.hits): max-bounded
    floor-division rescale instead of the float L2 norm, fixed
    iterations, int64 throughout — the DuckDB twin unrolls both
    half-steps per iteration and must match bit-for-bit.  Node 0 is the
    hot authority (every doc links it); the seed docs that link it plus
    high-fanout neighbors become the hubs.  Crawl use: fetch authorities
    for content, refetch hubs for discovery (two separate refresh
    cadences), vs pagerank's single collapsed score."""
    from crawld_spark.operators import graph

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                (F.col("doc_id") * 7 + 1) % n,
                (F.col("doc_id") * 13 + 3) % n,
                F.lit(0).cast("long"),
            )
        ).alias("dst"),
    )
    return graph.hits(edges, n_iter=_HITS_ITER)



@q(
    "trap_stats",
    """
    WITH u AS (
      SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
        CASE WHEN doc_id % 10 < 2
          THEN '/cal/' || CAST(doc_id AS VARCHAR) || '/'
               || CAST(doc_id * 31 AS VARCHAR)
          ELSE '/a/' || translate(substr(md5(CAST(doc_id AS VARCHAR)), 1, 10),
                                  '0123456789', 'ghijklmnop')
        END AS path
      FROM documents
    ), t AS (
      SELECT host,
        regexp_replace(regexp_replace(path, '[0-9a-fA-F]{8,}', '~H', 'g'),
                       '[0-9]+', '~D', 'g') AS templ
      FROM u
    ), pt AS (
      SELECT host, templ, CAST(count(*) AS BIGINT) AS n_urls_t
      FROM t GROUP BY host, templ
    )
    SELECT host,
      CAST(sum(n_urls_t) AS BIGINT) AS n_urls,
      CAST(count(*) AS BIGINT) AS n_templates,
      CAST(max(n_urls_t) AS BIGINT) AS max_template_urls,
      CAST(sum(n_urls_t) // count(*) AS BIGINT) AS compression_q,
      (sum(n_urls_t) >= 50 AND sum(n_urls_t) // count(*) >= 10) AS is_trap
    FROM pt GROUP BY host
    """,
)
def trap_stats(spark, sf_dir):
    """Crawl-trap detection (operators/urlfilter.trap_stats): collapse
    paths to structural templates, flag hosts whose URL count vastly
    exceeds their template count.  Two synthetic host families: hosts
    h0/h1 are calendar-style traps (every URL a fresh digit pair under
    one template), the rest serve letters-only unique paths (template ==
    path, compression 1).  Scale: the (host, template) partial agg
    collapses the URL scan before any shuffle; see module docstring."""
    from crawld_spark.operators.urlfilter import trap_stats as _ts

    u = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")).alias(
            "host"
        ),
        F.when(
            F.col("doc_id") % 10 < 2,
            F.concat(
                F.lit("/cal/"),
                F.col("doc_id").cast("string"),
                F.lit("/"),
                (F.col("doc_id") * 31).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("/a/"),
                F.translate(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10),
                    "0123456789",
                    "ghijklmnop",
                ),
            )
        )
        .alias("path"),
    )
    return _ts(u, min_urls=50, min_compression=10)


@q(
    "budget_allocate",
    """
    WITH h AS (
      SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
             CAST(sum(n_chars) AS BIGINT) AS mass
      FROM documents GROUP BY 1
    ), t AS (SELECT sum(mass) AS tm FROM h),
    b AS (
      SELECT host, mass,
        CAST(CASE WHEN tm > 0 THEN (1000 * mass) // tm ELSE 0 END
             AS BIGINT) AS base_q,
        CAST(CASE WHEN tm > 0 THEN (1000 * mass) % tm ELSE 0 END
             AS BIGINT) AS rem_q
      FROM h CROSS JOIN t
    ), l AS (
      SELECT 1000 - sum(base_q) AS lv, sum(mass) AS tm2 FROM b
    ), r AS (
      SELECT *, row_number() OVER (ORDER BY rem_q DESC, host ASC) AS rk
      FROM b
    )
    SELECT host, mass, base_q, rem_q,
      CAST(base_q + CASE WHEN tm2 > 0 AND rk <= lv THEN 1 ELSE 0 END
           AS BIGINT) AS alloc
    FROM r CROSS JOIN l
    """,
)
def budget_allocate(spark, sf_dir):
    """Largest-remainder fetch-budget apportionment
    (operators/budget.allocate_budget): split a 1000-slot round budget
    across 23 synthetic hosts proportionally to their total content mass,
    integer-exact, sum(alloc) == budget guaranteed.  The oracle's
    row_number window is the scale trap the engine avoids — the Spark
    side ranks remainders with the two-phase range-partitioned
    plans.rank.global_rank, no single-partition exchange."""
    from crawld_spark.operators.budget import allocate_budget

    h = (
        _t(spark, sf_dir, "documents")
        .groupBy(
            F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias(
                "host"
            )
        )
        .agg(F.sum("n_chars").cast("long").alias("mass"))
    )
    return allocate_budget(h, budget=1000)



@q(
    "hll_host_distinct",
    """
    WITH u AS (
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) AS key,
             '/u/' || CAST(doc_id % 137 AS VARCHAR) AS url
      FROM documents
    ), h AS (
      SELECT key, url,
             CAST(('0x' || substring(md5(url), 1, 15)) AS BIGINT) AS v
      FROM u
    ), r AS (
      SELECT key, CAST(v % 16 AS INT) AS bucket,
             CASE WHEN (v // 16) >= (1::BIGINT << 55) THEN 1 WHEN (v // 16) >= (1::BIGINT << 54) THEN 2 WHEN (v // 16) >= (1::BIGINT << 53) THEN 3 WHEN (v // 16) >= (1::BIGINT << 52) THEN 4 WHEN (v // 16) >= (1::BIGINT << 51) THEN 5 WHEN (v // 16) >= (1::BIGINT << 50) THEN 6 WHEN (v // 16) >= (1::BIGINT << 49) THEN 7 WHEN (v // 16) >= (1::BIGINT << 48) THEN 8 WHEN (v // 16) >= (1::BIGINT << 47) THEN 9 WHEN (v // 16) >= (1::BIGINT << 46) THEN 10 WHEN (v // 16) >= (1::BIGINT << 45) THEN 11 WHEN (v // 16) >= (1::BIGINT << 44) THEN 12 WHEN (v // 16) >= (1::BIGINT << 43) THEN 13 WHEN (v // 16) >= (1::BIGINT << 42) THEN 14 WHEN (v // 16) >= (1::BIGINT << 41) THEN 15 WHEN (v // 16) >= (1::BIGINT << 40) THEN 16 WHEN (v // 16) >= (1::BIGINT << 39) THEN 17 WHEN (v // 16) >= (1::BIGINT << 38) THEN 18 WHEN (v // 16) >= (1::BIGINT << 37) THEN 19 WHEN (v // 16) >= (1::BIGINT << 36) THEN 20 WHEN (v // 16) >= (1::BIGINT << 35) THEN 21 WHEN (v // 16) >= (1::BIGINT << 34) THEN 22 WHEN (v // 16) >= (1::BIGINT << 33) THEN 23 WHEN (v // 16) >= (1::BIGINT << 32) THEN 24 WHEN (v // 16) >= (1::BIGINT << 31) THEN 25 WHEN (v // 16) >= (1::BIGINT << 30) THEN 26 WHEN (v // 16) >= (1::BIGINT << 29) THEN 27 WHEN (v // 16) >= (1::BIGINT << 28) THEN 28 WHEN (v // 16) >= (1::BIGINT << 27) THEN 29 WHEN (v // 16) >= (1::BIGINT << 26) THEN 30 WHEN (v // 16) >= (1::BIGINT << 25) THEN 31 WHEN (v // 16) >= (1::BIGINT << 24) THEN 32 WHEN (v // 16) >= (1::BIGINT << 23) THEN 33 WHEN (v // 16) >= (1::BIGINT << 22) THEN 34 WHEN (v // 16) >= (1::BIGINT << 21) THEN 35 WHEN (v // 16) >= (1::BIGINT << 20) THEN 36 WHEN (v // 16) >= (1::BIGINT << 19) THEN 37 WHEN (v // 16) >= (1::BIGINT << 18) THEN 38 WHEN (v // 16) >= (1::BIGINT << 17) THEN 39 ELSE 40 END AS rank
      FROM h
    ), regs AS (
      SELECT key, bucket, max(rank) AS m_j FROM r GROUP BY key, bucket
    ), z AS (
      SELECT key, CAST(count(*) AS BIGINT) AS n_buckets_hit,
             CAST(sum(1::BIGINT << (48 - m_j)) AS BIGINT) AS zh
      FROM regs GROUP BY key
    ), e AS (
      SELECT key, n_buckets_hit,
             CAST(zh + (16 - n_buckets_hit) * (1::BIGINT << 48) AS BIGINT)
               AS z_scaled
      FROM z
    ), x AS (
      SELECT key, CAST(count(DISTINCT url) AS BIGINT) AS n_exact
      FROM u GROUP BY key
    )
    SELECT key, n_buckets_hit, z_scaled,
      CAST(((256 * (1::BIGINT << 48)) // z_scaled) * 673 // 1000 AS BIGINT)
        AS est_q,
      n_exact
    FROM e JOIN x USING (key)
    """,
)
def hll_host_distinct(spark, sf_dir):
    """Deterministic integer-exact HyperLogLog per-host distinct-URL
    sketch (operators/corpus.hll_distinct): md5 hash, 16 max() registers
    per host, all-integer raw-HLL estimator — the one approximate-distinct
    form that can hash-match across engines (Spark's and DuckDB's builtin
    approx_count_distinct never agree).  The oracle regenerates the same
    rank comparison chain and floor arithmetic; n_exact rides along so
    the sketch's accuracy is visible in the result itself.  Scale: the
    register tree shuffles (host, 2 small ints) — network cost
    independent of URL count — vs count_distinct's full-value shuffle."""
    from crawld_spark.operators.corpus import hll_distinct

    u = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("/u/"), (F.col("doc_id") % 137).cast("string")).alias(
            "url"
        ),
    )
    est = hll_distinct(u, key_col="host", val_col="url")
    exact = u.groupBy(F.col("host").alias("key")).agg(
        F.count_distinct("url").cast("long").alias("n_exact")
    )
    return est.join(exact, "key")


@q(
    "shard_assign",
    # rendezvous (HRW) host→fetcher-shard map (r5): argmax over s of
    # md5(host || '#' || s) — md5 is the shared hash, so the oracle
    # replays the argmax as a row_number over the same strings; ties
    # (impossible for md5, but pinned anyway) break toward the LARGER
    # shard on both sides to mirror array_max struct ordering
    """
    WITH hosts AS (
      SELECT 'h' || CAST(doc_id % 97 AS VARCHAR) AS host,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    ), w8 AS (
      SELECT host, n, t.s AS shard,
             md5(host || '#' || CAST(t.s AS VARCHAR)) AS w
      FROM hosts CROSS JOIN range(0, 8) t(s)
    ), a8 AS (
      SELECT host, n, CAST(shard AS BIGINT) AS shard FROM (
        SELECT *, row_number() OVER (PARTITION BY host
                                     ORDER BY w DESC, shard DESC) AS rk
        FROM w8
      ) WHERE rk = 1
    ), w9 AS (
      SELECT host, t.s AS shard,
             md5(host || '#' || CAST(t.s AS VARCHAR)) AS w
      FROM hosts CROSS JOIN range(0, 9) t(s)
    ), a9 AS (
      SELECT host, CAST(shard AS BIGINT) AS shard FROM (
        SELECT *, row_number() OVER (PARTITION BY host
                                     ORDER BY w DESC, shard DESC) AS rk
        FROM w9
      ) WHERE rk = 1
    )
    SELECT a8.shard,
           CAST(count(*) AS BIGINT) AS n_hosts,
           CAST(sum(a8.n) AS BIGINT) AS n_pages,
           CAST(sum(CASE WHEN a8.shard <> a9.shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved
    FROM a8 JOIN a9 USING (host)
    GROUP BY a8.shard
    """,
)
def shard_assign(spark, sf_dir):
    """Host → fetcher-shard rendezvous hashing (operators/shards) — the
    cluster analog of crawld's bounded worker pool
    (/root/reference/crawld.go:129-243): a stable host→shard map keeps
    each host's politeness clock on one executor, and HRW's resize
    property (only ~1/(S+1) of hosts move when the fleet grows 8→9)
    shows up directly in n_moved. Shuffle-free assignment: both the S=8
    and S=9 argmaxes are codegen projections of the same host row — the
    whole lane is one host-grain groupBy; the oracle replays the argmax
    as a row_number over identical md5 strings."""
    from crawld_spark.operators.shards import shard_resize_stats

    h = (
        _t(spark, sf_dir, "documents")
        .groupBy(
            F.concat(F.lit("h"), (F.col("doc_id") % 97).cast("string")).alias(
                "host"
            )
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    return shard_resize_stats(h, n_from=8, n_to=9, weight_col="n")


@q(
    "payload_type_stats",
    # JVM magic-byte payload typing (r5): the engine BUILDS real container
    # payloads (BMP/PPM/PGM/PNG/GIF/WAV + garbage) then types them with a
    # pure-codegen binary-prefix sniff; the oracle states the planted
    # format arithmetically from doc_id (the frame_sample pattern)
    """
    SELECT CASE CAST(doc_id % 7 AS INT)
             WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' WHEN 2 THEN 'pgm'
             WHEN 3 THEN 'png' WHEN 4 THEN 'gif' WHEN 5 THEN 'wav'
             ELSE 'unknown' END AS fmt,
           CAST(count(*) AS BIGINT) AS n_payloads
    FROM documents GROUP BY 1
    """,
)
def payload_type_stats(spark, sf_dir):
    """Corpus-wide payload-type census via the JVM magic-byte sniffer
    (operators/multimodal.sniff_type_col): a 100 TB binary column is
    typed at scan speed — substring-on-BINARY prefix equality inside
    whole-stage codegen, no Python in the classify path — so decode
    lanes (which DO pay the Arrow hop) see only the rows of their own
    format. Payloads here are real encoder output (the same pure-numpy
    encoders the decode lanes round-trip) plus an ASCII-hex garbage
    bucket that must fall through to 'unknown'."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from crawld_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_pgm,
        encode_png,
        encode_wav,
        sniff_type_col,
    )

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"))
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            payloads = []
            for i in b["doc_id"]:
                i = int(i)
                k = i % 7
                yy, xx = np.mgrid[0:3, 0:4]
                gray = ((i % 23) + 3 * xx + 5 * yy).astype(np.uint8) % 251
                rgb = np.stack(
                    [gray, (gray * 2) % 251, (gray * 3) % 251], axis=-1
                ).astype(np.uint8)
                if k == 0:
                    p = encode_bmp(rgb)
                elif k == 1:
                    p = b"P6\n4 3\n255\n" + rgb.tobytes()
                elif k == 2:
                    p = encode_pgm(gray)
                elif k == 3:
                    p = encode_png(rgb)
                elif k == 4:
                    p = encode_gif(rgb)
                elif k == 5:
                    p = encode_wav(
                        (np.arange(16, dtype=np.int16) * ((i % 5) + 1)).astype(
                            np.int16
                        )
                    )
                else:
                    p = hashlib.md5(str(i).encode()).hexdigest().encode()
                payloads.append(p)
            yield pd.DataFrame({"doc_id": b["doc_id"].values, "payload": payloads})

    payloads = d.mapInPandas(build, schema)
    return (
        payloads.select(
            F.coalesce(sniff_type_col("payload"), F.lit("unknown")).alias("fmt")
        )
        .groupBy("fmt")
        .agg(F.count("*").cast("long").alias("n_payloads"))
    )


@q(
    "cms_heavy_hitters",
    # Count-Min frequency sketch (r5): the frequency dual of
    # hll_host_distinct — md5-derived (row, bucket) cells, min-over-rows
    # point estimates, one-sided error (est >= exact always); skewed
    # host synth: 'hot' carries ~half the mass, h0..h9 warm, c0..c99 cold
    """
    WITH u AS (
      SELECT CASE
               WHEN doc_id % 4 < 2 THEN 'hot'
               WHEN doc_id % 4 = 2 THEN 'h' || CAST(doc_id % 10 AS VARCHAR)
               ELSE 'c' || CAST(doc_id % 100 AS VARCHAR)
             END AS host
      FROM documents
    ), cells AS (
      SELECT t.r AS row,
             CAST(CAST(('0x' || substring(md5(CAST(t.r AS VARCHAR) || '#'
                        || host), 1, 15)) AS BIGINT) % 64 AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM u CROSS JOIN range(0, 4) t(r)
      GROUP BY 1, 2
    ), k AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n_exact FROM u GROUP BY host
    ), kb AS (
      SELECT k.host, k.n_exact, t.r AS row,
             CAST(CAST(('0x' || substring(md5(CAST(t.r AS VARCHAR) || '#'
                        || k.host), 1, 15)) AS BIGINT) % 64 AS INT) AS bucket
      FROM k CROSS JOIN range(0, 4) t(r)
    )
    SELECT kb.host AS key, CAST(min(cells.c) AS BIGINT) AS est_q,
           min(kb.n_exact) AS n_exact,
           (CAST(min(cells.c) AS BIGINT) >= 40) AS is_heavy
    FROM kb JOIN cells USING (row, bucket)
    GROUP BY kb.host
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-Min heavy-hitter screen (operators/corpus.cms_cells /
    cms_estimate): the frontier-skew detector — a fixed d×64-cell sketch
    whose shuffle cost is independent of key cardinality flags the Zipf
    head (the hosts that need salting / budget caps) without an exact
    per-key aggregation at 10^8 hosts. One-sided error by construction:
    est_q >= n_exact for every key, and n_exact rides along so the
    overestimate is visible in the result."""
    from crawld_spark.operators.corpus import cms_cells, cms_estimate

    u = _t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 4 < 2, F.lit("hot"))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("c"), (F.col("doc_id") % 100).cast("string"))
        )
        .alias("host")
    )
    cells = cms_cells(u, val_col="host", width=64)
    keys = u.groupBy("host").agg(F.count("*").cast("long").alias("n_exact"))
    est = cms_estimate(cells, keys, val_col="host", width=64)
    return est.join(
        keys.select(F.col("host").alias("key"), "n_exact"), "key"
    ).select(
        "key", "est_q", "n_exact", (F.col("est_q") >= 40).alias("is_heavy")
    )


# ---------------------------------------------------------------------
# Driver-row rotation (VERDICT r4 item 1): the driver's correctness gate
# caps at the FIRST 50 lanes in queries() iteration order.  All 75 lanes
# pass the identical local DuckDB mirror (tests/test_queries_oracle.py);
# rotate so the 25 lanes that had no CORRECTNESS_r04 row — plus any lane
# added this round — are emitted first and earn driver rows in r5.  The
# remaining 50 keep their r4 rows and fill positions 25..74, freshest
# verification need first.
# ---------------------------------------------------------------------
_R5_FRONT = [
    # no driver row yet (registered 50..74 in r4)
    "materialize_sequences", "length_percentile_filter", "tfidf_top_terms",
    "url_canonicalize", "warc_roundtrip", "sitemap_roundtrip",
    "extract_text_roundtrip", "extract_links_roundtrip", "multimodal_meta",
    "frame_sample", "multimodal_decode_roundtrip", "png_decode_roundtrip",
    "perplexity_buckets", "ann_ivf_pq", "ann_pq_adc", "ann_pq_rerank",
    "frontier_prioritize", "bm25_topk", "zorder_key", "sessionize",
    "session_window_agg", "host_stats", "snapshot_diff", "anchor_text_agg",
    "jpeg_decode_roundtrip",
]


# r6 rotation (VERDICT r5 item 2 + this round's optimization diff): the
# driver's 50 correctness slots go to (a) the 40 lanes whose latest driver
# row is r4 — every lane then has a row ≤ 2 rounds old — and (b) the lanes
# this optimization round restructured whose latest row is r5 (the codec
# lanes, the PQ family, perplexity_buckets, tfidf_top_terms), so every
# changed plan earns a fresh driver row this round.
_R6_FRONT = [
    # changed this round, latest row r5
    "jpeg_decode_roundtrip", "frame_sample", "multimodal_decode_roundtrip",
    "png_decode_roundtrip", "payload_type_stats", "perplexity_buckets",
    "ann_ivf_pq", "ann_pq_adc", "ann_pq_rerank", "tfidf_top_terms",
    # latest driver row r4 (40)
    "scalar_funcs", "error_taxonomy", "two_phase_lang_filter",
    "round_metrics", "events_windowed_agg", "fetch_order",
    "politeness_window", "dedup_exact", "dedup_minhash_lsh",
    "dedup_neardup_mark", "dedup_clusters", "dedup_simhash",
    "dedup_simhash_bands", "ngram_jaccard", "embedding_neardup",
    "srp_neardup", "ann_brute_topk", "ann_ivf_topk", "ann_ivf_kmeans",
    "semantic_dedup", "lang_id", "quality_score", "token_counts",
    "token_counts_bpe", "fingerprint", "stratified_sample", "decontaminate",
    "decontaminate_fuzzy", "curation_pipeline", "quality_rules", "pii_scrub",
    "dedup_paragraphs", "boilerplate_strip", "lm_familiarity",
    "host_blocklist", "dedup_spans", "quality_classifier",
    "recrawl_priority", "pagerank", "sequence_packing",
]


def _rotated(d: dict) -> dict:
    front = [k for k in _R6_FRONT if k in d]
    rest = [k for k in d if k not in _R6_FRONT]
    return {k: d[k] for k in front + rest}


# the 50 lanes with a green CORRECTNESS_r04 row (registration order r4)
_R4_COVERED = frozenset({
    "frontier_scan_filter", "topk_per_group", "global_limit",
    "point_lookup_enrich", "set_expansion", "link_if_absent", "seen_probe",
    "merge_upsert", "count_exists", "validation_filter", "scalar_funcs",
    "error_taxonomy", "two_phase_lang_filter", "round_metrics",
    "events_windowed_agg", "fetch_order", "politeness_window", "dedup_exact",
    "dedup_minhash_lsh", "dedup_neardup_mark", "dedup_clusters",
    "dedup_simhash", "dedup_simhash_bands", "ngram_jaccard",
    "embedding_neardup", "srp_neardup", "ann_brute_topk", "ann_ivf_topk",
    "ann_ivf_kmeans", "semantic_dedup", "lang_id", "quality_score",
    "token_counts", "token_counts_bpe", "fingerprint", "stratified_sample",
    "decontaminate", "decontaminate_fuzzy", "curation_pipeline",
    "quality_rules", "pii_scrub", "dedup_paragraphs", "boilerplate_strip",
    "lm_familiarity", "host_blocklist", "dedup_spans", "quality_classifier",
    "recrawl_priority", "pagerank", "sequence_packing",
})


def _flushing(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS lane's registered localCheckpoint blocks before
    building this lane's plan — a full 80-lane sweep otherwise accumulates
    every lane's materialized blocks in executor storage (measured as a
    broad in-suite slowdown of later lanes; see operators/ckpt.py)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from crawld_spark.operators.ckpt import flush_released

        flush_released()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _flushing(fn) for name, fn in _rotated(_Q).items()}


def oracle_sql() -> dict[str, str]:
    return _rotated(_SQL)
