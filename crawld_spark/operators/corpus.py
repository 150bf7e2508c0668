"""Corpus-level rollups: per-host reputation stats and cross-snapshot diffs.

Two operators every production crawl/curation loop runs between fetch
rounds, distinct from the per-document family in textstats.py:

- ``host_stats``: the domain-level prior. Web-corpus curation scores
  whole hosts before it scores documents (a host that is 80% exact
  duplicates or single-language boilerplate gets demoted wholesale —
  the FineWeb/CCNet "per-domain" discipline). The crawld analog is the
  per-forge bookkeeping in the reference's crawler cascade
  (/root/reference/crawlers/github.go:72-80 ranks within a source);
  here the rollup is computed FROM the corpus rather than from API
  metadata.
- ``snapshot_diff``: the recrawl change-detector. Two crawl snapshots of
  the same URL space → added / removed / changed / unchanged per URL,
  the input to freshness priors (operators/freshness.py) and recrawl
  scheduling. The reference's clone-vs-update branch
  (/root/reference/crawld.go:109-249) is the per-repo form of the same
  decision; the diff operator is its set-at-once form.

Scale discipline (10^10 URLs / 10^8 hosts):

- ``host_stats`` shuffles only ``(host, digest, small ints)`` — text
  never moves; the digest is md5 (16 bytes), computed map-side. Two
  aggregations, both partial-agg collapsible (hot hosts are exactly the
  map-side-combine case); the host-level join at the end is
  host-cardinality, not doc-cardinality.
- ``snapshot_diff`` is one full-outer equi-join on the URL key with
  narrow payloads (key + digest). Both sides hash-partition on the same
  key, so AQE can plan a co-partitioned join; no row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_stats(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-host rollup: ``(host, n_docs, total_chars, dup_docs, n_langs)``.

    ``dup_docs`` counts documents whose exact text digest collides with
    another document of the SAME host (within-host exact-duplicate mass,
    the boilerplate-host signal). All counts are int64.
    """
    d = docs.select(
        F.col(host_col).alias("host"),
        F.md5(F.col(text_col)).alias("dig"),
        F.col(lang_col).alias("lang"),
        F.col(chars_col).cast("long").alias("chars"),
    )
    # pass 1: collapse to (host, digest) — text never shuffles, and the
    # partial aggregation absorbs hot hosts before the exchange
    g = d.groupBy("host", "dig").agg(
        F.count("*").alias("cnt"), F.sum("chars").alias("chars")
    )
    h = g.groupBy("host").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_docs"),
    )
    # distinct langs per host: separate host-keyed agg (count_distinct
    # dedups partially per key before the exchange), host-cardinality join
    l = d.groupBy("host").agg(
        F.count_distinct("lang").cast("long").alias("n_langs")
    )
    return h.join(l, "host").select(
        "host", "n_docs", "total_chars", "dup_docs", "n_langs"
    )


def snapshot_diff(
    old: DataFrame,  # key_col + digest_col
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "dig",
) -> DataFrame:
    """Cross-snapshot URL diff: ``(url, status, old_digest, new_digest)``
    with status in {added, removed, changed, unchanged}.

    One full-outer equi-join on the key; payloads are digests only, so the
    exchange is ~50 bytes/row regardless of page size. Downstream:
    ``changed``/``added`` rows feed the recrawl frontier, ``removed`` rows
    feed tombstones, and per-host ``changed`` rates feed
    freshness.change_rates.
    """
    o = old.select(
        F.col(key_col).alias("url"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(key_col).alias("url"), F.col(digest_col).alias("new_digest")
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", status.alias("status"), "old_digest", "new_digest")


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_shared: int = 1,
    max_hosts_per_digest: int = 16,
) -> DataFrame:
    """Mirror/CDN detection: host pairs serving identical content —
    ``(host_a, host_b, shared_digests)`` with ``host_a < host_b``, kept
    when the pair shares at least ``min_shared`` distinct exact-content
    digests. The corpus-level dual of per-document exact dedup: a crawler
    that discovers ``ftp.x.org`` mirrors ``archive.y.net`` stops paying
    fetch budget twice (the reference's per-forge dedup-by-clone-URL,
    /root/reference/crawld.go:109-130, is the single-source special case).

    Scale shape (10^8 hosts, 10^10 pages):

    - pages collapse to DISTINCT ``(host, md5)`` first — text never
      shuffles, and per-host duplicate mass vanishes map-side;
    - digests on more than ``max_hosts_per_digest`` hosts are dropped
      BEFORE the pair join. Shared-content frequency is power-law (one
      CC-licensed boilerplate page can sit on millions of hosts → that
      single digest would emit 10^12 pairs); the cap bounds the self-join
      blowup to K^2 rows per digest and the survivors are precisely the
      "few hosts, many shared pages" mirror signal the operator is after;
    - the pair count groups by ``(host_a, host_b)`` — partial-agg
      collapsible, keys are host strings only.
    """
    hd = (
        docs.select(
            F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("dig")
        )
        .distinct()
    )
    fan = hd.groupBy("dig").agg(F.count("*").alias("_nh"))
    eligible = fan.where(
        (F.col("_nh") >= 2) & (F.col("_nh") <= max_hosts_per_digest)
    ).select("dig")
    hd = hd.join(eligible, "dig")
    a = hd.select("dig", F.col("host").alias("host_a"))
    b = hd.select("dig", F.col("host").alias("host_b"))
    pairs = a.join(b, "dig").where(F.col("host_a") < F.col("host_b"))
    return (
        pairs.groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared_digests"))
        .where(F.col("shared_digests") >= F.lit(min_shared))
    )


# --- deterministic HyperLogLog distinct sketch --------------------------
#
# Spark's approx_count_distinct and DuckDB's approx_count_distinct use
# different HLL implementations (different hash, different corrections),
# so they can never hash-match across engines.  This form is built from
# first principles to be INTEGER-EXACT and engine-independent: the hash
# is md5 (identical everywhere), register updates are max() (order
# independent), and the estimator is evaluated entirely in int64 floor
# arithmetic — the DuckDB twin replays it bit-for-bit.  It is the "novel
# sketch as composition of existing ops" pattern: per-key distinct-URL
# estimation whose state is m small integers per key instead of a
# distinct-set shuffle.

HLL_P = 4                      # 2^4 = 16 registers per key
HLL_M = 1 << HLL_P
HLL_RANK_CAP = 40              # ranks beyond 40 are astronomically rare
_HLL_R = 48                    # Z is scaled by 2^48 (see estimator note)
# alpha_16 = 0.673 (Flajolet et al. 2007), as the exact rational 673/1000
_HLL_ALPHA_NUM, _HLL_ALPHA_DEN = 673, 1000


def _hll_rank(w):
    """Rank (leading-zero count + 1) of the 56-bit suffix ``w``, capped at
    HLL_RANK_CAP — built as an explicit comparison chain because neither
    engine has an integer clz; the DuckDB twin generates the same chain."""
    expr = F.lit(HLL_RANK_CAP)
    for r in range(HLL_RANK_CAP - 1, 0, -1):
        expr = F.when(w >= F.lit(1 << (56 - r)), F.lit(r)).otherwise(expr)
    return expr


def hll_distinct(
    df: DataFrame,
    key_col: str = "host",
    val_col: str = "url",
) -> DataFrame:
    """Per-key approximate-distinct sketch:
    ``(key, n_buckets_hit, z_scaled, est_q)`` where ``est_q`` is the raw
    HLL estimate of ``count_distinct(val_col)`` per key, int64.

    Estimator, all-integer: with register maxima M_j (0 for empty
    registers), ``Z_scaled = Σ_j 2^(48 − M_j)`` (empty registers add
    2^48; M_j ≤ 40 keeps every term ≥ 2^8 and the sum ≤ 2^52), then
    ``est_q = ((m² · 2^48) div Z_scaled) · 673 div 1000`` — the raw
    HyperLogLog α_m·m²/Z with α_16 = 0.673 as an exact rational and both
    divisions floor.  No float enters at any point, so partitioning,
    shuffle order, and engine cannot change a single bit.  Raw HLL (no
    small/large-range correction) is accurate for n ≳ 2.5·m = 40
    distinct values per key; below that it reads high — callers counting
    tiny keys should count exactly (they can afford to).

    Scale shape (10^10 URLs / 10^8 hosts): ONE aggregation tree —
    ``groupBy(key, bucket).max(rank)`` partial-aggregates on the scan
    side (each task emits ≤ m rows per key regardless of row count),
    then ``groupBy(key)`` folds the ≤ m register rows into the estimate.
    The shuffle carries (key, 2 small ints): a distinct-count whose
    network cost is independent of the number of URLs, vs
    count_distinct's (key, full value) shuffle.
    """
    v = F.conv(F.substring(F.md5(F.col(val_col)), 1, 15), 16, 10).cast(
        "long"
    )
    regs = (
        df.select(
            F.col(key_col).alias("key"),
            (v % HLL_M).cast("int").alias("bucket"),
            # exact floor division — `/` would round-trip through double
            # and corrupt bits above 2^53
            v.alias("_v"),
        )
        .select(
            "key", "bucket", F.expr(f"_v div {HLL_M}").alias("w")
        )
        .select("key", "bucket", _hll_rank(F.col("w")).alias("rank"))
        .groupBy("key", "bucket")
        .agg(F.max("rank").alias("m_j"))
    )
    return (
        regs.groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n_buckets_hit"),
            F.sum(F.expr(f"shiftleft(1L, {_HLL_R} - m_j)"))
            .cast("long")
            .alias("_z_hit"),
        )
        .select(
            "key",
            "n_buckets_hit",
            (
                F.col("_z_hit")
                + (F.lit(HLL_M) - F.col("n_buckets_hit"))
                * F.lit(1 << _HLL_R)
            ).cast("long").alias("z_scaled"),
        )
        .select(
            "key",
            "n_buckets_hit",
            "z_scaled",
            F.expr(
                f"(({HLL_M * HLL_M} * {1 << _HLL_R}L) div z_scaled)"
                f" * {_HLL_ALPHA_NUM} div {_HLL_ALPHA_DEN}"
            ).cast("long").alias("est_q"),
        )
    )


# ---------------- Count-Min frequency sketch ----------------
# The frequency dual of hll_distinct: a fixed-size (d × width) counter
# table answering "how often does key X occur" with one-sided error
# (never under, over by at most the collision mass of its lightest
# row). The crawl-side use is skew detection: the frontier's Zipf head
# (hot hosts, hot URL templates) must be found BEFORE the scheduler
# shuffles on the key — the sketch's wire cost is ≤ d·width cells per
# task regardless of key cardinality, so it can run every round as a
# side-channel of the admission scan, where an exact per-key count at
# 10^8 hosts would be a full extra aggregation of the same width as the
# job it is trying to protect. md5-derived buckets keep it bit-identical
# in the DuckDB twin (module hash contract in queries.py).

CMS_D = 4  # independent hash rows


def _cms_buckets(val: F.Column, width: int, d: int) -> F.Column:
    """Array of the d row-buckets for a value: row k hashes
    md5('k#' || val), takes 15 hex digits (60 bits, always positive) and
    reduces mod width — the same conv path hll_distinct uses."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{k}#"), val)), 1, 15),
                    16,
                    10,
                ).cast("long")
                % width
            ).cast("int")
            for k in range(d)
        ]
    )


def cms_cells(
    df: DataFrame,
    val_col: str = "host",
    width: int = 64,
    d: int = CMS_D,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the Count-Min counter table ``(row, bucket, c)`` over
    ``val_col`` (optionally weighted). One narrow generate + ONE
    aggregation: posexplode emits d (row, bucket) ints per input row
    map-side, and the groupBy partial-aggregates them to ≤ d·width cells
    per task before the exchange — the shuffle carries a bounded-size
    sketch, never the keys."""
    w = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    return (
        df.select(
            F.posexplode(_cms_buckets(F.col(val_col), width, d)).alias(
                "row", "bucket"
            ),
            w.alias("_w"),
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    val_col: str = "host",
    width: int = 64,
    d: int = CMS_D,
) -> DataFrame:
    """Point-estimate the sketch for each key in ``keys``:
    ``est_q = min over rows of the key's counter`` (0 for a key no row
    ever saw). ``keys`` is expected to be small (the candidate set being
    screened — e.g. distinct hosts of one round's admissions); the cell
    table is at most d·width rows, so Catalyst broadcasts whichever side
    is narrower and nothing large shuffles."""
    kb = keys.select(
        F.col(val_col).alias("key"),
        F.posexplode(_cms_buckets(F.col(val_col), width, d)).alias(
            "row", "bucket"
        ),
    )
    return (
        kb.join(cells, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_q"))
    )
