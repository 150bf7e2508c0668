"""Link-graph centrality for frontier prioritization.

Crawlers order their frontier by link evidence — crawld ranks by
fork/stars metadata (crawlers/github.go:72-80 cascade), web crawlers by
in-link centrality (OPIC / PageRank). This module provides the
PageRank form over the engine's (src, dst) link edges, built for the
same two disciplines as the rest of the repo:

- **Integer-exact determinism**: ranks live in int64 micro-units
  (1e6 = rank 1.0). Each iteration distributes ``rank_q // out_degree``
  to successors (exact floor division) and damps with
  ``0.15e6 + (85 * sum) // 100`` — every operation is integer, so sums
  are order-independent and the DuckDB twin replays the whole loop
  bit-for-bit (the kmeans_assign playbook; no floating-point drift
  across engines, shuffle schedules, or partition counts).
- **Bounded lineage**: fixed iteration count, rank frame
  localCheckpoint-ed per iteration (the connected_components
  discipline), so the plan never grows with n_iter.

Scale (10^10-edge web graph): one iteration = one equi-join of the rank
frame onto edges by ``src`` + one ``groupBy(dst)`` sum — both
map-side-combinable, shuffling only (long, long) pairs. Hot pages
(everybody links the homepage) are exactly the partial-agg-collapsible
case; dangling nodes keep their damped base rank via the left join.
No window, no driver state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000  # rank 1.0 in micro-units
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85, exact rational

# graphs with at most this many edges replay the fixed-iteration integer
# PageRank driver-side (~32 MB of pairs collected; see pagerank docstring)
DRIVER_PR_MAX_EDGES = 2_000_000


def _pagerank_driver(e, n_iter: int):
    """Driver-side replay of the integer PageRank loop over a collected
    (bounded) edge list — bit-identical arithmetic: int64 shares via floor
    division, absorbing sinks, 0.15·SCALE + (85·in_sum) div 100 updates.
    Returns the (node, rank_q, out_deg) frame via the Arrow local-table
    path (no Python-RDD workers)."""
    import numpy as np
    import pandas as pd

    from crawld_spark.session import local_df

    rows = e.collect()
    src = pd.Series([r[0] for r in rows])
    dst = pd.Series([r[1] for r in rows])
    codes, uniques = pd.factorize(pd.concat([src, dst], ignore_index=True))
    m = len(rows)
    si, di = codes[:m].astype(np.int64), codes[m:].astype(np.int64)
    n = len(uniques)
    out_deg = np.zeros(n, dtype=np.int64)
    np.add.at(out_deg, si, 1)
    rank = np.full(n, SCALE, dtype=np.int64)
    floor_base = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    for _ in range(max(1, n_iter)):
        share = np.zeros(n, dtype=np.int64)
        nz = out_deg > 0
        share[nz] = rank[nz] // out_deg[nz]  # nonneg: // == div
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, di, share[si])
        rank = floor_base + (in_sum * DAMP_NUM) // DAMP_DEN
    out_rows = list(zip(uniques.tolist(), rank.tolist(), out_deg.tolist()))
    key_t = e.schema["src"].dataType.simpleString()
    return local_df(
        e.sparkSession, out_rows,
        f"node {key_t}, rank_q long, out_deg long",
        ["node", "rank_q", "out_deg"],
    )


def anchor_text_agg(
    pages: DataFrame,  # id_col + html_col (binary)
    html_col: str = "html",
    id_col: str = "doc_id",
    max_anchors: int = 8,
) -> DataFrame:
    """Inbound anchor-text aggregation per link target:
    ``(target, n_inlinks, n_srcs, anchors_joined)``.

    Anchor text is the classic off-page relevance signal (how OTHER pages
    describe a URL) — search/crawl stacks aggregate it per target to rank
    frontier candidates and to label pages never yet fetched. crawld's
    analog is set-expansion metadata travelling with the link
    (/root/reference/crawlers/github.go:941-1002); the web form carries
    the <a> element's text.

    Shape: one Arrow hop extracts (href, anchor) pairs from each page,
    the explode emits ``(target, short string)`` rows — HTML never leaves
    its executor — and one groupBy(target) aggregates. ``anchors_joined``
    is the sorted distinct anchor set capped at ``max_anchors`` entries
    (hot targets — everyone links the homepage — would otherwise
    collect_set unboundedly; the cap is applied after the sort so the
    kept set is deterministic). Counts are int64.
    """
    from crawld_spark.functions.extract import extract_anchors

    pairs = pages.select(
        F.col(id_col).alias("src"),
        F.explode(extract_anchors(F.col(html_col))).alias("pair"),
    ).select(
        "src",
        F.split_part(F.col("pair"), F.lit("\t"), F.lit(1)).alias("target"),
        F.split_part(F.col("pair"), F.lit("\t"), F.lit(2)).alias("anchor"),
    )
    return pairs.groupBy("target").agg(
        F.count("*").cast("long").alias("n_inlinks"),
        F.count_distinct("src").cast("long").alias("n_srcs"),
        F.concat_ws(
            "|", F.slice(F.array_sort(F.collect_set("anchor")), 1, max_anchors)
        ).alias("anchors_joined"),
    )


def pagerank(
    edges: DataFrame,  # src, dst (node ids; parallel edges count twice)
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,  # False = keep full lineage (plan tests only)
    key_type: str = "long",  # node-key cast; "string" for URL-keyed graphs
) -> DataFrame:
    """Fixed-iteration integer PageRank. Returns ``(node, rank_q, out_deg)``
    for every node appearing as source or destination; ``rank_q`` is the
    int64 micro-unit rank (``rank ≈ rank_q / 1e6``).

    Uniform init at SCALE; per iteration every node sends
    ``rank_q // out_deg`` along each out-edge and lands at
    ``0.15·SCALE + (85 · inbound_sum) // 100``. Sinks (out_deg = 0) absorb
    (their mass leaves the system, the "remove dangling mass" PageRank
    variant) — chosen because it keeps the update local and exactly
    replayable; the conserved variant needs a global dangling-sum term
    (one extra scalar agg per iteration) and is a drop-in if needed.

    ``key_type`` only casts the node key; all rank arithmetic stays int64
    regardless (url-keyed frontiers pass ``key_type="string"`` and skip a
    hash-to-id mapping — the shuffle key is a few bytes wider, the plan is
    identical).
    """
    e = edges.select(
        F.col(src_col).cast(key_type).alias("src"),
        F.col(dst_col).cast(key_type).alias("dst"),
    )
    if checkpoint:
        # bounded graphs solve driver-side (r6): the update is pure int64
        # arithmetic (share = rank_q div out_deg, landing at
        # 0.15·SCALE + (85·in_sum) div 100), so a numpy replay is
        # bit-identical to the iterative join loop — without n_iter rounds
        # of 2 joins + an eager checkpoint each, which were pure fixed
        # cost at mid-scale (measured 3.2 s for a 100k-edge graph at
        # sf1.0, ~1 s driver-side). checkpoint=False (the plan-test mode)
        # and larger graphs keep the distributed loop.
        e = e.localCheckpoint(eager=True)
        if e.count() <= DRIVER_PR_MAX_EDGES:
            from crawld_spark.operators.seen import release_df

            out = _pagerank_driver(e, n_iter)
            release_df(e)
            return out
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("out_deg"))
    base = nodes.join(deg, nodes.node == deg.src, "left").select(
        "node", F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg")
    )
    if checkpoint:
        base = base.localCheckpoint(eager=True)
    rank = base.select("node", F.lit(SCALE).cast("long").alias("rank_q"))
    floor_base = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  # 0.15 · SCALE
    # all quantities are nonnegative by construction, so `div` (exact long
    # division, no double rounding past 2^53 — in_sum can reach N·SCALE)
    # IS floor division, matching DuckDB's `//` in the oracle
    for _ in range(max(1, n_iter)):
        contrib = (
            rank.join(base, "node")
            .where(F.col("out_deg") > 0)
            .select("node", F.expr("rank_q div out_deg").alias("share"))
            .join(e, F.col("node") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum("share").alias("in_sum"))
        )
        rank = (
            base.select("node")
            .join(contrib, base.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(floor_base)
                    + F.expr(
                        f"(coalesce(in_sum, 0L) * {DAMP_NUM}) div {DAMP_DEN}"
                    )
                ).cast("long").alias("rank_q"),
            )
        )
        if checkpoint:
            rank = rank.localCheckpoint(eager=True)
    return rank.join(base, "node").select("node", "rank_q", "out_deg")


def _hits_driver(e, n_iter: int):
    """Driver-side replay of the integer HITS loop over a collected
    (bounded) edge list — bit-identical: int64 sums across edges, rescale
    q = raw div (max(raw) div SCALE + 1) applied to EVERY node (absent
    raw = 0), auth-then-hub half-steps."""
    import numpy as np
    import pandas as pd

    from crawld_spark.session import local_df

    rows = e.collect()
    src = pd.Series([r[0] for r in rows])
    dst = pd.Series([r[1] for r in rows])
    codes, uniques = pd.factorize(pd.concat([src, dst], ignore_index=True))
    m = len(rows)
    si, di = codes[:m].astype(np.int64), codes[m:].astype(np.int64)
    n = len(uniques)

    def half(score, from_idx, to_idx):
        raw = np.zeros(n, dtype=np.int64)
        np.add.at(raw, to_idx, score[from_idx])
        rmax = int(raw.max()) if n else 0
        return raw // (rmax // SCALE + 1)

    hub = np.full(n, SCALE, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(max(1, n_iter)):
        auth = half(hub, si, di)
        hub = half(auth, di, si)
    out_rows = list(zip(uniques.tolist(), hub.tolist(), auth.tolist()))
    key_t = e.schema["src"].dataType.simpleString()
    return local_df(
        e.sparkSession, out_rows,
        f"node {key_t}, hub_q long, auth_q long",
        ["node", "hub_q", "auth_q"],
    )


def hits(
    edges: DataFrame,  # src, dst (node ids; parallel edges count twice)
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,  # False = keep full lineage (plan tests only)
    key_type: str = "long",  # node-key cast; "string" for URL-keyed graphs
) -> DataFrame:
    """Fixed-iteration integer HITS (Kleinberg hubs & authorities).
    Returns ``(node, hub_q, auth_q)`` for every node appearing as source
    or destination, both scores int64 in [0, SCALE].

    The frontier analog of crawld's fork/stars cascade
    (/root/reference/crawlers/github.go:72-80): a good *hub* is a page
    that links many good authorities (a seed list, a directory page), a
    good *authority* is a page linked by many good hubs — exactly the two
    roles a crawl scheduler wants separated (fetch authorities for
    content, refetch hubs for discovery). PageRank (above) collapses the
    two into one score; HITS keeps them apart.

    Integer discipline: classic HITS renormalizes by the L2 norm —
    floating point, not replayable across engines. Here each half-step
    rescales by **max-bounded floor division**: after the sum,
    ``q = raw div (rmax div SCALE + 1)`` with ``rmax = max(raw)``, which
    (a) keeps every score in [0, SCALE] so the next sum cannot overflow
    int64 below ~9e12 nodes, (b) never forms a product wider than int64,
    and (c) is order-independent, so the DuckDB twin (unrolled CTEs, `//`)
    matches bit-for-bit. Relative order within an iteration is identical
    to the L2-normalized ranks; only the scale differs.

    Scale (10^10-edge web graph): each half-step is one equi-join of the
    score frame onto edges + one groupBy sum — both map-side-combinable,
    shuffling only (long, long) pairs. The per-step ``rmax`` is a scalar
    aggregate broadcast back in (never a driver round-trip inside the
    plan). Hot targets (everyone links the homepage) collapse in the
    partial agg. Score frames are localCheckpoint-ed per iteration so
    lineage stays bounded (the pagerank/connected_components discipline).
    """
    e = edges.select(
        F.col(src_col).cast(key_type).alias("src"),
        F.col(dst_col).cast(key_type).alias("dst"),
    )
    if checkpoint:
        # bounded graphs replay driver-side — same rationale and bound as
        # pagerank above (pure int64 half-steps, max-bounded rescale)
        e = e.localCheckpoint(eager=True)
        if e.count() <= DRIVER_PR_MAX_EDGES:
            from crawld_spark.operators.seen import release_df

            out = _hits_driver(e, n_iter)
            release_df(e)
            return out
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    hub = nodes.select("node", F.lit(SCALE).cast("long").alias("hub_q"))
    auth = nodes.select("node", F.lit(0).cast("long").alias("auth_q"))

    def _half(score: DataFrame, score_col: str, join_end: str,
              group_end: str, out_col: str) -> DataFrame:
        # score flows across edges from `join_end` to `group_end`,
        # then rescales into [0, SCALE] by max-bounded floor division.
        raw = (
            score.join(e, score.node == e[join_end])
            .groupBy(group_end)
            .agg(F.sum(score_col).alias("raw"))
        )
        rmax = raw.agg(F.coalesce(F.max("raw"), F.lit(0)).alias("rmax"))
        return (
            nodes.join(raw, nodes.node == raw[group_end], "left")
            .crossJoin(F.broadcast(rmax))
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0L) div (rmax div {SCALE} + 1L)"
                ).cast("long").alias(out_col),
            )
        )

    for _ in range(max(1, n_iter)):
        auth = _half(hub, "hub_q", "src", "dst", "auth_q")
        if checkpoint:
            auth = auth.localCheckpoint(eager=True)
        hub = _half(auth, "auth_q", "dst", "src", "hub_q")
        if checkpoint:
            hub = hub.localCheckpoint(eager=True)
    return hub.join(auth, "node").select("node", "hub_q", "auth_q")
