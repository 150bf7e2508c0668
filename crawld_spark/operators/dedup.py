"""Document deduplication family — the training-data-pipeline operators a
100 TB web corpus needs on top of the crawl loop (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup).

The crawl engine's URL-seen set (operators/seen.py) dedups *identity*; these
dedup *content* — the web-scale reality that the same text lives at many
URLs. All of them are pure DataFrame plans over built-in functions
(JVM-side, whole-stage codegen); the only hash used is MD5 because the
DuckDB oracle must reproduce values bit-for-bit (functions/hashing.py).

Scale notes (10^10 docs):
- exact: single shuffle on a 128-bit digest — never on raw text (group key
  stays 32 bytes/row regardless of document size).
- MinHash+LSH: per-doc signature is a narrow fixed-width row; the only
  shuffle is on band keys, whose cardinality ~ n_docs; skewed bands (empty
  documents, boilerplate) are exactly the AQE-skew-join case.
- SimHash: one pass, no shuffle at all until the band grouping.
- n-gram Jaccard: only runs on *candidate pairs* (from LSH buckets) — the
  quadratic step is bounded by bucket sizes, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (portable: identical in
    DuckDB as regexp_split_to_array(trim(x), '\\s+'))."""
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, k: int) -> Column:
    """k-word shingles, distinct, as strings joined by single spaces.

    NOTE (r6): expressions inside higher-order-function lambdas are
    re-evaluated per element — referencing ``norm_tokens(text)`` here makes
    every shingle recompute the regex split (O(words²) per document). When
    the caller can stage a token-array column first, use
    :func:`shingles_of_tokens` over that column instead (an attribute
    reference is free per element). This form is kept for one-shot
    projections where staging is not worth a plan step.
    """
    return shingles_of_tokens(norm_tokens(text), k)


def shingles_of_tokens(toks: Column, k: int) -> Column:
    """k-word shingles over an existing token-array column (see
    :func:`shingles` — pass an *attribute*, not a recomputed expression)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def _seeded_md5(i: int):
    # factory (not a default-arg lambda: PySpark reads lambda arity from the
    # Python signature, so `lambda s, i=i` would register as a 2-arg lambda)
    return lambda s: F.md5(F.concat(F.lit(f"seed{i}:"), s))


def minhash_sig(sh: Column, n_hashes: int) -> list[Column]:
    """MinHash over md5 hex strings: min lexicographic md5(seed || shingle)
    per seed is a valid permutation-min — and portable to any SQL engine."""
    return [
        F.array_min(F.transform(sh, _seeded_md5(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via digest-groupBy: one shuffle on md5(text), keeps the
    lowest id (deterministic survivor)."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col)))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_lsh_buckets(
    docs: DataFrame,
    n_hashes: int = 4,
    band_size: int = 2,
    shingle_k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signatures → LSH bands → bucket rows. Docs sharing a band
    bucket are near-dup candidates. Output: (band_id, band_key, doc_id).

    Plan shape (re-measured r6, sf1.0, warm, local[32]): STAGED projections
    — tokens, then shingles, then the n_hashes seeded mins, then one explode
    of band structs. The r2-era union-of-projections inlined
    ``shingles(text)`` into every seeded min, and expressions inside
    higher-order-function lambdas are re-evaluated per element, so every
    shingle re-ran the regex tokenization: 52 s for the sf1.0 bucket pass.
    Staging each step as its own projection evaluates tokenization and
    shingling exactly once per document (CollapseProject keeps non-cheap
    expressions referenced more than once in separate projects), and the
    single explode replaces n_bands input re-scans: 2.7 s for the identical
    bucket rows (bit-for-bit, exceptAll-verified both directions).
    """
    t1 = docs.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("_toks"))
    t2 = t1.select(
        F.col(id_col), shingles_of_tokens(F.col("_toks"), shingle_k).alias("_sh")
    )
    sig = t2.select(F.col(id_col), *minhash_sig(F.col("_sh"), n_hashes))
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh{b * band_size + j}") for j in range(band_size)],
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("_bk")).select(
        F.col("_bk.band_id").alias("band_id"),
        F.col("_bk.band_key").alias("band_key"),
        F.col(id_col),
    )


def minhash_candidate_groups(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Buckets with >1 doc → candidate near-dup groups."""
    return (
        buckets.groupBy("band_id", "band_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


def neardup_mark(
    docs: DataFrame,
    n_hashes: int = 4,
    band_size: int = 2,
    shingle_k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    prior_buckets: DataFrame | None = None,
) -> DataFrame:
    """Keep-first near-dup marking: ``(id_col, is_dup)`` with ``is_dup``
    true iff some LSH band of the document is shared with a LOWER-id
    document (the deterministic survivor rule of exact_dedup, applied to
    MinHash bands) — or, when ``prior_buckets`` (band_id, band_key rows
    from earlier data) is given, with ANY prior bucket.

    This per-band min rule is the streaming-compatible near-dup contract:
    a document's verdict depends only on documents with smaller ids, so
    processing any id-ordered partition of the corpus incrementally
    (streaming/neardup_stream.py) yields bit-identical verdicts to this
    one-shot batch form — the property the parity tests pin. (The
    transitive-closure variant — dup against the whole connected GROUP —
    is dedup_clusters; this one is its prefix-stable companion.)

    Scale: one (band_id, band_key) partial-agg shuffle for the band mins +
    one equi-join back; only band digests and ids travel. ``prior_buckets``
    joins on the same key — at 100 TB that table is the persisted LSH
    index, bucket-partitioned, so the probe is partition-prunable.
    """
    from crawld_spark.operators.ckpt import ckpt_lazy

    bands = minhash_lsh_buckets(
        docs, n_hashes, band_size, shingle_k, id_col, text_col
    )
    # the band rows feed TWO consumers (the min aggregate and the join-back)
    # and the signature subplan is expensive (n_bands text scans × seeded
    # md5 mins) — a lazy localCheckpoint materializes the (band, id) rows
    # once, digests + ids only, halving the lane wall (13.6 → ~8 s at sf0.1)
    bands = ckpt_lazy(bands)
    mins = bands.groupBy("band_id", "band_key").agg(
        F.min(id_col).alias("_min_id")
    )
    j = bands.join(mins, ["band_id", "band_key"])
    dup = F.col("_min_id") < F.col(id_col)
    if prior_buckets is not None:
        pri = (
            prior_buckets.select("band_id", "band_key")
            .distinct()
            .withColumn("_prior", F.lit(True))
        )
        j = j.join(pri, ["band_id", "band_key"], "left")
        dup = dup | F.coalesce(F.col("_prior"), F.lit(False))
    return j.groupBy(id_col).agg(F.max(dup).alias("is_dup"))


# Connected components over at most this many (distinct, undirected) edges
# collect to the driver and run union-find there (~32 MB of pairs): the LSH
# star edges of a mid-size corpus form chained components whose min-label
# propagation needs O(diameter) Spark rounds (measured 12 rounds × ~0.6 s
# at sf1.0 for 83k edges — all fixed cost, no data). Beyond the bound the
# distributed loop below is the scale path.
DRIVER_CC_MAX_EDGES = 2_000_000


def connected_components(
    edges: DataFrame,  # columns: src, dst (long node ids; undirected pairs)
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation over undirected edges → (node, component)
    where component = the smallest node id reachable. Small edge sets
    (≤ DRIVER_CC_MAX_EDGES after distinct) solve driver-side with
    union-find — one collect, no iterative jobs; larger ones run the
    iterative DataFrame loop: one shuffle per round, label frame
    localCheckpoint-ed per round (the classic Spark-iteration discipline),
    O(component diameter) rounds.
    """
    from crawld_spark.operators.seen import release_df

    ed = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if ed.count() <= DRIVER_CC_MAX_EDGES:
        pairs = ed.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in pairs:
            a, b = int(row[0]), int(row[1])
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id: the root IS the component label
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out_rows = [(n, find(n)) for n in parent]
        release_df(ed)
        spark = edges.sparkSession
        from crawld_spark.session import local_df

        return local_df(
            spark, out_rows, "node long, component long", ["node", "component"]
        )
    sym = (
        ed.unionByName(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    release_df(ed)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), F.col("label"))
            .unionByName(labels.select("node", "label"))
        )
        new_labels = (
            prop.groupBy("node").agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        release_df(labels)
        labels = new_labels
        if changed == 0:
            break
    out = labels.select("node", F.col("label").alias("component"))
    release_df(sym)
    return out


def dedup_clusters(
    docs: DataFrame,
    n_hashes: int = 4,
    band_size: int = 2,
    shingle_k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full near-dup clustering: LSH buckets → star edges (bucket-min →
    member) → connected components. Docs in no multi-doc bucket are
    singleton clusters of themselves. Output: (doc_id, cluster_id) with
    cluster_id = the smallest doc_id in the near-dup cluster — the
    canonical keeper a training pipeline retains."""
    buckets = minhash_lsh_buckets(docs, n_hashes, band_size, shingle_k, id_col, text_col)
    # two consumers (roots agg + member join): materialize the (band, id)
    # rows once — digests + ids only — instead of re-running the signature
    # pass per consumer (the neardup_mark discipline; r6)
    from crawld_spark.operators.ckpt import ckpt_lazy

    buckets = ckpt_lazy(buckets)
    if buckets.count() <= DRIVER_CC_MAX_EDGES:
        # bounded bucket set (bucket rows bound the star-edge count):
        # group → per-bucket min → union-find entirely driver-side, off
        # the already-materialized checkpoint blocks — skips the roots
        # aggregation, the member join, the distinct, and the CC job
        # chain (r6). Identical components: union(min, member) over every
        # bucket IS the star-edge connected-components.
        from crawld_spark.session import local_df

        groups: dict[tuple, list[int]] = {}
        for r in buckets.collect():
            groups.setdefault((r[0], r[1]), []).append(int(r[2]))
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for members in groups.values():
            if len(members) < 2:
                continue
            m0 = min(members)
            if m0 not in parent:
                parent[m0] = m0
            for d in members:
                if d == m0:
                    continue
                if d not in parent:
                    parent[d] = d
                ra, rb = find(m0), find(d)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        comp = local_df(
            docs.sparkSession,
            [(n, find(n)) for n in parent],
            "node long, component long",
            ["node", "component"],
        )
    else:
        roots = buckets.groupBy("band_id", "band_key").agg(
            F.min(id_col).alias("_root")
        )
        edges = (
            buckets.join(roots, on=["band_id", "band_key"])
            .where(F.col(id_col) != F.col("_root"))
            .select(F.col("_root").alias("src"), F.col(id_col).alias("dst"))
            .distinct()
        )
        comp = connected_components(edges)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp["node"], how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens, portable construction:
    bit b of md5(token) = high bit of hex digit b+1 (digit ∈ 8..f).
    weight_b = Σ_tokens (bit ? +1 : -1); simhash bit b set iff weight_b > 0.

    Demo-width — kept for the oracle history; production is
    :func:`simhash64_hex` (64 bits + Hamming-ball banding).
    """
    toks = norm_tokens(text)
    hexes = F.transform(toks, lambda t: F.md5(t))

    def _bit_merge(b: int):
        return lambda acc, h: acc + F.when(
            F.substring(h, b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
        ).otherwise(-1)

    bits = []
    for b in range(16):
        w = F.aggregate(hexes, F.lit(0), _bit_merge(b))
        bits.append(F.when(w > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


# hex digits whose value has bit k set — the portable per-bit test shared
# with the DuckDB oracle (an IN-list needs no base conversion on either side)
_HEX_BIT = {
    0: list("13579bdf"),
    1: list("2367abef"),
    2: list("4567cdef"),
    3: list("89abcdef"),
}


def simhash64_hex(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens, emitted as a 16-hex-char
    string (hex keeps bit 63 sign-free and bit-identical across engines).

    Construction (single source of truth for the DuckDB oracle twin,
    queries.py ``_SIMHASH64_SQL``): token hash = md5(token); SimHash bit
    ``b`` (0..63) reads hex digit ``d = b // 4`` (1-based position d+1) of
    the md5, bit-in-digit ``k = b % 4`` — i.e. the first 16 md5 hex digits
    supply 4 bits each. weight_b = Σ_tokens (bit ? +1 : -1); output digit
    ``d`` = the 4-bit value {k: weight_{4d+k} > 0}.

    One ``aggregate`` pass with a 64-int array accumulator (zip_with merge)
    — JVM-side, whole-stage-codegen'd, no per-bit re-scan of the token
    array (the 16-bit demo ran 16 aggregate passes; 64 would not fly).
    """
    toks = norm_tokens(text)
    hexes = F.transform(toks, lambda t: F.md5(t))

    def tok_bits(h: Column) -> Column:
        # ±1 per bit, laid out [b=0..63]
        per_bit = []
        for b in range(64):
            d, k = b // 4, b % 4
            per_bit.append(
                F.when(F.substring(h, d + 1, 1).isin(*_HEX_BIT[k]), F.lit(1))
                .otherwise(F.lit(-1))
            )
        return F.array(*per_bit)

    def finish(acc):
        # acc is a lambda VARIABLE here — the 64 element_at references below
        # are cheap variable reads. Referencing the aggregate expression
        # itself 64× instead copies the whole subtree per reference (a
        # 340 KB plan, measured 4× slower end-to-end).
        digits = []
        for d in range(16):
            val = sum(
                (
                    F.when(
                        F.element_at(acc, 4 * d + k + 1) > 0, F.lit(1 << k)
                    ).otherwise(F.lit(0))
                )
                for k in range(4)
            )
            digits.append(F.lower(F.conv(val.cast("string"), 10, 16)))
        return F.concat(*digits)

    zeros = F.array(*[F.lit(0) for _ in range(64)])
    return F.aggregate(
        hexes,
        zeros,
        lambda acc, h: F.zip_with(acc, tok_bits(h), lambda a, b: a + b),
        finish,
    )


def simhash_bands(sim_hex: Column, n_bands: int = 4) -> list[Column]:
    """Split a 16-hex-char SimHash into ``n_bands`` equal bit bands (as hex
    substrings). Pigeonhole: two hashes within Hamming distance
    ``n_bands - 1`` agree on ≥1 band — so banding on these keys finds every
    pair within distance 3 at the default 4×16-bit layout, without any
    all-pairs comparison (the Hamming-ball analog of MinHash banding)."""
    assert 16 % n_bands == 0
    w = 16 // n_bands
    return [F.substring(sim_hex, b * w + 1, w) for b in range(n_bands)]


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-hex-char SimHashes — digit-wise
    popcount of the XOR (JVM-only: conv + bit_count)."""
    total = F.lit(0)
    for d in range(16):
        va = F.conv(F.substring(a, d + 1, 1), 16, 10).cast("long")
        vb = F.conv(F.substring(b, d + 1, 1), 16, 10).cast("long")
        total = total + F.bit_count(va.bitwiseXOR(vb))
    return total.cast("int")


def simhash64_agg(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash via explode + codegen groupBy → ``(id_col, _sim)``,
    bit-identical to :func:`simhash64_hex` (exceptAll-verified, and pinned
    by the band/signature parity test).

    Why a second construction (r6): the per-row ``aggregate`` form runs its
    64-wide lambda per TOKEN in interpreted mode — higher-order functions
    are CodegenFallback, so 64 substring+IN tests and a 64-int zip_with
    allocate per token (~33 s for the sf1.0 banding lane). Here the token
    stream is exploded to rows, the md5 and the 16 hex-digit extractions
    are plain codegen'd projections (CSE evaluates the md5 once per token),
    and the per-bit tallies are 64 map-side-combinable SUMs: the shuffle
    carries 65 longs per document, text never moves, and nothing falls out
    of whole-stage codegen. Bit b of digit d is ``(digit >> k) & 1`` —
    exactly the _HEX_BIT IN-list test; simhash bit b = (2·count_b >
    n_tokens) ⟺ Σ(±1) > 0. Empty documents tokenize to [''] so they emit
    one md5('') row and survive the groupBy, matching the per-row form.
    """
    ex = docs.select(
        F.col(id_col), F.explode(norm_tokens(F.col(text_col))).alias("_w")
    )
    dig = ex.select(
        F.col(id_col),
        *[
            F.conv(F.substring(F.md5(F.col("_w")), d + 1, 1), 16, 10)
            .cast("int")
            .alias(f"_d{d}")
            for d in range(16)
        ],
    )
    aggs = []
    for b in range(64):
        d, k = b // 4, b % 4
        aggs.append(
            F.sum(F.shiftright(F.col(f"_d{d}"), k).bitwiseAND(F.lit(1))).alias(f"_c{b}")
        )
    g = dig.groupBy(id_col).agg(F.count("*").alias("_n"), *aggs)
    digits = []
    for d in range(16):
        val = sum(
            (
                F.when(
                    F.col(f"_c{4 * d + k}") * 2 > F.col("_n"), F.lit(1 << k)
                ).otherwise(F.lit(0))
            )
            for k in range(4)
        )
        digits.append(F.lower(F.conv(val.cast("string"), 10, 16)))
    return g.select(F.col(id_col), F.concat(*digits).alias("_sim"))


def simhash_band_buckets(
    docs: DataFrame,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash64 → Hamming-ball LSH bucket rows (band_id, band_key, doc_id):
    docs sharing a band bucket are near-dup candidates, and every pair
    within Hamming distance ``n_bands - 1`` is guaranteed to share one.

    Signature via :func:`simhash64_agg` (r6): the groupBy output is a plan
    barrier by construction — the 64-bit signature is computed exactly once
    per document, fully inside whole-stage codegen (the r2-era per-row
    aggregate ran interpreted; see simhash64_agg docstring for numbers) —
    and the band explode runs over the tiny (id, 16-hex) frame."""
    sig = simhash64_agg(docs, id_col=id_col, text_col=text_col)
    w = 16 // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.substring(F.col("_sim"), b * w + 1, w).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col,
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,  # columns: d1, d2 (candidate pairs, e.g. from LSH)
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token/n-gram Jaccard similarity for given candidate pairs.
    Set ops on distinct shingle arrays — built-ins only."""
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), n).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("d1"), F.col("sh").alias("sh1"))
    b = sh.select(F.col(id_col).alias("d2"), F.col("sh").alias("sh2"))
    j = (
        pairs.join(a, "d1").join(b, "d2")
        .withColumn("inter", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn("uni", F.size(F.array_union("sh1", "sh2")))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(F.lit(0.0)),
        )
    )
    return j.select("d1", "d2", "inter", "uni", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------
# paragraph-level dedup (Dolma-style): exact chunk dedup ACROSS documents
# ---------------------------------------------------------------------

def paragraph_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into fixed-width word chunks (the paragraph
    stand-in for a corpus with no newline structure): one row per
    ``(id, pos, chunk)``. All built-ins — split/slice/transform/posexplode
    stay in whole-stage codegen; chunking is embarrassingly parallel (no
    shuffle).

    Real web pipelines split on '\\n\\n' (Dolma's paragraph dedup); the
    fixed-width variant keeps the exact same downstream plan while staying
    deterministic on the synthetic word-stream corpus.
    """
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    n_chunks = F.ceil(F.size(ws) / F.lit(float(chunk_words))).cast("int")
    # empty/whitespace-only docs emit ZERO chunk rows (posexplode of an
    # empty array), matching the oracle's generate_series(0, ceil(len/8)-1)
    # semantics — ADVICE r4: the unguarded form emitted one '' chunk.
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx, lambda i: F.array_join(F.slice(ws, i * chunk_words + 1, chunk_words), " ")
    )
    carry = carry_cols or []
    return docs.select(
        F.col(id_col), *[F.col(c) for c in carry],
        F.posexplode(chunks).alias("pos", "chunk"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
) -> DataFrame:
    """Corpus-wide exact paragraph dedup, keep-first: a chunk survives only
    in the document where it first appears (lowest ``(doc_id, pos)``), all
    later occurrences are dropped; each document is reassembled from its
    surviving chunks in order. Returns
    ``(id_col, n_chunks, n_kept, clean_md5)`` where ``clean_md5`` is the
    md5 of the reassembled text (md5('') when no chunk survives).

    Scale shape (10^10 docs): the keep-first rule is a
    ``groupBy(md5(chunk)).agg(min(struct(id, pos)))`` + equi-join back —
    NOT a window. Site boilerplate makes chunk-frequency follow a power
    law (one nav-bar chunk can appear in billions of docs); a window
    partitioned by chunk hash puts all of them in ONE task (unsplittable →
    straggler/OOM), while the aggregate collapses duplicates map-side
    (partial min per input partition) and the join is AQE-skew-splittable.
    Shuffle keys are 32-byte digests; chunk text rides only the join probe
    side. Reassembly groups by doc id — bounded by document size.
    """
    # two consumers (keep-first agg + join-back): materialize the chunk
    # rows once — digests + positions + chunk text (r6)
    from crawld_spark.operators.ckpt import ckpt_lazy

    ch = ckpt_lazy(
        paragraph_chunks(docs, id_col, text_col, chunk_words).withColumn(
            "h", F.md5("chunk")
        )
    )
    first = ch.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("f")
    )
    marked = ch.join(first, "h").withColumn(
        "kept", (F.col(id_col) == F.col("f.i")) & (F.col("pos") == F.col("f.p"))
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct(F.col("pos").alias("p"), F.col("chunk").alias("c")),
                            )
                        )
                    ),
                    lambda s: s.getField("c"),
                ),
                " ",
            )
        ).alias("clean_md5"),
    )


def boilerplate_strip(
    docs: DataFrame,  # id_col + host_col + text_col
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "host",
    chunk_words: int = 8,
    min_docs: int = 3,
    frac_num: int = 1,
    frac_den: int = 2,
) -> DataFrame:
    """Per-host boilerplate removal (the RefinedWeb/CCNet line-dedup
    discipline, host-conditioned): a chunk is *boilerplate* when it appears
    in at least ``frac_num/frac_den`` of its host's documents (hosts with
    fewer than ``min_docs`` documents are exempt — nothing is frequent on a
    host of one), and every occurrence of a boilerplate chunk is stripped
    from every document of that host. The navigation bar every page of a
    site carries is removed site-wide; the same sentence on an unrelated
    host is untouched — the key difference from corpus-global
    paragraph_dedup, which keeps exactly one copy somewhere.

    Returns ``(id_col, n_chunks, n_boiler, clean_md5)``; ``clean_md5`` is
    the md5 of the document reassembled from surviving chunks in order
    (md5('') if everything was boilerplate).

    Cross-engine determinism: the frequency gate is pure-integer —
    ``n_docs_with_chunk * frac_den >= frac_num * host_docs`` — no float
    ratio to disagree on. Scale shape: one (host, chunk-digest) partial
    count-distinct shuffle + a host-cardinality doc count; the marking
    join keys on (host, digest); hot chunks collapse map-side, there is no
    window by chunk hash (same skew argument as paragraph_dedup);
    reassembly groups by doc id (document-size-bounded).
    """
    # two consumers (host-frequency agg + marking join): materialize once (r6)
    from crawld_spark.operators.ckpt import ckpt_lazy

    ch = ckpt_lazy(
        paragraph_chunks(
            docs, id_col, text_col, chunk_words, carry_cols=[host_col]
        ).withColumn("h", F.md5("chunk"))
    )
    nd = ch.groupBy(host_col, "h").agg(
        F.count_distinct(F.col(id_col)).alias("_nd")
    )
    hd = docs.groupBy(host_col).agg(
        F.count_distinct(F.col(id_col)).alias("_hn")
    )
    boiler = (
        nd.join(hd, host_col)
        .where(
            (F.col("_hn") >= F.lit(int(min_docs)))
            & (F.col("_nd") * F.lit(int(frac_den)) >= F.lit(int(frac_num)) * F.col("_hn"))
        )
        .select(host_col, "h", F.lit(True).alias("_boiler"))
    )
    marked = ch.join(boiler, [host_col, "h"], "left").withColumn(
        "kept", F.col("_boiler").isNull()
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.count(F.when(~F.col("kept"), 1)).alias("n_boiler"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct(
                                    F.col("pos").alias("p"),
                                    F.col("chunk").alias("c"),
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("c"),
                ),
                " ",
            )
        ).alias("clean_md5"),
    )


# ---------------------------------------------------------------------
# ExactSubstr-style duplicated-span detection (Lee et al. 2022, relational)
# ---------------------------------------------------------------------

def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """ExactSubstr-style duplicated-span detection ("Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2022), relational form:
    a k-gram (k consecutive words, stride 1) whose exact text occurs at
    more than one position CORPUS-WIDE marks all its occurrences, and a
    word is *covered* when it lies inside any marked k-gram. Returns
    ``(id_col, n_words, n_kgrams, n_dup_kgrams, n_covered_words,
    covered_frac)`` — the span-cut decision per document.

    The paper builds one suffix array over the concatenated corpus; the
    distributed-relational equivalent trades that for hash aggregation:
    sliding k-gram hashes (one row per token, ~corpus token count — the
    same O(N) the suffix array indexes) → ``groupBy(hash) HAVING count>1``
    (map-side partial collapses the power-law hot k-grams exactly like
    paragraph_dedup's boilerplate argument) → semi-join back → per-doc
    interval union via exploded word indices and ``count_distinct``.
    Shuffle keys are 32-hex digests and (id, int) pairs; document text
    never shuffles. No window, no driver state.
    """
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    n = F.size(ws)
    # guard: F.sequence(0, n-k) DESCENDS when n < k (Spark default step -1)
    kg = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.array_join(F.slice(ws, i + 1, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col), n.cast("long").alias("n_words"), kg.alias("_kg")
    )
    occ = base.select(id_col, F.posexplode("_kg").alias("pos", "h"))
    dup = occ.groupBy("h").count().where(F.col("count") > 1).select("h")
    marked = occ.join(dup, "h", "left_semi")
    per_doc = (
        marked.select(
            id_col,
            F.col("pos"),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("wi"),
        )
        .groupBy(id_col)
        .agg(
            F.count_distinct("pos").alias("n_dup_kgrams"),
            F.count_distinct("wi").alias("n_covered_words"),
        )
    )
    return (
        base.select(id_col, "n_words", F.size("_kg").cast("long").alias("n_kgrams"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_kgrams",
            F.coalesce("n_dup_kgrams", F.lit(0)).cast("long").alias("n_dup_kgrams"),
            F.coalesce("n_covered_words", F.lit(0)).cast("long").alias("n_covered_words"),
            F.round(
                F.coalesce("n_covered_words", F.lit(0)) / F.greatest("n_words", F.lit(1)),
                6,
            ).alias("covered_frac"),
        )
    )
