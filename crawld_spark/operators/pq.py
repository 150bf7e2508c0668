"""Product quantization (PQ): compressed embedding codes + ADC top-k search.

The missing tier of the ANN family (brute / IVF / k-means IVF / SRP already
exist in operators/similarity.py). At 10^10 vectors the embedding column
itself is the storage and scan bottleneck — 64 float32 dims = 256 bytes/row,
~2.5 PB at corpus scale. PQ stores ``m`` small codes per vector instead
(here 8 codes of 4 bits each): the corpus-side scan reads an
``array<int>`` of m entries, a 16-64× reduction, and search scores against
the codes without ever touching the original vectors (FAISS's IVFADC design,
Jégou et al., "Product Quantization for Nearest Neighbor Search", 2011).

Three operators:

- :func:`pq_train` — per-subspace deterministic Lloyd k-means (ksub
  codewords over each of the m dim/m-wide subvector spaces). Same
  determinism contract as similarity.kmeans_assign: md5-ranked seeds, exact
  int64 arithmetic, floor-mean centroid updates, empty cells keep their
  codeword. Returns plain Python ints (m × ksub × dsub), driver-bounded.
- :func:`pq_encode` — vector → m nearest-codeword codes. Pure projection:
  the argmin over ksub codewords is a literal struct-array ``array_min``
  (similarity.nearest_cell_label's idiom), so encoding is exchange-free and
  whole-stage-codegen'd; nothing shuffles.
- :func:`pq_topk_adc` — asymmetric-distance top-k. Each query precomputes
  its LUT **once on the broadcast side**: ``lut[s*ksub + c] = dot(q_s,
  codeword_{s,c})`` (m·ksub int64 entries per query). The corpus side then
  scores a row with m array lookups + adds — never a dot product, and never
  the raw vector: the scan's ReadSchema is ``(nid, codes)`` only. Scores
  are approximate cosine ``adc / (|q|·|recon|)`` with the reconstruction
  norm also a LUT lookup (exact ints → one IEEE double division, the
  cross-engine determinism contract of operators/similarity.py).

Scale shape: train = n_iter × (one exploded (s, code, pos) partial-agg
shuffle, m·dim-bounded collect); encode = zero exchanges; search = one
broadcast nested-loop over the code column + a per-query-bounded windowed
top-k — the same shape as brute_force_topk but moving m ints per row
instead of dim floats. Compose behind similarity.kmeans_assign's coarse
cells for IVF-PQ (probe cells first, ADC inside probed cells only).

Reference parity note: the reference engine has no vector search; this is
part of the training-data-pipeline family the graft adds (SURVEY.md §2's
complement), sized for the 100 TB corpus target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawld_spark.operators.similarity import dot_i, norm2_i, quantize

Book = list[list[int]]  # book[code] = dsub ints (one subspace's codewords)


def _sub(qv: Column, s: int, dsub: int) -> Column:
    """Subvector s of a quantized vector (1-based slice, length dsub)."""
    return F.slice(qv, s * dsub + 1, dsub)


def _lit_vec(v: list[int]) -> Column:
    return F.array(*[F.lit(int(x)) for x in v])


def _code_expr(sv: Column, book: Book) -> Column:
    """Nearest codeword for one subvector by exact L2 argmin as ONE
    expression: d(x,c) = |x|^2 - 2 x·c + |c|^2, and |x|^2 is constant
    across the argmin, so ``argmin(|c|^2 - 2 x·c)`` — pure int64. Ties
    break toward the LOWEST code via struct ordering."""
    cands = []
    for code, cv in enumerate(book):
        d = F.lit(int(sum(x * x for x in cv))) - 2 * dot_i(sv, _lit_vec(cv))
        cands.append(F.struct(d.alias("d"), F.lit(code).alias("c")))
    return F.array_min(F.array(*cands)).getField("c")


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> list[Book]:
    """Train per-subspace codebooks; returns ``books[s][code] = dsub ints``.

    All m subspaces train in the SAME jobs: each iteration assigns codes
    for every subspace in one projection, explodes to ``(s, code,
    subvector)`` rows, and runs one ``(s, code, pos)`` partial-aggregated
    shuffle for the floor-mean update — iteration cost is independent of m
    beyond row width. Codebooks travel driver→plan as literals (m·ksub·dsub
    ints, a bounded collect like similarity.kmeans_assign's centroids), so
    the loop adds no lineage growth.

    ``train_sample`` (VERDICT r4 item 4): run the update iterations over
    the first ``train_sample`` rows in ``(md5(id), id)`` order — a
    deterministic hash-ordered PREFIX of the seed ordering, so seeding is
    unchanged; the full corpus is only touched by pq_encode afterwards.
    None = train on everything.
    """
    if train_sample is not None and train_sample < ksub:
        raise ValueError(f"train_sample={train_sample} < ksub={ksub}")
    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    qc = corpus.select(
        F.col(id_col).alias("_id"), quantize(vec_col).alias("qv")
    ).cache()
    ordered = qc.select(
        "qv", F.md5(F.col("_id").cast("string")).alias("_h"), "_id"
    ).orderBy(F.asc("_h"), F.asc("_id"))

    if train_sample is not None:
        # ONE collect serves seeding and training (the seeds are the first
        # ksub rows of the same (md5(id), id) ordering the sample uses),
        # and the per-subspace Lloyd updates run driver-side in numpy (r6)
        # with the identical pure-int arithmetic (argmin of |c|²-2x·c,
        # first-min index = lowest code, floor-mean updates in Python
        # ints) — bit-identical codebooks (oracle-pinned) without n_iter
        # rounds of Spark jobs + codegen compiles for a few-hundred-row
        # training frame. Only pq_encode touches the full corpus.
        rows = ordered.limit(train_sample).collect()
        if len(rows) < ksub:
            raise ValueError(f"corpus smaller than ksub={ksub}")
        books = [
            [[int(x) for x in rows[c]["qv"][s * dsub : (s + 1) * dsub]]
             for c in range(ksub)]
            for s in range(m)
        ]
        books = _pq_lloyd_driver(
            [[int(x) for x in r["qv"]] for r in rows],
            books, m, dsub, max(1, n_iter) - 1,
        )
        qc.unpersist()
        return books

    seeds = ordered.limit(ksub).collect()
    if len(seeds) < ksub:
        raise ValueError(f"corpus smaller than ksub={ksub}")
    books: list[Book] = [
        [[int(x) for x in r["qv"][s * dsub : (s + 1) * dsub]] for r in seeds]
        for s in range(m)
    ]

    train = qc
    # n_iter ASSIGNMENT passes with n_iter-1 codeword updates between them
    # (kmeans_assign's contract): the returned books are exactly the ones
    # the final assignment uses, so pq_encode reproduces that assignment —
    # and the DuckDB twin (queries._pq_ctes) scores a{n_iter} against
    # book{n_iter-1} verbatim.
    for _ in range(max(1, n_iter) - 1):
        # stage the m subvector slices once per row (r6): _code_expr
        # references its subvector ksub times, and a slice re-evaluates per
        # reference when inlined — over an attribute it is one array read
        staged = train.select(
            *[_sub(F.col("qv"), s, dsub).alias(f"_sv{s}") for s in range(m)]
        )
        assigned = staged.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            _code_expr(F.col(f"_sv{s}"), books[s]).alias("code"),
                            F.col(f"_sv{s}").alias("sv"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("a")
        ).select("a.s", "a.code", "a.sv")
        stats = (
            assigned.select("s", "code", F.posexplode("sv").alias("pos", "v"))
            .groupBy("s", "code", "pos")
            .agg(F.sum("v").alias("sm"), F.count("*").alias("n"))
            .groupBy("s", "code")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "sm"))).alias("ps"),
                F.first("n").alias("n"),
            )
            .collect()
        )
        # floor-mean (Python // floors toward -inf; the oracle mirrors it
        # with (s - ((s%n+n)%n)) // n); empty cells keep their codeword
        new: dict[tuple[int, int], list[int]] = {
            (int(r["s"]), int(r["code"])): [
                int(p["sm"]) // int(r["n"]) for p in r["ps"]
            ]
            for r in stats
        }
        books = [
            [new.get((s, c), cv) for c, cv in enumerate(books[s])]
            for s in range(m)
        ]
    qc.unpersist()
    return books


def _pq_lloyd_driver(
    train: list[list[int]], books: list[Book], m: int, dsub: int, n_updates: int
) -> list[Book]:
    """Driver-side per-subspace Lloyd updates over a collected (bounded)
    training set — pure-int arithmetic identical to the Spark form:
    assignment by argmin of |c|² − 2·x·c with ties to the LOWEST code
    (numpy's first-min index over code-ordered books), floor-mean updates
    in Python ints, empty cells keep their codeword."""
    import numpy as np

    X = np.array(train, dtype=np.int64)
    for _ in range(n_updates):
        nb: list[Book] = []
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            C = np.array(books[s], dtype=np.int64)
            cn = (C * C).sum(axis=1)
            d = cn[None, :] - 2 * (Xs @ C.T)
            code = np.argmin(d, axis=1)  # first min = lowest code
            book: Book = []
            for c in range(len(books[s])):
                members = Xs[code == c]
                if len(members):
                    sm = members.sum(axis=0, dtype=np.int64)
                    book.append([int(v) // len(members) for v in sm.tolist()])
                else:
                    book.append(books[s][c])
            nb.append(book)
        books = nb
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[Book],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) → (id, codes array<int> of length m). Exchange-free
    STAGED projections (r6): quantize once, slice the m subvectors once,
    then run each subspace's argmin over its subvector ATTRIBUTE —
    higher-order functions evaluate interpreted and re-evaluate referenced
    expressions per element, so the old single-projection form re-ran the
    64-element quantize transform inside every one of the m·ksub candidate
    dot products. Same codes bit-for-bit; at rest the codes column is what
    a 100 TB corpus persists (m small ints/row instead of the dim·4-byte
    vector)."""
    m = len(books)
    dsub = len(books[0][0])
    qc = corpus.select(F.col(id_col), quantize(vec_col).alias("_qv"))
    sv = qc.select(
        F.col(id_col),
        *[_sub(F.col("_qv"), s, dsub).alias(f"_sv{s}") for s in range(m)],
    )
    return sv.select(
        F.col(id_col),
        F.array(
            *[_code_expr(F.col(f"_sv{s}"), books[s]) for s in range(m)]
        ).alias("codes"),
    )


def _lut_frame(
    queries: DataFrame, books: list[Book], id_col: str, vec_col: str
) -> DataFrame:
    """(qid, lut, nq, qv): the per-query ADC lookup table —
    ``lut[s*ksub + c] = dot(q_s, codeword_{s,c})`` — computed ONCE per
    query row before any broadcast; plus the query norm and quantized
    vector (for downstream exact rerank)."""
    m = len(books)
    dsub = len(books[0][0])
    qv = quantize(vec_col)
    lut = F.flatten(
        F.array(
            *[
                F.array(
                    *[dot_i(_sub(qv, s, dsub), _lit_vec(cv)) for cv in books[s]]
                )
                for s in range(m)
            ]
        )
    )
    return queries.select(
        F.col(id_col).alias("qid"),
        lut.alias("lut"),
        norm2_i(qv).alias("nq"),
        qv.alias("qv"),
    )


def _adc_cos(books: list[Book]):
    """Approximate-cosine expression over columns ``lut``, ``nq``,
    ``codes``: ADC dot + reconstruction norm are both m array lookups (the
    norm table is a literal), one IEEE double division at the end."""
    m = len(books)
    ksub = len(books[0])
    norms = F.array(
        *[
            F.lit(int(sum(x * x for x in cv)))
            for s in range(m)
            for cv in books[s]
        ]
    )
    idx = [
        (F.lit(s * ksub) + F.element_at("codes", s + 1) + 1).cast("int")
        for s in range(m)
    ]
    adc = None
    nrec = None
    for s in range(m):
        term = F.element_at(F.col("lut"), idx[s])
        nterm = F.element_at(norms, idx[s])
        adc = term if adc is None else adc + term
        nrec = nterm if nrec is None else nrec + nterm
    return adc / (
        F.sqrt(F.col("nq").cast("double"))
        * F.sqrt(F.when(nrec <= 0, F.lit(1)).otherwise(nrec).cast("double"))
    )


def pq_topk_adc(
    queries: DataFrame,  # id_col + vec_col (small, broadcast by contract)
    codes: DataFrame,  # id_col + codes (pq_encode output)
    books: list[Book],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: ``(qid, rank, nid, cos)`` with cos the
    approximate cosine against the RECONSTRUCTED neighbor (exact int
    arithmetic, one double division — bit-stable across engines).

    The per-query LUT (m·ksub dot products) is computed once per QUERY row
    before the broadcast; corpus-row cost is m ``element_at`` lookups.
    """
    q = _lut_frame(queries, books, id_col, vec_col).drop("qv")
    scored = (
        codes.select(F.col(id_col).alias("nid"), "codes")
        .crossJoin(F.broadcast(q))
        .withColumn("cos", _adc_cos(books))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", F.round("cos", 6).alias("cos"))
    )


def pq_topk_rerank(
    queries: DataFrame,  # id_col + vec_col (small, broadcast by contract)
    corpus: DataFrame,  # id_col + vec_col (the raw-vector table)
    books: list[Book],
    k: int = 5,
    rfactor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-filter + exact re-rank — how PQ is actually deployed at corpus
    scale: the compressed-code scan (``pq_topk_adc``) retrieves
    ``k·rfactor`` candidates per query, then ONLY those rows' raw vectors
    are scored exactly and the true top-k kept. Quantization noise costs
    recall only when a true neighbor falls outside the top ``k·rfactor``
    ADC candidates, so recall→1 as rfactor grows while the exact-scoring
    cost stays Q·k·rfactor rows — never N.

    Plan shape: the candidate set (Q·k·rfactor rows of (qid, nid)) is
    broadcast INTO the raw-vector scan as a hash-join build side, so the
    big table never shuffles and is touched exactly once. Pass ``codes``
    when the encoded table is already persisted (the production case);
    otherwise it is derived from ``corpus`` inline.
    """
    if codes is None:
        codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    cands = pq_topk_adc(
        queries, codes, books, k=k * rfactor, id_col=id_col, vec_col=vec_col
    ).select("qid", "nid")
    q = queries.select(
        F.col(id_col).alias("qid"), quantize(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("nid"), quantize(vec_col).alias("nv"))
    exact = (
        c.join(F.broadcast(cands), "nid")
        .join(F.broadcast(q), "qid")
        .withColumn(
            "cos",
            dot_i(F.col("qv"), F.col("nv"))
            / (
                F.sqrt(norm2_i(F.col("qv")).cast("double"))
                * F.sqrt(norm2_i(F.col("nv")).cast("double"))
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", F.round("cos", 6).alias("cos"))
    )


def ivf_pq_topk(
    queries: DataFrame,  # id_col + vec_col (small, broadcast by contract)
    corpus: DataFrame,  # id_col + vec_col (the raw-vector table)
    k: int = 5,
    n_cells: int = 4,
    n_probe: int = 2,
    m: int = 8,
    ksub: int = 16,
    cell_iter: int = 3,
    pq_iter: int = 3,
    rfactor: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """The full IVFADC composition (FAISS's 10^10-vector architecture,
    Jégou et al. 2011): coarse k-means cells bound WHICH rows are scanned
    (only ``n_probe`` probed cells per query — partition-prunable when the
    code table is stored partitioned by cell), PQ codes bound the BYTES per
    scanned row (m small ints, ADC lookups instead of dot products), and
    the exact re-rank of ``k·rfactor`` candidates restores recall against
    raw vectors touched only for the candidate set. Codes are encoded from
    the raw vectors, not cell residuals — the no-residual IVFADC variant
    (one global codebook set), which keeps encoding cell-independent and
    the oracle replay linear.

    Training is the two existing deterministic paths composed unchanged:
    similarity.kmeans_assign for the cells, pq_train for the codebooks —
    so the DuckDB twin (queries._ivf_pq_sql) replays both with the shared
    CTE builders. Everything the lane emits is exact-int / single-double
    arithmetic end to end.
    """
    from crawld_spark.operators.similarity import (
        cosine_sim,
        kmeans_assign,
        quantize as _q,
    )

    # project to (id, vec) first: an input that carries its own 'label'
    # column (the embeddings testdata does) must not collide with the
    # k-means cell label
    corpus = corpus.select(F.col(id_col), F.col(vec_col))
    labeled = kmeans_assign(
        corpus, k=n_cells, n_iter=cell_iter, id_col=id_col, vec_col=vec_col,
        train_sample=train_sample,
    )
    books = pq_train(
        corpus, m, ksub, pq_iter, id_col=id_col, vec_col=vec_col,
        train_sample=train_sample,
    )
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col).join(
        labeled.select(F.col(id_col), "label"), id_col
    )

    # floor-mean cell centroids from the labeled corpus — the same exact
    # integer arithmetic as similarity.ivf_topk, so probing decisions are
    # bit-identical to the oracle's replay
    c = labeled.select(
        F.col(id_col).alias("nid"), "label", _q(vec_col).alias("nv")
    )
    cents = (
        c.select("label", F.posexplode("nv").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .withColumn("m", F.expr("(s - pmod(s, n)) div n"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ps"))
        .select("label", F.transform("ps", lambda x: x["m"]).alias("cv"))
    )
    q = _lut_frame(queries, books, id_col, vec_col)
    probe = q.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", cosine_sim(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("ccos"), F.asc("label"))
    probed = (
        probe.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= n_probe)
        .select("qid", "label", "lut", "nq")
    )

    # ADC only inside probed cells: the (qid, label, lut) frame is
    # Q·n_probe rows -> broadcast into the code table's label equi-join
    scored = (
        codes.select(F.col(id_col).alias("nid"), "label", "codes")
        .join(F.broadcast(probed), "label")
        .withColumn("cos", _adc_cos(books))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    cands = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k * rfactor)
        .select("qid", "nid")
    )
    qv = queries.select(F.col(id_col).alias("qid"), _q(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("nid"), _q(vec_col).alias("nv"))
    exact = (
        cv.join(F.broadcast(cands), "nid")
        .join(F.broadcast(qv), "qid")
        .withColumn("cos", cosine_sim(F.col("qv"), F.col("nv")))
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", F.round("cos", 6).alias("cos"))
    )
