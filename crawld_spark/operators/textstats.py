"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Every function returns a Column built from built-in pyspark.sql.functions
only (JVM-side, whole-stage codegen — no UDFs in these hot paths), with
semantics chosen to be replicable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword marker lists per language (tiny n-gram heuristic)
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}


def _occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences via the length-difference trick
    (portable to any SQL engine)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_id_guess(text: Column) -> Column:
    """Heuristic language ID: most stopword-marker hits wins; ties and
    zero-hits → 'unknown' (deterministic tie-break: fixed language order,
    a later language must beat the running best STRICTLY).

    Implemented as ONE array_max over (score, order-pref, lang) structs —
    not a fold of nested when()s: the fold copies every score subtree
    2^langs times (each when() embeds the previous best twice), which blew
    the composed curation_pipeline plan past the JVM codegen method limit
    (whole-stage codegen fell back to interpreted — measured, r4). Here
    each score is evaluated exactly once. The sentinel row (s=0, pref=+1,
    'unknown') wins any all-zero tie and loses to any positive score, which
    reproduces the fold's strict-greater-than-zero semantics exactly."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    cands = [F.struct(F.lit(0).alias("s"), F.lit(1).alias("pref"),
                      F.lit("unknown").alias("lang"))]
    for i, lang in enumerate(["en", "de", "fr", "es"]):  # fixed order
        s = sum((_occurrences(padded, m) for m in _LANG_MARKERS[lang]), F.lit(0))
        cands.append(
            F.struct(s.alias("s"), F.lit(-i).alias("pref"), F.lit(lang).alias("lang"))
        )
    return F.array_max(F.array(*cands)).getField("lang")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, single
    punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


# rank-ordered BPE merge table (the "vocab"): a small embedded merge list a
# real tokenizer would load from its vocab file. Single source of truth for
# BOTH engines — queries.py renders it into the DuckDB oracle's VALUES list.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("an", "d"), ("r", "e"), ("o", "n"), ("e", "n"), ("a", "t"),
    ("o", "r"), ("e", "s"), ("s", "t"), ("in", "g"), ("t", "o"),
    ("o", "u"), ("i", "t"), ("o", "f"), ("a", "l"), ("e", "d"),
]

_BPE_SEP = "\x1f"


def bpe_token_count_word(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of one word under rank-ordered BPE merges (shared
    semantics with the DuckDB recursive-CTE twin): segmentation starts as
    characters, separator-wrapped (``␟a␟b␟c␟``) so a merge pattern
    ``␟x␟y␟`` only ever matches WHOLE adjacent symbols — never a symbol
    suffix/prefix. Each merge (x, y), in rank order, is applied to fixpoint
    (replace-all, re-scanned: replacing consumes the shared boundary
    separator, so runs like ``a a a a`` need a second pass to pair the
    odd occurrences). Tokens = separators - 1."""
    if not word:
        return 0
    s = _BPE_SEP
    seg = s + s.join(word) + s
    for x, y in merges:
        pat, rep = s + x + s + y + s, s + x + y + s
        while pat in seg:
            seg = seg.replace(pat, rep)
    return seg.count(s) - 1


def token_count_bpe_udf(merges: list[tuple[str, str]] | None = None):
    """Vectorized (Arrow-batched) pandas UDF: text → BPE token count over
    whitespace-pretokenized words. The merge table is tiny and rides in the
    UDF closure (broadcast once per executor — the 'broadcast vocab' shape;
    a production vocab of ~50k merges would use an explicit
    sparkContext.broadcast, same plumbing). This is the honest UDF case:
    iterative merge application has no built-in-function form, so it runs
    in Python — but batch-vectorized over Arrow, never per-row-serialized.
    """
    from pyspark.sql.types import LongType

    ms = list(merges) if merges is not None else list(BPE_MERGES)

    import re

    ws = re.compile(r"\s+", re.ASCII)  # ASCII \s ≡ the oracle's RE2 \s

    @F.pandas_udf(LongType())
    def _count(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(0)
                continue
            total = 0
            for w in ws.split(t):
                if w:
                    total += bpe_token_count_word(w, ms)
            out.append(total)
        return pd.Series(out, dtype="int64")

    return _count


def generate_merge_table(n_merges: int, seed: str = "bpe-vocab") -> list[tuple[str, str]]:
    """Deterministic production-SIZE merge table (~n_merges ranks) for the
    broadcast-vocab benchmark path (VERDICT r3 item 7).

    Structure mirrors a trained vocab: the table is VALID (every merge's
    two components are single characters or symbols created by an earlier
    merge — the property that makes rank-order-to-fixpoint application
    equivalent to iterative lowest-rank merging). The head is the embedded
    English BPE_MERGES (so real text actually merges); the tail combines
    existing symbols md5-deterministically — no RNG state, same table on
    every engine and run. Linguistic fidelity of the tail is NOT the point;
    vocab SIZE is: the bench measures rank-dict lookups, closure/broadcast
    shipping and Arrow batching at a realistic 50k-rank scale."""
    import hashlib
    import string

    symbols: list[str] = list(string.ascii_lowercase) + list(string.digits)
    merges: list[tuple[str, str]] = []
    present: set[tuple[str, str]] = set()
    for x, y in BPE_MERGES:
        merges.append((x, y))
        present.add((x, y))
        symbols.append(x + y)
    i = 0
    while len(merges) < n_merges:
        d = hashlib.md5(f"{seed}:{i}".encode()).digest()
        i += 1
        a = symbols[int.from_bytes(d[:4], "big") % len(symbols)]
        b = symbols[int.from_bytes(d[4:8], "big") % len(symbols)]
        m = a + b
        if (a, b) in present or len(m) > 16:  # bound symbol growth
            continue
        merges.append((a, b))
        present.add((a, b))
        symbols.append(m)
    return merges


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 100,
    top_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn a BPE merge table FROM the corpus (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") —
    the trained counterpart of the synthetic ``generate_merge_table``.

    The split real trainers use, mapped onto Spark: the distributed part
    is ONE word-frequency aggregation (whitespace tokens → map-side
    combinable groupBy — the only pass over the corpus, however large);
    the merge loop then runs on the collected word-frequency DICTIONARY,
    whose size is vocabulary-bounded, not corpus-bounded. ``top_words``
    caps the driver dict by (count desc, word asc) — Zipf mass makes the
    tail's contribution to pair counts negligible, and the cap is the
    documented scale bound (50k words ≈ a few MB driver-side).

    Determinism: word ranking and the per-round best-pair choice both
    tie-break lexicographically (count desc, key asc) — no hash order, no
    RNG; the same corpus yields byte-identical merge tables on every run.
    The output is VALID by construction (each merge's components are
    single characters or earlier-merge products), so it feeds
    ``token_count_bpe_udf`` / ``token_count_bpe_broadcast`` directly.
    """
    wf = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(top_words)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {
        tuple(r["w"]): int(r["c"]) for r in wf
    }
    merges: list[tuple[str, str]] = []
    for _ in range(max(0, n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def bpe_token_count_word_ranked(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word by iterative LOWEST-RANK adjacent-pair
    merging — the O(len²·lookups) algorithm every production BPE tokenizer
    uses, equivalent to :func:`bpe_token_count_word`'s rank-order-to-
    fixpoint semantics for any VALID merge table (each merge's components
    predate it, so a later merge can never enable an earlier one; equality
    is pinned by tests over the real corpus). At 50k ranks the fixpoint
    scan would walk the whole table per word; this walks only the word."""
    if not word:
        return 0
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[j], sym[j + 1])
        if best_pair is None:
            break
        # merge ALL occurrences of the winning pair, left-to-right (the
        # same greedy order as replace-all in the fixpoint twin)
        out: list[str] = []
        j = 0
        while j < len(sym):
            if j < len(sym) - 1 and (sym[j], sym[j + 1]) == best_pair:
                out.append(sym[j] + sym[j + 1])
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return len(sym)


def token_count_bpe_broadcast(spark, merges: list[tuple[str, str]]):
    """The production-vocab path: the merge table ships ONCE per executor
    via ``sparkContext.broadcast`` (not per-task in the UDF closure — at
    50k ranks the closure would be re-pickled into every task), and words
    tokenize via the rank-dict algorithm with a per-batch word memo
    (corpus word frequency follows Zipf, so the memo hit rate is high and
    the memo stays deterministic). Returns a vectorized pandas UDF
    ``text → token count`` with semantics identical to
    :func:`token_count_bpe_udf` for the same merge table."""
    from pyspark.sql.types import LongType

    bc = spark.sparkContext.broadcast(
        {pair: rank for rank, pair in enumerate(merges)}
    )

    import re

    ws = re.compile(r"\s+", re.ASCII)

    # the memo outlives a single Arrow batch (python workers are reused per
    # executor): caches only pure-function results, so it never affects
    # determinism — Zipf word frequency makes the hit rate high. Bounded so
    # a pathological corpus can't grow it without limit.
    memo: dict[str, int] = {}

    @F.pandas_udf(LongType())
    def _count(texts: pd.Series) -> pd.Series:
        ranks = bc.value
        if len(memo) > 2_000_000:
            memo.clear()
        out = []
        for t in texts:
            if t is None:
                out.append(0)
                continue
            total = 0
            for w in ws.split(t):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = bpe_token_count_word_ranked(w, ranks)
                    memo[w] = n
                total += n
            out.append(total)
        return pd.Series(out, dtype="int64")

    return _count


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features + a composite score
    (the usual web-corpus quality gates)."""
    n_chars = F.length(text)
    n_tokens = token_count_ws(text)
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(
        (_occurrences(padded, m) for ms in _LANG_MARKERS.values() for m in ms), F.lit(0)
    )
    # punct count = chars that are NOT [A-Za-z0-9 ]. translate() drops the
    # 63 allowed ASCII chars and leaves exactly the punct chars, so
    # length(translate(...)) equals the old
    # length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '')) for
    # every input (any char outside the list — unicode included — counts as
    # punct on both forms). Why: regexp_replace ran a Java regex Matcher
    # per row (~600 µs/row measured at sf1.0 — the whole quality gate's
    # wall); translate is a per-char map lookup in codegen (~20× cheaper).
    _alnum_space = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
    )
    n_punct = F.length(F.translate(text, _alnum_space, ""))
    avg_tok_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_tok_len >= 3) & (avg_tok_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_tok_len": F.round(avg_tok_len, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stop_ratio": F.round(stop_ratio, 6),
        "quality": F.round(score, 2),
    }


def fingerprint_md5(text: Column) -> Column:
    """Whole-document fingerprint: md5 of lowercased trimmed text."""
    return F.md5(F.lower(F.trim(text)))


def fingerprint_kgram_min(text: Column, k: int = 4) -> Column:
    """Rolling k-gram fingerprint: min md5 over all char k-grams — a
    1-of-winnowing sketch, stable under text reordering-free edits."""
    n = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: F.md5(F.substring(text, i, k))))


def stratified_sample(
    docs: DataFrame,
    per_group: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep ≤ per_group docs per group,
    selected by md5(id) order — a hash-ordered sample is uniform-ish,
    reproducible across runs AND across engines (no RNG state), and the
    standard way a training-data pipeline caps per-language volume.

    One shuffle on group_col; the per-group window never sees more than the
    group's rows, and AQE's skew handling covers a dominant language. At
    10^10 docs a two-level variant (pre-trim per (group, salt) like the
    politeness scheduler) bounds task memory — same commuting-selection
    argument as plans/rank.py.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= per_group)
        .drop("_rk")
    )


def temperature_resample(
    docs: DataFrame,
    total: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based language-balanced resampling (the mT5 / XLM-R
    alpha-sampling discipline at T=2, i.e. alpha = 0.5): per-group quotas
    proportional to sqrt(n_group) — head languages are downweighted, tail
    languages upweighted relative to natural frequency — then keep each
    group's quota by md5-hash order (the stratified_sample idiom).

    Integer-exact cross-engine: the weight is isqrt(n) = floor(sqrt(n)),
    which IEEE-double sqrt gets exactly right for n < 2^52 (sqrt is
    correctly rounded and the true root is ≥ 1/(2·sqrt(n)) away from the
    next integer — beyond half an ulp for all n < 2^52); quotas are
    ``total · w_g // Σw`` with an INTEGER Σw, so no float aggregation
    order can differ between engines (the repo-wide rule). Quotas are
    floor-allocated; the ≤ (#groups - 1) residual docs are deliberately
    left unassigned rather than tie-broken by a float.

    Scale shape: one count per group (map-side combinable), quota math on
    the group-cardinality frame (broadcast back), one group-keyed window
    bounded by the group's own rows — identical plan to stratified_sample
    with a computed per-group cap.
    """
    from pyspark.sql.window import Window

    counts = docs.groupBy(group_col).agg(F.count("*").cast("long").alias("_n"))
    w = F.floor(F.sqrt(F.col("_n").cast("double"))).cast("long")
    weighted = counts.select(group_col, F.col("_n"), w.alias("_w"))
    total_w = weighted.agg(F.sum("_w").alias("_tw"))
    quotas = weighted.crossJoin(F.broadcast(total_w)).select(
        group_col,
        F.expr(f"({int(total)} * _w) div _tw").cast("long").alias("quota"),
    )
    h = F.md5(F.col(id_col).cast("string"))
    rk = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.join(F.broadcast(quotas), group_col)
        .withColumn("_rk", F.row_number().over(rk))
        .where(F.col("_rk") <= F.col("quota"))
        .select(F.col(id_col), F.col(group_col), F.col("quota"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any k-word
    shingle with a benchmark/eval set — the standard pre-training hygiene
    pass. Returns (doc_id, n_shared) for contaminated docs only.

    Shape at scale: benchmark shingles are a SMALL set (eval suites are
    thousands of docs) → broadcast; the corpus side explodes to (doc,
    shingle-md5) rows that hash-join map-side against the broadcast set, so
    the only aggregation shuffle is on the (tiny) contaminated subset.
    Shingle identity travels as md5 (32 bytes), never raw text.
    """
    from crawld_spark.operators.dedup import norm_tokens, shingles_of_tokens

    # staged projections (r6): tokenize once, shingle over the token
    # ATTRIBUTE — expressions inside HOF lambdas re-evaluate per element, so
    # the inline shingles(text) form re-ran the regex split per shingle
    def _sh(df):
        t1 = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("_toks"))
        return t1.select(
            F.col(id_col), shingles_of_tokens(F.col("_toks"), k).alias("_shs")
        )

    doc_sh = _sh(docs).select(
        id_col, F.explode(F.col("_shs")).alias("_sh")
    ).select(id_col, F.md5(F.col("_sh")).alias("_h"))
    bench_sh = (
        _sh(benchmark)
        .select(F.explode(F.col("_shs")).alias("_sh"))
        .select(F.md5(F.col("_sh")).alias("_h"))
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), on="_h", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


# ---------------------------------------------------------------------
# repetition quality rules (Gopher/C4-style) and PII scrubbing
# ---------------------------------------------------------------------

def repetition_features(text: Column) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher repetition-removal
    family: fraction of duplicate words, most-frequent-word share,
    most-frequent-2-gram share) + the composite keep/drop gate.

    All pure per-row array expressions (split/filter/transform/array_max —
    whole-stage codegen, zero shuffle, embarrassingly parallel scan), which
    is the 100 TB shape: repetition is a per-document property, so the
    corpus-wide pass is a single mapper. The per-row cost is
    O(distinct_words × words); web documents are length-capped upstream
    (quality_features' n_tokens gate), so the quadratic term is bounded —
    for uncapped corpora switch to the explode + groupBy(doc, word) twin,
    which trades a shuffle for linear per-row work.
    """
    ws = F.filter(F.split(text, " "), lambda x: x != F.lit(""))
    n = F.size(ws)
    uniq = F.array_distinct(ws)
    dup_word_frac = F.round(F.lit(1.0) - F.size(uniq) / n, 6)
    top_word = F.array_max(
        F.transform(uniq, lambda u: F.size(F.filter(ws, lambda x: x == u)))
    )
    top_word_frac = F.round(top_word / n, 6)
    bg = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ubg = F.array_distinct(bg)
    top_bg = F.array_max(
        F.transform(ubg, lambda u: F.size(F.filter(bg, lambda x: x == u)))
    )
    top_2gram_frac = F.round(top_bg / F.size(bg), 6)
    keep = (
        (dup_word_frac <= F.lit(0.6))
        & (top_word_frac <= F.lit(0.2))
        & n.between(10, 10000)
    )
    return {
        "n_words": n.cast("long"),
        "dup_word_frac": dup_word_frac,
        "top_word_frac": top_word_frac,
        "top_2gram_frac": top_2gram_frac,
        "keep": keep,
    }


# PII patterns kept to the Java-regex ∩ RE2 common subset (character
# classes + bounded repeats, no lookaround) so the DuckDB oracle matches
# byte-for-byte.
PII_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_scrub(text: Column) -> dict[str, Column]:
    """Redact email addresses and phone numbers with typed placeholders and
    count the redactions — the standard pre-training PII pass. JVM-side
    regexp_replace/regexp_extract_all only (no UDF): one projection, zero
    shuffle, scales as a pure mapper at any corpus size."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
    )
    return {
        "n_emails": n_emails.cast("long"),
        "n_phones": n_phones.cast("long"),
        "scrubbed": scrubbed,
    }


# ---------------------------------------------------------------------
# corpus-trained bigram LM familiarity (CCNet-style quality signal)
# ---------------------------------------------------------------------

def bigram_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per ``(id, bigram)`` occurrence — the token stream the LM
    trains on AND scores. Pure codegen array expressions (split/slice/
    zip_with) + one explode; no shuffle."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    n = F.size(ws)
    bg = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(F.col(id_col), F.explode(bg).alias("bg"))


def lm_bigram_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score each document by the mean conditional log-probability of its
    word bigrams under a bigram LM trained on the corpus itself — the
    CCNet/KenLM-style "familiarity" gate (low score = atypical/garbled
    text, the standard perplexity-bucket quality split), self-trained so
    the lane is closed-world and deterministic.

    Returns ``(id_col, n_bigrams, sum_qlp, lm_score)`` where per-bigram
    ``log P(w2|w1) = ln(count(w1 w2)/count(w1 ·))`` is quantized to an
    int64 (``floor(lp * 1e6)``) at the *bigram-type* level, so every
    per-document aggregate is an INTEGER sum — order-independent, hence
    byte-stable across engines and shuffle schedules (sums of raw doubles
    are not). ``lm_score = sum_qlp / n_bigrams / 1e6`` ≈ mean log-prob.

    Scale shape (100 TB corpus): training is two map-side-combinable
    groupBys over (bigram) and (first word) — count shuffles carry only
    the token key + a long. The type-level model table (corpus-unique
    bigrams, vocab-bounded) joins the occurrence stream on the bigram
    equi-key: Catalyst broadcasts it when small, AQE handles hot-bigram
    skew ("of the") otherwise; the final per-doc aggregate partials
    map-side. No window, no driver collect, text never shuffles (only
    bigram strings and longs travel).
    """
    # three consumers (bigram counts, first-word counts, the scoring join):
    # materialize the skinny (id, bigram) rows once instead of re-running
    # tokenize+explode per consumer (r6; the neardup_mark discipline)
    from crawld_spark.operators.ckpt import ckpt_lazy

    ex = ckpt_lazy(bigram_rows(docs, id_col, text_col))
    cb = ex.groupBy("bg").agg(F.count("*").alias("cb"))
    cw = (
        ex.select(F.split(F.col("bg"), " ")[0].alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cw"))
    )
    model = (
        cb.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(cw, "w1")
        .select(
            "bg",
            F.floor(
                F.log(F.col("cb").cast("double") / F.col("cw").cast("double"))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("qlp"),
        )
    )
    return (
        ex.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("qlp").alias("sum_qlp"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_qlp",
            F.round(
                F.col("sum_qlp") / F.col("n_bigrams") / F.lit(1000000.0), 6
            ).alias("lm_score"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,  # id_col + lang_col + score_col
    lang_col: str = "lang",
    score_col: str = "lm_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail corpus split, per language: tertile
    thresholds of the LM familiarity score computed WITHIN each language,
    then each document labeled by which third it falls in (``head`` =
    most-familiar third = lowest perplexity — the slice CCNet keeps for LM
    training; thresholds are per-language because raw LM scores are not
    comparable across languages). Returns ``(id_col, lang_col, score_col,
    lo_thresh, hi_thresh, bucket)``.

    Scale shape: one groupBy(lang) exact-percentile aggregate — languages
    are few, so the threshold frame is tiny and broadcast-joins back; the
    labeling itself is a codegen projection. Exact ``percentile`` keeps a
    value→count map per language (bounded by distinct score values); swap
    ``approx_percentile`` for truly unbounded score domains. The same
    interpolated-quantile definition as DuckDB's ``quantile_cont``
    (cross-checked in the percentile_length_filter lane).
    """
    th = scored.groupBy(lang_col).agg(
        F.expr(
            f"percentile({score_col}, array(CAST(1 AS DOUBLE)/3,"
            f" CAST(2 AS DOUBLE)/3))"
        ).alias("_th")
    )
    v = F.col(score_col)
    bucket = (
        F.when(v >= F.element_at("_th", 2), F.lit("head"))
        .when(v >= F.element_at("_th", 1), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(th), lang_col).select(
        id_col,
        lang_col,
        score_col,
        F.round(F.element_at("_th", 1), 6).alias("lo_thresh"),
        F.round(F.element_at("_th", 2), 6).alias("hi_thresh"),
        bucket.alias("bucket"),
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    n_hashes: int = 4,
    band_size: int = 2,
    shingle_k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: flag training documents
    sharing any MinHash-LSH band with any benchmark document — catches the
    paraphrased/reformatted contamination the exact k-gram pass
    (:func:`decontaminate`) misses (an appended sentence or shuffled
    whitespace changes every overlapping shingle but rarely every band).
    Returns ``(id_col, n_bands_hit)`` for flagged docs only; run BOTH
    passes in practice (exact = high precision, fuzzy = recall).

    Shape at scale: identical to the exact pass — the benchmark band set
    is eval-suite-small → broadcast; the corpus side's band rows semi-join
    map-side, so the only aggregation shuffle is over the flagged subset.
    Band keys are md5 digests; text never travels.
    """
    from crawld_spark.operators.dedup import minhash_lsh_buckets

    db = minhash_lsh_buckets(
        docs, n_hashes, band_size, shingle_k, id_col, text_col
    )
    bb = (
        minhash_lsh_buckets(
            benchmark, n_hashes, band_size, shingle_k, id_col, text_col
        )
        .select("band_id", "band_key")
        .distinct()
    )
    return (
        db.join(F.broadcast(bb), ["band_id", "band_key"], "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bands_hit"))
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a literal term list —
    the lexical-search operator of the family (Robertson/Spärck Jones
    probabilistic relevance; the Okapi BM25 form every search stack
    ships). Returns the top-k documents:
    ``(doc_id, n_terms_hit, qtotal, score, rank)``.

    Integer-exact cross-engine arithmetic: with k1 = 6/5 and b = 3/4 the
    per-term score

        idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    multiplies through to ``qidf · 22·tf·L / (10·tf·L + 3·L + 9·dl·N)``
    with N = corpus docs, L = total corpus tokens — an all-integer
    denominator, one double division, floored to an int64 per-term score
    (qidf = floor(ln((N − df + ½)/(df + ½) + 1)·10⁶), the
    quantize-at-type-level discipline of lm_bigram_scores). Per-document
    totals are INTEGER sums — order-independent, so Spark and the DuckDB
    twin agree bit-for-bit; ``score`` is qtotal/10⁶ for display.

    Scale shape: the token stream filters to the (tiny, literal) term set
    before any shuffle, so the (doc, term) tf aggregate is query-sized,
    not corpus-sized; df and the corpus stats are one map-side-combinable
    aggregate each, broadcast back; the final cut is orderBy().limit(k)
    with the rank assigned over the k survivors only.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    ex = docs.select(F.col(id_col), F.explode(toks).alias("w"))
    stats = docs.select(
        F.count("*").alias("n"),
        F.sum(F.size(toks)).alias("lt"),
    )
    dl = ex.groupBy(id_col).agg(F.count("*").alias("dl"))
    hits = ex.where(F.col("w").isin(list(terms)))
    tf = hits.groupBy(id_col, "w").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    # qidf at the TERM level (one row per term), integer thereafter
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "w",
        F.floor(
            F.log(
                (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("qidf"),
        "n",
        "lt",
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, id_col)
        .withColumn(
            "qscore",
            F.floor(
                (
                    F.col("qidf").cast("double")
                    * F.lit(22)
                    * F.col("tf")
                    * F.col("lt")
                )
                / (
                    F.lit(10) * F.col("tf") * F.col("lt")
                    + F.lit(3) * F.col("lt")
                    + F.lit(9) * F.col("dl") * F.col("n")
                ).cast("double")
            ).cast("long"),
        )
    )
    totals = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_terms_hit"),
        F.sum("qscore").alias("qtotal"),
    )
    from pyspark.sql.window import Window

    top = totals.orderBy(F.desc("qtotal"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("qtotal"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        id_col,
        "n_terms_hit",
        "qtotal",
        F.round(F.col("qtotal") / F.lit(1000000.0), 6).alias("score"),
        "rank",
    )


# ---------------------------------------------------------------------
# feature-hashing linear quality classifier (fastText/VW-style inference)
# ---------------------------------------------------------------------

def hashed_classifier_features(
    text: Column, n_buckets: int = 4096, w_mod: int = 4001
) -> dict[str, Column]:
    """Model-based quality filtering as a pure mapper: tokens → hashed
    feature buckets (``md5`` first 8 hex digits mod ``n_buckets`` — the
    vocabulary-free feature-hashing trick, identical in any engine) → one
    weight per bucket → mean weight as the document score, ``keep`` =
    score > 0. This is the inference shape of the fastText/logreg quality
    classifiers used to filter web corpora (GPT-3/LLaMA-style "looks like
    reference text" gates).

    The weight vector here is a closed-form function of the bucket id
    (``(b*2654435761) % w_mod`` centered — a deterministic stand-in, so the
    DuckDB oracle can replay it); a *trained* vector drops in as either
    ``F.element_at(F.lit(weights), bucket+1)`` (plan-embedded, fine to
    ~1M floats) or a Pandas UDF over a ``sparkContext.broadcast`` numpy
    array for bigger models — the hashing, lookup and mean stay the same.

    Scale: per-row array expressions only (split/transform/aggregate in
    whole-stage codegen) — zero shuffle, zero Python, embarrassingly
    parallel at any corpus size; the integer score sum keeps cross-engine
    aggregation order-independent.
    """
    half = (w_mod - 1) // 2
    ws = F.filter(F.split(text, " "), lambda x: x != F.lit(""))
    weights = F.transform(
        ws,
        lambda w: (
            (F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % n_buckets)
            * F.lit(2654435761)
        )
        % F.lit(w_mod)
        - F.lit(half),
    )
    n = F.size(ws)
    ssum = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    score = F.round(ssum / F.greatest(n, F.lit(1)), 6)
    return {
        "n_tokens": n.cast("long"),
        "score_sum": ssum,
        "clf_score": score,
        "keep": score > 0,
    }


# ---------------------------------------------------------------------
# GPT-style concat-and-chunk sequence packing
# ---------------------------------------------------------------------

def pack_sequences(
    docs: DataFrame,
    seq_len: int = 1024,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Training-sequence construction, concat-and-chunk form: documents are
    concatenated in ``id_col`` order into one token stream and cut into
    fixed ``seq_len`` blocks. Per document returns its token-stream offset
    and the sequence ids it lands in: ``(id_col, tokens_col, start_off,
    first_seq, last_seq, n_seqs, crosses_boundary)`` — the packing manifest
    a loader needs to materialize shards, and the place boundary-crossing
    statistics (attention-mask breaks) come from.

    The sequential-looking "running offset of every preceding document" is
    :func:`crawld_spark.plans.rank.global_prefix_sum` — the engine's
    two-phase range-partitioned prefix sum (NO single-partition window, the
    classic scale trap for exactly this op); everything after the offset is
    per-row arithmetic in whole-stage codegen. One range shuffle of
    (id, int) pairs total, text never moves — at 100 TB the manifest is
    built without touching payload bytes.
    """
    from crawld_spark.plans.rank import global_prefix_sum

    cum = global_prefix_sum(
        docs.select(id_col, F.col(tokens_col).cast("long").alias(tokens_col)),
        [F.asc(id_col)],
        F.col(tokens_col),
        out="_cum",
        num_partitions=num_partitions,
    )
    start = (F.col("_cum") - F.col(tokens_col)).alias("start_off")
    first = F.floor((F.col("_cum") - F.col(tokens_col)) / seq_len).cast("long")
    last = F.floor((F.col("_cum") - 1) / seq_len).cast("long")
    has = F.col(tokens_col) > 0
    return cum.select(
        id_col,
        tokens_col,
        start.cast("long"),
        F.when(has, first).alias("first_seq"),
        F.when(has, last).alias("last_seq"),
        F.when(has, last - first + 1).otherwise(F.lit(0)).cast("long").alias("n_seqs"),
        F.when(has, last > first).otherwise(F.lit(False)).alias("crosses_boundary"),
    )


# ---------------------------------------------------------------------
# corpus-percentile length trimming
# ---------------------------------------------------------------------

def percentile_length_filter(
    docs: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Trim length outliers by corpus percentile: keep documents whose
    token count lies within the ``[lo, hi]`` interpolated quantiles of the
    corpus itself (the data-dependent alternative to quality_rules' fixed
    10..10000 gate). Returns ``(id_col, tokens_col, lo_thresh, hi_thresh,
    keep)``.

    Uses Spark's EXACT ``percentile`` aggregate (linear interpolation —
    same definition as DuckDB's ``quantile_cont``, verified bit-equal in
    the lane oracle). Exact percentile aggregates a value→count map
    map-side, so over an integer token-count domain its state is bounded
    by the DISTINCT lengths (≤ max doc length), not row count — fine at
    any corpus size; for unbounded/continuous domains swap in
    ``approx_percentile``. The two-row threshold frame broadcast-joins
    back; the filter itself is a codegen projection.
    """
    th = docs.agg(
        F.expr(
            f"percentile({tokens_col}, array(CAST({lo} AS DOUBLE), "
            f"CAST({hi} AS DOUBLE)))"
        ).alias("_th")
    )
    v = F.col(tokens_col).cast("double")
    return (
        docs.crossJoin(F.broadcast(th))
        .select(
            id_col,
            tokens_col,
            F.round(F.element_at("_th", 1), 6).alias("lo_thresh"),
            F.round(F.element_at("_th", 2), 6).alias("hi_thresh"),
            (
                (v >= F.element_at("_th", 1)) & (v <= F.element_at("_th", 2))
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------

def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF: term
    frequency within the doc × ``ln(N/df)`` rarity across the corpus.
    Returns ``(id_col, term, tf, df, score_q, rank)`` with ``score_q =
    tf * floor(ln(N/df) * 1e6)`` — IDF quantized to int64 at the
    *term-type* level (the lm_bigram_scores trick) so scores, and
    therefore ranks, are integer-exact across engines; ties break on the
    term string.

    Scale: tf is one map-side-combinable groupBy over (id, term); df one
    over (term); N one count. The term-type IDF table (vocab-bounded)
    equi-joins the tf stream — broadcast when small, AQE skew-split for
    hot stopwords otherwise. The top-k window partitions by document
    (bounded: a doc's distinct terms), never by term. Text never
    shuffles — only terms and longs travel.
    """
    from pyspark.sql.window import Window

    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    # NOT checkpointed: the tf/df consumers re-run the cheap split+explode;
    # materializing the token rows costs more than it saves (measured r6)
    tok = docs.select(F.col(id_col), F.explode(ws).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.count_distinct(id_col).cast("long").alias("df")
    )
    n_docs = docs.select(F.count("*").alias("_n"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        F.floor(
            F.log(F.col("_n").cast("double") / F.col("df").cast("double"))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("idf_q"),
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", "tf", "df",
        (F.col("tf") * F.col("idf_q")).alias("score_q"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_q"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def materialize_sequences(
    docs: DataFrame,
    seq_len: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Materialize the packed training sequences that
    :func:`pack_sequences` only manifests: cut the concatenated (id-ordered)
    token stream into ``seq_len`` blocks and assemble each block's text.
    Returns ``(seq_id, n_tokens, n_docs, seq_md5)`` — md5 of the
    space-joined block so the lane travels 16 bytes per sequence, not
    payload. The last block may be partial (its ``n_tokens`` < seq_len).

    Shape: per-doc stream offsets come from the two-phase prefix sum; each
    document then emits one *fragment* row per sequence it touches (array
    slice per fragment — a doc adds ceil(n/L)+1 rows max, NOT one row per
    token), and assembly is one groupBy(seq_id) whose state is bounded by
    seq_len tokens regardless of corpus size. So the shuffle carries each
    token's text exactly once, keyed by an integer — the minimum any
    engine must move to build shards — and no partition ever holds more
    than its sequences × seq_len tokens.
    """
    from crawld_spark.plans.rank import global_prefix_sum

    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    base = docs.select(F.col(id_col), ws.alias("_ws"))
    cum = global_prefix_sum(
        base.select(id_col, "_ws", F.size("_ws").alias("_n")),
        [F.asc(id_col)],
        F.col("_n"),
        out="_cum",
        num_partitions=num_partitions,
    )
    start = F.col("_cum") - F.col("_n")
    first = F.floor(start / seq_len).cast("long")
    last = F.floor((F.col("_cum") - 1) / seq_len).cast("long")
    frags = (
        cum.where(F.col("_n") > 0)
        .select(
            F.col(id_col),
            start.alias("_start"),
            F.explode(F.sequence(first, last)).alias("seq_id"),
            F.col("_ws"),
        )
        .select(
            "seq_id",
            F.greatest(F.col("seq_id") * seq_len, F.col("_start")).alias("_gpos"),
            F.slice(
                "_ws",
                (
                    F.greatest(
                        F.col("seq_id") * seq_len - F.col("_start"), F.lit(0)
                    )
                    + 1
                ).cast("int"),
                (
                    F.least(
                        (F.col("seq_id") + 1) * seq_len - F.col("_start"),
                        F.size("_ws").cast("long"),
                    )
                    - F.greatest(
                        F.col("seq_id") * seq_len - F.col("_start"), F.lit(0)
                    )
                ).cast("int"),
            ).alias("_frag"),
        )
    )
    return (
        frags.groupBy("seq_id")
        .agg(
            F.sum(F.size("_frag")).cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_docs"),
            F.md5(
                F.array_join(
                    F.flatten(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("_gpos", "_frag"))
                            ),
                            lambda s: s["_frag"],
                        )
                    ),
                    " ",
                )
            ).alias("seq_md5"),
        )
    )
