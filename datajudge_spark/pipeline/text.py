"""Text-analysis primitives: tokenization, shingling, portable hashing,
language ID, token counting, fingerprints.

Design rules for 100 TB:

- Every function here returns a *Column* (or a narrow DataFrame) built
  from JVM-side ``pyspark.sql.functions`` — no Python UDFs, so the whole
  pipeline stays inside whole-stage codegen and scales linearly with
  executors.
- All hashing is md5-based (``md5_long``): deterministic, available in
  every engine (the DuckDB oracle recomputes it with
  ``('0x' || substr(md5(x),1,15))::UBIGINT``), and uniform enough for
  MinHash/SimHash. 15 hex chars = 60 bits, safely inside a signed int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "md5_long",
    "tokens",
    "word_shingles",
    "ngram_topk",
    "chunk_documents",
    "repetition_signals",
    "source_quality_report",
    "tfidf_top_terms",
    "rolling_hash",
    "bpe_token_count",
    "language_scores",
    "language_id",
    "LANG_MARKERS",
    "PII_PATTERNS",
    "redact_terms",
    "redact_pii",
    "boilerplate_ngrams",
]

#: Number of md5 hex chars used for integer hashes (60 bits < int64).
MD5_HEX_CHARS = 15

#: Large Mersenne prime for the rolling hash modulus (fits int32).
ROLLING_MOD = 2_147_483_647
ROLLING_BASE = 131

#: GPT-2-ish pre-tokenizer approximation: letter runs, digit runs, or a
#: single non-alphanumeric non-space symbol.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language marker vocabularies (classic stopword heuristic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "und", "ist", "nicht", "das"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "fr": ("le", "les", "et", "est", "une", "dans"),
    "zh": ("de5", "shi4", "bu4", "le5", "wo3", "zai4"),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def md5_long_sql(
    expr_sql: str,
    salt: int | str | None = None,
    nhex: int = MD5_HEX_CHARS,
) -> str:
    """:func:`md5_long` as a SQL fragment over an SQL expression string.

    One parsed string instead of ~7 py4j round-trips of Column calls —
    the hash is built per (call site x salt) all over the dedup /
    bootstrap / sampling families, so the build cost is suite-wide.
    Identical expression tree after parsing => identical values.
    """
    if salt is not None:
        s = str(salt).replace("\\", "\\\\").replace("'", "\\'")
        expr_sql = f"concat({expr_sql}, '#{s}')"
    return f"CAST(conv(substring(md5({expr_sql}), 1, {nhex}), 16, 10) AS BIGINT)"


def md5_long(
    c: Column | str,
    salt: int | str | None = None,
    nhex: int = MD5_HEX_CHARS,
) -> Column:
    """``nhex*4``-bit integer hash of a string column, identical across
    engines (default 60 bits).

    ``salt`` concatenates ``#<salt>`` before hashing, giving independent
    hash functions without 64-bit modular multiplication (which would
    overflow engine-dependently). ``nhex=13`` (52 bits) leaves headroom
    for small linear combinations of two hashes inside int64.

    A plain column-name string builds as ONE parsed SQL expression
    (cheap); a Column input takes the Column-API path (same resolved
    tree either way).
    """
    if isinstance(c, str):
        return F.expr(md5_long_sql(f"`{c}`", salt=salt, nhex=nhex))
    if salt is not None:
        c = F.concat(c, F.lit(f"#{salt}"))
    return F.conv(F.substring(F.md5(c), 1, nhex), 16, 10).cast("bigint")


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of trimmed text (empty text -> single '' token)."""
    return F.split(F.trim(_col(c)), r"\s+")


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Array of word ``n``-gram shingles (space-joined), empty if < n tokens.

    Spark's ``sequence(1, 0)`` yields a DESCENDING [1, 0] rather than an
    empty array, so short documents need an explicit guard.
    """
    toks = tokens(c)
    count = F.size(toks) - F.lit(n - 1)
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def ngram_topk(df, text_col: str, n: int = 2, k: int = 20):
    """Global top-``k`` word ``n``-grams by corpus frequency.

    Frequencies keep within-document multiplicity (unlike the dedup
    shingle sets). The plan is the one you want at 100 TB: explode ->
    hash aggregate with map-side partial counts (the shuffle carries one
    row per distinct n-gram per task, not per occurrence) ->
    ``TakeOrderedAndProject`` (per-partition top-k heaps merged on the
    driver — no global sort). The (count DESC, ngram ASC) order is a
    total order, so the k-boundary is deterministic across engines.
    """
    from datajudge_spark.pipeline._util import spread

    return (
        spread(df)
        .select(F.explode(word_shingles(text_col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def chunk_documents(df, id_col: str, text_col: str, chunk_tokens: int):
    """Split each document into consecutive ``chunk_tokens``-token chunks
    (context-window packing prep).

    Returns ``(id, chunk_idx, n_tokens, chunk_text)``; the final chunk of
    a document may be short. Pure per-row transform + explode — map-only,
    no shuffle, no state: at 100 TB this runs at scan speed and chunk
    rows land in the same partition as their source document.
    """
    toks = tokens(text_col)
    # tokens() never yields an empty array (empty text -> ['']), so
    # every document produces >= 1 chunk
    nchunks = F.floor(
        (F.size(toks) + F.lit(chunk_tokens - 1)) / F.lit(chunk_tokens)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("_tk"),
            F.explode(F.sequence(F.lit(0).cast("bigint"), nchunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(
                F.slice(
                    F.col("_tk"),
                    (F.col("chunk_idx") * chunk_tokens + 1).cast("int"),
                    chunk_tokens,
                )
            ).cast("bigint").alias("n_tokens"),
            F.array_join(
                F.slice(
                    F.col("_tk"),
                    (F.col("chunk_idx") * chunk_tokens + 1).cast("int"),
                    chunk_tokens,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def repetition_signals(df, id_col: str, text_col: str):
    """Within-document repetition signals (Gopher-style quality filters).

    Per document: ``n_tokens``, ``dup_token_fraction`` (1 − distinct/total
    tokens) and ``top_bigram_fraction`` (occurrences of the most frequent
    bigram / total bigrams) — the classic filters for boilerplate and
    degenerate repetition in pre-training corpora.

    Entirely map-side: every signal is a per-row array expression. The
    bigram mode (most-frequent-bigram count) is the longest equal run of
    the SORTED bigram array, computed with one ``aggregate`` fold —
    O(len log len) per document inside codegen, zero shuffles, scales
    with executors at any corpus size. (An explode + two-level count
    aggregation gives the same numbers but shuffles every bigram
    occurrence; at 100 TB that is the difference between a scan job and
    a multi-TB exchange.) Documents with fewer than two tokens have no
    bigrams: ``top_bigram_fraction`` is 0.
    """
    from datajudge_spark.pipeline._util import spread

    toks = tokens(text_col)
    bg_sorted = F.array_sort(word_shingles(text_col, 2))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        new_run = (
            F.when(acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    top_count = F.aggregate(bg_sorted, init, step)["best"]
    return spread(df).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks), 6
        ).alias("dup_token_fraction"),
        F.when(F.size(bg_sorted) > 0, F.round(top_count / F.size(bg_sorted), 6))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_fraction"),
    )


def source_quality_report(df, strata_col: str, text_col: str):
    """Per-source (or any stratum) corpus-health aggregates.

    One scan, one shuffle: every per-document signal is a per-row array
    expression (including the most-frequent-bigram count, via the sorted
    longest-run fold), and the per-stratum report aggregates INTEGER
    numerators/denominators — pooled fractions are computed as one final
    division, so the result is independent of partition order (a naive
    ``avg`` over per-doc double fractions is summation-order-dependent
    and not reproducible across engines or runs).

    Columns: stratum, n_docs, total_tokens, ``pooled_dup_fraction``
    (1 − Σdistinct/Σtokens), ``pooled_top_bigram_fraction``
    (Σ top-bigram count / Σ bigrams), ``avg_chars``.
    """
    from datajudge_spark.pipeline._util import spread

    toks = tokens(text_col)
    bg_sorted = F.array_sort(word_shingles(text_col, 2))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        new_run = (
            F.when(acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    top_count = F.aggregate(bg_sorted, init, step)["best"]
    return (
        spread(df)
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("total_tokens"),
            F.sum(F.size(F.array_distinct(toks))).alias("_distinct"),
            F.sum(F.size(bg_sorted)).alias("_bigrams"),
            F.sum(top_count).alias("_top"),
            F.sum(F.length(text_col)).alias("_chars"),
        )
        .select(
            "stratum",
            "n_docs",
            "total_tokens",
            F.round(
                F.lit(1.0) - F.col("_distinct") / F.col("total_tokens"), 6
            ).alias("pooled_dup_fraction"),
            F.when(
                F.col("_bigrams") > 0,
                F.round(F.col("_top") / F.col("_bigrams"), 6),
            ).otherwise(F.lit(0.0)).alias("pooled_top_bigram_fraction"),
            F.round(F.col("_chars") / F.col("n_docs"), 6).alias("avg_chars"),
        )
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-``k`` terms of each document by tf·idf.

    ``score = tf(doc, term) * ln(N / df(term))``, ranked per document by
    (rounded score DESC, term ASC). Plan shape at corpus scale:

    - term frequencies and document frequencies are two partial-agg
      passes over the exploded tokens (shuffles keyed by (doc, term) and
      term — no skewed global state);
    - the corpus size N is a 1-row aggregate cross-joined (broadcast)
      into the scoring expression, keeping the query fully lazy;
    - the ranking window partitions by document, bounded by the distinct
      terms of one document, never by corpus size.

    Ranking uses the score ROUNDED to 6 places: ``ln`` is a libm call
    whose last ulp may differ across engines, and ranking on the rounded
    value keeps the order (and the DuckDB oracle) deterministic.
    """
    from pyspark.sql import Window

    from datajudge_spark.pipeline._util import spread

    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("_df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(F.col("_id").alias(id_col), "term", "score", "rn")
    )


def rolling_hash(c: Column | str) -> Column:
    """Polynomial rolling hash over the characters of a string.

    ``h = fold(chars, 0, (acc, ch) -> (acc*131 + codepoint) mod (2^31-1))``
    — the Karp-Rabin fingerprint family. Max intermediate value is
    ``(2^31)*131 + 1114111 < 2^39``: no int64 overflow, so the value is
    engine-independent (DuckDB oracle: ``list_reduce`` with a 0 prepended).
    """
    chars = F.split(_col(c), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * ROLLING_BASE + F.ascii(ch)) % ROLLING_MOD,
    )


def bpe_token_count(c: Column | str) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex.

    Uses a ``lit`` pattern (not an embedded SQL string) so the backslash
    classes survive SQL literal parsing intact.
    """
    return F.size(
        F.regexp_extract_all(_col(c), F.lit(BPE_PATTERN), F.lit(0))
    ).cast("bigint")


def _language_score_sqls(c: str) -> dict[str, str]:
    """Per-language marker-count expressions as SQL fragments over a
    plain column name — one parsed string replaces the ~300
    py4j-round-trip Column build (array of lits + filter lambda per
    language).  Identical expression after parsing."""
    toks = f"split(trim(`{c}`), '\\\\s+')"
    out: dict[str, str] = {}
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        out[lang] = (
            f"CAST(size(filter({toks}, t -> "
            f"array_contains(array({arr}), t))) AS BIGINT)"
        )
    return out


def language_scores(c: Column | str) -> dict[str, Column]:
    """Per-language marker-token occurrence counts (with multiplicity)."""
    if isinstance(c, str):
        return {
            lang: F.expr(sql)
            for lang, sql in _language_score_sqls(c).items()
        }
    toks = tokens(c)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(marker_arr, t))
        ).cast("bigint")
    return out


def language_id(c: Column | str) -> Column:
    """Predicted language: the first language (in LANG_MARKERS order)
    achieving the maximum positive marker score; ``'und'`` if all zero.

    The fixed priority order makes ties deterministic — required for the
    cross-engine oracle, and a sane convention regardless.
    """
    if isinstance(c, str):
        # whole predictor as ONE parsed CASE: first language in marker
        # order hitting the positive maximum wins — branch-identical to
        # the Column fold below
        sqls = _language_score_sqls(c)
        best = "greatest(" + ", ".join(sqls.values()) + ")"
        whens = " ".join(
            f"WHEN ({sql} = {best} AND {best} > 0) THEN '{lang}'"
            for lang, sql in sqls.items()
        )
        return F.expr(f"CASE {whens} ELSE 'und' END")
    scores = language_scores(c)
    best = F.greatest(*scores.values())
    pred: Column = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


# --------------------------------------------------------------------------
# Scrubbing / redaction
# --------------------------------------------------------------------------

#: Common PII shapes as regexes valid in BOTH Java regex (Spark executors)
#: and RE2 (the DuckDB oracle, Google-style engines): no backreferences,
#: no lookaround. Applied as one alternation in redact_pii().
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def redact_terms(
    df, id_col: str, text_col: str, pattern: str, replacement: str = "<REDACTED>"
):
    """Scrub every match of ``pattern`` and count what was removed.

    (id, n_redacted, redacted_len, redacted_md5) — the digest output
    shape: at corpus scale the scrubbed text is *written*, not
    collected, and the md5 lets the oracle verify the rewritten bytes
    without shipping them. Map-only: no shuffle, no UDF — runs at scan
    speed and trivially survives any scale-up.

    The pattern is passed via ``F.lit`` (never interpolated into a SQL
    string, where ``\\s`` would be eaten by the string parser). Keep
    patterns in the Java∩RE2 common subset (no backreferences or
    lookaround) so engine-portable oracles can replay them.
    """
    text = F.col(text_col)
    redacted = F.regexp_replace(text, F.lit(pattern), F.lit(replacement))
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
        .cast("bigint")
        .alias("n_redacted"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def redact_pii(df, id_col: str, text_col: str, replacement: str = "<PII>"):
    """Scrub the default PII shapes (email, phone, IPv4, SSN) in one
    alternation pass."""
    pattern = "|".join(f"(?:{p})" for p in PII_PATTERNS.values())
    return redact_terms(df, id_col, text_col, pattern, replacement)


def unigram_logprob(df, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean unigram negative log-probability — the cheap
    perplexity proxy used as a corpus quality filter (high score =
    unusual tokens = candidate junk; the CCNet-style LM filter with the
    LM downgraded to corpus unigrams).

    ``score(doc) = mean_i ( -ln p(tok_i) )`` with Laplace-smoothed
    ``p(t) = (count(t) + 1) / (total + |vocab|)`` estimated from this
    corpus itself.

    Plan shape at corpus scale:

    - per-(doc, token) counts and corpus token counts are two partial-agg
      passes over the exploded tokens (same skeleton as tf-idf);
    - the corpus totals (token total, vocab size) are a 1-row aggregate
      cross-joined broadcast into the scoring expression;
    - the per-doc fold is one groupBy(doc) sum — integer token counts
      weight each token's logprob exactly, and the single final division
      keeps the result partition-order independent;
    - rounded to 6 (ln is libm; the ulp may differ across engines).
    """
    from datajudge_spark.pipeline._util import spread

    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    totals = corpus.agg(
        F.sum("ct").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    p = (F.col("ct") + 1) / (F.col("_total") + F.col("_vocab"))
    return (
        tf.join(corpus, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * -F.log(p)) / F.sum("tf"), 6
            ).alias("mean_neg_logprob"),
        )
    )


def bigram_logprob(df, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram negative log-probability — the next step
    up from :func:`unigram_logprob` as a corpus quality filter: word
    ORDER now matters, so shuffled/templated junk that fools unigram
    statistics scores high here.

    ``score(doc) = mean_i -ln p(w_{i+1} | w_i)`` with Laplace smoothing
    ``p(w2|w1) = (count(w1 w2) + 1) / (count(w1 ·) + B)`` where ``B`` is
    the number of distinct corpus bigrams — the conditional estimated
    from this corpus itself.  Documents with < 2 tokens have no bigrams
    and are absent from the output (they carry no sequence signal).

    Plan shape at corpus scale (same skeleton as unigram/tf-idf):
    bigrams are built MAP-SIDE from the token array (zip of the array
    with itself shifted — no self-join on token position); counts are
    two partial-agg passes; the distinct-bigram total broadcasts; the
    per-doc fold is one integer-weighted sum with a single final
    division, rounded to 6 (ln is libm).
    """
    from datajudge_spark.pipeline._util import spread

    arr = tokens(text_col)
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = (
        spread(df)
        .where(n >= 2)  # <2 tokens: no bigrams (and slice(n-1) ill-typed)
        .select(F.col(id_col).alias("_id"), F.explode(pairs).alias("p"))
        .select("_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    tf = bg.groupBy("_id", "w1", "w2").agg(F.count("*").alias("tf"))
    corpus = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    first = corpus.groupBy("w1").agg(F.sum("cb").alias("cf"))
    totals = corpus.agg(F.count(F.lit(1)).alias("_nbig"))
    p = (F.col("cb") + 1) / (F.col("cf") + F.col("_nbig"))
    return (
        tf.join(corpus, ["w1", "w2"])
        .join(first, "w1")
        .crossJoin(F.broadcast(totals))
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(
                F.sum(F.col("tf") * -F.log(p)) / F.sum("tf"), 6
            ).alias("mean_neg_logprob"),
        )
    )


def boilerplate_ngrams(
    df,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_docs: int = 5,
    min_sources: int = 2,
    source_col: str | None = None,
    k: int = 100,
):
    """Corpus-level boilerplate detector: word ``shingle_n``-grams shared
    by many documents — headers, footers, cookie banners, license
    blurbs — the spans an LLM-data pipeline strips before training.

    Returns the top ``k`` shingles by document frequency:
    ``(s, n_docs[, n_sources])`` with ``n_docs >= min_docs`` (and, when
    ``source_col`` is given, ``n_sources >= min_sources`` distinct
    sources — within-site repetition is navigation, CROSS-site
    repetition is boilerplate).  ``s`` is the engine-portable 60-bit
    md5 hash of the shingle (:func:`md5_long`), so only hashes shuffle,
    never text.  Plan: explode distinct shingles -> ONE hash aggregate
    with map-side partial counts (``count(distinct source)`` stays
    partial-aggregable because the first groupBy key is the shingle) ->
    ``TakeOrderedAndProject`` top-k, no global sort.

    Extension — no reference counterpart; the corpus-frequency
    complement of :func:`~datajudge_spark.pipeline.dedup.jaccard_pairs`'
    per-pair overlap.
    """
    from pyspark.sql import functions as F

    sel = [
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(word_shingles(text_col, shingle_n))
        ).alias("__s"),
    ]
    if source_col is not None:
        sel.insert(1, F.col(source_col).alias("__src"))
    exploded = df.select(*sel).select(
        *(["__id", "__src"] if source_col is not None else ["__id"]),
        md5_long("__s").alias("s"),
    )
    # rows are already distinct per (doc, shingle) — array_distinct
    # upstream — so n_docs is a plain count(*), keeping the aggregate
    # fully partial (no two-distinct Expand doubling the shuffle)
    if source_col is not None:
        agg = exploded.groupBy("s").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("__src").alias("n_sources"),
        )
        out = agg.where(
            (F.col("n_docs") >= min_docs)
            & (F.col("n_sources") >= min_sources)
        )
        order = [F.desc("n_docs"), F.desc("n_sources"), F.asc("s")]
    else:
        agg = exploded.groupBy("s").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
        out = agg.where(F.col("n_docs") >= min_docs)
        order = [F.desc("n_docs"), F.asc("s")]
    return out.orderBy(*order).limit(k)


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_n: int = 500
) -> DataFrame:
    """Zipf power-law fit over the corpus token frequency-rank curve,
    as one digest row ``(n_terms, slope, intercept)``: the OLS slope of
    ``ln(freq)`` on ``ln(rank)`` over the ``top_n`` most frequent
    tokens.  Natural text sits near slope -1; a collapsed slope (≫ -1,
    flat) means template/boilerplate domination, a cliff (≪ -1) means
    a tiny vocabulary looping — both corpus-health failure modes the
    hapax fraction (:func:`vocab_stats`) cannot localize to the HEAD of
    the distribution.

    Plan: explode -> token hash-agg (map-side partial counts, the only
    full shuffle) -> ``TakeOrderedAndProject`` top-N under the total
    order (count DESC, token ASC) — per-partition heaps, no global
    sort — then the closed-form OLS sums over the ≤``top_n``-row frame.
    At 100 TB the shuffle carries one row per distinct token per task
    and everything after the top-N is constant-size.
    """
    from pyspark.sql import Window

    per_type = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(top_n)
    )
    # the frame is <= top_n rows: a single-partition rank window is the
    # cheapest correct plan here (bounded by construction, not by data)
    ranked = per_type.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.desc("n"), "tok")),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    k = F.col("k").cast("double")
    denom = k * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom > 0,
        (k * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    return s.select(
        F.col("k").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / k, 6).alias(
            "intercept"
        ),
    )


def vocab_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary digest as one row: ``(n_docs, n_tokens,
    n_types, n_hapax, hapax_frac, ttr)`` — document count, total
    whitespace tokens, distinct token types, types occurring exactly
    once, the hapax fraction (Zipf-tail health: a corpus whose hapax
    share collapses is template/boilerplate-heavy; one that explodes is
    OCR-noise/shredded-encoding-heavy), and the corpus-level type-token
    ratio.

    One explode -> token groupBy (the only shuffle, over distinct
    tokens after map-side partial counts) -> 1-row aggregate; doc count
    rides a separate tiny aggregate combined by a 1x1 cross join.
    Ratios are doubles over exact integer counts, rounded to 6dp.
    """
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
    )
    per_type = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    agg = per_type.agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.count(F.when(F.col("n") == 1, 1)).alias("n_hapax"),
    )
    docs = df.where(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return docs.crossJoin(F.broadcast(agg)).select(
        "n_docs",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(
            F.col("n_hapax").cast("double") / F.col("n_types"), 6
        ).alias("hapax_frac"),
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens"), 6
        ).alias("ttr"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents for a fixed bag of query terms.

    ``score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))``
    with the standard "+1" idf ``ln((N−df+0.5)/(df+0.5) + 1)``.

    Plan shape at corpus scale:

    - the query-term ``isin`` filter prunes the exploded tokens BEFORE
      the (doc, term) shuffle, so tf state is |docs|·|Q|, not |corpus|;
    - document lengths are one partial-agg pass keyed by doc; the
      doc-frequency and (N, avgdl) frames are |Q|-row / 1-row
      broadcasts;
    - per-term scores are rounded at 1e-6 and summed as BIGINT so the
      per-doc total is summation-order independent (ln is a libm call —
      ranking raw doubles would be engine-dependent in the last ulp);
    - the top-k compiles to TakeOrderedAndProject (per-partition heaps,
      no global sort), tiebroken by doc id.

    Returns ``(id_col, score_e6, n_terms)`` — the scaled-integer score
    and how many distinct query terms the document matched.
    """
    from datajudge_spark.pipeline._util import spread

    qt = [str(t) for t in query_terms]
    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    )
    dl = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.where(F.col("term").isin(qt))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scal = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    tfpart = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "_id",
            F.round(idf * tfpart * 1e6, 0).cast("bigint").alias("se6"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.sum("se6").cast("bigint").alias("score_e6"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.desc("score_e6"), F.asc("_id"))
        .limit(k)
        .select(F.col("_id").alias(id_col), "score_e6", "n_terms")
    )
