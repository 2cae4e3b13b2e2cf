"""Near-duplicate detection: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each algorithm):

- **exact**: one hash-groupBy on a normalized fingerprint — a single
  shuffle with map-side partial aggregation; the baseline.
- **MinHash + LSH**: per-doc signature is ONE groupBy over exploded
  distinct shingles with k ``min`` aggregates (map-side combine, no
  k-way explode). Banding turns the quadratic all-pairs problem into a
  shuffle on (band, band-signature) — only docs colliding in a bucket
  are ever paired. This is the only member of the family that stays
  tractable when "documents" means 10^10 rows.
- **SimHash**: one groupBy over exploded tokens with ``bits`` signed-sum
  aggregates; candidate pairs via banding the signature (pigeonhole:
  with ``bands > max_hamming`` at least one band is untouched, so every
  pair within the hamming budget collides somewhere — the default
  48-bit/4-band setup guarantees recall for hamming <= 3).
- **n-gram Jaccard**: exact pairwise Jaccard, *blocked* by joining on
  shared shingles with a document-frequency cap (``max_df``) so hot
  shingles never fan out quadratically. Used to verify the sketches on
  candidate sets, not to scan the corpus.

All hashing is :func:`datajudge_spark.pipeline.text.md5_long` — portable
to the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datajudge_spark.pipeline._util import (
    in_literal_list,
    iter_checkpoint,
    materialize_once,
    spread,
)
from datajudge_spark.pipeline.text import md5_long, tokens, word_shingles

__all__ = [
    "normalized_fingerprint",
    "exact_duplicate_groups",
    "minhash_signature",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_candidate_pairs",
    "jaccard_pairs",
    "containment_pairs",
    "duplicate_clusters",
    "query_neardup_recall",
]


def normalized_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) where fingerprint = md5 of lowercased,
    whitespace-collapsed text."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(id_col, F.md5(normalized).alias("fingerprint"))


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fingerprint groups with more than one member (single shuffle)."""
    return (
        normalized_fingerprint(df, id_col, text_col)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def _distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, s): the distinct word-shingle set of each document.

    ``array_distinct`` runs per-row before the explode, so the shuffle
    carries no within-document duplicates.
    """
    df = spread(df)
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("s"),
    )


#: Width of the two MinHash base hashes: 52 bits leaves room for
#: h1 + k*h2 (k < 2048) inside a signed int64.
MINHASH_HEX = 13
MINHASH_MASK = (1 << (MINHASH_HEX * 4)) - 1


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature.

    The k permutations are Kirsch-Mitzenmacher double hashes
    ``h_k = (h1 + k*h2) mod 2^52`` over TWO md5 base hashes per shingle —
    k-independent hashing cost. One explode + one groupBy with
    ``num_hashes`` ``min`` aggregates: Spark's partial aggregation
    computes per-partition minima map-side, so the shuffle volume is
    O(docs * k), independent of document length.
    """
    sh = _distinct_shingles(df, id_col, text_col, shingle_n).select(
        "_id",
        md5_long("s", salt="a", nhex=MINHASH_HEX).alias("b1"),
        md5_long("s", salt="b", nhex=MINHASH_HEX).alias("b2"),
    )
    # each permutation min as ONE parsed SQL string (the Column-API
    # build cost ~15 py4j round-trips per hash of driver time; the
    # expression -- and thus every value -- is identical)
    aggs = [
        F.expr(f"min((b1 + {k} * b2) & {MINHASH_MASK})").alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy("_id").agg(*aggs).withColumnRenamed("_id", id_col)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str,
    bands: int = 4,
    rows: int = 3,
    max_bucket: int = 4096,
) -> DataFrame:
    """Distinct candidate pairs (d1 < d2) colliding in >= 1 LSH band.

    Each band signature is the md5 of the comma-joined band hashes; the
    bucket join shuffles on (band, sig) — tiny keys, and Catalyst/AQE
    handles any hot bucket with skew-join splitting.

    AQE splits the SHUFFLE of a hot bucket but not the B^2 pair rows it
    emits, and all-identical boilerplate documents (cookie banners,
    license headers) are routine in web corpora — so buckets larger than
    ``max_bucket`` members switch from all-pairs to a STAR: every member
    pairs with the bucket's minimum id (O(B) rows).  Connectivity for
    downstream clustering (:func:`cluster_pairs`) is preserved — all
    members still join one component — only the exact pairwise candidate
    list inside the degenerate bucket is thinned.
    """
    # the band signatures as ONE parsed SQL string (identical md5 over
    # the comma-joined casts; the Column build cost ~10 round-trips per
    # band across four dedup call sites)
    band_structs_sql = ", ".join(
        "named_struct('band', {b}, 'sig', md5(concat_ws(',', {parts})))".format(
            b=b,
            parts=", ".join(
                f"CAST(h{b * rows + r} AS STRING)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    # the signature aggregation is expensive; materialize once so the
    # self-join's two branches don't recompute it.  Bucket size / min
    # member ride along via one window pass on the SAME (band, sig) key
    # the join shuffles on — no extra shuffle.
    w = Window.partitionBy("band", "sig").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    buckets = materialize_once(
        sig.select(
            F.col(id_col).alias("_id"),
            F.expr(f"explode(array({band_structs_sql}))").alias("bk"),
        )
        .select("_id", "bk.band", "bk.sig")
        .select(
            "_id",
            "band",
            "sig",
            F.count(F.lit(1)).over(w).alias("_n"),
            F.min("_id").over(w).alias("_m"),
        )
    )
    a, b_ = buckets.alias("a"), buckets.alias("b")
    all_pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .where(F.col("a._n") <= max_bucket)
        .select(F.col("a._id").alias("d1"), F.col("b._id").alias("d2"))
    )
    star_pairs = buckets.where(
        (F.col("_n") > max_bucket) & (F.col("_id") != F.col("_m"))
    ).select(F.col("_m").alias("d1"), F.col("_id").alias("d2"))
    return all_pairs.unionByName(star_pairs).distinct()


def minhash_jaccard_estimate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    shingle_n: int = 3,
    bands: int = 4,
    rows: int = 3,
    max_bucket: int = 4096,
) -> DataFrame:
    """Sketch-vs-exact contract for MinHash: per LSH candidate pair,
    ``(d1, d2, est, exact, abs_err)`` — the signature-agreement
    estimate ``|{k: h_k(A)=h_k(B)}| / k`` next to the true shingle-set
    Jaccard.

    This measures the sketch the dedup pipeline actually trusts
    (:func:`minhash_signature` + :func:`lsh_candidate_pairs`) instead of
    assuming its ±1/sqrt(k) error — same instinct as the ANN
    ``recall_at_k`` harness.  The exact side runs ONLY on the candidate
    pairs (blocked by the banding, never all pairs): intersections come
    from one equi-join of the two documents' distinct shingle-hash
    sets, sizes ride a groupBy of the same persisted frame.  Every hash
    is md5-derived, so both columns — and the error itself — are
    deterministic and oracle-reproducible.
    """
    # ONE shingle pass feeds BOTH branches (same fix as
    # query_neardup_recall): the truth hash (h) and the two MinHash base
    # hashes (b1, b2) are computed in the same select and cached
    # together, so the corpus text is normalized/shingled/exploded once
    # instead of once per branch.  All three hashes are the identical
    # md5 constructions the separate passes used, so every downstream
    # value is unchanged.
    sh_all = materialize_once(
        _distinct_shingles(df, id_col, text_col, shingle_n).select(
            "_id",
            md5_long("s").alias("h"),
            md5_long("s", salt="a", nhex=MINHASH_HEX).alias("b1"),
            md5_long("s", salt="b", nhex=MINHASH_HEX).alias("b2"),
        )
    )
    sig_aggs = [
        F.expr(f"min((b1 + {k} * b2) & {MINHASH_MASK})").alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = materialize_once(
        sh_all.groupBy("_id").agg(*sig_aggs).withColumnRenamed("_id", id_col)
    )
    cand = lsh_candidate_pairs(
        sig, id_col, bands=bands, rows=rows, max_bucket=max_bucket
    )
    sa = sig.select(
        F.col(id_col).alias("__i1"),
        *[F.col(f"h{k}").alias(f"__a{k}") for k in range(num_hashes)],
    )
    sb = sig.select(
        F.col(id_col).alias("__i2"),
        *[F.col(f"h{k}").alias(f"__b{k}") for k in range(num_hashes)],
    )
    # the k-way agreement sum as ONE parsed SQL string (identical CASE
    # chain; the Column build paid ~20 py4j round-trips per hash)
    match_cnt = F.expr(
        " + ".join(
            f"(CASE WHEN __a{k} = __b{k} THEN 1 ELSE 0 END)"
            for k in range(num_hashes)
        )
    )
    est = (
        cand.join(sa, F.col("d1") == F.col("__i1"))
        .join(sb, F.col("d2") == F.col("__i2"))
        .select(
            "d1",
            "d2",
            (match_cnt.cast("double") / F.lit(num_hashes)).alias("__est"),
        )
    )
    # the truth-hash set rides the shared pass; .distinct() keeps the
    # original per-document hash-set semantics (md5 collisions within a
    # document collapse, exactly as the separate pass collapsed them)
    sh = sh_all.select("_id", "h").distinct()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("__sz"))
    x = sh.select(F.col("_id").alias("__x"), F.col("h").alias("__hx"))
    y = sh.select(F.col("_id").alias("__y"), F.col("h").alias("__hy"))
    inter = (
        cand.join(x, F.col("d1") == F.col("__x"))
        .join(
            y,
            (F.col("d2") == F.col("__y")) & (F.col("__hy") == F.col("__hx")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    s1 = sizes.select(F.col("_id").alias("__s1id"), F.col("__sz").alias("__sz1"))
    s2 = sizes.select(F.col("_id").alias("__s2id"), F.col("__sz").alias("__sz2"))
    exact = (
        F.coalesce(F.col("__i"), F.lit(0)).cast("double")
        / (
            F.col("__sz1") + F.col("__sz2")
            - F.coalesce(F.col("__i"), F.lit(0))
        ).cast("double")
    )
    return (
        est.join(inter, ["d1", "d2"], "left")
        .join(s1, F.col("d1") == F.col("__s1id"))
        .join(s2, F.col("d2") == F.col("__s2id"))
        .select(
            "d1",
            "d2",
            F.round("__est", 6).alias("est"),
            F.round(exact, 6).alias("exact"),
            F.round(F.abs(F.col("__est") - exact), 6).alias("abs_err"),
        )
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 48
) -> DataFrame:
    """(id, simhash): Charikar's SimHash over whitespace tokens.

    Tokens keep their multiplicity (term frequency is the weight). The
    per-bit votes are **packed**: three 21-bit one-counters per int64, so
    48 bit positions need 16 ``sum`` aggregates instead of 48 — one
    groupBy, no bit-explode, map-side combine applies. A bit of the
    final signature is set iff strictly more than half the tokens have
    that hash bit set (``2*ones > n`` ≡ the signed vote sum being > 0).
    Counter width bounds documents at 2^21 tokens (~10 MB of text);
    beyond that, raise the width / lower the packing factor.
    """
    per_long = 3  # counters per int64, 21 bits each
    shift_w = 21
    mask = (1 << shift_w) - 1
    tok = spread(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("tk")
    ).select("_id", md5_long("tk").alias("h"))
    n_longs = (bits + per_long - 1) // per_long
    packed = []
    for g in range(n_longs):
        terms = []
        for j in range(per_long):
            b = g * per_long + j
            if b >= bits:
                break
            terms.append(f"(shiftleft(shiftright(h, {b}) & 1, {j * shift_w}))")
        packed.append(F.sum(F.expr(" + ".join(terms))).alias(f"p{g}"))
    sums = tok.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"), *packed
    )
    # the 48 per-bit majority votes as ONE SQL fold over the packed
    # counters (runs on |docs| rows only).  The unrolled Column-API loop
    # built the same tree through ~600 py4j round-trips per query build
    # (~0.3 ms each — pure driver time); the string parses JVM-side in
    # one call and the fold is bit-identical arithmetic.
    p_arr = ", ".join(f"p{g}" for g in range(n_longs))
    sim_sql = (
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, b) -> acc + IF("
        f"(shiftright(element_at(array({p_arr}), "
        f"CAST(b DIV {per_long} AS INT) + 1), "
        f"CAST((b % {per_long}) * {shift_w} AS INT)) & {mask}L) * 2 > _n, "
        f"shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))"
    )
    return sums.select(
        F.col("_id").alias(id_col), F.expr(sim_sql).alias("simhash")
    )


def simhash_candidate_pairs(
    sim: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 48,
    bands: int = 4,
    max_bucket: int = 4096,
) -> DataFrame:
    """(d1, d2, hamming) pairs sharing >= 1 simhash band with
    hamming(simhash) <= max_hamming.

    Pigeonhole guarantee: a pair within ``max_hamming`` is RECALLED iff
    ``bands > max_hamming`` (then at least one band is untouched and the
    two docs collide there). The default 48-bit/4-band/hamming<=3 setup
    has that guarantee with 12-bit bucket keys — wide enough that bucket
    fan-out stays sub-quadratic on real corpora. The hamming check
    itself is JVM-side ``bit_count(xor)``.

    Buckets larger than ``max_bucket`` switch from all-pairs to a STAR
    against the bucket's minimum id (same hot-bucket bound as
    :func:`lsh_candidate_pairs`): O(B) rows instead of B^2.  Star pairs
    still pass through the hamming filter — the output contract is
    "every emitted pair is within ``max_hamming``", unlike the LSH
    variant whose star edges are unfiltered candidates.  The trade-off:
    in a hot bucket, connectivity is preserved ONLY among members within
    ``max_hamming`` of the bucket's min-id member; two members close to
    each other but both far from the min-id member lose their edge (and,
    for downstream clustering, their connectivity).  A degenerate bucket
    of near-identical docs keeps its cluster; a hot bucket of merely
    band-colliding heterogeneous docs is intentionally thinned.  If
    hot-bucket connectivity matters more than the hamming contract,
    cluster over :func:`lsh_candidate_pairs` instead.
    """
    if bits % bands:
        raise ValueError(f"bands ({bands}) must divide bits ({bits})")
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"shiftright(simhash, {b * width}) & {mask}").alias("key"),
        )
        for b in range(bands)
    ]
    # min(struct(_id, simhash)) orders by _id first, so the window pass
    # carries the min member's signature along for the star's hamming —
    # one window on the join's own (band, key), no extra shuffle
    w = Window.partitionBy("band", "key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    buckets = materialize_once(
        sim.select(
            F.col(id_col).alias("_id"),
            F.col("simhash"),
            F.explode(F.array(*band_structs)).alias("bk"),
        )
        .select("_id", "simhash", "bk.band", "bk.key")
        .select(
            "_id",
            "simhash",
            "band",
            "key",
            F.count(F.lit(1)).over(w).alias("_n"),
            F.min(F.struct("_id", "simhash")).over(w).alias("_m"),
        )
    )
    a, b_ = buckets.alias("a"), buckets.alias("b")
    all_pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .where(F.col("a._n") <= max_bucket)
        .select(
            F.col("a._id").alias("d1"),
            F.col("b._id").alias("d2"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("bigint").alias("hamming"),
        )
    )
    star_pairs = buckets.where(
        (F.col("_n") > max_bucket) & (F.col("_id") != F.col("_m._id"))
    ).select(
        F.col("_m._id").alias("d1"),
        F.col("_id").alias("d2"),
        F.expr("bit_count(_m.simhash ^ simhash)").cast("bigint").alias("hamming"),
    )
    pairs = all_pairs.unionByName(star_pairs).distinct()
    return pairs.where(F.col("hamming") <= max_hamming)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_df: int = 100,
) -> DataFrame:
    """(d1, d2, jaccard) for pairs with shingle-set Jaccard >= threshold.

    Pairs are generated ONLY through shared shingles whose document
    frequency is <= ``max_df`` (both the pairing and the set sizes use the
    filtered shingle space, so the measure is self-consistent). The cap
    bounds the fan-out of the self-join to ``max_df^2`` per shingle —
    the difference between O(n·df) and O(n^2) at corpus scale.

    The cutoff is ABSOLUTE, so at growing corpus size it trades recall
    for the boundedness it promises: shingles whose df crosses the cap
    stop generating pairs entirely (measured on the sf3 shard —
    BASELINE.md round-10 section — where the candidate mass collapses
    rather than explodes).  Production guidance: scale ``max_df``
    roughly with the corpus (keeping max_df/N constant preserves which
    shingles block), or prefer the MinHash-LSH sweep
    (:func:`lsh_candidate_pairs`), whose banded collision probability
    is corpus-size-independent.

    Shingles are replaced by their 60-bit hashes before any shuffle:
    fixed-width join keys instead of ~n-word strings (collisions would
    merge shingles identically in any engine recomputing the same hash).
    """
    sh = materialize_once(
        _distinct_shingles(df, id_col, text_col, shingle_n).select(
            "_id", md5_long("s").alias("s")
        )
    )
    rare = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("s")
    )
    # shingling feeds four branches (df-count, both self-join sides, the
    # per-doc sizes); materialize the filtered shingle table once too
    sh = materialize_once(sh.join(rare, "s", "inner"))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("d1"), F.col("b._id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("_id").alias("d2"), F.col("n").alias("n2"))
    j = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", F.round(j, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int = 100,
) -> DataFrame:
    """(d1, d2, c1, c2) for pairs where either directional containment
    ``c1 = |A∩B|/|A|`` or ``c2 = |A∩B|/|B|`` reaches ``threshold``.

    The dedup signal Jaccard misses: a short document embedded verbatim
    inside a much longer one (boilerplate wrapping, quote-inflation,
    article + comments) has near-1 containment of the short side but a
    tiny Jaccard — union-normalized measures dilute subset duplication
    by the superset's size.  Same rare-shingle blocking and plan shape
    as :func:`jaccard_pairs` (hash-keyed equi-join through <= ``max_df``
    shingles, never a global self-join); one extra double division.
    """
    sh = materialize_once(
        _distinct_shingles(df, id_col, text_col, shingle_n).select(
            "_id", md5_long("s").alias("s")
        )
    )
    rare = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("s")
    )
    sh = materialize_once(sh.join(rare, "s", "inner"))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("d1"), F.col("b._id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("_id").alias("d2"), F.col("n").alias("n2"))
    c1 = F.round(F.col("inter") / F.col("n1"), 6)
    c2 = F.round(F.col("inter") / F.col("n2"), 6)
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", c1.alias("c1"), c2.alias("c2"))
        .where(
            (F.col("c1") >= threshold) | (F.col("c2") >= threshold)
        )
    )


def duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 15,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over candidate pairs: (doc_id, cluster_id)
    where cluster_id = smallest doc id reachable through the pair graph.

    **Adaptive strategy** (same spirit as broadcast-join selection): the
    candidate graph after LSH blocking is normally tiny relative to the
    corpus — near-dup pairs only. The pairs input is materialized once;
    if it has <= ``local_threshold`` edges, connected components run as
    driver-side union-find (microseconds, zero extra jobs). Above the
    threshold, iterative distributed min-label propagation with pointer
    doubling: each round every node adopts the minimum label among
    itself, its neighbors, and its label's label — so label chains halve
    per round and convergence is O(log component diameter). Each round
    is one join + one groupBy + one shortcut join, checkpointed via
    ``_util.iter_checkpoint``: iterative DataFrame algorithms MUST
    truncate lineage each round or the nested logical plan grows
    exponentially (persist alone caches data, not the plan). By default
    that is ``localCheckpoint`` — executor-local blocks, so an executor
    loss mid-loop fails the job and it must be rerun, acceptable when
    per-round state is cheap. Clusters that can't accept that call
    ``spark.sparkContext.setCheckpointDir(...)`` once, and every round
    switches to reliable (HDFS/object-store) ``checkpoint()`` that
    survives executor loss. Only docs that
    appear in some pair are returned (singletons are their own cluster
    by definition).

    This is the post-LSH step of a dedup pipeline: pick
    ``min(cluster)`` (or any deterministic representative) to keep and
    drop the rest.
    """
    edges_df = materialize_once(pairs.select("d1", "d2"))
    n_edges = edges_df.count()
    if n_edges <= local_threshold:
        return _clusters_unionfind(edges_df)
    return _clusters_propagate(edges_df, max_iterations)


def _clusters_unionfind(edges_df: DataFrame) -> DataFrame:
    """Driver-side union-find over a materialized (small) edge list."""
    id_type = edges_df.schema["d1"].dataType.simpleString()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # one collect job, not toLocalIterator: the iterator launches a job
    # PER PARTITION (~seconds of scheduler latency for a handful of
    # edges on 32 partitions), while the edge list is already bounded by
    # local_threshold (2M × two int64s ≈ 32 MB of data — fine to hold)
    for row in edges_df.collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller: every root stays
            # the minimum of its component
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(x, find(x)) for x in parent]
    return edges_df.sparkSession.createDataFrame(
        rows, f"doc_id {id_type}, cluster_id {id_type}"
    )


def _clusters_propagate(edges_df: DataFrame, max_iterations: int) -> DataFrame:
    """Distributed min-label propagation (the > threshold path)."""
    # symmetrize in ONE pass over the (possibly expensive) pairs input:
    # explode both orientations per edge instead of a self-union that
    # would evaluate `pairs` twice
    sym = edges_df.select(
        F.explode(
            F.array(
                F.struct(F.col("d1"), F.col("d2")),
                F.struct(F.col("d2").alias("d1"), F.col("d1").alias("d2")),
            )
        ).alias("e")
    ).select("e.d1", "e.d2")
    sym = iter_checkpoint(sym)
    labels = (
        sym.select(F.col("d1").alias("id")).distinct().withColumn(
            "label", F.col("id")
        )
    )
    labels = iter_checkpoint(labels)
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.d2 == labels.id)
            .groupBy("d1")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.d1, "left"
        ).select(
            "id",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        # pointer doubling: also adopt the label OF my label
        # (label <- min(label, label[label])), so label chains halve each
        # round and convergence is O(log diameter) instead of O(diameter)
        # — a chain-shaped near-dup cluster (progressively edited docs)
        # would otherwise need diameter rounds.
        lab_of_lab = stepped.select(
            F.col("id").alias("lid"), F.col("label").alias("llabel")
        )
        # carry the old label through the checkpoint so convergence is a
        # shuffle-free scan of the checkpointed frame, not an extra join
        new_labels = (
            stepped.join(lab_of_lab, stepped.label == lab_of_lab.lid, "left")
            .select(
                "id",
                "old_label",
                F.least(F.col("label"), F.coalesce("llabel", "label")).alias(
                    "label"
                ),
            )
        )
        new_labels = iter_checkpoint(new_labels)
        changed = (
            new_labels.where(F.col("label") != F.col("old_label")).limit(1).count()
        )
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iterations} rounds; "
            "raise max_iterations for very deep duplicate chains"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 5,
    prefix_chars: int = 16,
    compare_chars: int = 256,
) -> DataFrame:
    """Near-duplicate pairs by (prefix) Levenshtein distance.

    The edit-distance modality complements the others: MinHash/Jaccard
    and SimHash are token-order-insensitive, while edit distance catches
    small in-place edits (typo fixes, appended suffixes) that reorder
    nothing.  Returns ``(d1, d2, distance)`` with ``d1 < d2`` and
    ``distance <= max_distance``.

    Scale design: pairwise Levenshtein over a corpus is quadratic, so
    candidates are BLOCKED on an exact ``prefix_chars``-character prefix
    match (an equi-join — hash-partitioned, never a cross product) plus
    a length-difference filter (|len1-len2| <= max_distance is a hard
    lower bound on edit distance).  Only the first ``compare_chars``
    characters and the length shuffle — never full documents — and the
    distance computed is the *prefix* edit distance over that window
    (documented approximation; raise ``compare_chars`` for exactness on
    longer docs at proportional O(compare_chars^2)-per-pair cost).
    Prefix blocking targets suffix/in-place edits by construction; docs
    whose edits touch the first ``prefix_chars`` characters are MinHash's
    job, not this pass's.
    """
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.substring(text_col, 1, compare_chars).alias("__cmp"),
        F.length(text_col).alias("__len"),
        F.substring(text_col, 1, prefix_chars).alias("__pfx"),
    )
    a, b = t.alias("a"), t.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__pfx") == F.col("b.__pfx"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.__len") - F.col("b.__len")) <= max_distance),
    )
    d = F.levenshtein(F.col("a.__cmp"), F.col("b.__cmp"))
    return (
        pairs.select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            d.alias("distance"),
        )
        .where(F.col("distance") <= max_distance)
    )


def cluster_representatives(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    order_cols=None,
) -> DataFrame:
    """Pick ONE canonical document per duplicate cluster — the
    keep/drop decision that turns cluster assignments into an actual
    deduplicated corpus.

    ``order_cols`` is the keep-preference total order within a cluster
    (default: longest document wins, smallest id as the deterministic
    tiebreak). Returns the kept (cluster_col, id_col, ...) rows.

    Plan: equi-join clusters to docs on the id (clusters is the tiny
    post-LSH set — broadcastable; Catalyst/AQE picks), then the same
    partial ``WindowGroupLimit`` top-1-per-key plan as CDC log
    compaction (operators.olap.latest_snapshot) — the shuffle carries
    O(|clustered docs|) rows, never the corpus.
    """
    from ..operators.olap import latest_snapshot

    if order_cols is None:
        order_cols = [F.col("n_chars").desc(), F.col(id_col).asc()]
    joined = clusters.join(docs, id_col)
    return latest_snapshot(joined, [cluster_col], order_cols)


def chunk_duplicate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Sub-document (chunk-level) duplication: per document, how many of
    its ``chunk_tokens``-token chunks also appear elsewhere in the
    corpus — the boilerplate/template signal that document-level dedup
    misses entirely.

    Returns ``(id_col, n_chunks, n_dup_chunks)`` where a chunk is "dup"
    if its 60-bit content hash occurs more than once corpus-wide.

    Plan: map-only chunking (text.chunk_documents), then ONLY 60-bit
    hashes shuffle — one groupBy for corpus-wide chunk frequencies, one
    hash equi-join back, one per-doc aggregate. Chunk text never leaves
    the scan stage, so shuffle volume is ~16 bytes/chunk regardless of
    document size.
    """
    from .text import chunk_documents, md5_long

    chunks = chunk_documents(df, id_col, text_col, chunk_tokens)
    hashed = chunks.select(id_col, md5_long(F.col("chunk_text")).alias("h"))
    freq = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("freq"))
    return (
        hashed.join(freq, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("freq") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): one ``(id, fp)`` row per
    distinct selected fingerprint.

    Per document: hash every word ``k``-gram (the engine-portable
    60-bit md5 fold), slide a window of ``w`` consecutive hashes, keep
    each window's MINIMUM.  The selection guarantee — any shared
    passage of at least ``w + k - 1`` words yields at least one shared
    fingerprint — is what MinHash does NOT give (MinHash bounds
    whole-document similarity; winnowing finds local plagiarism-style
    overlaps of bounded length).  Documents shorter than one window
    keep their global minimum, so nothing silently drops.

    Plan: entirely per-row array expressions (``transform`` over the
    shingle array, ``transform(sequence)`` + ``array_min(slice)`` for
    the windows — all JVM higher-order functions, no Python, no
    shuffle); the only shuffle is the final per-document DISTINCT on
    selected fingerprints.  O(n·w) work per document, linear in the
    corpus.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be positive")

    # the k-gram hash array MATERIALIZES as a named column first: the
    # window stage references it many times (size + w cells per
    # window), and an unaliased expression re-evaluates the entire
    # shingle+md5 derivation PER REFERENCE (CollapseProject keeps a
    # multi-referenced non-cheap alias as its own projection — that
    # barrier is the optimization).  spread() BEFORE the shingle+md5
    # derivation: a small corpus scans as one partition, which would
    # serialize the O(words) hashing on a single core; only (id, text)
    # cross the spread shuffle.
    staged = spread(
        df.where(F.col(text_col).isNotNull()).select(id_col, text_col)
    ).select(
        F.col(id_col).alias("_id"),
        F.transform(
            word_shingles(F.col(text_col), k), lambda s: md5_long(s)
        ).alias("__hs"),
    )
    hashes = F.col("__hs")
    n = F.size(hashes)

    # window minimum as least(element_at...) over the w offsets, NOT
    # array_min(slice(...)): slice allocates a fresh w-array per window
    # (O(n·w) allocations per document), while element_at is an O(1)
    # read into the one materialized hash array.  Identical values.
    def _win_min(i):
        cells = [F.element_at(hashes, i + j) for j in range(w)]
        return cells[0] if w == 1 else F.least(*cells)

    wins = (
        F.when(
            n >= w,
            F.transform(F.sequence(F.lit(1), n - F.lit(w - 1)), _win_min),
        )
        .when(n >= 1, F.array(F.array_min(hashes)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return staged.select(
        F.col("_id").alias(id_col),
        F.explode(F.array_distinct(wins)).alias("fp"),
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
    max_bucket: int = 4096,
) -> DataFrame:
    """Candidate near-duplicate pairs ``(d1, d2, n_shared)`` — documents
    sharing >= 1 winnowing fingerprint, with the count of shared
    fingerprints (the MOSS ranking signal).

    Same hot-bucket discipline as :func:`lsh_candidate_pairs`: a
    fingerprint held by more than ``max_bucket`` documents (boilerplate
    passages — cookie banners, license headers) switches from all-pairs
    to a star against the minimum id (``n_shared`` NULL on those
    connectivity rows), so no fingerprint can explode the pair space.
    The join shuffles on the 60-bit fingerprint only — never text.
    """
    fps = materialize_once(
        winnowing_fingerprints(df, id_col, text_col, k, w).select(
            F.col(id_col).alias("_id"), "fp"
        )
    )
    wb = Window.partitionBy("fp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    buckets = materialize_once(
        fps.select(
            "_id",
            "fp",
            F.count(F.lit(1)).over(wb).alias("_n"),
            F.min("_id").over(wb).alias("_m"),
        )
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .where(F.col("a._n") <= max_bucket)
        .groupBy(
            F.col("a._id").alias("d1"), F.col("b._id").alias("d2")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    star = (
        buckets.where(
            (F.col("_n") > max_bucket) & (F.col("_id") != F.col("_m"))
        )
        .select(
            F.col("_m").alias("d1"),
            F.col("_id").alias("d2"),
            F.lit(None).cast("bigint").alias("n_shared"),
        )
        .distinct()
    )
    # one row per pair: a pair sharing both a counted fingerprint and a
    # hot one (where d1 is the bucket minimum) appears in BOTH branches;
    # max() keeps the counted row (max(n, NULL) = n) and leaves the
    # star-only connectivity rows NULL
    return (
        shared.unionByName(star)
        .groupBy("d1", "d2")
        .agg(F.max("n_shared").alias("n_shared"))
    )


def query_neardup_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_ids: list,
    num_hashes: int = 12,
    shingle_n: int = 3,
    bands: int = 4,
    rows: int = 3,
    min_est: float = 0.0,
    _sig: DataFrame | None = None,
) -> DataFrame:
    """Targeted near-duplicate LOOKUP: which corpus documents collide
    with a given (small) query set in >= 1 MinHash LSH band, and what
    is the signature-agreement Jaccard estimate?  One row per
    ``(query_id, candidate_id, est)`` with ``est >= min_est``,
    candidate != query.

    This is the decontamination / takedown primitive ("find everything
    near THESE documents") as opposed to the all-pairs dedup sweep
    (:func:`lsh_candidate_pairs`): the query side is tiny by
    definition, so its band signatures and full signatures BROADCAST —
    the corpus side stays map-only (shingle -> signature -> band) with
    no self-join and no corpus shuffle beyond the signature groupBy.
    At 100 TB the plan is: one corpus signature pass (shuffle O(docs ·
    k), same as the dedup sweep), then broadcast-hash joins only.

    Every hash is the same md5-derived construction as
    :func:`minhash_signature`, so results are deterministic and
    oracle-reproducible.
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    # _sig: a caller that has ALREADY materialized the identical
    # signature frame (the recall gate shares one shingle pass between
    # its truth and lookup branches) passes it here; values are
    # construction-identical either way.
    sig = _sig if _sig is not None else materialize_once(
        minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    )
    band_structs = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows + r}").cast("string") for r in range(rows)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *parts)).alias("sig"),
            )
        )
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select("_id", "bk.band", "bk.sig")
    is_query = in_literal_list("_id", query_ids)
    qb = banded.where(is_query).select(
        F.col("_id").alias("__q"), "band", "sig"
    )
    cand = (
        banded.join(F.broadcast(qb), ["band", "sig"])
        .where(F.col("_id") != F.col("__q"))
        .select(F.col("__q").alias("query_id"), F.col("_id").alias("candidate_id"))
        .distinct()
    )
    qs = sig.where(in_literal_list(id_col, query_ids)).select(
        F.col(id_col).alias("__qi"),
        *[F.col(f"h{k}").alias(f"__a{k}") for k in range(num_hashes)],
    )
    cs = sig.select(
        F.col(id_col).alias("__ci"),
        *[F.col(f"h{k}").alias(f"__b{k}") for k in range(num_hashes)],
    )
    # the k-way agreement sum as ONE parsed SQL string (identical CASE
    # chain; the Column build paid ~20 py4j round-trips per hash)
    match_cnt = F.expr(
        " + ".join(
            f"(CASE WHEN __a{k} = __b{k} THEN 1 ELSE 0 END)"
            for k in range(num_hashes)
        )
    )
    est = match_cnt.cast("double") / F.lit(num_hashes)
    return (
        cand.join(F.broadcast(qs), F.col("query_id") == F.col("__qi"))
        .join(cs, F.col("candidate_id") == F.col("__ci"))
        .select(
            "query_id",
            "candidate_id",
            F.round(est, 6).alias("est"),
        )
        .where(F.col("est") >= F.lit(float(min_est)))
    )


def query_neardup_recall(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_ids: list,
    threshold: float = 0.5,
    num_hashes: int = 12,
    shingle_n: int = 3,
    bands: int = 4,
    rows: int = 3,
) -> DataFrame:
    """Recall gate for :func:`query_neardup_candidates` against
    brute-force truth: one row per query id ``(query_id, n_true,
    n_hits, recall)`` where truth = corpus documents (candidate !=
    query) whose EXACT shingle-set Jaccard with the query is >=
    ``threshold``, and hits = true pairs the banded LSH lookup
    surfaces.  The eval harness the decontamination/takedown primitive
    needs before being trusted — the near-dup sibling of
    :func:`datajudge_spark.pipeline.similarity.recall_at_k`.

    Scale: the query side is tiny by definition, so its shingle set
    broadcasts; the exact-truth intersection is one bounded-fanout
    shuffle (<= |queries| x matched docs, map-side combined).  The
    corpus-size join is pre-thinned by the necessary condition
    ``intersection >= threshold * |query shingles|`` (J >= t and
    n >= i imply i >= t*n_q), applied against the broadcast query
    sizes BEFORE any corpus-scale join.  Queries with no true
    near-dup are emitted with ``n_true = 0`` and NULL recall.

    Truth uses the full (unblocked) shingle space — exact by the
    J > 0 => shared-shingle argument; this is an EVAL operator run on
    a bounded query sample, not an all-pairs sweep.
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be within (0, 1]")
    # ONE shingle pass feeds BOTH branches: the truth hash (s) and the
    # two MinHash base hashes (b1, b2) are computed in the same select
    # and cached together, so the corpus text is normalized/shingled/
    # exploded once instead of once per branch (the lookup previously
    # re-ran the whole chain inside query_neardup_candidates).
    sh_all = materialize_once(
        _distinct_shingles(df, id_col, text_col, shingle_n).select(
            "_id",
            md5_long("s").alias("s"),
            md5_long("s", salt="a", nhex=MINHASH_HEX).alias("b1"),
            md5_long("s", salt="b", nhex=MINHASH_HEX).alias("b2"),
        )
    )
    sh = sh_all.select("_id", "s")
    # one parsed SQL string per permutation min (see minhash_signature)
    sig_aggs = [
        F.expr(f"min((b1 + {k} * b2) & {MINHASH_MASK})").alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = materialize_once(
        sh_all.groupBy("_id").agg(*sig_aggs).withColumnRenamed("_id", id_col)
    )
    is_query = in_literal_list("_id", query_ids)
    qsh = sh.where(is_query).select(F.col("_id").alias("__q"), "s")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("__n"))
    qsizes = sizes.where(is_query).select(
        F.col("_id").alias("__q"), F.col("__n").alias("__nq")
    )
    inter = (
        sh.join(F.broadcast(qsh), "s")
        .where(F.col("_id") != F.col("__q"))
        .groupBy("__q", "_id")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    jac = F.col("__i") / (F.col("__nq") + F.col("__n") - F.col("__i"))
    truth = (
        inter.join(F.broadcast(qsizes), "__q")
        # necessary condition i >= t*n_q thins the corpus-size join
        .where(
            F.col("__i").cast("double")
            >= F.lit(float(threshold)) * F.col("__nq").cast("double")
        )
        .join(sizes, "_id")
        .where(jac >= F.lit(float(threshold)))
        .select("__q", F.col("_id").alias("__c"))
    )
    cand = query_neardup_candidates(
        df,
        id_col,
        text_col,
        query_ids,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        bands=bands,
        rows=rows,
        min_est=0.0,
        _sig=sig,
    ).select(
        F.col("query_id").alias("__q"), F.col("candidate_id").alias("__c")
    )
    # n_true and n_hits in ONE pass over the (tiny) truth frame: a left
    # join against the candidate pairs marks the hits, and one groupBy
    # counts both (count(__hit) counts non-nulls — identical values to
    # the former separate count + inner-join-count pair of jobs).
    stats = (
        truth.join(
            cand.withColumn("__hit", F.lit(1)), ["__q", "__c"], "left"
        )
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("__t"),
            F.count("__hit").alias("__h"),
        )
    )
    # Spine from the query_ids LITERAL, not from df: a query id absent
    # from the corpus must still emit a row (n_true = 0, NULL recall)
    # so the gate's "recall over N query documents" count is honest and
    # a typo'd id list is visible rather than silently dropped
    # (ADVICE r10).
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    queries = df.sparkSession.createDataFrame(
        [(q,) for q in dict.fromkeys(query_ids)],
        schema=T.StructType([T.StructField("__q", id_type)]),
    )
    t_col = F.coalesce(F.col("__t"), F.lit(0))
    h_col = F.coalesce(F.col("__h"), F.lit(0))
    return (
        queries.join(F.broadcast(stats), "__q", "left")
        .select(
            F.col("__q").alias("query_id"),
            t_col.cast("bigint").alias("n_true"),
            h_col.cast("bigint").alias("n_hits"),
            F.round(
                F.when(
                    t_col > 0, h_col.cast("double") / t_col.cast("double")
                ),
                6,
            ).alias("recall"),
        )
    )
