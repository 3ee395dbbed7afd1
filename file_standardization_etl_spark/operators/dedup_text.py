"""Document deduplication operators, all pure Catalyst column expressions
(no Python on the hot path) and all portable to the DuckDB oracle.

Portability trick used throughout: MinHash/SimHash need a keyed uniform
hash with a total order. ``md5(salt || value)`` hex strings compared
lexicographically are exactly that and exist identically in Spark and
DuckDB — so signatures computed by both engines match byte-for-byte
(xxhash64 would be Spark-only).

Scale notes per operator:

- exact: one hash-groupBy — map-side combine, no skew concern.
- MinHash-LSH: per-doc signature is embarrassingly parallel; the
  candidate join shuffles only (band, signature) pairs — O(docs × bands)
  narrow rows, not O(docs²). Band count / shingle width tune
  recall/precision like any LSH.
- SimHash: per-doc only; pairing joins on the 16-bit bucket.
- n-gram Jaccard: exact verify restricted to LSH candidates — never
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORDS = "split(text, ' ')"


def with_words(docs: DataFrame) -> DataFrame:
    return docs.withColumn("w", F.expr(WORDS))


def exact_dup_groups(docs: DataFrame, key_words: int = 5) -> DataFrame:
    """Exact dedup via content-hash groupBy (first-k-words fingerprint so
    near-identical prefixes group; k=full length → strict exact dedup)."""
    key = F.md5(F.array_join(F.slice(F.expr(WORDS), 1, key_words), " "))
    return (
        docs.select(key.alias("dup_key"), "doc_id")
        .groupBy("dup_key")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc"))
        .filter(F.col("n_docs") > 1)
    )


def shingles_expr(n: int = 3) -> str:
    """k-word shingles as a SQL expression over column ``w`` (1-based
    element_at — portable to DuckDB's 1-based lists)."""
    parts = ", ".join(f"element_at(w, i + {k})" for k in range(n))
    return f"transform(sequence(1, greatest(size(w) - {n - 1}, 1)), i -> concat_ws(' ', {parts}))"


def minhash_band_signatures(docs: DataFrame, n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """(doc_id, band, sig): per-band MinHash signature.

    ONE md5 per shingle; band ``b``'s 32-bit hash is hex slice
    ``[8b+1, 8b+8]`` of that digest (md5's 128 bits = four independent
    32-bit hashes), so the signature pass costs a quarter of the
    per-band-salted formulation and the four band minima come out of a
    single shingle scan. Portable: DuckDB slices the same digest."""
    if not 1 <= n_bands <= 4:
        raise ValueError("md5 slicing supports 1..4 bands")
    d = with_words(docs).withColumn("sh", F.expr(shingles_expr(shingle_n)))
    h = d.select("doc_id", F.transform("sh", lambda s: F.md5(s)).alias("hs"))

    def hex_slice(b: int):
        # factory, NOT a `lambda x, b=b:` default-arg closure — a two-param
        # lambda is pyspark's (element, index) transform variant and would
        # silently bind b to the array index
        return lambda x: F.substring(x, 1 + 8 * b, 8)

    band_sigs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_min(F.transform("hs", hex_slice(b))).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        h.select("doc_id", F.explode(band_sigs).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    )


def minhash_lsh_candidates(
    docs: DataFrame, n_bands: int = 4, shingle_n: int = 3, max_bucket: int = 1024
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any band signature.

    Group-and-explode rather than a sig⋈sig self-join: a self-join would
    recompute every per-doc signature on both sides (the md5 pass is the
    expensive part), while grouping computes them once and explodes each
    bucket's doc list into pairs. Pair blowup per bucket is |bucket|² in
    both formulations; LSH bucket sizes are small by construction —
    EXCEPT for degenerate signatures (e.g. millions of near-empty docs
    sharing one min-hash), where a single bucket explodes to |bucket|²
    pairs. ``max_bucket`` caps that: over-cap buckets are dropped entirely
    (a bucket holding a measurable fraction of the corpus is a degenerate
    hash, not a dup cluster). The DuckDB oracle applies the identical cap.

    The cap is enforced BEFORE any doc list materializes (round-2 residual
    fixed): a window ``count`` over (band, sig) tags every signature row
    with its bucket size in O(1) buffer per row, the over-cap/singleton
    rows are filtered, and only then does ``collect_list`` build pair
    lists. The window shuffles by the same (band, sig) keys the
    aggregation needs, so Catalyst reuses the partitioning — one md5
    signature pass, one shuffle, and a 10⁹-doc degenerate bucket streams
    through a sort (spillable) instead of one aggregation buffer. The
    alternative (narrow count agg + anti-join) costs a second signature
    pass; this costs a per-partition sort of narrow rows — cheaper.
    """
    sigs = minhash_band_signatures(docs, n_bands, shingle_n)
    bucket_n = F.count(F.lit(1)).over(Window.partitionBy("band", "sig"))
    buckets = (
        sigs.withColumn("n", bucket_n)
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .groupBy("band", "sig")
        .agg(F.collect_list("doc_id").alias("ds"))
    )
    return (
        buckets.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.4, **lsh_kw) -> DataFrame:
    """Exact word-set Jaccard, verified only on LSH candidates.

    Jaccard = |∩| / |∪| of two exact integer set sizes — one IEEE
    division, bit-portable.
    """
    cands = minhash_lsh_candidates(docs, **lsh_kw)
    w = with_words(docs).select("doc_id", F.array_distinct("w").alias("ws"))
    j = (
        cands.join(w.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("ws", "wa"), "doc_a")
        .join(w.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("ws", "wb"), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("wa", "wb")))
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.size("wa") + F.size("wb") - F.col("n_inter")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per doc from word-level hashes.

    Bit b's contribution per word = parity of the first hex digit of
    md5(word ':' b) (instr into the hex alphabet — portable); bit set
    when positive contributions outnumber negative ones.
    """
    d = with_words(docs)
    bit_terms = []
    for b in range(16):
        # (#words with odd first-hex-digit parity) > n/2  ⇔  sum(±1) > 0
        cnt = (
            "size(filter(w, x -> "
            f"(instr('0123456789abcdef', substr(md5(concat(x, ':', '{b}')), 1, 1)) - 1) % 2 = 1))"
        )
        bit_terms.append(f"(CASE WHEN 2 * ({cnt}) > size(w) THEN {1 << b} ELSE 0 END)")
    return d.select("doc_id", F.expr(" + ".join(bit_terms)).cast("long").alias("simhash"))


def simhash_wide(docs: DataFrame, bits: int = 60) -> DataFrame:
    """Production-width SimHash from ONE md5 per word.

    The 16-bit variant pays one md5 per (word, bit); here md5's 128 bits
    are the per-word hash directly — bit ``b`` is bit ``3-(b%4)`` of hex
    digit ``b//4`` — so the md5 pass runs once per word regardless of
    signature width (the same single-digest trick as the MinHash band
    slicing). 60 bits (15 hex digits), not 64, so the signature stays in
    signed-BIGINT range for both engines' xor/bit_count. Portable: the
    DuckDB oracle extracts the identical digits.
    """
    if not 1 <= bits <= 60:
        raise ValueError("bits must be 1..60 (signed-bigint safe)")
    d = with_words(docs)
    terms = []
    for b in range(bits):
        dig = 1 + b // 4
        shift = 3 - (b % 4)
        cnt = (
            "size(filter(hs, h -> "
            f"((instr('0123456789abcdef', substring(h, {dig}, 1)) - 1) div {2 ** shift}) % 2 = 1))"
        )
        terms.append(f"(CASE WHEN 2 * ({cnt}) > size(hs) THEN {1 << b}L ELSE 0L END)")
    return d.select(
        "doc_id", F.transform("w", lambda x: F.md5(x)).alias("hs")
    ).select("doc_id", F.expr(" + ".join(terms)).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 16,
    signature=None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, band-rotated.

    Pigeonhole guarantee: two signatures within ``max_hamming`` bit flips
    must agree EXACTLY on at least one of ``n_bands`` disjoint bit bands
    whenever ``max_hamming < n_bands`` — so candidates are the union of
    per-band bucket joins (equi-joins, never all-pairs), deduplicated,
    then verified by exact popcount. With 16-bit signatures and 4 bands
    the recall is exact for hamming ≤ 3; precision comes from the verify.

    Scale: per-band bucket count is 2^(bits/n_bands); at 10⁹ docs you'd
    move to a 64-bit simhash with 4×16-bit bands (65 536 buckets/band) —
    identical plan shape, wider signature. The old high-byte single-band
    variant missed any pair whose differing bits straddled the byte.
    """
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole needs max_hamming < n_bands")
    if bits % n_bands:
        raise ValueError("bits must divide evenly into n_bands")
    band_bits = bits // n_bands
    s = (signature or simhash16)(docs)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    # the scalar signature rides along with the bucket rows, so the
    # verify needs no extra joins back into the md5-heavy simhash plan
    # (it is still evaluated once per self-join side — at 1x-per-side the
    # md5 pass is the floor for any self-join formulation short of an
    # explicit persist, which a library operator shouldn't impose)
    bk = s.select("doc_id", "simhash", F.explode(bands).alias("bb")).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )
    a, b = bk.alias("a"), bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
