"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (it has no dedup); these are the first-class
extensions a 100 TB transcript/document corpus needs.  Design rules:

* all hashing is *portable* (md5-derived 32-bit values) so results are
  engine-independent and oracle-checkable;
* signatures are computed with higher-order array functions entirely
  map-side -- zero shuffle until the candidate-pair join;
* candidate generation (LSH banding) shuffles only (band, signature,
  doc_id) tuples, never document text;
* exact dedup is a hash groupBy (partial agg absorbs duplicates map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE31 = 2147483647


def h32(c: Column) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5, as a long.
    Identical in DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def char_ngrams(c: Column, n: int = 3, distinct: bool = True) -> Column:
    """Character n-grams via sequence+substr (no UDF).  Short strings
    yield their whole prefix window (greatest(len-n+1, 1))."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )
    return F.array_distinct(grams) if distinct else grams


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(deduped, groups): keep the min-id doc per identical text.

    Grouping key is md5(text), not text itself, so the shuffle carries
    32-byte keys instead of documents.
    """
    keyed = df.withColumn("_h", F.md5(F.col(text_col)))
    groups = keyed.groupBy("_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(id_col).alias("keep_id"),
    )
    deduped = (
        keyed.join(groups.select("_h", "keep_id"), "_h")
        .filter(F.col(id_col) == F.col("keep_id"))
        .drop("_h", "keep_id")
    )
    return deduped, groups.withColumnRenamed("_h", "text_hash")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard within a blocking key.

    Blocking bounds the quadratic join; at scale pair this with
    ``minhash_lsh_pairs`` for candidate generation and use this operator
    only to *verify* candidates.
    """
    g = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")] ),
        char_ngrams(F.col(text_col), n).alias("grams"),
    )
    a = g.select(F.col("id").alias("id_a"), F.col("blk"), F.col("grams").alias("g_a"))
    b = g.select(F.col("id").alias("id_b"), F.col("blk"), F.col("grams").alias("g_b"))
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size(F.array_union("g_a", "g_b")).cast("double")
    jac = inter / union
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _hash_params(num_hashes: int) -> list[tuple[int, int]]:
    # deterministic odd multipliers / offsets; products stay < 2^40
    return [(2 * j + 3, 7919 * (j + 1)) for j in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 4,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures, fully map-side (higher-order functions, no
    explode/shuffle): hashes = h32 per distinct shingle, sig_j =
    min((a_j*h + b_j) mod M31)."""
    hashes = F.transform(char_ngrams(F.col(text_col), shingle_n), h32)

    # NB: plain single-parameter closures -- a lambda with default args
    # (lambda h, a=a: ...) is seen by PySpark as a 2/3-ary lambda and binds
    # the array *index* to the extra parameter (observed failure mode).
    def _perm(a: int, b: int):
        return lambda h: (h * a + b) % MERSENNE31

    sig_cols = [
        F.array_min(F.transform(F.col("_hashes"), _perm(a, b))).alias(f"mh_{j}")
        for j, (a, b) in enumerate(_hash_params(num_hashes))
    ]
    return df.select(F.col(id_col).alias("id"), hashes.alias("_hashes")).select(
        "id", *sig_cols
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 4,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on
    (band, band_signature).  Shuffle carries only (band, sig, id)."""
    sigs = minhash_signatures(
        df, id_col, text_col, shingle_n, bands * rows_per_band
    )
    band_sigs = F.array(
        *[
            F.concat_ws(
                "-",
                *[
                    F.col(f"mh_{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        "id", F.posexplode(band_sigs).alias("band", "band_sig")
    )
    a = buckets.select(F.col("id").alias("id_a"), "band", "band_sig")
    b = buckets.select(F.col("id").alias("id_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    token_pattern: str = r"([a-z0-9]+)",
) -> DataFrame:
    """SimHash over word tokens (term frequency preserved), map-side only:
    bit i is set iff the majority of token hashes have bit i set."""
    tokens = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(token_pattern), 1)
    hashed = df.select(
        F.col(id_col).alias("id"), F.transform(tokens, h32).alias("_hashes")
    ).withColumn("_n", F.size("_hashes"))
    def _bit_set(mask: int):
        # closure, NOT a default-arg lambda (see minhash note above)
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    sim = F.lit(0).cast("long")
    for i in range(bits):
        mask = 1 << i
        cnt = F.size(F.filter(F.col("_hashes"), _bit_set(mask)))
        sim = sim + F.when(cnt * 2 > F.col("_n"), F.lit(mask)).otherwise(F.lit(0))
    return hashed.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    bits: int = 32,
    max_distance: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance within a blocking key."""
    base = simhash(df, id_col, text_col, bits)
    if block_col:
        blk = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"))
        base = base.join(blk, "id")
    else:
        base = base.withColumn("blk", F.lit(1))
    a = base.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk")
    b = base.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk")
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", dist.cast("long"))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
