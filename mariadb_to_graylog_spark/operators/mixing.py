"""Training-mix assembly operators: sequence packing and temperature-based
source mixing.

These are the steps BETWEEN a curated corpus and a training run: assign
every document a position in a fixed-token-length training-sequence
stream (``pack_sequences``), and decide how much of each source to draw
so no single giant crawl drowns the long tail
(``temperature_mixture_rates`` / ``temperature_sample_filter`` --
square-root temperature sampling, the alpha=0.5 rule used by
multilingual LM training recipes).

Everything here is deterministic and engine-portable (md5-derived hash
keys, IEEE-exact sqrt, integer ppm thresholds), so every operator has a
value-level DuckDB oracle.  Scale shape:

* ``pack_sequences``: one hash exchange on the shard key + a shard-local
  sort -- each shard is an INDEPENDENT token stream, so there is no
  global order, no global cumulative sum, and the shard count scales
  with the cluster (shards ~ executor cores x a small factor).  The
  window's running sum is sort-based and streaming-friendly; nothing is
  collected.
* ``temperature_mixture_rates``: two partial-aggregated passes (one for
  per-source totals, one for kept counts after the rate is known --
  the second pass is inherent: the rate depends on a corpus-global
  statistic).  The per-source table is tiny and broadcast back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators import textstats as tx
from mariadb_to_graylog_spark.operators.dedup import h32

PPM = 1_000_000


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    shards: int = 8,
    salt: str = "pack1",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a deterministic position in a packed
    training-sequence stream: documents are hash-ordered into ``shards``
    independent token streams, concatenated (GPT-style packing -- a
    document may span a sequence boundary), and chunked into
    ``seq_len``-token sequences.

    Output per document: ``shard``, ``n_tokens``, ``stream_offset`` (the
    token offset of the document inside its shard's stream),
    ``seq_start`` / ``seq_end`` (first/last sequence index the document
    lands in) and ``seqs_spanned``.  Zero-token documents occupy one
    (empty) slot so every doc gets a defined position.

    The hash order doubles as the training shuffle: different salts give
    independent epoch orders.
    """
    h = h32(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    t = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tx.token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        h.alias("_h"),
    ).withColumn("shard", (F.col("_h") % shards).cast("long"))
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long")).alias(
            "stream_offset"
        ),
    )
    # integer division end-to-end (Spark `div` == DuckDB `//` on
    # non-negative longs): no fp in the sequence index, so the assignment
    # is exact at any stream length
    return (
        out.withColumn(
            "seq_start", F.expr(f"stream_offset div {int(seq_len)}").cast("long")
        )
        .withColumn(
            "seq_end",
            F.expr(
                f"(stream_offset + greatest(n_tokens, 1L) - 1L) div {int(seq_len)}"
            ).cast("long"),
        )
        .withColumn(
            "seqs_spanned", (F.col("seq_end") - F.col("seq_start") + F.lit(1)).cast("long")
        )
    )


def temperature_mixture_rates(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Square-root temperature mixing (alpha = 0.5): each source's share
    of a ``budget_tokens`` training budget is proportional to
    sqrt(its token count), flattening the head without discarding it.

    alpha is FIXED at 0.5 because sqrt is IEEE-754 correctly rounded --
    bit-identical in Spark and DuckDB -- while pow(x, alpha) is not
    guaranteed to be; sqrt is also the published default for
    multilingual rebalancing.  The scaled weight is floored to integer
    micro-units before the corpus-global sum so the normalizer is an
    EXACT integer and the derived per-source rate is a single
    deterministic double expression.

    Output per source: ``n_docs``, ``n_tokens``, ``weight`` (rounded
    display share), ``target_tokens`` (this source's slice of the
    budget) and ``rate_ppm`` -- the integer parts-per-million keep rate
    ``temperature_sample_filter`` consumes (capped at 1e6: a source
    whose slice exceeds its size keeps everything; the shortfall shows
    up as target_tokens > n_tokens, i.e. "repeat this source in
    training").
    """
    import math

    # ONE corpus pass collapses to one row per source; that tiny table is
    # collected driver-side (the k-means-centroid / unigram-surprisal-N
    # idiom) so the corpus-global normalizer is an exact integer scalar
    # and nothing joins against an aggregate of its own lineage.  If the
    # "source" axis were high-cardinality (per-domain mixing), the
    # distributed twin is a broadcast of this same table -- it is small
    # by definition of "source".
    rows = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(tx.token_count(F.col(text_col)).cast("long")).alias(
                "n_tokens"
            ),
        )
        .collect()
    )
    # floor(sqrt(n)*1e6): sqrt is IEEE-correctly-rounded in Python, the
    # JVM and DuckDB alike, so the micro-unit weights agree bit-for-bit
    data = [
        (
            r["source"],
            int(r["n_docs"]),
            int(r["n_tokens"]),
            int(math.floor(math.sqrt(r["n_tokens"]) * 1000000.0)),
        )
        for r in rows
    ]
    s_total = sum(s for _, _, _, s in data) or 1
    # NOT `_s`/`_S`: Spark's resolver is case-insensitive by default, so
    # withColumn("_S", ...) silently REPLACES an existing `_s` column
    per = df.sparkSession.createDataFrame(
        data, "source string, n_docs long, n_tokens long, _sw long"
    ).withColumn("_stot", F.lit(int(s_total)).cast("long"))
    budget = F.lit(float(budget_tokens))
    # left-assoc double chain, mirrored verbatim in the SQL oracle:
    # ((budget * s) / S) -> target; (target * 1e6) / n_tokens -> rate
    target = budget * F.col("_sw") / F.col("_stot")
    rate = target * F.lit(float(PPM)) / F.col("n_tokens")
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("_sw").cast("double") / F.col("_stot"), 6).alias("weight"),
        F.floor(target).cast("long").alias("target_tokens"),
        F.least(F.lit(PPM).cast("long"), F.floor(rate).cast("long")).alias(
            "rate_ppm"
        ),
    )


def temperature_sample_filter(
    key: Column, rate_ppm: Column, salt: str = "temp1"
) -> Column:
    """Keep-filter implementing a per-source ppm rate: md5-hash the doc
    key (+salt), keep iff hash % 1e6 < rate_ppm.  Same determinism and
    composability story as ``textstats.deterministic_sample_filter``,
    at ppm resolution because mixture rates need finer grain than
    percent."""
    return h32(F.concat(key.cast("string"), F.lit(salt))) % PPM < rate_ppm


def temperature_mixture(
    df: DataFrame,
    budget_tokens: int,
    salt: str = "temp1",
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end mixture report: rates + the realized sample.  Joins the
    (tiny, broadcast) per-source rate table back to the corpus, applies
    the deterministic keep-filter, and reports per source what the
    mixture actually drew: ``n_kept`` / ``kept_tokens`` alongside the
    targets, the table a data-mixing run signs off on before training.
    """
    rates = temperature_mixture_rates(df, budget_tokens, source_col, text_col)
    docs = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        tx.token_count(F.col(text_col)).cast("long").alias("_t"),
    )
    kept = (
        docs.join(F.broadcast(rates.select("source", "rate_ppm")), "source")
        .filter(temperature_sample_filter(F.col("_id"), F.col("rate_ppm"), salt))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("_t").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            "target_tokens",
            "rate_ppm",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0).cast("long")).alias("kept_tokens"),
        )
    )


def pack_segment_stats(
    df: DataFrame,
    seq_len: int = 256,
    shards: int = 8,
    salt: str = "pack1",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The per-SEQUENCE view of ``pack_sequences`` -- for every packed
    training sequence, the segment structure an attention-mask builder
    (and a boundary-pollution analysis) reads:

    (shard, seq_idx, n_segments, n_crossing_in, n_crossing_out,
     filled_tokens)

    * ``n_segments``       documents contributing >= 1 token
    * ``n_crossing_in``    segments whose document BEGAN in an earlier
                           sequence (a mid-document sequence start --
                           the context the mask must not attend across
                           if packing is mask-isolated)
    * ``n_crossing_out``   segments continuing into the next sequence
    * ``filled_tokens``    token count (== seq_len everywhere except
                           each shard's final, padded sequence)

    Derived entirely from ``pack_sequences``'s integer positions -- one
    explode over each doc's spanned sequence range (bounded: a doc adds
    seqs_spanned rows, total rows = total_tokens/seq_len + n_docs), one
    (shard, seq_idx) exchange.  Zero-token docs occupy an empty slot in
    the stream and contribute no segment here -- nothing to mask."""
    p = pack_sequences(df, seq_len, shards, salt, text_col, id_col)
    docs = p.filter(F.col("n_tokens") > 0).select(
        "shard",
        "stream_offset",
        "n_tokens",
        (F.col("stream_offset") + F.col("n_tokens") - 1).alias("_last"),
        F.explode(F.sequence(F.col("seq_start"), F.col("seq_end"))).alias(
            "seq_idx"
        ),
    )
    lo = F.col("seq_idx") * seq_len
    hi = (F.col("seq_idx") + 1) * seq_len - 1
    seg = docs.select(
        "shard",
        "seq_idx",
        (F.col("stream_offset") < lo).cast("long").alias("_in"),
        (F.col("_last") > hi).cast("long").alias("_out"),
        (
            F.least(F.col("_last"), hi) - F.greatest(F.col("stream_offset"), lo) + 1
        ).alias("_fill"),
    )
    return seg.groupBy("shard", "seq_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("_in").cast("long").alias("n_crossing_in"),
        F.sum("_out").cast("long").alias("n_crossing_out"),
        F.sum("_fill").cast("long").alias("filled_tokens"),
    )
