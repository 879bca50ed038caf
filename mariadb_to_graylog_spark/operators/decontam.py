"""Benchmark decontamination: flag training documents that share any
word n-gram (default 13, the common eval-decontamination window) with a
reference/eval set.

Scale shape: the eval set is small by definition (thousands of items vs
10^9+ documents), so its distinct gram-hash set BROADCASTS; each document
computes its gram hashes map-side (higher-order functions over the token
array, no Python) and probes the broadcast -- the only shuffle is the
final per-document hit count, which is partial-aggregated map-side.
Documents and eval items never move; 8-byte gram hashes do.

Grams are hashed with the portable md5-derived h32 (operators/dedup.py),
so the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.dedup import h32
from mariadb_to_graylog_spark.operators.textstats import bind_once, normalize_text


def word_ngram_hashes(c: Column, n: int = 13) -> Column:
    """Distinct h32 hashes of all n-word windows (space-joined) of the
    normalized text.  Documents shorter than n words have no window and
    return an empty array -- they cannot be flagged, matching the
    standard decontamination definition (an eval item can only leak
    verbatim if the document can contain it)."""

    def _grams(toks: Column) -> Column:
        cnt = F.size(toks) - (n - 1)
        return F.when(
            cnt >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), cnt),
                    lambda i: h32(F.array_join(F.slice(toks, i, n), " ")),
                )
            ),
        ).otherwise(F.array().cast("array<long>"))

    # bind the token array once (HOFs are interpreted without CSE; see
    # textstats.bind_once)
    return bind_once(F.split(normalize_text(c), " "), _grams)


def word_ngram_pos_hashes(
    c: Column, n: int = 13, hasher=None, hash_type: str = "long"
) -> Column:
    """POSITIONED n-gram hashes: array of (pos, h) structs, one per
    window start (0-based token position), NOT distinct -- the input for
    run-extent recovery (``dedup.shared_run_extents``), where gram
    POSITIONS carry the signal that ``word_ngram_hashes`` deliberately
    discards.

    ``hasher`` defaults to the 8-byte h32 (right for DETECTION: a 2^-32
    collision makes a spurious candidate, nothing more).  Operators that
    DELETE on a match (``dedup.trim_verbatim_runs`` and the coverage
    that feeds drop decisions) pass ``hasher=F.md5, hash_type='string'``
    -- full 128-bit gram identity, because at corpus scale 32-bit
    collisions are expected in the millions and each one would fabricate
    an n-token run."""
    h = hasher if hasher is not None else h32

    def _grams(toks: Column) -> Column:
        cnt = F.size(toks) - (n - 1)
        return F.when(
            cnt >= 1,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.struct(
                    (i - 1).cast("long").alias("pos"),
                    h(F.array_join(F.slice(toks, i, n), " ")).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast(f"array<struct<pos:long,h:{hash_type}>>"))

    return bind_once(F.split(normalize_text(c), " "), _grams)


def eval_gram_set(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 13,
    max_hashes: int | None = None,
    full_md5: bool = False,
) -> set[int] | set[str]:
    """Driver-side distinct gram-hash set of the eval corpus -- small by
    definition (thousands of items vs 10^9+ documents), so collecting it
    is the broadcast pattern, not a scalability hole.

    The contract is ENFORCED, not just documented: the distinct-hash
    count is checked (one cheap pre-aggregated job) before anything is
    pulled to the driver, so passing a corpus-sized DataFrame fails fast
    with a clear message instead of silently OOMing the driver.  The
    default ceiling is SIZED TO THE HASH WIDTH: 50M for h32 longs
    (~400 MB of longs) but 6M for ``full_md5`` (32-char hex strings cost
    ~100 bytes each in a Python set -- the same ceiling in longs would
    OOM the driver exactly the way this guard exists to prevent).  Pass
    ``max_hashes`` explicitly to override either.

    ``full_md5=True`` returns 32-char hex digests instead of h32 longs --
    required for DESTRUCTIVE consumers (``contamination_trim_udf``),
    which must never act on a 32-bit collision; detection-only consumers
    (``contamination_flag_udf``) keep the cheap longs."""
    if max_hashes is None:
        max_hashes = 6_000_000 if full_md5 else 50_000_000
    if full_md5:
        gram_col = word_ngram_pos_hashes(F.col(text_col), n, F.md5, "string")
        distinct_h = (
            eval_df.select(F.explode(gram_col).alias("g"))
            .select(F.col("g.h").alias("h"))
            .distinct()
            .persist()
        )
    else:
        distinct_h = (
            eval_df.select(
                F.explode(word_ngram_hashes(F.col(text_col), n)).alias("h")
            )
            .distinct()
            .persist()  # ONE gram/explode/distinct pass shared by guard + collect
        )
    try:
        cnt = distinct_h.count()
        if cnt > max_hashes:
            raise ValueError(
                f"eval corpus must be small (its gram set is collected to "
                f"the driver and broadcast); got {cnt:,} distinct {n}-gram "
                f"hashes > max_hashes={max_hashes:,}.  For corpus-vs-corpus "
                f"overlap use contamination_bucketed (distributed gram "
                f"join), not a broadcast."
            )
        return {r.h for r in distinct_h.collect()}
    finally:
        distinct_h.unpersist()


def _null_id_guard(
    id_col: str,
    op_name: str,
    on_null_id: str,
    hint: str = "pass on_null_id='drop' to drop them",
) -> Column:
    """The loud null-id policy, shared by every operator whose final
    groupBy would silently merge distinct NULL-id documents: ``"error"``
    fails map-side at the first NULL (riding a projection an explode
    already pays for -- no extra pass); ``"drop"`` is handled by the
    CALLER filtering before calling this (the returned column only
    implements the error arm).  Raises ValueError on any other mode."""
    if on_null_id not in ("error", "drop"):
        raise ValueError(f"on_null_id must be 'error' or 'drop', got {on_null_id!r}")
    col = F.col(id_col)
    if on_null_id != "error":
        return col
    return F.when(
        col.isNull(),
        F.raise_error(
            F.lit(
                f"{op_name}: NULL {id_col!r}; distinct documents with NULL "
                f"ids would merge into one groupBy row ({hint})"
            )
        ),
    ).otherwise(col)


def contamination_flag_udf(
    eval_hashes: set[int] | None = None, n: int = 13, eval_broadcast=None
):
    """Stateless per-row contamination flag for STREAMING (and any context
    where an aggregation is unwelcome): grams are computed in Arrow
    batches and probed against the broadcast eval-hash set -- no explode,
    no shuffle, no state.  Bit-identical to ``contamination``'s flag on
    the same rows (gram = md5-h32 of the space-joined normalized n-word
    window; Python/Java lower() caveats as in winnow_fingerprint_pandas).
    Short-circuits on the first hit.

    The hash set rides a real ``SparkContext.broadcast`` when a session is
    active (shipped once per executor, torrent-distributed), NOT a plain
    closure (which would re-serialize the whole set into every task); the
    closure fallback only applies when no session exists yet at
    definition time.

    Long-lived apps that rebuild the curation plan (e.g. a restarting
    stream) should pass the previous udf's handle back as
    ``eval_broadcast`` -- the set then ships ONCE per app, not once per
    rebuild; otherwise unpersist the old handle
    (``udf.eval_broadcast.unpersist()``) before dropping the udf, or
    app-lifetime broadcasts accumulate.  Exactly ONE of ``eval_hashes``
    / ``eval_broadcast`` must be given -- passing both would silently
    ignore the fresh hash set in favor of the (possibly stale)
    broadcast, so it raises instead."""
    import hashlib
    import re

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    if (eval_hashes is None) == (eval_broadcast is None):
        raise ValueError(
            "pass exactly one of eval_hashes (fresh set) or eval_broadcast "
            "(reuse a previous udf's shipped set)"
        )
    ws = re.compile(r"\s+", re.ASCII)
    if eval_broadcast is not None:
        # the broadcast value is tagged (n, hash_set) so a handle built for
        # a different gram width cannot be reused silently: hashes of
        # different-n grams never collide, so an n mismatch would probe an
        # incompatible set and flag NOTHING.  .value here is driver-side on
        # the handle's home process -- no executor fetch.
        tagged = eval_broadcast.value
        if not (isinstance(tagged, tuple) and len(tagged) == 2):
            raise ValueError(
                "eval_broadcast must be a handle returned as "
                "udf.eval_broadcast by a previous contamination_flag_udf "
                "(its value is tagged (n, hash_set)); got an untagged "
                f"{type(tagged).__name__}"
            )
        if tagged[0] != n:
            raise ValueError(
                f"eval_broadcast was built for n={tagged[0]} but this udf "
                f"was asked for n={n}; grams of different widths never "
                f"hash-match, so reusing it would silently flag nothing"
            )
        bc = eval_broadcast
        hs_local = None
    else:
        spark = SparkSession.getActiveSession()
        if spark is not None:
            bc = spark.sparkContext.broadcast((n, frozenset(eval_hashes)))
            hs_local = None
        else:
            bc = None
            hs_local = frozenset(eval_hashes)

    def _flag(t: str | None, hs: frozenset) -> bool:
        s = ws.sub(" ", (t or "").lower()).strip()
        toks = s.split(" ")
        for i in range(max(len(toks) - n + 1, 0)):
            g = " ".join(toks[i : i + n])
            if int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) in hs:
                return True
        return False

    @pandas_udf("boolean")
    def udf(texts: pd.Series) -> pd.Series:
        hs = bc.value[1] if bc is not None else hs_local
        return texts.map(lambda t: _flag(t, hs))

    # expose the broadcast for caller-side cleanup: broadcasts live for
    # the application unless released, so a long-lived app refreshing the
    # eval set should call udf.eval_broadcast.unpersist() (or .destroy())
    # when it drops the previous flag udf
    udf.eval_broadcast = bc
    return udf


def contamination_trim_udf(
    eval_hashes: set[str] | None = None, n: int = 13, eval_broadcast=None
):
    """Stateless per-row SURGICAL TRIM for STREAMING: every >= ``n``-token
    span shared with the broadcast eval set is removed row-locally -- no
    explode, no shuffle, no state; the map-side twin of
    ``trim_contaminated_runs`` (bit-identical on the same rows, asserted
    by tests).  Returns a struct (trimmed_text, n_tokens,
    n_tokens_removed) so the streaming sink gets the same accounting as
    the batch op.

    DESTRUCTIVE, so ``eval_hashes`` must be FULL 32-char md5 hex digests
    (``eval_gram_set(..., full_md5=True)``), never h32 longs: a 32-bit
    collision here would silently censor n real tokens.  The broadcast
    value is tagged ('md5', n, hash_set); reusing a
    ``contamination_flag_udf`` handle (h32 longs, 2-tuple tag) or a trim
    handle built for a different ``n`` raises instead of silently
    trimming nothing.  Broadcast lifecycle and the exactly-one-of
    eval_hashes/eval_broadcast contract mirror
    ``contamination_flag_udf``."""
    import hashlib
    import re

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    if (eval_hashes is None) == (eval_broadcast is None):
        raise ValueError(
            "pass exactly one of eval_hashes (fresh set) or eval_broadcast "
            "(reuse a previous udf's shipped set)"
        )
    ws = re.compile(r"\s+", re.ASCII)
    if eval_broadcast is not None:
        tagged = eval_broadcast.value
        if not (
            isinstance(tagged, tuple) and len(tagged) == 3 and tagged[0] == "md5"
        ):
            raise ValueError(
                "eval_broadcast must be a handle returned as "
                "udf.eval_broadcast by a previous contamination_trim_udf "
                "(its value is tagged ('md5', n, hash_set)); a "
                "contamination_flag_udf handle carries h32 longs, which a "
                "destructive trim must never act on"
            )
        if tagged[1] != n:
            raise ValueError(
                f"eval_broadcast was built for n={tagged[1]} but this udf "
                f"was asked for n={n}; grams of different widths never "
                f"hash-match, so reusing it would silently trim nothing"
            )
        bc = eval_broadcast
        hs_local = None
    else:
        bad = next((h for h in eval_hashes if not isinstance(h, str)), None)
        if bad is not None:
            raise ValueError(
                "eval_hashes must contain full md5 hex digests (str) -- "
                "build them with eval_gram_set(..., full_md5=True); got a "
                f"{type(bad).__name__} (h32 longs are detection-only)"
            )
        spark = SparkSession.getActiveSession()
        if spark is not None:
            bc = spark.sparkContext.broadcast(("md5", n, frozenset(eval_hashes)))
            hs_local = None
        else:
            bc = None
            hs_local = frozenset(eval_hashes)

    def _trim(t: str | None, hs: frozenset) -> tuple[str, int, int]:
        s = ws.sub(" ", (t or "").lower()).strip()
        toks = s.split(" ")
        covered = [False] * len(toks)
        for i in range(max(len(toks) - n + 1, 0)):
            g = " ".join(toks[i : i + n])
            if hashlib.md5(g.encode("utf-8")).hexdigest() in hs:
                covered[i : i + n] = [True] * n
        kept = [tok for tok, c in zip(toks, covered) if not c]
        return " ".join(kept), len(toks), len(toks) - len(kept)

    @pandas_udf("trimmed_text string, n_tokens long, n_tokens_removed long")
    def udf(texts: pd.Series) -> pd.DataFrame:
        hs = bc.value[2] if bc is not None else hs_local
        return pd.DataFrame(
            [_trim(t, hs) for t in texts],
            columns=["trimmed_text", "n_tokens", "n_tokens_removed"],
        )

    udf.eval_broadcast = bc
    return udf


def contamination(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    pin_broadcast: bool = True,
    on_null_id: str = "error",
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every document: n_hits = how many
    of the document's distinct n-grams appear anywhere in the eval set.

    ``pin_broadcast=True`` (default) forces the eval gram set onto the
    broadcast side -- correct when the reference IS an eval suite (small
    by definition).  ``contamination_bucketed`` is the same body with the
    pin removed for corpus-sized references.  ONE implementation backs
    both so the contract cannot silently diverge.

    The id column keeps its ORIGINAL type (string ids stay strings --
    a cast-to-long here once silently nulled every non-numeric id, and
    the final groupBy then merged all such documents into one NULL row).
    NULL ids would hit the same merge, so per the repo's loud null-id
    policy (see ``multimodal.attach_payload``): ``on_null_id="error"``
    (default) fails the job at the first NULL id via a map-side check
    (no extra pass -- the conditional rides the projection the explode
    already pays for); ``"drop"`` opts into excluding them.

    Use ``docs.filter(~contaminated)``-style joins downstream to drop
    flagged documents before training."""
    doc_id = _null_id_guard(id_col, "contamination", on_null_id)
    if on_null_id == "drop":
        docs = docs.filter(F.col(id_col).isNotNull())
    eval_grams = (
        eval_df.select(F.explode(word_ngram_hashes(F.col(eval_text_col), n)).alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if pin_broadcast:
        eval_grams = F.broadcast(eval_grams)
    # explode_outer keeps gram-less (short/empty) documents as a null-h
    # row, so ONE groupBy emits every document -- no join-back of a hits
    # relation onto the doc list (that join is a doc_id shuffle the
    # aggregation already pays for)
    doc_grams = docs.select(
        doc_id.alias("doc_id"),
        F.explode_outer(word_ngram_hashes(F.col(text_col), n)).alias("h"),
    )
    return (
        doc_grams.join(eval_grams, "h", "left")
        .groupBy("doc_id")
        .agg(F.count("_hit").cast("long").alias("n_hits"))
        .select(
            "doc_id", "n_hits", (F.col("n_hits") > 0).alias("contaminated")
        )
    )


def contamination_bucketed(
    docs: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str = "text",
    n: int = 13,
    on_null_id: str = "error",
) -> DataFrame:
    """``contamination`` for reference corpora too large to broadcast --
    the path ``eval_gram_set``'s size-guard error message points at.

    Same output contract (it IS the same implementation, with the
    broadcast pin removed): the reference gram set STAYS DISTRIBUTED, so
    the only driver-side object is the plan -- no collect, no size
    ceiling; decontaminate a training shard against another 100 TB
    shard.  Catalyst still picks the right physical join per run: a
    small reference broadcasts via AQE exactly like the pinned path, a
    large one shuffle-joins on the 8-byte gram hash -- declaring the
    join and letting the optimizer choose IS the scale story."""
    return contamination(
        docs,
        ref_df,
        id_col=id_col,
        text_col=text_col,
        eval_text_col=ref_text_col,
        n=n,
        pin_broadcast=False,
        on_null_id=on_null_id,
    )


def contamination_extents(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    n: int = 13,
    pin_broadcast: bool = True,
    max_bucket_size: int | None = None,
    on_null_id: str = "error",
) -> DataFrame:
    """WHERE each contaminated document overlaps the eval set -- the
    audit/appeal record ``contamination``'s boolean flag cannot provide:
    one row per maximal verbatim run, (doc_id, eval_id, doc_start,
    doc_end, eval_start, run_tokens), token positions 0-based inclusive.

    Composition of this module's positioned grams
    (``word_ngram_pos_hashes``) with the diagonal gaps-and-islands pass
    of ``dedup.shared_run_extents``: a shared run of L >= n tokens shows
    up as L - n + 1 gram matches at consecutive doc positions on ONE
    diagonal (doc_pos - eval_pos constant), so maximal extents are
    islands per (doc, eval item, diagonal) -- joins + one window, no
    Python, no suffix array.  Runs are maximal PER ALIGNMENT: text
    repeated on either side yields one row per (doc offset, eval offset)
    diagonal it matches on -- the audit answer to "every place this
    leaked", deliberately not collapsed to one span per document.  Only
    contaminated documents appear (inner join on the gram hash);
    ``contamination`` stays the cheap flag pass over ALL documents.

    Scale shape mirrors ``contamination``: the eval side is small by
    definition, so its positioned grams broadcast (``pin_broadcast=True``
    default; pass False for corpus-sized references and let AQE choose);
    documents never move -- the only shuffle carries matched (8-byte
    hash, two int positions) tuples into the per-(doc, eval, diagonal)
    window.  A single gram repeated k_doc x k_eval times on one diagonal
    pair is bounded by ``max_bucket_size`` (counted over DOC-side gram
    occurrences, like ``shared_run_extents``); None = no cap, because an
    eval gram matching many documents is precisely the signal sought --
    cap only when eval text itself carries boilerplate.

    Id columns keep their ORIGINAL types; NULL doc ids follow the loud
    null-id policy (``on_null_id``).  NULL EVAL ids always raise: the
    eval set is small and curated by definition, and a NULL there is not
    merely cosmetic -- all NULL-id eval items would share one window
    partition, where interleaved positions corrupt OTHER rows' extents.
    Duplicate eval rows (same id + text listed twice) are absorbed by the
    island pass (``dedup.diagonal_run_islands``: dense_rank + distinct
    positions), not double-counted."""
    from mariadb_to_graylog_spark.operators.dedup import diagonal_run_islands

    doc_id = _null_id_guard(id_col, "contamination_extents", on_null_id)
    if on_null_id == "drop":
        docs = docs.filter(F.col(id_col).isNotNull())
    eval_id = _null_id_guard(
        eval_id_col,
        "contamination_extents",
        "error",
        hint="eval items need non-null ids; NULL-id items would share one "
        "window partition and corrupt each other's extents",
    )

    eg = eval_df.select(
        eval_id.alias("eval_id"),
        F.explode(word_ngram_pos_hashes(F.col(eval_text_col), n)).alias("g"),
    ).select("eval_id", F.col("g.pos").alias("pos_b"), F.col("g.h").alias("h"))
    if pin_broadcast:
        eg = F.broadcast(eg)

    dg = docs.select(
        doc_id.alias("doc_id"),
        F.explode(word_ngram_pos_hashes(F.col(text_col), n)).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos_a"), F.col("g.h").alias("h"))
    if max_bucket_size is not None:
        sizes = dg.groupBy("h").agg(F.count(F.lit(1)).alias("_bn"))
        dg = dg.join(sizes.filter(F.col("_bn") <= max_bucket_size), "h").drop("_bn")

    matched = dg.join(eg, "h").select(
        "doc_id",
        "eval_id",
        "pos_a",
        (F.col("pos_a") - F.col("pos_b")).alias("diag"),
    )
    runs = diagonal_run_islands(matched, ["doc_id", "eval_id"], n)
    return runs.select(
        "doc_id",
        "eval_id",
        F.col("run_start").cast("long").alias("doc_start"),
        (F.col("run_start") + F.col("run_tokens") - 1).cast("long").alias("doc_end"),
        (F.col("run_start") - F.col("diag")).cast("long").alias("eval_start"),
        "run_tokens",
    )


def _eval_cover_runs(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str,
    n: int,
    pin_broadcast: bool,
    op_name: str,
    on_null_id: str,
) -> tuple[DataFrame, DataFrame]:
    """(projected docs, raw (id, s, e) cover runs) shared by
    ``contamination_coverage`` and ``trim_contaminated_runs``.

    The vs-eval-set analogue of ``dedup._gram_cover_intervals``'s
    observation: the interval union the coverage/trim decisions consume
    is exactly the union of [pos, pos+n-1] over every doc gram occurrence
    whose hash is IN the eval gram set -- so "matched" is a semi-join
    against the eval set's DISTINCT hashes, no position self-join, no
    diagonal bookkeeping, no occurrence-cap trade-off (a degenerate gram
    costs k rows, never k^2).

    Both consumers DELETE or feed drop decisions, so grams carry their
    FULL 128-bit md5 (``word_ngram_pos_hashes(hasher=F.md5)``) like the
    verbatim twins: a 32-bit collision here would not flag a spurious
    candidate, it would silently censor n real tokens.  The eval side is
    small by definition, so its distinct hashes broadcast
    (``pin_broadcast=True`` default; False lets AQE choose for
    corpus-sized references)."""
    doc_id = _null_id_guard(id_col, op_name, on_null_id)
    if on_null_id == "drop":
        docs = docs.filter(F.col(id_col).isNotNull())
    docs2 = docs.select(doc_id.alias("doc_id"), F.col(text_col).alias("text"))
    eh = (
        eval_df.select(
            F.explode(
                word_ngram_pos_hashes(F.col(eval_text_col), n, F.md5, "string")
            ).alias("g")
        )
        .select(F.col("g.h").alias("h"))
        .distinct()
    )
    if pin_broadcast:
        eh = F.broadcast(eh)
    dg = docs2.select(
        F.col("doc_id").alias("id"),
        F.explode(word_ngram_pos_hashes(F.col("text"), n, F.md5, "string")).alias(
            "g"
        ),
    ).select("id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    runs = dg.join(eh, "h", "leftsemi").select(
        "id",
        F.col("pos").cast("long").alias("s"),
        (F.col("pos") + F.lit(n - 1)).cast("long").alias("e"),
    )
    return docs2, runs


def contamination_coverage(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    pin_broadcast: bool = True,
    on_null_id: str = "error",
) -> DataFrame:
    """(doc_id, n_tokens, contaminated_tokens, contamination): the
    fraction of each document's tokens lying inside ANY verbatim run of
    >= ``n`` tokens shared with ANY eval item -- the trim-vs-drop
    DECISION metric ``contamination``'s boolean and
    ``contamination_extents``'s per-alignment rows both stop short of
    (a curation run trims when contamination is small, drops the doc
    when the overlap dominates it).  Every document appears; clean
    documents report 0.0.  Overlapping runs from different eval items
    (or different alignments of one item) count a span ONCE -- the
    per-doc interval union of ``dedup._coverage_from_runs``.

    Scale shape: eval distinct-hash broadcast -> semi-join over the doc
    positioned grams (documents never move; only (id, pos) pairs of
    MATCHED grams shuffle into the per-doc union window).  Full-md5 gram
    identity -- this score feeds drop decisions (see
    ``_eval_cover_runs``)."""
    from mariadb_to_graylog_spark.operators.dedup import _coverage_from_runs

    docs2, runs = _eval_cover_runs(
        docs,
        eval_df,
        id_col,
        text_col,
        eval_text_col,
        n,
        pin_broadcast,
        "contamination_coverage",
        on_null_id,
    )
    return _coverage_from_runs(
        docs2,
        "doc_id",
        "text",
        runs,
        covered_name="contaminated_tokens",
        frac_name="contamination",
    )


def trim_contaminated_runs(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    pin_broadcast: bool = True,
    on_null_id: str = "error",
) -> DataFrame:
    """(doc_id, trimmed_text, n_tokens, n_tokens_removed): surgical
    DECONTAMINATION -- every token span of >= ``n`` tokens that also
    appears in the eval set is removed from the document, so a mostly-
    clean document survives curation instead of being dropped whole for
    one quoted benchmark item.  A doc sharing nothing keeps its text; a
    doc fully contained in the eval set comes back as an empty husk
    (caller filters), mirroring ``trim_verbatim_runs``.

    ``trimmed_text`` is the space-joined surviving tokens of the
    NORMALIZED text (lowercased, whitespace-collapsed) -- the same token
    stream the runs are defined on, exactly as in the verbatim twin.

    Shape: ``_eval_cover_runs`` (eval-hash broadcast semi-join, full-md5
    grams, no self-join) -> per-doc interval union -> ONE map-side
    higher-order filter (``dedup._trim_by_runs``); text shuffles only on
    the final interval join-back."""
    from mariadb_to_graylog_spark.operators.dedup import _trim_by_runs

    docs2, runs = _eval_cover_runs(
        docs,
        eval_df,
        id_col,
        text_col,
        eval_text_col,
        n,
        pin_broadcast,
        "trim_contaminated_runs",
        on_null_id,
    )
    return _trim_by_runs(docs2, "doc_id", "text", runs)


def fuzzy_contamination(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    shingle_n: int = 4,
    bands: int = 4,
    rows_per_band: int = 8,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    containment_threshold: float = 0.8,
    max_eval_rows: int = 1_000_000,
) -> DataFrame:
    """FUZZY decontamination: flag training documents whose text is a
    MinHash-LSH near-duplicate of any eval item -- the paraphrase/edit
    robust complement to the exact word-n-gram ``contamination`` family,
    which goes blind the moment one token inside every shared 13-gram is
    edited (the classic contamination-laundering rewrite).

    Returns (doc_id, eval_id, jaccard, containment) for every candidate
    pair passing EITHER threshold.  Both scores are exact, computed on
    char ``n``-gram sets of the candidate pair only:

    * ``jaccard``     = |G(doc) n G(ev)| / |G(doc) u G(ev)|
    * ``containment`` = |G(doc) n G(ev)| / |G(ev)| -- a short eval item
      quoted whole inside a long document scores ~1.0 here while its
      Jaccard stays low.

    Scale shape: the eval set is small by definition, so its (band, sig)
    bucket table and its gram arrays BROADCAST (row count enforced, like
    ``eval_gram_set``).  The corpus side computes MinHash signatures
    below one groupBy(id) exchange (``dedup.minhash_signatures``) and
    probes the broadcast buckets -- candidate generation moves no corpus
    text and no corpus rows beyond that signature aggregation, and
    verification joins gram arrays for CANDIDATE pairs only.  Inherent
    caveat, stated not hidden: candidate recall follows the Jaccard
    S-curve of the banding, so a low-Jaccard / high-containment pair
    surfaces only if some band still collides; wholesale-quotation hunts
    belong to the exact positioned-gram path (``contamination_extents``),
    this operator hunts near-duplicate / lightly-edited contamination.
    """
    from mariadb_to_graylog_spark.operators.dedup import char_ngrams, lsh_buckets

    n_eval = eval_df.count()
    if n_eval > max_eval_rows:
        raise ValueError(
            f"eval corpus must be small (got {n_eval} rows > max_eval_rows="
            f"{max_eval_rows}); fuzzy decontamination broadcasts the eval "
            "bucket table -- for corpus-vs-corpus near-dedup use "
            "dedup.lsh_jaccard_verified over the union instead"
        )
    doc_b = lsh_buckets(docs, id_col, text_col, shingle_n, bands, rows_per_band)
    ev_b = lsh_buckets(eval_df, eval_id_col, eval_text_col, shingle_n, bands, rows_per_band)
    cand = (
        doc_b.withColumnRenamed("id", "_did")
        .join(
            F.broadcast(ev_b.withColumnRenamed("id", "_eid")),
            ["band", "sig"],
        )
        .select("_did", "_eid")
        .distinct()
    )
    dg = docs.select(
        F.col(id_col).alias("_did"),
        char_ngrams(F.col(text_col), n).alias("_g_doc"),
    )
    eg = eval_df.select(
        F.col(eval_id_col).alias("_eid"),
        char_ngrams(F.col(eval_text_col), n).alias("_g_ev"),
    )
    pairs = cand.join(dg, "_did").join(F.broadcast(eg), "_eid")
    inter = F.size(F.array_intersect("_g_doc", "_g_ev")).cast("double")
    union = F.size(F.array_union("_g_doc", "_g_ev")).cast("double")
    contain = inter / F.size(F.col("_g_ev")).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .withColumn("containment", F.round(contain, 6))
        .filter(
            (F.col("jaccard") >= jaccard_threshold)
            | (F.col("containment") >= containment_threshold)
        )
        .select(
            F.col("_did").alias(id_col),
            F.col("_eid").alias(eval_id_col),
            "jaccard",
            "containment",
        )
    )


def semantic_contamination(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    eval_id_col: str = "eval_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 3,
    rows_per_band: int = 8,
    threshold: float = 0.97,
    round_digits: int = 6,
    max_eval_rows: int = 1_000_000,
    pin_broadcast: bool = True,
) -> DataFrame:
    """SEMANTIC decontamination: flag training documents whose EMBEDDING
    is a near-duplicate (cosine >= ``threshold``) of any eval-set
    embedding -- the third lane of the decontamination family, catching
    full paraphrases that survive both the exact 13-gram probe
    (``contamination``) and the char-n-gram MinHash probe
    (``fuzzy_contamination``): a rewritten eval answer shares no surface
    n-grams at all but still lands next to the original in embedding
    space (the signal SemDeDup exploits for dedup, aimed here at
    eval leakage).

    Returns (id_col, eval_id_col, cos_sim) for every pair at or above
    the threshold (cosine rounded to ``round_digits`` BEFORE the
    threshold test, so the DuckDB oracle thresholds the same value).

    Scale shape -- the corpus side never shuffles: each document computes
    its SRP sign-bit band values map-side (same deterministic integer
    hyperplanes as ``similarity.embedding_neardup_lsh``, so an eval
    vector that is a positive-scalar multiple of a corpus vector shares
    every sign bit and always collides); the eval bucket table
    (bands x |eval| rows of three longs) and the eval vector table
    BROADCAST with the row count enforced, exactly like
    ``fuzzy_contamination``.  Candidates therefore fall out of a
    map-side broadcast hash join against the exploded doc bands, the
    exact cosine is verified in the same map task (the doc vector is
    still in hand -- no join-back to the corpus), and only MATCHES reach
    the final distinct.  ``pin_broadcast=False`` keeps both bucket
    tables distributed (shard-vs-shard shuffle join on (band, bv)) for
    eval sets past broadcast size; results are identical.

    Inherent caveat, stated not hidden: SRP recall at cosine s is
    1-(1-(1-acos(s)/pi)^rows)^bands per pair -- exact/scaled copies are
    ALWAYS caught, deep paraphrases at s ~ threshold can be missed;
    raise ``bands`` (recall) or lower ``rows_per_band`` (cost) per the
    ``lsh_banding_planner`` table, it is the same trade.
    """
    from mariadb_to_graylog_spark.operators.similarity import (
        cosine,
        srp_band_values,
        srp_planes,
    )

    n_eval = eval_df.count()
    if n_eval > max_eval_rows:
        raise ValueError(
            f"eval corpus must be small (got {n_eval} rows > max_eval_rows="
            f"{max_eval_rows}); semantic decontamination broadcasts the eval "
            "bucket and vector tables -- for corpus-vs-corpus embedding "
            "near-dedup use similarity.embedding_neardup_lsh over the union"
        )
    planes = srp_planes(bands * rows_per_band, dim)
    bv = srp_band_values(vec_col, planes, bands, rows_per_band)
    doc_b = docs.select(
        F.col(id_col).alias("_did"),
        F.col(vec_col).alias("_vd"),
        F.posexplode(bv).alias("band", "bv"),
    )
    ev_b = eval_df.select(
        F.col(eval_id_col).alias("_eid"),
        F.col(vec_col).alias("_ve"),
        F.posexplode(bv).alias("band", "bv"),
    )
    if pin_broadcast:
        ev_b = F.broadcast(ev_b)
    hits = (
        doc_b.join(ev_b, ["band", "bv"])
        .withColumn("cos_sim", F.round(cosine(F.col("_vd"), F.col("_ve")), round_digits))
        .filter(F.col("cos_sim") >= threshold)
    )
    return hits.select(
        F.col("_did").alias(id_col),
        F.col("_eid").alias(eval_id_col),
        "cos_sim",
    ).distinct()
