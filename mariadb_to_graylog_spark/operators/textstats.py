"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure column expressions (codegen'd, zero
Python per row), portable to the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"([a-z0-9]+)"
PUNCT_PATTERN = r"([.,;:!?])"

# BPE-ish pre-tokenizer: contractions | letter runs | digit runs | symbol
# runs -- the GPT-2 pattern's shape, restricted to constructs RE2 / Java
# regex / Python re all support identically (no \p classes, no lookahead).
BPE_ISH_PATTERN = r"((?:'(?:s|t|re|ve|m|ll|d))|(?:[a-z]+)|(?:[0-9]+)|(?:[^a-z0-9\s]+))"

STOPWORDS = {
    "en": r"\b(the|a|of|to|and|in)\b",
    "de": r"\b(der|die|das|und|ein|zu)\b",
    "fr": r"\b(le|la|et|les|des|un)\b",
}


def tokens(c: Column) -> Column:
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 1)


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def bpe_ish_tokens(c: Column) -> Column:
    """Pre-tokenization the way byte-pair encoders chunk text before
    merges: contractions split off, letter/digit/symbol runs separated.
    A cheap, deterministic proxy for LLM token counting at corpus scale
    (true BPE needs the merge table; this bounds it from above)."""
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 1)


def stopword_count(c: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(STOPWORDS[lang]), 1)).cast("long")


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: argmax of per-language
    stopword hit counts (ties resolve en > de > fr)."""
    c = F.col(text_col)
    scored = df.select(
        "*",
        stopword_count(c, "en").alias("en_score"),
        stopword_count(c, "de").alias("de_score"),
        stopword_count(c, "fr").alias("fr_score"),
    )
    pred = (
        F.when(
            (F.col("en_score") >= F.col("de_score"))
            & (F.col("en_score") >= F.col("fr_score")),
            F.lit("en"),
        )
        .when(F.col("de_score") >= F.col("fr_score"), F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return scored.withColumn("pred_lang", pred)


def quality_score(c: Column) -> Column:
    """Heuristic document quality in [0,1]: length saturation + stopword
    density + punctuation sanity.  Deterministic double arithmetic."""
    n_tok = F.size(tokens(c)).cast("double")
    n_stop = F.size(F.regexp_extract_all(F.lower(c), F.lit(STOPWORDS["en"]), 1)).cast("double")
    n_punct = F.size(F.regexp_extract_all(c, F.lit(PUNCT_PATTERN), 1)).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    return F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
        + (n_stop / safe_tok) * 0.3
        + (F.lit(1.0) - F.least(n_punct / safe_tok, F.lit(1.0))) * 0.2,
        6,
    )


def normalize_text(c: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(F.lower(c), r"\s+", " "), r"^\s+|\s+$", ""
    )


def doc_fingerprint(c: Column) -> Column:
    """Whitespace/case-insensitive content fingerprint (md5 of normalized
    text) -- the exact-dedup key that survives formatting noise."""
    return F.md5(normalize_text(c))


# Confusable / diacritic folding map for cross-script near-dedup.
# Strictly 1:1 per character (both engines' ``translate`` is
# char-for-char), LOSSY BY DESIGN: this is not linguistic
# transliteration, it is a canonical fold under which diacritic variants
# ("café" / "cafe"), Cyrillic homoglyph substitutions (Latin "o" swapped
# for Cyrillic "о" -- the classic dedup-evasion trick) and basic
# one-letter transliterations land on the same byte stream so char-n-gram
# MinHash buckets them together.  Deletion pairs (target "") MUST stay
# last: translate() drops from-chars beyond the to-string's length in
# both Spark and DuckDB, so deletions are encoded as the unmatched tail.
_FOLD_PAIRS: list[tuple[str, str]] = [
    ("àáâãäåāăą", "a"), ("èéêëēėęě", "e"), ("ìíîïĩīįı", "i"),
    ("òóôõöøōő", "o"), ("ùúûüũūůű", "u"), ("ýÿŷ", "y"), ("ñńň", "n"),
    ("çćĉč", "c"), ("šśş", "s"), ("žźż", "z"), ("đď", "d"), ("ß", "s"),
    ("ğ", "g"), ("ť", "t"), ("ř", "r"), ("ł", "l"), ("æ", "a"), ("œ", "o"),
    # Cyrillic -> Latin confusable fold (1:1 subset; multi-letter
    # romanizations collapse to their leading consonant)
    ("а", "a"), ("б", "b"), ("в", "v"), ("г", "g"), ("д", "d"),
    ("е", "e"), ("ё", "e"), ("ж", "j"), ("з", "z"), ("и", "i"),
    ("й", "i"), ("к", "k"), ("л", "l"), ("м", "m"), ("н", "n"),
    ("о", "o"), ("п", "p"), ("р", "r"), ("с", "s"), ("т", "t"),
    ("у", "u"), ("ф", "f"), ("х", "h"), ("ц", "c"), ("ч", "c"),
    ("ш", "s"), ("щ", "s"), ("э", "e"), ("ы", "y"), ("ю", "u"),
    ("я", "a"),
    # soft/hard signs carry no segmental content: deleted (keep last)
    ("ьъ", ""),
]
FOLD_FROM = "".join(src for src, _ in _FOLD_PAIRS)
FOLD_TO = "".join(dst * len(src) for src, dst in _FOLD_PAIRS)
assert FOLD_FROM[: len(FOLD_TO)] and len(FOLD_TO) <= len(FOLD_FROM)


def fold_confusables(c: Column) -> Column:
    """Case + diacritic + confusable fold: lower -> 1:1 translate over
    ``_FOLD_PAIRS`` -> whitespace collapse/trim.  The DuckDB twin is
    ``sql_fold_confusables`` -- generated from the SAME pairs table, so
    the two engines cannot drift.  Lossy on purpose; see the map's
    docstring."""
    return normalize_text(F.translate(F.lower(c), FOLD_FROM, FOLD_TO))


def sql_fold_confusables(expr: str) -> str:
    """DuckDB rendering of ``fold_confusables`` over SQL expression
    ``expr`` (no quote escaping needed: the fold map contains none)."""
    return (
        "trim(regexp_replace(translate(lower(" + expr + "), "
        f"'{FOLD_FROM}', '{FOLD_TO}'), '\\s+', ' ', 'g'))"
    )


def bind_once(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``fn`` as a lambda variable:
    ``transform(array(value), v -> fn(v))[0]``.

    Higher-order functions are interpreted (never codegen'd), and
    interpreted eval has no common-subexpression elimination -- an
    expression referenced inside a lambda is RE-EVALUATED per element.
    Without this binding, winnowing re-derived the full O(len) rolling-hash
    array once per stride (O(len^2) per document: measured 250s for 500
    docs at sf0.01; ~0.5s bound)."""
    return F.get(F.transform(F.array(value), fn), 0)


def rolling_hash_shingles(c: Column, window: int = 8, base: int = 31, mod: int = 1_000_003) -> Column:
    """Rabin-Karp-style rolling hashes of character windows (document
    fingerprinting / winnowing building block).  Expressed as a
    higher-order fold per window -- no Python.  DuckDB twin: nested
    list_transform/list_reduce in ORACLE_WINNOW_OVERLAP, 0-seeded via
    list_prepend(0, ...) so the fold is bit-identical for ALL codepoints
    (a first-element seed would skip the first `% mod` step and diverge
    on codepoints >= the modulus, planes 15-16 private use)."""

    def _hashes(codes: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(codes) - (window - 1), F.lit(1))),
            lambda i: F.aggregate(
                F.slice(codes, i, window),
                F.lit(0).cast("long"),
                lambda acc, v: (acc * base + v) % mod,
            ),
        )

    # bind twice: the regexp-normalized string is split/ascii'd ONCE per
    # document, and each window position folds over an array slice --
    # re-running substr+split+ascii per position costs ~2.5x
    codes = bind_once(
        normalize_text(c), lambda s: F.transform(F.split(s, ""), F.ascii)
    )
    return bind_once(codes, _hashes)


def winnow_fingerprint(c: Column, window: int = 8, select_every: int = 4) -> Column:
    """Winnowing: keep the min rolling hash of each stride -- a compact
    order-insensitive document sketch."""

    def _winnow(hs: Column) -> Column:
        n = F.size(hs)
        strides = F.sequence(
            F.lit(0), F.greatest((n - 1) / select_every, F.lit(0)).cast("int")
        )
        return F.array_distinct(
            F.transform(
                strides,
                lambda k: F.array_min(
                    F.slice(hs, k * select_every + 1, select_every)
                ),
            )
        )

    # bind the hash array once: each stride slices a bound variable
    # instead of re-deriving the whole array
    return bind_once(rolling_hash_shingles(c, window), _winnow)


_WS_ASCII = None  # lazily-compiled \s+ with re.ASCII (matches Java's default)


def winnow_sketch_py(
    text: str | None, window: int = 8, select_every: int = 4,
    base: int = 31, mod: int = 1_000_003,
) -> list[int]:
    """Pure-Python/numpy winnow sketch -- the per-string kernel of
    winnow_fingerprint_pandas, exposed for property tests and driver-side
    tooling.  Identical integers to the JVM HOF fold (same normalize ->
    codepoint -> rolling fold -> stride-min -> stable distinct)."""
    global _WS_ASCII
    import re as _re

    import numpy as np

    if _WS_ASCII is None:
        _WS_ASCII = _re.compile(r"\s+", _re.ASCII)
    s = _WS_ASCII.sub(" ", (text or "").lower()).strip()
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = codes.size
    if n == 0:
        h = np.zeros(1, dtype=np.int64)  # ascii('') folds to 0
    else:
        npos = max(n - window + 1, 1)
        h = np.zeros(npos, dtype=np.int64)
        for j in range(min(window, n)):
            h = (h * base + codes[j : j + npos]) % mod
    k = (h.size + select_every - 1) // select_every
    hp = np.concatenate(
        [h, np.full(k * select_every - h.size, np.iinfo(np.int64).max)]
    )
    mins = hp.reshape(k, select_every).min(axis=1)
    return list(dict.fromkeys(mins.tolist()))  # stable distinct


def winnow_fingerprint_pandas(window: int = 8, select_every: int = 4):
    """Arrow-batched numpy twin of winnow_fingerprint: identical integers,
    ~10x the throughput of the interpreted HOF fold -- the rolling hash is
    w numpy ops over all window positions at once instead of len*w
    interpreted lambda steps per document.

    Portability caveats (why the HOF version remains the oracle
    reference): Python ``str.lower`` and Java ``toLowerCase`` disagree on
    a few exotic codepoints (Turkish dotted I, final sigma), and ``\\s``
    is ASCII-pinned here to match Java's default.  Equality is asserted in
    tests on mixed-unicode corpora (fixed + hypothesis-random) and
    transitively by the winnow_overlap oracle (the driver query uses THIS
    variant)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow_sketch_py(t, window, select_every))

    return udf


# (name, pattern, replacement): RE2/Java/Python-portable, no lookaround.
# Order matters: emails first (their digits must not look like phones),
# IPv4 before phone (dotted quads match the loose phone class otherwise).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
]


def redact_pii(c: Column) -> Column:
    """Training-data hygiene: emails / IPv4s / phone-ish digit runs
    replaced with typed placeholders, as a codegen'd regexp chain (the
    same shared-rule-table pattern as the query fingerprint, so the SQL
    oracle is generated from PII_RULES and cannot drift)."""
    s = c
    for _, pat, rep in PII_RULES:
        s = F.regexp_replace(s, pat, rep)
    return s


def pii_counts(c: Column) -> list[Column]:
    """Per-rule match counts (BEFORE redaction), aliased n_<rule>."""
    cols = []
    s = c
    for name, pat, rep in PII_RULES:
        cols.append(
            F.size(F.regexp_extract_all(s, F.lit(f"({pat})"), 1))
            .cast("long")
            .alias(f"n_{name}")
        )
        # count on the progressively-redacted text so later rules don't
        # recount inside earlier matches (mirrors the replace chain)
        s = F.regexp_replace(s, pat, rep)
    return cols


def deterministic_sample_filter(
    key: Column, rate_pct: int, salt: str = ""
) -> Column:
    """Keep-filter for reproducible sampling: md5-hash the key (+salt),
    keep iff hash % 100 < rate_pct.  Unlike df.sample() this is stable
    across runs, partitionings and engines (oracle-checkable), and
    composable (different salts -> independent subsamples)."""
    from mariadb_to_graylog_spark.operators.dedup import h32

    return h32(F.concat(key.cast("string"), F.lit(salt))) % 100 < rate_pct


def stratified_sample_filter(
    key: Column, strata: Column, rates_pct: dict[str, int], salt: str = ""
) -> Column:
    """Per-stratum deterministic sampling (language rebalancing, the
    standard curation move): each stratum keeps its own hash-mod rate;
    unlisted strata are dropped.  Same stability/composability properties
    as ``deterministic_sample_filter``."""
    from mariadb_to_graylog_spark.operators.dedup import h32

    rate = F.lit(0)
    for k, v in rates_pct.items():
        rate = F.when(strata == k, F.lit(int(v))).otherwise(rate)
    return h32(F.concat(key.cast("string"), F.lit(salt))) % 100 < rate


def token_rarity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, n_hapax, n_rare, hapax_frac, rare_frac) --
    corpus-frequency profile of each document's tokens: ``n_hapax``
    counts occurrences of tokens appearing EXACTLY ONCE in the whole
    corpus, ``n_rare`` occurrences of tokens appearing <= ``rare_max``
    times.  A high hapax fraction is the classic OCR-garbage /
    gibberish / mojibake signal (quality_score's length/punct heuristics
    miss it because garbage can be well-shaped); a LOW one on a large
    corpus flags template text.  Fractions are exact integer sums with
    one rounded division (fp-order-stable).

    Shape: token OCCURRENCES (doc_id, token) shuffle once into the
    corpus-frequency aggregate (map-side partial counts collapse
    repeated tokens before the wire), the frequency table joins back on
    the token key -- Catalyst broadcasts a small vocabulary and
    shuffle-joins an unbounded one -- and the per-doc reduction is a
    standard two-phase aggregate.  Tokenless documents report zeros."""
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    freq = (
        occ.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    hapax = (F.col("_cnt") == 1).cast("long")
    rare = (F.col("_cnt") <= rare_max).cast("long")
    joined = occ.join(freq, "tok", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("tok").alias("n_tokens"),
            F.coalesce(F.sum(hapax), F.lit(0)).alias("n_hapax"),
            F.coalesce(F.sum(rare), F.lit(0)).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_hapax",
            "n_rare",
            F.round(
                F.col("n_hapax") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
            ).alias("hapax_frac"),
            F.round(
                F.col("n_rare") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
            ).alias("rare_frac"),
        )
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int = 65536,
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, surprisal): mean per-token negative
    log-likelihood (nats) under a unigram LM trained on THIS corpus --
    the CCNet-style perplexity-proxy quality signal without an external
    LM.  ``p(tok) = corpus_count / N`` for the ``top_v`` most frequent
    tokens (ties broken by token text, deterministically); everything
    else is out-of-vocabulary at the ``1/N`` floor.  High surprisal =
    gibberish/OCR garbage/wrong-language text; LOW surprisal on a large
    doc = template boilerplate -- the two tails a quality gate cuts.
    ``token_rarity`` is the count-based sibling; this one weights every
    token by how improbable it is, not just the rare ones.

    fp determinism: per-token surprisal is quantized to integer
    MICRO-nats (``round((ln N - ln count) * 1e6)`` as long) in the V-row
    vocab table, so per-doc totals are EXACT integer sums -- immune to
    float summation order across partitions/engines -- with one rounded
    division at the end (the repo-wide fp-order-stability rule).

    Shape: one token-occurrence shuffle into the vocab count (map-side
    partials collapse repeats), a top-V cutoff via TakeOrdered (per-
    partition heaps, never a global sort), the V-row vocab BROADCAST
    back onto the occurrence stream, and a standard two-phase per-doc
    aggregate.  N (total token count) is a single driver-side scalar
    (one count job), like the k-means centroid collect -- not a
    distributed-loop smell.  Tokenless documents report n_tokens=0 and
    NULL surprisal."""
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    toks = occ.filter(F.col("tok").isNotNull())
    # scalar N; max(1) keeps ln defined on an all-tokenless corpus
    # (no token rows exist, so the value is never consumed)
    n_total = max(toks.count(), 1)
    ln_n = F.log(F.lit(float(n_total)))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.desc("_cnt"), F.asc("tok"))
        .limit(top_v)
        .select(
            "tok",
            F.round((ln_n - F.log(F.col("_cnt").cast("double"))) * 1e6)
            .cast("long")
            .alias("_micro"),
        )
    )
    oov_micro = F.round(ln_n * 1e6).cast("long")
    joined = occ.join(F.broadcast(vocab), "tok", "left")
    per_tok = F.when(
        F.col("tok").isNotNull(), F.coalesce(F.col("_micro"), oov_micro)
    )
    agg = joined.groupBy("doc_id").agg(
        F.count("tok").cast("long").alias("n_tokens"),
        F.coalesce(
            F.sum(
                (F.col("tok").isNotNull() & F.col("_micro").isNull()).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_oov"),
        F.sum(per_tok).alias("_sum_micro"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_sum_micro") / (F.col("n_tokens") * F.lit(1e6)), 6),
        ).alias("surprisal"),
    )


def stratified_quota_sample(
    df: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACT-count data mixing: keep exactly min(quota, stratum size)
    rows per stratum, chosen by salted-hash rank -- the operator behind
    "train on 2M en, 500k de, 500k fr".  ``stratified_sample_filter`` is
    the RATE twin; rates cannot hit an exact document/token budget, and
    budgets are what mixture specs are written in.  Selection is
    deterministic across runs, partitionings and engines (md5-hash
    order, id tie-break), stable under corpus GROWTH in the sense that a
    doc can only leave the sample when a lower-hash doc displaces it,
    and composable (different salts draw independent samples).  Unlisted
    strata are dropped.

    Shape: one rank window per stratum.  The window sorts each listed
    stratum; at corpus scale pre-shrink the input with the hash-mod
    rate filter (keep ~1.5x quota/size) and exact-rank the survivors --
    the top-k by hash among survivors equals the global top-k whenever
    >= k survive, so the pre-filter is a pure optimization with a
    Chernoff-bounded failure probability the caller sizes."""
    from pyspark.sql.window import Window

    from mariadb_to_graylog_spark.operators.dedup import h32

    quota = F.lit(0)
    for k, v in quotas.items():
        quota = F.when(F.col(strata_col) == k, F.lit(int(v))).otherwise(quota)
    rk = h32(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(rk.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_quota", quota)
        .filter(F.col("_quota") > 0)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_quota", "_rk")
    )


def domain_language_mix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(domain, lang, n_docs, lang_share, is_dominant) -- the language
    distribution of each CITED registrable domain: the routing table a
    web-curation pipeline uses to send a domain's crawl to the right
    language pipeline (and to flag domains whose mix is too diffuse to
    route).  ``lang_share`` = n_docs / domain total (exact integer sums,
    one rounded division); ``is_dominant`` marks the plurality language,
    ties broken lexicographically so the flag is deterministic.

    Shape: one URL-extraction pass map-side, distinct domains per doc
    explode (a doc citing a domain once or thrice counts once), ONE
    exchange on (domain, lang) for the count, and the per-domain total /
    dominant flag ride a window over the already-partitioned domain key
    -- same single-scan discipline as ``domain_reputation``."""
    from pyspark.sql.window import Window

    per = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(
            F.array_distinct(
                F.transform(
                    extract_urls(F.col(text_col)),
                    lambda u: registrable_domain(url_host(u)),
                )
            )
        ).alias("domain"),
    )
    counts = per.groupBy("domain", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("domain")
    total = F.sum("n_docs").over(w)
    # plurality = min (-n_docs, lang) struct: largest count first, ties
    # resolve to the lexicographically smallest lang -- deterministic
    me = F.struct((-F.col("n_docs")).alias("negn"), F.col("lang").alias("l"))
    top = F.min(me).over(w)
    return counts.select(
        "domain",
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("lang_share"),
        (me == top).alias("is_dominant"),
    )


def word_bigrams(c: Column) -> Column:
    """Adjacent token pairs ('a b'), the unit of repetition detection."""
    toks = tokens(c)
    n = F.size(toks)
    # try_element_at: the trailing index overruns on <2-token docs and
    # must yield NULL (concat_ws skips it), not an ANSI error
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.try_element_at(toks, i), F.try_element_at(toks, i + 1)
        ),
    )


def dup_bigram_ratio(c: Column, round_digits: int = 6) -> Column:
    """Repetition / boilerplate signal: 1 - distinct/total word bigrams.
    Templated or looping text scores high; the classic heuristic for
    dropping machine-generated boilerplate from a training corpus."""
    grams = word_bigrams(c)
    total = F.size(grams).cast("double")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
        round_digits,
    )


def token_length_percentiles(
    df: DataFrame,
    text_col: str = "text",
    by: str = "lang",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group token-count distribution (corpus length profiling --
    the standard pre-training mix diagnostic).

    ``approx=False`` uses EXACT interpolated ``percentile`` (matches
    DuckDB ``quantile_cont`` bit-for-bit -- the oracle path) but buffers
    each group's values: fine for thousands of groups x bounded samples.
    ``approx=True`` uses ``approx_percentile`` (mergeable fixed-memory
    sketch, rank error <= n/accuracy) -- the 100 TB default, where an
    exact per-group sort/buffer is the thing to avoid."""
    fname = "approx_percentile" if approx else "percentile"
    extra = f", {accuracy}" if approx else ""
    arr = ", ".join(str(p) for p in ps)
    qexpr = F.expr(f"{fname}(n, array({arr}){extra})")
    base = df.select(F.col(by).alias(by), token_count(F.col(text_col)).alias("n"))
    agg = base.groupBy(by).agg(
        qexpr.alias("_q"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("n"), 6).alias("mean_tokens"),
    )
    cols = [
        F.round(F.col("_q").getItem(i).cast("double"), 6).alias(
            f"p{int(p * 100)}"
        )
        for i, p in enumerate(ps)
    ]
    return agg.select(by, "n_docs", "mean_tokens", *cols)


# --- URL / domain extraction + per-source reputation ------------------------

# one capture group, RE2/Java-portable (no lookarounds): scheme + host
# (letters/digits/dots/dashes, MUST end alphanumeric -- a plain greedy
# class would swallow sentence-ending '.'/'-' and corrupt every host and
# registrable domain harvested from prose), optional port, optional path
# of non-whitespace -- the C4/RefinedWeb-style URL harvest, not a full
# RFC 3986 parser
URL_PATTERN = r"(https?://[A-Za-z0-9](?:[A-Za-z0-9.\-]*[A-Za-z0-9])?(?::\d+)?(?:/[^\s]*)?)"
HOST_PATTERN = r"https?://([A-Za-z0-9](?:[A-Za-z0-9.\-]*[A-Za-z0-9])?)"


def extract_urls(c: Column) -> Column:
    """All URLs in the text, in order of appearance."""
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 1)


def url_host(u: Column) -> Column:
    """Hostname of one URL ('' if the value is not a URL)."""
    return F.regexp_extract(u, HOST_PATTERN, 1)


def registrable_domain(host: Column) -> Column:
    """Last two dot-labels of a hostname (cdn.assets.example.com ->
    example.com; a bare single-label host maps to itself).  A public
    suffix list would refine co.uk-style TLDs; the two-label fold is the
    deterministic, dependency-free default."""

    def _fold(parts: Column) -> Column:
        return F.array_join(
            F.slice(parts, F.greatest(F.size(parts) - 1, F.lit(1)), 2), "."
        )

    return bind_once(F.split(host, r"\."), _fold)


def url_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_urls, hosts, domains) per document: URL count plus the
    sorted-distinct host and registrable-domain lists as ','-joined
    strings (join-stable for oracle hashing).  Entirely map-side -- one
    regexp pass bound once, higher-order transforms over the match list,
    no shuffle at all."""

    def _feats(urls: Column) -> Column:
        hosts = F.array_sort(F.array_distinct(F.transform(urls, url_host)))
        doms = F.array_sort(
            F.array_distinct(
                F.transform(urls, lambda u: registrable_domain(url_host(u)))
            )
        )
        return F.struct(
            F.size(urls).cast("long").alias("n_urls"),
            F.array_join(hosts, ",").alias("hosts"),
            F.array_join(doms, ",").alias("domains"),
        )

    # bind the regexp match list once (HOFs have no CSE; see bind_once)
    feats = bind_once(extract_urls(F.col(text_col)), _feats)
    return df.select(F.col(id_col).alias("doc_id"), feats.alias("_f")).select(
        "doc_id", "_f.n_urls", "_f.hosts", "_f.domains"
    )


def source_reputation(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source reputation signals joined back to every document (the
    C4/RefinedWeb-style source-quality feature):

    (doc_id, source, src_n_docs, src_dup_rate, src_mean_chars,
     src_stop_ratio)

    * dup_rate   = 1 - distinct(md5(text))/n  (verbatim-dup share)
    * mean_chars = chars/doc
    * stop_ratio = english stopword tokens / all tokens

    All ratios are single divisions of EXACT integer sums, so the values
    are bit-stable under any aggregation order (a mean of per-doc doubles
    would be fp-order-dependent and break oracle hashing).  The source
    table is tiny by definition (sources << documents), so the join back
    is an explicit broadcast -- zero shuffle of the document side."""
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("_h"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        token_count(F.col(text_col)).alias("_tok"),
        stopword_count(F.col(text_col), "en").alias("_stop"),
    )
    src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("src_n_docs"),
        F.count_distinct("_h").alias("_nd"),
        F.sum("_chars").alias("_sc"),
        F.sum("_tok").alias("_st"),
        F.sum("_stop").alias("_ss"),
    ).select(
        "source",
        "src_n_docs",
        F.round(
            (F.col("src_n_docs") - F.col("_nd")).cast("double")
            / F.col("src_n_docs"),
            6,
        ).alias("src_dup_rate"),
        F.round(
            F.col("_sc").cast("double") / F.col("src_n_docs"), 6
        ).alias("src_mean_chars"),
        F.round(
            F.col("_ss").cast("double") / F.greatest("_st", F.lit(1)), 6
        ).alias("src_stop_ratio"),
    )
    # eqNullSafe join: a NULL source is a legitimate group (groupBy keeps
    # it) and the contract is "joined back to EVERY document" -- a plain
    # equality join would silently drop null-source docs
    docs_side = df.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    rep = F.broadcast(src.withColumnRenamed("source", "_src"))
    return docs_side.join(
        rep, docs_side["source"].eqNullSafe(rep["_src"])
    ).select(
        "doc_id",
        "source",
        "src_n_docs",
        "src_dup_rate",
        "src_mean_chars",
        "src_stop_ratio",
    )


def domain_reputation(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, domain, dom_n_docs, dom_mean_chars, dom_stop_ratio) --
    one row per (document, cited registrable domain): the C4/RefinedWeb
    source signal derived from the URLS A DOCUMENT CITES rather than its
    ingest provenance (``source_reputation`` covers that axis).

    Shape: per-doc metrics are computed ONCE map-side (genuinely once:
    the per-domain reduction is a WINDOW over ``domain``, so the plan has
    a single scan branch -- the earlier groupBy + join-back re-evaluated
    the URL-regex extraction on both join sides), then ONE exchange on
    the 8-to-30-byte domain key carries (doc_id, domain, 3 ints) into the
    window aggregate.  Exact integer sums, single rounded division --
    fp-order-stable like source_reputation.  Distinct registrable domains
    are UNBOUNDED on a web corpus (unlike ingest sources), which is why
    this shuffles on domain rather than pinning any broadcast.  Documents
    citing no URL simply contribute no rows."""
    from pyspark.sql.window import Window

    per = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        token_count(F.col(text_col)).alias("_tok"),
        stopword_count(F.col(text_col), "en").alias("_stop"),
        F.explode(
            F.array_distinct(
                F.transform(
                    extract_urls(F.col(text_col)),
                    lambda u: registrable_domain(url_host(u)),
                )
            )
        ).alias("domain"),
    )
    w = Window.partitionBy("domain")
    n = F.count(F.lit(1)).over(w)
    return per.select(
        "doc_id",
        "domain",
        n.cast("long").alias("dom_n_docs"),
        F.round(F.sum("_chars").over(w).cast("double") / n, 6).alias(
            "dom_mean_chars"
        ),
        F.round(
            F.sum("_stop").over(w).cast("double")
            / F.greatest(F.sum("_tok").over(w), F.lit(1)),
            6,
        ).alias("dom_stop_ratio"),
    )


def key_skew_stats(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective groupBy/join key: per-key
    counts (ONE partial-aggregated shuffle carrying key+count only --
    rows never move), top-N keys via TakeOrderedAndProject (per-partition
    heaps, no global sort), each with an integer-ppm share of all rows.
    This is the table a skew decision reads BEFORE paying for a salted
    join: a top key holding >~5% of a 10^12-row table is the shuffle
    straggler.  The row total is one driver-side scalar (the
    unigram-surprisal-N idiom); shares are exact integer arithmetic."""
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = int(counts.agg(F.sum("cnt")).first()[0] or 1)
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "share_ppm", F.expr(f"cnt * 1000000L div {total}").cast("long")
        )
        .select("rank", "key", "cnt", "share_ppm")
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """First BPE iteration's merge-candidate table (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"): the
    most frequent ADJACENT CHARACTER PAIRS inside words, weighted by word
    occurrence count -- the statistic a tokenizer-training run computes
    over the corpus before picking its first merge.

    Scale shape (the whole point): the corpus collapses to the DISTINCT
    WORD FREQUENCY table first (groupBy(word), partial-aggregated
    map-side -- vocabulary grows ~sublinearly while the corpus grows
    linearly), and pair explosion runs over that small table only; a
    100 TB corpus never explodes per-occurrence pairs.  The final pair
    table is bounded by |charset|^2 (~1.3k rows for [a-z0-9]), so the
    global top-k sort is a driver-scale afterthought, not a real sort.

    Returns (rank, pair, n_occurrences, n_words): occurrence-weighted
    pair count (within-word multiplicity counted, as BPE does) and the
    number of distinct words containing the pair; deterministic total
    order (count desc, pair asc)."""
    from pyspark.sql.window import Window

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        "word",
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("cnt").cast("long").alias("n_occurrences"),
        F.count_distinct(F.col("word")).cast("long").alias("n_words"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("rank", "pair", "n_occurrences", "n_words")
    )


def word_bigrams_strict(c: Column) -> Column:
    """True adjacent token pairs: EMPTY array for <2-token docs.
    ``word_bigrams`` (the repetition-ratio helper) degrades to a unigram
    pseudo-pair on 1-token docs by design; corpus-frequency consumers
    (``bigram_novelty``) must not count those as transitions."""
    toks = tokens(c)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.try_element_at(toks, i), F.try_element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max: int = 2,
) -> DataFrame:
    """Corpus-frequency transition QC: per document, how many of its word
    bigrams are RARE in the whole corpus (corpus occurrence count <=
    ``rare_max``) -- the cheap distributed stand-in for an n-gram
    language-model perplexity gate.  Gibberish, OCR noise, and
    machine-translation artifacts are exactly the documents whose
    transitions nobody else makes; boilerplate scores ~0.

    Integer end-to-end (counts and a floor'd ppm ratio), so results are
    float-order-independent and oracle-hashable -- a mean-log-prob score
    would depend on float summation order across partitions.

    Scale shape: one explode + groupBy(bigram) builds the corpus
    frequency table (partial-aggregated map-side); per-doc occurrences
    join it ON THE BIGRAM KEY (both sides shuffle once on the same key,
    no broadcast needed -- the frequency table is corpus-sized); the
    per-doc rollup shuffles (doc_id, 3 ints).  Docs with <2 tokens
    surface with n_bigrams=0 and NULL min_count, not silently dropped."""
    occ = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(word_bigrams_strict(F.col(text_col))).alias("bg"),
    )
    freq = (
        occ.filter(F.col("bg").isNotNull())
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("corpus_n"))
    )
    scored = (
        occ.join(freq, "bg", "left")
        .groupBy("_id")
        .agg(
            F.count(F.col("bg")).cast("long").alias("n_bigrams"),
            F.sum(
                F.when(F.col("corpus_n") <= rare_max, 1).otherwise(0)
            ).cast("long").alias("n_rare"),
            F.min("corpus_n").cast("long").alias("min_count"),
        )
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        F.coalesce(F.col("n_rare"), F.lit(0)).cast("long").alias("n_rare"),
        "min_count",
        F.when(
            F.col("n_bigrams") > 0,
            F.floor(
                F.coalesce(F.col("n_rare"), F.lit(0)) * 1000000 / F.col("n_bigrams")
            ),
        ).cast("long").alias("novelty_ppm"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    thresholds: tuple[int, ...] = (1, 2, 4, 8, 16),
) -> DataFrame:
    """Vocabulary-pruning decision table: for each min-count threshold t,
    how many distinct words survive (count >= t) and what fraction of all
    TOKEN OCCURRENCES they cover -- the table consulted when choosing a
    tokenizer min-frequency / vocab floor (drop hapaxes? everything under
    16?) or a rare-word QC cutoff.

    Deliberately SORT-FREE: coverage is computed against COUNT thresholds,
    not top-V ranks, so the whole thing is one groupBy(word) (partial-
    aggregated map-side) plus one conditional aggregate over the vocab
    table -- no global rank window, which would funnel a 100M-word
    vocabulary through a single partition.  (Rank-style top-k lives in
    ``key_skew_stats`` / ``bpe_merge_candidates``, where the table is
    bounded.)  Integer ppm end-to-end."""
    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    arms = [
        F.struct(
            F.lit(t).cast("long").alias("min_count"),
            F.when(F.col("cnt") >= t, F.lit(1)).otherwise(0).cast("long").alias("w"),
            F.when(F.col("cnt") >= t, F.col("cnt")).otherwise(0).cast("long").alias("o"),
        )
        for t in thresholds
    ]
    per = wc.select(
        F.col("cnt"), F.explode(F.array(*arms)).alias("_a")
    ).select("cnt", "_a.*")
    agg = per.groupBy("min_count").agg(
        F.sum("w").cast("long").alias("n_words"),
        F.sum("o").cast("long").alias("n_occurrences"),
        F.sum("cnt").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_vocab"),
    )
    return agg.select(
        "min_count",
        "n_words",
        "n_occurrences",
        F.floor(F.col("n_occurrences") * 1000000 / F.col("_total"))
        .cast("long")
        .alias("coverage_ppm"),
        F.floor(F.col("n_words") * 1000000 / F.col("_vocab"))
        .cast("long")
        .alias("vocab_share_ppm"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    n_buckets: int = 8192,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    scores: per-document mean log importance ratio
    ``log(p_target(tok)/p_raw(tok))`` under HASHED unigram bag-of-words
    models -- p_target trained on a small in-domain ``target`` sample,
    p_raw on the corpus itself (``df``).  Positive = target-like, the
    rank a quality-by-example selection keeps from the top of; unlike
    the heuristic gates (``quality_score``) this needs no hand-tuned
    weights, only examples of what good data looks like.

    Feature hashing: token -> h32 % ``n_buckets`` -- the vocabulary
    never matters, both models live in the same fixed B-dim simplex
    with add-1 smoothing (p(b) = (cnt_b + 1)/(N + B)), so unseen
    buckets contribute a well-defined floor instead of -inf.

    fp determinism (repo rule): the per-bucket log ratio
    ``ln(ct+1) - ln(Nt+B) - ln(cr+1) + ln(Nr+B)`` is quantized to
    integer MICRO-nats in the B-row bucket table, per-doc totals are
    EXACT integer sums (immune to float order across partitions and
    engines), one rounded division at the end.

    Shape at scale: one token-occurrence shuffle per model into the
    bucket counts (map-side partials collapse repeats), the B-row table
    BROADCASTS back onto the corpus occurrence stream, one standard
    per-doc aggregate.  N_t / N_r are single driver-side scalars (the
    k-means-centroid idiom).  Tokenless docs report n_tokens=0 and a
    NULL ratio.
    """
    from mariadb_to_graylog_spark.operators.dedup import h32

    bucket = lambda tok: h32(tok) % n_buckets  # noqa: E731
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    raw_occ = occ.filter(F.col("tok").isNotNull()).select(bucket(F.col("tok")).alias("b"))
    tgt_occ = target.select(
        F.explode(tokens(F.col(target_text_col))).alias("tok")
    ).select(bucket(F.col("tok")).alias("b"))
    n_raw = max(raw_occ.count(), 1)
    n_tgt = max(tgt_occ.count(), 1)
    raw_cnt = raw_occ.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_cnt = tgt_occ.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    const = F.log(F.lit(float(n_raw + n_buckets))) - F.log(
        F.lit(float(n_tgt + n_buckets))
    )
    table = (
        raw_cnt.join(tgt_cnt, "b", "full")
        .select(
            "b",
            F.round(
                (
                    F.log(F.coalesce(F.col("ct"), F.lit(0)).cast("double") + 1.0)
                    - F.log(F.coalesce(F.col("cr"), F.lit(0)).cast("double") + 1.0)
                    + const
                )
                * 1e6
            )
            .cast("long")
            .alias("_micro"),
        )
    )
    # buckets absent from BOTH counts never appear in occurrences either,
    # so the full-outer table covers every probed key
    floor_micro = F.round(const * 1e6).cast("long")
    joined = occ.withColumn(
        "b", F.when(F.col("tok").isNotNull(), bucket(F.col("tok")))
    ).join(F.broadcast(table), "b", "left")
    per_tok = F.when(
        F.col("tok").isNotNull(), F.coalesce(F.col("_micro"), floor_micro)
    )
    agg = joined.groupBy("doc_id").agg(
        F.count("tok").cast("long").alias("n_tokens"),
        F.sum(per_tok).alias("_sum_micro"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_sum_micro") / (F.col("n_tokens") * F.lit(1e6)), 6),
        ).alias("log_ratio"),
    )


_TRACKING_PARAM = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)="


def canonical_url(u: Column) -> Column:
    """Crawl-frontier URL canonicalization, the dedup key a fetch queue
    collapses on BEFORE fetching (the cheapest dedup there is -- no
    bytes downloaded):

    * scheme and host lowercased, a leading ``www.`` stripped
    * default ports dropped (``http:80`` / ``https:443``); others kept
    * the fragment dropped (never sent to the server)
    * tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
      ``msclkid``, ``ref``, ``mc_cid``/``mc_eid``), survivors SORTED so
      param order stops mattering; an emptied query drops its ``?``
    * trailing slashes stripped from the path (root == no path)

    Pure engine-portable string ops (regexp extract/replace + HOF
    filter/sort over the param split) -- no UDF, identical in the
    DuckDB oracle.  Non-URL input canonicalizes to ``''``.
    """
    scheme = F.lower(F.regexp_extract(u, r"^(https?)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^https?://([^/:?#]+)", 1)),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(u, r"^https?://[^/:?#]+:(\d+)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    path = F.regexp_replace(
        F.regexp_extract(u, r"^https?://[^/?#]+(/[^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(u, r"^https?://[^?#]*\?([^#]*)", 1)

    def _clean(parts: Column) -> Column:
        kept = F.filter(
            parts,
            lambda p: (F.length(p) > 0)
            & (F.regexp_extract(p, _TRACKING_PARAM, 1) == ""),
        )
        return F.array_join(F.array_sort(kept), "&")

    q = bind_once(F.split(query, "&"), _clean)
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        )
    )


def url_variant_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-CANONICAL-URL variant collapse table over every URL occurrence
    in the corpus: (canonical_url, n_occurrences, n_raw_forms, n_docs).
    n_raw_forms >= 2 is the crawl-frontier savings report -- fetches the
    tracking-param/www/fragment noise would have duplicated.

    Shape: one regexp pass + canonicalization map-side, ONE exchange on
    the canonical key carrying (canonical, md5(raw), doc_id) -- raw URLs
    travel as 32-byte hashes, text never moves.  Distinct counts are
    exact; swap to approx_count_distinct at corpus scale if +-2% serves
    (the ``paragraph_frequency`` HLL precedent)."""
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(extract_urls(F.col(text_col))).alias("raw"),
    ).select("doc_id", "raw", canonical_url(F.col("raw")).alias("canonical_url"))
    return (
        occ.filter(F.col("canonical_url") != "")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct(F.md5("raw")).cast("long").alias("n_raw_forms"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
    )


def strip_html(c: Column) -> Column:
    """WET-style text extraction from raw HTML: drop <script>/<style>
    subtrees (their CONTENT is code, not text), drop comments, flatten
    every remaining tag to a space, decode the six entities that occur
    in running text, collapse whitespace.  Pure engine-portable regexp
    chain -- (?is) flags and non-greedy spans work identically in Java
    regex and RE2, so the DuckDB oracle is byte-identical -- and no UDF:
    at 100 TB this runs inside whole-stage codegen on the raw crawl
    scan, the very first stage of the pipeline.  A DOM parser would be
    more faithful on pathological markup; the regexp chain is the
    deterministic, dependency-free default (trafilatura-class recall is
    a PIL-style gated extension, stated not hidden)."""
    out = F.regexp_replace(c, r"(?is)<script\b.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.regexp_replace(F.regexp_replace(out, r"\s+", " "), r"^\s+|\s+$", "")


def html_extract_stats(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(doc_id, text, n_tags, n_links, text_chars, link_density_ppm):
    the raw-crawl extraction table -- stripped running text plus the
    boilerplate signals a keep/drop gate reads (link-heavy nav shells
    have high link counts per extracted char).  link_density_ppm =
    n_links * 1e6 div max(text_chars, 1), integer end-to-end (the repo
    ppm rule).  Entirely map-side: one bound regexp chain per row, zero
    shuffle."""
    h = F.col(html_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        strip_html(h).alias("text"),
        F.size(F.regexp_extract_all(h, F.lit(r"(<)[A-Za-z/!]"), 1))
        .cast("long")
        .alias("n_tags"),
        F.size(F.regexp_extract_all(h, F.lit(r"(?i)(<a)\b"), 1))
        .cast("long")
        .alias("n_links"),
    ).withColumn("text_chars", F.length("text").cast("long"))
    return base.withColumn(
        "link_density_ppm",
        F.expr("n_links * 1000000L div greatest(text_chars, 1L)").cast("long"),
    )


def nfc_normalize_udf():
    """Vectorized Unicode NFC normalization (Arrow-batched pandas UDF --
    Spark ships no normalization expression; Python's unicodedata and
    DuckDB's nfc_normalize both implement the Unicode standard, so the
    oracle is exact).  NULLs pass through."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if isinstance(x, str) else x
        )

    return _nfc


def unicode_nfc_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalization-form dedup: documents byte-identical AFTER Unicode
    NFC (composed e-acute vs e + combining acute, and every other
    canonical-equivalence split a copy-paste pipeline produces) grouped
    by md5 of the normalized text -- (nfc_md5, n_docs, n_byte_forms,
    min_id).  n_byte_forms > 1 = dupes that are INVISIBLE to raw-byte
    md5 dedup yet render identically on screen.  One Arrow-batched
    normalization pass map-side; the exchange carries (two md5s, id),
    never text."""
    nfc = nfc_normalize_udf()
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("_raw_md5"),
        F.md5(nfc(F.col(text_col))).alias("nfc_md5"),
    )
    return keyed.groupBy("nfc_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("_raw_md5").cast("long").alias("n_byte_forms"),
        F.min("id").alias("min_id"),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document -- the classic content
    descriptor (topic tagging, index terms, near-dup EXPLANATION: which
    terms make two docs similar).  Returns (doc_id, rank, token, tf,
    score_micro) with rank 1..k.

    fp determinism (repo rule): idf = ln(N / df) is quantized to integer
    MICRO-nats once per term, score = tf * idf_micro is an exact integer
    product, ranking ties break on token text -- the same ordering in
    both engines, no float comparison anywhere.

    Shape at scale: one token-occurrence shuffle into (doc, token, tf);
    document frequency aggregates over the DISTINCT (doc, token) pairs
    already in hand; the df table is vocabulary-sized so it JOINS on the
    token key (a vocabulary does not broadcast at web scale -- this is a
    plain shuffle join by design, stated); the per-doc top-k window is
    bounded by each doc's distinct-term count.  N is one driver-side
    scalar (the centroid idiom).  Tokenless docs yield no rows."""
    from pyspark.sql.window import Window

    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    tf = occ.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    n_docs = max(df.select(id_col).distinct().count(), 1)
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    idf = dfreq.select(
        "tok",
        F.round((F.log(F.lit(float(n_docs))) - F.log(F.col("_df").cast("double"))) * 1e6)
        .cast("long")
        .alias("_idf_micro"),
    )
    scored = tf.join(idf, "tok").withColumn(
        "score_micro", (F.col("tf") * F.col("_idf_micro")).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", F.col("tok").alias("token"), "tf", "score_micro")
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) -- the
    corpus-model-FREE gibberish/encoding-noise signal: mojibake and
    base64 blobs run hot (high entropy), stuck-key/banner spam runs cold
    (low), while ``unigram_surprisal`` needs a corpus LM and
    ``token_rarity`` a frequency table, this needs only the doc itself.

    fp determinism (repo rule): entropy = (1/n) * sum_c cnt_c *
    ln(n/cnt_c); each per-character term is quantized to an integer
    micro-nat product (cnt_c * round(ln(n/cnt_c) * 1e6)), summed
    exactly, divided once -- no float accumulation order anywhere.

    Shape: one (doc, char) exchange (map-side combined), the per-doc
    total rides a window on the same key, one final per-doc aggregate.
    Empty/NULL docs report n_chars=0 with NULL entropy."""
    from pyspark.sql.window import Window

    # filter the split BEFORE the outer explode: split('') yields ['']
    # whose lone element a post-explode filter would drop, losing the
    # doc's row entirely -- an empty filtered array explodes to one NULL
    # row instead, keeping the doc
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.filter(
                F.split(F.col(text_col), ""), lambda c: F.length(c) > 0
            )
        ).alias("ch"),
    )
    counts = occ.groupBy("doc_id", "ch").agg(
        F.count("ch").cast("long").alias("cnt")
    )
    w = Window.partitionBy("doc_id")
    per = counts.withColumn("n", F.sum("cnt").over(w)).withColumn(
        "_term",
        F.when(
            F.col("ch").isNotNull(),
            F.col("cnt")
            * F.round(
                (
                    F.log(F.col("n").cast("double"))
                    - F.log(F.col("cnt").cast("double"))
                )
                * 1e6
            ).cast("long"),
        ),
    )
    agg = per.groupBy("doc_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ch").isNotNull(), F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("n_chars"),
        F.sum("_term").alias("_sum_micro"),
    )
    return agg.select(
        "doc_id",
        "n_chars",
        F.when(
            F.col("n_chars") > 0,
            F.round(F.col("_sum_micro") / (F.col("n_chars") * F.lit(1e6)), 6),
        ).alias("entropy"),
    )
