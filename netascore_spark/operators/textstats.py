"""Text analytics for training-data pipelines over the ``documents`` table.

Language-ID (stopword heuristic), quality scoring, token counting, document
fingerprinting.  All built from native ``pyspark.sql.functions`` so they are
whole-stage-codegen'd AND expressible as ANSI SQL for the DuckDB oracle
(same formulas in ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists (public-knowledge common words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
}

# explicit class, not \s: Java's \s includes \x0B (vertical tab) while
# DuckDB/RE2's does not — the oracle uses the same literal class so a
# VT-containing document tokenizes identically in engine and oracle.
TOKEN_SPLIT = "[ \\t\\n\\f\\r]+"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), TOKEN_SPLIT)


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text -> 0)."""
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens(text)))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(arr, t))
    )


def lang_id(text: Column) -> Column:
    """Argmax over per-language stopword hit counts; NULL when no hits."""
    en, de, fr = (stopword_hits(text, lang) for lang in ("en", "de", "fr"))
    best = F.greatest(en, de, fr)
    return (
        F.when(best <= 0, F.lit(None).cast("string"))
        .when(en == best, "en")  # tie-break order en > de > fr (documented)
        .when(de == best, "de")
        .otherwise("fr")
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + word shape +
    punctuation density.  Pure arithmetic -> SQL-portable."""
    n_chars = F.length(text)
    n_words = token_count(text)
    avg_word = n_chars / F.greatest(n_words, F.lit(1))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_score = F.when((avg_word >= 3) & (avg_word <= 12), 1.0).otherwise(0.5)
    return F.round(0.6 * len_score + 0.4 * word_score, 4)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 hex (identical in Spark and DuckDB)."""
    return F.md5(text)


# ---------------------------------------------------------------------------
# BPE-ish tokenization (GPT-2-style pre-tokenizer shape, lookahead-free so
# the SAME pattern runs under Java regex (Spark) and RE2 (DuckDB oracle))
# ---------------------------------------------------------------------------

# whitespace is the EXPLICIT class [ \t\n\f\r], not \s: Java's \s includes
# \x0B (vertical tab) while RE2's does not — a document containing VT would
# tokenize differently between engine and DuckDB oracle
BPE_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N} \t\n\f\r]+|[ \t\n\f\r]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens: letter runs / digit runs / punctuation runs,
    each optionally taking one leading space (the GPT-2 pre-tokenizer
    shape, minus its RE2-incompatible ``(?!\\S)`` lookahead)."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03:
# "Winnowing: Local Algorithms for Document Fingerprinting")
# ---------------------------------------------------------------------------

_WINNOW_P = (1 << 61) - 1  # same modulus as the MinHash permutation space


def _hex_le61(h: Column) -> Column:
    """First 8 bytes of an md5 HEX STRING, little-endian, mod 2^61-1 — the
    exact k-gram hash the MinHash oracle already renders in DuckDB SQL
    (`'0x'||reversed hex -> UBIGINT`).  Spark-side: conv(reversed hex, 16,
    10) is unsigned 64-bit, carried through DECIMAL(20,0) so the mod never
    overflows."""
    rev = F.concat(
        F.substring(h, 15, 2), F.substring(h, 13, 2),
        F.substring(h, 11, 2), F.substring(h, 9, 2),
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )
    return (
        F.conv(rev, 16, 10).cast("decimal(20,0)") % F.lit(_WINNOW_P)
    ).cast("long")


def _gram_hashes(text: Column, k: int, ng_c: Column, hash: str) -> Column:
    """Per-k-gram hash array.  ``md5_61``: two-stage transform — ONE md5
    hex string per k-gram, then the 61-bit fold; inlining
    _hex_le61(md5(...)) directly would leave 8 copies of md5(substr(...))
    in the tree (one per hex byte-pair), and codegen does not CSE across
    them.  ``xxhash64``: one native call per gram (~10x cheaper), for
    paths that don't need DuckDB-oracle hash parity."""
    if hash == "xxhash64":
        return F.transform(
            F.sequence(F.lit(1), ng_c),
            lambda i: F.xxhash64(text.substr(i, F.lit(k))),
        )
    if hash != "md5_61":
        raise ValueError(f"winnowing: unknown hash {hash!r}")
    md5s = F.transform(
        F.sequence(F.lit(1), ng_c), lambda i: F.md5(text.substr(i, F.lit(k)))
    )
    return F.transform(md5s, _hex_le61)


def winnow_fingerprints(
    text: Column, k: int = 8, w: int = 4, hash: str = "md5_61"
) -> Column:
    """Winnowing fingerprint set: hash every character k-gram, slide a
    w-window over the hash sequence, keep each window's minimum, dedup.

    Guarantees (the paper's): any shared substring of length >= k + w - 1
    between two documents yields at least one shared fingerprint.  Whole
    pipeline is native Columns (one pass, whole-stage codegen) — at 100 TB
    this is a map-only stage, no shuffle.  Docs shorter than k fingerprint
    to an empty set; docs with fewer than w k-grams keep the global min.
    """
    ng = F.length(text) - F.lit(k - 1)
    ng_c = F.greatest(ng, F.lit(1))  # keep sequence() ascending on short docs
    hs = _gram_hashes(text, k, ng_c, hash)

    # CRITICAL: bind hs as a LAMBDA VARIABLE before windowing.  Referencing
    # the hs expression inside the window transform would INLINE it, and
    # nested higher-order functions re-evaluate the inlined array per outer
    # element — O(g) md5 passes instead of one (measured 400x slower).  A
    # single-element array + transform materializes hs exactly once per row
    # and hands the windows a bound variable.
    def _windows(hsv: Column) -> Column:
        few = F.array(F.array_min(hsv))
        full = F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(ng - F.lit(w - 1), F.lit(1))),
                    lambda j: F.array_min(F.slice(hsv, j, w)),
                )
            )
        )
        return F.when(ng < w, few).otherwise(full)

    return F.when(ng < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.array(hs), _windows)[0]
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("detected_lang", lang_id(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", fingerprint(t))
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document -> (id, terms array<struct<term,
    score>>, descending score, term-asc ties).

    idf = ln((N+1)/(df+1)) + 1 (smoothed; a term in every doc still scores
    > 0), tf = raw in-doc count.

    Scale shape: tokenize/explode is map-side; (doc, term) tf and the term
    df are partial-aggregated; the df join shuffles on the term key (hot
    terms are exactly the low-idf ones, so skew carries little data after
    the tf aggregation — one slim row per distinct (doc, term)).  Top-k is
    the same map-side ``slice(array_sort(collect_list(...)))`` pattern as
    the kNN k<=8 path — no per-doc window sort.  N is one scalar count —
    the only driver action.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.col("tf") * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0),
    )
    # array_sort on struct orders by fields in sequence: (-score, term)
    # ascending == score descending, term ascending on ties
    return (
        scored.groupBy(id_col)
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("score")).alias("neg"), F.col("term")))
                ),
                1,
                k,
            ).alias("_top")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.col("_top"),
                lambda s: F.struct(
                    s["term"].alias("term"), F.round(-s["neg"], 6).alias("score")
                ),
            ).alias("terms"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style language-model quality signal: score every document by
    the average log-probability of its word bigrams under an add-alpha
    smoothed bigram model.  ``train_docs=None`` trains on the scored
    corpus itself (self-scoring — corpus-typical text scores high,
    gibberish low); pass a reference corpus (the CCNet setup: a clean
    Wikipedia-like table) to score the web corpus under a fixed model —
    bigrams/tokens unseen in training back off to their add-alpha floor
    (p = alpha / (c(w1) + alpha*V), down to 1/V for unseen history).

    p(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha*V), c() TRAIN counts,
    V = distinct-token count of TRAIN.  Returns (id, n_bigrams, avg_logp,
    ppl) for documents with >= 1 bigram; avg_logp rounded to 4 decimals,
    ppl = exp(-avg_logp) rounded to 3 (both engines round the same raw
    double — sub-ulp cross-engine drift cannot flip these digits except
    on exact half-way values, which the irrational logs never hit).
    Self-scoring uses the same left-join + coalesce(0) plan — every key
    exists, so it degenerates to the inner join the DuckDB oracle runs.

    Scale shape: bigrams are built codegen-native (two shifted slices
    zipped, no per-gram strings) and keyed by xxhash64 — the count tables
    and the scoring joins shuffle 8-byte keys only.  Both count joins are
    plain hash joins on the gram/token key (partial aggregation bounds the
    map output at distinct-gram cardinality); V rides along as a one-row
    broadcast crossJoin, keeping the whole plan lazy (no driver count
    action).  Collision trade as in ngram_jaccard_pairs.
    """
    def _base(frame: DataFrame) -> DataFrame:
        toks = tokens(F.lower(F.col(text_col)))
        return (
            frame.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col), toks.alias("__t"), F.size(toks).alias("__sz"))
        )

    def _bigrams(b: DataFrame) -> DataFrame:
        m = F.greatest(F.col("__sz") - 1, F.lit(0))
        zipped = F.arrays_zip(F.slice("__t", 1, m), F.slice("__t", 2, m))
        # materialize the zipped array in its own projection before explode
        # — ExtractGenerator would otherwise inline (and re-evaluate) the
        # zip per exploded row (see ngram_jaccard_pairs' __hs note)
        return (
            b.select(F.col(id_col), zipped.alias("__bg"))
            .select(F.col(id_col), F.explode("__bg").alias("__b"))
            .select(
                F.col(id_col),
                F.xxhash64(F.col("__b.0"), F.col("__b.1")).alias("__h2"),
                F.xxhash64(F.col("__b.0")).alias("__h1"),
            )
        )

    base = _base(docs)
    tbase = base if train_docs is None else _base(train_docs)
    bi = _bigrams(base)
    tbi = bi if train_docs is None else _bigrams(tbase)
    uni = tbase.select(F.explode("__t").alias("__w")).select(
        F.xxhash64("__w").alias("__h1")
    )
    c1 = uni.groupBy("__h1").agg(F.count("*").alias("__c1"))
    c2 = tbi.groupBy("__h2").agg(F.count("*").alias("__c2"))
    vdf = c1.agg(F.count("*").alias("__V"))
    a = F.lit(float(alpha))
    logp = F.log(
        (F.coalesce(F.col("__c2"), F.lit(0)) + a)
        / (F.coalesce(F.col("__c1"), F.lit(0)) + a * F.col("__V"))
    )
    return (
        bi.join(c2, "__h2", "left")
        .join(c1, "__h1", "left")
        .crossJoin(F.broadcast(vdf))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
            F.round(F.exp(-F.avg(logp)), 3).alias("ppl"),
        )
    )


def winnow_fingerprint_positions(
    text: Column, k: int = 8, w: int = 4, hash: str = "md5_61"
) -> Column:
    """Winnowing fingerprints WITH POSITIONS: array<struct<pos:int,
    fp:long>> where ``pos`` is the 1-based start of the k-gram whose hash
    was each window's minimum (first occurrence on ties — the same rule in
    the DuckDB oracle's ``list_position``).  Positions turn the
    fingerprint SET (``winnow_fingerprints``) into a substring LOCATOR:
    any substring of length >= k + w - 1 shared between two documents
    yields a common fingerprint in both, and ``pos`` points inside the
    shared region — the input to span-level dedup (``dedup.
    duplicated_spans``).  Same map-only shape and inlining caveats as
    ``winnow_fingerprints``.

    ``hash``: ``"md5_61"`` is the DuckDB-oracle-parity hash (md5 hex fold
    mod 2^61-1 — ~35 interpreted expression evals per k-gram); the
    winnowing GUARANTEE is hash-agnostic, so ``"xxhash64"`` (one native
    call per k-gram, measured ~10x) is the 100 TB path — pick it whenever
    cross-engine replay of the exact fingerprint values isn't needed."""
    ng = F.length(text) - F.lit(k - 1)
    ng_c = F.greatest(ng, F.lit(1))
    hs = _gram_hashes(text, k, ng_c, hash)

    def _windows(hsv: Column) -> Column:
        # Window scan in the zip-of-shifted-slices form (the same
        # codegen-native rewrite ngram_jaccard_pairs uses for shingles):
        # the naive per-window `slice + array_min + array_position` does
        # three array traversals AND a w-element allocation per window —
        # all interpreted — which profiled as the dominant dup_spans cost
        # (not the hash).  Here the w shifted slices zip into one struct
        # array and each window is ONE lambda call doing a `least` plus a
        # first-match when-cascade: same minimum, same first-occurrence
        # tie-break as array_position, ~3x end-to-end.
        m = F.greatest(ng - F.lit(w - 1), F.lit(0))  # total length, see ngram
        zipped = F.arrays_zip(*[F.slice(hsv, i + 1, m) for i in range(w)])

        def win(s: Column, j: Column) -> Column:
            fps = [s[str(i)] for i in range(w)]
            mn = F.least(*fps)
            pos = F.when(fps[0] == mn, j + 1)
            for i in range(1, w):
                pos = pos.when(fps[i] == mn, j + i + 1)
            return F.struct(pos.cast("int").alias("pos"), mn.alias("fp"))

        few = F.array(
            F.struct(
                F.array_position(hsv, F.array_min(hsv)).cast("int").alias("pos"),
                F.array_min(hsv).alias("fp"),
            )
        )
        full = F.array_distinct(F.transform(zipped, win))
        return F.when(ng < w, few).otherwise(full)

    return F.when(
        ng < 1, F.array().cast("array<struct<pos:int,fp:bigint>>")
    ).otherwise(F.transform(F.array(hs), _windows)[0])
