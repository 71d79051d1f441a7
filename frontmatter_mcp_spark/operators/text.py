"""Text-analysis operators for large-scale corpus pipelines.

All operators are pure Catalyst column expressions (no Python UDFs), so
they run inside whole-stage codegen and scale linearly with executors —
a narrow map stage over the documents table, no shuffle.

These extend the reference surface (which has no text ops of its own —
its only text processing is the frontmatter/body split at
src/frontmatter_mcp/semantic/indexer.py:134-148) to what a 100 TB
training-data pipeline needs: token stats, language ID, quality scoring,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# small multilingual stopword seeds for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed."""
    return F.filter(F.split(F.trim(text), r"\s+", -1), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_len(text: Column) -> Column:
    """Mean token length in double precision (exact int division)."""
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def word_bigrams(toks: Column) -> Column:
    """All adjacent-token-pair occurrences (not the distinct set) as
    'a b' strings; empty array for single-token inputs."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or spaces."""
    stripped = F.regexp_replace(text, "[^A-Za-z ]", "")
    return F.length(stripped).cast("double") / F.length(text)


def _in_set(words: list[str]):
    # closure factory: a default-arg lambda would change the visible arity
    # and PySpark's higher-order functions dispatch on lambda arity
    return lambda t: t.isin(*words)


def lang_id(text: Column) -> Column:
    """Stopword-voting language heuristic: the language whose stopword set
    scores the most token hits wins; 'und' (undetermined) when no hits.

    A production pipeline swaps this for a per-batch fastText/CLD3 pandas
    UDF; the Spark plumbing (narrow map over text) is identical.
    """
    toks = tokens(F.lower(text))
    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, _in_set(sw))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_max(scored)  # struct compare: by score, then lang desc
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    lexical diversity (type/token ratio), equally weighted.
    Deterministic arithmetic only (no randomness, no floats folded in
    engine-dependent order)."""
    n_tok = token_count(text).cast("double")
    length_band = (
        F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0))
        .when(n_tok > 1000, F.lit(0.5))
        .otherwise(n_tok / 10.0)
    )
    diversity = distinct_token_count(text).cast("double") / n_tok
    return F.round((length_band + alpha_ratio(text) + diversity) / 3.0, 6)


def bow_fingerprint(text: Column) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 of the sorted
    distinct token set. Collapses token-order-shuffled duplicates that an
    exact-hash dedup misses."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(text)))), " ")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 3
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (keyword extraction).

    tf = in-document term count, idf = ln(N / df). The token explode is
    the only O(tokens) stage; tf and df aggregate map-side, and the final
    ranking windows on the (small) per-doc term lists. Ties break on the
    lexicographically smaller term so results are reproducible.
    """
    from pyspark.sql.window import Window as W

    toks = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def unigram_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet-style unigram LM quality proxy: each document's mean token
    negative log-likelihood under the corpus's OWN unigram distribution
    — low = templated/common text, high = rare-token (often noisy)
    text; production pipelines threshold both tails before training.

    Per doc: mean over token occurrences of -ln(c(t)/N) computed as
    (ln N - ln c(t)) * tf summed per DISTINCT in-doc term. Determinism:
    per-term doubles go through DECIMAL(28,12) before the sum so the
    aggregate is order/partition independent (the q77 technique), and
    the mean is rounded to 6 decimals (the q33 convention) because ln
    itself is NOT bit-portable — JVM Math.log and libm disagree by
    1 ulp on some operands (measured: ln(936.0)), which the rounding
    absorbs.

    Shape at 100 TB: per-doc term counts aggregate map-side; the vocab
    join shuffles on the term key (hot tokens are skewed keys — AQE
    splits them; counts were already collapsed map-side); N travels as
    a one-row broadcast. Docs with no tokens return (0, NULL).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    totals = vocab.agg(F.sum("c").alias("n_total"))
    terms = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("tf"),
            (
                (
                    F.log(F.col("n_total").cast("double"))
                    - F.log(F.col("c").cast("double"))
                )
                * F.col("tf")
            )
            .cast("decimal(28,12)")
            .alias("nll_term"),
        )
    )
    agg = terms.groupBy(id_col).agg(
        F.sum("tf").cast("int").alias("__n"),
        F.round(F.sum("nll_term").cast("double") / F.sum("tf"), 6).alias("__nll"),
    )
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_tokens"),
        F.col("__nll").alias("nll_mean"),
    )


def dsir_doc_bucket_tf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 1024,
) -> DataFrame:
    """The O(tokens) half of dsir_weights: per-(doc, bucket) hashed
    feature counts with the target flag riding in the group key
    (constant per doc, so the groups are unchanged). Both downstream
    consumers (bucket stats, per-doc weights) read THIS output — the
    caller should persist it (workload pins it) because their differing
    projections defeat exchange reuse and would re-explode the corpus.
    """
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    toks = tokens(F.lower(F.col(text_col)))
    feats = df.select(
        F.col(id_col),
        target.alias("_is_target"),
        F.explode(F.concat(toks, word_bigrams(toks))).alias("f"),
    ).select(
        F.col(id_col), F.col("_is_target"), hash_bucket(F.col("f"), buckets).alias("b")
    )
    return feats.groupBy(id_col, "_is_target", "b").agg(F.count("*").alias("tf"))


def _dsir_doc_agg(
    dtf_flagged: DataFrame,
    id_col: str,
    buckets: int = 1024,
) -> DataFrame:
    """Per-doc (id, __n feature count, __w rounded weight) from the
    (doc, bucket) tf aggregate — the shared core of dsir_weights_from_tf
    (which left-joins it back onto the corpus for the every-doc
    contract) and dsir_resample (which keeps only feature-bearing docs
    and must NOT pay that corpus join)."""
    stats = dtf_flagged.groupBy("b").agg(
        F.sum("tf").alias("r"),
        F.sum(F.when(F.col("_is_target"), F.col("tf")).otherwise(F.lit(0))).alias("t"),
    )
    totals = stats.agg(F.sum("r").alias("r_total"), F.sum("t").alias("t_total"))
    ratio = stats.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(F.col("t") + 1)
            - F.log((F.col("t_total") + buckets).cast("double"))
            - F.log(F.col("r") + 1)
            + F.log((F.col("r_total") + buckets).cast("double"))
        ).alias("logratio"),
    )

    dtf = dtf_flagged.select(F.col(id_col), F.col("b"), F.col("tf"))
    terms = dtf.join(F.broadcast(ratio), "b").select(
        F.col(id_col),
        F.col("tf"),
        (F.col("logratio") * F.col("tf")).cast("decimal(28,12)").alias("w_term"),
    )
    return terms.groupBy(id_col).agg(
        F.sum("tf").cast("int").alias("__n"),
        F.round(F.sum("w_term").cast("double"), 6).alias("__w"),
    )


def dsir_weights_from_tf(
    df: DataFrame,
    dtf_flagged: DataFrame,
    id_col: str,
    buckets: int = 1024,
) -> DataFrame:
    """Second half of dsir_weights: bucket log-ratio table from the
    (doc, bucket) tf aggregate, broadcast back onto it, summed per doc.
    See dsir_weights for the full contract."""
    agg = _dsir_doc_agg(dtf_flagged, id_col, buckets)
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_features"),
        F.col("__w").alias("dsir_weight"),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style data selection weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score every
    document by how much its hashed n-gram feature distribution resembles
    a target subset (``target`` boolean column expression) versus the raw
    corpus. High weight = target-like; a training mix keeps the top slice
    (deterministically, e.g. via sampling.hash_bucket against a
    weight-derived rate) instead of sampling uniformly.

    Features are all unigram + adjacent-bigram occurrences hashed into
    ``buckets`` md5 buckets (portable across engines — the same
    instr/substr fold as sampling.hash_bucket). Per bucket b the smoothed
    log-ratio is ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B)) with t/r the
    target/raw occurrence counts; a document's weight is the sum over its
    feature occurrences of the bucket log-ratio.

    Shape at 100 TB: the feature explode runs ONCE — the per-doc
    (doc, bucket) tf aggregate collapses it map-side, and the bucket
    stats are derived FROM that aggregate (target flag rides in the
    group key, constant per doc), so no stage other than the first ever
    touches the token stream. The bucket log-ratio table is exactly B
    rows broadcast to the per-doc join, and the corpus totals travel as
    a one-row broadcast. No join ever shuffles more than the
    (doc, bucket) tf rows.

    Determinism: the log-ratio is a fixed left-associated chain of four
    ln calls mirrored verbatim in the oracle; per-term products go
    through DECIMAL(28,12) so the per-doc sum is order-independent, and
    the final weight rounds to 6 decimals to absorb ln's 1-ulp
    engine divergence (the q94 convention). Docs with no tokens return
    (0, NULL).

    NOTE: composed directly, the (doc, bucket) tf subplan has two
    consumers whose projections differ, which defeats exchange reuse —
    the workload (q97) persists it via registry.pin between the halves.
    """
    dtf_flagged = dsir_doc_bucket_tf(df, id_col, text_col, target, buckets)
    return dsir_weights_from_tf(df, dtf_flagged, id_col, buckets)


def unigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus unigram occurrence counts (t, c) — one explode, map-side
    combined. Exposed separately so callers with several consumers
    (e.g. bigram_merge_candidates' two joins + totals) can persist it."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )


def bigram_merge_candidates(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    top_k: int = 50,
    uni: DataFrame | None = None,
) -> DataFrame:
    """Vocabulary-induction merge step (the scoring half of one BPE /
    WordPiece iteration, run at word granularity): rank adjacent token
    pairs by pointwise mutual information ln(c_ab·N / (c_a·c_b)) — the
    pairs a tokenizer trainer would merge next, and the collocations a
    corpus analyst inspects.

    Shape at 100 TB: two explode→groupBy passes (unigrams, bigrams),
    both map-side combined; the ``min_count`` floor is applied to the
    bigram counts BEFORE the two unigram joins, so the join input is the
    (small) candidate set, not the full bigram vocabulary; N is a
    one-row broadcast, and the final top-k is a TakeOrderedAndProject
    (no global sort materialized).

    Determinism: PMI is a fixed left-associated chain of four ln calls
    mirrored in the oracle and rounded to 6 decimals; the top-k orders
    by (pmi DESC, term_a, term_b) — a total order, so the LIMIT is
    stable across engines.

    ``uni`` lets the caller pass a persisted unigram_counts(df) — it has
    three consumers here (two joins + totals) whose projections differ,
    so without a persist the corpus token explode runs three times
    (workload q98 pins it).
    """
    toks = tokens(F.lower(F.col(text_col)))
    if uni is None:
        uni = unigram_counts(df, text_col)
    totals = uni.agg(F.sum("c").alias("n_total"))
    bcnt = (
        df.select(F.explode(word_bigrams(toks)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
        .select(
            F.split("bg", " ", -1)[0].alias("term_a"),
            F.split("bg", " ", -1)[1].alias("term_b"),
            "c_ab",
        )
    )
    scored = (
        bcnt.join(uni.select(F.col("t").alias("term_a"), F.col("c").alias("c_a")), "term_a")
        .join(uni.select(F.col("t").alias("term_b"), F.col("c").alias("c_b")), "term_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "term_a",
            "term_b",
            F.col("c_ab").cast("int").alias("c_ab"),
            F.col("c_a").cast("int").alias("c_a"),
            F.col("c_b").cast("int").alias("c_b"),
            F.round(
                F.log("c_ab")
                + F.log(F.col("n_total").cast("double"))
                - F.log("c_a")
                - F.log("c_b"),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "term_a", "term_b").limit(top_k)


def dsir_resample(
    df: DataFrame,
    dtf_flagged: DataFrame,
    id_col: str,
    top_k: int = 100,
    buckets: int = 1024,
) -> DataFrame:
    """The selection half of DSIR: importance RESAMPLING via
    Gumbel-top-k (Vieira 2014) — sampling ``top_k`` documents without
    replacement with probability proportional to exp(importance weight)
    reduces to ranking by weight + Gumbel noise. The noise is
    derandomized the way every sampler in this repo is: a uniform from
    the md5 of the doc id (u = (h7 + 0.5) / 16^7 over the 7-hex-digit
    fold of sampling.hash_bucket — never 0 or 1, so the double-ln is
    finite), g = -ln(-ln(u)). Reruns, backfills, and the SQL oracle
    agree exactly.

    Consumes the pinned (doc, bucket) tf aggregate from
    dsir_doc_bucket_tf (same contract as dsir_weights_from_tf). Docs
    with no features carry a NULL weight and cannot be sampled — they
    are filtered, documented behavior. Scores round to 6 decimals with
    the doc id as tiebreaker, so the top-k set is stable across
    engines; the plan ends in a TakeOrderedAndProject.
    """
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    # straight from the per-doc aggregate: filtering to n_features > 0
    # makes the every-doc left join of dsir_weights_from_tf a no-op, so
    # skip the corpus-wide join entirely (the oracle's scored CTE reads
    # FROM agg the same way)
    del df  # corpus frame not needed on the resample path
    w = _dsir_doc_agg(dtf_flagged, id_col, buckets).filter(
        F.col("__n") > 0
    ).select(F.col(id_col), F.col("__w").alias("dsir_weight"))
    span = 16**7
    u = (hash_bucket(F.col(id_col), span) + F.lit(0.5)) / F.lit(float(span))
    gumbel = -F.log(-F.log(u))
    score = F.round(F.col("dsir_weight") + gumbel, 6)
    return (
        w.select(F.col(id_col), F.col("dsir_weight"), score.alias("gumbel_score"))
        .orderBy(F.desc("gumbel_score"), F.col(id_col))
        .limit(top_k)
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document text profile (narrow map, no shuffle)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        F.length(t).cast("int").alias("n_chars_actual"),
        F.round(avg_token_len(t), 6).alias("avg_token_len"),
        F.round(alpha_ratio(t), 6).alias("alpha_ratio"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        bow_fingerprint(t).alias("bow_fp"),
    )


NORMALIZE_STOPWORDS = ["a", "the"]


def normalize_text(text: Column, stopwords: list[str] | None = None) -> Column:
    """Canonical text-cleaning pass: lowercase, collapse runs of
    whitespace, drop stopword tokens, space-rejoin. A narrow
    whole-stage-codegen map — the shape of every pre-training cleanup
    stage (PII masking, boilerplate stripping, unicode fixes slot in as
    additional expression rewrites on the same column).
    """
    stop = NORMALIZE_STOPWORDS if stopwords is None else stopwords
    toks = tokens(F.lower(text))
    kept = F.filter(toks, lambda t: ~t.isin(*stop))
    return F.array_join(kept, " ")


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    tokens taken by the single most frequent word and by the most
    frequent word bigram, plus lexical diversity. High top-fractions
    mark degenerate/templated text that quality filters drop.

    Two explode -> groupBy passes (words, bigrams), each with map-side
    partial counts; the per-doc reduction is integer-only, and every
    emitted double is a single division of exact integers (no folds, no
    engine-order hazards).
    """
    words = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
    )
    wstats = (
        words.groupBy(id_col, "w")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("int").alias("n_words"),
            F.count("*").cast("int").alias("n_distinct_words"),
            F.max("c").cast("int").alias("top_word_count"),
        )
    )
    from frontmatter_mcp_spark.operators.dedup import word_shingles

    bigrams = df.select(
        F.col(id_col),
        F.explode(word_bigrams(tokens(F.lower(F.col(text_col))))).alias("bg"),
    )
    bstats = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("int").alias("n_bigrams"),
            F.max("c").cast("int").alias("top_bigram_count"),
        )
    )
    return (
        wstats.join(bstats, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            "n_distinct_words",
            F.round(
                F.col("n_distinct_words").cast("double") / F.col("n_words"), 6
            ).alias("distinct_ratio"),
            F.round(
                F.col("top_word_count").cast("double") / F.col("n_words"), 6
            ).alias("top_word_frac"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6
            ).alias("top_bigram_frac"),
        )
    )


def bigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame | None = None,
) -> DataFrame:
    """Interpolated bigram LM quality score — the step up from
    unigram_nll that CCNet-style filters actually deploy: token i >= 2
    is scored by -ln(0.5 * p(w_i | w_{i-1}) + 0.5 * p(w_i)) under the
    corpus's own counts, the first token by its unigram alone, and the
    document by the mean over all tokens. The 0.5 interpolation weight
    is an exact binary fraction (no rounding divergence), and templated
    text scores low while rare-token noise scores high, as with q94 —
    but repeated PHRASES now also score low, which the unigram model
    cannot see.

    Shape at 100 TB: one explode for bigram pair occurrences and one
    tiny one for first tokens; per-doc (a, b) tf collapses map-side
    before the three count joins (pair key, left-unigram key,
    right-unigram key — all O(tokens) rows, hot keys pre-collapsed,
    AQE splits the rest); N rides a one-row broadcast. Determinism: the
    probability is a fixed-order double chain mirrored in the oracle,
    each -ln(p)*tf term is quantized to DECIMAL(28,12) (order-free
    sums), and the mean rounds to 6 decimals to absorb ln's 1-ulp
    engine divergence. Docs with no tokens return (0, NULL).

    ``uni`` lets the caller pass a persisted unigram_counts(df) — it
    has four consumers here (two pair joins, the first-token join, the
    totals), so without a persist the corpus token explode reruns per
    consumer (q105 pins it).
    """
    toks = tokens(F.lower(F.col(text_col)))
    if uni is None:
        uni = unigram_counts(df, text_col)
    c1 = uni.select(F.col("t").alias("w"), F.col("c").alias("c1"))
    totals = c1.agg(F.sum("c1").alias("n_total"))

    pairs = df.select(
        F.col(id_col), F.explode(word_bigrams(toks)).alias("bg")
    ).select(
        F.col(id_col),
        F.split("bg", " ", -1)[0].alias("a"),
        F.split("bg", " ", -1)[1].alias("b"),
    )
    ptf = pairs.groupBy(id_col, "a", "b").agg(F.count("*").alias("tf"))
    c2 = ptf.groupBy("a", "b").agg(F.sum("tf").alias("c2"))

    p_interp = (
        F.lit(0.5) * (F.col("c2").cast("double") / F.col("c1a"))
        + F.lit(0.5) * (F.col("c1b").cast("double") / F.col("n_total"))
    )
    big_terms = (
        ptf.join(c2, ["a", "b"])
        .join(c1.select(F.col("w").alias("a"), F.col("c1").alias("c1a")), "a")
        .join(c1.select(F.col("w").alias("b"), F.col("c1").alias("c1b")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("tf"),
            ((-F.log(p_interp)) * F.col("tf")).cast("decimal(28,12)").alias("nll"),
        )
    )
    firsts = (
        # try_element_at: NULL (not an ANSI error) for zero-token docs
        df.select(F.col(id_col), F.try_element_at(toks, F.lit(1)).alias("w"))
        .filter(F.col("w").isNotNull())
        .join(c1, "w")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.lit(1).alias("tf"),
            (-F.log(F.col("c1").cast("double") / F.col("n_total")))
            .cast("decimal(28,12)")
            .alias("nll"),
        )
    )
    agg = (
        big_terms.unionByName(firsts)
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("int").alias("__n"),
            F.round(F.sum("nll").cast("double") / F.sum("tf"), 6).alias("__nll"),
        )
    )
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_tokens"),
        F.col("__nll").alias("nll_mean"),
    )
