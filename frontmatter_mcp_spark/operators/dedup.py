"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- **exact**: md5-groupBy — one shuffle on a 16-byte key, map-side partial
  aggregation; the canonical first pass of any dedup pipeline.
- **MinHash + LSH**: shingle -> k minhashes -> band buckets -> bucket
  join. Cost is linear in corpus size; the candidate join shuffles on the
  band-bucket key only, never all-pairs. Hash = md5 keyed by hash index,
  so signatures are deterministic and engine-portable (no seed tables to
  ship; md5 is built into every engine).
- **SimHash**: per-bit keyed md5 votes; a narrow map + one groupBy
  (doc_id) — near-duplicate docs land on the same / hamming-close
  signature.
- **n-gram Jaccard**: exact verification for candidate pairs. The
  self-join on shingles is document-frequency-capped (stop-shingles with
  df > max_df are dropped) which both bounds skew at scale and removes
  uninformative shingles.

All expressions are built-in Catalyst functions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from frontmatter_mcp_spark.functions.vector import floor_quant


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-group exact duplicates: one row per distinct content hash with
    the group size and the keeper (minimum id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_fp"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined): array_distinct of
    the position-ordered spans. Docs with fewer than n tokens yield an
    empty array (array_distinct of empty is empty)."""
    return F.array_distinct(_word_spans_in_order(text, n))


def _word_spans_in_order(text: Column, n: int) -> Column:
    """All word n-gram spans in position order (index i = span starting
    at token i) — the single slice/zip_with fold behind word_shingles
    and the span scrubbers, exposed without the distinct so posexplode
    recovers each span's start position.

    Built from n shifted `slice`s folded with `zip_with`, NOT from
    per-index `element_at` in a `transform` lambda: Catalyst does no
    common-subexpression elimination inside higher-order-function
    lambdas, so an element_at formulation re-evaluates the whole
    tokenizer subtree for every array element (measured ~10x slower).
    Here the tokenizer runs n times per row, independent of document
    length."""
    toks = F.split(F.trim(text), r"\s+", -1)
    k = F.size(toks)
    m = k - (n - 1)  # number of spans
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(k >= n, acc).otherwise(F.array().cast("array<string>"))


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL (the scrub variant of
    q59's detection — Lee et al. 2022 remove the repeated substring and
    keep the document): every token position covered by a word n-gram
    span occurring in >= min_docs distinct documents is dropped, and
    each document is rebuilt from its surviving tokens in order.

    Returns (id, n_tokens INT, n_tokens_kept INT, cleaned_text STRING)
    for every document (fully-scrubbed docs come back with 0 kept and
    an empty string — the caller decides whether to drop them).

    Shape at 100 TB: spans and tokens are narrow per-doc explodes; the
    duplicated-span set is one groupBy(span) with map-side partial
    counts over the DISTINCT (doc, span) pairs; covering positions join
    doc spans to that set on the span key (O(corpus spans) shuffle,
    never all-pairs — a universal span concentrates on one key but its
    per-doc cover explode is bounded by doc length); the rebuild is one
    groupBy(doc) whose order restoration is an array_sort over the
    doc's own tokens (struct(pos, token) — pos is unique per doc, so
    the sort is deterministic with no window exchange).
    """
    from frontmatter_mcp_spark.operators.holds import hold

    text = F.col(text_col)
    toks_arr = F.split(F.trim(text), r"\s+", -1)
    toks = df.select(
        F.col(id_col), F.posexplode(toks_arr).alias("pos", "token")
    )
    # eager hold: doc_spans feeds the duplicated-span aggregate AND the
    # cover join through differently-keyed exchanges — without it the
    # span tokenize+slice expression runs once per consumer (the
    # ngram_jaccard_pairs three-consumer lesson)
    doc_spans = hold(
        df.select(
            F.col(id_col),
            F.posexplode(_word_spans_in_order(text, span_n)).alias("start", "span"),
        )
    )
    dup_spans = (
        doc_spans.select(id_col, "span")
        .distinct()
        .groupBy("span")
        .agg(F.count("*").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("span")
    )
    covered = (
        doc_spans.join(dup_spans, "span")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (span_n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    rebuilt = (
        toks.join(covered, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("__kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s.token,
                ),
                " ",
            ).alias("__cleaned"),
        )
    )
    base = df.select(F.col(id_col), F.size(toks_arr).cast("int").alias("n_tokens"))
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("__kept"), F.lit(0)).alias("n_tokens_kept"),
        F.coalesce(F.col("__cleaned"), F.lit("")).alias("cleaned_text"),
    )


def minhash_signatures_from_shingles(
    sh: DataFrame,
    id_col: str,
    shingle_col: str = "_shingle",
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signatures over an already-exploded (id, shingle) DataFrame.

    Split out so a calibration/report query can build ONE shingle subplan
    and feed it to the signature, candidate, and exact-Jaccard stages:
    identical subplans canonicalize equal, so Catalyst's ReuseExchange
    computes the signature aggregation once per action even when several
    downstream branches consume it.
    """
    return sh.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_shingles"),
        *[
            F.min(
                F.substring(F.md5(F.concat(F.lit(f"{h}|"), F.col(shingle_col))), 1, 16)
            ).alias(f"sig_{h}")
            for h in range(num_hashes)
        ],
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: columns sig_0..sig_{k-1}.

    Minhash h = min over shingles of a keyed md5 prefix (lexicographic min
    of 16 hex chars == min over a uniform 64-bit hash) — deterministic and
    engine-portable, no seed tables to ship.

    Formulated as explode -> groupBy(id) with k MIN aggregates: each md5
    is computed exactly once, partial (map-side) aggregation reduces every
    partition to one k-tuple per doc before the shuffle, so the exchange
    carries O(docs), not O(shingles).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_shingle"),
    )
    return minhash_signatures_from_shingles(sh, id_col, "_shingle", num_hashes)


def lsh_band_buckets(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band the signature: bucket id = md5 of the band's concatenated
    minhashes. Docs sharing any band bucket are near-dup candidates."""
    rows_per_band = num_hashes // bands
    cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts)).alias("bucket"),
            )
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_oversized_buckets(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 40,
) -> DataFrame:
    """Audit companion to candidate_pairs_from_signatures: the (band,
    bucket, count) rows the skew cap drops. A production dedup job logs
    ``lsh_oversized_buckets(...).agg(sum(count))`` next to the pair join
    so capped mass is an observable, never a silent truncation."""
    return (
        lsh_band_buckets(signatures, id_col, num_hashes, bands)
        .groupBy("band", "bucket")
        .count()
        .filter(F.col("count") > max_bucket)
    )


def candidate_pairs_from_signatures(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 40,
    materialize: bool = True,
) -> DataFrame:
    """LSH candidate pairs from an existing signature DataFrame (see
    minhash_signatures_from_shingles for why the stages compose).

    ``max_bucket`` is the skew guard (the simhash_candidate_pairs
    discipline applied here): a band bucket holding more than
    ``max_bucket`` docs is dropped BEFORE the self-join, so candidates
    are bounded by O(buckets x max_bucket^2) instead of quadratic in the
    largest duplicate cluster — an exact-dup cluster of m documents
    collides in EVERY band and would otherwise emit bands * m^2 / 2
    pairs (m = 10^6 at pretraining scale -> 10^12 rows out of one join).
    Mega-buckets are exact-duplicate territory the hash dedup (q30)
    collapses upstream; banding targets the near-miss tail. Pass
    ``max_bucket=None`` to disable.

    Unlike the SimHash twin, SURVIVORS are not broadcast: SimHash slices
    live in a bounded space (2^rpb values per band) while MinHash bucket
    ids are unbounded md5s, so the survivor set scales with the corpus.
    What IS broadcast is the DROP list — the (band, bucket) keys holding
    more than ``max_bucket`` docs — which is small by nature (mega-
    buckets are rare; a corpus where they are not should have been
    exact-dedup'd upstream, the documented contract). The cap is then a
    map-side broadcast anti-join on both self-join branches, which
    preserves the pre-cap plan shape so the runtime reuses the one
    expensive signature stage across branches. (The first cut used a
    window count over (band, bucket); it defeated exchange reuse and
    re-ran the signature aggregate per branch — measured 2.4x on q280.)
    Dropped mass is observable via lsh_oversized_buckets.
    """
    bb = lsh_band_buckets(signatures, id_col, num_hashes, bands)
    if max_bucket is not None:
        drops = (
            bb.groupBy("band", "bucket")
            .agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket)
            .select("band", "bucket")
        )
        bb = bb.join(F.broadcast(drops), ["band", "bucket"], "left_anti")
        if materialize:
            # eager hold (checkpoint): the capped band table feeds BOTH
            # self-join branches and, in pinned consumers, races
            # lazily-cached fan-out branches that would each re-execute
            # the signature stage and the broadcast build (measured 1.7x
            # on q187). One O(corpus) materialization — the same volume
            # the join shuffles — cuts every downstream branch to a block
            # read; the workload registry frees it at the next query
            # invocation. Callers whose result lives in ONE plan with no
            # lazy-cache fan-out (q32's straight pipeline, q91's
            # per-config branches over PINNED signatures) pass
            # materialize=False: there exchange reuse already dedups the
            # signature stage across the self-join branches, and the
            # checkpoint's extra materialization job is pure cost
            # (measured 1.7x on q32, 2.2x on q91 — the r9 triage).
            from frontmatter_mcp_spark.operators.holds import hold as _hold

            bb = _hold(bb)
    a = bb.withColumnRenamed(id_col, "id_a")
    b = bb.withColumnRenamed(id_col, "id_b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 40,
    materialize: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: distinct (id_a < id_b) pairs that
    collide in at least one band. The join key is (band, bucket) so the
    shuffle volume is O(corpus), not O(corpus^2); ``max_bucket`` bounds
    the pair fan-out of skewed buckets (see
    candidate_pairs_from_signatures, also for ``materialize``)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    return candidate_pairs_from_signatures(
        sigs, id_col, num_hashes, bands, max_bucket, materialize=materialize
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash signature as a bit string column ``simhash``.

    Bit j of a token is hex digit j of ONE md5 per token (digit >= '8'
    == the top bit of that 4-bit nibble — 32 independent uniform bits
    from a single hash, 32x fewer hash calls than keyed per-bit md5s,
    max 32 bits). The signature bit is the sign of the +1/-1 vote sum
    over the distinct token set.

    Explode + groupBy formulation for the same reason as
    minhash_signatures: each token's md5 runs exactly once, and map-side
    partial aggregation collapses the shuffle to one row per doc.
    """
    if bits > 32:
        raise ValueError("simhash supports at most 32 bits (one md5 hex nibble each)")
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("_tok"))
    h = F.md5(F.col("_tok"))
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.substring(h, j + 1, 1) >= "8", 1).otherwise(-1)
            ).alias(f"_v{j}")
            for j in range(bits)
        ]
    )
    bits_cols = [
        F.when(F.col(f"_v{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)
    ]
    return votes.select(F.col(id_col), F.concat(*bits_cols).alias("simhash"))


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 40,
    persist_fn=None,
) -> DataFrame:
    """SimHash near-dup candidates via bit-banding + Hamming verify —
    the blocking step q34's signatures feed (SimHash's analogue of
    MinHash-LSH banding, q32). The signature splits into ``bands``
    equal bit slices; documents sharing ANY exact slice become
    candidates, then the full-width Hamming distance filters to
    ``max_hamming``. Pigeonhole guarantee: a pair within Hamming
    distance d < bands differs in at most d slices, so it must agree
    on at least one — with max_hamming = bands - 1 the banding loses
    nothing versus all-pairs among surviving buckets.

    ``max_bucket`` is the skew guard (the df-cap discipline of
    ngram_jaccard_pairs applied to band buckets): a bucket holding more
    than ``max_bucket`` docs is dropped BEFORE the self-join, bounding
    candidates to O(buckets x max_bucket^2) instead of quadratic in the
    largest near-identical cluster. Mega-clusters of identical
    signatures are exact-duplicate territory the hash dedup (q30)
    removes upstream; banding targets the near-miss tail. A qualifying
    pair is still found through any OTHER shared slice whose bucket is
    small enough.

    Shape at 100 TB: the band join shuffles on (band, slice) —
    O(corpus x bands) rows, never all-pairs; the bucket-size cap rides
    in as a broadcast semi-join of the (band, slice) survivors. The
    Hamming verify is a fixed 32-term codegen expression per candidate.
    Returns (id_a, id_b, hamming), distance 0 included.
    """
    sigs = simhash(df, id_col, text_col, bits)
    if persist_fn is not None:
        # sigs feeds the band explode AND both verify sides — doc-count
        # sized, cache instead of recomputing the vote aggregate 3x
        sigs = persist_fn(sigs)
    rpb = bits // bands
    slices = F.array(
        *[F.substring("simhash", b * rpb + 1, rpb) for b in range(bands)]
    )
    banded = sigs.select(F.col(id_col), F.posexplode(slices).alias("band", "slice"))
    small_buckets = (
        banded.groupBy("band", "slice")
        .count()
        .filter(F.col("count") <= max_bucket)
        .select("band", "slice")
    )
    banded = banded.join(F.broadcast(small_buckets), ["band", "slice"])
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "slice"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("__sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("__sig_b"))
    hamming = sum(
        F.when(
            F.substring("__sig_a", j + 1, 1) != F.substring("__sig_b", j + 1, 1), 1
        ).otherwise(0)
        for j in range(bits)
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def neardup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.4,
    max_df: int = 50,
    iters: int = 3,
    persist_fn=None,
) -> DataFrame:
    """Assign every document a near-dup group id: the minimum doc id
    reachable over the Jaccard-pair graph — the keeper-selection step
    that turns pair lists into an actionable dedup decision.

    Min-label propagation with a fixed iteration count: each round every
    node takes the min of its own label and its neighbors' labels.
    `iters` rounds resolve components of diameter <= 2^iters-ish; dedup
    components are tiny chains in practice, and the fixed count keeps the
    computation deterministic and oracle-replayable.

    Propagation runs over the EDGE-NODE set only: an isolated document
    (no near-dup pair — the overwhelming majority of a deduplicated
    corpus) can never change label, so looping it through every round
    would shuffle O(corpus) rows per iteration for nothing. Each round
    is one join + one aggregate on the edge list (O(edges) shuffle,
    O(graph-nodes) labels); the full corpus is touched exactly once, by
    the final label join-back.
    """
    pairs = ngram_jaccard_pairs(df, id_col, text_col, shingle_n, threshold, max_df)
    # Each propagation round nests the previous round's labels plan on
    # BOTH sides of its join, so the edge subplan — and the expensive
    # df-capped shingle self-join under it — appears O(2^iters) times in
    # the final DAG, and exchange reuse does not canonicalize the
    # differing nestings away. Both the edge list and the per-round
    # label tables are tiny (pair-/graph-node-sized), so the caller
    # passes a persist hook (workload pin) and every round reads caches
    # instead of replaying the pipeline — measured ~1.5x on the full
    # query at sf0.1 (5.5s -> 3.7s), the q75/q90/q91 lesson again.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    if persist_fn is not None:
        edges = persist_fn(edges)
    # symmetric edges: distinct src enumerates every non-isolated node
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        # each round references the previous labels TWICE (its own join
        # plus the neighbor aggregate), so without a cache the label
        # subplan doubles per round; the table is graph-node-sized
        if persist_fn is not None:
            labels = persist_fn(labels)
    return (
        df.select(F.col(id_col))
        .join(labels, df[id_col] == labels.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("label", F.col(id_col)).alias("group_id"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.1,
    max_df: int = 50,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above a threshold.

    Pipeline: distinct shingles per doc -> drop stop-shingles (document
    frequency > max_df; kills both join skew and uninformative grams) ->
    self-join on shingle -> per-pair intersection counts -> Jaccard from
    the (pre-filter) shingle-set sizes.
    """
    from frontmatter_mcp_spark.operators.holds import hold

    sh = (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"))
    )
    # eager hold: sizes, dfreq and the df-cap join consume sh through
    # THREE differently-keyed exchanges, so exchange reuse cannot share
    # the tokenize+slice shingle expression — without materialization it
    # runs once per consumer (and races when the branches execute inside
    # one action). O(corpus shingles) rows, the same volume the dfreq
    # shuffle carries; released at the next query invocation.
    sh = hold(sh)
    return ngram_jaccard_pairs_from_shingles(sh, id_col, "shingle", threshold, max_df)


def ngram_jaccard_pairs_from_shingles(
    sh: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    threshold: float = 0.1,
    max_df: int = 50,
) -> DataFrame:
    """ngram_jaccard_pairs over an already-exploded (id, shingle) table.

    Split out (the minhash_signatures_from_shingles pattern) so ensemble
    queries that run MinHash-LSH *and* exact-Jaccard verification over
    the same corpus — whose oracle SQL declares ONE shared shingles
    CTE — tokenize once on the Spark side too: the caller builds the
    exploded shingle table, holds it (it feeds at least the three
    differently-keyed exchanges here, plus the signature aggregate),
    and passes it to both stages. The caller is responsible for the
    hold/materialization; this function adds none.
    """
    # select exactly (id, shingle): a rename alone would collide with a
    # pre-existing "shingle" column, and any extra columns on sh would
    # silently ride through the joins below
    sh = sh.select(F.col(id_col), F.col(shingle_col).alias("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    # shuffle join on the shingle key (dfreq is corpus-sized — NOT broadcastable
    # at scale); the df-cap keeps any one shingle's partition bounded
    filtered = sh.join(dfreq.filter(F.col("df_count") <= max_df), "shingle")
    a = filtered.select(F.col(id_col).alias("id_a"), "shingle")
    b = filtered.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select(
        "id_a", "id_b", "n_common",
        floor_quant(F.col("jaccard")).alias("jaccard"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: |A ∩ B| / min(|A|, |B|) >= t.

    The partial-copy detector Jaccard misses: a paragraph quoted inside
    a much longer document scores near-zero Jaccard (union dominated by
    the long doc) but containment ~1. Same df-capped shingle self-join
    pipeline as ngram_jaccard_pairs — one scale-bounded shuffle on the
    shingle key — only the final score differs."""
    from frontmatter_mcp_spark.operators.holds import hold

    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    # eager hold — same three-consumer shape as ngram_jaccard_pairs
    sh = hold(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    filtered = sh.join(dfreq.filter(F.col("df_count") <= max_df), "shingle")
    a = filtered.select(F.col(id_col).alias("id_a"), "shingle")
    b = filtered.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least("size_a", "size_b"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a", "id_b", "n_common",
            floor_quant(F.col("containment")).alias("containment"),
        )
    )


def boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate detection: word n-gram spans that repeat
    across at least `min_docs` distinct documents (headers, footers,
    license blurbs, templated text). The spans are what a cleaning pass
    strips before training.

    Shape: distinct spans per doc (narrow map) -> groupBy(span) with
    map-side partial counts. The exchange carries one row per distinct
    (span, doc) — never all occurrences; the min_docs filter happens
    after the final aggregate (a HAVING over the hash aggregate).
    """
    spans = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), span_n)).alias("span")
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.min(id_col).alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    span_n: int = 4,
) -> DataFrame:
    """Train/test decontamination: flag every train document that shares
    at least one word n-gram with any held-out (test) document — the
    standard benchmark-leakage scan run before training.

    One shuffle on the span key joins train spans to the distinct test
    span set (corpus-sized, NOT broadcast); per-doc overlap counts then
    aggregate map-side. Returns (id, n_shared_spans) for flagged docs.
    """
    spans = df.select(
        F.col(id_col),
        F.col(split_col),
        F.explode(word_shingles(F.col(text_col), span_n)).alias("span"),
    )
    test_spans = (
        spans.filter(F.col(split_col) == "test").select("span").distinct()
    )
    return (
        spans.filter(F.col(split_col) == "train")
        .join(test_spans, "span")
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("n_shared_spans"))
    )


def record_linkage_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_lev: int = 2,
) -> DataFrame:
    """Blocked record linkage (entity resolution on STRUCTURED rows —
    the Fellegi-Sunter blocking+verify shape, vs the text-shingle dedup
    above): candidate pairs form only WITHIN a block (equi-join on the
    blocking key — O(sum of block^2), never all-pairs), then survive an
    edit-distance verification on the name field. Levenshtein is classic
    integer DP in both engines, so pairs hash-match cross-engine.

    Blocking-key choice is the scale lever, exactly like the df-cap on
    shingle joins: a hot block degenerates toward its own cartesian, so
    production keys combine a coarse attribute with a high-selectivity
    prefix (phone/zip/sorted-neighborhood window); the key is a caller
    parameter for that reason. AQE splits residual skewed blocks.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(block_cols)],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(block_cols)],
    )
    keys = [f"_bk{i}" for i in range(len(block_cols))]
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev") <= max_lev)
        .select("id_a", "id_b", F.col("lev").cast("int").alias("lev"))
    )


def fuzzy_decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench: Column,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.4,
    max_df: int = 50,
    persist_fn=lambda d: d,
) -> DataFrame:
    """FUZZY train/benchmark decontamination: `decontaminate` catches
    verbatim n-gram overlap; this catches paraphrased/near-duplicate
    leakage the way PaLM/GPT report it — MinHash-LSH candidates between
    the train and benchmark sides, then an exact-Jaccard verify.

    Shape at scale: signatures and band buckets are O(corpus); the
    candidate join runs on (band, bucket) restricted CROSS-side (train x
    bench per bucket — never train x train), the verify joins only the
    candidate ids' df-capped shingles (stop-shingles dropped pre-shuffle,
    the q33 discipline), and the final pair set is re-filtered against
    the candidates so the verify can never widen the LSH recall.

    The shingle table feeds the signature, df-cap, and verify stages —
    pass ``persist_fn`` to materialize it once per action.

    Returns (train_id, bench_id, n_common, jaccard >= threshold).
    """
    sh = persist_fn(
        df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
        )
    )
    flags = df.select(F.col(id_col), bench.alias("_bench"))
    sigs = minhash_signatures_from_shingles(sh, id_col, "shingle", num_hashes)
    bb = lsh_band_buckets(sigs, id_col, num_hashes, bands).join(flags, id_col)
    t = bb.filter(~F.col("_bench")).select(
        F.col(id_col).alias("train_id"), "band", "bucket"
    )
    s = bb.filter(F.col("_bench")).select(
        F.col(id_col).alias("bench_id"), "band", "bucket"
    )
    cand = t.join(s, ["band", "bucket"]).select("train_id", "bench_id").distinct()

    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_dfc"))
    capped_df = dfreq.filter(F.col("_dfc") <= max_df).select("shingle")
    # prune to candidate ids BEFORE the shingle-key shuffle: the verify
    # then moves only candidate documents' shingles, not the corpus
    # (candidate ids are train/bench-side by construction, so no flags
    # join is needed here)
    ft = (
        sh.join(
            cand.select("train_id").distinct(), F.col(id_col) == F.col("train_id")
        )
        .join(capped_df, "shingle")
        .select("train_id", "shingle")
    )
    fs = (
        sh.join(
            cand.select("bench_id").distinct(), F.col(id_col) == F.col("bench_id")
        )
        .join(capped_df, "shingle")
        .select("bench_id", "shingle")
    )
    inter = (
        ft.join(fs, "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_common"))
        .join(cand, ["train_id", "bench_id"])
    )
    sizes = sigs.select(F.col(id_col), "n_shingles")
    sa = sizes.select(F.col(id_col).alias("train_id"), F.col("n_shingles").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("bench_id"), F.col("n_shingles").alias("_nb"))
    return (
        inter.join(sa, "train_id")
        .join(sb, "bench_id")
        .withColumn(
            "_j",
            F.col("n_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("n_common")),
        )
        .filter(F.col("_j") >= threshold)
        .select(
            "train_id",
            "bench_id",
            F.col("n_common").cast("long").alias("n_common"),
            floor_quant(F.col("_j")).alias("jaccard"),
        )
    )


def connected_components_star(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 25,
    persist_fn=None,
    tag_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact connected components by alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the scale-correct algorithm for component resolution
    over a similarity graph.

    Why not plain min-label propagation (neardup_groups)? Propagation
    needs O(diameter) rounds; a pathological near-dup CHAIN (forum
    quote-trains, boilerplate gradients) has diameter O(n) and turns
    the fixed-iteration variant into either a wrong answer or an
    unbounded loop. Star contraction converges in O(log n) rounds on
    ANY topology while every round stays one groupBy + one join on the
    current edge list — O(edges) shuffle, no all-pairs anywhere.

    large-star: every node u links its LARGER neighbors to
    m = min(N(u) u {u}); small-star: with edges held as (hi -> lo),
    every hi links its smaller neighbors (and itself) to their min.
    Both preserve connectivity; together they contract every component
    to a star rooted at its minimum node. Convergence is detected by an
    edge-set signature (count + xxhash sum — one tiny aggregate per
    round); the result is the unique fixpoint, so the round count never
    shows in the output.

    Each round's edge list is cut from its lineage with an eager
    ``localCheckpoint`` — persist() alone is NOT enough for an
    iterated-until-converged loop: the cached blocks short-circuit
    execution, but the LOGICAL plan keeps nesting (each round embeds
    the previous twice), and analyzer/optimizer time grows
    exponentially with the round number (measured: rounds of 2s, 14s,
    then minutes on a 40-edge chain). Checkpointing truncates the plan
    to the materialized blocks; a cluster deployment with executor
    loss concerns uses reliable ``checkpoint`` to HDFS instead.

    Returns (node, component) for every node incident to an edge —
    component = the minimum node id in the component. Isolated nodes
    never appear (they are their own component by definition; joining
    them through log-n rounds would shuffle the corpus for nothing).

    ``tag_cols`` runs INDEPENDENT contractions for every tag value in
    ONE loop — the q270 cut sweep contracts all four thresholded edge
    sets together, paying max(rounds over tags) driver iterations
    instead of their sum (every per-round job here is fixed overhead
    at any scale: scheduling + a tiny-partition shuffle). Output gains
    the tag columns. All grouping/join keys become (tags..., node),
    so per-tag graphs never interact.
    """
    del persist_fn  # lineage truncation below supersedes caller caching
    tags = list(tag_cols)
    e = edges.select(
        *tags,
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    ).distinct()

    # Round lifecycle through the holds registry: each round's eager
    # checkpoint is freed the moment the next round supersedes it
    # (release_ids — O(E) live storage, not O(rounds * E)), and the
    # FINAL round's blocks — which the returned DataFrame still reads —
    # are freed by registry.release_pinned at the next query invocation.
    # The previous df.rdd.unpersist() release freed NOTHING (df.rdd
    # wraps a derived RDD, not the checkpoint's internal one — the
    # holds.py lesson); the no-leak sweep test caught it.
    from frontmatter_mcp_spark.operators.holds import hold_ids, release_ids

    def hold(df: DataFrame) -> tuple[DataFrame, list[int]]:
        return hold_ids(df, eager=True)

    def release(spark_ref, ids: list[int]) -> None:
        release_ids(spark_ref, ids)

    def signature(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: a long sum of 64-bit hashes overflows (ANSI)
            F.coalesce(
                F.sum(F.xxhash64(*tags, "a", "b").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    e, e_ids = hold(e)
    sig = signature(e)
    w_min = Window.partitionBy(*tags, "a")
    for _ in range(max_rounds):
        # Each star phase needs, per row, the min over its (tags, a)
        # group. A window-min keeps the phase a SINGLE linear chain —
        # the groupBy+join-back formulation consumes its input twice,
        # which either recomputes the subplan per consumer or demands a
        # per-round materialization job to share it (both measured
        # slower than one extra sort inside the exchange the phase pays
        # anyway).
        # large-star over the symmetric neighbor view
        nbrs = e.unionAll(
            e.select(*tags, F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = F.least(F.min("b").over(w_min), F.col("a"))
        large = (
            nbrs.withColumn("mb", m)
            .filter(F.col("b") > F.col("a"))
            .select(*tags, F.col("b").alias("a"), F.col("mb").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # no distinct here: small-star's terminal distinct dedupes, and
        # duplicate large-star edges only inflate the (tiny) round
        # intermediate — one fewer exchange per round
        # small-star over (hi -> lo) canonical edges
        canon = large.select(
            *tags, F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        small = (
            canon.withColumn("mb", F.min("b").over(w_min))
            .select(
                *tags,
                F.explode(
                    F.array(
                        F.struct(F.col("b").alias("a"), F.col("mb").alias("b")),
                        F.struct(F.col("a").alias("a"), F.col("mb").alias("b")),
                    )
                ).alias("s"),
            )
            .select(*tags, F.col("s.a").alias("a"), F.col("s.b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        new_e, new_ids = hold(small)
        new_sig = signature(new_e)
        release(new_e.sparkSession, e_ids)
        e, e_ids = new_e, new_ids
        if new_sig == sig:
            break
        sig = new_sig
    roots = (
        e.select(*tags, F.col("b").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    members = e.groupBy(*tags, "a").agg(F.min("b").alias("component")).select(
        *tags, F.col("a").alias("node"), "component"
    )
    return members.unionAll(roots).groupBy(*tags, "node").agg(
        F.min("component").alias("component")
    )
