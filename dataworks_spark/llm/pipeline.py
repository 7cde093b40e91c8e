"""End-to-end training-corpus preparation (SURVEY §2 L1-L6 composed).

``prepare_corpus`` chains the repo's LLM primitives into the standard
pretraining-data flow — the shape a user of this engine runs nightly at
corpus scale:

    exact dedup  →  near-dup dedup (MinHash-LSH candidates, canonical
    survivor per connected component)  →  language filter  →  quality
    filter (length/punct/stopword + repetition)  →  per-doc accounting
    (token counts, fingerprint)

Every stage is pure DataFrame expressions over the existing operators;
nothing here introduces a new shuffle shape. 100 TB notes per stage:

- exact dedup groups on the content hash (shuffle is |distinct|, not
  |rows|) and keeps the lowest id — deterministic under any layout;
- near-dup candidates come from banded MinHash (pair space is band
  collisions, never O(n²)); the canonical-survivor decision is
  min-label propagation over the pair graph (O(component diameter)
  rounds, one job each);
- the language / quality / repetition features are JVM higher-order
  expressions — a single projection pass, no Python boundary;
- the returned frame carries the accounting columns a downstream
  tokenizer shard-writer needs (token counts, fingerprint), so the
  pipeline composes with a partitioned write without another scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataworks_spark.llm.dedup import (
    dedup_keep_canonical,
    exact_dedup_keepers,
    minhash_near_dup_pairs,
)
from dataworks_spark.llm.text import (
    document_fingerprint,
    language_scores,
    quality_features,
    repetition_features,
    token_count,
)


@dataclass(frozen=True)
class CorpusConfig:
    """Thresholds for :func:`prepare_corpus` (defaults follow the
    common C4/Gopher-family ranges; tune per corpus)."""

    near_dup: bool = True              # False = exact dedup only (L1);
                                       # the deterministic, SQL-oracle-
                                       # checkable pipeline mode
    near_dup_threshold: float = 0.5    # MinHash est. Jaccard to call a dup
    min_tokens: int = 5
    max_punct_ratio: float = 0.5
    min_quality_score: float = 0.3
    max_dup_ngram_ratio: float = 0.5   # repetition cut (dup 3-gram share)
    languages: tuple[str, ...] = ()    # () = keep every language
    #: optional model tier (llm/classify.py): a dense weights list
    #: (index = bucket int, collect_weights_array) turns on fastText-
    #: style scoring as a `model_score` column inside the same fused
    #: projection — zero extra joins/shuffles; `min_model_score` makes
    #: it a filter. tuple(...) the list to keep the config hashable.
    model_weights: tuple | None = None
    model_bias: float = 0.0
    min_model_score: float | None = None


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CorpusConfig = CorpusConfig(),
) -> DataFrame:
    """Run the full preparation flow; returns the kept documents with
    ``lang`` (argmax language guess), ``n_tokens``, ``n_bpe_tokens``,
    ``quality_score`` and ``fingerprint`` columns appended.

    Stage order matters and is deliberate: dedup FIRST (cheap hash
    work shrinks the corpus before per-doc feature extraction), then
    the per-doc filters in one fused projection pass."""
    # L1 — exact dedup: keep the deterministic (min-id) survivor row.
    # Hash-keyed keepers: the dedup shuffle carries 16-byte rows, not
    # document text (exact_dedup_keepers), which is what survives when
    # the corpus is 100 TB of documents rather than 10 KB fixtures.
    keepers = exact_dedup_keepers(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    deduped = df.join(keepers, on=id_col, how="left_semi")

    # L2 — near-dup dedup: banded MinHash candidates → connected
    # components → canonical survivor (min id per component).
    # ``near_dup=False`` skips this stage: the remaining pipeline is
    # then a pure deterministic function of the input (exact dedup +
    # per-doc filters), which is what makes the composed flow
    # SQL-oracle-checkable end-to-end.
    if config.near_dup:
        pairs = minhash_near_dup_pairs(
            deduped, id_col, text_col, threshold=config.near_dup_threshold
        )
        surviving = dedup_keep_canonical(deduped, id_col, pairs)
    else:
        surviving = deduped

    # L4 — language, quality, repetition, accounting: ONE projection
    text = F.col(text_col)
    q = quality_features(text)
    rep = repetition_features(text)
    scores = language_scores(text)
    langs = F.map_keys(scores)
    lang = F.get(
        langs,
        F.array_position(
            F.map_values(scores), F.array_max(F.map_values(scores))
        ).cast("int") - 1,
    )
    cols = {
        "lang": lang,
        "n_tokens": q["n_tokens"],
        "n_bpe_tokens": token_count(text, bpe=True),
        "punct_ratio": q["punct_ratio"],
        "quality_score": q["quality_score"],
        "dup_ngram_ratio": rep["dup_3gram_ratio"],
        "fingerprint": document_fingerprint(text),
    }
    if config.min_model_score is not None and config.model_weights is None:
        # fail at config time with the actual mistake named — the
        # filter below would otherwise surface as UNRESOLVED_COLUMN
        # 'model_score' under a multi-page plan dump (r10 review)
        raise ValueError("min_model_score requires model_weights")
    if config.model_weights is not None:
        # model tier rides in the SAME projection: the weights are one
        # array literal, so no join/shuffle attaches the score
        from dataworks_spark.llm.classify import classifier_score_expr

        cols["model_score"] = classifier_score_expr(
            text, list(config.model_weights), bias=config.model_bias
        )
    featured = surviving.withColumns(cols)
    kept = featured.filter(
        (F.col("n_tokens") >= config.min_tokens)
        & (F.col("punct_ratio") <= config.max_punct_ratio)
        & (F.col("quality_score") >= config.min_quality_score)
        & (F.col("dup_ngram_ratio") <= config.max_dup_ngram_ratio)
    )
    if config.min_model_score is not None:
        kept = kept.filter(F.col("model_score") >= config.min_model_score)
    if config.languages:
        kept = kept.filter(F.col("lang").isin(*config.languages))
    return kept.drop("punct_ratio", "dup_ngram_ratio")


#: denominator for hash-bucket arithmetic — fine enough that a split
#: weight of 0.1% is still exact to ~1e-6
_HASH_BUCKETS = 1_000_000


def _hash_bucket(col, seed: int, salt: str):
    """Uniform bucket in [0, _HASH_BUCKETS) from a value hash —
    deterministic in the VALUE (never partition order, row order, or an
    RNG stream), so assignments survive recomputation, repartitioning,
    and incremental corpus rebuilds. pmod keeps negatives positive.

    ``salt`` decorrelates the hash streams of different consumers:
    without it, hash_split and stratified_sample_by_hash at the same
    seed would read the SAME bucket per id — sampling a non-first
    split would then silently return 0 rows (perfect correlation).

    NULL ids would all collapse into one bucket (xxhash64 skips null
    children), silently skewing every proportion — rejected at
    execution time instead."""
    bucket = F.pmod(F.xxhash64(F.lit(salt), F.lit(seed), col), F.lit(_HASH_BUCKETS))
    guard = F.assert_true(
        col.isNotNull(), F.lit(f"{salt}: null id — hash assignment undefined")
    )
    return F.when(guard.isNull(), bucket)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a
    pure function of (seed, id) — the property randomSplit does NOT
    have (its RNG is per-partition, so a repartition or a rerun deals
    different rows to different splits). A document keeps its split
    forever, across corpus versions, as long as its id is stable —
    which is what prevents silent train/test contamination when the
    corpus is regenerated. One projection, no shuffle, no state.

    Band order is canonicalized (sorted split names), so the assignment
    depends only on (seed, id, weight VALUES) — never on dict insertion
    order, which would otherwise re-deal documents between splits when
    the same weights arrive ordered differently from a config file."""
    import math

    if not weights or any(
        not math.isfinite(w) or w < 0 for w in weights.values()
    ):
        raise ValueError(f"weights must be finite and non-negative: {weights}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError(f"weights must sum to a positive total: {weights}")
    bucket = _hash_bucket(F.col(id_col), seed, "hash_split")
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = int(acc * _HASH_BUCKETS)
        expr = (
            F.when(bucket < F.lit(cut), F.lit(name))
            if expr is None
            else expr.when(bucket < F.lit(cut), F.lit(name))
        )
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality_score",
    tokens_col: str = "n_tokens",
    buckets: int = 1000,
) -> DataFrame:
    """Keep the highest-``quality_col`` documents whose combined
    ``tokens_col`` stays within ``budget_tokens`` — the final selection
    step of a pretraining mix.

    Scale shape: a global quality sort with a cumulative-sum window
    would serialize the corpus through one partition; instead quality
    is histogrammed into ``buckets`` fixed bins in a SINGLE
    map-side-combined aggregation that also carries the per-bin
    min/max used for the range check (the collect is ``buckets`` rows,
    corpus-size independent — one scan of the corpus total), the
    driver picks the lowest bin whose suffix token sum fits the
    budget, and the result is a plain pushed-down filter.
    Granularity: the kept set lands within one bin's token mass of the
    budget — raise ``buckets`` for tighter tolerance. Deterministic:
    bin edges are fixed in [0, 1] (scores outside that range — or NaN
    scores, which no bin can hold — are an error: a 0-100 scale would
    silently clamp the whole corpus into one bin and make selection
    all-or-nothing). Rows with NULL quality or NULL token counts are
    excluded from both the histogram and the result."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    q = F.col(quality_col)
    df = df.filter(q.isNotNull() & F.col(tokens_col).isNotNull())
    # NaN sorts greatest under min/max, so a NaN score would silently
    # pass a plain `hi > 1.0` Python check (nan > 1.0 is False) — bin
    # it to a sentinel instead and reject after the aggregation. isnan
    # only types on float/double; other numeric types can't hold NaN.
    dtype = dict(df.dtypes).get(quality_col)
    is_nan = F.isnan(q) if dtype in ("float", "double") else F.lit(False)
    bin_col = F.when(is_nan, F.lit(-1)).otherwise(
        F.least(
            F.greatest(F.floor(q * buckets).cast("int"), F.lit(0)), F.lit(buckets - 1)
        )
    )
    hist = (
        df.groupBy(bin_col.alias("__bin"))
        .agg(
            F.sum(tokens_col).alias("__toks"),
            F.min(q).alias("__lo"),
            F.max(q).alias("__hi"),
        )
        .collect()
    )
    lows = [r["__lo"] for r in hist if r["__bin"] >= 0]
    highs = [r["__hi"] for r in hist if r["__bin"] >= 0]
    if any(r["__bin"] == -1 for r in hist):
        raise ValueError(f"{quality_col} contains NaN — no bin can hold it")
    if lows and (min(lows) < 0.0 or max(highs) > 1.0):
        raise ValueError(
            f"{quality_col} must lie in [0, 1] (observed "
            f"[{min(lows)}, {max(highs)}]); normalize the score first"
        )
    toks_by_bin = {r["__bin"]: r["__toks"] for r in hist}
    acc = 0
    cutoff_bin = buckets  # empty result if even the top bin overflows
    for b in sorted(toks_by_bin, reverse=True):
        if acc + toks_by_bin[b] > budget_tokens:
            break
        acc += toks_by_bin[b]
        cutoff_bin = b
    return df.filter(bin_col >= F.lit(cutoff_bin))


def mix_corpus(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    total_tokens: int | None = None,
    seed: int = 42,
    sample_mode: str = "hash",
    max_epochs: int = 100,
    exact_tokens: bool = False,
) -> DataFrame:
    """Domain mixing: re-weight the corpus so each stratum (source /
    domain / language) contributes ``weights``-proportional TOKEN mass —
    the mixture step every pretraining data recipe runs (the public
    Pile/LLaMA-style domain-weights construction). Appends an ``epoch``
    column (0-based copy index; >0 only when a stratum upsamples).

    Two modes:
      ``total_tokens=None`` (default) — the LARGEST mix achievable
      without upsampling: scale ``T = min_s(actual_s / w_s)``, keep
      fraction ``f_s = w_s·T / actual_s`` (≤1 by construction; the
      binding stratum keeps everything). No weight normalization is
      involved, so the fractions are exact IEEE expressions of
      (weights, totals) — reproducible by any engine.
      ``total_tokens=N`` — hit an explicit token budget: ``f_s =
      (w_s/Σw)·N / actual_s``; a stratum whose fraction exceeds 1 is
      UPSAMPLED — ``floor(f_s)`` full copies plus a hash-selected
      remainder, written as extra ``epoch`` values (repeat-epochs
      semantics, the standard trade for scarce high-quality domains).

    Scale shape: per-stratum token totals are ONE map-side-combined
    aggregation (|strata| rows to the driver — domains are bounded by
    construction); selection is a pure projection-time filter (hash
    threshold), and upsampling is ``explode(sequence(...))`` — no
    shuffle anywhere, composable with the scan. Sampling docs at rate
    ``f_s`` keeps ``f_s`` of the stratum's token mass in expectation
    (doc length is independent of the id hash by construction).

    ``sample_mode``: ``"hash"`` (default) selects by salted id-hash —
    layout/rerun-stable like :func:`hash_split`; ``"id"`` selects by a
    Knuth multiplicative bucket ``((id % 1e6) · 2654435761) % 1e6`` —
    same machinery in exact integer arithmetic any engine reproduces
    (the SQL-oracle mode). The multiplier is odd and coprime to 1e6,
    so it permutes the residues: DENSE ids spread uniformly over the
    bucket space (a plain ``id % 1e6`` would keep every id below the
    cut — a vacuous filter for small-id corpora). Products stay under
    2.7e15, no 64-bit overflow either side.

    ``exact_tokens=True`` upgrades the rate sampling to a HARD budget:
    each stratum contributes the maximal token mass ≤ its target (not
    merely the target in expectation). Docs are taken in deterministic
    (bucket, id) order; a doc earns its remainder-epoch copy iff
    ``full·actual + running_token_total ≤ target`` — a greedy prefix,
    so the kept mass lands within one document of the target. Scale
    shape: the running total is NOT one giant per-stratum window — a
    per-(stratum, bin) histogram (1000 bucket-range bins) is one
    map-side-combined aggregation collected at |strata|×1000 rows; the
    driver turns its cumulative sums into per-stratum boundary-bin
    literals, full bins resolve with a constant comparison, and only
    the ~1/1000 boundary-bin slice pays a per-stratum window. The
    prefix decision compares ``int_cumsum + int_offset ≤ float_target``
    in exactly that shape on both engines, so the construction is
    reproducible by the SQL oracle down to IEEE semantics.

    Strata present in the corpus but absent from ``weights`` are
    DROPPED (weight 0). Strata named in ``weights`` but absent from
    the corpus raise — a silent miss would skew every other stratum's
    share."""
    import math

    if sample_mode not in ("hash", "id"):
        raise ValueError(f"sample_mode must be 'hash' or 'id': {sample_mode!r}")
    if not weights or any(
        not math.isfinite(w) or w <= 0 for w in weights.values()
    ):
        raise ValueError(f"weights must be finite and positive: {weights}")
    totals = {
        r["s"]: r["t"]
        for r in df.filter(F.col(strata_col).isin(*weights))
        .groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    missing = sorted(set(weights) - set(totals))
    if missing:
        raise ValueError(f"strata in weights but not in corpus: {missing}")
    # a stratum with zero (or all-NULL) token mass cannot satisfy any
    # positive share — previously a bare ZeroDivisionError/TypeError
    # deep in the fraction math instead of a diagnosis naming the
    # stratum (r10 review, confirmed live)
    empty = sorted(s for s in weights if not totals.get(s))
    if empty:
        raise ValueError(
            f"strata with zero/NULL token mass cannot be mixed: {empty}; "
            "drop them from weights or fix their token counts"
        )
    if total_tokens is None:
        scale = min(totals[s] / weights[s] for s in weights)
        targets = {s: weights[s] * scale for s in weights}
    else:
        if total_tokens <= 0:
            raise ValueError(f"total_tokens must be positive: {total_tokens}")
        wsum = sum(weights[s] for s in sorted(weights))
        targets = {s: (weights[s] / wsum) * total_tokens for s in weights}
    fracs = {s: targets[s] / totals[s] for s in weights}
    if total_tokens is not None:
        blown = {s: round(f, 1) for s, f in fracs.items() if f > max_epochs}
        if blown:
            # a typo'd budget would otherwise explode every row of a
            # scarce stratum into thousands of epoch copies — refuse
            # loudly; repeat counts beyond ~tens of epochs are a recipe
            # error, not a mixing decision
            raise ValueError(
                f"total_tokens={total_tokens} needs over {max_epochs} repeat "
                f"epochs for strata {blown}; raise max_epochs if intended"
            )
    if sample_mode == "hash":
        bucket = _hash_bucket(F.col(id_col), seed, "mix_corpus")
    else:
        bucket = F.pmod(
            F.pmod(F.col(id_col), F.lit(_HASH_BUCKETS)) * F.lit(2654435761),
            F.lit(_HASH_BUCKETS),
        )
    if exact_tokens:
        return _mix_exact(
            df, strata_col, tokens_col, id_col, bucket, weights, totals, targets
        )
    full = _stratum_lit(strata_col, {s: int(fracs[s]) for s in weights})
    rem_cut = _stratum_lit(
        strata_col,
        {s: int((fracs[s] - int(fracs[s])) * _HASH_BUCKETS) for s in weights},
    )
    copies = full + (bucket < rem_cut).cast("int")
    return (
        df.filter(F.col(strata_col).isin(*weights))
        .withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__copies") - 1))
        )
        .drop("__copies")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between consecutive
    chunks (stride = chunk_tokens − overlap) — the context-window
    chunking step every training/RAG corpus build runs. Output one row
    per chunk: (id, chunk_idx, chunk_text, chunk_n_tokens).

    Chunk starts are 1 + k·stride for k = 0.. while start ≤
    max(n − overlap, 1): the final chunk may run short rather than
    re-reading a sub-overlap tail twice, every token lands in ≥1 chunk,
    and consecutive chunks share exactly ``overlap`` tokens wherever a
    full window remains. chunk_idx = (start−1)/stride is derived
    arithmetically (not by explode ordinality), so any engine
    reproduces it.

    Scale shape: tokenize-once let-binding (single-element transform),
    then a pure projection + explode — no shuffle, composable with the
    scan; output size is input tokens × (1 + overlap/stride)."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): {overlap} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    # NULL text behaves as '' (one empty chunk) — without the coalesce,
    # size(NULL tokens) is NULL and the least/greatest guards silently
    # fabricate a full-width chunk_n_tokens for the null row
    chunks = F.flatten(
        F.transform(
            F.array(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")),
            lambda toks: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(toks) - overlap, F.lit(1)),
                    F.lit(stride),
                ),
                lambda s: F.struct(
                    (
                        (s - 1) / F.lit(stride)
                    ).cast("int").alias("chunk_idx"),
                    F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias(
                        "chunk_text"
                    ),
                    F.least(
                        F.lit(chunk_tokens), F.size(toks) - s + 1
                    ).cast("bigint").alias("chunk_n_tokens"),
                ),
            ),
        )
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(id_col, "__c.chunk_idx", "__c.chunk_text", "__c.chunk_n_tokens")


def dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 32,
    sep: str | None = None,
    join_sep: str | None = None,
) -> DataFrame:
    """Span-level exact substring dedup — the practical form of
    "deduplicate training data" substring removal (Lee et al. 2021's
    suffix-array exact-substring dedup, approximated at fixed
    token-window granularity the way public corpus pipelines run it):
    split every document into non-overlapping ``span_tokens`` windows,
    keep only the FIRST occurrence of each distinct span corpus-wide
    (ordered by (doc id, span index) — a total order, so the survivor
    set is deterministic under any partitioning), and rebuild each
    document from its surviving spans in original order. Repeated
    boilerplate (headers, license blocks, templated paragraphs) is cut
    from every document but its first, without dropping whole docs.

    Returns one row per input document: (id, rebuilt text, n_spans,
    n_spans_kept) — a document whose every span was seen earlier
    rebuilds to ''.

    Scale shape: chunking is a pure projection+explode (no shuffle);
    first-occurrence election is ONE window over the span key — the
    span text must co-locate with its keep decision anyway (the kept
    text is the output), so electing via window instead of a
    keeper-join saves the second pass over the exploded relation — and
    the rebuild is one groupBy(doc). Two shuffles total, both linear in
    corpus tokens. The window key leads with xxhash64(span) so partition
    routing and sort compare 8-byte longs, with the span itself as
    tiebreaker so a 64-bit collision can merge two partitions but never
    two distinct spans' elections.

    ``sep`` switches the span unit from fixed token windows to natural
    boundaries (e.g. ``"\\n\\n"`` paragraphs): the text splits on the
    regex, spans index by position, and surviving spans rejoin with
    ``join_sep`` (defaults to ``sep`` — pass it explicitly when ``sep``
    is a non-literal regex)."""
    if sep is not None:
        # coalesce: posexplode of a NULL array emits no rows, which
        # would silently DROP null-text documents from the output
        spans = df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), sep, -1)
            ).alias("chunk_idx", "chunk_text"),
        )
        joiner = join_sep if join_sep is not None else sep
    else:
        spans = chunk_documents(
            df, id_col=id_col, text_col=text_col, chunk_tokens=span_tokens, overlap=0
        )
        joiner = " "
    from pyspark.sql import Window

    w = Window.partitionBy(F.xxhash64("chunk_text"), "chunk_text")
    flagged = spans.withColumn(
        "__keep",
        F.struct(F.col(id_col), F.col("chunk_idx"))
        == F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).over(w),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("__keep").cast("long")).alias("n_spans_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct("chunk_idx", "chunk_text"),
                        )
                    )
                ),
                lambda s: s.chunk_text,
            ),
            joiner,
        ).alias(text_col),
    )


_MIX_BINS = 1000


def _stratum_lit(strata_col: str, mapping: dict, default=None):
    """Chained-when literal lookup keyed by stratum (bounded |strata|
    branches — a broadcast-join-free constant per row). ``default``
    fills strata absent from the mapping (NULL otherwise)."""
    expr = None
    for s in sorted(mapping):
        cond = F.col(strata_col) == F.lit(s)
        expr = (
            F.when(cond, F.lit(mapping[s]))
            if expr is None
            else expr.when(cond, F.lit(mapping[s]))
        )
    if expr is None:
        return F.lit(default)
    return expr if default is None else expr.otherwise(F.lit(default))


def _mix_exact(
    df: DataFrame,
    strata_col: str,
    tokens_col: str,
    id_col: str,
    bucket,
    weights: dict[str, float],
    totals: dict[str, int],
    targets: dict[str, float],
) -> DataFrame:
    """Hard-budget selection for :func:`mix_corpus` (``exact_tokens``).

    Per doc (in (bucket, id) order within its stratum) the keep rule is
      copies = full + [ full·actual + running_token_total ≤ target ]
    with full = ⌊target/actual⌋ whole epochs. The running total is
    resolved in two phases so no stratum ever becomes one window task:
    a (stratum, bin) histogram over ``_MIX_BINS`` contiguous bucket
    ranges (single map-side-combined agg, |strata|·bins driver rows)
    gives exact integer prefix sums; every bin strictly below/above the
    per-stratum boundary bin resolves with a constant; only the
    boundary bin's ~1/bins slice runs a per-stratum ROWS window, with
    the bin's integer prefix offset added back so the compare is
    byte-identical to a global ``cumsum ≤ target`` (what the SQL oracle
    runs)."""
    from pyspark.sql import Window

    bin_width = _HASH_BUCKETS // _MIX_BINS
    base = (
        df.filter(F.col(strata_col).isin(*weights))
        .withColumn("__bucket", bucket)
        .withColumn("__bin", (F.col("__bucket") / bin_width).cast("int"))
    )
    hist = {
        (r["s"], r["b"]): r["t"]
        for r in base.groupBy(
            F.col(strata_col).alias("s"), F.col("__bin").alias("b")
        )
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    full = {s: int(targets[s] // totals[s]) for s in weights}
    cut, offset = {}, {}
    for s in sorted(weights):
        shift = full[s] * totals[s]  # whole-epoch token mass, exact int
        pre, cut[s] = 0, _MIX_BINS  # no crossing → no boundary bin
        for b in range(_MIX_BINS):
            t = hist.get((s, b), 0)
            # exact int-vs-float compare (Python compares rationals)
            if shift + pre + t > targets[s]:
                cut[s] = b
                break
            pre += t
        offset[s] = shift + pre
    cut_e = _stratum_lit(strata_col, cut)
    off_e = _stratum_lit(strata_col, offset)
    full_e = _stratum_lit(strata_col, full)
    tgt_e = _stratum_lit(strata_col, targets)
    # one scan resolves every non-boundary bin (below → extra copy,
    # above → none); only the boundary bin's ~1/bins slice windows
    non_boundary = base.filter(F.col("__bin") != cut_e).withColumn(
        "__extra", (F.col("__bin") < cut_e).cast("int")
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy("__bucket", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary = (
        base.filter(F.col("__bin") == cut_e)
        .withColumn(
            "__extra",
            ((F.sum(tokens_col).over(w) + off_e) <= tgt_e).cast("int"),
        )
    )
    return (
        non_boundary.unionByName(boundary)
        .withColumn("__copies", full_e + F.col("__extra"))
        .filter(F.col("__copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__copies") - 1))
        )
        .drop("__copies", "__extra", "__bucket", "__bin")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    ngram_n: int = 5,
    mark_only: bool = False,
    bloom_fpp: float | None = None,
) -> DataFrame:
    """Remove (or flag, with ``mark_only=True``) training documents
    that share any word ``ngram_n``-gram with the evaluation set — the
    standard benchmark-decontamination step a pretraining pipeline
    runs before training (the public n-gram-overlap construction from
    the GPT-3/PaLM data-card methodology).

    Scale shape: both sides shingle to xxhash64 longs (the same
    hashed-shingle kernel the dedup tier uses — no shingle strings are
    built); the eval side of a decontamination run is benchmarks —
    tiny against the corpus — so its DISTINCT shingle set broadcasts,
    contaminated ids fall out of a broadcast semi-join over a
    (id, shingle) projection, and the clean set is a broadcast-able
    anti-join of the corpus against those ids: the corpus is scanned
    once and never shuffles. A train doc with fewer than ``ngram_n``
    tokens has no shingles and can never be flagged. 64-bit shingle
    collisions can only OVER-remove (a train shingle falsely matching
    an eval one) — the safe direction for contamination; rate
    ~|shingles|²/2⁶⁵.

    ``bloom_fpp`` switches on the Bloom-prefilter tier for benchmark
    suites whose exact shingle set is too big to broadcast comfortably
    (a full eval harness can carry 10⁸ shingles ≈ GBs exact, vs ~170 MB
    of Bloom bits at fpp 1e-3): the eval shingles fold into ONE Bloom
    built DISTRIBUTED (`functions/bloom.py` — bit_or word aggregation,
    shuffle ≤ filter-size, bounded control-plane collect of the packed
    words), and the corpus scan keeps only docs where
    ``exists(shingles, might_contain(·))`` — a pure JVM probe
    expression fused into the scan projection, so clean docs never
    explode at all. Flagged docs (true hits + Bloom false positives)
    then run the EXACT semi-join above; false positives only add
    candidates to that verify, so the final answer is byte-identical
    to the exact path — the Bloom prunes work, never changes
    results."""
    from dataworks_spark.functions.bloom import bloom_build
    from dataworks_spark.llm.dedup import shingle_hashes

    ev_col = eval_text_col or text_col
    eval_shingles = (
        eval_df.select(F.explode(shingle_hashes(F.col(ev_col), ngram_n)).alias("__sh"))
        .dropDuplicates()
    )
    candidates = train
    if bloom_fpp is not None:
        # the Bloom tier consumes the eval-shingle relation THREE times
        # (count for sizing, the bloom_build scan, the verify join) —
        # materialize it once or the explode+distinct shuffle the tier
        # exists to avoid runs three times (r9 review; same pattern as
        # minhash_near_dup_pairs' banded checkpoint)
        eval_shingles = eval_shingles.localCheckpoint(eager=False)
        n_items = max(eval_shingles.count(), 1)
        bloom = bloom_build(eval_shingles, F.col("__sh"), n_items, bloom_fpp)
        candidates = train.filter(
            F.exists(
                shingle_hashes(F.col(text_col), ngram_n),
                bloom.might_contain,
            )
        )
    # the verify join broadcasts ONLY on the exact path (eval sets that
    # fit the driver by assumption). The Bloom tier exists precisely
    # for eval-shingle sets too big to broadcast comfortably (its own
    # docstring: ~GBs exact vs ~170 MB of bits) — force-broadcasting
    # the same relation in its verify join reintroduced the memory
    # cliff the tier removes (r10 review); under the Bloom path the
    # join strategy is left to AQE, exactly like the contaminated-ids
    # join below.
    verify_side = eval_shingles if bloom_fpp is not None else F.broadcast(eval_shingles)
    contaminated_ids = (
        candidates.select(
            F.col(id_col), F.explode(shingle_hashes(F.col(text_col), ngram_n)).alias("__sh")
        )
        .join(verify_side, on="__sh", how="left_semi")
        .select(id_col)
        .dropDuplicates()
    )
    # the contaminated-id set is NOT force-broadcast: it is bounded by
    # how much of the corpus matches (a widely-quoted benchmark could
    # flag millions of docs) — AQE picks broadcast when it is small
    if mark_only:
        flags = contaminated_ids.withColumn("__hit", F.lit(True))
        return (
            train.join(flags, on=id_col, how="left")
            .withColumn("contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
            .drop("__hit")
        )
    return train.join(contaminated_ids, on=id_col, how="left_anti")


def bucket_by_score(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    labels: tuple | None = None,
    exact: bool = True,
    bucket_col: str = "score_bucket",
) -> DataFrame:
    """Quantile-bucket rows by a score column — CCNet's head/middle/
    tail split (n_buckets=3 over LM bits/token) generalized: append
    ``bucket_col`` with the row's quantile bucket (0 = lowest scores,
    or ``labels[i]``).

    ``exact=True`` computes boundaries with ONE exact interpolated-
    percentile aggregate (a one-row collect of n_buckets−1 doubles —
    bounded, but the exact percentile is a sort-based aggregate: fine
    to sf-scale fixtures and engine-reproducible, which is what the
    SQL oracle checks). ``exact=False`` is the 100 TB path: Spark's
    single-pass ``percentile_approx`` sketch — no global sort, same
    assignment machinery, boundaries approximate within the sketch
    accuracy. Assignment itself is a pure projection either way: the
    boundaries ride as literals, so bucketing adds no shuffle."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be ≥ 2: {n_buckets}")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(f"labels must have {n_buckets} entries")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    score = F.col(score_col).cast("double")
    if exact:
        agg = F.percentile(score, F.array(*[F.lit(q) for q in qs]))
    else:
        agg = F.percentile_approx(score, F.array(*[F.lit(q) for q in qs]), F.lit(10_000))
    # NaN/NULL scores are detected in the SAME one-row aggregate (no
    # extra job): Spark orders NaN above every value, so a single NaN
    # would both skew the quantile boundaries and land in the top
    # bucket; a NULL would silently bucket 0 — both corrupt a CCNet
    # head/middle/tail split with no error (r9 review, live-verified).
    # select_token_budget takes the same stance for the same reason.
    row = df.select(
        agg.alias("__b"),
        F.sum(F.isnan(score).cast("long")).alias("__nan"),
        F.sum(score.isNull().cast("long")).alias("__null"),
    ).first()
    if row["__nan"] or row["__null"]:
        raise ValueError(
            f"bucket_by_score: {score_col!r} has {row['__nan'] or 0} NaN and "
            f"{row['__null'] or 0} NULL scores — filter or impute them first "
            "(NaN skews the quantile boundaries and sorts above every score)"
        )
    bounds = row["__b"]
    if bounds is None:
        raise ValueError(
            f"bucket_by_score: no quantile boundaries — input is empty "
            f"(or {score_col!r} is all-NULL)"
        )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(score > F.lit(float(b)), 1).otherwise(0)
    if labels is not None:
        mapping = F.array(*[F.lit(l) for l in labels])
        bucket = F.element_at(mapping, bucket + 1)
    return df.withColumn(bucket_col, bucket)


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    ngram_n: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Per-eval-document contamination audit — the REPORT companion to
    :func:`decontaminate`'s drop: for each eval doc, the fraction of
    its distinct word ``ngram_n``-grams that appear anywhere in the
    training corpus: (eval_id, n_grams, n_hit, contamination). The
    number an eval owner needs to decide whether a benchmark is
    compromised, not just which train docs to cut.

    Scale shape (the direction flip from decontaminate matters): the
    eval side is the small one, so its (eval_id, shingle) relation
    BROADCASTS into a single scan of the corpus; matched pairs are
    partial-agg deduplicated map-side, so the only shuffle carries at
    most |eval shingles| rows — the corpus itself never shuffles and
    is read exactly once. Shingles are 64-bit hashes (counts are what
    surfaces, and two distinct grams colliding shifts a count with
    probability ~|shingles|²/2⁶⁵); eval docs shorter than ``ngram_n``
    tokens report 0/0 → contamination 0.0 rather than disappearing."""
    from dataworks_spark.llm.dedup import shingle_hashes

    ev_id = eval_id_col or id_col
    ev_col = eval_text_col or text_col
    ev = (
        eval_df.select(
            F.col(ev_id).alias("eval_id"),
            F.explode(shingle_hashes(F.col(ev_col), ngram_n)).alias("__sh"),
        )
        .dropDuplicates()
    )
    sizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.select(F.explode(shingle_hashes(F.col(text_col), ngram_n)).alias("__sh"))
        .join(F.broadcast(ev), on="__sh")
        .select("eval_id", "__sh")
        .dropDuplicates()
        .groupBy("eval_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = eval_df.select(F.col(ev_id).alias("eval_id")).dropDuplicates()
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint")
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint")
    frac = F.when(
        n_grams > 0, F.round(n_hit.cast("double") / n_grams, round_to)
    ).otherwise(F.lit(0.0))
    return (
        base.join(sizes, on="eval_id", how="left")
        .join(hits, on="eval_id", how="left")
        .select(
            "eval_id",
            n_grams.alias("n_grams"),
            n_hit.alias("n_hit"),
            frac.alias("contamination"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    target_tokens: int = 4096,
    lanes: int = 256,
    seed: int = 42,
    assign: str = "hash",
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs (the
    greedy concat-and-chunk packing every pretraining data loader
    performs): appends ``pack_lane`` and ``pack_seq`` — documents
    sharing (lane, seq) are concatenated into one training sequence.

    Scale shape: one GLOBAL running-token-total window would serialize
    the corpus through a single partition, so documents are first
    hash-assigned to ``lanes`` independent packing lanes and each lane
    packs by exclusive running token count over a deterministic
    (hash, id) order — ``pack_seq = floor(cum_before / target)``.
    One shuffle (by lane), each lane a window partition; lanes scale
    the same way shuffle partitions do. Deterministic in values (the
    order inside a lane is a function of seed+id, never physical
    layout), so a rerun packs identically. Greedy semantics: a pack's
    total may overrun ``target_tokens`` by at most its last document —
    the standard trade against bin-packing shuffles; the data loader
    truncates or rolls the tail into the next sequence.

    ``assign`` picks the lane/order construction: ``"hash"`` (default)
    hash-assigns lanes and orders by a decorrelated id-hash — the
    production mode, which also SHUFFLES document order so a pack mixes
    unrelated documents (the curriculum-neutral property trainers
    want); ``"id"`` assigns ``id % lanes`` ordered by id — same packing
    machinery, but reproducible by any engine (the mode the SQL oracle
    checks; also the right choice when the caller has pre-ordered ids
    deliberately).

    NULL token counts are rejected (they would poison every downstream
    running sum in their lane)."""
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be positive: {target_tokens}")
    if assign not in ("hash", "id"):
        raise ValueError(f"assign must be 'hash' or 'id': {assign!r}")
    from pyspark.sql import Window

    # NULL ids hash to one lane with identical order keys, making pack
    # composition partition-dependent — the exact rerun-identity break
    # the docstring forbids (r10 review, confirmed live: plain vs
    # repartition(7) input packed NULL-id docs differently). Same loud
    # execution-time rejection as _hash_bucket/the tokens guard.
    guard = F.assert_true(
        F.col(tokens_col).isNotNull() & F.col(id_col).isNotNull(),
        F.lit(f"pack_sequences: null {tokens_col} or {id_col}"),
    )
    if assign == "hash":
        lane = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(lanes)).cast("int")
        order = [F.xxhash64(F.lit(seed + 1), F.col(id_col)), F.col(id_col)]
    else:
        lane = F.pmod(F.col(id_col), F.lit(lanes)).cast("int")
        order = [F.col(id_col)]
    out = df.withColumn("pack_lane", F.when(guard.isNull(), lane))
    w = (
        Window.partitionBy("pack_lane")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return out.withColumn(
        "pack_seq", F.floor(cum_before / F.lit(target_tokens)).cast("bigint")
    )


def write_corpus_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    partition_by: tuple = ("split",),
    files_per_partition: int = 8,
    max_records_per_file: int = 100_000,
) -> None:
    """Shard the prepared corpus to parquet the way a trainer consumes
    it: directory-partitioned by ``partition_by`` (split/lang — readers
    prune at the directory level), each directory holding
    ``files_per_partition`` hash-spread files (deterministic spread by
    id, so shard membership survives rewrites) with
    ``maxRecordsPerFile`` bounding the tail. The repartition clusters
    each output file's rows into one task — no tiny-file spray, no
    single-writer bottleneck per directory. The task count is set
    EXPLICITLY (dirs × files_per_partition): an expression-only
    repartition lets AQE coalesce a byte-small shuffle into one task,
    which would silently collapse every directory to a single file.
    Counting the distinct directory combos is a metadata-scale job —
    partition columns with unbounded cardinality are a broken layout
    long before this count hurts."""
    n_dirs = max(df.select(*partition_by).dropDuplicates().count(), 1)
    spread = F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_partition))
    cols = [F.col(c) for c in partition_by] + [spread]
    (
        df.repartition(n_dirs * files_per_partition, *cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
    # stamp the shards' post-write fingerprint (r15): the trainer is a
    # DIFFERENT system reading this path later — the stamp lets it (or
    # session.verify_table_meta on its behalf) prove the shards are the
    # bytes this job wrote, the same evidence every engine-managed
    # durable table now carries
    from dataworks_spark.session import write_table_meta

    write_table_meta(df.sparkSession, path, extra={"writer": "corpus_shards"})


def stratified_sample_by_hash(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic stratified sampling: keep ~``fractions[stratum]``
    of each stratum, selected by id-hash threshold — unlike
    ``DataFrame.sampleBy`` the selection is reproducible and
    layout-independent, and a row once sampled stays sampled under any
    rerun (stable dataset cards / eval subsets). Pure filter: pushes
    into the scan, no shuffle."""
    bad = {k: v for k, v in fractions.items() if not (0.0 <= float(v) <= 1.0)}
    if bad:
        raise ValueError(f"fractions must be in [0, 1]: {bad}")
    if not (0.0 <= float(default_fraction) <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1]: {default_fraction}")
    bucket = _hash_bucket(F.col(id_col), seed, "stratified_sample")
    cut = _stratum_lit(
        strata_col,
        {s: int(float(f) * _HASH_BUCKETS) for s, f in fractions.items()},
        default=int(default_fraction * _HASH_BUCKETS),
    )
    return df.filter(bucket < cut)
