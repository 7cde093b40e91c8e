"""Model-based quality scoring (L-family extension: the fastText-style
classifier tier of a training-data pipeline, complementing the
heuristic filters in ``llm/text.py`` and the unigram LM in
``unigram_lm_scores``).

A linear classifier over hashed bag-of-words features — the shape used
by CCNet / GPT-3-era quality filtering (public design: Joulin et al.,
"Bag of Tricks for Efficient Text Classification", 2016). The model is
a plain (bucket, weight) TABLE, so a trained model drops in without
code changes; :func:`default_hash_weights` provides a deterministic
stand-in (no model files ship with this repo — the stand-in makes the
plumbing testable and oracle-checkable, and is clearly labelled).

Feature hashing is md5-prefix bucketing (``substring(md5(token), 1,
k)`` → 16^k buckets): md5 is the one hash both Spark and DuckDB
compute identically, so the full score — hashing, lookup, logistic —
is differential-testable against an independent engine. All JVM
codegen expressions; no Python boundary.

Scale (100 TB): the weights relation is 16^k rows (k=3 → 4096) —
always broadcast, never shuffled. Tokens explode narrow (explode
preserves partitioning), the broadcast join adds no exchange, and the
per-doc partial aggregate collapses each partition's token rows to one
row per document before the only shuffle, which therefore carries
|documents| rows, not |tokens|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: 16^3 = 4096 hash buckets — vocabulary-independent model size.
DEFAULT_HEX_CHARS = 3


def token_buckets(text: Column, n_hex_chars: int = DEFAULT_HEX_CHARS) -> Column:
    """Array of feature-bucket keys for a text: lowercase whitespace
    tokens → first ``n_hex_chars`` of md5 (a 4-bit-per-char bucket id
    kept as a STRING key — no hex→int conversion, so the expression
    stays whole-stage-codegen and reproduces verbatim in DuckDB)."""
    toks = F.split(F.lower(text), " ")
    nonempty = F.filter(toks, lambda t: t != F.lit(""))
    return F.transform(nonempty, lambda t: F.substring(F.md5(t), 1, n_hex_chars))


def default_hash_weights(
    spark: SparkSession,
    n_hex_chars: int = DEFAULT_HEX_CHARS,
    seed: int = 7,
    scale: float = 1.0,
) -> DataFrame:
    """Deterministic stand-in weights table ``(bucket_hex, weight)``,
    weight ∈ [-scale/2, scale/2). A Knuth-multiplicative mix of the
    bucket index stands in for trained coefficients; swap in a real
    model with the same two-column schema. Integer arithmetic stays
    inside int64 (max id·2654435761 ≈ 1.1e13), so both engines compute
    bit-identical weights."""
    n = 16**n_hex_chars
    mixed = (F.col("id") * F.lit(2654435761) + F.lit(seed)) % F.lit(1000003)
    return spark.range(n).select(
        F.lpad(F.lower(F.hex(F.col("id"))), n_hex_chars, "0").alias("bucket_hex"),
        ((mixed / F.lit(1000003.0) - F.lit(0.5)) * F.lit(scale)).alias("weight"),
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
    n_hex_chars: int = DEFAULT_HEX_CHARS,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-document logistic quality score under a hashed linear model:
    ``sigmoid(bias + mean(weight[bucket(token)]))``.

    Returns (id_col, n_tokens, quality_score). Buckets missing from the
    weights table contribute 0 (an untrained/pruned feature), and a
    document with no tokens scores ``sigmoid(bias)`` — documents are
    never dropped by scoring. ``round_to`` rounds the score so
    cross-engine float-sum ordering can't flip the last ulp (pass
    ``None`` for the raw double).
    """
    # explode the raw split and bucket AFTER the explode: every step
    # (split, explode, when, md5, substring) stays in whole-stage
    # codegen, where the array-HOF form (token_buckets) drops the
    # filter/transform lambdas to interpreted eval — measured ~11% off
    # this query at sf0.1 and strictly better at scale (the HOF tax is
    # per token). Empty/NULL tokens become NULL buckets (join misses,
    # count skips) instead of being filtered out, which preserves the
    # docs-never-dropped rule with identical scores.
    tok = F.explode_outer(F.split(F.lower(F.col(text_col)), " ")).alias("__tok")
    exploded = df.select(F.col(id_col), tok).select(
        F.col(id_col),
        F.when(
            F.col("__tok") != "", F.substring(F.md5("__tok"), 1, n_hex_chars)
        ).alias("bucket_hex"),
    )
    per_doc = (
        exploded.join(F.broadcast(weights), on="bucket_hex", how="left")
        .groupBy(id_col)
        .agg(
            F.count("bucket_hex").alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__w_sum"),
        )
    )
    mean_w = F.when(F.col("n_tokens") > 0, F.col("__w_sum") / F.col("n_tokens")).otherwise(
        F.lit(0.0)
    )
    z = F.lit(bias) + mean_w
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    if round_to is not None:
        score = F.round(score, round_to)
    return per_doc.select(
        F.col(id_col), F.col("n_tokens"), score.alias("quality_score")
    )


def collect_weights_array(weights: DataFrame, n_hex_chars: int = DEFAULT_HEX_CHARS) -> list:
    """Materialize a (bucket_hex, weight) model as a dense python list
    indexed by bucket int — the driver-side step that turns the model
    TABLE into a plan literal for :func:`classifier_score_expr`. The
    collect is bounded by the model size (16^k rows, k=3 → 4096), never
    by data; missing buckets get 0.0 (untrained feature)."""
    n = 16**n_hex_chars
    dense = [0.0] * n
    for r in weights.select("bucket_hex", "weight").collect():
        dense[int(r["bucket_hex"], 16)] = float(r["weight"])
    return dense


def classifier_score_expr(
    text: Column,
    weights_array: list,
    bias: float = 0.0,
    n_hex_chars: int = DEFAULT_HEX_CHARS,
    round_to: int | None = 6,
) -> Column:
    """Row-local expression form of :func:`classifier_score`: the model
    rides along as ONE array literal (a single ``F.lit(list)`` — one
    py4j round trip) indexed by bucket int, so the score fuses into any
    scan projection with ZERO joins and ZERO shuffle — the form that
    composes into ``prepare_corpus``'s single filter pass. Identical
    scores to the relational form (equivalence is unit-tested).

    Trade-off vs the relational form: the per-token aggregate lambda is
    interpreted (CodegenFallback — the BASELINE §5f cost model), so
    this path pays ~µs/token where explode+broadcast-join stays in
    whole-stage codegen; in exchange the corpus is never re-shuffled to
    attach scores. Scoring inside an ingest scan wants this form; a
    standalone scoring job over an already-materialized corpus wants
    the relational one."""
    arr = F.lit(weights_array)
    toks = F.filter(F.split(F.lower(text), " "), lambda t: t != F.lit(""))
    # let-bind the token array (HOF bodies get no CSE): single-element
    # outer transform evaluates the split+filter once
    scored = F.flatten(
        F.transform(
            F.array(toks),
            lambda ts: F.array(
                F.aggregate(
                    ts,
                    F.lit(0.0),
                    lambda acc, t: acc
                    + F.element_at(
                        arr,
                        F.conv(F.substring(F.md5(t), 1, n_hex_chars), 16, 10).cast(
                            "int"
                        )
                        + 1,
                    ),
                ),
                F.size(ts).cast("double"),
            ),
        )
    )
    wsum = F.element_at(scored, 1)
    n = F.element_at(scored, 2)
    mean_w = F.when(n > 0, wsum / n).otherwise(F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + mean_w)))
    return F.round(score, round_to) if round_to is not None else score


def weights_from_terms(
    terms: DataFrame,
    term_col: str = "term",
    weight_col: str = "weight",
    n_hex_chars: int = DEFAULT_HEX_CHARS,
) -> DataFrame:
    """Project a vocabulary-space model — any (term, weight) relation,
    e.g. an externally trained fastText/logistic table — into the
    bucket space :func:`classifier_score` consumes: terms hash to their
    md5-prefix bucket and colliding terms' weights SUM (the standard
    hashing-trick composition: scoring sums per-token weights, so a
    bucket's weight is the sum of what hashed into it). One bounded
    aggregate over the model relation; the corpus is not involved."""
    return (
        terms.select(
            F.substring(F.md5(F.lower(F.col(term_col))), 1, n_hex_chars).alias(
                "bucket_hex"
            ),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .groupBy("bucket_hex")
        .agg(F.sum("weight").alias("weight"))
    )


def train_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_hex_chars: int = DEFAULT_HEX_CHARS,
    rounds: int = 10,
    lr: float = 2.0,
    l2: float = 0.0,
) -> tuple[list, float]:
    """Distributed logistic-regression training of the hashed linear
    model (full-batch gradient descent — the supervised half of the
    fastText recipe, public method): returns ``(weights_array, bias)``
    ready for :func:`classifier_score_expr` /
    ``CorpusConfig.model_weights``.

    Per round, ONE distributed pass: a projection computes each doc's
    current score (weights ride as a plan literal — no join), the
    per-doc error explodes with its token buckets, and a groupBy(bucket)
    partial aggregate reduces to ≤ 16^k + 1 gradient rows (the bias
    gradient travels as a pseudo-bucket, so one aggregate covers both).
    Driver state is the dense weight vector (16^k floats) — bounded and
    corpus-size independent, the same contract as
    :func:`collect_weights_array`. Mean-pooled features: a token
    occurrence contributes err/n_tokens to its bucket's gradient, so a
    bucket's update is Σ_docs err·(count_in_doc/n_tokens) — the exact
    gradient of the mean-pool logistic loss. ``label_col`` must be
    0/1 (cast to double).

    Scale: each round is one shuffle of ≤ |corpus tokens| narrow rows
    partial-aggregated to 16^k groups map-side; rounds are driver
    barriers like any iterative fit. Full-batch GD (not SGD) keeps the
    result independent of physical layout up to floating-point sum
    reassociation in the gradient aggregate (~1 ulp per round — SGD's
    order-dependence is the thing being avoided, not float algebra)."""
    n = 16**n_hex_chars
    w = [0.0] * n
    b = 0.0
    # pin the (narrow) training projection once: every round's gradient
    # collect re-executed df's FULL upstream lineage otherwise — rounds
    # × (join/filter/scan) of pure re-computation (r10 review). The
    # localCheckpoint truncates lineage and is materialized by the
    # count below; only (label, text) columns are retained.
    df = df.select(F.col(label_col), F.col(text_col)).localCheckpoint(eager=False)
    n_docs = df.count()
    if n_docs == 0:
        return w, b
    text = F.col(text_col)
    y = F.col(label_col).cast("double")
    for _ in range(rounds):
        score = classifier_score_expr(
            text, w, bias=b, n_hex_chars=n_hex_chars, round_to=None
        )
        # NULL text → empty bucket array (not NULL): an exploded NULL
        # array would drop the row and silently exclude the doc from
        # even the bias gradient
        toks = F.coalesce(
            token_buckets(text, n_hex_chars), F.array().cast("array<string>")
        )
        per_doc = df.select(
            (y - score).alias("__err"),
            F.greatest(F.size(toks), F.lit(1)).cast("double").alias("__nt"),
            toks.alias("__buckets"),
        )
        # bias as pseudo-bucket: one aggregate yields every gradient
        grads = (
            per_doc.select(
                F.explode(
                    F.array_append(
                        F.transform(
                            F.col("__buckets"),
                            lambda bkt: F.struct(
                                bkt.alias("bucket"),
                                (F.col("__err") / F.col("__nt")).alias("g"),
                            ),
                        ),
                        F.struct(
                            F.lit("__bias").alias("bucket"), F.col("__err").alias("g")
                        ),
                    )
                ).alias("p")
            )
            .groupBy("p.bucket")
            .agg(F.sum("p.g").alias("g"))
            .collect()
        )
        decay = 1.0 - lr * l2
        w = [x * decay for x in w]
        for r in grads:
            if r["bucket"] == "__bias":
                b += lr * float(r["g"]) / n_docs
            else:
                w[int(r["bucket"], 16)] += lr * float(r["g"]) / n_docs
    return w, b
