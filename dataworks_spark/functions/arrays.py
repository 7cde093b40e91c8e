"""Array / vector scalar functions (SURVEY §2 H9, L3 support).

Vector math stays JVM-side with higher-order functions
(`zip_with` + `aggregate`) — no Python row boundary, no Arrow
round-trip. NOTE the honest cost model: higher-order array lambdas
are CodegenFallback in Spark — each evaluation is an interpreted
~µs-scale tree walk, not whole-stage codegen (measured ~4 µs per
64-dim dot at sf0.5; an Arrow-batched pandas scorer measured NO
better — transfer cost ≈ eval cost at this dim). Pairwise kernels
must therefore control the PAIR COUNT (LSH buckets, IVF clusters,
top-k pushdown), and score unit-normalized vectors so each pair pays
one dot, not dot + two norms — that is where the engine's similarity
operators get their speed, not from the scalar expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, double accumulator (order-stable left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖), NULL when either norm is zero (try_divide).

    The engine runs under Spark 4's default ANSI mode, where a plain
    ``/`` on a zero divisor ABORTS THE JOB — one zero-norm embedding in
    a 100 TB corpus would kill every kNN/pair job that scans it. A
    zero-norm vector has no direction, so its similarity is undefined:
    NULL, which every ranking/threshold kernel drops (the r14/r15
    undefined-similarity rule), never a crash and never a score."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def unit_vector(a: Column) -> Column:
    """L2-normalized copy of ``a`` with the norm evaluated ONCE.

    Higher-order lambda bodies get no common-subexpression elimination,
    so the naive ``transform(a, x -> x / norm(a))`` re-runs the O(dim)
    norm aggregate once PER ELEMENT — O(dim²) interpreted work per row.
    The single-element outer transform is the repo's let-binding idiom
    (see llm/dedup.shingle_hashes): it binds the norm scalar once and
    the inner transform divides by the bound variable.

    Zero-norm input → all-NULL elements (try_divide; a plain ``/``
    would ANSI-abort the job): downstream dot/aggregate folds turn a
    NULL element into a NULL score, numpy kernels see NaN — both are
    dropped by the undefined-similarity guards, and Lloyd's ``avg``
    refinement skips NULLs, so a zero vector can neither crash a scan
    nor poison a centroid."""
    return F.flatten(
        F.transform(
            F.array(norm(a)),
            lambda nv: F.transform(a, lambda x: F.try_divide(x.cast("double"), nv)),
        )
    )
