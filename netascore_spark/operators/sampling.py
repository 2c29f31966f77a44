"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — the same
corpus re-read with a different split count samples DIFFERENT rows, which
breaks reproducibility between the sf0.01 test run and the 100 TB run.
Everything here keys off ``xxhash64`` of row CONTENT instead, so membership
is a pure function of the row (and the seed), independent of partitioning,
cluster size, and input order:

- ``hash_sample``    — keep a fraction; map-only, no shuffle.
- ``hash_split``     — disjoint covering splits (train/val/test); map-only.
- ``stratified_sample`` — exactly ``n_per_stratum`` rows per stratum,
  picked by hash order (one shuffle on the stratum key).

The hash-order pick also gives *consistent* subsets: the 1% sample is a
subset of the 10% sample under the same seed/keys — handy for scaling
studies over the same corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; bucket by pmod over a
# fixed denominator so fractions are exact rationals (avoids float-edge
# membership flips between engines/platforms)
_DENOM = 1_000_000


def _bucket(cols: Sequence[str], seed: int) -> F.Column:
    return F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in cols]), F.lit(_DENOM))


def hash_sample(
    df: DataFrame, cols: Sequence[str], fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on row content.

    Map-only (whole-stage codegen filter): at any scale this is a scan,
    no shuffle, and the SAME rows are kept regardless of partitioning.
    Nested: hash_sample(f1) ⊇ hash_sample(f2) for f1 >= f2 (same seed/cols).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(cols, seed) < int(round(fraction * _DENOM)))


def hash_split(
    df: DataFrame,
    cols: Sequence[str],
    weights: Sequence[float],
    labels: Sequence[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Assign every row to exactly one split (``split`` column) by hash
    bucket — disjoint and covering by construction, reproducible across
    runs and cluster sizes.  Weights are normalized; default labels are
    split_0..split_{k-1} (use ("train","val","test") etc.)."""
    if labels is None:
        labels = [f"split_{i}" for i in range(len(weights))]
    if len(labels) != len(weights):
        raise ValueError("labels and weights must have the same length")
    total = float(sum(weights))
    b = _bucket(cols, seed)
    expr = None
    acc = 0.0
    for lab, w in zip(labels[:-1], weights[:-1]):
        acc += w / total
        cond = b < int(round(acc * _DENOM))
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    expr = F.lit(labels[0]) if expr is None else expr.otherwise(labels[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    tiebreak_cols: Sequence[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum (e.g. a per-language
    quota), picked deterministically by content-hash order.

    One shuffle on the strata key; rank is a running top-n, so partial
    aggregation bounds memory per stratum partition.  Hot strata are just
    big partitions — salt upstream if one language dominates the corpus.
    ``tiebreak_cols`` orders equal hashes (pass a unique id for full
    determinism when rows may collide or repeat).
    """
    h = _bucket(tiebreak_cols or df.columns, seed)
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        F.col("__h"), *[F.col(c) for c in (tiebreak_cols or [])]
    )
    return (
        df.withColumn("__h", h)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__h", "__rk")
    )
