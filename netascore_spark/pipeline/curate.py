"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, wired from the individual operators.

    raw documents
      -> clean          (PII scrub, repetition/quality signals)
      -> quality gate   (drop boilerplate/junk by the cleaning signals)
      -> exact dedup    (md5 hash-groupBy, min-id representative)
      -> near-dup drop  (ngram Jaccard pairs -> connected components ->
                         keep each cluster's canonical doc)
      -> splits         (deterministic content-hash train/val/test)

Every stage is one of the tested operators (``operators/cleaning.py``,
``operators/dedup.py``, ``operators/sampling.py``); this module only
sequences them and decides what to carry between stages.

Scale notes: stages 1-2 are map-only (scan speed); exact dedup shuffles
one slim (digest, id) row per doc; the near-dup stage is the bucketed
candidate join + O(log diameter) component rounds documented in
``operators/dedup.py``; the split column is a map-only hash.  Nothing in
the chain collects to the driver except the component fixpoint's one
scalar per round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import cleaning, dedup, sampling


@dataclass
class CurateConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    # quality gate (Gopher-shaped defaults, deliberately loose)
    max_dup_line_frac: float = 0.3
    min_alpha_frac: float = 0.5
    min_tokens: int = 5
    # near-dup
    ngram_n: int = 3
    jaccard_threshold: float = 0.8
    max_df: int = 10_000
    # splits
    split_weights: tuple = (98, 1, 1)
    split_labels: tuple = ("train", "val", "test")
    seed: int = 42
    # carry the scrubbed text forward instead of the raw text
    scrub: bool = True
    extra_quality_filter: object = field(default=None)


def curate(docs: DataFrame, cfg: CurateConfig | None = None) -> DataFrame:
    """Returns the curated corpus: one row per kept document with
    (id, text, split, quality-signal columns).  Dropped docs: quality-gate
    failures, exact duplicates, and near-duplicate cluster members other
    than the canonical (min-id) doc."""
    cfg = cfg or CurateConfig()
    t = F.col(cfg.text_col)

    # 1-2: clean + gate (map-only)
    stats = docs.withColumn("rep", cleaning.repetition_stats(t)).withColumn(
        "n_tokens",
        F.when(F.trim(t) == "", 0).otherwise(
            F.size(F.split(F.trim(t), "[ \\t\\n\\f\\r]+"))
        ),
    )
    gated = stats.filter(
        (F.col("rep.dup_line_frac") <= cfg.max_dup_line_frac)
        & (F.col("rep.alpha_frac") >= cfg.min_alpha_frac)
        & (F.col("n_tokens") >= cfg.min_tokens)
    )
    if cfg.extra_quality_filter is not None:
        gated = gated.filter(cfg.extra_quality_filter)
    if cfg.scrub:
        gated = gated.withColumn(cfg.text_col, cleaning.scrub_pii(t))

    # 3: exact dedup (keep min-id per digest)
    exact = dedup.dedup_exact(gated, cfg.id_col, cfg.text_col)

    # 4: near-dup clusters — drop every cluster member except the canonical
    clusters = dedup.dedup_clusters(
        exact,
        cfg.id_col,
        cfg.text_col,
        n=cfg.ngram_n,
        threshold=cfg.jaccard_threshold,
        max_df=cfg.max_df,
    )
    losers = clusters.filter(F.col(cfg.id_col) != F.col("cluster_id")).select(
        cfg.id_col
    )
    kept = exact.join(losers, cfg.id_col, "left_anti")

    # 5: deterministic splits keyed on content (stable under re-ingestion
    # of the same doc at a different position)
    return sampling.hash_split(
        kept,
        [cfg.text_col],
        list(cfg.split_weights),
        list(cfg.split_labels),
        seed=cfg.seed,
    )
