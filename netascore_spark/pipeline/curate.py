"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, wired from the individual operators.

    raw documents
      -> line dedup     (optional, CCNet-style: drop corpus-wide repeated
                         lines — boilerplate — before any stats are taken)
      -> clean          (PII scrub, repetition/quality signals)
      -> quality gate   (drop boilerplate/junk by the cleaning signals)
      -> decontaminate  (optional: drop docs sharing n-grams with an
                         evaluation-benchmark corpus)
      -> LM gate        (optional: self-trained bigram-LM perplexity cap)
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
``operators/dedup.py``; the split column is a map-only hash.  The
optional stages keep those shapes: line dedup shuffles 8-byte line-hash
keys plus one id-keyed reassembly join, decontamination broadcasts the
(small) benchmark gram set and anti-joins an id list, and the LM gate's
count tables shuffle 8-byte gram keys.  Nothing in the chain collects to
the driver except the component fixpoint's one scalar per round.
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
    # optional stages (None/default = off, preserving the base chain)
    # corpus-level line dedup BEFORE stats: lines repeated in more than
    # this many slots across the corpus are boilerplate and removed
    line_dedup_max_count: int | None = None
    # benchmark corpus to decontaminate against (DataFrame with text_col)
    benchmark: object = field(default=None)
    decontaminate_n: int = 8
    # bigram-LM perplexity cap (docs above it are junk); the model is
    # self-trained on the gated corpus unless lm_reference (a clean
    # reference DataFrame with text_col — the CCNet setup) is given
    max_ppl: float | None = None
    lm_alpha: float = 0.5
    lm_reference: object = field(default=None)


def curate(
    docs: DataFrame,
    cfg: CurateConfig | None = None,
    checkpointer=None,
) -> DataFrame:
    """Returns the curated corpus: one row per kept document with
    (id, text, split, quality-signal columns).  Dropped docs: quality-gate
    failures, exact duplicates, and near-duplicate cluster members other
    than the canonical (min-id) doc.

    ``checkpointer`` (a ``pipeline.checkpoint.Checkpointer``) makes the
    chain RESUMABLE mid-pipeline: the gated corpus, the exact-dedup
    result, and the near-dup survivors each commit a snapshot (with
    per-partition lineage + row counts) and later stages read from it —
    with ``on_existing="skip"`` a restarted run resumes after the last
    committed stage instead of recomputing, the same semantics the
    network pipeline gets from the CLI's checkpoint_dir."""
    cfg = cfg or CurateConfig()
    t = F.col(cfg.text_col)

    def ckpt(df: DataFrame, name: str, upstream: list[str]) -> DataFrame:
        if checkpointer is None:
            return df
        return checkpointer.materialize(df, name, upstream=upstream)

    # 0: corpus-level line dedup (optional) — remove boilerplate lines
    # BEFORE any quality stats, so repeated headers/footers neither mask
    # nor trigger the gates.  line_dedup emits the reassembled text only;
    # re-attach the remaining columns on the id key (co-keyed join).
    if cfg.line_dedup_max_count is not None:
        ld = dedup.line_dedup(
            docs, cfg.id_col, cfg.text_col, max_count=cfg.line_dedup_max_count
        ).select(cfg.id_col, F.col("text_kept").alias(cfg.text_col))
        docs = docs.drop(cfg.text_col).join(ld, cfg.id_col)

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

    # 2b: benchmark decontamination (optional) — drop any doc sharing an
    # n-gram with the eval benchmark (the gram set broadcasts; only the
    # contaminated-id list comes back, anti-joined on the id key)
    if cfg.benchmark is not None:
        hits = dedup.decontaminate(
            gated, cfg.benchmark, cfg.id_col, cfg.text_col, n=cfg.decontaminate_n
        )
        gated = gated.join(hits.select(cfg.id_col), cfg.id_col, "left_anti")

    # 2c: LM perplexity gate (optional) — bigram model self-trained on the
    # gated corpus; keeps the ppl column as a quality signal downstream.
    # min_tokens >= 2 guarantees every surviving doc has bigrams (docs
    # without any would drop here by the inner join).
    if cfg.max_ppl is not None:
        from ..operators import textstats

        scores = textstats.bigram_lm_scores(
            gated, cfg.id_col, cfg.text_col, alpha=cfg.lm_alpha,
            train_docs=cfg.lm_reference,
        )
        gated = gated.join(
            scores.filter(F.col("ppl") <= cfg.max_ppl).select(cfg.id_col, "ppl"),
            cfg.id_col,
        )

    # stage snapshot: everything above is map-heavy scan work over the
    # raw corpus — the first thing a resumed run should not repeat
    gated = ckpt(gated, "curate_gated", upstream=["documents"])

    # 3: exact dedup (keep min-id per digest)
    exact = dedup.dedup_exact(gated, cfg.id_col, cfg.text_col)
    exact = ckpt(exact, "curate_exact", upstream=["curate_gated"])

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
    kept = ckpt(kept, "curate_kept", upstream=["curate_exact"])

    # 5: deterministic splits keyed on content (stable under re-ingestion
    # of the same doc at a different position)
    return sampling.hash_split(
        kept,
        [cfg.text_col],
        list(cfg.split_weights),
        list(cfg.split_labels),
        seed=cfg.seed,
    )
