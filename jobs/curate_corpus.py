"""spark-submit entry point: curate a web-text corpus end-to-end.

The webtext twin of ``jobs/score_network.py`` — same north-rule
deployment shape::

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/netascore_spark.zip \
        jobs/curate_corpus.py --in /path/documents.parquet [--out /path]

The job imports netascore_spark from the shipped zip and runs the full
curation chain (clean -> quality gate -> exact dedup -> near-dup cluster
drop -> content-hash splits, see ``pipeline/curate.py``) over a parquet
documents table with (doc_id, text) columns — the shape of
``/root/testdata/sf*/documents.parquet`` and of any Common-Crawl-style
extract.  With ``--out`` the curated corpus is written partitioned by
split (train/val/test read independently downstream); without it the
job just counts.  Per-split counts print on one line for the submit
log.  Everything scales with executors: the chain's only driver-side
values are the component fixpoint's one scalar per round.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default=None,
                    help="parquet documents table (doc_id, text)")
    ap.add_argument("--out", default=None,
                    help="output parquet dir, partitioned by split")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="near-dup Jaccard threshold")
    ap.add_argument("--line-dedup-max-count", type=int, default=None,
                    help="enable corpus-level line dedup: drop lines "
                         "occurring in more than this many slots")
    ap.add_argument("--benchmark", default=None,
                    help="parquet table (doc_id, text) to decontaminate "
                         "against (8-gram overlap)")
    ap.add_argument("--max-ppl", type=float, default=None,
                    help="enable the self-trained bigram-LM gate: drop "
                         "docs with perplexity above this cap")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="snapshot each stage here (per-partition lineage "
                         "+ row counts); restarted runs resume after the "
                         "last committed stage")
    ap.add_argument("--on-existing", default="skip",
                    choices=["skip", "delete", "abort"],
                    help="what to do with existing stage snapshots "
                         "(skip=resume, delete=recompute new version)")
    ap.add_argument("--synthetic-docs", type=int, default=0,
                    help="generate N deterministic synthetic docs instead "
                         "of reading --in (smoke/scale testing)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("netascore-curate").getOrCreate()

    from pyspark.sql import functions as F
    from netascore_spark.pipeline.curate import CurateConfig, curate

    if args.synthetic_docs:
        # deterministic corpus with planted dups, generated distributed
        # (spark.range — no driver materialization): ids with id%10==1
        # repeat the text of id-1 exactly; ids with id%10==6 share the
        # 30-word body of id-1 plus a 2-word tail (near dup, shingle
        # Jaccard ~0.88); everything else is unique hash-derived words
        seed = F.when(F.col("id") % 10 == 1, F.col("id") - 1) \
                .when(F.col("id") % 10 == 6, F.col("id") - 1) \
                .otherwise(F.col("id"))
        # tokens stay mostly alphabetic so the corpus passes the curation
        # quality gate (min_alpha_frac) the way real text would
        words = [
            F.concat(F.lit(f"wording{i}and"),
                     F.pmod(F.xxhash64(seed, F.lit(i)), F.lit(997))
                      .cast("string"))
            for i in range(30)
        ]
        tail = F.when(F.col("id") % 10 == 6, F.lit(" zz qq")) \
                .otherwise(F.lit(""))
        docs = spark.range(args.synthetic_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(F.concat_ws(" ", *words), tail).alias("text"),
        )
    elif args.inp:
        docs = spark.read.parquet(args.inp).select("doc_id", "text")
    else:
        ap.error("one of --in or --synthetic-docs is required")

    cfg = CurateConfig(
        jaccard_threshold=args.threshold,
        line_dedup_max_count=args.line_dedup_max_count,
        benchmark=(spark.read.parquet(args.benchmark).select("doc_id", "text")
                   if args.benchmark else None),
        max_ppl=args.max_ppl,
    )
    ck = None
    if args.checkpoint_dir:
        from netascore_spark.pipeline.checkpoint import Checkpointer

        ck = Checkpointer(spark, args.checkpoint_dir,
                          on_existing=args.on_existing)
    curated = curate(docs, cfg, checkpointer=ck)

    if args.out:
        curated.write.mode("overwrite").partitionBy("split").parquet(args.out)
        curated = spark.read.parquet(args.out)
    counts = {r["split"]: r["n"] for r in
              curated.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    print("curated_docs=%d train=%d val=%d test=%d" % (
        total, counts.get("train", 0), counts.get("val", 0),
        counts.get("test", 0)))
    return 0 if total > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
