"""Scaling measurement for the data-prep chain (dedup clustering).

Generates a deterministic 200k-doc corpus with planted exact and near
duplicates, then times:

  exact_dedup   — md5 hash-groupBy keep-min-id
  ngram_pairs   — shingle inverted-index candidate join (threshold 0.6)
  components    — connected components over the pairs (+ cluster sizes)

at the requested core count.  Run twice (--cores 2, --cores 8) on the
same cached corpus and divide for the N->4N efficiency.  Prints one JSON
line.

A continuous 1-core canary (tools/scaling_gated2.Sampler — the same
machinery as the headline scaling legs) runs during the timed region;
each stage whose window overlaps a degraded sample is listed in
``degraded_queries`` and the boundary canaries + nominal threshold are
stamped into the JSON, so this leg shares the provenance methodology of
every other BENCH artifact.

Usage: python tools/bench_curate.py [--cores N] [--docs N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import pandas as pd

_VERSION = "v1"  # bump to invalidate the corpus cache


def corpus_path(n_docs: int) -> str:
    return f"/tmp/spark_graft_fixtures/curate_{_VERSION}_{n_docs}"


def gen_corpus(spark, n_docs: int) -> str:
    """Deterministic corpus: 60-word docs from a 5k vocab; every 10th doc
    is a 3-word mutation of its predecessor (near dup), every 20th an
    exact copy.  Chunked generation keeps driver memory flat."""
    path = corpus_path(n_docs)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    rng = np.random.RandomState(7)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    chunk = 50_000
    for start in range(0, n_docs, chunk):
        n = min(chunk, n_docs - start)
        words = vocab[rng.randint(0, len(vocab), size=(n, 60))]
        texts = [" ".join(row) for row in words]
        for i in range(n):
            gid = start + i
            if gid % 20 == 10 and i > 0:
                texts[i] = texts[i - 1]  # exact dup
            elif gid % 10 == 5 and i > 0:
                toks = texts[i - 1].split()
                for j in (3, 25, 47):
                    toks[j] = str(vocab[rng.randint(0, len(vocab))])
                texts[i] = " ".join(toks)  # near dup
        pdf = pd.DataFrame(
            {"doc_id": np.arange(start, start + n, dtype=np.int64), "text": texts}
        )
        spark.createDataFrame(pdf).repartition(8).write.mode(
            "append" if start else "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--ops", choices=["chain", "new"], default="chain",
                    help="chain = exact/ngram/components (the dedup "
                         "clustering chain); new = line_dedup / "
                         "decontaminate / lm_score / dup_spans")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from netascore_spark.session import build_session
    from netascore_spark.operators import dedup

    spark = build_session(
        master=f"local[{args.cores}]",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.shuffle.partitions": str(max(32, args.cores * 4)),
        },
    )
    from scaling_gated2 import NOMINAL_S, Sampler, canary

    path = gen_corpus(spark, args.docs)
    docs = spark.read.parquet(path)
    docs.count()  # warm the scan + JIT outside the timed region

    timings: dict[str, float] = {}
    windows: dict[str, tuple[float, float]] = {}
    counts: dict[str, int] = {}
    c_before = canary()

    if args.ops == "new":
        from pyspark.sql import functions as F
        from netascore_spark.operators import textstats

        # derive a 6-line view (10 words/line) so corpus-level line dedup
        # has real line structure; planted near-dups share the unmutated
        # half of their lines, exact dups share all of them
        lined = docs.withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"((?:\S+ ){9}\S+) ", "$1\n"),
        )
        bench = docs.filter(F.col("doc_id") % 1001 == 0)
        with Sampler() as sampler:
            t0 = time.time()
            counts["line_dedup"] = dedup.line_dedup(lined).count()
            timings["line_dedup"] = round(time.time() - t0, 3)
            windows["line_dedup"] = (t0, time.time())

            t0 = time.time()
            counts["decontaminate"] = dedup.decontaminate(
                docs.filter(F.col("doc_id") % 1001 != 0), bench, n=8
            ).count()
            timings["decontaminate"] = round(time.time() - t0, 3)
            windows["decontaminate"] = (t0, time.time())

            t0 = time.time()
            counts["lm_score"] = textstats.bigram_lm_scores(docs).count()
            timings["lm_score"] = round(time.time() - t0, 3)
            windows["lm_score"] = (t0, time.time())

            t0 = time.time()
            # native-xxhash64 scale path (the md5_61 hash exists for
            # DuckDB-oracle parity and is ~10x slower — see textstats)
            counts["dup_spans"] = dedup.duplicated_spans(
                docs, k=8, w=4, min_df=2, hash="xxhash64"
            ).count()
            timings["dup_spans"] = round(time.time() - t0, 3)
            windows["dup_spans"] = (t0, time.time())
        c_after = canary()
        bad = sampler.degraded_intervals()
        degraded = sorted(
            q for q, (w0, w1) in windows.items()
            if any(lo < w1 and w0 < hi for lo, hi in bad)
        )
        clean = [d for *_, d in sampler.samples if d <= sampler.nominal_s]
        total = round(sum(timings.values()), 3)
        print(json.dumps({
            "metric": "data-prep new-ops wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "cores": args.cores,
            "n_docs": args.docs,
            "counts": counts,
            "docs_per_sec": round(args.docs / total, 1),
            "gate": "continuous canary (scaling_gated2.Sampler)",
            "gate_nominal_s": NOMINAL_S,
            "canary_before_s": round(c_before, 2),
            "canary_after_s": round(c_after, 2),
            "canary_worst_clean_s": round(max(clean), 2) if clean else None,
            "degraded_queries": degraded,
        }))
        spark.stop()
        return

    with Sampler() as sampler:
        t0 = time.time()
        n_exact = dedup.dedup_exact(docs).count()
        timings["exact_dedup"] = round(time.time() - t0, 3)
        windows["exact_dedup"] = (t0, time.time())

        t0 = time.time()
        pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=200)
        pairs = pairs.persist()
        n_pairs = pairs.count()
        timings["ngram_pairs"] = round(time.time() - t0, 3)
        windows["ngram_pairs"] = (t0, time.time())

        t0 = time.time()
        comp = dedup.connected_components(pairs)
        sizes = comp.groupBy("comp").count()
        n_nodes, n_clusters = comp.count(), sizes.count()
        timings["components"] = round(time.time() - t0, 3)
        windows["components"] = (t0, time.time())

    c_after = canary()
    bad = sampler.degraded_intervals()
    degraded = sorted(
        q for q, (w0, w1) in windows.items()
        if any(lo < w1 and w0 < hi for lo, hi in bad)
    )
    clean = [d for *_, d in sampler.samples if d <= sampler.nominal_s]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "dedup-chain wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cores": args.cores,
                "n_docs": args.docs,
                "n_exact_kept": n_exact,
                "n_pairs": n_pairs,
                "n_clustered_nodes": n_nodes,
                "n_clusters": n_clusters,
                "docs_per_sec": round(args.docs / total, 1),
                "gate": "continuous canary (scaling_gated2.Sampler)",
                "gate_nominal_s": NOMINAL_S,
                "canary_before_s": round(c_before, 2),
                "canary_after_s": round(c_after, 2),
                "canary_worst_clean_s": round(max(clean), 2) if clean else None,
                "degraded_queries": degraded,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
