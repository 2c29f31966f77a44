"""End-to-end corpus curation pipeline (pipeline/curate.py): the composed
clean -> gate -> exact-dedup -> near-dup-cluster-drop -> split chain."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netascore_spark.pipeline.curate import CurateConfig, curate


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old town bridge"
    rows = [
        (1, base),
        (2, base),                          # exact dup of 1 -> dropped
        (3, base + " extension words here"),  # near dup of 1 -> dropped
        (4, "a completely different document about query engines and storage"),
        (5, "same\nsame\nsame\nsame\nsame line repeated forever and ever"),  # dup-line junk
        (6, "xx"),                          # too short
        (7, "reach me at a.b@example.com for the database design document please"),
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    return spark.createDataFrame(rows, schema)


def test_curate_chain(spark, corpus):
    out = curate(corpus, CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5))
    rows = {r["doc_id"]: r for r in out.collect()}
    # kept: 1 (canonical of {1,2,3}), 4, 7; dropped: 2 exact, 3 near,
    # 5 dup-line junk, 6 short
    assert set(rows) == {1, 4, 7}
    # scrubbed text carried forward
    assert "<EMAIL>" in rows[7]["text"] and "example.com" not in rows[7]["text"]
    # split labels assigned and deterministic across partitioning
    out2 = curate(corpus.repartition(5), CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5))
    assert {(r["doc_id"], r["split"]) for r in out2.collect()} == {
        (d, r["split"]) for d, r in rows.items()
    }
    assert set(r["split"] for r in rows.values()) <= {"train", "val", "test"}


def test_curate_no_near_dups_is_noop_on_content(spark, corpus):
    # with an impossible threshold nothing clusters; only exact dup + gate drops
    out = curate(corpus, CurateConfig(jaccard_threshold=1.01, max_dup_line_frac=0.5))
    assert set(r["doc_id"] for r in out.collect()) == {1, 3, 4, 7}


def test_curate_optional_stages(spark, corpus):
    # line dedup: corpus-wide repeated "same" lines vanish from doc 5
    # BEFORE the dup-line gate runs, so doc 5 now survives (its remaining
    # unique line passes every gate)
    cfg = CurateConfig(
        jaccard_threshold=0.5, max_dup_line_frac=0.5, line_dedup_max_count=1
    )
    rows = {r["doc_id"]: r for r in curate(corpus, cfg).collect()}
    assert 5 in rows
    # the four repeated "same" lines are gone; only the unique line stays
    assert rows[5]["text"] == "same line repeated forever and ever"

    # decontamination: a benchmark sharing an 8-gram with docs 1/2/3 wipes
    # that whole near-dup family out of the corpus
    bench = spark.createDataFrame(
        [(999, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    cfg = CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5, benchmark=bench)
    assert {r["doc_id"] for r in curate(corpus, cfg).collect()} == {4, 7}

    # LM gate: an impossible cap drops everything, a loose one keeps the
    # base result and carries the ppl column through the chain
    cfg = CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5, max_ppl=0.0)
    assert curate(corpus, cfg).count() == 0
    cfg = CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5, max_ppl=1e9)
    out = {r["doc_id"]: r for r in curate(corpus, cfg).collect()}
    assert set(out) == {1, 4, 7}
    assert all(r["ppl"] > 0 for r in out.values())

    # LM gate under a fixed reference model (unseen grams back off, docs
    # still scored and kept under a loose cap)
    ref = corpus.filter("doc_id = 4")
    cfg = CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5,
                       max_ppl=1e9, lm_reference=ref)
    out_ref = {r["doc_id"]: r for r in curate(corpus, cfg).collect()}
    assert set(out_ref) == {1, 4, 7}
    # doc 4 is the reference itself -> scores strictly better than the
    # out-of-domain docs
    assert out_ref[4]["ppl"] < out_ref[1]["ppl"]


def test_curate_resumable_from_checkpoints(spark, corpus, tmp_path):
    from netascore_spark.pipeline.checkpoint import Checkpointer

    cfg = CurateConfig(jaccard_threshold=0.5, max_dup_line_frac=0.5)
    ck = Checkpointer(spark, str(tmp_path), on_existing="skip")
    out1 = sorted(
        (r["doc_id"], r["split"])
        for r in curate(corpus, cfg, checkpointer=ck).collect()
    )
    # every stage committed a snapshot with lineage + row counts
    for name, up in [
        ("curate_gated", ["documents"]),
        ("curate_exact", ["curate_gated"]),
        ("curate_kept", ["curate_exact"]),
    ]:
        meta = ck.lineage(name)
        assert meta["upstream"] == up
        assert meta["rows"] == sum(meta["partition_rows"])
    # resume: rerun against a DIFFERENT (gutted) input — with
    # on_existing=skip every stage reads its snapshot, so the output must
    # equal the first run, proving nothing upstream recomputed
    ck2 = Checkpointer(spark, str(tmp_path), on_existing="skip")
    gutted = corpus.filter("doc_id = 6")
    out2 = sorted(
        (r["doc_id"], r["split"])
        for r in curate(gutted, cfg, checkpointer=ck2).collect()
    )
    assert out2 == out1 and out1  # non-trivial result
