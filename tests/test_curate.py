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
