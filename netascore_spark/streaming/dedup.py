"""Stateful streaming exact-dedup: first-seen-wins across micro-batches.

At continuous-ingest scale the batch ``dedup_exact`` (hash-groupBy over the
whole table) would reprocess the entire corpus every drop.  The streaming
form keeps per-digest GROUP STATE — ``applyInPandasWithState``, the
custom-stateful-operator path — so each micro-batch only touches the
digests it contains:

- key: md5(text) — same canonicalization as ``operators.dedup.exact``.
- state: (n_seen,) — how many docs with this digest have EVER arrived.
- output: the canonical (first-seen) row, emitted exactly once, on the
  micro-batch where the digest first appears; later duplicates only bump
  the state counter and emit nothing.

Within one batch, ties order by (warc_ts, url) so the canonical pick is
deterministic under any partitioning.

Scale shape: the state store shards by the group key (digest), so state
lookups are local to the shuffle partition — no broadcast, no global
structure; per-batch cost is O(batch) + state I/O for the touched keys
only.  State never expires here (a duplicate may arrive years later);
bound it in deployment with a TTL timeout if the dedup horizon is finite.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("n_seen", T.LongType())])


def _first_seen(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    n_before = state.get[0] if state.exists else 0
    state.update((n_before + len(rows),))
    if n_before == 0 and len(rows) > 0:
        first = rows.sort_values(["warc_ts", "url"]).iloc[[0]]
        yield first[["digest", "url", "warc_ts"]]


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Emit each distinct document text once (its first-seen row), across
    all micro-batches of ``stream``.  Returns an update-mode streaming
    DataFrame (digest, url, warc_ts)."""
    hashed = stream.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
    )
    return hashed.groupBy("digest").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
