"""Structured Streaming surface: incremental page ingestion over the
same operators the batch pipeline uses (streaming/pages.py), plus the
stateful first-seen dedup (streaming/dedup.py)."""

from .dedup import streaming_exact_dedup  # noqa: F401
from .pages import (  # noqa: F401
    PAGE_SCHEMA,
    incremental_pages,
    read_page_stream,
    windowed_cell_counts,
)
