"""Structured Streaming surface: incremental page ingestion over the
same operators the batch pipeline uses.  See streaming/pages.py."""

from .pages import (  # noqa: F401
    PAGE_SCHEMA,
    incremental_pages,
    read_page_stream,
    windowed_cell_counts,
)
