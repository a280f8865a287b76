"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.10), so this package is pure
extension: watermarked windowed aggregation and gap-based sessionization
over the ``events`` stream, each with an exactly-equivalent batch analog
that carries the DuckDB oracle.
"""
