"""Composed end-to-end pipelines built from the `ops` operators."""
