"""LLM-data-pipeline queries (SURVEY.md §2.11) — registered into the
shared catalog. Implementations live in operators/dedup.py,
operators/similarity.py and functions/text.py; this module wires them
to the documents/embeddings tables with DuckDB oracles."""

from __future__ import annotations

# Placeholder: populated in the LLM-ops milestone.
