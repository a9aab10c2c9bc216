"""Scalar/array function library.

The reference's scalar surface is tiny (id generation, JSON
ser/parse, epoch arithmetic — SURVEY.md §2.8); everything else is a
GAP filled by pyspark.sql.functions built-ins. The modules here add
the composite expressions the LLM-pipeline operators need — all
JVM-side Catalyst expressions (no Python UDFs in the hot path).
"""
