"""env_event_stream_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of
Elastic-Networth-Visualizer/env-event-stream (an in-process pub/sub
event-stream library), re-expressed Spark-first, plus large-scale
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Design stance (SURVEY.md §7): one `events` table (Parquet, partitioned
by topic at scale) is the spine; the "broker" is a thin Python API over
batch appends + per-subscription Structured Streaming queries; all
analytics are declarative DataFrame/SQL plans optimized by Catalyst.
"""

__version__ = "0.1.0"

from env_event_stream_spark.session import get_spark  # noqa: F401
