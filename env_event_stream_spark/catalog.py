"""Aggregated query catalog.

Importing the section modules populates the shared QUERIES/ORACLES
registries (each module registers via the ``@query`` decorator in
``queries.py``). ``__spark_entry__`` re-exports these dicts to the
driver.
"""

from __future__ import annotations

from env_event_stream_spark.queries import ORACLES, QUERIES  # noqa: F401

# Section modules — importing registers their queries.
import env_event_stream_spark.llm_queries  # noqa: F401,E402
import env_event_stream_spark.ann_queries  # noqa: F401,E402
import env_event_stream_spark.advanced_queries  # noqa: F401,E402
import env_event_stream_spark.tpch_queries  # noqa: F401,E402
import env_event_stream_spark.multimodal_queries  # noqa: F401,E402
import env_event_stream_spark.streaming_queries  # noqa: F401,E402
import env_event_stream_spark.analytics_queries  # noqa: F401,E402
import env_event_stream_spark.cep_queries  # noqa: F401,E402
import env_event_stream_spark.forecast_queries  # noqa: F401,E402
import env_event_stream_spark.retrieval_queries  # noqa: F401,E402
