"""Sources/sinks beyond parquet (SURVEY.md §2.1 S4-S10).

- ``json_event_dir``  — reads the REFERENCE's on-disk format (one
  JSON file per event under ``<base>/<topic>/<ts>_<id>.json``,
  reference src/persistence.ts:141-145) so an existing deployment can
  migrate its data in one read.
- ``JdbcEventStore``  — the Postgres backend's shape over spark-jdbc
  (import-safe; needs a JDBC driver jar at runtime).
"""

from env_event_stream_spark.sources.json_store import (  # noqa: F401
    json_event_dir,
    write_json_event_dir,
)
from env_event_stream_spark.sources.jdbc_store import JdbcEventStore  # noqa: F401
