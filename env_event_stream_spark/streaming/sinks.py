"""Sink-side delivery guarantees.

Structured Streaming replays a micro-batch after failure with the SAME
epoch id — a sink that records committed epochs turns at-least-once
replay into effectively-once output (the missing piece the reference's
at-most-once delivery can't offer, SURVEY.md §2.9: no ack/offset
tracking at all)."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["IdempotentBatchSink"]


class IdempotentBatchSink:
    """foreachBatch wrapper: skip epochs already committed.

    Usage::

        sink = IdempotentBatchSink(out_dir, write_fn)
        stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", ckpt).start()

    ``write_fn(df, epoch_id)`` performs the actual write; the sink
    records a commit marker AFTER it returns, so a crash between
    write and marker re-runs the epoch — ``write_fn`` must therefore
    be deterministic-per-epoch (e.g. write to an epoch-named path,
    overwrite mode), which makes the replay harmless. This is exactly
    the file-sink/Delta-txn pattern, portable to any storage."""

    def __init__(
        self, commit_dir: str, write_fn: Callable[[DataFrame, int], None]
    ):
        self.commit_dir = commit_dir
        self.write_fn = write_fn
        os.makedirs(commit_dir, exist_ok=True)

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.commit_dir, f"epoch-{epoch_id}.committed")

    def committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._marker(epoch_id))

    def __call__(self, df: DataFrame, epoch_id: int) -> None:
        if self.committed(epoch_id):
            return  # replay of an already-committed epoch: no-op
        self.write_fn(df, epoch_id)
        tmp = self._marker(epoch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write("ok")
        os.rename(tmp, self._marker(epoch_id))
