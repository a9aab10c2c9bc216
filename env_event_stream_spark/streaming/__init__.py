"""Streaming layer: broker / subscriptions / windows.

The reference is an in-process pub/sub hub (src/broker.ts). Here the
`events` table is the spine: publish = columnar append; a
subscription is either a direct in-process delivery (reference-parity
semantics, used by the behavioral tests) or a Structured Streaming
query over the table (the scale path: checkpointed, resumable,
backlog+live unified).
"""

from env_event_stream_spark.streaming.broker import (  # noqa: F401
    EventBroker,
    PublishResult,
    SubscriptionOptions,
    default_broker,
)
