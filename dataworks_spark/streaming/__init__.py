"""Stream-graph runtime (SURVEY §2 I, §3.3).

The reference's dataflow = named nodes (core.async channels with an
optional transducer) wired by edges into a graph over Kafka
(src/dataworks/utils/stream.clj, streams.clj). Here a node is a
declarative op-chain applied to a streaming DataFrame; edges are
DataFrame composition (in-process fan-out) or topic handoff (Kafka);
sinks are writeStream / foreachBatch.
"""

from dataworks_spark.streaming.buffering import (
    admission_options,
    dropping_buffer,
    sliding_buffer,
)
from dataworks_spark.streaming.control import (
    ControlListener,
    FileControlBus,
    FunctionChanged,
    KafkaControlBus,
)
from dataworks_spark.streaming.dedup import dedup_stream
from dataworks_spark.streaming.rollup import ContinuousRollup
from dataworks_spark.streaming.graph import BufferSpec, Node, StreamGraph, validate_buffer
from dataworks_spark.streaming.kafka import create_missing_topics, topics_to_create
from dataworks_spark.streaming.kafka_clients import (
    ConfluentAdmin,
    ConfluentProducer,
    KafkaPythonAdmin,
    KafkaPythonProducer,
    confluent_consumer_factory,
    kafka_python_consumer_factory,
)
from dataworks_spark.streaming.transforms import OpChain

__all__ = [
    "Node",
    "StreamGraph",
    "OpChain",
    "dedup_stream",
    "ContinuousRollup",
    "BufferSpec",
    "validate_buffer",
    "sliding_buffer",
    "dropping_buffer",
    "admission_options",
    "ControlListener",
    "FileControlBus",
    "KafkaControlBus",
    "FunctionChanged",
    "create_missing_topics",
    "topics_to_create",
    "ConfluentAdmin",
    "ConfluentProducer",
    "confluent_consumer_factory",
    "KafkaPythonAdmin",
    "KafkaPythonProducer",
    "kafka_python_consumer_factory",
]
