"""Stream-graph runtime (SURVEY §2 I, §3.3).

The reference's dataflow = named nodes (core.async channels with an
optional transducer) wired by edges into a graph over Kafka
(src/dataworks/utils/stream.clj, streams.clj). Here a node is a
declarative op-chain applied to a streaming DataFrame; edges are
DataFrame composition (in-process fan-out) or topic handoff (Kafka);
sinks are writeStream / foreachBatch.
"""

from dataworks_spark.streaming.dedup import dedup_stream
from dataworks_spark.streaming.rollup import ContinuousRollup
from dataworks_spark.streaming.graph import Node, StreamGraph
from dataworks_spark.streaming.transforms import OpChain

__all__ = ["Node", "StreamGraph", "OpChain", "dedup_stream", "ContinuousRollup"]
