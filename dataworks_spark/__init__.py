"""dataworks_spark — a PySpark-native analytics & stream-processing engine.

A Spark-first rebuild of the query / data-processing capabilities of
acgollapalli/dataworks (reference at /root/reference): a bitemporal
document store with a Datalog-lite query surface, a stream-graph runtime
on Structured Streaming, a hot-swappable named-function registry, the
full relational operator core (SURVEY.md §2), and LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layers (SURVEY.md §7.0):
  session   — SparkSession factory + fixture loaders
  ops       — composable relational operators over DataFrames
  functions — scalar function library (strings/time/json/arrays)
  docs      — bitemporal document store + Datalog-lite compiler
  streaming — stream-graph runtime (nodes, fan-out, dead-letter, hot-swap)
  registry  — named functions (transformers/UDFs), transactors, alerts
  llm       — dedup / similarity / text-analysis / multimodal operators
"""

__version__ = "0.1.0"
