"""Bitemporal document store + Datalog-lite compiler (SURVEY §2 J, §4)."""

from dataworks_spark.docs.store import DocumentStore, as_of_snapshot, latest_snapshot, version_log

__all__ = ["DocumentStore", "version_log", "as_of_snapshot", "latest_snapshot"]
