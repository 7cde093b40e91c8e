"""Named-function registry (SURVEY §2 K): transformers (pure fns / UDFs,
hot-swappable), transactors (side-effecting foreachBatch callables),
and the alert scheduler (I9)."""

from dataworks_spark.registry.transformers import TransformerRegistry
from dataworks_spark.registry.transactors import TransactorRegistry
from dataworks_spark.registry.alerts import AlertScheduler

__all__ = ["TransformerRegistry", "TransactorRegistry", "AlertScheduler"]
