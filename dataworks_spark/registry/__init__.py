"""Named-function registry (SURVEY §2 K): transformers (pure fns / UDFs,
hot-swappable), transactors (side-effecting foreachBatch callables),
the alert scheduler (I9), and the user registry / token auth surface
(utils/auth.clj)."""

from dataworks_spark.registry.alerts import AlertScheduler
from dataworks_spark.registry.auth import UserRegistry, create_token, verify_token
from dataworks_spark.registry.transactors import TransactorRegistry
from dataworks_spark.registry.transformers import TransformerRegistry

__all__ = [
    "TransformerRegistry",
    "TransactorRegistry",
    "AlertScheduler",
    "UserRegistry",
    "create_token",
    "verify_token",
]
