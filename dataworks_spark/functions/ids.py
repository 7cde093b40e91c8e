"""ID generation (SURVEY §2 H8).

Reference: the app graph derives its consumer-group ids from random
UUIDs (``app_graph.clj:29``) and stored documents carry UUID-ish ids.

Two surfaces:

- :func:`uuid_col` — Spark's native nondeterministic v4 generator
  (``F.uuid()``): one fresh UUID per row, generated executor-side, no
  shuffle, no driver round-trip. Nondeterministic by definition, so it
  is excluded from the differential oracle (SURVEY §2 H8) and anchored
  by format/uniqueness unit tests instead.
- :func:`deterministic_uuid` — RFC 4122 **version-3** (md5 namespace)
  UUIDs computed entirely with JVM builtins: md5 over
  ``namespace || name``, version nibble forced to ``3``, variant bits
  forced to ``10xx``. Deterministic, so it IS cross-engine
  reproducible (md5 is the one digest every engine shares) — the form
  a pipeline should use for stable row identities (re-runs produce the
  same ids; retries don't fork lineage). Unit tests pin it against
  CPython's ``uuid.uuid3`` byte-for-byte.

Note the namespace argument is a STRING prefix, not the RFC's 16-byte
namespace UUID digest input; for interop with ``uuid.uuid3(ns_uuid,
name)`` pass ``namespace=ns_uuid.bytes`` semantics via
``F.unhex``-free string concat of ``ns_uuid.bytes.decode('latin1')``
only when the namespace is ASCII-safe — the tests use the plain-string
form on both sides, which is the contract this function defines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uuid_col() -> Column:
    """One random v4 UUID per row (H8): ``F.uuid()`` — executor-side,
    partition-local entropy, no coordination. Nondeterministic: never
    use in an oracle-checked projection or a retried idempotent sink
    (use :func:`deterministic_uuid` there)."""
    return F.expr("uuid()")


def _force_nibble(h: Column, pos: int, nibble: str) -> Column:
    """Replace the 1-indexed hex char at ``pos`` with a literal."""
    return F.concat(F.substring(h, 1, pos - 1), F.lit(nibble), F.substring(h, pos + 1, 32 - pos))


def deterministic_uuid(namespace: str, name: Column) -> Column:
    """RFC 4122 v3 UUID string from ``md5(namespace || name)`` (H8
    deterministic form): version nibble = 3, variant nibble ∈
    {8,9,a,b} via (d & 0x3) | 0x8. Equals CPython's
    ``uuid.uuid3(...)`` when fed the same digest input (unit-pinned).
    Pure JVM expression — usable inside any projection at 100 TB with
    zero shuffle."""
    h = F.md5(F.concat(F.lit(namespace), name.cast("string")))
    h = _force_nibble(h, 13, "3")
    variant = F.lower(
        F.hex(
            F.conv(F.substring(h, 17, 1), 16, 10).cast("int").bitwiseAND(F.lit(3)).bitwiseOR(F.lit(8))
        )
    )
    h = F.concat(F.substring(h, 1, 16), variant, F.substring(h, 18, 15))
    out = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    # NULL name must propagate NULL, not collapse onto "": every
    # substring of the NULL digest is NULL, and concat_ws SKIPS null
    # args — all NULL-name rows silently shared the one non-UUID id ""
    # and aliased in any join/dedup keyed on it (r10 review)
    return F.when(name.isNull(), F.lit(None).cast("string")).otherwise(out)
