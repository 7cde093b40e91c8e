"""Stored-function validation pipeline (SURVEY §2 B9, §3.1 step 3).

The reference validates every function registration through a `->?`
short-circuit threading chain (utils/common.clj:8-27) of checks:
`missing-field?`, `blank-field?`, `empty-field-collection?`,
`valid-name?`, `parseable?`, `function-already-exists?` …
(utils/common.clj:197-292,374-380; e.g. create-stream!
stream.clj:117-133). The IR is the function document itself, accreting
keys as it passes each stage.

Here the document is a plain dict (the declarative op-spec that control
messages carry), the chain is :func:`thread_checks`, and each check
returns either the (possibly augmented) doc or an :class:`Invalid`
explaining the failure — same short-circuit semantics, no exceptions
for control flow."""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Invalid:
    """The reference's error map {:status :failure :message …}
    (utils/common.clj:30-38)."""

    message: str
    details: dict | None = None


Check = Callable[[dict], "dict | Invalid"]

_NAME_RE = re.compile(r"^[a-z][a-z0-9\-_]*$")


def thread_checks(doc: dict, *checks: Check) -> dict | Invalid:
    """`->?` — thread doc through checks, stopping at the first
    Invalid (utils/common.clj:8-27)."""
    for check in checks:
        result = check(doc)
        if isinstance(result, Invalid):
            return result
        doc = result
    return doc


# -- the reference's check vocabulary ---------------------------------

def missing_field(*fields: str) -> Check:
    def check(doc):
        missing = [f for f in fields if f not in doc]
        if missing:
            return Invalid("missing-field", {"fields": missing})
        return doc

    return check


def blank_field(*fields: str) -> Check:
    def check(doc):
        blank = [f for f in fields if isinstance(doc.get(f), str) and not doc[f].strip()]
        if blank:
            return Invalid("blank-field", {"fields": blank})
        return doc

    return check


def empty_field_collection(*fields: str) -> Check:
    def check(doc):
        empty = [
            f for f in fields if f in doc and isinstance(doc[f], (list, dict)) and not doc[f]
        ]
        if empty:
            return Invalid("empty-field-collection", {"fields": empty})
        return doc

    return check


def valid_name(field: str = "name") -> Check:
    """kebab-case identifier (the reference names functions with
    namespaced keywords, utils/common.clj:269-277)."""

    def check(doc):
        name = doc.get(field)
        if not isinstance(name, str) or not _NAME_RE.match(name):
            return Invalid("invalid-name", {field: name})
        return doc

    return check


def parseable_steps(field: str = "steps") -> Check:
    """The `parseable?` analog for declarative op-specs: every step is
    a known op WITH the args OpChain.from_spec will read (replaces the
    reference's read-string of quoted Clojure, utils/common.clj:206).
    r10 review: op-name-only checking let {'op': 'filter'} (no expr)
    through validation and crash as a KeyError inside the control-plane
    activation handler instead of returning Invalid here. 'then' is
    fluent-only (it carries a callable, which no JSON spec can) and is
    rejected like any unknown op."""

    def _well_formed(s: dict) -> bool:
        op = s.get("op")
        if op == "map":
            return isinstance(s.get("cols"), dict) and all(
                isinstance(k, str) and isinstance(v, str) for k, v in s["cols"].items()
            )
        if op == "filter":
            return isinstance(s.get("expr"), str) and bool(s["expr"].strip())
        if op in ("select", "drop"):
            return isinstance(s.get("cols"), list) and all(
                isinstance(c, str) for c in s["cols"]
            )
        if op == "flatmap":
            return isinstance(s.get("col"), str) and isinstance(s.get("alias"), str)
        if op == "rename":
            return isinstance(s.get("mapping"), dict) and all(
                isinstance(k, str) and isinstance(v, str) for k, v in s["mapping"].items()
            )
        if op == "udf":
            return (
                isinstance(s.get("name"), str)
                and isinstance(s.get("out"), str)
                and isinstance(s.get("in"), list)
            )
        return False

    def check(doc):
        steps = doc.get(field, [])
        bad = [s for s in steps if not (isinstance(s, dict) and _well_formed(s))]
        if bad:
            return Invalid("unparseable-step", {"steps": bad})
        return doc

    return check


def function_already_exists(existing: Callable[[str], bool], field: str = "name") -> Check:
    """Create-vs-update guard (db/app_db.clj:71-77 uniqueness check)."""

    def check(doc):
        if existing(doc.get(field, "")):
            return Invalid("function-already-exists", {field: doc.get(field)})
        return doc

    return check


def validate_buffer() -> Check:
    """Buffer validation (stream.clj:83-95 validate-buffer): a positive
    int (fixed — admission-time backpressure) or the reference's lossy
    spec shapes ``{"sliding-buffer": n}`` / ``{"dropping-buffer": n}``,
    which since r8 activate the deterministic per-key shed analogs
    (streaming/buffering.py; semantics note in that module). Lossy
    specs additionally need ``buffer_key``/``buffer_ts`` fields on the
    doc so the shed has a key and an event-time ordering. Anything else
    is the reference's ``:invalid-buffer`` failure."""

    def check(doc):
        buf = doc.get("buffer")
        if buf is None:
            return doc
        from dataworks_spark.streaming.graph import validate_buffer as vb

        try:
            spec = vb(
                buf,
                key_cols=doc.get("buffer_key"),
                ts_col=doc.get("buffer_ts", "ts"),
            )
        except ValueError:
            return Invalid("invalid-buffer", {"buffer": buf})
        if spec.policy != "fixed" and not spec.key_cols:
            return Invalid(
                "invalid-buffer",
                {"buffer": buf, "hint": "lossy buffer needs buffer_key"},
            )
        return doc

    return check
