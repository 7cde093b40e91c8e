"""Safe EDN decode (SURVEY §2 H5).

The reference's wire format is EDN read with a *safe* reader — no eval,
time-literal tagged readers only (src/dataworks/utils/common.clj:112-118
``read-string-safely``; serializers utils/kafka.clj:76-78). Spark has no
EDN builtin, so this is a small recursive-descent parser used ONLY at
the Kafka boundary (default wire format is JSON).

The parser is built by a closure factory: locally-defined functions are
cloudpickled **by value**, so the UDF works on executor Python workers
that cannot import this package (the same constraint as
llm/multimodal's kernels).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _build_parser():
    """Return a self-contained parse(s) → Python data function.
    Maps→dict, vectors/lists→list, sets→sorted list (deterministic),
    keywords→':name' strings, tagged literals (#inst …)→their value.
    No code evaluation anywhere."""

    def tokenize(s):
        out, i, n = [], 0, len(s)
        while i < n:
            c = s[i]
            if c.isspace() or c == ",":
                i += 1
            elif c in "[](){}":
                out.append(c)
                i += 1
            elif c == "#" and i + 1 < n and s[i + 1] == "{":
                out.append("#{")
                i += 2
            elif c == "#":  # tagged literal, e.g. #inst, #time/instant
                j = i + 1
                while j < n and not s[j].isspace() and s[j] not in '[](){}"':
                    j += 1
                out.append(s[i:j])
                i = j
            elif c == '"':
                j, buf = i + 1, []
                while j < n and s[j] != '"':
                    if s[j] == "\\" and j + 1 < n:
                        esc = s[j + 1]
                        buf.append(
                            {"n": "\n", "t": "\t", '"': '"', "\\": "\\", "r": "\r"}.get(esc, esc)
                        )
                        j += 2
                    else:
                        buf.append(s[j])
                        j += 1
                if j >= n:
                    raise ValueError("unterminated string")
                out.append('"' + "".join(buf))
                i = j + 1
            else:
                j = i
                while j < n and not s[j].isspace() and s[j] not in '[](){},"':
                    j += 1
                out.append(s[i:j])
                i = j
        return out

    #: sentinel for the EDN discard macro #_ — never a real value
    _DISCARD = object()

    def parse_at(tokens, pos):
        if pos >= len(tokens):
            raise ValueError("unexpected end of input")
        t = tokens[pos]
        if t in ("[", "("):
            close = "]" if t == "[" else ")"
            out, pos = [], pos + 1
            while pos < len(tokens) and tokens[pos] != close:
                v, pos = parse_at(tokens, pos)
                if v is not _DISCARD:
                    out.append(v)
            if pos >= len(tokens):
                # IndexError violated the parser's documented ValueError
                # contract on truncated payloads (r10 review)
                raise ValueError(f"unterminated collection (missing {close!r})")
            return out, pos + 1
        if t == "#{":
            out, pos = [], pos + 1
            while pos < len(tokens) and tokens[pos] != "}":
                v, pos = parse_at(tokens, pos)
                if v is not _DISCARD:
                    out.append(v)
            if pos >= len(tokens):
                raise ValueError("unterminated collection (missing '}')")
            return sorted(out, key=repr), pos + 1
        if t == "{":
            # forms are read ONE at a time (not k/v pairs) so a discard
            # can drop any form — {:a 1 #_ :b #_ 2} → {:a 1}
            forms, pos = [], pos + 1
            while pos < len(tokens) and tokens[pos] != "}":
                v, pos = parse_at(tokens, pos)
                if v is not _DISCARD:
                    forms.append(v)
            if pos >= len(tokens):
                raise ValueError("unterminated collection (missing '}')")
            if len(forms) % 2:
                raise ValueError("map literal with odd number of forms")
            out = {}
            for k, v in zip(forms[::2], forms[1::2]):
                out[k if isinstance(k, (str, int, float, bool)) else repr(k)] = v
            return out, pos + 1
        if t == "#_":
            # EDN discard macro: the next form is read and DROPPED
            # (r10 review: the generic tagged-literal branch kept the
            # discarded form as a phantom element)
            _v, pos = parse_at(tokens, pos + 1)
            return _DISCARD, pos
        if t.startswith("#_"):
            # '#_2' — the discarded form is glued to the marker token
            return _DISCARD, pos + 1
        if t.startswith("#"):  # tagged literal
            v, pos = parse_at(tokens, pos + 1)
            return convert_tagged(t[1:], v), pos
        if t.startswith('"'):
            return t[1:], pos + 1
        if t == "nil":
            return None, pos + 1
        if t == "true":
            return True, pos + 1
        if t == "false":
            return False, pos + 1
        if t.startswith(":"):
            return t, pos + 1  # keyword kept as ':name'
        try:
            return (float(t) if ("." in t or "e" in t or "E" in t) else int(t)), pos + 1
        except ValueError:
            return t, pos + 1  # bare symbol → string

    def convert_tagged(tag, v):
        """Time-literal tagged readers (the reference's safe reader
        registers exactly these, utils/common.clj:112-118 + the
        java.time tag family): instants/date-times → datetime, dates →
        date. Durations/periods keep their ISO-8601 string (Python has
        no stdlib ISO-duration parser; no eval, ever). Unknown tags
        pass their value through unchanged — same no-crash posture as
        the reference's default reader."""
        import datetime as _dtm

        if not isinstance(v, str):
            return v
        try:
            if tag in ("inst", "time/instant", "time/zoned-date-time",
                       "time/offset-date-time", "time/date-time"):
                return _dtm.datetime.fromisoformat(v.replace("Z", "+00:00"))
            if tag == "time/date":
                return _dtm.date.fromisoformat(v)
            if tag == "time/time":
                return _dtm.time.fromisoformat(v)
        except ValueError:
            return v  # malformed literal: surface the raw string
        return v

    def parse(s):
        tokens = tokenize(s)
        pos = 0
        value = _DISCARD
        while value is _DISCARD:  # leading top-level discards: #_ 1 2 → 2
            value, pos = parse_at(tokens, pos)
        if pos != len(tokens):
            raise ValueError(f"trailing tokens at {pos}")
        return value

    return parse


#: driver-side parser instance
parse_edn = _build_parser()


def edn_to_json_udf() -> Column:
    """UDF decoding an EDN string column to a JSON string (row-level
    Python — Kafka-boundary only, never a hot-path op)."""
    parse = _build_parser()  # local closure → cloudpickled by value

    def decode(s):
        if s is None:
            return None
        import json as _json

        try:
            return _json.dumps(parse(s), default=str, sort_keys=True)
        except Exception:
            return None

    return F.udf(decode, "string")
