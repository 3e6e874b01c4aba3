"""Postgres string-pattern compatibility: ``SIMILAR TO``.

The reference's pass-through SQL runs on Postgres, where ``SIMILAR TO``
is a third pattern language beside LIKE and POSIX regexes (Postgres
docs §9.7.2): SQL wildcards ``%``/``_`` PLUS regex-style alternation/
quantifiers/classes, full-string anchored.  Spark has no SIMILAR TO —
and DuckDB's operator of that name is a plain regex match (no ``%``/
``_`` translation), so the semantics genuinely need a shim, not a
rename: `similar_to_regex` compiles the Postgres dialect to an anchored
Java/RE2-compatible regex, and `similar_to` applies it as a map-only
JVM ``rlike``.

Translation rules (Postgres §9.7.2):

* ``%`` → ``.*``, ``_`` → ``.`` (outside character classes), matching
  across newlines like SQL wildcards do (the compiled regex carries
  ``(?s)`` — Java regex and RE2 both honor it);
* ``| * + ? ( ) { } [ ]`` keep their regex meanings;
* the ``escape`` character makes the next char literal — Postgres's
  DEFAULT is backslash (pass ``escape=None`` for ``ESCAPE NONE``
  semantics, where backslash is an ordinary literal);
* other regex metacharacters (``. ^ $``) are literal in the SQL
  dialect and get escaped;
* the whole pattern is anchored (SIMILAR TO matches the ENTIRE
  string — the sharpest behavioral difference from rlike's search).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["similar_to_regex", "similar_to"]

# regex metacharacters that are LITERALS in the SIMILAR TO dialect
_LITERAL_META = ".\\^$"


def similar_to_regex(pattern: str, escape: str | None = "\\") -> str:
    """Compile a Postgres ``SIMILAR TO`` pattern to an anchored regex
    string (usable by Spark ``rlike``/``regexp_like`` and DuckDB
    ``regexp_matches`` alike — both engines then run the IDENTICAL
    regex).  ``escape`` is the SQL ESCAPE character — backslash by
    default, exactly as in Postgres; ``escape=None`` = ESCAPE NONE."""
    if escape is not None and len(escape) != 1:
        raise ValueError("escape must be a single character")
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if escape is not None and ch == escape:
            if i + 1 >= n:
                raise ValueError("pattern ends with the escape character")
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if in_class:
            if pattern.startswith("[:", i) or pattern.startswith("[.", i) or pattern.startswith("[=", i):
                # POSIX bracket classes ([:digit:]) / collating elements:
                # RE2 accepts them, Java regex silently misparses them as
                # nested class unions — refuse rather than diverge the two
                # engines (callers can write [0-9]-style ranges instead)
                raise ValueError(
                    "POSIX bracket expressions ([: :], [. .], [= =]) are "
                    "not supported inside character classes"
                )
            out.append(ch)
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            # POSIX: a ']' first in the class (after optional '^') is a
            # LITERAL — Java regex needs it escaped to read it that way
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append("\\]")
                i += 1
            continue
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch in _LITERAL_META:
            out.append("\\" + ch)
        else:  # regex-meaningful (|*+?(){}) and plain chars pass through
            out.append(ch)
        i += 1
    if in_class:
        raise ValueError("unterminated character class in pattern")
    return "(?s)^(?:" + "".join(out) + ")$"


def similar_to(
    col: Column | str, pattern: str, escape: str | None = "\\"
) -> Column:
    """``col SIMILAR TO pattern`` as a boolean Column — the compiled
    anchored regex through ``rlike``: map-only, whole-stage codegen,
    pushdown-eligible like any deterministic predicate."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(similar_to_regex(pattern, escape))
