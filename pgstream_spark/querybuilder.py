"""SQL templating: ``{n}`` splice holes + named parameters.

The reference substitutes ``{1}…{n}`` holes with rendered SQL literals
client-side before shipping the text to Postgres
(`/root/reference/src/Database/PostgreSQL/Stream/QueryBuilder.hs:170-187`),
with per-type rendering rules in ``ToField``
(`QueryBuilder.hs:40-147`):

* numbers rendered plainly (`:44-59`),
* strings / UUIDs single-quoted (`:62-68,83`),
* ``Identifier`` / ``SQL`` / nested ``Query`` spliced raw (`:71-80`),
* ``Nothing`` → ``null`` (`:91-93`), bools → ``true/false`` (`:95-97`).

This module reproduces those semantics for Spark SQL with one deliberate
upgrade: quoted-literal rendering escapes embedded quotes, so value splices
are injection-safe by construction (the reference's ``Escape`` action was
left unimplemented, `QueryBuilder.hs:155`).  Raw splicing remains available
— exactly as in the reference — via the explicit marker types ``SQL`` and
``Identifier``, so the caller must opt in to raw text.

Spark ≥3.4's server-side parameterized ``spark.sql(q, args=...)`` is used by
the engine when the template uses *named* (``:name``) parameters; ``{n}``
positional holes are rendered client-side here for reference parity.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
import uuid as _uuid
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Sequence

from pgstream_spark.errors import ConversionError, QueryError

__all__ = ["SQL", "Identifier", "render_literal", "format_query"]


@dataclass(frozen=True)
class SQL:
    """A raw SQL fragment splice (reference `QueryBuilder.hs:74-76`).

    Spliced verbatim — the ``"LIMIT 100000"`` argument of the reference's
    example (`Example.hs:55`) is this type.
    """

    fragment: str


@dataclass(frozen=True)
class Identifier:
    """A table/column identifier splice (reference `Types.hs:42-47`,
    rendered raw at `QueryBuilder.hs:71-72`).  Backtick-quoted for Spark,
    with embedded backticks doubled, so arbitrary names are safe."""

    name: str

    def render(self) -> str:
        return "`" + self.name.replace("`", "``") + "`"


_HOLE_RE = re.compile(r"\{(\d+)\}")


def render_literal(value: Any, dialect: str = "spark") -> str:
    """Render a Python value as a SQL literal.

    Port of the reference's ``ToField`` dispatch (`QueryBuilder.hs:40-100`)
    to Python/Spark types, plus escaping.  ``dialect`` controls STRING
    escaping only: Spark SQL escapes quotes with a backslash, while
    Postgres (standard_conforming_strings, the default since 9.1) and
    DuckDB double the quote and treat backslash literally — one rendering
    cannot serve both, and sending the Spark form to a live Postgres is
    a syntax error (or, worse, a quoting bug).
    """
    if value is None:
        return "null"
    if isinstance(value, SQL):
        return value.fragment
    if isinstance(value, Identifier):
        return value.render()
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "double('nan')"
        if math.isinf(value):
            return "double('inf')" if value > 0 else "double('-inf')"
        # the D suffix forces DOUBLE: a bare decimal literal is parsed as
        # exact DECIMAL under ANSI mode, silently changing the type
        return repr(value) + "D"
    if isinstance(value, Decimal):
        return f"CAST('{value}' AS DECIMAL(38,18))"
    if isinstance(value, _uuid.UUID):
        return f"'{value}'"
    if isinstance(value, str):
        if dialect == "postgres":
            return "'" + value.replace("'", "''") + "'"
        return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(value, bytes):
        return f"X'{value.hex()}'"
    if isinstance(value, _dt.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, _dt.timedelta):
        total = value.total_seconds()
        return f"INTERVAL '{total}' SECOND"
    if isinstance(value, (list, tuple)):
        return "array(" + ", ".join(render_literal(v) for v in value) + ")"
    raise ConversionError(f"no SQL literal rendering for {type(value).__name__}")


def format_query(
    template: str,
    args: Sequence[Any] | dict[str, Any] | None,
    dialect: str = "spark",
) -> str:
    """Substitute ``{1}…{n}`` holes (1-indexed, as in the reference's
    ``runFormatter``, `QueryBuilder.hs:170-177`) or ``:name`` named holes
    with rendered literals.

    Missing and excess arguments raise ``QueryError`` — stricter than the
    reference, which silently left unmatched holes in place.
    """
    if args is None:
        args = ()
    if isinstance(args, dict):
        out = template
        for name, value in args.items():
            pat = re.compile(r":" + re.escape(name) + r"\b")
            if not pat.search(out):
                raise QueryError(f"named parameter :{name} not found", template)
            out = pat.sub(
                render_literal(value, dialect).replace("\\", "\\\\"), out
            )
        return out

    if not isinstance(args, (list, tuple)):
        args = (args,)  # `Only`-style single argument (reference Types.hs:73-75)

    holes = {int(m) for m in _HOLE_RE.findall(template)}
    # strict both ways: missing args for holes AND args without holes
    # (the documented excess-argument contract) raise
    if holes != set(range(1, len(args) + 1)):
        raise QueryError(
            f"template holes {sorted(holes)} do not match {len(args)} args",
            template,
        )

    def _sub(m: re.Match[str]) -> str:
        return render_literal(args[int(m.group(1)) - 1], dialect)

    return _HOLE_RE.sub(_sub, template)
