"""Canonical plan digests — the regression rail that separates "the
plan changed" from "the host was noisy" when a benchmark round drifts
(VERDICT r10: the r9→r10 clean-median headline drift needed a bisect
because nothing recorded whether any headline PLAN changed).

``plan_digest`` hashes the pre-execution plan pair (optimized logical +
initial physical) with run-varying tokens normalized away, so:

* identical code + identical data layout  → identical digest across
  sessions, processes, and rounds (the property the sf1 standing gate's
  ``_definition_digest`` already relies on for its analyzed-plan part);
* any re-plan — operator edit, join-strategy flip, new pushdown, a
  changed shuffle-partition constant — flips the digest.

Unlike sf1diff's definition digest this is PLAN-ONLY (no oracle SQL, no
Python source closure): the bench rail asks "would the executors run
the same physical recipe", not "is the query's semantic definition
unchanged" — a docstring edit must not read as a perf-relevant change,
and a UDF body edit shows up in the timing row it actually affects.

Normalized away: exprIds ``#123``, object addresses ``0x...``,
session-global HOF lambda counters (``lambda x_6#``), exchange/subquery
``[plan_id=42]`` tags, and ``[id=#42]`` codegen ids — all probed as
varying between sessions on an unchanged tree.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame


def _canon_gid_lines(txt: str) -> str:
    """Canonicalize the ``RewriteDistinctAggregates`` instability.

    The rule assigns each distinct-aggregate column a group id (``gid``)
    and orders the Expand projections / grouping keys by attribute
    exprId — which depends on the SESSION-GLOBAL expression counter, so
    building any unrelated DataFrame first flips the ordering of a
    multi-``count(DISTINCT)`` plan (probed: g3's digest is bistable
    across construction order with a byte-identical executed recipe;
    every differing line contains ``gid#``).  On those lines ONLY,
    neutralize the gid literals and sort bracketed member lists so both
    orderings digest identically; all other lines pass through
    untouched, so a real re-plan still flips the digest.
    """

    def sort_brackets(line: str) -> str:
        # innermost-first so nested Expand [[..], [..]] lists sort at
        # every level; sorted groups are fenced with \x00/\x01 so an
        # outer pass sees them as atoms, then the fences are restored.
        pat = re.compile(r"\[([^][]*)\]")
        while True:
            new = pat.sub(
                lambda m: "\x00"
                + ", ".join(sorted(p.strip() for p in m.group(1).split(",")))
                + "\x01",
                line,
            )
            if new == line:
                break
            line = new
        return line.replace("\x00", "[").replace("\x01", "]")

    out = []
    for line in txt.split("\n"):
        if "gid#" in line:
            line = re.sub(r"gid# = \d+", "gid# = _", line)
            line = sort_brackets(line)
            # the shuffle key list prints in parens, not brackets; the
            # numPartitions literal sorts along deterministically
            line = re.sub(
                r"hashpartitioning\(([^()]*)\)",
                lambda m: "hashpartitioning("
                + ", ".join(sorted(p.strip() for p in m.group(1).split(",")))
                + ")",
                line,
            )
        out.append(line)
    return "\n".join(out)


def _canon_numpartitions(txt: str) -> str:
    """Neutralize partition COUNTS inside partitioning specs (VERDICT
    r11 item 9): ``spark.sql.shuffle.partitions`` tracks
    ``$SPARK_GRAFT_CPUS`` and ``_spread`` uses ``defaultParallelism``,
    so every ``hashpartitioning(k#, 32)`` becomes ``(k#, 16)`` when the
    driver re-benches at a lower core count — all 17 digest "changes"
    in the r11 c8 run were exactly this.  The count is environment, not
    plan shape; the KEY LIST still digests, so a real partitioning
    change flips the digest.  Key lists can nest parens
    (``coalesce(a#, b#)``), so the trailing count is located by
    balanced-paren scan, not regex.
    """
    out = []
    for line in txt.split("\n"):
        for tok in ("hashpartitioning(", "rangepartitioning("):
            pos = 0
            while True:
                i = line.find(tok, pos)
                if i < 0:
                    break
                j = i + len(tok)
                depth = 1
                while j < len(line) and depth:
                    if line[j] == "(":
                        depth += 1
                    elif line[j] == ")":
                        depth -= 1
                    j += 1
                inner = line[i + len(tok) : j - 1]
                canon = re.sub(r",\s*\d+$", ", _", inner)
                line = line[: i + len(tok)] + canon + line[j - 1 :]
                pos = i + len(tok) + len(canon) + 1
        line = re.sub(
            r"RoundRobinPartitioning\(\d+\)", "RoundRobinPartitioning(_)", line
        )
        # logical-plan spellings of the same count
        line = re.sub(
            r"(RepartitionByExpression \[[^\n]*\]), \d+$", r"\1, _", line
        )
        line = re.sub(r"\bRepartition \d+,", "Repartition _,", line)
        out.append(line)
    return "\n".join(out)


def normalized_plan(df: DataFrame) -> str:
    """The digest's preimage, exposed for diffing two trees by eye."""
    qe = df._jdf.queryExecution()
    txt = (
        qe.optimizedPlan().toString()
        + "\n== physical ==\n"
        + qe.executedPlan().toString()
    )
    txt = re.sub(r"#\d+", "#", txt)
    txt = re.sub(r"0x[0-9a-fA-F]+", "0x", txt)
    txt = re.sub(r"\blambda (\w+?)_\d+#", r"lambda \1_#", txt)
    txt = re.sub(r"\[plan_id=\d+\]", "[plan_id=]", txt)
    txt = re.sub(r"\[id=#?\d+\]", "[id=]", txt)
    return _canon_gid_lines(_canon_numpartitions(txt))


def plan_digest(df: DataFrame) -> str:
    """16-hex-char sha256 of :func:`normalized_plan` — build the
    DataFrame, never execute it; digesting a headline query costs only
    its analysis/optimization pass."""
    return hashlib.sha256(normalized_plan(df).encode()).hexdigest()[:16]
