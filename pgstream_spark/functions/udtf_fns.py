"""Python UDTFs — one row in, many rows out (SURVEY §2 X-5, modern form).

Spark's built-in ``explode``/``posexplode`` cover array flattening; a
Python UDTF is the escape hatch when the row-expansion logic needs real
code.  ``TokenizeUDTF`` emits one row per token with its position and a
rolling-hash fingerprint — the tokenizer shape a training-data pipeline
uses for span-level lineage.

UDTFs run in the Python worker (Arrow-batched rows in, iterator out), so
like all Python paths they are for logic built-ins can't express — the
plain token count in ``textstats`` stays JVM-side.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql.functions import udtf

__all__ = ["TokenizeUDTF", "register_tokenize_udtf"]

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_MOD = (1 << 61) - 1
_BASE = 257


@udtf(returnType="doc_id bigint, pos int, token string, rolling_hash bigint")
class TokenizeUDTF:
    """(doc_id, text) → one row per lowercase token.

    ``rolling_hash`` is the polynomial rolling hash of the token stream up
    to this position — equal prefixes of two documents yield equal
    hashes, so prefix-duplication shows up as matching (pos, rolling_hash)
    pairs.
    """

    def eval(self, doc_id: int, text: str) -> Iterator[tuple]:
        if text is None:
            return
        h = 0
        for pos, tok in enumerate(_TOKEN_RE.findall(text.lower())):
            for ch in tok:
                h = (h * _BASE + ord(ch)) % _MOD
            h = (h * _BASE + 32) % _MOD  # token separator
            yield doc_id, pos, tok, h


def register_tokenize_udtf(spark) -> None:
    """Register as SQL table function ``tokenize``:
    ``SELECT * FROM tokenize(doc_id, text)``."""
    spark.udtf.register("tokenize", TokenizeUDTF)
