"""Pure-Python Postgres wire-protocol (v3) source — SURVEY §2 S-2.

The reference IS a Postgres wire client (libpq bindings —
`/root/reference/src/Database/PostgreSQL/Stream/Connection.hs:49-75`,
`Stream.hs:97`).  This module speaks the same public protocol directly
(startup / simple-query / text-format rows, per the PostgreSQL frontend/
backend protocol documentation), so the live-database edge needs no JDBC
driver jar:

* ``PgWireClient`` — one socket: startup, trust or cleartext auth,
  ``simple_query`` returning (fields, rows) with text-format values
  decoded by type OID.
* ``read_table`` — driver-side fetch → ``createDataFrame`` with the
  schema mapped from the RowDescription OIDs.  For control-plane-sized
  reads (dimension tables, watermarks).
* ``read_partitioned`` — the scale path: key-range slices executed by
  ``mapInPandas``, each task opening its OWN connection and reading one
  ``[lo, hi)`` slice — Spark-JDBC's partitioned-read model implemented on
  the reference's own protocol (its pool + cursor batching,
  `Connection.hs:29-47`, generalized to one connection per task).

* ``copy_out`` / ``copy_in`` — COPY sub-protocol (text format): the
  Postgres bulk path.  ``read_partitioned(via_copy=True)`` and
  ``write_partitioned(via_copy=True)`` route each per-task slice through
  ``COPY (…) TO STDOUT`` / ``COPY … FROM STDIN`` instead of row-set
  queries / multi-row INSERTs — one stream per connection, no per-row
  SQL rendering, the shape a real 100 TB extract/load uses.

* ``copy_out_binary`` / ``copy_in_binary`` — COPY ``(FORMAT binary)``
  for the fixed-width types: the reference's actual data-plane choice
  (`Stream.hs:97` requests PQ.Binary results; `FromRow.hs:127-324`
  decodes them).  Typed values travel in their network representations,
  so floats round-trip bit-exactly with no repr/parse hazard.

Protocol scope: simple-query + extended (Parse/Bind/Execute, per-column
binary results), COPY text+binary framing, TLS (SSLRequest negotiation
with libpq's COMPLETE ``sslmode`` ladder: disable / allow / prefer /
require / verify-ca / verify-full, including the opportunistic modes'
fallback-retry negotiation and libpq's require→verify-ca promotion when
``sslrootcert`` is pinned), and the full
auth ladder a modern server actually offers — trust, cleartext, MD5,
SCRAM-SHA-256 (RFC 5802/7677: PBKDF2-salted MUTUAL proof — the server's
signature is verified, so a spoofed server that merely accepts the
password is rejected), and SCRAM-SHA-256-PLUS with RFC 5929
``tls-server-end-point`` channel binding (the auth transcript is bound
to the server certificate, with the RFC's y-flag downgrade defense when
a middlebox strips the -PLUS advertisement).

GSSAPI/Kerberos auth — EXPLICIT NON-GOAL for this build.  The reference
inherits GSS from libpq wholesale (`Connection.hs:56-71` delegates the
whole connect to ``PQ.connectdb``, so every libpq auth method rides
along); a faithful pure-Python reimplementation needs a GSS mechanism
library (MIT krb5 / python-gssapi — neither installable in this
environment) plus a KDC to test against, and hand-rolling Kerberos
crypto without a conformance target is how auth bugs ship.  The ladder
therefore stops, deliberately, at SCRAM-SHA-256-PLUS — the strongest
method that is fully specified by public RFCs (5802/7677/5929) and
verifiable against an in-repo stub.  A server that demands GSS fails
with the typed "unsupported auth method 7/8" QueryError from
``_startup``, not a hang.  If python-gssapi becomes available, the hook
point is the auth loop in ``_startup`` (AuthenticationGSS=7 /
GSSContinue=8: feed tokens to ``gssapi.SecurityContext.step`` and ship
each with a 'p' message until the context is established).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import socket
import struct
import threading
import uuid
from dataclasses import dataclass
from decimal import Context, Decimal
from typing import Any, Callable, Iterator, Sequence

from pgstream_spark.errors import QueryError

__all__ = [
    "ConnSettings",
    "PgWireClient",
    "PreparedStatement",
    "read_table",
    "read_partitioned",
    "pooled_connection",
    "close_pool",
    "pool_stats",
    "write_partitioned",
    "copy_escape",
    "copy_unescape",
]


@dataclass
class ConnSettings:
    """Connection.hs:49-54 — host/dbname/user/password (+ port)."""

    host: str
    dbname: str
    user: str
    password: str | None = None
    port: int = 5432
    # libpq's complete sslmode ladder: "disable" (plaintext), "allow"
    # (plaintext first, retry TLS if the server rejects the startup),
    # "prefer" (TLS first, plaintext if the server lacks TLS or the
    # handshake fails), "require" (TLS, cert unchecked — unless
    # sslrootcert is pinned, which promotes it to verify-ca per libpq),
    # "verify-ca" (TLS + chain check), "verify-full" (TLS + chain +
    # hostname check).
    sslmode: str = "disable"
    sslrootcert: str | None = None


# type OID → (python decoder, Spark DDL type)
def _pg_date(s: str):
    import datetime

    return datetime.date.fromisoformat(s)


def _pg_timestamp(s: str):
    import datetime

    return datetime.datetime.fromisoformat(s)


def _pg_bool(s: str) -> bool:
    return s == "t"


def _pg_bytea(s: str) -> bytes:
    if s.startswith("\\x"):
        return bytes.fromhex(s[2:])
    return s.encode("latin1")  # legacy escape format fallback


def _pg_text_array(elem: Callable[[str], Any]) -> Callable[[str], list]:
    """Parse a 1-D Postgres text-format array (``{1,2,NULL,3}``) of
    numeric elements.  NULL elements are COMPACTED (dropped), matching
    the reference's decode semantics (`/root/reference/cbits/
    array_conversion.c:68-149` skips -1-length elements) and the binary
    codec below — so text and binary paths agree on the same value."""

    def parse(s: str) -> list:
        body = s.strip()
        if body.startswith("["):
            # non-default lower bound renders as '[m:n]={...}' (one
            # '[m:n]' per dimension); the bounds carry no information a
            # 1-D decode needs — strip them, mirroring the binary
            # decoder's tolerance of arbitrary lower bounds
            eq = body.find("=")
            if eq == -1:
                raise ValueError(f"not an array literal: {s[:40]!r}")
            body = body[eq + 1 :]
        if not (body.startswith("{") and body.endswith("}")):
            raise ValueError(f"not an array literal: {s[:40]!r}")
        body = body[1:-1]
        if not body:
            return []
        return [elem(p) for p in body.split(",") if p != "NULL"]

    return parse


# -- typed decoders for the reference's remaining FromRow scalars -------
# uuid / timestamptz / time / timetz / interval (OIDs 2950/1184/1083/
# 1266/1186) are typed decodes in the reference's matrix (`/root/
# reference/src/Database/PostgreSQL/Stream/FromRow.hs:184-188, 244-272`,
# via the public postgresql-binary package); until round 6 they fell
# back to raw text here.  Representation choices, Spark-first:
#
#   uuid        → canonical lowercase string (validated); Spark has no
#                 UUID type, STRING is its idiom.
#   timestamptz → tz-AWARE datetime normalized to UTC (the reference's
#                 UTCTime), Spark TIMESTAMP (instant semantics).
#   time        → datetime.time, Spark TIME(6) (native in Spark 4).
#   timetz      → canonical 'HH:MM:SS[.ffffff]±HH:MM' STRING — Spark
#                 has no TIME WITH TIME ZONE; the decode still parses
#                 and normalizes (reference: (TimeOfDay, TimeZone)).
#   interval    → datetime.timedelta with months flattened at 30 days,
#                 exactly postgresql-binary's DiffTime flattening the
#                 reference consumes; Spark INTERVAL DAY TO SECOND.


def _pg_uuid(s: str) -> str:
    return str(uuid.UUID(s.strip()))


def _pg_time(s: str):
    # Known limit, shared with psycopg2/psycopg3: Postgres' legal
    # TIME '24:00:00' has no datetime.time representation and raises
    # ValueError (a loud typed decode error, never a silent remap to
    # 00:00:00 — which is a DIFFERENT value).  Same applies to the
    # binary path (µs = 86_400_000_000) and to timetz below.
    import datetime

    return datetime.time.fromisoformat(s)


def _timetz_canonical(t) -> str:
    """'HH:MM:SS[.ffffff]±HH:MM[:SS]' with the fraction trimmed of
    trailing zeros (Postgres display style) — the ONE canonical form
    both the text and binary timetz decoders emit."""
    base = t.replace(tzinfo=None).isoformat()
    if "." in base:
        base = base.rstrip("0").rstrip(".")
    total = int(t.utcoffset().total_seconds())
    sign = "+" if total >= 0 else "-"
    hh, rem = divmod(abs(total), 3600)
    mm, ss = divmod(rem, 60)
    off = f"{sign}{hh:02d}:{mm:02d}" + (f":{ss:02d}" if ss else "")
    return base + off


def _pg_timetz(s: str) -> str:
    import datetime

    t = datetime.time.fromisoformat(s)
    if t.tzinfo is None:
        raise ValueError(f"timetz literal without offset: {s!r}")
    return _timetz_canonical(t)


def _pg_timestamptz(s: str):
    import datetime

    v = datetime.datetime.fromisoformat(s)
    if v.tzinfo is None:  # server always sends an offset; be tolerant
        return v.replace(tzinfo=datetime.timezone.utc)
    return v.astimezone(datetime.timezone.utc)


# default intervalstyle=postgres: '[±N year(s)] [±N mon(s)] [±N day(s)]
# [±HH:MM:SS[.ffffff]]' — any subset, in that order
_INTERVAL_UNIT = re.compile(r"([+-]?\d+)\s+(year|mon|day)s?")
_INTERVAL_TIME = re.compile(r"([+-]?)(\d+):(\d\d):(\d\d(?:\.\d+)?)")


def _pg_interval(s: str):
    import datetime

    months = days = 0
    for n, unit in _INTERVAL_UNIT.findall(s):
        if unit == "year":
            months += 12 * int(n)
        elif unit == "mon":
            months += int(n)
        else:
            days += int(n)
    us = 0
    tm = _INTERVAL_TIME.search(s)
    if tm:
        sign = -1 if tm.group(1) == "-" else 1
        frac = Decimal(tm.group(4))
        us = sign * int(
            (int(tm.group(2)) * 3600 + int(tm.group(3)) * 60) * 1_000_000
            + (frac * 1_000_000).to_integral_value()
        )
    elif not _INTERVAL_UNIT.search(s):
        raise ValueError(f"not an interval literal: {s[:40]!r}")
    return datetime.timedelta(days=days + 30 * months, microseconds=us)


_OID_DECODE: dict[int, tuple[Callable[[str], Any], str]] = {
    16: (_pg_bool, "boolean"),
    17: (_pg_bytea, "binary"),
    18: (str, "string"),  # "char"
    20: (int, "bigint"),
    21: (int, "smallint"),
    23: (int, "int"),
    25: (str, "string"),  # text
    700: (float, "float"),
    701: (float, "double"),
    1007: (_pg_text_array(int), "array<int>"),  # int4[]
    1016: (_pg_text_array(int), "array<bigint>"),  # int8[]
    1021: (_pg_text_array(float), "array<float>"),  # float4[]
    1022: (_pg_text_array(float), "array<double>"),  # float8[]
    1042: (str, "string"),  # bpchar
    1043: (str, "string"),  # varchar
    1082: (_pg_date, "date"),
    1083: (_pg_time, "time(6)"),
    1114: (_pg_timestamp, "timestamp_ntz"),
    1184: (_pg_timestamptz, "timestamp"),
    1186: (_pg_interval, "interval day to second"),
    1266: (_pg_timetz, "string"),  # Spark lacks TIME WITH TIME ZONE
    1700: (Decimal, "decimal(38,18)"),
    2950: (_pg_uuid, "string"),
}


# -- COPY binary-format codec (PostgreSQL COPY ... (FORMAT binary)) ------
# Public wire layout (PostgreSQL docs, "Binary Format"): 11-byte
# signature PGCOPY\n\377\r\n\0, int32 flags, int32 header-extension
# length; then per tuple an int16 field count and per field an int32
# byte length (-1 = NULL) + the type's binary send() representation
# (network byte order); an int16 -1 trailer ends the stream.  This is
# the reference's bulk data plane (`/root/reference/src/Database/
# PostgreSQL/Stream.hs:97` requests PQ.Binary; `FromRow.hs:127-324`
# decodes it) — binary framing removes the float repr round-trip hazard
# of the text path and is the real bulk-load economics.  Covers the
# fixed-width scalars, the reference's signature array types (int4[]/
# int8[]/float4[]/float8[], OIDs 1007/1016/1021/1022 — its defining
# data-plane trick is exactly binary array extraction,
# `/root/reference/cbits/array_conversion.c:68-149`), and NUMERIC.

_PG_EPOCH_DAYS = 10957  # days from 1970-01-01 to Postgres's 2000-01-01
_PG_EPOCH_US = 946_684_800_000_000  # µs from Unix epoch to 2000-01-01


def _bin_date_enc(v) -> bytes:
    import datetime

    return struct.pack("!i", (v - datetime.date(2000, 1, 1)).days)


def _bin_date_dec(b: bytes):
    import datetime

    return datetime.date(2000, 1, 1) + datetime.timedelta(
        days=struct.unpack("!i", b)[0]
    )


def _bin_ts_enc(v) -> bytes:
    import datetime

    delta = v - datetime.datetime(2000, 1, 1)
    us = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
    return struct.pack("!q", us)


def _bin_ts_dec(b: bytes):
    import datetime

    return datetime.datetime(2000, 1, 1) + datetime.timedelta(
        microseconds=struct.unpack("!q", b)[0]
    )


# Binary layouts for the round-6 scalar additions — all public
# PostgreSQL send() formats (and what postgresql-binary's *_int
# decoders, the reference's consumers, read): timestamptz = int64 µs
# since 2000-01-01 UTC; time = int64 µs since midnight; timetz =
# int64 µs + int32 zone seconds WEST of UTC; interval = int64 µs +
# int32 days + int32 months; uuid = 16 raw bytes.


def _bin_tstz_enc(v) -> bytes:
    import datetime

    if v.tzinfo is None:
        v = v.replace(tzinfo=datetime.timezone.utc)
    delta = v - datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc)
    us = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
    return struct.pack("!q", us)


def _bin_tstz_dec(b: bytes):
    import datetime

    return datetime.datetime(
        2000, 1, 1, tzinfo=datetime.timezone.utc
    ) + datetime.timedelta(microseconds=struct.unpack("!q", b)[0])


def _time_us(t) -> int:
    return (
        (t.hour * 60 + t.minute) * 60 + t.second
    ) * 1_000_000 + t.microsecond


def _us_time(us: int, tz=None):
    import datetime

    s, frac = divmod(us, 1_000_000)
    m, sec = divmod(s, 60)
    h, mi = divmod(m, 60)
    return datetime.time(h, mi, sec, frac, tzinfo=tz)


def _bin_time_enc(v) -> bytes:
    import datetime

    if isinstance(v, str):
        v = datetime.time.fromisoformat(v)
    return struct.pack("!q", _time_us(v))


def _bin_time_dec(b: bytes):
    return _us_time(struct.unpack("!q", b)[0])


def _bin_timetz_enc(v) -> bytes:
    import datetime

    t = datetime.time.fromisoformat(v) if isinstance(v, str) else v
    off = t.utcoffset()
    if off is None:
        raise ValueError(f"timetz value without offset: {v!r}")
    return struct.pack(
        "!qi",
        _time_us(t.replace(tzinfo=None)),
        -int(off.total_seconds()),  # wire carries seconds WEST of UTC
    )


def _bin_timetz_dec(b: bytes) -> str:
    import datetime

    us, west = struct.unpack("!qi", b)
    tz = datetime.timezone(datetime.timedelta(seconds=-west))
    return _timetz_canonical(_us_time(us, tz))  # same form as text path


def _bin_interval_enc(v) -> bytes:
    # timedelta carries no month component — (µs, days, months=0)
    return struct.pack(
        "!qii", v.seconds * 1_000_000 + v.microseconds, v.days, 0
    )


def _bin_interval_dec(b: bytes):
    import datetime

    us, days, months = struct.unpack("!qii", b)
    # months flatten at 30 days — postgresql-binary's DiffTime rule,
    # which is what the reference's FromRow DiffTime instance consumes
    return datetime.timedelta(days=days + 30 * months, microseconds=us)


def _bin_uuid_enc(v) -> bytes:
    return (v if isinstance(v, uuid.UUID) else uuid.UUID(str(v))).bytes


def _bin_uuid_dec(b: bytes) -> str:
    return str(uuid.UUID(bytes=bytes(b)))


# OID → (encode value→bytes, decode bytes→value) for binary COPY
_BIN_CODEC: dict[int, tuple[Callable[[Any], bytes], Callable[[bytes], Any]]] = {
    16: (lambda v: b"\x01" if v else b"\x00", lambda b: b == b"\x01"),
    17: (bytes, bytes),
    20: (lambda v: struct.pack("!q", v), lambda b: struct.unpack("!q", b)[0]),
    21: (lambda v: struct.pack("!h", v), lambda b: struct.unpack("!h", b)[0]),
    23: (lambda v: struct.pack("!i", v), lambda b: struct.unpack("!i", b)[0]),
    25: (lambda v: v.encode(), lambda b: b.decode()),
    700: (lambda v: struct.pack("!f", v), lambda b: struct.unpack("!f", b)[0]),
    701: (lambda v: struct.pack("!d", v), lambda b: struct.unpack("!d", b)[0]),
    1042: (lambda v: v.encode(), lambda b: b.decode()),
    1043: (lambda v: v.encode(), lambda b: b.decode()),
    1082: (_bin_date_enc, _bin_date_dec),
    1083: (_bin_time_enc, _bin_time_dec),
    1114: (_bin_ts_enc, _bin_ts_dec),
    1184: (_bin_tstz_enc, _bin_tstz_dec),
    1186: (_bin_interval_enc, _bin_interval_dec),
    1266: (_bin_timetz_enc, _bin_timetz_dec),
    2950: (_bin_uuid_enc, _bin_uuid_dec),
}


# -- array binary codec (OIDs 1007/1016/1021/1022) -----------------------
# Public array wire layout (PostgreSQL ``array_send``): int32 ndim,
# int32 hasnull flag, int32 element OID; per dimension {int32 length,
# int32 lower bound}; per element {int32 byte length | -1 for NULL,
# payload in the element type's send() format}.  The reference's
# defining data-plane trick is exactly this extraction
# (`/root/reference/cbits/array_conversion.c:68-149` walks the same
# layout; varlena handoff at `FromRow.hs:330-355`), including
# NULL-element COMPACTION on decode: a -1-length element is skipped,
# not surfaced — mirrored here (and in the text parser above) so both
# transports produce the same value.  1-D only, like the reference
# (its extractors return -1 for ndim != 1); an empty array is ndim=0
# with no dimension header, as the server sends it.

_ARRAY_ELEM_OID = {1007: 23, 1016: 20, 1021: 700, 1022: 701}


def _bin_array_enc(elem_oid: int) -> Callable[[Any], bytes]:
    enc = _BIN_CODEC[elem_oid][0]

    def encode(vals) -> bytes:
        if not vals:
            return struct.pack("!iii", 0, 0, elem_oid)
        hasnull = any(v is None for v in vals)
        out = bytearray(
            struct.pack("!iii", 1, 1 if hasnull else 0, elem_oid)
        )
        out += struct.pack("!ii", len(vals), 1)  # dim length, lower bound
        for v in vals:
            if v is None:
                out += struct.pack("!i", -1)
            else:
                p = enc(v)
                out += struct.pack("!i", len(p)) + p
        return bytes(out)

    return encode


def _bin_array_dec(elem_oid: int) -> Callable[[bytes], list]:
    dec = _BIN_CODEC[elem_oid][1]

    def decode(b: bytes) -> list:
        ndim, _hasnull, oid = struct.unpack_from("!iii", b, 0)
        if oid != elem_oid:
            raise ValueError(
                f"array element OID {oid}, expected {elem_oid}"
            )
        if ndim == 0:
            return []
        if ndim != 1:
            raise ValueError(f"only 1-D arrays supported, got ndim={ndim}")
        (n, _lb) = struct.unpack_from("!ii", b, 12)
        off = 20
        out: list = []
        for _ in range(n):
            (ln,) = struct.unpack_from("!i", b, off)
            off += 4
            if ln == -1:
                continue  # reference parity: NULL elements compacted
            out.append(dec(b[off : off + ln]))
            off += ln
        return out

    return decode


# -- NUMERIC binary codec (OID 1700) -------------------------------------
# Public layout (PostgreSQL ``numeric_send``): uint16 ndigits, int16
# weight, uint16 sign (0x0000 +, 0x4000 -, 0xC000 NaN), uint16 dscale,
# then ndigits uint16 base-10000 digit groups, most significant first.
# value = Σ digits[i] · 10000^(weight−i), rendered with dscale decimal
# places — so the codec is EXACT for any Decimal (no float transit).

_NUMERIC_POS, _NUMERIC_NEG, _NUMERIC_NAN = 0x0000, 0x4000, 0xC000

# NUMERIC can carry up to 131072 integral + 16383 fractional digits —
# far past the default 28-digit Decimal context, whose scaleb/quantize
# would silently round (or raise).  All codec arithmetic runs in a
# context wide enough for any wire value.
_NUM_CTX = Context(prec=150_000)


def _bin_numeric_enc(v) -> bytes:
    d = v if isinstance(v, Decimal) else Decimal(str(v))
    if d.is_nan():
        return struct.pack("!HhHH", 0, 0, _NUMERIC_NAN, 0)
    sign = _NUMERIC_NEG if d.is_signed() else _NUMERIC_POS
    # copy_abs is context-free: plain abs() rounds through the ambient
    # 28-digit context and silently truncates long mantissas
    t = d.copy_abs().as_tuple()
    mant = int("".join(map(str, t.digits)) or "0")
    exp = t.exponent
    dscale = max(0, -exp)
    if exp >= 0:
        mant *= 10**exp
        s4 = 0
    else:
        # pad the mantissa so the implied scale is a multiple of 4
        s4 = ((dscale + 3) // 4) * 4
        mant *= 10 ** (s4 - dscale)
    if mant == 0:
        return struct.pack("!HhHH", 0, 0, _NUMERIC_POS, dscale)
    groups: list[int] = []
    while mant:
        groups.append(mant % 10000)
        mant //= 10000
    groups.reverse()  # most significant first
    weight = len(groups) - 1 - s4 // 4
    while groups and groups[-1] == 0:  # trailing zero groups carry no value
        groups.pop()
    out = struct.pack("!HhHH", len(groups), weight, sign, dscale)
    return out + struct.pack(f"!{len(groups)}H", *groups)


def _bin_numeric_dec(b: bytes) -> Decimal:
    nd, weight, sign, dscale = struct.unpack_from("!HhHH", b, 0)
    if sign == _NUMERIC_NAN:
        return Decimal("NaN")
    digits = struct.unpack_from(f"!{nd}H", b, 8) if nd else ()
    val = 0
    for g in digits:
        val = val * 10000 + g
    dec = (
        Decimal(val).scaleb(4 * (weight - nd + 1), _NUM_CTX)
        if nd
        else Decimal(0)
    )
    if sign == _NUMERIC_NEG:
        dec = dec.copy_negate()  # context-free negation
    # Always quantize to dscale — Postgres renders NUMERIC at its
    # display scale (never exponent notation), so 1×10000¹ with
    # dscale 0 must come back as Decimal('10000'), not Decimal('1E+4').
    return dec.quantize(Decimal(1).scaleb(-dscale), context=_NUM_CTX)


_BIN_CODEC.update(
    {
        aoid: (_bin_array_enc(eoid), _bin_array_dec(eoid))
        for aoid, eoid in _ARRAY_ELEM_OID.items()
    }
)
_BIN_CODEC[1700] = (_bin_numeric_enc, _bin_numeric_dec)

_BIN_SIGNATURE = b"PGCOPY\n\xff\r\n\x00"


# -- COPY text-format codec (PostgreSQL COPY TO/FROM ... (FORMAT text)) --
# Fields are tab-separated, rows newline-terminated, NULL is \N, and the
# characters \ TAB LF CR are backslash-escaped (plus \b \f \v, which
# Postgres emits for the corresponding control bytes).

_COPY_ESC = {
    "\\": "\\\\",
    "\t": "\\t",
    "\n": "\\n",
    "\r": "\\r",
    "\b": "\\b",
    "\f": "\\f",
    "\v": "\\v",
}
_COPY_UNESC = {
    "\\": "\\",
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    "v": "\v",
}


def copy_escape(s: str) -> str:
    """Escape one field value for COPY text format."""
    if any(c in s for c in _COPY_ESC):
        return "".join(_COPY_ESC.get(c, c) for c in s)
    return s


def copy_unescape(s: str) -> str:
    """Invert :func:`copy_escape` (unknown escapes pass through literally,
    matching Postgres's COPY FROM behavior for e.g. ``\\q`` → ``q``)."""
    if "\\" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            out.append(_COPY_UNESC.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _copy_split_lines(buf: str) -> tuple[list[str], str]:
    """Split complete COPY rows off ``buf``; return (rows, remainder).

    A row boundary is an UNESCAPED newline — CopyData frames need not be
    row-aligned, and an escaped ``\\n`` inside a field must not split."""
    rows: list[str] = []
    start = 0
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c == "\\":
            i += 2
            continue
        if c == "\n":
            rows.append(buf[start:i])
            start = i + 1
        i += 1
    return rows, buf[start:]


def _endpoint_cb_data(cert_der: bytes) -> bytes:
    """RFC 5929 tls-server-end-point: hash the server certificate with
    its own signature-hash algorithm, except MD5/SHA-1 upgrade to
    SHA-256.  Falls back to SHA-256 (the ubiquitous case) if the
    certificate parser is unavailable."""
    algo = "sha256"
    try:
        from cryptography import x509 as _x509  # public PyCA library

        sig = _x509.load_der_x509_certificate(cert_der).signature_hash_algorithm
        name = getattr(sig, "name", "sha256").lower()
        if name not in ("md5", "sha1"):
            algo = name
    except Exception:
        pass
    return hashlib.new(algo, cert_der).digest()


class _ScramClient:
    """SCRAM-SHA-256 client side (RFC 5802 framing, RFC 7677 hash
    parameters) — the auth method every supported Postgres defaults to
    (``password_encryption = scram-sha-256``).

    The exchange is mutual: beyond proving the password to the server,
    :meth:`verify_final` checks the server's signature, so a spoofed
    server that blindly ACCEPTS the password is still rejected — the
    property plain cleartext/MD5 auth cannot give.  Channel binding is
    declined (gs2 header ``n,,``): there is no TLS channel to bind in
    scope.  The password is used as UTF-8 (SASLprep normalization
    omitted — matches libpq's fallback behavior for passwords that are
    already normalized, which ASCII passwords always are).
    """

    def __init__(
        self,
        password: str,
        nonce: str | None = None,
        cbind_data: bytes | None = None,
        gs2: str | None = None,
    ):
        """``gs2`` selects the RFC 5802 channel-binding flag:
        ``n,,`` (client cannot bind — no TLS), ``y,,`` (client CAN bind
        but the server only offered the non-PLUS mechanism — lets the
        server detect a downgrade), or ``p=tls-server-end-point,,``
        with ``cbind_data`` = the RFC 5929 certificate hash."""
        self._password = password.encode()
        self.client_nonce = nonce or base64.b64encode(os.urandom(18)).decode()
        self.client_first_bare = f"n=,r={self.client_nonce}"
        self.gs2 = gs2 if gs2 is not None else "n,,"
        self._cbind = (cbind_data or b"") if self.gs2.startswith("p=") else b""
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> bytes:
        return self.gs2.encode() + self.client_first_bare.encode()

    def client_final(self, server_first: bytes) -> bytes:
        """Digest server-first (``r=…,s=…,i=…``) → client-final with proof."""
        attrs = dict(
            kv.split("=", 1) for kv in server_first.decode().split(",")
        )
        nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not nonce.startswith(self.client_nonce):
            # RFC 5802: the combined nonce MUST extend ours — anything
            # else is a replayed/spliced exchange.
            raise QueryError("SCRAM server nonce does not extend client nonce", "<startup>")
        self._salted = hashlib.pbkdf2_hmac(
            "sha256", self._password, base64.b64decode(salt_b64), iters
        )
        client_key = hmac.new(self._salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        # c = base64(gs2-header ‖ cbind-data): "biws" is the no-binding
        # special case b64("n,,"); with tls-server-end-point the cert
        # hash rides inside, so a MITM terminating TLS with its own cert
        # breaks the proof.
        c_attr = base64.b64encode(self.gs2.encode() + self._cbind).decode()
        without_proof = f"c={c_attr},r={nonce}"
        self._auth_message = ",".join(
            (self.client_first_bare, server_first.decode(), without_proof)
        ).encode()
        client_sig = hmac.new(stored_key, self._auth_message, hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        return f"{without_proof},p={base64.b64encode(proof).decode()}".encode()

    def verify_final(self, server_final: bytes) -> None:
        """Check the server's ``v=`` signature (mutual authentication)."""
        attrs = dict(
            kv.split("=", 1) for kv in server_final.decode().split(",")
        )
        if "e" in attrs:
            raise QueryError(f"SCRAM server error: {attrs['e']}", "<startup>")
        server_key = hmac.new(self._salted, b"Server Key", hashlib.sha256).digest()
        expect = hmac.new(server_key, self._auth_message, hashlib.sha256).digest()
        got = base64.b64decode(attrs.get("v", ""))
        if not hmac.compare_digest(expect, got):
            raise QueryError(
                "SCRAM server signature mismatch — server does not know "
                "the password (possible spoofed endpoint)",
                "<startup>",
            )


class PgWireClient:
    """Minimal v3-protocol client: startup → auth → simple queries."""

    _SSLMODES = ("disable", "allow", "prefer", "require", "verify-ca",
                 "verify-full")

    def __init__(self, settings: ConnSettings, timeout: float = 30.0):
        self.settings = settings
        self.txn_status = b"I"  # last ReadyForQuery backend status
        if settings.sslmode not in self._SSLMODES:
            raise QueryError(
                f"unknown sslmode {settings.sslmode!r} "
                f"(expected one of {', '.join(self._SSLMODES)})",
                "<startup>",
            )
        # libpq's negotiation ladder: each entry is one CONNECTION
        # attempt (TLS yes/no); a failed attempt falls through to the
        # next rung on a fresh socket.
        #   allow  — plaintext first; if the server rejects the startup
        #            (pg_hba "SSL off" entry), retry encrypted;
        #   prefer — encrypted first; a server without TLS answers the
        #            SSLRequest with 'N' and the SAME connection
        #            continues plaintext (no reconnect — see
        #            _tls_upgrade); only a failed TLS handshake falls
        #            back to a fresh plaintext attempt.
        attempts = {
            "disable": (False,),
            "allow": (False, True),
            "prefer": (True, False),
        }.get(settings.sslmode, (True,))
        for i, use_tls in enumerate(attempts):
            self._sock = socket.create_connection(
                (settings.host, settings.port), timeout=timeout
            )
            self._buf = b""
            self._cb_data = None
            try:
                if use_tls:
                    self._tls_upgrade()
                self._startup()
                return
            except QueryError:
                try:
                    self._sock.close()
                except OSError:
                    pass
                if i == len(attempts) - 1:
                    raise

    def _tls_upgrade(self) -> None:
        """SSLRequest dance: 8-byte magic, one-byte answer, then the TLS
        handshake runs on the same socket and the v3 startup follows
        INSIDE the tunnel.  Also captures the RFC 5929
        tls-server-end-point channel-binding data (server cert hashed by
        its signature-hash algorithm) for SCRAM-SHA-256-PLUS."""
        import ssl

        self._send(struct.pack("!ii", 8, 80877103))  # SSLRequest
        answer = self._recv_exact(1)
        if answer != b"S":
            if self.settings.sslmode in ("prefer", "allow"):
                # libpq: an 'N' answer leaves the stream clean (the
                # server is waiting for a startup message), so the
                # opportunistic modes continue PLAINTEXT on the same
                # connection — no reconnect
                return
            raise QueryError(
                f"server refused TLS (sslmode={self.settings.sslmode})",
                "<startup>",
            )
        mode = self.settings.sslmode
        rootcert = self.settings.sslrootcert
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        if mode == "verify-full":
            if not rootcert:
                raise QueryError(
                    "sslmode=verify-full requires sslrootcert", "<startup>"
                )
            ctx.load_verify_locations(rootcert)  # chain + hostname check
        elif mode == "verify-ca" or (mode == "require" and rootcert):
            # chain check, NO hostname check.  require+sslrootcert is
            # promoted to verify-ca exactly as libpq documents (a root
            # cert you bothered to pin should be checked).
            if not rootcert:
                raise QueryError(
                    "sslmode=verify-ca requires sslrootcert", "<startup>"
                )
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_REQUIRED
            ctx.load_verify_locations(rootcert)
        else:  # require without rootcert / prefer / allow: encrypt only
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        try:
            self._sock = ctx.wrap_socket(
                self._sock, server_hostname=self.settings.host
            )
        except ssl.SSLError as e:
            raise QueryError(f"TLS handshake failed: {e}", "<startup>") from e
        der = self._sock.getpeercert(binary_form=True)
        if der:
            self._cb_data = _endpoint_cb_data(der)

    # -- wire primitives -------------------------------------------------

    def _send(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise QueryError("server closed connection", "<wire>")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        tag = self._recv_exact(1)
        (length,) = struct.unpack("!i", self._recv_exact(4))
        payload = self._recv_exact(length - 4)
        if tag == b"Z" and payload:
            # ReadyForQuery carries the backend transaction status:
            # b"I" idle / b"T" in-transaction / b"E" failed-transaction.
            # Tracked so the connection pool can refuse to cache a
            # connection abandoned mid-transaction (the next borrower
            # would silently inherit its BEGIN).
            self.txn_status = payload[:1]
        return tag, payload

    # -- session ----------------------------------------------------------

    def _startup(self) -> None:
        s = self.settings
        params = f"user\x00{s.user}\x00database\x00{s.dbname}\x00\x00".encode()
        body = struct.pack("!i", 196608) + params  # protocol 3.0
        self._send(struct.pack("!i", len(body) + 4) + body)
        scram: _ScramClient | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"R":
                (auth,) = struct.unpack_from("!i", payload)
                if auth == 0:  # AuthenticationOk
                    continue
                if auth == 3:  # cleartext password
                    pw = (self.settings.password or "").encode() + b"\x00"
                    self._send(b"p" + struct.pack("!i", len(pw) + 4) + pw)
                    continue
                if auth == 5:  # MD5: md5(md5(password + user) + salt)
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        (self.settings.password or "").encode()
                        + s.user.encode()
                    ).hexdigest()
                    digest = hashlib.md5(inner.encode() + salt).hexdigest()
                    pw = b"md5" + digest.encode() + b"\x00"
                    self._send(b"p" + struct.pack("!i", len(pw) + 4) + pw)
                    continue
                if auth == 10:  # AuthenticationSASL: mechanism list
                    mechs = [
                        m.decode()
                        for m in payload[4:].split(b"\x00")
                        if m
                    ]
                    if self._cb_data is not None and "SCRAM-SHA-256-PLUS" in mechs:
                        # TLS is up → bind the auth to this very channel
                        mech = "SCRAM-SHA-256-PLUS"
                        scram = _ScramClient(
                            self.settings.password or "",
                            cbind_data=self._cb_data,
                            gs2="p=tls-server-end-point,,",
                        )
                    elif "SCRAM-SHA-256" in mechs:
                        # gs2 "y,," when we COULD have bound but the
                        # server didn't offer -PLUS: a genuine server
                        # that does support it will detect the
                        # downgrade and fail the exchange (RFC 5802).
                        gs2 = "y,," if self._cb_data is not None else "n,,"
                        mech = "SCRAM-SHA-256"
                        scram = _ScramClient(
                            self.settings.password or "", gs2=gs2
                        )
                    else:
                        raise QueryError(
                            "no supported SASL mechanism offered "
                            f"(server offers {mechs}; client supports "
                            "SCRAM-SHA-256[-PLUS])",
                            "<startup>",
                        )
                    first = scram.client_first()
                    resp = (
                        mech.encode() + b"\x00"
                        + struct.pack("!i", len(first))
                        + first
                    )
                    self._send(b"p" + struct.pack("!i", len(resp) + 4) + resp)
                    continue
                if auth == 11:  # AuthenticationSASLContinue
                    assert scram is not None
                    final = scram.client_final(payload[4:])
                    self._send(b"p" + struct.pack("!i", len(final) + 4) + final)
                    continue
                if auth == 12:  # AuthenticationSASLFinal
                    assert scram is not None
                    scram.verify_final(payload[4:])  # mutual-auth check
                    continue
                raise QueryError(f"unsupported auth method {auth}", "<startup>")
            if tag == b"E":
                raise QueryError(self._error_text(payload), "<startup>")
            if tag == b"Z":  # ReadyForQuery
                return
            # 'S' ParameterStatus / 'K' BackendKeyData: informational

    @staticmethod
    def _error_text(payload: bytes) -> str:
        parts = {}
        for field in payload.split(b"\x00"):
            if len(field) > 1:
                parts[chr(field[0])] = field[1:].decode("utf-8", "replace")
        return parts.get("M", "unknown server error")

    # -- queries ----------------------------------------------------------

    def simple_query(
        self, sql: str
    ) -> tuple[list[tuple[str, int]], list[tuple[Any, ...]]]:
        """Run one simple-protocol query; return ([(name, oid)], rows)."""
        q = sql.encode() + b"\x00"
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        fields: list[tuple[str, int]] = []
        decoders: list[Callable[[str], Any]] = []
        rows: list[tuple[Any, ...]] = []
        error: str | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"T":  # RowDescription
                (nfields,) = struct.unpack_from("!h", payload)
                off = 2
                fields, decoders = [], []
                for _ in range(nfields):
                    end = payload.index(b"\x00", off)
                    name = payload[off:end].decode()
                    off = end + 1
                    _tbl, _att, oid, _len, _mod, _fmt = struct.unpack_from(
                        "!ihihih", payload, off
                    )
                    off += 18
                    fields.append((name, oid))
                    decoders.append(_OID_DECODE.get(oid, (str, "string"))[0])
            elif tag == b"D":  # DataRow
                (ncols,) = struct.unpack_from("!h", payload)
                off = 2
                vals: list[Any] = []
                for i in range(ncols):
                    (vlen,) = struct.unpack_from("!i", payload, off)
                    off += 4
                    if vlen == -1:
                        vals.append(None)
                    else:
                        vals.append(decoders[i](payload[off : off + vlen].decode()))
                        off += vlen
                rows.append(tuple(vals))
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":  # ReadyForQuery — statement finished
                if error is not None:
                    raise QueryError(error, sql)
                return fields, rows
            # 'C' CommandComplete / 'N' NoticeResponse: informational

    def stream_query(
        self, sql: str, batch_size: int = 1000
    ) -> Iterator[tuple[list[tuple[str, int]], list[tuple[Any, ...]]]]:
        """Cursor-batched streaming read — the reference library's core
        delivery shape (`/root/reference/src/Database/PostgreSQL/Stream.hs:244-284`):
        open a transaction, ``DECLARE <uuid-name> NO SCROLL CURSOR FOR
        <sql>``, loop ``FETCH FORWARD <batch_size>`` yielding each batch
        until an empty fetch, then COMMIT; any error (or an abandoned
        generator) ROLLBACKs before propagating.

        Yields ``(fields, rows)`` per batch; peak client memory is one
        batch, and the server never materializes the full result for a
        real Postgres (the portal streams from the executor).
        """
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        name = "cursor" + uuid.uuid4().hex
        self.simple_query("BEGIN")
        try:
            self.simple_query(f'DECLARE "{name}" NO SCROLL CURSOR FOR {sql}')
            while True:
                fields, rows = self.simple_query(
                    f'FETCH FORWARD {int(batch_size)} FROM "{name}"'
                )
                if not rows:
                    break
                yield fields, rows
        except BaseException:
            # mirrors the reference's tryC/rollback: the transaction (and
            # with it the cursor) must not outlive a failed stream
            try:
                self.simple_query("ROLLBACK")
            except Exception:
                pass  # connection may be unusable; surface the original
            raise
        else:
            self.simple_query(f'CLOSE "{name}"')
            self.simple_query("COMMIT")

    # -- COPY sub-protocol (text format) ----------------------------------

    def copy_out(self, source_sql: str) -> Iterator[list[str | None]]:
        """``COPY (<query>|table) TO STDOUT`` — yield rows as lists of
        text fields (``None`` for SQL NULL), decoded from the COPY text
        format.  The bulk-extract path: one streaming response, no
        RowDescription/DataRow per-row framing, no result-set
        materialization on the client.

        Consume the iterator fully (or ``close()`` the client): unlike
        :meth:`stream_query` there is no server-side cursor to cancel —
        an abandoned generator leaves unread CopyData frames on the
        socket, and the next command would misparse them.
        """
        q = f"COPY {source_sql} TO STDOUT".encode() + b"\x00"
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        pending = ""
        error: str | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"H":  # CopyOutResponse
                fmt = payload[0]
                if fmt != 0:
                    error = f"binary COPY not supported (format {fmt})"
            elif tag == b"d":  # CopyData
                if error is None:
                    pending += payload.decode()
                    rows, pending = _copy_split_lines(pending)
                    for line in rows:
                        yield [
                            None if f == "\\N" else copy_unescape(f)
                            for f in line.split("\t")
                        ]
            elif tag == b"c":  # CopyDone
                if pending.strip("\r"):
                    error = error or f"unterminated COPY row: {pending!r}"
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                if error is not None:
                    raise QueryError(error, f"COPY {source_sql} TO STDOUT")
                return
            # 'C' CommandComplete / 'N' Notice: informational

    def copy_in(
        self,
        table: str,
        columns: Sequence[str],
        rows: Iterator[Sequence[str | None]],
        flush_bytes: int = 65536,
    ) -> int:
        """``COPY table (cols) FROM STDIN`` — stream text-format rows in
        ``flush_bytes``-sized CopyData frames, then CopyDone.  Fields are
        pre-rendered text (``None`` → ``\\N``); the server casts to the
        column types.  Returns the number of rows sent.  On any send
        failure a CopyFail is attempted so the server aborts the load
        rather than committing a prefix.
        """
        collist = ", ".join(columns)
        q = f"COPY {table} ({collist}) FROM STDIN".encode() + b"\x00"
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        # wait for CopyInResponse (or an immediate error, e.g. bad table)
        error: str | None = None
        started = False
        while not started:
            tag, payload = self._read_message()
            if tag == b"G":
                if payload[0] != 0:
                    raise QueryError("binary COPY not supported", table)
                started = True
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                raise QueryError(error or "COPY refused", f"COPY {table} FROM STDIN")

        n = 0
        buf: list[str] = []
        size = 0

        def flush() -> None:
            nonlocal size
            if buf:
                data = "".join(buf).encode()
                self._send(b"d" + struct.pack("!i", len(data) + 4) + data)
                buf.clear()
                size = 0

        try:
            for row in rows:
                line = (
                    "\t".join("\\N" if f is None else copy_escape(f) for f in row)
                    + "\n"
                )
                buf.append(line)
                size += len(line)
                n += 1
                if size >= flush_bytes:
                    flush()
            flush()
        except BaseException:
            try:  # tell the server to abort the load
                msg = b"aborted by client\x00"
                self._send(b"f" + struct.pack("!i", len(msg) + 4) + msg)
            except Exception:
                pass
            raise
        self._send(b"c" + struct.pack("!i", 4))  # CopyDone
        while True:
            tag, payload = self._read_message()
            if tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                if error is not None:
                    raise QueryError(error, f"COPY {table} FROM STDIN")
                return n

    # -- extended query protocol (binary result format) -------------------

    def prepare(self, sql: str, name: str | None = None) -> "PreparedStatement":
        """Parse + Describe a ``$n``-parameterized statement; returns a
        :class:`PreparedStatement` whose ``execute`` fetches results in
        BINARY format wherever a codec exists.

        This is the reference's actual result data plane
        (`/root/reference/src/Database/PostgreSQL/Stream.hs:97` runs
        every query with ``PQ.Binary``; `FromRow.hs:127-324` decodes the
        binary representations) — typed values arrive in fixed-width
        network form with no text parse, and repeated executions skip
        re-planning.  Columns without a binary codec (NUMERIC, arrays)
        fall back to text format PER COLUMN via Bind's result-format
        list, so mixed rows still work.
        """
        name = name or "ps" + uuid.uuid4().hex[:16]
        n = name.encode()
        body = n + b"\x00" + sql.encode() + b"\x00" + struct.pack("!h", 0)
        self._send(b"P" + struct.pack("!i", len(body) + 4) + body)
        d = b"S" + n + b"\x00"
        self._send(b"D" + struct.pack("!i", len(d) + 4) + d)
        self._send(b"S" + struct.pack("!i", 4))  # Sync
        fields: list[tuple[str, int]] = []
        error: str | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"T":  # RowDescription
                (nf,) = struct.unpack_from("!h", payload)
                off = 2
                for _ in range(nf):
                    end = payload.index(b"\x00", off)
                    fname = payload[off:end].decode()
                    off = end + 1
                    _t, _a, oid, _l, _m, _f = struct.unpack_from(
                        "!ihihih", payload, off
                    )
                    off += 18
                    fields.append((fname, oid))
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                if error is not None:
                    raise QueryError(error, sql)
                return PreparedStatement(self, name, sql, fields)
            # '1' ParseComplete / 't' ParameterDescription /
            # 'n' NoData: informational

    # -- COPY sub-protocol (binary format) --------------------------------

    def probe_oids(self, source_sql: str) -> list[tuple[str, int]]:
        """Column (name, OID) list for a table or ``(query)`` source via a
        LIMIT 0 round-trip — binary COPY carries no RowDescription, so
        the caller needs the OIDs to pick decoders."""
        inner = source_sql.strip()
        sql = (
            f"SELECT * FROM {inner} LIMIT 0"
            if not inner.startswith("(")
            else f"SELECT * FROM {inner} AS __probe LIMIT 0"
        )
        fields, _ = self.simple_query(sql)
        return fields

    def copy_out_binary(
        self, source_sql: str, oids: Sequence[int] | None = None
    ) -> Iterator[tuple[Any, ...]]:
        """``COPY ... TO STDOUT (FORMAT binary)`` — yield TYPED rows.

        Unlike the text path there is no repr round-trip: int/float/
        date/timestamp fields arrive in their fixed-width network
        representations and decode exactly.  ``oids`` gives the per-
        column type OIDs; omitted, a LIMIT 0 probe fetches them.
        CopyData frames need not align with tuples — a rolling buffer
        reassembles across frames, exactly like the text path.
        """
        if oids is None:
            oids = [oid for _, oid in self.probe_oids(source_sql)]
        decs = []
        for oid in oids:
            if oid not in _BIN_CODEC:
                raise QueryError(
                    f"no binary codec for OID {oid} — use the text path",
                    f"COPY {source_sql} TO STDOUT (FORMAT binary)",
                )
            decs.append(_BIN_CODEC[oid][1])
        q = f"COPY {source_sql} TO STDOUT (FORMAT binary)".encode() + b"\x00"
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        buf = bytearray()
        error: str | None = None
        header_done = False
        trailer_seen = False
        while True:
            tag, payload = self._read_message()
            if tag == b"H":
                if payload[0] != 1:
                    error = f"server answered format {payload[0]}, wanted binary"
            elif tag == b"d" and error is None:
                buf += payload
                if not header_done:
                    if len(buf) < 19:
                        continue
                    if bytes(buf[:11]) != _BIN_SIGNATURE:
                        error = "bad binary COPY signature"
                        continue
                    (ext,) = struct.unpack_from("!i", buf, 15)
                    if len(buf) < 19 + ext:
                        continue
                    del buf[: 19 + ext]
                    header_done = True
                # parse complete tuples off the buffer
                while not trailer_seen:
                    if len(buf) < 2:
                        break
                    (nf,) = struct.unpack_from("!h", buf, 0)
                    if nf == -1:
                        trailer_seen = True
                        del buf[:2]
                        break
                    off = 2
                    vals: list[Any] = []
                    complete = True
                    for i in range(nf):
                        if len(buf) < off + 4:
                            complete = False
                            break
                        (flen,) = struct.unpack_from("!i", buf, off)
                        off += 4
                        if flen == -1:
                            vals.append(None)
                            continue
                        if len(buf) < off + flen:
                            complete = False
                            break
                        vals.append(decs[i](bytes(buf[off : off + flen])))
                        off += flen
                    if not complete:
                        break
                    del buf[:off]
                    yield tuple(vals)
            elif tag == b"c":
                if error is None and (not header_done or not trailer_seen or buf):
                    error = "truncated binary COPY stream"
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                if error is not None:
                    raise QueryError(
                        error, f"COPY {source_sql} TO STDOUT (FORMAT binary)"
                    )
                return

    def copy_in_binary(
        self,
        table: str,
        columns: Sequence[str],
        rows: Iterator[Sequence[Any]],
        oids: Sequence[int] | None = None,
        flush_bytes: int = 65536,
    ) -> int:
        """``COPY table (cols) FROM STDIN (FORMAT binary)`` — stream TYPED
        rows (no text rendering, no escaping hazard).  ``oids`` may be
        omitted: a LIMIT 0 probe on the target columns supplies them.
        Returns rows sent; CopyFail on any mid-stream error so the server
        aborts rather than committing a prefix.
        """
        if oids is None:
            probed = self.simple_query(
                f"SELECT {', '.join(columns)} FROM {table} LIMIT 0"
            )[0]
            oids = [oid for _, oid in probed]
        encs = []
        for oid in oids:
            if oid not in _BIN_CODEC:
                raise QueryError(
                    f"no binary codec for OID {oid} — use the text path", table
                )
            encs.append(_BIN_CODEC[oid][0])
        collist = ", ".join(columns)
        q = (
            f"COPY {table} ({collist}) FROM STDIN (FORMAT binary)".encode()
            + b"\x00"
        )
        self._send(b"Q" + struct.pack("!i", len(q) + 4) + q)
        error: str | None = None
        started = False
        while not started:
            tag, payload = self._read_message()
            if tag == b"G":
                if payload[0] != 1:
                    raise QueryError(
                        f"server answered format {payload[0]}, wanted binary",
                        table,
                    )
                started = True
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                raise QueryError(
                    error or "COPY refused",
                    f"COPY {table} FROM STDIN (FORMAT binary)",
                )

        n = 0
        out = bytearray(_BIN_SIGNATURE + struct.pack("!ii", 0, 0))

        def flush() -> None:
            if out:
                self._send(
                    b"d" + struct.pack("!i", len(out) + 4) + bytes(out)
                )
                out.clear()

        try:
            for row in rows:
                out += struct.pack("!h", len(row))
                for enc, v in zip(encs, row):
                    if v is None:
                        out += struct.pack("!i", -1)
                    else:
                        b = enc(v)
                        out += struct.pack("!i", len(b)) + b
                n += 1
                if len(out) >= flush_bytes:
                    flush()
            out += struct.pack("!h", -1)  # trailer
            flush()
        except BaseException:
            try:
                msg = b"aborted by client\x00"
                self._send(b"f" + struct.pack("!i", len(msg) + 4) + msg)
            except Exception:
                pass
            raise
        self._send(b"c" + struct.pack("!i", 4))  # CopyDone
        while True:
            tag, payload = self._read_message()
            if tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                if error is not None:
                    raise QueryError(
                        error, f"COPY {table} FROM STDIN (FORMAT binary)"
                    )
                return n

    def close(self) -> None:
        try:
            self._send(b"X" + struct.pack("!i", 4))
        finally:
            self._sock.close()

    def __enter__(self) -> "PgWireClient":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


# ---------------------------------------------------------------------
# Per-process connection pool (reference parity: the striped pool with
# keepalive in `/root/reference/src/Database/PostgreSQL/Stream/Connection.hs:29-47`
# — PoolSettings{stripes, keepalive, affinity}).  Spark shape: the pool
# is PER PYTHON WORKER PROCESS (module state), and Spark reuses worker
# processes across tasks (`spark.python.worker.reuse`, default on), so
# repeated micro-batch sinks and many-small-slice partitioned reads stop
# paying full startup+auth per slice — SCRAM is 2 extra round-trips and
# a PBKDF2 on every connect, the dominant cost of a small fetch.
#
# Semantics:
# * checkout pops a cached idle connection for identical ConnSettings;
#   entries idle past ``keepalive`` seconds are closed at checkout/
#   return time (lazy reaping — no timer thread in executor workers);
# * return caches the connection ONLY if the protocol ended clean: no
#   exception in the ``with`` body and the last ReadyForQuery reported
#   idle (``txn_status == b"I"``) — a connection abandoned inside BEGIN
#   or mid-COPY is closed, never recycled;
# * at most ``stripes`` idle connections are retained per settings key
#   (the reference's stripe count bounds resident sockets the same way);
# * no liveness ping on reuse: a server that dropped the socket during
#   the idle window surfaces as the same mid-query error a fresh
#   connection's mid-query drop would — callers' retry story is
#   unchanged, and reads stay one round-trip.
# ---------------------------------------------------------------------

_POOL_LOCK = threading.Lock()
_POOL: dict[tuple, list[tuple[PgWireClient, float]]] = {}
POOL_STRIPES = int(os.environ.get("SPARK_GRAFT_PGWIRE_STRIPES", "2"))
POOL_KEEPALIVE = float(os.environ.get("SPARK_GRAFT_PGWIRE_KEEPALIVE", "60"))


def _pool_key(settings: ConnSettings) -> tuple:
    return (
        settings.host, settings.port, settings.dbname, settings.user,
        settings.password, settings.sslmode, settings.sslrootcert,
    )


def _close_quietly(client: PgWireClient) -> None:
    try:
        client.close()
    except Exception:  # noqa: BLE001 — already-dead socket on Terminate
        pass


def pooled_connection(settings: ConnSettings, timeout: float = 30.0):
    """Context manager lending a :class:`PgWireClient` from the
    per-process pool (opening one on miss) and recycling it on clean
    exit.  Set ``SPARK_GRAFT_PGWIRE_STRIPES=0`` to disable pooling
    (every checkout opens, every return closes — the pre-pool shape)."""
    import contextlib
    import time as _time

    @contextlib.contextmanager
    def _ctx():
        key = _pool_key(settings)
        client: PgWireClient | None = None
        if POOL_STRIPES > 0:
            with _POOL_LOCK:
                bucket = _POOL.get(key, [])
                now = _time.monotonic()
                while bucket:
                    cand, last = bucket.pop()
                    if now - last <= POOL_KEEPALIVE:
                        client = cand
                        break
                    _close_quietly(cand)
                if not bucket and key in _POOL:
                    del _POOL[key]
                elif bucket:
                    _POOL[key] = bucket
        if client is None:
            client = PgWireClient(settings, timeout=timeout)
        try:
            yield client
        except BaseException:
            _close_quietly(client)
            raise
        if POOL_STRIPES <= 0 or client.txn_status != b"I":
            _close_quietly(client)
            return
        stale: list[PgWireClient] = []
        with _POOL_LOCK:
            bucket = _POOL.setdefault(key, [])
            now = _time.monotonic()
            keep: list[tuple[PgWireClient, float]] = []
            for c, t in bucket:
                if now - t <= POOL_KEEPALIVE:
                    keep.append((c, t))
                else:
                    stale.append(c)
            if len(keep) < POOL_STRIPES:
                keep.append((client, now))
            else:
                stale.append(client)
            _POOL[key] = keep
        for c in stale:
            _close_quietly(c)

    return _ctx()


def close_pool() -> None:
    """Close and forget every pooled connection (tests; worker exit is
    fine without it — the OS reaps sockets with the process)."""
    with _POOL_LOCK:
        for bucket in _POOL.values():
            for client, _t in bucket:
                _close_quietly(client)
        _POOL.clear()


def pool_stats() -> dict[str, int]:
    with _POOL_LOCK:
        return {
            "keys": len(_POOL),
            "idle": sum(len(b) for b in _POOL.values()),
        }


def _param_text(v: Any) -> bytes | None:
    """Render one parameter in text format for Bind (the server casts)."""
    import datetime

    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, (bytes, bytearray)):
        return b"\\x" + bytes(v).hex().encode()
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat().encode()
    return str(v).encode()


class PreparedStatement:
    """A Parse'd statement; ``execute`` Binds + fetches with per-column
    BINARY result format (text fallback where no codec exists)."""

    def __init__(
        self,
        client: PgWireClient,
        name: str,
        sql: str,
        fields: list[tuple[str, int]],
    ):
        self.client = client
        self.name = name
        self.sql = sql
        self.fields = fields
        # per-column result format: 1 (binary) where a codec exists
        self.formats = [
            1 if oid in _BIN_CODEC else 0 for _, oid in fields
        ]
        self._dec = [
            _BIN_CODEC[oid][1]
            if oid in _BIN_CODEC
            else _OID_DECODE.get(oid, (str, "string"))[0]
            for _, oid in fields
        ]

    def execute(self, params: Sequence[Any] = ()) -> list[tuple[Any, ...]]:
        c = self.client
        # Bind: unnamed portal, our statement, text-format params,
        # per-column result formats
        body = b"\x00" + self.name.encode() + b"\x00"
        body += struct.pack("!hh", 1, 0)  # all params text format
        body += struct.pack("!h", len(params))
        for p in params:
            t = _param_text(p)
            if t is None:
                body += struct.pack("!i", -1)
            else:
                body += struct.pack("!i", len(t)) + t
        body += struct.pack("!h", len(self.formats))
        for f in self.formats:
            body += struct.pack("!h", f)
        c._send(b"B" + struct.pack("!i", len(body) + 4) + body)
        e = b"\x00" + struct.pack("!i", 0)  # unnamed portal, no row cap
        c._send(b"E" + struct.pack("!i", len(e) + 4) + e)
        c._send(b"S" + struct.pack("!i", 4))  # Sync
        rows: list[tuple[Any, ...]] = []
        error: str | None = None
        while True:
            tag, payload = c._read_message()
            if tag == b"D":
                (ncols,) = struct.unpack_from("!h", payload)
                off = 2
                vals: list[Any] = []
                for i in range(ncols):
                    (vlen,) = struct.unpack_from("!i", payload, off)
                    off += 4
                    if vlen == -1:
                        vals.append(None)
                        continue
                    raw = payload[off : off + vlen]
                    off += vlen
                    if self.formats[i] == 1:
                        vals.append(self._dec[i](raw))
                    else:
                        vals.append(self._dec[i](raw.decode()))
                rows.append(tuple(vals))
            elif tag == b"E":
                error = c._error_text(payload)
            elif tag == b"Z":
                if error is not None:
                    raise QueryError(error, self.sql)
                return rows
            # '2' BindComplete / 'C' CommandComplete: informational

    def close(self) -> None:
        c = self.client
        body = b"S" + self.name.encode() + b"\x00"
        c._send(b"C" + struct.pack("!i", len(body) + 4) + body)
        c._send(b"S" + struct.pack("!i", 4))
        while True:
            tag, _ = c._read_message()
            if tag == b"Z":
                return


def _spark_schema(fields: Sequence[tuple[str, int]]) -> str:
    return ", ".join(
        f"{name} {_OID_DECODE.get(oid, (str, 'string'))[1]}" for name, oid in fields
    )


def read_table(spark, settings: ConnSettings, sql: str):
    """Driver-side fetch of one query → DataFrame (schema from OIDs).

    Bounded by driver memory — use for dimension-table-sized reads; bulk
    extraction belongs to ``read_partitioned``.
    """
    with pooled_connection(settings) as c:
        fields, rows = c.simple_query(sql)
    return spark.createDataFrame(rows, _spark_schema(fields))


def read_partitioned(
    spark,
    settings: ConnSettings,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    columns: str = "*",
    via_copy: bool = False,
):
    """Parallel key-range read: one connection per Spark task.

    Slices ``[lower_bound, upper_bound]`` into ``num_partitions``
    half-open ranges on ``partition_column`` (Spark-JDBC semantics: first
    slice unbounded below, last unbounded above, so rows outside the
    stated bounds are not lost).  Schema comes from a LIMIT 0 driver
    probe; each executor task then opens its own wire connection and
    fetches exactly one slice.

    ``via_copy=True`` streams each slice through ``COPY (…) TO STDOUT``
    instead of a row-set query — no per-row DataRow framing, constant
    client memory per CopyData frame; field text is decoded by the same
    OID decoders, so the result is value-identical to the default path.
    """
    import pandas as pd

    with pooled_connection(settings) as c:
        fields, _ = c.simple_query(f"SELECT {columns} FROM {table} LIMIT 0")
    schema = _spark_schema(fields)
    names = [n for n, _ in fields]
    oids = [oid for _, oid in fields]

    span = max(upper_bound - lower_bound, 1)
    step = span / num_partitions
    bounds = []
    for i in range(num_partitions):
        lo = None if i == 0 else int(lower_bound + round(i * step))
        hi = None if i == num_partitions - 1 else int(lower_bound + round((i + 1) * step))
        bounds.append((i, lo, hi))
    bdf = spark.createDataFrame(bounds, "pid int, lo bigint, hi bigint").repartition(
        num_partitions, "pid"
    )

    # rebuild from a plain tuple executor-side (keeps the closure free
    # of driver-session objects; carries sslmode/sslrootcert too)
    s_args = (
        settings.host, settings.dbname, settings.user,
        settings.password, settings.port, settings.sslmode,
        settings.sslrootcert,
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, brow in pdf.iterrows():
                preds = []
                if not pd.isna(brow.lo):
                    preds.append(f"{partition_column} >= {int(brow.lo)}")
                if not pd.isna(brow.hi):
                    preds.append(f"{partition_column} < {int(brow.hi)}")
                where = f" WHERE {' AND '.join(preds)}" if preds else ""
                sql = f"SELECT {columns} FROM {table}{where}"
                with pooled_connection(ConnSettings(*s_args)) as c:
                    if via_copy:
                        decs = [
                            _OID_DECODE.get(oid, (str, "string"))[0]
                            for oid in oids
                        ]
                        rows = [
                            tuple(
                                None if f is None else d(f)
                                for d, f in zip(decs, fields_txt)
                            )
                            for fields_txt in c.copy_out(f"({sql})")
                        ]
                    else:
                        _, rows = c.simple_query(sql)
                yield pd.DataFrame(rows, columns=names)

    return bdf.mapInPandas(fetch, schema)


def _pg_literal(v: Any) -> str:
    """Postgres/standard-SQL literal (NOT Spark dialect: `''` doubling,
    no `D` float suffix) for the write path. Scalar types only — arrays
    and composites belong to COPY, not multi-row VALUES."""
    import datetime as _dt

    import pandas as pd

    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
        return "NULL"
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        v = v.item()  # numpy scalar → Python native
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return f"CAST('{v!r}' AS DOUBLE PRECISION)"
    if isinstance(v, Decimal):
        return f"CAST('{v}' AS DECIMAL(38,18))"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            return f"TIMESTAMP WITH TIME ZONE '{v.isoformat(sep=' ')}'"
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, _dt.time):
        if v.tzinfo is not None:
            return f"TIME WITH TIME ZONE '{v.isoformat()}'"
        return f"TIME '{v.isoformat()}'"
    if isinstance(v, _dt.timedelta):
        return f"INTERVAL '{_interval_text(v)}'"
    if isinstance(v, uuid.UUID):
        return f"UUID '{v}'"
    raise QueryError(f"no wire literal rendering for {type(v).__name__}", "")


def _interval_text(v) -> str:
    """Render a timedelta in Postgres interval text form
    ('[±N days ]±HH:MM:SS[.ffffff]') — the inverse of
    :func:`_pg_interval` up to month flattening."""
    us = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
    sign = "-" if us < 0 else ""
    a = abs(us)
    d, rem = divmod(a, 86_400_000_000)
    h, rem = divmod(rem, 3_600_000_000)
    m, rem = divmod(rem, 60_000_000)
    s, frac = divmod(rem, 1_000_000)
    t = f"{sign}{h:02d}:{m:02d}:{s:02d}"
    if frac:
        t += f".{frac:06d}".rstrip("0")
    return (f"{sign}{d} days " if d else "") + t


def _copy_text(v: Any) -> str | None:
    """Render one value as a COPY text-format field (pre-escaping).

    ``None`` maps to SQL NULL (``\\N`` on the wire); everything else is
    the text the server's input function parses for that column type —
    no quoting, no SQL rendering, so strings round-trip byte-exactly
    (tabs/newlines/backslashes are handled by :func:`copy_escape`)."""
    import datetime as _dt

    import pandas as pd

    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
        return None
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        v = v.item()
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip form
    if isinstance(v, (int, Decimal)):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()  # bytea hex input form
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.time):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        return _interval_text(v)
    if isinstance(v, uuid.UUID):
        return str(v)
    raise QueryError(f"no COPY text rendering for {type(v).__name__}", "")


def write_partitioned(
    df,
    settings: ConnSettings,
    table: str,
    batch_rows: int = 500,
    via_copy: bool = False,
) -> int:
    """Write a DataFrame into ``table`` over the wire protocol — the
    Postgres SINK edge (S-4) mirroring ``read_partitioned``'s shape: one
    connection per Spark partition. Returns the row count written (runs
    an action).

    Two wire encodings, same connection layout:

    * default — multi-row ``INSERT … VALUES`` batches of ``batch_rows``
      (portable, works against any SQL server speaking the protocol);
    * ``via_copy=True`` — one ``COPY table (cols) FROM STDIN`` stream per
      partition (text format, 64 KiB CopyData frames): no per-row SQL
      rendering or parsing, the canonical Postgres bulk-load path.

    Idempotence is the caller's contract (write to a staging table +
    atomic swap, as `sinks.py` does for managed tables).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    cols = list(df.columns)
    collist = ", ".join(cols)
    s_args = (
        settings.host, settings.dbname, settings.user,
        settings.password, settings.port, settings.sslmode,
        settings.sslrootcert,
    )

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        buf: list[str] = []
        with pooled_connection(ConnSettings(*s_args)) as c:
            if via_copy:
                n = c.copy_in(
                    table,
                    cols,
                    (
                        [_copy_text(v) for v in row]
                        for pdf in batches
                        for row in pdf.itertuples(index=False)
                    ),
                )
                yield pd.DataFrame({"n": [n]})
                return

            def flush() -> None:
                nonlocal n
                if buf:
                    c.simple_query(
                        f"INSERT INTO {table} ({collist}) VALUES {', '.join(buf)}"
                    )
                    n += len(buf)
                    buf.clear()

            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    buf.append("(" + ", ".join(_pg_literal(v) for v in row) + ")")
                    if len(buf) >= batch_rows:
                        flush()
            flush()
        yield pd.DataFrame({"n": [n]})

    total = df.mapInPandas(write, "n long").agg(F.sum("n")).collect()[0][0]
    return int(total or 0)
