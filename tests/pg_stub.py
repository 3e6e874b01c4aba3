"""In-process Postgres wire-protocol stub server for S-2 contract tests.

Speaks the server side of the v3 protocol (startup, optional cleartext
auth, simple query, text-format rows) and executes the SQL against an
embedded DuckDB connection — i.e. a "Postgres-speaking DuckDB".  This is
TEST INFRASTRUCTURE: it exists so ``pgstream_spark.sources.pgwire`` can be
driven end-to-end (auth, row decode, NULLs, errors, partitioned parallel
reads) without a Postgres server in the environment.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket
import socketserver
import struct
import threading
from typing import Any

import duckdb

# DuckDB type name → Postgres type OID (text format)
_TYPE_OID = {
    "BOOLEAN": 16,
    "BLOB": 17,
    "BIGINT": 20,
    "SMALLINT": 21,
    "INTEGER": 23,
    "VARCHAR": 25,
    "FLOAT": 700,
    "REAL": 700,
    "DOUBLE": 701,
    "DATE": 1082,
    "TIME": 1083,
    "TIMESTAMP": 1114,
    "TIMESTAMP WITH TIME ZONE": 1184,
    "INTERVAL": 1186,
    "TIME WITH TIME ZONE": 1266,
    "UUID": 2950,
    "JSON": 114,  # no binary codec client-side — the unsupported-OID probe
}


# element type of a DuckDB 1-D array → (array OID, element duck type)
_ARRAY_OID = {
    "INTEGER[]": (1007, "INTEGER"),
    "BIGINT[]": (1016, "BIGINT"),
    "FLOAT[]": (1021, "FLOAT"),
    "REAL[]": (1021, "REAL"),
    "DOUBLE[]": (1022, "DOUBLE"),
}


def _oid_for(duck_type: str) -> int:
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        return 1700
    if t in _ARRAY_OID:
        return _ARRAY_OID[t][0]
    return _TYPE_OID.get(t, 25)


def _render_interval(v) -> str:
    # Postgres text form '[±N days ]±HH:MM:SS[.ffffff]' — written
    # independently of the client's renderer (string walk from total
    # microseconds) so agreement is a two-implementation check
    import datetime

    assert isinstance(v, datetime.timedelta)
    total = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
    sign = "-" if total < 0 else ""
    total = abs(total)
    d = total // 86_400_000_000
    rest = total % 86_400_000_000
    hh = rest // 3_600_000_000
    mm = rest % 3_600_000_000 // 60_000_000
    ss = rest % 60_000_000 // 1_000_000
    us = rest % 1_000_000
    t = f"{sign}{hh:02d}:{mm:02d}:{ss:02d}"
    if us:
        t += ("%.6f" % (us / 1e6))[1:].rstrip("0")
    return f"{sign}{d} days {t}" if d else t


def _render(v: Any) -> bytes | None:
    import datetime

    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, (bytes, bytearray)):
        return b"\\x" + bytes(v).hex().encode()
    if isinstance(v, datetime.timedelta):
        return _render_interval(v).encode()
    if isinstance(v, list):  # Postgres array text form, not Python repr
        return (
            "{"
            + ",".join("NULL" if e is None else str(e) for e in v)
            + "}"
        ).encode()
    return str(v).encode()


# COPY text-format escaping — implemented independently of the client's
# codec (pgstream_spark.sources.pgwire) so the contract test is a real
# two-implementation agreement check, not a tautology.
def _copy_field(v: Any) -> str:
    if v is None:
        return "\\N"
    s = _render(v).decode()
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\b", "\\b")
        .replace("\f", "\\f")
        .replace("\v", "\\v")
    )


_STUB_UNESC = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f", "v": "\v", "\\": "\\"}


# COPY binary-format field codec — again implemented INDEPENDENTLY of the
# client (struct-packed here from the public wire layout) so the
# binary-vs-text agreement test cross-checks two implementations.
def _bin_field(v: Any, duck_type: str) -> bytes | None:
    import datetime

    if v is None:
        return None
    t = duck_type.upper()
    if t == "BOOLEAN":
        return b"\x01" if v else b"\x00"
    if t == "BLOB":
        return bytes(v)
    if t == "BIGINT":
        return struct.pack("!q", v)
    if t == "INTEGER":
        return struct.pack("!i", v)
    if t == "SMALLINT":
        return struct.pack("!h", v)
    if t in ("FLOAT", "REAL"):
        return struct.pack("!f", v)
    if t == "DOUBLE":
        return struct.pack("!d", v)
    if t == "DATE":
        return struct.pack("!i", (v - datetime.date(2000, 1, 1)).days)
    if t == "TIMESTAMP":
        d = v - datetime.datetime(2000, 1, 1)
        return struct.pack(
            "!q", (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
        )
    if t == "TIMESTAMP WITH TIME ZONE":
        d = v - datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc)
        return struct.pack(
            "!q", (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
        )
    if t == "TIME":
        return struct.pack(
            "!q",
            ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000
            + v.microsecond,
        )
    if t == "TIME WITH TIME ZONE":
        # int64 µs since midnight + int32 zone seconds WEST of UTC
        west = -int(v.utcoffset().total_seconds())
        return struct.pack(
            "!qi",
            ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000
            + v.microsecond,
            west,
        )
    if t == "INTERVAL":
        # (µs, days, months) — DuckDB hands us a flattened timedelta,
        # so months is always 0 here
        return struct.pack(
            "!qii", v.seconds * 1_000_000 + v.microseconds, v.days, 0
        )
    if t == "UUID":
        return v.bytes
    if t == "VARCHAR":
        return str(v).encode()
    if t in _ARRAY_OID:  # 1-D array: ndim/hasnull/elemoid + dims + elems
        aoid, elem_t = _ARRAY_OID[t]
        elem_oid = _TYPE_OID[elem_t]
        if len(v) == 0:
            return struct.pack("!iii", 0, 0, elem_oid)
        parts = [
            struct.pack(
                "!iii", 1, int(any(e is None for e in v)), elem_oid
            ),
            struct.pack("!ii", len(v), 1),
        ]
        for e in v:
            if e is None:
                parts.append(struct.pack("!i", -1))
            else:
                p = _bin_field(e, elem_t)
                parts.append(struct.pack("!i", len(p)) + p)
        return b"".join(parts)
    if t.startswith("DECIMAL"):
        # independent string-walk encoder (the client's is arithmetic on
        # Decimal tuples — agreement here is a two-implementation check)
        s = format(v, "f")
        neg = s.startswith("-")
        s = s.lstrip("+-")
        ip, _, fp = s.partition(".")
        dscale = len(fp)
        ip = ip.lstrip("0")
        ip = "0" * ((-len(ip)) % 4) + ip
        fpr = fp + "0" * ((-len(fp)) % 4)
        groups = [int(ip[i : i + 4]) for i in range(0, len(ip), 4)] + [
            int(fpr[i : i + 4]) for i in range(0, len(fpr), 4)
        ]
        weight = len(ip) // 4 - 1
        while groups and groups[0] == 0:
            groups.pop(0)
            weight -= 1
        while groups and groups[-1] == 0:
            groups.pop()
        sign = 0x4000 if neg and groups else 0x0000
        if not groups:
            weight = 0
        return struct.pack(
            f"!HhHH{len(groups)}H", len(groups), weight, sign, dscale, *groups
        )
    raise ValueError(f"no binary send() for DuckDB type {duck_type}")


def _bin_parse_field(b: bytes | None, duck_type: str) -> Any:
    import datetime

    if b is None:
        return None
    t = duck_type.upper()
    if t == "BOOLEAN":
        return b == b"\x01"
    if t == "BLOB":
        return b
    if t == "BIGINT":
        return struct.unpack("!q", b)[0]
    if t == "INTEGER":
        return struct.unpack("!i", b)[0]
    if t == "SMALLINT":
        return struct.unpack("!h", b)[0]
    if t in ("FLOAT", "REAL"):
        return struct.unpack("!f", b)[0]
    if t == "DOUBLE":
        return struct.unpack("!d", b)[0]
    if t == "DATE":
        return datetime.date(2000, 1, 1) + datetime.timedelta(
            days=struct.unpack("!i", b)[0]
        )
    if t == "TIMESTAMP":
        return datetime.datetime(2000, 1, 1) + datetime.timedelta(
            microseconds=struct.unpack("!q", b)[0]
        )
    if t == "TIMESTAMP WITH TIME ZONE":
        return datetime.datetime(
            2000, 1, 1, tzinfo=datetime.timezone.utc
        ) + datetime.timedelta(microseconds=struct.unpack("!q", b)[0])
    if t == "TIME":
        us = struct.unpack("!q", b)[0]
        return (
            datetime.datetime(2000, 1, 1)
            + datetime.timedelta(microseconds=us)
        ).time()
    if t == "TIME WITH TIME ZONE":
        us, west = struct.unpack("!qi", b)
        base = datetime.datetime(2000, 1, 1) + datetime.timedelta(
            microseconds=us
        )
        return base.time().replace(
            tzinfo=datetime.timezone(datetime.timedelta(seconds=-west))
        )
    if t == "INTERVAL":
        us, days, months = struct.unpack("!qii", b)
        return datetime.timedelta(days=days + 30 * months, microseconds=us)
    if t == "UUID":
        import uuid

        return uuid.UUID(bytes=b)
    if t == "VARCHAR":
        return b.decode()
    if t in _ARRAY_OID:
        _aoid, elem_t = _ARRAY_OID[t]
        ndim, _hasnull, _eoid = struct.unpack_from("!iii", b, 0)
        if ndim == 0:
            return []
        (n, _lb) = struct.unpack_from("!ii", b, 12)
        off, out = 20, []
        for _ in range(n):
            (ln,) = struct.unpack_from("!i", b, off)
            off += 4
            if ln == -1:
                out.append(None)  # server keeps NULLs; compaction is a
                continue  # client-side reference-parity choice
            out.append(_bin_parse_field(b[off : off + ln], elem_t))
            off += ln
        return out
    if t.startswith("DECIMAL"):
        from decimal import Decimal

        nd, weight, sign, dscale = struct.unpack_from("!HhHH", b, 0)
        if sign == 0xC000:
            return float("nan")
        digs = "".join(
            f"{g:04d}" for g in struct.unpack_from(f"!{nd}H", b, 8)
        )
        exp = 4 * (weight - nd + 1)
        if not digs:
            digs, exp = "0", 0
        if exp >= 0:
            whole, frac = digs + "0" * exp, ""
        else:
            padded = digs.rjust(-exp + 1, "0")
            whole, frac = padded[:exp], padded[exp:]
        # render at EXACTLY dscale fractional digits: group alignment
        # can leave up to 3 trailing pad zeros past the display scale,
        # and a 38-digit DECIMAL plus pad zeros overflows DuckDB's
        # DECIMAL(38) parse (it falls back to lossy double)
        frac = (frac + "0" * dscale)[:dscale]
        s = (whole.lstrip("0") or "0") + ("." + frac if frac else "")
        if sign == 0x4000:
            s = "-" + s
        return Decimal(s)  # literal constructor: context-free
    raise ValueError(f"no binary recv() for DuckDB type {duck_type}")


def _copy_parse_field(s: str) -> str | None:
    if s == "\\N":
        return None
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(_STUB_UNESC.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _make_self_signed_cert(tmpdir: str) -> tuple[str, str, bytes]:
    """Self-signed RSA cert for 127.0.0.1 (CN + IP SAN) via PyCA
    cryptography; returns (cert_path, key_path, cert_der)."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")]
    )
    start = datetime.datetime(2026, 1, 1)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(start)
        .not_valid_after(start + datetime.timedelta(days=3650))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_path = os.path.join(tmpdir, "stub_cert.pem")
    key_path = os.path.join(tmpdir, "stub_key.pem")
    with open(cert_path, "wb") as fh:
        fh.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as fh:
        fh.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    return cert_path, key_path, cert.public_bytes(serialization.Encoding.DER)


class _Handler(socketserver.BaseRequestHandler):
    def _msg(self, tag: bytes, payload: bytes = b"") -> None:
        self.request.sendall(tag + struct.pack("!i", len(payload) + 4) + payload)

    def _ready(self) -> None:
        status = {"idle": b"I", "in": b"T", "failed": b"E"}[self._txn]
        self._msg(b"Z", status)

    def _error(self, text: str) -> None:
        body = b"SERROR\x00C42601\x00M" + text.encode() + b"\x00\x00"
        self._msg(b"E", body)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._rbuf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            self._rbuf += chunk
        out, self._rbuf = self._rbuf[:n], self._rbuf[n:]
        return out

    def handle(self) -> None:
        self._rbuf = b""
        self._txn = "idle"  # idle | in | failed — drives the Z status byte
        self._cursors: dict[str, dict[str, Any]] = {}
        # ONE DuckDB cursor per connection: BEGIN/COMMIT/ROLLBACK execute
        # for real, so DML inside a transaction actually rolls back —
        # per-statement cursors would silently auto-commit everything
        self._cur = self.server.db.cursor()
        try:
            self._handshake()
            self._query_loop()
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                self._cur.close()
            except Exception:
                pass

    def _handshake(self) -> None:
        (length,) = struct.unpack("!i", self._recv_exact(4))
        body = self._recv_exact(length - 4)
        (proto,) = struct.unpack_from("!i", body)
        tls_on = False
        if proto == 80877103:  # SSLRequest
            if self.server.ssl_ctx is None:
                self.request.sendall(b"N")  # TLS not configured
            else:
                self.request.sendall(b"S")
                self.request = self.server.ssl_ctx.wrap_socket(
                    self.request, server_side=True
                )
                self._rbuf = b""
                tls_on = True
            (length,) = struct.unpack("!i", self._recv_exact(4))
            body = self._recv_exact(length - 4)
            (proto,) = struct.unpack_from("!i", body)
        if proto != 196608:
            self._error(f"unsupported protocol {proto}")
            raise ConnectionError
        if self.server.require_tls and not tls_on:
            # the pg_hba "hostssl"-only posture: plaintext startups are
            # rejected AFTER the startup packet, which is the error the
            # sslmode=allow ladder upgrades on
            self._error("no pg_hba.conf entry for host (SSL off)")
            raise ConnectionError
        kv = body[4:].split(b"\x00")
        params = dict(zip(kv[0::2], kv[1::2]))
        user = params.get(b"user", b"").decode()

        if self.server.password:
            mode = self.server.auth
            if mode == "cleartext":
                self._msg(b"R", struct.pack("!i", 3))
                tag = self._recv_exact(1)
                (plen,) = struct.unpack("!i", self._recv_exact(4))
                pw = self._recv_exact(plen - 4).rstrip(b"\x00").decode()
                if tag != b"p" or pw != self.server.password:
                    self._error(
                        "password authentication failed for user " + user
                    )
                    raise ConnectionError
            elif mode == "md5":
                self._auth_md5(user)
            elif mode == "scram-sha-256":
                self._auth_scram()
            else:  # pragma: no cover - test misconfiguration
                self._error(f"stub: unknown auth mode {mode}")
                raise ConnectionError
        self._msg(b"R", struct.pack("!i", 0))  # AuthenticationOk
        self._msg(b"S", b"server_version\x0016.0 (duckdb stub)\x00")
        with self.server.counter_lock:
            self.server.startup_count += 1
        self._ready()

    def _read_password_message(self) -> bytes:
        tag = self._recv_exact(1)
        (plen,) = struct.unpack("!i", self._recv_exact(4))
        body = self._recv_exact(plen - 4)
        if tag != b"p":
            self._error("expected password message")
            raise ConnectionError
        return body

    def _auth_md5(self, user: str) -> None:
        """AuthenticationMD5Password: expect md5 + hex(md5(hex(md5(pw+user)) + salt))."""
        salt = os.urandom(4)
        self._msg(b"R", struct.pack("!i", 5) + salt)
        got = self._read_password_message().rstrip(b"\x00")
        inner = hashlib.md5(
            self.server.password.encode() + user.encode()
        ).hexdigest()
        want = b"md5" + hashlib.md5(inner.encode() + salt).hexdigest().encode()
        if not hmac.compare_digest(got, want):
            self._error("password authentication failed for user " + user)
            raise ConnectionError

    def _auth_scram(self) -> None:
        """Server SIDE of SCRAM-SHA-256 (RFC 5802/7677) — the genuine
        verification algorithm, not the client math replayed: the server
        holds only StoredKey/ServerKey (what pg_authid stores), recovers
        ClientKey from the proof via XOR with its own ClientSignature,
        and checks SHA-256(recovered) against StoredKey."""
        # what a real server has on disk (derived at user-creation time)
        salt, iters = os.urandom(16), 4096
        salted = hashlib.pbkdf2_hmac(
            "sha256", self.server.password.encode(), salt, iters
        )
        stored_key = hashlib.sha256(
            hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        ).digest()
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()

        mechs = b"".join(
            m.encode() + b"\x00" for m in self.server.advertise_mechanisms
        )
        self._msg(b"R", struct.pack("!i", 10) + mechs + b"\x00")
        body = self._read_password_message()
        z = body.index(b"\x00")
        mech = body[:z].decode()
        (ilen,) = struct.unpack_from("!i", body, z + 1)
        client_first = body[z + 5 : z + 5 + ilen].decode()
        if mech not in self.server.sasl_mechanisms:
            self._error(f"unsupported SASL mechanism {mech}")
            raise ConnectionError
        # gs2 header: n,, / y,, / p=tls-server-end-point,,
        if client_first.startswith("p=tls-server-end-point,,"):
            gs2 = "p=tls-server-end-point,,"
            if not mech.endswith("-PLUS") or self.server.cb_data is None:
                self._error("channel binding requested without TLS/-PLUS")
                raise ConnectionError
            expect_c = base64.b64encode(
                gs2.encode() + self.server.cb_data
            ).decode()
        elif client_first.startswith("y,,"):
            gs2 = "y,,"
            if "SCRAM-SHA-256-PLUS" in self.server.sasl_mechanisms:
                # RFC 5802: "y" + a server that DOES offer -PLUS means
                # someone stripped the -PLUS advertisement — refuse.
                self._error("channel binding downgrade detected")
                raise ConnectionError
            expect_c = base64.b64encode(b"y,,").decode()
        elif client_first.startswith("n,,"):
            gs2 = "n,,"
            expect_c = "biws"
        else:
            self._error("stub: malformed gs2 header")
            raise ConnectionError
        bare = client_first[len(gs2):]
        c_attrs = dict(kv.split("=", 1) for kv in bare.split(","))
        server_nonce = c_attrs["r"] + base64.b64encode(os.urandom(18)).decode()
        server_first = (
            f"r={server_nonce},s={base64.b64encode(salt).decode()},i={iters}"
        )
        self._msg(b"R", struct.pack("!i", 11) + server_first.encode())

        client_final = self._read_password_message().decode()
        f_attrs = dict(kv.split("=", 1) for kv in client_final.split(","))
        without_proof = client_final[: client_final.rindex(",p=")]
        auth_message = ",".join((bare, server_first, without_proof)).encode()
        if f_attrs.get("c") != expect_c or f_attrs.get("r") != server_nonce:
            self._error("SCRAM channel-binding/nonce mismatch")
            raise ConnectionError
        proof = base64.b64decode(f_attrs["p"])
        client_sig = hmac.new(stored_key, auth_message, hashlib.sha256).digest()
        recovered_key = bytes(a ^ b for a, b in zip(proof, client_sig))
        if not hmac.compare_digest(
            hashlib.sha256(recovered_key).digest(), stored_key
        ):
            self._error("password authentication failed for user")
            raise ConnectionError
        sig = hmac.new(server_key, auth_message, hashlib.sha256).digest()
        if self.server.scram_corrupt_signature:  # test hook: spoofed server
            sig = bytes([sig[0] ^ 0xFF]) + sig[1:]
        final = b"v=" + base64.b64encode(sig)
        self._msg(b"R", struct.pack("!i", 12) + final)

    # -- transaction + server-cursor emulation ---------------------------
    # DuckDB has no server-side cursors, so DECLARE/FETCH/CLOSE are
    # emulated here (eager materialization per cursor) with Postgres's
    # observable semantics: DECLARE outside a transaction errors, an
    # error inside a transaction moves it to the aborted state where
    # every statement except ROLLBACK is refused, and the ReadyForQuery
    # status byte tracks idle/in/failed.  A `/*fail_after:N*/` marker in
    # the cursor query makes the (N+1)th FETCH fail — the test hook for
    # mid-stream server errors.

    def _send_rowset(self, cols, rows, complete: bytes) -> None:
        desc = struct.pack("!h", len(cols))
        for i, (name, duck_type) in enumerate(cols):
            desc += name.encode() + b"\x00"
            desc += struct.pack("!ihihih", 0, i + 1, _oid_for(duck_type), -1, -1, 0)
        self._msg(b"T", desc)
        for row in rows:
            body = struct.pack("!h", len(row))
            for v in row:
                r = _render(v)
                if r is None:
                    body += struct.pack("!i", -1)
                else:
                    body += struct.pack("!i", len(r)) + r
            self._msg(b"D", body)
        self._msg(b"C", complete + b"\x00")

    def _txn_or_cursor_statement(self, sql: str) -> bool:
        """Handle BEGIN/COMMIT/ROLLBACK/DECLARE/FETCH/CLOSE; True if the
        statement was consumed (response already sent)."""
        import re

        stmt = sql.strip().rstrip(";").strip()
        u = stmt.upper()
        if self._txn == "failed" and u not in ("ROLLBACK", "ABORT"):
            self._error(
                "current transaction is aborted, commands ignored until "
                "end of transaction block"
            )
            self._ready()
            return True
        if u in ("BEGIN", "BEGIN TRANSACTION", "START TRANSACTION"):
            if self._txn != "in":  # Postgres warns on nested BEGIN, no-op
                try:
                    self._cur.execute("BEGIN TRANSACTION")
                except Exception:
                    pass
            self._txn = "in"
            self._msg(b"C", b"BEGIN\x00")
            self._ready()
            return True
        if u in ("COMMIT", "END", "ROLLBACK", "ABORT"):
            rollback = u in ("ROLLBACK", "ABORT") or self._txn == "failed"
            word = b"ROLLBACK" if u in ("ROLLBACK", "ABORT") else b"COMMIT"
            try:
                self._cur.execute("ROLLBACK" if rollback else "COMMIT")
            except Exception:
                pass  # no transaction active on the duckdb side
            self._txn = "idle"
            self._cursors.clear()
            self._msg(b"C", word + b"\x00")
            self._ready()
            return True
        m = re.match(
            r'DECLARE\s+"?([A-Za-z0-9_]+)"?\s+(?:NO\s+SCROLL\s+)?CURSOR\s+FOR\s+(.*)',
            stmt,
            re.I | re.S,
        )
        if m:
            if self._txn != "in":
                self._error("DECLARE CURSOR can only be used in transaction blocks")
                self._ready()
                return True
            name, inner = m.group(1), m.group(2)
            fail = re.search(r"/\*fail_after:(\d+)\*/", inner)
            try:
                rel = self._cur.sql(inner)
                cols = list(zip(rel.columns, [str(t) for t in rel.types]))
                rows = rel.fetchall()
            except Exception as exc:
                self._txn = "failed"
                self._error(str(exc).splitlines()[0])
                self._ready()
                return True
            self._cursors[name] = {
                "cols": cols,
                "rows": rows,
                "pos": 0,
                "fail_after": int(fail.group(1)) if fail else None,
                "fetches": 0,
            }
            self._msg(b"C", b"DECLARE CURSOR\x00")
            self._ready()
            return True
        m = re.match(r'FETCH\s+(?:FORWARD\s+)?(\d+)\s+FROM\s+"?([A-Za-z0-9_]+)"?', stmt, re.I)
        if m:
            n, name = int(m.group(1)), m.group(2)
            cur = self._cursors.get(name)
            if cur is None:
                if self._txn == "in":
                    self._txn = "failed"
                self._error(f'cursor "{name}" does not exist')
                self._ready()
                return True
            cur["fetches"] += 1
            if cur["fail_after"] is not None and cur["fetches"] > cur["fail_after"]:
                self._txn = "failed"
                self._error("simulated mid-stream failure (fail_after hook)")
                self._ready()
                return True
            batch = cur["rows"][cur["pos"] : cur["pos"] + n]
            cur["pos"] += n
            self._send_rowset(cur["cols"], batch, f"FETCH {len(batch)}".encode())
            self._ready()
            return True
        m = re.match(r'CLOSE\s+"?([A-Za-z0-9_]+)"?', stmt, re.I)
        if m:
            if self._cursors.pop(m.group(1), None) is None:
                if self._txn == "in":
                    self._txn = "failed"
                self._error(f'cursor "{m.group(1)}" does not exist')
            else:
                self._msg(b"C", b"CLOSE CURSOR\x00")
            self._ready()
            return True
        return False

    # -- COPY sub-protocol ------------------------------------------------

    def _copy_to_stdout(self, source: str) -> None:
        """``COPY (query)|table TO STDOUT`` — text format.  CopyData
        frames are deliberately NOT row-aligned (fixed-size chunks) so
        clients must reassemble rows across frame boundaries, as a real
        server's network layer may split them."""
        inner = source.strip()
        sql = inner[1:-1] if inner.startswith("(") else f"SELECT * FROM {inner}"
        try:
            rel = self._cur.sql(sql)
            ncols = len(rel.columns)
            rows = rel.fetchall()
        except Exception as exc:
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            self._ready()
            return
        self._msg(b"H", bytes([0]) + struct.pack("!h", ncols) + b"\x00\x00" * ncols)
        text = "".join(
            "\t".join(_copy_field(v) for v in row) + "\n" for row in rows
        ).encode()
        for off in range(0, len(text), 1000):
            self._msg(b"d", text[off : off + 1000])
        self._msg(b"c")
        self._msg(b"C", f"COPY {len(rows)}".encode() + b"\x00")
        self._ready()

    def _copy_from_stdin(self, table: str, collist: str | None) -> None:
        """``COPY table (cols) FROM STDIN`` — read CopyData until
        CopyDone/CopyFail, parse text rows, insert via parameter binding
        with probe-typed conversion (BLOB hex, BOOLEAN t/f)."""
        cols = (
            [c.strip().strip('"') for c in collist.split(",")] if collist else None
        )
        try:
            cur = self._cur
            probe = cur.sql(
                f"SELECT {', '.join(cols) if cols else '*'} FROM {table} LIMIT 0"
            )
            names = probe.columns
            types = [str(t).upper() for t in probe.types]
        except Exception as exc:
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            self._ready()
            return
        self._msg(b"G", bytes([0]) + struct.pack("!h", len(names)) + b"\x00\x00" * len(names))
        chunks: list[bytes] = []
        failed: str | None = None
        while True:
            tag = self._recv_exact(1)
            (length,) = struct.unpack("!i", self._recv_exact(4))
            payload = self._recv_exact(length - 4)
            if tag == b"d":
                chunks.append(payload)
            elif tag == b"c":
                break
            elif tag == b"f":
                failed = payload.rstrip(b"\x00").decode() or "client abort"
                break
            elif tag == b"X":
                raise ConnectionError("client gone mid-COPY")
            else:
                failed = f"unexpected message {tag!r} during COPY"
                break
        if failed is not None:
            if self._txn == "in":
                self._txn = "failed"
            self._error(f"COPY from stdin failed: {failed}")
            self._ready()
            return

        def convert(field: str | None, duck_type: str) -> Any:
            if field is None:
                return None
            if duck_type == "BLOB":
                if not field.startswith("\\x"):
                    raise ValueError(f"bad bytea input {field!r}")
                return bytes.fromhex(field[2:])
            if duck_type == "BOOLEAN":
                return field == "t"
            return field  # DuckDB casts VARCHAR to the column type

        try:
            data = b"".join(chunks).decode()
            params = []
            for line in data.split("\n"):
                if line in ("", "\r"):
                    continue
                fields = [_copy_parse_field(f) for f in line.split("\t")]
                if len(fields) != len(names):
                    raise ValueError(
                        f"row has {len(fields)} fields, expected {len(names)}"
                    )
                params.append([convert(f, t) for f, t in zip(fields, types)])
            if params:
                ph = ", ".join("?" for _ in names)
                cur.executemany(
                    f"INSERT INTO {table} ({', '.join(names)}) VALUES ({ph})",
                    params,
                )
        except Exception as exc:
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            self._ready()
            return
        self._msg(b"C", f"COPY {len(params)}".encode() + b"\x00")
        self._ready()

    def _copy_to_stdout_binary(self, source: str) -> None:
        """``COPY ... TO STDOUT (FORMAT binary)`` — PGCOPY header, typed
        tuples, -1 trailer.  Frames deliberately chopped at fixed sizes so
        tuples straddle CopyData boundaries."""
        inner = source.strip()
        sql = inner[1:-1] if inner.startswith("(") else f"SELECT * FROM {inner}"
        try:
            rel = self._cur.sql(sql)
            types = [str(t) for t in rel.types]
            rows = rel.fetchall()
            body = bytearray(b"PGCOPY\n\xff\r\n\x00" + struct.pack("!ii", 0, 0))
            for row in rows:
                body += struct.pack("!h", len(row))
                for v, t in zip(row, types):
                    f = _bin_field(v, t)
                    if f is None:
                        body += struct.pack("!i", -1)
                    else:
                        body += struct.pack("!i", len(f)) + f
            body += struct.pack("!h", -1)
        except Exception as exc:
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            self._ready()
            return
        ncols = len(types)
        self._msg(
            b"H", bytes([1]) + struct.pack("!h", ncols) + b"\x00\x01" * ncols
        )
        for off in range(0, len(body), 999):  # odd size: misalign tuples
            self._msg(b"d", bytes(body[off : off + 999]))
        self._msg(b"c")
        self._msg(b"C", f"COPY {len(rows)}".encode() + b"\x00")
        self._ready()

    def _copy_from_stdin_binary(self, table: str, collist: str | None) -> None:
        """``COPY table (cols) FROM STDIN (FORMAT binary)`` — parse the
        PGCOPY stream and insert with probe-typed conversion."""
        cols = (
            [c.strip().strip('"') for c in collist.split(",")] if collist else None
        )
        try:
            cur = self._cur
            probe = cur.sql(
                f"SELECT {', '.join(cols) if cols else '*'} FROM {table} LIMIT 0"
            )
            names = probe.columns
            types = [str(t) for t in probe.types]
        except Exception as exc:
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            self._ready()
            return
        self._msg(
            b"G",
            bytes([1]) + struct.pack("!h", len(names)) + b"\x00\x01" * len(names),
        )
        chunks: list[bytes] = []
        failed: str | None = None
        while True:
            tag = self._recv_exact(1)
            (length,) = struct.unpack("!i", self._recv_exact(4))
            payload = self._recv_exact(length - 4)
            if tag == b"d":
                chunks.append(payload)
            elif tag == b"c":
                break
            elif tag == b"f":
                failed = payload.rstrip(b"\x00").decode() or "client abort"
                break
            elif tag == b"X":
                raise ConnectionError("client gone mid-COPY")
            else:
                failed = f"unexpected message {tag!r} during COPY"
                break
        if failed is not None:
            if self._txn == "in":
                self._txn = "failed"
            self._error(f"COPY from stdin failed: {failed}")
            self._ready()
            return
        try:
            data = b"".join(chunks)
            if data[:11] != b"PGCOPY\n\xff\r\n\x00":
                raise ValueError("bad PGCOPY signature")
            (ext,) = struct.unpack_from("!i", data, 15)
            off = 19 + ext
            params = []
            while True:
                (nf,) = struct.unpack_from("!h", data, off)
                off += 2
                if nf == -1:
                    break
                if nf != len(names):
                    raise ValueError(
                        f"tuple has {nf} fields, expected {len(names)}"
                    )
                vals = []
                for t in types:
                    (flen,) = struct.unpack_from("!i", data, off)
                    off += 4
                    if flen == -1:
                        vals.append(None)
                    else:
                        vals.append(_bin_parse_field(data[off : off + flen], t))
                        off += flen
                params.append(vals)
            if off != len(data):
                raise ValueError("trailing bytes after binary COPY trailer")
            if params:
                ph = ", ".join("?" for _ in names)
                cur.executemany(
                    f"INSERT INTO {table} ({', '.join(names)}) VALUES ({ph})",
                    params,
                )
        except Exception as exc:
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            self._ready()
            return
        self._msg(b"C", f"COPY {len(params)}".encode() + b"\x00")
        self._ready()

    def _copy_statement(self, sql: str) -> bool:
        import re

        stmt = sql.strip().rstrip(";").strip()
        m = re.match(
            r"COPY\s+(.+?)\s+TO\s+STDOUT(\s*\(\s*FORMAT\s+binary\s*\))?$",
            stmt,
            re.I | re.S,
        )
        if m:
            if m.group(2):
                self._copy_to_stdout_binary(m.group(1))
            else:
                self._copy_to_stdout(m.group(1))
            return True
        m = re.match(
            r"COPY\s+([A-Za-z0-9_.\"]+)\s*(?:\(([^)]*)\))?\s+FROM\s+STDIN"
            r"(\s*\(\s*FORMAT\s+binary\s*\))?$",
            stmt,
            re.I | re.S,
        )
        if m:
            if m.group(3):
                self._copy_from_stdin_binary(m.group(1), m.group(2))
            else:
                self._copy_from_stdin(m.group(1), m.group(2))
            return True
        return False

    # -- extended query protocol (Parse/Bind/Describe/Execute/Sync) -------
    # Implemented from the public message layout so the client's
    # prepared-statement path (binary result format) is exercised against
    # an independent server-side implementation.

    def _ext_parse(self, payload: bytes) -> None:
        import re

        end = payload.index(b"\x00")
        name = payload[:end].decode()
        end2 = payload.index(b"\x00", end + 1)
        sql = payload[end + 1 : end2].decode()
        # DuckDB understands Postgres's numbered $n placeholders natively
        # (repeated $1 = ONE parameter, exactly the protocol semantics)
        nparams = max(
            (int(m) for m in re.findall(r"\$(\d+)", sql)), default=0
        )
        if not hasattr(self, "_stmts"):
            self._stmts = {}
        self._stmts[name] = (sql, nparams)
        self._msg(b"1")  # ParseComplete

    def _ext_bind(self, payload: bytes) -> None:
        off = payload.index(b"\x00")
        portal = payload[:off].decode()
        off += 1
        end = payload.index(b"\x00", off)
        stmt = payload[off:end].decode()
        off = end + 1
        (nfmt,) = struct.unpack_from("!h", payload, off)
        off += 2 + 2 * nfmt  # param format codes (text assumed)
        (nparams,) = struct.unpack_from("!h", payload, off)
        off += 2
        params: list[str | None] = []
        for _ in range(nparams):
            (plen,) = struct.unpack_from("!i", payload, off)
            off += 4
            if plen == -1:
                params.append(None)
            else:
                params.append(payload[off : off + plen].decode())
                off += plen
        (nrf,) = struct.unpack_from("!h", payload, off)
        off += 2
        rfmts = list(struct.unpack_from(f"!{nrf}h", payload, off))
        if not hasattr(self, "_portals"):
            self._portals = {}
        self._portals[portal] = (stmt, params, rfmts)
        self._msg(b"2")  # BindComplete

    def _ext_row_description(self, qsql: str, nparams: int) -> list[tuple]:
        rel = self._cur.sql(f"DESCRIBE {qsql}", params=[None] * nparams or None)
        cols = [(r[0], r[1]) for r in rel.fetchall()]
        desc = struct.pack("!h", len(cols))
        for i, (cname, duck_type) in enumerate(cols):
            desc += cname.encode() + b"\x00"
            desc += struct.pack(
                "!ihihih", 0, i + 1, _oid_for(duck_type), -1, -1, 0
            )
        self._msg(b"T", desc)
        return cols

    def _ext_describe(self, payload: bytes) -> None:
        kind, name = chr(payload[0]), payload[1:].split(b"\x00")[0].decode()
        try:
            if kind == "S":
                qsql, nparams = self._stmts[name]
                self._msg(b"t", struct.pack("!h", 0))  # ParameterDescription
                self._ext_row_description(qsql, nparams)
            else:
                stmt, params, _ = self._portals[name]
                qsql, _np = self._stmts[stmt]
                self._ext_row_description(qsql, len(params))
        except Exception as exc:  # noqa: BLE001
            self._error(str(exc).splitlines()[0])

    def _ext_execute(self, payload: bytes) -> None:
        portal = payload.split(b"\x00")[0].decode()
        try:
            stmt, params, rfmts = self._portals[portal]
            qsql, _np = self._stmts[stmt]
            rel = self._cur.sql(qsql, params=params or None)
            types = [str(t) for t in rel.types]
            rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            if self._txn == "in":
                self._txn = "failed"
            self._error(str(exc).splitlines()[0])
            return
        for row in rows:
            body = struct.pack("!h", len(row))
            for i, v in enumerate(row):
                fmt = rfmts[i] if i < len(rfmts) else (rfmts[0] if len(rfmts) == 1 else 0)
                r = _bin_field(v, types[i]) if fmt == 1 else _render(v)
                if r is None:
                    body += struct.pack("!i", -1)
                else:
                    body += struct.pack("!i", len(r)) + r
            self._msg(b"D", body)
        self._msg(b"C", f"SELECT {len(rows)}".encode() + b"\x00")

    def _query_loop(self) -> None:
        while True:
            tag = self._recv_exact(1)
            (length,) = struct.unpack("!i", self._recv_exact(4))
            payload = self._recv_exact(length - 4)
            if tag == b"X":
                return
            if tag == b"P":
                self._ext_parse(payload)
                continue
            if tag == b"B":
                self._ext_bind(payload)
                continue
            if tag == b"D" and payload[:1] in (b"S", b"P"):
                self._ext_describe(payload)
                continue
            if tag == b"E":
                self._ext_execute(payload)
                continue
            if tag == b"S":
                self._ready()  # Sync
                continue
            if tag == b"C" and payload[:1] in (b"S", b"P"):
                self._msg(b"3")  # CloseComplete
                continue
            if tag != b"Q":
                self._error(f"unsupported message {tag!r}")
                self._ready()
                continue
            sql = payload.rstrip(b"\x00").decode()
            if self._txn_or_cursor_statement(sql):
                continue
            if self._copy_statement(sql):
                continue
            try:
                # the connection's own cursor (transaction-scoped); the
                # relation API exposes REAL DuckDB types (the PEP-249
                # description only has generic 'NUMBER'/'STRING')
                rel = self._cur.sql(sql)
                if rel is None:  # DDL/DML — no result set
                    self._msg(b"C", b"OK\x00")
                    self._ready()
                    continue
                cols = list(zip(rel.columns, [str(t) for t in rel.types]))
                rows = rel.fetchall()
            except Exception as exc:  # surface as ErrorResponse
                if self._txn == "in":
                    self._txn = "failed"
                self._error(str(exc).splitlines()[0])
                self._ready()
                continue

            # RowDescription
            desc = struct.pack("!h", len(cols))
            for i, (name, duck_type) in enumerate(cols):
                desc += name.encode() + b"\x00"
                desc += struct.pack("!ihihih", 0, i + 1, _oid_for(duck_type), -1, -1, 0)
            self._msg(b"T", desc)
            # DataRows
            for row in rows:
                body = struct.pack("!h", len(row))
                for v in row:
                    r = _render(v)
                    if r is None:
                        body += struct.pack("!i", -1)
                    else:
                        body += struct.pack("!i", len(r)) + r
                self._msg(b"D", body)
            done = f"SELECT {len(rows)}".encode() + b"\x00"
            self._msg(b"C", done)
            self._ready()


class PgStubServer(socketserver.ThreadingTCPServer):
    """Threaded so partitioned reads can open concurrent connections."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(
        self,
        db: duckdb.DuckDBPyConnection,
        password: str | None = None,
        auth: str = "cleartext",
        sasl_mechanisms: tuple[str, ...] | None = None,
        scram_corrupt_signature: bool = False,
        tls: bool = False,
        require_tls: bool = False,
        advertise_mechanisms: tuple[str, ...] | None = None,
    ):
        self.db = db
        self.password = password
        self.auth = auth
        # completed startups (post-auth ReadyForQuery) — lets contract
        # tests assert connection REUSE: N queries ≪ N startups
        self.startup_count = 0
        self.counter_lock = threading.Lock()
        self.scram_corrupt_signature = scram_corrupt_signature
        self.require_tls = require_tls
        self.ssl_ctx = None
        self.cb_data: bytes | None = None
        self.cert_path: str | None = None
        self._tmpdir = None
        if tls:
            import ssl
            import tempfile

            self._tmpdir = tempfile.TemporaryDirectory()
            cert, key, der = _make_self_signed_cert(self._tmpdir.name)
            self.cert_path = cert
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(cert, key)
            self.ssl_ctx = ctx
            # RFC 5929 tls-server-end-point over OUR cert (sha256-signed)
            self.cb_data = hashlib.sha256(der).digest()
        if sasl_mechanisms is None:
            sasl_mechanisms = (
                ("SCRAM-SHA-256", "SCRAM-SHA-256-PLUS")
                if tls
                else ("SCRAM-SHA-256",)
            )
        self.sasl_mechanisms = sasl_mechanisms
        # what goes on the wire — normally the policy list; a test can
        # shrink it to simulate a MITM stripping the -PLUS advertisement
        self.advertise_mechanisms = (
            advertise_mechanisms
            if advertise_mechanisms is not None
            else sasl_mechanisms
        )
        super().__init__(("127.0.0.1", 0), _Handler)  # ephemeral port

    @property
    def port(self) -> int:
        return self.server_address[1]

    def __enter__(self) -> "PgStubServer":
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.shutdown()
        self.server_close()
        if self._tmpdir is not None:
            self._tmpdir.cleanup()
