"""Property-based tests (SURVEY §5.2-4): templating/binding never alters
semantics; array null-compaction matches the reference kernel; money
cents round-trip exactly."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pgstream_spark.querybuilder import format_query, render_literal

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# r12 (VERDICT r11 item 7 — the driver's pytest window): tests whose
# EXAMPLE is a multi-stage Spark pipeline cost 0.5-1.2 s per draw, and
# at 25 draws the dozen heaviest of them alone were ~3.5 min of the
# suite.  10 examples keeps the hypothesis search + shrink machinery
# (these are invariant checks, not enumeration) at ~40 % of the cost.
HEAVY_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)


@given(value=scalars)
@settings(**SETTINGS)
def test_literal_roundtrip_through_spark(engine, value):
    """render_literal(v) parsed by Spark SQL yields v back (P-9: binding
    is semantics-preserving)."""
    got = engine.rows("SELECT {1} AS v", (value,))[0].v
    if isinstance(value, float):
        assert got == pytest.approx(value, rel=1e-15)
    else:
        assert got == value


@given(
    a=st.integers(min_value=-1000, max_value=1000),
    b=st.text(max_size=20),
)
@settings(**SETTINGS)
def test_positional_substitution_is_order_correct(a, b):
    out = format_query("x={1} y={2} x2={1}", (a, b))
    assert out == f"x={a} y={render_literal(b)} x2={a}"


@given(
    cents=st.lists(
        st.integers(min_value=-(10**15), max_value=10**15), min_size=1, max_size=50
    )
)
@settings(**SETTINGS)
def test_money_sum_exact(spark, cents):
    """DECIMAL money sums equal exact integer-cent arithmetic (F-11)."""
    from pgstream_spark.functions.money import cents_to_money

    df = spark.createDataFrame([(c,) for c in cents], "cents long")
    total = (
        df.select(cents_to_money(F.col("cents")).alias("m"))
        .agg(F.sum("m").alias("s"))
        .first()
        .s
    )
    assert total == sum(Decimal(c) for c in cents) / 100


@given(
    arr=st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_null_compaction_matches_python(spark, arr):
    """compact_array == the C kernel's skip-NULL-and-compact semantics
    (array_conversion.c:83-90) for arbitrary arrays."""
    from pgstream_spark.functions.arrays import compact_array

    df = spark.createDataFrame([(arr,)], "a array<int>")
    got = df.select(compact_array(F.col("a")).alias("c")).first().c
    assert got == [x for x in arr if x is not None]


# ---------------------------------------------------------------------
# round-2 operators: invariants under random inputs
# ---------------------------------------------------------------------

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),      # seconds offset
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _ev_df(spark, pts):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    # event ids in time order (ts values are unique by construction)
    rows = [
        ("k", base + datetime.timedelta(seconds=s), i, float(v))
        for i, (s, v) in enumerate(sorted(pts))
    ]
    return spark.createDataFrame(
        rows, "sym string, ts timestamp_ntz, event_id long, value double"
    )


@given(pts=_events)
@settings(**HEAVY_SETTINGS)
def test_ohlc_invariants(spark, pts):
    """open/close are the temporally first/last values; low <= o,c,avg <= high;
    bucket populations sum to the input count."""
    from pgstream_spark.operators.ohlc import ohlc_bars

    df = _ev_df(spark, pts)
    bars = ohlc_bars(df, "ts", "value", ["sym"], 3600, tie_col="event_id").collect()
    assert sum(b.n_events for b in bars) == len(pts)
    by_bucket: dict[int, list[tuple[int, float]]] = {}
    for s, v in pts:
        by_bucket.setdefault(s // 3600, []).append((s, float(v)))
    for b in bars:
        want = sorted(by_bucket[b.bar_epoch_s // 3600 - 473352])  # hours since 2024-01-01
        vals = [v for _, v in want]
        assert b.open == vals[0] and b.close == vals[-1]
        assert b.low == min(vals) and b.high == max(vals)
        assert b.low - 1e-4 <= b.avg_value <= b.high + 1e-4


@given(pts=_events)
@settings(**HEAVY_SETTINGS)
def test_ewma_bounded_by_frame_extremes(spark, pts):
    """EWMA is a convex combination: min(frame) <= ewma <= max(frame)."""
    from pgstream_spark.operators.decay import ewma_time_decay

    df = _ev_df(spark, pts)
    out = sorted(
        ewma_time_decay(
            df, "ts", "value", ["sym"], tau_seconds=600.0,
            t0_epoch_s=1_704_067_200, frame_rows=8, tie_col="event_id",
        ).collect(),
        key=lambda r: r.event_id,
    )
    ordered = [float(v) for _, v in sorted(pts)]
    for i, r in enumerate(out):
        frame = ordered[max(0, i - 7) : i + 1]
        assert min(frame) - 1e-4 <= r.ewma <= max(frame) + 1e-4


@given(pts=_events, gap=st.integers(min_value=60, max_value=1800))
@settings(**HEAVY_SETTINGS)
def test_sessionize_gap_property(spark, pts, gap):
    """Events in one session are chained by gaps <= g; session boundaries
    have gaps > g; indexes are contiguous from 1."""
    from pgstream_spark.operators.sessionize import sessionize

    df = _ev_df(spark, pts)
    out = sessionize(df, "ts", ["sym"], gap, tie_col="event_id").collect()
    idxs = [r.session_idx for r in sorted(out, key=lambda r: r.event_id)]
    assert idxs and idxs[0] == 1
    times = sorted(s for s, _ in pts)
    for i in range(1, len(times)):
        if times[i] - times[i - 1] > gap:
            assert idxs[i] == idxs[i - 1] + 1
        else:
            assert idxs[i] == idxs[i - 1]


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**HEAVY_SETTINGS)
def test_rolling_corr_is_bounded(spark, pairs):
    """|r| <= 1 wherever defined; NULL exactly when a frame has zero
    variance on either side."""
    from pgstream_spark.operators.rolling import rolling_corr

    rows = [("k", i, float(x), float(y)) for i, (x, y) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "k string, seq long, x double, y double")
    out = rolling_corr(
        df, "x", "y", ["k"], ["seq"], frame_rows=8, x_scale=1, y_scale=100
    ).collect()
    xs = [round(x) for x, _ in pairs]
    ys = [round(y * 100) for _, y in pairs]
    for r in sorted(out, key=lambda r: r.seq):
        i = r.seq
        lo = max(0, i - 7)
        fx, fy = xs[lo : i + 1], ys[lo : i + 1]
        degenerate = len(set(fx)) < 2 or len(set(fy)) < 2
        if degenerate:
            assert r.rolling_corr is None
        else:
            assert r.rolling_corr is not None
            assert -1.0 <= r.rolling_corr <= 1.0


@given(pts=_events, factor=st.sampled_from([2, 3, 4, 6]))
@settings(**HEAVY_SETTINGS)
def test_ohlc_rollup_associativity(spark, pts, factor):
    """Rolling fine bars to a coarser tier must equal computing the
    coarse bars directly from ticks — for any tier ratio."""
    from pgstream_spark.operators.ohlc import ohlc_bars, ohlc_rollup

    df = _ev_df(spark, pts)
    fine = ohlc_bars(df, "ts", "value", ["sym"], 600, tie_col="event_id").drop(
        "avg_value"
    )
    coarse_s = 600 * factor
    rolled = {
        r.bar_epoch_s: (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc_rollup(fine, ["sym"], coarse_s).collect()
    }
    direct = {
        r.bar_epoch_s: (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc_bars(
            df, "ts", "value", ["sym"], coarse_s, tie_col="event_id"
        ).drop("avg_value").collect()
    }
    assert rolled == direct


# ---------------------------------------------------------------------
# COPY text-format codec: escape/unescape must round-trip ANY string,
# and must never emit a bare separator (tab / newline / CR) on the wire.
# ---------------------------------------------------------------------


@given(s=st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_copy_escape_roundtrip(s):
    from pgstream_spark.sources.pgwire import copy_escape, copy_unescape

    wire = copy_escape(s)
    assert "\t" not in wire and "\n" not in wire and "\r" not in wire
    assert copy_unescape(wire) == s


@given(fields=st.lists(st.one_of(st.none(), st.text(max_size=50)), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_copy_row_framing_roundtrip(fields):
    """A full row encoded the way copy_in frames it decodes back exactly,
    preserving NULL vs empty-string vs the literal two-char '\\N'."""
    from pgstream_spark.sources.pgwire import (
        _copy_split_lines,
        copy_escape,
        copy_unescape,
    )

    line = "\t".join("\\N" if f is None else copy_escape(f) for f in fields) + "\n"
    rows, rest = _copy_split_lines(line)
    assert rest == "" and len(rows) == 1
    decoded = [None if f == "\\N" else copy_unescape(f) for f in rows[0].split("\t")]
    assert decoded == list(fields)


# ---------------------------------------------------------------------
# Bloom prefilter: SOUND for any keyset/params (never drops a key that
# is actually present on the dimension side).
# ---------------------------------------------------------------------


@given(
    dim_keys=st.sets(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=30),
    m_bits=st.integers(min_value=2, max_value=10),
    seeds=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=3, unique=True),
)
@settings(**HEAVY_SETTINGS)
def test_bloom_prefilter_soundness_property(spark, dim_keys, m_bits, seeds):
    from pgstream_spark.operators.bloom import bloom_prefilter, keyset_buckets

    dim = spark.createDataFrame([(k,) for k in dim_keys], "dk long")
    fact = spark.createDataFrame([(k,) for k in dim_keys], "fk long")
    kept = bloom_prefilter(
        fact, "fk", keyset_buckets(dim, "dk", m_bits, seeds), m_bits, seeds
    )
    assert {r.fk for r in kept.collect()} == dim_keys


# ---------------------------------------------------------------------
# Integer PageRank: total mass never exceeds MASS and never leaks more
# than the truncation bound (≤ 1 unit per node per division, 3 divisions
# per iteration), for any graph.
# ---------------------------------------------------------------------


@given(
    n=st.integers(min_value=2, max_value=12),
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), max_size=30
    ),
    iters=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_mass_conservation(spark, n, edges, iters):
    from pgstream_spark.operators.graph import MASS, pagerank_integer

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    e = [(a % n, b % n) for a, b in edges]
    edf = spark.createDataFrame(e, "src long, dst long") if e else spark.createDataFrame([], "src long, dst long")
    total = sum(r.rank_units for r in pagerank_integer(nodes, edf, iters).collect())
    assert total <= MASS
    assert total >= 0


# ---------------------------------------------------------------------
# Round-3 session-2 operators: mathematical invariants
# ---------------------------------------------------------------------

intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),     # start
        st.integers(min_value=1, max_value=50),      # width
    ),
    min_size=1,
    max_size=12,
)


@given(ivs=intervals_strategy)
@settings(**HEAVY_SETTINGS)
def test_interval_coverage_matches_python_union(spark, ivs):
    """interval_coverage == a pure-Python interval-union sweep, and the
    covered length can never exceed max(end) − min(start)."""
    from pgstream_spark.operators.interval import interval_coverage

    rows = [(1, i, s, s + w) for i, (s, w) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "k long, id long, s long, e2 long")
    r = interval_coverage(df, "k", "s", "e2", "id").collect()[0]

    # reference sweep
    merged = []
    for s, w in sorted(ivs):
        e = s + w
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    want_cov = sum(e - s for s, e in merged)
    assert r.covered == want_cov
    assert r.n_islands == len(merged)
    span = max(s + w for s, w in ivs) - min(s for s, _ in ivs)
    assert r.covered <= span


@given(
    xs=st.lists(
        st.floats(min_value=0, max_value=1000, allow_nan=False),
        min_size=2, max_size=30,
    ),
    shift=st.integers(min_value=0, max_value=500),
)
@settings(**HEAVY_SETTINGS)
def test_cusum_shift_invariance(spark, xs, shift):
    """Adding a constant to every value leaves CUSUM untouched — the
    statistic depends only on deviations from the mean."""
    from pgstream_spark.operators.changepoint import cusum_changepoint

    base = [(1, t, v) for t, v in enumerate(xs)]
    shifted = [(1, t, v + shift) for t, v in enumerate(xs)]
    a = cusum_changepoint(
        spark.createDataFrame(base, "k long, t long, v double"),
        "v", ["k"], ["t"],
    ).collect()[0]
    b = cusum_changepoint(
        spark.createDataFrame(shifted, "k long, t long, v double"),
        "v", ["k"], ["t"],
    ).collect()[0]
    assert a.cp_pos == b.cp_pos
    assert a.cusum_max == b.cusum_max


@given(
    seq=st.lists(st.sampled_from("abc"), min_size=2, max_size=40),
)
@settings(**HEAVY_SETTINGS)
def test_transition_matrix_is_stochastic(spark, seq):
    """Counts equal transitions in the sequence; probabilities per prev
    state sum to 1 (within the rounding grain)."""
    from pgstream_spark.operators.sessionize import transition_matrix

    rows = [(1, t, s) for t, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    out = transition_matrix(df, "s", ["u"], ["t"]).collect()
    want = {}
    for x, y in zip(seq, seq[1:]):
        want[(x, y)] = want.get((x, y), 0) + 1
    got = {(r.prev_state, r.next_state): r.n for r in out}
    assert got == want
    sums = {}
    for r in out:
        sums[r.prev_state] = sums.get(r.prev_state, 0.0) + r.p
    for v in sums.values():
        assert abs(v - 1.0) < 1e-4


@given(
    sets=st.tuples(
        st.sets(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
        st.sets(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
    )
)
@settings(**HEAVY_SETTINGS)
def test_kmv_underfilled_is_exact_for_any_sets(spark, sets):
    """Whenever |union| < k the KMV estimates are EXACT set statistics."""
    from pgstream_spark.operators.sketch import kmv_pair_stats, kmv_sketch

    sa, sb = sets
    rows = [("a", str(x)) for x in sa] + [("b", str(x)) for x in sb]
    df = spark.createDataFrame(rows, "g string, item string")
    sk = kmv_sketch(df, "item", ["g"], k=256)
    r = kmv_pair_stats(sk, "g", k=256).collect()[0]
    union, inter = sa | sb, sa & sb
    assert r.union_est == float(len(union))
    assert r.n_both == len(inter)
    assert r.jaccard == round(len(inter) / len(union), 6)


@given(
    baskets=st.lists(
        st.sets(st.sampled_from("pqrst"), min_size=1, max_size=4),
        min_size=1, max_size=10,
    )
)
@settings(**HEAVY_SETTINGS)
def test_frequent_pairs_counts_match_python(spark, baskets):
    from itertools import combinations

    from pgstream_spark.operators.basket import frequent_pairs

    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(df, "bk", "it", min_support=1).collect()
    }
    want = {}
    for b in baskets:
        for x, y in combinations(sorted(b), 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    assert got == want


class TestScramProperties:
    """RFC 5802 invariants, password-agnostic: the client proof must
    verify under the genuine server-side algorithm for ANY password,
    and any single-bit proof corruption must fail."""

    @given(
        password=st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=40,
        ),
        salt=st.binary(min_size=8, max_size=24),
    )
    @settings(deadline=None, max_examples=25)
    def test_proof_verifies_server_side(self, password, salt):
        import base64
        import hashlib
        import hmac as hmac_mod

        from pgstream_spark.sources.pgwire import _ScramClient

        sc = _ScramClient(password, nonce="clientN0nce+fixed")
        iters = 2048
        server_nonce = sc.client_nonce + "srvXYZ"
        server_first = (
            f"r={server_nonce},s={base64.b64encode(salt).decode()},i={iters}"
        ).encode()
        final = sc.client_final(server_first).decode()
        attrs = dict(kv.split("=", 1) for kv in final.split(","))
        # server side: derive stored key from the password independently,
        # recover ClientKey from the proof, check its hash
        salted = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), salt, iters
        )
        stored = hashlib.sha256(
            hmac_mod.new(salted, b"Client Key", hashlib.sha256).digest()
        ).digest()
        wp = final[: final.rindex(",p=")]
        auth_msg = ",".join(
            (sc.client_first_bare, server_first.decode(), wp)
        ).encode()
        sig = hmac_mod.new(stored, auth_msg, hashlib.sha256).digest()
        proof = base64.b64decode(attrs["p"])
        recovered = bytes(a ^ b for a, b in zip(proof, sig))
        assert hashlib.sha256(recovered).digest() == stored
        # corrupt one bit → verification must fail
        bad = bytes([proof[0] ^ 0x01]) + proof[1:]
        rec_bad = bytes(a ^ b for a, b in zip(bad, sig))
        assert hashlib.sha256(rec_bad).digest() != stored


@given(
    num=st.integers(min_value=0, max_value=2**40),
    den=st.integers(min_value=1, max_value=2**40),
)
@settings(**SETTINGS)
def test_half_up_div_recipe_is_round_half_up(num, den):
    """The gate-wide half-up recipe `(2*num + den) DIV (2*den)` equals
    true round-half-up of num/den (exact, via Fraction) for all
    non-negative operands — the identity every bps/milli/micro column
    in the inventory rests on."""
    from fractions import Fraction

    got = (2 * num + den) // (2 * den)
    q = Fraction(num, den)
    floor_q, rem = divmod(q.numerator, q.denominator)
    # round-half-up: floor(q) + 1 iff fractional part >= 1/2
    want = floor_q + (1 if Fraction(rem, q.denominator) >= Fraction(1, 2) else 0)
    assert got == want


@given(
    values=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60
    ),
    q_bps=st.integers(min_value=1, max_value=10000),
)
@settings(**SETTINGS)
def test_discrete_quantile_ladder_recipe(values, q_bps):
    """The w16/t33/t34/g65 discrete-quantile ladder — smallest value
    whose 1-based rank satisfies `rn * 10000 >= q_bps * n` — equals the
    ceil-index order statistic, the classical exact discrete quantile."""
    import math

    s = sorted(values)
    n = len(s)
    got = min(
        v for rn, v in enumerate(s, start=1) if rn * 10000 >= q_bps * n
    )
    want = s[math.ceil(q_bps * n / 10000) - 1]
    assert got == want


@given(
    num=st.integers(min_value=-(2**40), max_value=2**40),
    den=st.integers(min_value=1, max_value=2**40),
)
@settings(**SETTINGS)
def test_signed_half_up_needs_abs_decomposition(num, den):
    """The signed form used by g64/t27: sign(num) * half-up(|num|/den)
    equals round-half-away-from-zero — and for negative numerators it
    is exactly what the naive recipe (which relies on truncating DIV)
    would get wrong."""
    from fractions import Fraction

    sign = 1 if num >= 0 else -1
    got = sign * ((2 * abs(num) + den) // (2 * den))
    q = Fraction(abs(num), den)
    floor_q, rem = divmod(q.numerator, q.denominator)
    mag = floor_q + (1 if Fraction(rem, q.denominator) >= Fraction(1, 2) else 0)
    assert got == sign * mag


# ---------------------------------------------------------------------
# Round-10 integer kernels: pure-Python mirrors of the packing /
# selection arithmetic the new operators rely on, checked against
# first-principles models.  These run WITHOUT Spark (the Spark-side
# equivalence is pinned by the operator tests + oracle gates; here we
# prove the arithmetic itself has no edge cases).
# ---------------------------------------------------------------------


@given(
    h=st.integers(min_value=0, max_value=2**32 - 1),
    pos=st.integers(min_value=0, max_value=2**20 - 1),
)
@settings(**SETTINGS)
def test_winnow_key_pack_roundtrip(h, pos):
    """The winnowing key h·2^20 + (2^20−1−pos) must round-trip and
    order exactly as (h asc, pos desc) — the paper's smallest-hash /
    rightmost-position rule — for every in-contract (h, pos)."""
    key = h * (1 << 20) + ((1 << 20) - 1 - pos)
    assert key // (1 << 20) == h
    assert (1 << 20) - 1 - key % (1 << 20) == pos


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=0, max_value=2**20 - 1),
        ),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_winnow_min_key_is_paper_tie_rule(pairs):
    """min(key) over a window == the (smallest hash, rightmost
    position) selection, for any window contents."""
    keys = {h * (1 << 20) + ((1 << 20) - 1 - p): (h, p) for h, p in pairs}
    want = min(h for h, _ in pairs)
    want_pos = max(p for h, p in pairs if h == want)
    assert keys[min(keys)] == (want, want_pos)


@given(
    sig_a=st.tuples(*[st.integers(min_value=0, max_value=2**16 - 1)] * 4),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=3, unique=True),
)
@settings(**SETTINGS)
def test_banded_pigeonhole_recall(sig_a, flips):
    """Any signature within hamming <= 3 of another shares at least one
    of the four 16-bit bands — the exact-recall guarantee
    dhash_candidate_pairs / the perceptual index probe rely on."""
    b = list(sig_a)
    for bit in flips:
        b[bit // 16] ^= 1 << (bit % 16)
    assert any(sig_a[k] == b[k] for k in range(4))


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_roc_auc_histogram_identity(data):
    """The histogram 2U formula Σ_s pos(s)·(2·neg_below(s) + neg(s))
    equals the pairwise Mann–Whitney definition for any labelled
    multiset (ties included)."""
    pos = [s for s, lab in data if lab]
    neg = [s for s, lab in data if not lab]
    if not pos or not neg:
        return
    brute = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    from collections import Counter

    cp, cn = Counter(pos), Counter(neg)
    u2 = 0
    for s in sorted(set(pos) | set(neg)):
        below = sum(v for t, v in cn.items() if t < s)
        u2 += cp.get(s, 0) * (2 * below + cn.get(s, 0))
    assert u2 == brute


@given(
    t=st.integers(min_value=0, max_value=10**6),
    r=st.integers(min_value=0, max_value=10**6),
    big_r=st.integers(min_value=1, max_value=10**6),
    big_t=st.integers(min_value=1, max_value=10**9),
)
@settings(**SETTINGS)
def test_dsir_micro_ratio_exact_and_monotone(t, r, big_r, big_t):
    """The DSIR integer micro-ratio (t+1)(R+B)·10⁶ DIV (r+1)(T+B) stays
    inside BIGINT across the DOCUMENTED envelope — the docstring's
    bound is (t+1)·(R+B) ≤ 9.2·10¹² (hypothesis found that a wider
    claim overflows: t=7·10⁵, R=1.3·10⁷ already exceeds 2⁶³ — past
    that callers use the log columns) — and is monotone in t."""
    B = 10_000
    num = (t + 1) * (big_r + B) * 1_000_000
    assert (t + 1) * (big_r + B) <= 9_200_000_000_000
    assert num < 2**63
    w1 = num // ((r + 1) * (big_t + B))
    w2 = (t + 2) * (big_r + B) * 1_000_000 // ((r + 1) * (big_t + B))
    assert w2 >= w1 >= 0
