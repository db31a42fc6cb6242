"""Property-based semantic tests (hypothesis): randomized inputs checked
against pure-Python reference implementations. Few examples, bounded
sizes — each example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dateng_data_lakes_apache_spark_spark.operators.asof_pivot_sql import asof_join
from dateng_data_lakes_apache_spark_spark.operators.dedup import connected_components

import os as _os

#: 5 examples by default (each runs real Spark jobs); the float-diff
#: audit (VERDICT r7 item 3) re-runs with PROP_MAX_EXAMPLES=300 to hunt
#: tolerance bugs like the r7 MAD one on hundreds of fresh draws.
_SETTINGS = dict(
    max_examples=int(_os.environ.get("PROP_MAX_EXAMPLES", "5")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def edge_lists(draw):
    n = draw(st.integers(min_value=0, max_value=10))
    return draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n),
                st.integers(min_value=0, max_value=n),
            ).filter(lambda e: e[0] != e[1]),
            min_size=0,
            max_size=15,
        )
    )


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


@given(edges=edge_lists())
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.label for r in connected_components(pairs).collect()}
    # min-label propagation must agree with union-find min-root per node
    expected = _union_find_components(edges)
    assert got == expected


@st.composite
def asof_inputs(draw):
    keys = draw(st.lists(st.integers(0, 3), min_size=1, max_size=8))
    left = [(k, draw(st.integers(0, 100))) for k in keys]
    rkeys = draw(st.lists(st.integers(0, 3), min_size=0, max_size=8))
    right = [(k, draw(st.integers(0, 100)), draw(st.integers(0, 999))) for k in rkeys]
    return left, right


@given(data=asof_inputs())
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(left_rows, "k long, lts long")
    right = spark.createDataFrame(right_rows, "k long, rts long, payload long")
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["payload", "rts"],
    ).collect()
    # brute force: latest right row with rts <= lts for the same key;
    # ties on rts resolved like the window does (last in sort order wins —
    # here payload order among equal rts is unspecified, so compare rts only)
    assert len(out) == len(left_rows)
    for r in out:
        cands = [rt for (k, rt, _p) in right_rows if k == r.k and rt <= r.lts]
        expect_rts = max(cands) if cands else None
        assert r.asof_rts == expect_rts


def test_asof_join_rejects_overlapping_columns(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 5)], "k long, lts long, shared long")
    right = spark.createDataFrame([(1, 5, 7)], "k long, rts long, shared long")
    with pytest.raises(ValueError, match="both sides"):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts", right_cols=["rts"])


@st.composite
def user_event_times(draw):
    n_users = draw(st.integers(min_value=1, max_value=3))
    out = []
    eid = 0
    for u in range(n_users):
        times = draw(
            st.lists(
                st.integers(min_value=0, max_value=6 * 3600),  # seconds in 6h
                min_size=1,
                max_size=12,
            )
        )
        for t in times:
            out.append((u, eid, t * 1_000_000))  # µs
            eid += 1
    return out


def _reference_sessions(rows, gap_us=1800 * 1_000_000):
    """Pure-Python sessionizer: split each user's sorted times at gaps
    STRICTLY greater than the threshold."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, _e, us in rows:
        by_user[u].append(us)
    sessions = []
    for u, times in by_user.items():
        times.sort()
        cur = [times[0]]
        for t in times[1:]:
            if t - cur[-1] > gap_us:
                sessions.append((u, cur[0], cur[-1], len(cur)))
                cur = [t]
            else:
                cur.append(t)
        sessions.append((u, cur[0], cur[-1], len(cur)))
    return sorted(sessions)


@given(rows=user_event_times())
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, tmp_path_factory, rows):
    # the registered q_sessionize logic, run on arbitrary event times,
    # must equal the pure-Python splitter: same session boundaries,
    # same event counts, strict-> semantics at exactly-30min gaps
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = df.select(
        "user_id",
        "us",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > 1800 * 1_000_000),
            1,
        ).otherwise(0).alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("is_new").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n)
        for r in flagged.select(
            "user_id", "us", F.sum("is_new").over(w2).alias("seq")
        )
        .groupBy("user_id", "seq")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert got == _reference_sessions(rows)


@st.composite
def event_logs(draw):
    """Random (user, stage, minute) logs over a tiny key space so stage
    interleavings (purchase-before-view etc.) are actually generated."""
    return draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4),           # user
                st.sampled_from(["view", "click", "purchase"]),  # stage
                st.integers(min_value=0, max_value=30),          # minute
            ),
            min_size=0,
            max_size=25,
        )
    )


def _funnel_reference(rows):
    """Pure-Python first-touch ordered funnel: per user, earliest view,
    then earliest click strictly after it, then earliest purchase
    strictly after that. Returns the per-stage user sets."""
    by_user: dict[int, list[tuple[str, int]]] = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((s, t))
    reached = {"view": set(), "click": set(), "purchase": set()}
    for u, evs in by_user.items():
        prev = None
        for stage in ("view", "click", "purchase"):
            ts = [t for s, t in evs if s == stage and (prev is None or t > prev)]
            if not ts:
                break
            prev = min(ts)
            reached[stage].add(u)
    return reached


@given(rows=event_logs())
@settings(**_SETTINGS)
def test_funnel_matches_reference(spark, rows):
    import datetime as dt

    from pyspark.sql import functions as F

    from dateng_data_lakes_apache_spark_spark.operators import events_analytics as ea

    if not rows:
        return
    data = [
        (u, s, dt.datetime(2024, 1, 1, 0, m)) for u, s, m in rows
    ]
    ev = spark.createDataFrame(data, "user_id long, event_type string, ts timestamp")
    expected = _funnel_reference(rows)
    prior = None
    for stage in ea._FUNNEL_STAGES:
        cur = ev.where(F.col("event_type") == stage)
        if prior is not None:
            cur = cur.join(prior, "user_id").where(F.col("ts") > F.col("t_prev"))
        reached = cur.groupBy("user_id").agg(F.min("ts").alias("t_prev"))
        got = {r.user_id for r in reached.collect()}
        assert got == expected[stage], f"stage {stage}: {got} != {expected[stage]}"
        prior = reached


def _triangle_reference(edges):
    adj: dict[int, set[int]] = {}
    canon = {(min(u, v), max(u, v)) for u, v in edges}
    for u, v in canon:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    count = 0
    for a, b in canon:
        count += len([c for c in adj[a] & adj[b] if c > b])
    return count


@given(edges=edge_lists())
@settings(**_SETTINGS)
def test_triangle_count_matches_reference(spark, edges):
    from dateng_data_lakes_apache_spark_spark.operators.graph import triangle_count

    canon = sorted({(min(u, v), max(u, v)) for u, v in edges})
    if not canon:
        return
    e = spark.createDataFrame(canon, "a long, b long")
    got = triangle_count(e).collect()[0][0]
    assert got == _triangle_reference(edges)


@st.composite
def point_sets(draw):
    return draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),   # pc
                st.integers(min_value=0, max_value=20),   # q
            ),
            min_size=0,
            max_size=25,
        )
    )


@given(pts=point_sets())
@settings(**_SETTINGS)
def test_skyline_matches_bruteforce_dominance(spark, pts):
    from dateng_data_lakes_apache_spark_spark.operators.analytics import skyline_2d

    if not pts:
        return
    df = spark.createDataFrame(
        [(int(pc), float(q)) for pc, q in pts], "pc bigint, q double"
    )
    got = sorted((r.pc, r.q) for r in skyline_2d(df, band=8).collect())

    def dominated(a):
        return any(
            b[0] <= a[0] and b[1] >= a[1] and (b[0] < a[0] or b[1] > a[1])
            for b in pts
        )

    want = sorted((pc, float(q)) for pc, q in pts if not dominated((pc, q)))
    assert got == want


@st.composite
def key_sets(draw):
    return draw(
        st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=40)
    )


@given(ks=key_sets())
@settings(**_SETTINGS)
def test_id_gaps_matches_naive_lag(spark, ks):
    from dateng_data_lakes_apache_spark_spark.operators.data_quality import id_gaps

    if not ks:
        return
    df = spark.createDataFrame([(int(k),) for k in ks], "k bigint")
    got = sorted(
        (r.gap_start, r.gap_end, r.gap_len) for r in id_gaps(df, bucket_w=16).collect()
    )
    uniq = sorted(set(ks))
    want = [
        (prev + 1, cur - 1, cur - prev - 1)
        for prev, cur in zip(uniq, uniq[1:])
        if cur - prev > 1
    ]
    assert got == sorted(want)


@given(
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=300)
)
def test_clamped_scan_reflection_identity_property(deltas):
    """b = S - min(0, running_min(S)) == sequential max(0, b+d) for ANY
    integer delta sequence (the q_clamped_balance kernel identity)."""
    import numpy as np

    d = np.array(deltas, dtype="int64")
    s = np.cumsum(d)
    b_vec = s - np.minimum(np.minimum.accumulate(s), 0)
    bal = 0
    for x, got in zip(deltas, b_vec.tolist()):
        bal = max(0, bal + x)
        assert got == bal


@given(st.integers(min_value=0, max_value=200_000))
def test_business_day_closed_form_property(day):
    """5*((d+4) div 7) + min((d+4) mod 7, 5) - 3 counts weekdays in
    [epoch, day] for ANY day number (the q_business_days helper)."""
    import datetime

    g = 5 * ((day + 4) // 7) + min((day + 4) % 7, 5) - 3
    base = datetime.date(1970, 1, 1)
    if day <= 3000:
        # exact brute-force weekday count for tractable ranges
        brute = sum(
            1
            for k in range(day + 1)
            if (base + datetime.timedelta(days=k)).weekday() < 5
        )
        assert g == brute
    else:
        # spot-check consistency: g(day) - g(day-7) must be exactly 5
        g_prev = 5 * ((day - 7 + 4) // 7) + min((day - 7 + 4) % 7, 5) - 3
        assert g - g_prev == 5


@st.composite
def penny_books(draw):
    """Random order books: 2-dp totals generated as exact integer cents
    (written as cents/100 doubles, the catalog's money encoding) and
    occasionally-duplicated line PKs to exercise the dedup pre-agg."""
    n_orders = draw(st.integers(min_value=1, max_value=4))
    orders, lines = [], []
    for okey in range(1, n_orders + 1):
        orders.append((okey, draw(st.integers(min_value=1, max_value=50_000))))
        for ln in range(1, draw(st.integers(min_value=1, max_value=6)) + 1):
            for _ in range(draw(st.integers(min_value=1, max_value=2))):
                lines.append((okey, ln, draw(st.integers(min_value=1, max_value=50))))
    return orders, lines


def _penny_reference(orders, lines):
    """Pure-Python largest-remainder allocation: floor every share, hand
    leftover cents to the largest fractional remainders, ties to the
    lower line number. PK-duplicate quantities pre-sum like the query."""
    from collections import defaultdict

    qty: dict[tuple[int, int], int] = defaultdict(int)
    for k, ln, q in lines:
        qty[(k, ln)] += q
    out = {}
    for okey, t in orders:
        items = sorted((ln, q) for (k, ln), q in qty.items() if k == okey)
        if not items:
            continue
        qs = sum(q for _, q in items)
        base = {ln: t * q // qs for ln, q in items}
        rem = {ln: (t * q) % qs for ln, q in items}
        leftover = t - sum(base.values())
        for i, (ln, _q) in enumerate(sorted(items, key=lambda x: (-rem[x[0]], x[0]))):
            if i < leftover:
                base[ln] += 1
        for ln, v in base.items():
            out[(okey, ln)] = v
    return out


@given(book=penny_books())
@settings(**_SETTINGS)
def test_penny_allocation_matches_reference_and_conserves(
    spark, tmp_path_factory, book
):
    """The REGISTERED q_penny_allocation, driven through tmp parquet
    tables, must reproduce the pure-Python largest-remainder allocator
    exactly AND reconcile per-order: sum(alloc_cents) == round(total*100)
    for every generated order book."""
    import uuid
    from collections import defaultdict

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    orders, lines = book
    sf = str(tmp_path_factory.mktemp("penny") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(k, c / 100.0) for k, c in orders], "o_orderkey long, o_totalprice double"
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber long, l_quantity long"
    ).write.parquet(f"{sf}/lineitem.parquet")
    rows = get_queries()["q_penny_allocation"](spark, sf).collect()
    got = {(r.l_orderkey, r.l_linenumber): r.alloc_cents for r in rows}
    assert got == _penny_reference(orders, lines)
    per_order: dict[int, int] = defaultdict(int)
    for (okey, _ln), cents in got.items():
        per_order[okey] += cents
    assert per_order == {k: c for k, c in orders}


@st.composite
def weighted_rows(draw):
    return draw(
        st.lists(
            st.tuples(
                st.sampled_from(["A", "N", "R"]),
                st.integers(min_value=1, max_value=10),       # quantity
                st.integers(min_value=0, max_value=100_000),  # price cents
            ),
            min_size=1,
            max_size=40,
        )
    )


def _weighted_median_reference(rows):
    """Smallest qty whose cumulative price weight reaches half the group
    total — exact integer-cents arithmetic (2*cum >= tot, zero-weight
    values eligible), mirroring the query's DECIMAL(30,8) cut."""
    from collections import defaultdict

    w: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for rf, q, pc in rows:
        w[rf][q] += pc
    out = {}
    for rf, d in w.items():
        tot = sum(d.values())
        cum = 0
        for q in sorted(d):
            cum += d[q]
            if 2 * cum >= tot:
                out[rf] = q
                break
    return out


@given(rows=weighted_rows())
@settings(**_SETTINGS)
def test_weighted_median_matches_reference(spark, tmp_path_factory, rows):
    """The REGISTERED q_weighted_median on arbitrary 2-dp weights must
    pick the same boundary row as the integer-cents reference — the
    exactness the DECIMAL(30,8) accumulation is there to guarantee."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("wmed") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(rf, q, pc / 100.0) for rf, q, pc in rows],
        "l_returnflag string, l_quantity long, l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.l_returnflag: r.wmedian_qty
        for r in get_queries()["q_weighted_median"](spark, sf).collect()
    }
    assert got == _weighted_median_reference(rows)


@st.composite
def customer_balances(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    bals = draw(
        st.lists(
            st.integers(min_value=-99_999, max_value=99_999),  # balance cents
            min_size=n,
            max_size=n,
        )
    )
    return [(i + 1, c) for i, c in enumerate(bals)]


def _ntile_reference(rows, k=4):
    """Plain global-window reference: sort by (acctbal, custkey), global
    row numbers, SQL NTILE tile sizes (first N mod k tiles get one extra
    row), percent_rank/cume_dist closed-form on the unique total order."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(ordered)
    q, r = divmod(n, k)
    out = {}
    for i, (ck, _bal) in enumerate(ordered):
        rn = i + 1
        if q == 0:
            tile = rn
        elif rn <= (q + 1) * r:
            tile = (rn - 1) // (q + 1) + 1
        else:
            tile = r + (rn - (q + 1) * r - 1) // q + 1
        pct = 0.0 if n == 1 else (rn - 1) / (n - 1)
        out[ck] = (tile, pct, rn / n)
    return out


@given(rows=customer_balances())
@settings(**_SETTINGS)
def test_ntile_global_matches_plain_window_reference(
    spark, tmp_path_factory, rows
):
    """The two-pass range-partition + offset formulation of
    q_ntile_global must equal a plain global ranking: exact tile
    assignments and row-derived fractions for arbitrary (including
    duplicate-balance and single-row) inputs."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("ntile") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(ck, c / 100.0) for ck, c in rows],
        "c_custkey long, c_acctbal double",
    ).write.parquet(f"{sf}/customer.parquet")
    got = {
        r.c_custkey: (r.quartile, r.pct_rank, r.cume)
        for r in get_queries()["q_ntile_global"](spark, sf).collect()
    }
    want = _ntile_reference(rows)
    assert set(got) == set(want)
    for ck, (tile, pct, cume) in want.items():
        gt, gp, gc = got[ck]
        assert gt == tile, f"custkey {ck}: tile {gt} != {tile}"
        # fractions are rounded to 6dp in the query; allow only the
        # rounding, never an off-by-one-row shift (>= 1/n >= 0.025 here)
        assert gp is not None and abs(gp - pct) < 2e-6
        assert gc is not None and abs(gc - cume) < 2e-6


def _winsor_reference(rows):
    """Discrete-order-statistic winsorized mean in exact integer cents:
    cuts at ranks ceil(.05n)/ceil(.95n) computed with the SAME double
    multiplication the query's F.ceil(0.05 * n) performs."""
    import math
    from collections import defaultdict

    by: dict[str, list[int]] = defaultdict(list)
    for rf, pc in rows:
        by[rf].append(pc)
    out = {}
    for rf, vals in by.items():
        vals.sort()
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1]
        hi = vals[math.ceil(0.95 * n) - 1]
        n_clamped = sum(1 for v in vals if v < lo or v > hi)
        clamped = [min(max(v, lo), hi) for v in vals]
        out[rf] = (n, n_clamped, (sum(vals) / 100) / n, (sum(clamped) / 100) / n)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=0, max_value=1_000_000),  # price cents
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_winsorize_matches_exact_reference(spark, tmp_path_factory, rows):
    """q_winsorize's ranked-window cut points and decimal-sum means must
    equal the integer-cents reference bit-for-bit (the /100 and /n
    divisions are the same two correctly-rounded double ops in both)."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("winsor") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(rf, i + 1, 1, pc / 100.0) for i, (rf, pc) in enumerate(rows)],
        "l_returnflag string, l_orderkey long, l_linenumber long, "
        "l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.n, r.n_clamped, r.raw_mean, r.winsor_mean)
        for r in get_queries()["q_winsorize"](spark, sf).collect()
    }
    assert got == _winsor_reference(rows)


def _round4_half_up(x: float) -> float:
    """Mirror Spark's F.round(col, 4) on doubles: BigDecimal.valueOf
    takes the SHORTEST decimal repr (same value as Python's repr), then
    setScale(4, HALF_UP). Differences of 2-dp doubles are NOT exactly
    representable (e.g. 9542.93 - 8929.8 = 613.1300000000001), so the
    reference must round exactly like the query before comparing."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _mad_reference(rows):
    """Discrete-median MAD screen in the query's own float arithmetic:
    element picks at rank ceil(n/2), |v-med| doubles, 4.4478*mad cut;
    med/mad rounded to 4 dp exactly as the query rounds them."""
    import math
    from collections import defaultdict

    by: dict[str, list[float]] = defaultdict(list)
    for rf, pc in rows:
        by[rf].append(pc / 100.0)
    out = {}
    for rf, vals in by.items():
        n = len(vals)
        med = sorted(vals)[math.ceil(n / 2) - 1]
        ds = [abs(v - med) for v in vals]
        mad = sorted(ds)[math.ceil(n / 2) - 1]
        out[rf] = (
            n,
            _round4_half_up(med),
            _round4_half_up(mad),
            sum(1 for d in ds if d > 4.4478 * mad),
        )
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=0, max_value=1_000_000),  # price cents
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_mad_outlier_matches_exact_reference(spark, tmp_path_factory, rows):
    """q_mad_outlier's two ranked-window median picks and the outlier
    count must match the reference on arbitrary 2-dp prices, including
    all-equal groups (mad=0 -> zero outliers)."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("mad") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(rf, i + 1, 1, pc / 100.0) for i, (rf, pc) in enumerate(rows)],
        "l_returnflag string, l_orderkey long, l_linenumber long, "
        "l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.n, r.med, r.mad, r.n_outliers)
        for r in get_queries()["q_mad_outlier"](spark, sf).collect()
    }
    want = _mad_reference(rows)
    assert set(got) == set(want)
    for rf, (n, med, mad, n_out) in want.items():
        gn, gmed, gmad, gout = got[rf]
        assert (gn, gout) == (n, n_out), f"{rf}: counts {got[rf]} != {want[rf]}"
        # reference med/mad are HALF_UP-rounded to 4dp exactly like the
        # query (see _round4_half_up) so equality is bit-exact
        assert abs(gmed - med) < 1e-12 and abs(gmad - mad) < 1e-12


def _qnorm_reference(rows):
    """Rank-to-rank quantile mapping: error value at global rank rn maps
    to the view value at rank ceil(rn*m/n), all in exact integers.
    NULL values are excluded from BOTH sides before ranking — the
    order-statistics convention the query adopted after ADVICE r7
    (Spark and DuckDB disagree on where NULLs rank, so they must never
    enter the rankings at all)."""
    src = sorted((v, eid) for eid, t, v in rows if t == "error" and v is not None)
    ref = sorted((v, eid) for eid, t, v in rows if t == "view" and v is not None)
    n, m = len(src), len(ref)
    if n == 0 or m == 0:
        return {}
    return {
        eid: (v, ref[(rn * m + n - 1) // n - 1][0])
        for rn, (v, eid) in enumerate(src, start=1)
    }


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["error", "view", "click"]),  # click = ignored noise
            st.one_of(
                st.integers(min_value=0, max_value=500),  # value (ties likely)
                st.none(),                                # NULLs in every subset
            ),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_quantile_normalize_matches_rank_reference(
    spark, tmp_path_factory, rows
):
    """q_quantile_normalize's bigint rank mapping (rn*m + n - 1) div n
    must equal the pure-Python rank-to-rank lookup for arbitrary
    distributions, tie-heavy values, NULL values (skipped on both
    sides), and empty src/ref sides."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("qnorm") / uuid.uuid4().hex[:8])
    data = [
        (i + 1, t, None if v is None else float(v), dt.datetime(2024, 1, 1))
        for i, (t, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "event_id long, event_type string, value double, ts timestamp"
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.event_id: (r.orig_value, r.normalized_value)
        for r in get_queries()["q_quantile_normalize"](spark, sf).collect()
    }
    assert got == _qnorm_reference(
        [
            (i + 1, t, None if v is None else float(v))
            for i, (t, v) in enumerate(rows)
        ]
    )


@st.composite
def asof_event_streams(draw):
    """(event_id, user_id, type, minute): minutes span past both the
    1 h nearest window and the 1 day staleness tolerance, with heavy
    same-minute ties."""
    return draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),                    # user
                st.sampled_from(["error", "purchase", "click", "view"]),  # type
                st.integers(min_value=0, max_value=3000),                 # minute
            ),
            min_size=0,
            max_size=30,
        )
    )


def _nearest_reference(rows, tol_us=3_600_000_000):
    """Closest purchase within ±1 h per error; ties to the earlier side
    (back); equal-ts tie rules mirror the window orders: back = max
    (ts, id) among ts<=err, fwd = min (ts, id) among ts>=err."""
    from collections import defaultdict

    purs = defaultdict(list)
    for eid, uid, t, us in rows:
        if t == "purchase":
            purs[uid].append((us, eid))
    out = {}
    for eid, uid, t, us in rows:
        if t != "error":
            continue
        back = max(((p, i) for p, i in purs[uid] if p <= us), default=None)
        fwd = min(((p, i) for p, i in purs[uid] if p >= us), default=None)
        bd = us - back[0] if back else None
        fd = fwd[0] - us if fwd else None
        bid = back[1] if back and bd <= tol_us else None
        fid = fwd[1] if fwd and fd <= tol_us else None
        if bid is not None and (fid is None or bd <= fd):
            out[eid] = (bid, bd, "back")
        elif fid is not None:
            out[eid] = (fid, fd, "fwd")
        else:
            out[eid] = (None, None, None)
    return out


def _write_events(spark, tmp_path_factory, rows, label):
    import datetime as dt
    import uuid

    sf = str(tmp_path_factory.mktemp(label) / uuid.uuid4().hex[:8])
    base = dt.datetime(2024, 1, 1)
    data = [
        (i + 1, uid, t, base + dt.timedelta(minutes=m), 1.0)
        for i, (uid, t, m) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).write.parquet(f"{sf}/events.parquet")
    return sf, [
        (i + 1, uid, t, int((base + dt.timedelta(minutes=m)).timestamp() * 1_000_000))
        for i, (uid, t, m) in enumerate(rows)
    ]


@given(rows=asof_event_streams())
@settings(**_SETTINGS)
def test_asof_nearest_matches_bidirectional_reference(
    spark, tmp_path_factory, rows
):
    """q_join_asof_nearest's one-pass dual-window formulation must equal
    the brute-force bidirectional pick: closest purchase within ±1 h,
    ties to the back side, equal-ts ties by the window id rules."""
    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf, tagged = _write_events(spark, tmp_path_factory, rows, "nearest")
    got = {
        r.error_id: (r.nearest_purchase_id, r.delta_us, r.direction)
        for r in get_queries()["q_join_asof_nearest"](spark, sf).collect()
    }
    assert got == _nearest_reference(tagged)


@given(rows=asof_event_streams())
@settings(**_SETTINGS)
def test_asof_tolerance_matches_staleness_reference(
    spark, tmp_path_factory, rows
):
    """q_join_asof_tolerance: latest click at-or-before each purchase,
    nulled when more than 1 day stale. Click TIMESTAMPS compare exactly;
    ids are skipped (equal-ts click ties are unordered by design — the
    same caveat the base asof property test documents)."""
    import datetime as dt

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf, tagged = _write_events(spark, tmp_path_factory, rows, "tol")
    got = {
        r.event_id: r.click_ts_fresh
        for r in get_queries()["q_join_asof_tolerance"](spark, sf).collect()
    }
    want = {}
    clicks = {}
    for eid, uid, t, us in tagged:
        if t == "click":
            clicks.setdefault(uid, []).append(us)
    for eid, uid, t, us in tagged:
        if t != "purchase":
            continue
        cand = [c for c in clicks.get(uid, []) if c <= us]
        latest = max(cand) if cand else None
        if latest is not None and latest >= us - 86_400_000_000:
            want[eid] = dt.datetime.utcfromtimestamp(latest / 1_000_000).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
        else:
            want[eid] = None
    assert got == want


def _ks_reference(rows):
    """Pure-Python two-sample KS on integer values: D evaluated at each
    distinct value AFTER all its ties (the per-distinct-value ECDF),
    NULLs excluded from both samples."""
    a = sorted(v for t, v in rows if t == "error" and v is not None)
    b = sorted(v for t, v in rows if t == "view" and v is not None)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return None
    d = 0.0
    for v in sorted(set(a) | set(b)):
        fa = sum(1 for x in a if x <= v) / n
        fb = sum(1 for x in b if x <= v) / m
        d = max(d, abs(fa - fb))
    return n, m, d


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["error", "view", "click"]),
            st.one_of(st.integers(min_value=0, max_value=30), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ks_test_matches_ecdf_reference(spark, tmp_path_factory, rows):
    """q_ks_test's distinct-value cumulative construction must equal the
    brute-force per-value ECDF max-difference on tie-heavy integer data
    with NULLs in both samples and empty-sample degeneracy."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("ks") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, t, None if v is None else float(v), dt.datetime(2024, 1, 1))
            for i, (t, v) in enumerate(rows)
        ],
        "event_id long, event_type string, value double, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = get_queries()["q_ks_test"](spark, sf).collect()
    want = _ks_reference([(t, v) for _, (t, v) in enumerate(rows)])
    if want is None:
        assert got == []
        return
    n, m, d = want
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.m) == (n, m)
    assert abs(r.ks_d - d) < 1e-6 + 1e-12  # engine rounds to 6 dp


def _mw_reference(rows):
    """Pure-Python tie-corrected Mann-Whitney: average ranks over the
    combined sample, U1 = R1 - n1(n1+1)/2, z with the tie-corrected
    variance; NULLs excluded. Returns None when a sample is empty or
    the combined size is < 2."""
    a = sorted(v for t, v in rows if t == "error" and v is not None)
    b = sorted(v for t, v in rows if t == "view" and v is not None)
    n1, n2 = len(a), len(b)
    nn = n1 + n2
    if n1 == 0 or n2 == 0 or nn < 2:
        return None
    comb = sorted(a + b)
    # average rank per value
    first = {}
    for i, v in enumerate(comb, start=1):
        first.setdefault(v, []).append(i)
    avg_rank = {v: sum(ix) / len(ix) for v, ix in first.items()}
    r1 = sum(avg_rank[v] for v in a)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    tie3 = sum(len(ix) ** 3 - len(ix) for ix in first.values())
    var = n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1)))
    z = None if var <= 0 else (u1 - n1 * n2 / 2.0) / var**0.5
    return n1, n2, u1, z


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["error", "view", "click"]),
            st.one_of(st.integers(min_value=0, max_value=20), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_mann_whitney_matches_rank_reference(spark, tmp_path_factory, rows):
    """q_mann_whitney's closed-form average ranks over cumulative
    distinct-value counts must equal the textbook per-row average-rank
    construction, including the all-tied zero-variance -> NULL z."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("mw") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, t, None if v is None else float(v), dt.datetime(2024, 1, 1))
            for i, (t, v) in enumerate(rows)
        ],
        "event_id long, event_type string, value double, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = get_queries()["q_mann_whitney"](spark, sf).collect()
    want = _mw_reference([(t, v) for (t, v) in rows])
    if want is None:
        assert got == []
        return
    n1, n2, u1, z = want
    assert len(got) == 1
    r = got[0]
    assert (r.n1, r.n2) == (n1, n2)
    assert abs(r.u1 - u1) < 1e-9
    if z is None:
        assert r.z is None
    else:
        assert r.z is not None and abs(r.z - z) < 1e-6 + 1e-9


def _spearman_reference(rows):
    """Pure-Python Spearman with average ranks per group; None for
    zero-variance groups; NULL pairs excluded."""
    from collections import defaultdict

    by = defaultdict(list)
    for rf, q, p in rows:
        if q is not None and p is not None:
            by[rf].append((q, p))
    out = {}
    for rf, vals in by.items():
        def avg_ranks(xs):
            order = sorted(range(len(xs)), key=lambda i: xs[i])
            ranks = [0.0] * len(xs)
            i = 0
            while i < len(order):
                j = i
                while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
                    j += 1
                r = (i + j) / 2.0 + 1.0
                for k in range(i, j + 1):
                    ranks[order[k]] = r
                i = j + 1
            return ranks

        rx = avg_ranks([q for q, _ in vals])
        ry = avg_ranks([p for _, p in vals])
        n = len(vals)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(x * x for x in rx)
        syy = sum(y * y for y in ry)
        sxy = sum(x * y for x, y in zip(rx, ry))
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        rho = None if vx <= 0 or vy <= 0 else (n * sxy - sx * sy) / (vx * vy) ** 0.5
        out[rf] = (n, rho)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.one_of(st.integers(min_value=1, max_value=10), st.none()),
            st.one_of(st.integers(min_value=0, max_value=1000), st.none()),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_spearman_matches_avg_rank_reference(spark, tmp_path_factory, rows):
    """q_spearman_corr's rank()+(ties-1)/2 windows must equal textbook
    average ranks, on tie-heavy data with NULLs in either column and
    all-tied (zero-variance -> NULL) groups."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("sp") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (
                rf,
                i + 1,
                1,
                None if q is None else float(q),
                None if p is None else p / 100.0,
            )
            for i, (rf, q, p) in enumerate(rows)
        ],
        "l_returnflag string, l_orderkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.n, r.spearman_rho)
        for r in get_queries()["q_spearman_corr"](spark, sf).collect()
    }
    want = _spearman_reference(
        [(rf, q, None if p is None else p / 100.0) for rf, q, p in rows]
    )
    assert set(got) == set(want)
    for rf, (n, rho) in want.items():
        gn, grho = got[rf]
        assert gn == n
        if rho is None:
            assert grho is None
        else:
            assert grho is not None and abs(grho - rho) < 1e-6 + 1e-9


def _anova_reference(rows):
    """Exact one-way ANOVA from integer cents via Fraction — boundary
    cases (zero SSW, singleton groups) are exact, never float-fuzzy
    (the r7 MAD float-diff discipline)."""
    from fractions import Fraction

    groups: dict[str, list[int]] = {}
    for g, cents in rows:
        if cents is not None:
            groups.setdefault(g, []).append(cents)
    if not groups:
        return None
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    ss_all = Fraction(sum(c * c for v in groups.values() for c in v), 10000)
    s_all = Fraction(sum(c for v in groups.values() for c in v), 100)
    t = sum(
        (Fraction(sum(v), 100) ** 2) / len(v) for v in groups.values()
    )
    ssb = t - s_all**2 / n
    ssw = ss_all - t
    # Mirror the engine's FLOAT relative zero-SSW guard (same double
    # expression: in-order fold over grp-sorted per-group terms).
    ft = 0.0
    for grp in sorted(groups):
        v = groups[grp]
        fs = float(Fraction(sum(v), 100))
        ft = ft + fs * fs / len(v)
    fss = 0.0
    for grp in sorted(groups):
        v = groups[grp]
        fss = fss + float(Fraction(sum(c * c for c in v), 10000))
    fssw = fss - ft
    ssw_bad = fssw <= 1e-9 * (abs(fss) + abs(ft) + 1e-300)
    f = (
        None
        if (k <= 1 or n <= k or ssw <= 0 or ssw_bad)
        else float((ssb / (k - 1)) / (ssw / (n - k)))
    )
    return k, n, float(ssb), float(ssw), f


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            st.one_of(st.integers(min_value=0, max_value=500000), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_anova_f_matches_fraction_reference(spark, tmp_path_factory, rows):
    """q_anova_f's decimal power sums + in-order fold must equal the
    exact Fraction-arithmetic ANOVA, including the k<=1 / n<=k /
    zero-SSW -> NULL guards (exact on both sides: the engine's sums are
    decimal, the reference's are rational)."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("anova") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, g, None if c is None else c / 100.0)
            for i, (g, c) in enumerate(rows)
        ],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    got = get_queries()["q_anova_f"](spark, sf).collect()
    want = _anova_reference(rows)
    if want is None:
        # global agg over an empty frame still yields one row (k=0)
        assert len(got) == 1 and got[0].k == 0
        return
    k, n, ssb, ssw, f = want
    assert len(got) == 1
    r = got[0]
    assert (r.k, r.n) == (k, n)
    assert abs(r.ss_between - ssb) < 1e-4 + 1e-9 * abs(ssb)
    assert abs(r.ss_within - ssw) < 1e-4 + 1e-9 * abs(ssw)
    if f is None:
        assert r.f_stat is None
    else:
        assert abs(r.f_stat - f) < 1e-6 + 1e-9 * abs(f)


def _monthly_cents(rows):
    """(yr, mo) -> (qty_cents, rev_cents) exact integer sums."""
    m: dict[tuple[int, int], list[int]] = {}
    for yr, mo, qc, rc in rows:
        cur = m.setdefault((yr, mo), [0, 0])
        cur[0] += qc
        cur[1] += rc
    return m


def _kendall_reference(rows):
    """Exact tau-b per year over the integer-cents monthly series."""
    m = _monthly_cents(rows)
    out = {}
    for yr in {y for (y, _) in m}:
        pts = sorted((mo, q, r) for (y, mo), (q, r) in m.items() if y == yr)
        conc = disc = tie_x = tie_y = n0 = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                _, q1, r1 = pts[i]
                _, q2, r2 = pts[j]
                n0 += 1
                if q1 == q2:
                    tie_x += 1
                if r1 == r2:
                    tie_y += 1
                if (q1 < q2 and r1 < r2) or (q1 > q2 and r1 > r2):
                    conc += 1
                elif (q1 < q2 and r1 > r2) or (q1 > q2 and r1 < r2):
                    disc += 1
        if n0 == 0:
            continue
        ex, ey = n0 - tie_x, n0 - tie_y
        tau = None if ex <= 0 or ey <= 0 else (conc - disc) / (ex * ey) ** 0.5
        out[yr] = (n0, conc, disc, tau)
    return out


def _theil_sen_reference(rows):
    """Exact median-of-slopes per year (Fraction slopes, two-middle avg)."""
    from fractions import Fraction

    m = _monthly_cents(rows)
    out = {}
    for yr in {y for (y, _) in m}:
        pts = sorted((mo, r) for (y, mo), (_, r) in m.items() if y == yr)
        slopes = sorted(
            Fraction(r2 - r1, 100 * (m2 - m1))
            for i, (m1, r1) in enumerate(pts)
            for (m2, r2) in pts[i + 1 :]
        )
        if not slopes:
            continue
        np_ = len(slopes)
        mid = (slopes[(np_ - 1) // 2] + slopes[np_ // 2]) / 2
        out[yr] = (np_, float(mid))
    return out


_MONTHLY_ROWS = st.lists(
    st.tuples(
        st.sampled_from([1995, 1996]),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=5000),
        st.integers(min_value=0, max_value=1000000),
    ),
    min_size=0,
    max_size=30,
)


def _write_lineitem(spark, tmp_path_factory, rows, tag):
    import datetime as dt
    import uuid

    sf = str(tmp_path_factory.mktemp(tag) / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, dt.datetime(yr, mo, 1 + i % 28), qc / 100.0, rc / 100.0)
            for i, (yr, mo, qc, rc) in enumerate(rows)
        ],
        "l_orderkey long, l_shipdate timestamp, l_quantity double,"
        " l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    return sf


@given(rows=_MONTHLY_ROWS)
@settings(**_SETTINGS)
def test_kendall_tau_matches_pair_reference(spark, tmp_path_factory, rows):
    """q_kendall_tau's join-pair concordance counting must equal the
    brute-force per-pair enumeration over exact integer-cents monthly
    sums, including the all-tied -> NULL tau guard."""
    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = _write_lineitem(spark, tmp_path_factory, rows, "kt")
    got = {
        r.yr: (r.n_pairs, r.concordant, r.discordant, r.tau_b)
        for r in get_queries()["q_kendall_tau"](spark, sf).collect()
    }
    want = _kendall_reference(rows)
    assert set(got) == set(want)
    for yr, (n0, conc, disc, tau) in want.items():
        gn, gc, gd, gt = got[yr]
        assert (gn, gc, gd) == (n0, conc, disc)
        if tau is None:
            assert gt is None
        else:
            assert abs(gt - tau) < 1e-6 + 1e-12


@given(rows=_MONTHLY_ROWS)
@settings(**_SETTINGS)
def test_theil_sen_matches_median_reference(spark, tmp_path_factory, rows):
    """q_theil_sen's rank-pinned median must equal the exact Fraction
    median of all pairwise slopes (two-middle average on even counts)."""
    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = _write_lineitem(spark, tmp_path_factory, rows, "ts")
    got = {
        r.yr: (r.n_pairs, r.ts_slope)
        for r in get_queries()["q_theil_sen"](spark, sf).collect()
    }
    want = _theil_sen_reference(rows)
    assert set(got) == set(want)
    for yr, (np_, slope) in want.items():
        gn, gs = got[yr]
        assert gn == np_
        assert abs(gs - slope) < 1e-6 + 1e-9 * abs(slope)


def _drawdown_reference(rows):
    """Exact integer walk: per user running sum of cents deltas, running
    peak, max(peak - running)."""
    out = {}
    by_user: dict[int, list[int]] = {}
    for uid, cents in rows:
        if cents is not None:
            by_user.setdefault(uid, []).append(cents - 5000)
    for uid, deltas in by_user.items():
        running = peak = 0
        best_peak = None
        best_dd = None
        for i, dlt in enumerate(deltas):
            running += dlt
            peak = running if i == 0 else max(peak, running)
            best_peak = peak if best_peak is None else max(best_peak, peak)
            dd = peak - running
            best_dd = dd if best_dd is None else max(best_dd, dd)
        out[uid] = (len(deltas), best_peak, best_dd)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.one_of(st.integers(min_value=0, max_value=20000), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_max_drawdown_matches_walk_reference(spark, tmp_path_factory, rows):
    """q_max_drawdown's two stacked windows must equal the literal
    peak-tracking walk — exact integers, zero tolerance."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("dd") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, uid, None if c is None else c / 100.0, dt.datetime(2024, 1, 1))
            for i, (uid, c) in enumerate(rows)
        ],
        "event_id long, user_id long, value double, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.user_id: (r.n_events, r.peak_cents, r.max_drawdown_cents)
        for r in get_queries()["q_max_drawdown"](spark, sf).collect()
    }
    assert got == _drawdown_reference(rows)


def _seasonal_reference(rows):
    """Exact Fraction additive decomposition over the daily cents sums:
    centered 7-ROW trend over the day-ordered series, per-dow
    avg(rev - trend) on full windows only."""
    from fractions import Fraction

    daily: dict[int, int] = {}
    for d, cents in rows:
        if cents is not None:
            daily[d] = daily.get(d, 0) + cents
    days = sorted(daily)
    out: dict[int, list] = {}
    for i, d in enumerate(days):
        if i < 3 or i > len(days) - 4:
            continue
        window = [daily[days[j]] for j in range(i - 3, i + 4)]
        rev = Fraction(daily[d], 100)
        trend = Fraction(sum(window), 700)
        cur = out.setdefault((d + 3) % 7, [0, Fraction(0), Fraction(0)])
        cur[0] += 1
        cur[1] += rev
        cur[2] += rev - trend
    return {
        dow: (n, float(s_rev / n), float(s_det / n))
        for dow, (n, s_rev, s_det) in out.items()
    }


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=19000, max_value=19030),
            st.one_of(st.integers(min_value=0, max_value=100000), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_seasonal_decompose_matches_fraction_reference(
    spark, tmp_path_factory, rows
):
    """q_seasonal_decompose's decimal-through-the-window recombination
    must equal the exact Fraction decomposition, including the
    interior-days-only (wcnt=7) gating on sparse calendars."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    epoch = dt.datetime(1970, 1, 1)
    sf = str(tmp_path_factory.mktemp("sd") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (
                i + 1,
                epoch + dt.timedelta(days=d),
                None if c is None else c / 100.0,
            )
            for i, (d, c) in enumerate(rows)
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    got = {
        r.dow: (r.n_days, r.mean_daily_rev, r.seasonal_additive)
        for r in get_queries()["q_seasonal_decompose"](spark, sf).collect()
    }
    want = _seasonal_reference(rows)
    assert set(got) == set(want)
    for dow, (n, mean_rev, seasonal) in want.items():
        gn, gm, gs = got[dow]
        assert gn == n
        assert abs(gm - mean_rev) < 1e-4 + 1e-9 * abs(mean_rev)
        assert abs(gs - seasonal) < 1e-4 + 1e-9 * abs(seasonal)


def _bleu_reference(rows):
    """Pure-Python corpus-level BLEU-2 per source over consecutive-doc
    pairs (Counter-clipped counts, linear brevity, sqrt geometric
    mean) — the same fixed float expression the query computes."""
    from collections import Counter
    from math import sqrt

    by_src: dict[str, list] = {}
    for i, (src, text) in enumerate(rows):
        toks = None if text is None else [t for t in text.split(" ") if t != ""]
        by_src.setdefault(src, []).append((i, toks))
    out = {}
    for src, docs in by_src.items():
        docs.sort()
        pairs = [
            (c, r)
            for (_, c), (_, r) in zip(docs, docs[1:])
            if c is not None and r is not None
        ]
        if not pairs:
            continue
        clip1 = tot1 = clip2 = tot2 = clen = rlen = 0
        for c, r in pairs:
            clen += len(c)
            rlen += len(r)
            cc, rc = Counter(c), Counter(r)
            clip1 += sum((cc & rc).values())
            tot1 += len(c)
            cb = Counter(zip(c, c[1:]))
            rb = Counter(zip(r, r[1:]))
            clip2 += sum((cb & rb).values())
            tot2 += sum(cb.values())
        p1 = None if tot1 == 0 else clip1 / tot1
        p2 = None if tot2 == 0 else clip2 / tot2
        bleu = (
            None
            if (p1 is None or p2 is None or rlen == 0)
            else min(1.0, clen / rlen) * sqrt(p1 * p2)
        )
        out[src] = (len(pairs), clen, rlen, p1, p2, bleu)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["sa", "sb"]),
            st.one_of(
                st.none(),
                st.lists(
                    st.sampled_from(["the", "cat", "sat", "on", "mat"]),
                    min_size=0,
                    max_size=6,
                ).map(" ".join),
            ),
        ),
        min_size=0,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_eval_bleu_matches_counter_reference(spark, tmp_path_factory, rows):
    """q_eval_bleu's join-clipped counts must equal Counter-intersection
    clipping, pair-by-pair, including NULL-text pair drops and the
    zero-bigram -> NULL guard."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("bleu") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(i, src, text) for i, (src, text) in enumerate(rows)],
        "doc_id long, source string, text string",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        r.source: (r.n_pairs, r.cand_tokens, r.ref_tokens, r.p1, r.p2, r.bleu2)
        for r in get_queries()["q_eval_bleu"](spark, sf).collect()
    }
    want = _bleu_reference(rows)
    assert set(got) == set(want)
    for src, (np_, clen, rlen, p1, p2, bleu) in want.items():
        gn, gc, gr, gp1, gp2, gb = got[src]
        assert (gn, gc, gr) == (np_, clen, rlen)
        for g, w in ((gp1, p1), (gp2, p2), (gb, bleu)):
            if w is None:
                assert g is None
            else:
                assert abs(g - w) < 1e-12


def _novelty_reference(rows):
    """Exact novelty counts: md5(text)-bucketed splits, train DISTINCT
    bigram set, test bigram occurrences."""
    import hashlib

    def bucket(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:4], 16) % 100

    def bigrams(text):
        toks = [t for t in text.split(" ") if t != ""]
        return list(zip(toks, toks[1:]))

    train = {
        g
        for (_, text) in rows
        if text is not None and bucket(text) < 80
        for g in bigrams(text)
    }
    out: dict[str, list] = {}
    for lang, text in rows:
        if text is None or bucket(text) < 90:
            continue
        for g in bigrams(text):
            cur = out.setdefault(lang, [0, 0])
            cur[0] += 1
            cur[1] += g not in train
    return {
        lang: (n, novel, novel / n) for lang, (n, novel) in out.items() if n
    }


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.one_of(
                st.none(),
                st.lists(
                    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=5
                ).map(" ".join),
            ),
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_ngram_novelty_matches_set_reference(spark, tmp_path_factory, rows):
    """q_ngram_novelty's anti-join novelty must equal the literal
    train-set membership test, on the same md5 buckets as
    q_split_train_test."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("nov") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(rows)],
        "doc_id long, lang string, text string",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        r.lang: (r.n_test_bigrams, r.n_novel, r.novelty_ratio)
        for r in get_queries()["q_ngram_novelty"](spark, sf).collect()
    }
    want = _novelty_reference(rows)
    assert set(got) == set(want)
    for lang, (n, novel, ratio) in want.items():
        gn, gnov, gr = got[lang]
        assert (gn, gnov) == (n, novel)
        assert abs(gr - ratio) < 1e-12


def _welch_reference(rows):
    """Exact Fraction Welch t-test between the 'O' and 'F' samples."""
    from fractions import Fraction

    a = [c for g, c in rows if g == "O" and c is not None]
    b = [c for g, c in rows if g == "F" and c is not None]
    if not a or not b:
        return None
    n1, n2 = len(a), len(b)
    s1, s2 = Fraction(sum(a), 100), Fraction(sum(b), 100)
    ss1, ss2 = Fraction(sum(c * c for c in a), 10000), Fraction(
        sum(c * c for c in b), 10000
    )
    mean_diff = float(s1 / n1 - s2 / n2)
    if n1 < 2 or n2 < 2:
        return n1, n2, mean_diff, None, None
    se1 = (n1 * ss1 - s1 * s1) / (n1 * n1 * (n1 - 1))
    se2 = (n2 * ss2 - s2 * s2) / (n2 * n2 * (n2 - 1))
    if se1 + se2 <= 0:
        return n1, n2, mean_diff, None, None
    t = mean_diff / float(se1 + se2) ** 0.5
    df = float(
        (se1 + se2) ** 2 / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    )
    return n1, n2, mean_diff, t, df


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["O", "F", "P"]),
            st.one_of(st.integers(min_value=0, max_value=100000), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_welch_ttest_matches_fraction_reference(spark, tmp_path_factory, rows):
    """q_welch_ttest's power-sum recombination must equal the exact
    Fraction Welch construction, including the missing-group empty
    frame and n<2 / zero-variance NULL guards."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("welch") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, g, None if c is None else c / 100.0)
            for i, (g, c) in enumerate(rows)
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    got = get_queries()["q_welch_ttest"](spark, sf).collect()
    want = _welch_reference(rows)
    if want is None:
        assert got == []
        return
    n1, n2, mean_diff, t, df = want
    assert len(got) == 1
    r = got[0]
    assert (r.n1, r.n2) == (n1, n2)
    assert abs(r.mean_diff - mean_diff) < 1e-4 + 1e-9 * abs(mean_diff)
    if t is None:
        assert r.t_stat is None and r.welch_df is None
    else:
        assert abs(r.t_stat - t) < 1e-6 + 1e-9 * abs(t)
        assert abs(r.welch_df - df) < 1e-4 + 1e-9 * abs(df)


def _lcc_reference(rows):
    """Brute-force co-purchase graph (support >= 2) and per-node
    clustering coefficient."""
    from itertools import combinations

    orders: dict[int, set] = {}
    for o, p in rows:
        orders.setdefault(o, set()).add(p)
    support: dict[tuple, int] = {}
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = {e for e, c in support.items() if c >= 2}
    nbrs: dict[int, set] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    for v, ns in nbrs.items():
        deg = len(ns)
        tri = sum(
            1 for a, b in combinations(sorted(ns), 2) if (a, b) in edges
        )
        lcc = None if deg < 2 else 2.0 * tri / (deg * (deg - 1))
        out[v] = (deg, tri, lcc)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.integers(min_value=1, max_value=8),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_local_clustering_matches_bruteforce(spark, tmp_path_factory, rows):
    """q_local_clustering's wedge-join triangle credits must equal the
    brute-force neighborhood enumeration on the same thresholded
    graph."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("lcc") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(o, p) for o, p in rows],
        "l_orderkey long, l_partkey long",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.node: (r.degree, r.n_triangles, r.lcc)
        for r in get_queries()["q_local_clustering"](spark, sf).collect()
    }
    want = _lcc_reference(rows)
    assert set(got) == set(want)
    for v, (deg, tri, lcc) in want.items():
        gd, gt, gl = got[v]
        assert (gd, gt) == (deg, tri)
        if lcc is None:
            assert gl is None
        else:
            assert abs(gl - lcc) < 1e-12


def _holt_reference(rows):
    """Literal Holt walk per type over the daily count series — the
    SAME IEEE expression tree as the kernel and the recursive CTE."""
    import math

    daily: dict[tuple, int] = {}
    for et, day in rows:
        daily[(et, day)] = daily.get((et, day), 0) + 1
    out = {}
    for et in {k[0] for k in daily}:
        ys = [float(daily[(e, d)]) for e, d in sorted(daily) if e == et]
        if len(ys) < 2:
            continue
        lvl, trd = ys[0], ys[1] - ys[0]
        for t in range(1, len(ys)):
            new_l = 0.2 * ys[t] + 0.8 * (lvl + trd)
            trd = 0.1 * (new_l - lvl) + 0.9 * trd
            lvl = new_l
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        out[et] = (len(ys), r6(lvl), r6(trd), r6(lvl + trd))
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=1, max_value=15),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_holt_linear_matches_walk_reference(spark, tmp_path_factory, rows):
    """q_holt_linear's applyInPandas kernel must equal the literal
    coupled recursion (and the <2-day drop) on arbitrary sparse
    calendars."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("holt") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, et, dt.datetime(2024, 1, day, 12, 0))
            for i, (et, day) in enumerate(rows)
        ],
        "event_id long, event_type string, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.event_type: (r.n_days, r.level, r.trend, r.forecast_1)
        for r in get_queries()["q_holt_linear"](spark, sf).collect()
    }
    want = _holt_reference(rows)
    assert set(got) == set(want)
    for et, (n, lvl, trd, fc) in want.items():
        gn, gl, gt, gf = got[et]
        assert gn == n
        assert abs(gl - lvl) < 1e-9
        assert abs(gt - trd) < 1e-9
        assert abs(gf - fc) < 1e-9


def _ols_reference(rows):
    """Exact Fraction normal-equations OLS (Cramer's rule) over integer
    cents; mirrors the query's det=0 and SST<=0 NULL guards."""
    from fractions import Fraction

    pts = [
        (Fraction(q, 100), Fraction(d, 100), Fraction(p, 100))
        for q, d, p in rows
        if None not in (q, d, p)
    ]
    if not pts:
        return None
    nn = len(pts)
    s1 = sum(x for x, _, _ in pts)
    s2 = sum(d for _, d, _ in pts)
    sy = sum(y for _, _, y in pts)
    s11 = sum(x * x for x, _, _ in pts)
    s12 = sum(x * d for x, d, _ in pts)
    s22 = sum(d * d for _, d, _ in pts)
    s1y = sum(x * y for x, _, y in pts)
    s2y = sum(d * y for _, d, y in pts)
    syy = sum(y * y for _, _, y in pts)
    det = nn * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (
        s1 * s12 - s11 * s2
    )
    # Mirror the engine's FLOAT relative singularity guard (its
    # documented semantics: exact dets leave ulp residues in doubles,
    # so the verdict is |det| vs the expansion's term magnitudes,
    # computed in the same double arithmetic).
    fn, f1, f2 = float(nn), float(s1), float(s2)
    f11, f12, f22 = float(s11), float(s12), float(s22)
    fdet = fn * (f11 * f22 - f12 * f12) - f1 * (f1 * f22 - f12 * f2) + f2 * (
        f1 * f12 - f11 * f2
    )
    fmag = (
        abs(fn * f11 * f22)
        + abs(fn * f12 * f12)
        + abs(f1 * f1 * f22)
        + abs(f1 * f12 * f2)
        + abs(f2 * f1 * f12)
        + abs(f2 * f11 * f2)
        + 1e-300
    )
    if abs(fdet) <= 1e-9 * fmag or det == 0:
        return nn, None, None, None, None
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (
        s1y * s12 - s11 * s2y
    )
    det1 = nn * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (
        s1 * s2y - s1y * s2
    )
    det2 = nn * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (
        s1 * s12 - s11 * s2
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sst = syy - sy * sy / nn
    fsy, fsyy = float(sy), float(syy)
    fsst = fsyy - fsy * fsy / fn
    sst_bad = fsst <= 1e-9 * (abs(fsyy) + abs(fsy * fsy / fn) + 1e-300)
    r2 = (
        None
        if sst <= 0 or sst_bad
        else float(1 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / sst)
    )
    return nn, float(b0), float(b1), float(b2), r2


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=1000000),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ols_multi_matches_fraction_reference(spark, tmp_path_factory, rows):
    """q_ols_multi's shared-fragment Cramer recombination must equal the
    exact Fraction normal equations, including collinear det=0 and
    constant-y SST<=0 NULLs."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("ols") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, q / 100.0, d / 100.0, p / 100.0)
            for i, (q, d, p) in enumerate(rows)
        ],
        "l_orderkey long, l_quantity double, l_discount double,"
        " l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = get_queries()["q_ols_multi"](spark, sf).collect()
    want = _ols_reference(rows)
    if want is None:
        assert got == []
        return
    nn, b0, b1, b2, r2 = want
    assert len(got) == 1
    r = got[0]
    assert r.n == nn
    for g, w in ((r.beta0, b0), (r.beta_qty, b1), (r.beta_disc, b2), (r.r2, r2)):
        if w is None:
            assert g is None
        else:
            assert abs(g - w) < 1e-6 + 1e-9 * abs(w)


def _pacf_reference(rows):
    """Pairwise-complete lag-1/lag-2 correlations (6-dp rounded, like
    the engine) and the Durbin-Levinson phi_22 from the ROUNDED r's."""
    import math

    daily: dict[int, int] = {}
    for d in rows:
        daily[d] = daily.get(d, 0) + 1

    def rho(lag):
        pairs = [
            (daily[d], daily[d + lag]) for d in sorted(daily) if d + lag in daily
        ]
        n = len(pairs)
        if n == 0:
            return 0, None
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            return n, None
        r = (n * sxy - sx * sy) / math.sqrt(vx * vy)
        return n, math.floor(r * 1e6 + 0.5) / 1e6

    n1, r1 = rho(1)
    n2, r2 = rho(2)
    if r1 is None or r2 is None or (1.0 - r1 * r1) <= 0:
        phi = None
    else:
        phi = math.floor((r2 - r1 * r1) / (1.0 - r1 * r1) * 1e6 + 0.5) / 1e6
    return n1, n2, r1, r2, phi


@given(
    rows=st.lists(st.integers(min_value=1, max_value=25), min_size=0, max_size=40)
)
@settings(**_SETTINGS)
def test_pacf_matches_durbin_levinson_reference(spark, tmp_path_factory, rows):
    """q_pacf's pivoted recombination must equal the literal
    Durbin-Levinson composition of the calendar-join correlations on
    arbitrary sparse calendars."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("pacf") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(i + 1, dt.datetime(2024, 1, d)) for i, d in enumerate(rows)],
        "o_orderkey long, o_orderdate timestamp",
    ).write.parquet(f"{sf}/orders.parquet")
    got = get_queries()["q_pacf"](spark, sf).collect()
    n1, n2, r1, r2, phi = _pacf_reference(rows)
    assert len(got) == 1
    g = got[0]
    assert ((g.n1 or 0), (g.n2 or 0)) == (n1, n2)
    for gv, wv in ((g.r1, r1), (g.r2, r2), (g.pacf_2, phi)):
        if wv is None:
            assert gv is None
        else:
            assert abs(gv - wv) < 2e-6


def _mi_reference(rows):
    """Python MI/entropy over the (type, weekday) contingency with the
    engine's per-term 8-dp decimal rounding mirrored."""
    import math

    def dec8(x):
        return round(x, 8)

    cells: dict[tuple, int] = {}
    for et, d in rows:
        dow = (d + 3) % 7
        cells[(et, dow)] = cells.get((et, dow), 0) + 1
    if not cells:
        return None
    nt = sum(cells.values())
    mx: dict[str, int] = {}
    my: dict[int, int] = {}
    for (x, y), n in cells.items():
        mx[x] = mx.get(x, 0) + n
        my[y] = my.get(y, 0) + n
    mi = sum(
        dec8((n / nt) * math.log(nt * n / (mx[x] * my[y])))
        for (x, y), n in cells.items()
    )
    hx = sum(dec8(-(v / nt) * math.log(v / nt)) for v in mx.values())
    hy = sum(dec8(-(v / nt) * math.log(v / nt)) for v in my.values())
    nmi = None if hx <= 0 or hy <= 0 else mi / math.sqrt(hx * hy)
    return nt, len(mx), len(my), mi, hx, hy, nmi


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "error"]),
            st.integers(min_value=0, max_value=13),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_mutual_information_matches_reference(spark, tmp_path_factory, rows):
    """q_mutual_information must equal the textbook plug-in MI/entropy
    (with the per-term decimal discipline mirrored), including the
    single-class H=0 -> NULL NMI guard."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    epoch = dt.datetime(1970, 1, 1, 12)
    sf = str(tmp_path_factory.mktemp("mi") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, et, epoch + dt.timedelta(days=d))
            for i, (et, d) in enumerate(rows)
        ],
        "event_id long, event_type string, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = get_queries()["q_mutual_information"](spark, sf).collect()
    want = _mi_reference(rows)
    if want is None:
        assert got == [] or (len(got) == 1 and (got[0].n or 0) == 0)
        return
    nt, kx, ky, mi, hx, hy, nmi = want
    assert len(got) == 1
    g = got[0]
    assert (g.n, g.n_x_classes, g.n_y_classes) == (nt, kx, ky)
    assert abs(g.mi_nats - mi) < 1e-5
    assert abs(g.h_x - hx) < 1e-5
    assert abs(g.h_y - hy) < 1e-5
    if nmi is None:
        assert g.nmi is None
    else:
        assert abs(g.nmi - nmi) < 1e-5


def _streaks_reference(rows):
    """Literal streak scan over each user's sorted distinct day set."""
    by_user: dict[int, set] = {}
    for uid, d in rows:
        by_user.setdefault(uid, set()).add(d)
    out = {}
    for uid, ds in by_user.items():
        days = sorted(ds)
        lens, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                lens.append(cur)
                cur = 1
        lens.append(cur)
        out[uid] = (len(days), len(lens), max(lens))
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.integers(min_value=1, max_value=20),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_streaks_matches_scan_reference(spark, tmp_path_factory, rows):
    """q_streaks' gaps-and-islands rewrite must equal the literal
    consecutive-run scan (duplicate same-day events collapse first)."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("streak") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, uid, dt.datetime(2024, 1, d, 8))
            for i, (uid, d) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.user_id: (r.n_active_days, r.n_streaks, r.longest_streak)
        for r in get_queries()["q_streaks"](spark, sf).collect()
    }
    assert got == _streaks_reference(rows)


def _top_movers_reference(rows):
    """Exact per-supplier MoM deltas from cents, ordered by |delta| desc
    with the (suppkey, ym) tiebreak, top 10."""
    from fractions import Fraction

    monthly: dict[tuple, int] = {}
    for sk, ym, cents in rows:
        monthly[(sk, ym)] = monthly.get((sk, ym), 0) + cents
    rowsout = []
    for sk in {k[0] for k in monthly}:
        series = sorted((ym, c) for (s, ym), c in monthly.items() if s == sk)
        for (ym0, c0), (ym1, c1) in zip(series, series[1:]):
            if c0 > 0:
                delta = Fraction(c1 - c0, 100)
                rowsout.append(
                    (
                        sk,
                        ym1,
                        c1 / 100.0,
                        c0 / 100.0,
                        float(delta),
                        (c1 - c0) / c0,
                    )
                )
    rowsout.sort(key=lambda r: (-abs(r[4]), r[0], r[1]))
    return rowsout[:10]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.sampled_from([202401, 202402, 202403, 202405]),
            st.integers(min_value=0, max_value=100000),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_top_movers_matches_reference(spark, tmp_path_factory, rows):
    """q_top_movers' lag + TakeOrdered cut must equal the literal
    consecutive-month delta ranking (note: lag is over the OBSERVED
    month sequence — a skipped month pairs with the next present one)."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("movers") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (
                i + 1,
                sk,
                dt.datetime(ym // 100, ym % 100, 5),
                c / 100.0,
            )
            for i, (sk, ym, c) in enumerate(rows)
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp,"
        " l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = [
        (r.l_suppkey, r.ym, r.revenue, r.prev_revenue, r.delta, r.pct_change)
        for r in get_queries()["q_top_movers"](spark, sf).collect()
    ]
    want = _top_movers_reference(rows)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        assert abs(g[4] - w[4]) < 1e-9
        assert abs(g[5] - w[5]) < 1e-6 + 1e-9 * abs(w[5])


@given(
    seeds=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=0, max_size=25
    )
)
@settings(**_SETTINGS)
def test_pca_power_finds_planted_direction(spark, tmp_path_factory, seeds):
    """q_pca_power on data planted along a fixed direction must align
    with numpy's top eigenvector of the same covariance (|cos| >= 0.99
    — the eigengap is large by construction), return a unit loading
    vector, and emit an empty frame on <2 rows."""
    import math
    import uuid

    import numpy as np

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    # Planted direction + deterministic small residual so the top
    # eigenvalue dominates and 12 power iterations surely converge.
    direction = np.array([3.0, 1.0, -2.0, 0.5, 0.0, 1.5, -1.0, 0.25])
    direction /= np.linalg.norm(direction)
    rows = []
    for i, a in enumerate(seeds):
        noise = np.array(
            [((i * 7 + d * 13) % 11 - 5) / 50.0 for d in range(8)]
        )
        vec = a * direction + noise
        rows.append((i, [float(np.float32(x)) for x in vec] + [0.0] * 56, 0))
    sf = str(tmp_path_factory.mktemp("pca") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    got = sorted(
        (r.dim, r.loading, r.eigenvalue)
        for r in get_queries()["q_pca_power"](spark, sf).collect()
    )
    if len(seeds) < 2:
        assert got == []
        return
    data = np.array([r[1][:8] for r in rows], dtype=np.float64)
    cov = np.cov(data, rowvar=False, ddof=1)
    if not np.isfinite(cov).all() or np.allclose(cov, 0):
        # zero/degenerate covariance: the walk dies -> empty frame
        assert got == []
        return
    assert len(got) == 8
    v = np.array([g[1] for g in got])
    lam = got[0][2]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit loading
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, int(np.argmax(evals))]
    align = abs(float(np.dot(v, top)))
    assert align > 0.99, (align, v, top)
    assert abs(lam - float(np.max(evals))) < 0.05 * max(1.0, abs(float(np.max(evals))))


def _user_entropy_reference(rows):
    """Plug-in entropy per user with the engine's per-term 8-dp decimal
    discipline mirrored (the q_mutual_information test pattern)."""
    import math

    cells: dict[tuple, int] = {}
    for uid, et in rows:
        cells[(uid, et)] = cells.get((uid, et), 0) + 1
    out = {}
    for uid in {k[0] for k in cells}:
        ns = [n for (u, _), n in cells.items() if u == uid]
        ntot, k = sum(ns), len(ns)
        h = sum(round(-(n / ntot) * math.log(n / ntot), 8) for n in ns)
        norm = None if k <= 1 else h / math.log(k)
        out[uid] = (ntot, k, h, norm)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_user_entropy_matches_plugin_reference(spark, tmp_path_factory, rows):
    """q_user_entropy must equal the plug-in Shannon entropy per user,
    including the single-type entropy-0 / NULL-evenness guard."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("uent") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, uid, et, dt.datetime(2024, 1, 1))
            for i, (uid, et) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.user_id: (r.n_events, r.n_types, r.entropy_nats, r.norm_entropy)
        for r in get_queries()["q_user_entropy"](spark, sf).collect()
    }
    want = _user_entropy_reference(rows)
    assert set(got) == set(want)
    for uid, (ntot, k, h, norm) in want.items():
        gn, gk, gh, gnorm = got[uid]
        assert (gn, gk) == (ntot, k)
        assert abs(gh - h) < 1e-5
        if norm is None:
            assert gnorm is None
        else:
            assert abs(gnorm - norm) < 1e-5


def _lm_bigram_reference(rows):
    """Plug-in add-one bigram LM per doc (pure floats; the engine's
    ln-of-integers + 4-dp mean discipline)."""
    import math

    toks = {
        i: [t for t in text.split(" ") if t != ""]
        for i, text in enumerate(rows)
        if text is not None
    }
    grams = {
        i: list(zip(ws, ws[1:])) for i, ws in toks.items() if len(ws) >= 2
    }
    big: dict[tuple, int] = {}
    uni: dict[str, int] = {}
    for gs in grams.values():
        for w1, w2 in gs:
            big[(w1, w2)] = big.get((w1, w2), 0) + 1
            uni[w1] = uni.get(w1, 0) + 1
    vocab = len({w for ws in toks.values() for w in ws})
    out = {}
    for i, gs in grams.items():
        if not gs:
            continue
        total = sum(
            math.log(big[g] + 1) - math.log(uni[g[0]] + vocab) for g in gs
        )
        out[i] = (len(gs), round(total / len(gs), 4))
    return out


@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=0, max_size=6
            ).map(" ".join),
        ),
        min_size=0,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_lm_bigram_matches_plugin_reference(spark, tmp_path_factory, rows):
    """q_lm_bigram must equal the plug-in Laplace bigram LM, including
    NULL-text drops and the <2-token absence."""
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("lmb") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(i, text) for i, text in enumerate(rows)],
        "doc_id long, text string",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in get_queries()["q_lm_bigram"](spark, sf).collect()
    }
    want = _lm_bigram_reference(rows)
    assert set(got) == set(want)
    for i, (n, lp) in want.items():
        gn, glp = got[i]
        assert gn == n
        assert abs(glp - lp) < 2e-4


def _did_reference(rows):
    """Exact Fraction DiD + pooled SE over the four md5-split cells."""
    import hashlib
    from fractions import Fraction

    cells: dict[tuple, list] = {}
    for uid, day, cents in rows:
        if cents is None:
            continue
        treat = int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 2
        post = 1 if day >= 16 else 0
        cells.setdefault((treat, post), []).append(cents)
    if set(cells) != {(1, 1), (1, 0), (0, 1), (0, 0)}:
        return None
    stats = {}
    for key, vals in cells.items():
        n = len(vals)
        s = Fraction(sum(vals), 100)
        ss = Fraction(sum(c * c for c in vals), 10000)
        stats[key] = (n, s, ss)
    m = {k: s / n for k, (n, s, _) in stats.items()}
    did = float((m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)]))
    ns = [stats[k][0] for k in stats]
    if any(n < 2 for n in ns):
        return stats, did, None
    se = sum(
        (n * ss - s * s) / (n * n * (n - 1)) for n, s, ss in stats.values()
    )
    return stats, did, float(se) ** 0.5


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=30),
            st.one_of(st.integers(min_value=0, max_value=20000), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_diff_in_diff_matches_fraction_reference(spark, tmp_path_factory, rows):
    """q_diff_in_diff must equal the exact Fraction 2x2 construction on
    the same md5 treatment split, including empty-cell and n<2 guards."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("did") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (
                i + 1,
                uid,
                "purchase",
                dt.datetime(2024, 1, day, 9),
                None if c is None else c / 100.0,
            )
            for i, (uid, day, c) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).write.parquet(f"{sf}/events.parquet")
    got = get_queries()["q_diff_in_diff"](spark, sf).collect()
    want = _did_reference(rows)
    if want is None:
        assert got == []
        return
    stats, did, se = want
    assert len(got) == 1
    r = got[0]
    assert (r.n11, r.n10, r.n01, r.n00) == (
        stats[(1, 1)][0],
        stats[(1, 0)][0],
        stats[(0, 1)][0],
        stats[(0, 0)][0],
    )
    assert abs(r.did_estimate - did) < 1e-6 + 1e-9 * abs(did)
    if se is None:
        assert r.std_error is None
    else:
        assert abs(r.std_error - se) < 1e-6 + 1e-9 * abs(se)


def _funnel_latency_reference(rows):
    """Literal first-touch funnel walk + exact Fraction latency stats
    over integer millisecond deltas."""
    import math
    from fractions import Fraction

    by_user: dict[int, list] = {}
    for uid, et, ms in rows:
        by_user.setdefault(uid, []).append((ms, et))
    t1, t2, t3 = {}, {}, {}
    for uid, evs in by_user.items():
        views = [ms for ms, et in evs if et == "view"]
        if not views:
            continue
        t1[uid] = min(views)
        clicks = [ms for ms, et in evs if et == "click" and ms > t1[uid]]
        if not clicks:
            continue
        t2[uid] = min(clicks)
        purchases = [ms for ms, et in evs if et == "purchase" and ms > t2[uid]]
        if purchases:
            t3[uid] = min(purchases)
    out = {}
    for idx, (step, cur, prev) in enumerate(
        [("view->click", t2, t1), ("click->purchase", t3, t2)], start=1
    ):
        deltas = [cur[u] - prev[u] for u in cur]
        if not deltas:
            continue
        n = len(deltas)
        s = sum(deltas)
        avg = math.floor(Fraction(s, n) / 1000 * 1000 + Fraction(1, 2)) / 1000
        if n < 2:
            sd = None
        else:
            var = (n * sum(d * d for d in deltas) - s * s) / (n * (n - 1))
            sd = math.floor(math.sqrt(var) / 1000 * 1e3 + 0.5) / 1e3
        out[(idx, step)] = (
            n,
            float(avg),
            min(deltas) / 1000.0,
            max(deltas) / 1000.0,
            sd,
        )
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=86_400_000),
        ),
        min_size=0,
        max_size=40,
    ).filter(lambda rs: len({(u, ms) for u, _, ms in rs}) == len(rs))
)
@settings(**_SETTINGS)
def test_funnel_latency_matches_walk_reference(spark, tmp_path_factory, rows):
    """q_funnel_latency must equal the literal first-touch walk and the
    exact latency statistics (unique (user, ts) pairs keep MIN ties
    unambiguous — the funnel contract's total-order assumption)."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    epoch = dt.datetime(2024, 1, 1)
    sf = str(tmp_path_factory.mktemp("flat") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, uid, et, epoch + dt.timedelta(milliseconds=ms))
            for i, (uid, et, ms) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        (r.step_idx, r.step): (
            r.n_users,
            r.avg_seconds,
            r.min_seconds,
            r.max_seconds,
            r.stddev_seconds,
        )
        for r in get_queries()["q_funnel_latency"](spark, sf).collect()
    }
    want = _funnel_latency_reference(rows)
    assert set(got) == set(want)
    for key, (n, avg, mn, mx, sd) in want.items():
        gn, gavg, gmn, gmx, gsd = got[key]
        assert gn == n
        assert abs(gavg - avg) < 1e-3 + 1e-9 * abs(avg)
        assert (gmn, gmx) == (mn, mx)
        if sd is None:
            assert gsd is None
        else:
            assert abs(gsd - sd) < 1e-3 + 1e-9 * abs(sd)


def _sprt_reference(rows):
    """Literal SPRT walk over the daily (arm=1) ledger with exact
    decimal increments (engine: DECIMAL(20,8)-cast per-day terms)."""
    import hashlib
    import math
    from decimal import Decimal

    daily: dict[int, list] = {}
    for uid, day, et in rows:
        arm = int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 2
        cur = daily.setdefault(day, [0, 0])
        if arm == 1:
            cur[0] += 1
            cur[1] += et == "purchase"
    la = math.log(0.22 / 0.18)
    lb = math.log(0.78 / 0.82)
    bound = math.log(19.0)
    out, acc = {}, Decimal(0)
    q = Decimal("0.00000001")
    for day in sorted(daily):
        t1, h1 = daily[day]
        inc = Decimal(h1 * la + (t1 - h1) * lb).quantize(
            q, rounding="ROUND_HALF_UP"
        )
        acc += inc
        llr = float(acc)
        dec = (
            "accept_h1"
            if llr >= bound
            else "accept_h0" if llr <= -bound else "continue"
        )
        out[day] = (math.floor(llr * 1e6 + 0.5) / 1e6, dec)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.integers(min_value=1, max_value=10),
            st.sampled_from(["purchase", "view"]),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_sprt_matches_walk_reference(spark, tmp_path_factory, rows):
    """q_sprt_abtest's decimal-cumsum walk must equal the literal Wald
    LLR recursion on the same md5 arm split."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("sprt") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, uid, et, dt.datetime(2024, 1, day, 10))
            for i, (uid, day, et) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.day: (r.llr, r.decision)
        for r in get_queries()["q_sprt_abtest"](spark, sf).collect()
    }
    want = _sprt_reference(rows)
    assert set(got) == set(want)
    for day, (llr, dec) in want.items():
        gl, gd = got[day]
        assert abs(gl - llr) < 1e-6 + 1e-9 * abs(llr)
        assert gd == dec


def _cuped_reference(rows):
    """Exact Fraction CUPED: per-user integer-cents pre/post totals,
    pooled theta, per-arm adjusted means and variance ratio."""
    import hashlib
    from fractions import Fraction

    per_user: dict[int, list] = {}
    for uid, day, cents in rows:
        if cents is None:
            continue
        cur = per_user.setdefault(uid, [0, 0])
        cur[0 if day < 16 else 1] += cents
    if not per_user:
        return None
    n = len(per_user)
    pre = {u: Fraction(p, 100) for u, (p, _) in per_user.items()}
    post = {u: Fraction(q, 100) for u, (_, q) in per_user.items()}
    sp, sq = sum(pre.values()), sum(post.values())
    spp = sum(x * x for x in pre.values())
    spq = sum(pre[u] * post[u] for u in per_user)
    var_pre = n * spp - sp * sp
    th = Fraction(0) if var_pre <= 0 else (n * spq - sp * sq) / var_pre
    mu = sp / n
    out = {}
    for arm in (0, 1):
        users = [
            u
            for u in per_user
            if int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2 == arm
        ]
        if not users:
            continue
        na = len(users)
        mean_post = sum(post[u] for u in users) / na
        mean_adj = mean_post - th * (sum(pre[u] for u in users) / na - mu)
        adj = [post[u] - th * (pre[u] - mu) for u in users]
        ss_adj = sum((a - mean_adj) ** 2 for a in adj)
        ss_raw = sum((post[u] - mean_post) ** 2 for u in users)
        ratio = None if na < 2 or ss_raw <= 0 else float(ss_adj / ss_raw)
        out[arm] = (na, float(mean_post), float(mean_adj), ratio)
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=30),
            st.one_of(st.integers(min_value=0, max_value=20000), st.none()),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_cuped_matches_fraction_reference(spark, tmp_path_factory, rows):
    """q_cuped's expanded power-sum recombination must equal the exact
    Fraction per-user construction (theta, adjusted means, variance
    ratio), including the zero-pre-variance theta=0 convention."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = str(tmp_path_factory.mktemp("cuped") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (
                i + 1,
                uid,
                "purchase",
                dt.datetime(2024, 1, day, 9),
                None if c is None else c / 100.0,
            )
            for i, (uid, day, c) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.arm: (r.n_users, r.mean_post, r.mean_adjusted, r.var_ratio)
        for r in get_queries()["q_cuped"](spark, sf).collect()
    }
    want = _cuped_reference(rows)
    if want is None:
        assert got == {}
        return
    assert set(got) == set(want)
    for arm, (na, mp, ma, ratio) in want.items():
        gn, gmp, gma, gr = got[arm]
        assert gn == na
        assert abs(gmp - mp) < 1e-6 + 1e-9 * abs(mp)
        assert abs(gma - ma) < 1e-6 + 1e-9 * abs(ma)
        if ratio is None:
            assert gr is None
        else:
            assert abs(gr - ratio) < 1e-6 + 1e-9 * abs(ratio)


def _markov_reference(rows):
    """Literal restricted power iteration over the (user-ordered)
    transition counts — the engine's documented contract."""
    import math

    by_user: dict[int, list] = {}
    for i, (uid, et) in enumerate(rows):
        by_user.setdefault(uid, []).append((i, et))
    counts: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for (_, a), (_, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    n_out: dict[str, int] = {}
    for (a, _), c in counts.items():
        n_out[a] = n_out.get(a, 0) + c
    states = sorted(n_out)
    if not states:
        return {}
    p = {
        (a, b): c / n_out[a] for (a, b), c in counts.items() if b in n_out
    }
    v = {s: 1.0 / float(len(states)) for s in states}
    for _ in range(20):
        nxt = {}
        for dst in states:
            acc, present = 0.0, False
            for src in states:
                if (src, dst) in p and src in v:
                    acc = acc + v[src] * p[(src, dst)]
                    present = True
            if present:
                nxt[dst] = acc
        nrm = 0.0
        for s in sorted(nxt):
            nrm = nrm + nxt[s]
        if not nrm > 0:
            v = {}
            break
        v = {s: x / nrm for s, x in nxt.items()}
    return {
        s: (n_out[s], math.floor(v.get(s, 0.0) * 1e6 + 0.5) / 1e6)
        for s in states
    }


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_markov_stationary_matches_walk_reference(
    spark, tmp_path_factory, rows
):
    """q_markov_stationary must equal the literal restricted power
    iteration on per-user ordered sequences (unique ts per row keeps
    the LEAD successor unambiguous)."""
    import datetime as dt
    import uuid

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    epoch = dt.datetime(2024, 1, 1)
    sf = str(tmp_path_factory.mktemp("markov") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [
            (i + 1, uid, et, epoch + dt.timedelta(minutes=i))
            for i, (uid, et) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.state: (r.n_out, r.stationary_p)
        for r in get_queries()["q_markov_stationary"](spark, sf).collect()
    }
    want = _markov_reference(rows)
    assert set(got) == set(want)
    for s, (n, pv) in want.items():
        gn, gp = got[s]
        assert gn == n
        assert abs(gp - pv) < 1e-9


# --- pathological TEXT SHAPE properties (r11, VERDICT r10 item 6) -----
# The r10 longtext catalog's finds are value-pinned on 3 handcrafted
# rows; these strategies fuzz the same class CONTINUOUSLY — mega-token,
# high-repetition, whitespace-only, and duplicate-heavy corpora driven
# through the REGISTERED dedup/shingle/line operators via tmp parquet
# catalogs, checked against exact pure-Python references.


@st.composite
def pathological_corpus(draw):
    """(doc_id, text) rows biased toward pathological shape: unbroken
    mega-tokens, 2-word phrases repeated hundreds of times,
    whitespace/control-char-only, empty, and small word soups with
    multi-space runs; ~1/3 of docs duplicate an earlier doc's text so
    the dedup operators always see real collisions."""
    shape = st.one_of(
        st.just(""),
        st.sampled_from(["   ", " \n\t ", "\n\n", "\t\t\t "]),
        st.builds(lambda n: "x" * n, st.integers(min_value=200, max_value=2000)),
        st.builds(
            lambda p, n: (p + " ") * n,
            st.sampled_from(["spam ham", "a b c", "du pli cate"]),
            st.integers(min_value=1, max_value=200),
        ),
        st.text(alphabet=" abcxy\n\t", min_size=0, max_size=60),
    )
    n = draw(st.integers(min_value=1, max_value=8))
    texts = [draw(shape) for _ in range(n)]
    for i in range(1, n):
        if draw(st.booleans()) and draw(st.booleans()):
            texts[i] = texts[draw(st.integers(min_value=0, max_value=i - 1))]
    return list(enumerate(texts))


def _write_docs(spark, tmp_path_factory, rows, label):
    import uuid

    sf = str(tmp_path_factory.mktemp(label) / uuid.uuid4().hex[:8])
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def _words(text):
    return [w for w in text.split(" ") if w != ""]


@given(rows=pathological_corpus())
@settings(**_SETTINGS)
def test_dedup_exact_pathological_shapes(spark, tmp_path_factory, rows):
    """The REGISTERED q_dedup_exact on shape-hostile corpora must
    reproduce the exact md5-group reference: one row per distinct text,
    keeper = min doc_id, n_copies exact — whitespace-only variants that
    differ by one byte stay distinct, byte-identical mega-docs
    collapse."""
    import hashlib
    from collections import defaultdict

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = _write_docs(spark, tmp_path_factory, rows, "dedupexact")
    got = {
        r.text_md5: (r.keeper_doc_id, r.n_copies)
        for r in get_queries()["q_dedup_exact"](spark, sf).collect()
    }
    ref = defaultdict(lambda: [1 << 62, 0])
    for doc_id, text in rows:
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        ref[h][0] = min(ref[h][0], doc_id)
        ref[h][1] += 1
    assert got == {h: tuple(v) for h, v in ref.items()}


def _segments(words, line=5):
    import math

    n_segs = max(math.ceil(len(words) / line), 1)
    return [" ".join(words[k * line : k * line + line]) for k in range(n_segs)]


@given(rows=pathological_corpus())
@settings(**_SETTINGS)
def test_dedup_lines_pathological_shapes(spark, tmp_path_factory, rows):
    """The REGISTERED q_dedup_lines (C4-style cross-document segment
    dedup + corpus rewrite) must match a pure-Python re-derivation
    byte-exactly (clean_md5) on shape-hostile corpora — including the
    degenerate shared-empty-segment case every whitespace-only doc
    hits, and mega-token docs whose single word IS the segment."""
    import hashlib

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = _write_docs(spark, tmp_path_factory, rows, "deduplines")
    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.clean_md5)
        for r in get_queries()["q_dedup_lines"](spark, sf).collect()
    }
    segs = [
        (doc_id, idx, seg)
        for doc_id, text in rows
        for idx, seg in enumerate(_segments(_words(text)))
    ]
    first = {}
    for doc_id, idx, seg in sorted(segs, key=lambda t: (t[2], t[0], t[1])):
        first.setdefault(seg, (doc_id, idx))
    ref = {}
    for doc_id, text in rows:
        mine = list(enumerate(_segments(_words(text))))
        kept = [seg for idx, seg in mine if first[seg] == (doc_id, idx)]
        ref[doc_id] = (
            len(mine),
            len(kept),
            hashlib.md5(" ".join(kept).encode("utf-8")).hexdigest(),
        )
    assert got == ref


def _shingles(words, k=3):
    if not words:
        return set()
    n = max(len(words) - (k - 1), 1)
    return {" ".join(words[i : i + k]) for i in range(n)}


@given(rows=pathological_corpus())
@settings(**_SETTINGS)
def test_ngram_jaccard_pathological_shapes(spark, tmp_path_factory, rows):
    """The REGISTERED q_dedup_ngram_jaccard (inverted-index shingle
    Jaccard) must agree with the brute-force set definition on
    shape-hostile corpora: identical pair set at the 0.2 threshold and
    per-pair values within half a round-4 ulp. High-repetition docs
    collapse to tiny shingle sets (array_distinct); zero-word docs pair
    with nothing (the r8 [''] hot-key contract)."""
    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    sf = _write_docs(spark, tmp_path_factory, rows, "ngramjac")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in get_queries()["q_dedup_ngram_jaccard"](spark, sf).collect()
    }
    sh = {doc_id: _shingles(_words(text)) for doc_id, text in rows}
    ref = {}
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                inter = len(sh[a] & sh[b])
                if inter:
                    jac = inter / len(sh[a] | sh[b])
                    if jac >= 0.2:
                        ref[(a, b)] = jac
    assert set(got) == set(ref)
    for pair, jac in ref.items():
        assert abs(got[pair] - jac) <= 5.001e-5
