"""Differential fuzzing: random inputs through high-traffic operators on
BOTH engines (Spark implementation vs its DuckDB oracle twin), compared
exactly (VERDICT r3 item 7).

The fixed fixtures can't reach edge classes — empty docs, NULL keys,
DST-adjacent and pre-epoch timestamps, degenerate URLs — so each suite
generates 100+ seeded-random cases covering them. Cases are batched into
ONE Spark job + one DuckDB query per suite (the repo's property-test
rule: a job per tiny example swamps the suite in scheduler overhead;
determinism comes from the fixed seed, reproduction from the case list
itself rather than hypothesis shrinking).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def _utc(y, mo, d, h=0, mi=0, s=0, us=0):
    return datetime(y, mo, d, h, mi, s, us, tzinfo=timezone.utc).replace(
        tzinfo=None
    )


# ---------------------------------------------------------------------------
# 1. Tumbling-window bucketing (W2/W6) vs DuckDB time_bucket
# ---------------------------------------------------------------------------


def test_fuzz_tumbling_window_counts_match_duckdb(spark):
    """150 random (ts, user) events — including DST-transition instants
    (bucketing is UTC and must not care), sub-second precision, year and
    leap-day boundaries, and NULL group keys — produce identical
    per-(window, user) counts in Spark's window() and DuckDB's
    time_bucket. Minute-divisible intervals only: both engines' bucket
    origins (epoch vs 2000-01-03) are minute-aligned, so buckets agree.
    """
    rng = random.Random(1204)
    anchors = [
        _utc(2024, 3, 10, 6, 59, 30),    # US spring-forward (07:00 UTC)
        _utc(2024, 10, 27, 0, 59, 59),   # EU fall-back (01:00 UTC)
        _utc(2023, 12, 31, 23, 59, 59),  # year boundary
        _utc(2024, 2, 29, 12, 0, 0),     # leap day
        _utc(2024, 1, 15, 9, 30, 0),     # plain weekday
    ]
    cases = []
    for i in range(150):
        base = anchors[i % len(anchors)]
        ts = base + timedelta(
            seconds=rng.randint(-120, 120), microseconds=rng.randint(0, 999999)
        )
        user = rng.choice([None, 1, 2, 3, 7])
        cases.append((i, ts, user))

    sdf = spark.createDataFrame(
        cases, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    )
    got = {
        (r["ws"], r["user_id"], r["n"])
        for r in sdf.groupBy(
            F.window("ts", "1 minute").start.alias("ws"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    pdf = pd.DataFrame(cases, columns=["event_id", "ts", "user_id"])
    con = duckdb.connect()
    con.register("events_fuzz", pdf)
    want = {
        (r[0].to_pydatetime() if hasattr(r[0], "to_pydatetime") else r[0],
         None if pd.isna(r[1]) else int(r[1]), int(r[2]))
        for r in con.execute(
            """
            SELECT time_bucket(INTERVAL 1 minute, ts) AS ws,
                   user_id, count(*)::BIGINT AS n
            FROM events_fuzz GROUP BY 1, 2
            """
        ).fetchall()
    }
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# 2. N-gram Jaccard near-dup verify (dedup family) vs the shingle oracle
# ---------------------------------------------------------------------------


def test_fuzz_ngram_jaccard_pairs_match_duckdb(spark):
    """120 random documents from a tiny vocabulary (forcing real shingle
    collisions), plus empty / one-token / two-token docs (below the
    3-gram threshold), repeated-token runs, and unicode tokens: the
    Spark inverted-index + counting-verify pipeline and the DuckDB
    list-intersection oracle must emit the identical pair set with
    identical rounded Jaccard values."""
    from tutorial_apache_beam_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "délta", "epsilon", "zeta", "eta"]
    docs = []
    for i in range(120):
        kind = i % 6
        if kind == 0:
            text = ""  # empty doc: no shingles, never pairs
        elif kind == 1:
            text = " ".join(rng.choices(vocab, k=rng.randint(1, 2)))
        elif kind == 2:
            text = " ".join([rng.choice(vocab)] * rng.randint(3, 8))
        else:
            text = " ".join(rng.choices(vocab, k=rng.randint(3, 12)))
        docs.append((i, text))

    sdf = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            sdf, threshold=0.2, max_doc_freq=100
        ).collect()
    }

    from tutorial_apache_beam_spark.queries.llm import _NGRAM_ORACLE

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        (r[0], r[1], r[2]) for r in con.execute(_NGRAM_ORACLE).fetchall()
    }
    con.close()
    assert got == want
    # sanity: the generator actually produced near-dup pairs to verify
    assert len(want) > 0


# ---------------------------------------------------------------------------
# 3. URL normalization (pii) vs its SQL twin
# ---------------------------------------------------------------------------


def test_fuzz_normalize_url_matches_duckdb(spark):
    """200 random URL-shaped strings — mixed-case schemes/hosts, default
    and explicit ports, ':443' inside the PATH (must survive), utm_*
    params in every position, fragments, dangling '?', trailing '/',
    scheme-less strings, empty string, NULL — normalize identically in
    the Spark expression chain and the DuckDB SQL twin."""
    from tutorial_apache_beam_spark.operators.pii import (
        normalize_url,
        normalize_url_sql,
    )

    rng = random.Random(7)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp", ""]
    hosts = ["Example.COM", "a.b.co", "x.io:80", "x.io:443", "x.io:8080"]
    paths = ["", "/", "/Path/Sub", "/p:443/q", "/%7Euser"]
    queries = [
        "", "?a=1", "?utm_source=x", "?a=1&utm_medium=y", "?utm_a=1&b=2",
        "?a=1&utm_b=2&c=3", "?",
    ]
    frags = ["", "#frag", "#a?b=1"]
    cases: list[str | None] = [None, "", "no scheme here", "mailto:x@y.z"]
    while len(cases) < 200:
        s = rng.choice(schemes)
        u = (
            (f"{s}://" if s else "")
            + rng.choice(hosts)
            + rng.choice(paths)
            + rng.choice(queries)
            + rng.choice(frags)
        )
        cases.append(u)

    sdf = spark.createDataFrame([(i, u) for i, u in enumerate(cases)],
                                "i BIGINT, url STRING")
    got = {
        r["i"]: r["norm"]
        for r in sdf.select("i", normalize_url("url").alias("norm")).collect()
    }

    pdf = pd.DataFrame({"i": range(len(cases)), "url": cases})
    con = duckdb.connect()
    con.register("urls_fuzz", pdf)
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {normalize_url_sql('url')} AS norm FROM urls_fuzz"
        ).fetchall()
    }
    con.close()
    mismatches = {
        i: (got[i], want[i], cases[i]) for i in got if got[i] != want[i]
    }
    assert not mismatches, dict(list(mismatches.items())[:5])


# ---------------------------------------------------------------------------
# 4. As-of join (relational family) vs DuckDB's native ASOF JOIN
# ---------------------------------------------------------------------------


def test_fuzz_asof_join_matches_duckdb(spark):
    """120 purchases x 60 quotes with NULL join keys (must never match,
    like SQL `ON l.k = r.k`), NULL right VALUES (the matched row's NULL
    must come through — not an older row's value), equal-timestamp ties
    (at-or-before includes them), and keys with no right rows at all —
    identical rows to DuckDB ASOF LEFT JOIN, both directions."""
    from tutorial_apache_beam_spark.operators.relational import asof_join

    rng = random.Random(2204)
    base = _utc(2024, 5, 1)
    lefts, rights, seen_rts = [], [], set()
    for i in range(120):
        k = rng.choice([None, 1, 2, 3, 4])  # key 4: no right rows
        lefts.append((i, k, base + timedelta(seconds=rng.randint(0, 600))))
    for j in range(60):
        k = rng.choice([None, 1, 2, 3])
        ts = base + timedelta(seconds=rng.randint(0, 600))
        while (k, ts) in seen_rts:  # unique right ts per key: no tie
            ts += timedelta(microseconds=1)  # ambiguity on the right side
        seen_rts.add((k, ts))
        val = None if rng.random() < 0.25 else rng.randint(0, 999)
        rights.append((k, ts, val))

    sl = spark.createDataFrame(lefts, "lid BIGINT, k BIGINT, lts TIMESTAMP")
    sr = spark.createDataFrame(rights, "k BIGINT, rts TIMESTAMP, val BIGINT")
    lpdf = pd.DataFrame(lefts, columns=["lid", "k", "lts"])
    rpdf = pd.DataFrame(rights, columns=["k", "rts", "val"])
    con = duckdb.connect()
    con.register("l_fuzz", lpdf)
    con.register("r_fuzz", rpdf)

    for direction, cmp in (("backward", ">="), ("forward", "<=")):
        got = sorted(
            (
                r["lid"],
                None if r["val"] is None else int(r["val"]),
            )
            for r in asof_join(
                sl, sr, on=["k"], left_ts="lts", right_ts="rts",
                right_vals=["val"], direction=direction,
            ).collect()
        )
        want = sorted(
            (int(lid), None if pd.isna(val) else int(val))
            for lid, val in con.execute(
                f"""
                SELECT l.lid, r.val
                FROM l_fuzz l ASOF LEFT JOIN r_fuzz r
                  ON l.k = r.k AND l.lts {cmp} r.rts
                """
            ).fetchall()
        )
        assert got == want, f"direction={direction}"
    con.close()


# ---------------------------------------------------------------------------
# 5. Session windows (W2) vs a DuckDB gaps-and-islands twin
# ---------------------------------------------------------------------------


def test_fuzz_session_windows_match_duckdb(spark):
    """200 random events per run — dense bursts, exact-gap boundaries
    (an event at exactly prev+gap MERGES into the session — measured
    Spark session_window behavior: the gap test is `diff > gap`, not
    `>=`, so the nominal [start, last+gap) end is inclusive of an
    exactly-on-boundary next event), duplicate timestamps, sub-second offsets, NULL
    group keys (grouping semantics: NULLs form one group, unlike joins)
    — produce identical (user, session_start, session_end, count) rows
    in Spark's session_window and a lag/cumulative-sum SQL twin."""
    from tutorial_apache_beam_spark.operators.windowing import session_agg

    rng = random.Random(3304)
    base = _utc(2024, 5, 1)
    gap_s = 30
    cases = []
    t = 0.0
    for i in range(200):
        # mixture: tight burst, exact-gap step, clear break, duplicate
        step = rng.choice([0.0, 0.5, 3.0, float(gap_s), gap_s + 0.000001, 90.0])
        t += step
        user = rng.choice([None, 1, 2, 7])
        cases.append((i, user, base + timedelta(seconds=t)))

    sdf = spark.createDataFrame(cases, "eid BIGINT, user_id BIGINT, ts TIMESTAMP")
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["count"],
        )
        for r in session_agg(
            sdf, ts_col="ts", key_cols=["user_id"], gap=f"{gap_s} seconds"
        ).collect()
    }

    pdf = pd.DataFrame(cases, columns=["eid", "user_id", "ts"])
    con = duckdb.connect()
    con.register("sess_fuzz", pdf)
    want = {
        (
            None if pd.isna(u) else int(u),
            s.to_pydatetime() if hasattr(s, "to_pydatetime") else s,
            e.to_pydatetime() if hasattr(e, "to_pydatetime") else e,
            int(n),
        )
        for u, s, e, n in con.execute(
            f"""
            WITH o AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM sess_fuzz
            ), m AS (
              SELECT user_id, ts,
                     CASE WHEN prev IS NULL
                               OR ts > prev + INTERVAL {gap_s} SECOND
                          THEN 1 ELSE 0 END AS brk
              FROM o
            ), s AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM m
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL {gap_s} SECOND AS session_end,
                   count(*)::BIGINT AS n
            FROM s GROUP BY user_id, sid
            """
        ).fetchall()
    }
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# 6. Bucketed range join (relational family) vs a plain BETWEEN join
# ---------------------------------------------------------------------------


def test_fuzz_range_join_matches_duckdb(spark):
    """150 points x 60 intervals — negative values (floor-division bucket
    ids must round toward -inf on both engines), points exactly AT lo
    (included) and AT hi (excluded: [lo, hi) semantics), zero-width
    intervals (never match), intervals spanning many buckets, and NULL
    points/bounds (never match, like SQL comparisons) — the bucketed
    equi-join + residual filter must equal DuckDB's plain range join."""
    from tutorial_apache_beam_spark.operators.relational import (
        range_join_bucketed,
    )

    rng = random.Random(4404)
    points, intervals = [], []
    for i in range(150):
        p = rng.choice(
            [None, float(rng.randint(-300, 300)), rng.uniform(-300, 300)]
        )
        points.append((i, p))
    for j in range(60):
        kind = j % 5
        if kind == 0:
            lo = hi = float(rng.randint(-300, 300))   # zero-width
        elif kind == 1:
            lo = None
            hi = float(rng.randint(-300, 300))        # NULL bound
        elif kind == 2:
            lo = float(rng.randint(-300, 0))
            hi = lo + rng.choice([7.0, 55.0, 230.0])  # many buckets
        else:
            lo = rng.uniform(-300, 300)
            hi = lo + rng.uniform(0.0, 120.0)
        intervals.append((j, lo, hi))
    # force exact-boundary cases: one point AT a lo, one AT a hi
    points.append((900, intervals[4][1]))
    points.append((901, intervals[4][2]))

    sp = spark.createDataFrame(points, "pid BIGINT, p DOUBLE")
    si = spark.createDataFrame(intervals, "iid BIGINT, lo DOUBLE, hi DOUBLE")
    got = {
        (r["pid"], r["iid"])
        for r in range_join_bucketed(
            sp, si, left_point="p", right_lo="lo", right_hi="hi",
            bucket_width=10.0,
        ).collect()
    }

    con = duckdb.connect()
    con.register("pts_fuzz", pd.DataFrame(points, columns=["pid", "p"]))
    con.register(
        "itv_fuzz", pd.DataFrame(intervals, columns=["iid", "lo", "hi"])
    )
    want = {
        (int(a), int(b))
        for a, b in con.execute(
            """
            SELECT pid, iid FROM pts_fuzz JOIN itv_fuzz
              ON p >= lo AND p < hi
            """
        ).fetchall()
    }
    con.close()
    assert got == want
    assert len(want) > 50  # the generator produced real matches


# ---------------------------------------------------------------------------
# 7. Latest.per_key (Beam API) vs DuckDB arg_max over a struct
# ---------------------------------------------------------------------------


def test_fuzz_latest_per_key_matches_duckdb(spark):
    """150 random keyed rows — NULL values in non-key columns (the
    winning row's NULLs must come through intact: the atomic max_by
    (struct) aggregation, not per-column maxima), NULL keys (grouping:
    one NULL group), sub-second timestamp jitter; unique ts per key so
    the winner is well-defined on both engines."""
    from tutorial_apache_beam_spark.plans.pipeline import Latest, Pipeline

    rng = random.Random(5504)
    base = _utc(2024, 6, 1)
    rows, seen_ts = [], set()
    for i in range(150):
        k = rng.choice([None, 1, 2, 3])
        ts = base + timedelta(
            seconds=rng.randint(0, 500), microseconds=rng.randint(0, 999)
        )
        while (k, ts) in seen_ts:
            ts += timedelta(microseconds=1)
        seen_ts.add((k, ts))
        v1 = None if rng.random() < 0.3 else rng.randint(0, 99)
        v2 = None if rng.random() < 0.3 else f"s{rng.randint(0, 9)}"
        rows.append((k, ts, v1, v2))

    sdf = spark.createDataFrame(
        rows, "k BIGINT, ts TIMESTAMP, v1 BIGINT, v2 STRING"
    )
    p = Pipeline(spark)
    latest = p.create(sdf).apply("L", Latest.per_key("ts", "k")).df
    got = {
        (
            r["k"],
            r["ts"],
            None if r["v1"] is None else int(r["v1"]),
            r["v2"],
        )
        for r in latest.collect()
    }

    # NOTE the oracle needs the same atomic-struct treatment as the
    # operator: DuckDB's arg_max(v, ts) SKIPS NULL v (returning the
    # latest non-NULL value instead of the latest ROW's value), which is
    # exactly the per-column-stitching defect Latest.per_key was fixed
    # for. Packing the row into one (non-NULL) struct preserves the
    # winning row's NULLs on both engines.
    con = duckdb.connect()
    con.register("latest_fuzz", pd.DataFrame(rows, columns=["k", "ts", "v1", "v2"]))
    want = {
        (
            None if pd.isna(k) else int(k),
            ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts,
            None if w["v1"] is None else int(w["v1"]),
            w["v2"],
        )
        for k, ts, w in con.execute(
            """
            SELECT k, max(ts) AS ts,
                   arg_max({'v1': v1, 'v2': v2}, ts) AS w
            FROM latest_fuzz GROUP BY k
            """
        ).fetchall()
    }
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# 8. N-gram containment (excerpt detection) vs DuckDB  (r5: gate branch)
# ---------------------------------------------------------------------------


def test_fuzz_ngram_containment_pairs_match_duckdb(spark):
    """120 random documents, a third of them EXCERPTS (a contiguous slice
    of a longer host doc — the asymmetric case Jaccard misses and
    containment exists for), plus empty/sub-shingle/repeated-run docs:
    the counting-verify containment pipeline and the DuckDB
    list-intersection oracle must emit the identical directed pair set
    with identical rounded scores."""
    from tutorial_apache_beam_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    rng = random.Random(777)
    vocab = ["alpha", "beta", "gamma", "délta", "epsilon", "zeta", "eta"]
    docs = []
    hosts = []
    for i in range(120):
        kind = i % 6
        if kind == 0:
            text = ""
        elif kind == 1:
            text = " ".join(rng.choices(vocab, k=rng.randint(1, 2)))
        elif kind == 2 and hosts:
            # excerpt: a contiguous token slice of an earlier host doc
            h = rng.choice(hosts).split()
            lo = rng.randint(0, max(0, len(h) - 4))
            text = " ".join(h[lo : lo + rng.randint(3, 6)])
        else:
            text = " ".join(rng.choices(vocab, k=rng.randint(6, 16)))
            hosts.append(text)
        docs.append((i, text))

    sdf = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        (r["id_a"], r["id_b"], r["containment"])
        for r in ngram_containment_pairs(
            sdf, threshold=0.5, max_doc_freq=100
        ).collect()
    }

    from tutorial_apache_beam_spark.queries.llm import _CONTAINMENT_ORACLE

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(_CONTAINMENT_ORACLE).fetchall()
    }
    con.close()
    assert got == want
    # sanity: excerpts really produced asymmetric containment pairs
    assert len(want) > 0
    asym = {(a, b) for a, b, _ in want} - {(b, a) for a, b, _ in want}
    assert asym, "generator produced only symmetric pairs"


# ---------------------------------------------------------------------------
# 9. Partition-scoped keyed upsert vs a DuckDB relational twin (r5 fix)
# ---------------------------------------------------------------------------


def test_fuzz_upsert_partitions_matches_duckdb(spark, tmp_path):
    """3 seeded rounds of (base, updates) with keys that collide across
    partitions, keys that move partitions, duplicate keys in base, and
    duplicate rows in updates: the on-disk result of upsert_partitions
    must equal the relational statement of its contract — rows in
    untouched partitions survive; rows in touched partitions survive iff
    their (key, partition) is not updated; every update row lands."""
    from tutorial_apache_beam_spark.operators.maintenance import (
        upsert_partitions,
    )

    rng = random.Random(909)
    parts = [f"p{i}" for i in range(5)]
    for round_no in range(3):
        base = [
            (rng.choice(parts), rng.randint(0, 9), f"b{round_no}.{i}")
            for i in range(40)
        ]
        updates = [
            (rng.choice(parts), rng.randint(0, 9), f"u{round_no}.{i}")
            for i in range(20)
        ]
        if round_no == 2:  # duplicate update rows: BOTH land by contract
            updates.append(updates[0])

        tdir = str(tmp_path / f"tbl{round_no}")
        schema = "day STRING, k BIGINT, v STRING"
        upsert_partitions(
            spark, spark.createDataFrame(base, schema), tdir, "day", ["k"]
        )
        upsert_partitions(
            spark, spark.createDataFrame(updates, schema), tdir, "day", ["k"]
        )
        got = sorted(
            (r["day"], r["k"], r["v"])
            for r in spark.read.parquet(tdir).collect()
        )

        con = duckdb.connect()
        con.register("base", pd.DataFrame(base, columns=["day", "k", "v"]))
        con.register(
            "updates", pd.DataFrame(updates, columns=["day", "k", "v"])
        )
        want = sorted(
            (r[0], r[1], r[2])
            for r in con.execute(
                """
                SELECT b.* FROM base b
                WHERE b.day NOT IN (SELECT DISTINCT day FROM updates)
                   OR NOT EXISTS (SELECT 1 FROM updates u
                                  WHERE u.k = b.k AND u.day = b.day)
                UNION ALL
                SELECT * FROM updates
                """
            ).fetchall()
        )
        con.close()
        assert got == want, f"round {round_no}"
