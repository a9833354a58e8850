"""PPL pipeline compiler (plans/ppl): Spark vs DuckDB vs hand-computed."""

import duckdb
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.plans.ppl import parse_ppl


@pytest.fixture(scope="module")
def tiny(spark, tmp_path_factory):
    pdf = pd.DataFrame(
        {
            "event_id": range(12),
            "event_type": ["click", "view", "click", "error", "view", "click",
                           "error", "view", "click", "view", "error", "click"],
            "user_id": [1, 1, 2, 2, 3, 3, 1, 2, 3, 1, 2, 3],
            "value": [10.0, 55.5, 70.0, 30.0, 90.0, 55.5,
                      20.0, 85.0, 60.0, 40.0, 95.0, 5.0],
        }
    )
    p = str(tmp_path_factory.mktemp("ppl") / "events.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    return spark.createDataFrame(pdf), con


def run_both(tiny, q):
    df, con = tiny
    pipe = parse_ppl(q)
    got = pipe.to_df(df.sparkSession, {"events": df}).toPandas()
    exp = con.sql(pipe.to_sql()).df()
    ga = got.reindex(sorted(got.columns), axis=1).sort_values(
        sorted(got.columns)).reset_index(drop=True)
    ea = exp.reindex(sorted(exp.columns), axis=1).sort_values(
        sorted(exp.columns)).reset_index(drop=True)
    assert list(ga.columns) == list(ea.columns), q
    pd.testing.assert_frame_equal(
        ga, ea, check_dtype=False, check_exact=False, rtol=0, atol=1e-12
    )
    return got


QUERIES = [
    "search source=events | where value > 50 | stats count() as cnt by event_type | sort event_type",
    "search source=events | where value > 50 and event_type != 'view' | stats count() as cnt, avg(value) as a by event_type | eval ar = round(a, 4) | fields event_type, cnt, ar | sort event_type",
    "search source=events | stats sum(value) as sv, min(value) as mn, max(value) as mx, distinct_count(user_id) as du",
    "search source=events | eval v2 = value * 2 + 1 | where v2 >= 100 | sort -v2, event_id | head 3 | fields event_id, v2",
    "search source=events | sort value, event_id | dedup event_type | fields event_type, event_id | sort event_type",
    "search source=events | top 2 event_type",
    "search source=events | rare 1 event_type",
    "search source=events | top 1 event_type by user_id",
    "search source=events | rename value as v | where v < 20 | fields event_id, v | sort event_id",
    "search source=events | fields - user_id | where value > 90 | sort event_id",
    "search source=events | where not (event_type = 'view' or value < 50) | stats count() as cnt",
    "search source=events | where floor(value / 10) = 5 | stats count() as cnt",
    "search source=events | eval b = coalesce(value, 0) % 7 | stats sum(b) as sb",
    "search source=events | where length(event_type) = 5 | stats count() as cnt",
]


@pytest.mark.parametrize("q", QUERIES)
def test_spark_matches_duckdb(tiny, q):
    run_both(tiny, q)


def test_semantics_hand_checked(tiny):
    got = run_both(
        tiny,
        "search source=events | where value > 50 | stats count() as cnt "
        "by event_type | sort event_type",
    )
    assert {(r.event_type, r.cnt) for r in got.itertuples()} == {
        ("click", 3), ("error", 1), ("view", 3)
    }
    got = run_both(tiny, "search source=events | top 2 event_type")
    assert [(r.event_type, r.cnt) for r in got.itertuples()] == [
        ("click", 5), ("view", 4)
    ]
    got = run_both(
        tiny,
        "search source=events | sort value, event_id | dedup event_type "
        "| fields event_type, event_id | sort event_type",
    )
    # lowest-value row per type: click id 11 (5.0), error id 6 (20.0),
    # view id 9 (40.0)
    assert [(r.event_type, r.event_id) for r in got.itertuples()] == [
        ("click", 11), ("error", 6), ("view", 9)
    ]


def test_dedup_tie_respects_sort_tiebreaker(tiny):
    # values 55.5 appear twice for ids 1 (view) and 5 (click): within each
    # type the event_id tiebreaker decides deterministically
    got = run_both(
        tiny,
        "search source=events | where value = 55.5 | sort value, event_id "
        "| dedup event_type | fields event_type, event_id | sort event_type",
    )
    assert [(r.event_type, r.event_id) for r in got.itertuples()] == [
        ("click", 5), ("view", 1)
    ]


@pytest.mark.parametrize("bad", [
    "where x = 1",                                     # no search source
    "search source=events | head 5",                   # head without sort
    "search source=events | dedup event_type",         # dedup without sort
    "search source=events | stats median(value)",      # unknown agg
    "search source=events | frobnicate",               # unknown command
    "search source=events | where value ~ 3",          # bad operator
    "search source=events | eval x = nosuchfn(1)",     # unknown function
    "search source=events | where sort = 1",           # keyword as field
    "search source=events | stats sum() as s",         # sum needs an arg
    "search source=events | head 2.5",                 # non-integer head
])
def test_rejects(bad, tiny):
    df, _ = tiny
    with pytest.raises(ValueError):
        pipe = parse_ppl(bad)
        pipe.to_df(df.sparkSession, {"events": df}).collect()


def test_unknown_source(tiny):
    df, _ = tiny
    with pytest.raises(ValueError):
        parse_ppl("search source=nope | head 1").to_df(
            df.sparkSession, {"events": df}
        )


@pytest.fixture(scope="module")
def tiny_ts(spark, tmp_path_factory):
    pdf = pd.DataFrame(
        {
            "event_id": range(8),
            "event_type": ["a", "b", "a", "b", "a", "b", "a", "b"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            "props": ['{"k": 87}', '{"k": 3}', "none", '{"k": 12}',
                      '{"k": 5}', "x", '{"k": 1}', '{"k": 44}'],
            "ts": pd.to_datetime(
                ["2025-06-01 10:15", "2025-06-01 11:45", "2025-06-01 11:59",
                 "2025-06-02 00:01", "2025-06-02 10:15", "2025-06-02 10:59",
                 "2025-06-03 23:59", "2025-06-03 00:00"]),
        }
    )
    p = str(tmp_path_factory.mktemp("pplts") / "events.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    return spark.createDataFrame(pdf), con


TS_QUERIES = [
    "search source=events | stats count() as cnt by span(ts, 1d) | sort ts_span",
    "search source=events | stats count() as cnt, max(value) as mx by span(ts, 1h), event_type | sort ts_span, event_type",
    "search source=events | eventstats count() as n, max(value) as mx by event_type | fields event_id, n, mx | sort event_id",
    "search source=events | eventstats sum(value) as total | eval share = round(value / total, 6) | fields event_id, share | sort event_id",
    "search source=events | parse props '([0-9]+)' as kstr | where kstr != '' | fields event_id, kstr | sort event_id",
]


@pytest.mark.parametrize("q", TS_QUERIES)
def test_span_eventstats_parse_cross_engine(tiny_ts, q):
    run_both(tiny_ts, q)


def test_span_semantics(tiny_ts):
    got = run_both(
        tiny_ts,
        "search source=events | stats count() as cnt by span(ts, 1d) | sort ts_span",
    )
    assert [int(r.cnt) for r in got.itertuples()] == [3, 3, 2]


MULTI_SPAN_QUERIES = [
    "search source=events | stats count() as cnt by span(ts, 5m) | sort ts_span",
    "search source=events | stats count() as cnt by span(ts, 15m) | sort ts_span",
    "search source=events | stats count() as cnt by span(ts, 30m) | sort ts_span",
    "search source=events | stats count() as cnt by span(ts, 6h) | sort ts_span",
    "search source=events | stats count() as cnt, max(value) as mx by span(ts, 12h), event_type | sort ts_span, event_type",
]


@pytest.mark.parametrize("q", MULTI_SPAN_QUERIES)
def test_multi_span_cross_engine(tiny_ts, q):
    run_both(tiny_ts, q)


def test_multi_span_semantics(tiny_ts):
    """5m buckets are epoch-anchored fixed intervals: 10:15 and 11:45 /
    11:59 land in distinct buckets; 10:15+10:59 on day 2 split as
    expected.  Also asserts the bucket VALUES (floor-to-5m)."""
    got = run_both(
        tiny_ts,
        "search source=events | stats count() as cnt by span(ts, 30m) | sort ts_span",
    )
    import pandas as pd

    starts = list(pd.to_datetime(got["ts_span"]))
    assert all(t.minute in (0, 30) and t.second == 0 for t in starts)
    assert int(got["cnt"].sum()) == 8


def test_eventstats_keeps_rows(tiny_ts):
    got = run_both(
        tiny_ts,
        "search source=events | eventstats count() as n by event_type "
        "| fields event_id, n | sort event_id",
    )
    assert len(got) == 8
    assert set(got["n"]) == {4}


def test_parse_extracts(tiny_ts):
    got = run_both(
        tiny_ts,
        "search source=events | parse props '([0-9]+)' as kstr "
        "| where kstr = '87' | fields event_id | sort event_id",
    )
    assert list(got["event_id"]) == [0]


@pytest.mark.parametrize("bad", [
    # multi-unit spans must divide the parent grain; days have no
    # dialect-common n>1 rendering
    "search source=events | stats count() by span(ts, 7m)",
    "search source=events | stats count() by span(ts, 5h)",
    "search source=events | stats count() by span(ts, 2d)",
    "search source=events | stats count() by span(ts, 0m)",
    "search source=events | stats count() by span(ts, 1w)",
    "search source=events | eventstats count() as n by span(ts, 1d)",
    r"search source=events | parse props '(\d+)' as k",
    "search source=events | parse props missing_quotes as k",
])
def test_rejects_v2(bad, tiny_ts):
    df, _ = tiny_ts
    with pytest.raises(ValueError):
        parse_ppl(bad).to_df(df.sparkSession, {"events": df}).collect()


@pytest.fixture(scope="module")
def lookup_tables(spark, tmp_path_factory):
    ev = pd.DataFrame({"event_id": [1, 2, 3, 4], "uid": [10, 20, 10, 99],
                       "value": [1.0, 2.0, 3.0, 4.0]})
    users = pd.DataFrame({"uid": [10, 20, 30], "tier": ["gold", "silver", "gold"]})
    d = tmp_path_factory.mktemp("ppl_lu")
    ev.to_parquet(str(d / "ev.parquet")); users.to_parquet(str(d / "users.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{d}/ev.parquet')")
    con.sql(f"CREATE VIEW users AS SELECT * FROM read_parquet('{d}/users.parquet')")
    return {"ev": spark.createDataFrame(ev), "users": spark.createDataFrame(users)}, con


def test_lookup_same_name_key(lookup_tables):
    tables, con = lookup_tables
    q = ("search source=ev | lookup users uid "
         "| stats count() as cnt by tier | sort tier")
    pipe = parse_ppl(q)
    got = pipe.to_df(tables["ev"].sparkSession, tables).toPandas()
    exp = con.sql(pipe.to_sql()).df()
    # uid 99 has no user -> NULL tier bucket in both engines
    assert sorted(map(tuple, got.astype(str).values.tolist())) == \
           sorted(map(tuple, exp.astype(str).values.tolist()))
    by = {r.tier: r.cnt for r in got.itertuples()}
    assert by["gold"] == 2 and by["silver"] == 1


def test_lookup_aliased_key(spark, lookup_tables, tmp_path):
    tables, con = lookup_tables
    ev2 = tables["ev"].withColumnRenamed("uid", "user_ref")
    p = str(tmp_path / "ev2.parquet")
    ev2.toPandas().to_parquet(p)
    con.sql(f"CREATE VIEW ev2 AS SELECT * FROM read_parquet('{p}')")
    q = ("search source=ev2 | lookup users uid as user_ref "
         "| where tier = 'gold' | fields event_id, tier | sort event_id")
    pipe = parse_ppl(q)
    got = pipe.to_df(spark, {**tables, "ev2": ev2}).toPandas()
    exp = con.sql(pipe.to_sql()).df()
    assert got.astype(str).values.tolist() == exp.astype(str).values.tolist()
    assert list(got["event_id"]) == [1, 3]


def test_lookup_broadcast_in_plan(lookup_tables):
    tables, _ = lookup_tables
    pipe = parse_ppl("search source=ev | lookup users uid")
    df = pipe.to_df(tables["ev"].sparkSession, tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_lookup_unknown_table(lookup_tables):
    tables, _ = lookup_tables
    with pytest.raises(ValueError):
        parse_ppl("search source=ev | lookup nope uid").to_df(
            tables["ev"].sparkSession, tables)


def test_stddev_var(tiny):
    got = run_both(
        tiny,
        "search source=events | stats stddev(value) as sd, var(value) as vr "
        "by event_type | eval sd_r = round(sd, 6), vr_r = round(vr, 6) "
        "| fields event_type, sd_r, vr_r | sort event_type",
    )
    import statistics
    df, _ = tiny
    pdf = df.toPandas()
    for r in got.itertuples():
        vals = pdf[pdf.event_type == r.event_type]["value"].tolist()
        assert abs(r.sd_r - statistics.stdev(vals)) < 1e-5, r.event_type
        assert abs(r.vr_r - statistics.variance(vals)) < 1e-5, r.event_type


def test_unary_minus(tiny):
    got = run_both(
        tiny,
        "search source=events | eval neg = -value + 100 | where neg > -5 "
        "and value > -1 | stats count() as cnt, min(neg) as mn",
    )
    assert got["cnt"][0] == 12 and got["mn"][0] == 5.0


def test_eval_existing_name_refused(tiny):
    df, _ = tiny
    with pytest.raises(ValueError, match="already exists"):
        parse_ppl(
            "search source=events | eval value = value * 2"
        ).to_df(df.sparkSession, {"events": df}).collect()
    with pytest.raises(ValueError, match="already exists"):
        parse_ppl(
            "search source=events | parse event_type '([a-z]+)' as value"
        ).to_df(df.sparkSession, {"events": df}).collect()


def test_eventstats_distinct_count(tiny):
    got = run_both(
        tiny,
        "search source=events | eventstats distinct_count(user_id) as du "
        "by event_type | fields event_id, du | sort event_id",
    )
    # click/view groups span users {1,2,3}; error spans {1,2}
    assert len(got) == 12 and set(got["du"]) == {2, 3}


def test_fillnull_and_like(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "event_type": ["click_a", "click_b", None, "view_a"],
            "value": [1.0, None, 3.0, None],
        }
    )
    p = str(tmp_path / "nulls.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    df = spark.createDataFrame(pdf)
    q = (
        "search source=events | fillnull with 0 in value "
        "| fillnull with 'unknown' in event_type "
        "| where like(event_type, 'click%') or value = 0 "
        "| fields event_id, event_type, value | sort event_id"
    )
    pipe = parse_ppl(q)
    got = pipe.to_df(spark, {"events": df}).toPandas()
    exp = con.sql(pipe.to_sql()).df()
    ga = got.sort_values("event_id").reset_index(drop=True)
    ea = exp[got.columns].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ga, ea, check_dtype=False)
    # rows: 1 (click_a), 2 (click_b, value filled 0), 4 (value filled 0)
    assert list(ga["event_id"]) == [1, 2, 4]
    assert ga.loc[1, "value"] == 0.0 and ga.loc[2, "event_type"] == "view_a"
    with pytest.raises(ValueError):
        parse_ppl("search source=events | fillnull value")
    with pytest.raises(ValueError):
        parse_ppl("search source=events | where like(event_type, value)")
