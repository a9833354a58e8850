"""Dashboard aggregation operators (SURVEY.md §2.5).

These re-express, as DataFrame transforms, every aggregation the
reference's saved dashboards run through OpenSearch (extracted from
/root/reference/source/saved_objects/**/*.ndjson ``visState.aggs``):
terms-top-N (323×), count (220×), cardinality (32×), date_histogram (34×),
sum/max/avg, top_hits (32×), percentiles, filters-agg (45×) and the
bucket pipeline aggs (max/avg/sum/min_bucket).

All are pure built-in-function compositions — no UDFs — so Catalyst gives
partial aggregation, pushdown and whole-stage codegen for free; results are
deterministically ordered (metric desc, key asc) to mirror the OpenSearch
terms-agg tie-break and keep oracle comparisons stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def terms_topn(df: DataFrame, field: str, n: int = 10, metric: Column | None = None, metric_name: str = "cnt") -> DataFrame:
    """OpenSearch ``terms`` bucket agg: top-N keys by metric (default doc
    count), OpenSearch tie-break (metric desc, key asc)."""
    metric = metric if metric is not None else F.count("*")
    return (
        df.groupBy(field)
        .agg(metric.alias(metric_name))
        .orderBy(F.col(metric_name).desc(), F.col(field).asc())
        .limit(n)
    )


def date_histogram(df: DataFrame, ts: str = "ts", interval: str = "hour", metrics: list[Column] | None = None) -> DataFrame:
    """OpenSearch ``date_histogram``: tumbling event-time buckets."""
    metrics = metrics or [F.count("*").alias("cnt")]
    return (
        df.groupBy(F.date_trunc(interval, F.col(ts)).alias("bucket"))
        .agg(*metrics)
        .orderBy("bucket")
    )


def cardinality(df: DataFrame, field: str, exact: bool = False) -> DataFrame:
    """OpenSearch ``cardinality`` (HLL approx; exact variant for oracles)."""
    agg = F.count_distinct(F.col(field)) if exact else F.approx_count_distinct(field)
    return df.agg(agg.alias("cardinality"))


def filters_agg(df: DataFrame, buckets: dict[str, Column]) -> DataFrame:
    """OpenSearch ``filters`` agg: named predicate buckets -> counts.
    One pass, conditional counts, unpivoted to (bucket, cnt) rows."""
    aggs = [F.count(F.when(cond, 1)).alias(name) for name, cond in buckets.items()]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in buckets)
    return wide.selectExpr(f"stack({len(buckets)}, {stack}) as (bucket, cnt)").orderBy("bucket")


def top_hits(df: DataFrame, bucket: str, order_by: str, desc: bool = True, n_per_bucket: int = 1) -> DataFrame:
    """OpenSearch ``top_hits``: latest/first doc per bucket
    (row_number over an in-bucket sort)."""
    oc = F.col(order_by).desc() if desc else F.col(order_by).asc()
    w = Window.partitionBy(bucket).orderBy(oc)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_bucket)
        .drop("rn")
        .orderBy(bucket)
    )


def pipeline_bucket(df: DataFrame, outer: str, inner: Column, how: str = "max", metric: Column | None = None) -> DataFrame:
    """OpenSearch pipeline aggs (``max_bucket``/``min_bucket``/``avg_bucket``
    /``sum_bucket``): aggregate over sibling buckets' results.
    Two-level groupBy: inner buckets per outer key, then ``how`` over the
    inner metric."""
    metric = metric if metric is not None else F.count("*")
    per_bucket = df.groupBy(F.col(outer), inner.alias("inner_bucket")).agg(metric.alias("m"))
    outer_agg = {
        "max": F.max("m"),
        "min": F.min("m"),
        "avg": F.avg("m"),
        "sum": F.sum("m"),
    }[how]
    return per_bucket.groupBy(outer).agg(outer_agg.alias(f"{how}_bucket")).orderBy(outer)


def percentiles_bucket(
    df: DataFrame, outer: str, inner: Column, qs: list[float],
    metric: Column | None = None,
) -> DataFrame:
    """OpenSearch ``percentiles_bucket`` pipeline agg: exact interpolated
    percentiles over the sibling buckets' metric values (the same
    quantile_cont interpolation the ``percentiles`` agg freezes), one row
    per outer key.  Inner bucketing shuffles at bucket volume; the
    percentile runs over the (small) per-outer bucket metric lists."""
    metric = metric if metric is not None else F.count("*")
    per_bucket = df.groupBy(F.col(outer), inner.alias("inner_bucket")).agg(
        metric.alias("m")
    )
    aggs = [
        F.round(F.percentile(F.col("m"), q), 4).alias(f"p{int(q * 100)}")
        for q in qs
    ]
    return per_bucket.groupBy(outer).agg(*aggs).orderBy(outer)


def percentiles(df: DataFrame, field: str, qs: list[float]) -> DataFrame:
    """OpenSearch ``percentiles`` — exact interpolated percentile (matches
    SQL quantile_cont); approx variant is percentile_approx."""
    aggs = [F.percentile(F.col(field), q).alias(f"p{int(q*100)}") for q in qs]
    return df.agg(*aggs)


def value_histogram(df: DataFrame, field: str, interval: float, metrics: list[Column] | None = None) -> DataFrame:
    """OpenSearch numeric ``histogram`` agg: fixed-width value buckets
    (bucket key = floor(value / interval) * interval)."""
    metrics = metrics or [F.count("*").alias("cnt")]
    key = (F.floor(F.col(field) / interval) * interval).alias("bucket")
    return df.groupBy(key).agg(*metrics).orderBy("bucket")


def range_agg(df: DataFrame, field: str, edges: list[float]) -> DataFrame:
    """OpenSearch ``range`` agg: half-open buckets [lo, hi) from the sorted
    edge list, plus the open tail; labeled 'lo-hi' like OpenSearch keys."""
    if not edges:
        raise ValueError("range_agg requires at least one edge")
    c = F.col(field)
    # Seed with the open tail so a single-edge list is valid; chain the
    # [lo, hi) buckets onto it.  Carry the numeric lo so ordering is by
    # bucket position, not the label string ('100-200' < '30-70' lexically).
    tail = f"{edges[-1]:g}-*"
    expr = F.when(c >= edges[-1], tail)
    lo_expr = F.when(c >= edges[-1], F.lit(float(edges[-1])))
    for lo, hi in zip(edges, edges[1:]):
        lbl = f"{lo:g}-{hi:g}"
        cond = (c >= lo) & (c < hi)
        expr = expr.when(cond, lbl)
        lo_expr = lo_expr.when(cond, F.lit(float(lo)))
    return (
        df.withColumn("range_key", expr)
        .withColumn("_range_lo", lo_expr)
        .filter(F.col("range_key").isNotNull())
        .groupBy("range_key")
        .agg(F.count("*").alias("cnt"), F.first("_range_lo").alias("_lo"))
        .orderBy("_lo")
        .drop("_lo")
    )


def moving_avg(df: DataFrame, ts: str = "ts", interval: str = "day", window_size: int = 3) -> DataFrame:
    """OpenSearch ``moving_avg``/``moving_fn`` pipeline agg over a
    date_histogram: trailing mean of the last ``window_size`` buckets
    (window frame ROWS window_size-1 PRECEDING).

    Scale shape (this and the two pipeline aggs below): the unpartitioned
    ``Window.orderBy(bucket)`` funnels ONE task — deliberately.  Its
    input is the date_histogram output, whose row count is the number of
    time buckets (dozens to a few thousand even over 10^12 events —
    bounded by time range / interval, never by data volume), arriving
    pre-aggregated from the partial+final histogram.  A partitioned
    two-stage rewrite would only matter for pathological intervals
    (e.g. per-second buckets over years), where the caller should
    coarsen the histogram instead."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket").rowsBetween(-(window_size - 1), 0)
    return per.withColumn("mov_avg", F.round(F.avg("cnt").over(w), 4)).orderBy("bucket")


def derivative(df: DataFrame, ts: str = "ts", interval: str = "day") -> DataFrame:
    """OpenSearch ``derivative`` pipeline agg: bucket-over-bucket delta of
    a date_histogram count (first bucket null, like OpenSearch)."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket")
    return per.withColumn("deriv", F.col("cnt") - F.lag("cnt").over(w)).orderBy("bucket")


def cumulative_sum(df: DataFrame, ts: str = "ts", interval: str = "day") -> DataFrame:
    """OpenSearch ``cumulative_sum`` pipeline agg over a date_histogram."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per.withColumn("cum", F.sum("cnt").over(w)).orderBy("bucket")


def date_histogram_dense(
    df: DataFrame,
    ts: str = "ts",
    interval: str = "hour",
    extended_bounds: tuple[str, str] | None = None,
) -> DataFrame:
    """OpenSearch ``date_histogram`` with ``min_doc_count: 0`` (the
    Dashboards default): every interval bucket between min and max (or
    ``extended_bounds``) is emitted, zero-count when empty — dashboards
    need the continuous time axis.

    Scale shape: the bucket spine is a ``sequence()`` of interval
    timestamps exploded from the 1-row min/max aggregate — its row count
    is time-range/interval (bounded like the pipeline aggs, never data
    volume) — left-joined with the sparse histogram."""
    sparse = date_histogram(df, ts, interval)
    if extended_bounds is not None:
        lo, hi = extended_bounds
        bounds = sparse.sparkSession.range(1).select(
            F.date_trunc(interval, F.lit(lo).cast("timestamp")).alias("lo"),
            F.date_trunc(interval, F.lit(hi).cast("timestamp")).alias("hi"),
        )
    else:
        bounds = df.agg(
            F.date_trunc(interval, F.min(ts)).alias("lo"),
            F.date_trunc(interval, F.max(ts)).alias("hi"),
        )
    step = F.expr(f"interval 1 {interval}")
    spine = bounds.select(F.explode(F.sequence("lo", "hi", step)).alias("bucket"))
    return (
        spine.join(sparse, "bucket", "left")
        .select("bucket", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .orderBy("bucket")
    )


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """OpenSearch ``adjacency_matrix`` agg: doc counts for each named
    filter and each pairwise intersection (keys 'a', 'a&b' like
    OpenSearch, '&' joining the names sorted) — the correlation matrix
    dashboards build from it.  One conditional-count pass; empty buckets
    are omitted (OpenSearch behavior)."""
    names = sorted(filters)
    cells: dict[str, Column] = {}
    for i, a in enumerate(names):
        cells[a] = F.count(F.when(filters[a], 1))
        for b in names[i + 1:]:
            cells[f"{a}&{b}"] = F.count(F.when(filters[a] & filters[b], 1))
    wide = df.agg(*[c.alias(n) for n, c in cells.items()])
    stack = ", ".join(f"'{n}', `{n}`" for n in cells)
    return (
        wide.selectExpr(f"stack({len(cells)}, {stack}) as (key, doc_count)")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def serial_diff(df: DataFrame, ts: str = "ts", interval: str = "day", lag: int = 1) -> DataFrame:
    """OpenSearch ``serial_diff`` pipeline agg: lag-n difference of a
    date_histogram count (null for the first ``lag`` buckets)."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket")
    return per.withColumn("diff", F.col("cnt") - F.lag("cnt", lag).over(w)).orderBy("bucket")


def bucket_script(
    df: DataFrame,
    bucket: Column,
    metrics: dict[str, Column],
    script,
    out: str = "value_r",
) -> DataFrame:
    """OpenSearch ``bucket_script`` pipeline agg: a per-bucket expression
    over sibling metrics (e.g. error_rate = errors / total).  ``script``
    receives the metric Columns by name and returns a Column; computed in
    the same single groupBy pass (no second shuffle — OpenSearch likewise
    evaluates it on the reduced buckets)."""
    agged = df.groupBy(bucket.alias("bucket")).agg(
        *[m.alias(n) for n, m in metrics.items()]
    )
    expr = script(**{n: F.col(n) for n in metrics})
    return agged.withColumn(out, F.round(expr, 6)).orderBy("bucket")


def bucket_selector(
    df: DataFrame,
    bucket: Column,
    metrics: dict[str, Column],
    predicate,
) -> DataFrame:
    """OpenSearch ``bucket_selector`` pipeline agg: keep only buckets whose
    metrics satisfy the predicate (a HAVING clause over the bucket agg)."""
    agged = df.groupBy(bucket.alias("bucket")).agg(
        *[m.alias(n) for n, m in metrics.items()]
    )
    return agged.filter(predicate(**{n: F.col(n) for n in metrics})).orderBy("bucket")


def significant_terms(
    df: DataFrame,
    field: str,
    foreground: Column,
    n: int = 10,
    min_doc_count: int = 3,
) -> DataFrame:
    """OpenSearch ``significant_terms`` with the default JLH heuristic:
    terms over-represented in the foreground (filtered) set relative to
    the whole table.  score = (p_fg - p_bg) * (p_fg / p_bg), terms with
    p_fg <= p_bg dropped (JLH scores them 0), ES-style min_doc_count
    floor on the foreground count; top-n by (score desc, key asc).

    Scale shape: two partial-aggregated groupBys over the same scan (fg
    counts via a conditional count, so ONE pass computes both), a 1-row
    totals frame broadcast-crossed in, no UDFs — at 10^12 rows this is a
    single shuffle of the distinct keys."""
    kc = F.col(field)
    counts = df.groupBy(kc.alias(field)).agg(
        F.count("*").alias("bg_cnt"),
        F.count(F.when(foreground, 1)).alias("fg_cnt"),
    )
    totals = df.agg(
        F.count("*").alias("superset_size"),
        F.count(F.when(foreground, 1)).alias("subset_size"),
    )
    p_fg = F.col("fg_cnt") / F.col("subset_size")
    p_bg = F.col("bg_cnt") / F.col("superset_size")
    score = (p_fg - p_bg) * (p_fg / p_bg)
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(F.col("fg_cnt") >= min_doc_count)
        .withColumn("score_r", F.round(score, 6))
        .filter(p_fg > p_bg)
        .select(field, "fg_cnt", "bg_cnt", "score_r")
        .orderBy(F.col("score_r").desc(), F.col(field).asc())
        .limit(n)
    )


def rare_terms(df: DataFrame, field: str, max_doc_count: int = 1) -> DataFrame:
    """OpenSearch ``rare_terms``: the long tail — terms appearing in at
    most ``max_doc_count`` documents, ordered count asc then key asc.
    (OpenSearch implements this with a CuckooFilter to bound memory; a
    groupBy + HAVING is the exact-set equivalent and partial aggregation
    keeps the shuffle at distinct-key volume.)"""
    return (
        df.groupBy(field)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") <= max_doc_count)
        .orderBy(F.col("cnt").asc(), F.col(field).asc())
    )


def composite_agg(
    df: DataFrame,
    sources: list[tuple[str, Column]],
    size: int = 10,
    after: tuple | None = None,
    metrics: list[Column] | None = None,
) -> DataFrame:
    """OpenSearch ``composite`` agg: paginated multi-source buckets in
    composite-key order, resumed from the ``after`` cursor (the standard
    way to stream ALL buckets of an unbounded-cardinality aggregation
    out of a dashboard, page by page).

    The cursor filter compiles to a lexicographic key comparison pushed
    below the aggregation (groupBy still sees only post-cursor rows is
    NOT possible since bucket membership needs all rows of a key — so the
    filter applies to the aggregated keys; partial aggregation still
    collapses each key map-side).  orderBy + limit = TakeOrdered, no full
    sort at scale."""
    if not sources:
        raise ValueError("composite_agg requires at least one source")
    metrics = metrics or [F.count("*").alias("cnt")]
    keys = [c.alias(name) for name, c in sources]
    grouped = df.groupBy(*keys).agg(*metrics)
    if after is not None:
        if len(after) != len(sources):
            raise ValueError(
                f"after cursor has {len(after)} values for {len(sources)} sources"
            )
        cond = F.lit(False)
        for (name, _), av in reversed(list(zip(sources, after))):
            cond = (F.col(name) > F.lit(av)) | ((F.col(name) == F.lit(av)) & cond)
        grouped = grouped.filter(cond)
    names = [name for name, _ in sources]
    return grouped.orderBy(*[F.col(n).asc() for n in names]).limit(size)


def extended_stats(df: DataFrame, field: str, by: str | None = None, sigma: float = 2.0) -> DataFrame:
    """OpenSearch ``extended_stats``: count/min/max/sum/avg plus
    sum_of_squares, variance, std_deviation and the ±sigma bounds —
    computed with ES's own naive formula (variance = sum_sq/n - mean²)
    so the SQL oracle can replicate the arithmetic exactly (Welford-style
    built-ins would differ in the last ulps)."""
    c = F.col(field).cast("double")
    base = df.groupBy(by) if by else df.groupBy()
    out = base.agg(
        F.count(c).alias("cnt"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.sum(c).alias("sum_v"),
        F.sum(c * c).alias("sum_sq"),
    )
    mean = F.col("sum_v") / F.col("cnt")
    variance = F.col("sum_sq") / F.col("cnt") - mean * mean
    std = F.sqrt(variance)
    out = out.select(
        *([by] if by else []),
        "cnt",
        F.round("min_v", 6).alias("min_r"),
        F.round("max_v", 6).alias("max_r"),
        F.round("sum_v", 6).alias("sum_r"),
        F.round(mean, 6).alias("avg_r"),
        F.round("sum_sq", 6).alias("sum_sq_r"),
        F.round(variance, 6).alias("variance_r"),
        F.round(std, 6).alias("std_dev_r"),
        F.round(mean + sigma * std, 6).alias("std_upper_r"),
        F.round(mean - sigma * std, 6).alias("std_lower_r"),
    )
    return out.orderBy(by) if by else out


def multi_terms(df: DataFrame, fields: list[str], n: int = 10) -> DataFrame:
    """OpenSearch ``multi_terms``: top-N compound keys by doc count
    (count desc, then each key asc — the ES tie-break).  Partial
    aggregation keeps the shuffle at distinct-compound-key volume."""
    return (
        df.groupBy(*fields)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), *[F.col(f).asc() for f in fields])
        .limit(n)
    )


def weighted_avg(df: DataFrame, value: Column, weight: Column) -> DataFrame:
    """OpenSearch ``weighted_avg``: sum(value*weight)/sum(weight), rows
    with NULL value or weight skipped (ES skips missing)."""
    v = value.cast("double")
    w = weight.cast("double")
    ok = v.isNotNull() & w.isNotNull()
    return df.agg(
        F.round(
            F.sum(F.when(ok, v * w)) / F.sum(F.when(ok, w)), 6
        ).alias("weighted_avg_r")
    )


def percentile_ranks(df: DataFrame, field: str, values: list[float]) -> DataFrame:
    """OpenSearch ``percentile_ranks``: for each probe value, the percent
    of non-null docs with field <= value.  Exact CDF (ES interpolates a
    TDigest sketch; the exact form is this engine's frozen contract and
    is SQL-replicable bit-for-bit)."""
    c = F.col(field).cast("double")
    return df.agg(
        *[
            F.round(
                100.0 * F.count(F.when(c <= float(v), 1)) / F.count(c), 6
            ).alias(f"rank_{i}")
            for i, v in enumerate(values)
        ]
    )


#: auto_date_histogram interval ladder, in seconds (fixed intervals — the
#: calendar-month/year roundings ES also offers are approximated by 30d /
#: 365d fixed buckets; frozen so the SQL oracle can join the same VALUES)
AUTO_DH_LADDER = [
    1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800, 43200,
    86400, 604800, 2_592_000, 31_536_000,
]


def auto_date_histogram(
    df: DataFrame, ts: str = "ts", target_buckets: int = 20
) -> DataFrame:
    """OpenSearch ``auto_date_histogram``: pick the smallest ladder
    interval whose bucket count (floor(max/i) - floor(min/i) + 1, epoch
    seconds) fits ``target_buckets``, then histogram on it.  The span
    scan is a 2-value aggregate (metadata-scale driver action); the
    histogram itself is one partial-aggregated groupBy."""
    # NTZ-safe epoch seconds: NTZ -> TZ keeps the wall time under the
    # UTC session, matching DuckDB's epoch() on naive timestamps
    epoch = F.col(ts).cast("timestamp").cast("long")
    row = df.agg(F.min(epoch).alias("lo"), F.max(epoch).alias("hi")).first()
    if row["lo"] is None:
        raise ValueError("auto_date_histogram: no rows")
    lo, hi = int(row["lo"]), int(row["hi"])
    interval = AUTO_DH_LADDER[-1]
    for i in AUTO_DH_LADDER:
        if hi // i - lo // i + 1 <= target_buckets:
            interval = i
            break
    bucket = F.timestamp_seconds(
        F.floor(epoch / F.lit(interval)) * F.lit(interval)
    )
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("interval_sec", F.lit(interval))
        .orderBy("bucket")
    )


def median_absolute_deviation(df: DataFrame, field: str) -> DataFrame:
    """OpenSearch ``median_absolute_deviation``: median(|x - median(x)|).

    ES computes both medians on a TDigest sketch; the exact interpolated
    median (SQL quantile_cont arithmetic) is this engine's frozen
    contract.  Two aggregation passes; the 1-row median frame joins back
    by broadcast-able cross join, so the second pass stays one
    partial+final aggregate with no extra shuffle of the data."""
    c = F.col(field).cast("double")
    med = df.agg(F.percentile(c, 0.5).alias("_med"))
    dev = df.crossJoin(F.broadcast(med)).select(
        F.abs(c - F.col("_med")).alias("_dev")
    )
    return dev.agg(F.round(F.percentile(F.col("_dev"), 0.5), 6).alias("mad_r"))


def top_metrics(
    df: DataFrame, sort_field: str, metric_fields: list[str], desc: bool = True,
    n: int = 1,
) -> DataFrame:
    """OpenSearch ``top_metrics``: the metric fields of the top-``n`` rows
    by ``sort_field`` (e.g. 'the value at the latest timestamp').  Ties
    break on the metric fields ascending so the page is deterministic —
    a TakeOrdered, no full sort."""
    order = [F.col(sort_field).desc() if desc else F.col(sort_field).asc()]
    order += [F.col(f).asc() for f in metric_fields]
    return df.select(sort_field, *metric_fields).orderBy(*order).limit(n)


def stats_bucket(
    df: DataFrame, ts: str = "ts", interval: str = "day",
    metric: Column | None = None,
) -> DataFrame:
    """OpenSearch ``stats_bucket`` pipeline agg: count/min/max/avg/sum over
    a date_histogram's bucket metrics, one row out."""
    per = date_histogram(df, ts, interval, [
        (metric if metric is not None else F.count("*")).alias("m")
    ])
    return per.agg(
        F.count("m").alias("n_buckets"),
        F.min("m").alias("min_m"),
        F.max("m").alias("max_m"),
        F.round(F.avg("m"), 6).alias("avg_m_r"),
        F.sum("m").alias("sum_m"),
    )


def cumulative_cardinality(
    df: DataFrame, ts: str = "ts", interval: str = "day", field: str = "user_id"
) -> DataFrame:
    """OpenSearch ``cumulative_cardinality`` pipeline agg: distinct count
    of ``field`` accumulated across date_histogram buckets ("new users
    per day" when differenced).

    Scale shape: a windowed COUNT(DISTINCT) would hold per-bucket state;
    instead each key contributes only its FIRST bucket (min-aggregate per
    key — partial-aggregated, one shuffle at distinct-key volume), the
    per-bucket first-seen counts cum-sum over the tiny bucket frame, and
    a left join onto the bucket spine carries the running total forward."""
    bucket = F.date_trunc(interval, F.col(ts)).alias("bucket")
    buckets = df.groupBy(bucket).agg(F.count("*").alias("cnt"))
    firsts = (
        df.filter(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.min(F.date_trunc(interval, F.col(ts))).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("first_seen"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    joined = buckets.join(firsts, "bucket", "left").withColumn(
        "cum_cardinality",
        F.sum(F.coalesce(F.col("first_seen"), F.lit(0))).over(w),
    )
    return joined.select("bucket", "cnt", "cum_cardinality").orderBy("bucket")


def sampler_terms(
    df: DataFrame, id_field: str, field: str, shard_size: int = 100, n: int = 10
) -> DataFrame:
    """OpenSearch ``sampler`` agg + nested terms: run the terms agg over a
    bounded sample of docs.  ES samples the best-scoring shard_size docs
    per shard; with no scoring context this engine freezes a
    deterministic variant — the ``shard_size`` docs with the lowest
    md5(id) (a uniform, engine-independent hash order), so the oracle
    reproduces the exact sample."""
    sample = (
        df.withColumn("_h", F.md5(F.col(id_field).cast("string")))
        .orderBy(F.col("_h").asc(), F.col(id_field).asc())
        .limit(shard_size)
    )
    return terms_topn(sample, field, n=n)


def diversified_sampler_terms(
    df: DataFrame,
    id_field: str,
    diversify_field: str,
    field: str,
    max_docs_per_value: int = 3,
    shard_size: int = 100,
    n: int = 10,
) -> DataFrame:
    """OpenSearch ``diversified_sampler`` + nested terms: like ``sampler``
    but with at most ``max_docs_per_value`` docs per ``diversify_field``
    value in the sample (de-bias a dominant key before aggregating).
    Same frozen determinism recipe as sampler_terms: ranking inside each
    diversity key AND the global sample cut both order by
    (md5(id), id), so the oracle reproduces the exact sample.  Scale:
    one window over the diversify key + one global limit — the
    shard_size cut bounds everything downstream."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(diversify_field).orderBy(
        F.md5(F.col(id_field).cast("string")).asc(), F.col(id_field).asc()
    )
    capped = (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_docs_per_value)
        .drop("_rk")
    )
    sample = (
        capped.withColumn("_h", F.md5(F.col(id_field).cast("string")))
        .orderBy(F.col("_h").asc(), F.col(id_field).asc())
        .limit(shard_size)
    )
    return terms_topn(sample, field, n=n)


def missing_agg(df: DataFrame, field: str) -> DataFrame:
    """OpenSearch ``missing`` agg: docs without a value for the field."""
    return df.agg(
        F.count(F.when(F.col(field).isNull(), 1)).alias("missing_cnt")
    )


def bucket_sort(
    df: DataFrame, ts: str = "ts", interval: str = "day",
    by: str = "cnt", desc: bool = True, size: int = 5, offset: int = 0,
) -> DataFrame:
    """OpenSearch ``bucket_sort`` pipeline agg: reorder/truncate a
    date_histogram's buckets by a metric (the "top 5 busiest days"
    dashboard shape).  Offset + limit over the bucket-count-sized frame."""
    per = date_histogram(df, ts, interval)
    order = [F.col(by).desc() if desc else F.col(by).asc(), F.col("bucket").asc()]
    out = per.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(size)


def normalize_agg(
    df: DataFrame, ts: str = "ts", interval: str = "day"
) -> DataFrame:
    """OpenSearch ``normalize`` pipeline agg (percent_of_sum): each
    bucket's share of the histogram total.  The total joins back as a
    1-row broadcast, division exact in float64."""
    per = date_histogram(df, ts, interval)
    total = per.agg(F.sum("cnt").alias("_total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "bucket", "cnt",
            F.round(100.0 * F.col("cnt") / F.col("_total"), 6).alias("pct_of_sum_r"),
        )
        .orderBy("bucket")
    )


def anomaly_zscore(
    df: DataFrame,
    ts: str = "ts",
    interval: str = "hour",
    window_size: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over date_histogram counts —
    the OpenSearch anomaly-detection plugin's alerting idiom reduced to
    a deterministic closed form (the plugin's RCF forest is randomized;
    a trailing-window z-score is the standard SIEM baseline the
    reference's CloudWatch-alarm integrations assume).

    Per bucket: mean/std of the TRAILING ``window_size`` buckets
    (current excluded, so a spike can't mask itself), population
    variance via E[x^2]-E[x]^2 (round-6 — the matrix_stats naive-moment
    recipe, SQL-replicable), z = (cnt-mean)/std, flagged when |z| >
    ``z_threshold``.  Buckets without a full trailing window emit NULL
    z / false flag.  Scale: the windowed pass runs over the REDUCED
    bucket frame (cardinality = time-range/interval), same single-task
    shape as every pipeline agg here; the raw scan is the distributed
    groupBy."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket").rowsBetween(-window_size, -1)
    n_prev = F.count("cnt").over(w)
    mean = F.avg(F.col("cnt").cast("double")).over(w)
    m2 = F.avg(F.col("cnt").cast("double") * F.col("cnt")).over(w)
    var = F.round(m2 - mean * mean, 6)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        (n_prev == window_size) & (std > 0),
        F.round((F.col("cnt") - mean) / std, 6),
    )
    return per.select(
        "bucket",
        "cnt",
        F.when(n_prev == window_size, F.round(mean, 6)).alias("mean_r"),
        z.alias("z_r"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("anomaly"),
    ).orderBy("bucket")


def moving_fn(
    df: DataFrame, ts: str = "ts", interval: str = "day",
    window_size: int = 3, how: str = "max",
) -> DataFrame:
    """OpenSearch ``moving_fn`` with the stock MovingFunctions
    (max/min/sum/unweightedAvg) over a trailing bucket window; same
    bucket-count-sized single-task window as moving_avg (see its
    docstring for the scale argument)."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket").rowsBetween(-(window_size - 1), 0)
    fn = {"max": F.max, "min": F.min, "sum": F.sum, "avg": F.avg}[how]
    col = fn(F.col("cnt")).over(w)
    if how == "avg":
        col = F.round(col, 6)
    return per.withColumn(f"mov_{how}", col).orderBy("bucket")


def matrix_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """OpenSearch ``matrix_stats``: per-field mean/variance plus pairwise
    covariance and Pearson correlation.  ES's streaming estimator is
    re-expressed with the naive sum formulas (cov = E[xy] - E[x]E[y]) so
    the SQL oracle replicates the arithmetic; one partial+final aggregate
    over sums of products, rows with any NULL field skipped (ES drops
    incomplete documents)."""
    cols = [F.col(f).cast("double") for f in fields]
    ok = cols[0].isNotNull()
    for c in cols[1:]:
        ok = ok & c.isNotNull()
    sums = [F.sum(F.when(ok, c)).alias(f"s_{i}") for i, c in enumerate(cols)]
    sqs = [F.sum(F.when(ok, c * c)).alias(f"q_{i}") for i, c in enumerate(cols)]
    prods = [
        F.sum(F.when(ok, cols[i] * cols[j])).alias(f"p_{i}_{j}")
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    wide = df.agg(F.count(F.when(ok, 1)).alias("n"), *sums, *sqs, *prods)
    n = F.col("n").cast("double")
    out_cols = [F.col("n").alias("doc_count")]
    for i, f in enumerate(fields):
        mean = F.col(f"s_{i}") / n
        var = F.col(f"q_{i}") / n - mean * mean
        out_cols += [
            F.round(mean, 6).alias(f"mean_{f}_r"),
            F.round(var, 6).alias(f"variance_{f}_r"),
        ]
    for i in range(len(fields)):
        for j in range(i + 1, len(fields)):
            mi = F.col(f"s_{i}") / n
            mj = F.col(f"s_{j}") / n
            cov = F.col(f"p_{i}_{j}") / n - mi * mj
            vi = F.col(f"q_{i}") / n - mi * mi
            vj = F.col(f"q_{j}") / n - mj * mj
            corr = cov / F.sqrt(vi * vj)
            out_cols += [
                F.round(cov, 6).alias(f"cov_{fields[i]}_{fields[j]}_r"),
                F.round(corr, 6).alias(f"corr_{fields[i]}_{fields[j]}_r"),
            ]
    return wide.select(*out_cols)


def date_range_agg(
    df: DataFrame, ts: str = "ts", edges: list[str] | None = None
) -> DataFrame:
    """OpenSearch ``date_range`` agg: labeled half-open [from, to) buckets
    over timestamp edges (the 'last week / last month / older' dashboard
    shape).  Same single conditional-sum pass as range_agg."""
    edges = edges or []
    ts_col = F.col(ts)
    rows = []
    bounds = [None, *edges, None]
    for i in range(len(bounds) - 1)[::1]:
        lo, hi = bounds[i], bounds[i + 1]
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts_col >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (ts_col < F.lit(hi).cast("timestamp"))
        label = f"{lo or '*'}..{hi or '*'}"
        rows.append((label, cond))
    aggs_ = [F.count(F.when(c, 1)).alias(lbl) for lbl, c in rows]
    wide = df.agg(*aggs_)
    stack = ", ".join(f"'{lbl}', `{lbl}`" for lbl, _ in rows)
    return wide.selectExpr(
        f"stack({len(rows)}, {stack}) as (bucket, cnt)"
    ).orderBy("bucket")


def string_stats(df: DataFrame, field: str) -> DataFrame:
    """OpenSearch ``string_stats``: value count, min/max/avg length and
    Shannon entropy of the CHARACTER distribution across all values.

    Two exact passes: per-value lengths aggregate in one partial+final
    groupBy; the character histogram explodes to (char, count) — shuffle
    cardinality = alphabet size, not corpus size — and entropy folds over
    that tiny frame.  -sum(p * log2(p)) matches ES; the oracle runs the
    same formula (log2 is libm-correct on both engines at the rounded
    precision)."""
    c = F.col(field)
    lens = df.agg(
        F.count(c).alias("cnt"),
        F.min(F.length(c)).alias("min_length"),
        F.max(F.length(c)).alias("max_length"),
        F.round(F.avg(F.length(c)), 6).alias("avg_length_r"),
    )
    chars = (
        df.select(F.explode(F.split(c, "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count("*").alias("n"))
    )
    tot = chars.agg(F.sum("n").alias("t"))
    ent = (
        chars.crossJoin(F.broadcast(tot))
        .select(
            (
                -(F.col("n") / F.col("t"))
                * F.log2(F.col("n") / F.col("t"))
            ).alias("e")
        )
        .agg(F.round(F.sum("e"), 6).alias("entropy_r"))
    )
    return lens.crossJoin(ent)


def boxplot_agg(df: DataFrame, field: str) -> DataFrame:
    """OpenSearch ``boxplot`` agg: min / max / q1 / q2 / q3 plus the
    whiskers (nearest data points inside the 1.5*IQR Tukey fences) —
    exact interpolated quartiles as the frozen contract (ES uses TDigest;
    the exact CDF is this engine's documented stand-in, like
    percentiles/percentile_ranks).  Fences are rounded to 6 dp BEFORE the
    comparison in both engines so a last-ulp quantile-interpolation
    difference can never flip whisker membership."""
    c = F.col(field).cast("double")
    q = df.agg(
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
        F.percentile(c, 0.25).alias("q1"),
        F.percentile(c, 0.5).alias("q2"),
        F.percentile(c, 0.75).alias("q3"),
    )
    j = df.crossJoin(F.broadcast(q))
    lo_fence = F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6)
    hi_fence = F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6)
    return j.agg(
        F.min(F.col("mn")).alias("mn"),
        F.max(F.col("mx")).alias("mx"),
        F.round(F.min("q1"), 6).alias("q1_r"),
        F.round(F.min("q2"), 6).alias("q2_r"),
        F.round(F.min("q3"), 6).alias("q3_r"),
        F.min(F.when(c >= lo_fence, c)).alias("lower_whisker"),
        F.max(F.when(c <= hi_fence, c)).alias("upper_whisker"),
    )


def t_test_agg(df: DataFrame, field: str, group_field: str, a: str, b: str) -> DataFrame:
    """OpenSearch ``t_test`` agg (heteroscedastic / Welch, the default):
    t = (m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b) with UNBIASED sample
    variance s2 = (sumsq - sum^2/n) / (n - 1).  The variance and t are
    spelled with the identical textual arithmetic in the SQL oracle."""
    c = F.col(field).cast("double")
    g = df.filter(F.col(group_field).isin([a, b])).groupBy(group_field).agg(
        F.count(c).alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("ss"),
    )
    va = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    stats = g.select(
        group_field,
        F.col("n"),
        (F.col("s") / F.col("n")).alias("m"),
        va.alias("v"),
    )
    ga = stats.filter(F.col(group_field) == a).select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    gb = stats.filter(F.col(group_field) == b).select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    return ga.crossJoin(gb).select(
        "na",
        "nb",
        F.round(
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb")),
            6,
        ).alias("t_r"),
    )


def rate_agg(
    df: DataFrame, ts: str = "ts", interval: str = "day", unit_hours: float = 1.0
) -> DataFrame:
    """OpenSearch ``rate`` agg inside a date_histogram: per-bucket event
    count normalized to a rate per ``unit_hours`` (the 'events per hour
    by day' dashboard shape).  Bucket width is the histogram interval;
    the divisor is width/unit (24 for day buckets at per-hour rate)."""
    hours = {"hour": 1.0, "day": 24.0, "week": 168.0}[interval]
    per = date_histogram(df, ts, interval)
    return per.select(
        "bucket",
        "cnt",
        F.round(F.col("cnt") / F.lit(hours / unit_hours), 6).alias("rate_r"),
    ).orderBy("bucket")


def categorize_text(
    df: DataFrame, text: Column, n: int = 10, n_tokens: int = 6
) -> DataFrame:
    """OpenSearch ``categorize_text`` agg, deterministically re-expressed:
    group log messages by token template.  The real agg drains messages
    through an ML tokenizer/categorizer; this engine freezes the
    deterministic core — lowercase, digit runs collapsed to ``#``, the
    first ``n_tokens`` word tokens joined as the category key — so the
    result is a pure hash aggregation with a DuckDB value oracle (the
    identical regex/slice pipeline renders in both engines).  Buckets
    ordered (count desc, key asc), top ``n``.

    Scale: one regexp_replace + split + slice inside codegen, one
    map-side-combinable groupBy — no UDF, no shuffle beyond the agg."""
    tmpl = F.regexp_replace(F.lower(text), "[0-9]+", "#")
    toks = F.filter(F.split(tmpl, "[^a-z#]+"), lambda x: x != "")
    key = F.array_join(F.slice(toks, 1, n_tokens), " ")
    return (
        df.groupBy(key.alias("category"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("category").asc())
        .limit(n)
    )
