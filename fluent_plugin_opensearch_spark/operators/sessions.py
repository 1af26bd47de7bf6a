"""Sequence/session operators over the (conv_id, turn_idx) ordering
invariant (SURVEY.md §2.7 O4). The reference has no windowed analytics,
but the graft's transcript model makes these the bread-and-butter
aggregate queries a log pipeline serves; all are single-shuffle window
plans partitioned on conv_id (salt-compatible)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Split conversations into sessions at inactivity gaps: a new
    session starts when the inter-turn gap exceeds ``gap_minutes``.
    session_no = running count of gap-breaks (cumulative sum over the
    turn order) — one window, no UDF, deterministic."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_break = F.when(gap > gap_minutes * 60 * 1_000_000, 1).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def session_stats(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates: turns, span, roles seen."""
    s = sessionize(df, gap_minutes)
    return s.groupBy("conv_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))).alias(
            "span_us"
        ),
        F.countDistinct("role").alias("n_roles"),
    )


def sessionize_blocked(df: DataFrame, gap_minutes: int = 30, block_size: int = 10_000) -> DataFrame:
    """Skew-safe sessionize: identical output to ``sessionize`` but a
    hot conversation (FIXTURES.md: ~1% of convs at 1000× turns) never
    lands in one window task.

    Two-phase prefix sum:
      1. window per (conv_id, block = turn_idx ÷ block_size): local
         break flags + local cumulative sum — a hot conv splits into
         turns/block_size parallel tasks;
      2. window per conv_id over BLOCK SUMMARIES (one row per block —
         tiny): carry break totals across blocks, plus the boundary
         break decided by prev-block-last-ts vs this-block-first-ts;
      3. join offsets back on (conv_id, block).

    The same decomposition pattern applies to any associative scan over
    the turn order (running token counts, tool-call chains).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    blocked = df.withColumn("_block", (F.col("turn_idx") / block_size).cast("bigint"))

    w_local = Window.partitionBy("conv_id", "_block").orderBy("turn_idx")
    gap_local = us - F.lag(us).over(w_local)  # null at block start
    brk_local = F.when(gap_local > gap_us, 1).otherwise(0)
    local = blocked.withColumn(
        "_local_cum", F.sum(brk_local).over(w_local.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("_us", us)

    summaries = local.groupBy("conv_id", "_block").agg(
        F.max("_local_cum").alias("_blk_breaks"),
        F.min_by("_us", "turn_idx").alias("_first_us"),
        F.max_by("_us", "turn_idx").alias("_last_us"),
    )
    w_blk = Window.partitionBy("conv_id").orderBy("_block")
    boundary_brk = F.when(
        F.col("_first_us") - F.lag("_last_us").over(w_blk) > gap_us, 1
    ).otherwise(0)
    offsets = summaries.withColumn(
        "_offset",
        F.coalesce(
            F.sum(F.col("_blk_breaks")).over(w_blk.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        + F.sum(boundary_brk).over(w_blk.rowsBetween(Window.unboundedPreceding, 0)),
    ).select("conv_id", "_block", "_offset")

    return (
        local.join(offsets, on=["conv_id", "_block"], how="inner")
        .withColumn("session_no", (F.col("_local_cum") + F.col("_offset")).cast("int"))
        .drop("_block", "_local_cum", "_us", "_offset")
    )


def hourly_rollup(df: DataFrame) -> DataFrame:
    """Hour-grain pre-aggregate (the continuous-aggregate base table):
    per (sink-day, hour) row counts + parse metrics. At scale this is
    the materialized rollup a dashboard reads instead of raw turns."""
    return df.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def daily_from_hourly(hourly: DataFrame) -> DataFrame:
    """Day grain REAGGREGATED FROM the hourly rollup — the cascade that
    makes rollups cheap (never re-reads raw data). Distinct-conv counts
    don't re-aggregate exactly (max is a lower bound documented here);
    additive metrics roll up exactly."""
    return hourly.groupBy("day").agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("n_null").alias("n_null"),
        F.max("n_convs").alias("min_distinct_convs"),
    )


def top_k_per_day(df: DataFrame, k: int = 3) -> DataFrame:
    """Heavy hitters: the k most active conversations per UTC day
    (rank by turn count, deterministic tie-break by conv_id). One
    partial-agg shuffle + one window shuffle — the standard top-k plan;
    at scale the pre-aggregation keeps the window input at
    |days × convs-with-traffic|, never raw rows."""
    return _top_k_per_bucket(df, "yyyy-MM-dd", "day", k)


def top_k_per_hour(df: DataFrame, k: int = 3) -> DataFrame:
    """Hour-grain heavy hitters — the bucket the STREAMING path emits
    per watermark-closed window (streaming/stream.py twin); same
    pre-aggregate-then-window plan as top_k_per_day."""
    return _top_k_per_bucket(df, "yyyy-MM-dd HH", "hour", k)


def rank_top_k(counts: DataFrame, bucket_name: str, k: int) -> DataFrame:
    """Rank a (bucket, conv_id, n_turns) count frame to its per-bucket
    top-k (desc count, conv_id tie-break) — shared by the batch
    heavy-hitter queries and the streamed-rollup reader
    (streaming.top_k_from_rollup), so the tie-break can never drift
    between the parity-tested twins."""
    w = Window.partitionBy(bucket_name).orderBy(F.desc("n_turns"), F.col("conv_id"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(bucket_name, "conv_id", "n_turns", "rank")
    )


def _top_k_per_bucket(df: DataFrame, fmt: str, bucket_name: str, k: int) -> DataFrame:
    bucket = F.date_format("ts", fmt).alias(bucket_name)
    counts = df.groupBy(bucket, "conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    return rank_top_k(counts, bucket_name, k)


def cohort_retention(df: DataFrame) -> DataFrame:
    """Cohort/retention matrix: conversations grouped by first-active
    UTC day (the cohort), counted at each day-offset they were active.
    Output: (cohort_day string, offset_days int, n_convs bigint).

    Scale design: ONE groupBy shuffle — per conversation the distinct
    active days collapse into a collect_set (bounded by the retention
    horizon in days, ~365 entries worst-case, never by turns), the
    cohort day is array_min of that set, and offsets explode from the
    set; the final (cohort, offset) rollup is a hash aggregate over
    |convs × active-days| rows, never raw turns.
    """
    per = (
        df.select("conv_id", F.to_date("ts").alias("_day"))
        .groupBy("conv_id")
        .agg(F.collect_set("_day").alias("_days"))
        .select(
            F.array_min("_days").alias("_cohort"), F.explode("_days").alias("_day")
        )
    )
    return per.groupBy(
        F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
        F.datediff("_day", "_cohort").cast("int").alias("offset_days"),
    ).agg(F.count(F.lit(1)).alias("n_convs"))


def hourly_anomalies(df: DataFrame, k: int = 3) -> DataFrame:
    """k-sigma spike detection over the hourly rollup — the alerting
    query a log pipeline serves from its rollup table. An hour is
    flagged when ``n > mean + k·σ_pop`` over the whole series,
    evaluated in EXACT integer arithmetic so the boundary can never
    drift between engines or under float reassociation:

        n·cnt − s1 > 0  AND  (n·cnt − s1)² > k²·(cnt·s2 − s1²)

    with s1 = Σn, s2 = Σn² (both accumulated as decimal(38,0): at
    10¹² rows/30 days, s2 ≈ 1.4e21 would overflow BIGINT; decimal38 /
    DuckDB HUGEINT carry it to ~1e38). Stats are ONE row riding a
    broadcast cross join (the engine's standard stats-frame pattern);
    the scan underneath is the hourly rollup, never raw turns.
    """
    hourly = df.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_turns"))
    return flag_sigma_anomalies(hourly, k)


def flag_sigma_anomalies(hourly: DataFrame, k: int = 3) -> DataFrame:
    """The shared flag criterion over a (day, hour, n_turns) count
    frame — used by the batch operator above AND query-time over the
    streamed rollup (streaming.anomalies_from_rollup), so the boundary
    semantics can never drift between the twins (the rank_top_k
    pattern)."""
    n_dec = F.col("n_turns").cast("decimal(38,0)")
    stats = hourly.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_cnt"),
        F.sum(n_dec).alias("_s1"),
        F.sum(n_dec * n_dec).alias("_s2"),
    )
    j = hourly.crossJoin(F.broadcast(stats))
    dev = F.col("n_turns").cast("decimal(38,0)") * F.col("_cnt") - F.col("_s1")
    var_term = F.col("_cnt") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    return j.where((dev > 0) & (dev * dev > F.lit(k * k) * var_term)).select(
        "day", "hour", "n_turns"
    )


def length_percentiles(
    df: DataFrame, pcts: tuple[int, ...] = (50, 95, 99)
) -> DataFrame:
    """Exact nearest-rank percentiles of turn text length per UTC day —
    the p50/p95/p99 size-distribution panel a log pipeline serves next
    to its rollups (the reference leaves distribution analysis to the
    OpenSearch side, e.g. percentile aggregations over indexed docs;
    here it is a first-class batch operator). Output: (day string,
    pct int, len_pct int), one row per (day, pct).

    Nearest-rank is the integer-exact definition: the p-th percentile
    is the value at ascending rank ceil(p·n/100), computed as
    (p·n + 99) div 100 — no float quantile interpolation, so the
    result can never drift between engines.

    Scale design: the window never sees raw rows. Lengths first
    collapse to a (day, len) → count rollup (bounded by |days ×
    distinct lengths|, thousands per day, never turns); the cumulative
    rank walk and per-day totals are windows over THAT rollup, and the
    pct fan-out multiplies only rollup rows. One groupBy shuffle + one
    day-partitioned window; a 10¹²-row day costs the same window input
    as a 10⁶-row day.
    """
    lens = (
        df.where(F.col("text").isNotNull())
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.length("text").alias("len"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = lens.select(
        "day",
        "len",
        "c",
        F.sum("c")
        .over(
            Window.partitionBy("day")
            .orderBy("len")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("c").over(Window.partitionBy("day")).alias("n"),
    )
    fanned = ranked.select(
        "day",
        "len",
        "c",
        "cum",
        "n",
        F.explode(F.array(*[F.lit(int(p)) for p in pcts])).alias("pct"),
    )
    target = F.expr("(pct * n + 99) div 100")
    return fanned.where(
        (F.col("cum") >= target) & (F.col("cum") - F.col("c") < target)
    ).select("day", "pct", F.col("len").cast("int").alias("len_pct"))


def slo_burn_alerts(
    df: DataFrame,
    budget_ppm: int = 20_000,
    factor: int = 6,
    long_hours: int = 6,
) -> DataFrame:
    """Multiwindow error-budget burn-rate alerts (the SRE-workbook
    alerting rule) over the parsed stream: an hour fires when the
    ERROR-level fraction exceeds factor × budget in BOTH the hour
    itself (short window) and the trailing ``long_hours`` wall-clock
    window — fast-burn detection without the single-spike flappiness
    of a one-window rule. The reference delegates alerting to the
    OpenSearch side; here it is a first-class batch operator over the
    same parsed stream the pipeline routes.

    All comparisons are exact integers (decimal38 with a HUGEINT
    oracle twin): a window fires when  n_err·10⁶ > factor·budget_ppm·n.

    Scale design: raw rows collapse to an hourly (n, n_err) rollup
    first; the trailing window is a RANGE frame over the integer hour
    index of THAT rollup, so the single ordered partition holds
    |hours| rows — bounded by the time horizon, never data size — and
    traffic gaps are handled by the frame seeing wall-clock hours, not
    adjacent rows. Output: (day, hour, n_turns, n_err), flagged hours.
    """
    from .parse import parse_text

    p = parse_text(df).filter("parse_ok")
    hourly = p.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
        (
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) * 24
            + F.hour("ts")
        ).alias("hour_idx"),
    ).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("level") == "ERROR", 1).otherwise(0)).alias("n_err"),
    )
    w = Window.orderBy("hour_idx").rangeBetween(
        -(long_hours - 1), Window.currentRow
    )
    n_dec = F.col("n_turns").cast("decimal(38,0)")
    e_dec = F.col("n_err").cast("decimal(38,0)")
    thr = F.lit(factor * budget_ppm)
    return (
        hourly.select(
            "day",
            "hour",
            "n_turns",
            "n_err",
            F.sum(n_dec).over(w).alias("_n_l"),
            F.sum(e_dec).over(w).alias("_e_l"),
        )
        .where(
            (e_dec * 1_000_000 > thr * n_dec)
            & (F.col("_e_l") * 1_000_000 > thr * F.col("_n_l"))
        )
        .select("day", "hour", "n_turns", "n_err")
    )


def cusum_anomalies(df: DataFrame, h: int = 4, slack_pct: int = 5) -> DataFrame:
    """Page's CUSUM changepoint detection over the hourly rollup — the
    drift detector that catches SUSTAINED shifts the single-hour k-sigma
    flag (:func:`hourly_anomalies`) misses: many consecutive hours each
    only ~1σ high accumulate until the statistic crosses the decision
    band. Like the k-sigma flag, the boundary is evaluated in EXACT
    integer arithmetic (decimal38 / DuckDB HUGEINT) so it can never
    drift between engines or under float reassociation.

    With cnt/s1/s2 the global series count / Σn / Σn² and the classic
    CUSUM parameters expressed exactly (slack as an integer percent of
    the mean, scaling every term by 100·cnt to clear the divisions):

        d_i = 100·(cnt·n_i − s1) − slack_pct·s1
        S_i = max(0, S_{i−1} + d_i)         (upper CUSUM, reset per day)
        flag hour i  ⇔  S_i > 0  ∧  S_i² > 100²·h²·(cnt·s2 − s1²)

    (the RHS is (100·cnt·h·σ_pop)² since cnt²·σ² = cnt·s2 − s1².)

    Scale design: the fold runs per DAY over ≤24 (hour, n) structs —
    the daily reset both bounds the recurrence (a sequential scan can't
    be parallelized inside a day, so keep the unit small) and spreads
    days across tasks; stats are ONE row riding a broadcast; the scan
    underneath is the hourly rollup, never raw turns. Magnitudes: at
    10¹² rows/720 hours, S ≤ 24·100·cnt·max_n ≈ 10¹⁷ so S² ≈ 10³⁴ and
    the RHS ≈ 10²⁹ — both well inside decimal(38,0)/HUGEINT.
    """
    hourly = df.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_turns"))
    return flag_cusum_anomalies(hourly, h, slack_pct)


def flag_cusum_anomalies(hourly: DataFrame, h: int = 4, slack_pct: int = 5) -> DataFrame:
    """The shared CUSUM criterion over a (day, hour, n_turns) count
    frame — split out so a streamed rollup can be flagged at query time
    with verbatim-identical semantics (the flag_sigma_anomalies
    pattern)."""
    dec = "decimal(38,0)"
    zero = F.lit(0).cast(dec)
    stats = hourly.agg(
        F.count(F.lit(1)).cast(dec).alias("_cnt"),
        F.sum(F.col("n_turns").cast(dec)).alias("_s1"),
        F.sum(F.col("n_turns").cast(dec) * F.col("n_turns").cast(dec)).alias("_s2"),
    )
    per_day = hourly.groupBy("day").agg(
        F.sort_array(F.collect_list(F.struct("hour", "n_turns"))).alias("_hrs")
    )
    j = per_day.crossJoin(F.broadcast(stats))

    def dev(x):
        return F.lit(100).cast(dec) * (
            F.col("_cnt") * x["n_turns"].cast(dec) - F.col("_s1")
        ) - F.lit(slack_pct).cast(dec) * F.col("_s1")

    thresh = F.lit(10_000 * h * h).cast(dec) * (
        F.col("_cnt") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    )
    acc0 = F.struct(
        zero.alias("s"),
        F.array().cast("array<struct<hour:int,n:bigint>>").alias("f"),
    )

    def step(acc, x):
        s_next = F.greatest(zero, acc["s"] + dev(x))
        return F.struct(
            s_next.alias("s"),
            F.when(
                (s_next > zero) & (s_next * s_next > thresh),
                F.array_append(
                    acc["f"], F.struct(x["hour"].alias("hour"), x["n_turns"].alias("n"))
                ),
            )
            .otherwise(acc["f"])
            .alias("f"),
        )

    flagged = F.aggregate("_hrs", acc0, step)["f"]
    return j.select("day", F.explode(flagged).alias("_x")).select(
        "day", F.col("_x.hour").alias("hour"), F.col("_x.n").alias("n_turns")
    )


def funnel_stages(
    df: DataFrame,
    steps: tuple[str, ...],
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    match_col: str = "role",
) -> DataFrame:
    """Ordered-funnel analysis (the windowFunnel-style sequence matcher
    common in event-analytics engines; the reference has no analog —
    this is transcript-model bread-and-butter like the sessionizer
    above): per group, the furthest 1-based stage ``s`` such that
    ``steps[0..s-1]`` occur at strictly increasing ``order_col``
    positions. Greedy earliest-match fold — provably equivalent to the
    chained-min formulation (min idx of step1; min idx of step2 after
    it; …), which is what the DuckDB oracle computes. Step labels must
    be distinct. Groups matching nothing report stage 0.

    Scale design: ONE groupBy shuffle. Non-step rows die inside the
    aggregate (``collect_list`` drops the NULL of an un-otherwise'd
    ``when``), so the collected array holds only step-matching turns;
    the sort + linear fold run per group inside codegen — never a
    window over raw turns, no Python.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct labels")
    step_idx = None
    for i, s in enumerate(steps):
        step_idx = (
            F.when(F.col(match_col) == s, i)
            if step_idx is None
            else step_idx.when(F.col(match_col) == s, i)
        )
    o_type = df.schema[order_col].dataType
    per = df.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    step_idx.isNotNull(),
                    F.struct(F.col(order_col).alias("o"), step_idx.alias("s")),
                )
            )
        ).alias("_m")
    )
    # the accumulator carries the last MATCHED position so rows tied at
    # the same order_col value cannot advance two stages (the contract
    # is strictly increasing positions — exactly the chained-min
    # formulation the DuckDB oracle computes)
    stage = F.aggregate(
        "_m",
        F.struct(
            F.lit(0).alias("stage"), F.lit(None).cast(o_type).alias("last_o")
        ),
        lambda acc, x: F.when(
            (x["s"] == acc["stage"])
            & (acc["last_o"].isNull() | (x["o"] > acc["last_o"])),
            F.struct((acc["stage"] + 1).alias("stage"), x["o"].alias("last_o")),
        ).otherwise(acc),
        lambda acc: acc["stage"],
    )
    return per.select(group_col, stage.cast("int").alias("stage"))


def funnel_report(
    df: DataFrame,
    steps: tuple[str, ...],
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    match_col: str = "role",
) -> DataFrame:
    """Funnel rollup: (stage, n_convs at exactly that stage, n_reached
    = convs reaching ≥ stage). The cumulative window runs over the
    per-stage count frame (≤ len(steps)+1 rows — driver-tiny, the
    unpartitioned window is deliberate)."""
    per = funnel_stages(df, steps, group_col, order_col, match_col)
    byst = per.groupBy("stage").agg(F.count(F.lit(1)).alias("n_convs"))
    w = Window.orderBy(F.desc("stage")).rowsBetween(Window.unboundedPreceding, 0)
    return byst.select("stage", "n_convs", F.sum("n_convs").over(w).alias("n_reached"))


def render_conversations(t, conv_col: str = "conv_id", text_col: str = "text"):
    """Transcripts→documents bridge: render each conversation into one
    training document — 'role: text' lines in stable (conv_id,
    turn_idx) order (O4) — and profile it as (conv_id, n_lines,
    render_sha) so the full rendered string is value-checked without
    shipping megabytes. One hash aggregate; the sort is
    per-conversation inside array_sort, never a global orderBy."""
    return (
        t.filter(F.col(text_col).isNotNull())
        .groupBy(conv_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "role", F.col(text_col).alias("text")))
            ).alias("_turns")
        )
        .select(
            conv_col,
            F.size("_turns").alias("n_lines"),
            F.sha2(
                F.array_join(
                    F.transform(
                        "_turns", lambda x: F.concat(x["role"], F.lit(": "), x["text"])
                    ),
                    "\n",
                ),
                256,
            ).alias("render_sha"),
        )
    )
