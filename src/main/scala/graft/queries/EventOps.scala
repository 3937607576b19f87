package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import QU._

/** Event-time windowing over the `events` table, batch mode
  * (SURVEY §2.5 last rows / §2.7). q40/q41/q42 delegate to the SAME
  * transform functions Structured Streaming runs
  * (graft.streaming.EventStream) — one implementation, two execution
  * modes — so the DuckDB oracle here verifies the streaming
  * transform logic too (StreamingSpec proves the outputs coincide).
  *
  * Scale: tumbling/sliding windows are plain hash aggregates on
  * (window, key) — shuffle bounded by #windows×#keys. Session windows
  * shuffle by user and sort within — Spark plans UpdatingSessionsExec.
  */
object EventOps {

  /** HLL register count (q102): m = 2^12 buckets — the bucket id is
    * the md5 digest's first 3 hex digits, so p = 12 exactly tiles the
    * hex boundary. Standard error 1.04/√m ≈ 1.6%, inside the 5%
    * SketchSpec gate with margin; per-group state is ≤ m one-byte
    * registers (held relationally as ≤ m rows).
    */
  val HllM = 4096

  /** Flajolet α_m · m² for [[HllM]] — computed ONCE here and embedded
    * in both engines' expressions as the same double literal
    * (Scala's shortest-round-trip rendering), so the estimator
    * constant cannot diverge between the query and its oracle.
    */
  val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM

  /** One (day, b, rho) observation per event — the portable HLL
    * register DERIVATION shared by the batch rollup (q102) and the
    * streaming maintenance path
    * ([[graft.streaming.EventStream.sketchRollupStream]]), so the
    * two can never drift: bucket = the md5 digest's first 12 bits,
    * rho = leading-zero count of the next 32 bits + 1 (the
    * `instr(lpad(bin(v)))` spelling that replays verbatim in ANSI
    * SQL). Registers are max(rho) grouped however the consumer
    * needs — per day, per (day, bucket) epoch slice, or unioned.
    */
  private[graft] def hllRows(events: DataFrame): DataFrame = {
    val p0 = instr(lpad(bin(
      conv(substring(col("h"), 4, 8), 16, 10).cast("long")), 32, "0"), "1")
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .withColumn("h", md5(col("user_id").cast("string")))
      .select(col("day"),
        conv(substring(col("h"), 1, 3), 16, 10).cast("int").as("b"),
        when(p0 === 0, 33).otherwise(p0).as("rho"))
  }

  lazy val queries: Seq[Q] = Seq(

    // -- tumbling 1h window: window().start == date_trunc('hour').
    Q("q40_tumbling_hourly",
      (s, d) => graft.streaming.EventStream.tumblingAgg(t(s, d).events)
        .orderBy(col("window_start"), col("event_type")),
      Some(s"""SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
        COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""),
      "tumbling event-time window"),

    // -- sliding 10min/5min: each event lands in exactly two windows
    //    (start ∈ {bucket5, bucket5 - 5min}); oracle expands the same
    //    assignment with a 2-way unnest.
    Q("q41_sliding_windows",
      (s, d) => graft.streaming.EventStream.slidingCounts(t(s, d).events)
        .orderBy(col("window_start"), col("event_type")),
      Some("""WITH b AS (
          SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b5, event_type FROM events),
        assigned AS (
          SELECT b5 AS window_start, event_type FROM b
          UNION ALL
          SELECT b5 - INTERVAL 5 MINUTE AS window_start, event_type FROM b)
        SELECT window_start, event_type, COUNT(*) AS n
        FROM assigned GROUP BY 1, 2 ORDER BY window_start, event_type"""),
      "sliding event-time windows"),

    // -- session windows (30 min gap) per user; oracle is the classic
    //    gaps-and-islands rewrite. Spark's session end = last event
    //    + gap, mirrored in the oracle.
    Q("q42_sessionization",
      (s, d) => graft.streaming.EventStream.sessionAgg(t(s, d).events)
        .orderBy(col("user_id"), col("session_start")),
      Some(s"""WITH marked AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
          FROM events),
        numbered AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked)
        SELECT MIN(ts) AS session_start,
          MAX(ts) + INTERVAL 30 MINUTE AS session_end,
          user_id, COUNT(*) AS n_events, ${sqlDsum("value")} AS session_value
        FROM numbered GROUP BY user_id, session_id
        ORDER BY user_id, session_start"""),
      "session windows == gaps-and-islands"),

    // -- stream-stream interval join in its batch form: views matched
    //    to same-user purchases within the following hour. The SAME
    //    transform runs as a watermarked stream-stream join
    //    (EventStream.attributionJoin; StreamingSpec proves parity) —
    //    there the range predicate is what bounds the join state.
    Q("q44_attribution_join",
      (s, d) => {
        val ev = t(s, d).events
        graft.streaming.EventStream.attributionJoin(
            ev.filter(col("event_type") === "view"),
            ev.filter(col("event_type") === "purchase"))
          .orderBy(col("user_id"), col("view_ts"), col("view_id"),
            col("purchase_ts"), col("purchase_id"))
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
          p.event_id AS purchase_id, p.ts AS purchase_ts,
          p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id AND p.ts >= v.ts
            AND p.ts <= v.ts + INTERVAL 1 HOUR
        ORDER BY v.user_id, view_ts, view_id, purchase_ts, purchase_id"""),
      "view->purchase interval join (stream-stream join, batch form)"),

    // -- gap-filled time series: hourly counts per event type over the
    //    DENSE hour grid (empty hours emitted as 0), the resample/
    //    gap-fill every monitoring and feature pipeline needs. The
    //    grid is generated (sequence over the corpus's hour bounds ×
    //    distinct types), never materialized as input — hours×types
    //    rows total, joined left-outer to the aggregated counts.
    Q("q45_gap_fill",
      (s, d) => {
        val ev = t(s, d).events
        val bounds = ev.agg(
          date_trunc("hour", min(col("ts"))).as("t0"),
          date_trunc("hour", max(col("ts"))).as("t1"))
        val hours = bounds.select(explode(sequence(col("t0"), col("t1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
        val grid = hours.crossJoin(ev.select(col("event_type")).distinct())
        val counts = ev
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        grid.join(counts, Seq("hour", "event_type"), "left_outer")
          .select(col("hour"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS t0,
            date_trunc('hour', max(ts)) AS t1 FROM events),
        hours AS (
          SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        counts AS (
          SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT hour, event_type, COALESCE(n, 0) AS n
        FROM hours CROSS JOIN types LEFT JOIN counts USING (hour, event_type)
        ORDER BY hour, event_type"""),
      "gap-filled dense hourly series (resample with zero fill)"),

    // -- as-of join: every event annotated with the value of that
    //    user's most recent purchase at-or-before the event time —
    //    graft.operators.AsOfJoin's union–sort–backfill plan (ONE
    //    shuffle on the key, |L|+|R| rows, vs the O(L·R)-per-key
    //    range-join rewrite). Purchases are deduped per (user, ts) so
    //    tie resolution is engine-independent. Oracle uses DuckDB's
    //    native ASOF LEFT JOIN.
    Q("q26_asof_join",
      (s, d) => {
        val ev = t(s, d).events
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"), col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("last_purchase_value"))
        graft.operators.AsOfJoin(ev, purchases, keys = Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            payload = Seq("last_purchase_value"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      },
      Some("""WITH p AS (
          SELECT user_id, ts, MAX(value) AS last_purchase_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT e.user_id, e.event_id, e.ts, e.event_type, e.value,
          p.last_purchase_value
        FROM events e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY e.user_id, e.ts, e.event_id"""),
      "as-of join via union-sort-backfill == native ASOF JOIN"),

    // -- event funnel: per user, did view precede purchase (min-ts
    //    comparison) — conditional aggregation pattern.
    Q("q43_funnel",
      (s, d) => t(s, d).events
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"),
          count(when(col("event_type") === "click", lit(1))).as("n_clicks"))
        .filter(col("first_view").isNotNull && col("first_purchase").isNotNull &&
                col("first_view") < col("first_purchase"))
        .select(col("user_id"), col("first_view"), col("first_purchase"), col("n_clicks"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
          MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
          COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks
        FROM events GROUP BY user_id
        HAVING first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_view < first_purchase
        ORDER BY user_id"""),
      "view→purchase funnel via conditional agg"),

    // -- q102: MERGEABLE SKETCH ROLLUP — the pre-aggregation pattern
    //    that makes distinct-count dashboards tractable at 100 TB:
    //    one pass builds per-day HyperLogLog REGISTERS, and ANY date
    //    range's distinct-user estimate is then a cheap max-merge of
    //    day registers — never a re-scan of raw events. The registers
    //    are held as a RELATION, (day, bucket) → max(rho), at most
    //    HllM rows per day: the max-merge that defines HLL union IS
    //    the grouped max, so partials fold map-side, the rollup union
    //    is one more groupBy(bucket).max, and the estimator (harmonic
    //    mean over 2^-M with the small-range linear-counting branch —
    //    Flajolet et al.'s canonical form) is plain arithmetic over
    //    the grid. Output carries each day's estimate plus the
    //    all-days union; the register frame is persisted (two
    //    consumers: the per-day rows and the union rollup).
    //    Round 16: bucket and rho derive from the PORTABLE md5 hash
    //    (bucket = first 12 bits, rho = leading zeros of the next 32
    //    bits + 1, spelled identically in both engines via
    //    strpos(lpad(bin(v)))) — the q63/q69 move — so the whole
    //    apparatus replays in ANSI SQL and the query carries a FULL
    //    value oracle; the ≤5% error contract vs exact stays gated in
    //    SketchSpec. The one cross-engine hazard is ROUND at an
    //    exact-.5 estimate — possible only when ln() lands the
    //    estimate on a half-integer boundary, measured absent on all
    //    three fixtures.
    Q("q102_hll_rollup",
      (s, d) => {
        val regs = hllRows(t(s, d).events)
          .groupBy(col("day"), col("b"))
          .agg(max(col("rho")).as("m_reg"), count(lit(1)).as("cnt"))
          .persist()
        regs.count() // two consumers scan this
        def estimate(grouped: DataFrame): DataFrame = grouped
          .withColumn("z", col("s") + (lit(HllM) - col("nb")))
          .withColumn("e_raw", lit(HllAlphaM2) / col("z"))
          .withColumn("est",
            when(col("e_raw") <= lit(2.5 * HllM) && col("nb") < HllM,
              round(lit(HllM.toDouble) *
                log(lit(HllM.toDouble) / (lit(HllM) - col("nb")))))
              .otherwise(round(col("e_raw"))).cast("long"))
        val daily = estimate(regs.groupBy(col("day"))
          .agg(sum(pow(lit(2.0), -col("m_reg"))).as("s"),
            count(lit(1)).as("nb"), sum(col("cnt")).as("n_events")))
          .select(col("day"), col("n_events"), col("est").as("est_users"))
        val total = estimate(regs.groupBy(col("b"))
          .agg(max(col("m_reg")).as("m_u"))
          .agg(sum(pow(lit(2.0), -col("m_u"))).as("s"), count(lit(1)).as("nb")))
          .select(col("est").as("est_total_users"))
        daily.crossJoin(broadcast(total)).orderBy(col("day"))
      },
      Some(s"""WITH ev AS (
          SELECT CAST(ts AS DATE) AS day, md5(CAST(user_id AS VARCHAR)) AS h
          FROM events),
        rr AS (
          SELECT day,
            ('0x' || substr(h, 1, 3))::BIGINT AS b,
            CASE WHEN strpos(lpad(bin(('0x' || substr(h, 4, 8))::BIGINT), 32, '0'), '1') = 0
              THEN 33
              ELSE strpos(lpad(bin(('0x' || substr(h, 4, 8))::BIGINT), 32, '0'), '1')
            END AS rho
          FROM ev),
        regs AS (
          SELECT day, b, MAX(rho) AS m_reg, COUNT(*) AS cnt
          FROM rr GROUP BY 1, 2),
        perday AS (
          SELECT day, CAST(SUM(cnt) AS BIGINT) AS n_events, COUNT(*) AS nb,
            SUM(power(2.0, -m_reg)) AS s
          FROM regs GROUP BY 1),
        daily AS (
          SELECT day, n_events,
            CASE WHEN $HllAlphaM2 / (s + ($HllM - nb)) <= ${2.5 * HllM}
                AND nb < $HllM
              THEN CAST(ROUND(${HllM.toDouble} * LN(${HllM.toDouble} / ($HllM - nb))) AS BIGINT)
              ELSE CAST(ROUND($HllAlphaM2 / (s + ($HllM - nb))) AS BIGINT)
            END AS est_users
          FROM perday),
        uregs AS (
          SELECT b, MAX(m_reg) AS m_u FROM regs GROUP BY 1),
        uagg AS (
          SELECT COUNT(*) AS nb, SUM(power(2.0, -m_u)) AS s FROM uregs),
        total AS (
          SELECT CASE WHEN $HllAlphaM2 / (s + ($HllM - nb)) <= ${2.5 * HllM}
                AND nb < $HllM
              THEN CAST(ROUND(${HllM.toDouble} * LN(${HllM.toDouble} / ($HllM - nb))) AS BIGINT)
              ELSE CAST(ROUND($HllAlphaM2 / (s + ($HllM - nb))) AS BIGINT)
            END AS est_total_users
          FROM uagg)
        SELECT day, n_events, est_users, est_total_users
        FROM daily CROSS JOIN total ORDER BY day"""),
      "per-day portable-HLL registers + union rollup (full replay oracle)"),

    // -- cohort retention: users bucketed by first-seen week, counted
    //    in each subsequent active week. Two aggregations + one
    //    equi-join, all keyed on user_id — the distinct() and the
    //    first-seen agg reuse the same hash partitioning, and the
    //    final rollup groups ~#cohorts×#weeks rows. No per-user state
    //    on the driver; scales with users, not events.
    Q("q104_cohort_retention",
      (s, d) => {
        val ev = t(s, d).events
        val firstSeen = ev.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        ev.select(col("user_id"),
            date_trunc("week", col("ts")).as("active_week"))
          .distinct()
          .join(firstSeen, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (datediff(col("active_week"), col("cohort_week")) / 7)
              .cast("int").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH first_seen AS (
          -- DuckDB's week-grain DATE_TRUNC yields DATE; cast back to
          -- TIMESTAMP to match Spark's date_trunc output type
          SELECT user_id,
            CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
          FROM events GROUP BY user_id),
        active AS (
          SELECT DISTINCT user_id,
            CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS active_week
          FROM events)
        SELECT f.cohort_week AS cohort_week,
          CAST(DATEDIFF('day', f.cohort_week, a.active_week) / 7 AS INT)
            AS week_offset,
          COUNT(DISTINCT a.user_id) AS n_active
        FROM active a JOIN first_seen f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),
      "weekly cohort retention (first-seen bucketing + activity rollup)"),

    // -- windowed event dedup: at-least-once delivery cleanup — drop
    //    an event arriving within 60s of the PREVIOUS raw event of
    //    the same (user, type). One shuffle + per-partition sort
    //    (lag window); comparison in exact microseconds on both
    //    engines. The deterministic (ts, event_id) order makes the
    //    keep-set unique even under timestamp ties.
    Q("q105_event_dedup_window",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        t(s, d).events
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .filter(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") >= 60000000L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy(col("event_type"))
      },
      Some("""WITH lagged AS (
          SELECT event_type, ts,
            LAG(epoch_us(ts)) OVER (
              PARTITION BY user_id, event_type ORDER BY ts, event_id)
              AS prev_us
          FROM events)
        SELECT event_type, COUNT(*) AS n_kept FROM lagged
        WHERE prev_us IS NULL OR epoch_us(ts) - prev_us >= 60000000
        GROUP BY event_type ORDER BY event_type"""),
      "windowed dedup of near-duplicate event deliveries (60s horizon)"),

    // -- peak concurrent sessions per hour: the interval-overlap
    //    COUNTING problem in its sweep formulation — ±1 deltas at
    //    session boundaries, one distributed prefix sum
    //    (operators/PrefixSum: per-block windows + tiny block-total
    //    cumsum + broadcast bases — never a single-partition window
    //    over the data), hourly max of the running count. Linear at
    //    any sf with bounded output, where the pair-join formulation
    //    of "overlapping sessions" grows with concurrency². Deltas
    //    are pre-aggregated per instant (net transition applies
    //    atomically), which also gives PrefixSum its unique key.
    Q("q106_session_concurrency",
      (s, d) => {
        val sess = graft.streaming.EventStream.sessionAgg(t(s, d).events)
        val deltas = sess
          .select(unix_micros(col("session_start")).as("t"), lit(1L).as("d"))
          .unionAll(sess
            .select(unix_micros(col("session_end")).as("t"), lit(-1L).as("d")))
          .groupBy(col("t")).agg(sum(col("d")).as("d"))
        graft.operators.PrefixSum
          .exclusive(deltas, col("t"), col("d"),
            blockSize = 3600L * 1000000L, out = "prev")
          .withColumn("conc", col("prev") + col("d"))
          .groupBy(date_trunc("hour", timestamp_micros(col("t"))).as("hour"))
          .agg(max(col("conc")).as("peak_concurrency"))
          .orderBy(col("hour"))
      },
      Some(s"""WITH marked AS (
          SELECT user_id, ts,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
          FROM events),
        numbered AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked),
        sessions AS (
          SELECT MIN(ts) AS session_start,
            MAX(ts) + INTERVAL 30 MINUTE AS session_end
          FROM numbered GROUP BY user_id, session_id),
        deltas AS (
          SELECT epoch_us(session_start) AS t, 1 AS d FROM sessions
          UNION ALL
          SELECT epoch_us(session_end) AS t, -1 AS d FROM sessions),
        agg AS (SELECT t, SUM(d) AS d FROM deltas GROUP BY t),
        run AS (
          SELECT t, SUM(d) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
          FROM agg)
        SELECT CAST(DATE_TRUNC('hour', make_timestamp(t)) AS TIMESTAMP)
            AS hour,
          CAST(MAX(conc) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY 1 ORDER BY hour"""),
      "peak concurrent sessions per hour (sweep-line via distributed prefix sum)"),

    // -- market-basket co-occurrence: which event types happen in the
    //    SAME session. The self-join is keyed on (user, session) and
    //    each side is the session's DISTINCT types — ≤ |type-alphabet|
    //    rows per session — so pairs per session are alphabet², a
    //    constant, and the whole query is linear in sessions. Support
    //    denominator rides the q74/q80 1-row-broadcast pattern.
    Q("q107_type_cooccurrence",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"))
        val numbered = t(s, d).events
          .withColumn("new_s",
            when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
              < 1800000000L, 0).otherwise(1))
          .withColumn("session_id", sum(col("new_s")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        val st = numbered
          .select(col("user_id"), col("session_id"), col("event_type"))
          .distinct()
        val totals = st.select(col("user_id"), col("session_id")).distinct()
          .agg(count(lit(1)).as("total_sessions"))
        st.as("a").join(st.as("b"),
            col("a.user_id") === col("b.user_id") &&
            col("a.session_id") === col("b.session_id") &&
            col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_sessions"))
          .crossJoin(broadcast(totals))
          .withColumn("support",
            col("n_sessions").cast("double") / col("total_sessions"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH marked AS (
          SELECT user_id, ts, event_type,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
          FROM events),
        numbered AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked),
        st AS (SELECT DISTINCT user_id, session_id, event_type FROM numbered),
        tot AS (SELECT COUNT(*) AS total_sessions FROM
          (SELECT DISTINCT user_id, session_id FROM st)),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
            COUNT(*) AS n_sessions
          FROM st a JOIN st b
            ON a.user_id = b.user_id AND a.session_id = b.session_id
              AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, n_sessions, total_sessions,
          CAST(n_sessions AS DOUBLE) / total_sessions AS support
        FROM pairs, tot ORDER BY type_a, type_b"""),
      "session-level event-type co-occurrence (market-basket pairs + support)"),

    // -- rolling 7-day distinct actives, EXACT, in the
    //    explode-contributions formulation: each (day, user) activity
    //    contributes itself to the 7 calendar days it's visible from,
    //    then one hash aggregate per day counts distinct users. No
    //    non-equi day-range join anywhere (the naive grid BETWEEN
    //    join is a nested loop); work is 7× the distinct (day, user)
    //    pairs — linear. The sketch-based cousin for arbitrary
    //    windows at higher cardinality is q102's mergeable HLL table.
    Q("q108_rolling_distinct_users",
      (s, d) => {
        val ud = t(s, d).events
          .select(to_date(col("ts")).as("uday"), col("user_id")).distinct()
        val bounds = ud.agg(min(col("uday")).as("lo"), max(col("uday")).as("hi"))
        val grid = bounds
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        ud.select(explode(sequence(col("uday"), date_add(col("uday"), 6)))
              .as("day"), col("user_id"))
          .join(broadcast(grid), Seq("day")) // clip to the corpus range
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("active_7d"))
          .orderBy(col("day"))
      },
      Some("""WITH ud AS (
          SELECT DISTINCT CAST(ts AS DATE) AS uday, user_id FROM events),
        grid AS (
          SELECT CAST(UNNEST(generate_series(
            (SELECT MIN(uday) FROM ud), (SELECT MAX(uday) FROM ud),
            INTERVAL 1 DAY)) AS DATE) AS day)
        SELECT g.day AS day, COUNT(DISTINCT u.user_id) AS active_7d
        FROM grid g JOIN ud u
          ON g.day BETWEEN u.uday AND u.uday + 6
        GROUP BY g.day ORDER BY g.day"""),
      "exact rolling 7-day distinct users (explode-contributions, no range join)"),

    // -- q117: MERGEABLE HISTOGRAM QUANTILE ROLLUP — q102's
    //    pre-aggregation pattern applied to percentiles, with one
    //    property HLL/KLL sketches can't offer: the sketch state here
    //    is a plain (day, bucket, count) RELATION under a pure-integer
    //    HDR-style bucketing (floor(log2) via length(bin(x)), 7
    //    sub-bucket mantissa bits → relative bucket width ≤ 1/128),
    //    so it is deterministic, exactly mirrorable in ANSI SQL
    //    (DuckDB hash-matches the whole pipeline — no rows-only
    //    check), mergeable by integer addition (any day range's
    //    histogram is a groupBy-sum of day rows, never a re-scan of
    //    raw events), and streaming-maintainable by appending counts.
    //    DataSketches KLL would give rank-error bounds but randomizes
    //    compaction — untestable against an oracle and nondeterministic
    //    under retry; the value-error histogram trades that for exact
    //    reproducibility. Per-day state is bounded by the bucket count
    //    (~2k buckets spans 9 decades), the quantile walk runs over a
    //    range-cardinality frame, and every shuffle key is (day,
    //    bucket) or (range, bucket) — nothing scales with raw rows
    //    past the first aggregate. Values are bucketed in centi-units
    //    (floor(value·100)) so the exact region covers [0, 2.56) at
    //    0.01 granularity; midpoint decode halves the width bound.
    Q("q117_hist_quantile_rollup",
      (s, d) => {
        // the stored mergeable table (shared with histRollupStream,
        // which maintains the same relation incrementally)
        val hist = graft.operators.HdrHistogram
          .dailyHist(t(s, d).events, col("ts"), col("value"))
        val bounds = hist.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val ranges = bounds.select(lit("all").as("range_name"),
            col("lo").as("d_lo"), col("hi").as("d_hi"))
          .union(bounds.select(lit("first_week"), col("lo"), date_add(col("lo"), 6)))
          .union(bounds.select(lit("rest"), date_add(col("lo"), 7), col("hi")))
        graft.operators.HdrHistogram
          .rangeQuantiles(hist, ranges, Seq(0.5, 0.95, 0.99))
      },
      Some("""WITH pts AS (
          SELECT CAST(ts AS DATE) AS day,
            CAST(FLOOR(value * 100) AS BIGINT) AS x FROM events),
        b AS (
          SELECT day, CASE WHEN x < 256 THEN x
            ELSE ((length(bin(x)) - 1) - 7) * 128
              + (x >> ((length(bin(x)) - 1) - 7)) - 128 + 256 END AS bucket
          FROM pts),
        hist AS (SELECT day, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM hist),
        ranges AS (
          SELECT 'all' AS range_name, lo AS d_lo, hi AS d_hi FROM bounds
          UNION ALL SELECT 'first_week', lo, lo + 6 FROM bounds
          UNION ALL SELECT 'rest', lo + 7, hi FROM bounds),
        merged AS (
          SELECT range_name, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
          FROM hist JOIN ranges ON day BETWEEN d_lo AND d_hi
          GROUP BY 1, 2),
        cum AS (
          SELECT range_name, bucket,
            CAST(SUM(cnt) OVER (PARTITION BY range_name ORDER BY bucket) AS BIGINT) AS cum,
            CAST(SUM(cnt) OVER (PARTITION BY range_name) AS BIGINT) AS n
          FROM merged),
        qs AS (SELECT UNNEST([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS p),
        sel AS (
          SELECT range_name, p, MIN(bucket) AS bucket, MAX(n) AS n_events
          FROM cum CROSS JOIN qs WHERE cum >= CEIL(n * p)
          GROUP BY 1, 2)
        SELECT range_name, p, n_events,
          CASE WHEN bucket < 256 THEN (2 * bucket + 1) / 200.0
            ELSE (2.0 * ((128 + (bucket - 256) % 128) << ((bucket - 256) // 128))
              + (1 << ((bucket - 256) // 128))) / 200.0 END AS est_value
        FROM sel ORDER BY range_name, p"""),
      "mergeable integer-histogram percentile rollup (deterministic, oracle-exact)"),

    // -- q120: hourly VOLUME ANOMALY per event type — the ops-side
    //    "did ingestion spike/die" check every pipeline dashboard
    //    needs. Counts are densified over a types × hours spine (q45's
    //    gap-fill stance: a missing hour IS the anomaly, so it must
    //    score, not vanish), then z-scored against the type's own
    //    hourly distribution. Determinism is arithmetic, not luck:
    //    z = (c·n − S) / √(n·Q − S²) uses ONLY integer aggregates,
    //    every multiply entering in DECIMAL(38,0) (S = Σc, Q = Σc²,
    //    and c·n itself — exact at any scale, where a 64-bit product
    //    would wrap in Spark and error in DuckDB), with exactly one
    //    cast-to-double on each side of the
    //    division and a 4dp round, so Spark and DuckDB agree bit-for-
    //    bit. Every frame after the first aggregate is bounded by
    //    types × hours; per-type stats ride the 1-row-per-key
    //    broadcast back over the dense grid.
    Q("q120_hourly_anomaly",
      (s, d) => {
        val ev = t(s, d).events
        val counts = ev
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val hours = ev
          .agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
        val dense = ev.select(col("event_type")).distinct()
          .crossJoin(broadcast(hours))
          .join(counts, Seq("hour", "event_type"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val stats = dense.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(col("c")).as("s"),
            sum((col("c").cast("decimal(38,0)") * col("c"))).as("q"))
        dense.join(broadcast(stats), Seq("event_type"))
          .filter(col("n_hours").cast("decimal(38,0)") * col("q") >
            col("s").cast("decimal(38,0)") * col("s"))
          .withColumn("z", round(
            // c enters the multiply already DECIMAL(38,0): a BIGINT
            // c·n_hours would wrap silently in Spark (and error in
            // DuckDB) once c·n_hours exceeds 2^63 — decimal keeps
            // both engines exact at any scale
            (col("c").cast("decimal(38,0)") * col("n_hours") - col("s"))
              .cast("double") /
            sqrt((col("n_hours").cast("decimal(38,0)") * col("q")
              - col("s").cast("decimal(38,0)") * col("s")).cast("double")), 4))
          .filter(abs(col("z")) >= 2.0)
          .select(col("event_type"), col("hour"), col("c").as("n"), col("z"))
          .orderBy(col("event_type"), col("hour"))
      },
      Some("""WITH counts AS (
          SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        hours AS (
          SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
          FROM (SELECT DATE_TRUNC('hour', MIN(ts)) AS lo,
                  DATE_TRUNC('hour', MAX(ts)) AS hi FROM events)),
        dense AS (
          SELECT h.hour, t.event_type, COALESCE(c.c, 0) AS c
          FROM hours h
          CROSS JOIN (SELECT DISTINCT event_type FROM events) t
          LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type),
        stats AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
            CAST(SUM(c) AS BIGINT) AS s,
            CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS q
          FROM dense GROUP BY 1),
        scored AS (
          SELECT d.event_type, d.hour, CAST(d.c AS BIGINT) AS n,
            ROUND(CAST(CAST(d.c AS DECIMAL(38,0)) * st.n_hours - st.s AS DOUBLE)
              / SQRT(CAST(CAST(st.n_hours AS DECIMAL(38,0)) * st.q
                - CAST(st.s AS DECIMAL(38,0)) * st.s AS DOUBLE)), 4) AS z
          FROM dense d JOIN stats st USING (event_type)
          WHERE CAST(st.n_hours AS DECIMAL(38,0)) * st.q
            > CAST(st.s AS DECIMAL(38,0)) * st.s)
        SELECT event_type, hour, n, z FROM scored
        WHERE ABS(z) >= 2.0 ORDER BY event_type, hour"""),
      "hourly per-type volume anomaly z-scores over a gap-filled grid"),

    // -- q121: ORDERED multi-step funnel — q43 answers "did view ever
    //    precede purchase"; this answers the product question "of the
    //    users who viewed, how many then clicked, and of those, how
    //    many then purchased — and how long did the full path take".
    //    Each step is a conditional min STRICTLY AFTER the previous
    //    step's timestamp (three user-keyed aggregates chained by
    //    equi-joins — no window over raw events, no driver state),
    //    then three 1-row frames broadcast-combine into one summary
    //    row. Rates divide exact counts in double with one 4dp round;
    //    mean time-to-convert sums exact microsecond diffs in
    //    DECIMAL(38,6) before the single double division chain.
    Q("q121_funnel_steps",
      (s, d) => {
        val ev = t(s, d).events
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("fv"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("ts") > col("fv"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("fc"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("ts") > col("fc"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("fp"))
        val nv = v.agg(count(lit(1)).as("n_view"))
        val nc = c.agg(count(lit(1)).as("n_click"))
        val np = p.join(v, Seq("user_id"))
          .agg(count(lit(1)).as("n_purchase"),
            sum((unix_micros(col("fp")) - unix_micros(col("fv")))
              .cast("decimal(38,6)")).as("us"))
        nv.crossJoin(broadcast(nc)).crossJoin(broadcast(np))
          .select(col("n_view"), col("n_click"), col("n_purchase"),
            round(col("n_click").cast("double") / col("n_view"), 4)
              .as("click_rate"),
            round(col("n_purchase").cast("double") / col("n_click"), 4)
              .as("purchase_rate"),
            round(col("us").cast("double") / col("n_purchase")
              / 3600000000.0, 4).as("avg_hours_to_convert"))
      },
      Some("""WITH v AS (
          SELECT user_id, MIN(ts) AS fv FROM events
          WHERE event_type = 'view' GROUP BY 1),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS fc
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.fv GROUP BY 1),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS fp
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.fc GROUP BY 1),
        nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_view FROM v),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_click FROM c),
        np AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_purchase,
            SUM(CAST(epoch_us(fp) - epoch_us(fv) AS DECIMAL(38,6))) AS us
          FROM p JOIN v USING (user_id))
        SELECT n_view, n_click, n_purchase,
          ROUND(CAST(n_click AS DOUBLE) / n_view, 4) AS click_rate,
          ROUND(CAST(n_purchase AS DOUBLE) / n_click, 4) AS purchase_rate,
          ROUND(CAST(us AS DOUBLE) / n_purchase / 3600000000.0, 4)
            AS avg_hours_to_convert
        FROM nv, nc, np"""),
      "ordered view→click→purchase funnel with step rates and mean latency"),

    // -- q122: per-user event-type MARKOV TRANSITION matrix — "what
    //    happens next" flow analytics (and the generative model behind
    //    session simulation). One user-partitioned sort window
    //    produces each event's predecessor type (ties broken by
    //    event_id so the lag is total-ordered and replay-stable),
    //    then everything downstream is alphabet²-bounded: transition
    //    counts, per-source-state totals (a rollup of the counts, not
    //    a second scan), and row probabilities as one 4dp-rounded
    //    double division. Scale: the only data-sized shuffle is the
    //    (user, ts) sort the window needs; the matrix itself is
    //    constant-size whatever the corpus.
    Q("q122_markov_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val tr = t(s, d).events
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("out_n"))
        tr.join(broadcast(tot), Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"), col("out_n"),
            round(col("n").cast("double") / col("out_n"), 4).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH tr AS (
          SELECT LAG(event_type) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
            event_type AS to_type
          FROM events),
        c AS (
          SELECT from_type, to_type, COUNT(*) AS n FROM tr
          WHERE from_type IS NOT NULL GROUP BY 1, 2),
        tot AS (
          SELECT from_type, CAST(SUM(n) AS BIGINT) AS out_n
          FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n, tot.out_n,
          ROUND(CAST(c.n AS DOUBLE) / tot.out_n, 4) AS p
        FROM c JOIN tot USING (from_type)
        ORDER BY from_type, to_type"""),
      "per-user event-type Markov transition matrix (next-event probabilities)"),

    // -- q127: session JOURNEY trigrams — path analysis one order past
    //    q122's transition matrix: the most common three-step
    //    event-type sequences WITHIN a session (q42's 30-minute
    //    gaps-and-islands numbering), the "how do users actually move
    //    through the product" and session-simulation-validation
    //    readout. Two user-keyed sort windows (session numbering,
    //    then the two in-session lags — ties total-ordered by
    //    event_id), then everything alphabet³-bounded. Top-20 is
    //    rank-by-(count, path) → TakeOrderedAndProject.
    Q("q127_session_trigrams",
      (s, d) => {
        val uw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val numbered = t(s, d).events
          .withColumn("new_s",
            when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(uw)
              < 1800000000L, 0).otherwise(1))
          .withColumn("session_id", sum(col("new_s")).over(
            uw.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        val sw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("ts"), col("event_id"))
        numbered
          .withColumn("t1", lag(col("event_type"), 2).over(sw))
          .withColumn("t2", lag(col("event_type"), 1).over(sw))
          .filter(col("t1").isNotNull)
          .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
          .limit(20)
      },
      Some("""WITH marked AS (
          SELECT user_id, event_id, ts, event_type,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
          FROM events),
        numbered AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked),
        tri AS (
          SELECT
            LAG(event_type, 2) OVER (
              PARTITION BY user_id, session_id ORDER BY ts, event_id) AS t1,
            LAG(event_type, 1) OVER (
              PARTITION BY user_id, session_id ORDER BY ts, event_id) AS t2,
            event_type AS t3
          FROM numbered)
        SELECT t1, t2, t3, COUNT(*) AS n FROM tri
        WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
        ORDER BY n DESC, t1, t2, t3 LIMIT 20"""),
      "top in-session event-type trigram journeys (path analysis)")
  )
}
