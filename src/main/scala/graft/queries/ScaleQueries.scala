package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Skew, Temporal}
import graft.queries.Tables.t

/** Scale-technique queries: each demonstrates a 100 TB pattern and is
  * oracle-checked to produce exactly the semantics of the naive form.
  */
object ScaleQueries {

  val all: Seq[Q] = Seq(

    // salted skew join: must equal the plain equi-join (the oracle IS the
    // plain join) while spreading any hot o_custkey across 8 reducers.
    Q("q_salted_join", Some(
      "SELECT o_orderkey, o_custkey, c_name " +
      "FROM orders JOIN customer ON o_custkey = c_custkey"))(
      (s, d) =>
        Skew.saltedJoin(
          t(s, d, "orders"), t(s, d, "customer").select("c_custkey", "c_name"),
          col("o_custkey"), col("c_custkey"), salts = 8)
          .select("o_orderkey", "o_custkey", "c_name")),

    // Z-order layout values over (user_id, ts): equi-width integer
    // bucketing against a 1-row min/max broadcast, then Morton interleave
    // — all BIGINT ops (`div` == `//` on non-negatives), exact past 2^53
    // where ts nanos live. The write-side rewrite (range shuffle + sort)
    // is Layout.zOrderLayout; the values are what the oracle can hash.
    Q("q_zorder", Some("""
      |WITH e AS (SELECT event_id, CAST(user_id AS BIGINT) AS x, epoch_ns(ts) AS y FROM events),
      |mm AS (SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax FROM e),
      |b AS (SELECT event_id, bx, by FROM (
      |  SELECT event_id,
      |    (x - xmin) // (((xmax - xmin) // 256) + 1) AS bx,
      |    (y - ymin) // (((ymax - ymin) // 256) + 1) AS by
      |  FROM e CROSS JOIN mm))
      |SELECT event_id, bx, by,
      |  CAST(list_sum(list_transform(range(0, 8), i ->
      |    ((bx >> i) & 1) * (1::BIGINT << (2*i)) + ((by >> i) & 1) * (1::BIGINT << (2*i+1)))) AS BIGINT) AS zvalue
      |FROM b
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Layout.zOrderValue(
          t(s, d, "events").select("event_id", "user_id", "ts"),
          "user_id", "ts", bits = 8)
        .select("event_id", "bx", "by", "zvalue")),

    // event-time sessionization (30-minute inactivity gap) via Spark's
    // native session_window; oracle = the gaps-and-islands construction.
    // ts is nanos-as-long; both engines work in exact integer micros.
    Q("q_session_window", Some(
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (SELECT user_id, us,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |       >= 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sessions AS (SELECT user_id, us,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id, min(us) AS session_start, count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id""".stripMargin))(
      (s, d) =>
        t(s, d, "events")
          .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("tsm"))
          .groupBy(session_window(col("tsm"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start"),
            col("n_events"))),

    // as-of join: each click paired with the user's latest purchase at or
    // before the click time (point-in-time enrichment). Exact-integer nanos.
    Q("q_asof_join", Some(
      """WITH c AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id AS p_uid, epoch_ns(ts) AS pt
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, p_id, pt // 1000 AS pt_us FROM (
        |  SELECT c.event_id, c.user_id, p.p_id, p.pt, row_number() OVER (
        |    PARTITION BY c.event_id ORDER BY p.pt DESC, p.p_id) AS rn
        |  FROM c JOIN p ON c.user_id = p.p_uid AND p.pt <= c.t)
        |WHERE rn = 1""".stripMargin))(
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts").as("t"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_uid"),
            col("ts").as("pt"))
        // sorted form shipped (unbounded look-back ⇒ the range-join form's
        // L×V intermediate is the weak plan on hot keys); the range-join
        // reference implementation stays property-pinned equal
        Temporal.asOfJoinSorted(clicks, purchases,
            col("user_id"), col("p_uid"), col("t"), col("pt"),
            leftId = Seq("event_id"), tieBreak = Seq(-col("p_id")))
          // micros on both sides: DuckDB truncates parquet nanos to micros
          .select(col("event_id"), col("user_id"), col("p_id"),
            expr("pt div 1000").as("pt_us"))
      }),

    // banded as-of join: same point-in-time semantics bounded to a 3-day
    // window, with the band in the join key — the form whose per-key work
    // stays proportional to pairs actually within tolerance (see
    // Temporal.asOfJoinBanded). Oracle = the naive range join.
    Q("q_asof_banded", Some(
      """WITH c AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id AS p_uid, epoch_ns(ts) AS pt
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, p_id, pt // 1000 AS pt_us FROM (
        |  SELECT c.event_id, c.user_id, p.p_id, p.pt, row_number() OVER (
        |    PARTITION BY c.event_id ORDER BY p.pt DESC, p.p_id) AS rn
        |  FROM c JOIN p ON c.user_id = p.p_uid AND p.pt <= c.t
        |    AND p.pt >= c.t - 259200000000000)
        |WHERE rn = 1""".stripMargin))(
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts").as("t"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_uid"),
            col("ts").as("pt"))
        Temporal.asOfJoinBanded(clicks, purchases,
            col("user_id"), col("p_uid"), col("t"), col("pt"),
            leftId = Seq("event_id"), tolerance = lit(259200000000000L),
            tieBreak = Seq(-col("p_id")))
          .select(col("event_id"), col("user_id"), col("p_id"),
            expr("pt div 1000").as("pt_us"))
      }),

    // interval (range) join with the band in the join key: error events
    // open 10-minute incident windows; every engagement event landing
    // inside a window attributes to it. A bare BETWEEN join is a
    // BroadcastNestedLoopJoin (probe × intervals); the banded form is a
    // hash equi-join + residual filter (plan-pinned BNLJ-free).
    Q("q_range_join", Some("""
      |WITH e AS (SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type FROM events),
      |inc AS (SELECT event_id AS incident_id, ts AS lo, ts + 600000000000 AS hi
      |  FROM e WHERE event_type = 'error'),
      |p AS (SELECT event_id, ts, user_id FROM e
      |  WHERE event_type IN ('click', 'view', 'purchase'))
      |SELECT incident_id, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users
      |FROM p JOIN inc ON p.ts >= inc.lo AND p.ts <= inc.hi
      |GROUP BY 1
      |""".stripMargin.trim))(
      (s, d) => {
        val ev = t(s, d, "events")
        val w = 600L * 1000 * 1000 * 1000
        val incidents = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("incident_id"), col("ts").as("lo"),
            (col("ts") + w).as("hi"))
        val probes = ev
          .filter(col("event_type").isin("click", "view", "purchase"))
          .select(col("event_id"), col("ts"), col("user_id"))
        Temporal.rangeJoin(probes, incidents, "ts", "lo", "hi", band = w)
          .groupBy("incident_id")
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").as("n_users"))
      }),

    // interval × interval overlap join: error incidents ([ts, ts+600 s])
    // against purchase windows ([ts, ts+300 s]) — which incidents
    // overlapped a purchase in flight, and for how long. Both sides fan
    // out to fixed-width bands and the match is a hash equi-join with
    // each pair CLAIMED exactly once at its first shared band (a filter,
    // not a dedup shuffle) — Spark would plan the naive overlap
    // predicate as a nested loop. Integer micros end-to-end
    // (ts div 1000 == epoch_ns // 1000 on the nonneg axis); overlap
    // lengths sum exactly.
    Q("q_interval_join", Some("""
      |WITH e AS (SELECT event_id, epoch_ns(ts) // 1000 AS us, event_type FROM events),
      |i AS (SELECT event_id AS incident_id, us AS i_lo, us + 600000000 AS i_hi
      |  FROM e WHERE event_type = 'error'),
      |s AS (SELECT event_id AS session_id, us AS s_lo, us + 300000000 AS s_hi
      |  FROM e WHERE event_type = 'purchase')
      |SELECT incident_id, count(*) AS n_overlap,
      |  CAST(sum(least(i_hi, s_hi) - greatest(i_lo, s_lo)) AS BIGINT) AS total_overlap_us
      |FROM i JOIN s ON i_lo <= s_hi AND s_lo <= i_hi
      |GROUP BY 1
      |""".stripMargin.trim))(
      (s, d) => {
        val ev = t(s, d, "events").withColumn("us", expr("ts div 1000"))
        val inc = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("incident_id"), col("us").as("i_lo"),
            (col("us") + 600000000L).as("i_hi"))
        val ses = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("session_id"), col("us").as("s_lo"),
            (col("us") + 300000000L).as("s_hi"))
        Temporal.intervalOverlapJoin(inc, ses,
            "i_lo", "i_hi", "s_lo", "s_hi", band = 300000000L)
          .groupBy("incident_id")
          .agg(count(lit(1)).as("n_overlap"),
            sum(least(col("i_hi"), col("s_hi")) -
              greatest(col("i_lo"), col("s_lo"))).as("total_overlap_us"))
      }),

    // stream-table (KTable) point-in-time join: clicks enriched with the
    // user's purchase-props state AS OF the click (tombstoned by error
    // events). The reference's JoinKTable, implemented. Exact micros.
    Q("q_join_ktable", Some(
      """WITH cl AS (SELECT user_id AS t_uid, epoch_ns(ts) AS t_ord,
        |  event_id AS t_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS state
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |clicks AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
        |  WHERE event_type = 'click')
        |SELECT event_id, user_id, state FROM (
        |  SELECT c.event_id, c.user_id, cl.state, row_number() OVER (
        |    PARTITION BY c.event_id ORDER BY cl.t_ord DESC, cl.t_id) AS rn
        |  FROM clicks c JOIN cl ON c.user_id = cl.t_uid AND cl.t_ord <= c.t)
        |WHERE rn = 1 AND state IS NOT NULL""".stripMargin))(
      (s, d) => {
        val ev = t(s, d, "events")
        val changelog = ev.filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id").as("t_uid"), col("ts").as("t_ord"),
            col("event_id").as("t_id"),
            when(col("event_type") === "error", lit(null))
              .otherwise(col("props")).as("state"))
        val clicks = graft.dsl.KStream(
          ev.filter(col("event_type") === "click")
            .select("event_id", "user_id", "ts"), "user_id")
        graft.dsl.KTable.fromChangelog(changelog, "t_uid", "t_ord", Some("state"))
          .joinAsOf(clicks, col("user_id"), col("ts"),
            recordId = Seq("event_id"), tieBreak = Seq(-col("t_id")))
          .toDF.select("event_id", "user_id", "state")
      }),

    // semi/anti joins — membership filtering against a keyed store without
    // materializing the join (no right-side columns, no row duplication;
    // the right side is broadcast). The reference can only express these
    // as a global-table join + drop, paying full join output.
    Q("q_join_semi", Some(
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (" +
      "SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)"))(
      (s, d) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")),

    Q("q_join_anti", Some(
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (" +
      "SELECT 1 FROM orders WHERE o_custkey = c_custkey)"))(
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")),

    // the SQL entry point: the same engine drives plain spark.sql over
    // registered views, with the native functions available
    // (GraftExtensions) — here the codegen'd cosine_sim from SQL text.
    Q("q_sql_surface", Some(
      """WITH e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  (list_sum(list_transform(range(1, 65),
        |     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |   / (a.nrm * b.nrm) >= 0.3) AS is_similar
        |FROM e a JOIN e b ON b.vec_id = a.vec_id + 1""".stripMargin))(
      (s, d) => {
        t(s, d, "embeddings").createOrReplaceTempView("graft_embeddings")
        s.sql("""
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            cosine_sim(a.embedding, b.embedding) >= 0.3 AS is_similar
          FROM graft_embeddings a JOIN graft_embeddings b ON b.vec_id = a.vec_id + 1""")
      }),

    // exact distinct cardinality per group — one partial-agg expand
    Q("q_distinct_users", Some(
      "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events " +
      "FROM events GROUP BY event_type"))(
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))),

    // portable HLL register table (p=8): the oracle-able distinct-count
    // sketch artifact — md5-derived buckets and leading-zero ranks, so
    // DuckDB rebuilds the IDENTICAL registers (the incremental/mergeable
    // form of count(DISTINCT) at 100 TB; cf. q_distinct_users for exact).
    Q("q_hll_registers", Some("""
      |WITH h AS (SELECT ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events)
      |SELECT h // 4503599627370496 AS bucket,
      |  CAST(max(CASE WHEN h % 4503599627370496 = 0 THEN 53
      |    ELSE position('1' IN lpad(bin(h % 4503599627370496), 52, '0')) END) AS INT) AS rho
      |FROM h GROUP BY 1
      |""".stripMargin.trim))(
      (s, d) => graft.functions.Sketches.hllRegisters(
        t(s, d, "events"), col("event_id").cast("string"), p = 8)),

    // the estimate over those registers: exact-integer denominator
    // S = Σ 2^(R-ρ) (absent registers contribute 2^R), one double
    // division by the precomputed constant C = α·m²·2^R — bit-portable.
    Q("q_hll_distinct", Some({
      val c = graft.functions.Sketches.hllC(8)
      s"""
      |WITH h AS (SELECT ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (SELECT h // 4503599627370496 AS bucket,
      |  max(CASE WHEN h % 4503599627370496 = 0 THEN 53
      |    ELSE position('1' IN lpad(bin(h % 4503599627370496), 52, '0')) END) AS rho
      |  FROM h GROUP BY 1),
      |a AS (SELECT count(*) AS nb, sum(CAST(power(2, 53 - rho) AS BIGINT)) AS sp FROM r)
      |SELECT CAST(256 AS INT) AS m, CAST(256 - nb AS BIGINT) AS v,
      |  CAST(sp + (256 - nb) * 9007199254740992 AS BIGINT) AS s,
      |  CAST($c AS DOUBLE) / CAST(sp + (256 - nb) * 9007199254740992 AS DOUBLE) AS est
      |FROM a
      |""".stripMargin.trim}))(
      (s, d) => graft.functions.Sketches.hllEstimate(
        graft.functions.Sketches.hllRegisters(
          t(s, d, "events"), col("event_id").cast("string"), p = 8), p = 8)),

    // stratified form: one independent register set per event_type — the
    // per-partition artifact a pipeline stores beside its data and rolls
    // up later by bucket-wise max (hllMergeRegisters), never rescanning.
    Q("q_hll_by_group", Some({
      val c = graft.functions.Sketches.hllC(8)
      s"""
      |WITH h AS (SELECT event_type,
      |    ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (SELECT event_type, h // 4503599627370496 AS bucket,
      |  max(CASE WHEN h % 4503599627370496 = 0 THEN 53
      |    ELSE position('1' IN lpad(bin(h % 4503599627370496), 52, '0')) END) AS rho
      |  FROM h GROUP BY 1, 2),
      |a AS (SELECT event_type, count(*) AS nb,
      |  sum(CAST(power(2, 53 - rho) AS BIGINT)) AS sp FROM r GROUP BY 1)
      |SELECT event_type, CAST(256 AS INT) AS m, CAST(256 - nb AS BIGINT) AS v,
      |  CAST(sp + (256 - nb) * 9007199254740992 AS BIGINT) AS s,
      |  CAST($c AS DOUBLE) / CAST(sp + (256 - nb) * 9007199254740992 AS DOUBLE) AS est
      |FROM a
      |""".stripMargin.trim}))(
      (s, d) => graft.functions.Sketches.hllEstimate(
        graft.functions.Sketches.hllRegisters(
          t(s, d, "events"), col("event_id").cast("string"), p = 8,
          strata = Seq("event_type")),
        p = 8, strata = Seq("event_type"))),

    // event-type Markov transitions over per-user timelines: the
    // next-event distribution product analytics reads paths from
    // ("what follows a click?"). One user-keyed exchange, per-user
    // ordered scan (lead), vocabulary²-sized output — the per-user
    // window partitions by user_id, so no global sort exists anywhere;
    // nanos tie-break on event_id keeps both engines' lead() identical.
    Q("q_event_transitions", Some("""
      |WITH s AS (SELECT user_id, event_type, lead(event_type) OVER (
      |    PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS next_type
      |  FROM events)
      |SELECT event_type, coalesce(next_type, '</s>') AS next_type,
      |  count(*) AS n
      |FROM s GROUP BY 1, 2
      |""".stripMargin.trim))(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .groupBy(col("event_type"),
            coalesce(col("next_type"), lit("</s>")).as("next_type"))
          .agg(count(lit(1)).as("n"))
      }),

    // sliding-window distinct users via per-window HLL register tables —
    // the streaming-dashboard shape (distinct users in the last 2 h,
    // refreshed hourly) at sketch cost: each event lands in its two
    // hopping windows (explode, narrow), registers collapse map-side to
    // ≤ 2^p rows per window, and adjacent windows merge by register max
    // without rescanning events. Window math in integer microseconds
    // (`div`), exact in both engines.
    Q("q_hll_window", Some({
      val c = graft.functions.Sketches.hllC(8)
      s"""
      |WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
      |w AS (SELECT user_id, unnest([
      |    (us // 3600000000) * 3600000000 - 3600000000,
      |    (us // 3600000000) * 3600000000]) AS win_start FROM e),
      |h AS (SELECT win_start,
      |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM w),
      |r AS (SELECT win_start, h // 4503599627370496 AS bucket,
      |  max(CASE WHEN h % 4503599627370496 = 0 THEN 53
      |    ELSE position('1' IN lpad(bin(h % 4503599627370496), 52, '0')) END) AS rho
      |  FROM h GROUP BY 1, 2),
      |a AS (SELECT win_start, count(*) AS nb,
      |  sum(CAST(power(2, 53 - rho) AS BIGINT)) AS sp FROM r GROUP BY 1)
      |SELECT win_start, CAST(256 AS INT) AS m, CAST(256 - nb AS BIGINT) AS v,
      |  CAST(sp + (256 - nb) * 9007199254740992 AS BIGINT) AS s,
      |  CAST($c AS DOUBLE) / CAST(sp + (256 - nb) * 9007199254740992 AS DOUBLE) AS est
      |FROM a
      |""".stripMargin.trim}))(
      (s, d) => {
        val hour = 3600000000L
        val ev = t(s, d, "events")
          .select(col("user_id").cast("string").as("u"),
            (expr(s"((ts div 1000) div $hour) * $hour").as("b")))
          .select(col("u"),
            explode(array(col("b") - hour, col("b"))).as("win_start"))
        graft.functions.Sketches.hllEstimate(
          graft.functions.Sketches.hllRegisters(
            ev, col("u"), p = 8, strata = Seq("win_start")),
          p = 8, strata = Seq("win_start"))
      }),

    // weekly cohort retention: users bucketed by first-seen week; for
    // each (cohort, offset k), distinct users active k weeks later.
    // Shape: distinct (user, week) partial agg -> per-user min (cohort)
    // -> equi join back -> one count-distinct agg. No window, no sort.
    Q("q_cohort_retention", Some("""
      |WITH uw AS (SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events),
      |coh AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
      |SELECT c.cohort, u.wk - c.cohort AS k, count(DISTINCT u.user_id) AS n_users
      |FROM uw u JOIN coh c ON u.user_id = c.user_id
      |GROUP BY 1, 2
      |""".stripMargin.trim))(
      (s, d) => {
        // `div` (exact integral division on the nanos long), NOT the
        // decimal-division trick: tsMillis' divisor yields <= 6 exact
        // fractional digits, but a week of nanos yields 14, and Spark's
        // decimal divide rounds HALF_UP at scale 6 — events in the last
        // ~302 ms of a week would bucket into the next week, diverging
        // from DuckDB's floor `//`
        val uw = t(s, d, "events")
          .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
          .distinct()
        val coh = uw.groupBy("user_id").agg(min("wk").as("cohort"))
        uw.join(coh, "user_id")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("k"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      }),

    // one-pass column profile of the documents table — the data-quality
    // gate a pipeline runs before training. Integer-only outputs (counts,
    // distincts, min/max/sum) keep the cross-engine compare bit-exact.
    Q("q_profile", Some("""
      |SELECT count(*) AS n_rows,
      |  count(*) - count(text) AS n_null_text,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT doc_id) AS n_ids
      |FROM documents
      |""".stripMargin.trim))(
      (s, d) => t(s, d, "documents").agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("text"))).as("n_null_text"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("doc_id")).as("n_ids"))),

    // SCD Type-2: each user's event_type changelog compressed to validity
    // intervals (runs of the same value collapse; valid_to = next change,
    // NULL for current). All windows partitioned by user — no global sort.
    // Both engines order by (derived epoch-ms, event_id), so tie behavior
    // is identical.
    Q("q_scd2", Some("""
      |WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ms, event_id FROM events),
      |f AS (SELECT user_id, event_type, ms, event_id,
      |  CASE WHEN row_number() OVER w = 1 THEN 1
      |       WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type THEN 0
      |       ELSE 1 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |i AS (SELECT user_id, event_type, ms,
      |  sum(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS isl FROM f),
      |g AS (SELECT user_id, isl, max(event_type) AS event_type, min(ms) AS valid_from
      |  FROM i GROUP BY user_id, isl)
      |SELECT user_id, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY isl) AS valid_to
      |FROM g
      |""".stripMargin.trim))(
      (s, d) => Temporal.scd2(
        t(s, d, "events"), "user_id", "event_type",
        Tables.tsMillis(col("ts")), col("event_id"))),

    // ordered-step funnel (view -> click -> purchase): per user, the first
    // view, the first click strictly after it, the first purchase strictly
    // after that. Stepwise min-after-join — per-user partial agg + equi
    // join per stage, each stage's frame shrinks — instead of sorting
    // every user's event history. Both engines compare on derived epoch
    // millis (same truncation), keeping tie behavior identical.
    Q("q_funnel", Some("""
      |WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ms FROM events),
      |a AS (SELECT user_id, min(ms) AS view_ms FROM e WHERE event_type = 'view' GROUP BY user_id),
      |b AS (SELECT e.user_id, a.view_ms, min(e.ms) AS click_ms FROM e JOIN a ON e.user_id = a.user_id
      |  WHERE e.event_type = 'click' AND e.ms > a.view_ms GROUP BY e.user_id, a.view_ms),
      |c AS (SELECT e.user_id, b.view_ms, b.click_ms, min(e.ms) AS purchase_ms FROM e JOIN b ON e.user_id = b.user_id
      |  WHERE e.event_type = 'purchase' AND e.ms > b.click_ms GROUP BY e.user_id, b.view_ms, b.click_ms)
      |SELECT user_id, view_ms, click_ms, purchase_ms FROM c
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Temporal.funnel(
        t(s, d, "events"), "user_id", "event_type",
        Tables.tsMillis(col("ts")), Seq("view", "click", "purchase"))),

    // windowed funnel with drop-off: EVERY user who viewed, with how deep
    // they got (click, then purchase) inside a 24 h conversion window of
    // their first view — the "where does the funnel leak" report the
    // completion-only funnel can't express. Same stepwise min-after-join
    // shape; per-user state is 3 epoch-ms longs per stage.
    Q("q_funnel_window", Some("""
      |WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ms FROM events),
      |a AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      |b AS (SELECT e.user_id, max(a.t1) AS t1, min(e.ms) AS t2 FROM e JOIN a ON e.user_id = a.user_id
      |  WHERE e.event_type = 'click' AND e.ms > a.t1 AND e.ms <= a.t1 + 86400000 GROUP BY e.user_id),
      |c AS (SELECT e.user_id, max(b.t1) AS t1, min(e.ms) AS t3 FROM e JOIN b ON e.user_id = b.user_id
      |  WHERE e.event_type = 'purchase' AND e.ms > b.t2 AND e.ms <= b.t1 + 86400000 GROUP BY e.user_id)
      |SELECT a.user_id,
      |  1 + CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END
      |    + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS steps_completed,
      |  a.t1 AS t_first,
      |  COALESCE(c.t3, b.t2, a.t1) AS t_last
      |FROM a LEFT JOIN b ON a.user_id = b.user_id LEFT JOIN c ON a.user_id = c.user_id
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Temporal.funnelWindowed(
        t(s, d, "events"), "user_id", "event_type",
        Tables.tsMillis(col("ts")), Seq("view", "click", "purchase"),
        window = 86400000L)),

    // weekly retention cohorts: users cohorted by first-activity week,
    // each (cohort, offset) cell = users from that cohort active offset
    // weeks later. One (user, week) distinct + user-keyed min + cell
    // count — nothing bigger than user x weeks moves.
    Q("q_retention", Some("""
      |WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS p FROM events),
      |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY 1)
      |SELECT f.cohort, CAST(e.p - f.cohort AS BIGINT) AS week_offset,
      |  count(*) AS active_users
      |FROM e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Temporal.retentionCohorts(
        t(s, d, "events"), "user_id", col("ts"),
        period = 604800000000000L)),

    // KMV / theta sketch distinct users per event_type + the '__all__'
    // rollup MERGED from the per-type sketches (never rescanning events).
    // k=64 < 150 distinct users/type, so the (k-1)·2^60/h_k estimator is
    // exercised, not just the short-sketch exact branch. The sketch is
    // exact BIGINT bottom-k rows, so DuckDB rebuilds it bit-identically;
    // est is one correctly-rounded double division (samplePps pattern).
    Q("q_kmv_distinct", Some("""
      |WITH h0 AS (SELECT DISTINCT event_type,
      |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |hh AS (SELECT event_type, h FROM h0
      |  UNION ALL SELECT '__all__' AS event_type, h FROM (SELECT DISTINCT h FROM h0)),
      |r AS (SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM hh)
      |SELECT event_type, CAST(count(*) AS INT) AS sz,
      |  CASE WHEN count(*) < 64 THEN 1152921504606846976
      |    ELSE max(CASE WHEN rk = 64 THEN h END) END AS theta,
      |  CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
      |    ELSE 63.0 * 1152921504606846976.0
      |      / CAST(max(CASE WHEN rk = 64 THEN h END) AS DOUBLE) END AS est
      |FROM r WHERE rk <= 64 GROUP BY 1
      |""".stripMargin.trim))(
      (s, d) => {
        import graft.functions.Sketches
        val ev = t(s, d, "events")
          .select(col("event_type"), col("user_id").cast("string").as("u"))
        val per = Sketches.kmvBuild(ev, Seq("event_type"), col("u"), k = 64)
        val rollup = Sketches.kmvMerge(per, Nil, k = 64)
          .withColumn("event_type", lit("__all__"))
        per.unionByName(rollup.select("event_type", "kmv"))
          .select(col("event_type"), size(col("kmv")).as("sz"),
            Sketches.kmvTheta(col("kmv"), 64).as("theta"),
            Sketches.kmvEstimate(col("kmv"), 64).as("est"))
      }),

    // cross-corpus overlap matrix: per-source KMV sketches over 3-word
    // shingles, then every source pair's intersection / union / A-not-B /
    // Jaccard estimates — the "how much of crawl B is already in crawl A"
    // question that HLL cannot answer (no register intersection). One
    // corpus scan builds 20 sketches; the pairwise stage touches only the
    // 20-row sketch table — sources are never joined against each other.
    Q("q_kmv_overlap", Some("""
      |WITH toks AS (SELECT source, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
      |sh AS (SELECT source, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |  ELSE list_distinct(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) END) AS sh
      |  FROM toks),
      |hs AS (SELECT DISTINCT source, ('0x' || substring(md5(sh), 1, 15))::BIGINT AS h FROM sh),
      |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk FROM hs),
      |kk AS (SELECT source, h FROM r WHERE rk <= 128),
      |s AS (SELECT source, count(*) AS sz, max(CASE WHEN rk = 128 THEN h END) AS hk
      |  FROM r WHERE rk <= 128 GROUP BY 1),
      |st AS (SELECT source, sz,
      |    CASE WHEN sz < 128 THEN 1152921504606846976 ELSE hk END AS th,
      |    CASE WHEN sz < 128 THEN CAST(sz AS DOUBLE)
      |      ELSE 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END AS est
      |  FROM s),
      |p AS (SELECT a.source AS stratum_a, b.source AS stratum_b,
      |    a.est AS est_a, b.est AS est_b, least(a.th, b.th) AS th
      |  FROM st a JOIN st b ON a.source < b.source),
      |ra AS (SELECT p.stratum_a, p.stratum_b, kk.h FROM p
      |  JOIN kk ON kk.source = p.stratum_a AND kk.h < p.th),
      |rb AS (SELECT p.stratum_a, p.stratum_b, kk.h FROM p
      |  JOIN kk ON kk.source = p.stratum_b AND kk.h < p.th),
      |ca AS (SELECT stratum_a, stratum_b, count(*) AS an FROM ra GROUP BY 1, 2),
      |cb AS (SELECT stratum_a, stratum_b, count(*) AS bn FROM rb GROUP BY 1, 2),
      |ci AS (SELECT ra.stratum_a, ra.stratum_b, count(*) AS i FROM ra
      |  JOIN rb ON ra.stratum_a = rb.stratum_a AND ra.stratum_b = rb.stratum_b AND ra.h = rb.h
      |  GROUP BY 1, 2)
      |SELECT p.stratum_a, p.stratum_b, p.est_a, p.est_b,
      |  CAST(coalesce(i, 0) AS DOUBLE) * 1152921504606846976.0 / CAST(p.th AS DOUBLE) AS est_intersect,
      |  CAST(coalesce(an, 0) + coalesce(bn, 0) - coalesce(i, 0) AS DOUBLE) * 1152921504606846976.0 / CAST(p.th AS DOUBLE) AS est_union,
      |  CAST(coalesce(an, 0) - coalesce(i, 0) AS DOUBLE) * 1152921504606846976.0 / CAST(p.th AS DOUBLE) AS est_anotb,
      |  CASE WHEN coalesce(an, 0) + coalesce(bn, 0) - coalesce(i, 0) > 0
      |    THEN CAST(coalesce(i, 0) AS DOUBLE)
      |      / CAST(coalesce(an, 0) + coalesce(bn, 0) - coalesce(i, 0) AS DOUBLE) END AS jaccard,
      |  CASE WHEN coalesce(an, 0) > 0
      |    THEN CAST(coalesce(i, 0) AS DOUBLE) / CAST(an AS DOUBLE) END AS containment_a,
      |  CASE WHEN coalesce(bn, 0) > 0
      |    THEN CAST(coalesce(i, 0) AS DOUBLE) / CAST(bn AS DOUBLE) END AS containment_b
      |FROM p LEFT JOIN ca USING (stratum_a, stratum_b)
      |  LEFT JOIN cb USING (stratum_a, stratum_b)
      |  LEFT JOIN ci USING (stratum_a, stratum_b)
      |""".stripMargin.trim))(
      (s, d) => graft.functions.Sketches.kmvOverlapMatrix(
        t(s, d, "documents")
          .select(col("source"),
            explode(graft.operators.Dedup.shingles(col("text"), 3)).as("sh")),
        "source", col("sh"), k = 128)),

    // deterministic integer PageRank over the symmetric supplier–customer
    // trade graph (suppliers even ids, customers odd): 5 power-iteration
    // rounds of Graph.pageRankExact, every step a BIGINT multiply/floor-
    // div, so DuckDB's recursive CTE reproduces the ranks bit-for-bit —
    // the crawl-graph authority prior of a web-scale quality pipeline,
    // expressed as the Pregel join/agg shape that survives a 100 TB edge
    // list.
    Q("q_pagerank", Some("""
      |WITH RECURSIVE
      |e0 AS (SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |outd AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      |pr AS (
      |  SELECT 0 AS i, src AS node, CAST(1000000000 AS BIGINT) AS rnk FROM outd
      |  UNION ALL
      |  SELECT p.i + 1, e.dst,
      |    CAST(150000000 + sum(((p.rnk * 17) // 20) // o.d) AS BIGINT)
      |  FROM pr p JOIN edges e ON e.src = p.node JOIN outd o ON o.src = p.node
      |  WHERE p.i < 5
      |  GROUP BY p.i, e.dst
      |)
      |SELECT node, rnk AS pr_rank FROM pr WHERE i = 5
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Graph.pageRankExact(tradeGraph(s, d), iters = 5)),

    // synchronous deterministic label propagation (communities): 3 full
    // sweeps where each node adopts its in-neighbors' most frequent
    // label, ties to the SMALLEST — an exact integer recurrence (no
    // randomness), so the recursive CTE replays the label partition
    // bit-for-bit. The engine argmax is one max(struct(count, -label))
    // aggregate; the oracle's struct-min mirrors it.
    Q("q_communities", Some("""
      |WITH RECURSIVE
      |e0 AS (SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |lp AS (
      |  SELECT 0 AS i, node, CAST(node AS BIGINT) AS lbl FROM nodes
      |  UNION ALL
      |  SELECT i + 1, dst AS node, (min({'nc': -cnt, 'l': lbl})).l AS lbl FROM (
      |    SELECT p.i AS i, e.dst AS dst, p.lbl AS lbl, count(*) AS cnt
      |    FROM lp p JOIN edges e ON e.src = p.node
      |    WHERE p.i < 3
      |    GROUP BY 1, 2, 3) t
      |  GROUP BY 1, 2
      |)
      |SELECT node, lbl FROM lp WHERE i = 3
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Graph.labelPropagation(tradeGraph(s, d),
        rounds = 3)),

    // personalized PageRank: teleport mass pinned to the supplier seed
    // set (even nodes) — the trusted-seed quality-propagation signal;
    // customers hold only link-received mass. Same integer recurrence,
    // 3 rounds; the oracle adds isolated seeds (constant base after round
    // 1) outside the recursion.
    Q("q_ppr", Some("""
      |WITH RECURSIVE
      |e0 AS (SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |outd AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      |pr AS (
      |  SELECT 0 AS i, src AS node,
      |    CAST(CASE WHEN src % 2 = 0 THEN 1000000000 ELSE 0 END AS BIGINT) AS rnk
      |  FROM outd
      |  UNION ALL
      |  SELECT p.i + 1, e.dst,
      |    CAST(CASE WHEN e.dst % 2 = 0 THEN 150000000 ELSE 0 END
      |      + sum(((p.rnk * 17) // 20) // o.d) AS BIGINT)
      |  FROM pr p JOIN edges e ON e.src = p.node JOIN outd o ON o.src = p.node
      |  WHERE p.i < 3
      |  GROUP BY p.i, e.dst
      |)
      |SELECT node, rnk AS pr_rank FROM pr WHERE i = 3
      |UNION ALL
      |SELECT s_suppkey * 2, CAST(150000000 AS BIGINT) FROM supplier
      |WHERE s_suppkey * 2 NOT IN (SELECT src FROM outd)
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Graph.personalizedPageRankExact(
        tradeGraph(s, d),
        t(s, d, "supplier").select((col("s_suppkey") * 2).as("node")),
        iters = 3)),

    // integer HITS on the directed customer→supplier bipartite graph:
    // customers are hubs, suppliers authorities; 3 full rounds, exact
    // max-normalization (winner holds exactly scale=10^6). The oracle
    // alternates half-rounds through one recursive CTE whose parity
    // picks the join side; the window max normalizes within the step.
    Q("q_hits", Some("""
      |WITH RECURSIVE
      |e0 AS (SELECT DISTINCT o_custkey * 2 + 1 AS src, l_suppkey * 2 AS dst
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |hs AS (
      |  SELECT 0 AS i, src AS node, CAST(1000000 AS BIGINT) AS score
      |  FROM (SELECT DISTINCT src FROM e0)
      |  UNION ALL
      |  SELECT i, node, CAST(raw * 1000000 // max(raw) OVER () AS BIGINT) AS score
      |  FROM (
      |    SELECT p.i + 1 AS i,
      |      CASE WHEN p.i % 2 = 0 THEN e.dst ELSE e.src END AS node,
      |      sum(p.score) AS raw
      |    FROM hs p JOIN e0 e
      |      ON (p.i % 2 = 0 AND e.src = p.node) OR (p.i % 2 = 1 AND e.dst = p.node)
      |    WHERE p.i < 6
      |    GROUP BY 1, 2) s
      |)
      |SELECT node, score, 'auth' AS role FROM hs WHERE i = 5
      |UNION ALL
      |SELECT node, score, 'hub' AS role FROM hs WHERE i = 6
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Graph.hitsBipartite(
        tradePairs(s, d).select(col("dst").as("src"), col("src").as("dst")),
        iters = 3)),

    // HyperBall neighborhood sizes: every node's 2-hop ball estimated by
    // propagating p=4 HLL registers along the closed edge list — the
    // oracle replays the identical md5 registers, integer maxes, and
    // exact-denominator estimate through a recursive CTE, so the
    // APPROXIMATE op still hash-matches bit-for-bit.
    Q("q_neighborhood", Some({
      val c = graft.functions.Sketches.hllC(4)
      s"""
      |WITH RECURSIVE
      |e0 AS (SELECT DISTINCT l_suppkey * 2 AS a, o_custkey * 2 + 1 AS b
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |eplus AS (SELECT src, dst FROM edges UNION ALL SELECT node, node FROM nodes),
      |hr AS (SELECT node,
      |    ('0x' || substring(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM nodes),
      |pr AS (
      |  SELECT 0 AS i, node, h // 72057594037927936 AS bucket,
      |    CASE WHEN h % 72057594037927936 = 0 THEN 57
      |      ELSE position('1' IN lpad(bin(h % 72057594037927936), 56, '0')) END AS rho
      |  FROM hr
      |  UNION ALL
      |  SELECT p.i + 1, e.src, p.bucket, max(p.rho)
      |  FROM pr p JOIN eplus e ON e.dst = p.node
      |  WHERE p.i < 2
      |  GROUP BY 1, 2, 3
      |),
      |fin AS (SELECT node, bucket, rho FROM pr WHERE i = 2),
      |a AS (SELECT node, count(*) AS nb,
      |  sum(CAST(power(2, 57 - rho) AS BIGINT)) AS sp FROM fin GROUP BY 1)
      |SELECT node, CAST(16 AS INT) AS m, CAST(16 - nb AS BIGINT) AS v,
      |  CAST(sp + (16 - nb) * 144115188075855872 AS BIGINT) AS s,
      |  CAST($c AS DOUBLE) / CAST(sp + (16 - nb) * 144115188075855872 AS DOUBLE) AS est
      |FROM a
      |""".stripMargin.trim}))(
      (s, d) => graft.operators.Graph.neighborhoodSizes(
        tradeGraph(s, d), radius = 2, p = 4)),

    // exact triangle counts on the user co-occurrence graph (users
    // sharing an (event_type, 5-minute bucket)): degree-oriented wedge
    // join — each triangle found once at its orientation-minimal vertex,
    // per-key fanout O(√m) by the orientation. The local-clustering
    // signal, all exact integers.
    Q("q_triangles", Some("""
      |WITH b AS (SELECT DISTINCT event_type, epoch_ns(ts) // 300000000000 AS w, user_id
      |  FROM events),
      |und AS (SELECT DISTINCT a.user_id AS u, b2.user_id AS v
      |  FROM b a JOIN b b2 ON a.event_type = b2.event_type AND a.w = b2.w
      |    AND a.user_id < b2.user_id),
      |deg AS (SELECT n, count(*) AS d
      |  FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und) GROUP BY 1),
      |o AS (SELECT CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN und.u ELSE und.v END AS a,
      |             CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN und.v ELSE und.u END AS b
      |      FROM und JOIN deg du ON du.n = und.u JOIN deg dv ON dv.n = und.v),
      |w AS (SELECT o1.a AS w0, o1.b AS p, o2.b AS q
      |      FROM o o1 JOIN o o2 ON o1.a = o2.a AND o1.b < o2.b),
      |cl AS (SELECT least(a, b) AS p, greatest(a, b) AS q FROM o),
      |tri AS (SELECT w0, p, q FROM w JOIN cl USING (p, q)),
      |corners AS (SELECT w0 AS n FROM tri UNION ALL SELECT p FROM tri
      |  UNION ALL SELECT q FROM tri),
      |pn AS (SELECT n, count(*) AS c FROM corners GROUP BY 1)
      |SELECT deg.n AS node, deg.d AS degree,
      |  CAST(coalesce(pn.c, 0) AS BIGINT) AS n_triangles
      |FROM deg LEFT JOIN pn ON pn.n = deg.n
      |""".stripMargin.trim))(
      (s, d) => {
        val b = t(s, d, "events")
          .select(col("event_type"), expr("ts div 300000000000").as("w"),
            col("user_id"))
          .distinct()
        val edges = b.select(col("event_type"), col("w"), col("user_id").as("src"))
          .join(b.select(col("event_type"), col("w"), col("user_id").as("dst")),
            Seq("event_type", "w"))
          .filter(col("src") < col("dst"))
          .select("src", "dst")
        graft.operators.Graph.triangleCounts(edges)
      }),

    // seed-set BFS distances on the trade graph: min hops from the
    // s_suppkey % 7 = 1 suppliers (a seed set present at every SF),
    // 4 rounds — the crawl-frontier distance prior (customers land at
    // odd hops, rival suppliers at even). Exact integer recurrence; the
    // oracle's UNION recursion dedups (node, dist) pairs so its working
    // set stays nodes x rounds. Engine joins only the FRONTIER per
    // round against the once-shuffled edge list.
    Q("q_sssp", Some("""
      |WITH RECURSIVE
      |e0 AS (SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |bfs AS (
      |  SELECT CAST(s_suppkey * 2 AS BIGINT) AS node, 0 AS i
      |  FROM supplier WHERE s_suppkey % 7 = 1
      |  UNION
      |  SELECT CAST(e.dst AS BIGINT), b.i + 1
      |  FROM bfs b JOIN edges e ON e.src = b.node
      |  WHERE b.i < 4
      |)
      |SELECT node, CAST(min(i) AS BIGINT) AS dist FROM bfs GROUP BY node
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Graph.shortestPaths(
        tradeGraph(s, d),
        t(s, d, "supplier").filter(col("s_suppkey") % 7 === 1)
          .select((col("s_suppkey") * 2).as("node")),
        rounds = 4)),

    // fixed-round k-core peel (k=10, 3 sweeps) on the trade graph: each
    // sweep drops every node with degree < 10 and its edges
    // simultaneously — the dense-subgraph prior (link rings / template
    // farms live in high cores). The oracle is the UNROLLED exact set
    // recurrence, one (survivors, surviving-edges) CTE pair per sweep.
    Q("q_kcore", Some("""
      |WITH
      |e0 AS (SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |s1 AS (SELECT src FROM edges GROUP BY src HAVING count(*) >= 10),
      |e1 AS (SELECT e.src, e.dst FROM edges e
      |       JOIN s1 a ON a.src = e.src JOIN s1 b ON b.src = e.dst),
      |s2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 10),
      |e2 AS (SELECT e.src, e.dst FROM e1 e
      |       JOIN s2 a ON a.src = e.src JOIN s2 b ON b.src = e.dst),
      |s3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 10),
      |e3 AS (SELECT e.src, e.dst FROM e2 e
      |       JOIN s3 a ON a.src = e.src JOIN s3 b ON b.src = e.dst)
      |SELECT CAST(src AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg
      |FROM e3 GROUP BY 1
      |""".stripMargin.trim))(
      (s, d) => graft.operators.Graph.kCore(tradeGraph(s, d),
        k = 10, rounds = 3)),

    // AMS/F2 second moment of the event user-key: the self-join-size /
    // skew-mass estimate a planner wants BEFORE shuffling — 9 ±1-signed
    // lane sums (bit-l of the portable hash), exact decimal squares,
    // median as an exact order statistic; exact F2 alongside to expose
    // the estimate's quality in the artifact.
    Q("q_f2_selfjoin", Some("""
      |WITH h AS (SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |l AS (SELECT unnest(range(9)) AS l),
      |s AS (SELECT l.l, sum(CASE WHEN (h.h >> l.l) % 2 = 1 THEN 1 ELSE -1 END) AS sm
      |  FROM h CROSS JOIN l GROUP BY 1),
      |xs AS (SELECT sm * sm AS x FROM s ORDER BY x LIMIT 1 OFFSET 4),
      |e AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2
      |  FROM (SELECT count(*) AS c FROM events GROUP BY user_id))
      |SELECT CAST(9 AS INT) AS lanes, CAST(x AS DOUBLE) AS est_f2, exact_f2
      |FROM xs, e
      |""".stripMargin.trim))(
      (s, d) => {
        val ev = t(s, d, "events").select("user_id")
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * col("c")).as("exact_f2"))
        graft.functions.Sketches.f2Estimate(ev, col("user_id"), lanes = 9)
          .crossJoin(broadcast(exact))
      }),
  )

  /** Distinct supplier→customer trade edges (suppliers even, customers
    * odd): the shared base of the link-analysis queries.
    */
  private def tradePairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey")
    val or = t(s, d, "orders").select("o_orderkey", "o_custkey")
    li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"),
        (col("o_custkey") * 2 + 1).as("dst"))
      .distinct()
  }

  /** Symmetrized trade graph — the PageRank/PPR edge list. */
  private def tradeGraph(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val pairs = tradePairs(s, d)
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }
}
