package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Export, Profiler, Relational, Sampling}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 is exposed as a named query
  * over a scale-factor directory, with a DuckDB-equivalent oracle in
  * [[oracleSql]] where SQL can express it.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's "Analyze Schema" (SURVEY §3.1) on the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    Profiler.profileStats(Tables.load(spark, "/root/testdata/sf0.001", "events"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — profiling core (reference parity, SURVEY §2.4) —
    "profile_stats_events" -> ((s, d) =>
      Profiler.profileStats(Tables.load(s, d, "events"))),
    "profile_stats_lineitem" -> ((s, d) =>
      Profiler.profileStats(Tables.load(s, d, "lineitem"))),
    "profile_types_events" -> ((s, d) =>
      Profiler.typeHistogram(Tables.load(s, d, "events"))),
    "profile_topk_documents" -> ((s, d) =>
      Profiler.topK(Tables.load(s, d, "documents"))),
    "schema_flat_events" -> ((s, d) =>
      Profiler.flatSchema(Tables.load(s, d, "events"))),
    "profile_stats_embeddings" -> ((s, d) =>
      Profiler.profileStats(Tables.load(s, d, "embeddings"))),
    // — sampling / exploration (SURVEY §2.1 S2-S3, §2.2 P2-P3) —
    "newest_events" -> ((s, d) =>
      Sampling.newestN(Tables.load(s, d, "events"), "event_id", 20)
        .select(col("event_id"), Export.isoTimestamp(col("ts")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))),
    "sample_hash_orders" -> ((s, d) =>
      Sampling.hashSample(Tables.load(s, d, "orders"), "o_orderkey", 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy("o_orderkey")),
    "sanitize_documents" -> ((s, d) => {
      val doc = Tables.load(s, d, "documents")
      doc.select(col("doc_id"),
        Sampling.sanitizeString(col("text"), "str").as("text_display"),
        Sampling.truncateCell(col("text")).as("text_cell"))
        .orderBy("doc_id")
    }),
    "convert_events" -> ((s, d) =>
      Export.convertForExport(Tables.load(s, d, "events"))
        .orderBy("event_id")),
    "list_collections" -> ((s, d) => Tables.listCollections(s, d)),
    // — relational surface (SURVEY §2.3/§2.5, free from Spark) —
    "q1_agg" -> Relational.q1 _,
    "q3_join_topk" -> Relational.q3 _,
    "q5_join" -> Relational.q5 _,
    "q6_filter_agg" -> Relational.q6 _,
    "window_running" -> Relational.windowRunning _,
    "semi_anti_join" -> Relational.semiAnti _,
    "event_rollup" -> Relational.eventRollup _,
  )

  // ---- oracle SQL ----------------------------------------------------

  private val M = "DECIMAL(12,2)"  // money/qty — matches Relational.dec
  private val R = "DECIMAL(4,2)"   // rates — matches Relational.rate
  private def sumD(e: String) = s"CAST(SUM($e) AS DOUBLE)"
  private val discPrice =
    s"CAST(l_extendedprice AS $M) * (CAST(1 AS $R) - CAST(l_discount AS $R))"

  /** Per-column profile-stats oracle rows for one table. Mirrors
    * Profiler.profileStats column-by-column: numeric min/max via an
    * explicit double cast, timestamps via microsecond strftime.
    */
  private def profileStatsOracle(table: String,
                                 cols: Seq[(String, String)]): String = {
    val selects = cols.map { case (c, kind) =>
      // ns-precision parquet timestamps are truncated to µs engine-side
      // (Tables.load); mirror that here so distinct counts line up.
      val e = if (kind == "ts") s"CAST($c AS TIMESTAMP)" else c
      val (num, ts) = kind match {
        case "num" => (s"MIN(CAST($c AS DOUBLE))" -> s"MAX(CAST($c AS DOUBLE))",
          "CAST(NULL AS VARCHAR)" -> "CAST(NULL AS VARCHAR)")
        case "ts" => ("CAST(NULL AS DOUBLE)" -> "CAST(NULL AS DOUBLE)",
          s"strftime(MIN($e), '%Y-%m-%d %H:%M:%S.%f')" ->
            s"strftime(MAX($e), '%Y-%m-%d %H:%M:%S.%f')")
        case _ => ("CAST(NULL AS DOUBLE)" -> "CAST(NULL AS DOUBLE)",
          "CAST(NULL AS VARCHAR)" -> "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT '$c' AS path, COUNT($e) AS n_present,
         | (COUNT(*) - COUNT($e)) * 100.0 / COUNT(*) AS missing_pct,
         | COUNT(DISTINCT $e) AS cardinality,
         | ${num._1} AS num_min, ${num._2} AS num_max,
         | ${ts._1} AS ts_min, ${ts._2} AS ts_max FROM $table""".stripMargin
    }
    selects.mkString("", " UNION ALL ", " ORDER BY path")
  }

  def oracleSql: Map[String, String] = Map(
    "profile_stats_events" -> profileStatsOracle("events", Seq(
      "event_id" -> "num", "ts" -> "ts", "user_id" -> "num",
      "event_type" -> "str", "value" -> "num", "props" -> "str")),
    "profile_stats_lineitem" -> profileStatsOracle("lineitem", Seq(
      "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
      "l_linenumber" -> "num", "l_quantity" -> "num",
      "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
      "l_returnflag" -> "str", "l_linestatus" -> "str",
      "l_shipdate" -> "ts")),
    "profile_types_events" -> ("""
      SELECT path, vtype, cnt FROM (
        SELECT 'event_id' AS path, 'int64' AS vtype, COUNT(event_id) AS cnt FROM events
        UNION ALL SELECT 'event_id', 'null', COUNT(*) - COUNT(event_id) FROM events
        UNION ALL SELECT 'ts', 'datetime', COUNT(ts) FROM events
        UNION ALL SELECT 'ts', 'null', COUNT(*) - COUNT(ts) FROM events
        UNION ALL SELECT 'user_id', 'int64', COUNT(user_id) FROM events
        UNION ALL SELECT 'user_id', 'null', COUNT(*) - COUNT(user_id) FROM events
        UNION ALL SELECT 'event_type', 'str', COUNT(event_type) FROM events
        UNION ALL SELECT 'event_type', 'null', COUNT(*) - COUNT(event_type) FROM events
        UNION ALL SELECT 'value', 'double', COUNT(value) FROM events
        UNION ALL SELECT 'value', 'null', COUNT(*) - COUNT(value) FROM events
        UNION ALL SELECT 'props', 'str', COUNT(props) FROM events
        UNION ALL SELECT 'props', 'null', COUNT(*) - COUNT(props) FROM events
      ) WHERE cnt > 0 ORDER BY path, vtype"""),
    "profile_topk_documents" -> ("""
      WITH flat AS (
        SELECT 'text' AS path, text AS vstr FROM documents WHERE text IS NOT NULL
        UNION ALL SELECT 'lang', lang FROM documents WHERE lang IS NOT NULL
        UNION ALL SELECT 'source', source FROM documents WHERE source IS NOT NULL
      ), counted AS (
        SELECT path, vstr, COUNT(*) AS cnt FROM flat
        WHERE LENGTH(vstr) < 256 GROUP BY path, vstr
      )
      SELECT path, vstr AS value, cnt, rank FROM (
        SELECT path, vstr, cnt,
               ROW_NUMBER() OVER (PARTITION BY path ORDER BY cnt DESC, vstr ASC) AS rank
        FROM counted)
      WHERE rank <= 5 ORDER BY path, rank"""),
    "profile_stats_embeddings" -> ("""
      SELECT 'embedding' AS path, COUNT(embedding) AS n_present,
             (COUNT(*) - COUNT(embedding)) * 100.0 / COUNT(*) AS missing_pct,
             COUNT(DISTINCT CAST(embedding AS VARCHAR)) AS cardinality,
             CAST(NULL AS DOUBLE) AS num_min, CAST(NULL AS DOUBLE) AS num_max,
             CAST(NULL AS VARCHAR) AS ts_min, CAST(NULL AS VARCHAR) AS ts_max
      FROM embeddings
      UNION ALL
      SELECT 'embedding[]', COUNT(x), CAST(NULL AS DOUBLE),
             COUNT(DISTINCT x),
             MIN(CAST(x AS DOUBLE)), MAX(CAST(x AS DOUBLE)),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM (SELECT UNNEST(embedding) AS x FROM embeddings)
      UNION ALL
      SELECT 'label', COUNT(label),
             (COUNT(*) - COUNT(label)) * 100.0 / COUNT(*),
             COUNT(DISTINCT label),
             MIN(CAST(label AS DOUBLE)), MAX(CAST(label AS DOUBLE)),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM embeddings
      UNION ALL
      SELECT 'vec_id', COUNT(vec_id),
             (COUNT(*) - COUNT(vec_id)) * 100.0 / COUNT(*),
             COUNT(DISTINCT vec_id),
             MIN(CAST(vec_id AS DOUBLE)), MAX(CAST(vec_id AS DOUBLE)),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM embeddings
      ORDER BY path"""),
    "newest_events" -> ("""
      SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') AS ts,
             user_id, event_type, value, props
      FROM events ORDER BY event_id DESC LIMIT 20"""),
    "sample_hash_orders" -> ("""
      SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '1999'
      ORDER BY o_orderkey"""),
    "sanitize_documents" -> ("""
      SELECT doc_id,
             CASE WHEN LENGTH(text) > 500
                  THEN 'str(too large to display inline)' ELSE text END
               AS text_display,
             CASE WHEN LENGTH(text) > 30
                  THEN substr(text, 1, 30) || '...' ELSE text END
               AS text_cell
      FROM documents ORDER BY doc_id"""),
    "convert_events" -> ("""
      SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') AS ts,
             user_id, event_type, value, props
      FROM events ORDER BY event_id"""),
    "list_collections" -> ("""
      SELECT * FROM (VALUES ('customer'), ('documents'), ('embeddings'),
        ('events'), ('lineitem'), ('nation'), ('orders'), ('part'),
        ('region'), ('supplier')) AS t(collection) ORDER BY collection"""),
    "schema_flat_events" -> ("""
      SELECT 'event_id' AS path, 'int64' AS type_tag
      UNION ALL SELECT 'event_type', 'str'
      UNION ALL SELECT 'props', 'str'
      UNION ALL SELECT 'ts', 'datetime'
      UNION ALL SELECT 'user_id', 'int64'
      UNION ALL SELECT 'value', 'double'
      ORDER BY path"""),
    "q1_agg" -> (s"""
      SELECT l_returnflag, l_linestatus,
        ${sumD(s"CAST(l_quantity AS $M)")} AS sum_qty,
        ${sumD(s"CAST(l_extendedprice AS $M)")} AS sum_base_price,
        ${sumD(discPrice)} AS sum_disc_price,
        ${sumD(s"$discPrice * (CAST(1 AS $R) + CAST(l_tax AS $R))")} AS sum_charge,
        ${sumD(s"CAST(l_quantity AS $M)")} / COUNT(*) AS avg_qty,
        ${sumD(s"CAST(l_extendedprice AS $M)")} / COUNT(*) AS avg_price,
        ${sumD(s"CAST(l_discount AS $R)")} / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    "q3_join_topk" -> (s"""
      SELECT l_orderkey, ${sumD(discPrice)} AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""),
    "q5_join" -> (s"""
      SELECT n_name, ${sumD(discPrice)} AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name ASC"""),
    "q6_filter_agg" -> (s"""
      SELECT ${sumD(s"CAST(l_extendedprice AS $M) * CAST(l_discount AS $R)")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
    "window_running" -> (s"""
      SELECT o_custkey,
             ROW_NUMBER() OVER w AS rn, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             CAST(SUM(CAST(o_totalprice AS $M)) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey ASC, rn ASC"""),
    "semi_anti_join" -> ("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE EXTRACT(year FROM o_orderdate) = 1995)
        AND c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE EXTRACT(year FROM o_orderdate) = 1996)
      ORDER BY c_custkey"""),
    "event_rollup" -> (s"""
      SELECT event_type,
             strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour,
             COUNT(*) AS n,
             ${sumD(s"CAST(value AS $M)")} AS sum_value,
             MIN(value) AS min_value, MAX(value) AS max_value,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
      ORDER BY event_type, hour"""),
  )
}
