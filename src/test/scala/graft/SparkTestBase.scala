package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (lazily created, never
  * stopped — the test JVM exit cleans it up).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // round-robin repartition (Utils.spread) skips its defensive
      // pre-sort: a single-JVM local session cannot lose map outputs to
      // node failure, and the sort serializes on the one scan task of a
      // single-row-group file (on a real cluster spread() is a no-op)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      // saveAsTable (bucketed-staging specs) must not litter the repo
      // with a ./spark-warehouse dir
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
