package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises the driver's t1 path
  * (`SparkEntry.entry` on sf0.001) exactly as the driver would.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // round-robin repartition (Utils.spread) skips its defensive
      // pre-sort: a single-JVM local session cannot lose map outputs to
      // node failure, and the sort serializes on the one scan task of a
      // single-row-group file (on a real cluster spread() is a no-op)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(20, truncate = false)
    spark.stop()
  }
}
