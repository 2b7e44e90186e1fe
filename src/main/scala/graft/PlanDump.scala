package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector (NOT part of the driver contract): prints
  * `explain("formatted")` for named declared queries so plan audits
  * (pushdown, pruning, exchange counts) are read from the real plans,
  * not argued from the DataFrame code. Usage:
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.001 q1_agg,cdc_chunks"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
