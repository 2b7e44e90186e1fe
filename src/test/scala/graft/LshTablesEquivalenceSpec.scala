package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins the r19 compiled [[graft.functions.LshTables]] expression to
  * the original `array(struct(t, when(dot ≥ 0, 1<<j)…))` composition
  * it replaced ([[Similarity.lshTablesComposed]]): same buckets for
  * every vector INCLUDING the degenerate inputs whose old semantics
  * came from `when(null ≥ 0).otherwise(0)` collapses — null vector,
  * wrong length, null element, NaN element — plus sign-edge vectors
  * (all-zero dot ⇒ ≥ 0 ⇒ bit set).
  */
class LshTablesEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding",
      ArrayType(FloatType, containsNull = true), nullable = true)))

  private def df(rows: Seq[(Long, Seq[java.lang.Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, v) => Row(i, v) }, 2), schema)

  private def check(data: Seq[(Long, Seq[java.lang.Float])],
                    tables: Int, planes: Int, dim: Int): Unit = {
    val d = df(data)
    val neu = d.select(col("id"),
      Similarity.lshTables(col("embedding"), tables, planes, dim)
        .as("tbs"))
    val old = d.select(col("id"),
      Similarity.lshTablesComposed(col("embedding"), tables, planes, dim)
        .as("tbs"))
    assert(neu.schema === old.schema)
    assert(neu.exceptAll(old).count() === 0)
    assert(old.exceptAll(neu).count() === 0)
  }

  test("random vectors match the composition at 16x6 and 8x10") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 300L).map { i =>
      i -> Seq.fill(64)(java.lang.Float.valueOf(
        (rnd.nextFloat() * 2 - 1).toFloat))
    }
    check(data, tables = 16, planes = 6, dim = 64)
    check(data, tables = 8, planes = 10, dim = 64)
  }

  test("degenerate inputs collapse to zero buckets like the old nulls") {
    val f = (x: Double) => java.lang.Float.valueOf(x.toFloat)
    val data: Seq[(Long, Seq[java.lang.Float])] = Seq(
      1L -> null, // null vector
      2L -> Seq.fill(63)(f(0.5)), // wrong length (short)
      3L -> Seq.fill(65)(f(0.5)), // wrong length (long)
      4L -> (Seq.fill(30)(f(0.5)) ++ Seq(null: java.lang.Float) ++
        Seq.fill(33)(f(0.5))), // null element
      5L -> (Seq(f(Float.NaN)) ++ Seq.fill(63)(f(0.25))), // NaN
      6L -> Seq.fill(64)(f(0.0)), // zero vector: dot = 0 ⇒ every bit
      7L -> Seq.fill(64)(f(-0.0)), // negative zero: 0.0 ≥ 0 too
      8L -> Seq.fill(64)(f(1e38)), // large magnitudes
      9L -> Seq.fill(64)(f(-1e-38)))
    check(data, tables = 16, planes = 6, dim = 64)
  }

  test("corpus parity on the embeddings fixture") {
    val e = sources.Tables.load(spark, "/root/testdata/sf0.01",
      "embeddings")
    val neu = e.select(col("vec_id"),
      Similarity.lshTables(col("embedding"), 16, 6, 64).as("tbs"))
    val old = e.select(col("vec_id"),
      Similarity.lshTablesComposed(col("embedding"), 16, 6, 64)
        .as("tbs"))
    assert(neu.exceptAll(old).count() === 0)
    assert(old.exceptAll(neu).count() === 0)
  }
}
