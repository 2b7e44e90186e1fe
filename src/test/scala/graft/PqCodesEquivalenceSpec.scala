package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 compiled [[graft.functions.PqCodes]] expression to the
  * `array_min(array(struct(sqDistTo(slice(u,…), c), cid)…))` argmin
  * composition it replaced in the PQ encode / Lloyd assign paths: same
  * codes for random vectors (dense AND sparse cids, wrap-around
  * magnitudes, exact ties) and for the degenerate inputs whose old
  * code fell out of null-first struct ordering (null vector, short
  * vector, null element ⇒ smallest cid present).
  */
class PqCodesEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("u", ArrayType(LongType, containsNull = true),
      nullable = true)))

  private def sqDistTo(u: Column, c: Array[Long]): Column =
    graft.functions.SqDistLong.sqDistLong(u, typedLit(c))

  /** The replaced composition, verbatim. */
  private def oldCodes(u: Column,
                       books: Array[Array[(Int, Array[Long])]],
                       sub: Int): Column =
    array(books.indices.map { j =>
      val s = slice(u, j * sub + 1, sub)
      array_min(array(books(j).map { case (cid, c) =>
        struct(sqDistTo(s, c).as("d"), lit(cid).as("cid"))
      }: _*)).getField("cid")
    }: _*)

  private def check(data: Seq[(Long, Seq[java.lang.Long])],
                    books: Array[Array[(Int, Array[Long])]],
                    sub: Int): Unit = {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(
        data.map { case (i, v) => Row(i, v) }, 2), schema)
    val neu = d.select(col("id"),
      graft.functions.PqCodes.pqCodes(col("u"), books, sub).as("c"))
    val old = d.select(col("id"), oldCodes(col("u"), books, sub).as("c"))
    val n = neu.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val o = old.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    data.foreach { case (i, _) =>
      assert(n(i) === o(i), s"row $i: new=${n(i)} old=${o(i)}")
    }
  }

  test("random vectors, dense books, m=4 sub=16 (the PQ shape)") {
    val rnd = new scala.util.Random(11)
    val books = Array.tabulate(4)(_ => Array.tabulate(16)(c =>
      (c, Array.fill(16)(rnd.nextLong() % 2000000L))))
    val data = (0L until 200L).map { i =>
      i -> Seq.fill(64)(java.lang.Long.valueOf(rnd.nextLong() % 2000000L))
    }
    check(data, books, sub = 16)
  }

  test("sparse cids (Lloyd-emptied clusters) and exact ties") {
    val twin = Array.fill(4)(7L)
    val books = Array(
      // cids 0,2,5 — gaps; entries 2 and 5 are identical, so a
      // tie must resolve to cid 2 (the smaller), as array_min did
      Array((0, Array(100L, 100L, 100L, 100L)),
        (2, twin.clone()), (5, twin.clone())),
      Array((1, Array(0L, 0L, 0L, 0L)), (3, Array(50L, 0L, 0L, 0L))))
    val l = (x: Long) => java.lang.Long.valueOf(x)
    val data: Seq[(Long, Seq[java.lang.Long])] = Seq(
      1L -> Seq(l(7), l(7), l(7), l(7), l(10), l(0), l(0), l(0)),
      2L -> Seq(l(100), l(100), l(100), l(100), l(50), l(0), l(0), l(0)))
    check(data, books, sub = 4)
  }

  test("degenerate inputs encode as the smallest cid present") {
    val books = Array(
      Array((1, Array(5L, 5L)), (4, Array(9L, 9L))),
      Array((0, Array(1L, 1L)), (2, Array(2L, 2L))))
    val l = (x: Long) => java.lang.Long.valueOf(x)
    val data: Seq[(Long, Seq[java.lang.Long])] = Seq(
      1L -> null, // null vector: both subspaces degenerate
      2L -> Seq(l(5), l(5), l(1)), // too short for subspace 1
      3L -> Seq(l(5), l(5), null, l(1)), // null element in subspace 1
      4L -> Seq(l(9), l(9), l(2), l(2))) // normal
    check(data, books, sub = 2)
  }

  test("wrap-around magnitudes match SqDistLong's long arithmetic") {
    val rnd = new scala.util.Random(13)
    val books = Array(Array.tabulate(4)(c =>
      (c, Array.fill(4)(rnd.nextLong()))))
    val data = (0L until 50L).map { i =>
      i -> Seq.fill(4)(java.lang.Long.valueOf(rnd.nextLong()))
    }
    check(data, books, sub = 4)
  }

  test("corpus parity on the embeddings fixture through the real books") {
    val e = sources.Tables.load(spark, "/root/testdata/sf0.01",
      "embeddings")
    val micro = e.select(col("vec_id"),
      transform(col("embedding"),
        v => floor(v.cast("double") * 1e6 + 0.5).cast(LongType)).as("u"))
    val books = graft.operators.Similarity.trainSubspaceBooks(
      micro, m = 4, sub = 16, codebookSize = 16, iters = 2)
    val neu = micro.select(col("vec_id"),
      graft.functions.PqCodes.pqCodes(col("u"), books, 16).as("c"))
    val old = micro.select(col("vec_id"),
      oldCodes(col("u"), books, 16).as("c"))
    assert(neu.exceptAll(old).count() === 0)
    assert(old.exceptAll(neu).count() === 0)
  }
}
