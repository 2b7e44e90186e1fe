package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** randomProject: the engine's compiled-dot lanes must equal a naive
  * driver-side recompute of the Achlioptas ±1 projection, and the
  * sign derivation must match the documented md5 contract.
  */
class RandomProjectSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def sign(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8"))
    if ((d(0) & 0x80) == 0) 1L else -1L
  }

  test("lanes equal the naive integer recompute") {
    val dims = 8
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 1.0f, 0f, 2.5f, -1.5f, 0.125f, 3f)),
      (2L, Array.fill(8)(1.0f)),
      (3L, Array.fill(8)(0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, dims = dims, outDims = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((id, v) <- vecs; j <- 0 until 4) {
      val expect = (0 until dims).map(i =>
        sign(j, i) * math.floor(v(i).toDouble * 1e6 + 0.5).toLong).sum
      assert(out((id, j)) == expect, s"vec $id lane $j")
    }
  }

  test("signs are balanced-ish and deterministic (md5 top bit)") {
    val s0 = (0 until 64).map(i => sign(0, i))
    assert(s0.forall(v => v == 1L || v == -1L))
    // deterministic: same derivation twice
    assert(s0 == (0 until 64).map(i => sign(0, i)))
    // not degenerate: both signs appear in the first row
    assert(s0.toSet == Set(1L, -1L))
  }

  test("projection is a pure row-local plan: no shuffle before the " +
      "presentation sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exchanges = Similarity.randomProject(df)
      .queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
    assert(exchanges.size <= 1,
      s"expected only the final sort exchange, got ${exchanges.size}")
  }
}
