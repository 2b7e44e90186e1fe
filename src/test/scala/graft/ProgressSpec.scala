package graft

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.Await
import scala.concurrent.duration._
import scala.util.Try

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Progress

/** Progress/cancellation surface (`core/extractor.py:312-330`
  * semantics): task-level progress callbacks and job-group cancel.
  */
class ProgressSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("withProgress: monotone task progress, completes at total") {
    val updates = ArrayBuffer.empty[(Long, Long)]
    val sum = Progress.withProgress(spark, "pg-spec-1", "sum range") {
      spark.range(0, 1000000, 1, 8).selectExpr("sum(id)")
        .collect()(0).getLong(0)
    } { (d, t) => updates.synchronized { updates += ((d, t)) } }
    assert(sum == 499999500000L)
    val snap = updates.synchronized(updates.toSeq)
    assert(snap.nonEmpty)
    assert(snap.map(_._1) == snap.map(_._1).sorted)   // monotone done
    assert(snap.forall { case (d, t) => d <= t })
    assert(snap.last._1 == snap.last._2)              // drained to total
  }

  test("startCancellable: cancelJobGroup aborts the running action") {
    val (h, fut) = Progress.startCancellable(spark, "pg-spec-2") {
      spark.range(0, 1L << 38, 1, 4).selectExpr("count(*)").collect()
    }
    val deadline = System.nanoTime() + 15000000000L
    while (h.progress._2 == 0 && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(h.progress._2 > 0, "job never started")
    h.cancel()
    val res = Try(Await.result(fut, 60.seconds))
    assert(res.isFailure, "cancelled job should fail, not complete")
  }
}
