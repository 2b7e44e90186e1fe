package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress reporting + cooperative cancellation for long-running
  * actions — the reference's extractor progress callback and stop flag
  * (`core/extractor.py:312-330`) re-expressed with Spark primitives:
  * a job group carries the cancellable unit, a `SparkListener` counts
  * finished tasks against the group's task total, and
  * `SparkContext.cancelJobGroup` is the stop signal (task threads are
  * interrupted, so a cancel takes effect mid-stage, not at the next
  * document boundary like the reference's per-doc flag check).
  *
  * Task counts are the natural Spark progress unit (the reference
  * counts documents; a columnar engine doesn't see documents go by).
  * Listener callbacks arrive on the listener-bus thread — `onUpdate`
  * must be cheap and thread-safe.
  */
object Progress {

  /** Handle for one progress-tracked run. */
  final class Handle private[Progress] (
      spark: SparkSession, val groupId: String,
      listener: GroupProgressListener) {
    /** (completed tasks, total tasks submitted so far). */
    def progress: (Long, Long) = (listener.done.get(), listener.total.get())
    /** Cancel every job in the group (interrupts running tasks). */
    def cancel(): Unit = spark.sparkContext.cancelJobGroup(groupId)
  }

  private[util] final class GroupProgressListener(
      groupId: String, onUpdate: (Long, Long) => Unit)
      extends SparkListener {
    val total = new AtomicLong(0)
    val done = new AtomicLong(0)
    private val stages =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

    // totals come from SUBMITTED stages, not jobStart.stageInfos: with
    // AQE a later job lists earlier (already-computed) stages that are
    // then skipped — counting those would leave progress stuck short
    // of total forever
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
      val g = Option(s.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      if (g.contains(groupId) && stages.add(s.stageInfo.stageId)) {
        total.addAndGet(s.stageInfo.numTasks.toLong)
        onUpdate(done.get(), total.get())
      }
    }

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (stages.contains(t.stageId)) {
        onUpdate(done.incrementAndGet(), total.get())
      }
  }

  /** Run `action` inside a cancellable job group with task-level
    * progress callbacks. The listener is registered for the duration of
    * the action only; the job group is cleared afterwards.
    *
    * @param onUpdate (completedTasks, totalTasks) — called on job
    *                 submission and every task completion.
    */
  def withProgress[T](spark: SparkSession, groupId: String,
                      description: String = "")
                     (action: => T)
                     (onUpdate: (Long, Long) => Unit): T = {
    val sc = spark.sparkContext
    val listener = new GroupProgressListener(groupId, onUpdate)
    sc.addSparkListener(listener)
    sc.setJobGroup(groupId, description, interruptOnCancel = true)
    try action
    finally {
      sc.clearJobGroup()
      // the listener bus is async: give queued task-end events a
      // bounded window to drain so the final (done == total) update
      // lands before the listener detaches
      val deadline = System.nanoTime() + 2000000000L
      while (listener.done.get() < listener.total.get() &&
        System.nanoTime() < deadline) Thread.sleep(10)
      sc.removeSparkListener(listener)
    }
  }

  /** Start a run on a daemon thread and return a [[Handle]] plus the
    * eventual result/failure — the shape a UI layer (the reference's
    * worker + cancel button) consumes.
    */
  def startCancellable[T](spark: SparkSession, groupId: String,
                          description: String = "")
                         (action: => T)
      : (Handle, scala.concurrent.Future[T]) = {
    val listener = new GroupProgressListener(groupId, (_, _) => ())
    spark.sparkContext.addSparkListener(listener)
    val handle = new Handle(spark, groupId, listener)
    val p = scala.concurrent.Promise[T]()
    val t = new Thread(() => {
      val sc = spark.sparkContext
      sc.setJobGroup(groupId, description, interruptOnCancel = true)
      try p.success(action)
      catch { case e: Throwable => p.failure(e) }
      finally {
        sc.clearJobGroup()
        sc.removeSparkListener(listener)
      }
    }, s"graft-progress-$groupId")
    t.setDaemon(true)
    t.start()
    (handle, p.future)
  }
}
