package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Diagnostic main: run a registered query N times under a task-level
  * listener and print, per run, the wall time and the top stages by
  * executor time with (tasks, records-in, records-out) — the companion
  * to [[PlanDump]] when a bench number is BIMODAL and the question is
  * "which stage lost its width / which exchange did AQE coalesce this
  * run". This is the probe that root-caused the q331 single-task pair
  * expansion (r13): a `1 task, out=10.9M` line is the scale-killer
  * signature. Usage: `sbt "runMain graft.StageProbe q331_adamic_adar 8"`. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1MB"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qnames =
      if (args.nonEmpty) args.toSeq else Seq("q331_adamic_adar")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "6").toInt
    // id -> (tasks, ms, recsIn, recsOut)
    val stages = mutable.Map[Int, (Int, Long, Long, Long)]()
    // jobs submitted during the run — the MANY-TINY-JOBS signature
    // (VERDICT r13: wall ≈ jobs × per-job scheduler latency for the
    // q155/k-fold class; on a real cluster ~100 ms × jobs)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    // per-job breakdown (VERDICT r14 #5: justify a jobs_hi count with
    // WHAT each job is): jobId -> (n stages, leaf stage name) — the
    // leaf stage's callsite names the action/exchange that submitted it
    val jobInfo = mutable.ArrayBuffer[(Int, Int, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val leaf = js.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.takeWhile(_ != '\n')).getOrElse("?")
        jobInfo.synchronized {
          jobInfo += ((js.jobId, js.stageInfos.size, leaf.take(70)))
        }
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        synchronized {
          val (t, ms, r, w) = stages.getOrElse(te.stageId, (0, 0L, 0L, 0L))
          val m = te.taskMetrics
          val dur = if (m != null) m.executorRunTime else 0L
          val rec = if (m != null)
            m.shuffleReadMetrics.recordsRead + m.inputMetrics.recordsRead
          else 0L
          val wrec = if (m != null) m.shuffleWriteMetrics.recordsWritten
          else 0L
          stages(te.stageId) = (t + 1, ms + dur, r + rec, w + wrec)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    for (qname <- qnames) {
      val fn = SparkEntry.queries(qname)
      for (i <- 1 to reps) {
        listener.synchronized(stages.clear())
        jobInfo.synchronized(jobInfo.clear())
        jobs.set(0)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        val top = listener.synchronized(stages.toVector)
          .sortBy(-_._2._2).take(8)
          .map { case (id, (t, ms, r, w)) =>
            f"stage$id: $t tasks ${ms}ms in=$r out=$w" }
          .mkString("\n    ")
        println(f"PROBE $qname run$i wall=$wall%.2f jobs=${jobs.get()}\n    $top")
        if (sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1")) {
          val jl = jobInfo.synchronized(jobInfo.toVector)
            .map { case (id, n, leaf) => s"job$id[$n stages] $leaf" }
            .mkString("\n    ")
          println(s"  JOBS $qname run$i\n    $jl")
        }
      }
    }
    spark.stop()
  }
}
