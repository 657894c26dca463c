package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Per-STAGE decomposition of one query's execCpu/tasks — the
  * measurement the bench's per-query triple can't show: WHICH stage of
  * an iterative or multi-pass operator owns the cpu. Guide §1
  * (measure first) / §7.1 (stage view), headless: prints one line per
  * stage (tasks, execRun/execCpu ms, shuffle read/write bytes, rows)
  * plus the stage's callsite, sorted by cpu.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <query> [query ...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SHUFFLE,
  * SPARK_GRAFT_PROFILE_RUNS (default 2 — cold + 1 warm; stages are
  * reported for the LAST run only, so JIT/codegen warmup is excluded).
  */
object StageProfile {

  private final case class Agg(var tasks: Int = 0, var runMs: Long = 0L,
                               var cpuMs: Long = 0L, var srBytes: Long = 0L,
                               var swBytes: Long = 0L, var rows: Long = 0L)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      // mirrors the Bench session's r19 AQE conf (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED_REPARTITION", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val byStage = TrieMap.empty[Int, Agg]
    val names = TrieMap.empty[Int, String]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = byStage.getOrElseUpdate(e.stageId, Agg())
          a.synchronized {
            a.tasks += 1
            a.runMs += m.executorRunTime
            a.cpuMs += m.executorCpuTime / 1000000L
            a.srBytes += m.shuffleReadMetrics.totalBytesRead
            a.swBytes += m.shuffleWriteMetrics.bytesWritten
            a.rows += m.outputMetrics.recordsWritten +
              m.shuffleWriteMetrics.recordsWritten
          }
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        names.put(e.stageInfo.stageId,
          e.stageInfo.name.linesIterator.next().take(120))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    try graft.surv.ChurnView.dataset(spark, args(0))
    catch { case e: Throwable => System.err.println(s"[prof] setup: $e") }

    val nRuns = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    args.drop(1).foreach { q =>
      var r = 0
      while (r < nRuns) {
        graft.core.Pins.scoped {
          if (r == nRuns - 1) { // profile the warm run only
            org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
            byStage.clear(); names.clear()
          }
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(spark, args(0))
            .queryExecution.executedPlan.execute().count()
          val dt = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
          println(f"PROFILE $q run=$r wall=$dt%.2f")
        }
        r += 1
      }
      val rows = byStage.toSeq.sortBy(-_._2.cpuMs)
      val tot = rows.map(_._2.cpuMs).sum
      val totTasks = rows.map(_._2.tasks).sum
      println(s"PROFSUM $q stages=${rows.size} tasks=$totTasks cpuMs=$tot")
      rows.foreach { case (sid, a) =>
        println(f"PROFSTAGE $q sid=$sid tasks=${a.tasks}%4d " +
          f"cpuMs=${a.cpuMs}%6d runMs=${a.runMs}%6d " +
          f"srMB=${a.srBytes / 1e6}%.1f swMB=${a.swBytes / 1e6}%.1f " +
          f"rows=${a.rows}%8d  ${names.getOrElse(sid, "?")}")
      }
    }
    spark.stop()
  }
}
