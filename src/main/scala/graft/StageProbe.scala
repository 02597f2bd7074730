package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-STAGE profiling runner (driver tooling, like [[Bench]] and
  * [[MemPressure]]): executes the named keys and prints, for every Spark
  * stage, the wall time, summed executor run/GC time, memory/disk spill,
  * shuffle read/write bytes, and input bytes — collected from
  * `StageInfo.taskMetrics` on stage completion. This is the instrument
  * for root-causing a super-linear wall-clock curve: a bend shows up
  * either as one stage whose time grows faster than its input (compute
  * regime shift: GC, spill, codegen fallback) or as stages multiplying
  * (re-computation), and the two signatures are distinguishable only
  * with per-stage numbers, not per-key totals.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf10 \
  *   SPARK_GRAFT_ONLY=q_dedup_minhash \
  *   sbt "runMain graft.StageProbe"
  * Optional SPARK_GRAFT_RUNS repeats each key (stages report per run).
  * Prints one JSON line per stage plus a per-key total line.
  */
object StageProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // scale-protocol partition sizing (SURVEY §6.1): shuffle partitions
    // sized to the corpus independently of the thread count
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "1").toInt
    val keys = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_dedup_minhash")
      .split(",").toSeq.filter(SparkEntry.queries.contains)
    val spark = Relational.harnessSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, wallMs: Long, runMs: Long, gcMs: Long,
                  memSpill: Long, diskSpill: Long, shRead: Long,
                  shWrite: Long, input: Long, tasks: Int)
    val stages = mutable.ArrayBuffer.empty[St]
    val current = new java.util.concurrent.atomic.AtomicReference("?")
    val currentRun = new java.util.concurrent.atomic.AtomicInteger(-1)
    def line(k: String, r: Int, s: St): String =
      f"""{"key":"$k","run":$r,"stage":"${s.name}","wall_ms":${
        s.wallMs},"run_ms":${s.runMs},"gc_ms":${s.gcMs},"mem_spill_mb":${
        s.memSpill / 1048576},"disk_spill_mb":${s.diskSpill / 1048576
        },"sh_read_mb":${s.shRead / 1048576},"sh_write_mb":${
        s.shWrite / 1048576},"input_mb":${s.input / 1048576},"tasks":${
        s.tasks}}"""
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
                    yield c - s).getOrElse(-1L)
        val st = St(si.name.takeWhile(_ != '\n'), wall,
          m.executorRunTime, m.jvmGCTime, m.memoryBytesSpilled,
          m.diskBytesSpilled, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, si.numTasks)
        stages.synchronized(stages += st)
        // INCREMENTAL print: a key that dies mid-run (OOM, disk-full)
        // still leaves every completed stage's metrics on stdout — the
        // fatal stage is then the one stage MISSING from the log while
        // the run's last scheduler lines name it. The run index rides
        // along so SPARK_GRAFT_RUNS > 1 output attributes each stage
        // line to its run (a stage completing in the drain gap between
        // runs is attributed to the just-finished run by construction:
        // currentRun advances only after the post-run listener sleep).
        println(line(current.get, currentRun.get, st))
      }
    })

    for (k <- keys; r <- 1 to runs) {
      stages.synchronized(stages.clear())
      current.set(k)
      currentRun.set(r)
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(k)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener events drain asynchronously
        val snap = stages.synchronized(stages.toVector)
        println(f"""{"key":"$k","run":$r,"TOTAL_sec":$wall%.2f,"rows":$n,""" +
          s""""n_stages":${snap.size},"sum_stage_wall_ms":${
            snap.map(_.wallMs).sum},"sum_gc_ms":${snap.map(_.gcMs).sum}}""")
      } catch {
        case e: Throwable =>
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"""{"key":"$k","run":$r,"FAILED_sec":$wall%.2f,""" +
            s""""error":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}
