package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure evidence runner (driver tooling, like [[Bench]]):
  * executes the heavy headline keys on a deliberately CONSTRAINED
  * session — heap via `SPARK_DRIVER_MEM` (build.sbt forwards it to
  * -Xmx), cores via `SPARK_GRAFT_CPUS` — and reports per key the wall
  * time, the max per-task peak execution memory, and the total
  * memory/disk bytes spilled, collected from task metrics by a
  * listener. The point is not speed but SHAPE: a plan that survives a
  * small heap by spilling (bounded partitions, external sort/agg) is
  * the plan that survives a 100 TB executor; a key that can only OOM
  * has a plan bug, not a heap problem.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=4g SPARK_GRAFT_CPUS=8 \
  *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 \
  *   sbt "runMain graft.MemPressure"
  * Optional SPARK_GRAFT_ONLY=q_a,q_b restricts the key set.
  * Prints one JSON line per key plus a closing summary line.
  */
object MemPressure {

  /** The top-8 heavy keys of the r12 artifact — the spill-relevant set. */
  private val DefaultKeys = Seq(
    "q_pipeline_shard", "q_dedup_components_star", "q_pca_power",
    "q_dedup_minhash", "q_dedup_ngram_jaccard", "q_decontaminate",
    "q_dedup_winnow", "q_text_repetition")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val keys = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq).getOrElse(DefaultKeys)
      .filter(SparkEntry.queries.contains)
    val spark = Relational.harnessSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val peakExec = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    val maxHeap = Runtime.getRuntime.maxMemory()
    val lines = keys.map { k =>
      memSpill.set(0); diskSpill.set(0); peakExec.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try { SparkEntry.queries(k)(spark, sfDir).count(); "ok" }
        catch {
          case e: OutOfMemoryError => s"OOM: ${e.getMessage}"
          case e: Throwable => s"${e.getClass.getSimpleName}"
        }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(300)
      val line =
        f"""{"key":"$k","wall_sec":$wall%.2f,"peak_exec_mb":${
          peakExec.get / 1048576},"mem_spill_mb":${
          memSpill.get / 1048576},"disk_spill_mb":${
          diskSpill.get / 1048576},"outcome":"$outcome"}"""
      println(line)
      line
    }
    spark.stop()
    println(s"""{"summary":"mem-pressure","sf_dir":"$sfDir","cpus":$cpus,""" +
      s""""max_heap_mb":${maxHeap / 1048576},"n_keys":${lines.size}}""")
  }
}
