// args via -Dgraft.key / -Dgraft.dir / -Dgraft.runs
// r15 protocol: every measurement session carries its OWN calibration
// probes + verdict (the Bench noise-gate discipline applied to scale
// singles -- SURVEY 6.1 / r14 verdict task 4)
val key = sys.props("graft.key"); val dir = sys.props("graft.dir")
val runs = sys.props("graft.runs").toInt
def calibrate(threads: Int): Long = {
  val sink = new java.util.concurrent.atomic.AtomicLong()
  val t0 = System.nanoTime()
  val ts = (0 until threads).map { t =>
    val th = new Thread(() => {
      var h = 1125899906842597L + t
      var i = 0
      while (i < 200000000) {
        h = h * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      sink.addAndGet(h)
    })
    th.start(); th
  }
  ts.foreach(_.join())
  (System.nanoTime() - t0) / 1000000
}
def spreadOf(rs: Seq[Long]): Double =
  rs.max.toDouble / math.max(rs.min, 1L) - 1.0
calibrate(8) // untimed JIT warmup: the probe loop itself compiles
// during the first run in a fresh JVM and reads ~40% high otherwise
var calib = Seq(calibrate(32), calibrate(32))
if (spreadOf(calib) > 0.15) calib = calib :+ calibrate(32)
val verdict =
  if (spreadOf(calib) <= 0.15) "quiet"
  else if (spreadOf(calib.sorted.take(2)) <= 0.15) "noisy_probe_outlier"
  else "noisy"
val fn = graft.SparkEntry.queries(key)
val secs = (1 to runs).map { i =>
  val t0 = System.nanoTime()
  val n = fn(spark, dir).count()
  val sec = (System.nanoTime() - t0) / 1e9
  println("[d3] {\"key\":\"" + key + "\",\"dir\":\"" + dir +
    "\",\"run\":" + i + ",\"sec\":" + f"$sec%.2f" + ",\"rows\":" + n + "}")
  sec
}
val calibAfter = calibrate(32)
println("[d3] {\"key\":\"" + key + "\",\"dir\":\"" + dir +
  "\",\"min_sec\":" + f"${secs.min}%.2f" +
  ",\"calib_mt_ms_runs\":[" + calib.mkString(",") + "]" +
  ",\"calib_after_ms\":" + calibAfter +
  ",\"calib_verdict\":\"" + verdict + "\"}")
System.exit(0)
