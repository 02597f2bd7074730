// args via -Dgraft.key / -Dgraft.dir / -Dgraft.runs
// r16 protocol = r15 (every measurement session carries its OWN
// calibration probes + verdict - the Bench noise-gate discipline
// applied to scale singles, SURVEY 6.1) PLUS the memory-bandwidth
// probe beside the ALU-bound LCG (r15 verdict task 4: the two drift
// independently and the heavy keys are memory-bound, so each line
// records both and the verdict that matters is whichever tracks the
// movers). Run via tools/probe/run_d3.sh, which passes the
// Relational.SessionDefaults confs so the probe JVM executes the same
// plans the harness sessions do.
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
val membwArray: Array[Long] = {
  val a = new Array[Long](32 * 1024 * 1024)
  var i = 0
  while (i < a.length) { a(i) = i.toLong * 2654435761L; i += 1 }
  a
}
def calibrateMembw(threads: Int): Long = {
  val a = membwArray
  val sink = new java.util.concurrent.atomic.AtomicLong()
  locally {
    var s = 0L; var i = 0
    while (i < 1000000) { s += a(i); i += 1 }
    sink.addAndGet(s)
  }
  val passes = math.max(1, 32 / math.max(threads, 1))
  val t0 = System.nanoTime()
  val ts = (0 until threads).map { _ =>
    val th = new Thread(() => {
      var s = 0L
      var p = 0
      while (p < passes) {
        var i = 0
        while (i < a.length) { s += a(i); i += 1 }
        p += 1
      }
      sink.addAndGet(s)
    })
    th.start(); th
  }
  ts.foreach(_.join())
  (System.nanoTime() - t0) / 1000000
}
def spreadOf(rs: Seq[Long]): Double =
  rs.max.toDouble / math.max(rs.min, 1L) - 1.0
def verdictOf(rs: Seq[Long]): String =
  if (spreadOf(rs) <= 0.15) "quiet"
  else if (spreadOf(rs.sorted.take(2)) <= 0.15) "noisy_probe_outlier"
  else "noisy"
calibrate(8) // untimed JIT warmup: the probe loop itself compiles
// during the first run in a fresh JVM and reads ~40% high otherwise
var calib = Seq(calibrate(32), calibrate(32))
if (spreadOf(calib) > 0.15) calib = calib :+ calibrate(32)
val verdict = verdictOf(calib)
var membw = Seq(calibrateMembw(32), calibrateMembw(32))
if (spreadOf(membw) > 0.15) membw = membw :+ calibrateMembw(32)
val membwVerdict = verdictOf(membw)
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
val membwAfter = calibrateMembw(32)
println("[d3] {\"key\":\"" + key + "\",\"dir\":\"" + dir +
  "\",\"min_sec\":" + f"${secs.min}%.2f" +
  ",\"calib_mt_ms_runs\":[" + calib.mkString(",") + "]" +
  ",\"calib_after_ms\":" + calibAfter +
  ",\"calib_verdict\":\"" + verdict + "\"" +
  ",\"calib_membw_ms_runs\":[" + membw.mkString(",") + "]" +
  ",\"calib_membw_after_ms\":" + membwAfter +
  ",\"calib_membw_verdict\":\"" + membwVerdict + "\"}")
System.exit(0)
