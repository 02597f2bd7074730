package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    val plan = df.queryExecution.executedPlan.toString
    println("PLANSIZE chars=" + plan.length + " lines=" + plan.linesIterator.size)
    println(plan.linesIterator.take(80).map(_.take(200)).mkString("\n"))
    spark.stop()
  }
}
