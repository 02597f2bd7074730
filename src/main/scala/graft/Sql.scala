package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point — the reference's interactive read path is plain SQL
  * over the final tables (`SELECT * FROM shop.users`,
  * `/root/reference/README.md:240`, served on ClickHouse's HTTP/MySQL
  * endpoints). Registering the store as temp views gives users the same
  * experience on Spark: any ANSI SQL over the table names.
  */
object Sql {

  /** Register every harness table as a temp view for `spark.sql`, plus
    * graft's native SQL functions (dot_product / cosine_sim). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    GraftExtensions.register(spark)
    Tables.all.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }
    // derived relation (see Tables.partsupp) — lets SQL express Q11/Q16/Q20
    Tables.partsupp(spark, dir).createOrReplaceTempView("partsupp")
  }

  /** Run SQL against the registered store. */
  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(sql)
  }
}
