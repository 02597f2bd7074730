package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed models (SURVEY.md §1.2: typed `Dataset[T]` case classes for the
  * core tables where compile-time safety helps; `DataFrame` elsewhere).
  * The CDC shapes mirror FIXTURES.md §A (the reference's users schema,
  * `/root/reference/README.md:96-102` source / `:166-175` sink).
  */
object Models {

  /** Reference CDC source shape — epoch-micro longs on the wire. */
  case class UserChange(user_id: Long, username: Option[String],
                        account_type: Option[String], updated_at: Long,
                        kafka_offset: Long)

  /** Reference final-table shape (second-precision timestamps, UTC). */
  case class UserFinal(user_id: Long, username: String, account_type: String,
                       updated_at: Timestamp, created_at: Timestamp,
                       kafka_time: Option[Timestamp], kafka_offset: Long)

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables(spark, dir, "events").as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables(spark, dir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables(spark, dir, "embeddings").as[Embedding]
  }
}
