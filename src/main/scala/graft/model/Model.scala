package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.sources.Tables

/** Typed row models (SURVEY §1.2's three item families + the LLM tables) and
  * `Dataset[T]` loaders. Use the typed view where compile-time safety helps
  * (per-partition imperative logic, encoder round-trips into domain code);
  * stay on the untyped `DataFrame` column API for relational transforms —
  * closures hide predicates from Catalyst (no pushdown through a lambda).
  */
final case class Document(doc_id: Long, text: String, lang: String,
                          source: String, n_chars: Long)
final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double, props: String)
final case class MeshPoint(mesh_id: Long, point_id: Long,
                           x: Double, y: Double, z: Double)
final case class MeshCell(mesh_id: Long, cell_id: Long, vertices: Seq[Long])
final case class AtomicSystem(sys_id: Long, atomic_numbers: Seq[Int],
                              positions: Seq[Double], energy: Double)

object Model {
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }
}
