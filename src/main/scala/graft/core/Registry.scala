package graft.core

import scala.collection.concurrent.TrieMap

/** Stage registry (reference `core/registry.py:26-257`): factories keyed by
  * name so serialized pipelines can be reconstructed. Thread-safe; last
  * registration wins (parity with the reference's overwrite-with-warning).
  */
final class Registry {
  private val sources = TrieMap.empty[String, Map[String, String] => PSource]
  private val filters = TrieMap.empty[String, Map[String, String] => PFilter]
  private val sinks = TrieMap.empty[String, Map[String, String] => PSink]

  def registerSource(name: String)(f: Map[String, String] => PSource): Unit =
    sources.put(name, f)
  def registerFilter(name: String)(f: Map[String, String] => PFilter): Unit =
    filters.put(name, f)
  def registerSink(name: String)(f: Map[String, String] => PSink): Unit =
    sinks.put(name, f)

  def source(name: String, params: Map[String, String]): PSource =
    sources.getOrElse(name, throw new NoSuchElementException(s"source '$name' not registered"))(params)
  def filter(name: String, params: Map[String, String]): PFilter =
    filters.getOrElse(name, throw new NoSuchElementException(s"filter '$name' not registered"))(params)
  def sink(name: String, params: Map[String, String]): PSink =
    sinks.getOrElse(name, throw new NoSuchElementException(s"sink '$name' not registered"))(params)

  def sourceNames: Seq[String] = sources.keys.toSeq.sorted
  def filterNames: Seq[String] = filters.keys.toSeq.sorted
  def sinkNames: Seq[String] = sinks.keys.toSeq.sorted
}
