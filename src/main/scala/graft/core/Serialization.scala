package graft.core

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** YAML pipeline save/load (reference `core/serialization.py:108-345`):
  * `load(save(p))` reproduces the same config identity (`configHash`). A
  * `metadata` provenance block is written but ignored on load, exactly like
  * the reference (`core/serialization.py:57-107`).
  */
object Serialization {

  private def mapper = new ObjectMapper(new YAMLFactory())

  private def stageMap(name: String, params: Map[String, String]): java.util.Map[String, Object] = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("name", name)
    val p = new java.util.LinkedHashMap[String, Object]()
    params.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    m.put("params", p)
    m
  }

  def save(p: Pipeline, path: String): Unit = {
    val root = new java.util.LinkedHashMap[String, Object]()
    val meta = new java.util.LinkedHashMap[String, Object]()
    meta.put("format_version", "1")
    meta.put("created_at", java.time.Instant.now().toString)
    root.put("metadata", meta)
    root.put("source", stageMap(p.source.name, p.source.params))
    root.put("filters", p.filters.map(f => stageMap(f.name, f.params)).asJava)
    p.sink.foreach(s => root.put("sink", stageMap(s.name, s.params)))
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    mapper.writerWithDefaultPrettyPrinter().writeValue(new java.io.File(path), root)
  }

  def load(path: String, registry: Registry): Pipeline = {
    val root = mapper.readValue(new java.io.File(path), classOf[java.util.Map[String, Object]])
    def stageOf(o: Object): (String, Map[String, String]) = {
      val m = o.asInstanceOf[java.util.Map[String, Object]]
      val params = Option(m.get("params"))
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
          .map { case (k, v) => k -> String.valueOf(v) }.toMap)
        .getOrElse(Map.empty[String, String])
      (String.valueOf(m.get("name")), params)
    }
    val (sn, sp) = stageOf(root.get("source"))
    val fs = Option(root.get("filters"))
      .map(_.asInstanceOf[java.util.List[Object]].asScala.toVector)
      .getOrElse(Vector.empty)
      .map { o => val (n, ps) = stageOf(o); registry.filter(n, ps) }
    val sink = Option(root.get("sink")).map { o =>
      val (n, ps) = stageOf(o); registry.sink(n, ps)
    }
    Pipeline(registry.source(sn, sp), fs, sink)
  }
}
