package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Thin helpers over jackson's tree model for hand-rolled spec JSON serde
  * (gives exact control over the Iceberg metadata.json field layout).
  */
object Json {
  val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)
  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()
  def write(n: JsonNode): String = mapper.writeValueAsString(n)

  /** A flat string→string map as a sorted-key JSON object string. */
  def objString(m: Map[String, String]): String = {
    val o = obj()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    write(o)
  }
  def writePretty(n: JsonNode): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)

  implicit final class NodeOps(private val n: JsonNode) extends AnyVal {
    def apply(field: String): JsonNode = {
      val c = n.get(field)
      require(c != null, s"missing required field '$field' in $n")
      c
    }
    def opt(field: String): Option[JsonNode] =
      Option(n.get(field)).filterNot(_.isNull)
    def elems: Seq[JsonNode] = n.elements().asScala.toSeq
    def fieldsMap: Map[String, JsonNode] =
      n.properties().asScala.map(e => e.getKey -> e.getValue).toMap
  }
}
