package graft.stateful

import com.fasterxml.jackson.databind.ObjectMapper

/** Minimal flat-JSON-object reader for JVM-side state logic (Jackson ships
  * with Spark). Mirrors `from_json(payload, map<string,string>)`: scalar
  * values render as their text, nested values as compact JSON, JSON null as
  * Scala null. Invalid input → empty map.
  */
object JsonFlat {
  private val mapper = new ObjectMapper()

  def parse(json: String): Map[String, String] = {
    if (json == null) return Map.empty
    try {
      val node = mapper.readTree(json)
      if (node == null || !node.isObject) Map.empty
      else {
        val it = node.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue
          b += e.getKey -> (
            if (v.isNull) null
            else if (v.isValueNode) v.asText()
            else v.toString
          )
        }
        b.result()
      }
    } catch { case _: Exception => Map.empty }
  }
}
