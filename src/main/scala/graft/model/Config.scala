package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Layer configuration model, mirroring the reference's config shape
  * and validations (/root/reference/layer.go:72-121,
  * /root/reference/testconfig/config.json). All four `system_config`
  * keys are mandatory (/root/reference/layer.go:80-102); only
  * `system_type == "neo4j"` is accepted there — here the accepted type
  * is "spark" (plus "neo4j" for config compatibility).
  */
final case class SystemConfig(
    systemType: String, endpoint: String, username: String, password: String)

final case class DatasetDefinition(name: String, label: String, batchSize: Int)

final case class LayerSettings(
    port: String, serviceName: String, configRefreshInterval: String) {

  /** `config_refresh_interval` as milliseconds — Go-style duration
    * subset (`500ms`, `60s`, `5m`, `1h`; the reference feeds the value
    * to time.ParseDuration, /root/reference/layer.go:72). None when
    * unparseable or non-positive: the caller then disables refresh.
    */
  def refreshMillis: Option[Long] = {
    val re = "^([0-9]+)(ms|s|m|h)$".r
    configRefreshInterval.trim match {
      case re(n, u) =>
        val scale = u match {
          case "ms" => 1L
          case "s" => 1000L
          case "m" => 60000L
          case "h" => 3600000L
        }
        Some(n.toLong * scale).filter(_ > 0)
      case _ => None
    }
  }
}

final case class LayerConfig(
    layer: LayerSettings,
    system: SystemConfig,
    datasets: Seq[DatasetDefinition]) {
  def dataset(name: String): Either[String, DatasetDefinition] =
    datasets.find(_.name == name)
      .toRight(s"dataset not found: $name") // layer.go:129-130
}

object LayerConfig {

  /** Parse + validate, failing on any missing mandatory key — the
    * analog of the reference's `cdl.Err(..., LayerErrorBadParameter)`
    * returns (/root/reference/layer.go:80-102, 145-163).
    */
  def fromJson(json: String): Either[String, LayerConfig] =
    try {
      val root = JsonMethods.parse(json)
      def str(v: JValue, key: String, ctx: String): Either[String, String] =
        v \ key match {
          case JString(s) => Right(s)
          case JInt(i)    => Right(i.toString)
          case JNothing | JNull => Left(s"missing $ctx.$key")
          case other      => Left(s"bad type for $ctx.$key: $other")
        }
      for {
        sys <- Right(root \ "system_config")
        st <- str(sys, "system_type", "system_config")
        _ <- if (st == "spark" || st == "neo4j") Right(())
             else Left(s"unsupported system_type: $st") // layer.go:63
        ep <- str(sys, "endpoint", "system_config")
        un <- str(sys, "username", "system_config")
        pw <- str(sys, "password", "system_config")
        lay = root \ "layer_config"
        port = str(lay, "port", "layer_config").getOrElse("8095")
        svc = str(lay, "service_name", "layer_config").getOrElse("graft")
        refresh = str(lay, "config_refresh_interval", "layer_config")
          .getOrElse("60s")
        dds <- root \ "dataset_definitions" match {
          case JArray(items) =>
            items.foldLeft[Either[String, List[DatasetDefinition]]](
              Right(Nil)) { (acc, item) =>
              for {
                list <- acc
                name <- str(item, "name", "dataset_definition")
                sc = item \ "source_config"
                label <- str(sc, "label", s"$name.source_config")
                bs = sc \ "batch_size" match {
                  case JInt(i)    => i.toInt
                  case JDouble(d) => d.toInt
                  case _          => 1000 // testconfig default
                }
              } yield list :+ DatasetDefinition(name, label, bs)
            }
          case JNothing => Right(Nil)
          case other    => Left(s"bad dataset_definitions: $other")
        }
      } yield LayerConfig(LayerSettings(port, svc, refresh),
        SystemConfig(st, ep, un, pw), dds)
    } catch {
      case e: Exception => Left(s"config parse error: ${e.getMessage}")
    }
}
