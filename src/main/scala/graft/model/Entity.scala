package graft.model

/** Tagged property value — the engine's portable representation of the
  * reference's schemaless `interface{}` property values
  * (/root/reference/neo4j.go:195-197). Exactly one of the four slots is
  * set; encodes to a flat nullable struct, so it stays codegen-friendly
  * and round-trips string/long/double/bool through EGDM JSON
  * (observed types in /root/reference/layer_test.go:440-441).
  *
  * Chosen over Spark 4 VariantType for the typed API edge: a 4-slot
  * struct is Encoder-derivable and filterable with plain column ops.
  */
case class PV(
    s: Option[String] = None,
    l: Option[Long] = None,
    d: Option[Double] = None,
    b: Option[Boolean] = None,
    a: Option[Seq[String]] = None,
    // per-element TYPE TAGS for the list slot — one char per element
    // (s/l/d/b, n for null), so EGDM round-trips re-emit typed JSON
    // ([1, true] stays [1, true], not ["1", "true"]). None = legacy
    // all-string list.
    at: Option[String] = None
) {
  def value: Any = s.orElse(l).orElse(d).orElse(b).orElse(a).orNull
}

object PV {
  def of(v: Any): PV = v match {
    case null       => PV()
    case x: String  => PV(s = Some(x))
    case x: Int     => PV(l = Some(x.toLong))
    case x: Long    => PV(l = Some(x))
    case x: Short   => PV(l = Some(x.toLong))
    case x: Byte    => PV(l = Some(x.toLong))
    case x: Double  => PV(d = Some(x))
    case x: Float   => PV(d = Some(x.toDouble))
    case x: Boolean => PV(b = Some(x))
    case x: BigInt  => PV(l = Some(x.toLong))
    // list-valued properties: elements store as canonical strings
    // (the same rendering the scalar slots cast to) + a type tag per
    // element so the original scalar types survive the round-trip
    case xs: Seq[_]   => PV(a = Some(xs.map(canon)),
      at = Some(xs.map(tagOf).mkString))
    case xs: Array[_] => PV(a = Some(xs.toSeq.map(canon)),
      at = Some(xs.toSeq.map(tagOf).mkString))
    case other =>
      throw new IllegalArgumentException(
        s"unsupported property value type: ${other.getClass}")
  }

  /** canonical string rendering of a list element — matches the
    * scalar slots' `cast("string")` output
    */
  private def canon(v: Any): String = v match {
    case null => null
    case x: String => x
    case x: Float => x.toDouble.toString
    case other => other.toString
  }

  /** the type-tag char of a list element (see [[PV.at]]) */
  def tagOf(v: Any): Char = v match {
    case null => 'n'
    case _: Int | _: Long | _: Short | _: Byte | _: BigInt => 'l'
    case _: Double | _: Float => 'd'
    case _: Boolean => 'b'
    case _ => 's'
  }
}

/** EGDM entity — URI-identified record with a properties map and a
  * references map (/root/reference/layer_test.go:437-443,
  * /root/reference/neo4j.go:186-232). `refs` values are normalized to
  * Seq[String] at construction, mirroring the reference's
  * string|[]string coercion (/root/reference/neo4j.go:199-208).
  */
case class Entity(
    id: String,
    deleted: Boolean = false,
    props: Map[String, PV] = Map.empty,
    refs: Map[String, Seq[String]] = Map.empty
) {
  def withProp(uri: String, v: Any): Entity =
    copy(props = props + (uri -> PV.of(v)))
  def withRef(uri: String, target: String): Entity =
    copy(refs = refs + (uri -> (refs.getOrElse(uri, Seq.empty) :+ target)))
  def withRefs(uri: String, targets: Seq[String]): Entity =
    copy(refs = refs + (uri -> targets))
}

object Entity {
  def apply(id: String): Entity = new Entity(id)
}
