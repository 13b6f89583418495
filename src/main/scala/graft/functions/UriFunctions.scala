package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URI local-name extraction, matching the reference's `stripPrefix`
  * exactly (/root/reference/neo4j.go:130-138): last segment after `#`
  * if present, else last segment after `/` if present, else identity.
  *
  * Composed from built-in codegen'd functions (no UDF): Spark's
  * `substring_index(s, sep, -1)` returns `s` unchanged when `sep` is
  * absent, so the `#`-first precedence needs an explicit branch.
  */
object UriFunctions {

  def stripPrefix(c: Column): Column =
    when(c.isNull, lit(null))
      .when(c.contains("#"), substring_index(c, "#", -1))
      .otherwise(substring_index(c, "/", -1))

  /** Pure-Scala twin for driver-side/unit use; the law
    * `stripPrefixScala(s) == stripPrefix(col)` is property-tested.
    */
  def stripPrefixScala(s: String): String =
    if (s == null) null
    else {
      val hash = s.lastIndexOf('#')
      if (hash >= 0) s.substring(hash + 1)
      else {
        val slash = s.lastIndexOf('/')
        if (slash >= 0) s.substring(slash + 1) else s
      }
    }
}
