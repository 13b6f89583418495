package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Versioned-snapshot property-graph store: the Spark analog of the
  * reference's single Bolt transaction per batch
  * (/root/reference/neo4j.go:238-284). Nodes and edges for version n+1
  * are written to a fresh directory, then a pointer file is atomically
  * flipped — readers pin whatever version the pointer named when they
  * loaded it, so a batch's deletes/upserts/stubs/edges become visible
  * together or not at all.
  *
  * Layout:
  * {{{
  *   <root>/v00000042/nodes/   parquet
  *   <root>/v00000042/edges/   parquet
  *   <root>/_current           "42\n<syncId>"   (atomically replaced)
  * }}}
  *
  * Idempotent replay: a commit carrying the `syncId` already recorded in
  * `_current` is skipped (the reference's SyncId idempotence key,
  * /root/reference/layer_test.go:83).
  *
  * Scale notes (100 TB): node files are written hash-distributed on
  * `gid` (`repartition(numBuckets, $"gid")` + per-file sort) so merge
  * joins against a batch co-locate; edges are laid out by `relType`,
  * mirroring the reference's per-relType statement grouping
  * (/root/reference/neo4j.go:274-279). On a real cluster the same
  * schemas would be `bucketBy(gid)` metastore tables; the snapshot
  * protocol is storage-format-agnostic.
  */
class GraphStore(val root: String, spark: SparkSession, numBuckets: Int = 8) {
  import GraphStore._

  private def rootPath: Path = Paths.get(root)
  private def pointer: Path = rootPath.resolve("_current")
  private def versionDir(v: Long): Path = rootPath.resolve(f"v$v%08d")

  Files.createDirectories(rootPath)

  /** (version, syncId) named by the pointer file; version 0 = empty store. */
  def current: (Long, String) =
    if (!Files.exists(pointer)) (0L, "")
    else {
      val lines = new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).split("\n", 2)
      (lines(0).trim.toLong, if (lines.length > 1) lines(1).trim else "")
    }

  def currentVersion: Long = current._1

  def nodes: DataFrame = table("nodes", nodeSchema)
  def edges: DataFrame = table("edges", edgeSchema)

  private def table(name: String, schema: StructType): DataFrame = {
    val v = currentVersion
    if (v == 0L) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema)
      .parquet(versionDir(v).resolve(name).toString)
      // partition discovery appends the partition column; restore the
      // canonical column order
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Drop snapshot directories older than `keep` versions behind the
    * current pointer. Readers pin the version they loaded, so retention
    * must cover the longest-running reader; the pointer flip itself
    * never blocks on GC. Returns the versions removed.
    */
  def vacuum(keep: Int = 2): Seq[Long] = synchronized {
    val (cur, _) = current
    val cutoff = cur - keep
    if (cutoff <= 0) return Seq.empty
    val removed = Seq.newBuilder[Long]
    val dirs = Option(rootPath.toFile.listFiles()).getOrElse(Array.empty)
    dirs.filter(f => f.isDirectory && f.getName.matches("v\\d{8}")).foreach {
      f =>
        val v = f.getName.drop(1).toLong
        if (v <= cutoff) {
          def delete(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(delete)
            x.delete()
          }
          delete(f)
          removed += v
        }
    }
    removed.result().sorted
  }

  /** Write both tables as version n+1 and atomically flip the pointer.
    * Returns the committed version, or the current one if `syncId`
    * replays the last commit.
    */
  def commit(newNodes: DataFrame, newEdges: DataFrame, syncId: String = ""): Long =
    synchronized {
      val (v, lastSync) = current
      if (syncId.nonEmpty && syncId == lastSync) return v
      val next = v + 1
      val dir = versionDir(next)
      // label/relType become directory partitions (pruned label scans —
      // the reference's per-label index, A13/A11 physical analog);
      // within a partition, files are gid/src-hash-distributed + sorted
      newNodes
        .repartition(numBuckets, newNodes("gid"))
        .sortWithinPartitions("gid")
        .write.mode("overwrite").partitionBy("label")
        .parquet(dir.resolve("nodes").toString)
      newEdges
        .repartition(numBuckets, newEdges("src"))
        .sortWithinPartitions("src")
        .write.mode("overwrite").partitionBy("relType")
        .parquet(dir.resolve("edges").toString)
      val tmp = rootPath.resolve(s"_current.tmp.$next")
      Files.write(tmp, s"$next\n$syncId".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      next
    }
}

object GraphStore {
  /** Node row: columns per /root/reference/neo4j.go:192-197 (gid, source,
    * stripped props) + neo4j.go:107 (label); `recorded` is the commit
    * version, powering the change feed (/root/reference/layer.go:257).
    */
  val pvType: StructType = StructType(Seq(
    StructField("s", StringType), StructField("l", LongType),
    StructField("d", DoubleType), StructField("b", BooleanType)))

  val nodeSchema: StructType = StructType(Seq(
    StructField("gid", StringType, nullable = false),
    StructField("label", StringType),
    StructField("source", StringType),
    StructField("props", MapType(StringType, pvType)),
    StructField("recorded", LongType)))

  /** Edge row per /root/reference/neo4j.go:215-220 (from/to/rel/source). */
  val edgeSchema: StructType = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("relType", StringType, nullable = false),
    StructField("source", StringType),
    StructField("recorded", LongType)))
}
