package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.store.GraphStore

/** `graft-changes` — a version-tailing Structured Streaming SOURCE
  * over a store's snapshot pointer (the D2 change feed as a stream):
  *
  * {{{
  * spark.readStream.format("graft-changes")
  *   .option("store", storeRoot).load()
  * }}}
  *
  * The OFFSET is the store's commit version, so each micro-batch is
  * exactly the commits flipped since the last trigger — one commit's
  * delta under a per-commit trigger — computed by
  * [[GraphStore.changesBetween]] from the manifest diff (only the
  * files that commit wrote are read; cost ∝ the commit's own rewrite
  * set). `recorded` (the commit version) is the feed's event-time
  * column. Replay is exact: versioned files are immutable until
  * vacuum() — the feed's retention horizon, like a Kafka topic's.
  *
  * The reference's change surface is `Changes()` polling
  * (/root/reference/layer.go:257-260, "operation not supported" —
  * the declared-but-stubbed read side); this source is its
  * continuous twin, and [[EventStreams.entitySync]] the write twin —
  * together a store-to-store replication pipeline with no polling
  * loop.
  */
class ChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-changes", GraphStore.nodeSchema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = parameters.get("store").orElse(parameters.get("path"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-changes needs .option(\"store\", <store root>)"))
    new ChangeFeedSource(sqlContext, root,
      parameters.get("startingversion").map(_.toLong).getOrElse(0L))
  }
}

class ChangeFeedSource(sqlContext: SQLContext, root: String,
    startingVersion: Long) extends Source {
  private val spark = sqlContext.sparkSession
  // a READER handle: pointer + manifest reads only, never a commit
  private val store = new GraphStore(root, spark)

  override def schema: StructType = GraphStore.nodeSchema

  override def getOffset: Option[Offset] = {
    val v = store.currentVersion
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(startingVersion)
    val hi = versionOf(end)
    val df = store.changesBetween(lo, hi)
    // getBatch must return an isStreaming frame — the same
    // internalCreateDataFrame call Spark's own V1 sources make
    org.apache.spark.sql.graft.StreamingFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.toRdd, df.schema)
  }

  override def stop(): Unit = ()
}
