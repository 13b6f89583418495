package org.apache.spark.sql.graft

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Driver-direct parquet writer for the store's TINY-WRITE commit path.
  *
  * An interactive commit on a manifest-tiny store writes a handful of
  * rows per table; routing that through a Spark write action costs a
  * full job per table — scheduler round-trip, task launch, and the
  * FileFormatWriter commit protocol — which measures 0.3-0.5 s per
  * table on an idle local[32] and IS the residual latency of the
  * reference's statement templates. This bridge writes the same bytes
  * from the driver thread: the frame's leaves are LocalRelations (the
  * caller's gate), so `executeCollect()` yields the rows without
  * scheduling anything, and each (partition, bucket) group lands as
  * one parquet file via Spark's own ParquetWriteSupport — identical
  * row encoding, column statistics (the dirty-bucket probes read gid
  * min/max footers), and Hive-escaped directory names the distributed
  * dynamic-partition writer produces. Rows are sorted by the cluster
  * column within each file, exactly like the job path's
  * sortWithinPartitions.
  *
  * Lives under org.apache.spark.sql to satisfy the `private[sql]`
  * qualifiers on ParquetWriteSupport / getPartitionPathString; adds no
  * other behavior.
  */
object TinyParquet {

  private class RowWriterBuilder(path: Path)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(
        conf: org.apache.hadoop.conf.Configuration)
        : WriteSupport[InternalRow] = new ParquetWriteSupport
  }

  /** Write `frame` (data columns + the two partition columns) under
    * `tableDir/seg=<seg>/<partCol>=<v>/bucket=<b>/`, one file per
    * (partition, bucket) group, rows sorted by `clusterCol`. The frame
    * must be driver-local (LocalRelation leaves) — executeCollect then
    * runs no job. Returns the number of files written.
    */
  def writeLocal(frame: DataFrame, tableDir: String, seg: Long,
      partCol: String, clusterCol: String): Int = {
    val spark = frame.sparkSession.asInstanceOf[SparkSession]
    val schema = frame.schema
    val partIdx = schema.fieldIndex(partCol)
    val bucketIdx = schema.fieldIndex("bucket")
    val clusterIdx = schema.fieldIndex(clusterCol)
    val dataFields = schema.fields.zipWithIndex.filter { case (f, i) =>
      i != partIdx && i != bucketIdx
    }
    val dataSchema = StructType(dataFields.map(_._1))
    val proj = UnsafeProjection.create(dataFields.map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    })
    val partType = schema.fields(partIdx).dataType
    val clusterType = schema.fields(clusterIdx).dataType
    val ord = TypeUtils.getInterpretedOrdering(clusterType)

    val rows = frame.queryExecution.executedPlan.executeCollect()
    // group rows by their target DIRECTORY ("" and null partition
    // values share the Hive default partition, matching the job path)
    val groups = rows.groupBy { r =>
      val pv = if (r.isNullAt(partIdx)) null
        else r.get(partIdx, partType).toString
      val b = r.getInt(bucketIdx)
      (ExternalCatalogUtils.getPartitionPathString(partCol, pv), b)
    }
    val hconf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(dataSchema, hconf)
    // ParquetWriteSupport.init asserts these are EXPLICIT in the conf
    // (the job path's ParquetFileFormat sets them the same way)
    val sqlConf = spark.sessionState.conf
    hconf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    hconf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    hconf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    hconf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(org.apache.spark.sql.internal.SQLConf
        .PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val codec = spark.sessionState.conf.parquetCompressionCodec match {
      case c if c.equalsIgnoreCase("none") ||
        c.equalsIgnoreCase("uncompressed") => CompressionCodecName.UNCOMPRESSED
      case c => CompressionCodecName.valueOf(c.toUpperCase)
    }
    groups.foreach { case ((partDir, bucket), rs) =>
      val dir = new java.io.File(
        s"$tableDir/seg=$seg/$partDir/bucket=$bucket")
      dir.mkdirs()
      val file = new Path(
        s"${dir.getPath}/part-00000-${UUID.randomUUID()}.c000.parquet")
      val sorted = rs.sortWith { (a, b) =>
        val (an, bn) = (a.isNullAt(clusterIdx), b.isNullAt(clusterIdx))
        if (an || bn) an && !bn // nulls first, like the job path's sort
        else ord.compare(a.get(clusterIdx, clusterType),
          b.get(clusterIdx, clusterType)) < 0
      }
      val writer = new RowWriterBuilder(file)
        .withConf(hconf)
        .withCompressionCodec(codec)
        .build()
      try sorted.foreach(r => writer.write(proj(r)))
      finally writer.close()
    }
    groups.size
  }
}
