package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction + range layout — the table-maintenance
  * operator every long-running 100 TB pipeline needs: streaming sinks
  * and over-parallel writes leave thousands of KB-sized files whose
  * per-file open/footer cost dominates scans, and unordered layout
  * defeats min/max data skipping.
  *
  * Strategy: size the output from the INPUT's actual bytes
  * (`ceil(totalBytes / targetFileBytes)` files), then
  * `repartitionByRange` on the caller's sort keys and sort within
  * partitions — one range shuffle total. Range partitioning makes the
  * per-file key intervals disjoint, so a reader's key predicate prunes
  * whole files via parquet min/max stats (verified by the spec reading
  * each output file's own min/max); `maxRecordsPerFile` is a safety
  * cap against estimate drift, not the primary sizing mechanism.
  */
object Compaction {

  case class Stats(inputFiles: Int, inputBytes: Long, outputFiles: Int,
      rows: Long)

  /** Compact `inDir` (parquet) into `outDir` with ~`targetFileBytes`
    * files range-laid-out on `sortKeys`. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, sortKeys: Seq[String],
      maxRecordsPerFile: Long = 0L): Stats = {
    require(sortKeys.nonEmpty, "sortKeys must not be empty")
    val df = spark.read.parquet(inDir)
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = df.inputFiles
    // one recursive listing RPC, not one getFileStatus per file — at
    // the 10k-small-files inputs this operator targets, per-file
    // round-trips on the driver would dominate the whole job
    val totalBytes = fs.getContentSummary(new Path(inDir)).getLength
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    import org.apache.spark.sql.functions.col
    val keys = sortKeys.map(col)
    val writer = df
      .repartitionByRange(nOut, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .parquet(outDir)
    val out = spark.read.parquet(outDir)
    Stats(files.length, totalBytes, out.inputFiles.length, out.count())
  }

  /** Per-output-file (min, max) of `key` — the data-skipping audit the
    * spec uses: disjoint intervals mean a point/range predicate prunes
    * to one file. */
  def keyRanges(spark: SparkSession, dir: String, key: String): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.{col, max, min}
    spark.read.parquet(dir).inputFiles.toSeq.map { f =>
      val r = spark.read.parquet(f).agg(min(col(key)), max(col(key))).head()
      (r.getLong(0), r.getLong(1))
    }
  }
}
