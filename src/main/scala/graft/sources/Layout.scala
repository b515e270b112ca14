package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance layout operators.
  *
  * At 100 TB the killer is rarely total bytes — it's FILE COUNT. A
  * streaming ingest or a 1000-task write that lands millions of KB-sized
  * parquet files makes every later scan pay for listing, footer reads, and
  * task scheduling (one task per tiny split), and bloats the driver's
  * in-memory file index. Periodic compaction to a byte target is the
  * standard maintenance job (lakehouse `OPTIMIZE`); this is the
  * Spark-native form.
  */
object Layout {

  /** Total bytes and count of the data files under `dir` (ignores
    * `_SUCCESS`, checksums, and other dot/underscore bookkeeping files). */
  def dataFileStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, 0)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        bytes += f.getLen; n += 1
      }
    }
    (bytes, n)
  }

  /** Rewrite the parquet directory `inDir` into `ceil(bytes/targetBytes)`
    * files at `outDir` and return (filesBefore, filesAfter).
    *
    * `shuffle = false` (default) uses `coalesce`: each output task
    * concatenates whole input splits — no shuffle, so compacting 100 TB
    * moves nothing across the network. Output sizes then track the input
    * chunking; pass `shuffle = true` for a `repartition` that round-robins
    * rows into evenly sized files at full-shuffle cost (worth it only when
    * the input is badly skewed AND downstream cares about uniformity).
    *
    * The byte target is BEST-EFFORT on the coalesce path: `coalesce` can
    * only merge partitions, never split them, so if the scan yields fewer
    * partitions than `ceil(bytes/targetBytes)` (one giant file, or a
    * re-encode that compresses differently) the output lands in fewer,
    * larger files than requested — the returned measured counts say so
    * rather than failing silently. When the target must be honored, use
    * `shuffle = true`, or bound rows per file via
    * `spark.sql.files.maxRecordsPerFile` on the writer.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long,
      shuffle: Boolean = false): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (bytes, before) = dataFileStats(spark, inDir)
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    if (!shuffle && df.rdd.getNumPartitions < nOut)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"Layout.compact: scan yields ${df.rdd.getNumPartitions} " +
        s"partitions < target $nOut files; coalesce cannot split, so files " +
        s"will be larger than $targetBytes bytes (pass shuffle=true to honor it)")
    val out: DataFrame = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    out.write.mode("overwrite").parquet(outDir)
    val (_, after) = dataFileStats(spark, outDir)
    (before, after)
  }
}
