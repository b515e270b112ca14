package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus a partition-batched feature-extraction stage.
  *
  * The real decoders (JPEG/PNG, PCM, frame sampling) are NOT available in
  * this environment — `decodeStub` below is a clearly-marked deterministic
  * fake. Everything around it is the real Spark plumbing a 100 TB multimodal
  * pipeline needs:
  *
  *   - schema: payload as `BinaryType` + a typed `meta` struct (never decode
  *     at scan time; Parquet stores the blob column-chunked and the meta
  *     struct prunes independently);
  *   - extraction runs via `mapPartitions`-style iteration (here expressed
  *     as codegen-friendly expressions where possible, a UDF where not), so
  *     a real decoder would amortize model/codec init once per partition —
  *     the same batch shape `mapInPandas` gives Python pipelines;
  *   - features land as ordinary columns (bytes, content hash, a fixed-dim
  *     fake feature vector) so downstream dedup/KNN compose unchanged.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Deterministic media fixture derived from the documents table: the text
    * bytes stand in for an encoded payload; kind cycles image/audio/video.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))

  /** STUB — stands in for the real image/audio decode + featurize step,
    * which needs codec libraries absent from this container. Deterministic:
    * an 8-dim "feature vector" folded from the payload bytes. The signature
    * (binary → fixed-dim float array, batched per partition) is the real
    * contract a model-based featurizer would implement.
    */
  private val decodeStub = udf { (payload: Array[Byte], dim: Int) =>
    if (payload == null) Array.empty[Float]
    else {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }
  }

  /** Feature-extraction stage: content length/hash via codegen'd builtins,
    * fake decoded features via the stub UDF.
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 8): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("content_md5", md5(col("payload")))
      .withColumn("features", decodeStub(col("payload"), lit(featureDim)))
}
