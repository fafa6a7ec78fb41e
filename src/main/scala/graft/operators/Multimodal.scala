package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched partition-local functions.
  *
  * The decode step itself is STUBBED with a deterministic fake (no
  * image/audio codecs exist in this container — clearly marked below);
  * everything around it — schema, binary payload handling, hash
  * bucketing for batch locality, the mapPartitions batch shape — is
  * the real 100 TB plumbing a production codec would drop into.
  */
object Multimodal {

  /** Wrap a text/bytes column as an opaque binary payload with typed
    * metadata: byte length, content hash, 256-byte chunk count.
    */
  def binarize(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      encode(col(srcCol), "UTF-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("content_hash", sha2(col("payload"), 256))
      .withColumn("n_chunks",
        ceil(col("n_bytes").cast("double") / lit(256.0)).cast("int"))

  /** Deterministic fake feature vector — STUB standing in for a real
    * decoder (e.g. image decode + CNN embedding). Derives `dim`
    * pseudo-features from the payload bytes so results are stable and
    * testable; replace the body of `fakeFeature` with the codec call
    * when one is available.
    */
  private def fakeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < bytes.length) {
      h = (h * 31) ^ (bytes(i) & 0xffL)
      i += 1
    }
    var d = 0
    while (d < dim) {
      val hd = h ^ (d.toLong * 0x9e3779b97f4a7c15L)
      out(d) = ((hd % 1000L).toFloat / 1000.0f)
      d += 1
    }
    out
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th one — the video/audio pre-processing shape
    * (sample frames before the expensive decode). Pure byte plumbing,
    * no codec needed, so unlike the decode stub this is fully real AND
    * oracle-checkable: output is (doc_id, frame_idx, frame_bytes,
    * frame_hash) for frames 0, stride, 2·stride, … A generator
    * expression (posexplode over substrings) keeps it codegen'd and
    * row-bounded — no driver involvement, no UDF.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int,
      stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    df.select(col("doc_id"), col("payload"), col("n_bytes"))
      .where(col("n_bytes") > 0) // sequence(0,-1) would count DOWN
      .selectExpr("doc_id",
        s"posexplode(transform(" +
          s"sequence(0, CAST(ceil(n_bytes / CAST($frameBytes AS DOUBLE)) " +
          s"AS INT) - 1), " +
          s"i -> substring(payload, i * $frameBytes + 1, $frameBytes))) " +
          "AS (frame_idx, frame_bytes)")
      .where(pmod(col("frame_idx"), lit(stride)) === 0)
      .withColumn("frame_hash", sha2(col("frame_bytes"), 256))
  }

  /** Batched partition-local "decode": repartition by content hash for
    * batch locality (so identical payloads co-locate and a real decoder
    * could cache), then process fixed-size batches inside each
    * partition — the exact shape a GPU/codec UDF wants. Returns
    * (doc_id, features).
    */
  def decodeFeatures(df: DataFrame, dim: Int = 8,
      batchSize: Int = 64, numBuckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] = df
      .repartition(numBuckets, col("content_hash"))
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real implementation would hand `batch` to the codec /
        // accelerator in one call; the stub maps it element-wise
        batch.map { case (id, bytes) => (id, fakeFeature(bytes, dim)) }
      }
    }.toDF("doc_id", "features")
  }
}
