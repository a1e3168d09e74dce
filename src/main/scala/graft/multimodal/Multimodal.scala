package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; per-item decode/feature-extraction runs as partition-local
  * imperative code over the binary payloads.
  *
  * The Spark-side plumbing here — schema, partition-batched execution via
  * `mapPartitions` on a typed Dataset, feature schema — is real and
  * tested. The DECODE STEP IS A STUB: this container has no image/audio
  * codecs, so [[decodeStub]] derives deterministic fake "features" from
  * the raw bytes (byte histogram moments). Swapping in a real decoder
  * means replacing `decodeStub` only; nothing else changes.
  *
  * Scale notes: `mapPartitions` keeps the per-item native-decode cost off
  * the driver and amortizes any per-partition setup (codec init) across
  * the partition's rows — the Scala analog of a batched pandas UDF.
  * Payloads never shuffle: feature extraction is a narrow map, and
  * downstream joins carry only (id, features).
  */
object Multimodal {

  final case class MediaItem(
      media_id: Long,
      content: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      mean_byte: Double,
      byte_entropy: Double,
      features: Array[Float])

  /** Wrap the documents table as a media table: the text payload stands in
    * for an encoded image (`content` binary + fake dimensions from the
    * payload size). In production this is `spark.read.format("binaryFile")`
    * or a parquet of encoded frames.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      lit("fake/raw").as("format"),
      (length(col("text")) % 64 + 1).cast("int").as("width"),
      (length(col("text")) % 48 + 1).cast("int").as("height"))

  /** Real file-source wiring: read a directory of encoded media files
    * through Spark's `binaryFile` source — one row per file with the raw
    * bytes, never decoded on the driver. `media_id` is the path hash
    * (deterministic across runs); `format` is the lowercased extension;
    * dimensions are unknown before decode (-1, filled by the decoder).
    *
    * Scale notes: binaryFile splits per FILE (payloads are never chunked
    * mid-file), so partition count tracks file count; set
    * `spark.sql.files.maxPartitionBytes`/`openCostInBytes` so a partition
    * holds a sane batch of files, and prefer packing many small media
    * files into parquet (binary column) for the 100 TB case — this reader
    * is the ingestion edge that produces exactly that table.
    */
  def mediaFromBinaryFiles(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content"),
        lower(regexp_extract(col("path"), "\\.([^.]+)$", 1)).as("format"),
        lit(-1).as("width"),
        lit(-1).as("height"),
        col("path"),
        col("length"))
  }

  /** STUB decoder: deterministic fake features from raw bytes (first/second
    * moments of the byte histogram + an 8-bin normalized histogram as the
    * "embedding"). Replace with a real codec (JPEG decode, resample,
    * frame-sample) — the signature is the contract.
    */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val bytes = item.content
    val n = bytes.length.toLong
    val hist = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b) += 1
      sum += b
      i += 1
    }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    var entropy = 0.0
    if (n > 0) {
      var j = 0
      while (j < 256) {
        if (hist(j) > 0) {
          val p = hist(j).toDouble / n
          entropy -= p * math.log(p) / math.log(2)
        }
        j += 1
      }
    }
    val bins = new Array[Float](8)
    var k = 0
    while (k < 256) {
      bins(k / 32) += hist(k).toFloat
      k += 1
    }
    if (n > 0) { var m = 0; while (m < 8) { bins(m) /= n; m += 1 } }
    MediaFeatures(item.media_id, n, mean, entropy, bins)
  }

  /** Partition-batched feature extraction: one decoder pass per partition,
    * payloads pruned after the map.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content", "format", "width", "height")
      .as[MediaItem]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec init, model load)
        it.map(decodeStub)
      }
  }
}
