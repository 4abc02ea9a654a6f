package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (M6): media as opaque binary columns with
  * typed metadata, batched per-partition feature extraction.
  *
  * The Spark-side machinery is real — binary schema, partition-parallel
  * extraction via mapPartitions (the Scala analog of mapInPandas batch
  * processing), typed output schema — while the actual media decode is
  * STUBBED: this container has no image/audio codecs, so
  * [[FakeDecoder.decode]] derives deterministic pseudo-features from the
  * bytes. Swapping in a real decoder (JavaCV, TwelveMonkeys, ffmpeg
  * subprocess) changes only that one function; the distributed shape
  * (one decoder instance per partition, streaming iterator, no
  * whole-partition materialization) is what this module demonstrates.
  */
object Multimodal {

  /** Typed features extracted per media blob. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      brightness: Double)

  /** STUB decoder — deterministic pseudo-decode from raw bytes. A real
    * implementation would parse the container/codec here. Marked fake on
    * purpose; do not ship.
    */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = bytes.length
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      // pseudo dims/brightness derived from content so tests are stable
      val sum = {
        var s = 0L; var i = 0
        while (i < n) { s += (bytes(i) & 0xff); i += 1 }
        s
      }
      MediaFeatures(docId, n, fmt, 64 + (n % 577).toInt, 64 + ((n * 7) % 409).toInt,
        if (n == 0) 0.0 else sum.toDouble / n / 255.0)
    }
  }

  /** Attach an opaque binary media column (here synthesized from text —
    * the fixtures ship no real blobs; a production source reads bytes
    * from the lake).
    */
  def withMediaColumn(df: DataFrame, text: String): DataFrame =
    df.withColumn("media", to_binary(col(text), lit("utf-8")))

  /** Partition-parallel feature extraction over the binary column.
    * One decoder per partition, streaming — constant memory per task
    * regardless of partition row count.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame,
      id: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts etc.)
        it.map { case (docId, bytes) => FakeDecoder.decode(docId, bytes) }
      }
  }

  /** Scale-to-fit resize plan over extracted dimensions: the geometry
    * (aspect-preserving min-scale, floor to integer pixels) is the real
    * logic a resize kernel needs; only the pixel transform itself is
    * absent (stubbed decode). Pure column arithmetic — codegen'd,
    * no UDF.
    */
  def resizePlan(features: DataFrame, box: Int = 128): DataFrame = {
    val sc = least(lit(box.toDouble) / col("width"), lit(box.toDouble) / col("height"))
    features.select(col("doc_id"), col("width"), col("height"),
      floor(col("width") * sc).cast("int").as("new_w"),
      floor(col("height") * sc).cast("int").as("new_h"),
      round(sc, 6).as("scale"))
  }

  /** Audio resample + windowing plan over typed metadata (the audio
    * sibling of [[resizePlan]]): given per-clip sample rate and length,
    * compute the resampled length at `outRate` (ceil — resamplers emit
    * the trailing partial frame), the clip duration in ms, and how many
    * fixed `windowSamples` training windows the resampled clip yields.
    * The metadata is synthesized deterministically from the id (no
    * audio ships in this container — same honesty contract as
    * [[FakeDecoder]]); the plan arithmetic is the real kernel-feeding
    * logic and is pure codegen'd column math.
    */
  def audioResamplePlan(df: DataFrame, id: String, outRate: Int = 16000,
      windowSamples: Int = 4000): DataFrame = {
    val inRate = element_at(array(lit(8000), lit(16000), lit(22050), lit(44100)),
      (pmod(col(id), lit(4)) + 1).cast("int"))
    val nSamples = (pmod(col(id) * lit(2654435761L), lit(480000L)) + lit(8000L))
    df.select(col(id), inRate.as("in_rate"), nSamples.as("n_samples"))
      .withColumn("duration_ms",
        (col("n_samples") * lit(1000L)).cast("double") / col("in_rate"))
      .withColumn("out_samples",
        ceil(col("n_samples").cast("double") * outRate / col("in_rate")).cast("long"))
      .withColumn("n_windows",
        ceil(col("out_samples").cast("double") / windowSamples).cast("long"))
      .withColumn("duration_ms", round(col("duration_ms"), 4))
  }

  /** Frame sampling stub: treat the blob as fixed-size frames and keep
    * every `step`-th. The distributed shape is the real part — explode
    * the frame INDEX sequence first, then slice one frame per output
    * row; building an array of frame payloads and exploding that would
    * re-evaluate the slice per generated row and carry every frame on
    * every row (the PLANS.md Generate trap).
    */
  def sampleFrames(df: DataFrame, id: String, text: String,
      frameChars: Int = 256, step: Int = 3): DataFrame =
    df.select(col(id), col(text).as("__txt"))
      // empty/null blobs have zero frames: without this filter the upper
      // bound is ceil(0/f)-1 = -1 and sequence(0,-1,step) throws at
      // runtime (crawled corpora hit empty docs routinely); the oracle's
      // range(0, 0, step) likewise emits no rows
      .filter(length(col("__txt")) > 0)
      .select(col(id),
        explode(sequence(lit(0),
          (ceil(length(col("__txt")) / frameChars.toDouble) - 1).cast("int"),
          lit(step))).as("frame_idx"),
        col("__txt"))
      .select(col(id), col("frame_idx"),
        expr(s"substring(__txt, frame_idx * $frameChars + 1, $frameChars)").as("frame"))
}
