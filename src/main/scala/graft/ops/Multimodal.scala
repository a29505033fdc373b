package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded via per-partition batch
  * processing.
  *
  * The actual codec libraries are not available in this environment, so
  * the decode step is STUBBED by [[StubDecoder]] — a deterministic fake
  * that derives plausible metadata from the md5 of the payload (and is
  * therefore reproducible by the SQL oracle). The Spark-side plumbing is
  * real: binary schema, per-partition batching via `mapPartitions`, typed
  * output Dataset. A real decoder drops in behind [[MediaDecoder]].
  */
object Multimodal {

  /** Decoded media metadata (what a real image/audio probe would yield). */
  final case class MediaMeta(key: Long, n_bytes: Long, width: Int, height: Int, format: String)

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, String)
  }

  /** Deterministic fake decoder: metadata derived from md5(payload).
    * Matches the SQL-expressible formula
    * `h = int(md5hex[0:15], 16); width = h % 624 + 16;
    *  height = (h / 624) % 464 + 16; format = ["png","jpeg","webp"][h % 3]`.
    */
  object StubDecoder extends MediaDecoder {
    private val formats = Array("png", "jpeg", "webp")
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      ((h % 624 + 16).toInt, ((h / 624) % 464 + 16).toInt, formats((h % 3).toInt))
    }
  }

  /** Extract typed metadata from a binary media column. Runs the decoder
    * per partition over an iterator (constant memory — no per-row task
    * overhead, no collect), returning a typed Dataset. This is the shape
    * a real decode / feature-extract / resize pass takes at scale.
    */
  def extractMeta(df: DataFrame, keyCol: String, binCol: String,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, bytes) =>
          val (w, h, f) = decoder.decode(bytes)
          MediaMeta(k, bytes.length.toLong, w, h, f)
        }
      }
  }

  /** Frame-sampling stub for video payloads: pick `n` deterministic
    * offsets (evenly spaced by payload length). Returns (key, frame_idx,
    * byte_offset) — the partition/batch shape of a real frame sampler.
    */
  def sampleFrameOffsets(df: DataFrame, keyCol: String, binCol: String, n: Int): DataFrame =
    df.select(col(keyCol).cast("long").as("key"),
        octet_length(col(binCol).cast("binary")).cast("long").as("_len"))
      .select(col("key"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => i.cast("long") * col("_len") / n)))
      .select(col("key"), col("pos").cast("int").as("frame_idx"),
        col("col").cast("long").as("byte_offset"))
}
