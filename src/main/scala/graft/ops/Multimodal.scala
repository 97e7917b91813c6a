package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch feature-extraction operators.
  *
  * The DECODE STEP IS A STUB: real codecs (JPEG/PNG/ffmpeg) are not in this
  * environment, so `decodeHeader` parses a small deterministic fake header
  * (magic, width/height or sample-rate, payload) instead. Everything around
  * it — the schema, the `Dataset[T]` encoders, the mapPartitions batch
  * shape, the partition-preserving plumbing — is the real thing a cluster
  * deployment would keep, swapping only the decoder body.
  *
  * Scale shape: feature extraction is a per-partition map (no shuffle);
  * binary payloads never serialize to the driver; metadata-only queries
  * (`kind`, `meta.*`) prune the `bytes` column at the parquet scan.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, header_ok: Boolean)

  case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  private val Magic: Array[Byte] = "GFT0".getBytes("US-ASCII")

  /** Deterministic synthetic media table (fake header + pseudo-random
    * payload derived from the id) — the stand-in for a real binary-column
    * ingest. */
  def demoTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payloadLen = 64 + (id * 37 % 192).toInt
      val payload = Array.tabulate(payloadLen)(j =>
        (scala.util.hashing.MurmurHash3.productHash((id, j)) & 0xFF).toByte)
      val bytes = Magic ++ payload
      MediaRow(id, kind,
        bytes,
        width = if (kind == "image" || kind == "video") 16 + (id % 64).toInt * 4 else 0,
        height = if (kind == "image" || kind == "video") 16 + (id % 48).toInt * 4 else 0,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = if (kind != "image") 1000 + (id % 10).toInt * 500 else 0)
    }
  }

  /** STUB decoder: checks the fake magic header. A real deployment replaces
    * the body with an image/audio codec call; the signature and batch shape
    * stay identical. */
  private def decodeHeader(bytes: Array[Byte]): Boolean =
    bytes.length >= Magic.length && Magic.indices.forall(i => bytes(i) == Magic(i))

  /** Batch feature extraction: per-partition map over the binary column.
    * The loop shape (iterator-in → iterator-out, no materialization of the
    * whole partition) is what keeps memory flat on wide binary rows. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var sum = 0L
        var i = Magic.length
        while (i < r.bytes.length) { sum += (r.bytes(i) & 0xFF); i += 1 }
        val n = r.bytes.length - Magic.length
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          if (n > 0) sum.toDouble / n else 0.0,
          decodeHeader(r.bytes))
      }
    }
  }

  /** STUB frame sampler: emits every `stride`-th 16-byte slice of the
    * payload as a "frame" (a real build decodes actual frames; the
    * explode-shaped output schema and per-partition iteration carry over). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.bytes.drop(Magic.length)
        val nFrames = payload.length / 16
        (0 until nFrames by stride).iterator.map { f =>
          FrameSample(r.media_id, f, payload.slice(f * 16, f * 16 + 16))
        }
      }
    }
  }

  /** STUB resize: nearest-neighbor downsample of the payload treated as a
    * width×height byte raster (a real build calls an image library; the
    * per-partition batch shape, metadata update, and output schema are the
    * production plumbing). */
  def resize(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "image" || r.width <= 0 || r.height <= 0) r
        else {
          val payload = r.bytes.drop(Magic.length)
          val out = new Array[Byte](newW * newH)
          var y = 0
          while (y < newH) {
            var x = 0
            while (x < newW) {
              val sx = x * r.width / newW
              val sy = y * r.height / newH
              val src = (sy * r.width + sx) % math.max(payload.length, 1)
              out(y * newW + x) = if (payload.isEmpty) 0 else payload(src)
              x += 1
            }
            y += 1
          }
          r.copy(bytes = Magic ++ out, width = newW, height = newH)
        }
      }
    }
  }

  /** Metadata-only projection — demonstrates that `bytes` is pruned at the
    * scan when untouched (check `.explain` ReadSchema). */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("width") * col("height")).as("avg_pixels"),
        avg(col("duration_ms")).as("avg_duration_ms"))
}
