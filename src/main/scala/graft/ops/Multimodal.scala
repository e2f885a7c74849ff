package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media payloads ride through the pipeline as
 * opaque `binary` columns with typed metadata extracted by a per-partition
 * decode pass. The Spark-side mechanics — schema, partition-parallel decode,
 * typed Dataset boundary — are real; only the codec call itself is a
 * deterministic stub (image/audio libraries are not in this container).
 * On a real cluster `decodeStub` is the only line that changes.
 */
object Multimodal {

  /** A media record as stored: id, declared format, opaque payload. */
  case class MmRecord(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Typed metadata produced by the decode pass. */
  case class MmMeta(doc_id: Long, fmt: String, size_bytes: Long,
                    width: Long, height: Long, duration_ms: Long)

  /**
   * STUB codec: deterministic fake dimensions derived from payload size and
   * id — stands in for an image/audio decode. Deliberately pure so the SQL
   * oracle can replicate it.
   */
  def decodeStub(r: MmRecord): MmMeta = {
    val size = r.payload.length.toLong
    r.fmt match {
      case "wav" => MmMeta(r.doc_id, r.fmt, size, 0L, 0L, size * 1000L / 16L)
      case _     => MmMeta(r.doc_id, r.fmt, size, size % 640L, (r.doc_id * 7L) % 480L, 0L)
    }
  }

  /** Partition-parallel decode: binary in, typed metadata out. The decode
    * runs inside the executors via mapPartitions (the Scala analog of a
    * Pandas-UDF `mapInPandas` batch decode); no data visits the driver. */
  def extractMeta(records: Dataset[MmRecord]): Dataset[MmMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(decodeStub))
  }

  /** One sampled frame: byte window of the payload + content hash (the
    * stand-in for a decoded-frame feature vector). */
  case class MmFrame(doc_id: Long, fmt: String, frame_idx: Long,
                     off: Long, frame_len: Long, frame_md5: String)

  /**
   * Frame sampling (the video/audio analog of `extractMeta`): each media
   * payload yields `n` evenly-spaced frames — frame k covers bytes
   * [k·size/n, (k+1)·size/n) — whose feature is the md5 of the window
   * bytes. A real decoder would seek+decode at those offsets; the byte
   * windows and the per-frame feature hash stand in deterministically so
   * the SQL oracle can replicate the output exactly. Runs per-partition
   * in the executors (mapPartitions typed boundary, like extractMeta);
   * frames-per-record is constant, so output scales linearly and the
   * operator never shuffles.
   */
  def sampleFrames(records: Dataset[MmRecord], n: Int = 4): Dataset[MmFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val size = r.payload.length.toLong
        (0 until n).iterator.map { k =>
          val off = k * size / n
          val end = (k + 1) * size / n
          md.reset()
          md.update(r.payload, off.toInt, (end - off).toInt)
          val hex = md.digest().map("%02x".format(_)).mkString
          MmFrame(r.doc_id, r.fmt, k.toLong, off, end - off, hex)
        }
      }
    }
  }

  /** A resized payload: new blob + its provenance sizes and feature hash. */
  case class MmResized(doc_id: Long, fmt: String, orig_bytes: Long,
                       resized_bytes: Long, resized_md5: String)

  /**
   * Resize (downsample) the payload: keep every `factor`-th byte — the
   * deterministic stand-in for pixel/PCM downsampling (a real codec would
   * decode, scale, re-encode; the Spark shape is identical). The
   * payload-TRANSFORM class of multimodal op: binary in, smaller binary
   * out, map-only — at 100 TB this runs as one scan with zero shuffle and
   * cuts downstream bytes by `factor`. Emits the new feature hash so the
   * oracle pins the transformed CONTENT, not just its size.
   */
  def resize(records: Dataset[MmRecord], factor: Int = 4): Dataset[MmResized] = {
    // fail fast at the API boundary: factor=0 would divide by zero and a
    // negative factor would throw NegativeArraySizeException deep inside a
    // Spark task, surfacing as an opaque stage failure
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        md.reset()
        val hex = md.digest(out).map("%02x".format(_)).mkString
        MmResized(r.doc_id, r.fmt, r.payload.length.toLong,
          out.length.toLong, hex)
      }
    }
  }

  /** Build the media table from the documents corpus: payload = utf-8 bytes
    * of the text (a deterministic opaque blob), format assigned round-robin. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MmRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("jpg"), lit("png"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MmRecord]
  }
}
