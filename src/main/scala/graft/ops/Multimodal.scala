package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media payloads ride through the pipeline as
 * opaque `binary` columns with typed metadata extracted by a per-partition
 * decode pass. The Spark-side mechanics — schema, partition-parallel decode,
 * typed Dataset boundary — are real; the codec call is a PLUGGABLE
 * [[Multimodal.Decoder]] (r14) whose default is a deterministic stub
 * (image/audio libraries are not in this container). On a real cluster a
 * pipeline passes its own Decoder — no fork of the operators needed.
 */
object Multimodal {

  /** A media record as stored: id, declared format, opaque payload. */
  case class MmRecord(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Typed metadata produced by the decode pass. */
  case class MmMeta(doc_id: Long, fmt: String, size_bytes: Long,
                    width: Long, height: Long, duration_ms: Long)

  /**
   * The pluggable codec boundary (r14): every place the multimodal
   * operators would call an image/audio library goes through this trait,
   * so a real pipeline swaps its decoder in per CALL — the operators,
   * schemas, and partition-parallel execution shape never change.
   * Implementations run INSIDE executor tasks (ship a Serializable
   * instance; heavyweight codec state belongs in a @transient lazy val so
   * each executor initializes it once, not per row).
   */
  trait Decoder extends Serializable {
    /** payload → typed metadata (dimensions, duration). */
    def meta(r: MmRecord): MmMeta
    /** feature of the decoded frame covering payload bytes
      * [off, off+len) — the stand-in for seek + decode + featurize. */
    def frameFeature(r: MmRecord, off: Long, len: Long): String
    /** payload transform: decode, scale by 1/factor, re-encode. */
    def resizePayload(r: MmRecord, factor: Int): Array[Byte]
  }

  /**
   * Default STUB codec: deterministic fakes — metadata derived from
   * payload size and id, frame features as byte-window md5, resize as
   * byte decimation. Deliberately pure so the SQL oracle replicates
   * every output bit-for-bit; a real deployment replaces exactly this
   * object and nothing else.
   */
  object StubDecoder extends Decoder {
    // one digest per THREAD, initialized lazily on the executor —
    // MessageDigest is not thread-safe and per-row getInstance churns
    @transient private lazy val md =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    def meta(r: MmRecord): MmMeta = {
      val size = r.payload.length.toLong
      r.fmt match {
        case "wav" => MmMeta(r.doc_id, r.fmt, size, 0L, 0L,
          size * 1000L / 16L)
        case _ => MmMeta(r.doc_id, r.fmt, size, size % 640L,
          (r.doc_id * 7L) % 480L, 0L)
      }
    }

    def frameFeature(r: MmRecord, off: Long, len: Long): String = {
      val d = md.get()
      d.reset()
      d.update(r.payload, off.toInt, len.toInt)
      d.digest().map("%02x".format(_)).mkString
    }

    def resizePayload(r: MmRecord, factor: Int): Array[Byte] = {
      val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
      out
    }
  }

  /** Back-compat alias for the default metadata decode. */
  def decodeStub(r: MmRecord): MmMeta = StubDecoder.meta(r)

  /** Partition-parallel decode: binary in, typed metadata out. The decode
    * runs inside the executors via mapPartitions (the Scala analog of a
    * Pandas-UDF `mapInPandas` batch decode); no data visits the driver. */
  def extractMeta(records: Dataset[MmRecord],
                  decoder: Decoder = StubDecoder): Dataset[MmMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(decoder.meta))
  }

  /** One sampled frame: byte window of the payload + content feature (the
    * stand-in for a decoded-frame feature vector). */
  case class MmFrame(doc_id: Long, fmt: String, frame_idx: Long,
                     off: Long, frame_len: Long, frame_md5: String)

  /**
   * Frame sampling (the video/audio analog of `extractMeta`): each media
   * payload yields `n` evenly-spaced frames — frame k covers bytes
   * [k·size/n, (k+1)·size/n) — featurized through the [[Decoder]] (a real
   * one seeks + decodes at those offsets; the default hashes the window
   * bytes so the SQL oracle replicates the output exactly). Runs
   * per-partition in the executors (mapPartitions typed boundary, like
   * extractMeta); frames-per-record is constant, so output scales
   * linearly and the operator never shuffles.
   */
  def sampleFrames(records: Dataset[MmRecord], n: Int = 4,
                   decoder: Decoder = StubDecoder): Dataset[MmFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val size = r.payload.length.toLong
        (0 until n).iterator.map { k =>
          val off = k * size / n
          val end = (k + 1) * size / n
          MmFrame(r.doc_id, r.fmt, k.toLong, off, end - off,
            decoder.frameFeature(r, off, end - off))
        }
      }
    }
  }

  /** A resized payload: new blob + its provenance sizes and feature hash. */
  case class MmResized(doc_id: Long, fmt: String, orig_bytes: Long,
                       resized_bytes: Long, resized_md5: String)

  /**
   * Resize (downsample) the payload through the [[Decoder]] — the default
   * keeps every `factor`-th byte, the deterministic stand-in for pixel/PCM
   * downsampling (a real codec decodes, scales, re-encodes; the Spark
   * shape is identical). The payload-TRANSFORM class of multimodal op:
   * binary in, smaller binary out, map-only — at 100 TB this runs as one
   * scan with zero shuffle and cuts downstream bytes by `factor`. Emits
   * the new feature hash so the oracle pins the transformed CONTENT, not
   * just its size.
   */
  def resize(records: Dataset[MmRecord], factor: Int = 4,
             decoder: Decoder = StubDecoder): Dataset[MmResized] = {
    // fail fast at the API boundary: factor=0 would divide by zero and a
    // negative factor would throw NegativeArraySizeException deep inside a
    // Spark task, surfacing as an opaque stage failure
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val out = decoder.resizePayload(r, factor)
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
