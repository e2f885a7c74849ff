package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Multimodal.{Decoder, MmMeta, MmRecord, StubDecoder}

/** The pluggable codec boundary (r14): operators accept a [[Decoder]]
  * per call; the default stub keeps the oracle-pinned outputs
  * bit-identical (the full DuckDB gate covers that), and a CUSTOM
  * decoder flows through every hook without changing operator shape. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def records = Multimodal.mediaFromDocuments(spark,
    spark.read.parquet(s"$sfDir/documents.parquet").limit(20))

  /** A fake "real" codec: fixed dimensions per format, constant-prefix
    * frame features, resize-to-half regardless of factor — shapes a
    * stub could never produce, so pass-through bugs surface loudly. */
  private object FakeCodec extends Decoder {
    def meta(r: MmRecord): MmMeta =
      MmMeta(r.doc_id, r.fmt, r.payload.length.toLong, 1920L, 1080L, 42L)
    def frameFeature(r: MmRecord, off: Long, len: Long): String =
      s"feat:${r.doc_id}:$off:$len"
    def resizePayload(r: MmRecord, factor: Int): Array[Byte] =
      r.payload.take(r.payload.length / 2)
  }

  test("extractMeta routes through the decoder; default = stub") {
    val viaDefault = Multimodal.extractMeta(records).collect()
    val viaStub = Multimodal.extractMeta(records, StubDecoder).collect()
    assert(viaDefault.sortBy(_.doc_id).toSeq ===
      viaStub.sortBy(_.doc_id).toSeq)
    val custom = Multimodal.extractMeta(records, FakeCodec).collect()
    assert(custom.forall(m => m.width === 1920L && m.height === 1080L &&
      m.duration_ms === 42L))
    // same rows, same ids — only the codec changed
    assert(custom.map(_.doc_id).sorted.toSeq ===
      viaDefault.map(_.doc_id).sorted.toSeq)
  }

  test("sampleFrames featurizes through the decoder; windows unchanged") {
    val custom = Multimodal.sampleFrames(records, n = 3, FakeCodec)
    val rows = custom.collect()
    // the frame WINDOWS (offsets/lengths) are operator geometry, not
    // codec output — identical across decoders
    val stubWindows = Multimodal.sampleFrames(records, n = 3).collect()
      .map(f => (f.doc_id, f.frame_idx, f.off, f.frame_len)).sorted.toSeq
    assert(rows.map(f => (f.doc_id, f.frame_idx, f.off, f.frame_len))
      .sorted.toSeq === stubWindows)
    // the FEATURE came from the custom codec
    assert(rows.forall(f => f.frame_md5 ===
      s"feat:${f.doc_id}:${f.off}:${f.frame_len}"))
  }

  test("resize transforms the payload through the decoder") {
    val custom = Multimodal.resize(records, factor = 4, FakeCodec).collect()
    custom.foreach { r =>
      assert(r.resized_bytes === r.orig_bytes / 2,
        "FakeCodec halves regardless of factor")
    }
    // default stub: ceil(size/factor) decimation, unchanged
    val stub = Multimodal.resize(records, factor = 4).collect()
    stub.foreach { r =>
      assert(r.resized_bytes === (r.orig_bytes + 3) / 4)
    }
  }
}
