package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType}

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary schema, typed metadata, stubbed batch decode
  * (shape, determinism, partition preservation). */
class MultimodalSpec extends SparkSpecBase {

  test("media table has opaque binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val s = m.schema
    assert(s("payload").dataType == BinaryType)
    assert(s("kind").dataType == StringType)
    assert(s("width").dataType == IntegerType)
    assert(m.filter(col("payload").isNull).count() == 0)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("decodeStub is deterministic, k-dim, and payload-sensitive") {
    val a = "some media bytes".getBytes("UTF-8")
    val b = "other media bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(a).toSeq == Multimodal.decodeStub(a).toSeq)
    assert(Multimodal.decodeStub(a).length == 8)
    assert(Multimodal.decodeStub(a, 16).length == 16)
    assert(Multimodal.decodeStub(a).toSeq != Multimodal.decodeStub(b).toSeq)
    assert(Multimodal.decodeStub(a).forall(f => f >= 0f && f < 1f))
  }

  test("typed batch decode preserves rows, partitioning, and batch shape") {
    val media = Multimodal.mediaDataset(spark, sf).repartition(4)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.rdd.getNumPartitions == 4) // narrow op: no shuffle
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.features.length == 8))
    // features must agree with a driver-side decode of the same payload
    val one = media.filter(col("media_id") === 0).collect().head
    val viaDs = rows.find(_.media_id == 0).get.features.toSeq
    assert(viaDs == Multimodal.decodeStub(one.payload).toSeq)
  }

  test("resize updates metadata, emits exact target-size payloads, no shuffle") {
    val media = Multimodal.mediaDataset(spark, sf).repartition(3)
    val resized = Multimodal.resizeAll(media, 16, 12)
    assert(resized.rdd.getNumPartitions == 3)
    val rows = resized.collect()
    assert(rows.length == media.count())
    assert(rows.forall(r => r.width == 16 && r.height == 12 &&
      r.payload.length == 16 * 12))
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeAll(media, 16, 12).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(rows.forall(r => again(r.media_id) == r.payload.toSeq))
  }

  test("frame sampling fans out to floor(len/frameSize)/stride frames of exact size") {
    val media = Multimodal.mediaDataset(spark, sf)
    val frames = Multimodal.sampleFrames(media, frameSize = 32, stride = 2).collect()
    val lens = media.collect().map(m => m.media_id -> m.payload.length).toMap
    val byMedia = frames.groupBy(_.media_id)
    assert(byMedia.forall { case (id, fs) =>
      val expected = (0 until lens(id) / 32 by 2).map(_.toLong)
      fs.map(_.frame_no).sorted.toSeq == expected &&
        fs.forall(_.frame.length == 32)
    })
    // every frame's bytes match a driver-side slice of the source payload
    val m0 = media.filter(col("media_id") === 0).collect().head
    frames.filter(_.media_id == 0).foreach { f =>
      val off = f.frame_no.toInt * 32
      assert(f.frame.toSeq == m0.payload.slice(off, off + 32).toSeq)
    }
  }

  test("expression path and oracle-style text path agree on byte probes") {
    val m = Multimodal.mediaFeatures(spark, sf)
    val viaText = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("fb"))
    val joined = m.join(viaText, col("media_id") === col("doc_id"))
      .filter(col("first_byte") =!= col("fb"))
    assert(joined.count() == 0)
  }
}
