package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val docs = Seq(
      (0L, "abc def"), (1L, "hello world!"), (2L, "0123456789"),
      (3L, ""), (4L, "x" * 1000))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    mediaFromDocuments(docs)
  }

  test("mediaFromDocuments: typed schema, deterministic kind/dims, utf-8 payload") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.kind).toSeq == Seq("image", "audio", "video", "image", "audio"))
    assert(rows(0).bytes.toSeq == "abc def".getBytes("UTF-8").toSeq)
    assert(rows.forall(r => r.width >= 1 && r.height >= 1 && r.format == "stub"))
  }

  test("StubDecoder features: byte sum + 16-bin histogram, deterministic") {
    val (sum, hist) = StubDecoder.features("abc".getBytes("UTF-8"))
    assert(sum == 'a'.toInt + 'b'.toInt + 'c'.toInt)
    assert(hist.sum == 3 && hist(6) == 3) // a/b/c are 0x61-0x63 → bin 6
    assert(StubDecoder.features("abc".getBytes("UTF-8"))._1 == sum)
  }

  test("extractFeatures: one row per media, stats match the payload, empty-safe") {
    val feats = extractFeatures(media).collect().sortBy(_.media_id).toSeq
    assert(feats.size == 5)
    assert(feats(3).n_bytes == 0 && feats(3).byte_sum == 0)
    assert(feats(4).n_bytes == 1000 && feats(4).byte_sum == 1000L * 'x'.toInt)
    feats.foreach(f => assert(f.histogram.sum == f.n_bytes))
  }

  test("extractFeatures streams the partition iterator (no materialization)") {
    // a decoder that fails on eager consumption would need the iterator —
    // assert laziness by counting decoder calls against a 1-row take
    val calls = spark.sparkContext.longAccumulator("decoder-calls")
    val counting = new MediaDecoder {
      def features(b: Array[Byte]) = { calls.add(1); StubDecoder.features(b) }
      def frames(b: Array[Byte], n: Int) = StubDecoder.frames(b, n)
    }
    extractFeatures(media.repartition(1), counting).take(1)
    assert(calls.value < 5, s"decoder ran ${calls.value} times for take(1) over 5 rows")
  }

  test("sampleFrames: only videos, n frames, frames partition the payload") {
    val frames = sampleFrames(media, n = 4).collect().groupBy(_.media_id)
    assert(frames.keySet == Set(2L)) // only doc 2 is video
    val f2 = frames(2L).sortBy(_.frame_idx)
    assert(f2.length == 4)
    assert(f2.map(_.n_bytes).sum == 10) // "0123456789"
    assert(f2.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
  }
}
