package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.RfPipeline
import graft.multimodal.{FakeDecoder, MediaRecord, Multimodal}
import graft.OracleMath._

class MultimodalMlSpec extends SparkSpec {
  import spark.implicits._

  private def mediaFixture() = {
    // binary payloads derived from the documents table (opaque bytes)
    Tables.documents(spark, sf()).limit(20)
      .select($"doc_id", encode($"text", "UTF-8").as("content"))
  }

  test("binary media table schema and feature extraction") {
    val media = Multimodal.asMediaTable(mediaFixture(), "doc_id", "content",
      kind = "image", mime = "application/octet-stream")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "content", "mime", "width", "height"))
    val feats = Multimodal.extractFeatures(media.as[MediaRecord], new FakeDecoder(64))
    val rows = feats.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.histogram.length == 16))
    assert(rows.forall(r => r.histogram.sum == r.n_bytes))
    assert(rows.forall(r => r.byte_mean > 0 && r.byte_mean < 255))
    // frames = ceil(n_bytes/64) sampled with stride 2
    assert(rows.forall(r =>
      r.frames_sampled == (((r.n_bytes + 63) / 64) + 1) / 2))
  }

  test("frame sampling caps frames per media") {
    val media = Multimodal.asMediaTable(mediaFixture(), "doc_id", "content",
      "video", "application/octet-stream")
    val frames = Multimodal.sampleFrames(media.as[MediaRecord], new FakeDecoder(32), maxFrames = 3)
    val counts = frames.groupBy("media_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 3))
    assert(frames.filter($"frame_idx" >= 3).count() == 0)
  }

  test("RF pipeline: target windowing, train, persist, reload, re-score") {
    val daily = Tables.orders(spark, sf())
      .groupBy(to_date($"o_orderdate").as("date"))
      .agg(dsum($"o_totalprice", 4, 2).as("close"),
        count(lit(1)).cast("double").as("n_orders"))
    val training = RfPipeline.withTarget(daily, "close", "date")
      .select($"close", $"n_orders", $"label")
    val (model, acc) = RfPipeline.train(training, Seq("close", "n_orders"))
    assert(acc >= 0.0 && acc <= 1.0)
    val path = Files.createTempDirectory("rf-model").toString + "/model"
    RfPipeline.save(model, path)
    val (acc2, sample) = RfPipeline.evaluate(path,
      RfPipeline.withTarget(daily, "close", "date").select($"close", $"n_orders", $"label"))
    assert(sample.count() <= 10)
    assert(acc2 >= 0.0 && acc2 <= 1.0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
