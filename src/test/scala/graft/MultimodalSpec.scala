package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing: the decode is a deterministic stub
  * (no media libs in this container), so every value is exactly checkable;
  * the schema, partition batching and span lineage are the real contract.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("decodeMeta: deterministic, one row per payload, checksum matches") {
    val media = Multimodal.fromPages(spark, 20)
    val metas = Multimodal.decodeMeta(media).collect()
    assert(metas.length == 20)
    val codec = new Multimodal.StubCodec
    val byUrl = media.collect().map(m => m.url -> m).toMap
    metas.foreach { m =>
      val src = byUrl(m.url)
      assert(m.nBytes == src.media.length.toLong)
      assert(m.checksum == codec.checksum(src.media))
      assert(m.width >= 160 && m.height >= 120 && m.durationMs >= 1000)
    }
    // determinism across runs
    val again = Multimodal.decodeMeta(media).collect()
    assert(metas.map(_.checksum).sorted.toSeq == again.map(_.checksum).sorted.toSeq)
  }

  test("frameSample: spans slice the parent payload exactly") {
    val media = Multimodal.fromPages(spark, 10)
    val byUrl = media.collect().map(m => m.url -> m.media).toMap
    val frames = Multimodal.frameSample(media, k = 4, frameBytes = 64).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.url).forall(_._2.length <= 4))
    frames.foreach { f =>
      val parent = byUrl(f.url)
      val expected = java.util.Arrays.copyOfRange(
        parent, f.span.start.toInt, f.span.stop.toInt)
      assert(java.util.Arrays.equals(f.bytes, expected),
        s"frame bytes disagree with span lineage for ${f.url} frame ${f.frameIdx}")
      assert(f.span.stop - f.span.start <= 64)
    }
  }

  test("extractFeatures: fixed dim, L2-normalized, deterministic") {
    val media = Multimodal.fromPages(spark, 15)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 15)
    feats.foreach { f =>
      assert(f.features.length == Multimodal.featureDim)
      val norm = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"not normalized: $norm")
    }
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.url -> f.features.toSeq).toMap
    feats.foreach(f => assert(f.features.toSeq == again(f.url)))
  }

  test("plumbing is shuffle-free (no Exchange in the physical plan)") {
    val ds = Multimodal.extractFeatures(Multimodal.fromPages(spark, 5))
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
