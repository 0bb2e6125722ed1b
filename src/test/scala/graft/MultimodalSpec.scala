package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stub decoder is deterministic with fixed dimension and unit mass") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val f1 = Multimodal.stubDecode(payload)
    val f2 = Multimodal.stubDecode(payload)
    assert(f1.sameElements(f2))
    assert(f1.length == Multimodal.FeatureDim)
    assert(math.abs(f1.sum - 1.0f) < 1e-4, "histogram features normalize to 1")
    assert(Multimodal.stubDecode(Array.emptyByteArray).forall(_ == 0f))
  }

  test("frame sampling strides correctly") {
    val bytes = (0 until 10).map(_.toByte).toArray
    assert(Multimodal.sampleFrames(bytes, 4).sameElements(Array[Byte](0, 4, 8)))
    assert(Multimodal.sampleFrames(bytes, 1).sameElements(bytes))
    assert(Multimodal.sampleFrames(Array.emptyByteArray, 3).isEmpty)
  }

  test("resize downsamples rasters with exact output geometry") {
    // 4x4 gradient raster -> 2x2 nearest-neighbor
    val px = (0 until 16).map(_.toByte).toArray
    val out = Multimodal.resizeRaster(px, 4, 4, 2, 2)
    assert(out.sameElements(Array[Byte](0, 2, 8, 10)))
    // identity resize
    assert(Multimodal.resizeRaster(px, 4, 4, 4, 4).sameElements(px))
    // output size is outW*outH regardless of input
    assert(Multimodal.resizeRaster(px, 4, 4, 3, 1).length == 3)
    intercept[IllegalArgumentException] {
      Multimodal.resizeRaster(px, 5, 5, 2, 2)
    }
  }

  test("decode pipeline streams a media table partition-wise") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sf)
    val feats = Multimodal.decodeFeatures(media, frameStride = 4).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      assert(f.n_bytes > 0)
      assert(f.n_frames == (f.n_bytes + 3) / 4)
      assert(f.kind == "text/plain")
    }
  }
}
