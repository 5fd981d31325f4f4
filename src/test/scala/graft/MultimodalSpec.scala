package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.ext.Multimodal.MediaRecord

/** Media-pipeline stage contracts (decode 1:1, resize 1:1, frame-sample
  * 1:N capped) — the plumbing around the stubbed codec.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def media(rows: (Long, String, String)*) =
    rows.map { case (id, kind, s) => MediaRecord(id, kind, s.getBytes("UTF-8")) }
      .toDS()

  test("decode is deterministic and null-payload-safe") {
    val m = MediaRecord(1L, "image", null)
    assert(Multimodal.stubDecode(m) == Multimodal.stubDecode(m))
    assert(Multimodal.stubDecode(m).n_bytes == 0L)
  }

  test("resize keeps min(payload, w*h/64) bytes and is 1:1") {
    val ds = media((1L, "image", "x" * 1000), (2L, "image", "y"))
    val out = Multimodal.resize(ds, 160, 120).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).n_bytes_out == math.min(1000, 160 * 120 / 64))
    assert(out(1).n_bytes_out == 1)
    assert(out.forall(r => r.target_w == 160 && r.target_h == 120))
  }

  test("frame sampling: cap honored, images single-frame, ts grid exact") {
    val ds = media((1L, "video", "long payload " * 50), (2L, "image", "img"))
    val frames = Multimodal.sampleFrames(ds, everyMs = 30000L, maxFrames = 4)
      .collect().groupBy(_.media_id)
    assert(frames(1L).length <= 4 && frames(1L).nonEmpty)
    assert(frames(1L).sortBy(_.frame_idx).zipWithIndex.forall {
      case (f, i) => f.frame_idx == i && f.ts_ms == i * 30000L
    })
    assert(frames(2L).length == 1 && frames(2L).head.ts_ms == 0L)
  }
}
