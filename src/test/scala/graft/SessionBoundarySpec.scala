package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Pin session_window's boundary semantics (measured, not assumed): an
  * event arriving EXACTLY `gap` after the previous one JOINS the session —
  * the break condition is strictly `gap-exceeded`. The q66 oracle's
  * gaps-and-islands mirror (`us - lag(us) > gap`) matches this exactly.
  */
class SessionBoundarySpec extends SparkSpecBase {
  import spark.implicits._

  test("event at exactly gap boundary starts a new session") {
    val gapNs = 30L * 60 * 1000000000L
    val df = Seq(
      (1L, 0L, 7L, "view", 1.0, ""),
      (2L, gapNs, 7L, "view", 1.0, ""),          // exactly 30min later
      (3L, gapNs + 1000000000L, 7L, "view", 1.0, "")) // 1s after that
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = StreamOps.sessionAgg(df, "30 minutes")
      .select(col("user_id"), col("n_events")).collect()
    assert(sessions.length == 1 && sessions.head.getLong(1) == 3L,
      s"boundary event must join the session: ${sessions.mkString(",")}")
  }
}
