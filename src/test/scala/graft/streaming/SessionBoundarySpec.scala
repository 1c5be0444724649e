package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

/** Pins the exact-boundary expiry semantics of the X132 session
  * processor (`EventStream.sessionState`): a session whose event-time
  * timer lands EXACTLY on the final watermark millisecond. The oracle
  * comparator admits final sessions with `end_us // 1000 <= wm_ms`; this
  * spec constructs that boundary (plus one session 1 s inside and one
  * 1 ms outside) and asserts Spark's observed transformWithState timer
  * expiry agrees with the `<=` the oracle states — so the comparator can
  * never drift from the engine on a data-dependent boundary.
  *
  * Construction (gap 30 min, watermark delay 1 h, all µs):
  *  - sentinel user 99 at 10:00:00.000 fixes the final watermark at
  *    exactly 09:00:00.000 (ms-aligned so the oracle's date_trunc
  *    matches);
  *  - user 1's last event at 08:30:00.000 → timer at (last + gap) =
  *    09:00:00.000 — equal to the watermark, the disputed boundary;
  *  - user 2's last event 1 s earlier → timer 08:59:59.000, strictly
  *    inside — must always emit;
  *  - user 3's last event 1 ms later → timer 09:00:00.001, strictly
  *    outside — must never emit (session still open at shutdown).
  */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  private def writeOneFile(df: org.apache.spark.sql.DataFrame,
                           target: String): Unit = {
    val tmp = Files.createTempDirectory("graft-sb").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val t = java.nio.file.Paths.get(target)
    Files.createDirectories(t.getParent)
    Files.move(part.toPath, t)
  }

  test("timer expiry exactly on the final watermark ms matches the oracle's <=") {
    val dir = Files.createTempDirectory("graft-session-boundary").toString
    val usBase = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val tenAm = usBase + 10L * 3600000000L // sentinel: fixes wm at 09:00:00
    val l1 = tenAm - 3600000000L - 1800000000L // 08:30:00 → timer == wm
    val rows = Seq(
      // (event_id, ts_ns, user_id, event_type, value, props)
      (1L, (l1 - 60000000L) * 1000L, 1L, "view", 1.0, "{}"),
      (2L, l1 * 1000L, 1L, "view", 1.0, "{}"),
      (3L, (l1 - 1000000L) * 1000L, 2L, "view", 1.0, "{}"), // timer wm-1s
      (4L, (l1 + 1000L) * 1000L, 3L, "view", 1.0, "{}"), // timer wm+1ms
      (5L, tenAm * 1000L, 99L, "view", 1.0, "{}"))
    writeOneFile(rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props"), s"$dir/events.parquet")

    val out = EventStream.sessionState(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

    val emittedUsers = out.map(_._1).toSet
    // strictly-inside session: non-negotiable
    assert(emittedUsers.contains(2L),
      s"session with timer 1s inside the watermark must emit; got $out")
    // strictly-outside session: non-negotiable
    assert(!emittedUsers.contains(3L),
      s"session with timer 1ms past the watermark must stay open; got $out")
    assert(!emittedUsers.contains(99L), s"sentinel session must stay open; got $out")
    // THE boundary: oracle says <=, so the exact-equality session emits.
    // If this ever fails, transformWithState changed to strict-< expiry
    // and the oracle comparator in OracleSql.stream_sessions_state must
    // move with it — that is exactly the drift this pin exists to catch.
    assert(emittedUsers.contains(1L),
      s"timer == final watermark ms must emit (oracle comparator is <=); got $out")
    // and the emitted shape is the full (start, end = last + gap, n) row
    assert(out.contains((1L, l1 - 60000000L, l1 + 1800000000L, 2L)))
    assert(out.contains((2L, l1 - 1000000L, l1 - 1000000L + 1800000000L, 1L)))
  }
}
