package graft.streaming

import graft.SparkSpec

/** Stream/batch agreement for the round-7 transformWithState entries —
  * each streaming state shape is compared DIRECTLY against the batch
  * computation it claims to equal on the finite replay (the same
  * guarantee the DuckDB twins state, checked in-JVM without the SQL
  * dialect in between), plus a structural inventory pinning that all
  * six state shapes stay exercised.
  */
class StateShapesSpec extends SparkSpec {

  test("stream CDC snapshot equals the batch changelog compaction") {
    val stream = EventStream.streamCdcSnapshot(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).sorted
    val batch = graft.ext.Warehouse.cdcApplyQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).sorted
    assert(stream.toSeq == batch.toSeq)
    assert(stream.nonEmpty)
  }

  test("stream map-state profile equals the batch group-by") {
    val stream = EventStream.streamMapState(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val batch = graft.tables.Tables.events(spark, sf001)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(stream == batch)
  }

  test("stream near-dup gate admits exactly the non-later X2 candidates") {
    // the gate's batch-replay contract: admitted(d) ⇔ d is never the
    // LATER member of a banded candidate pair from the DEPLOYED X2
    // relation (shared verbatim — dedup_minhash_pairs' own output)
    val laterMembers = graft.ext.TextDedup.minhashPairs(spark, sf001)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val gate = EventStream.streamNearDupGate(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(gate.nonEmpty)
    gate.foreach { case (docId, nBands, nBlocked, admitted) =>
      assert(nBands == 4L, s"doc $docId bands $nBands")
      assert(admitted == (nBlocked == 0L))
      assert(admitted == !laterMembers(docId),
        s"doc $docId: admitted=$admitted but laterCandidate=${laterMembers(docId)}")
    }
    // the gate must actually reject something on the near-dup fixture
    assert(gate.exists(!_._4) && gate.exists(_._4))
  }

  test("order-insensitive near-dup gate equals the min-owner law under " +
      "adversarial cross-batch arrival order") {
    import org.apache.spark.sql.functions._
    // two-file documents directory: the file written FIRST (older mtime,
    // so processed as micro-batch 1 under maxFilesPerTrigger=1) holds the
    // LARGE doc_ids; the second file holds the SMALL ids — exactly the
    // cross-batch displacement shape where X217's enforced guard fires
    // and the X266 retraction fold must still match the batch law
    val src = graft.tables.Tables.documents(spark, sf001)
    val ids = src.select("doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_anyorder")
      .toFile.getAbsolutePath
    val docDir = s"$dir/documents.parquet"
    src.filter(col("doc_id") >= mid).coalesce(1)
      .write.mode("append").parquet(docDir)
    Thread.sleep(1200) // distinct mtimes: the file source batches oldest-first
    src.filter(col("doc_id") < mid).coalesce(1)
      .write.mode("append").parquet(docDir)
    // batch min-owner oracle over the SAME directory
    val bandRows = graft.ext.TextDedup.bandHashesOf(
        spark.read.parquet(docDir).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val owner = bandRows.groupBy(r => (r._2, r._3))
      .map { case (k, g) => k -> g.map(_._1).min }
    val expected = bandRows.groupBy(_._1).map { case (d, g) =>
      val blocked = g.count(r => owner((r._2, r._3)) < d).toLong
      d -> (g.length.toLong, blocked, blocked == 0L)
    }
    // the fixture must genuinely exercise the retraction path: some band
    // owned by a batch-1 (large-id) doc must be displaced by a batch-2
    // (small-id) arrival — i.e. a band whose members straddle the median
    // with its min in the small half
    val displaced = bandRows.groupBy(r => (r._2, r._3)).values.exists { g =>
      g.exists(_._1 >= mid) && g.map(_._1).min < mid
    }
    assert(displaced, "fixture does not exercise cross-batch displacement")
    val got = EventStream.streamNearDupGateAnyOrder(spark, dir,
        maxFilesPerTrigger = Some(1)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (d, e) =>
      assert(got(d) == e, s"doc $d: got ${got(d)} expected $e")
    }
    // and the two gates agree where both are defined: on the ordered
    // single-batch fixture replay the retraction variant is X217 verbatim
    val plain = EventStream.streamNearDupGate(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val any = EventStream.streamNearDupGateAnyOrder(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(any == plain)
  }

  test("stream bloom gate matches the in-JVM bit-replay") {
    // recompute the k=3 md5 bit sets per doc and replay first-toucher
    // semantics in doc_id order — admitted ⇔ ≥1 bit untouched by ANY
    // earlier doc (the AND-quantifier twin of the band gate's law)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long, Boolean)]
    val touched = scala.collection.mutable.Set.empty[Long]
    docs.foreach { case (id, text) =>
      val bits = (0 until 3)
        .map(i => java.lang.Long.parseLong(
          md5hex(text + s"|bloom$i").take(4), 16) % 1024L)
        .distinct
      val nSet = bits.count(touched)
      expected(id) = (bits.size.toLong, nSet.toLong, nSet < bits.size)
      bits.foreach(touched += _)
    }
    val gate = EventStream.streamBloomGate(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
    assert(gate.nonEmpty)
    gate.foreach { case (id, got) =>
      assert(got == expected(id), s"doc $id: $got vs ${expected(id)}")
    }
    // bounded state: the whole replay touches at most m = 1024 bit keys
    assert(touched.size <= 1024)
    // the gate must both admit and (on this fixture) reject something
    assert(gate.exists(_._2._3) && gate.exists(!_._2._3))
  }

  test("stream lindley fold equals the batch running-min solution") {
    val stream = EventStream.streamQueueWait(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).sorted
    val batch = graft.ext.Events.queueWait(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).sorted
    assert(stream.nonEmpty)
    assert(stream.toSeq == batch.toSeq)
  }

  test("stream horizon fold equals the batch interval union") {
    val stream = EventStream.streamIntervalUnion(spark, sf001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).sorted
    val batch = graft.ext.Events.intervalUnion(spark, sf001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).sorted
    assert(stream.nonEmpty)
    assert(stream.toSeq == batch.toSeq)
  }

  test("stream quantile sketch equals the batch log2 sketch") {
    val stream = EventStream.streamQuantileState(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted
    val batch = graft.tables.Tables.events(spark, sf001)
      .selectExpr("event_type",
        "length(bin(cast(cast(value as decimal(18,2)) * 100 as bigint))) as b")
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).map { case (t, rows) =>
        val bs = rows.map(_._2).sorted
        val n = bs.length.toLong
        def pick(q: Int): Long = {
          val target = ((q * n + 99) / 100).toInt
          bs(target - 1).toLong
        }
        (t, n, pick(50), pick(90), pick(99))
      }.toSeq.sorted
    assert(stream.toSeq == batch)
  }

  test("stream max-gap fold equals the batch lag window") {
    val stream = EventStream.streamMaxGap(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sorted
    val batch = graft.tables.Tables.events(spark, sf001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).collect { case (u, rows) if rows.length > 1 =>
        val us = rows.sortBy(r => (r._3, r._2)).map(_._3)
        val gaps = us.sliding(2).map { case Array(a, b) => b - a }.toSeq
        val span = us.max - us.min
        (u, us.length.toLong, gaps.max, span,
          new java.math.BigDecimal(java.lang.Double.toString(
            gaps.max.toDouble * gaps.length / span))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }.toSeq.sorted
    assert(stream.nonEmpty)
    assert(stream.toSeq == batch)
  }

  test("all transformWithState state shapes stay registered") {
    val qs = graft.SparkEntry.queries.keySet
    val shapes = Map(
      "counter (ValueState)" -> "stream_transform_state",
      "gate (ValueState decide-once)" -> "stream_dedup_state",
      "mergeable sketch (binary ValueState)" -> "stream_hll",
      "clock (event-time timers)" -> "stream_sessions_state",
      "bounded list (ListState)" -> "stream_topk_state",
      "dynamic sub-map (MapState)" -> "stream_map_state",
      "update-if-newer snapshot (ValueState)" -> "stream_cdc_state",
      "band-owner admission gate (ValueState over LSH keys)" ->
        "stream_neardup_gate",
      "bit-sharded Bloom membership gate (ValueState over bit keys)" ->
        "stream_bloom_gate",
      "sequential-recurrence fold (Lindley closure in ValueState)" ->
        "stream_queue_wait",
      "monotone horizon merge (interval-union ValueState)" ->
        "stream_interval_union",
      "mergeable counter histogram (binary ValueState quantile sketch)" ->
        "stream_quantile_state",
      "pairwise-adjacent fold (last-clock ValueState max-gap)" ->
        "stream_max_gap_state")
    val missing = shapes.filterNot { case (_, entry) => qs(entry) }
    assert(missing.isEmpty,
      s"state-shape entries dropped: ${missing.values.mkString(", ")}")
  }
}
