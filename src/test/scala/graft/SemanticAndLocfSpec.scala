package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Specs for the round-5 analytics wave: SemDeDup semantic dedup, LOCF gap
  * fill, running-distinct-users rewrite, and the Gopher quality rules. */
class SemanticAndLocfSpec extends SparkSpec {
  import spark.implicits._

  // --- SemDeDup ----------------------------------------------------------

  private def vec(xs: Double*): Seq[Double] = xs

  test("semanticDedup drops exactly the higher-id member of a dup pair") {
    val corpus = Seq(
      (1L, 0, vec(1.0, 0.0, 0.0)),
      (2L, 0, vec(0.999, 0.04, 0.0)),   // near-dup of 1 (cos ≈ 0.9992)
      (3L, 0, vec(0.0, 1.0, 0.0)),      // same cluster, dissimilar
      (4L, 1, vec(1.0, 0.0, 0.0))       // OTHER cluster: identical to 1 but never compared
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.semanticDedup(corpus, threshold = 0.95)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("semanticDedup keeps one representative of a transitive chain") {
    // 1~2 and 2~3 but 1 !~ 3: keep-lowest drops 2 (pairs with 1); 3 is
    // dropped only if it pairs with a KEPT-or-not lower id — the policy is
    // pairwise (drop iff ANY lower-id mate within threshold), so 3 drops
    // via its pair with 2 regardless of 2's own fate. Document that.
    val a = vec(1.0, 0.0)
    val b = vec(math.cos(0.25), math.sin(0.25))  // cos(a,b) ≈ 0.969
    val c = vec(math.cos(0.50), math.sin(0.50))  // cos(b,c) ≈ 0.969, cos(a,c) ≈ 0.878
    val corpus = Seq((1L, 0, a), (2L, 0, b), (3L, 0, c))
      .toDF("vec_id", "label", "embedding")
    val kept = Similarity.semanticDedup(corpus, threshold = 0.95)
      .filter(col("kept")).select("vec_id").as[Long].collect().sorted
    assert(kept === Array(1L))
  }

  test("semantic_dedup contract: every planted copy dropped, nothing else") {
    val out = SparkEntry.queries("semantic_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    val nTotal = out.map(_.getLong(1)).sum
    val nKept = out.map(_.getLong(2)).sum
    // 20 planted copies at sf0.001 scale too? planted = ids % 25 == 0 of the
    // corpus; kept must be exactly the unplanted base corpus size
    assert(nTotal - nKept === nTotal / 26,
      s"dropped ${nTotal - nKept} of $nTotal — expected exactly the planted copies")
  }

  test("semanticDedup: adversarial mega-cluster goes through the salt guard unchanged") {
    // one cluster holds a 60-row near-dup flood (the skew case: every pair
    // grid cell lands in one bucket); cap forced to 8 so salting engages
    val flood = (0L until 60L).map(i => (i, 0, vec(1.0, 0.0, 0.0)))
    val corpus = (flood ++ Seq((100L, 0, vec(0.0, 1.0, 0.0)),
                               (101L, 0, vec(0.0, 0.0, 1.0))))
      .toDF("vec_id", "label", "embedding")
    // the fixture genuinely trips hot-bucket detection at this cap
    val probe = corpus.select(lit(0).as("band"), col("label").as("bucket"),
                              col("vec_id"))
    assert(!operators.Dedup.hotBuckets(probe, cap = 8L).isEmpty,
      "fixture must have a hot cluster at cap=8")
    val salted = Similarity.semanticDedup(corpus, threshold = 0.95,
        skewSalt = 4, skewCap = 8L)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    val plain = Similarity.semanticDedup(corpus, threshold = 0.95,
        skewCap = Long.MaxValue)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(salted === plain, "salted lane must match the plain join exactly")
    // and both match the policy: keep lowest id of the flood + both orthogonals
    assert(salted.filter(_._2).keySet === Set(0L, 100L, 101L))
  }

  test("embeddingNearDuplicates: single hot SRP bucket goes through the salt guard") {
    // 50 identical vectors share every (table, bucket) — the hot-bucket
    // worst case for the SRP self-join; two orthogonal vectors pair with
    // nothing. cap=8 forces the salt lane; the pair SET must equal both the
    // plain-lane run and the brute-force expectation.
    val flood = (0L until 50L).map(i => (i, vec(1.0, 0.0, 0.0)))
    val corpus = (flood ++ Seq((100L, vec(0.0, 1.0, 0.0)),
                               (101L, vec(0.0, 0.0, 1.0))))
      .toDF("vec_id", "embedding")
    val salted = Similarity.embeddingNearDuplicates(corpus, threshold = 0.95,
        dim = 3, skewSalt = 4, skewCap = 8L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plain = Similarity.embeddingNearDuplicates(corpus, threshold = 0.95,
        dim = 3, skewCap = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for (i <- 0L until 50L; j <- (i + 1) until 50L)
      yield (i, j)).toSet
    assert(salted === plain, "salted lane must match the plain join exactly")
    assert(salted === expected,
      s"must find exactly the ${expected.size} flood pairs; got ${salted.size}")
  }

  // --- LOCF gap fill -----------------------------------------------------

  test("events_locf: filled value equals most recent daily close") {
    val df = SparkEntry.queries("events_locf")(spark, "/root/testdata/sf0.001")
      .collect()
    // spine is dense per user: consecutive days, no gaps
    val byUser = df.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val days = rows.map(_.getString(1)).sorted
      val d0 = java.time.LocalDate.parse(days.head)
      days.zipWithIndex.foreach { case (d, i) =>
        assert(java.time.LocalDate.parse(d) === d0.plusDays(i), s"gap at $d")
      }
    }
    // every unobserved day carries the previous day's filled value; the
    // first day of each user is always observed
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      assert(sorted.head.getBoolean(2), s"user $u first spine day unobserved")
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          if (!cur.getBoolean(2))
            assert(cur.getDouble(3) === prev.getDouble(3),
              s"user $u day ${cur.getString(1)} not carried forward")
        case _ =>
      }
    }
  }

  // --- linear interpolation ----------------------------------------------

  test("events_interp: endpoints observed, gaps linear between brackets") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("events_interp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._3 && sorted.last._3, s"user $u spine ends unobserved")
      // every unobserved day's value lies on the segment between brackets
      val obs = sorted.zipWithIndex.filter(_._1._3).map(_._2)
      sorted.zipWithIndex.filterNot(_._1._3).foreach { case ((_, d, _, v), i) =>
        val lo = obs.filter(_ < i).max
        val hi = obs.filter(_ > i).min
        val (v0, v1) = (sorted(lo)._4, sorted(hi)._4)
        val expect = v0 + (v1 - v0) * ((i - lo).toDouble / (hi - lo).toDouble)
        assert(v === expect, s"user $u day $d not linear")
      }
    }
  }

  // --- running distinct users -------------------------------------------

  test("events_running_users: cumulative count equals brute-force prefix distinct") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("events_running_users")(spark, dir)
      .collect().sortBy(_.getString(0))
    val ev = Tables.load(spark, dir, "events")
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), col("user_id"))
      .as[(String, Long)].collect()
    out.foreach { r =>
      val day = r.getString(0)
      val brute = ev.filter(_._1 <= day).map(_._2).distinct.length
      assert(r.getLong(3) === brute.toLong, s"cum_users wrong at $day")
      val active = ev.filter(_._1 == day).map(_._2).distinct.length
      assert(r.getLong(1) === active.toLong, s"n_active wrong at $day")
    }
  }

  // --- moving average -----------------------------------------------------

  test("events_moving_avg: trailing frame means match a reference fold") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("events_moving_avg")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._1))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1)
        val (n, avg) = got(ordered(i)._1)
        assert(n === frame.length.toLong)
        // exact-decimal frame sum reference
        val sum = frame.map(r => BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_EVEN))
          .foldLeft(BigDecimal(0))(_ + _)
        assert(math.abs(avg - sum.toDouble / frame.length) < 1e-12,
          s"event ${ordered(i)._1}: got $avg")
      }
    }
  }

  // --- deltaSum -----------------------------------------------------------

  test("events_delta_sum: positive increments only, exact decimals") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val tmp = tmpDir("dsum")
    // 10.5 → 12.25 (+1.75) → 7 (reset) → 7.1 (+0.1) → single-event user
    Seq((1L, ts(1), 1L, "a", 10.50, "{}"), (1L, ts(2), 2L, "a", 12.25, "{}"),
        (1L, ts(3), 3L, "a", 7.00, "{}"), (1L, ts(4), 4L, "a", 7.10, "{}"),
        (2L, ts(1), 5L, "a", 3.0, "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
      .select(col("event_id"), expr("unix_micros(ts) * 1000").as("ts"),
              col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$tmp/events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = SparkEntry.queries("events_delta_sum")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((1.85, 2L, 4L)))
    assert(out(2L) === ((0.0, 0L, 1L)))
  }

  // --- rolling HLL window -------------------------------------------------

  test("rolling_30d_users_hll: merged per-day states equal a direct window sketch") {
    import graft.functions.Sketches
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val probe = ev.agg(max(col("day"))).head.getDate(0) // densest window end
    val win = ev.filter(col("day") >= date_sub(lit(probe), 29) && col("day") <= lit(probe))
    // one-shot sketch over the window vs per-day state merge
    val oneShot = win.agg(Sketches.uniqState(col("user_id")).as("st"))
      .select(Sketches.uniqEstimate(col("st"))).head.getLong(0).toDouble
    val merged = win.groupBy(col("day"))
      .agg(Sketches.uniqState(col("user_id")).as("st"))
      .agg(Sketches.uniqMerge(col("st"))).head.getLong(0).toDouble
    assert(merged === oneShot, "day-state merge must equal the one-shot sketch")
    val exact = win.select(col("user_id")).distinct().count().toDouble
    assert(math.abs(merged - exact) <= math.max(4.0, exact * 0.05),
      s"estimate $merged vs exact $exact outside the contract envelope")
  }

  // --- Gopher quality rules ---------------------------------------------

  test("gopher rules: integer boundaries behave on crafted fixtures") {
    val fix = Seq(
      (1L, Seq.fill(50)("the").mkString(" ")),          // 50 words, wlen 3, stopword-rich
      (2L, Seq.fill(49)("the").mkString(" ")),          // 49 words → ok_nwords false
      (3L, Seq.fill(60)("ab").mkString(" ")),           // mean wlen 2 → ok_wlen false
      (4L, (Seq.fill(50)("the") ++ Seq.fill(51)("123 #")).mkString(" ")), // symbols+digits
      (5L, "")                                          // empty text
    ).toDF("doc_id", "text")
    // re-run the contract projection over the fixture via the same code path
    val tmp = tmpDir("gq")
    fix.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("gopher_quality")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getBoolean(3) && out(1L).getBoolean(4) &&
           out(1L).getBoolean(5) && out(1L).getBoolean(6) &&
           out(1L).getBoolean(7) && out(1L).getBoolean(8))
    assert(!out(2L).getBoolean(3) && !out(2L).getBoolean(8)) // 49 < 50 words
    assert(!out(3L).getBoolean(4))                           // mean wlen 2 < 3
    // doc 4: 51 "123"-only tokens of 101 → alpha fraction < 0.8; 51 hashes
    // over 101 words → symbol ratio > 0.1
    assert(!out(4L).getBoolean(5) && !out(4L).getBoolean(6))
    // empty text: 0 words fails the lower word bound, nothing crashes
    assert(!out(5L).getBoolean(3) && out(5L).getLong(1) === 0L)
  }
}
