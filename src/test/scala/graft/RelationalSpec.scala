package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import graft.queries.Relational._

  test("q05 pricing aggregates are sane") {
    val df = q05Pricing(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9) // <=3 flags x <=3 statuses
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum == li)
  }

  test("q06 revenue by nation covers only ASIA nations") {
    val df = q06RegionRevenue(spark, sf)
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    val got = df.collect().map(_.getAs[String]("n_name")).toSet
    assert(got.subsetOf(asiaNations) && got.nonEmpty)
  }

  test("q07 topk returns 10 descending rows") {
    val r = q07TopCustomers(spark, sf).collect()
    assert(r.length == 10)
    val revs = r.map(_.getAs[Long]("revenue_cents"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q08 window rank starts at 1 per customer and running sum accumulates") {
    val r = q08OrderRanks(spark, sf).collect()
    val byCust = r.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.head.getAs[Int]("rnk") == 1)
      var acc = 0L
      sorted.foreach { row =>
        acc += row.getAs[Long]("price_cents")
        assert(row.getAs[Long]("running_cents") == acc)
      }
    }
  }

  test("q09 intersect/except partition the with-orders custkeys") {
    val inter = q09Intersect(spark, sf).collect().map(_.getLong(0)).toSet
    val excep = q09Except(spark, sf).collect().map(_.getLong(0)).toSet
    assert((inter & excep).isEmpty)
    val withOrders = Tables.orders(spark, sf).select("o_custkey")
      .distinct().collect().map(_.getLong(0)).toSet
    assert((inter | excep) == withOrders)
  }

  test("q10 rollup grand total equals orders count") {
    val r = q10Rollup(spark, sf).collect()
    val grand = r.find(x => x.getString(0) == "ALL" && x.getString(1) == "ALL").get
    assert(grand.getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
  }

  test("q11 event windows cover all events and are 300s-aligned") {
    val r = q11EventWindows(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    assert(r.forall(_.getAs[Long]("window_start") % 300 == 0))
  }

  test("q25 as-of join attaches the latest prior purchase per user") {
    val rows = q25AsofPurchase(spark, sf).collect()
    assert(rows.length == Tables.events(spark, sf).count())
    // purchases match themselves (ts >= semantics)
    rows.filter(_.getAs[String]("event_type") == "purchase").foreach { r =>
      assert(r.getAs[Long]("purchase_id") == r.getAs[Long]("event_id"))
    }
    // reference check on one user via a driver-side replay
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val uid = ev.head._2
    val purchases = ev.filter(e => e._2 == uid && e._3 == "purchase").sortBy(_._4)
    val got = rows.filter(_.getAs[Long]("user_id") == uid)
    got.foreach { r =>
      val myTs = ev.find(_._1 == r.getAs[Long]("event_id")).get._4
      val want = purchases.takeWhile(_._4 <= myTs).lastOption.map(_._1)
      val gotP = if (r.isNullAt(r.fieldIndex("purchase_id"))) None
                 else Some(r.getAs[Long]("purchase_id"))
      assert(gotP == want, s"event ${r.getAs[Long]("event_id")}")
    }
  }

  test("q12 sessions cover all events; sessions per user are gap-separated") {
    val r = q12Sessionize(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    r.groupBy(_.getAs[Long]("user_id")).values.foreach { sessions =>
      val sorted = sessions.sortBy(_.getAs[Long]("session_start_us"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        // next session starts >= 30 min after the last event of the previous
        assert(b.getAs[Long]("session_start_us") - a.getAs[Long]("last_us") >= 1800000000L)
      }
    }
  }

  test("q27 one-pass grouping sets equal a native CUBE with exact percentile") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Relational.q27CubeStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("median_cents"),
         r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))).toMap
    val want = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p0"), col("o_orderstatus").as("s0"),
              round(col("o_totalprice") * 100).cast("long").as("cents_v"))
      .cube(col("p0"), col("s0"))
      .agg(count(lit(1)).as("n"), expr("percentile(cents_v, 0.5)").as("med"),
           min(col("cents_v")).as("mn"), max(col("cents_v")).as("mx"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("ALL"),
                 Option(r.getString(1)).getOrElse("ALL")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("med"),
         r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toMap
    assert(got == want, "one-pass expansion drifted from the native CUBE")
  }

  test("q86 scalar subquery equals the hand-decorrelated join form") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Relational.q86ScalarSubquery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = Tables.lineitem(spark, sf)
    val avg5 = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("fifth"))
    val want = li.join(avg5, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("fifth"))
      .join(Tables.part(spark, sf), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(expr("sum(cast(round(l_extendedprice*100) as bigint)) div 7").as("a"),
           count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "Catalyst decorrelation drifted from the manual join")
  }

  test("q87 exists subquery: counted orders each have a >90-day-late lineitem") {
    import org.apache.spark.sql.functions._
    val total = graft.queries.Relational.q87ExistsSubquery(spark, sf).collect()
      .map(_.getAs[Long]("n_late_orders")).sum
    val manual = Tables.orders(spark, sf).as("o")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf).as("l"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
        col("l.l_shipdate") > col("o.o_orderdate") + expr("interval 90 days"),
        "left_semi")
      .count()
    assert(total == manual)
  }

  test("q88 salted stats equal the plain group-by") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Relational.q88SaltedAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("q89 funnel: conversions are inside the window, first_view is the true min") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Relational.q89Funnel(spark, sf).collect()
    val views = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(expr("ts_ns div 1000")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == views.size, "one row per user with a view")
    rows.foreach { r =>
      assert(r.getAs[Long]("first_view_us") == views(r.getAs[Long]("user_id")))
      if (r.getAs[Int]("converted") == 1) {
        val p = r.getAs[Long]("first_purchase_us")
        val v = r.getAs[Long]("first_view_us")
        assert(p > v && p <= v + graft.queries.Relational.FunnelWindowUs)
      } else assert(r.isNullAt(r.fieldIndex("first_purchase_us")))
    }
  }

  test("q90 incremental merge equals the from-scratch aggregate") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Relational.q90IncrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("q"),
           sum(round(col("l_extendedprice") * 100).cast("long")).as("c"),
           count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want, "state + delta merge must equal full recompute")
  }

  test("q95 merge upsert: row accounting and clause semantics") {
    import org.apache.spark.sql.functions._
    val base = Tables.orders(spark, sf)
    val n = base.count()
    val mxk = base.agg(max(col("o_orderkey"))).head().getLong(0)
    val nDel = base.filter(col("o_orderkey") % 97 === 0).count()
    val nIns = Tables.nation(spark, sf).count()
    val out = graft.queries.Relational.q95MergeUpsert(spark, sf).collect()
    assert(out.length == n - nDel + nIns, "rows = base - deletes + inserts")
    val byKey = out.map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    // deleted keys gone; delete beats upsert on the lcm keys
    base.filter(col("o_orderkey") % 97 === 0).collect()
      .foreach(r => assert(!byKey.contains(r.getAs[Long]("o_orderkey"))))
    // re-priced keys carry the new image
    base.filter(col("o_orderkey") % 100 === 0 && col("o_orderkey") % 97 =!= 0)
      .collect().foreach { r =>
        val k = r.getAs[Long]("o_orderkey")
        assert(byKey(k).getAs[String]("o_orderpriority") == "1-URGENT")
        val old = math.round(r.getAs[Double]("o_totalprice") * 100)
        assert(byKey(k).getAs[Long]("price_cents") == old + old / 10)
      }
    // inserts present with fresh keys
    (1L to nIns).foreach(i => assert(byKey(mxk + i).getAs[String]("o_orderstatus") == "O"))
  }

  test("q100 bag ops equal per-key multiplicity arithmetic") {
    import org.apache.spark.sql.functions._
    def counts(year: Int) = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .groupBy(col("o_custkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (n96, n97) = (counts(1996), counts(1997))
    val rows = graft.queries.Relational.q100BagSetOps(spark, sf).collect()
    val ex = rows.filter(_.getString(2) == "except_all")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ia = rows.filter(_.getString(2) == "intersect_all")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keys = n96.keySet ++ n97.keySet
    keys.foreach { k =>
      val (a, b) = (n96.getOrElse(k, 0L), n97.getOrElse(k, 0L))
      assert(ex.getOrElse(k, 0L) == math.max(0L, a - b),
        s"EXCEPT ALL multiplicity wrong for $k")
      assert(ia.getOrElse(k, 0L) == math.min(a, b),
        s"INTERSECT ALL multiplicity wrong for $k")
    }
  }

  test("q91 range frame: trailing window matches a brute-force recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Relational.q91RangeWindow(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    // brute-force per customer: count/sum of orders within 89 days before
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCust.values.foreach { os =>
      os.foreach { r =>
        val d = r.getAs[Int]("day")
        val peers = os.filter(x => x.getAs[Int]("day") <= d &&
                                   x.getAs[Int]("day") >= d - 89)
        assert(r.getAs[Long]("n_trailing") == peers.length)
        assert(r.getAs[Long]("cents_trailing") ==
          peers.map(x => cents(x.getAs[Long]("o_orderkey"))).sum)
      }
    }
  }

  test("q132 SCD2: intervals tile each user's history; one open interval per user") {
    val r = q132Scd2Intervals(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count(),
      "every event must land in exactly one interval")
    r.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("valid_from_us"))
      assert(sorted.count(_.getAs[Long]("is_current") == 1L) == 1,
        s"user $u: exactly one open interval")
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")),
        s"user $u: the open interval is the latest one")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"user $u: intervals must be contiguous")
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u: adjacent runs must differ (else they'd be one run)")
        case _ =>
      }
    }
  }

  test("q136 incremental SCD2 merge is indistinguishable from the full rebuild") {
    val got = q136IncrementalScd2(spark, sf).collect()
    val want = q132Scd2Intervals(spark, sf).collect()
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.toSeq == w.toSeq, s"merge/rebuild divergence: $g vs $w") }
    // the merge path is only proven if users actually straddle the cutoff
    val cutUs = java.time.Instant.parse(s"${ScdCutoff}T00:00:00Z")
      .toEpochMilli * 1000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_ns div 1000").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val straddlers = ev.groupBy(_._1).values
      .count(rows => rows.exists(_._2 < cutUs) && rows.exists(_._2 >= cutUs))
    info(s"users with history AND delta events: $straddlers")
    assert(straddlers > 0, "cutoff must split at least one user's history")
  }

  test("as-of exec property: random streams agree with a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val left = (0 until 3000).map(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(100000).toLong))
      .toDF("l_id", "k", "t")
    // right (k, t) pairs unique so the reference winner is well-defined
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    val rightRows = (0 until 800).flatMap { i =>
      val k = rnd.nextInt(50).toLong; val t = rnd.nextInt(100000).toLong
      if (seen.add((k, t))) Some((10000L + i, k, t, rnd.nextInt(1000).toLong))
      else None
    }
    val right = rightRows.toDF("r_id", "k", "t", "payload")
    val got = graft.plans.AsOfJoinNode.asof(left, right, "k", "t", "t")
      .select("l_id", "r_r_id", "r_payload").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    val byKey = rightRows.groupBy(_._2)
    left.collect().foreach { lr =>
      val (id, k, t) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val want = byKey.getOrElse(k, Nil).filter(_._3 <= t)
        .sortBy(_._3).lastOption.map(r => (r._1, r._4))
      assert(got(id) == want, s"left $id (k=$k, t=$t): got ${got(id)}, want $want")
    }
  }

  test("q134 table diff reproduces the q95 change batch exactly") {
    val r = q134TableDiff(spark, sf).collect()
      .map(x => (x.getAs[Long]("o_orderkey"), x.getAs[String]("status")))
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0))
    val mx = keys.max
    val nNations = Tables.nation(spark, sf).count()
    val expAdded = (0L until nNations).map(mx + _ + 1).toSet
    val expRemoved = keys.filter(_ % 97 == 0).toSet
    val expChanged = keys.filter(k => k % 100 == 0 && k % 97 != 0).toSet
    def got(st: String) = r.filter(_._2 == st).map(_._1).toSet
    assert(got("added") == expAdded, "added = the synthetic inserts")
    assert(got("removed") == expRemoved, "removed = the %97 deletes")
    assert(got("changed") == expChanged, "changed = the re-priced %100 keys")
  }

  test("q168 PIT enrichment: as-of resolution equals the containment join, tiling holds") {
    val r = q168PitEnrich(spark, sf).collect()
    // tiling: every probe's as-of interval actually CONTAINS it
    r.foreach { row =>
      assert(row.getAs[Long]("n_in_window") == row.getAs[Long]("n_probes"),
        s"state ${row.getString(0)}: probe outside its as-of interval")
    }
    // every event yields exactly one resolved probe
    val nEvents = Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_probes")).sum == nEvents)
    // driver recompute: direct interval containment per probe
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"))
      .collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("event_type"),
        x.getAs[Long]("ts_us"), x.getAs[Long]("event_id")))
    val byUser = ev.groupBy(_._1)
    val stateCounts = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, rows) <- byUser) {
      val ordered = rows.sortBy(e => (e._3, e._4))
      // runs of equal type -> intervals [start, nextStart)
      val starts = collection.mutable.ArrayBuffer.empty[(Long, String)]
      var prev: String = null
      for ((_, t, ts, _) <- ordered) {
        if (prev == null || prev != t) { starts += ((ts, t)); prev = t }
      }
      val iv = starts.zipWithIndex.map { case ((from, t), i) =>
        val to = if (i + 1 < starts.length) Some(starts(i + 1)._1) else None
        (from, to, t)
      }.filter { case (f, t, _) => t.forall(_ > f) }
      for ((_, _, ts, _) <- ordered) {
        val probe = ts + PitLagUs
        iv.find { case (f, t, _) => f <= probe && t.forall(probe < _) }
          .foreach { case (_, _, st) => stateCounts(st) += 1 }
      }
    }
    val got = r.map(x => x.getString(0) -> x.getAs[Long]("n_probes")).toMap
    assert(got == stateCounts.toMap, "per-state probe counts match containment recompute")
  }

  test("q171 merkle diff: finds exactly the planted divergence, phase 2 touches only differing ranges") {
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val expMissing = ids.filter(_ % MerkleDropMod == 5).toSet
    val expChanged = ids.filter(id => id % MerkleEditMod == 7 && id % MerkleDropMod != 5).toSet
    val r = q171MerkleDiff(spark, sf).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("status")))
    def got(st: String) = r.filter(_._2 == st).map(_._1).toSet
    assert(got("missing_in_replica") == expMissing)
    assert(got("changed") == expChanged)
    assert(got("extra_in_replica").isEmpty, "replica is a subset by construction")
    // cost contract: the phase-1 summary flags EXACTLY the ranges holding
    // divergent docs — phase 2's scan set, nothing more
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val buckets = merkleDiffBuckets(docs,
      Tables.documents(spark, sf).filter(col("doc_id") % MerkleDropMod =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % MerkleEditMod === 7, concat(col("text"), lit("!")))
            .otherwise(col("text")).as("text")))
      .collect().map(_.getLong(0)).toSet
    val expBuckets = (expMissing ++ expChanged).map(_ / MerkleBucketWidth)
    assert(buckets == expBuckets, "differing ranges = ranges of divergent docs")
    val allBuckets = ids.map(_ / MerkleBucketWidth).toSet
    assert(buckets.size < allBuckets.size / 2,
      "most ranges agree and are never row-scanned")
  }

  test("q172 peak concurrency: two-phase prefix sum equals the global sweep") {
    val sess = q12Sessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("session_start_us"),
        r.getAs[Long]("last_us") + SessionGapUs))
    // driver-side global sweep with atomic tie groups
    val deltas = sess.flatMap { case (s0, e0) => Seq((s0, 1L), (e0, -1L)) }
      .groupBy(identity).map { case ((ts, d), v) => (ts, d, d * v.length) }
      .toSeq.sortBy(t => (t._1, t._2))
    var run = 0L
    val peaks = collection.mutable.Map.empty[Long, Long]
    val starts = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    deltas.foreach { case (ts, d, total) =>
      run += total
      val day = ts / 86400000000L
      peaks.update(day, math.max(peaks.getOrElse(day, Long.MinValue), run))
      if (d == 1) starts(day) += total
    }
    val got = q172PeakConcurrency(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_starts"))).toMap
    assert(got.keySet == peaks.keySet)
    peaks.foreach { case (day, p) =>
      assert(got(day) == ((p, starts(day))), s"day $day")
    }
    assert(got.values.map(_._2).sum == sess.length, "every session starts once")
    assert(run == 0L, "sweep closes every interval")
  }

  test("q193 decayed counts: exact shift decay replays driver-side, ppm shares sum") {
    import graft.queries.Relational
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val ref = ev.map(_._2).max
    def wt(us: Long): Long = {
      val h = math.min((ref - us) / Relational.DecayHalfLifeUs, 62L)
      Relational.DecayScale >> h.toInt
    }
    val per = ev.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.map(r => wt(r._2)).sum, rows.map(_._2).max)
    }.toMap
    val tot = per.values.map(_._2).sum
    val got = Relational.q193DecayedCounts(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == per.keySet)
    per.foreach { case (t, (n, w, last)) =>
      assert(got(t) == ((n, w, w * 1000000L / tot, last)), s"type $t")
    }
    // floor-division shares under-count by < 1 ppm each, never over
    val ppmSum = got.values.map(_._3).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - got.size,
      s"ppm shares must telescope to ~1e6, got $ppmSum")
    // a fresh event weighs exactly DecayScale; the oldest strictly less
    assert(wt(ref) == Relational.DecayScale)
    assert(wt(ev.map(_._2).min) < Relational.DecayScale)
  }

  test("q210 attribution: brute-force per-purchase replay, model ordering") {
    import graft.queries.Relational
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val types = ev.map(e => e._1 -> e._3).toMap
    val want = ev.filter(_._3 == "purchase").map { case (pid, uid, _, us) =>
      val touches = byUser(uid).filter(t =>
        (t._3 == "click" || t._3 == "view") &&
        t._4 <= us && t._4 >= us - Relational.AttrWindowUs)
      if (touches.isEmpty) pid -> ((uid, us, -1L, "none", -1L, "none", 0L))
      else {
        val last = touches.maxBy(t => (t._4, t._1))
        val first = touches.minBy(t => (t._4, t._1))
        pid -> ((uid, us, last._1, types(last._1), first._1, types(first._1),
          touches.length.toLong))
      }
    }.toMap
    val got = Relational.q210Attribution(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getString(6), r.getLong(7)))).toMap
    assert(got == want, "engine == brute-force windowed replay")
    assert(got.values.exists(_._7 > 0), "fixture has attributed purchases")
    // model sanity: the last touch never precedes the first touch
    got.values.filter(_._7 > 0).foreach { case (_, _, lid, _, fid, _, _) =>
      val (lus, fus) = (ev.find(_._1 == lid).get._4, ev.find(_._1 == fid).get._4)
      assert(lus >= fus, "last-touch at or after first-touch")
    }
  }

  test("q183 event trigrams: windowed extraction equals the driver sequence scan") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = collection.mutable.Map.empty[(String, String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(e => (e._3, e._2)).map(_._4)
      seq.sliding(3).filter(_.length == 3)
        .foreach(t => want((t(0), t(1), t(2))) += 1)
    }
    val total = want.values.sum
    val got = q183EventTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("support_ppm"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, n) =>
      assert(got(k) == ((n, 1000000L * n / total)), s"pattern $k")
    }
    assert(got.values.map(_._1).sum == total)
  }

  test("q185 change feed: v0->v1 deltas are exactly the retracted source's rows") {
    val doomed = Tables.documents(spark, sf).agg(min(col("source")))
      .head().getString(0)
    val want = Tables.documents(spark, sf)
      .filter(col("source") === doomed).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = q185ChangeFeed(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.map(_._1).toSet == want, "delta key set")
    assert(got.forall(_._2 == "delete"), "a pure retraction has no inserts/updates")
    assert(want.nonEmpty, "non-vacuous")
  }
}
