package graft

import graft.queries.AnalyticsQueries

/** Specs for analytics operators without a SQL oracle. */
class AnalyticsSpec extends SparkSpec {

  test("a1: approx_count_distinct within 5% of exact per group") {
    val rows = AnalyticsQueries.queries("a1_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users")
      val exact = r.getAs[Long]("exact_users")
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("q3: top orders are strictly ordered by exact revenue") {
    val rows = AnalyticsQueries.queries("q3_top_orders")(spark, sf).collect()
    assert(rows.length === 10)
  }

  test("q15: percentiles are monotone p50 <= p90 <= p99") {
    val rows = AnalyticsQueries.queries("q15_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) =
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("q17: salted join result equals the plain join") {
    import org.apache.spark.sql.functions._
    val s = spark
    val fact = s.read.parquet(s"$sf/lineitem.parquet").select("l_partkey", "l_quantity")
    val dim = s.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val salted = graft.operators.SaltedJoin.join(fact, dim, "l_partkey", salts = 8)
      .groupBy("p_brand").count()
    val plain = fact.join(dim, "l_partkey").groupBy("p_brand").count()
    val a = salted.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b)
  }

  test("salted join spreads a hot key over multiple reducers; plain join does not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // AQE would re-coalesce tiny test data; a broadcast dim would mean
    // neither side shuffles at all — force the shuffle-join shape the
    // operator exists for
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 90% of the fact hits key 1 — the classic straggler shape
      val fact = spark.range(0, 20000)
        .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 100).as("key"),
          col("id").as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("key"), (col("id") * 7).as("attr"))
      def partitionsOfHotKey(df: org.apache.spark.sql.DataFrame): Long =
        df.where(col("key") === 1L).select(spark_partition_id()).distinct().count()
      val plain = fact.join(dim, "key")
      val salted = graft.operators.SaltedJoin.join(fact, dim, "key", salts = 4)
      assert(salted.count() === plain.count())
      assert(partitionsOfHotKey(plain) === 1L)
      assert(partitionsOfHotKey(salted) > 1L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
      // restoring ONLY adaptive leaked threshold=-1 into the shared
      // session and flipped later suites' broadcast plan asserts to
      // SortMergeJoin depending on suite interleaving
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    }
  }

  test("a2: merged HLL union estimate is within 5% of exact overall") {
    val rows = AnalyticsQueries.queries("a2_sketch_merge")(spark, sf).collect()
    val all = rows.find(_.getAs[String]("event_type") == "(all)").get
    val approx = all.getAs[Long]("approx_users")
    val exact = all.getAs[Long]("exact_users")
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"approx=$approx exact=$exact")
    // per-type estimates exist for every type and are positive
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getAs[Long]("approx_users") > 0))
  }

  test("a7: rolling 7-day HLL estimates track the exact rolling distinct within 5%") {
    import org.apache.spark.sql.functions._
    val approx = AnalyticsQueries.retired("a7_rolling_distinct")(spark, sf).collect()
      .map(r => r.getAs[String]("d") -> r.getAs[Long]("approx_users_7d")).toMap
    val ev = graft.queries.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val exact = ev.select(col("d").as("d0")).distinct()
      .join(ev, datediff(col("d0"), col("d")).between(0, 6))
      .groupBy("d0").agg(countDistinct("user_id").as("exact_users"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("d0").toString -> r.getAs[Long]("exact_users")).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (d, a) =>
      val e = exact(d)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"day $d approx=$a exact=$e")
    }
  }

  test("a12: rolling 7-day KMV estimates track the exact rolling distinct within 3/sqrt(k)") {
    import org.apache.spark.sql.functions._
    // the query emits integer sufficient statistics (u_k, n); the
    // estimate (k-1)/(u_k/2^52) — or n exactly when the union held
    // fewer than k hashes — is reconstructed and pinned here
    val k = 64
    val approx = AnalyticsQueries.queries("a12_kmv_rolling")(spark, sf).collect()
      .map { r =>
        val n = r.getAs[Long]("n")
        val est =
          if (n >= k) (k - 1).toDouble / (r.getAs[Long]("u_k") / 4503599627370496.0)
          else n.toDouble
        r.getAs[String]("d") -> est
      }.toMap
    val ev = graft.queries.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val exact = ev.select(col("d").as("d0")).distinct()
      .join(ev, datediff(col("d0"), col("d")).between(0, 6))
      .groupBy("d0").agg(countDistinct("user_id").as("exact_users"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("d0").toString -> r.getAs[Long]("exact_users")).toMap
    assert(approx.keySet === exact.keySet)
    // KMV stderr ~ 1/sqrt(k); 3-sigma bound at k=64 is 37.5%
    approx.foreach { case (d, a) =>
      val e = exact(d)
      assert(math.abs(a - e) / e <= 0.375, s"day $d kmv=$a exact=$e")
    }
  }

  test("a3: approx quantiles land within rank tolerance of the exact answer") {
    import org.apache.spark.sql.functions._
    val approx = AnalyticsQueries.queries("a3_approx_quantiles")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50_approx"), r.getAs[Double]("p90_approx"))).toMap
    val exact = graft.operators.Percentiles.exact(
      graft.queries.events(spark, sf).select("event_type", "value"),
      "value", Seq("event_type"), Seq(0.5, 0.9)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (et, (a50, a90)) =>
      val (e50, e90) = exact(et)
      // accuracy=1000 → rank error ≤ 1/1000; values are dense, allow
      // a generous value tolerance relative to the spread
      val spread = math.max(1.0, math.abs(e90 - e50))
      assert(math.abs(a50 - e50) <= spread * 0.1, s"$et p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= spread * 0.1, s"$et p90: $a90 vs $e90")
    }
  }

  test("a4: theta set ops are exact below 2^lgK and ~5% above it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // exact regime: two overlapping sets below nominal entries
    val small = ((0L until 1000L).map(("a", _)) ++ (500L until 1500L).map(("b", _)))
      .toDF("grp", "v")
    val sk = small.groupBy("grp").agg(theta_sketch_agg(col("v")).as("sk"))
    val a = sk.where(col("grp") === "a").select(col("sk").as("sk_a"))
    val b = sk.where(col("grp") === "b").select(col("sk").as("sk_b"))
    val r = a.crossJoin(b).select(
      theta_sketch_estimate(col("sk_a")).as("ea"),
      theta_sketch_estimate(theta_intersection(col("sk_a"), col("sk_b"))).as("ei"),
      theta_sketch_estimate(theta_union(col("sk_a"), col("sk_b"))).as("eu"),
      theta_sketch_estimate(theta_difference(col("sk_a"), col("sk_b"))).as("ed")).head()
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 500L)
    assert(r.getLong(2) === 1500L)
    assert(r.getLong(3) === 500L) // a \ b
    // estimation regime: 100k distinct through a 2^12 sketch
    val big = (0L until 100000L).toDF("v").agg(theta_sketch_agg(col("v")).as("sk"))
      .select(theta_sketch_estimate(col("sk"))).head().getLong(0)
    assert(math.abs(big - 100000.0) / 100000.0 < 0.05, s"estimate $big")
  }

  test("q16: grouping-set cells are mutually consistent") {
    val rows = AnalyticsQueries.queries("q16_grouping_sets")(spark, sf).collect()
    val byG = rows.groupBy(_.getAs[Long]("g"))
    val totalFromTypes = byG(1L).map(_.getAs[Long]("n")).sum // (event_type) cells
    val totalFromDays = byG(2L).map(_.getAs[Long]("n")).sum  // (d) cells
    val grand = byG(3L).map(_.getAs[Long]("n")).sum          // () cell
    assert(totalFromTypes === grand)
    assert(totalFromDays === grand)
  }

  test("a8: HLL error report — exact side truly exact, every rel_err within ~3x its rsd, deterministic") {
    import org.apache.spark.sql.functions._
    val rows = AnalyticsQueries.queries("a8_hll_error_eval")(spark, sf).collect()
    // 3 rsd rows per event_type
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length === types.length * 3)
    // the exact column matches an independent exact count
    val exact = graft.queries.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("e"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("e")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("exact") === exact(r.getAs[String]("event_type")))
      // HLL's rsd is a standard deviation — 3x is the practical bound
      val bound = 3.0 * r.getAs[Double]("rsd") + 1e-9
      assert(r.getAs[Double]("rel_err") <= bound,
        s"${r.getAs[String]("event_type")} rsd=${r.getAs[Double]("rsd")} rel_err=${r.getAs[Double]("rel_err")}")
    }
    // fixed hash, no sampling: the report is run-to-run deterministic
    val again = AnalyticsQueries.queries("a8_hll_error_eval")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // the one-pass shape (sketches over the deduped relation) is
    // bit-identical to the legacy two-leg shape: HLL registers are
    // duplicate-insensitive, so estimating over distinct (type, user)
    // pairs gives the same e1/e5/e15 as estimating over every event
    val ev = graft.queries.events(spark, sf)
    val legacy = ev.groupBy("event_type").agg(
        approx_count_distinct(col("user_id"), 0.01).as("e1"),
        approx_count_distinct(col("user_id"), 0.05).as("e5"),
        approx_count_distinct(col("user_id"), 0.15).as("e15"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("e1"), r.getAs[Long]("e5"), r.getAs[Long]("e15"))).toMap
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val est = rs.sortBy(_.getAs[Double]("rsd"))
        .map(_.getAs[Long]("est")).toSeq
      val (l1, l5, l15) = legacy(t)
      assert(est === Seq(l1, l5, l15), s"one-pass HLL diverged for $t")
    }
  }

  test("a13: theta day-over-day churn is exact set arithmetic in the sub-nominal regime") {
    import org.apache.spark.sql.functions._
    val rows = AnalyticsQueries.queries("a13_theta_diff")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute one day pair exactly from the fact
    val du = graft.queries.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct().collect()
      .groupBy(_.getDate(0).toString).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val d = r.getAs[String]("d")
      val prev = java.time.LocalDate.parse(d).minusDays(1).toString
      (du.get(d), du.get(prev)) match {
        case (Some(cur), Some(prv)) =>
          assert(r.getAs[Long]("new_users") === (cur -- prv).size.toLong, s"$d new")
          assert(r.getAs[Long]("churned_users") === (prv -- cur).size.toLong, s"$d churned")
          assert(r.getAs[Long]("retained_users") === (cur & prv).size.toLong, s"$d retained")
        case _ => fail(s"day pair missing for $d")
      }
    }
  }

  test("q58: bounded-heap top-3 per customer equals the window row_number answer") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = AnalyticsQueries.queries("q58_topk_per_group")(spark, sf).collect()
    val po = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("rev"))
      .join(spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
    val w = Window.partitionBy("o_custkey").orderBy(col("rev").desc, col("l_orderkey"))
    val want = po.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("o_custkey").as("custkey"), col("rank"),
        col("l_orderkey").cast("long").as("o_orderkey"),
        (floor(col("rev") * 100d + 0.5d) / 100d).as("revenue"))
      .orderBy("custkey", "rank").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, e) => assert(g.toString === e.toString) }
  }
}
