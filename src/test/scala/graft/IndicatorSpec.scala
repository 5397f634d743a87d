package graft

import org.apache.spark.sql.functions._

/** Semantic gates for the round-7 technical-indicator / link-prediction
  * family. The DuckDB oracle proves engine parity; these tests prove the
  * MATH — each recursion is recomputed as a plain Scala loop over the same
  * ordered data and compared bit-for-bit (the fold lambdas are pure double
  * arithmetic, so a correct implementation is exactly equal, not merely
  * close).
  *
  * DuckDB field-order quirk, pinned here for future self: DuckDB 1.0's
  * list_reduce writes struct accumulator fields IN PLACE left to right
  * within one lambda application, so a later field referencing an
  * earlier-updated field reads the NEW value (probed:
  * `(acc, x) -> {'a': acc.a + 1000, 'b': acc.b + acc.a}` over [1,2,3]
  * yields b = 2002, not 1002). Spark's aggregate() evaluates every field
  * from the old accumulator. ts_macd/ts_kalman therefore order fields so
  * no field ever references an acc field that an earlier field overwrote —
  * under that discipline both engines agree exactly.
  */
class IndicatorSpec extends SparkTestBase {

  private def userSeries(uid: Long): Array[Double] =
    U.events(spark, sfDir).filter(col("user_id") === uid)
      .orderBy("ts", "event_id").select("value").collect()
      .map(_.getDouble(0))

  test("ts_macd equals the scalar triple-EWMA loop bit-for-bit") {
    val got = SparkEntry.queries("ts_macd")(spark, sfDir)
      .filter(col("user_id") === 0L).collect().head
    val vs = userSeries(0L)
    var (sig, e12, e26) = (0.0, vs.head, vs.head)
    vs.tail.foreach { x =>
      // sig first, from the OLD e12/e26 — the in-fold lag-1 signal
      sig = 0.2 * (e12 - e26) + 0.8 * sig
      val n12 = 0.15 * x + 0.85 * e12
      val n26 = 0.075 * x + 0.925 * e26
      e12 = n12; e26 = n26
    }
    val macd = e12 - e26
    val fullSig = 0.2 * (e12 - e26) + 0.8 * sig // final-step update
    assert(got.getAs[Double]("macd") == macd)
    assert(got.getAs[Double]("macd_signal") == fullSig)
    assert(got.getAs[Double]("histogram") == macd - fullSig)
  }

  test("ts_kalman equals the scalar filter loop and converges to Riccati") {
    val rows = SparkEntry.queries("ts_kalman")(spark, sfDir).collect()
    val got = rows.find(_.getAs[Long]("user_id") == 0L).get
    val vs = userSeries(0L)
    var (x, p) = (vs.head, 1.0)
    vs.tail.foreach { z =>
      val k = (p + 0.01) / (p + 0.01 + 1.0)
      val nx = x + k * (z - x)
      val np = (1.0 - k) * (p + 0.01)
      x = nx; p = np
    }
    assert(got.getAs[Double]("level") == x)
    assert(got.getAs[Double]("variance") == p)
    // steady-state posterior variance of the random-walk filter:
    // p* = (−q + sqrt(q² + 4q)) / 2 with q = .01 → ≈ 0.0951249…
    val pStar = (-0.01 + math.sqrt(0.01 * 0.01 + 4 * 0.01)) / 2
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("variance") - pStar) < 1e-3,
        s"user ${r.get(0)}: variance ${r.get(3)} far from Riccati $pStar")
    }
  }

  test("ts_rsi stays in [0, 100] and matches a window recount") {
    val rows = SparkEntry.queries("ts_rsi")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("rsi"))) {
        val v = r.getAs[Double]("rsi")
        assert(v >= 0.0 && v <= 100.0, s"rsi out of range: $v")
      }
    }
    // independent recount for one user: emitted rows = max(0, n − 14)
    val n0 = userSeries(0L).length
    val got0 = rows.count(_.getAs[Long]("user_id") == 0L)
    assert(got0 == math.max(0, n0 - 14))
  }

  test("ts_sma_cross directions match the scalar window recomputation") {
    val vs = userSeries(0L).map(v =>
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
    val states = vs.indices.map { i =>
      if (i < 29) 0L
      else {
        val s10 = vs.slice(i - 9, i + 1).sum
        val s30 = vs.slice(i - 29, i + 1).sum
        java.lang.Long.signum(3L * s10 - s30).toLong
      }
    }
    val expected = (30 until vs.length).collect {
      case i if states(i) != 0 && states(i) != states(i - 1) =>
        (i, if (states(i) == 1L) "golden" else "death")
    }
    val got = SparkEntry.queries("ts_sma_cross")(spark, sfDir)
      .filter(col("user_id") === 0L).collect()
      .map(_.getAs[String]("direction")).toSeq
    assert(got == expected.map(_._2).toSeq,
      s"crossings diverge: got $got expected ${expected.map(_._2)}")
  }

  test("graph_link_predict agrees with the jaccard query's common counts") {
    val lp = SparkEntry.queries("graph_link_predict")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        r.getAs[Long]("common")).toMap
    val jc = SparkEntry.queries("graph_jaccard_nbrs")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        r.getAs[Long]("common")).toMap
    assert(lp.keySet == jc.keySet, "edge sets diverge between the siblings")
    lp.foreach { case (k, c) => assert(jc(k) == c, s"common differs at $k") }
    // resource allocation is positive exactly when common > 0
    SparkEntry.queries("graph_link_predict")(spark, sfDir).collect().foreach {
      r =>
        val ra = r.getAs[Double]("resource_alloc")
        assert((r.getAs[Long]("common") > 0) == (ra > 0.0))
        assert(r.getAs[Long]("pref_attach") >= 1L)
    }
  }

  test("agg_boxplot quartiles are ordered and the census is bounded") {
    val rows = SparkEntry.queries("agg_boxplot")(spark, sfDir).collect()
    assert(rows.length == 5) // the five fixture event types
    rows.foreach { r =>
      val (q1, med, q3) = (r.getAs[Long]("q1_qc"), r.getAs[Long]("med_qc"),
        r.getAs[Long]("q3_qc"))
      assert(q1 <= med && med <= q3)
      assert(r.getAs[Long]("iqr_qc") == q3 - q1)
      assert(r.getAs[Long]("n_outliers") >= 0L &&
        r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("agg_cramers_v is a bounded effect size consistent with agg_chi2") {
    val r = SparkEntry.queries("agg_cramers_v")(spark, sfDir).collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"cramers_v out of [0,1]: $v")
    // χ² must equal the exact micro-sum of the per-cell terms agg_chi2 emits
    val cells = SparkEntry.queries("agg_chi2")(spark, sfDir).collect()
    val termSum = cells.map(_.getAs[Long]("term_micro")).sum
    assert(r.getAs[Double]("chi2") == termSum.toDouble / 1000000.0)
    val rl = cells.map(_.getAs[String]("event_type")).distinct.length
    val cl = cells.map(_.getAs[Long]("dow")).distinct.length
    assert(r.getAs[Long]("df") == (rl - 1L) * (cl - 1L))
  }

  test("agg_pareto top-20% share is between 20% and 100%") {
    val rows = SparkEntry.queries("agg_pareto")(spark, sfDir).collect()
    assert(rows.length == 5) // the five market segments
    rows.foreach { r =>
      val share = r.getAs[Long]("top_share_micro")
      // the top-ranked fifth can never own LESS than a fifth of revenue
      assert(share >= 200000L && share <= 1000000L,
        s"${r.get(0)}: share_micro $share out of [2e5, 1e6]")
      assert(r.getAs[Long]("top_n") == (r.getAs[Long]("n_cust") + 4) / 5)
    }
  }

  test("dedup_prefix groups are real multi-doc prefix collisions") {
    val rows = SparkEntry.queries("dedup_prefix")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L)
      assert(r.getAs[String]("prefix").split(" ").length <= 8)
    }
    // keepers are distinct docs (one group per prefix)
    val keepers = rows.map(_.getAs[Long]("keeper"))
    assert(keepers.distinct.length == keepers.length)
  }

  test("ts_hysteresis latches: onsets only fire on 0→1 transitions") {
    val rows = SparkEntry.queries("ts_hysteresis")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("alarm")
      assert(a == 0L || a == 1L)
      if (r.getAs[Boolean]("is_onset")) assert(a == 1L)
    }
    // per (user, type) stream: #onsets == #(0→1 edges) when replayed
    val byKey = rows.groupBy(r => (r.getAs[Long]("user_id"),
      r.getAs[String]("event_type")))
    byKey.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("event_id"))
      var prev = 0L; var edges = 0
      ordered.foreach { r =>
        val a = r.getAs[Long]("alarm")
        if (a == 1L && prev == 0L) edges += 1
        prev = a
      }
      assert(ordered.count(_.getAs[Boolean]("is_onset")) == edges)
    }
  }

  test("win_skyline is the strictly record-breaking price subsequence") {
    val rows = SparkEntry.queries("win_skyline")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rs) =>
      val inDateOrder = rs.sortBy(r => (
        // NTZ timestamps collect as LocalDateTime; ISO toString sort-orders
        r.get(r.fieldIndex("o_orderdate")).toString,
        r.getAs[Long]("o_orderkey")))
      val prices = inDateOrder.map(_.getAs[Double]("o_totalprice"))
      prices.sliding(2).foreach { case Array(a, b) => assert(b > a)
        case _ => () }
    }
  }

  test("dedup_compare agrees with the standalone keeper queries") {
    val card = SparkEntry.queries("dedup_compare")(spark, sfDir).collect()
      .map(r => r.getAs[String]("strategy") -> r.getAs[Long]("n_kept")).toMap
    val nDocs = U.tbl(spark, sfDir, "documents").count()
    assert(card.values.forall(n => n > 0 && n <= nDocs))
    // exact keepers = one per distinct content = dedup_exact's group count
    val exactGroups = SparkEntry.queries("dedup_exact")(spark, sfDir).count()
    assert(card("exact") == exactGroups)
    // near-dup clustering merges at least everything exact dedup merges
    assert(card("near_cluster") <= card("exact"))
    val clusterKeepers = SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("is_keeper")).count()
    assert(card("near_cluster") == clusterKeepers)
  }

  test("emb_pca2 second direction is near-orthogonal to the first") {
    val rows = SparkEntry.queries("emb_pca2")(spark, sfDir).collect()
    assert(rows.length == 64)
    val v1 = rows.map(_.getAs[Long]("pc1").toDouble)
    val v2 = rows.map(_.getAs[Long]("pc2").toDouble)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(v1.map(x => x * x).sum) * math.sqrt(v2.map(x => x * x).sum))
    // integer truncation leaves a small residual; exact orthogonality
    // is impossible in the micro-unit lattice
    assert(cos < 0.02, s"|cos(pc1, pc2)| = $cos")
    assert(v2.exists(_ != 0.0))
  }

  test("graph_ego_2hop equals a brute-force 2-hop recount") {
    val adj = SparkEntry.queries("graph_degree_dist")(spark, sfDir) // warm cache
    adj.collect()
    val got = SparkEntry.queries("graph_ego_2hop")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_1hop"), r.getAs[Long]("n_2hop"))).toMap
    // brute-force from the same support>=2 graph definition
    val li = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perOrder = li.groupBy(_._1).values.map(_.map(_._2).toSet)
    val pairCount = scala.collection.mutable.Map[(Long, Long), Int]()
    perOrder.foreach { s =>
      for (a <- s; b <- s if a < b)
        pairCount((a, b)) = pairCount.getOrElse((a, b), 0) + 1
    }
    val und = pairCount.filter(_._2 >= 2).keys.toSeq
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
    und.foreach { case (a, b) =>
      nbrs(a) = nbrs.getOrElse(a, Set()) + b
      nbrs(b) = nbrs.getOrElse(b, Set()) + a
    }
    nbrs.foreach { case (x, n1) =>
      val twoHop = n1.flatMap(nbrs(_)) - x -- n1
      if (twoHop.nonEmpty) {
        val (d1, d2) = got(x)
        assert(d1 == n1.size.toLong, s"node $x degree")
        assert(d2 == twoHop.size.toLong, s"node $x 2-hop size")
      } else assert(!got.contains(x), s"node $x should have no 2-hop row")
    }
  }

  test("ts_window_funnel levels equal a scalar replay of each user") {
    val got = SparkEntry.queries("ts_window_funnel")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("funnel_level")).toMap
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tus"),
        r.getAs[String]("event_type")))
    val dayUs = 24L * 3600 * 1000 * 1000
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val t1 = rows.filter(_._3 == "click").map(_._2).minOption
      val t2 = t1.flatMap(a => rows.filter(r => r._3 == "view" &&
        r._2 > a && r._2 <= a + dayUs).map(_._2).minOption)
      val t3 = (t1, t2) match {
        case (Some(a), Some(b)) => rows.filter(r => r._3 == "purchase" &&
          r._2 > b && r._2 <= a + dayUs).map(_._2).minOption
        case _ => None
      }
      val lvl = if (t3.isDefined) 3L else if (t2.isDefined) 2L
        else if (t1.isDefined) 1L else 0L
      assert(got(u) == lvl, s"user $u: got ${got(u)} expected $lvl")
    }
  }

  test("text_bm25 equals a scalar recomputation per document") {
    val got = SparkEntry.queries("text_bm25")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val docs = U.tbl(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty))
    val q = Seq("spark", "query", "table")
    val n = docs.length.toLong
    val sdl = docs.map(_._2.length.toLong).sum
    val dfm = q.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    docs.foreach { case (id, toks) =>
      val dl = toks.length.toLong
      val micros = q.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None else {
          val df = dfm(t)
          val idf = math.log((n.toDouble - df + 0.5) / (df.toDouble + 0.5))
          val score = idf * (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble * n / sdl)))
          Some(math.floor(1000000.0 * score).toLong)
        }
      }
      if (micros.nonEmpty)
        assert(got(id) == micros.sum.toDouble / 1000000.0, s"doc $id")
      else assert(!got.contains(id), s"doc $id should have no bm25 row")
    }
  }

  test("agg_ks_test equals a brute-force ECDF sup for every pair") {
    val rows = SparkEntry.queries("agg_ks_test")(spark, sfDir).collect()
    assert(rows.length == 10) // C(5,2) type pairs
    val ev = U.events(spark, sfDir).select(col("event_type"),
      U.cents(col("value")).as("vc")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (sa, sb) = (byType(ta), byType(tb))
      val dnum = (sa ++ sb).distinct.map { v =>
        val ca = sa.count(_ <= v).toLong
        val cb = sb.count(_ <= v).toLong
        math.abs(ca * sb.length - cb * sa.length)
      }.max
      assert(r.getAs[Long]("d_num") == dnum, s"$ta/$tb sup gap")
      val d = r.getAs[Double]("ks_d")
      assert(d >= 0.0 && d <= 1.0)
    }
  }

  test("agg_mannwhitney equals the brute-force doubled U for every pair") {
    val rows = SparkEntry.queries("agg_mannwhitney")(spark, sfDir).collect()
    assert(rows.length == 10)
    val ev = U.events(spark, sfDir).select(col("event_type"),
      U.cents(col("value")).as("vc")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (sa, sb) = (byType(ta), byType(tb))
      // 2U = Σ over (x∈a, y∈b) of 2·[y<x] + [y==x]
      val u2 = sa.map(x =>
        2L * sb.count(_ < x) + sb.count(_ == x)).sum
      assert(r.getAs[Long]("u2") == u2, s"$ta/$tb doubled U")
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0)
      assert(auc == u2.toDouble / (2.0 * (sa.length.toLong * sb.length).toDouble))
    }
  }

  test("ts_decompose reconstructs exactly: 1e6*sc = trend+seasonal+resid") {
    val rows = SparkEntry.queries("ts_decompose")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lhs = 1000000L * r.getAs[Long]("sc")
      val rhs = r.getAs[Long]("trend_micro") +
        r.getAs[Long]("seasonal_micro") + r.getAs[Long]("resid_micro")
      assert(lhs == rhs, s"reconstruction broke at ${r.get(0)}/${r.get(1)}")
    }
  }

  test("ts_stochastic %K in range and %D is the 3-lag mean of %K") {
    val rows = SparkEntry.queries("ts_stochastic")(spark, sfDir)
      .filter(col("user_id") === 0L).orderBy("event_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("pct_k"))) {
        val k = r.getAs[Double]("pct_k")
        assert(k >= 0.0 && k <= 100.0)
      }
    }
  }
}
