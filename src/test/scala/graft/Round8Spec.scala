package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-8 operators, each checked against an
  * independent scalar-loop recomputation (the IndicatorSpec discipline:
  * the DataFrame kernel and a hand-rolled reference must agree bit-for-bit
  * on the fixture, so a Catalyst rewrite or window-frame regression cannot
  * pass silently even when the DuckDB oracle is also wrong the same way). */
class Round8Spec extends SparkTestBase {

  private def cents(v: Double): Long =
    new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  private def userSeries(uid: Long): Seq[Long] =
    U.events(spark, sfDir).filter(col("user_id") === uid)
      .orderBy("ts", "event_id").select("value").collect()
      .map(r => cents(r.getDouble(0))).toSeq

  private def someUser(): Long =
    U.events(spark, sfDir).groupBy("user_id").count()
      .filter(col("count") >= 20).orderBy("user_id")
      .first().getLong(0)

  test("ts_rolling_ols matches a scalar-loop OLS on one user's series") {
    val uid = someUser()
    val ys = userSeries(uid)
    val got = operators.TimeSeries.queries("ts_rolling_ols")(spark, sfDir)
      .filter(col("user_id") === uid).orderBy("ts", "event_id")
      .select("slope", "intercept").collect()
    assert(got.length == ys.length - 9)
    for ((row, i) <- got.zipWithIndex) {
      val win = (i until i + 10).map(j => ((j + 1).toLong, ys(j)))
      val sx = win.map(_._1).sum; val sy = win.map(_._2).sum
      val sxy = win.map(p => p._1 * p._2).sum
      val sxx = win.map(p => p._1 * p._1).sum
      val slope = (10.0 * sxy - sx.toDouble * sy) /
        (100.0 * (10.0 * sxx - sx.toDouble * sx))
      val icpt = (sy.toDouble / 100.0 - slope * sx) / 10.0
      assert(row.getDouble(0) == slope && row.getDouble(1) == icpt,
        s"window $i diverges for user $uid")
    }
  }

  test("ts_hurst_rs matches a scalar recomputation and its R>=0 law") {
    val rows = operators.TimeSeries.queries("ts_hurst_rs")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("r_scaled") >= 0L))
    val uid = someUser()
    val ys = userSeries(uid)
    val n = ys.length.toLong
    val tot = ys.sum
    val devs = ys.scanLeft(0L)(_ + _).drop(1).zipWithIndex
      .map { case (cum, i) => n * cum - (i + 1).toLong * tot }
    val r = rows.find(_.getAs[Long]("user_id") == uid).get
    assert(r.getAs[Long]("r_scaled") == devs.max - devs.min)
  }

  test("ts_perm_entropy is bounded by ln(8) with <=8 patterns") {
    val rows = operators.TimeSeries.queries("ts_perm_entropy")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_patterns") <= 8L)
      val e = r.getAs[Double]("perm_entropy_nats")
      assert(e >= -1e-6 && e <= math.log(8.0) + 1e-6)
    }
  }

  test("ts_burst runs are consecutive hours, each >= 3 long") {
    val rows = operators.TimeSeries.queries("ts_burst")(spark, sfDir).collect()
    rows.foreach { r =>
      val nh = r.getAs[Long]("n_hours")
      assert(nh >= 3L)
      val span = r.getAs[java.sql.Timestamp]("burst_end").getTime -
        r.getAs[java.sql.Timestamp]("burst_start").getTime
      assert(span == (nh - 1) * 3600000L,
        "burst hours are not consecutive")
    }
  }

  test("ts_max_concurrency equals a driver-side sweep line") {
    // independent reference: collect the 30-min-gap sessions, sweep in
    // plain Scala (starts before ends at equal instants), max per day
    val ev = U.events(spark, sfDir)
      .select("user_id", "ts", "event_id")
      .orderBy("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000))
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.map(_._2).sorted
      val b = scala.collection.mutable.ListBuffer[(Long, Long)]()
      var st = ts.head; var last = ts.head
      for (t <- ts.tail) {
        if (t - last > 1800000000L) { b += ((st, last)); st = t }
        last = t
      }
      b += ((st, last)); b
    }.toSeq
    val pts = sessions.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy { case (t, d) => (t, -d) }
    var cur = 0L
    val dayMax = scala.collection.mutable.Map[Long, Long]()
    def day(us: Long): Long = us / 86400000000L
    // entry level of each day = running count before its first point
    val seenDays = scala.collection.mutable.Set[Long]()
    for ((t, d) <- pts) {
      val dy = day(t)
      if (!seenDays(dy)) { seenDays += dy; dayMax(dy) = cur }
      cur += d
      dayMax(dy) = math.max(dayMax(dy), cur)
    }
    val got = operators.TimeSeries.queries("ts_max_concurrency")(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0).getTime * 1000 / 86400000000L,
        r.getLong(1))).toMap
    assert(got.nonEmpty && got == dayMax.toMap,
      s"sweep-line mismatch: got=$got expected=$dayMax")
  }

  test("ts_interarrival matches a driver-side gap recomputation") {
    val uid = someUser()
    val ts = U.events(spark, sfDir).filter(col("user_id") === uid)
      .orderBy("ts", "event_id").select("ts").collect()
      .map(r => r.getTimestamp(0).getTime * 1000 +
        r.getTimestamp(0).getNanos / 1000 % 1000)
    val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }.sorted
    val n = gaps.length
    val med2 =
      if (n % 2 == 1) gaps(n / 2) * 2
      else gaps(n / 2 - 1) + gaps(n / 2)
    val p90 = gaps((9 * n + 9) / 10 - 1)
    val r = operators.TimeSeries.queries("ts_interarrival")(spark, sfDir)
      .filter(col("user_id") === uid).collect().head
    assert(r.getAs[Long]("n_gaps") == n.toLong)
    assert(r.getAs[Long]("min_us") == gaps.head)
    assert(r.getAs[Long]("med_us_x2") == med2)
    assert(r.getAs[Long]("p90_us") == p90)
    assert(r.getAs[Long]("max_us") == gaps.last)
  }

  test("ts_acf_lags: lag-0 normalization means every acf is in [-1, 1]") {
    val rows = operators.TimeSeries.queries("ts_acf_lags")(spark, sfDir)
      .collect()
    assert(rows.length == 5 * 12) // |types| x 12 lags
    rows.foreach { r =>
      val a = r.getAs[Long]("acf_micro")
      assert(a >= -1000000L && a <= 1000000L, s"acf out of range: $r")
    }
  }

  test("agg_trimmed_mean is bracketed by min/mean/max and trims 2k rows") {
    val stats = U.events(spark, sfDir).groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = operators.Aggregations.queries("agg_trimmed_mean")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = stats(r.getString(0))
      assert(r.getAs[Long]("n_kept") == n - 2 * (n / 10))
      val tm = r.getAs[Double]("trimmed_mean")
      assert(tm >= lo && tm <= hi)
    }
  }

  test("agg_mad matches a driver-side median/MAD recomputation") {
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) * 2 else s(n / 2 - 1) + s(n / 2)
    }
    val byType = U.events(spark, sfDir).select("event_type", "value")
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => cents(r.getDouble(1))).toSeq }
    val got = operators.Aggregations.queries("agg_mad")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("median"), r.getAs[Double]("mad")))
      .toMap
    byType.foreach { case (t, xs) =>
      val m2 = med2(xs)
      val mad4 = med2(xs.map(x => math.abs(2 * x - m2)))
      val (n, median, mad) = got(t)
      assert(n == xs.length.toLong)
      assert(median == m2.toDouble / 200.0 && mad == mad4.toDouble / 400.0,
        s"$t MAD diverges")
    }
  }

  test("agg_cohens_d is consistent with per-side means and variances") {
    val r = operators.Aggregations.queries("agg_cohens_d")(spark, sfDir)
      .collect().head
    val d = r.getAs[Double]("cohens_d")
    val pv = r.getAs[Double]("pooled_var")
    assert(pv > 0.0)
    assert(d == (r.getAs[Double]("mean_click") -
      r.getAs[Double]("mean_purchase")) / math.sqrt(pv) ||
      math.abs(d - (r.getAs[Double]("mean_click") -
        r.getAs[Double]("mean_purchase")) / math.sqrt(pv)) < 1e-12)
  }

  test("graph_degree_gini equals the single-sort reference formula") {
    val degs = operators.Graphs.pagerankEdgeFrame(spark, sfDir)
      .collect().map(_.getLong(0)).groupBy(identity)
      .map { case (u, es) => u -> es.length.toLong }
    val sorted = degs.toSeq.sortBy { case (u, dg) => (dg, u) }.map(_._2)
    val n = sorted.length.toLong
    val sx = sorted.sum
    val iwx = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expect = BigInt(1000000) * (2 * BigInt(iwx) - BigInt(n + 1) * sx) /
      (BigInt(n) * sx)
    val r = operators.Graphs.queries("graph_degree_gini")(spark, sfDir)
      .collect().head
    U.releaseTracked()
    assert(r.getAs[Long]("n_nodes") == n && r.getAs[Long]("sum_deg") == sx)
    assert(BigInt(r.getAs[Long]("gini_micro")) == expect,
      "blocked-prefix gini diverges from the single-sort reference")
  }

  test("pipeline_token_budget keeps exactly the greedy best-score prefix") {
    // independent reference: collect (doc, tokens, score), sort by
    // (score desc, doc_id), accumulate until 5*cum > total
    val docs = U.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), toks.length.toLong, toks.distinct.length.toLong)
      }.filter(_._2 > 0)
    val total = docs.map(_._2).sum
    val ordered = docs.map { case (id, nt, nd) =>
      (id, nt, 1000000L * nd / nt) }.sortBy { case (id, _, s) => (-s, id) }
    var cum = 0L
    val expected = ordered.takeWhile { case (_, nt, _) =>
      cum += nt; 5L * cum <= total }.map(_._1).toSet
    val got = llm.Pipeline.queries("pipeline_token_budget")(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got.nonEmpty && got == expected,
      s"budget cut diverges: extra=${got -- expected} missing=${expected -- got}")
  }

  test("agg_spearman is exactly 1 for a column against itself") {
    // drive the same midrank construction on value-vs-value: every pair of
    // doubled ranks is identical, so the ratio must be exactly 1.0
    import org.apache.spark.sql.expressions.Window
    val wv = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val pv = wv.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val r2 = rank().over(wv).cast("long") + count(lit(1)).over(pv)
    val g = U.events(spark, sfDir)
      .withColumn("rx", r2).withColumn("ry", r2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("sxy"),
        sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("syy"))
      .select((expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
        (sqrt(expr("CAST(n * sxx - sx * sx AS DOUBLE)")) *
          sqrt(expr("CAST(n * syy - sy * sy AS DOUBLE)")))).as("rho"))
      .collect()
    // x / (sqrt(x)*sqrt(x)) reconstructs 1 only to ULP precision — the
    // sqrt pair rounds; both ENGINES round identically (hash gate), but
    // the mathematical law carries a tolerance
    assert(g.nonEmpty && g.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
    // and the declared query stays inside [-1, 1]
    val sp = operators.Aggregations.queries("agg_spearman")(spark, sfDir)
      .collect().map(_.getAs[Double]("spearman"))
    assert(sp.nonEmpty && sp.forall(v => v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12))
  }

  test("agg_ecdf is monotone in the probe and bounded by 1") {
    val rows = operators.Aggregations.queries("agg_ecdf")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getAs[Long]("probe"),
        r.getAs[Double]("ecdf")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val byProbe = g.sortBy(_._2).map(_._3)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b })
      assert(byProbe.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("agg_jsd total is non-negative and bounded by ln 2") {
    val rows = operators.Aggregations.queries("agg_jsd")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val jsd = rows.map(r => r.getAs[Long]("term_p_micro") +
      r.getAs[Long]("term_q_micro")).sum / 2.0e6
    // micro-flooring can dip a zero-divergence bucket epsilon-negative
    assert(jsd >= -1e-4 && jsd <= math.log(2.0) + 1e-4, s"jsd=$jsd")
  }

  test("sim_hamming_topk matches a driver-side popcount rerank") {
    val emb = U.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sigOf(v: Array[Float]): Long =
      v.zipWithIndex.filter(_._1 > 0).map(p => 1L << p._2).foldLeft(0L)(_ | _)
    val sigs = emb.map { case (id, v) => id -> sigOf(v) }
    val got = llm.Similarity.queries("sim_hamming_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("hamming")))
    assert(got.nonEmpty)
    for (q <- got.map(_._1).distinct) {
      val expected = sigs.toSeq.filter(_._1 != q)
        .map { case (id, s) =>
          (id, java.lang.Long.bitCount(s ^ sigs(q)).toLong) }
        .sortBy { case (id, h) => (h, id) }.take(3)
      val mine = got.filter(_._1 == q).sortBy(_._2)
        .map(t => (t._3, t._4)).toSeq
      assert(mine == expected, s"probe $q rerank diverges")
    }
  }

  test("text_readability matches the hand formula on one document") {
    val row = llm.TextAnalysis.queries("text_readability")(spark, sfDir)
      .first()
    val w = row.getAs[Long]("n_words").toDouble
    val s2 = row.getAs[Long]("n_sentences").toDouble
    val sy = row.getAs[Long]("n_syllables").toDouble
    assert(row.getAs[Double]("flesch") ==
      206.835 - 1.015 * (w / s2) - 84.6 * (sy / w))
  }

  test("graph_katz matches a driver-side two-hop recomputation") {
    val edges = operators.Graphs.pagerankEdgeFrame(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ind = edges.groupBy(_._2).map { case (v, es) => v -> es.length.toLong }
    val p2 = edges.groupBy(_._2).map { case (v, es) =>
      v -> es.map(e => ind.getOrElse(e._1, 0L)).sum }
    val expected = ind.map { case (v, d) =>
      v -> (1000000L + 1000000L * d / 8 + 1000000L * p2(v) / 64) }
      .toSeq.sortBy { case (v, k) => (-k, v) }.take(50)
    val got = operators.Graphs.queries("graph_katz")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("katz_micro")))
    U.releaseTracked()
    assert(got.toSeq == expected, "katz top-50 diverges from the reference")
  }

  test("agg_anova matches a BigInt recomputation of the identical op tree") {
    val raw = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")).as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = raw.groupBy(_._1).map { case (_, xs) =>
      val vs = xs.map(_._2)
      (BigInt(vs.length), vs.map(BigInt(_)).sum,
        vs.map(v => BigInt(v) * v).sum)
    }.toSeq
    val k = BigInt(groups.length)
    val n = groups.map(_._1).sum
    val stot = groups.map(_._2).sum
    val ssb = groups.map { case (ng, sg, _) =>
      val dev = n * sg - ng * stot; (dev * dev) / (ng * n * n) }.sum
    val ssw = groups.map { case (ng, sg, qg) => (ng * qg - sg * sg) / ng }.sum
    val f = (ssb * (n - k) * 1000000) / (ssw * (k - 1))
    val row = operators.Aggregations.queries("agg_anova")(spark, sfDir).first()
    assert(row.getAs[Long]("n_groups") == k.toLong &&
      row.getAs[Long]("n") == n.toLong &&
      row.getAs[Long]("ssb_c2") == ssb.toLong &&
      row.getAs[Long]("ssw_c2") == ssw.toLong &&
      row.getAs[Long]("f_micro") == f.toLong,
      s"anova diverges: got $row want ($k, $n, $ssb, $ssw, $f)")
  }

  test("agg_cohen_kappa matches an exact confusion-matrix recomputation") {
    val raw = U.events(spark, sfDir)
      .select(U.cents(col("value")).as("vc"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("kk"))
      .collect().map(r => (math.min(r.getLong(0), 49999L) / 10000,
        r.getLong(1) / 20))
    val n = raw.length.toLong
    val diag = raw.count { case (a, b) => a == b }.toLong
    val rows = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cols = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pe = rows.map { case (i, r) => r * cols.getOrElse(i, 0L) }.sum
    val kap = (BigInt(1000000) * (BigInt(n) * diag - pe)) /
      (BigInt(n) * n - pe)
    val row = operators.Aggregations
      .queries("agg_cohen_kappa")(spark, sfDir).first()
    assert(row.getAs[Long]("n") == n && row.getAs[Long]("diag") == diag &&
      row.getAs[Long]("kappa_micro") == kap.toLong &&
      math.abs(row.getAs[Long]("kappa_micro")) <= 1000000L,
      s"kappa diverges: got $row want (n=$n diag=$diag kappa=$kap)")
  }

  test("ts_ljung_box: Q >= 0, 12 lags, and one type matches a scalar ACF") {
    val rows = operators.TimeSeries.queries("ts_ljung_box")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Long]("q_micro") >= 0L &&
      r.getAs[Long]("n_lags") == 12L))
    // scalar recomputation for one type: densified hourly grid -> n-scaled
    // deviations -> acf_micro -> Ljung-Box terms, all in BigInt
    val et = rows.head.getString(0)
    val hourly = U.events(spark, sfDir).filter(col("event_type") === et)
      .groupBy(expr("unix_micros(date_trunc('HOUR', ts)) DIV 3600000000")
        .as("h"))
      .agg(sum(U.cents(col("value"))).as("xc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (h0, h1) = (hourly.keys.min, hourly.keys.max)
    val xs = (h0 to h1).map(h => BigInt(hourly.getOrElse(h, 0L)))
    val n = BigInt(xs.length)
    val ssum = xs.sum
    val dev = xs.map(x => n * x - ssum)
    val den = dev.map(d => d * d).sum
    val q = (1 to 12).map { lag =>
      val num = (0 until xs.length - lag)
        .map(i => dev(i) * dev(i + lag)).sum
      val acf = (BigInt(1000000) * num) / den
      (n * (n + 2) * acf * acf) / ((n - lag) * 1000000)
    }.sum
    val got = rows.find(_.getString(0) == et).get
    assert(got.getAs[Long]("n") == n.toLong &&
      got.getAs[Long]("q_micro") == q.toLong,
      s"ljung-box for $et diverges: got $got want (n=$n q=$q)")
  }

  test("graph_scc matches a driver-side BFS SCC on the capped subgraph") {
    val li = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dirE = li.groupBy(_._1).values.flatMap { lines0 =>
      val lines = lines0.toSeq
      for {
        a <- lines; b <- lines
        if a._3 < b._3 && a._2 != b._2
      } yield (a._2, b._2)
    }.toSet
    val deg = dirE.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length).toSeq
    val top = deg.sortBy { case (nd, dg) => (-dg, nd) }.take(60).map(_._1).toSet
    val sub = dirE.filter(e => top(e._1) && top(e._2))
    val adj = sub.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def reach(s0: Long): Set[Long] = {
      var seen = Set(s0); var frontier = List(s0)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(x => adj.getOrElse(x, Nil))
          .filterNot(seen)
        seen ++= frontier
      }
      seen
    }
    val reachOf = top.map(v => v -> reach(v)).toMap
    val sccId = top.map(v =>
      v -> reachOf(v).filter(u => top(u) && reachOf(u)(v)).min).toMap
    val sizes = sccId.values.groupBy(identity).view.mapValues(_.size.toLong)
    val expected = sccId.toSeq.sortBy(_._1)
      .map { case (v, s2) => (v, s2, sizes(s2)) }
    val got = operators.Graphs.queries("graph_scc")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("scc_id"),
        r.getAs[Long]("scc_size"))).toSeq
    U.releaseTracked()
    assert(got == expected, "SCC labeling diverges from the driver BFS")
  }

  test("graph_ktruss matches a driver-side 8-round peel") {
    val li = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.groupBy(identity[(Long, Long)])
      // .iterator first: collect on a Map with a tuple-valued function
      // would rebuild a MAP and collapse edges by their first node
      .iterator.collect { case (e, os) if os.size >= 2 => e }
      .toArray.sorted
    def support(es: Array[(Long, Long)]): Map[(Long, Long), Long] = {
      val nbr = es.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      es.map(e => e -> (nbr(e._1) & nbr(e._2)).size.toLong).toMap
    }
    for (_ <- 0 until 8) {
      val sup = support(edges)
      edges = edges.filter(sup(_) >= 1L)
    }
    val fin = support(edges)
    val expected = edges.toSeq.filter(fin(_) > 0L)
      .map(e => (e._1, e._2, fin(e)))
    val got = operators.Graphs.queries("graph_ktruss")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("support"))).toSeq
    U.releaseTracked()
    assert(got == expected, "3-truss peel diverges from the driver peel")
  }

  test("dedup_paragraph matches a driver-side hash recomputation") {
    val M = 1000000007L
    def poly(t: String): Long =
      t.foldLeft(11L)((acc, c) => ((acc * 31 + c.toInt) % M + M) % M)
    val texts = U.tbl(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val paras = texts.flatMap { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      tk.grouped(10).map(w => (id, poly(w.mkString("_"))))
    }
    val nd = paras.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
    val expected = paras.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (id, ps) =>
        val dup = ps.count(p => nd(p._2) > 1).toLong
        (id, ps.length.toLong, dup, 1000000L * dup / ps.length)
    }
    val got = llm.Dedup.queries("dedup_paragraph")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_dup"), r.getAs[Long]("dup_micro"))).toSeq
    assert(got == expected, "paragraph dedup diverges from the driver hash")
  }

  test("agg_winsorized_mean matches a scalar clamp and brackets the mean") {
    val raw = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")).as("vc"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = operators.Aggregations
      .queries("agg_winsorized_mean")(spark, sfDir).collect()
    for (row <- rows) {
      val et = row.getString(0)
      val vs = raw.filter(_._1 == et).sortBy(t => (t._2, t._3)).map(_._2)
      val n = vs.length
      val k = n / 10
      val clamped = vs.zipWithIndex.map { case (v, i) =>
        if (i < k) vs(k) else if (i >= n - k) vs(n - k - 1) else v }
      assert(row.getAs[Long]("n") == n.toLong &&
        row.getAs[Long]("lo") == vs(k) &&
        row.getAs[Long]("hi") == vs(n - k - 1) &&
        row.getAs[Double]("winsorized_mean") ==
          clamped.sum.toDouble / (100.0 * n),
        s"winsorized mean for $et diverges")
    }
  }

  test("ts_haar_energy matches a scalar wavelet cascade for one type") {
    val rows = operators.TimeSeries.queries("ts_haar_energy")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val et = rows.head.getString(0)
    val hourly = U.events(spark, sfDir).filter(col("event_type") === et)
      .groupBy(expr("unix_micros(date_trunc('HOUR', ts)) DIV 3600000000")
        .as("h"))
      .agg(sum(U.cents(col("value"))).as("xc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (h0, h1) = (hourly.keys.min, hourly.keys.max)
    var xs = (h0 to h1).map(h => BigInt(hourly.getOrElse(h, 0L))).toVector
    val got = rows.find(_.getString(0) == et).get
    assert(got.getAs[Long]("n") == xs.length.toLong)
    for (lvl <- 1 to 3) {
      val pairs = xs.grouped(2).toVector
      val e = pairs.map(p =>
        if (p.length == 2) (p(0) - p(1)) * (p(0) - p(1)) else p(0) * p(0)).sum
      assert(got.getAs[Long](s"e$lvl") == e.toLong,
        s"level-$lvl Haar energy for $et diverges")
      xs = pairs.map(_.sum)
    }
  }

  test("ts_twap matches a BigInt time-weighted recomputation per user") {
    val raw = U.events(spark, sfDir)
      .select(col("user_id"), U.cents(col("value")).as("vc"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = operators.TimeSeries.queries("ts_twap")(spark, sfDir)
      .collect()
    for (row <- rows) {
      val uid = row.getAs[Long]("user_id")
      val seq2 = raw.filter(_._1 == uid).sortBy(t => (t._3, t._4))
      val segs = seq2.sliding(2).collect {
        case Array(a, b) => (BigInt(a._2), BigInt(b._3 - a._3))
      }.toSeq
      val dur = segs.map(_._2).sum
      val num = segs.map(s2 => s2._1 * s2._2).sum
      assert(row.getAs[Long]("n_segments") == segs.length.toLong &&
        row.getAs[Long]("dur_us") == dur.toLong &&
        row.getAs[Long]("twap_micro") ==
          ((BigInt(1000000) * num) / (100 * dur)).toLong,
        s"TWAP for user $uid diverges")
    }
  }

  test("graph_reciprocity matches a driver-side mutual-edge count") {
    val li = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dirE = li.groupBy(_._1).values.flatMap { lines0 =>
      val lines = lines0.toSeq
      for (a <- lines; b <- lines if a._3 < b._3 && a._2 != b._2)
        yield (a._2, b._2)
    }.toSet
    val recip = dirE.count(e => dirE((e._2, e._1))).toLong
    val row = operators.Graphs.queries("graph_reciprocity")(spark, sfDir)
      .first()
    U.releaseTracked()
    assert(row.getAs[Long]("n_edges") == dirE.size.toLong &&
      row.getAs[Long]("n_reciprocal") == recip &&
      row.getAs[Long]("recip_micro") == 1000000L * recip / dirE.size)
  }

  test("sql_pivot_syntax cells sum back to the un-pivoted total") {
    val rows = operators.SqlText.queries("sql_pivot_syntax")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    val cells = rows.flatMap(r => Seq("o", "f", "p").map(c =>
      Option(r.getAs[java.lang.Long](c)).map(_.toLong).getOrElse(0L))).sum
    val total = U.tbl(spark, sfDir, "lineitem")
      .agg(sum(U.cents(col("l_quantity")))).first().getLong(0)
    assert(cells == total, s"pivot cells $cells != total $total")
  }

  test("ts_binseg matches a scalar two-level CUSUM segmentation") {
    val rows = operators.TimeSeries.queries("ts_binseg")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    for (row <- rows) {
      val et = row.getString(0)
      val hourly = U.events(spark, sfDir).filter(col("event_type") === et)
        .groupBy(expr("unix_micros(date_trunc('HOUR', ts)) DIV 3600000000")
          .as("h"))
        .agg(sum(U.cents(col("value"))).as("xc"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val (h0, h1) = (hourly.keys.min, hourly.keys.max)
      val xs = (h0 to h1).map(h => BigInt(hourly.getOrElse(h, 0L))).toVector
      // best split of xs[from until to) by |n·S1(k) − k·S|, earliest wins;
      // returns (absolute index of last-left element, stat)
      def best(from: Int, to: Int): Option[(Long, BigInt)] = {
        val seg = xs.slice(from, to)
        if (seg.length < 2) return None
        val n = BigInt(seg.length)
        val s2 = seg.sum
        var st = BigInt(0)
        var bi = -1; var bs = BigInt(-1)
        for (k <- 1 until seg.length) {
          st += seg(k - 1)
          val stat = (n * st - k * s2).abs
          if (stat > bs) { bs = stat; bi = k }
        }
        Some(((from + bi - 1).toLong, bs))
      }
      val n = xs.length
      val Some((cut1, stat1)) = best(0, n)
      val k1 = (cut1 + 1).toInt
      val l = best(0, k1)
      val r = best(k1, n)
      def cell(c: String): Option[Long] =
        Option(row.getAs[java.lang.Long](c)).map(_.toLong)
      assert(row.getAs[Long]("n") == n.toLong &&
        row.getAs[Long]("k1") == k1.toLong &&
        row.getAs[Long]("stat1") == stat1.toLong &&
        cell("cut_l") == l.map(_._1) &&
        cell("stat_l") == l.map(_._2.toLong) &&
        cell("cut_r") == r.map(_._1) &&
        cell("stat_r") == r.map(_._2.toLong),
        s"binseg for $et diverges: $row vs ($n, $k1, $stat1, $l, $r)")
    }
  }

  test("typed_agg equals the untyped cents aggregate") {
    val typed = operators.TypedApi.queries("typed_agg")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val untyped = U.tbl(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        (sum(U.cents(col("o_totalprice"))).cast("double") / 100.0).as("tv"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(typed.sameElements(untyped))
  }

  test("agg_levene matches a BigInt recomputation on median deviations") {
    val raw = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")).as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = raw.groupBy(_._1).map { case (_, xs) =>
      val vs = xs.map(_._2).sorted
      val n = vs.length
      val med2 = if (n % 2 == 1) vs(n / 2) * 2 else vs(n / 2 - 1) + vs(n / 2)
      val zs = xs.map(t => BigInt((t._2 * 2 - med2).abs))
      (BigInt(zs.length), zs.sum, zs.map(z => z * z).sum)
    }.toSeq
    val k = BigInt(groups.length)
    val n = groups.map(_._1).sum
    val stot = groups.map(_._2).sum
    val ssb = groups.map { case (ng, sg, _) =>
      val dev = n * sg - ng * stot; (dev * dev) / (ng * n * n) }.sum
    val ssw = groups.map { case (ng, sg, qg) => (ng * qg - sg * sg) / ng }.sum
    val wStat = (ssb * (n - k) * 1000000) / (ssw * (k - 1))
    val row = operators.Aggregations.queries("agg_levene")(spark, sfDir)
      .first()
    assert(row.getAs[Long]("ssb_z2") == ssb.toLong &&
      row.getAs[Long]("ssw_z2") == ssw.toLong &&
      row.getAs[Long]("w_micro") == wStat.toLong,
      s"levene diverges: $row vs ($ssb, $ssw, $wStat)")
  }

  test("emb_hard_negatives: cross-label, ranked, and rank-1 is the argmax") {
    val rows = llm.Similarity.queries("emb_hard_negatives")(spark, sfDir)
      .collect()
    assert(rows.length == 150)
    assert(rows.forall(r =>
      r.getAs[Long]("neg_label") != r.getAs[Long]("anchor_label")))
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.values.forall { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      sorted.map(_.getAs[Long]("rank")).sameElements(Array(1L, 2L, 3L)) &&
        sorted.sliding(2).forall(p =>
          p(0).getAs[Double]("cos") >= p(1).getAs[Double]("cos"))
    })
    // rank-1 for anchor 0 equals the driver-side fixed-point argmax
    val emb = U.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6).toLong)
          .toArray))
    val a0 = emb.find(_._1 == 0L).get
    val best = emb.filter(_._2 != a0._2).map { case (id, _, fx) =>
      val dot = a0._3.zip(fx).map(p => p._1 * p._2).sum
      val cos = dot.toDouble /
        (math.sqrt(a0._3.map(x => x * x).sum.toDouble) *
          math.sqrt(fx.map(x => x * x).sum.toDouble))
      (id, cos)
    }.maxBy { case (id, c) => (c, -id) }
    val got1 = rows.find(r => r.getAs[Long]("q_id") == 0L &&
      r.getAs[Long]("rank") == 1L).get
    assert(got1.getAs[Long]("neg_id") == best._1 &&
      got1.getAs[Double]("cos") == best._2,
      "anchor-0 hard negative diverges from the driver argmax")
  }

  // (day-millis, high, low, close, vol) daily cents bars for one type,
  // close tie-broken by (ts, event_id) — the scalar mirror of the
  // ts_atr/ts_obv daily-bar hash-agg
  private def dailyBars(et: String): Seq[(Long, Long, Long, Long, Long)] = {
    val rows = U.events(spark, sfDir).filter(col("event_type") === et)
      .select(to_date(col("ts")).as("day"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
    rows.groupBy(_.getDate(0).getTime).toSeq.sortBy(_._1).map {
      case (day, rs) =>
        val vcs = rs.map(r => (r.getLong(1), r.getLong(2), cents(r.getDouble(3))))
        val close = vcs.maxBy(t => (t._1, t._2))._3
        (day, vcs.map(_._3).max, vcs.map(_._3).min, close, vcs.length.toLong)
    }
  }

  test("ts_atr matches a scalar true-range loop on one type's daily bars") {
    val bars = dailyBars("click")
    val trs = bars.zipWithIndex.map { case ((_, hi, lo, _, _), i) =>
      if (i == 0) hi - lo
      else {
        val pc = bars(i - 1)._4
        Seq(hi - lo, math.abs(hi - pc), math.abs(lo - pc)).max
      }
    }
    val got = operators.TimeSeries.queries("ts_atr")(spark, sfDir)
      .filter(col("event_type") === "click").orderBy("day").collect()
    assert(got.length == bars.length && got.nonEmpty)
    for ((row, i) <- got.zipWithIndex) {
      assert(row.getAs[Long]("tr_c") == trs(i), s"TR diverges at bar $i")
      val win = trs.slice(math.max(0, i - 6), i + 1)
      assert(row.getAs[Double]("atr") == win.sum.toDouble / (100.0 * win.length),
        s"ATR diverges at bar $i")
    }
  }

  test("ts_obv matches the scalar signed-volume accumulation") {
    val bars = dailyBars("purchase")
    var obv = 0L
    val expected = bars.zipWithIndex.map { case ((_, _, _, close, vol), i) =>
      if (i > 0) {
        val pc = bars(i - 1)._4
        if (close > pc) obv += vol else if (close < pc) obv -= vol
      }
      obv
    }
    val got = operators.TimeSeries.queries("ts_obv")(spark, sfDir)
      .filter(col("event_type") === "purchase").orderBy("day").collect()
    assert(got.length == bars.length && got.nonEmpty)
    for ((row, i) <- got.zipWithIndex)
      assert(row.getAs[Long]("obv") == expected(i) &&
        row.getAs[Long]("close_c") == bars(i)._4, s"OBV diverges at bar $i")
  }

  // daily cents totals per type — shared by the Mann–Kendall and beta tests
  private def dailyTotals(): Map[String, Seq[(Long, Long)]] =
    U.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (et, rs) =>
        et -> rs.groupBy(_.getDate(1).getTime).toSeq.sortBy(_._1)
          .map { case (d, xs) => (d, xs.map(r => cents(r.getDouble(2))).sum) }
      }

  test("ts_mann_kendall matches the scalar pairwise S and tie formula") {
    val daily = dailyTotals()
    val got = operators.TimeSeries.queries("ts_mann_kendall")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == daily.size)
    for ((et, series) <- daily) {
      val xs = series.map(_._2)
      val n = xs.length.toLong
      val sStat = (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val tieTerm = xs.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
      val z =
        if (sStat > 0) (sStat - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
        else if (sStat < 0) (sStat + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
        else 0.0
      val r = got(et)
      assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("s_stat") == sStat &&
        r.getAs[Long]("var18") == var18 && r.getAs[Double]("z") == z,
        s"Mann–Kendall diverges for $et")
    }
  }

  test("ts_beta matches the scalar power-sum regression per type") {
    val daily = dailyTotals()
    val market = daily.values.flatten
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    val got = operators.TimeSeries.queries("ts_beta")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, series) <- daily) {
      val pts = series.map { case (d, x) => (BigInt(x), BigInt(market(d))) }
      val nd = pts.length.toDouble
      val sx = pts.map(_._1).sum.toDouble; val sm = pts.map(_._2).sum.toDouble
      val sxm = pts.map(p => p._1 * p._2).sum.toDouble
      val smm = pts.map(p => p._2 * p._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val cov = sxm / nd - (sx / nd) * (sm / nd)
      val varM = smm / nd - (sm / nd) * (sm / nd)
      val varX = sxx / nd - (sx / nd) * (sx / nd)
      val r = got(et)
      assert(r.getAs[Double]("beta") == cov / varM &&
        r.getAs[Double]("alpha_c") == sx / nd - (cov / varM) * (sm / nd) &&
        r.getAs[Double]("r2") == cov * cov / (varX * varM),
        s"beta diverges for $et")
      assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0 + 1e-12)
    }
  }

  test("agg_wasserstein matches a scalar ECDF-area recomputation and its mean-gap lower bound") {
    val ev = U.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val support = ev.map(_._2).distinct.sorted
    val nAll = ev.length.toLong
    val got = SparkEntry.queries("agg_wasserstein")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for (et <- ev.map(_._1).distinct) {
      val mine = ev.filter(_._1 == et).map(_._2)
      val nT = mine.length.toLong
      val cntT = mine.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
      val cntAll = ev.map(_._2).groupBy(identity)
        .map { case (v, xs) => v -> xs.length.toLong }
      var cumT = BigInt(0)
      var cumAll = BigInt(0)
      var num = BigInt(0)
      for (i <- support.indices.dropRight(1)) {
        cumT += BigInt(cntT.getOrElse(support(i), 0L))
        cumAll += BigInt(cntAll(support(i)))
        num += (cumT * nAll - cumAll * nT).abs * (support(i + 1) - support(i))
      }
      val w1 = num.toDouble / (nT.toDouble * nAll.toDouble * 100.0)
      val r = got(et)
      assert(r.getAs[Long]("n_t") == nT && r.getAs[Double]("w1") == w1,
        s"W1 diverges for $et")
      // W1(P, Q) >= |E_P X - E_Q X| — the transport cost of moving the mean
      val meanGap = math.abs(
        mine.sum.toDouble / (100.0 * nT) -
          ev.map(_._2).sum.toDouble / (100.0 * nAll))
      assert(w1 >= meanGap - 1e-9, s"mean-gap bound violated for $et")
    }
  }

  test("agg_jarque_bera shares agg_moments' S and K and closes n/6*(S^2+K^2/4)") {
    val moments = SparkEntry.queries("agg_moments")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val got = SparkEntry.queries("agg_jarque_bera")(spark, sfDir).collect()
    assert(got.length == moments.size)
    for (r <- got) {
      val m = moments(r.getString(0))
      val sk = m.getAs[Double]("skewness")
      val ek = m.getAs[Double]("excess_kurtosis")
      assert(r.getAs[Double]("skewness") == sk &&
        r.getAs[Double]("excess_kurtosis") == ek,
        s"moment trees diverge for ${r.getString(0)}")
      assert(r.getAs[Double]("jb") ==
        r.getAs[Long]("n").toDouble / 6.0 * (sk * sk + ek * ek / 4.0))
      assert(r.getAs[Double]("jb") >= 0.0)
    }
  }

  test("graph_rich_club matches a scalar recomputation of phi at every k") {
    val li = U.tbl(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { rs =>
      val pks = rs.map(_._2).distinct.toSeq
      for (u <- pks; v <- pks if u < v) yield (u, v)
    }.toSet
    val deg: Map[Long, Long] = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(x => x).map { case (n, xs) => n -> xs.length.toLong }
    val got = SparkEntry.queries("graph_rich_club")(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("k")).toSeq == Seq(2L, 4L, 8L, 16L, 32L))
    for (r <- got) {
      val k = r.getAs[Long]("k")
      val nK = deg.values.count(_ > k).toLong
      val eK = edges.count(e => deg(e._1) > k && deg(e._2) > k).toLong
      assert(r.getAs[Long]("n_k") == nK && r.getAs[Long]("e_k") == eK,
        s"rich-club counts diverge at k=$k")
      if (nK > 1)
        assert(r.getAs[Double]("phi") ==
          (2L * eK).toDouble / (nK.toDouble * (nK - 1).toDouble))
      val phi = if (r.isNullAt(r.fieldIndex("phi"))) 0.0
        else r.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0)
    }
    // hub sets shrink as the threshold rises
    val ns = got.map(_.getAs[Long]("n_k"))
    assert(ns.zip(ns.tail).forall(p => p._1 >= p._2))
  }

  test("ts_pacf closes the Durbin–Levinson recursion over ts_acf_lags' output") {
    val acf = operators.TimeSeries.queries("ts_acf_lags")(spark, sfDir)
      .filter(col("lag") <= 3).collect()
      .groupBy(_.getString(0))
      .map { case (et, rs) =>
        et -> rs.map(r => r.getAs[Long]("lag") -> r.getAs[Long]("acf_micro")).toMap
      }
    val got = operators.TimeSeries.queries("ts_pacf")(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == acf.size)
    for (r <- got) {
      val a = acf(r.getString(0))
      val r1 = a(1L) / 1000000.0; val r2 = a(2L) / 1000000.0
      val r3 = a(3L) / 1000000.0
      val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      val phi21 = r1 - p2 * r1
      val p3 = (r3 - phi21 * r2 - p2 * r1) / (1.0 - phi21 * r1 - p2 * r2)
      assert(r.getAs[Double]("pacf1") == r1 && r.getAs[Double]("pacf2") == p2 &&
        r.getAs[Double]("pacf3") == p3,
        s"PACF diverges for ${r.getString(0)}")
      assert(math.abs(r.getAs[Double]("pacf1")) <= 1.0)
    }
  }

  test("ts_event_study pools exactly the daily cells inside the offset window") {
    val rows = U.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayi"), col("value"))
      .collect()
    val daily = rows.groupBy(r => (r.getLong(0), r.getLong(2)))
      .map { case (k, rs) =>
        k -> (rs.map(r => cents(r.getDouble(3))).sum, rs.length.toLong)
      }
    val anchors = rows.filter(_.getString(1) == "error")
      .map(r => (r.getLong(0), r.getLong(2))).distinct
    val got = operators.TimeSeries.queries("ts_event_study")(spark, sfDir)
      .collect()
    assert(got.map(_.getAs[Long]("off")).toSeq == (-3L to 3L))
    for (r <- got) {
      val off = r.getAs[Long]("off")
      val cells = anchors.flatMap { case (u, d) => daily.get((u, d + off)) }
      assert(r.getAs[Long]("n_cells") == cells.length &&
        r.getAs[Long]("n_events") == cells.map(_._2).sum &&
        r.getAs[Double]("mean_value") ==
          cells.map(_._1).sum.toDouble / (100.0 * cells.map(_._2).sum),
        s"event study diverges at offset $off")
    }
  }

  test("agg_cvm matches a scalar micro-floored ECDF recomputation") {
    val vals = U.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(r2 => (r2.getString(0), cents(r2.getDouble(1))))
    val n = vals.count(_._1 == "click").toLong
    val m = vals.count(_._1 == "view").toLong
    var cumN = BigInt(0); var cumM = BigInt(0); var num = BigInt(0)
    val bySupport = vals.groupBy(_._2).toSeq.sortBy(_._1)
    for ((_, xs) <- bySupport) {
      val cn = xs.count(_._1 == "click").toLong
      val cm = xs.length - cn
      cumN += BigInt(cn); cumM += BigInt(cm)
      val dmu = (BigInt(1000000) * (cumN * m - cumM * n).abs) /
        (BigInt(n) * m)
      num += BigInt(cn + cm) * dmu * dmu
    }
    val nD = n.toDouble; val mD = m.toDouble
    val expT = nD * mD / (nD + mD) / (nD + mD) * (num.toDouble / 1.0e12)
    val r = SparkEntry.queries("agg_cvm")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("m") == m &&
      r.getAs[Long]("n_support") == bySupport.length.toLong &&
      r.getAs[Double]("cvm_t") == expT)
    assert(expT >= 0.0)
  }

  test("graph_knn_degree agrees with the scalar neighbor-degree average") {
    val li = U.tbl(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { rs =>
      val pks = rs.map(_._2).distinct.toSeq
      for (u <- pks; v <- pks if u < v) yield (u, v)
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    val deg = adj.map { case (u, ns) => u -> ns.length.toLong }
    val got = SparkEntry.queries("graph_knn_degree")(spark, sfDir).collect()
    val byK = got.map(r => r.getAs[Long]("k") -> r).toMap
    assert(byK.keySet == deg.values.toSet)
    for ((k, r) <- byK) {
      val nodes = deg.filter(_._2 == k).keys.toSeq
      val tot = nodes.map(u => adj(u).map(deg).sum).map(BigInt(_)).sum
      assert(r.getAs[Long]("n_nodes") == nodes.length &&
        r.getAs[Double]("knn") ==
          tot.toDouble / (k.toDouble * nodes.length),
        s"knn diverges at degree $k")
    }
  }

  test("emb_silhouette terms are bounded in [-1, 1] micro-units and count every vector") {
    val got = SparkEntry.queries("emb_silhouette")(spark, sfDir).collect()
    val nVec = U.tbl(spark, sfDir, "embeddings").count()
    assert(got.map(_.getAs[Long]("n_vecs")).sum == nVec)
    for (r <- got) {
      val n = r.getAs[Long]("n_vecs")
      val sum = r.getAs[Long]("sum_s_micro")
      // each micro-floored term lies in [-1e6, 1e6]
      assert(sum >= -1000000L * n && sum <= 1000000L * n)
      assert(r.getAs[Double]("mean_s") == sum.toDouble / (1000000.0 * n))
    }
  }

  test("dedup_bloom_prefilter never misses: every exact dup is a bloom hit") {
    val rows = SparkEntry.queries("dedup_bloom_prefilter")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // no false negatives — the Bloom guarantee
    assert(rows.forall(r => !r.getAs[Boolean]("exact_dup") ||
      r.getAs[Boolean]("bloom_hit")))
    // positions land inside the 2^14-bit filter
    assert(rows.forall { r =>
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      p1 >= 0 && p1 < 16384 && p2 >= 0 && p2 < 16384
    })
    // probe side is exactly the src0 shard
    val n0 = U.tbl(spark, sfDir, "documents")
      .filter(col("source") === "src0").count()
    assert(rows.length.toLong == n0)
  }

  test("ts_theil_sen matches the scalar pairwise-slope median") {
    val daily = U.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayi"), col("value"))
      .collect().groupBy(_.getString(0))
      .map { case (et, rs) =>
        et -> rs.groupBy(_.getLong(1)).toSeq.sortBy(_._1)
          .map { case (d, xs) => (d, xs.map(r => cents(r.getDouble(2))).sum) }
      }
    val got = operators.TimeSeries.queries("ts_theil_sen")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, series) <- daily) {
      val slopes = (for {
        i <- series.indices; j <- i + 1 until series.length
      } yield {
        val (d1, x1) = series(i); val (d2, x2) = series(j)
        val sm = (BigInt(1000000) * BigInt(x2 - x1) / BigInt(d2 - d1)).toLong
        (sm, d1, d2)
      }).sortBy(t => (t._1, t._2, t._3)).map(_._1)
      val n = slopes.length
      val med2 =
        if (n % 2 == 1) slopes(n / 2) * 2
        else slopes(n / 2 - 1) + slopes(n / 2)
      val r = got(et)
      assert(r.getAs[Long]("n_pairs") == n.toLong &&
        r.getAs[Long]("med2_slope_micro") == med2 &&
        r.getAs[Double]("slope_cents_per_day") == med2.toDouble / 2000000.0,
        s"Theil–Sen diverges for $et")
    }
  }

  test("ts_granger matches the scalar two-regression F computation") {
    val hourly = U.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        expr("unix_micros(date_trunc('HOUR', ts)) DIV 3600000000").as("h"),
        col("value")).collect()
    val byHour = hourly.groupBy(_.getLong(1))
    val h0 = byHour.keys.min; val h1 = byHour.keys.max
    val series = (h0 to h1).map { h =>
      val rs = byHour.getOrElse(h, Array.empty)
      (rs.filter(_.getString(0) == "click").map(r => cents(r.getDouble(2))).sum,
        rs.filter(_.getString(0) == "purchase").map(r => cents(r.getDouble(2))).sum)
    }
    def fit(pts: Seq[(Long, Long, Long)]): (Double, Double, Double) = {
      // pts = (y, l, x); returns (b1, b2, f) via the query's exact trees
      val nd = pts.length.toDouble
      def bsum(f: ((Long, Long, Long)) => BigInt) = pts.map(f).sum.toDouble
      val s1 = bsum(p => BigInt(p._2)); val s2 = bsum(p => BigInt(p._3))
      val sy = bsum(p => BigInt(p._1))
      val s11 = bsum(p => BigInt(p._2) * BigInt(p._2))
      val s22 = bsum(p => BigInt(p._3) * BigInt(p._3))
      val s12 = bsum(p => BigInt(p._2) * BigInt(p._3))
      val s1y = bsum(p => BigInt(p._2) * BigInt(p._1))
      val s2y = bsum(p => BigInt(p._3) * BigInt(p._1))
      val syy = bsum(p => BigInt(p._1) * BigInt(p._1))
      def cov(sxy: Double, sx: Double, sYY: Double) =
        (sxy / 10000.0 - (sx / 100.0) * (sYY / 100.0) / nd) / (nd - 1.0)
      val c11 = cov(s11, s1, s1); val c22 = cov(s22, s2, s2)
      val c12 = cov(s12, s1, s2); val c1y = cov(s1y, s1, sy)
      val c2y = cov(s2y, s2, sy); val cyy = cov(syy, sy, sy)
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val rssf = cyy - (b1 * c1y + b2 * c2y)
      val rssr = cyy - c1y * c1y / c11
      (b1, b2, (rssr - rssf) * (nd - 3.0) / rssf)
    }
    val lagged = series.sliding(2).toSeq.map { case Seq((xp, yp), (xc, yc)) =>
      (xc, yc, xp, yp)
    }
    val got = operators.TimeSeries.queries("ts_granger")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val fwd = fit(lagged.map { case (_, yc, xp, yp) => (yc, yp, xp) })
    val bwd = fit(lagged.map { case (xc, _, xp, yp) => (xc, xp, yp) })
    for ((dir, exp) <- Seq("click->purchase" -> fwd, "purchase->click" -> bwd)) {
      val r = got(dir)
      assert(r.getAs[Double]("b_lag_y") == exp._1 &&
        r.getAs[Double]("b_lag_x") == exp._2 &&
        r.getAs[Double]("f_stat") == exp._3, s"Granger diverges for $dir")
    }
  }

  test("ts_adf matches the scalar lag-regression computation per type") {
    val hourly = U.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('HOUR', ts)) DIV 3600000000").as("h"),
        col("value")).collect().groupBy(_.getString(0))
    val got = operators.TimeSeries.queries("ts_adf")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, rs) <- hourly) {
      val byH = rs.groupBy(_.getLong(1))
      val h0 = byH.keys.min; val h1 = byH.keys.max
      val ys = (h0 to h1).map(h =>
        byH.getOrElse(h, Array.empty).map(r => cents(r.getDouble(2))).sum)
      val pts = ys.sliding(2).toSeq.map { case Seq(l, y) => (l, y - l) }
      val nd = pts.length.toDouble
      def bs(f: ((Long, Long)) => BigInt) = pts.map(f).sum.toDouble
      val sl = bs(p => BigInt(p._1)); val sd0 = bs(p => BigInt(p._2))
      val sll = bs(p => BigInt(p._1) * BigInt(p._1))
      val sld = bs(p => BigInt(p._1) * BigInt(p._2))
      val sdd = bs(p => BigInt(p._2) * BigInt(p._2))
      def cov(sxy: Double, sx: Double, sy: Double) =
        (sxy / 10000.0 - (sx / 100.0) * (sy / 100.0) / nd) / (nd - 1.0)
      val cll = cov(sll, sl, sl); val cld = cov(sld, sl, sd0)
      val cdd = cov(sdd, sd0, sd0)
      val beta = cld / cll
      val se2 = (cdd - cld * cld / cll) / ((nd - 2.0) * cll)
      val r = got(et)
      assert(r.getAs[Double]("beta") == beta &&
        r.getAs[Double]("se") == math.sqrt(se2) &&
        r.getAs[Double]("t_stat") == beta / math.sqrt(se2),
        s"ADF diverges for $et")
    }
  }

  test("ts_seasonal_mk sums the per-season scalar S and tie variance") {
    val cells = U.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("d"),
        expr("(unix_micros(ts) DIV 3600000000) % 24").as("hod"),
        col("value")).collect()
      .groupBy(r => (r.getString(0), r.getLong(2)))
      .map { case (k, rs) =>
        k -> rs.groupBy(_.getLong(1)).toSeq.sortBy(_._1)
          .map { case (_, xs) => xs.map(r => cents(r.getDouble(3))).sum }
      }
    val got = operators.TimeSeries.queries("ts_seasonal_mk")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for (et <- cells.keys.map(_._1).toSet[String]) {
      var sStat = 0L; var var18 = 0L; var nCells = 0L
      for (((_, _), xs) <- cells.filter(_._1._1 == et)) {
        sStat += (for (i <- xs.indices; j <- i + 1 until xs.length)
          yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
        val n = xs.length.toLong
        val tie = xs.groupBy(identity(_)).values
          .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
        var18 += n * (n - 1) * (2 * n + 5) - tie
        nCells += n
      }
      val r = got(et)
      assert(r.getAs[Long]("s_stat") == sStat &&
        r.getAs[Long]("var18") == var18 &&
        r.getAs[Long]("n_cells") == nCells,
        s"seasonal MK diverges for $et")
    }
  }

  test("text_source_overlap matches a scalar shingle-set Jaccard for one pair") {
    val rows = SparkEntry.queries("text_source_overlap")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jaccard")
      j > 0.0 && j <= 1.0 && r.getAs[Long]("common") <=
        math.min(r.getAs[Long]("na"), r.getAs[Long]("nb"))
    })
    def shingleSet(src: String): Set[String] =
      U.tbl(spark, sfDir, "documents").filter(col("source") === src)
        .select("text").collect().flatMap { r =>
          val toks = r.getString(0).split(" ").filter(_.nonEmpty)
          toks.sliding(3).filter(_.length == 3).map(_.mkString("_"))
        }.toSet
    val (a, b) = (shingleSet("src1"), shingleSet("src2"))
    val common = (a & b).size.toLong
    rows.find(r => r.getString(0) == "src1" && r.getString(1) == "src2") match {
      case Some(r) =>
        assert(r.getAs[Long]("na") == a.size.toLong &&
          r.getAs[Long]("nb") == b.size.toLong &&
          r.getAs[Long]("common") == common)
      case None => assert(common == 0L, "query dropped an overlapping pair")
    }
  }

  test("multimodal_phash words carry exactly n_ones bits inside the image area") {
    val rows = SparkEntry.queries("multimodal_phash")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val npx = (4 + id % 5) * (4 + (id * 7) % 5)
      val ones = java.lang.Long.bitCount(r.getAs[Long]("w0")) +
        java.lang.Long.bitCount(r.getAs[Long]("w1"))
      assert(ones.toLong == r.getAs[Long]("n_ones"), s"popcount mismatch at $id")
      // a bit above the mean can never be set for every pixel, nor can the
      // words carry bits outside the w*h area
      assert(r.getAs[Long]("n_ones") < npx)
      val hi = math.max(0, npx - 32).toInt
      if (hi < 32)
        assert((r.getAs[Long]("w1") >>> hi) == 0L, s"stray bit past area at $id")
    }
  }

  test("ts_spc_rules matches a scalar Western-Electric evaluation for one type") {
    val xs = U.events(spark, sfDir).filter(col("event_type") === "view")
      .orderBy("ts", "event_id").select("value").collect()
      .map(r => BigInt(cents(r.getDouble(0))))
    val n = BigInt(xs.length); val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    val vr = n * sxx - sx * sx
    val dd = xs.map(x => n * x - sx)
    def cnt(rule: Int => Boolean) = xs.indices.count(rule).toLong
    val above = dd.map(_ > 0); val below = dd.map(_ < 0)
    def beyond(k: Int)(i: Int) = dd(i) * dd(i) > k * k * vr
    val r1 = cnt(beyond(3))
    def windowCount(i: Int, len: Int, p: Int => Boolean) =
      (math.max(0, i - len + 1) to i).count(p)
    val r2 = cnt(i => windowCount(i, 3, j => beyond(2)(j) && above(j)) >= 2 ||
      windowCount(i, 3, j => beyond(2)(j) && below(j)) >= 2)
    val r3 = cnt(i => windowCount(i, 5, j => beyond(1)(j) && above(j)) >= 4 ||
      windowCount(i, 5, j => beyond(1)(j) && below(j)) >= 4)
    val r4 = cnt(i => windowCount(i, 8, above) == 8 ||
      windowCount(i, 8, below) == 8)
    val got = operators.TimeSeries.queries("ts_spc_rules")(spark, sfDir)
      .filter(col("event_type") === "view").collect().head
    assert(got.getAs[Long]("n_points") == xs.length.toLong &&
      got.getAs[Long]("rule1_beyond3s") == r1 &&
      got.getAs[Long]("rule2_2of3_beyond2s") == r2 &&
      got.getAs[Long]("rule3_4of5_beyond1s") == r3 &&
      got.getAs[Long]("rule4_8_same_side") == r4,
      s"SPC diverges: got $got expected ($r1, $r2, $r3, $r4)")
  }

  test("agg_prop_ztest matches the scalar two-proportion computation") {
    val rows = U.events(spark, sfDir).select("user_id", "event_type").collect()
    def stat(c: Long) = {
      val mine = rows.filter(_.getLong(0) % 2 == c)
      (mine.length.toLong, mine.count(_.getString(1) == "purchase").toLong)
    }
    val (n1, k1) = stat(0); val (n2, k2) = stat(1)
    val p1 = k1.toDouble / n1.toDouble
    val p2 = k2.toDouble / n2.toDouble
    val pp = (k1.toDouble + k2.toDouble) / (n1.toDouble + n2.toDouble)
    val z = (p1 - p2) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1.toDouble + 1.0 / n2.toDouble))
    val r = SparkEntry.queries("agg_prop_ztest")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("k1") == k1 &&
      r.getAs[Long]("n2") == n2 && r.getAs[Long]("k2") == k2 &&
      r.getAs[Double]("z") == z)
  }

  test("ts_rainflow_ranges matches the scalar turning-point histogram") {
    val byUser = U.events(spark, sfDir)
      .select("user_id", "value").orderBy("user_id", "ts", "event_id")
      .collect().groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => cents(r.getDouble(1))).toSeq }
    val ranges = byUser.values.flatMap { xs =>
      val kept = xs.indices.filter { i =>
        i == 0 || i == xs.length - 1 ||
          (xs(i) - xs(i - 1)) * (xs(i + 1) - xs(i)) < 0
      }.map(xs)
      kept.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }
    }.toSeq
    def bin(r: Long) = if (r == 0) 0L else if (r < 100) 1L
      else if (r < 1000) 2L else if (r < 10000) 3L else 4L
    val expected = ranges.groupBy(bin).view.mapValues(_.length.toLong).toMap
    val got = operators.TimeSeries.queries("ts_rainflow_ranges")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_ranges"))
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("pipeline_interleave emits a permutation that round-robins the sources") {
    val rows = SparkEntry.queries("pipeline_interleave")(spark, sfDir)
      .collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("global_pos")).sorted.toSeq ==
      (1L to n.toLong))
    // within one source the round rank rides the global order
    for ((_, rs) <- rows.groupBy(_.getAs[String]("source"))) {
      val sorted = rs.sortBy(_.getAs[Long]("global_pos")).map(_.getAs[Long]("rn"))
      assert(sorted.toSeq == (1L to sorted.length.toLong))
    }
    // the first |sources| positions hold round 1, one per source
    val srcCount = rows.map(_.getAs[String]("source")).distinct.length
    val firstBlock = rows.filter(_.getAs[Long]("global_pos") <= srcCount)
    assert(firstBlock.forall(_.getAs[Long]("rn") == 1L) &&
      firstBlock.map(_.getAs[String]("source")).distinct.length == srcCount)
  }

  test("graph_walk_corpus walks stay on real edges with the hash-indexed hop") {
    val li = U.tbl(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { rs =>
      val pks = rs.map(_._2).distinct.toSeq
      for (u <- pks; v <- pks if u < v) yield (u, v)
    }.toSet
    val adj: Map[Long, Seq[Long]] = edges.toSeq
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    val got = SparkEntry.queries("graph_walk_corpus")(spark, sfDir).collect()
    val walks = got.groupBy(_.getAs[Long]("wid"))
    assert(walks.size == math.min(20, adj.size))
    for ((wid, rows) <- walks) {
      val path = rows.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("node"))
      assert(path.length == 7 && path.head == wid)
      for (k <- 1 until path.length) {
        val cur = path(k - 1)
        val nbrs = adj(cur)
        val expect = nbrs(((cur * 31 + k * 17) % nbrs.length).toInt)
        assert(path(k) == expect, s"walk $wid hop $k diverges")
      }
    }
  }

  test("ts_runs_test matches the scalar run count and z per type") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "value").orderBy("event_type", "ts", "event_id")
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => cents(r.getDouble(1))).toSeq }
    val got = operators.TimeSeries.queries("ts_runs_test")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, xs) <- byType) {
      val sorted = xs.sorted
      val n = sorted.length
      val med2 = if (n % 2 == 1) sorted(n / 2) * 2
        else sorted(n / 2 - 1) + sorted(n / 2)
      val sides = xs.filter(_ * 2 != med2).map(_ * 2 > med2)
      val runs = (1 +
        sides.sliding(2).count { case Seq(a, b) => a != b; case _ => false })
        .toLong
      val n1 = sides.count(identity(_)).toLong
      val n2 = sides.length - n1
      val n1d = n1.toDouble; val n2d = n2.toDouble
      val mu = 2.0 * n1d * n2d / (n1d + n2d) + 1.0
      val va = 2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d) /
        ((n1d + n2d) * (n1d + n2d) * (n1d + n2d - 1.0))
      val r = got(et)
      assert(r.getAs[Long]("runs") == runs && r.getAs[Long]("n1") == n1 &&
        r.getAs[Long]("n2") == n2 &&
        r.getAs[Double]("z") == (runs.toDouble - mu) / math.sqrt(va),
        s"runs test diverges for $et")
    }
  }

  test("text_kl_source is nonnegative-ish by Gibbs and counts every source") {
    val rows = SparkEntry.queries("text_kl_source")(spark, sfDir).collect()
    val nSrc = U.tbl(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(rows.length.toLong == nSrc)
    // Gibbs: true KL >= 0; micro-FLOORING can shave at most 1 micro-unit
    // per type term below it
    assert(rows.forall(r =>
      r.getAs[Long]("kl_micro") >= -r.getAs[Long]("n_types")))
    assert(rows.forall(r => r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens")))
  }

  test("agg_kruskal matches a scalar midrank recomputation of H") {
    val xs = U.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> cents(r.getDouble(1)))
    val n = xs.length.toLong
    // pooled doubled midranks per distinct cent value
    val byV = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedV = byV.keys.toSeq.sorted
    val mid2 = {
      var cum = 0L
      sortedV.map { v => cum += byV(v); v -> (2 * cum - byV(v) + 1) }.toMap
    }
    val ties = sortedV.map(v => byV(v) * byV(v) * byV(v) - byV(v)).sum
    val ss = xs.groupBy(_._1).values.map { rows =>
      val nt = rows.length.toLong
      val r2c = BigInt(rows.map(r => mid2(r._2)).sum) - BigInt(nt) * (n + 1)
      r2c * r2c / nt
    }.sum
    val h = (BigInt(3000000) * ss) / (BigInt(n) * (n + 1))
    val hc = (BigInt(3000000) * ss * (n - 1)) /
      (BigInt(n) * n * n - n - ties)
    val r = operators.Aggregations.queries("agg_kruskal")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("tie_mass") == ties &&
      r.getAs[Long]("h_micro") == h.toLong &&
      r.getAs[Long]("hc_micro") == hc.toLong)
  }

  test("agg_kendall_tau matches a scalar pair loop over the day grid") {
    val daily = U.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L / 86400000000L,
        r.getString(1), cents(r.getDouble(2))))
    val byDay = daily.groupBy(_._1)
    val d0 = byDay.keys.min; val d1 = byDay.keys.max
    val grid = (d0 to d1).map { dy =>
      val rs = byDay.getOrElse(dy, Array.empty)
      (rs.filter(_._2 == "click").map(_._3).sum,
        rs.filter(_._2 == "purchase").map(_._3).sum)
    }
    var c = 0L; var dd = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- grid.indices; j <- (i + 1) until grid.length) {
      np += 1
      val sx = java.lang.Long.signum(grid(j)._1 - grid(i)._1)
      val sy = java.lang.Long.signum(grid(j)._2 - grid(i)._2)
      if (sx * sy == 1) c += 1 else if (sx * sy == -1) dd += 1
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    val r = operators.Aggregations.queries("agg_kendall_tau")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_days") == grid.length.toLong &&
      r.getAs[Long]("concordant") == c && r.getAs[Long]("discordant") == dd &&
      r.getAs[Long]("ties_x") == tx && r.getAs[Long]("ties_y") == ty &&
      r.getAs[Double]("tau_b") ==
        (c - dd).toDouble / math.sqrt((np - tx).toDouble * (np - ty).toDouble))
  }

  test("agg_gtest totals to a nonnegative G and to 2n·MI exactly") {
    val rows = operators.Aggregations.queries("agg_gtest")(spark, sfDir)
      .collect()
    val g = rows.map(_.getAs[Long]("g_term_micro")).sum
    // Gibbs: true G >= 0; each micro-floored term shaves < 1 micro-unit
    assert(g >= -rows.length.toLong)
    // scalar recomputation of every cell term
    val cells = rows.map(r => (r.getString(0), r.getAs[Long]("band")) ->
      r.getAs[Long]("o")).toMap
    val rT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    rows.foreach { r =>
      val o = r.getAs[Long]("o")
      val expect = math.floor(2000000.0 * o *
        math.log((BigInt(o) * n).toDouble /
          (BigInt(rT(r.getString(0))) * cT(r.getAs[Long]("band"))).toDouble))
        .toLong
      assert(r.getAs[Long]("g_term_micro") == expect)
    }
  }

  // like dailyTotals but keyed by the queries' integer epoch-day index
  private def dayIdxTotals(): Map[String, Seq[(Long, Long)]] =
    U.events(spark, sfDir)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000L / 86400000000L,
        cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(rs =>
        rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)).toMap

  test("ts_variance_ratio matches a scalar VR(5) on the dense day grid") {
    val got = operators.TimeSeries.queries("ts_variance_ratio")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, obs) <- dayIdxTotals()) {
      val m = obs.toMap
      val xs = (obs.head._1 to obs.last._1).map(dy => m.getOrElse(dy, 0L))
      def stats(q: Int) = {
        val ds = (q until xs.length).map(i => xs(i) - xs(i - q))
        (ds.length.toDouble, ds.sum.toDouble,
          ds.map(v => BigInt(v) * BigInt(v)).sum.toDouble)
      }
      val (n1, s1, q1) = stats(1); val (nq, sq, qq) = stats(5)
      val var1 = (q1 - s1 * s1 / n1) / n1
      val varq = (qq - sq * sq / nq) / nq
      val r = got(et)
      assert(r.getAs[Long]("n_days") == xs.length.toLong &&
        r.getAs[Double]("var1") == var1 && r.getAs[Double]("varq") == varq &&
        r.getAs[Double]("vr") == varq / (5.0 * var1), s"VR diverges for $et")
    }
  }

  test("ts_pettitt matches a scalar U_k sweep with earliest argmax") {
    val got = operators.TimeSeries.queries("ts_pettitt")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, obs) <- dayIdxTotals()) {
      val n = obs.length
      val us = (0 until n - 1).map { k =>
        (for (i <- 0 to k; j <- (k + 1) until n)
          yield java.lang.Long.signum(obs(i)._2 - obs(j)._2).toLong).sum
      }
      val kStat = us.map(math.abs).max
      val cpDay = obs(us.indexWhere(u => math.abs(u) == kStat))._1
      val r = got(et)
      assert(r.getAs[Long]("n_days") == n.toLong &&
        r.getAs[Long]("k_stat") == kStat &&
        r.getAs[Long]("cp_day") == cpDay, s"Pettitt diverges for $et")
    }
  }

  test("ts_hampel matches a scalar rolling median/MAD on one user") {
    val uid = someUser()
    val ys = userSeries(uid)
    val got = operators.TimeSeries.queries("ts_hampel")(spark, sfDir)
      .filter(col("user_id") === uid).orderBy("ts", "event_id").collect()
    assert(got.length == ys.length - 6)
    for ((r, i) <- got.zipWithIndex) {
      val win = ys.slice(i, i + 7).sorted
      val med = win(3)
      val mad = win.map(v => math.abs(v - med)).sorted.apply(3)
      assert(r.getAs[Long]("med7") == med && r.getAs[Long]("mad7") == mad &&
        r.getAs[Boolean]("is_outlier") ==
          (math.abs(ys(i + 6) - med) * 10000L > 44478L * mad))
    }
  }

  test("emb_source_drift matches a scalar centroid-distance recompute") {
    val docsSrc = U.tbl(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = U.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => docsSrc(r.getLong(0)) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong))
    val cents = vecs.groupBy(_._1).view.mapValues { vs =>
      val n = vs.length
      (0 until 64).map(i =>
        math.floor(vs.map(_._2(i)).sum.toDouble / n).toLong) -> n.toLong
    }.toMap
    val got = SparkEntry.queries("emb_source_drift")(spark, sfDir).collect()
    assert(got.length == cents.size * (cents.size - 1) / 2)
    got.foreach { r =>
      val (ca, na) = cents(r.getString(0)); val (cb, nb) = cents(r.getString(1))
      val d2 = (0 until 64).map(i => (ca(i) - cb(i)) * (ca(i) - cb(i))).sum
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb &&
        r.getAs[Long]("dist2_fp") == d2)
    }
  }

  test("agg_hellinger BC terms recompute and sum to at most 1 + slack") {
    val rows = operators.Aggregations.queries("agg_hellinger")(spark, sfDir)
      .collect()
    val np = rows.map(_.getAs[Long]("c_click")).sum
    val nq = rows.map(_.getAs[Long]("c_view")).sum
    rows.foreach { r =>
      val expect = math.floor(1000000.0 * math.sqrt(
        (BigInt(r.getAs[Long]("c_click")) * r.getAs[Long]("c_view")).toDouble /
          (BigInt(np) * nq).toDouble)).toLong
      assert(r.getAs[Long]("bc_term_micro") == expect)
    }
    // Cauchy–Schwarz: ΣBC <= 1 exactly; micro-floors only shave downward
    assert(rows.map(_.getAs[Long]("bc_term_micro")).sum <= 1000000L)
  }

  test("graph_transitivity_dir matches a scalar wedge-closure count") {
    val li: Seq[(Long, Long, Long)] = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_linenumber").cast("long")).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e: Set[(Long, Long)] = li.groupBy(_._1).values.toSeq.flatMap {
      rs: Seq[(Long, Long, Long)] =>
        for (a <- rs; b <- rs if a._3 < b._3 && a._2 != b._2)
          yield (a._2, b._2)
    }.toSet
    val out = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var wedges = 0L; var closed = 0L
    for ((u, vs) <- out; v <- vs; w <- out.getOrElse(v, Set.empty) if w != u) {
      wedges += 1
      if (e((u, w))) closed += 1
    }
    val r = operators.Graphs.queries("graph_transitivity_dir")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_edges") == e.size.toLong &&
      r.getAs[Long]("n_wedges") == wedges &&
      r.getAs[Long]("n_closed") == closed &&
      r.getAs[Long]("transitivity_micro") == 1000000L * closed / wedges)
  }

  test("multimodal_wav_stats decodes through the real WAV codec losslessly") {
    val rows = SparkEntry.queries("multimodal_wav_stats")(spark, sfDir)
      .collect()
    val nDocs = U.tbl(spark, sfDir, "documents").count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = 64 + id % 64
      val samples = (0L until n).map(k => ((id * 31 + k * 17) % 65536) - 32768)
      assert(r.getAs[Long]("n_samples") == n &&
        r.getAs[Long]("sample_rate") == 8000L &&
        r.getAs[Boolean]("riff_ok") &&
        r.getAs[Long]("peak") == samples.map(math.abs).max &&
        r.getAs[Long]("sum_sq") == samples.map(s => s * s).sum,
        s"WAV roundtrip diverges for doc $id")
    }
  }

  test("agg_friedman matches a scalar blocked-midrank recompute") {
    val daily = dayIdxTotals()
    val types = daily.keys.toSeq.sorted
    val d0 = daily.values.flatMap(_.map(_._1)).min
    val d1 = daily.values.flatMap(_.map(_._1)).max
    val k = types.length
    val n = (d1 - d0 + 1).toInt
    // doubled midranks within each day block over the k type totals
    val r2 = Array.ofDim[Long](n, k)
    for (di <- 0 until n) {
      val xs = types.map(t => daily(t).toMap.getOrElse(d0 + di, 0L))
      for (j <- 0 until k)
        r2(di)(j) = xs.count(_ < xs(j)).toLong + 1 + xs.count(_ <= xs(j))
    }
    val r2sum = (0 until k).map(j => (0 until n).map(r2(_)(j)).sum)
    val a2 = r2.flatten.map(v => BigInt(v) * v).sum
    val c2 = BigInt(n) * k * (k + 1) * (k + 1)
    val sq = r2sum.map(r => BigInt(r - n.toLong * (k + 1)).pow(2)).sum
    val stat = (BigInt(1000000) * (k - 1) * sq) / (a2 - c2)
    val r = operators.Aggregations.queries("agg_friedman")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_days") == n.toLong && r.getAs[Long]("k") == k.toLong &&
      r.getAs[Long]("a2") == a2.toLong &&
      r.getAs[Long]("stat_micro") == stat.toLong)
  }

  test("ts_cusum_alarm matches the scalar max(0, ...) recursion") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "value").orderBy("event_type", "ts", "event_id")
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => cents(r.getDouble(1))).toSeq }
    val got = operators.TimeSeries.queries("ts_cusum_alarm")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, xs) <- byType) {
      val n = xs.length.toLong
      val sx = xs.sum
      var sp = BigInt(0); var sm = BigInt(0)
      var hi = 0L; var lo = 0L
      val hThr = BigInt(n) * 5000L
      xs.foreach { x =>
        sp = (sp + BigInt(n) * (x - 500L) - sx).max(0)
        sm = (sm + BigInt(sx) - BigInt(n) * (x + 500L)).max(0)
        if (sp > hThr) hi += 1
        if (sm > hThr) lo += 1
      }
      val r = got(et)
      assert(r.getAs[Long]("n") == n &&
        r.getAs[Long]("n_alarms_high") == hi &&
        r.getAs[Long]("n_alarms_low") == lo, s"CUSUM diverges for $et")
    }
  }

  test("ts_cointegration agrees with a direct residual-series ADF") {
    // the query never materializes residuals (algebraic expansion); this
    // recomputes them DIRECTLY, so the expansion itself is under test —
    // tolerance-based because the float op order intentionally differs
    val daily = dayIdxTotals()
    val clicks = daily("click").toMap; val purch = daily("purchase").toMap
    val ds = (daily.values.flatMap(_.map(_._1)).min to
      daily.values.flatMap(_.map(_._1)).max)
    val xs = ds.map(dy => clicks.getOrElse(dy, 0L).toDouble)
    val ys = ds.map(dy => purch.getOrElse(dy, 0L).toDouble)
    val n = xs.length.toDouble
    val b = (n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    val a = (ys.sum - b * xs.sum) / n
    val e = xs.zip(ys).map { case (x, y) => y - a - b * x }
    val pairs = e.sliding(2).toSeq.map { case Seq(p0, p1) => (p0, p1) }
    val sll = pairs.map(p => p._1 * p._1).sum
    val beta = pairs.map(p => (p._2 - p._1) * p._1).sum / sll
    val rss = pairs.map(p => math.pow(p._2 - p._1 - beta * p._1, 2)).sum
    val t = beta / math.sqrt(rss / (pairs.length - 1.0) / sll)
    val r = operators.TimeSeries.queries("ts_cointegration")(spark, sfDir)
      .collect().head
    def close(u: Double, v: Double) = math.abs(u - v) <=
      1e-6 * math.max(math.abs(u), math.abs(v))
    assert(r.getAs[Long]("n_days") == xs.length.toLong &&
      close(r.getAs[Double]("b_coint"), b) &&
      close(r.getAs[Double]("a_coint"), a) &&
      close(r.getAs[Double]("beta_adf"), beta) &&
      close(r.getAs[Double]("t_adf"), t))
  }

  test("text_burstiness matches a scalar Fano-factor recompute") {
    val docs = U.tbl(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val nn = docs.length.toLong
    val counts = docs.flatMap { case (id, t) =>
      // TextUtil.tokens = split on single spaces, empties dropped
      t.split(" ", -1).filter(_.nonEmpty).map(w => (id, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((_, w), c) => w -> c }
    val perTok = counts.groupBy(_._1).view.mapValues { cs =>
      (cs.length.toLong, cs.map(_._2).sum, cs.map(c => BigInt(c._2) * c._2).sum)
    }.toMap
    val got = SparkEntry.queries("text_burstiness")(spark, sfDir).collect()
    assert(got.length == 20)
    // the query's (df DESC, token) order is a total order — check it and
    // every row's exact closed form
    val expTop = perTok.toSeq.sortBy { case (w, (df, _, _)) => (-df, w) }
      .take(20)
    got.zip(expTop).foreach { case (r, (w, (df, s1, s2))) =>
      val vmr = (BigInt(1000000) * (BigInt(nn) * s2 - BigInt(s1) * s1)) /
        (BigInt(nn) * s1)
      assert(r.getString(0) == w && r.getAs[Long]("df") == df &&
        r.getAs[Long]("total") == s1 &&
        r.getAs[Long]("vmr_micro") == vmr.toLong, s"burstiness for $w")
    }
  }

  test("sink_parquet_bloom writes a REAL bloom filter into the footer") {
    import scala.jdk.CollectionConverters._
    SparkEntry.queries("sink_parquet_bloom")(spark, sfDir).collect()
    val dir = new java.io.File(U.scratch(sfDir, "sink_parquet_bloom"))
    val pf = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val pk = reader.getFooter.getBlocks.get(0).getColumns.asScala
        .find(_.getPath.toDotString == "p_partkey").get
      assert(pk.getBloomFilterOffset >= 0,
        "no bloom filter offset on p_partkey — the write option regressed")
      val bf = reader.readBloomFilter(pk)
      assert(bf != null, "bloom filter unreadable")
      // a written key must test positive (no false negatives — the
      // bloom contract the scan-skipping relies on)
      val hash = bf.hash(1L)
      assert(bf.findHash(hash), "present key tests negative")
    } finally reader.close()
  }

  test("ts_durbin_watson equals 2(1 - acf1)-style scalar recompute") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "value").orderBy("event_type", "ts", "event_id")
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => cents(r.getDouble(1))).toSeq }
    val got = operators.TimeSeries.queries("ts_durbin_watson")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("dw_micro")).toMap
    for ((et, xs) <- byType) {
      val n = xs.length.toLong
      val sd2 = xs.sliding(2).collect { case Seq(a, b) =>
        BigInt(b - a) * (b - a) }.sum
      val den = BigInt(n) * xs.map(x => BigInt(x) * x).sum -
        BigInt(xs.sum) * xs.sum
      assert(got(et) == (BigInt(1000000) * n * sd2 / den).toLong,
        s"DW diverges for $et")
    }
  }

  test("dedup_lsh_recall counts agree with the two declared frames") {
    val r = SparkEntry.queries("dedup_lsh_recall")(spark, sfDir)
      .collect().head
    val truth = SparkEntry.queries("dedup_jaccard")(spark, sfDir)
      .select("da", "db").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    val cand = SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .select("da", "db").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    assert(r.getAs[Long]("n_truth") == truth.size.toLong)
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth") &&
      r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    // every VERIFIED minhash pair is by construction a surfaced candidate,
    // so hits must cover at least the truth ∩ verified-minhash overlap
    assert(r.getAs[Long]("n_hit") >= (truth & cand).size.toLong)
    assert(r.getAs[Long]("recall_micro") ==
      1000000L * r.getAs[Long]("n_hit") / r.getAs[Long]("n_truth"))
  }

  test("agg_hill_tail matches a scalar top-k order-statistic recompute") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1)), r.getLong(2)))
      .filter(_._2 > 0)
      .groupBy(_._1)
    val got = operators.Aggregations.queries("agg_hill_tail")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, rows) <- byType if rows.length > 51) {
      val top = rows.sortBy(t => (-t._2, t._3)).take(51).map(_._2)
      val xk = top(50)
      val sum = top.take(50)
        .map(x => math.floor(1e6 * math.log(x.toDouble / xk)).toLong).sum
      val r = got(et)
      assert(r.getAs[Long]("k") == 50L && r.getAs[Long]("x_k1") == xk &&
        r.getAs[Long]("sum_ln_micro") == sum, s"Hill diverges for $et")
    }
  }

  test("agg_odds_ratio is consistent with the prop_ztest cell counts") {
    val r = operators.Aggregations.queries("agg_odds_ratio")(spark, sfDir)
      .collect().head
    val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d"))
    val total = U.events(spark, sfDir).count()
    assert(a + b + c + d == total)
    assert(r.getAs[Long]("or_micro") ==
      (BigInt(1000000) * a * d / (BigInt(b) * c)).toLong)
    assert(r.getAs[Double]("log_or") ==
      math.log((BigInt(a) * d).toDouble / (BigInt(b) * c).toDouble))
  }

  test("multimodal_phash_topk neighbors agree with the declared hashes") {
    val hashes = SparkEntry.queries("multimodal_phash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SparkEntry.queries("multimodal_phash_topk")(spark, sfDir)
      .collect()
    val probes = hashes.keys.filter(_ < 8)
    assert(got.length == probes.size * 3)
    got.foreach { r =>
      val (q0, q1) = hashes(r.getAs[Long]("q_id"))
      val (w0, w1) = hashes(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("hamming") ==
        java.lang.Long.bitCount(w0 ^ q0) + java.lang.Long.bitCount(w1 ^ q1))
    }
    // rank-1 really is the minimum over the whole corpus
    got.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      val q = r.getAs[Long]("q_id"); val (q0, q1) = hashes(q)
      val best = hashes.collect { case (id, (w0, w1)) if id != q =>
        java.lang.Long.bitCount(w0 ^ q0) + java.lang.Long.bitCount(w1 ^ q1)
      }.min
      assert(r.getAs[Long]("hamming") == best.toLong)
    }
  }

  test("dedup_source_rate counts agree with the declared jaccard pairs") {
    val pairs = SparkEntry.queries("dedup_jaccard")(spark, sfDir)
      .select("da", "db").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val srcOf = U.tbl(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = SparkEntry.queries("dedup_source_rate")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((src, rows) <- srcOf.groupBy(_._2)) {
      val nDup = rows.count(r => pairs(r._1)).toLong
      val r = got(src)
      assert(r.getAs[Long]("n_docs") == rows.length.toLong &&
        r.getAs[Long]("n_dup") == nDup &&
        r.getAs[Long]("dup_rate_micro") == 1000000L * nDup / rows.length,
        s"dup rate diverges for $src")
    }
  }

  test("agg_chapman cells partition the user base and estimate sanely") {
    val r = operators.Aggregations.queries("agg_chapman")(spark, sfDir)
      .collect().head
    val (nTrue, a, b, m) = (r.getAs[Long]("n_true"), r.getAs[Long]("a"),
      r.getAs[Long]("b"), r.getAs[Long]("m"))
    assert(m <= math.min(a, b) && math.max(a, b) <= nTrue)
    val chap = (BigInt(a + 1) * (b + 1) / (m + 1) - 1).toLong
    assert(r.getAs[Long]("chapman_n") == chap)
    // Chapman never exceeds what independence would allow by much; at
    // minimum it must be at least the larger marginal
    assert(chap >= math.max(a, b))
  }

  test("ts_features matches a scalar per-user feature recompute") {
    val uid = someUser()
    val ys = userSeries(uid)
    val n = ys.length.toLong
    val ss = ys.sum
    val crossings = ys.sliding(2).count { case Seq(a, b) =>
      BigInt(n * b - ss) * (n * a - ss) < 0
    }.toLong
    val above = ys.map(v => n * v > ss)
    var best = 0L; var cur = 0L
    above.foreach(a => { if (a) { cur += 1; best = math.max(best, cur) }
      else cur = 0 })
    val sd2 = ys.sliding(2).collect { case Seq(a, b) =>
      BigInt(b - a) * (b - a) }.sum
    val sxx = ys.map(v => BigInt(v) * v).sum
    val den = BigInt(n) * sxx - BigInt(ss) * ss
    val r = operators.TimeSeries.queries("ts_features")(spark, sfDir)
      .filter(col("user_id") === uid).collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("sum_c") == ss &&
      r.getAs[Long]("min_c") == ys.min && r.getAs[Long]("max_c") == ys.max &&
      r.getAs[Long]("n_mean_crossings") == crossings &&
      r.getAs[Long]("longest_above_run") == best &&
      r.getAs[Long]("dw_micro") ==
        (BigInt(1000000) * n * sd2 / den).toLong)
  }

  test("ts_record_highs matches a scalar running-max scan") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "value").orderBy("event_type", "ts", "event_id")
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => cents(r.getDouble(1))).toSeq }
    val got = operators.TimeSeries.queries("ts_record_highs")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, xs) <- byType) {
      var mx = Long.MinValue; var rec = 0L
      xs.foreach(x => if (x > mx) { mx = x; rec += 1 })
      val r = got(et)
      assert(r.getAs[Long]("n") == xs.length.toLong &&
        r.getAs[Long]("n_records") == rec &&
        r.getAs[Long]("record_value") == xs.max, s"records diverge for $et")
    }
  }

  test("agg_qq_deciles picks the exact ceil-rank order statistics") {
    def side(t: String): Seq[Long] = U.events(spark, sfDir)
      .filter(col("event_type") === t).select("value").collect()
      .map(r => cents(r.getDouble(0))).toSeq.sorted
    val clicks = side("click"); val views = side("view")
    val got = operators.Aggregations.queries("agg_qq_deciles")(spark, sfDir)
      .collect()
    assert(got.length == 9)
    got.foreach { r =>
      val q = r.getAs[Long]("q").toInt
      def pick(xs: Seq[Long]) = xs((q * xs.length + 9) / 10 - 1)
      assert(r.getAs[Long]("x_click") == pick(clicks) &&
        r.getAs[Long]("x_view") == pick(views), s"decile $q diverges")
    }
  }

  test("agg_lorenz shares are monotone and end at exactly 100%") {
    val rows = operators.Aggregations.queries("agg_lorenz")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    val shares = rows.map(_.getAs[Long]("share_micro"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 1000000L)
    // convexity of the Lorenz curve: increments weakly increase
    val incs = (0L +: shares.toSeq).sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(incs.zip(incs.tail).forall { case (a, b) => a <= b + 1 },
      "Lorenz increments must be non-decreasing (1 micro slack for floors)")
  }

  test("text_heaps_law cumulative counts recompute from raw tokens") {
    val docsR = U.tbl(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val mid = docsR.map(_._1).max
    def bucket(id: Long) = math.min(9L, id * 10 / (mid + 1))
    val got = SparkEntry.queries("text_heaps_law")(spark, sfDir).collect()
    assert(got.length == 10)
    for (b <- 0L to 9L) {
      val in = docsR.filter(d => bucket(d._1) <= b)
      val toks = in.flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
      val r = got(b.toInt)
      assert(r.getAs[Long]("docs_cum") == in.length.toLong &&
        r.getAs[Long]("tokens_cum") == toks.length.toLong &&
        r.getAs[Long]("vocab_cum") == toks.distinct.length.toLong,
        s"heaps bucket $b diverges")
    }
  }

  test("ts_backtest_sma matches a scalar walk-forward replay") {
    val daily = U.events(spark, sfDir)
      .select("event_type", "ts", "value", "event_id")
      .orderBy("event_type", "ts", "event_id").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        cents(r.getDouble(2))))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).toSeq.sortBy(_._1.toString)
        .map { case (_, rs) => rs.last._3 })
      .toMap
    val got = operators.TimeSeries.queries("ts_backtest_sma")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, closes) <- daily if closes.length > 21) {
      var strat = 0L; var bh = 0L; var held = 0L; var nd = 0L
      for (i <- closes.indices.drop(20)) {
        val rnPrev = i // 0-based: row i has rn = i+1; signal from day i-1
        val sigPrev = rnPrev >= 20 &&
          4L * closes.slice(i - 5, i).sum > closes.slice(i - 20, i).sum
        val lr = math.floor(1e6 *
          math.log(closes(i).toDouble / closes(i - 1))).toLong
        nd += 1; bh += lr
        if (sigPrev) { held += 1; strat += lr }
      }
      val r = got(et)
      assert(r.getAs[Long]("n_days") == nd && r.getAs[Long]("n_held") == held &&
        r.getAs[Long]("strat_logret_micro") == strat &&
        r.getAs[Long]("bh_logret_micro") == bh, s"backtest diverges for $et")
    }
  }

  test("ts_oee factors multiply and bound each other correctly") {
    val rows = operators.TimeSeries.queries("ts_oee")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, p, q) = (r.getAs[Long]("avail_micro"),
        r.getAs[Long]("perf_micro"), r.getAs[Long]("qual_micro"))
      assert(a >= 0 && a <= 1000000L && p >= 0 && p <= 1000000L &&
        q >= 0 && q <= 1000000L)
      assert(r.getAs[Long]("oee_micro") == (a * p / 1000000L) * q / 1000000L)
      assert(r.getAs[Long]("oee_micro") <= Seq(a, p, q).min)
    }
  }

  test("ts_calendar_effects effects sum to zero when event-weighted") {
    val rows = operators.TimeSeries.queries("ts_calendar_effects")(
      spark, sfDir).collect()
    assert(rows.length == 7)
    // Σ n_d · effect_d = Σ n_d·mean_d − N·grand = 0 up to float noise
    val weighted = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("effect")).sum
    val total = rows.map(r =>
      r.getAs[Long]("n") * math.abs(r.getAs[Double]("mean"))).sum
    assert(math.abs(weighted) <= 1e-9 * total)
  }

  test("multimodal_resize_nn signature recomputes from closed-form pixels") {
    val got = SparkEntry.queries("multimodal_resize_nn")(spark, sfDir)
      .collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val w = (4 + id % 5).toInt; val h = (4 + (id * 7) % 5).toInt
      val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
      var sum = 0L
      for (y <- 0 until h2; x <- 0 until w2) {
        val k = (2 * y) * w + 2 * x
        sum += (y.toLong * w2 + x + 1) * ((id * 31 + k) % 256 +
          (id * 17 + (2 * y) * 3 + (2 * x) * 5) % 256 +
          (id * 13 + (2 * y) * 7 + (2 * x) * 11) % 256)
      }
      assert(r.getAs[Long]("n_in") == w.toLong * h &&
        r.getAs[Long]("n_out") == w2.toLong * h2 &&
        r.getAs[String]("resized_sig") == f"$w2%02x$h2%02x" + f"$sum%08x",
        s"resize diverges for doc $id")
    }
  }

  test("emb_norm_outliers ranks true n-scaled deviations per label") {
    val norms = U.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val n2 = r.getSeq[Float](2)
          .map(x => { val v = math.floor(x.toDouble * 1e6).toLong; v * v })
          .sum
        (r.getInt(1).toLong, r.getLong(0), n2)
      }
    val got = SparkEntry.queries("emb_norm_outliers")(spark, sfDir).collect()
    for ((lbl, rows) <- norms.groupBy(_._1)) {
      val n = rows.length.toLong
      val sn = rows.map(r => BigInt(r._3)).sum
      val expect = rows.map(r => (r._2, (BigInt(n) * r._3 - sn).abs))
        .sortBy { case (id, dev) => (-dev, id) }.take(3).map(_._1)
      val gotIds = got.filter(_.getAs[Long]("label") == lbl)
        .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      assert(gotIds == expect.toSeq,
        s"outlier ranking diverges for label $lbl")
    }
  }

  test("text_length_profile shares sum to ~1e6 per source") {
    val rows = SparkEntry.queries("text_length_profile")(spark, sfDir)
      .collect()
    for ((_, rs) <- rows.groupBy(_.getString(0))) {
      val tot = rs.map(_.getAs[Long]("share_micro")).sum
      // each bucket floors — at most |buckets| micro-units short
      assert(tot <= 1000000L && tot >= 1000000L - rs.length)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      U.tbl(spark, sfDir, "documents").count())
  }

  test("ts_pot_exceedance matches a scalar threshold-and-decluster scan") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "ts", "value")
      .orderBy("event_type", "ts", "event_id").collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r =>
        (r.getTimestamp(1).getTime * 1000L, cents(r.getDouble(2)))).toSeq }
    val got = operators.TimeSeries.queries("ts_pot_exceedance")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, xs) <- byType) {
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      // min value with 20·cum >= 19·n (ceil-rank P95 from the domain)
      val u = sorted((19 * n + 19) / 20 - 1)
      val exc = xs.filter(_._2 > u)
      var clusters = 0L; var prev = Long.MinValue
      exc.foreach { case (us, _) =>
        if (prev == Long.MinValue || us - prev > 3600000000L) clusters += 1
        prev = us
      }
      val r = got(et)
      assert(r.getAs[Long]("u_c") == u &&
        r.getAs[Long]("n_exceed") == exc.length.toLong &&
        r.getAs[Long]("n_clusters") == clusters, s"POT diverges for $et")
    }
  }

  test("agg_rfm scores are quintile-consistent and monotone in the metric") {
    val rows = operators.Aggregations.queries("agg_rfm")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(r.getAs[Long]("rfm") == rs * 100 + fs * 10 + ms)
    }
    // monotone: a strictly larger monetary total never scores lower
    val byM = rows.sortBy(_.getAs[Long]("m_cents"))
      .map(_.getAs[Long]("m_score"))
    assert(byM.zip(byM.tail).forall { case (a, b) => a <= b })
    // recency: strictly fewer days since purchase never scores lower
    val byR = rows.sortBy(-_.getAs[Long]("r_days"))
      .map(_.getAs[Long]("r_score"))
    assert(byR.zip(byR.tail).forall { case (a, b) => a <= b })
  }

  test("ts_completeness and ts_dispersion recompute from hourly counts") {
    val byType = U.events(spark, sfDir)
      .select("event_type", "ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).getTime * 1000L /
        3600000000L)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gotC = operators.TimeSeries.queries("ts_completeness")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val gotD = operators.TimeSeries.queries("ts_dispersion")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((et, hs) <- byType) {
      val cnt = hs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val grid = (hs.min to hs.max).map(h => cnt.getOrElse(h, 0L))
      val covered = grid.count(_ > 0).toLong
      var best = 0L; var cur = 0L
      grid.foreach(c => { if (c == 0) { cur += 1; best = math.max(best, cur) }
        else cur = 0 })
      val rc = gotC(et)
      assert(rc.getAs[Long]("n_hours") == grid.length.toLong &&
        rc.getAs[Long]("covered_hours") == covered &&
        rc.getAs[Long]("longest_outage_h") == best,
        s"completeness diverges for $et")
      val n = grid.length.toLong; val tot = grid.sum
      val scc = grid.map(c => BigInt(c) * c).sum
      val chi2 = (BigInt(1000000) * (BigInt(n) * scc - BigInt(tot) * tot)) /
        BigInt(tot)
      assert(gotD(et).getAs[Long]("chi2_micro") == chi2.toLong,
        s"dispersion diverges for $et")
    }
  }

  test("text_simpson matches a scalar token-concentration recompute") {
    val docsR = U.tbl(spark, sfDir, "documents").select("source", "text")
      .collect().map(r => r.getString(0) -> r.getString(1))
    val got = SparkEntry.queries("text_simpson")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((src, rs) <- docsR.groupBy(_._1)) {
      val toks = rs.flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
      val cnt = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val n = toks.length.toLong
      val m2 = cnt.values.map(c => BigInt(c) * (c - 1)).sum
      val r = got(src)
      assert(r.getAs[Long]("n_types") == cnt.size.toLong &&
        r.getAs[Long]("n_tokens") == n &&
        r.getAs[Long]("simpson_micro") ==
          (BigInt(1000000) * m2 / (BigInt(n) * (n - 1))).toLong,
        s"simpson diverges for $src")
    }
  }

  test("sink_jsonl round-trips the documents table value-identically") {
    val got = SparkEntry.queries("sink_jsonl")(spark, sfDir)
      .collect().map(_.toString)
    val orig = U.tbl(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toString)
    assert(got.nonEmpty && got.sameElements(orig))
  }

  test("sim_recall_at_k equals the driver-side overlap of its two inputs") {
    val ivf = llm.Similarity.queries("sim_ivf_ann")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val bf = llm.Similarity.queries("sim_bruteforce_topk")(spark, sfDir)
      .filter(col("rank") <= 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val got = llm.Similarity.queries("sim_recall_at_k")(spark, sfDir).collect()
    assert(got.length == 10)
    for (r <- got) {
      val q = r.getAs[Long]("q_id")
      val hits = (ivf & bf).count(_._1 == q).toLong
      assert(r.getAs[Long]("n_hits") == hits &&
        r.getAs[Double]("recall") == hits.toDouble / 3.0,
        s"recall diverges for query $q")
      assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
    }
  }

  test("sql_unpivot_syntax stacks three consistent metrics per status") {
    val rows = SparkEntry.queries("sql_unpivot_syntax")(spark, sfDir).collect()
    val byStatus = rows.groupBy(_.getString(0))
    assert(rows.length == 3 * byStatus.size)
    for ((st, rs) <- byStatus) {
      val m = rs.map(r => r.getString(1) -> r.getDouble(2)).toMap
      assert(m.keySet == Set("sum_price", "min_price", "max_price"))
      assert(m("min_price") <= m("max_price") &&
        m("max_price") <= m("sum_price"), s"metric order broken for $st")
    }
  }

  test("text_ttr laws hold and one document matches the scalar count") {
    val rows = SparkEntry.queries("text_ttr")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (tok, ty, ha) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n_hapax"))
      ha <= ty && ty <= tok &&
        r.getAs[Double]("ttr") == ty.toDouble / tok &&
        r.getAs[Double]("hapax_frac") == ha.toDouble / ty
    })
    val doc = U.tbl(spark, sfDir, "documents").filter(col("doc_id") === 0L)
      .select("text").first().getString(0)
    val counts = doc.split(" ").filter(_.nonEmpty).groupBy(identity)
    val r0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(r0.getAs[Long]("n_types") == counts.size &&
      r0.getAs[Long]("n_hapax") == counts.values.count(_.length == 1))
  }
}
