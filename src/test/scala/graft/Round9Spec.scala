package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-9 operators (the Round8Spec discipline:
  * independent scalar recomputation or cross-operator identities, so a
  * kernel regression cannot pass even if the DuckDB oracle regressed the
  * same way). */
class Round9Spec extends SparkTestBase {

  private def cents(v: Double): Long =
    new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("ts_turning_points matches a scalar recount and its closed-form mean") {
    val rows = SparkEntry.queries("ts_turning_points")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val series = U.events(spark, sfDir)
      .orderBy("ts", "event_id")
      .select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => cents(r.getDouble(1))).toSeq }
    rows.foreach { r =>
      val u = r.getLong(0); val n = r.getAs[Long]("n")
      val s = series(u)
      val t = (1 until s.length - 1).count(i =>
        (s(i) - s(i - 1)) * (s(i + 1) - s(i)) < 0)
      assert(n == s.length.toLong)
      assert(r.getAs[Long]("n_turning") == t.toLong, s"user $u")
      assert(r.getAs[Long]("expected_micro") == 2000000L * (n - 2) / 3L)
    }
  }

  test("ts_vn_rank matches a scalar midrank recomputation") {
    val rows = SparkEntry.queries("ts_vn_rank")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = U.events(spark, sfDir)
      .orderBy("ts", "event_id")
      .select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => cents(r.getDouble(1))).toSeq }
    rows.foreach { r =>
      val s = byUser(r.getLong(0))
      val sorted = s.sorted
      // doubled midrank = 2*min_rank + ties - 1 over the user's values
      def r2(v: Long): Long = {
        val lo = sorted.indexWhere(_ == v) + 1
        val ties = sorted.count(_ == v)
        2L * lo + ties - 1
      }
      val rs = s.map(r2)
      val nm2 = rs.sliding(2).collect { case Seq(a, b) => (b - a) * (b - a) }.sum
      val n = s.length.toLong
      val d2 = rs.map(x => x * x).sum - n * (n + 1) * (n + 1)
      assert(r.getAs[Long]("nm2") == nm2)
      assert(r.getAs[Long]("d2") == d2)
      assert(r.getAs[Long]("rvn_micro") == 1000000L * nm2 / d2)
      // random-series sanity: the ratio lives strictly inside (0, 4)
      assert(r.getAs[Long]("rvn_micro") > 0L && r.getAs[Long]("rvn_micro") < 4000000L)
    }
  }

  test("ts_cpk out-of-spec counts match a direct filter") {
    val rows = SparkEntry.queries("ts_cpk")(spark, sfDir).collect()
    val direct = U.events(spark, sfDir)
      .withColumn("vc", U.cents(col("value")))
      .filter(col("vc") < 0L || col("vc") > 30000L)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") == direct.getOrElse(r.getString(0), 0L))
      assert(!r.getAs[Double]("cpk").isNaN)
    }
  }

  test("agg_wilcoxon_signed W2+ stays within the rank-sum envelope") {
    val r = SparkEntry.queries("agg_wilcoxon_signed")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n"); val w = r.getAs[Long]("w2_plus")
    // all doubled ranks sum to n(n+1); W2+ is the positive-side share
    assert(n >= 1L && w >= 0L && w <= n * (n + 1))
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("agg_poisson_ci brackets the point rate") {
    val rows = SparkEntry.queries("agg_poisson_ci")(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val rate = r.getAs[Long]("n").toDouble / r.getAs[Long]("hours").toDouble
      assert(r.getAs[Double]("rate_lo") <= rate && rate <= r.getAs[Double]("rate_hi"))
      assert(r.getAs[Long]("rate_micro") == (1000000L * r.getAs[Long]("n")) / r.getAs[Long]("hours"))
    }
  }

  test("text_hapax counts nest: hapax <= types <= tokens") {
    val rows = SparkEntry.queries("text_hapax")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ty, tk, hx) = (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_hapax"))
      assert(hx <= ty && ty <= tk)
      assert(r.getAs[Long]("hapax_share_micro") == 1000000L * hx / ty)
    }
  }

  test("sink_csv roundtrip preserves every customer row and dtype") {
    val got = SparkEntry.queries("sink_csv")(spark, sfDir)
    val src = U.tbl(spark, sfDir, "customer")
    assert(got.schema == src.orderBy("c_custkey").schema)
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
  }

  test("triad census is consistent with the transitive-closure count") {
    // Σ over census classes of (count × transitive-orderings-per-class)
    // must equal graph_transitivity_dir's n_closed — two independently
    // shaped pipelines agreeing on a nontrivial weighted identity
    val weights = Map("030T" -> 1L, "030C" -> 0L, "120D" -> 2L,
      "120U" -> 2L, "120C" -> 1L, "210" -> 3L, "300" -> 6L)
    val census = SparkEntry.queries("graph_triad_census")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_triads")).toMap
    assert(census.keySet.subsetOf(weights.keySet), s"unknown class in $census")
    val fromCensus = census.map { case (k, v) => weights(k) * v }.sum
    val nClosed = SparkEntry.queries("graph_transitivity_dir")(spark, sfDir)
      .collect().head.getAs[Long]("n_closed")
    assert(fromCensus == nClosed,
      s"census-weighted closure $fromCensus != transitive count $nClosed")
  }

  test("ts_foster_stuart matches a scalar record recount") {
    val rows = SparkEntry.queries("ts_foster_stuart")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = U.events(spark, sfDir)
      .orderBy("ts", "event_id").select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => cents(r.getDouble(1))).toSeq }
    rows.foreach { r =>
      val s = byUser(r.getLong(0))
      var (up, lo) = (0L, 0L)
      var (mx, mn) = (s.head, s.head)
      s.tail.foreach { v =>
        if (v > mx) { up += 1; mx = v }
        if (v < mn) { lo += 1; mn = v }
      }
      assert(r.getAs[Long]("n_up_records") == up && r.getAs[Long]("n_lo_records") == lo)
      assert(r.getAs[Long]("d_stat") == up - lo && r.getAs[Long]("s_stat") == up + lo)
    }
  }

  test("ts_prepost halves partition each type's events exactly") {
    val rows = SparkEntry.queries("ts_prepost")(spark, sfDir).collect()
    val totals = U.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == totals.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pre") + r.getAs[Long]("n_post") ==
        totals(r.getString(0)))
      assert(r.getAs[Long]("n_pre") > 0L && r.getAs[Long]("n_post") > 0L)
    }
  }

  test("agg_jackknife matches a direct leave-one-out recomputation") {
    val per = U.events(spark, sfDir)
      .withColumn("vc", U.cents(col("value")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vc").as("s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nAll, sAll) = (per.values.map(_._1).sum, per.values.map(_._2).sum)
    val rows = SparkEntry.queries("agg_jackknife")(spark, sfDir).collect()
    rows.foreach { r =>
      val (nT, sT) = per(r.getString(0))
      val loo = BigInt(1000000) * BigInt(sAll - sT) / BigInt(nAll - nT)
      assert(BigInt(r.getAs[Long]("loo_mean_micro")) == loo)
      assert(r.getAs[Long]("shift_micro") ==
        loo.toLong - (BigInt(1000000) * BigInt(sAll) / BigInt(nAll)).toLong)
    }
  }

  test("ts_entropy_rate is bounded by ln(successor count)") {
    val rows = SparkEntry.queries("ts_entropy_rate")(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_rate_nats")
      val k = r.getAs[Long]("n_successors")
      // floored micro terms only shave downward; uniform is the max
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-9,
        s"${r.getString(0)}: H=$h outside [0, ln($k)]")
    }
  }

  test("agg_tost verdict is consistent with its own t statistics") {
    val r = SparkEntry.queries("agg_tost")(spark, sfDir).collect().head
    val (lo, hi) = (r.getAs[Double]("t_lower"), r.getAs[Double]("t_upper"))
    assert(lo > hi, "t_lower must exceed t_upper (they differ by 2δ/se)")
    assert(r.getAs[Boolean]("equivalent") == (lo > 1.645 && hi < -1.645))
  }

  test("span corruption is lossless: masked + target reconstructs the doc") {
    val rows = SparkEntry.queries("pipeline_span_corruption")(spark, sfDir)
      .collect()
    val texts = U.tbl(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val orig = texts(r.getLong(0)).split(" ").filter(_.nonEmpty).toSeq
      assert(r.getAs[Long]("n_tokens") == orig.length.toLong)
      // parse the target into sentinel -> span tokens
      val tgt = r.getAs[String]("target_text").split(" ").filter(_.nonEmpty)
      val spans = scala.collection.mutable.Map.empty[String, Vector[String]]
      var cur: String = null
      tgt.foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Vector.empty }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size.toLong == r.getAs[Long]("n_spans"))
      // substitute each sentinel back into the masked text
      val rebuilt = r.getAs[String]("masked_text").split(" ")
        .filter(_.nonEmpty).toSeq
        .flatMap(t => if (t.startsWith("<extra_id_")) spans(t) else Seq(t))
      assert(rebuilt == orig, s"doc ${r.getLong(0)} not reconstructable")
    }
  }

  test("FIM transform is lossless: P+M+S reorders back to the doc") {
    val rows = SparkEntry.queries("pipeline_fim")(spark, sfDir).collect()
    val texts = U.tbl(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Boolean]("fim_applied")).foreach { r =>
      val orig = texts(r.getLong(0)).split(" ").filter(_.nonEmpty).toSeq
      val t = r.getAs[String]("fim_text")
      val pre = t.indexOf("<fim_prefix> ") + "<fim_prefix> ".length
      val sufAt = t.indexOf(" <fim_suffix> ")
      val midAt = t.indexOf(" <fim_middle> ")
      val p = t.substring(pre, sufAt).split(" ").filter(_.nonEmpty).toSeq
      val sfx = t.substring(sufAt + " <fim_suffix> ".length, midAt)
        .split(" ").filter(_.nonEmpty).toSeq
      val m = t.substring(midAt + " <fim_middle> ".length)
        .split(" ").filter(_.nonEmpty).toSeq
      assert(p ++ m ++ sfx == orig, s"doc ${r.getLong(0)} not reconstructable")
      assert(p.length.toLong == r.getAs[Long]("cut1") &&
        (p.length + m.length).toLong == r.getAs[Long]("cut2"))
    }
  }

  test("emb_kmeans partitions the corpus with non-negative inertia") {
    val rows = SparkEntry.queries("emb_kmeans")(spark, sfDir)
      .collect()
    assert(rows.length <= 4 && rows.map(_.getLong(0)).distinct.length == rows.length)
    val total = U.tbl(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == total,
      "every vector must be assigned to exactly one cluster")
    rows.foreach(r => assert(r.getAs[Long]("inertia") >= 0L))
  }

  test("split leakage census accounts for every near-dup pair") {
    val cells = SparkEntry.queries("pipeline_split_leakage")(spark, sfDir)
      .collect()
    val total = SparkEntry.queries("dedup_jaccard")(spark, sfDir).count()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == total,
      "census cells must partition the full near-dup pair set")
    cells.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "split pair must be ordered")
      assert(r.getAs[Boolean]("crosses_split") ==
        (r.getString(0) != r.getString(1)))
    }
  }

  test("langid confusion cells tally the per-doc guesses exactly") {
    val cells = SparkEntry.queries("text_langid_confusion")(spark, sfDir)
      .collect()
    val perDoc = SparkEntry.queries("text_langid")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("guess")))
    val direct = perDoc.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(cells.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs"))
      .toMap == direct)
    assert(cells.map(_.getAs[Long]("n_docs")).sum == perDoc.length.toLong)
    cells.foreach(r =>
      assert(r.getAs[Boolean]("correct") == (r.getString(0) == r.getString(1))))
  }

  test("emb_kmeans_ari pair counts are a valid contingency decomposition") {
    val r = SparkEntry.queries("emb_kmeans_ari")(spark, sfDir).collect().head
    val (n, idx) = (r.getAs[Long]("n"), r.getAs[Long]("idx"))
    val (a2, b2) = (r.getAs[Long]("a2"), r.getAs[Long]("b2"))
    assert(n == U.tbl(spark, sfDir, "embeddings").count())
    // within-cell pairs can never exceed either marginal's pair count
    assert(idx <= a2 && idx <= b2 && a2 <= n * (n - 1) / 2 && b2 <= n * (n - 1) / 2)
    val ari = r.getAs[Double]("ari")
    assert(ari >= -1.0 && ari <= 1.0 && !ari.isNaN)
  }

  test("emb_mmr trajectory: distinct picks, argmax start, non-increasing scores") {
    val rows = SparkEntry.queries("emb_mmr")(spark, sfDir)
      .orderBy("step").collect()
    assert(rows.length == 5)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5 && !ids.contains(0L))
    // step 1 is pure relevance: must equal brute-force rank-1 for query 0
    val bf1 = SparkEntry.queries("sim_bruteforce_topk")(spark, sfDir)
      .filter(col("q_id") === 0L && col("rank") === 1L)
      .collect().head.getAs[Long]("vec_id")
    assert(ids.head == bf1)
    // the penalty is a cosine in [-1, 1] (it can be NEGATIVE, so scores
    // are NOT monotone across steps — anti-correlated picks get a bonus);
    // each selected score must sit inside the 0.7·rel ± 0.3 envelope
    rows.foreach { r =>
      val (rel, sc) = (r.getAs[Double]("rel"), r.getAs[Double]("score"))
      assert(sc <= 0.7 * rel + 0.3 + 1e-12 && sc >= 0.7 * rel - 0.3 - 1e-12)
    }
    // and step 1 (empty selected set) is exactly 0.7·rel
    assert(rows.head.getAs[Double]("score") ==
      0.7 * rows.head.getAs[Double]("rel") - 0.3 * 0.0)
  }
}
