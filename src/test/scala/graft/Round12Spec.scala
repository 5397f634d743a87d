package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-12 operators (the Round8-11Spec
  * discipline: independent scalar recomputation in plain Scala, so a
  * kernel regression cannot pass even if the DuckDB oracle regressed
  * the same way). */
class Round12Spec extends SparkTestBase {

  private def dayi(us: Long): Long = {
    val d = us / 86400000000L
    if (us < 0 && us % 86400000000L != 0) d - 1 else d
  }

  test("agg_bootstrap_ci: replicate means recount + CI ordering") {
    val rows = SparkEntry.queries("agg_bootstrap_ci")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")).as("vc"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def weight(eid: Long, b: Long): Long = {
      val h = ((eid % 1000000007L) * (1103515245L + b * 12820163L) +
        b * 12345L + 7L) % 100L
      if (h < 37) 0L else if (h < 74) 1L else if (h < 92) 2L
      else if (h < 98) 3L else 4L
    }
    rows.foreach { case (et, r) =>
      val grp = ev.filter(_._1 == et)
      // exact replicate means with the identical LCG, then the identical
      // order-statistic rank selection
      val means = (0L until 32L).flatMap { b =>
        var swv = BigInt(0); var sw = 0L
        grp.foreach { case (_, vc, eid) =>
          val w = weight(eid, b); swv += BigInt(w) * vc; sw += w
        }
        if (sw > 0) Some(((swv * 10000) / sw).toLong) else None
      }.sorted
      val nRep = means.length
      assert(r.getAs[Long]("n_rep") == nRep.toLong)
      val loRn = (5 * nRep + 99) / 100
      assert(r.getAs[Long]("lo_micro") == means(loRn - 1), s"$et lo")
      assert(r.getAs[Long]("hi_micro") == means(nRep - loRn), s"$et hi")
      assert(r.getAs[Long]("lo_micro") <= r.getAs[Long]("hi_micro"))
      val exactMean =
        (grp.map(g => BigInt(g._2)).sum * 10000 / grp.length).toLong
      assert(r.getAs[Long]("mean_micro") == exactMean, s"$et point mean")
      assert(r.getAs[Long]("n") == grp.length.toLong)
    }
  }

  test("agg_mcnemar: discordant-pair recount from raw events") {
    val rows = SparkEntry.queries("agg_mcnemar")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), dayi(r.getLong(2))))
    val days = ev.map(_._3)
    val sd = {
      val (lo, hi) = (days.min, days.max)
      (lo + hi + 1) / 2
    }
    rows.foreach { case (et, r) =>
      val byUser = ev.filter(_._2 == et).groupBy(_._1)
      val pp = byUser.map { case (_, es) =>
        (es.exists(_._3 < sd), es.exists(_._3 >= sd)) }
      val b = pp.count { case (pre, post) => pre && !post }.toLong
      val c = pp.count { case (pre, post) => !pre && post }.toLong
      assert(r.getAs[Long]("n_users") == byUser.size.toLong, s"$et n")
      assert(r.getAs[Long]("b") == b, s"$et b")
      assert(r.getAs[Long]("c") == c, s"$et c")
      val expect =
        if (b + c == 0) null
        else java.lang.Long.valueOf(
          (BigInt(1000000) * (b - c) * (b - c) / (b + c)).toLong)
      assert(r.getAs[java.lang.Long]("mcnemar_micro") == expect, s"$et q")
    }
  }

  test("agg_cochran_q: exact sufficient-statistic recount") {
    val r = SparkEntry.queries("agg_cochran_q")(spark, sfDir).collect().head
    val types = Seq("click", "view", "purchase")
    val ev = U.events(spark, sfDir)
      .filter(col("event_type").isin(types: _*))
      .select(col("user_id"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val byUser = ev.groupBy(_._1).map { case (_, es) =>
      types.map(t => if (es.exists(_._2 == t)) 1L else 0L) }
    val cs = types.indices.map(j => byUser.map(_(j)).sum)
    val nn = cs.sum
    val sr2 = byUser.map(x => { val s = x.sum; s * s }).sum
    assert(r.getAs[Long]("n_users") == byUser.size.toLong)
    assert((r.getAs[Long]("c1"), r.getAs[Long]("c2"), r.getAs[Long]("c3"))
      == ((cs(0), cs(1), cs(2))))
    val den = 3 * nn - sr2
    val expect =
      if (den == 0) null
      else java.lang.Long.valueOf((BigInt(2000000) *
        (3 * (BigInt(cs(0)) * cs(0) + BigInt(cs(1)) * cs(1) +
          BigInt(cs(2)) * cs(2)) - BigInt(nn) * nn) / den).toLong)
    assert(r.getAs[java.lang.Long]("q_micro") == expect)
  }

  test("emb_isotropy: exact mean-resultant recount, bounded in [0, 1e6]") {
    val rows = SparkEntry.queries("emb_isotropy")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val vecs = U.tbl(spark, sfDir, "embeddings")
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)))
    vecs.groupBy(_._1).foreach { case (lb, vs) =>
      val dims = vs.head._2.length
      val compSums = (0 until dims).map(p => vs.map(_._2(p)).sum)
      val s2 = compSums.map(s => BigInt(s) * s).sum
      val snrm = vs.map(v => v._2.map(x => BigInt(x) * x).sum).sum
      val expect = (BigInt(1000000) * s2 / (vs.length * snrm)).toLong
      val got = rows(lb).getAs[Long]("isotropy_micro")
      assert(got == expect, s"label $lb isotropy")
      assert(got >= 0L && got <= 1000000L, s"label $lb Cauchy-Schwarz bound")
      assert(rows(lb).getAs[Long]("n_vecs") == vs.length.toLong)
    }
  }

  test("emb_knn_label_purity: recount from the declared kNN graph") {
    val purity = SparkEntry.queries("emb_knn_label_purity")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    U.releaseTracked()
    val lbl = U.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = SparkEntry.queries("sim_knn_graph")(spark, sfDir)
      .select(col("vec_id"), col("nbr_id")).collect()
      .map(r => (lbl(r.getLong(0)), lbl(r.getLong(1))))
    U.releaseTracked()
    edges.groupBy(_._1).foreach { case (lb, es) =>
      val same = es.count { case (a, b) => a == b }.toLong
      val r = purity(lb)
      assert(r.getAs[Long]("n_edges") == es.length.toLong, s"label $lb edges")
      assert(r.getAs[Long]("n_same") == same, s"label $lb same")
      assert(r.getAs[Long]("purity_micro") == 1000000L * same / es.length)
    }
  }

  test("pipeline_dpo_pairs: max-margin pairing recount per source") {
    val rows = SparkEntry.queries("pipeline_dpo_pairs")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    U.releaseTracked()
    val docsRaw = U.tbl(spark, sfDir, "documents")
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        1000L * r.getString(2).count(_ != ' ') / r.getLong(3)))
    docsRaw.groupBy(_._2).foreach { case (src, ds) =>
      val ranked = ds.sortBy { case (id, _, sc) => (-sc, id) }.map(_._3)
      val n = ranked.length
      val margins = (0 until n / 2).map(i => ranked(i) - ranked(n - 1 - i))
      if (margins.isEmpty) assert(!rows.contains(src))
      else {
        val r = rows(src)
        assert(r.getAs[Long]("n_pairs") == margins.length.toLong, s"$src n")
        assert(r.getAs[Long]("mean_margin_milli") ==
          margins.sum / margins.length, s"$src mean")
        assert(r.getAs[Long]("min_margin_milli") == margins.min, s"$src min")
        assert(r.getAs[Long]("max_margin_milli") == margins.max, s"$src max")
        assert(margins.min >= 0L, s"$src margins must be non-negative")
      }
    }
  }

  test("pipeline_best_of_k: keep-argmax recount per source") {
    val rows = SparkEntry.queries("pipeline_best_of_k")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    U.releaseTracked()
    val ds = U.tbl(spark, sfDir, "documents")
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        1000L * r.getString(2).count(_ != ' ') / r.getLong(3)))
    val winners = ds.groupBy(_._1 / 4).toSeq.map { case (_, g) =>
      val best = g.minBy { case (id, _, sc) => (-sc, id) }
      val avg = g.map(_._3).sum / g.length
      (best._2, best._3 - avg)
    }
    val perSrcDocs = ds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    winners.groupBy(_._1).foreach { case (src, ws) =>
      val r = rows(src)
      assert(r.getAs[Long]("n_groups_won") == ws.length.toLong, s"$src won")
      assert(r.getAs[Long]("n_docs") == perSrcDocs(src))
      assert(r.getAs[Long]("keep_ratio_micro") ==
        1000000L * ws.length / perSrcDocs(src))
      assert(r.getAs[Long]("mean_gain_milli") ==
        ws.map(_._2).sum / ws.length, s"$src gain")
      assert(r.getAs[Long]("max_gain_milli") == ws.map(_._2).max)
    }
  }

  test("ts_croston: exact integer recursion recount from demand days") {
    val rows = SparkEntry.queries("ts_croston")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = U.events(spark, sfDir)
      .filter(U.cents(col("value")) >= 9000L)
      .select(col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), dayi(r.getLong(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.toSeq.map { case ((_, day), z) => (day, z) }.sortBy(_._1))
      .toMap
    val got = rows.groupBy(_.getAs[String]("event_type"))
    assert(got.keySet == daily.keySet)
    daily.foreach { case (et, series) =>
      var q = 0L; var a = -1L; var prev = 0L
      val expect = series.zipWithIndex.map { case ((day, z), i) =>
        if (i == 0) { q = 1000L * z; prev = day; (day, z, q, None, None) }
        else {
          val iv = day - prev; prev = day
          a = if (a < 0) 1000L * iv else (20L * 1000L * iv + 80L * a) / 100L
          q = (20L * 1000L * z + 80L * q) / 100L
          (day, z, q, Some(a), Some(1000L * q / a))
        }
      }
      val g = got(et).sortBy(_.getAs[Long]("dayi")).map { r =>
        (r.getAs[Long]("dayi"), r.getAs[Long]("z"), r.getAs[Long]("q_milli"),
          Option(r.getAs[java.lang.Long]("a_milli")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("forecast_milli"))
            .map(_.longValue))
      }
      assert(g.toSeq == expect.toSeq, s"$et croston trajectory")
    }
  }

  test("ts_ses_grid: exact fold recount per (type, alpha), argmin flagged") {
    val rows = SparkEntry.queries("ts_ses_grid")(spark, sfDir).collect()
    val daily = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), dayi(r.getLong(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.toSeq.map { case ((_, day), z) => (day, z) }.sortBy(_._1))
      .toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      assert(rs.map(_.getAs[Long]("alpha_decile")).sorted.toSeq ==
        (1L to 9L))
      val series = daily(et).map(_._2)
      rs.foreach { r =>
        val a = r.getAs[Long]("alpha_decile")
        var q = 1000L * series.head
        var sse = 0L
        series.tail.foreach { z =>
          val err = 1000L * z - q
          sse += err * err
          q = (a * 1000L * z + (10L - a) * q) / 10L
        }
        assert(r.getAs[Long]("n_days") == series.length.toLong)
        assert(r.getAs[Long]("level_milli") == q, s"$et a=$a level")
        assert(r.getAs[Long]("sse") == sse, s"$et a=$a sse")
      }
      val minSse = rs.map(_.getAs[Long]("sse")).min
      val flagged = rs.filter(_.getAs[Boolean]("is_best"))
      assert(flagged.nonEmpty &&
        flagged.forall(_.getAs[Long]("sse") == minSse), s"$et argmin flag")
    }
  }

  test("ts_its: segmented-regression recount and identity checks") {
    val rows = SparkEntry.queries("ts_its")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect()
      .map(r => ((r.getString(0), dayi(r.getLong(1))), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .toSeq.map { case ((et, day), y) => (et, day, y) }
    val sd = {
      val ds = daily.map(_._2)
      (ds.min + ds.max + 1) / 2
    }
    def fit(seg: Seq[(Long, Long)]): (Long, Long) = {
      val n = BigInt(seg.length)
      val sx = seg.map(s => BigInt(s._1)).sum
      val sy = seg.map(s => BigInt(s._2)).sum
      val sxx = seg.map(s => BigInt(s._1) * s._1).sum
      val sxy = seg.map(s => BigInt(s._1) * s._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      ((BigInt(1000000) * num / den).toLong,
        (BigInt(1000000) * (sy * den + num * (n * sd - sx)) /
          (n * den)).toLong)
    }
    rows.foreach { r =>
      val et = r.getString(0)
      val pts = daily.filter(_._1 == et).map(t => (t._2, t._3))
      val (pre, post) = pts.partition(_._1 < sd)
      val (sPre, pPre) = fit(pre)
      val (sPost, pPost) = fit(post)
      assert(r.getAs[Long]("n_pre") == pre.length.toLong)
      assert(r.getAs[Long]("n_post") == post.length.toLong)
      assert(r.getAs[Long]("slope_pre_micro") == sPre, s"$et pre slope")
      assert(r.getAs[Long]("slope_post_micro") == sPost, s"$et post slope")
      assert(r.getAs[Long]("delta_slope_micro") == sPost - sPre)
      assert(r.getAs[Long]("jump_micro") == pPost - pPre, s"$et jump")
    }
  }

  test("agg_perm_test: sign-flip recount and p-value bounds") {
    val rows = SparkEntry.queries("agg_perm_test")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val daily = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")), col("user_id"),
        U.cents(col("value")))
      .collect()
      .map(r => ((r.getString(0), dayi(r.getLong(1))),
        if (r.getLong(2) % 2 == 1) r.getLong(3) else -r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .groupBy(_._1._1).view
      .mapValues(_.toSeq.map { case ((_, day), diff) => (day, diff) })
      .toMap
    daily.foreach { case (et, ds) =>
      val r = rows(et)
      val tObs = math.abs(ds.map(_._2).sum)
      assert(r.getAs[Long]("n_days") == ds.length.toLong)
      assert(r.getAs[Long]("t_obs") == tObs, s"$et t_obs")
      val nGe = (1L to 19L).count { p =>
        val tp = math.abs(ds.map { case (day, diff) =>
          val h = ((day % 1000000007L) * (1103515245L + p * 12820163L) +
            p * 12345L + 7L) % 100L
          if (h < 50) diff else -diff
        }.sum)
        tp >= tObs
      }.toLong
      assert(r.getAs[Long]("n_ge") == nGe, s"$et n_ge")
      val pMicro = r.getAs[Long]("p_micro")
      assert(pMicro == 1000000L * (1 + nGe) / 20, s"$et p")
      assert(pMicro >= 50000L && pMicro <= 1000000L, s"$et p bounds")
    }
  }

  test("emb_int8_recall: int8 cosine is near-lossless on the fixtures") {
    val rows = SparkEntry.queries("emb_int8_recall")(spark, sfDir).collect()
    U.releaseTracked()
    assert(rows.length == 10)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 3L)
      assert(math.abs(r.getAs[Double]("recall") - h.toDouble / 3.0) < 1e-12)
    }
    // the point of the gate: per-vector int8 barely loses (vs raw 4-bit
    // PQ's ~0.2 measured in sim_pq_recall)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.8, s"int8 cosine must be near-lossless, got $mean")
  }

  test("agg_cvar: tail-mean recount, CVaR >= VaR") {
    val rows = SparkEntry.queries("agg_cvar")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value"))).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (et, vs) =>
      val sorted = vs.map(_._2).sorted(Ordering[Long].reverse)
      val k = (sorted.length + 19) / 20
      val tail = sorted.take(k)
      val r = rows(et)
      assert(r.getAs[Long]("n") == sorted.length.toLong)
      assert(r.getAs[Long]("k") == k.toLong)
      assert(r.getAs[Long]("var_cents") == tail.last, s"$et VaR")
      val cvar = (tail.map(BigInt(_)).sum * 10000 / k).toLong
      assert(r.getAs[Long]("cvar_micro") == cvar, s"$et CVaR")
      assert(r.getAs[Long]("cvar_micro") >=
        r.getAs[Long]("var_cents") * 10000L, "tail mean >= tail edge")
    }
  }

  test("ts_error_budget: daily recount; budget closes on the span total") {
    val rows = SparkEntry.queries("ts_error_budget")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("dayi"))
    val ev = U.events(spark, sfDir)
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (dayi(r.getLong(0)), r.getString(1) == "error"))
    val byDay = ev.groupBy(_._1).view
      .mapValues(es => (es.length.toLong, es.count(_._2).toLong)).toMap
    val totalN = ev.length.toLong
    var cum = 0L
    rows.foreach { r =>
      val (n, e) = byDay(r.getAs[Long]("dayi"))
      cum += e
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_errors") == e)
      assert(r.getAs[Long]("rate_micro") == 1000000L * e / n)
      assert(r.getAs[Long]("burn_micro") == 100000000L * e / n)
      assert(r.getAs[Long]("consumed_micro") ==
        (BigInt(100000000) * cum / totalN).toLong)
    }
    // the final day's consumption is the whole-span error rate over SLO
    val totErr = ev.count(_._2).toLong
    assert(rows.last.getAs[Long]("consumed_micro") ==
      (BigInt(100000000) * totErr / totalN).toLong)
  }

  test("pipeline_length_buckets: bucket recount, waste bounded by 128") {
    val rows = SparkEntry.queries("pipeline_length_buckets")(spark, sfDir)
      .collect()
    val lens = U.tbl(spark, sfDir, "documents").select(col("text"))
      .collect().map(_.getString(0).split(" ").count(_.nonEmpty).toLong)
    val expect = lens.groupBy(_ / 128L)
    assert(rows.map(_.getAs[Long]("bucket")).toSet == expect.keySet)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val g = expect(b)
      val cap = (b + 1) * 128L
      assert(r.getAs[Long]("cap") == cap)
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("sum_tokens") == g.sum)
      val pad = g.map(cap - _).sum
      assert(r.getAs[Long]("pad_tokens") == pad)
      assert(r.getAs[Long]("waste_micro") ==
        (BigInt(1000000) * pad / (g.length * cap)).toLong)
      // every doc pads strictly less than one bucket width
      assert(pad < 128L * g.length)
    }
  }

  test("agg_ratio_delta: exact ratio recount, CI symmetric around R") {
    val rows = SparkEntry.queries("agg_ratio_delta")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val per = U.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), U.cents(col("value")))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2).sum, vs.length.toLong)).toMap
      .groupBy(_._1._1)
    per.foreach { case (et, us) =>
      val r = rows(et)
      val sx = us.values.map(_._1).sum
      val sy = us.values.map(_._2).sum
      assert(r.getAs[Long]("n_users") == us.size.toLong)
      assert(r.getAs[Long]("ratio_micro") ==
        (BigInt(1000000) * sx / sy).toLong, s"$et ratio")
      val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      val rd = sx.toDouble / sy.toDouble
      val se = r.getAs[Double]("se")
      assert(se >= 0.0, s"$et se sign")
      assert(math.abs((hi - rd) - (rd - lo)) < 1e-6 * math.max(1.0, rd),
        s"$et CI must be symmetric around the ratio")
      assert(lo <= rd && rd <= hi)
    }
  }

  test("text_oov: reference source reads zero, recount on one source") {
    val rows = SparkEntry.queries("text_oov")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    U.releaseTracked()
    val docs = U.tbl(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")
        .filter(_.nonEmpty).toSeq))
    val ref = docs.map(_._1).min
    val vocab = docs.filter(_._1 == ref).flatMap(_._2).toSet
    assert(rows(ref).getAs[Long]("n_oov") == 0L,
      "the reference source must be fully in-vocab")
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val toks = ds.flatMap(_._2)
      val oov = toks.count(!vocab.contains(_)).toLong
      val r = rows(src)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("n_oov") == oov, s"$src oov")
      assert(r.getAs[Long]("oov_micro") == 1000000L * oov / toks.length)
    }
  }

  test("agg_srm: distinct-user arm recount, chi-square identity") {
    val rows = SparkEntry.queries("agg_srm")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val pu = U.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    pu.groupBy(_._1).foreach { case (et, us) =>
      val n0 = us.count(_._2 % 2 == 0).toLong
      val n1 = us.count(_._2 % 2 == 1).toLong
      val r = rows(et)
      assert(r.getAs[Long]("n0") == n0 && r.getAs[Long]("n1") == n1)
      val srm = BigInt(1000000) * (n0 - n1) * (n0 - n1) / (n0 + n1)
      assert(r.getAs[Long]("srm_micro") == srm.toLong, s"$et srm")
      assert(r.getAs[Boolean]("flagged") == (srm > 3841459L))
    }
  }

  test("agg_psi: per-band recount, PSI non-negative") {
    val rows = SparkEntry.queries("agg_psi")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    U.releaseTracked()
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect().map(r => (r.getString(0), dayi(r.getLong(1)),
        math.min(9L, r.getLong(2) / 1000L)))
    val days = ev.map(_._2)
    val sd = (days.min + days.max + 1) / 2
    ev.groupBy(_._1).foreach { case (et, es) =>
      val pre = es.filter(_._2 < sd)
      val post = es.filter(_._2 >= sd)
      val (n0, n1) = (pre.length.toLong, post.length.toLong)
      val psi = (0L to 9L).map { b =>
        val c0 = pre.count(_._3 == b).toLong
        val c1 = post.count(_._3 == b).toLong
        val p = (c0 + 1).toDouble / (n0 + 10).toDouble
        val q = (c1 + 1).toDouble / (n1 + 10).toDouble
        math.floor(1000000.0 * (p - q) * math.log(p / q)).toLong
      }.sum
      val r = rows(et)
      assert(r.getAs[Long]("n_pre") == n0 && r.getAs[Long]("n_post") == n1)
      assert(r.getAs[Long]("psi_micro") == psi, s"$et psi")
      assert(psi >= -10L, s"$et PSI is a sum of >= -1 floored terms")
      assert(r.getAs[Boolean]("flagged") == (psi > 200000L))
    }
  }

  test("agg_bh_fdr: step-up law against the shipped permutation p-values") {
    val pv = SparkEntry.queries("agg_perm_test")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("p_micro")).toMap
    val rows = SparkEntry.queries("agg_bh_fdr")(spark, sfDir).collect()
    U.releaseTracked()
    assert(rows.map(_.getString(0)).toSet == pv.keySet)
    val m = pv.size.toLong
    val ranked = pv.toSeq.sortBy { case (et, p) => (p, et) }.zipWithIndex
      .map { case ((et, p), i) => (et, p, i + 1L) }
    val k = ranked.filter { case (_, p, i) => p * m <= i * 200000L }
      .map(_._3).maxOption.getOrElse(0L)
    rows.foreach { r =>
      val et = r.getString(0)
      val (_, p, i) = ranked.find(_._1 == et).get
      assert(r.getAs[Long]("p_micro") == p, s"$et p must match the test's")
      assert(r.getAs[Long]("p_rank") == i, s"$et rank")
      assert(r.getAs[Long]("threshold_micro") == i * 200000L / m)
      assert(r.getAs[Boolean]("rejected") == (i <= k), s"$et step-up")
    }
    // step-up coherence: the rejected set is a rank prefix
    val rej = rows.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[Long]("p_rank")).sorted
    assert(rej.toSeq == (1L to rej.length))
  }

  test("sample_ess: Kish effective-sample-size recount") {
    val rows = SparkEntry.queries("sample_ess")(spark, sfDir).collect()
    U.releaseTracked()
    val per = U.tbl(spark, sfDir, "documents").groupBy(col("source"))
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nTotal, nSources) = (per.values.sum, per.size.toLong)
    val w = per.view.mapValues(n =>
      (BigInt(1000000) * nTotal / (n * nSources)).toLong).toMap
    val sw = per.map { case (s, n) => BigInt(n) * w(s) }.sum
    val sw2 = per.map { case (s, n) => BigInt(n) * w(s) * w(s) }.sum
    val ess = (BigInt(1000000) * sw * sw / (nTotal * sw2)).toLong
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("n_docs") == per(src))
      assert(r.getAs[Long]("w_micro") == w(src), s"$src weight")
      assert(r.getAs[Long]("ess_micro") == ess)
      assert(ess > 0L && ess <= 1000000L, "Kish ESS fraction bounds")
    }
  }

  test("ts_weibull_fit: median-rank regression recount from lifetimes") {
    val rows = SparkEntry.queries("ts_weibull_fit")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("grp")).toSet == Set(0L, 1L))
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), dayi(r.getLong(2))))
    rows.foreach { r =>
      val g = r.getAs[Long]("grp")
      // uncensored lifetimes: first error day - first event day + 1
      val ts = ev.filter(e => e._1 % 2 == g).groupBy(_._1).flatMap {
        case (_, es) =>
          val errs = es.filter(_._2 == "error")
          if (errs.isEmpty) None
          else Some(errs.map(_._3).min - es.map(_._3).min + 1)
      }.toSeq.sorted
      val n = ts.length
      assert(r.getAs[Long]("n_failures") == n.toLong, s"arm $g n")
      val xs = ts.map(t => math.floor(1e6 * math.log(t.toDouble)).toLong)
      val ys = (1 to n).map(i => math.floor(1e6 * math.log(-math.log(
        1.0 - (i.toDouble - 0.3) / (n.toDouble + 0.4)))).toLong)
      val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val beta = (BigInt(1000000) * num / den).toLong
      assert(r.getAs[Long]("beta_micro") == beta, s"arm $g beta")
      // wear-out direction on this fixture: shape must be positive
      assert(beta > 0L, s"arm $g beta sign")
      val xbar = (sx / n).toLong
      val ybar = (sy / n).toLong
      assert(r.getAs[Long]("xbar_micro") == xbar)
      assert(r.getAs[Long]("ybar_micro") == ybar)
      assert(r.getAs[Long]("ln_eta_micro") == xbar - 1000000L * ybar / beta)
    }
  }
}
