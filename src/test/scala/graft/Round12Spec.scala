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

  test("agg_eb_shrinkage: posterior mean recount + shrinkage laws") {
    val rows = SparkEntry.queries("agg_eb_shrinkage")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), U.cents(col("value")).as("vc"))
      .collect().map(r => (r.getLong(0), if (r.getLong(1) >= 5000L) 1L else 0L))
    val per = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong, es.map(_._2).sum)
    }
    val (sn, sk) = (per.map(_._2).sum, per.map(_._3).sum)
    val pbar = 1000000L * sk / sn
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      val m = r.getAs[Long]("m_prior")
      assert(r.getAs[Long]("global_micro") == pbar)
      assert(r.getAs[Long]("raw_micro") == 1000000L * k / n)
      val shrunk = r.getAs[Long]("shrunk_micro")
      assert(shrunk == (1000000L * k + m * pbar) / (n + m))
      // shrinkage law: the posterior mean lies between raw and global
      val (lo, hi) = (math.min(1000000L * k / n, pbar),
        math.max(1000000L * k / n, pbar))
      assert(shrunk >= lo - 1 && shrunk <= hi + 1,
        s"user ${r.getLong(0)}: $shrunk outside [$lo, $hi]")
    }
    // prior strength is shared and positive
    assert(rows.map(_.getAs[Long]("m_prior")).distinct.length == 1)
    assert(rows.head.getAs[Long]("m_prior") > 0L)
  }

  test("ts_matrix_profile: brute-force nearest-neighbor recount") {
    val rows = SparkEntry.queries("ts_matrix_profile")(spark, sfDir)
      .collect().groupBy(_.getString(0))
    assert(rows.nonEmpty)
    val daily = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect().map(r => (r.getString(0), dayi(r.getLong(1)), r.getLong(2)))
      .groupBy(e => (e._1, e._2)).map { case ((et, dy), es) =>
        (et, dy, es.map(_._3).sum)
      }.toSeq
    rows.foreach { case (et, rs) =>
      val ys = daily.filter(_._1 == et).sortBy(_._2).map(_._3).toArray
      val nWin = ys.length - 6
      def d2(i: Int, j: Int): BigInt = (0 until 7).map { k =>
        val d = BigInt(ys(i + k) - ys(j + k)); d * d
      }.sum
      assert(rs.length == nWin, s"$et window count")
      rs.foreach { r =>
        val i = r.getAs[Long]("w_idx").toInt - 1
        val cands = (0 until nWin).filter(j => math.abs(i - j) >= 4)
        val best = cands.map(j => (d2(i, j), j)).min
        assert(BigInt(r.getAs[String]("mp_d2")) == best._1,
          s"$et window $i d2")
        assert(r.getAs[Long]("nn_idx").toInt - 1 == best._2, s"$et window $i nn")
      }
    }
  }

  test("pipeline_grpo_adv: advantages sum to ~0 per group, rank bijects") {
    val rows = SparkEntry.queries("pipeline_grpo_adv")(spark, sfDir)
      .collect().groupBy(_.getAs[String]("source"))
    assert(rows.nonEmpty)
    rows.foreach { case (src, rs) =>
      val n = rs.length.toLong
      assert(rs.head.getAs[Long]("group_n") == n)
      // mean-baseline law: Σ adv ∈ [0, n) micro (floor of the group mean)
      val sumAdv = rs.map(r => BigInt(r.getAs[Long]("adv_micro"))).sum
      assert(sumAdv >= 0 && sumAdv < BigInt(n), s"$src sum adv $sumAdv")
      // ranks are a permutation of 1..n and order by reward desc
      val byRank = rs.sortBy(_.getAs[Long]("grp_rank"))
      assert(byRank.map(_.getAs[Long]("grp_rank")).toSeq == (1L to n).toSeq)
      byRank.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[Long]("reward") >= w(1).getAs[Long]("reward"))
      }
    }
  }

  test("agg_mutual_info: MI bounds and scalar recount") {
    val r = SparkEntry.queries("agg_mutual_info")(spark, sfDir)
      .collect().head
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")).as("vc"))
      .collect().map(x => (x.getString(0), math.min(9L, x.getLong(1) / 1000L)))
    val n = ev.length.toDouble
    val cells = ev.groupBy(identity).map { case (k, v) => k -> v.length }
    val cx = ev.groupBy(_._1).map { case (k, v) => k -> v.length }
    val cy = ev.groupBy(_._2).map { case (k, v) => k -> v.length }
    val mi = cells.map { case ((x, y), c) =>
      math.floor(1e6 * (c / n) *
        math.log(c * n / (cx(x).toDouble * cy(y).toDouble))).toLong
    }.sum
    val hx = cx.values.map(c =>
      math.floor(1e6 * (c / n) * math.log(n / c)).toLong).sum
    assert(r.getAs[Long]("n") == ev.length.toLong)
    assert(r.getAs[Long]("n_cells") == cells.size.toLong)
    assert(r.getAs[Long]("mi_micro_nats") == mi)
    assert(r.getAs[Long]("hx_micro_nats") == hx)
    // information laws (floored-term slack: one micro-nat per cell)
    val slack = r.getAs[Long]("n_cells")
    assert(r.getAs[Long]("mi_micro_nats") >= -slack)
    assert(r.getAs[Long]("mi_micro_nats") <=
      math.min(r.getAs[Long]("hx_micro_nats"),
        r.getAs[Long]("hy_micro_nats")) + slack)
  }

  test("ts_sampen: template-match recount and m-monotonicity") {
    val rows = SparkEntry.queries("ts_sampen")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect().map(r => (r.getString(0), dayi(r.getLong(1)), r.getLong(2)))
      .groupBy(e => (e._1, e._2)).map { case ((et, dy), es) =>
        (et, dy, es.map(_._3).sum)
      }.toSeq
    rows.foreach { r =>
      val et = r.getString(0)
      val ys = daily.filter(_._1 == et).sortBy(_._2).map(_._3).toArray
      val rtol = (ys.max - ys.min) / 5
      assert(r.getAs[Long]("rtol_cents") == rtol)
      val nT = ys.length - 2
      var b = 0L; var a = 0L
      for (i <- 0 until nT; j <- i + 1 until nT) {
        val d01 = math.max(math.abs(ys(i) - ys(j)),
          math.abs(ys(i + 1) - ys(j + 1)))
        val d012 = math.max(d01, math.abs(ys(i + 2) - ys(j + 2)))
        if (d01 <= rtol) b += 1
        if (d012 <= rtol) a += 1
      }
      assert(r.getAs[Long]("b_count") == b, s"$et B")
      assert(r.getAs[Long]("a_count") == a, s"$et A")
      assert(a <= b, s"$et extendability")
      if (a > 0 && b > 0)
        assert(r.getAs[Long]("sampen_micro_nats") ==
          math.floor(1e6 * math.log(b.toDouble / a.toDouble)).toLong)
    }
  }

  test("text_log_odds: prior/count recount for the top token") {
    val rows = SparkEntry.queries("text_log_odds")(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 20L))
    // |δ| is non-increasing down the ranks
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(math.abs(w(0).getAs[Long]("delta_micro_nats")) >=
          math.abs(w(1).getAs[Long]("delta_micro_nats")))
    }
    val toks = U.tbl(spark, sfDir, "documents")
      .select(col("source"), explode(graft.llm.TextUtil.tokens(col("text")))
        .as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val corpus = toks.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val y0 = toks.filter(_._1 == "src0").groupBy(_._2)
      .map { case (t, v) => t -> v.length.toLong }
    val y1 = toks.filter(_._1 == "src1").groupBy(_._2)
      .map { case (t, v) => t -> v.length.toLong }
    val n0 = y0.values.sum; val n1 = y1.values.sum
    val aa = corpus.values.sum
    rows.foreach { r =>
      val t = r.getAs[String]("token")
      assert(r.getAs[Long]("alpha") == corpus(t))
      assert(r.getAs[Long]("y0") == y0.getOrElse(t, 0L))
      assert(r.getAs[Long]("y1") == y1.getOrElse(t, 0L))
      val d = math.floor(1e6 * math.log((y0.getOrElse(t, 0L) + corpus(t))
          .toDouble / (n0 + aa - y0.getOrElse(t, 0L) - corpus(t)))).toLong -
        math.floor(1e6 * math.log((y1.getOrElse(t, 0L) + corpus(t))
          .toDouble / (n1 + aa - y1.getOrElse(t, 0L) - corpus(t)))).toLong
      assert(r.getAs[Long]("delta_micro_nats") == d, s"token $t")
    }
  }

  test("graph_eccentricity: scalar BFS recount on the support graph") {
    val rows = SparkEntry.queries("graph_eccentricity")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    // rebuild the support-filtered symmetric adjacency independently
    val li = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, ls) =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    val seeds = adj.keys.toSeq.sorted.take(5)
    assert(rows.map(_.getLong(0)).toSeq == seeds)
    rows.foreach { r =>
      val seed = r.getLong(0)
      var dist = Map(seed -> 0L)
      var frontier = Set(seed)
      var h = 1L
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(dist.keySet)
        next.foreach(n => dist += n -> h)
        frontier = next
        h += 1
      }
      assert(r.getAs[Long]("eccentricity") == dist.values.max, s"seed $seed")
      assert(r.getAs[Long]("n_reached") == dist.size - 1L, s"seed $seed n")
    }
  }

  private def predPairs(): Seq[(Long, Long)] = {
    // independent rebuild of the temporal-split (score, label) frame
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect()
      .map(r => (r.getLong(0), dayi(r.getLong(1)),
        if (r.getLong(2) >= 5000L) 1L else 0L))
    val days = ev.map(_._2)
    val sd = {
      val (lo, hi) = (days.min, days.max)
      val s = lo + hi + 1
      if (s >= 0 || s % 2 == 0) s / 2 else s / 2 - 1
    }
    ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val pre = es.filter(_._2 < sd)
      val post = es.filter(_._2 >= sd)
      if (pre.nonEmpty && post.nonEmpty)
        Some((1000000L * pre.map(_._3).sum / pre.length,
          post.map(_._3).max))
      else None
    }
  }

  test("agg_auc: pairwise Mann-Whitney recount, AUC in [0, 1]") {
    val r = SparkEntry.queries("agg_auc")(spark, sfDir).collect().head
    val pf = predPairs()
    val pos = pf.filter(_._2 == 1L).map(_._1)
    val neg = pf.filter(_._2 == 0L).map(_._1)
    assert(r.getAs[Long]("npos") == pos.length.toLong)
    assert(r.getAs[Long]("nneg") == neg.length.toLong)
    var u2 = BigInt(0)
    for (p <- pos; q <- neg) {
      if (p > q) u2 += 2 else if (p == q) u2 += 1
    }
    assert(BigInt(r.getAs[Long]("u2")) == u2)
    if (pos.nonEmpty && neg.nonEmpty) {
      val auc = BigInt(1000000) * u2 /
        (BigInt(2) * pos.length * neg.length)
      assert(BigInt(r.getAs[Long]("auc_micro")) == auc)
      assert(r.getAs[Long]("auc_micro") >= 0L &&
        r.getAs[Long]("auc_micro") <= 1000000L)
    }
  }

  test("agg_pr_curve: recall is monotone non-increasing in threshold") {
    val rows = SparkEntry.queries("agg_pr_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("thr"))
    assert(rows.length == 9)
    val pf = predPairs()
    rows.foreach { r =>
      val t = r.getAs[Long]("thr")
      assert(r.getAs[Long]("tp") ==
        pf.count(p => p._1 >= t && p._2 == 1L).toLong)
      assert(r.getAs[Long]("fp") ==
        pf.count(p => p._1 >= t && p._2 == 0L).toLong)
      assert(r.getAs[Long]("fn") ==
        pf.count(p => p._1 < t && p._2 == 1L).toLong)
    }
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        def rec(x: org.apache.spark.sql.Row): Long =
          Option(x.getAs[Any]("recall_micro"))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
        assert(rec(w(0)) >= rec(w(1)), "recall must fall as thr rises")
      }
    }
  }

  test("agg_ece: bucket recount; ECE is the weighted gap mean") {
    val rows = SparkEntry.queries("agg_ece")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pf = predPairs()
    val byB = pf.groupBy(p => math.min(9L, p._1 / 100000L))
    assert(rows.length == byB.size)
    var wsum = BigInt(0); var n = 0L
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val grp = byB(b)
      assert(r.getAs[Long]("n") == grp.length.toLong)
      assert(r.getAs[Long]("conf_micro") ==
        (grp.map(x => BigInt(x._1)).sum / grp.length).toLong)
      assert(r.getAs[Long]("acc_micro") ==
        1000000L * grp.count(_._2 == 1L) / grp.length)
      wsum += BigInt(grp.length) * r.getAs[Long]("gap_micro")
      n += grp.length
    }
    assert(BigInt(rows.head.getAs[Long]("ece_micro")) == wsum / n)
  }

  test("ts_dominant_period: argmax consistency with ts_acf_lags") {
    val best = SparkEntry.queries("ts_dominant_period")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val acf = SparkEntry.queries("ts_acf_lags")(spark, sfDir)
      .collect().groupBy(_.getString(0))
    assert(best.keySet == acf.keySet)
    best.foreach { case (et, r) =>
      val rows = acf(et)
      val top = rows.map(x =>
        (-x.getAs[Long]("acf_micro"), x.getAs[Long]("lag"))).min
      assert(r.getAs[Long]("best_lag") == top._2, s"$et lag")
      assert(r.getAs[Long]("acf_micro") == -top._1, s"$et acf")
      // significance equals the squared-band rule on (acf, n)
      val n = r.getAs[Long]("n")
      assert(r.getAs[Boolean]("significant") ==
        (BigInt(n) * r.getAs[Long]("acf_micro") * r.getAs[Long]("acf_micro")
          >= BigInt("4000000000000")))
    }
  }

  test("text_burrows_delta: symmetry-free pairs, self-consistent scale") {
    val rows = SparkEntry.queries("text_burrows_delta")(spark, sfDir)
      .collect()
    val nSrc = U.tbl(spark, sfDir, "documents")
      .select(col("source")).distinct().count()
    assert(rows.length == (nSrc * (nSrc - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getAs[Long]("delta_micro") >= 0L)
    }
    // z-scores are standardized: the mean pairwise delta of a z-scored
    // feature set is O(1) — a loose magnitude sanity band (not ~0, not
    // orders of magnitude off)
    val mean = rows.map(_.getAs[Long]("delta_micro")).sum / rows.length
    assert(mean > 100000L && mean < 5000000L, s"mean delta $mean")
  }

  test("agg_cmh: per-stratum recount of the 2x2 margins and terms") {
    val r = SparkEntry.queries("agg_cmh")(spark, sfDir).collect().head
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect().map(x => (dayi(x.getLong(1)), x.getLong(0) % 2,
        if (x.getLong(2) >= 5000L) 1L else 0L))
    val strata = ev.groupBy(_._1).values.map { es =>
      val a = es.count(e => e._2 == 0 && e._3 == 1).toLong
      val b = es.count(e => e._2 == 0 && e._3 == 0).toLong
      val c = es.count(e => e._2 == 1 && e._3 == 1).toLong
      val dd = es.count(e => e._2 == 1 && e._3 == 0).toLong
      (a, b, c, dd, a + b + c + dd)
    }.filter(_._5 > 1).toSeq
    assert(r.getAs[Long]("n_strata") == strata.length.toLong)
    var (num, den, sad, sbc) = (BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    strata.foreach { case (a, b, c, dd, n) =>
      num += BigInt(1000000) * a - BigInt(a + b) * (a + c) * 1000000 / n
      den += BigInt(a + b) * (c + dd) * (a + c) * (b + dd) * 1000000 /
        (BigInt(n) * n * (n - 1))
      sad += BigInt(a) * dd * 1000000 / n
      sbc += BigInt(b) * c * 1000000 / n
    }
    assert(BigInt(r.getAs[Long]("num_micro")) == num)
    assert(BigInt(r.getAs[Long]("den_micro")) == den)
    assert(BigInt(r.getAs[Long]("chi2_micro")) == num * num / den)
    assert(BigInt(r.getAs[Long]("or_micro")) == sad * 1000000 / sbc)
    // id-parity arms on iid values: no real association, chi2 modest
    assert(r.getAs[Long]("chi2_micro") >= 0L)
  }

  test("emb_cka: Frobenius recount off the shared gram; CKA2 in [0,1]") {
    val r = SparkEntry.queries("emb_cka")(spark, sfDir).collect().head
    val emb = U.tbl(spark, sfDir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * 1e6).toLong).toArray)
    val dims = 64
    var (fxx, fxy, fyy) = (BigInt(0), BigInt(0), BigInt(0))
    for (i <- 0 until dims; j <- 0 until dims) {
      var cell = BigInt(0)
      emb.foreach(v => cell += BigInt(v(i)) * v(j))
      // the gram cache's BIGINT truncation (cells are non-negative on
      // this fixture — verified by the eigvec family's green oracles)
      val cd = cell / 1000000000L
      val sq = cd * cd
      if (i < 32 && j < 32) fxx += sq
      else if (i < 32 && j >= 32) fxy += sq
      else if (i >= 32 && j >= 32) fyy += sq
    }
    assert(BigInt(r.getAs[Long]("fxx")) == fxx)
    assert(BigInt(r.getAs[Long]("fxy")) == fxy)
    assert(BigInt(r.getAs[Long]("fyy")) == fyy)
    val cka2 = r.getAs[Long]("cka2_micro")
    assert(BigInt(cka2) == fxy * fxy * 1000000 / (fxx * fyy))
    // Cauchy–Schwarz: ||X'Y||_F^2 <= ||X'X||_F ||Y'Y||_F => CKA2 <= 1
    assert(cka2 >= 0L && cka2 <= 1000000L)
  }

  test("agg_gain_chart: cumulative recount; gain ends at 100%") {
    val rows = SparkEntry.queries("agg_gain_chart")(spark, sfDir)
      .collect().sortBy(-_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    val pf = predPairs()
    val nt = pf.length.toLong
    val pt = pf.count(_._2 == 1L).toLong
    var (cumN, cumP) = (0L, 0L)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val grp = pf.filter(p => math.min(9L, p._1 / 100000L) == b)
      assert(r.getAs[Long]("n") == grp.length.toLong)
      assert(r.getAs[Long]("pos") == grp.count(_._2 == 1L).toLong)
      cumN += grp.length; cumP += grp.count(_._2 == 1L)
      assert(r.getAs[Long]("cum_n") == cumN)
      assert(r.getAs[Long]("cum_pos") == cumP)
      if (pt > 0) {
        assert(r.getAs[Long]("gain_micro") == 1000000L * cumP / pt)
        assert(BigInt(r.getAs[Long]("lift_micro")) ==
          BigInt(cumP) * nt * 1000000 / (BigInt(pt) * cumN))
      }
    }
    // the full population captures every converter
    if (pt > 0) {
      assert(rows.last.getAs[Long]("gain_micro") == 1000000L)
      assert(rows.last.getAs[Long]("lift_micro") == 1000000L)
    }
  }

  test("agg_anderson_darling: scalar recount of the tie-adjusted A2") {
    val r = SparkEntry.queries("agg_anderson_darling")(spark, sfDir)
      .collect().head
    val ev = U.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), U.cents(col("value")))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = ev.count(_._1 == "click").toLong
    val m = ev.count(_._1 == "view").toLong
    val bigN = n + m
    val blocks = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, es) =>
      (es.count(_._1 == "click").toLong, es.length.toLong)
    }
    var (cumA, cum) = (0L, 0L)
    var tsum = BigInt(0)
    blocks.foreach { case (cn, l) =>
      cumA += cn; cum += l
      val a2m = 2 * cumA - cn
      val c2 = 2 * cum - l
      val u = BigInt(bigN) * a2m - BigInt(n) * c2
      val v = BigInt(c2) * (2 * bigN - c2) - BigInt(bigN) * l
      if (v > 0) tsum += BigInt(1000000) * l * u * u / v
    }
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("m") == m)
    assert(r.getAs[Long]("n_support") == blocks.length.toLong)
    assert(BigInt(r.getAs[Long]("a2_micro")) == tsum / bigN)
    // A2 is positive on these (different-scale) distributions
    assert(r.getAs[Long]("a2_micro") > 0L)
  }

  test("agg_jonckheere: brute-force pair recount of 2J and moments") {
    val r = SparkEntry.queries("agg_jonckheere")(spark, sfDir)
      .collect().head
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val types = ev.map(_._1).distinct.sorted
    var j2 = BigInt(0)
    for (a <- types.indices; b <- (a + 1) until types.length) {
      val xs = ev.filter(_._1 == types(a)).map(_._2)
      val ys = ev.filter(_._1 == types(b)).map(_._2)
      // value-domain recount (the O(n·m) loop is fine at sf0.001)
      for (x <- xs; y <- ys) {
        if (x < y) j2 += 2 else if (x == y) j2 += 1
      }
    }
    val n = ev.length.toLong
    val nts = types.map(t => ev.count(_._1 == t).toLong)
    assert(BigInt(r.getAs[Long]("j2")) == j2)
    assert(r.getAs[Long]("n") == n)
    assert(BigInt(r.getAs[Long]("ej4")) ==
      BigInt(n) * n - nts.map(x => BigInt(x) * x).sum)
    assert(BigInt(r.getAs[Long]("v72")) ==
      BigInt(n) * n * (2 * n + 3) -
        nts.map(x => BigInt(x) * x * (2 * x + 3)).sum)
  }

  test("agg_fleiss_kappa: confusion recount; kappa in [-1, 1]") {
    val r = SparkEntry.queries("agg_fleiss_kappa")(spark, sfDir)
      .collect().head
    val ev = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        U.cents(col("value")))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val items = ev.groupBy(_._1).filter(_._2.length >= 3).map { case (_, es) =>
      val f3 = es.sortBy(e => (e._2, e._3)).take(3).map(_._4)
      (f3.count(_ < 1000L).toLong,
        f3.count(v => v >= 1000L && v < 5000L).toLong,
        f3.count(_ >= 5000L).toLong)
    }.toSeq
    val nI = items.length.toLong
    val s6 = items.map { case (a, b, c) => a * a + b * b + c * c - 3 }.sum
    val cs = Seq(items.map(_._1).sum, items.map(_._2).sum,
      items.map(_._3).sum)
    assert(r.getAs[Long]("n_items") == nI)
    assert(r.getAs[Long]("s6") == s6)
    assert(Seq(r.getAs[Long]("c0"), r.getAs[Long]("c1"),
      r.getAs[Long]("c2")) == cs)
    val sumC2 = cs.map(x => BigInt(x) * x).sum
    val k = BigInt(1000000) * (3 * nI * s6 - 2 * sumC2) /
      (2 * (BigInt(9) * nI * nI - sumC2))
    assert(BigInt(r.getAs[Long]("kappa_micro")) == k)
    assert(math.abs(r.getAs[Long]("kappa_micro")) <= 1000000L)
  }

  test("pipeline_semdedup: cluster counts close on emb_kmeans; ratios") {
    val rows = SparkEntry.queries("pipeline_semdedup")(spark, sfDir)
      .collect()
    val km = SparkEntry.queries("emb_kmeans")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_members")).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cid = r.getLong(0)
      assert(r.getAs[Long]("n_vecs") == km(cid),
        s"cluster $cid size must equal the shipped k-means assignment")
      val (nv, nd) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dropped"))
      assert(nd >= 0L && nd < nv)
      assert(r.getAs[Long]("keep_ratio_micro") ==
        1000000L * (nv - nd) / nv)
    }
  }

  test("graph_hits: cap=0 distributed twin matches the kernel") {
    val fast = SparkEntry.queries("graph_hits")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dist = graft.operators.Graphs.hitsImpl(spark, sfDir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.toSeq == dist.toSeq)
  }

  test("agg_brier: scalar recount; BSS consistent with Brier and base") {
    val r = SparkEntry.queries("agg_brier")(spark, sfDir).collect().head
    val pf = predPairs()
    val n = pf.length.toLong
    val npos = pf.count(_._2 == 1L).toLong
    val sq = pf.map { case (s0, l) =>
      val d = BigInt(s0 - 1000000L * l); d * d
    }.sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("npos") == npos)
    assert(BigInt(r.getAs[Long]("brier_micro2")) == sq / n)
    val base = BigInt(npos) * (n - npos) * BigInt("1000000000000") /
      (BigInt(n) * n)
    assert(BigInt(r.getAs[Long]("base_micro2")) == base)
    if (base > 0) {
      assert(r.getAs[Long]("bss_micro") ==
        1000000L - (BigInt(r.getAs[Long]("brier_micro2")) * 1000000 /
          base).toLong)
      // the pre-period rate must beat climatology on a non-degenerate mix
      assert(r.getAs[Long]("brier_micro2") <= r.getAs[Long]("base_micro2"))
    } else {
      // all (or no) users convert post-period: climatology is perfect and
      // the skill score is undefined — the kernel must return NULL
      assert(r.isNullAt(r.fieldIndex("bss_micro")))
    }
  }

  test("graph_closeness_k: cap=0 distributed twin matches the kernel") {
    val fast = SparkEntry.queries("graph_closeness_k")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dist = graft.operators.Graphs.closenessImpl(spark, sfDir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.toSeq == dist.toSeq)
  }

  test("graph_eccentricity: cap=0 distributed twin matches the kernel") {
    val fast = SparkEntry.queries("graph_eccentricity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dist = graft.operators.Graphs.eccentricityImpl(spark, sfDir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.sorted.toSeq == dist.sorted.toSeq)
  }

  test("sim_rrf_fusion: fused score recount from the two shipped rankers") {
    val fused = SparkEntry.queries("sim_rrf_fusion")(spark, sfDir).collect()
    assert(fused.nonEmpty)
    // rebuild both rank lists from the library's own declared rankers is
    // circular; instead check the RRF laws: scores decompose into the two
    // reciprocal terms, ranks within [1,10], 3 rows per query descending
    fused.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == 3, s"query $q row count")
      val sorted = rs.sortBy(_.getAs[Long]("fused_rank"))
      assert(sorted.map(_.getAs[Long]("fused_rank")).toSeq == Seq(1L, 2L, 3L))
      sorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[Long]("rrf_micro") >= w(1).getAs[Long]("rrf_micro"))
      }
      sorted.foreach { r =>
        val c = Option(r.getAs[Any]("cos_rank")).map(_.asInstanceOf[Long])
        val h = Option(r.getAs[Any]("ham_rank")).map(_.asInstanceOf[Long])
        assert(c.nonEmpty || h.nonEmpty)
        c.foreach(x => assert(x >= 1 && x <= 10))
        h.foreach(x => assert(x >= 1 && x <= 10))
        val expect = c.map(x => 1000000L / (60 + x)).getOrElse(0L) +
          h.map(x => 1000000L / (60 + x)).getOrElse(0L)
        assert(r.getAs[Long]("rrf_micro") == expect)
      }
    }
  }

  test("ts_ransac_trend: consensus recount; RANSAC beats no line") {
    val rows = SparkEntry.queries("ts_ransac_trend")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = U.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")),
        U.cents(col("value")))
      .collect().map(r => (r.getString(0), dayi(r.getLong(1)), r.getLong(2)))
      .groupBy(e => (e._1, e._2)).map { case ((et, dy), es) =>
        (et, dy, es.map(_._3).sum)
      }.toSeq
    rows.foreach { r =>
      val et = r.getString(0)
      val ys = daily.filter(_._1 == et).sortBy(_._2).map(_._3).toArray
      val n = ys.length
      val tol = (ys.max - ys.min) / 10
      def inliers(c: Int): Long = {
        val (x1, x2) = (c.toLong, n - 5L + c)
        val (y1, y2) = (ys(c - 1), ys((n - 5 + c) - 1))
        (1 to n).count { x =>
          math.abs((ys(x - 1) - y1) * (x2 - x1) -
            (x - x1) * (y2 - y1)) <= tol * (x2 - x1)
        }.toLong
      }
      val best = (1 to 5).map(c => (-inliers(c), c)).min
      assert(r.getAs[Long]("cand") == best._2.toLong, s"$et cand")
      assert(r.getAs[Long]("n_inliers") == -best._1, s"$et inliers")
      assert(r.getAs[Long]("n_days") == n.toLong)
      // the consensus line must cover its own two anchors at least
      assert(r.getAs[Long]("n_inliers") >= 2L)
      val c = best._2
      val slope = BigInt(1000000L) * (ys((n - 5 + c) - 1) - ys(c - 1)) /
        (n - 5L)
      assert(BigInt(r.getAs[Long]("slope_micro")) == slope, s"$et slope")
    }
  }

  test("graph_bipartite_proj: shared-user recount + cosine bounds") {
    val rows = SparkEntry.queries("graph_bipartite_proj")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ud = U.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byType = ud.groupBy(_._2).map { case (t, es) =>
      t -> es.map(_._1).toSet
    }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val (ua, ub) = (byType(a), byType(b))
      assert(r.getAs[Long]("w") == (ua & ub).size.toLong)
      assert(r.getAs[Long]("deg_a") == ua.size.toLong)
      assert(r.getAs[Long]("deg_b") == ub.size.toLong)
      val c2 = r.getAs[Long]("cos2_micro")
      assert(c2 >= 0L && c2 <= 1000000L)
      assert(c2 == BigInt(r.getAs[Long]("w")) * r.getAs[Long]("w") *
        1000000L / (BigInt(ua.size) * ub.size))
    }
  }
}
