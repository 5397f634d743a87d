package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: the IVF-PQ residual index and the SCC closure-loop
  * trim, each pinned by the law that justified it. */
class Round11Spec extends SparkTestBase {

  test("graph_scc: distributed path-doubling equals the single-task closure") {
    // the r11 loop drops the textbook R ∪ R∘R union (self-pairs make
    // composition reflexive, so R ⊆ R∘R) — this parity test is what makes
    // that a provable rewrite, not a hope: cap=0 forces the distributed
    // loop, cap=MaxValue the one-task BFS kernel, and the unique-fixpoint
    // property says any sound closure gives identical SCCs
    val fast = operators.Graphs.sccImpl(spark, sfDir, Long.MaxValue)
      .collect().map(_.toString)
    U.releaseTracked()
    val dist = operators.Graphs.sccImpl(spark, sfDir, 0L)
      .collect().map(_.toString)
    U.releaseTracked()
    assert(fast.nonEmpty && fast.sameElements(dist),
      s"scc gate parity broke: single-task ${fast.length} rows vs " +
        s"distributed ${dist.length}")
  }

  test("sim_ivfpq_recall beats the sim_ivf_curve nprobe=1 row (the r10 ask)") {
    // the residual configuration must stay ABOVE the cheapest IVF setting
    // it competes with — the measured reason this index exists; raw PQ
    // (sim_pq_recall) scores ~0.2 here and is refused by its own gate
    val ivfpq = SparkEntry.queries("sim_ivfpq_recall")(spark, sfDir)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    U.releaseTracked()
    val curve = SparkEntry.queries("sim_ivf_curve")(spark, sfDir)
      .filter(col("nprobe") === 1L)
      .collect().head.getAs[Double]("recall")
    U.releaseTracked()
    assert(ivfpq >= curve,
      s"IVF-PQ mean recall $ivfpq fell below the nprobe=1 IVF row $curve")
    val pq = SparkEntry.queries("sim_pq_recall")(spark, sfDir)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    U.releaseTracked()
    assert(ivfpq > pq,
      s"the residual index ($ivfpq) must beat the raw PQ codes ($pq)")
  }

  test("pipeline_chat_template: mask accounting partitions the tokens") {
    val rows = SparkEntry.queries("pipeline_chat_template")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTurns, nAsst) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_turns"), r.getAs[Long]("n_assistant_tokens"))
      // turn count is the 24-token ceiling division
      assert(nTurns == (nTok + 23) / 24)
      // assistant turns are the odd ones: their token mass is exactly
      // total minus the even (user) turns' mass
      val nUser = (0L until nTurns).filter(_ % 2 == 0)
        .map(i => math.min(24L, nTok - i * 24L)).sum
      assert(nAsst == nTok - nUser,
        s"doc ${r.getAs[Long]("doc_id")}: mask partition broke")
      // the render carries every token plus one role tag per turn
      assert(r.getAs[Long]("rendered_len") > nTok,
        "render cannot be shorter than its token payload")
    }
  }

  test("pipeline_curriculum: positions are a permutation ordered by length") {
    val rows = SparkEntry.queries("pipeline_curriculum")(spark, sfDir)
      .collect()
    val pos = rows.map(_.getAs[Long]("curriculum_pos")).sorted
    assert(pos.toSeq == (1L to rows.length.toLong).toSeq,
      "curriculum positions must be a permutation of 1..n")
    val byPos = rows.sortBy(_.getAs[Long]("curriculum_pos"))
    byPos.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("n_tokens") <= w(1).getAs[Long]("n_tokens"),
        "token counts must be non-decreasing along the curriculum")
    }
    assert(byPos.map(_.getAs[Long]("phase")).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("stream_token_quota: admissions are a per-source prefix") {
    val rows = SparkEntry.queries("stream_token_quota")(spark, sfDir)
      .collect().groupBy(_.getAs[String]("source"))
    assert(rows.nonEmpty)
    rows.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      // cum recounts from n_tokens in doc order
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum, s"$src cum drifted")
        assert(r.getAs[Boolean]("admitted") == (cum <= 2000L))
      }
      // once over budget, never admitted again (prefix property)
      val adm = sorted.map(_.getAs[Boolean]("admitted"))
      assert(!adm.dropWhile(identity).contains(true),
        s"$src re-admitted after the budget was exhausted")
    }
  }

  test("ts_snaive_mase: error sums recount from the daily grid") {
    val rows = SparkEntry.queries("ts_snaive_mase")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") >= 1L)
      assert(r.getAs[Long]("sae_snaive") >= 0L)
      if (r.getAs[Long]("sae_naive1") > 0L) {
        val m = r.getAs[Long]("mase_micro")
        assert(m == 1000000L * r.getAs[Long]("sae_snaive") /
          r.getAs[Long]("sae_naive1"))
      } else assert(r.isNullAt(r.fieldIndex("mase_micro")))
    }
  }

  test("dedup_threshold_curve is monotone non-increasing in the threshold") {
    val rows = SparkEntry.queries("dedup_threshold_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("threshold_micro"))
    assert(rows.length == 4)
    rows.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("n_pairs") >= w(1).getAs[Long]("n_pairs"))
      assert(w(0).getAs[Long]("n_docs_dropped") >=
        w(1).getAs[Long]("n_docs_dropped"))
    }
    rows.foreach(r => assert(r.getAs[Long]("n_docs_dropped") <=
      r.getAs[Long]("n_pairs")))
  }

  test("dedup_substring_spans flags a planted templated pair") {
    import spark.implicits._
    // two docs share a verbatim 20-token boilerplate block; the third is
    // unique — span coverage must separate them
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, boiler + " unique tail one two three four five six"),
      (2L, boiler + " other ending seven eight nine ten eleven twelve"),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.api.GraftApi.spanDupStats(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_spans"), r.getAs[Boolean]("flagged"))).toMap
    U.releaseTracked()
    // the shared 20-token block contributes 8 shared 13-token spans
    assert(got(1L)._1 == 8 && got(2L)._1 == 8,
      s"expected 8 dup spans per templated doc, got $got")
    assert(got(3L) == ((0L, false)), "the unique doc must stay clean")
  }

  test("agg_cuped: rho2 is a squared correlation, adjustment is coherent") {
    val r = SparkEntry.queries("agg_cuped")(spark, sfDir).collect().head
    U.releaseTracked()
    assert(r.getAs[Long]("n_users") >= 2L)
    val rho2 = r.getAs[Double]("rho2")
    assert(rho2 >= 0.0 && rho2 <= 1.0, s"rho2 $rho2 outside [0, 1]")
    // theta ties the two reported differences together by definition:
    // diff_cuped = diff_raw - theta * (xbar1 - xbar0) — nonzero theta
    // with equal diffs would mean the covariate did nothing while
    // claiming correlation
    if (rho2 > 0.01)
      assert(r.getAs[Double]("diff_raw") != r.getAs[Double]("diff_cuped"),
        "a correlated covariate must move the adjusted difference")
  }

  test("agg_sprt: LLR recounts from the cumulative cells, verdicts match") {
    val rows = SparkEntry.queries("agg_sprt")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val la = math.log(0.5 / 0.4); val lb = math.log(0.5 / 0.6)
    val thr = math.log(19.0)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("dayi"))
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) {
          assert(w(0).getAs[Long]("cum_n") < w(1).getAs[Long]("cum_n"))
          assert(w(0).getAs[Long]("cum_k") <= w(1).getAs[Long]("cum_k"))
        }
      }
      sorted.foreach { r =>
        val (n, k) = (r.getAs[Long]("cum_n"), r.getAs[Long]("cum_k"))
        val llr = k.toDouble * la + (n - k).toDouble * lb
        assert(math.abs(llr - r.getAs[Double]("llr")) < 1e-9)
        val want = if (llr >= thr) "accept_h1"
          else if (llr <= -thr) "accept_h0" else "continue"
        assert(r.getAs[String]("decision") == want)
      }
    }
  }

  test("graph_conductance: volumes partition the edge count, phi bounded") {
    val rows = SparkEntry.queries("graph_conductance")(spark, sfDir).collect()
    U.releaseTracked()
    assert(rows.nonEmpty)
    // mirrored adjacency: community volumes partition the directed edge
    // count, and the cross edges are counted once from EACH side
    val vol = rows.map(_.getAs[Long]("vol")).sum
    val cut = rows.map(_.getAs[Long]("cut")).sum
    assert(cut % 2 == 0, s"total cut $cut must be even on a mirrored graph")
    rows.foreach { r =>
      assert(r.getAs[Long]("cut") <= r.getAs[Long]("vol"))
      if (!r.isNullAt(r.fieldIndex("conductance_micro"))) {
        val p = r.getAs[Long]("conductance_micro")
        assert(p >= 0L && p <= 1000000L, s"phi $p outside [0, 1e6]")
      }
    }
    assert(vol > 0L)
  }

  test("agg_hodges_lehmann: the selected Walsh median recounts exactly") {
    val got = SparkEntry.queries("agg_hodges_lehmann")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("hl_milli"))).toMap
    U.releaseTracked()
    // independent recount: daily cents totals -> all Walsh sums -> the
    // lower-median selection, in plain Scala
    val daily = U.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayi"))
      .agg(sum(U.cents(col("value"))).as("y"))
      .collect().groupBy(_.getAs[String]("event_type"))
    daily.foreach { case (t, rs) =>
      val ys = rs.map(_.getAs[Long]("y")).sorted
      val walsh = (for (i <- ys.indices; j <- i until ys.length)
        yield ys(i) + ys(j)).sorted
      val k = ((walsh.length + 1) / 2) - 1
      assert(got(t) == ((walsh.length.toLong, walsh(k) * 500L)),
        s"type $t: HL recount mismatch")
    }
  }

  test("sample_seed_overlap: samplers are ~10% each and near-independent") {
    val rows = SparkEntry.queries("sample_seed_overlap")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    val n = U.tbl(spark, sfDir, "documents").count().toDouble
    rows.foreach { r =>
      for (c <- Seq("n_a", "n_b")) {
        val rate = r.getAs[Long](c) / n
        assert(rate > 0.05 && rate < 0.15,
          s"${r.getAs[String]("pair")} $c rate $rate outside the 10% band")
      }
      // independent 10% samplers overlap near 1%; aliasing seeds would
      // push Jaccard toward 1e6
      assert(r.getAs[Long]("jaccard_micro") < 200000L,
        s"${r.getAs[String]("pair")} overlap too high — seeds alias")
    }
  }

  test("emb_ood_score: scores bounded, cells valid, index is corpus-wide") {
    val rows = SparkEntry.queries("emb_ood_score")(spark, sfDir).collect()
    U.releaseTracked()
    val n = U.tbl(spark, sfDir, "embeddings").count()
    assert(rows.length == n, "every vector gets a score")
    rows.foreach { r =>
      val o = r.getAs[Long]("ood_micro")
      assert(o >= 0L && o <= 2000000L, s"ood $o outside [0, 2e6]")
      val c = r.getAs[Int]("nearest_cid")
      assert(c >= 0 && c < 16)
      assert(r.getAs[Boolean]("is_ood") == (o >= 300000L))
    }
  }

  test("sim_ivfpq_adc ranks are exact-L2-coherent and per-query complete") {
    val rows = SparkEntry.queries("sim_ivfpq_adc")(spark, sfDir).collect()
    U.releaseTracked()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 10L).toSet, "every query answers")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      // refined distances are exact L2 — must be non-decreasing in rank
      assert(sorted.map(_.getAs[Long]("d2")).toSeq ==
        sorted.map(_.getAs[Long]("d2")).sorted.toSeq,
        s"query $q: refined d2 not monotone in rank")
      assert(sorted.forall(_.getAs[Long]("vec_id") != q),
        s"query $q returned itself")
    }
  }
}
