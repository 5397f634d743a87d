package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-10 operators (the Round8/9Spec
  * discipline: independent scalar recomputation or cross-operator
  * identities, so a kernel regression cannot pass even if the DuckDB
  * oracle regressed the same way). */
class Round10Spec extends SparkTestBase {

  test("pipeline_dropout_mask: partition law + independent mask recount") {
    val rows = SparkEntry.queries("pipeline_dropout_mask")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val texts = U.tbl(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val toks = texts(id).split(" ").filter(_.nonEmpty)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      // independent scalar mask: position p drops when the LCG hits 0
      val kept = toks.zipWithIndex.filterNot { case (_, p) =>
        ((id % 1000000007L) * 1103515245L + p.toLong * 12345L + 7L) % 100L < 10L
      }.map(_._1)
      assert(r.getAs[Long]("n_dropped") == (toks.length - kept.length).toLong,
        s"doc $id dropped-count")
      assert(r.getAs[String]("kept_text") == kept.mkString(" "),
        s"doc $id kept text (order must be preserved)")
    }
    // ~10% dropout corpus-wide (LCG uniformity, loose band)
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val drop = rows.map(_.getAs[Long]("n_dropped")).sum.toDouble
    assert(drop / tot > 0.05 && drop / tot < 0.15,
      s"dropout rate ${drop / tot} outside the 10% band")
  }

  test("ts_kaplan_meier: risk sets shrink, curve is monotone, arms balance") {
    val rows = SparkEntry.queries("ts_kaplan_meier")(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("grp"))
    assert(rows.keySet == Set(0L, 1L), "both parity arms must have curves")
    rows.foreach { case (g, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      // the log-survival prefix is non-increasing; n_at_risk is NOT
      // required to shrink between death days — survivalLife supports
      // left truncation, so a subject entering between two death days
      // legitimately grows the later risk set
      if (sorted.length >= 2) sorted.sliding(2).foreach { w =>
        val (a, b) = (w(0), w(1))
        if (!a.isNullAt(a.fieldIndex("log_s_micro")) &&
            !b.isNullAt(b.fieldIndex("log_s_micro")))
          assert(a.getAs[Long]("log_s_micro") >= b.getAs[Long]("log_s_micro"),
            s"arm $g survival must not increase")
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("n_deaths") >= 1L)
        assert(r.getAs[Long]("n_at_risk") >= r.getAs[Long]("n_deaths"))
        assert(r.isNullAt(r.fieldIndex("log_s_micro")) ==
          r.getAs[Boolean]("survival_zero"))
      }
    }
  }

  test("ts_kaplan_meier: n_at_risk equals an independent interval recount") {
    // the weaker-but-exact invariant that replaced the (wrong under left
    // truncation) strict-decrease assertion: at every curve row, the
    // sweep-line at-risk count must equal the brute-force interval count
    // #(fd <= day <= exit) over an independently aggregated life frame
    val km = SparkEntry.queries("ts_kaplan_meier")(spark, sfDir).collect()
    assert(km.nonEmpty)
    val life = U.events(spark, sfDir)
      .withColumn("dayi", expr("unix_micros(ts) DIV 86400000000"))
      .groupBy(col("user_id"))
      .agg(min(col("dayi")).as("fd"),
        min(when(col("event_type") === "error", col("dayi"))).as("dd"),
        max(col("dayi")).as("ld"))
      .select(pmod(col("user_id"), lit(2L)).as("grp"), col("fd"),
        coalesce(col("dd"), col("ld")).as("exit"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    km.foreach { r =>
      val (g, day) = (r.getAs[Long]("grp"), r.getAs[Long]("day"))
      val expected = life.count { case (lg, fd, exit) =>
        lg == g && fd <= day && day <= exit }
      assert(r.getAs[Long]("n_at_risk") == expected.toLong,
        s"arm $g day $day: sweep-line at-risk vs interval recount")
    }
  }

  test("ts_kaplan_meier: left-truncation fixture GROWS the risk set") {
    // the concrete fixture the old strict-decrease assertion rejected:
    // two arm-0 subjects enter BETWEEN the death days 5 and 10, so the
    // later risk set is larger — survival still never increases
    import spark.implicits._
    val life = Seq(
      // (user_id, fd, grp, exit, died, dd)
      (0L, 0L, 0L, 5L, 1L, Some(5L)),
      (2L, 0L, 0L, 10L, 1L, Some(10L)),
      (4L, 7L, 0L, 12L, 0L, None: Option[Long]),
      (6L, 6L, 0L, 11L, 0L, None: Option[Long]),
      (1L, 0L, 1L, 3L, 1L, Some(3L)))
      .toDF("user_id", "fd", "grp", "exit", "died", "dd")
    val rows = graft.operators.TimeSeries.kmOnLife(life)
      .filter(col("grp") === 0L).collect().sortBy(_.getAs[Long]("day"))
    assert(rows.map(_.getAs[Long]("day")).toSeq == Seq(5L, 10L))
    assert(rows(0).getAs[Long]("n_at_risk") == 2L)
    assert(rows(1).getAs[Long]("n_at_risk") == 3L,
      "mid-span entrants must grow the later risk set")
    // survival still non-increasing: ln(1/2) then + ln(2/3)
    val l1 = math.floor(1e6 * math.log(1.0 / 2.0)).toLong
    val l2 = l1 + math.floor(1e6 * math.log(2.0 / 3.0)).toLong
    assert(rows(0).getAs[Long]("log_s_micro") == l1)
    assert(rows(1).getAs[Long]("log_s_micro") == l2)
  }

  test("agg_log_rank: arm totals equal the distinct-user count, V >= 0") {
    val r = SparkEntry.queries("agg_log_rank")(spark, sfDir).collect().head
    val users = U.events(spark, sfDir).select("user_id").distinct().count()
    assert(r.getAs[Long]("n_grp1") + r.getAs[Long]("n_grp0") == users)
    // parity split is balanced to within one user
    assert(math.abs(r.getAs[Long]("n_grp1") - r.getAs[Long]("n_grp0")) <= 1L)
    assert(r.getAs[Long]("v_micro") >= 0L)
    if (r.getAs[Long]("v_micro") > 0)
      assert(!r.isNullAt(r.fieldIndex("z")))
  }

  test("ts_page_hinkley: alarm bookkeeping is internally consistent") {
    val rows = SparkEntry.queries("ts_page_hinkley")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val alarms = r.getAs[Long]("n_alarms")
      assert(alarms >= 0L && alarms <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("max_excursion_micro") >= 0L,
        "excursion vs a running min cannot be negative")
      assert(r.isNullAt(r.fieldIndex("first_alarm_us")) == (alarms == 0L),
        s"${r.getString(0)}: first alarm iff any alarm")
      if (alarms > 0L)
        assert(r.getAs[Long]("max_excursion_micro") > 300000000000L)
    }
  }

  test("ts_lorenz_interday: gini bounded, recount of one type's days") {
    val rows = SparkEntry.queries("ts_lorenz_interday")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("gini_micro") >= 0L &&
        r.getAs[Long]("gini_micro") < 1000000L)
    }
    // independent recount for one type: days and totals off the raw table
    val et = rows.head.getString(0)
    val daily = U.events(spark, sfDir).filter(col("event_type") === et)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("d"))
      .agg(count(lit(1)).as("c")).collect()
    assert(rows.head.getAs[Long]("n_days") == daily.length.toLong)
    assert(rows.head.getAs[Long]("total_events") ==
      daily.map(_.getAs[Long]("c")).sum)
    // scalar gini recount
    val cs = daily.map(_.getAs[Long]("c")).sorted
    val n = cs.length.toLong; val tot = cs.sum
    val rc = cs.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val g = (1000000L * (2L * rc - (n + 1L) * tot)) / (n * tot)
    assert(rows.head.getAs[Long]("gini_micro") == g)
  }

  test("ts_isotonic: fitted curve is monotone and brackets the data") {
    val rows = SparkEntry.queries("ts_isotonic")(spark, sfDir).collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      sorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[Long]("fitted_micro") <=
            w(1).getAs[Long]("fitted_micro"),
            s"$et: isotonic fit must be non-decreasing")
      }
      val ys = sorted.map(_.getAs[Long]("y_micro"))
      val fs = sorted.map(_.getAs[Long]("fitted_micro"))
      // the fit lives inside the data envelope
      assert(fs.min >= ys.min - 1 && fs.max <= ys.max + 1,
        s"$et: fit escaped the data range")
      // a constant-fit lower bound: first fitted value is the running
      // minimax at i=1 = min over k of prefix means, <= overall mean
      assert(fs.head <= ys.sum / ys.length + 1, s"$et: left end too high")
    }
  }

  test("agg_two_prop_z: cells recount from raw users; arms consistent " +
      "with agg_log_rank") {
    val r = SparkEntry.queries("agg_two_prop_z")(spark, sfDir).collect().head
    val perUser = U.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv")).collect()
    val n1 = perUser.count(_.getLong(0) % 2 == 1).toLong
    val x1 = perUser.filter(_.getLong(0) % 2 == 1)
      .map(_.getAs[Long]("conv")).sum
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("x1") == x1)
    // same arm assignment as the survival pair — the two A/B tests agree
    // on cohort sizes
    val lr = SparkEntry.queries("agg_log_rank")(spark, sfDir).collect().head
    assert(lr.getAs[Long]("n_grp1") == r.getAs[Long]("n1") &&
      lr.getAs[Long]("n_grp0") == r.getAs[Long]("n0"))
  }

  test("pipeline_pack_efficiency: gate rows re-derive from pack_sequences") {
    val pack = SparkEntry.queries("pack_sequences")(spark, sfDir).collect()
    val gate = SparkEntry.queries("pipeline_pack_efficiency")(spark, sfDir)
      .collect()
    val byBatch = pack.groupBy(_.getAs[Long]("batch_id"))
    assert(gate.length == byBatch.size, "one gate row per occupied batch")
    gate.foreach { g =>
      val rs = byBatch(g.getAs[Long]("batch_id"))
      assert(g.getAs[Long]("n_docs") == rs.length.toLong)
      assert(g.getAs[Long]("n_straddlers") == rs.count(r =>
        r.getAs[Long]("batch_offset") + r.getAs[Long]("n_tokens") > 2048L)
        .toLong)
      assert(g.getAs[Long]("tokens_started") ==
        rs.map(_.getAs[Long]("n_tokens")).sum)
    }
    // at most one doc can straddle a batch's END boundary
    gate.foreach(g => assert(g.getAs[Long]("n_straddlers") <= 1L,
      "a continuous stream has at most one straddler per batch"))
  }

  test("pipeline_epoch_shuffle: both epochs are true permutations that differ") {
    val rows = SparkEntry.queries("pipeline_epoch_shuffle")(spark, sfDir)
      .collect()
    val n = rows.length.toLong
    assert(n > 0)
    val p0 = rows.map(_.getAs[Long]("pos0")).sorted
    val p1 = rows.map(_.getAs[Long]("pos1")).sorted
    assert(p0.head == 1L && p0.last == n && p0.distinct.length == n.toInt,
      "epoch 0 must be a permutation of 1..n")
    assert(p1.head == 1L && p1.last == n && p1.distinct.length == n.toInt,
      "epoch 1 must be a permutation of 1..n")
    val moved = rows.count(r =>
      r.getAs[Long]("pos0") != r.getAs[Long]("pos1"))
    assert(moved > n / 2, s"epochs must genuinely reshuffle (moved=$moved)")
    // independent recount: pos0 = rank by the epoch-0 LCG key
    val byKey = rows.map { r =>
      val id = r.getLong(0)
      (((id % 1000000007L) * 1103515245L + 7L) % 1000000007L, id)
    }.sorted.map(_._2)
    val posOf = rows.map(r => r.getLong(0) -> r.getAs[Long]("pos0")).toMap
    byKey.zipWithIndex.foreach { case (id, i) =>
      assert(posOf(id) == i + 1L, s"doc $id epoch-0 rank")
    }
  }

  test("agg_dispersion: exact moments recount for every type") {
    val rows = SparkEntry.queries("agg_dispersion")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = U.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("d"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val cs = daily(r.getString(0)).map(_.getAs[Long]("c"))
      val n = cs.length.toLong; val tot = cs.sum
      assert(r.getAs[Long]("n_days") == n &&
        r.getAs[Long]("total") == tot)
      val vn = BigInt(n) * cs.map(c => BigInt(c) * c).sum - BigInt(tot) * tot
      val disp = (BigInt(1000000) * vn) / (BigInt(n - 1) * tot)
      assert(BigInt(r.getAs[Long]("dispersion_micro")) == disp)
      val over = vn > BigInt(n - 1) * tot
      assert(r.isNullAt(r.fieldIndex("nb_r_micro")) == !over)
      if (over) {
        val rr = (BigInt(1000000) * tot * tot * (n - 1)) /
          (BigInt(n) * (vn - BigInt(n - 1) * tot))
        assert(BigInt(r.getAs[Long]("nb_r_micro")) == rr)
      }
    }
  }

  test("pipeline_mix_schedule: stride law — prefixes track weights, " +
      "order preserved") {
    val rows = SparkEntry.queries("pipeline_mix_schedule")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("mix_pos"))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_.getAs[Long]("mix_pos")).toSeq == (1L to n).toSeq,
      "mix positions must be a permutation")
    // per-source rank order is preserved along the mix
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val rns = rs.sortBy(_.getAs[Long]("mix_pos")).map(_.getAs[Long]("rn"))
      assert(rns.sameElements(rns.sorted), s"$src: source order broken")
    }
    // stride-scheduling deficit bound: within any prefix ending at
    // virtual time V, source s has emitted floor(V·w_s/1e12) ± 1 docs
    val w = rows.groupBy(_.getString(1)).map { case (s2, rs) =>
      s2 -> math.floor(math.sqrt(rs.length.toDouble) * 1000000.0).toLong
    }
    val half = rows.take(n / 2)
    val vHalf = half.last.getAs[Long]("vt")
    half.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val expect = vHalf * w(src) / 1000000000000L
      assert(math.abs(rs.length - expect) <= 2L,
        s"$src: prefix count ${rs.length} vs stride expectation $expect")
    }
  }

  test("sim_pq_adc / sim_pq_recall: ranks coherent, hits recount vs exact L2") {
    val adc = SparkEntry.queries("sim_pq_adc")(spark, sfDir).collect()
    val byQ = adc.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.sliding(2).forall(w => w.length < 2 ||
        w(0).getAs[Long]("adc_d2") <= w(1).getAs[Long]("adc_d2")),
        s"query $q: ADC distance must be non-decreasing in rank")
    }
    // exact-L2 top-3 recomputed scalar-side; recall rows must match
    val vecs = U.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x * 1000000.0).toLong).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val rec = SparkEntry.queries("sim_pq_recall")(spark, sfDir).collect()
    rec.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val exact = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (d2(vecs(q), v), id) }
        .sorted.take(3).map(_._2).toSet
      val got = byQ(q).map(_.getAs[Long]("vec_id")).toSet
      assert(r.getAs[Long]("n_hits") == got.intersect(exact).size.toLong,
        s"query $q recall recount")
    }
  }

  test("sim_ivf_curve: recall weakly increases with probe width") {
    val rows = SparkEntry.queries("sim_ivf_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    rows.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(a.getAs[Long]("n_candidates") <= b.getAs[Long]("n_candidates"),
        "wider probes cannot score fewer candidates")
      assert(a.getAs[Long]("n_hits") <= b.getAs[Long]("n_hits"),
        "candidate sets are nested, so hits cannot drop")
    }
    rows.foreach(r => assert(r.getAs[Double]("recall") >= 0.0 &&
      r.getAs[Double]("recall") <= 1.0))
  }
}
