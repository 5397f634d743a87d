package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.api.GraftApi

/** Semantic laws for the round-13 additions: the kNN-graph recall gate,
  * incremental dedup against the persisted band index, and the
  * A/B-guardrail facade lifts (each pinned against its declared twin on
  * the SAME fixture projection — the r12 model-eval discipline). */
class Round13Spec extends SparkTestBase {

  test("sim_knn_recall: hits bounded by k, recall exact, floor holds") {
    val rows = SparkEntry.queries("sim_knn_recall")(spark, sfDir).collect()
    U.releaseTracked()
    assert(rows.length == 10, "one row per probe")
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 3L)
      assert(r.getAs[Double]("recall") == h.toDouble / 3.0)
    }
    // the graph's nprobe=1 boundary trade, measured: mean recall on the
    // fixture corpus must clear 0.6 (measured 0.833 at sf0.001, 0.9 at
    // sf0.01) — a quantizer/tiebreak regression would crater this
    val mean = rows.map(_.getAs[Long]("n_hits")).sum.toDouble / (3.0 * 10)
    assert(mean >= 0.6, s"mean recall $mean under the 0.6 floor")
  }

  test("dedup_incremental: batch-vs-history orientation + minhash recount") {
    val inc = SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    U.releaseTracked()
    assert(inc.nonEmpty, "fixture plants cross-snapshot near-dups")
    inc.foreach { case (da, db, _, jac) =>
      assert(da % 10 == 7, s"$da must be in tonight's batch")
      assert(db % 10 != 7, s"$db must be in the indexed history")
      assert(jac >= 0.2)
    }
    // exactly the full-corpus minhash pairs with ONE side in the batch,
    // batch doc first — the incremental split changes orientation and
    // membership, never scores
    val full = SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    U.releaseTracked()
    val expected = full.collect {
      case (a, b, c, j) if a % 10 == 7 && b % 10 != 7 => (a, b, c, j)
      case (a, b, c, j) if a % 10 != 7 && b % 10 == 7 => (b, a, c, j)
    }.sortBy(p => (p._1, p._2))
    assert(inc.sortBy(p => (p._1, p._2)).toSeq == expected.toSeq)
  }

  test("agg_did: four-cell recount and the parallel-trends identity") {
    val rows = SparkEntry.queries("agg_did")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000"),
        pmod(col("user_id"), lit(2L)), U.cents(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    U.releaseTracked()
    val sd = {
      val ds = ev.map(_._2); (ds.min + ds.max + 1) / 2
    }
    rows.foreach { case (et, r) =>
      val g = ev.filter(_._1 == et)
      def cell(a: Long, p: Long) = g.filter { case (_, dy, arm, _) =>
        arm == a && (if (p == 1L) dy >= sd else dy < sd)
      }
      def m(a: Long, p: Long): Double = {
        val c = cell(a, p); c.map(_._4).sum / (100.0 * c.length)
      }
      assert(r.getAs[Long]("n00") == cell(0, 0).length.toLong)
      assert(r.getAs[Long]("n11") == cell(1, 1).length.toLong)
      val did = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
      assert(r.getAs[Double]("did") == did, s"$et did")
      assert(r.getAs[Double]("trend_treat") - r.getAs[Double]("trend_control")
        == r.getAs[Double]("did"), s"$et identity")
    }
  }

  test("agg_qte: decile boundaries recount per arm") {
    val rows = SparkEntry.queries("agg_qte")(spark, sfDir).collect()
    assert(rows.length == 9)
    val ev = U.events(spark, sfDir)
      .select(pmod(col("user_id"), lit(2L)), U.cents(col("value")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    U.releaseTracked()
    def decile(arm: Long, q: Long): Long = {
      val xs = ev.filter(_._1 == arm).map(_._2).sorted
      // min value whose cumulative count reaches q/10 of n — the
      // exact value-domain rule both engines implement
      xs(((q * xs.length + 9) / 10 - 1).toInt)
    }
    rows.foreach { r =>
      val q = r.getAs[Long]("q")
      assert(r.getAs[Long]("q_control_c") == decile(0, q), s"q$q control")
      assert(r.getAs[Long]("q_treat_c") == decile(1, q), s"q$q treat")
      assert(r.getAs[Long]("qte_c") ==
        r.getAs[Long]("q_treat_c") - r.getAs[Long]("q_control_c"))
    }
  }

  test("multimodal_patches: closed-form patch recount + grid laws") {
    val rows = SparkEntry.queries("multimodal_patches")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    U.releaseTracked()
    assert(rows.nonEmpty)
    rows.foreach { case (id, ps) =>
      val w = (4 + id % 5).toInt; val h = (4 + (id * 7) % 5).toInt
      val (pw, ph) = (w / 2, h / 2)
      assert(ps.length == pw * ph, s"doc $id patch count")
      def gray(x: Int, y: Int): Long =
        (id * 31 + y.toLong * w + x) % 256 +
          (id * 17 + y * 3L + x * 5L) % 256 +
          (id * 13 + y * 7L + x * 11L) % 256
      ps.foreach { r =>
        val (py, px) = (r.getAs[Long]("patch_y").toInt,
          r.getAs[Long]("patch_x").toInt)
        val sum = (for (oy <- 0 until 2; ox <- 0 until 2)
          yield gray(px * 2 + ox, py * 2 + oy)).sum
        assert(r.getAs[Long]("patch_id") == py.toLong * pw + px)
        assert(r.getAs[Long]("gray_sum") == sum, s"doc $id patch ($py,$px)")
        assert(r.getAs[Long]("gray_mean") == sum / 4)
      }
    }
  }

  test("multimodal_vad: segment recount from closed-form samples") {
    val rows = SparkEntry.queries("multimodal_vad")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    U.releaseTracked()
    assert(rows.nonEmpty)
    // recount every doc that produced segments, plus assert contiguity
    rows.foreach { case (id, segs) =>
      val n = (64 + id % 64).toInt
      val samples = (0 until n).map(k =>
        ((id * 31 + k.toLong * 17) % 65536) - 32768)
      val nf = n / 16
      val energies = (0 until nf).map(f =>
        (0 until 16).map(k => samples(f * 16 + k)).map(v => v * v).sum)
      val te = energies.sum
      val voiced = energies.zipWithIndex
        .filter { case (e, _) => e * nf > te }.map(_._2)
      // islands of consecutive voiced frames
      val expSegs = voiced.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: tl, f) if f == e + 1 => (s, f) :: tl
        case (acc, f) => (f, f) :: acc
      }.reverse
      assert(segs.length == expSegs.length, s"doc $id segment count")
      segs.sortBy(_.getAs[Long]("seg_id")).zip(expSegs).foreach {
        case (r, (fs, fe)) =>
          assert(r.getAs[Long]("f_start") == fs.toLong, s"doc $id start")
          assert(r.getAs[Long]("f_end") == fe.toLong, s"doc $id end")
          assert(r.getAs[Long]("n_frames") == (fe - fs + 1).toLong)
          assert(r.getAs[Long]("energy") ==
            (fs to fe).map(energies(_)).sum, s"doc $id energy")
      }
    }
  }

  test("agg_tukey_hsd: pairwise recount + anova consistency") {
    val rows = SparkEntry.queries("agg_tukey_hsd")(spark, sfDir).collect()
    U.releaseTracked()
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = ev.map(_._1).distinct.sorted
    assert(rows.length == types.length * (types.length - 1) / 2)
    val k = types.length
    val n = ev.length
    // within-group SS via the same integral-division per-group terms
    val ssw = types.map { t =>
      val xs = ev.filter(_._1 == t).map(_._2)
      val (ng, sg) = (BigInt(xs.length), xs.map(BigInt(_)).sum)
      val qg = xs.map(x => BigInt(x) * x).sum
      (ng * qg - sg * sg) / ng
    }.sum.toLong
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb, "pairs are ordered, no mirror duplicates")
      val xa = ev.filter(_._1 == ta).map(_._2)
      val xb = ev.filter(_._1 == tb).map(_._2)
      val meanA = xa.sum / (100.0 * xa.length)
      val meanB = xb.sum / (100.0 * xb.length)
      assert(r.getAs[Double]("diff") == meanA - meanB, s"$ta-$tb diff")
      val hsd = 3.858 * math.sqrt(ssw.toDouble / (n - k) / 2.0 *
        (1.0 / xa.length + 1.0 / xb.length)) / 100.0
      assert(r.getAs[Double]("hsd") == hsd, s"$ta-$tb hsd")
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(meanA - meanB) > hsd))
    }
  }

  test("dedup_minhash_estimate: estimator law + unbiasedness direction") {
    val rows = SparkEntry.queries("dedup_minhash_estimate")(spark, sfDir)
      .collect()
    U.releaseTracked()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val na = r.getAs[Long]("n_agree")
      assert(na >= 1L && na <= 16L,
        "a band candidate agrees on at least one full band")
      assert(r.getAs[Long]("est_micro") == 1000000L * na / 16)
      assert(r.getAs[Long]("abs_err_micro") ==
        math.abs(r.getAs[Long]("est_micro") - r.getAs[Long]("jac_micro")))
    }
    // near-identical docs (jac >= 0.9) must estimate high — the regime
    // LSH banding is built for
    val hi = rows.filter(_.getAs[Long]("jac_micro") >= 900000L)
    assert(hi.forall(_.getAs[Long]("est_micro") >= 500000L))
  }

  test("agg_sample_size: planner recount + inverse-square law") {
    val rows = SparkEntry.queries("agg_sample_size")(spark, sfDir)
      .collect().groupBy(_.getString(0))
    U.releaseTracked()
    val ev = U.events(spark, sfDir)
      .select(col("event_type"), U.cents(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case (et, rs) =>
      val xs = ev.filter(_._1 == et).map(_._2)
      val nd = xs.length.toDouble
      val sx = xs.map(_.toDouble).sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      val v = (sxx / 10000.0 - (sx / 100.0) * (sx / 100.0) / nd) / (nd - 1.0)
      val mean = sx / (100.0 * nd)
      val z = 2.8015852181129683
      val byRel = rs.map(r => r.getAs[Long]("rel_micro") -> r).toMap
      assert(byRel.keySet == Set(10000L, 20000L, 50000L, 100000L))
      byRel.foreach { case (rel, r) =>
        val delta = rel.toDouble / 1000000.0 * mean
        val n = math.ceil(2.0 * v * z * z / (delta * delta)).toLong
        assert(r.getAs[Long]("n_required") == n, s"$et rel=$rel")
      }
      // halving the effect quadruples (±ceil slack) the requirement
      val n1 = byRel(10000L).getAs[Long]("n_required")
      val n2 = byRel(20000L).getAs[Long]("n_required")
      assert(n1 >= 4 * n2 - 4 && n1 <= 4 * n2 + 4)
    }
  }

  test("cupedAdjust facade matches the declared agg_cuped twin") {
    val ev = U.events(spark, sfDir).select(col("user_id"),
      expr("unix_micros(ts) DIV 86400000000").as("dayi"),
      U.cents(col("value")).as("vc"))
    val split = ev.agg(expr("(min(dayi) + max(dayi) + 1) DIV 2").as("sd"))
    val per = ev.crossJoin(broadcast(split))
      .groupBy(col("user_id"))
      .agg(sum(when(col("dayi") < col("sd"), col("vc")).otherwise(0L))
          .as("pre"),
        sum(when(col("dayi") >= col("sd"), col("vc")).otherwise(0L))
          .as("post"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    val got = GraftApi.cupedAdjust(per, "pre", "post", "arm").collect()
    val twin = SparkEntry.queries("agg_cuped")(spark, sfDir).collect()
    U.releaseTracked()
    assert(got.map(_.toString).toSeq == twin.map(_.toString).toSeq)
  }

  test("sprt/srmCheck/psiDrift/cmh facades match their declared twins") {
    val ev = U.events(spark, sfDir)
    val sprtGot = GraftApi.sprt(
      ev.select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayi"),
        when(U.cents(col("value")) >= 5000L, 1L).otherwise(0L).as("s")),
      "event_type", "dayi", "s").collect()
    val sprtTwin = SparkEntry.queries("agg_sprt")(spark, sfDir).collect()
    assert(sprtGot.map(_.toString).toSeq == sprtTwin.map(_.toString).toSeq)
    val srmGot = GraftApi.srmCheck(
      ev.select(col("event_type"), col("user_id"),
        pmod(col("user_id"), lit(2L)).as("arm")),
      "event_type", "user_id", "arm").collect()
    val srmTwin = SparkEntry.queries("agg_srm")(spark, sfDir).collect()
    assert(srmGot.map(_.toString).toSeq == srmTwin.map(_.toString).toSeq)
    val psiGot = GraftApi.psiDrift(
      ev.select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayi"),
        least(lit(9L), expr(
          "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) DIV 1000"))
          .as("band")),
      "event_type", "dayi", "band").collect()
    val psiTwin = SparkEntry.queries("agg_psi")(spark, sfDir).collect()
    assert(psiGot.map(_.toString).toSeq == psiTwin.map(_.toString).toSeq)
    val cmhGot = GraftApi.cmh(
      ev.select(expr("unix_micros(ts) DIV 86400000000").as("dayi"),
        pmod(col("user_id"), lit(2L)).as("arm"),
        when(U.cents(col("value")) >= 5000L, 1L).otherwise(0L).as("hv")),
      "dayi", "arm", "hv").collect()
    val cmhTwin = SparkEntry.queries("agg_cmh")(spark, sfDir).collect()
    assert(cmhGot.map(_.toString).toSeq == cmhTwin.map(_.toString).toSeq)
    U.releaseTracked()
  }

  test("didEstimate/qte/tukeyHsd facades match their declared twins") {
    val ev = U.events(spark, sfDir)
    val didGot = GraftApi.didEstimate(
      ev.select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayi"),
        pmod(col("user_id"), lit(2L)).as("arm"),
        U.cents(col("value")).as("vc")),
      "event_type", "dayi", "arm", "vc").collect()
    val didTwin = SparkEntry.queries("agg_did")(spark, sfDir).collect()
    assert(didGot.map(_.toString).toSeq == didTwin.map(_.toString).toSeq)
    val qteGot = GraftApi.qte(
      ev.select(pmod(col("user_id"), lit(2L)).as("arm"),
        U.cents(col("value")).as("vc")), "arm", "vc").collect()
    val qteTwin = SparkEntry.queries("agg_qte")(spark, sfDir).collect()
    assert(qteGot.map(_.toString).toSeq == qteTwin.map(_.toString).toSeq)
    val tkGot = GraftApi.tukeyHsd(
      ev.select(col("event_type"), U.cents(col("value")).as("vc")),
      "event_type", "vc").collect()
    val tkTwin = SparkEntry.queries("agg_tukey_hsd")(spark, sfDir).collect()
    U.releaseTracked()
    assert(tkGot.map(_.toString).toSeq == tkTwin.map(_.toString).toSeq)
  }

  test("sprt facade respects caller hypotheses (p0, p1)") {
    import spark.implicits._
    // 20 successes in 20 trials over 4 epochs: under H0 p=0.1 vs
    // H1 p=0.9 the LLR crosses +ln 19 almost immediately
    val df = (1 to 20).map(i => ("g", (i % 4).toLong, 1L))
      .toDF("g", "t", "s")
    val out = GraftApi.sprt(df, "g", "t", "s", p0 = 0.1, p1 = 0.9)
      .orderBy("t").collect()
    U.releaseTracked()
    assert(out.length == 4)
    assert(out.last.getAs[String]("decision") == "accept_h1")
    val llr = out.last.getAs[Double]("llr")
    assert(math.abs(llr - 20.0 * math.log(0.9 / 0.1)) < 1e-9)
  }

  test("stream_drawdown: row-for-row parity with the batch ts_drawdown") {
    val live = SparkEntry.queries("stream_drawdown")(spark, sfDir)
      .collect().map(_.toString)
    U.releaseTracked()
    val batch = SparkEntry.queries("ts_drawdown")(spark, sfDir)
      .collect().map(_.toString)
    U.releaseTracked()
    assert(live.length == batch.length && live.nonEmpty)
    assert(live.toSeq == batch.toSeq,
      "the live trajectory must BE the batch window")
  }

  test("stream_gap_detect: row-for-row parity with the batch ts_gap_detect") {
    val live = SparkEntry.queries("stream_gap_detect")(spark, sfDir)
      .collect().map(_.toString)
    U.releaseTracked()
    val batch = SparkEntry.queries("ts_gap_detect")(spark, sfDir)
      .collect().map(_.toString)
    U.releaseTracked()
    assert(live.length == batch.length && live.nonEmpty)
    assert(live.toSeq == batch.toSeq)
  }

  test("conductance facade: planted two-community graph, exact phi") {
    import spark.implicits._
    // two 3-cliques joined by one bridge edge (mirrored adjacency):
    // vol(A) = 2*3 + 1 = 7 endpoints, cut(A) = 1, M = 14 directed rows
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 20L)).toDF("n", "c")
    val got = GraftApi.conductance(edges, labels, "a", "b", "n", "c")
      .collect().map(r => r.getAs[Long]("community") -> r).toMap
    U.releaseTracked()
    assert(got.keySet == Set(10L, 20L))
    Seq(10L, 20L).foreach { cmm =>
      val r = got(cmm)
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("vol") == 7L)
      assert(r.getAs[Long]("cut") == 1L)
      // phi = 1e6 * 1 DIV min(7, 14-7) = 142857
      assert(r.getAs[Long]("conductance_micro") == 142857L)
    }
  }
}
