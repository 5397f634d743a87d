package graft

import org.apache.spark.sql.functions._
import scala.math.BigDecimal.RoundingMode

/** Round-15 pins: the r14 verdict's carried items — the decimal128
  * output re-typing (STRING canary path, covered in Round14Spec's
  * updated recounts) and the new `pipeline_perplexity_filter` rung
  * (per-doc bigram cross-entropy under the SHARED text_kneser_ney
  * model), whose scoring and selection laws are recounted here against
  * a fully independent local fold. */
class Round15Spec extends SparkTestBase {

  test("pipeline_perplexity_filter: full local recount under the shipped KN model") {
    // 1. the model AS SHIPPED by the declared KN query (same session)
    val model = SparkEntry.queries("text_kneser_ney")(spark, sfDir)
      .select(col("w1"), col("w2"), col("pkn_micro"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // 2. independent per-doc fold: same whitespace tokenization, same
    //    floor(ln(1e6 / max(pkn, 1)) * 1e6) micro-nat term, plain Scala
    val docs = U.tbl(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val local = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val bgs = if (toks.length >= 2) toks.sliding(2).toSeq else Seq.empty
      val scoredTerms = bgs.flatMap(p => model.get((p(0), p(1))))
        .map(pkn => math.floor(
          math.log(1000000.0 / math.max(pkn, 1L)) * 1000000.0).toLong)
      (id, (bgs.length.toLong, scoredTerms.length.toLong, scoredTerms.sum))
    }.toMap
    val totNll = local.values.map(_._3).sum
    val totN = local.values.map(_._2).sum
    assert(totN > 0, "fixture must give the KN model nonzero coverage")
    val corpusAvg = totNll / totN
    // 3. the shipped rows must match the fold column for column
    val rows = SparkEntry.queries("pipeline_perplexity_filter")(spark, sfDir)
      .collect()
    assert(rows.length == docs.length, "one verdict per document")
    var kept = 0
    var dropped = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val (nb, ns, nll) = local(id)
      assert(r.getLong(1) == nb, s"doc $id n_bigrams")
      assert(r.getLong(2) == ns, s"doc $id n_scored")
      assert(r.getLong(3) == nll, s"doc $id nll_sum_micro")
      assert(r.getLong(5) == corpusAvg, s"doc $id corpus_avg_micro")
      if (ns > 0) {
        val avg = nll / ns
        assert(r.getLong(4) == avg, s"doc $id avg_nll_micro")
        // the selection law: keep <=> the doc reads MORE like the corpus
        // (lower cross-entropy) than the corpus-average document
        assert(r.getBoolean(6) == (avg <= corpusAvg), s"doc $id keep")
        if (avg <= corpusAvg) kept += 1 else dropped += 1
      } else {
        assert(r.isNullAt(4), s"doc $id avg must be NULL with no coverage")
        assert(r.isNullAt(6), s"doc $id keep must be NULL with no coverage")
      }
    }
    // the filter must actually split the corpus (a degenerate all-keep /
    // all-drop threshold would make the rung vacuous on this fixture)
    assert(kept > 0, "some documents must pass the filter")
    assert(dropped > 0, "some documents must fail the filter")
  }

  test("pipeline_perplexity_filter: common-bigram docs score as more corpus-like") {
    // the low-perplexity-looks-like-target direction, checked between
    // two INDEPENDENTLY derived per-doc quantities: (a) the shipped
    // avg_nll_micro, and (b) the mean corpus FREQUENCY (model cb) of
    // each doc's covered bigrams, folded locally from the raw text +
    // the shipped KN model — docs built from the corpus's common
    // bigrams must average lower cross-entropy than docs built from
    // its rare ones (the CCNet selection direction).
    val model = SparkEntry.queries("text_kneser_ney")(spark, sfDir)
      .select(col("w1"), col("w2"), col("cb"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val freq = U.tbl(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        val cbs =
          if (toks.length < 2) Seq.empty
          else toks.sliding(2).toSeq.flatMap(p => model.get((p(0), p(1))))
        if (cbs.isEmpty) None
        else Some(r.getLong(0) -> cbs.map(_.toDouble).sum / cbs.length)
      }.toMap
    val scored = SparkEntry.queries("pipeline_perplexity_filter")(spark, sfDir)
      .filter(col("n_scored") > 0)
      .select(col("doc_id"), col("avg_nll_micro"))
      .collect().map(r => (freq(r.getLong(0)), r.getLong(1).toDouble))
      .sortBy(_._1)
    assert(scored.length >= 20, "fixture too small for the direction check")
    val q = scored.length / 4
    val rareNll = scored.take(q).map(_._2).sum / q       // least common bigrams
    val commonNll = scored.takeRight(q).map(_._2).sum / q // most common bigrams
    assert(commonNll < rareNll,
      s"docs of common bigrams must score more corpus-like " +
        s"(common $commonNll vs rare $rareNll micro-nats)")
  }

  test("perplexityFilter facade equals the declared query on the fixture corpus") {
    val declared = SparkEntry.queries("pipeline_perplexity_filter")(
      spark, sfDir).collect().map(_.toSeq).toSeq
    val lifted = graft.api.GraftApi.perplexityFilter(
      U.tbl(spark, sfDir, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text").collect().map(_.toSeq).toSeq
    assert(lifted == declared)
  }

  test("pipeline_loss_mask: spans partition every doc and sum to the template's mask accounting") {
    val spans = SparkEntry.queries("pipeline_loss_mask")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    val tmpl = SparkEntry.queries("pipeline_chat_template")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(spans.keySet == tmpl.keySet, "one span set per template doc")
    spans.foreach { case (id, rs) =>
      val (nTurns, nTokens, nAssistant) = tmpl(id)
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length.toLong == nTurns, s"doc $id turn count")
      // spans tile [1, n_tokens] exactly: consecutive, gap-free, in order
      var next = 1L
      sorted.foreach { r =>
        assert(r.getLong(3) == next, s"doc $id span start")
        assert(r.getLong(4) >= r.getLong(3), s"doc $id span order")
        assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1,
          s"doc $id span length")
        // roles alternate user/assistant and trained marks assistant
        val isAssistant = r.getLong(1) % 2 == 1
        assert(r.getString(2) == (if (isAssistant) "assistant" else "user"))
        assert(r.getBoolean(6) == isAssistant, s"doc $id trained flag")
        next = r.getLong(4) + 1
      }
      assert(next == nTokens + 1, s"doc $id spans must cover all tokens")
      // the cross-query law: trained span mass == the template's
      // n_assistant_tokens accounting, doc for doc
      val trainedSum = sorted.filter(_.getBoolean(6)).map(_.getLong(5)).sum
      assert(trainedSum == nAssistant, s"doc $id assistant-token mass")
    }
  }

  test("sim_radius_search: full local recount and top-k consistency") {
    // independent fold: the same floor-to-micro fixed-point dot and the
    // same double cosine division, in plain Scala over the raw vectors
    val vecs = U.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)
          .toArray))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val expected = (for {
      (qid, qx) <- vecs.filter(_._1 < 10)
      (vid, fx) <- vecs if vid != qid
      cos = dot(qx, fx).toDouble /
        (math.sqrt(dot(qx, qx).toDouble) * math.sqrt(dot(fx, fx).toDouble))
      if cos >= 0.35
    } yield ((qid, vid), cos)).toMap
    val rows = SparkEntry.queries("sim_radius_search")(spark, sfDir)
      .collect()
    assert(rows.length == expected.size, "radius set size")
    assert(rows.nonEmpty, "fixture must have neighbors inside the radius")
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(expected.contains(k), s"unexpected pair $k")
      assert(r.getDouble(2) == expected(k), s"cos drift at $k")
    }
    // cross-query law: every top-5 neighbor at cos >= 0.35 must appear in
    // the radius set (top-k and range answer the same geometry)
    val radius = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    SparkEntry.queries("sim_bruteforce_topk")(spark, sfDir)
      .collect().filter(_.getDouble(2) >= 0.35)
      .foreach(r => assert(radius.contains((r.getLong(0), r.getLong(1))),
        s"top-k neighbor missing from radius set"))
  }

  test("multimodal_patch_mask: mask recounts from the letterbox plan") {
    val plan = SparkEntry.queries("multimodal_letterbox")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(8))).toMap
    val rows = SparkEntry.queries("multimodal_patch_mask")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    assert(rows.keySet == plan.keySet, "one grid per planned image")
    rows.foreach { case (id, rs) =>
      val (outW, outH, padL, padT) = plan(id)
      assert(rs.length == 196, s"doc $id grid size")
      // independent recount of the content rectangle in PATCH units:
      // first/last 16px cell the content box [padL, padL+outW) touches
      val firstX = padL / 16
      val lastX = (padL + outW - 1) / 16
      val firstY = padT / 16
      val lastY = (padT + outH - 1) / 16
      val expected = (lastX - firstX + 1) * (lastY - firstY + 1)
      val nContent = rs.count(_.getBoolean(4)).toLong
      assert(nContent == expected, s"doc $id content-patch count")
      assert(rs.forall(_.getLong(5) == expected), s"doc $id n_content col")
      rs.foreach { r =>
        val (pid, px, py) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(px == pid % 14 && py == pid / 14, s"doc $id raster order")
        val inside = px >= firstX && px <= lastX && py >= firstY && py <= lastY
        assert(r.getBoolean(4) == inside, s"doc $id patch $pid flag")
      }
    }
  }

  test("pipeline_lang_balance: inverse-share factors flatten the mixture") {
    val rows = SparkEntry.queries("pipeline_lang_balance")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(rows.length >= 2, "fixture needs a language taxonomy")
    val tot = rows.map(_._2).sum
    rows.foreach { case (lang, nt, share, up, bal) =>
      assert(share == 1000000L * nt / tot, s"$lang share")
      // independent recount of the α = 0.5 temperature factor
      assert(up == math.floor(1000000.0 *
        math.sqrt(tot.toDouble / nt.toDouble)).toLong, s"$lang factor")
      assert(bal == nt * up / 1000000L, s"$lang balanced tokens")
    }
    // the law: factors order INVERSELY to share, and the balanced
    // mixture is strictly flatter than the raw one (max/min ratio)
    val factorsByShare = rows.sortBy(_._3).map(_._4).toSeq
    assert(factorsByShare == factorsByShare.sorted.reverse,
      "upsample factors must decrease as share grows")
    def spread(xs: Seq[Long]): Double =
      xs.max.toDouble / xs.min.toDouble
    assert(spread(rows.map(_._5).toSeq) < spread(rows.map(_._2).toSeq),
      "balanced token mass must be flatter than raw")
  }

  test("multimodal_letterbox: geometry laws of the floored-scale plan") {
    val rows = SparkEntry.queries("multimodal_letterbox")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(w == 4 + id % 5 && h == 4 + (id * 7) % 5, "fixture dims")
      val (outW, outH) = (r.getLong(4), r.getLong(5))
      // never exceeds the canvas; the CONSTRAINED side lands on 224 or
      // 223 (the floored-micro-scale letterbox contract)
      assert(outW <= 224 && outH <= 224, s"doc $id overflow")
      val constrained = if (w >= h) outW else outH
      assert(constrained == 224 || constrained == 223,
        s"doc $id constrained side $constrained")
      // aspect order is preserved by the shared scale
      assert((w >= h) == (outW >= outH), s"doc $id aspect flip")
      // pads reconstruct the canvas exactly, centered to within 1px
      assert(r.getLong(6) + r.getLong(7) == 224 - outW, s"doc $id pad w")
      assert(r.getLong(8) + r.getLong(9) == 224 - outH, s"doc $id pad h")
      assert((r.getLong(7) - r.getLong(6)).abs <= 1 &&
        (r.getLong(9) - r.getLong(8)).abs <= 1, s"doc $id centering")
    }
  }

  test("sql_grouping_sets: cube levels recount from raw lineitem") {
    def cents(x: Double): Long =
      (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact
    val base = U.tbl(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        cents(r.getDouble(2)), cents(r.getDouble(3))))
    def roll(rows: Seq[(String, String, Long, Long)]) =
      (rows.size.toLong, rows.map(_._3).sum, rows.map(_._4).sum)
    val detail = base.groupBy(r => (r._1, r._2)).view.mapValues(roll(_)).toMap
    val byRf = base.groupBy(_._1).view.mapValues(roll(_)).toMap
    val byLs = base.groupBy(_._2).view.mapValues(roll(_)).toMap
    val grand = roll(base.toSeq)
    val out = SparkEntry.queries("sql_grouping_sets")(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), Option(r.getString(2)),
        Option(r.getString(3))), (r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // one row per grouping set member, nothing else
    assert(out.size ==
      detail.size + byRf.size + byLs.size + 1, "cube cardinality")
    detail.foreach { case ((rf, ls), v) =>
      assert(out((0L, 0L, Some(rf), Some(ls))) == v, s"detail $rf/$ls") }
    byRf.foreach { case (rf, v) =>
      assert(out((0L, 1L, Some(rf), None)) == v, s"subtotal rf=$rf") }
    byLs.foreach { case (ls, v) =>
      assert(out((1L, 0L, None, Some(ls))) == v, s"subtotal ls=$ls") }
    assert(out((1L, 1L, None, None)) == grand, "grand total")
  }

  test("pipeline_epoch_plan: sqrt-allocation and repeat-cap recount") {
    val perSrc = U.tbl(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val totTokens = perSrc.values.map(_._2).sum
    val wOf = perSrc.view.mapValues { case (_, nt) =>
      math.floor(1000000.0 * math.sqrt(nt.toDouble)).toLong }.toMap
    val totW = wOf.values.sum
    val rows = SparkEntry.queries("pipeline_epoch_plan")(spark, sfDir)
      .collect()
    assert(rows.length == perSrc.size, "one plan row per source")
    rows.foreach { r =>
      val src = r.getString(0)
      val (nDocs, nt) = perSrc(src)
      val target = (BigInt(4) * totTokens * wOf(src) / totW).toLong
      val rawEpochs = 1000000L * target / nt
      val epochs = math.min(4000000L, rawEpochs)
      val served = nt * epochs / 1000000L
      assert(r.getLong(1) == nDocs && r.getLong(2) == nt, s"$src counts")
      assert(r.getLong(3) == wOf(src), s"$src weight")
      assert(r.getLong(4) == target, s"$src target")
      assert(r.getLong(5) == epochs, s"$src epochs")
      assert(r.getBoolean(6) == (rawEpochs > 4000000L), s"$src capped")
      assert(r.getLong(7) == served, s"$src served")
      assert(r.getLong(8) == target - served, s"$src shortfall")
      // the law: a capped source's shortfall is exactly the tokens the
      // 4-epoch ceiling refuses; an uncapped source loses at most the
      // one-token micro-floor residue
      if (r.getBoolean(6))
        assert(r.getLong(8) == target - 4L * nt, s"$src capped shortfall")
      else assert(r.getLong(8) <= 1L, s"$src uncapped residue")
    }
    // α = 0.5 temperature: epoch factors order inversely to source size
    val bySize = rows.sortBy(_.getLong(2)).map(_.getLong(5)).toSeq
    assert(bySize == bySize.sorted.reverse,
      "epoch factors must decrease as source size grows")
  }

  test("multimodal_tile_grid: argmax recount over all six candidate grids") {
    val cands = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (1L, 3L), (3L, 1L))
    val rows = SparkEntry.queries("multimodal_tile_grid")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (200 + (id * 13) % 600, 200 + (id * 29) % 600)
      assert(r.getLong(1) == w && r.getLong(2) == h, s"doc $id dims")
      val scored = cands.map { case (gw, gh) =>
        val (cw, ch) = (gw * 336, gh * 336)
        val scale = math.min(cw * 1000000L / w, ch * 1000000L / h)
        val (fw, fh) = (w * scale / 1000000L, h * scale / 1000000L)
        val eff = math.min(fw * fh, w * h)
        (gw, gh, cw, ch, scale, fw, fh, eff, cw * ch - eff)
      }
      val best = scored.minBy(c => (-c._8, c._9, c._1, c._2))
      assert((r.getLong(3), r.getLong(4)) == (best._1, best._2),
        s"doc $id grid choice")
      assert((r.getLong(5), r.getLong(6)) == (best._3, best._4) &&
        r.getLong(7) == best._5 &&
        (r.getLong(8), r.getLong(9)) == (best._6, best._7),
        s"doc $id geometry")
      assert(r.getLong(10) == best._1 * best._2, s"doc $id n_tiles")
    }
  }

  test("dedup_cdc_chunks: boundary fold and corpus dup recount") {
    val docs = U.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def chunksOf(text: String): Seq[String] = {
      val n = text.length
      val bounds = (4 to n).filter { i =>
        val h = text(i - 4).toInt * 29791 + text(i - 3).toInt * 961 +
          text(i - 2).toInt * 31 + text(i - 1).toInt
        h % 32 == 0
      }.map(_.toLong) :+ n.toLong
      bounds.distinct.sorted.foldLeft((0L, Seq.empty[String])) {
        case ((prev, acc), b) =>
          (b, acc :+ text.substring(prev.toInt, b.toInt))
      }._2
    }
    val perDoc = docs.map { case (id, t) => id -> chunksOf(t) }.toMap
    val occ = perDoc.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rows = SparkEntry.queries("dedup_cdc_chunks")(spark, sfDir).collect()
    assert(rows.length == docs.length, "one row per document")
    rows.foreach { r =>
      val id = r.getLong(0)
      val cs = perDoc(id)
      assert(r.getLong(1) == cs.size.toLong, s"doc $id chunk count")
      // the CDC tiling law: chunks cover the text exactly, no gap/overlap
      assert(r.getLong(2) == perDoc(id).map(_.length.toLong).sum &&
        cs.mkString == docs.toMap.apply(id), s"doc $id tiling")
      val dup = cs.filter(c => occ(c) > 1)
      assert(r.getLong(3) == dup.size.toLong, s"doc $id dup chunks")
      assert(r.getLong(4) == dup.map(_.length.toLong).sum, s"doc $id dup chars")
    }
    // the fixture must actually exercise the dedup signal
    assert(rows.map(_.getLong(3)).sum > 0, "corpus has duplicate chunks")
  }

  test("multimodal_video_keyframe: keyframe set and gap recount") {
    val rows = SparkEntry.queries("multimodal_video_keyframe")(spark, sfDir)
      .collect()
    val docs = U.tbl(spark, sfDir, "documents").select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    assert(rows.map(_.getLong(0)).toSeq == docs.toSeq, "one plan per video")
    rows.foreach { r =>
      val id = r.getLong(0)
      val nf = 48 + (id * 11) % 72
      val kfs = (0L until nf).filter(f =>
        f == 0L || (id * 7919 + f * 104729) % 1000 >= 900)
      val gaps = (kfs :+ nf).sliding(2).map(p => p(1) - p(0)).toSeq
      assert(r.getLong(1) == nf, s"video $id frame count")
      assert(r.getLong(2) == kfs.size.toLong, s"video $id keyframes")
      assert(r.getLong(3) == 1000000L * kfs.size / nf, s"video $id density")
      assert(r.getLong(4) == gaps.max, s"video $id max gap")
    }
  }

  test("round-15 facades equal their declared twins on the fixture corpus") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(graft.api.GraftApi.cdcChunkStats(
        U.tbl(spark, sfDir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")) ==
      rows(SparkEntry.queries("dedup_cdc_chunks")(spark, sfDir)))
    assert(rows(graft.api.GraftApi.epochPlan(
        U.tbl(spark, sfDir, "documents").select(col("source"), col("text")),
        "source", "text")) ==
      rows(SparkEntry.queries("pipeline_epoch_plan")(spark, sfDir)))
    assert(rows(graft.api.GraftApi.tileGrid(
        U.tbl(spark, sfDir, "documents").select(col("doc_id"),
          expr("200 + (doc_id * 13) % 600").as("w"),
          expr("200 + (doc_id * 29) % 600").as("h")),
        "doc_id", "w", "h").orderBy("doc_id")) ==
      rows(SparkEntry.queries("multimodal_tile_grid")(spark, sfDir)))
    assert(rows(graft.api.GraftApi.keyframes(
        U.tbl(spark, sfDir, "documents")
          .select(col("doc_id"), expr("48 + (doc_id * 11) % 72").as("nf"))
          .select(col("doc_id"), col("nf"),
            explode(expr("sequence(CAST(0 AS BIGINT), nf - 1)")).as("fid"))
          .withColumn("m", expr("(doc_id * 7919 + fid * 104729) % 1000")),
        "doc_id", "nf", "fid", "m").orderBy("doc_id")) ==
      rows(SparkEntry.queries("multimodal_video_keyframe")(spark, sfDir)))
  }
}
