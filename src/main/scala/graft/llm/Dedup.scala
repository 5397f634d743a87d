package graft.llm

import graft.U
import graft.llm.TextUtil._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.10 — deduplication family over `documents`:
  *
  *  - `dedup_exact`: content-hash (SHA-256) exact dedup, window-pick-first.
  *  - `dedup_jaccard`: exact near-dup pairs — 3-gram shingles → inverted
  *    index (explode + self-join on shingle) → exact Jaccard >= 0.2. The
  *    inverted index has 100% recall for any Jaccard > 0, so this is fully
  *    oracle-able; at 100 TB you'd cap shingle doc-frequency to bound the
  *    hottest posting lists (skew), which only drops stop-shingles.
  *  - `dedup_minhash`: MinHash signatures (16 perms) + LSH banding (4x4) →
  *    candidates → exact-Jaccard verify. Probabilistic recall => no SQL
  *    oracle (rows-only gate); MinhashSpec asserts it against dedup_jaccard.
  *  - `dedup_simhash`: 60-bit SimHash + direct pairwise popcount for
  *    hamming <= 3 pairs (band blocking degenerates on this corpus — see
  *    the method comment for the measurement) => oracle-able exactly.
  *
  * All hashes are the shared polynomial hash (TextUtil) — integer
  * arithmetic reproducible in DuckDB, unlike engine-native murmur3.
  */
object Dedup {

  private def docs(s: SparkSession, d: String) = U.tbl(s, d, "documents")

  /** Shared per-(session, sfDir) shingle+hash frame: the Jaccard, MinHash
    * and SimHash queries all start from it, so the corpus is shingled once
    * per JVM (codegen'd Shingles3 + PolyHashArray) and served from cache. */
  private val shingleCache =
    scala.collection.mutable.Map[String, (SparkSession, DataFrame)]()
  private def shingled(s: SparkSession, d: String): DataFrame = synchronized {
    shingleCache.get(d) match {
      // reference-compare the session: a cached frame bound to a stopped
      // session must be rebuilt, and stale entries must not accumulate
      case Some((sess, df)) if sess eq s => df
      case _ =>
        val df = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), graft.plans.CustomExprs.shingles3_fast(col("toks")).as("ss"))
          .filter(size(col("ss")) > 0)
          .withColumn("hs", graft.plans.CustomExprs.poly_hash_array(col("ss"), 13L))
          .persist()
        shingleCache(d) = (s, df)
        df
    }
  }

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  /** Shingle-set pairs with exact Jaccard, via inverted index.
    * Tokens are materialized into their own projection first: inlining
    * tokens() into shingles3's element_at calls would re-split the text for
    * every shingle position (interpreted HOFs have no subexpression reuse —
    * this was a 40s/query difference at sf0.1). */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
      .select(col("doc_id"), col("ss"), size(col("ss")).cast(LongType).as("n_sh"))
    val inv = sh.select(col("doc_id"), col("n_sh"), explode(col("ss")).as("sg"))
    val a = inv.select(col("doc_id").as("da"), col("n_sh").as("na"), col("sg"))
    val b = inv.select(col("doc_id").as("db"), col("n_sh").as("nb"), col("sg"))
    a.join(b, Seq("sg")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jac", col("common").cast(DoubleType) /
        (col("na") + col("nb") - col("common")).cast(DoubleType))
      .filter(col("jac") >= 0.2)
      .select(col("da"), col("db"), col("common"), col("jac"))
      .orderBy("da", "db")
  }

  /** MinHash + LSH banding, then exact-Jaccard verification of candidates.
    * Signatures come from the codegen'd MinHashSigs kernel (one pass over
    * the shingle hashes instead of nPerm interpreted scans); candidate
    * pairs are deduped as bare (da, db) BEFORE the shingle arrays join back
    * in, so the banding shuffle never carries arrays. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val nPerm = 16
    val base = shingled(s, d)
    val signed = base.select(col("doc_id"),
      graft.plans.CustomExprs.minhash_sigs(col("hs"), nPerm).as("sigs"))
    val bands = (0 until 4).map { bIdx =>
      signed.select(col("doc_id"), lit(bIdx).as("band"),
        concat_ws(":", (0 until 4).map(r => element_at(col("sigs"), bIdx * 4 + r + 1)): _*)
          .as("bkey"))
    }.reduce(_ unionByName _)
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("da"), col("ss").as("ssa")), "da")
      .join(base.select(col("doc_id").as("db"), col("ss").as("ssb")), "db")
      .withColumn("common", size(array_intersect(col("ssa"), col("ssb"))).cast(LongType))
      .withColumn("jac", col("common").cast(DoubleType) /
        (size(col("ssa")) + size(col("ssb")) - col("common")).cast(DoubleType))
      .filter(col("jac") >= 0.2)
      .select(col("da"), col("db"), col("common"), col("jac"))
      .orderBy("da", "db")
  }

  /** 60-bit SimHash per doc + hamming<=3 pairs.
    * Hashed over 3-gram SHINGLES, not tokens: the fixture vocab is shared
    * across all docs, so token-level simhashes collapse together; shingle
    * sets separate near-dups from noise.
    *
    * Pairing is DIRECT pairwise popcount, not band blocking, and that is a
    * measured decision: this corpus has only ~27k distinct shingles shared
    * across ~10 docs each, so simhash bits correlate and EVERY pair collides
    * in some 15-bit band — banding produced all n^2/2 candidates and then
    * paid a 31 s distinct-shuffle on them, while the codegen'd
    * bit_count(xor) scan over the same n^2/2 pairs costs ~2 s and is exact.
    * On a high-diversity corpus (where bands actually prune), reinstate
    * 4x15-bit banding — pigeonhole keeps exact recall for hamming<=3. */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
      .withColumn("simhash", graft.plans.CustomExprs.simhash60(col("hs")))
      .select(col("doc_id"), col("simhash"))
      .persist() // both pairwise sides read it
    val a = sh.select(col("doc_id").as("da"), col("simhash").as("ha"))
    val b = sh.select(col("doc_id").as("db"), col("simhash").as("hb"))
    a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast(LongType))
      .filter(col("hamming") <= 3)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy("da", "db")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact _,
    "dedup_jaccard" -> jaccardPairs _,
    "dedup_minhash" -> minhashPairs _,
    "dedup_simhash" -> simhashPairs _)

  private val simhashSql = {
    val sh = sqlShingles3(sqlTokens("text"))
    val ph = sqlPolyHash("t", 13L)
    "WITH hs AS (SELECT doc_id, " +
      s"list_transform($sh, t -> $ph) AS hl FROM documents " +
      s"WHERE len($sh) > 0), " +
      "sh AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), b -> " +
      "CASE WHEN CAST(list_sum(list_transform(hl, h -> (((h * 2654435761) >> b) & 1) * 2 - 1)) AS BIGINT) > 0 " +
      "THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash " +
      "FROM hs) " +
      "SELECT a.doc_id AS da, b.doc_id AS db, " +
      "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming " +
      "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 ORDER BY da, db"
  }

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      ("SELECT sha256(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n_copies " +
        "FROM documents GROUP BY sha256(text) ORDER BY keeper"),
    "dedup_jaccard" -> {
      val toks = sqlTokens("text")
      s"WITH sh AS (SELECT doc_id, ${sqlShingles3(toks)} AS ss FROM documents), " +
        "sized AS (SELECT doc_id, ss, CAST(len(ss) AS BIGINT) AS n_sh FROM sh), " +
        "inv AS (SELECT doc_id, n_sh, unnest(ss) AS sg FROM sized), " +
        "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, a.n_sh AS na, " +
        "b.n_sh AS nb, COUNT(*) AS common FROM inv a JOIN inv b " +
        "ON a.sg = b.sg AND a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4) " +
        "SELECT da, db, common, CAST(common AS DOUBLE) / " +
        "CAST(na + nb - common AS DOUBLE) AS jac FROM pairs " +
        "WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.2 " +
        "ORDER BY da, db"
    },
    "dedup_simhash" -> simhashSql)
}
