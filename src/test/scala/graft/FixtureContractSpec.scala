package graft

/** Fixture-schema contract at ALL THREE SFs — the generalization of the
  * round-5 lesson EventsLayoutSpec encodes for `events.ts`: a driver-side
  * fixture regeneration that changes any table's column set or physical
  * type must break ONE unit test with an exact message, not 30 driver
  * queries at the round gate. Expected schemas are the CURRENT measured
  * reality (2026-08-14): the driver has regenerated all timestamp columns
  * to naive micros since FIXTURES.md's 2026-08-12 snapshot, so
  * `l_shipdate`/`o_orderdate` read as TIMESTAMP_NTZ (value-correct under
  * the pinned UTC session). `events` is asserted through `U.events`
  * (the layout-normalizing reader every query uses), the rest through the
  * plain `U.tbl` read. If this test fails after a regeneration, update
  * FIXTURES.md AND this table together, then re-run the full oracle sweep.
  */
class FixtureContractSpec extends SparkTestBase {

  private val expected: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint",
      "l_suppkey:bigint", "l_linenumber:int", "l_quantity:double",
      "l_extendedprice:double", "l_discount:double", "l_tax:double",
      "l_returnflag:string", "l_linestatus:string",
      "l_shipdate:timestamp_ntz"),
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint",
      "o_orderstatus:string", "o_totalprice:double",
      "o_orderdate:timestamp_ntz", "o_orderpriority:string"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string",
      "c_nationkey:int", "c_acctbal:double", "c_mktsegment:string"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string",
      "s_nationkey:int", "s_acctbal:double"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>",
      "label:int"),
    "events" -> Seq("event_id:bigint", "ts:timestamp", "user_id:bigint",
      "event_type:string", "value:double", "props:string"))

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"$sf fixture tables match the FIXTURES.md schema contract") {
      val d = s"/root/testdata/$sf"
      expected.foreach { case (table, exp) =>
        val df = if (table == "events") U.events(spark, d)
                 else U.tbl(spark, d, table)
        val got = df.schema.fields.toSeq
          .map(f => s"${f.name}:${f.dataType.simpleString}")
        assert(got == exp,
          s"$d/$table.parquet schema drifted from FIXTURES.md —\n" +
            s"  expected: ${exp.mkString(", ")}\n" +
            s"  read:     ${got.mkString(", ")}\n" +
            "  (fixture regeneration? update FIXTURES.md + this spec, " +
            "then re-run the full oracle sweep)")
        assert(df.limit(1).count() == 1L, s"$d/$table.parquet is empty")
      }
    }
}
