package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second relational wave: grouping sets, range window frames, navigation
  * functions, distribution functions, positional explode, ordered string
  * aggregation. Same determinism rules as [[RelationalQueries]].
  */
object RelationalQueries2 {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // explicit grouping sets with grouping() markers (SQL surface; Catalyst
    // expands to a single Expand + aggregate, one shuffle)
    "q21_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
          |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
          |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g_rf, g_ls, rf, ls""".stripMargin)
    }),

    // RANGE window frame: 7-day trailing quantity per supplier (range on a
    // numeric day offset; every same-day row sees the same frame, so the
    // result is tie-order independent)
    "q22_range_frame" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_suppkey") < 50)
        .withColumn("d", datediff(col("l_shipdate"), lit("1970-01-01").cast("date")).cast("long"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("d")).rangeBetween(-7, 0)
      li.select(col("l_suppkey"), col("d"),
          sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").as("qty_7d"))
        .orderBy("l_suppkey", "d", "qty_7d")
    }),

    // navigation functions: first/last/nth/lag/lead over each customer's
    // order history (unique (date, key) ordering => deterministic)
    "q23_nav" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_custkey") < 100)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      o.select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wFull).as("first_key"),
          last(col("o_orderkey")).over(wFull).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // distribution functions: ntile/percent_rank/cume_dist over account
    // balances (unique tie-break key makes ntile deterministic; the rank
    // ratios are single IEEE divisions)
    "q24_dist" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_custkey") < 500)
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      c.select(col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    }),

    // positional explode (lateral view): tokens with ordinal positions
    "q25_posexplode" -> ((s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")),

    // ordered string aggregation (listagg) per group
    "q26_stringagg" -> ((s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") % 100 === 0)
        .groupBy(col("lang"), col("source"))
        .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("ids"),
          count(lit(1)).as("n"))
        .orderBy("lang", "source")),

    // semi-structured JSON extraction (schema-on-read over a string column):
    // parse stays a narrow map; malformed rows surface as nulls, not errors
    "q27_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q21_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin,

    "q22_range_frame" ->
      """SELECT l_suppkey, CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS d,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_7d
        |FROM lineitem WHERE l_suppkey < 50
        |ORDER BY l_suppkey, d, qty_7d""".stripMargin,

    "q23_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER wf AS first_key,
        |  last_value(o_orderkey) OVER wf AS last_key,
        |  nth_value(o_orderkey, 2) OVER wf AS second_key,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q24_dist" ->
      """SELECT c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer WHERE c_custkey < 500
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q25_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 50),
        |  LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
        |ORDER BY doc_id, pos""".stripMargin,

    "q26_stringagg" ->
      """SELECT lang, source,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents WHERE doc_id % 100 = 0
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q27_json_extract" ->
      """WITH x AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(count(k) AS BIGINT) AS n_k,
        |  sum(k) AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
