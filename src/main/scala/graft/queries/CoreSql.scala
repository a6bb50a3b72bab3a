package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core SQL surface of the reference engine re-expressed as Catalyst
  * plans: SELECT/WHERE/CASE/GROUP BY/HAVING/ORDER BY/LIMIT, all five
  * join types, subqueries, UNION, DISTINCT, JSON field access.
  * Reference: /root/reference/docs/en_US/sqls/query_language_elements.md
  *
  * Scale notes: dimension-side joins are `broadcast()`; fact-fact joins
  * shuffle on the join key and rely on AQE for skew. Floating aggregate
  * outputs are rounded so results are engine-order independent.
  */
object CoreSql {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_select" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))),

    "q_filter" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(50000, 200000) &&
          col("o_orderpriority").like("1%") &&
          !(col("o_custkey") === 7))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))),

    "q_case" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 150000, "big")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("small").as("bucket"),
        when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "done")
          .otherwise("other").as("st"))),

    "q_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("n"))),

    "q_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("n_orders") >= 3)),

    "q_orderby" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    "q_join_inner" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 100000)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("o_orderkey"))
    }),

    "q_join_left" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    "q_join_right" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      o.join(c, col("o_custkey") === col("c_custkey"), "right")
        .filter(col("c_acctbal") < 0)
        .select(col("o_orderkey"), col("c_custkey"))
    }),

    "q_join_full" -> ((s, d) => {
      val a = t(s, d, "customer").groupBy(col("c_nationkey").as("nk_a"))
        .agg(count(lit(1)).as("n_cust"))
      val b = t(s, d, "supplier").groupBy(col("s_nationkey").as("nk_b"))
        .agg(count(lit(1)).as("n_supp"))
      a.join(b, col("nk_a") === col("nk_b"), "full")
        .select(
          coalesce(col("nk_a"), col("nk_b")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    "q_join_cross" -> ((s, d) => {
      val r = t(s, d, "region")
      r.select(col("r_name").as("r1"))
        .crossJoin(r.select(col("r_name").as("r2")))
    }),

    "q_join_multi" -> ((s, d) => {
      val r = t(s, d, "region"); val n = t(s, d, "nation"); val c = t(s, d, "customer")
      val o = t(s, d, "orders"); val l = t(s, d, "lineitem"); val sup = t(s, d, "supplier")
      // Selective dimension filters FIRST: region→nation (constant 5/25
      // rows — always broadcast) prunes customer to the ASIA fifth
      // before it meets orders, and pruned orders shrink the one big
      // lineitem⋈orders shuffle ~5× — vs filtering after the fact
      // joins. customer/supplier grow with SF, so no broadcast hint:
      // AQE broadcasts them at small SF and shuffle-joins at 100 TB.
      val asiaNations = n.join(broadcast(r.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      val asiaCust = c.join(broadcast(asiaNations),
        col("c_nationkey") === col("n_nationkey"))
      val asiaOrders = o.join(asiaCust.select(col("c_custkey"), col("n_name")),
        col("o_custkey") === col("c_custkey"))
      l.join(asiaOrders, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    "q_subquery" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.agg(avg(col("o_totalprice")).as("a"))
      o.crossJoin(broadcast(a))
        .filter(col("o_totalprice") > col("a") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    "q_union" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey").as("k"), lit("hi").as("tier"))
        .unionByName(
          o.filter(col("o_totalprice") <= 150000)
            .select(col("o_orderkey").as("k"), lit("lo").as("tier")))
    }),

    "q_distinct" -> ((s, d) =>
      t(s, d, "customer").select(col("c_mktsegment"), col("c_nationkey")).distinct()),

    "q_json_access" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")))
  )

  val oracle: Map[String, String] = Map(
    "q_select" ->
      "SELECT l_orderkey, l_linenumber, round(l_extendedprice*(1-l_discount),4) AS net_price FROM lineitem",
    "q_filter" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 50000 AND 200000
        |  AND o_orderpriority LIKE '1%' AND NOT (o_custkey = 7)""".stripMargin,
    "q_case" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 150000 THEN 'big' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
        |  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done' ELSE 'other' END AS st
        |FROM orders""".stripMargin,
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc,
        |  round(avg(l_quantity),6) AS avg_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3""".stripMargin,
    "q_orderby" ->
      """SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_join_inner" ->
      """SELECT c.c_custkey, c.c_name, n.n_name, o.o_orderkey
        |FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
        |JOIN nation n ON c.c_nationkey=n.n_nationkey
        |WHERE o.o_totalprice > 100000""".stripMargin,
    "q_join_left" ->
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON c.c_custkey=o.o_custkey
        |GROUP BY c.c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT o.o_orderkey, c.c_custkey
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey=c.c_custkey
        |WHERE c.c_acctbal < 0""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(a.nk_a, b.nk_b) AS nk, coalesce(a.n_cust, 0) AS n_cust, coalesce(b.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk_a, count(*) AS n_cust FROM customer GROUP BY 1) a
        |FULL JOIN (SELECT s_nationkey AS nk_b, count(*) AS n_supp FROM supplier GROUP BY 1) b
        |ON a.nk_a=b.nk_b""".stripMargin,
    "q_join_cross" ->
      "SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b",
    "q_join_multi" ->
      """SELECT n.n_name, round(sum(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
        |JOIN customer c ON o.o_custkey=c.c_custkey
        |JOIN nation n ON c.c_nationkey=n.n_nationkey
        |JOIN region r ON n.n_regionkey=r.r_regionkey AND r.r_name='ASIA'
        |JOIN supplier s ON l.l_suppkey=s.s_suppkey
        |GROUP BY n.n_name""".stripMargin,
    "q_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5*(SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "q_union" ->
      """SELECT o_orderkey AS k, 'hi' AS tier FROM orders WHERE o_totalprice > 150000
        |UNION ALL
        |SELECT o_orderkey AS k, 'lo' AS tier FROM orders WHERE o_totalprice <= 150000""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q_json_access" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"
  )
}
