package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Dag, TaskGraph}

/** The reference-surface queries: each exercises one operator family of
  * SURVEY.md §2 (map / reduce / groupby / slicing / sel / loc / branch ops /
  * materialize / indices) through the TaskGraph engine, over the driver's
  * parquet tables, with a DuckDB oracle.
  *
  * Floating-point aggregations go through decimal casts inside the graph
  * (attrs func "sum" over a DECIMAL expr) so results are order-independent
  * and hash-match the oracle — see graft.functions.Exact.
  */
object CyclebaneQueries {

  private def empty: TaskGraph = TaskGraph(Dag.empty)

  val all: Seq[QueryDef] = Seq(

    // O4+O5: map + reduce-all, executing sum (SURVEY §7.2 flagship)
    QueryDef("cb_reduce_all",
      (s, dir) => {
        val g = empty
          // spread (guarded) before the decimal multiply + sum: the
          // reduce-all partial aggregate ran 1.6 task-CPU-s serialized
          // behind the 1-row-group scan (r21); the decimal sum is exact,
          // so placement cannot change the result
          .mapFrame(graft.operators.ScaleOps.spreadCpu(
              Tables.lineitem(s, dir)
                .select("l_extendedprice", "l_discount")),
            Map("l_extendedprice" -> "l_extendedprice", "l_discount" -> "l_discount"))
          .withExpr("revenue", Seq("l_extendedprice", "l_discount"),
            "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))")
          .reduce(key = "revenue", name = "total_revenue",
            attrs = Map("func" -> "sum"))
        g.result("total_revenue")
          .select(col("total_revenue").cast("double").as("total_revenue"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue FROM lineitem""")),

    // O6+O7: groupby(col).reduce — keyed aggregation
    QueryDef("cb_groupby_sum",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.lineitem(s, dir),
            Map("l_quantity" -> "l_quantity", "l_returnflag" -> "l_returnflag"))
          .groupby("l_returnflag")
          .reduce(key = "l_quantity", name = "sum_qty", attrs = Map("func" -> "sum"))
        g.result("sum_qty").orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, SUM(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // O4/O22: joint map = zip semantics (one shared dim, no cross product)
    QueryDef("cb_joint_zip",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.nation(s, dir), Map("a" -> "n_name", "b" -> "n_regionkey"))
          .withExpr("c", Seq("a", "b"), "concat(a, '-', CAST(b AS STRING))")
        g.result("c").select("a", "b", "c").orderBy("a")
      },
      Some("""SELECT n_name AS a, n_regionkey AS b, n_name || '-' || CAST(n_regionkey AS VARCHAR) AS c FROM nation ORDER BY n_name""")),

    // O4 chained: independent dims cross-multiply at the shared descendant
    QueryDef("cb_chained_cross",
      (s, dir) => {
        val g = TaskGraph.fromEdges("a" -> "c", "b" -> "c")
          .mapFrame(Tables.region(s, dir), Map("a" -> "r_name"))
          .mapFrame(Tables.supplier(s, dir), Map("b" -> "s_name"))
        g.result("c").select("a", "b").orderBy("a", "b")
      },
      Some("""SELECT r_name AS a, s_name AS b FROM region CROSS JOIN supplier ORDER BY 1, 2""")),

    // O9: positional slice before expansion (pushed-down predicate)
    QueryDef("cb_slice_pos",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.customer(s, dir), Map("c_name" -> "c_name"),
            indexCol = Some("c_custkey"), dimName = "c_custkey")
          .byPosition("c_custkey", 10, 20)
        g.result("c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer QUALIFY row_number() OVER (ORDER BY c_custkey) BETWEEN 11 AND 20 ORDER BY c_custkey""")),

    // O10: label-based point selection
    QueryDef("cb_sel_label",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.nation(s, dir), Map("n_name" -> "n_name"),
            indexCol = Some("n_nationkey"), dimName = "n_nationkey")
          .sel("n_nationkey", 7)
        g.result("n_name")
      },
      Some("""SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 7""")),

    // O11: label-range slice
    QueryDef("cb_loc_range",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.part(s, dir), Map("p_name" -> "p_name"),
            indexCol = Some("p_partkey"), dimName = "p_partkey")
          .loc("p_partkey", 50L, 100L)
        g.result("p_name").orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part WHERE p_partkey >= 50 AND p_partkey < 100 ORDER BY p_partkey""")),

    // O5 with index=: partial reduce keeps the other (labeled) dim
    QueryDef("cb_reduce_dim",
      (s, dir) => {
        val factors = s.createDataFrame(Seq((10, 1), (20, 2), (30, 3))).toDF("f", "factor")
        val g = empty
          .mapFrame(Tables.lineitem(s, dir), Map("l_quantity" -> "l_quantity"))
          .mapFrame(factors, Map("factor" -> "factor"),
            indexCol = Some("f"), dimName = "f")
          .withExpr("scaled", Seq("l_quantity", "factor"), "l_quantity * factor")
          .reduce(key = "scaled", index = "dim_0", name = "sum_scaled",
            attrs = Map("func" -> "sum"))
        g.result("sum_scaled").orderBy("f")
      },
      Some("""SELECT t.f AS f, SUM(l_quantity * t.factor) AS sum_scaled FROM lineitem CROSS JOIN (VALUES (10, 1), (20, 2), (30, 3)) AS t(f, factor) GROUP BY t.f ORDER BY f""")),

    // O7 on a 2-D node: other dim kept, group dim appended last
    QueryDef("cb_groupby_2d",
      (s, dir) => {
        val factors = s.createDataFrame(Seq((10, 1), (20, 2))).toDF("f", "factor")
        val g = empty
          .mapFrame(Tables.lineitem(s, dir),
            Map("l_quantity" -> "l_quantity", "l_returnflag" -> "l_returnflag"))
          .mapFrame(factors, Map("factor" -> "factor"),
            indexCol = Some("f"), dimName = "f")
          .withExpr("scaled", Seq("l_quantity", "factor"), "l_quantity * factor")
          .groupby("l_returnflag")
          .reduce(key = "scaled", name = "r", attrs = Map("func" -> "sum"))
        g.result("r").orderBy("f", "l_returnflag")
      },
      Some("""SELECT t.f AS f, l_returnflag, SUM(l_quantity * t.factor) AS r FROM lineitem CROSS JOIN (VALUES (10, 1), (20, 2)) AS t(f, factor) GROUP BY 1, 2 ORDER BY 1, 2""")),

    // O12: branch select prunes the unrelated mapped branch
    QueryDef("cb_branch_getitem",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.orders(s, dir),
            Map("o_totalprice" -> "o_totalprice", "o_orderstatus" -> "o_orderstatus"))
          .mapFrame(Tables.customer(s, dir), Map("c_acctbal" -> "c_acctbal"))
          .withExpr("price_dec", Seq("o_totalprice"),
            "CAST(o_totalprice AS DECIMAL(27,6))")
          .groupby("o_orderstatus")
          .reduce(key = "price_dec", name = "total", attrs = Map("func" -> "sum"))
          .getItem("total")
        require(!g.dag.contains("c_acctbal"), "branch pruning failed")
        g.result("total")
          .select(col("o_orderstatus"), col("total").cast("double").as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // O13: branch replace — splice a new sub-plan in at a node
    QueryDef("cb_setitem_splice",
      (s, dir) => {
        val base = TaskGraph.chain("src", "v")
          .mapFrame(Tables.orders(s, dir), Map("src" -> "o_totalprice"),
            dimName = "od")
        val branch = TaskGraph.chain("x", "y")
          .mapFrame(Tables.lineitem(s, dir), Map("x" -> "l_extendedprice"),
            dimName = "ld")
        val g = base.setItem("v", branch)
          .reduce(key = "v", name = "mx", attrs = Map("func" -> "max"))
        g.result("mx")
      },
      Some("""SELECT MAX(l_extendedprice) AS mx FROM lineitem""")),

    // O14: branch delete — exclusive ancestors removed, node kept as input
    QueryDef("cb_delitem",
      (s, dir) => {
        val g = TaskGraph.fromEdges("p" -> "b", "a" -> "b", "a" -> "c")
          .delItem("b")
          .mapFrame(Tables.nation(s, dir), Map("a" -> "n_name"))
        require(!g.dag.contains("p") && g.dag.contains("b"), "delItem failed")
        g.result("c").select(col("c")).orderBy("c")
      },
      Some("""SELECT n_name AS c FROM nation ORDER BY 1""")),

    // O15-O17: materialization (to_networkx parity task table)
    QueryDef("cb_tasktable",
      (s, dir) => {
        val g = TaskGraph(Dag.chain("a"))
          .mapFrame(Tables.region(s, dir), Map("a" -> "r_name"))
          .reduce(key = "a", name = "t", attrs = Map("func" -> "count"))
        g.taskTable().select("node", "value").orderBy("node", "value")
      },
      Some("""SELECT 'a' AS node, r_name AS value FROM region UNION ALL SELECT 't' AS node, CAST(COUNT(*) AS VARCHAR) AS value FROM region ORDER BY 1, 2""")),

    // O3/O25: dim catalog — distinct labels of a dim
    QueryDef("cb_indices",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.nation(s, dir), Map("n_name" -> "n_name"),
            indexCol = Some("n_regionkey"), dimName = "rdim")
        g.indices("rdim").orderBy("rdim")
      },
      Some("""SELECT DISTINCT n_regionkey AS rdim FROM nation ORDER BY rdim""")),

    // O15-O17 edge materialization: per-copy edge set incl. the groupby
    // member -> group wiring (to_networkx edge parity, graph.py:426-441)
    QueryDef("cb_edgetable",
      (s, dir) => {
        val g = empty
          .mapFrame(Tables.nation(s, dir),
            Map("n_name" -> "n_name", "rkey" -> "n_regionkey"),
            indexCol = Some("n_nationkey"), dimName = "nk")
          .groupby("rkey")
          .reduce(key = "n_name", name = "per_region",
            attrs = Map("func" -> "count"))
        g.edgeTable()
          .select(col("src"), col("src_index")("nk").as("src_nk"),
            col("dst"), col("dst_index")("nk").as("dst_nk"),
            col("dst_index")("rkey").as("dst_rkey"))
          .orderBy("src", "dst", "src_nk", "dst_rkey")
      },
      Some("""SELECT src, CAST(n_nationkey AS VARCHAR) AS src_nk, dst, CAST(CASE WHEN dst = 'per_region' THEN NULL ELSE n_nationkey END AS VARCHAR) AS dst_nk, CAST(CASE WHEN dst = 'per_region' THEN n_regionkey ELSE NULL END AS VARCHAR) AS dst_rkey FROM nation CROSS JOIN (VALUES ('n_name', 'per_region'), ('rkey', 'per_region')) AS e(src, dst) ORDER BY src, dst, src_nk, dst_rkey""")),

    // Chained groupby via branch splicing (groupby_test.py:50-154): a first
    // groupby per order is spliced into a second graph whose parameter
    // table is indexed by the first groupby's dim, then grouped again by
    // priority — the reference's hardest composition pattern, executed as
    // two hash aggregations joined on the shared dim.
    QueryDef("cb_groupby_chained",
      (s, dir) => {
        val g1 = TaskGraph(Dag.chain("price", "rev")
            .addNode("rev", Map("expr" -> "CAST(price AS DECIMAL(27,6))")))
          .mapFrame(Tables.lineitem(s, dir),
            Map("price" -> "l_extendedprice", "param1" -> "l_orderkey"))
          .groupby("param1")
          .reduce(key = "rev", name = "order_rev", attrs = Map("func" -> "sum"))
        // the spliced table's index must equal the first groupby's keys
        // (the reference's set_index pattern): restrict to orders that
        // actually have lineitems (1.8% are childless in the test data)
        val ordersWithItems = Tables.orders(s, dir).join(
          Tables.lineitem(s, dir).select(col("l_orderkey")).distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        val m2 = TaskGraph(Dag.fromEdges("orev" -> "w")
            .addNode("w", Map("expr" -> "orev")))
          .mapFrame(ordersWithItems,
            Map("orev" -> "o_totalprice", "prio" -> "o_orderpriority"),
            indexCol = Some("o_orderkey"), dimName = "param1")
        val g = m2.setItem("orev", g1.getItem("order_rev"))
          .groupby("prio")
          .reduce(key = "w", name = "prio_rev", attrs = Map("func" -> "sum"))
        g.result("prio_rev")
          .select(col("prio"), col("prio_rev").cast("double").as("prio_rev"))
          .orderBy("prio")
      },
      Some("""SELECT o.o_orderpriority AS prio, CAST(SUM(j.order_rev) AS DOUBLE) AS prio_rev FROM (SELECT l_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS order_rev FROM lineitem GROUP BY l_orderkey) j JOIN orders o ON j.l_orderkey = o.o_orderkey GROUP BY 1 ORDER BY 1""")),

    // N-D surface: 2-D map in tidy form (graph_test.py:142-155) — a part x
    // supplier grid from partsupp-like data built of two joined dims, with
    // an inner positional slice and an axis reduce.
    QueryDef("cb_map_2d",
      (s, dir) => {
        val grid = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
          .agg(sum(col("l_quantity").cast("decimal(27,6)")).as("qty"))
        val g = TaskGraph(Dag.chain("q", "qq")
            .addNode("qq", Map("expr" -> "q")))
          .mapND("q", grid, Seq("rf" -> "rf", "ls" -> "ls"), "qty")
          .reduce(key = "qq", index = "ls", name = "per_rf",
            attrs = Map("func" -> "sum"))
        g.result("per_rf")
          .select(col("rf"), col("per_rf").cast("double").as("per_rf"))
          .orderBy("rf")
      },
      Some("""SELECT l_returnflag AS rf, CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS per_rf FROM lineitem GROUP BY 1 ORDER BY 1"""))
  )
}
