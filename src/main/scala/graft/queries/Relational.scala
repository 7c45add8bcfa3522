package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational operator coverage — SURVEY.md §2.1 logical ops, §2.3 aggregate
  * functions, §2.4/2.5 scalar functions — each re-expressed as a declarative
  * DataFrame plan over the driver's parquet tables so Catalyst gets full
  * pushdown/pruning freedom.
  *
  * Reference semantics: `crates/grafeo-engine/src/query/plan.rs:25-155`
  * (LogicalOperator), `plan.rs:862-968` (LogicalExpression),
  * `plan.rs:972-1034` (Binary/UnaryOp).
  */
object Relational {

  def defs: Seq[QueryDef] = Seq(

    // NodeScan + Filter (plan.rs:157-166, 311-317): label-filtered scan with
    // predicate. Filter + projection reach the parquet scan (PushedFilters).
    QueryDef(
      "q_scan_filter",
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000.0)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Project / Bind (plan.rs:320-335, 533-541): computed columns — arithmetic
    // stays a single deterministic IEEE expression, identical in both engines.
    QueryDef(
      "q_project_expr",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS revenue,
        |       l_quantity + l_tax AS qt,
        |       CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS status
        |FROM lineitem
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          (col("l_quantity") + col("l_tax")).as("qt"),
          when(col("l_returnflag") === "R", "returned").otherwise("kept").as("status"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Aggregate (plan.rs:256-307): hash group-by with partial (map-side)
    // aggregation for free; sums rounded to absorb summation-order ulp noise.
    QueryDef(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Aggregate + HAVING (plan.rs:299-306): post-aggregation filter.
    QueryDef(
      "q_agg_having",
      """SELECT c_nationkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |GROUP BY c_nationkey
        |HAVING count(*) >= 3
        |ORDER BY c_nationkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("bal"))
        .filter(col("n_cust") >= 3)
        .orderBy("c_nationkey")
    },

    // DISTINCT aggregates (aggregate.rs:79-91 `distinct: bool`).
    QueryDef(
      "q_agg_distinct",
      """SELECT o_orderstatus,
        |       count(DISTINCT o_custkey) AS n_cust,
        |       count(o_orderkey) AS n_ord
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_ord"))
        .orderBy("o_orderstatus")
    },

    // Statistical aggregates (aggregate.rs:48-75: StdDev/StdDevPop).
    QueryDef(
      "q_agg_stats",
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 4) AS sd,
        |       round(stddev_pop(l_quantity), 4) AS sdp,
        |       round(var_samp(l_quantity), 4) AS vs,
        |       round(min(l_quantity), 2) AS mn,
        |       round(max(l_quantity), 2) AS mx
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp"),
          round(var_samp(col("l_quantity")), 4).as("vs"),
          round(min("l_quantity"), 2).as("mn"),
          round(max("l_quantity"), 2).as("mx"))
        .orderBy("l_returnflag")
    },

    // First/Last (aggregate.rs:48-75) as order-deterministic min_by/max_by.
    QueryDef(
      "q_agg_firstlast",
      """SELECT c_nationkey,
        |       min_by(c_name, c_custkey) AS first_name,
        |       max_by(c_name, c_custkey) AS last_name
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_nationkey")
        .agg(min_by(col("c_name"), col("c_custkey")).as("first_name"),
          max_by(col("c_name"), col("c_custkey")).as("last_name"))
        .orderBy("c_nationkey")
    },

    // Collect (aggregate.rs:48-75) — sorted then joined to a string so the
    // comparison is order-insensitive and type-stable across engines.
    QueryDef(
      "q_agg_collect",
      """SELECT s_nationkey, string_agg(s_name, '|' ORDER BY s_name) AS names
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.supplier(s, dir)
        .groupBy("s_nationkey")
        .agg(array_join(sort_array(collect_list(col("s_name"))), "|").as("names"))
        .orderBy("s_nationkey")
    },

    // Inner equi-join chain (plan.rs:215-253) with broadcast of small dims —
    // at 100 TB the fact side streams, dims broadcast, no shuffle.
    QueryDef(
      "q_join_inner",
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_acctbal > 5000.0
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000.0)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    },

    // Left outer join (plan.rs:513-521, SPARQL OPTIONAL): customers keep a row
    // even with zero orders; count(o_orderkey) ignores the null-extended rows.
    QueryDef(
      "q_join_left",
      """SELECT c_custkey, count(o_orderkey) AS n_ord
        |FROM customer
        |LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_ord"))
        .orderBy("c_custkey")
    },

    // Semi join / EXISTS subquery (plan.rs:215-253 Semi; plan.rs:957-961).
    QueryDef(
      "q_join_semi",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
      Tables.customer(s, dir)
        .join(big, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Anti join (plan.rs:524-530, SPARQL MINUS / NOT EXISTS).
    QueryDef(
      "q_join_anti",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Full outer join (plan.rs:215-253 Full): nation sides only partially
    // overlap between suppliers and customers at small SF.
    QueryDef(
      "q_join_full",
      """SELECT s.k AS sk, c.k AS ck
        |FROM (SELECT DISTINCT s_nationkey AS k FROM supplier) s
        |FULL JOIN (SELECT DISTINCT c_nationkey AS k FROM customer) c ON s.k = c.k
        |ORDER BY sk NULLS FIRST, ck NULLS FIRST""".stripMargin) { (s, dir) =>
      val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("sk")).distinct()
      val cn = Tables.customer(s, dir).select(col("c_nationkey").as("ck")).distinct()
      sn.join(cn, col("sk") === col("ck"), "full_outer")
        .select("sk", "ck")
        .orderBy(asc_nulls_first("sk"), asc_nulls_first("ck"))
    },

    // Cross join (plan.rs:215-253 Cross).
    QueryDef(
      "q_join_cross",
      """SELECT r_name, seg
        |FROM region
        |CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
        |ORDER BY r_name NULLS FIRST, seg NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.region(s, dir).select("r_name")
        .crossJoin(Tables.customer(s, dir).select(col("c_mktsegment").as("seg")).distinct())
        .orderBy("r_name", "seg")
    },

    // Sort + Skip + Limit (plan.rs:338-380): Catalyst turns the ordered limit
    // into TakeOrderedAndProject — no full sort materialization.
    QueryDef(
      "q_sort_limit_skip",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST
        |LIMIT 10 OFFSET 5""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .offset(5)
        .limit(10)
    },

    // Distinct over a column subset (plan.rs:383-390).
    QueryDef(
      "q_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // Union bag semantics (plan.rs:506-510; UNION ALL).
    QueryDef(
      "q_union",
      """SELECT name, kind FROM (
        |  SELECT c_name AS name, 'cust' AS kind FROM customer WHERE c_nationkey = 1
        |  UNION ALL
        |  SELECT s_name AS name, 'supp' AS kind FROM supplier
        |)
        |ORDER BY name NULLS FIRST, kind NULLS FIRST""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_nationkey") === 1)
        .select(col("c_name").as("name"), lit("cust").as("kind"))
      val p = Tables.supplier(s, dir)
        .select(col("s_name").as("name"), lit("supp").as("kind"))
      c.unionByName(p).orderBy("name", "kind")
    },

    // Unwind (plan.rs:544-555): list → rows via explode.
    QueryDef(
      "q_unwind",
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word
        |      FROM documents WHERE doc_id < 50)
        |GROUP BY word
        |HAVING count(*) >= 5
        |ORDER BY cnt DESC, word NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 50)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5)
        .orderBy(desc("cnt"), asc("word"))
    },

    // IN-list predicate (plan.rs:972-1021 BinaryOp::In).
    QueryDef(
      "q_in_list",
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // Like / Regex predicates (BinaryOp::Like, ::Regex `=~`, plan.rs:1010-1016).
    QueryDef(
      "q_like_regex",
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE p_name LIKE '%a%' AND regexp_matches(p_name, '[aeiou]{2}')
        |ORDER BY p_partkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").like("%a%") && col("p_name").rlike("[aeiou]{2}"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // CountSubquery (plan.rs:963-967) via correlated count, rewritten to a
    // join+aggregate (the scalable plan — no per-row subquery execution).
    QueryDef(
      "q_count_subquery",
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_ord
        |FROM customer
        |WHERE c_nationkey = 2
        |ORDER BY c_custkey NULLS FIRST""".stripMargin) { (s, dir) =>
      val counts = Tables.orders(s, dir).groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      Tables.customer(s, dir)
        .filter(col("c_nationkey") === 2)
        .join(counts, col("o_custkey") === col("c_custkey"), "left_outer")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_ord"))
        .orderBy("c_custkey")
    },

    // String function battery (§2.4/2.5: CONCAT/UCASE/LCASE/SUBSTR/STRSTARTS/
    // STRENDS/CONTAINS/REPLACE/STRLEN — eval_function filter.rs:759-1050,
    // planner_rdf.rs:1927-2350).
    QueryDef(
      "q_string_funcs",
      """SELECT p_partkey,
        |       upper(p_brand) AS up, lower(p_type) AS lo,
        |       substr(p_name, 1, 8) AS sub,
        |       concat(p_brand, ':', p_type) AS cat,
        |       length(p_name) AS len,
        |       starts_with(p_type, 'STANDARD') AS sw,
        |       contains(p_name, 'al') AS has,
        |       replace(p_brand, '#', '-') AS rep,
        |       split_part(p_type, ' ', 1) AS before1,
        |       reverse(p_brand) AS rev
        |FROM part
        |WHERE p_partkey <= 60
        |ORDER BY p_partkey NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_partkey") <= 60)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("up"),
          lower(col("p_type")).as("lo"),
          substring(col("p_name"), 1, 8).as("sub"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
          length(col("p_name")).as("len"),
          col("p_type").startsWith("STANDARD").as("sw"),
          col("p_name").contains("al").as("has"),
          regexp_replace(col("p_brand"), "#", "-").as("rep"),
          substring_index(col("p_type"), " ", 1).as("before1"),
          reverse(col("p_brand")).as("rev"))
        .orderBy("p_partkey")
    },

    // Math function battery (§2.5: ABS/CEIL/FLOOR/ROUND + BinaryOp Pow/Mod).
    QueryDef(
      "q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_discount - 0.05), 6) AS ab,
        |       CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |       CAST(floor(l_quantity) AS BIGINT) AS fl,
        |       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS ro,
        |       round(pow(l_discount, 2.0), 6) AS pw,
        |       l_orderkey % 7 AS md,
        |       round(sqrt(l_quantity), 6) AS sq
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // decimal-exact rounding on both sides: double round(x, 1) diverges
          // between engines on 2-decimal ties (Spark HALF_UP on the exact
          // BigDecimal of the binary double vs DuckDB x*10→rint→/10)
          round(abs(col("l_discount") - 0.05), 6).as("ab"),
          ceil(col("l_quantity")).as("ce"),
          floor(col("l_quantity")).as("fl"),
          round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("ro"),
          round(pow(col("l_discount"), 2.0), 6).as("pw"),
          (col("l_orderkey") % 7).as("md"),
          round(sqrt(col("l_quantity")), 6).as("sq"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Timestamp functions over the events table.
    QueryDef(
      "q_datetime",
      """SELECT event_type,
        |       year(min(ts)) AS y0,
        |       month(min(ts)) AS m0,
        |       count(*) AS cnt,
        |       CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS d0
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          year(min(col("ts"))).as("y0"),
          month(min(col("ts"))).as("m0"),
          count(lit(1)).as("cnt"),
          min(date_trunc("day", col("ts"))).as("d0"))
        .orderBy("event_type")
    },

    // List functions (§2.4 head/last/size/reverse + IndexAccess/SliceAccess
    // plan.rs:912-925) over the embeddings array column.
    QueryDef(
      "q_list_funcs",
      """SELECT vec_id,
        |       len(embedding) AS sz,
        |       CAST(embedding[1] AS DOUBLE) AS head_v,
        |       CAST(embedding[-1] AS DOUBLE) AS last_v,
        |       array_to_string(list_transform(embedding[1:3],
        |         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS VARCHAR)), ',') AS sl
        |FROM embeddings
        |WHERE vec_id < 40
        |ORDER BY vec_id NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") < 40)
        .select(
          col("vec_id"),
          size(col("embedding")).as("sz"),
          element_at(col("embedding"), 1).cast("double").as("head_v"),
          element_at(col("embedding"), -1).cast("double").as("last_v"),
          // the oracle harness cannot hash array-typed outputs — serialize the
          // slice to a string; floor(x*1e4) of the identical widened double is
          // bit-deterministic in both engines (no float-to-string formatting)
          array_join(
            transform(slice(col("embedding"), 1, 3),
              x => floor(x.cast("double") * 10000).cast("long").cast("string")),
            ",").as("sl"))
        .orderBy("vec_id")
    },
  )
}
