package graft.queries

import graft.QueryDef
import graft.QueryDef.sameSql
import Sql._

/** Join-order stress corpus, modeled on JOBench (the reference optimizes
  * all 113 JOBench queries plan-only with imported stats,
  * `/root/reference/test/UnitTest.cs:357-381`, `/root/reference/jobench/
  * *.sql`): snowflake queries of 8-10 relations written as comma-FROM +
  * WHERE equalities, with MIN()/COUNT aggregates — the JOBench house
  * style (`/root/reference/jobench/1a.sql`).
  *
  * Every query deliberately lists its relations in a HOSTILE order: the
  * first two FROM entries share no join predicate (region r1, region r2 /
  * part p, customer c...), so a naive left-deep join in FROM order would
  * start with a cartesian product. The optimizer (predicate-driven join
  * graph + CBO join reorder, enabled in GraftSession) must re-derive a
  * connected order — JoinOrderSpec asserts the executed plans are
  * cartesian-free and that the join leaf order differs from the FROM
  * order.
  *
  * Scale posture: every join is a key equi-join; dims (region/nation/
  * supplier/part at these SFs) broadcast, the fact chain shuffles on its
  * keys, and the self-pair queries (l1×l2 on the same part/order) stay
  * linear because per-key fan-out is constant in SF.
  */
object JobenchQueries {

  /** 9 relations; FROM leads with the unconnected region pair. Customers
    * of ASIA buying heavy parts shipped by EUROPE suppliers.
    */
  val j1: QueryDef = sameSql("jobench_j1_two_regions",
    s"""SELECT MIN(p.p_name) AS pname, MIN(s.s_name) AS sname,
       |  MIN(n2.n_name) AS supp_nation, COUNT(*) AS cnt
       |FROM region r1, region r2, nation n1, nation n2, customer c,
       |     supplier s, orders o, lineitem l, part p
       |WHERE r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'
       |  AND n1.n_regionkey = r1.r_regionkey
       |  AND n2.n_regionkey = r2.r_regionkey
       |  AND c.c_nationkey = n1.n_nationkey
       |  AND s.s_nationkey = n2.n_nationkey
       |  AND o.o_custkey = c.c_custkey
       |  AND l.l_orderkey = o.o_orderkey
       |  AND l.l_suppkey = s.s_suppkey
       |  AND l.l_partkey = p.p_partkey
       |  AND p.p_type = 'ECONOMY' AND l.l_quantity > 40""".stripMargin)

  /** 8 relations with a lineitem self-pair through the shared part —
    * the same part bought in bulk from an AMERICA supplier and in small
    * lots from a supplier of any other nation. FROM leads with part ⋈̸
    * the second supplier.
    */
  val j2: QueryDef = sameSql("jobench_j2_part_pair",
    s"""SELECT MIN(p.p_name) AS pname, MIN(n1.n_name) AS nation_a,
       |  MIN(n2.n_name) AS nation_b, COUNT(*) AS cnt
       |FROM part p, supplier s2, lineitem l1, nation n1, region r,
       |     lineitem l2, supplier s1, nation n2
       |WHERE l1.l_partkey = p.p_partkey AND l2.l_partkey = p.p_partkey
       |  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
       |  AND s1.s_nationkey = n1.n_nationkey
       |  AND s2.s_nationkey = n2.n_nationkey
       |  AND n1.n_regionkey = r.r_regionkey
       |  AND n1.n_nationkey <> n2.n_nationkey
       |  AND r.r_name = 'AMERICA'
       |  AND l1.l_quantity > 40 AND l2.l_quantity < 10""".stripMargin)

  /** 8 relations, TPC-H q7-style nation pair in either direction plus a
    * brand-filtered part and the supplier region anchor.
    */
  val j3: QueryDef = sameSql("jobench_j3_nation_pair",
    s"""SELECT MIN(n1.n_name) AS supp_nation, MIN(n2.n_name) AS cust_nation,
       |  ${dsum("l.l_extendedprice * (1 - l.l_discount)", 6)} AS revenue,
       |  COUNT(*) AS cnt
       |FROM nation n1, nation n2, part p, supplier s, lineitem l,
       |     orders o, customer c, region r
       |WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
       |  AND c.c_custkey = o.o_custkey
       |  AND s.s_nationkey = n1.n_nationkey
       |  AND c.c_nationkey = n2.n_nationkey
       |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
       |  AND p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
       |  AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'""".stripMargin)

  /** 10 relations with an orders self-pair: customers holding both an
    * urgent and a low-priority order whose lines hit different part
    * classes; supplier hangs off the low-priority line.
    */
  val j4: QueryDef = sameSql("jobench_j4_order_pair",
    s"""SELECT COUNT(*) AS cnt, MIN(c.c_name) AS cname,
       |  MIN(p1.p_name) AS urgent_part, MIN(p2.p_name) AS low_part
       |FROM customer c, part p1, part p2, orders o1, lineitem l1,
       |     nation n, region r, orders o2, lineitem l2, supplier s
       |WHERE o1.o_custkey = c.c_custkey AND o2.o_custkey = c.c_custkey
       |  AND o1.o_orderpriority = '1-URGENT'
       |  AND o2.o_orderpriority = '5-LOW'
       |  AND l1.l_orderkey = o1.o_orderkey
       |  AND l2.l_orderkey = o2.o_orderkey
       |  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
       |  AND p1.p_type = 'ECONOMY' AND p2.p_type = 'PROMO'
       |  AND l2.l_suppkey = s.s_suppkey
       |  AND c.c_nationkey = n.n_nationkey
       |  AND n.n_regionkey = r.r_regionkey AND r.r_name = 'AFRICA'""".stripMargin)

  /** 10 relations, TPC-H q21-style lineitem anti-pair: finished orders
    * from AMERICA customers with an ASIA-supplied line that some OTHER
    * supplier also contributed to.
    */
  val j5: QueryDef = sameSql("jobench_j5_multi_supplier",
    s"""SELECT COUNT(*) AS cnt, MIN(s.s_name) AS sname, MIN(p.p_name) AS pname
       |FROM region rs, region rc, nation ns, supplier s, lineitem l1,
       |     orders o, customer c, nation nc, lineitem l2, part p
       |WHERE ns.n_regionkey = rs.r_regionkey
       |  AND s.s_nationkey = ns.n_nationkey
       |  AND l1.l_suppkey = s.s_suppkey
       |  AND o.o_orderkey = l1.l_orderkey
       |  AND c.c_custkey = o.o_custkey
       |  AND nc.n_nationkey = c.c_nationkey
       |  AND rc.r_regionkey = nc.n_regionkey
       |  AND l2.l_orderkey = o.o_orderkey
       |  AND l2.l_suppkey <> l1.l_suppkey
       |  AND p.p_partkey = l1.l_partkey
       |  AND rs.r_name = 'ASIA' AND rc.r_name = 'AMERICA'
       |  AND o.o_orderstatus = 'F' AND p.p_size > 40""".stripMargin)

  /** 9 relations across heterogeneous sources: the clickstream (events)
    * joined into the commerce snowflake — high-value clickers' order
    * lines from EUROPE customers, small parts only. FROM leads with
    * events ⋈̸ part.
    */
  val j6: QueryDef = sameSql("jobench_j6_clickstream",
    s"""SELECT COUNT(*) AS cnt, MIN(c.c_name) AS cname, MIN(p.p_name) AS pname
       |FROM events e, part p, customer c, orders o, lineitem l,
       |     nation n, region r, supplier s, nation ns
       |WHERE e.user_id = c.c_custkey
       |  AND e.event_type = 'click' AND e.value > 90
       |  AND o.o_custkey = c.c_custkey
       |  AND l.l_orderkey = o.o_orderkey
       |  AND l.l_partkey = p.p_partkey
       |  AND l.l_suppkey = s.s_suppkey
       |  AND s.s_nationkey = ns.n_nationkey
       |  AND c.c_nationkey = n.n_nationkey
       |  AND n.n_regionkey = r.r_regionkey
       |  AND r.r_name = 'EUROPE' AND p.p_size < 10""".stripMargin)

  /** 9 relations with a CYCLE in the join graph: supplier nation =
    * customer nation (n1 = n2) closes a loop the reorderer must not
    * turn into a cartesian corner. FROM leads with part ⋈̸ customer.
    */
  val j7: QueryDef = sameSql("jobench_j7_same_nation",
    """SELECT COUNT(*) AS cnt, MIN(n1.n_name) AS nname, MIN(p.p_name) AS pname
      |FROM part p, customer c, lineitem l, supplier s, orders o,
      |     nation n1, nation n2, region r1, region r2
      |WHERE l.l_partkey = p.p_partkey
      |  AND l.l_suppkey = s.s_suppkey
      |  AND l.l_orderkey = o.o_orderkey
      |  AND o.o_custkey = c.c_custkey
      |  AND s.s_nationkey = n1.n_nationkey
      |  AND c.c_nationkey = n2.n_nationkey
      |  AND n1.n_nationkey = n2.n_nationkey
      |  AND n1.n_regionkey = r1.r_regionkey
      |  AND n2.n_regionkey = r2.r_regionkey
      |  AND r1.r_name = 'ASIA' AND r2.r_name = 'ASIA'
      |  AND p.p_size > 30""".stripMargin)

  /** 12 relations — the largest stress: clickstream gate + part
    * self-pair (two lineitems, two orders) + both endpoint snowflakes
    * (customer→nation→region and second-supplier→nation→region). FROM
    * leads with region ⋈̸ events.
    */
  val j8: QueryDef = sameSql("jobench_j8_twelve_rel",
    """SELECT COUNT(*) AS cnt, MIN(c.c_name) AS cname, MIN(s.s_name) AS sname
      |FROM region r, events e, part p, supplier s, customer c, orders o,
      |     lineitem l1, lineitem l2, nation nc, nation ns, region rs,
      |     orders o2
      |WHERE e.user_id = c.c_custkey
      |  AND e.event_type = 'purchase' AND e.value > 80
      |  AND o.o_custkey = c.c_custkey
      |  AND l1.l_orderkey = o.o_orderkey
      |  AND l1.l_partkey = p.p_partkey
      |  AND l2.l_partkey = p.p_partkey
      |  AND l2.l_orderkey <> l1.l_orderkey
      |  AND o2.o_orderkey = l2.l_orderkey AND o2.o_orderstatus = 'F'
      |  AND s.s_suppkey = l2.l_suppkey
      |  AND ns.n_nationkey = s.s_nationkey
      |  AND rs.r_regionkey = ns.n_regionkey AND rs.r_name = 'ASIA'
      |  AND nc.n_nationkey = c.c_nationkey
      |  AND r.r_regionkey = nc.n_regionkey AND r.r_name = 'EUROPE'
      |  AND p.p_size < 5""".stripMargin)

  /** 9 relations, PURE CHAIN r1→n1→s→l→o→c→n2→r2 (+part): the shape
    * where greedy left-deep orderings pay the most. FROM leads with the
    * far region ⋈̸ lineitem.
    */
  val j9: QueryDef = sameSql("jobench_j9_chain",
    """SELECT COUNT(*) AS cnt, MIN(p.p_name) AS pname, MIN(c.c_name) AS cname
      |FROM region r2, lineitem l, part p, region r1, nation n1,
      |     supplier s, orders o, customer c, nation n2
      |WHERE n1.n_regionkey = r1.r_regionkey
      |  AND s.s_nationkey = n1.n_nationkey
      |  AND l.l_suppkey = s.s_suppkey
      |  AND o.o_orderkey = l.l_orderkey
      |  AND c.c_custkey = o.o_custkey
      |  AND n2.n_nationkey = c.c_nationkey
      |  AND n2.n_regionkey = r2.r_regionkey
      |  AND p.p_partkey = l.l_partkey
      |  AND r1.r_name = 'ASIA' AND r2.r_name = 'AFRICA'
      |  AND l.l_quantity > 20""".stripMargin)

  /** 10 relations, star on lineitem with BOTH dim arms expanded to
    * 2-level snowflakes plus an events gate on the customer. FROM leads
    * with customer ⋈̸ part.
    */
  val j10: QueryDef = sameSql("jobench_j10_double_snowflake",
    """SELECT COUNT(*) AS cnt, MIN(s.s_name) AS sname, MIN(c.c_name) AS cname
      |FROM customer c, part p, lineitem l, supplier s, nation ns,
      |     region rs, orders o, nation nc, region rc, events e
      |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
      |  AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND s.s_nationkey = ns.n_nationkey
      |  AND ns.n_regionkey = rs.r_regionkey
      |  AND c.c_nationkey = nc.n_nationkey
      |  AND nc.n_regionkey = rc.r_regionkey
      |  AND e.user_id = c.c_custkey AND e.event_type = 'view'
      |  AND p.p_type = 'STANDARD'
      |  AND rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE'""".stripMargin)

  /** 8 relations with an EVENTS self-pair: users whose click preceded a
    * higher-value purchase, joined into their order lines. The pair
    * carries two theta predicates (value <, ts <) on top of the user
    * equi-key. FROM leads with the purchase events ⋈̸ part.
    */
  val j11: QueryDef = sameSql("jobench_j11_event_pair",
    """SELECT COUNT(*) AS cnt, MIN(c.c_name) AS cname, MIN(p.p_name) AS pname
      |FROM events e2, part p, events e1, customer c, orders o,
      |     lineitem l, nation n, region r
      |WHERE e1.user_id = c.c_custkey AND e2.user_id = c.c_custkey
      |  AND e1.event_type = 'click' AND e2.event_type = 'purchase'
      |  AND e1.value < e2.value AND e1.ts < e2.ts
      |  AND o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey
      |  AND l.l_partkey = p.p_partkey AND c.c_nationkey = n.n_nationkey
      |  AND n.n_regionkey = r.r_regionkey
      |  AND r.r_name = 'AMERICA' AND p.p_size > 45""".stripMargin)

  /** 7 relations, TRIPLE lineitem self-join through the shared part with
    * ordered orderkeys — cardinality estimation stress: the optimizer
    * must see that each quantity band cuts the per-part fan-out before
    * multiplying three copies. Per-part band sizes are SF-constant
    * (lineitem/part ratio is fixed), so the triple stays linear at
    * scale. FROM leads with l3 ⋈̸ o1 (o1 anchors l1, not l3).
    */
  val j12: QueryDef = sameSql("jobench_j12_triple_self",
    """SELECT COUNT(*) AS cnt, MIN(p.p_name) AS pname, MIN(n.n_name) AS nname
      |FROM lineitem l3, orders o1, part p, lineitem l1, lineitem l2,
      |     supplier s, nation n
      |WHERE l1.l_partkey = p.p_partkey AND l2.l_partkey = p.p_partkey
      |  AND l3.l_partkey = p.p_partkey
      |  AND l1.l_orderkey < l2.l_orderkey
      |  AND l2.l_orderkey < l3.l_orderkey
      |  AND l1.l_quantity < 5 AND l2.l_quantity > 45
      |  AND l3.l_quantity BETWEEN 20 AND 25
      |  AND o1.o_orderkey = l1.l_orderkey AND o1.o_orderstatus = 'O'
      |  AND s.s_suppkey = l3.l_suppkey
      |  AND n.n_nationkey = s.s_nationkey""".stripMargin)

  /** 8 relations, BUSHY-forcing customer pair: a rich and an overdrawn
    * customer of the same nation whose orders share a priority — the two
    * customer subtrees must each be built before the pair join, a shape
    * left-deep-only enumerators mishandle. Both acctbal slivers are
    * SF-constant selectivity. FROM leads with c2 ⋈̸ lineitem.
    */
  val j13: QueryDef = sameSql("jobench_j13_customer_pair",
    """SELECT COUNT(*) AS cnt, MIN(c1.c_name) AS rich_cust,
      |  MIN(c2.c_name) AS poor_cust, MIN(p.p_name) AS pname
      |FROM customer c2, lineitem l, customer c1, nation n, region r,
      |     orders o1, orders o2, part p
      |WHERE c1.c_nationkey = n.n_nationkey
      |  AND c2.c_nationkey = n.n_nationkey
      |  AND c1.c_custkey <> c2.c_custkey
      |  AND c1.c_acctbal > 9000 AND c2.c_acctbal < -500
      |  AND o1.o_custkey = c1.c_custkey AND o2.o_custkey = c2.c_custkey
      |  AND o1.o_orderpriority = o2.o_orderpriority
      |  AND l.l_orderkey = o1.o_orderkey AND l.l_partkey = p.p_partkey
      |  AND n.n_regionkey = r.r_regionkey AND p.p_size > 25""".stripMargin)

  /** 9 relations, DIAMOND with a key-equality cycle: supplier nation and
    * customer nation must land in the SAME region (r1 = r2 by key), so
    * the join graph has a cycle through two region copies. FROM leads
    * with the supplier nation ⋈̸ orders.
    */
  val j14: QueryDef = sameSql("jobench_j14_diamond_cycle",
    """SELECT COUNT(*) AS cnt, MIN(s.s_name) AS sname, MIN(c.c_name) AS cname
      |FROM nation ns, orders o, part p, lineitem l, supplier s,
      |     customer c, nation nc, region r1, region r2
      |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
      |  AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND s.s_nationkey = ns.n_nationkey
      |  AND c.c_nationkey = nc.n_nationkey
      |  AND ns.n_regionkey = r1.r_regionkey
      |  AND nc.n_regionkey = r2.r_regionkey
      |  AND r1.r_regionkey = r2.r_regionkey
      |  AND r1.r_name = 'EUROPE'
      |  AND p.p_type = 'LARGE'
      |  AND o.o_orderpriority = '1-URGENT'""".stripMargin)

  /** 10 relations: SAME-REGION supplier pair both supplying one large
    * part (the sibling of j2's cross-nation pair — the connector runs
    * through two nation hops and a shared region key), anchored to the
    * first line's order and customer. FROM leads with s2 ⋈̸ orders.
    */
  val j15: QueryDef = sameSql("jobench_j15_coregion_suppliers",
    """SELECT COUNT(*) AS cnt, MIN(s1.s_name) AS supp_a,
      |  MIN(s2.s_name) AS supp_b, MIN(p.p_name) AS pname
      |FROM supplier s2, orders o1, part p, lineitem l1, lineitem l2,
      |     supplier s1, nation n1, nation n2, region r, customer c
      |WHERE l1.l_partkey = p.p_partkey AND l2.l_partkey = p.p_partkey
      |  AND l1.l_suppkey = s1.s_suppkey AND l2.l_suppkey = s2.s_suppkey
      |  AND s1.s_nationkey = n1.n_nationkey
      |  AND s2.s_nationkey = n2.n_nationkey
      |  AND n1.n_regionkey = n2.n_regionkey
      |  AND s1.s_suppkey < s2.s_suppkey
      |  AND n1.n_regionkey = r.r_regionkey
      |  AND r.r_name = 'EUROPE'
      |  AND o1.o_orderkey = l1.l_orderkey
      |  AND c.c_custkey = o1.o_custkey AND p.p_size > 40""".stripMargin)

  /** 11 relations: clickstream gate + low-priority order lines with both
    * endpoint snowflakes + a SECOND finished order per customer — chain,
    * star, and pair in one graph. FROM leads with the customer region ⋈̸
    * part.
    */
  val j16: QueryDef = sameSql("jobench_j16_mega",
    """SELECT COUNT(*) AS cnt, MIN(c.c_name) AS cname, MIN(p.p_name) AS pname
      |FROM region rc, part p, events e, customer c, orders o, lineitem l,
      |     supplier s, nation ns, region rs, nation nc, orders o2
      |WHERE e.user_id = c.c_custkey
      |  AND e.event_type = 'click' AND e.value > 50
      |  AND o.o_custkey = c.c_custkey AND o.o_orderpriority = '5-LOW'
      |  AND l.l_orderkey = o.o_orderkey AND l.l_partkey = p.p_partkey
      |  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = ns.n_nationkey
      |  AND ns.n_regionkey = rs.r_regionkey AND rs.r_name = 'ASIA'
      |  AND c.c_nationkey = nc.n_nationkey
      |  AND nc.n_regionkey = rc.r_regionkey AND rc.r_name = 'AFRICA'
      |  AND o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
      |  AND o2.o_orderkey <> o.o_orderkey
      |  AND p.p_size < 30""".stripMargin)

  val defs: Seq[QueryDef] = Seq(j1, j2, j3, j4, j5, j6, j7, j8,
    j9, j10, j11, j12, j13, j14, j15, j16)
}
