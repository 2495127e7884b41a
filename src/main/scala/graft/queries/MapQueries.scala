package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.catalog.Tables

/** Map-typed column surface: building maps from rows and from arrays,
  * exploding them back, lookups, filtering and folding over entries.
  * The reference's type system has no map type — this is part of the
  * semi-structured surface a training-data pipeline needs (per-document
  * term frequencies, per-user event profiles as key→count maps).
  *
  * Gate convention: the driver's hash compare cannot canonicalize map
  * cells (same as arrays), so every query RETURNS scalars/rows derived
  * from the map — exploded entries, lookups, sorted-key strings — never
  * the raw map. The DuckDB oracles re-derive the same values with plain
  * relational SQL, proving the map semantics, not just the plumbing.
  */
object MapQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Per-document term-frequency map built with higher-order functions
    * (array_distinct + filter inside transform — all codegen-friendly,
    * no UDF), then exploded back to (word, cnt) rows. The map build is a
    * NARROW projection: term counting never leaves the row, so at 100 TB
    * this is a pure scan-side operator.
    */
  val tfExplode: QueryDef = QueryDef("map_tf_explode",
    (s, dir) => {
      val words = split(col("text"), " ")
      val tf = map_from_entries(transform(array_distinct(words),
        w => struct(w.as("word"),
          size(filter(words, x => x === w)).cast("long").as("cnt"))))
      docs(s, dir).select(col("doc_id"), explode(tf).as(Seq("word", "cnt")))
        .filter(col("cnt") >= 3)
    },
    Some("""SELECT doc_id, word, COUNT(*) AS cnt
           |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           |      FROM documents)
           |GROUP BY doc_id, word HAVING COUNT(*) >= 3""".stripMargin))

  /** Per-user event profile as an event_type→count map: map_filter keeps
    * the hot entries (sorted-key string output), aggregate() folds the
    * map values to the user's event total. One shuffle to build the
    * per-user counts; the map stays inside the row after that.
    */
  val userProfile: QueryDef = QueryDef("map_user_profile",
    (s, dir) => {
      val counts = events(s, dir).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          concat_ws(",", array_sort(map_keys(
            map_filter(col("m"), (_, v) => v >= 15)))).as("hot_types"),
          aggregate(map_values(col("m")), lit(0L),
            (a: Column, x: Column) => a + x).as("n_events"))
        .filter(col("hot_types") =!= "")
    },
    Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
           |           FROM events GROUP BY 1, 2),
           |hot AS (SELECT user_id,
           |          string_agg(event_type, ',' ORDER BY event_type) AS hot_types
           |        FROM c WHERE cnt >= 15 GROUP BY user_id),
           |tot AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_events
           |        FROM c GROUP BY user_id)
           |SELECT h.user_id, h.hot_types, t.n_events
           |FROM hot h JOIN tot t ON h.user_id = t.user_id""".stripMargin))

  /** Region → (nation → customer count) map with point lookups: size()
    * for cardinality, element_at misses become NULL→0. The oracle proves
    * the lookups with conditional aggregation — same answer, no map.
    */
  val regionLookup: QueryDef = QueryDef("map_region_lookup",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      val counts = c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(count(lit(1)).as("cnt"))
      counts.groupBy("r_name")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("n_name"), col("cnt"))))).as("m"))
        .select(col("r_name"),
          size(col("m")).cast("long").as("n_nations"),
          coalesce(element_at(col("m"), "GERMANY"), lit(0L)).as("germany_custs"),
          coalesce(element_at(col("m"), "JAPAN"), lit(0L)).as("japan_custs"))
    },
    Some("""WITH c AS (SELECT r_name, n_name, COUNT(*) AS cnt
           |           FROM customer
           |           JOIN nation ON c_nationkey = n_nationkey
           |           JOIN region ON n_regionkey = r_regionkey
           |           GROUP BY r_name, n_name)
           |SELECT r_name, COUNT(*) AS n_nations,
           |  COALESCE(MAX(CASE WHEN n_name = 'GERMANY' THEN cnt END), 0) AS germany_custs,
           |  COALESCE(MAX(CASE WHEN n_name = 'JAPAN' THEN cnt END), 0) AS japan_custs
           |FROM c GROUP BY r_name""".stripMargin))

  val defs: Seq[QueryDef] = Seq(tfExplode, userProfile, regionLookup)
}
