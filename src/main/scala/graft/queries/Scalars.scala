package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.Tables
import Portable._

/** Scalar function families (SURVEY.md §2.B): string / date / math / array /
  * map / json, one declared query per family piped through fixture columns.
  *
  * All of these are built-in Catalyst expressions (whole-stage-codegen'd,
  * no UDFs), so each query is a single scan→project→sort: nothing here
  * shuffles except the final presentation ORDER BY.
  *
  * Cross-engine notes baked into the formulations:
  *   - DuckDB `dayofweek` is 0=Sunday, Spark's is 1=Sunday → oracle adds 1.
  *   - DuckDB `date_trunc('month', ts)` returns DATE → Spark side uses
  *     `trunc(col, "mon")` (DateType), not `date_trunc` (TimestampType).
  *   - DuckDB `epoch()` returns DOUBLE → CAST AS BIGINT (fixture timestamps
  *     have no sub-second component).
  *   - DuckDB list folds keep FLOAT accumulators unless the list is cast to
  *     DOUBLE[] first; Spark `aggregate` promotes per-element — cast makes
  *     both fold float→double exactly.
  *   - `round`/`bround` on raw doubles are NOT declared: Spark rounds via
  *     shortest-string BigDecimal, DuckDB via binary value (see Portable);
  *     they're exercised in ScalaTest instead.
  */
object Scalars {

  def stringFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select(
        $"c_custkey",
        upper($"c_mktsegment").as("seg_up"),
        lower($"c_name").as("name_lo"),
        substring($"c_name", 10, 9).as("name_num"),
        regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
        regexp_replace($"c_name", "[0-9]+", "X").as("masked"),
        concat_ws("-", $"c_mktsegment", $"c_name").as("joined"),
        lpad($"c_custkey".cast("string"), 10, "0").as("padded"),
        levenshtein($"c_name", lit("Customer#000000000")).as("lev"),
        size(split($"c_name", "#")).as("n_parts"),
        length($"c_name").as("name_len"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy($"c_custkey")
  }

  def dateFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        dayofweek($"o_orderdate").as("dow"),
        trunc($"o_orderdate", "mon").as("month_start"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("fmt"),
        datediff(lit("1998-09-02").cast("date"), $"o_orderdate").as("days_to_ref"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        date_add($"o_orderdate", 30).as("plus30"),
        last_day($"o_orderdate").as("eom"))
      .orderBy($"o_orderkey")
  }

  def mathFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .withColumn("price_cents", cents($"p_retailprice"))
      .select(
        $"p_partkey",
        abs($"price_cents" - lit(95000L)).as("abs_diff"),
        pow($"p_size", lit(2.0)).as("size_sq"),
        sqrt($"p_size").as("size_sqrt"),
        floor($"p_retailprice").cast("long").as("price_floor"),
        ceil($"p_retailprice").cast("long").as("price_ceil"),
        greatest($"p_size", lit(25)).as("size_hi"),
        least($"p_size", lit(25)).as("size_lo"),
        pmod($"p_partkey", lit(7L)).as("key_mod"))
      .orderBy($"p_partkey")
  }

  def arrayFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("first_coord"),
        array_max($"embedding").as("max_coord"),
        array_min($"embedding").as("min_coord"),
        aggregate(slice($"embedding", 1, 8), lit(0.0),
          (acc, x) => acc + x).as("sum_first8"),
        aggregate(zip_with($"embedding", $"embedding", (x, y) => x * y),
          lit(0.0), (acc, p) => acc + p).as("norm_sq"))
      .orderBy($"vec_id")
  }

  def mapFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("m", map(
        lit("et"), $"event_type",
        lit("uid"), $"user_id".cast("string")))
      .select(
        $"event_id",
        element_at($"m", "et").as("et"),
        element_at($"m", "uid").as("uid"),
        concat_ws(",", map_keys($"m")).as("ks"),
        concat_ws(",", map_values($"m")).as("vs"))
      .orderBy($"event_id")
  }

  /** explode(map) — map entries to (key, value) rows, the last open bullet
    * of the §2.B map-function row (q34 covers create_map / element_at /
    * map_keys / map_values but never exploded entries). A Generate node per
    * row with a 2-entry map: output is exactly 2× the input rows, ordered
    * totally by (event_id, k). DuckDB twin: map_entries + unnest. */
  def mapExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("m", map(
        lit("et"), $"event_type",
        lit("uid"), $"user_id".cast("string")))
      .select($"event_id", explode($"m").as(Seq("k", "v")))
      .orderBy($"event_id", $"k")
  }

  /** posexplode — positional array explosion, the last generator-family
    * variant (explode: q43 et al., explode_outer: q43/q64, explode(map):
    * q71, json_tuple: q67, custom Generator: ExtractListings). The doc_id
    * filter sits BEFORE the explode so it pushes to the scan instead of
    * multiplying then filtering. DuckDB twin: lateral unnest over the
    * index range, 1-based → 0-based. */
  def posExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
      .orderBy($"doc_id", $"pos")
  }

  /** inline(arrays_zip(...)): the array-of-structs generator — one output
    * ROW per element with the struct unpacked to columns, completing the
    * generator family (explode q33/q71, posexplode q80, json_tuple q67,
    * unpivot q79). Zips each part-name word with its 40-bit digest; the
    * DuckDB twin is parallel unnest (positional zip). Pure map-side fan-out. */
  def inlineFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .withColumn("ws", split($"p_name", " "))
      .withColumn("hs", graft.operators.TextOps.tokenHashes($"ws"))
      .select($"p_partkey", inline(arrays_zip($"ws".as("w"), $"hs".as("h"))))
      .orderBy($"p_partkey", $"w", $"h")
  }

  /** Map higher-order functions — transform_keys / transform_values /
    * map_filter / map_zip_with — the lambda family q34/q71's structural map
    * ops don't reach. DuckDB has no map-lambda surface, so the oracle
    * states the same SEMANTICS relationally: a VALUES fan-out computes each
    * key's transformed value, and kept_keys re-derives map_filter's
    * predicate as a CASE over both entries (fully general, no reliance on
    * fixture value ranges). All map work is per-row projection — zero
    * shuffle beyond the declared presentation sort. */
  def mapHofFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, dir)
      .filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_linenumber",
        cents($"l_extendedprice").as("pc"),
        $"l_quantity".cast("long").as("qty"))
      .withColumn("m1", map(lit("price"), $"pc", lit("qty"), $"qty"))
      .withColumn("m2", transform_values($"m1", (_, v) => v * 2))
      .withColumn("m3", map_filter($"m2", (_, v) => v >= 100))
      .withColumn("m4", map_zip_with($"m1", $"m2", (_, v1, v2) => v1 + v2))
    base.select(
      $"l_orderkey", $"l_linenumber",
      concat_ws(",", sort_array(map_keys($"m3"))).as("kept_keys"),
      concat_ws(",",
        sort_array(map_keys(transform_keys($"m1", (k, _) => upper(k)))))
        .as("upper_keys"),
      explode($"m4"))
      .withColumnsRenamed(Map("key" -> "k", "value" -> "v3"))
      // (l_orderkey, l_linenumber) is NOT unique in this fixture; v3 +
      // kept_keys make remaining ties fully identical rows (hash-stable).
      .orderBy($"l_orderkey", $"l_linenumber", $"k", $"v3", $"kept_keys")
  }

  def jsonFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Single parse per row: ONE from_json with a string-typed field (Jackson
    // renders a JSON number token as its literal text, exactly what
    // get_json_object('$.k') returned in the two-parse formulation this
    // replaces), then both outputs derive from the parsed struct — k_str is
    // the field, k_int its int cast. Catalyst's subexpression elimination
    // would dedup two textual copies inside one Project anyway, but deriving
    // both columns from one struct makes the single-parse shape explicit in
    // the plan rather than a codegen courtesy. On the two most expensive
    // per-row queries of the set, JSON parsing IS the cost: halving it is
    // measurable money at 100 TB.
    val schema = StructType(Seq(StructField("k", StringType)))
    Tables.events(s, dir)
      .withColumn("p", from_json($"props", schema))
      .select(
        $"event_id",
        $"p".getField("k").as("k_str"),
        $"p".getField("k").cast("int").as("k_int"))
      .orderBy($"event_id")
  }

  /** Date functions beyond q31, closing the §2.B date row exactly:
    * months_between / add_months / next_day / quarter / dayofyear /
    * weekofyear / make_date. months_between is declared on month-first
    * dates (both day 1 → exact integer months), the regime where every
    * engine agrees; the 31-day fractional regime is Spark-specific and
    * exercised in ScalaTest instead. */
  def dateExtraFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(
        $"o_orderkey",
        months_between(trunc($"o_orderdate", "mon"), lit("1992-01-01").cast("date"))
          .cast("long").as("months_since"),
        add_months($"o_orderdate", 3).as("plus3mo"),
        quarter($"o_orderdate").as("qtr"),
        dayofyear($"o_orderdate").as("doy"),
        weekofyear($"o_orderdate").as("wk"),
        next_day($"o_orderdate", "Mon").as("next_mon"),
        make_date(year($"o_orderdate"), month($"o_orderdate"), lit(1)).as("month_first"))
      .orderBy($"o_orderkey")
  }

  /** Array functions beyond q33: array_contains / array_position /
    * array_distinct / sort_array / higher-order filter & exists, over the
    * documents word list. Array-valued intermediates never leave the
    * query: outputs are scalars (joined strings / counts / booleans) so
    * the cross-engine compare stays on primitive columns. */
  def arrayExtraFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("words", split($"text", " "))
      .select(
        $"doc_id",
        array_contains($"words", "the").as("has_the"),
        array_position($"words", "the").as("pos_the"),
        array_join(slice(sort_array(array_distinct($"words")), 1, 5), ",").as("first5_alpha"),
        size(filter($"words", w => length(w) > 3)).as("n_long"),
        exists($"words", w => length(w) > 6).as("has_very_long"))
      .orderBy($"doc_id")
  }

  /** json_tuple (the Generator-based multi-field JSON extractor, distinct
    * from q35's per-path get_json_object) plus a to_json rebuild proving
    * the struct→JSON direction round-trips. */
  def jsonTupleFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id", $"props",
        json_tuple($"props", "k", "missing").as(Seq("k_str", "miss")))
      .select(
        $"event_id",
        $"k_str",
        $"miss",
        to_json(struct($"k_str".cast("int").as("k"))).as("rebuilt"))
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_fn_string" -> stringFns,
    "q31_fn_date" -> dateFns,
    "q32_fn_math" -> mathFns,
    "q33_fn_array" -> arrayFns,
    "q34_fn_map" -> mapFns,
    "q71_fn_map_explode" -> mapExplode,
    "q80_fn_posexplode" -> posExplode,
    "q86_fn_inline" -> inlineFns,
    "q95_fn_map_hof" -> mapHofFns,
    "q35_fn_json" -> jsonFns,
    "q65_fn_date_extra" -> dateExtraFns,
    "q66_fn_array_extra" -> arrayExtraFns,
    "q67_fn_json_tuple" -> jsonTupleFns
  )

  val oracles: Map[String, String] = Map(
    "q30_fn_string" ->
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS seg_up,
        |       lower(c_name) AS name_lo,
        |       substring(c_name, 10, 9) AS name_num,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       regexp_replace(c_name, '[0-9]+', 'X', 'g') AS masked,
        |       concat_ws('-', c_mktsegment, c_name) AS joined,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |       CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS lev,
        |       CAST(len(string_split(c_name, '#')) AS INT) AS n_parts,
        |       CAST(length(c_name) AS INT) AS name_len,
        |       trim('  x  ') AS trimmed
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q31_fn_date" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(day(o_orderdate) AS INT) AS dom,
        |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-09-02') AS INT) AS days_to_ref,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q32_fn_math" ->
      s"""SELECT p_partkey,
         |       abs(${centsSql("p_retailprice")} - 95000) AS abs_diff,
         |       pow(p_size, 2.0) AS size_sq,
         |       sqrt(p_size) AS size_sqrt,
         |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
         |       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
         |       CAST(greatest(p_size, 25) AS INT) AS size_hi,
         |       CAST(least(p_size, 25) AS INT) AS size_lo,
         |       p_partkey % 7 AS key_mod
         |FROM part
         |ORDER BY p_partkey""".stripMargin,
    "q33_fn_array" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS dim,
        |       embedding[1] AS first_coord,
        |       list_max(embedding) AS max_coord,
        |       list_min(embedding) AS min_coord,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), CAST(embedding[1:8] AS DOUBLE[])), (acc, x) -> acc + x) AS sum_first8,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), CAST(list_transform(embedding, x -> x * x) AS DOUBLE[])), (acc, p) -> acc + p) AS norm_sq
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "q34_fn_map" ->
      """SELECT event_id,
        |       (m['et'])[1] AS et,
        |       (m['uid'])[1] AS uid,
        |       array_to_string(map_keys(m), ',') AS ks,
        |       array_to_string(map_values(m), ',') AS vs
        |FROM (SELECT event_id,
        |             MAP {'et': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q71_fn_map_explode" ->
      """SELECT event_id, e.key AS k, e.value AS v
        |FROM (SELECT event_id,
        |             unnest(map_entries(MAP {'et': event_type, 'uid': CAST(user_id AS VARCHAR)})) AS e
        |      FROM events)
        |ORDER BY event_id, k""".stripMargin,
    "q80_fn_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS INT) AS pos, words[CAST(i AS INT)] AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS words
        |      FROM documents WHERE doc_id < 50),
        |     unnest(range(1, len(words) + 1)) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin,
    "q86_fn_inline" ->
      """SELECT p_partkey, unnest(ws) AS w, unnest(hs) AS h
        |FROM (SELECT p_partkey,
        |             string_split(p_name, ' ') AS ws,
        |             list_transform(string_split(p_name, ' '),
        |               t -> CAST(('0x' || substr(md5(t), 1, 10)) AS BIGINT)) AS hs
        |      FROM part)
        |ORDER BY p_partkey, w, h""".stripMargin,
    "q95_fn_map_hof" ->
      s"""WITH b AS (SELECT l_orderkey, l_linenumber,
         |                  ${centsSql("l_extendedprice")} AS pc,
         |                  CAST(l_quantity AS BIGINT) AS qty
         |           FROM lineitem WHERE l_orderkey < 100)
         |SELECT l_orderkey, l_linenumber,
         |       CASE WHEN 2 * pc >= 100 AND 2 * qty >= 100 THEN 'price,qty'
         |            WHEN 2 * pc >= 100 THEN 'price'
         |            WHEN 2 * qty >= 100 THEN 'qty'
         |            ELSE '' END AS kept_keys,
         |       'PRICE,QTY' AS upper_keys,
         |       k,
         |       CASE WHEN k = 'price' THEN 3 * pc ELSE 3 * qty END AS v3
         |FROM b, (VALUES ('price'), ('qty')) t(k)
         |ORDER BY l_orderkey, l_linenumber, k, v3, kept_keys""".stripMargin,
    "q35_fn_json" ->
      """SELECT event_id,
        |       props->>'$.k' AS k_str,
        |       CAST(props->>'$.k' AS INT) AS k_int
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q65_fn_date_extra" ->
      // date_diff('month', ...) counts month-boundary crossings = calendar
      // month delta, exactly Spark's months_between on two day-1 dates.
      // next_day(Mon): isodow is 1=Monday; (8 - isodow) % 7 days ahead,
      // with 0 mapped to 7 so a Monday advances a full week (strictly-after
      // semantics, like Spark).
      """SELECT o_orderkey,
        |       CAST(date_diff('month', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS months_since,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |       CAST(quarter(o_orderdate) AS INT) AS qtr,
        |       CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |       CAST(weekofyear(o_orderdate) AS INT) AS wk,
        |       CAST(o_orderdate AS DATE)
        |         + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
        |                     ELSE (8 - isodow(o_orderdate)) % 7 END AS INT) AS next_mon,
        |       make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_first
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q66_fn_array_extra" ->
      // list_position returns 0 for a missing element (same as Spark's
      // array_position); list_distinct's order is unspecified, so the
      // distinct list is always sorted before joining.
      """SELECT doc_id,
        |       list_contains(words, 'the') AS has_the,
        |       CAST(list_position(words, 'the') AS BIGINT) AS pos_the,
        |       array_to_string(list_sort(list_distinct(words))[1:5], ',') AS first5_alpha,
        |       CAST(len(list_filter(words, w -> length(w) > 3)) AS INT) AS n_long,
        |       len(list_filter(words, w -> length(w) > 6)) > 0 AS has_very_long
        |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q67_fn_json_tuple" ->
      """SELECT event_id,
        |       props->>'$.k' AS k_str,
        |       props->>'$.missing' AS miss,
        |       CAST(to_json(struct_pack(k := CAST(props->>'$.k' AS INT))) AS VARCHAR) AS rebuilt
        |FROM events
        |ORDER BY event_id""".stripMargin
  )
}
