package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import Dets._

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Typed-API input row for the flatMap UDTF. */
final case class TokDoc(doc_id: Long, text: String)

/** Custom typed UDAF (SURVEY §2 I): quantity-weighted average price with an
  * exact-decimal buffer, so the partial-aggregation merge order can never
  * change the result (§7.2 rule 3). finish() divides the two exact sums as
  * doubles — a single deterministic IEEE division, mirroring the oracle's
  * CAST(SUM(..) AS DOUBLE)/CAST(SUM(..) AS DOUBLE).
  */
object WeightedAvgPrice
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {
  private def d2(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
  def zero: (JBigDecimal, JBigDecimal) = (JBigDecimal.ZERO, JBigDecimal.ZERO)
  def reduce(b: (JBigDecimal, JBigDecimal), a: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val (price, qty) = a
    (b._1.add(d2(price).multiply(d2(qty))), b._2.add(d2(qty)))
  }
  def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))
  def finish(r: (JBigDecimal, JBigDecimal)): Double =
    if (r._2.signum() == 0) Double.NaN else r._1.doubleValue() / r._2.doubleValue()
  def bufferEncoder = Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  def outputEncoder = Encoders.scalaDouble
}

/** SURVEY.md §2 category I — scalar functions + UDF/UDAF/UDTF surface.
  *
  * Scale notes: everything except the two UDFs and the typed flatMap stays
  * inside whole-stage codegen. The UDF rows exist to exercise the extension
  * surface and deliberately document the cost: a Scala UDF is a black box to
  * Catalyst (no pushdown through it, no codegen fusion) — which is why every
  * other operator in this engine uses built-in expressions instead.
  */
object FuncOps {

  val strFuncs: Op = Op(
    "str_funcs",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_type")).as("lo_type"),
          substring(col("p_name"), 1, 5).as("sub5"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
          lpad(col("p_brand"), 12, "*").as("pad_brand"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("len_name"),
          col("p_name").like("%wid%").as("has_wid"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
        .orderBy("p_partkey"),
    Some("SELECT p_partkey, upper(p_name) AS up_name, lower(p_type) AS lo_type, " +
      "substring(p_name, 1, 5) AS sub5, trim(' ' || p_name || ' ') AS trimmed, " +
      "lpad(p_brand, 12, '*') AS pad_brand, concat_ws('|', p_brand, p_type) AS brand_type, " +
      "CAST(length(p_name) AS INT) AS len_name, p_name LIKE '%wid%' AS has_wid, " +
      "regexp_extract(p_name, '([a-z]+)', 1) AS first_word " +
      "FROM part ORDER BY p_partkey"))

  /** Sticks to engine-agreed datetime functions (§7.2 rule 7): date_trunc,
    * year/month/day, datediff with explicit direction, last_day, add_months
    * (both engines clamp to month end). No day-of-week/week-of-year. */
  val dateFuncs: Op = Op(
    "date_funcs",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("mo"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"),
          last_day(col("o_orderdate")).as("eom"),
          add_months(col("o_orderdate"), 3).as("plus3m"))
        .orderBy("o_orderkey"),
    Some("SELECT o_orderkey, date_trunc('month', o_orderdate) AS mo, " +
      "CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m, " +
      "CAST(day(o_orderdate) AS INT) AS dom, " +
      "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since, " +
      "last_day(CAST(o_orderdate AS DATE)) AS eom, " +
      "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m " +
      "FROM orders ORDER BY o_orderkey"))

  /** Math on decimal-pinned values: round-on-raw-double is engine-divergent
    * (Spark rounds the shortest decimal representation, DuckDB the binary
    * value), so every round/ceil/floor here goes through an exact decimal. */
  val mathFuncs: Op = Op(
    "math_funcs",
    (s, d) => {
      val rp = d2(col("p_retailprice"))
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          round(rp, 1).cast("double").as("r1"),
          abs(col("p_size") - 25).as("abs_off"),
          ceil(rp).cast("long").as("cl"),
          floor(rp).cast("long").as("fl"),
          pow(col("p_size").cast("double"), 2.0).as("pw"),
          sqrt(col("p_size").cast("double")).as("sq"),
          log(col("p_retailprice")).cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double").as("lg"),
          greatest(rp, lit(950).cast(D12_2)).cast("double").as("gr"),
          least(rp, lit(950).cast(D12_2)).cast("double").as("le"))
        .orderBy("p_partkey")
    },
    Some("SELECT p_partkey, CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS r1, " +
      "abs(p_size - 25) AS abs_off, CAST(ceil(CAST(p_retailprice AS DECIMAL(12,2))) AS BIGINT) AS cl, " +
      "CAST(floor(CAST(p_retailprice AS DECIMAL(12,2))) AS BIGINT) AS fl, " +
      "power(CAST(p_size AS DOUBLE), 2.0) AS pw, sqrt(CAST(p_size AS DOUBLE)) AS sq, " +
      "CAST(CAST(ln(p_retailprice) AS DECIMAL(18,6)) AS DOUBLE) AS lg, " +
      "CAST(greatest(CAST(p_retailprice AS DECIMAL(12,2)), CAST(950 AS DECIMAL(12,2))) AS DOUBLE) AS gr, " +
      "CAST(least(CAST(p_retailprice AS DECIMAL(12,2)), CAST(950 AS DECIMAL(12,2))) AS DOUBLE) AS le " +
      "FROM part ORDER BY p_partkey"))

  val arrayFuncs: Op = Op(
    "array_funcs",
    (s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(words).as("n_words"),
          array_contains(words, "scan").as("has_scan"),
          // joined to a scalar string: the driver's pandas hasher cannot
          // factorize array cells (round-1 red row)
          array_join(slice(words, 1, 3), ",").as("first3"),
          size(array_distinct(words)).as("n_uniq"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_words, " +
      "list_contains(string_split(text, ' '), 'scan') AS has_scan, " +
      "array_to_string(list_slice(string_split(text, ' '), 1, 3), ',') AS first3, " +
      "CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq " +
      "FROM documents ORDER BY doc_id"))

  val jsonExtractProps: Op = Op(
    "json_extract_props",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("SELECT event_type, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k, " +
      "min(k) AS min_k, max(k) AS max_k FROM " +
      "(SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events) " +
      "GROUP BY event_type ORDER BY event_type"))

  /** Maps are unordered → built as sorted entries and emitted exploded
    * (§7.2 rule 6): per user, map(event_type→count) → (key, value) rows. */
  val mapFuncs: Op = Op(
    "map_funcs",
    (s, d) => {
      val counts = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      counts.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"), explode(col("m")))
        .withColumnRenamed("key", "event_type").withColumnRenamed("value", "cnt")
        .orderBy("user_id", "event_type")
    },
    Some("SELECT user_id, event_type, COUNT(*) AS cnt FROM events " +
      "GROUP BY user_id, event_type ORDER BY user_id, event_type"))

  val hashFuncs: Op = Op(
    "hash_funcs",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h_md5"), sha2(col("text"), 256).as("h_sha"))
        .orderBy("doc_id"),
    Some("SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha FROM documents ORDER BY doc_id"))

  val explodeWords: Op = Op(
    "explode_words",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(20),
    Some("SELECT word, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
      "GROUP BY word ORDER BY cnt DESC, word LIMIT 20"))

  /** OUTER generator semantics (round 13): `posexplode_outer` keeps the
    * parent row when its array is EMPTY (one row, null pos/token) — the
    * corner plain explode silently drops, which in a pipeline turns "doc
    * with no long tokens" into "doc that vanished". The 8-char filter
    * leaves ~20% of docs with empty arrays at every sf, so both lanes are
    * in the hash. Oracle: DuckDB unnest + generate_subscripts for the
    * non-empty lane UNION ALL the explicit null row for the empty lane. */
  val explodeOuterTokens: Op = Op(
    "explode_outer_tokens",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => length(w) >= 8).as("arr"))
        .select(col("doc_id"), posexplode_outer(col("arr")).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos").asc_nulls_first),
    Some("WITH a AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> len(w) >= 8) AS arr " +
      "FROM documents), " +
      "e AS (SELECT doc_id, CAST(generate_subscripts(arr, 1) - 1 AS INT) AS pos, " +
      "unnest(arr) AS token FROM a WHERE len(arr) > 0 " +
      "UNION ALL SELECT doc_id, NULL, NULL FROM a WHERE len(arr) = 0 OR arr IS NULL) " +
      "SELECT doc_id, pos, token FROM e ORDER BY doc_id, pos NULLS FIRST"))

  /** Scala UDF with exact-decimal internals (charge = price·(1−disc)·(1+tax));
    * scale-6 product, no rounding, emitted as double. Black box to Catalyst —
    * see object scaladoc. */
  val udfScalar: Op = Op(
    "udf_scalar",
    (s, d) => {
      val chargeOf = udf((price: Double, disc: Double, tax: Double) => {
        def p2(x: Double) = JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
        p2(price)
          .multiply(JBigDecimal.ONE.subtract(p2(disc)))
          .multiply(JBigDecimal.ONE.add(p2(tax)))
      })
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          chargeOf(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .cast("double").as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "charge")
    },
    Some("SELECT l_orderkey, l_linenumber, " +
      "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * " +
      "(1 + CAST(l_tax AS DECIMAL(3,2))) AS DOUBLE) AS charge " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber, charge"))

  val udafWeightedAvg: Op = Op(
    "udaf_weighted_avg",
    (s, d) => {
      val wavg = udaf(WeightedAvgPrice, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
        .orderBy("l_returnflag")
    },
    Some("SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS w_avg_price " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))

  /** Typed-API UDTF: Dataset[TokDoc].flatMap → (doc_id, pos, token), 1-based
    * position. Oracle zips DuckDB's positionally-aligned unnests. */
  val udtfFlatmapTokens: Op = Op(
    "udtf_flatmap_tokens",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d).select("doc_id", "text").as[TokDoc]
        .flatMap(doc => doc.text.split(' ').iterator.zipWithIndex
          .map { case (t, i) => (doc.doc_id, i + 1, t) })
        .toDF("doc_id", "pos", "token")
        .orderBy("doc_id", "pos")
    },
    Some("SELECT doc_id, CAST(unnest(generate_series(1, len(string_split(text, ' ')))) AS INT) AS pos, " +
      "unnest(string_split(text, ' ')) AS token FROM documents ORDER BY doc_id, pos"))

  /** Column profiling via unpivot (stack): per numeric lineitem column —
    * counts, null count, min/max (order statistics on raw doubles are
    * deterministic), exact-decimal mean. The data-quality scan every
    * warehouse runs after a load. */
  val profileUnpivot: Op = Op(
    "profile_unpivot",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(expr("stack(4, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, " +
          "'l_discount', l_discount, 'l_tax', l_tax) AS (col_name, v)"))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("v"))).as("n_nulls"),
          min(col("v")).as("v_min"),
          max(col("v")).as("v_max"),
          (sum(col("v").cast(Dets.D12_2)).cast("double") / count(col("v"))).as("v_mean"))
        .orderBy("col_name"),
    Some("SELECT col_name, COUNT(*) AS n_rows, COUNT(*) - COUNT(v) AS n_nulls, " +
      "min(v) AS v_min, max(v) AS v_max, " +
      "CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) / COUNT(v) AS v_mean " +
      "FROM (UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem) " +
      "ON l_quantity, l_extendedprice, l_discount, l_tax INTO NAME col_name VALUE v) " +
      "GROUP BY col_name ORDER BY col_name"))

  /** Conditional aggregation via the SQL:2003 FILTER clause — the idiomatic
    * way to compute several differently-predicated aggregates in ONE
    * two-phase hash aggregate pass (vs a self-join per predicate; at 100 TB
    * that is one scan instead of three). */
  val aggFilterClause: Op = Op(
    "agg_filter_clause",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_all"),
          expr("count(*) FILTER (WHERE o_totalprice > 150000)").as("n_big"),
          expr("sum(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'F')")
            .cast("double").as("sum_f"),
          expr("count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 150000)").as("cust_big"))
        .orderBy("o_orderpriority"),
    Some("SELECT o_orderpriority, COUNT(*) AS n_all, " +
      "COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big, " +
      "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f, " +
      "COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 150000) AS cust_big " +
      "FROM orders GROUP BY 1 ORDER BY o_orderpriority"))

  /** NULL-semantics surface: nullif / coalesce / ifnull and NULL-safe
    * predicates, over synthesized NULLs (the TPC-H-ish tables ship none).
    * Row-level, codegen'd, zero shuffles. */
  val nullFuncs: Op = Op(
    "null_funcs",
    (s, d) => {
      val nn = expr("nullif(o_orderstatus, 'O')")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          nn.as("status_or_null"),
          coalesce(nn, lit("open")).as("status_coalesced"),
          expr("ifnull(nullif(o_orderstatus, 'O'), 'open')").as("status_ifnull"),
          nn.isNull.cast("int").as("is_open"),
          (nn <=> lit("F")).cast("int").as("nullsafe_is_f"))
        .orderBy("o_orderkey")
    },
    Some("SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null, " +
      "coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_coalesced, " +
      "ifnull(nullif(o_orderstatus, 'O'), 'open') AS status_ifnull, " +
      "CAST(nullif(o_orderstatus, 'O') IS NULL AS INT) AS is_open, " +
      "CAST(nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS INT) AS nullsafe_is_f " +
      "FROM orders ORDER BY o_orderkey"))

  /** ANSI-mode-safe arithmetic: Spark 4 runs ANSI by default, so division by
    * zero and bad casts THROW unless the try_* family is used — this op is
    * the pattern a pipeline needs for dirty data (NULL through, never crash,
    * count the casualties downstream). Double division keeps IEEE parity
    * with the oracle's NULLIF spelling. */
  val safeArithmetic: Op = Op(
    "safe_arithmetic",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          expr("try_divide(CAST(o_totalprice AS DOUBLE), CAST(o_orderkey % 7 AS DOUBLE))")
            .as("price_per_bucket"),
          expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
          expr("try_cast(o_orderstatus AS INT)").as("status_num"))
        .orderBy("o_orderkey"),
    Some("SELECT o_orderkey, " +
      "CAST(o_totalprice AS DOUBLE) / NULLIF(CAST(o_orderkey % 7 AS DOUBLE), 0.0) AS price_per_bucket, " +
      "try_cast(substr(o_orderpriority, 1, 1) AS INT) AS prio_num, " +
      "try_cast(o_orderstatus AS INT) AS status_num " +
      "FROM orders ORDER BY o_orderkey"))

  /** Semi-structured ingestion through Spark's VARIANT type (4.x): the raw
    * JSON column parses ONCE into variant's binary form (`try_parse_json` —
    * malformed input degrades to null instead of failing the load; a
    * planted bad row proves the path) and fields extract with
    * `variant_get`, which at 100 TB beats per-access string re-parsing
    * (`get_json_object` re-tokenizes the text N times for N fields) and is
    * the open-table-format answer to schema-on-read columns. The oracle
    * states the same extraction relationally over the raw JSON text with a
    * validity gate — hash equality proves variant parse→extract is exactly
    * text-level JSON semantics on this data. */
  val jsonVariantExtract: Op = Op(
    "json_variant_extract",
    (s, d) => {
      val planted = s.range(1)
        .select(lit("malformed").as("event_type"), lit("{not json").as("props"))
      Tables.events(s, d).select(col("event_type"), col("props"))
        .unionByName(planted)
        .select(col("event_type"), try_parse_json(col("props")).as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          count(col("v")).as("n_parsed"),
          sum(variant_get(col("v"), "$.k", "int")).as("sum_k"),
          max(variant_get(col("v"), "$.k", "int")).as("max_k"))
        .orderBy("event_type")
    },
    Some("WITH r AS (SELECT event_type, props FROM events " +
      "UNION ALL SELECT 'malformed', '{not json'), " +
      "p AS (SELECT event_type, CASE WHEN json_valid(props) THEN props END AS v " +
      "FROM r) " +
      "SELECT event_type, COUNT(*) AS cnt, COUNT(v) AS n_parsed, " +
      "CAST(SUM(CAST(json_extract(v, '$.k') AS INT)) AS BIGINT) AS sum_k, " +
      "MAX(CAST(json_extract(v, '$.k') AS INT)) AS max_k " +
      "FROM p GROUP BY 1 ORDER BY event_type"))

  val all: Seq[Op] = Seq(strFuncs, dateFuncs, mathFuncs, arrayFuncs, jsonExtractProps, explodeOuterTokens,
    mapFuncs, hashFuncs, explodeWords, udfScalar, udafWeightedAvg, udtfFlatmapTokens,
    profileUnpivot, aggFilterClause, nullFuncs, safeArithmetic, jsonVariantExtract)
}
