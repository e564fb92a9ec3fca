package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.Tables
import graft.functions.ParseFlexTimestamp

/** Scalar-function surface (SURVEY.md §2.7): the flex timestamp parser
  * (the reference's most intricate logic), string, date/time, math, array /
  * higher-order, struct, and JSON functions. All pure per-row expressions —
  * they stay inside whole-stage codegen and scale embarrassingly. */
object Scalars {

  /** q24 — multi-format timestamp parse (REF CsvLoader.java:237-273).
    * Renders events.ts into the reference's four accepted string shapes,
    * re-parses each with [[ParseFlexTimestamp]], returns epoch millis. The
    * oracle reproduces the semantics arithmetically, including the
    * fraction-as-double-millis truncation quirk. */
  def q24(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("ts"))
      .withColumn("s_bare", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("s_frac", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .withColumn("s_iso", date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("s_zoned", concat(col("s_bare"), lit("+00")))
      .select(col("event_id"),
        ParseFlexTimestamp(col("s_bare")).as("p_bare"),
        ParseFlexTimestamp(col("s_frac")).as("p_frac"),
        ParseFlexTimestamp(col("s_iso")).as("p_iso"),
        ParseFlexTimestamp(col("s_zoned")).as("p_zoned"))
      .orderBy(col("event_id"))

  private val q24Sql =
    """WITH r AS (
      |  SELECT event_id,
      |    epoch_ms(date_trunc('second', ts)) AS sec_ms,
      |    strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS s_frac
      |  FROM events)
      |SELECT event_id,
      |  sec_ms AS p_bare,
      |  sec_ms + CAST(floor(CAST('0' || substr(s_frac, 20) AS DOUBLE) * 1000) AS BIGINT) AS p_frac,
      |  sec_ms AS p_iso,
      |  sec_ms AS p_zoned
      |FROM r ORDER BY event_id""".stripMargin

  /** q25 — string functions over documents: case, length, substring,
    * split, regexp extract/replace, LIKE. */
  def q25(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").like("%data%"))
      .select(col("doc_id"),
        upper(col("lang")).as("ulang"),
        length(col("text")).as("text_len"),
        substring(col("text"), 1, 15).as("prefix"),
        size(split(col("text"), " ")).as("n_tokens"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(substring(col("text"), 1, 20), " ", "_").as("snake"),
        concat(col("lang"), lit(":"), col("source")).as("tag"),
        trim(lower(col("source"))).as("src"))
      .orderBy(col("doc_id"))

  private val q25Sql =
    """SELECT doc_id, upper(lang) AS ulang,
      |  CAST(length(text) AS INT) AS text_len,
      |  substr(text, 1, 15) AS prefix,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
      |  regexp_replace(substr(text, 1, 20), ' ', '_', 'g') AS snake,
      |  lang || ':' || source AS tag,
      |  trim(lower(source)) AS src
      |FROM documents WHERE text LIKE '%data%' ORDER BY doc_id""".stripMargin

  /** q26 — date/time functions over orders: extract, trunc, format,
    * datediff, add_months, epoch seconds. */
  def q26(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        date_format(add_months(col("o_orderdate").cast("date"), 3), "yyyy-MM-dd").as("plus3m"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 1000").as("epoch_s"))
      .orderBy(col("o_orderkey"))

  private val q26Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
      |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
      |  epoch_ms(o_orderdate) // 1000 AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q27 — math functions over lineitem. Rounded to 4dp: libm last-bit
    * differences between JVM and DuckDB are absorbed at these magnitudes. */
  def q27(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_quantity") / 7).as("ceil_q"),
        floor(col("l_quantity") / 7).as("floor_q"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrt_p"),
        round(exp(col("l_discount")), 4).as("exp_d"),
        round(log(col("l_extendedprice")), 4).as("ln_p"),
        round(pow(col("l_quantity"), 2), 4).as("q_sq"),
        (col("l_linenumber") % 3).as("ln_mod"),
        signum(col("l_discount") - 0.05).as("sgn"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100).as("le"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q27Sql =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_discount - 0.05) AS abs_d,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
      |  CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
      |  round(sqrt(l_extendedprice), 4) AS sqrt_p,
      |  round(exp(l_discount), 4) AS exp_d,
      |  round(ln(l_extendedprice), 4) AS ln_p,
      |  round(pow(l_quantity, 2), 4) AS q_sq,
      |  l_linenumber % 3 AS ln_mod,
      |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sgn,
      |  greatest(l_quantity, l_discount * 100) AS gr,
      |  least(l_quantity, l_discount * 100) AS le
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q28 — array / higher-order functions over embeddings (the multimodal
    * vector column): size, element_at, slice, transform, aggregate (fold),
    * sort, plus named_struct + getField. Float elements are cast to double
    * before arithmetic on BOTH sides so the sequential fold is bit-equal. */
  def q28(s: SparkSession, d: String): DataFrame = {
    val dbl = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(element_at(dbl, 1), 4).as("first_val"),
        round(sqrt(aggregate(dbl, lit(0.0), (acc, x) => acc + x * x)), 4).as("l2norm"),
        round(aggregate(slice(dbl, 1, 8), lit(0.0), (acc, x) => acc + x), 4).as("head_sum"),
        round(element_at(array_sort(dbl), 1), 4).as("min_val"),
        round(element_at(array_sort(dbl), 64), 4).as("max_val"),
        named_struct(lit("label"), col("label"), lit("dim"), size(col("embedding")))
          .getField("label").as("label2"))
      .orderBy(col("vec_id"))
  }

  private val q28Sql =
    """WITH e AS (SELECT vec_id, label, embedding,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dbl
      |  FROM embeddings)
      |SELECT vec_id, label,
      |  CAST(len(embedding) AS INT) AS dim,
      |  round(dbl[1], 4) AS first_val,
      |  round(sqrt(list_aggregate(list_transform(dbl, x -> x*x), 'sum')), 4) AS l2norm,
      |  round(list_aggregate(dbl[1:8], 'sum'), 4) AS head_sum,
      |  round(list_sort(dbl)[1], 4) AS min_val,
      |  round(list_sort(dbl)[64], 4) AS max_val,
      |  struct_extract({'label': label, 'dim': CAST(len(embedding) AS INT)}, 'label') AS label2
      |FROM e ORDER BY vec_id""".stripMargin

  /** q29 — JSON extraction from the events.props string column. */
  def q29(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("k_bucket", col("k") % 10)
      .orderBy(col("event_id"))

  private val q29Sql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
      |FROM events ORDER BY event_id""".stripMargin

  /** q43 — VARIANT (Spark 4 semi-structured type): parse events.props into
    * a variant, extract typed paths. The 100 TB shape for ragged JSON —
    * binary-encoded variant beats per-query string re-parsing. Oracle uses
    * DuckDB's JSON path extraction on the same strings. */
  def q43(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        try_variant_get(col("v"), "$.k", "int").as("k"),
        try_variant_get(col("v"), "$.missing", "string").isNull.as("missing_is_null"),
        try_variant_get(col("v"), "$.k", "string").as("k_str"))
      .withColumn("missing_is_null",
        coalesce(col("missing_is_null"), lit(true)))
      .orderBy(col("event_id"))

  private val q43Sql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  json_extract(props, '$.missing') IS NULL AS missing_is_null,
      |  json_extract_string(props, '$.k') AS k_str
      |FROM events ORDER BY event_id""".stripMargin

  /** q44 — histogram via width_bucket: order-value distribution in 20
    * equal bins (map-side combinable; the OLAP histogram shape). */
  def q44(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(20)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  private val q44Sql =
    """SELECT CASE WHEN o_totalprice < 0 THEN 0
      |            WHEN o_totalprice >= 600000.0 THEN 21
      |            ELSE CAST(floor(o_totalprice / 30000.0) AS BIGINT) + 1 END AS bucket,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q45 — extended string surface: levenshtein, split_part, initcap,
    * lpad/rpad, repeat, reverse, translate, position. */
  def q45(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        levenshtein(col("lang"), lit("en")).as("lev_en"),
        split_part(col("text"), lit(" "), lit(2)).as("second_tok"),
        initcap(substring(col("text"), 1, 10)).as("cap10"),
        lpad(col("lang"), 5, "_").as("lpad5"),
        rpad(col("lang"), 5, "_").as("rpad5"),
        reverse(col("lang")).as("rev"),
        translate(col("lang"), "en", "EN").as("tr"),
        instr(col("text"), "data").cast("long").as("pos_data"))
      .orderBy(col("doc_id"))

  private val q45Sql =
    """SELECT doc_id,
      |  CAST(levenshtein(lang, 'en') AS INT) AS lev_en,
      |  split_part(text, ' ', 2) AS second_tok,
      |  CASE WHEN length(text) >= 1 THEN
      |    list_aggregate(list_transform(string_split(substr(text,1,10), ' '),
      |      w -> upper(substr(w,1,1)) || substr(w,2)), 'string_agg', ' ')
      |  ELSE '' END AS cap10,
      |  lpad(lang, 5, '_') AS lpad5,
      |  rpad(lang, 5, '_') AS rpad5,
      |  reverse(lang) AS rev,
      |  translate(lang, 'en', 'EN') AS tr,
      |  CAST(position('data' IN text) AS BIGINT) AS pos_data
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q46 — map functions over a constructed map column: map_from_arrays,
    * map_keys/values, element_at, map_filter, transform_values. */
  def q46(s: SparkSession, d: String): DataFrame = {
    val m = map_from_arrays(
      array(lit("qty"), lit("disc"), lit("tax")),
      array(col("l_quantity"), col("l_discount"), col("l_tax")))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .withColumn("m", m)
      .select(col("l_orderkey"), col("l_linenumber"),
        concat_ws(",", map_keys(col("m"))).as("ks"),
        element_at(col("m"), "qty").as("qty"),
        size(map_filter(col("m"), (_, v) => v > 0.03)).as("n_big"),
        element_at(transform_values(col("m"), (_, v) => v * 2), "disc").as("disc2"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q46Sql =
    """SELECT l_orderkey, l_linenumber,
      |  'qty,disc,tax' AS ks,
      |  l_quantity AS qty,
      |  CAST(len(list_filter([l_quantity, l_discount, l_tax], v -> v > 0.03)) AS INT) AS n_big,
      |  l_discount * 2 AS disc2
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q47 — ANSI-mode permissive arithmetic: the `try_*` family degrades
    * to null instead of failing the job (the relational analog of the
    * reference's per-record drop contract, at expression granularity).
    * One poisoned row in 100 TB must not kill the query. */
  def q47(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_discount")).as("price_per_disc"),
        try_divide(col("l_quantity"), col("l_quantity") - col("l_quantity")).as("div0_is_null"),
        try_to_timestamp(concat(lit("2024-01-"),
          lpad((col("l_linenumber") % 40).cast("string"), 2, "0"))).as("maybe_ts"),
        try_add(col("l_orderkey") + 1, lit(Long.MaxValue)).as("overflow_is_null"))
      .withColumn("maybe_ts", unix_millis(col("maybe_ts")))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q47Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_discount = 0 THEN NULL ELSE l_extendedprice / l_discount END AS price_per_disc,
      |  CAST(NULL AS DOUBLE) AS div0_is_null,
      |  epoch_ms(try_strptime('2024-01-' || lpad(CAST(l_linenumber % 40 AS VARCHAR), 2, '0'), '%Y-%m-%d')) AS maybe_ts,
      |  CAST(NULL AS BIGINT) AS overflow_is_null
      |FROM lineitem WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q24_flex_timestamp", q24, Some(q24Sql)),
    QueryDef("q25_string_funcs", q25, Some(q25Sql)),
    QueryDef("q26_date_funcs", q26, Some(q26Sql)),
    QueryDef("q27_math_funcs", q27, Some(q27Sql)),
    QueryDef("q28_array_funcs", q28, Some(q28Sql)),
    QueryDef("q29_json_funcs", q29, Some(q29Sql)),
    QueryDef("q43_variant", q43, Some(q43Sql)),
    QueryDef("q44_histogram", q44, Some(q44Sql)),
    QueryDef("q45_string_ext", q45, Some(q45Sql)),
    QueryDef("q46_map_funcs", q46, Some(q46Sql)),
    QueryDef("q47_try_funcs", q47, Some(q47Sql)))
}
