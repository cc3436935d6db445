package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources

/** Scalar function surface (SURVEY.md §2 G) — string/date/math/array
  * functions and generators, all from org.apache.spark.sql.functions
  * (whole-stage-codegen'd; no UDFs — SURVEY §2 J preference order).
  *
  * Engine-portability notes baked in:
  *  - substr is 1-based in both Spark and DuckDB;
  *  - ceil/floor return BIGINT in Spark but DOUBLE in DuckDB → cast;
  *  - year/month/day/length return INT in Spark, BIGINT in DuckDB → cast;
  *  - ln/sqrt are raw IEEE on identical inputs (sqrt exact; ln rounded
  *    to 6 dp per SURVEY §2.1.2);
  *  - round(double, n) is NOT portable (repr-based HALF_UP in JVM vs
  *    binary rounding in C) — never used on computed doubles here.
  */
object Functions {

  /** q_string_funcs: upper/lower/trim/substr/concat/length/lpad/replace/
    * regexp_extract/split+element_at over customer names.
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir)
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_up"),
        lower(col("c_name")).as("name_lo"),
        substring(col("c_name"), 10, 5).as("name_sub"),
        concat(col("c_name"), lit("_"), col("c_mktsegment")).as("name_cat"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("key_pad"),
        regexp_replace(col("c_name"), lit("Customer"), lit("C")).as("name_rep"),
        regexp_extract(col("c_name"), "(\\d+)", 1).as("name_digits"),
        element_at(split(col("c_name"), "#"), 2).as("name_after_hash"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("seg_trim"))
      .orderBy(col("c_custkey"))

  /** q_date_funcs: extraction, truncation, date arithmetic — all on naive
    * timestamps under the pinned UTC session (SURVEY §2.1.4).
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus_30d"))
      .orderBy(col("o_orderkey"))

  /** q_math_funcs: abs/ceil/floor/sqrt/ln/pow/mod. sqrt is IEEE-exact;
    * ln rounded to 6 dp; no round() on raw doubles (see object doc).
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(
        col("o_orderkey"),
        abs(col("o_orderkey") - 100000).as("key_dist"),
        ceil(col("o_totalprice")).as("price_ceil"),
        floor(col("o_totalprice")).as("price_floor"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        graft.Det.r6(log(col("o_totalprice"))).as("price_ln"),
        pow(col("o_orderkey") % 9, 2).as("key_mod_sq"),
        (col("o_orderkey") % 7).as("key_mod7"))
      .orderBy(col("o_orderkey"))

  /** q_array_funcs: size/element_at/slice over the embedding vectors —
    * the ArrayType(Float) column surface (north star). Declared outputs are
    * scalars only: float32 elements widen exactly to double (the comparator
    * cannot sort array cells, and float32 repr differs across engines);
    * the slice still exercises the operator — its elements are projected.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val head3 = slice(col("embedding"), 1, 3)
    Sources.embeddings(spark, dir)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_el"),
        element_at(col("embedding"), 64).cast("double").as("last_el"),
        element_at(head3, 2).cast("double").as("head3_2"),
        element_at(head3, 3).cast("double").as("head3_3"))
      .orderBy(col("vec_id"))
  }

  /** q_explode: generator over tokenized text — top-20 tokens corpus-wide
    * (count desc, token asc). The Generate node + partial aggregation:
    * the classic word-count shape, shuffle moves only (token, count).
    */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)

  /** q_map_funcs: parse the JSON props column into a typed map, explode,
    * aggregate per key.
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))).as(Seq("key", "value")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
           min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy(col("key"))

  /** q_text_levenshtein: edit distance against a reference key — the
    * fuzzy-matching primitive (entity resolution, near-key joins). Same
    * well-defined metric in every engine.
    */
  def levenshteinQuery(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir)
      .select(col("c_custkey"),
              levenshtein(col("c_name"), lit("Customer#000000001")).cast("long").as("dist"))
      .orderBy(col("c_custkey"))

  /** Jaro-Winkler similarity as a Column — the native codegen'd
    * expression (graft.functions.JaroWinklerSimilarity), also SQL-callable
    * as jaro_winkler(...) once GraftExtensions is installed.
    */
  def jaroWinkler(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.JaroWinklerSimilarity(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** q_text_jaro: fuzzy vocabulary matching — Jaro-Winkler over every
    * pair of DISTINCT corpus tokens at similarity ≥ 0.6. The vocabulary
    * is corpus-size-INDEPENDENT (a fixed generator lexicon), so the pair
    * set stays tiny at any SF — the operator itself (the codegen'd
    * expression, bit-identical to DuckDB's jaro_winkler_similarity over
    * this pair set) is what's under the gate, applied per-pair with no
    * all-pairs blowup risk. The filter is on the ROUNDED value.
    */
  def jaroQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    val vocab = Sources.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    // block-replicated equi-join (no BNLJ plan), pairs with tok_a < tok_b
    Scale.allPairsBlocked(vocab, "tok", blocks = 4)
      .select(col("tok_a"), col("tok_b"),
              r6(jaroWinkler(col("tok_a"), col("tok_b"))).as("jw"))
      .filter(col("jw") >= 0.6)
      .orderBy(col("tok_a"), col("tok_b"))
  }

  /** q_fuzzy_match: entity resolution against a master table — each dirty
    * probe string finds its best Jaro-Winkler match among part names (the
    * fuzzystrmatch lookup postpy users run in Postgres, relocated to the
    * cluster). The probe side is a broadcast literal frame; scoring is the
    * native codegen'd JaroWinklerSimilarity expression over one pass of
    * the master table; the argmax is max-of-struct (jw, then SMALLER key
    * wins ties via negated key) — partial-aggregable, so the match
    * reduces map-side and shuffles only |probes| rows. Ties are safe
    * cross-engine because jw is bit-identical to DuckDB's
    * jaro_winkler_similarity and the tiebreak is an integer key.
    */
  def fuzzyMatchQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    import spark.implicits._
    val probes = Seq("smal ring", "red widgit", "blu bolt", "hot gier",
                     "small gizmmo", "cold platte", "large anvill", "small ring")
      .toDF("probe")
    Sources.part(spark, dir).select(col("p_partkey"), col("p_name"))
      .crossJoin(broadcast(probes))
      .select(col("probe"), col("p_partkey"), col("p_name"),
              jaroWinkler(col("probe"), col("p_name")).as("jw"))
      .groupBy(col("probe"))
      .agg(max(struct(col("jw"), (-col("p_partkey")).as("nk"),
                      col("p_partkey"), col("p_name"))).as("best"))
      .select(col("probe"), col("best.p_partkey").as("best_key"),
              col("best.p_name").as("best_name"), r6(col("best.jw")).as("score"))
      .orderBy(col("probe"))
  }

  /** q_try_cast: ANSI-safe casting of dirty data — try_cast yields NULL
    * instead of failing the job (the 100 TB ingest posture: quarantine,
    * never crash). Both engines share TRY_CAST semantics.
    */
  def tryCastQuery(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir)
      .select(col("c_custkey"),
              expr("try_cast(substring(c_name, 10, 15) AS BIGINT)").as("name_num"),
              expr("try_cast(c_mktsegment AS DOUBLE)").as("seg_num"))
      .orderBy(col("c_custkey"))

  /** Unicode normalization as a Column — the native codegen'd expression
    * (graft.functions.UnicodeNormalize), SQL-callable as
    * unicode_normalize(s[, form]) once GraftExtensions is installed.
    */
  def unicodeNormalize(c: org.apache.spark.sql.Column, form: String = "NFC"): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(c),
        java.text.Normalizer.Form.valueOf(form)))

  /** q_text_nfc: NFC normalization over a deterministic mixed-form corpus
    * — per doc, a string whose accents arrive decomposed ('e'+U+0301),
    * precomposed (U+00E9), or absent, cycling on doc_id; the declared
    * output is (doc_id, normalized form, changed flag). Both engines
    * build the IDENTICAL input string (plain SQL concat of unicode
    * literals), so the gate proves the native expression's NFC agrees
    * with DuckDB's nfc_normalize byte-for-byte — the canonical-identity
    * premise the dedup/fingerprint family rests on. Pure codegen'd
    * column op, no shuffle at all before the output sort.
    */
  def textNfcQuery(spark: SparkSession, dir: String): DataFrame = {
    val variant = when(col("doc_id") % 4 === 0, lit("cafe\u0301 de\u0301ja\u0300"))
      .when(col("doc_id") % 4 === 1, lit("caf\u00e9 d\u00e9j\u00e0"))
      .when(col("doc_id") % 4 === 2, lit("u\u0308ber stra\u00dfe"))
      .otherwise(lit("plain ascii"))
    Sources.documents(spark, dir)
      .select(col("doc_id"),
              concat(variant, lit(" #"), (col("doc_id") % 10).cast("string")).as("s"))
      .select(col("doc_id"), col("s"), unicodeNormalize(col("s")).as("norm"))
      .select(col("doc_id"), col("norm"),
              (col("s") =!= col("norm")).cast("int").as("changed"))
      .orderBy(col("doc_id"))
  }

  /** q_sql_macro: a SQL-DEFINED FUNCTION (Spark 4 `CREATE FUNCTION …
    * RETURN <expr>`, the engine's `CREATE EXTENSION`/server-side-function
    * analogue — SURVEY §2 J) declared and then CALLED inside a gated
    * query: per-flag revenue through the macro. The analyzer INLINES the
    * function body (SqlUdfSpec pins that), so the plan is identical to
    * writing the expression in place — the oracle twin simply inlines the
    * same exact-decimal arithmetic. Proves the extension surface under
    * the hash gate, not just in unit tests.
    */
  def sqlMacroQuery(spark: SparkSession, dir: String): DataFrame = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_rev(p DOUBLE, d DOUBLE)
        |RETURNS DECIMAL(22, 4)
        |RETURN CAST(p AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))
        |""".stripMargin)
    Sources.lineitem(spark, dir).createOrReplaceTempView("sqlmacro_lineitem")
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(graft_rev(l_extendedprice, l_discount)) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM sqlmacro_lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** q_regex_extract_all: global regex extraction — all matches per
    * document (count, first, last), the log-mining/token-harvesting verb
    * (regexp_extract gets ONE match; pipelines need them all). The match
    * ARRAY stays internal (declared outputs are scalar by contract);
    * count/first/last pin its content. Pattern syntax is the
    * RE2/Java-common subset (no backreferences/lookahead), the
    * q_url_canonicalize portability rule.
    */
  def regexExtractAllQuery(spark: SparkSession, dir: String): DataFrame = {
    val ms = regexp_extract_all(col("text"), lit("[a-z]+a[a-z]*"), lit(0))
    Sources.documents(spark, dir)
      .select(col("doc_id"), ms.as("ms"))
      // get() is 0-based and NULL-safe out of range (ANSI element_at
      // throws on an empty array — a zero-match doc must yield NULLs)
      .select(col("doc_id"), size(col("ms")).cast("long").as("n_matches"),
              get(col("ms"), lit(0)).as("first_match"),
              get(col("ms"), size(col("ms")) - 1).as("last_match"))
      .orderBy(col("doc_id"))
  }
}
