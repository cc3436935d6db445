package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Functions, Text}

class UnicodeNormalizeSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private val cases = Seq(
    "cafe\u0301",      // decomposed e + U+0301 -> NFC composes
    "caf\u00e9",       // already NFC
    "u\u0308ber",      // combining diaeresis -> composes
    "stra\u00dfe",     // U+00DF: NFC-invariant (but NOT NFKD-invariant)
    "\u2460",          // CIRCLED DIGIT ONE: NFKC-folds to 1, NFC-invariant
    "plain ascii",
    "")

  test("NFC matches java.text.Normalizer on eval AND codegen paths") {
    val df = cases.toDF("s")
      .select(col("s"), Functions.unicodeNormalize(col("s")).as("n"))
    df.collect().foreach { r =>
      assert(r.getString(1) === Normalizer.normalize(r.getString(0), Normalizer.Form.NFC))
    }
    // force the interpreted path too (codegen off) — same results
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = cases.toDF("s")
        .select(Functions.unicodeNormalize(col("s"))).as[String].collect()
      assert(interp.toSeq === df.select("n").as[String].collect().toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("all four forms agree with the JDK; NFC is idempotent; NULL passes through") {
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val out = cases.toDF("s")
        .select(Functions.unicodeNormalize(col("s"), form)).as[String].collect()
      assert(out.toSeq === cases.map(Normalizer.normalize(_, Normalizer.Form.valueOf(form))))
    }
    val twice = cases.toDF("s")
      .select(Functions.unicodeNormalize(Functions.unicodeNormalize(col("s"))).as("n2"),
              Functions.unicodeNormalize(col("s")).as("n1"))
    twice.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
    val n = Seq[Option[String]](None).toDF("s")
      .select(Functions.unicodeNormalize(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("SQL surface: unicode_normalize registered; bad form fails loudly") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT unicode_normalize('cafe\u0301'), unicode_normalize('\u2460', 'NFKC')")
      .collect()(0)
    assert(out.getString(0) === "caf\u00e9")
    assert(out.getString(1) === "1")
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NOPE')").collect()
    }
    assert(e.getMessage.contains("NOPE") || e.getCause != null)
  }

  test("url canonicalization: fragment, port, utm chain, trailing slash — all repaired") {
    val urls = Seq(
      "HTTPS://Host.COM:443/Path/1?utm_source=a&id=2",       // ?utm first
      "https://host.com/Path/1?id=2&utm_campaign=b",          // utm last
      "https://host.com/p?utm_a=1&utm_b=2",                   // utm only
      "http://host.com:443/p#frag",                           // fragment + non-default-scheme port
      "https://HOST.com/p/",                                  // trailing slash
      "https://host.com:443",                                 // bare host:443
      "https://host.com/CaseSensitivePath")                   // path case preserved
    val out = urls.toDF("url")
      .select(Text.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    assert(out(0) === "https://host.com/Path/1?id=2")
    assert(out(1) === "https://host.com/Path/1?id=2")
    assert(out(2) === "https://host.com/p")
    assert(out(3) === "http://host.com/p")
    assert(out(4) === "https://host.com/p")
    assert(out(5) === "https://host.com")
    assert(out(6) === "https://host.com/CaseSensitivePath")
  }

  test("url dedup query: canonical groups conserve docs; keep_doc is the min") {
    val df = Text.urlCanonicalizeQuery(spark, sfDir)
    val total = graft.io.Sources.documents(spark, sfDir).count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === total)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2))) // n >= n_variants
    assert(rows.exists(_.getLong(2) > 1), "some canonical URL must collapse variants")
  }
}
