package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Analytics

class AnalyticsSpec extends AnyFunSuite with SparkFixture {

  test("retention: cohort users sum to total users in the cohort's own week") {
    val rows = Analytics.retentionCohort(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // activity week is never before the cohort week
    assert(rows.forall(r => r.getLong(1) >= r.getLong(0)))
    // total distinct users across cohort diagonal == total users
    val diag = rows.filter(r => r.getLong(0) == r.getLong(1)).map(_.getLong(2)).sum
    val total = graft.io.Sources.events(spark, sfDir)
      .select("user_id").distinct.count()
    assert(diag === total)   // every user is active in their first week
  }

  test("funnel: monotone non-increasing step counts") {
    val r = Analytics.funnel(spark, sfDir).collect()(0)
    val (v, vc, full) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= vc && vc >= full && full >= 0)
    assert(v > 0)
  }

  test("sessionize: events conserved; session indices contiguous from 1 per user") {
    val rows = Analytics.sessionize(spark, sfDir).collect()
    val total = graft.io.Sources.events(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val idxs = ss.map(_.getLong(1)).sorted.toSeq
      assert(idxs === (1L to idxs.length.toLong))
    }
    assert(rows.forall(_.getLong(3) >= 0L))
  }

  test("event bigrams: transition count conservation and pct sums to 1") {
    val rows = Analytics.eventBigrams(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // each user with k events contributes exactly k-1 transitions
    val e = graft.io.Sources.events(spark, sfDir)
    val expected = e.count() - e.select("user_id").distinct.count()
    assert(rows.map(_.getLong(2)).sum === expected)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
  }

  test("winsorize: clipped into the segment band; ~90% of rows pass through untouched") {
    val rows = Analytics.winsorize(spark, sfDir).collect()
    val orig = graft.io.Sources.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.length === orig.size)
    val untouched = rows.count { r =>
      math.abs(r.getDouble(2) - orig(r.getLong(0))) < 1e-6
    }
    // p05/p95 clipping leaves ~90% unchanged (exact fraction depends on ties)
    assert(untouched.toDouble / rows.length > 0.85 && untouched < rows.length,
      s"$untouched of ${rows.length} untouched")
    // clipped values never exceed the original extremes' band per segment
    rows.groupBy(_.getString(1)).foreach { case (_, seg) =>
      val cs = seg.map(_.getDouble(2))
      assert(cs.max <= seg.map(r => orig(r.getLong(0))).max + 1e-9)
      assert(cs.min >= seg.map(r => orig(r.getLong(0))).min - 1e-9)
    }
  }

  test("regression: r2 in [0,1]; fit line passes through the mean point") {
    val rows = Analytics.regression(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (slope, intercept, r2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
      // OLS invariant: y_bar = slope * x_bar + intercept
      val t = r.getString(0)
      val stats = graft.io.Sources.events(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("event_type") === t)
        .selectExpr("avg(datediff(cast(ts as date), date'2024-01-01')) AS xb",
                    "avg(value) AS yb").collect()(0)
      assert(math.abs(stats.getDouble(1) - (slope * stats.getDouble(0) + intercept)) < 1e-3)
    }
  }

  test("outlier z-scores: flagged rows really deviate, both tails, small fraction") {
    val out = Analytics.outlierZscore(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(math.abs(r.getDouble(2)) > 1.7))
    val total = graft.io.Sources.customer(spark, sfDir).count()
    // Chebyshev: at most 1/1.7^2 ~ 35% of any distribution is beyond 1.7 sigma
    assert(out.length.toDouble / total <= 0.35)
  }

  test("survival: S non-increasing from <=1; users conserved; KM matches brute force") {
    val rows = Analytics.survival(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val users = graft.io.Sources.events(spark, sfDir)
      .select("user_id").distinct.count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === users)
    // S starts <= 1, never increases
    val ss = rows.map(_.getDouble(4))
    assert(ss.head <= 1.0 + 1e-9)
    ss.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9); case _ => }
    // brute-force KM from the (t, d, n) columns
    var p = 1.0
    rows.foreach { r =>
      val (d, n) = (r.getLong(1), r.getLong(3))
      if (d == n) p = 0.0 else if (d > 0) p *= (n - d).toDouble / n
      assert(math.abs(r.getDouble(4) - math.rint(p * 1e6) / 1e6) < 2e-6,
        s"t=${r.getLong(0)}: S=${r.getDouble(4)} vs brute $p")
    }
    // at-risk counts telescope: n(t) = n(t+1) + d(t) + c(t)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) === b.getLong(3) + a.getLong(1) + a.getLong(2))
      case _ =>
    }
  }

  test("rfm: buckets 1..4, cells conserve customers, cell_value conserves spend") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Analytics.rfm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 3).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4, s"bucket out of range: $r"))
    }
    val nCustWithOrders = graft.io.Sources.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(4)).sum === nCustWithOrders)
    val spend = graft.io.Sources.orders(spark, sfDir)
      .agg(sum(graft.Det.cents(col("o_totalprice")))).collect()(0).getLong(0)
    assert(math.abs(rows.map(_.getDouble(5)).sum - spend / 100.0) < 1.0)
  }

  test("cumulative uniques: monotone, ends at total distinct users, new sums to total") {
    val rows = graft.ops.Analytics.cumulativeUniques(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    val total = graft.io.Sources.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(cums.last === total)
    assert(rows.map(_.getLong(1)).sum === total)
  }

  test("attribution: users conserved across channels; attributed value equals total purchase money") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Analytics.attribution(spark, sfDir).collect()
    val totalUsers = graft.io.Sources.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === totalUsers)
    val totalPurchase = graft.io.Sources.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(graft.Det.cents(col("value")))).collect()(0).getLong(0)
    assert(math.abs(rows.map(_.getDouble(4)).sum - totalPurchase / 100.0) < 0.01)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), "buyers <= users per channel"))
  }

  test("changepoint: equals the driver-side argmax of the exact scaled CUSUM") {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.events(spark, sfDir)
      .groupBy(col("event_type"),
               datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
      .groupBy(_._1)
    val got = graft.ops.Analytics.changepoint(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getInt(1).toLong, r.getDouble(3))).toMap
    daily.foreach { case (tpe, rows) =>
      val s = rows.sortBy(_._2)
      val total = s.map(_._3).sum; val n = s.length.toLong
      var cum = 0L
      val ts = s.zipWithIndex.map { case ((_, d, x), i) =>
        cum += x; (d, n * cum - (i + 1) * total)
      }
      val best = ts.minBy { case (d, t) => (-math.abs(t), d) }
      assert(got(tpe)._1 === best._1, s"$tpe changepoint day")
      assert(math.abs(got(tpe)._2 - best._2.toDouble / n) < 1e-4)
    }
  }

  test("growth accounting: identities hold against the brute per-user week sets") {
    import org.apache.spark.sql.functions._
    val uw = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') DIV 7 AS BIGINT)").as("w"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = uw.groupBy(_._2).map { case (w, rs) => w -> rs.map(_._1).toSet }
    val byUser = uw.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
    val got = Analytics.growthAccounting(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val maxW = byWeek.keys.max
    byWeek.toSeq.sortBy(_._1).foreach { case (w, users) =>
      val (nNew, nRet, nRes, _) = got(w)
      val expNew = users.count(u => byUser(u).min == w)
      val expRet = users.count(u => byUser(u).contains(w - 1))
      assert(nNew == expNew && nRet == expRet, s"week $w new/retained")
      assert(nNew + nRet + nRes == users.size, s"week $w: active identity")
    }
    // churned(w) = active(w-1) - retained(w), weeks within observation
    (byWeek.keys.min + 1 to maxW).foreach { w =>
      val churn = got.get(w).map(_._4).getOrElse(0L)
      val prevActive = byWeek.getOrElse(w - 1, Set.empty).size
      val ret = got.get(w).map(_._2).getOrElse(0L)
      assert(churn == prevActive - ret, s"week $w: churn identity ($churn vs $prevActive-$ret)")
    }
  }

  test("dau/mau: equals the brute trailing-28 distinct sweep; dau <= mau") {
    import org.apache.spark.sql.functions._
    val days = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Analytics.dauMau(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val byDay = days.groupBy(_._2)
    assert(got.keySet == byDay.keySet)
    byDay.foreach { case (d, rs) =>
      val dau = rs.map(_._1).toSet.size.toLong
      val mau = days.filter(x => x._2 <= d && x._2 >= d - 27).map(_._1).toSet.size.toLong
      val (gd, gm, gs) = got(d)
      assert(gd == dau && gm == mau, s"day $d: ($gd,$gm) vs ($dau,$mau)")
      assert(gd <= gm && math.abs(gs - dau.toDouble / mau) < 1e-6)
    }
  }

  test("l28 histogram: equals the brute days-active census; users conserved") {
    import org.apache.spark.sql.functions._
    val days = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = days.map(_._2).min
    val per = days.filter(_._2 < d0 + 28).groupBy(_._1).map { case (u, rs) => u -> rs.length }
    val got = Analytics.l28Histogram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = per.groupBy(_._2).map { case (k, us) =>
      k.toLong -> (us.size.toLong, us.keys.sum)
    }
    assert(got == want)
    assert(got.values.map(_._1).sum == per.size, "users conserved")
  }

  test("cramers v: equals the brute contingency computation; V in [0,1]") {
    val r = Analytics.cramersV(spark, sfDir).collect()(0)
    val (n, chi2, v) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
    assert(v >= 0.0 && v <= 1.0)
    val cells = graft.io.Sources.orders(spark, sfDir)
      .groupBy("o_orderpriority", "o_orderstatus").count().collect()
      .map(row => ((row.getString(0), row.getString(1)), row.getLong(2))).toMap
    val nb = cells.values.sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val chi2b = cells.map { case ((p, s), obs) =>
      val e = rt(p) * ct(s) / nb
      (obs - e) * (obs - e) / e
    }.sum
    val vb = math.sqrt(chi2b / (nb * (math.min(rt.size, ct.size) - 1)))
    assert(n == nb.toLong)
    assert(math.abs(chi2 - chi2b) < 1e-4, s"chi2 $chi2 vs $chi2b")
    assert(math.abs(v - vb) < 1e-6, s"v $v vs $vb")
  }

  test("event regex: counts equal a brute Scala regex sweep over reconstructed paths") {
    import graft.ops.Analytics
    import org.apache.spark.sql.functions._
    val ev = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
              col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.sortBy(x => (x._2, x._3)).map(_._4).mkString(",")
    }
    val pats = Seq(
      "converted" -> "view.*purchase",
      "error_spiral" -> "error(,error){2,}",
      "error_recovery" -> "error.*purchase",
      "signup_first" -> "^signup",
      "pure_browse" -> "^view(,view)*$")
    val got = Analytics.eventRegex(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    pats.foreach { case (name, p) =>
      val re = p.r
      val hits = paths.filter { case (_, path) => re.findFirstIn(path).isDefined }
      if (hits.isEmpty) assert(!got.contains(name), s"$name: empty pattern must be absent")
      else {
        val (n, s) = got(name)
        assert(n == hits.size, s"$name: n_users $n vs ${hits.size}")
        assert(s == hits.keys.sum, s"$name: sum_uid")
      }
    }
    assert(got.keySet.subsetOf(pats.map(_._1).toSet))
  }

  test("time to convert: percentile picks match the brute sorted-delta sweep") {
    import graft.ops.Analytics
    import org.apache.spark.sql.functions._
    val ev = graft.io.Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
              unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tv = ev.filter(_._2 == "view").groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val deltas = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) => tv.get(u).filter(us >= _).map(t => (u, us, t)) }
      .groupBy(_._1).map { case (u, xs) =>
        val t = tv(u); (u, Math.floorDiv(xs.map(_._2).min - t, 1000000L))
      }.values.toSeq.sorted
    val n = deltas.length
    val r = Analytics.timeToConvert(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == deltas.min && r.getLong(4) == deltas.max)
    assert(r.getLong(2) == deltas((n + 1) / 2 - 1), "p50 pick")
    assert(r.getLong(3) == deltas((9 * n + 9) / 10 - 1), "p90 pick")
  }
}
