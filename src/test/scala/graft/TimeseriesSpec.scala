package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Timeseries

class TimeseriesSpec extends AnyFunSuite with SparkFixture {

  test("time-weighted avg: bounded by per-user min/max value; weights conserve the span") {
    val rows = Timeseries.timeWeightedAvg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bounds = graft.io.Sources.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(min("value").as("lo"), max("value").as("hi"),
           (max(unix_micros(col("ts").cast("timestamp"))) -
            min(unix_micros(col("ts").cast("timestamp")))).as("span_us"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (lo, hi, spanUs) = bounds(r.getLong(0))
      val twa = r.getDouble(3)
      assert(twa >= lo - 1e-6 && twa <= hi + 1e-6,
        s"user ${r.getLong(0)}: twa $twa outside [$lo, $hi]")
      // total seconds = the full first-to-last span, up to per-segment
      // sub-second truncation (each DIV drops < 1 s)
      val totalS = r.getLong(2)
      val n = r.getLong(1)
      assert(totalS <= spanUs / 1000000L + 1)
      assert(totalS >= spanUs / 1000000L - n)
    }
  }

  test("ohlc: low <= open/close <= high; volume conserves events") {
    val rows = Timeseries.ohlc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (open, high, low, close) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(low <= high)
      assert(open >= low && open <= high)
      assert(close >= low && close <= high)
      assert(r.getLong(6) > 0)
    }
    assert(rows.map(_.getLong(6)).sum === graft.io.Sources.events(spark, sfDir).count())
  }

  test("ohlc: single-event day has open == close == high == low") {
    val one = Timeseries.ohlc(spark, sfDir).filter(col("volume") === 1).collect()
    one.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getDouble(3) === r.getDouble(4))
      assert(r.getDouble(4) === r.getDouble(5))
    }
  }

  test("locf: spine is exactly users x 30 days; fill is monotone-knowledge") {
    val df = Timeseries.locfGapfill(spark, sfDir)
    val users = graft.io.Sources.events(spark, sfDir).select("user_id").distinct.count()
    assert(df.count() === users * 30)
    // once a value is observed, filled is never NULL again for that user
    val rows = df.collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      var seen = false
      sorted.foreach { r =>
        if (r.getInt(3) == 1) seen = true
        if (seen) assert(!r.isNullAt(2), s"user $u: NULL filled after first observation")
        else assert(r.isNullAt(2), s"user $u: non-NULL filled before first observation")
      }
    }
    // an observed day's filled value equals that day's last event value
    assert(rows.exists(_.getInt(3) == 1))
  }

  test("interval coverage: covered time bounded by sum of lengths and by islands' spans") {
    val rows = Timeseries.intervalCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sumLen = graft.io.Sources.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long") * 10000L).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val u = r.getLong(0)
      // union of intervals is never larger than their length sum (overlap
      // only shrinks), and a positive event count means positive coverage
      assert(r.getLong(2) <= sumLen(u))
      assert(r.getLong(2) > 0)
      assert(r.getLong(1) >= 1)
    }
  }

  test("interval coverage: hand-built overlap/containment/gap case") {
    import spark.implicits._
    // [0,100), [50,150) merge; [120,130) contained; [200,210) separate
    val df = Seq((1L, 1L, 0L, 100L), (1L, 2L, 50L, 100L), (1L, 3L, 120L, 10L),
                 (1L, 4L, 200L, 10L))
      .toDF("user_id", "event_id", "us", "len_us")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    import org.apache.spark.sql.expressions.Window.{unboundedPreceding, currentRow}
    val out = df
      .withColumn("end_us", col("us") + col("len_us"))
      .withColumn("prev_max_end", max(col("end_us")).over(w.rowsBetween(unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull || col("us") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(w.rowsBetween(unboundedPreceding, currentRow)))
      .groupBy("user_id", "island")
      .agg(min("us").as("s"), max("end_us").as("e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("e") - col("s")).as("cov"))
      .collect()(0)
    assert(out.getLong(1) === 2)     // two islands
    assert(out.getLong(2) === 160L)  // [0,150) + [200,210)
  }

  test("delta rank: rank 1 is the max delta per month; lag chain consistent") {
    val rows = Timeseries.deltaRank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(5))
      assert(byRank.head.getInt(5) === 1)
      // deltas are non-increasing with rank
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) >= b.getDouble(4))
        case _ =>
      }
    }
    rows.foreach(r => assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 1e-9))
  }

  test("rolling median: first day equals its own count; median inside the trailing window") {
    val rows = Timeseries.rollingMedian(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getDouble(3) === sorted.head.getLong(2).toDouble)
      sorted.indices.foreach { i =>
        val win = sorted.slice(math.max(0, i - 6), i + 1).map(_.getLong(2).toDouble)
        assert(sorted(i).getDouble(3) >= win.min - 1e-9 && sorted(i).getDouble(3) <= win.max + 1e-9)
      }
    }
  }

  test("window exclude: peers' average excludes exactly the own row") {
    val rows = graft.ops.Windows.windowExclude(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val segs = graft.io.Sources.customer(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("c_mktsegment"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
           org.apache.spark.sql.functions.sum(
             (org.apache.spark.sql.functions.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bal = graft.io.Sources.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    rows.foreach { r =>
      val (n, s) = segs(r.getString(1))
      assert(r.getLong(2) === n - 1)
      val expected = (s - bal(r.getLong(0))).toDouble / (100.0 * (n - 1))
      assert(math.abs(r.getDouble(3) - expected) < 1e-5)
    }
  }

  test("ema: equals the direct recursive EWM on a hand series; observed days only") {
    val rows = Timeseries.ema(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute adjust=True EWM per type driver-side from the same daily counts
    val daily = rows.map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    rows.foreach { r =>
      val (tpe, day) = (r.getString(0), r.getInt(1).toLong)
      val hist = daily(tpe).filter(_._2 <= day)
      val num = hist.map { case (_, d, n) => n * math.pow(0.8, (day - d).toDouble) }.sum
      val den = hist.map { case (_, d, _) => math.pow(0.8, (day - d).toDouble) }.sum
      assert(math.abs(r.getDouble(3) - num / den) < 1e-4,
        s"$tpe day $day: ${r.getDouble(3)} vs ${num / den}")
    }
    // smoothing sanity: every ema lies within the type's count range
    daily.foreach { case (tpe, h) =>
      val (lo, hi) = (h.map(_._3).min.toDouble, h.map(_._3).max.toDouble)
      rows.filter(_.getString(0) == tpe).foreach { r =>
        assert(r.getDouble(3) >= lo - 1e-6 && r.getDouble(3) <= hi + 1e-6)
      }
    }
  }

  test("interp gapfill: exact on observed days, linear between, NULL outside the known range") {
    val rows = Timeseries.interpGapfill(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1).toLong),
                 (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))))
      .toMap
    val byUser = rows.groupBy(_._1._1)
    byUser.foreach { case (_, m) =>
      val days = m.keys.map(_._2).toSeq.sorted
      assert(days.size === 30) // full spine
      val obs = m.filter(_._2._2 == 1).keys.map(_._2)
      if (obs.nonEmpty) {
        val (first, last) = (obs.min, obs.max)
        days.foreach { d =>
          val (v, o) = m((m.keys.head._1, d))
          if (d < first || d > last) {
            if (o == 0) assert(v.isEmpty, s"day $d outside [$first,$last] must be NULL")
          } else assert(v.isDefined, s"day $d inside the known range must be filled")
        }
        // linearity: for any gap day, value lies between its bracketing observations
        val obsSorted = obs.toSeq.sorted
        obsSorted.sliding(2).foreach {
          case Seq(a, b) if b > a + 1 =>
            val (va, vb) = (m((m.keys.head._1, a))._1.get, m((m.keys.head._1, b))._1.get)
            ((a + 1) until b).foreach { d =>
              val v = m((m.keys.head._1, d))._1.get
              assert(v >= math.min(va, vb) - 1e-6 && v <= math.max(va, vb) + 1e-6)
            }
          case _ => ()
        }
      }
    }
  }

  test("drawdown: equals the brute running-peak sweep per type") {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.events(spark, sfDir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = graft.ops.Timeseries.drawdown(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      var peak = 0L; var dd = 0L; var rel = 0.0
      series.foreach { c =>
        peak = math.max(peak, c)
        dd = math.max(dd, peak - c)
        rel = math.max(rel, (peak - c).toDouble / peak)
      }
      val (gp, gd, gr) = got(tpe)
      assert(gp == peak && gd == dd, s"$tpe: got ($gp,$gd) want ($peak,$dd)")
      assert(math.abs(gr - rel) < 1e-6, s"$tpe: rel $gr vs $rel")
    }
  }

  test("bollinger: ma/sd equal the brute trailing-7 sweep; breach flag agrees with the float form") {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.events(spark, sfDir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = graft.ops.Timeseries.bollinger(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2)
      series.indices.foreach { i =>
        val win = series.slice(math.max(0, i - 6), i + 1).map(_._3.toDouble)
        val n = win.length
        val ma = win.sum / n
        val sd = math.sqrt(win.map(x => (x - ma) * (x - ma)).sum / n)
        val (gm, gs, gb) = got((tpe, series(i)._2))
        assert(math.abs(gm - ma) < 1e-6, s"$tpe@${series(i)._2}: ma $gm vs $ma")
        assert(math.abs(gs - sd) < 1e-6, s"$tpe@${series(i)._2}: sd $gs vs $sd")
        val breach = series(i)._3.toDouble > ma + 2 * sd
        assert(gb == (if (breach) 1 else 0), s"$tpe@${series(i)._2}: breach $gb vs $breach")
      }
    }
  }

  test("theil sen: equals the brute pairwise-slope lower median per type") {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.events(spark, sfDir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = graft.ops.Timeseries.theilSen(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val s = rows.sortBy(_._2)
      val slopes = for {
        i <- s.indices; j <- (i + 1) until s.length
      } yield ((s(j)._3 - s(i)._3).toDouble / (s(j)._2 - s(i)._2), s(i)._2, s(j)._2)
      val sorted = slopes.sortBy(x => (x._1, x._2, x._3))
      val med = sorted(((sorted.length + 1) / 2) - 1)._1
      val (gm, gs) = got(tpe)
      assert(gm == slopes.length.toLong, s"$tpe pair count")
      assert(math.abs(gs - med) < 1e-6, s"$tpe: $gs vs $med")
    }
  }

  test("wma: equals the brute weighted sweep; only full 7-observation rows emitted") {
    import org.apache.spark.sql.functions._
    val daily = graft.io.Sources.events(spark, sfDir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = graft.ops.Timeseries.wma(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2)
      series.indices.foreach { i =>
        val key = (tpe, series(i)._2)
        if (i < 6) assert(!got.contains(key), s"$key partial window must be absent")
        else {
          // weights 7 (newest) .. 1 (oldest) over the trailing 7 observations
          val win = series.slice(i - 6, i + 1).map(_._3)
          val wma = win.zipWithIndex.map { case (x, j) => (j + 1).toLong * x }.sum / 28.0
          assert(math.abs(got(key) - wma) < 1e-6, s"$key: ${got(key)} vs $wma")
        }
      }
    }
  }

  test("seasonal index: dow in 1..7; per-type weighted mean of idx is 1") {
    val rows = graft.ops.Timeseries.seasonalIndex(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.forall(r => r._2 >= 1 && r._2 <= 7))
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      // Σ s_dow = s_tot  ⇔  Σ idx·n_dow / n_days = 1 (within round-6)
      val nDays = rs.map(_._3).sum
      val weighted = rs.map(r => r._4 * r._3).sum / nDays
      assert(math.abs(weighted - 1.0) < 1e-4, s"$tpe: weighted mean $weighted")
    }
  }

  private def dailyCensus(): Array[(String, Int, Long)] =
    graft.io.Sources.events(spark, sfDir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

  test("rsi: 14-window gain/loss sums match the brute sweep; rsi in [0,100]") {
    val got = Timeseries.rsi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.nonEmpty)
    dailyCensus().groupBy(_._1).foreach { case (tpe, rows) =>
      val s = rows.sortBy(_._2).toSeq
      val deltas = s.sliding(2).collect {
        case Seq(a, b) => (b._2, b._3 - a._3)
      }.toSeq
      deltas.sliding(14).filter(_.length == 14).foreach { w =>
        val day = w.last._1
        val sg = w.map(x => math.max(x._2, 0L)).sum
        val sl = w.map(x => math.max(-x._2, 0L)).sum
        if (sg + sl > 0) {
          val (g, l, r14) = got((tpe, day))
          assert(g == sg && l == sl, s"$tpe day $day: ($g,$l) vs ($sg,$sl)")
          assert(math.abs(r14 - 100.0 * sg / (sg + sl)) < 1e-6)
          assert(r14 >= 0.0 && r14 <= 100.0)
        } else assert(!got.contains((tpe, day)), s"$tpe day $day: flat window must be refused")
      }
    }
  }

  test("mann kendall: S equals the brute pair sweep; tau in [-1,1] with matching sign") {
    val got = Timeseries.mannKendall(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    dailyCensus().groupBy(_._1).foreach { case (tpe, rows) =>
      val s = rows.sortBy(_._2).map(_._3).toSeq
      val bruteS = (for { i <- s.indices; j <- i + 1 until s.length }
        yield java.lang.Long.signum(s(j) - s(i)).toLong).sum
      got.get(tpe).foreach { case (gs, gn, tau) =>
        assert(gs == bruteS, s"$tpe: S $gs vs $bruteS")
        assert(gn == s.length)
        assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9)
        assert(bruteS == 0L || math.signum(tau) == math.signum(bruteS.toDouble))
      }
    }
  }

  test("rolling corr: brute 14-window Pearson matches; corr in [-1,1]") {
    val census = dailyCensus()
    val tot = census.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._3).sum }
    val got = Timeseries.rollingCorr(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(got.nonEmpty)
    census.groupBy(_._1).foreach { case (tpe, rows) =>
      val s = rows.sortBy(_._2).map(r => (r._2, r._3, tot(r._2))).toSeq
      s.sliding(14).filter(_.length == 14).foreach { w =>
        val day = w.last._1
        val xs = w.map(_._2.toDouble); val ys = w.map(_._3.toDouble)
        val mx = xs.sum / 14; val my = ys.sum / 14
        val cxy = xs.indices.map(i => (xs(i) - mx) * (ys(i) - my)).sum
        val cxx = xs.map(a => (a - mx) * (a - mx)).sum
        val cyy = ys.map(a => (a - my) * (a - my)).sum
        if (cxx > 0 && cyy > 0) {
          val brute = cxy / math.sqrt(cxx * cyy)
          val g = got((tpe, day))
          assert(math.abs(g - brute) < 1e-5, s"$tpe day $day: $g vs $brute")
          assert(g >= -1.0 - 1e-9 && g <= 1.0 + 1e-9)
        } else assert(!got.contains((tpe, day)), s"$tpe day $day: flat window must be refused")
      }
    }
  }

  test("peak concurrency: brute interval sweep matches peak and earliest peak time") {
    val ev = graft.io.Sources.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Timeseries.peakConcurrency(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val deltas = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      rows.foreach { case (_, us) =>
        deltas(us) += 1L; deltas(us + 1800000000L) -= 1L
      }
      var cur = 0L; var best = Long.MinValue; var bestUs = 0L
      deltas.keys.toSeq.sorted.foreach { us =>
        cur += deltas(us)
        if (cur > best) { best = cur; bestUs = us }
      }
      val (gn, gp, gus) = got(tpe)
      assert(gn == rows.length)
      assert(gp == best, s"$tpe: peak $gp vs $best")
      assert(gus == bestUs, s"$tpe: peak_us $gus vs $bestUs")
    }
  }

  test("burn rate: window sums match the brute global daily census") {
    val daily = dailyCensus()
    val byDay = daily.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._3).sum }
    val err = daily.filter(_._1 == "error").map(r => r._2 -> r._3).toMap
    val days = byDay.keys.toSeq.sorted
    val got = Timeseries.burnRate(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    days.sliding(7).filter(_.length == 7).foreach { w =>
      val (e7, t7) = (w.map(d => err.getOrElse(d, 0L)).sum, w.map(byDay).sum)
      val (ge, gt, gb) = got(w.last)
      assert(ge == e7 && gt == t7, s"day ${w.last}: ($ge,$gt) vs ($e7,$t7)")
      assert(math.abs(gb - e7.toDouble / t7 / 0.01) < 1e-6)
    }
  }

  test("cusum: closed form equals the naive max(0, S+dev) recursion; alarm at the integer threshold") {
    // rebuild the exact integer series the query derives, run the classic
    // recursion in plain Scala, and demand bit-equality with the
    // prefix-sum/prefix-min closed form the declared plan uses
    val daily = graft.io.Sources.orders(spark, sfDir)
      .select(datediff(col("o_orderdate").cast("date"),
                       lit("1970-01-01").cast("date")).as("d"),
              graft.Det.cents(col("o_totalprice")).as("c"))
      .groupBy("d").agg(sum("c").as("x"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = daily.length.toLong
    val t = daily.map(_._2).sum
    val k = t / (20 * n); val h = t / (2 * n)
    var s = 0L
    val want = daily.map { case (d, x) =>
      s = math.max(0L, s + (n * x - t - n * k))
      d -> ((s / n, if (s > n * h) 1 else 0))
    }.toMap
    val got = graft.ops.Timeseries.cusumQuery(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2) * 100).round, r.getInt(3)))
    assert(got.length == daily.length)
    got.foreach { case (d, (spCents, alarm)) =>
      val (wSp, wAlarm) = want(d)
      assert(spCents == wSp, s"day $d: s_plus cents $spCents vs $wSp")
      assert(alarm == wAlarm, s"day $d: alarm $alarm vs $wAlarm")
    }
  }

  test("decompose: cnt == trend + seasonal + remainder within rounding; trend is the centered mean") {
    val census = dailyCensus()
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2).toSeq }
    val rows = Timeseries.decomposeDaily(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tpe, day, cnt) = (r.getString(0), r.getInt(1), r.getLong(2))
      val (tr, se, re) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(cnt.toDouble - (tr + se + re)) < 3e-6,
        s"$tpe day $day: identity violated")
      val s = census(tpe)
      val i = s.indexWhere(_._2 == day)
      val win = s.slice(i - 3, i + 4)
      assert(win.length == 7, s"$tpe day $day must have a full window")
      assert(math.abs(tr - win.map(_._3).sum / 7.0) < 1e-6)
    }
  }
}
