package graft

import org.scalacheck.Gen

import graft.query.QueryLanguage
import graft.pipeline.Dedup

/** Property-based checks (SURVEY §5): parser totality over generated
  * inputs, nearest-rank agreement with a naive model, minhash estimate
  * bounds, and wire-format round-trips under random events. Raw
  * ScalaCheck generators driven by a sampling loop (no scalatest
  * bridge in the offline cache). */
class PropertySpec extends SparkSpec {

  private def forAllN[A](gen: Gen[A], n: Int = 50)(f: A => Unit): Unit = {
    var i = 0
    var seed = org.scalacheck.rng.Seed(42L)
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("query parser: parse-or-ParseException, never other exceptions") {
    val junk = Gen.listOfN(12, Gen.frequency(
      (4, Gen.alphaNumChar), (2, Gen.oneOf(' ', '=', '<', '>', '~', '"')),
      (1, Gen.oneOf('(', ')', '.', '-', '%')))).map(_.mkString)
    forAllN(junk, 300) { s =>
      try { QueryLanguage.parse(s); () }
      catch {
        case _: QueryLanguage.ParseException => ()
        case other: Throwable =>
          fail(s"non-ParseException ${other.getClass.getName} for input: $s")
      }
    }
  }

  test("query parser round-trips well-formed comparisons") {
    val gen = for {
      f <- Gen.oneOf("host", "service", "metric", "ttl", "custom_attr")
      o <- Gen.oneOf("=", "!=", "<", ">", "<=", ">=")
      v <- Gen.chooseNum(-1000000L, 1000000L)
    } yield (f, o, v)
    forAllN(gen, 100) { case (f, o, v) =>
      QueryLanguage.parse(s"$f $o $v") match {
        case QueryLanguage.Cmp(`o`, QueryLanguage.FieldRef(`f`),
          QueryLanguage.LongLit(`v`)) => ()
        case QueryLanguage.Cmp(`o`, QueryLanguage.FieldRef(`f`),
          QueryLanguage.DoubleLit(d)) if d == v.toDouble && v < 0 => ()
        case other => fail(s"unexpected AST for '$f $o $v': $other")
      }
    }
  }

  test("nearest-rank percentile matches the naive sorted-list model") {
    import org.apache.spark.sql.functions._
    val gen = for {
      ms <- Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
      p <- Gen.oneOf(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    } yield (ms, p)
    forAllN(gen, 15) { case (ms, p) =>
      val sorted = ms.sorted
      // folds.clj:16-49: element at min(floor(p*n), n-1)
      val want = sorted(math.min(math.floor(p * ms.size).toInt, ms.size - 1))
      val df = events(ms.zipWithIndex.map { case (m, i) =>
        E(id = i + 1, metric = m) }: _*)
      val got = df.agg(graft.functions.Folds.nearestRank(col("metric"), p))
        .collect().head.getDouble(0)
      assert(got == want, s"p=$p over $ms")
    }
  }

  test("minhash estimate is 1 for identical docs") {
    val doc = Gen.listOfN(25, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta")).map(_.mkString(" "))
    forAllN(doc, 5) { text =>
      val spark0 = spark
      import spark0.implicits._
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val pairs = Dedup.minhashPairs(docs, 16, 4, 0.0).collect()
      assert(pairs.length == 1)
      assert(pairs.head.getAs[Double]("est_jaccard") == 1.0)
    }
  }

  test("rateExpiring matches an independent per-bucket model (rate-expiration)") {
    // model: per key, bucket the events; each bucket emits rate =
    // sum/interval with the newest event's ttl, then zero-rate fills at
    // every interval tick strictly before BOTH the next observed bucket
    // and the ttl lapse (decayed ttl must stay > 0); null ttl fills
    // interior gaps only
    val caseGen = for {
      s <- Gen.oneOf(1L, 2L, 5L)
      n <- Gen.chooseNum(1, 12)
      evs <- Gen.listOfN(n, for {
        host <- Gen.oneOf("a", "b")
        t <- Gen.chooseNum(0L, 30L)
        m <- Gen.chooseNum(-5, 20)
        ttl <- Gen.option(Gen.chooseNum(1, 8).map(_.toDouble))
      } yield (host, t, m.toDouble, ttl))
    } yield (s, evs)
    forAllN(caseGen, 30) { case (s, evs) =>
      val df = events(evs.zipWithIndex.map { case ((h, t, m, ttl), i) =>
        E(id = i + 1, host = h, metric = m, time = t,
          ttl = ttl.map(Double.box).orNull)
      }: _*)
      val got = graft.operators.Windows.rateExpiring(df, s, Seq("host"))
        .select("host", "window_start", "rate", "ttl").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      val expected = evs.zipWithIndex
        .map { case ((h, t, m, ttl), i) => (h, t, m, ttl, i + 1L) }
        .groupBy(_._1).flatMap { case (h, es) =>
        val buckets = es.groupBy { case (_, t, _, _, _) => t - t % s }
          .toSeq.sortBy(_._1)
        buckets.zipWithIndex.flatMap { case ((ws, bes), bi) =>
          val sum = bes.map(_._3).sum
          // ttl of the newest event in the bucket, event_id tie-break —
          // mirrors max_by(ttl, struct(time_s, event_id))
          val carryTtl = bes.maxBy { case (_, t, _, _, id) => (t, id) }._4
          val next = buckets.lift(bi + 1).map(_._1)
          val live = (h, ws, sum / s, carryTtl)
          val fills = Iterator.iterate(ws + s)(_ + s)
            .takeWhile { f =>
              next.forall(f < _) &&
                (carryTtl match {
                  case Some(ttl) => ttl - (f - ws) > 0
                  case None => next.isDefined
                })
            }
            .map(f => (h, f, 0.0, carryTtl.map(_ - (f - ws))))
            .toSeq
          live +: fills
        }
      }.toSet
      assert(got == expected,
        s"interval=$s events=$evs\n got=$got\n exp=$expected")
    }
  }

  test("fillIn matches the dense-span model under random events") {
    val caseGen = for {
      s <- Gen.oneOf(1L, 3L)
      n <- Gen.chooseNum(1, 15)
      evs <- Gen.listOfN(n, for {
        host <- Gen.oneOf("a", "b")
        t <- Gen.chooseNum(0L, 40L)
        m <- Gen.chooseNum(-5, 20)
      } yield (host, t, m.toDouble))
    } yield (s, evs)
    forAllN(caseGen, 25) { case (s, evs) =>
      val df = events(evs.zipWithIndex.map { case ((h, t, m), i) =>
        E(id = i + 1, host = h, metric = m, time = t)
      }: _*)
      val got = graft.operators.Windows.fillIn(df, s, Seq("host"), 0.0)
        .select("host", "window_start", "n_events", "sum_metric").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val expected = evs.groupBy(_._1).flatMap { case (h, es) =>
        val byB = es.groupBy { case (_, t, _) => t - t % s }
        val (w0, w1) = (byB.keys.min, byB.keys.max)
        (w0 to w1 by s).map { ws =>
          byB.get(ws) match {
            case Some(bs) => (h, ws, bs.size.toLong, bs.map(_._3).sum)
            case None => (h, ws, 0L, 0.0)
          }
        }
      }.toSet
      assert(got == expected, s"interval=$s events=$evs")
    }
  }

  test("interpolateConstant matches the carry-forward model under random events") {
    val caseGen = for {
      n <- Gen.chooseNum(1, 12)
      evs <- Gen.listOfN(n, for {
        t <- Gen.chooseNum(0L, 25L)
        m <- Gen.chooseNum(0, 9)
        expired <- Gen.prob(0.3)
      } yield (t, m.toDouble, if (expired) "expired" else "ok"))
    } yield evs
    forAllN(caseGen, 25) { case evs =>
      val df = events(evs.zipWithIndex.map { case ((t, m, st), i) =>
        E(id = i + 1, host = "h", state = st, metric = m, time = t)
      }: _*)
      val s = 2L
      val got = graft.operators.Windows.interpolateConstant(df, s, Seq("host"))
        .select("window_start", "metric", "state", "n_events").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getLong(3))).toSet
      val withIds = evs.zipWithIndex.map { case ((t, m, st), i) =>
        (t, m, st, i + 1L) }
      val byB = withIds.groupBy { case (t, _, _, _) => t - t % s }
      val (w0, w1) = (byB.keys.min, byB.keys.max)
      val expected = (w0 to w1 by s).flatMap { ws =>
        // newest event at or before this tick carries
        val carry = withIds.filter { case (t, _, _, _) => t - t % s <= ws }
          .maxBy { case (t, _, _, id) => (t, id) }
        val observed = byB.get(ws)
        if (observed.isEmpty && carry._3 == "expired") None
        else Some((ws, carry._2, carry._3,
          observed.map(_.size.toLong).getOrElse(0L)))
      }.toSet
      assert(got == expected, s"events=$evs\n got=$got\n exp=$expected")
    }
  }

  test("protobuf wire format round-trips arbitrary events") {
    import graft.sources.RiemannProtobuf
    val eventGen = for {
      host <- Gen.alphaNumStr
      service <- Gen.alphaNumStr
      metric <- Gen.option(Gen.chooseNum(-1e6, 1e6))
      t <- Gen.option(Gen.chooseNum(0L, 2000000000L))
      ttl <- Gen.option(Gen.chooseNum(0, 100000))
      tags <- Gen.listOfN(3, Gen.alphaNumStr)
    } yield RiemannProtobuf.PEvent(host, service, "ok", null, metric, tags,
      t, ttl.map(v => v.toFloat.toDouble), Map("k" -> "v"))
    forAllN(Gen.listOfN(4, eventGen), 100) { es =>
      val got = RiemannProtobuf.decodeMsg(RiemannProtobuf.encodeMsg(es))
      assert(got == es)
    }
  }

  test("segmentDedup matches a first-wins Scala model under random corpora") {
    import graft.pipeline.Curation
    // small word vocabulary forces heavy cross-document segment reuse
    val docGen = Gen.chooseNum(5, 35).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, docGen))
    forAllN(corpusGen, 8) { texts =>
      val segW = 4
      // model: global first occurrence by (doc_id, seg_idx)
      val segs = texts.zipWithIndex.flatMap { case (t, d) =>
        t.split(" ").grouped(segW).zipWithIndex.map { case (ws, i) =>
          (d.toLong, i.toLong, ws.mkString(" "))
        }
      }
      val firstAt = segs.groupBy(_._3).map { case (seg, occ) =>
        seg -> occ.map(o => (o._1, o._2)).min
      }
      val model = segs.groupBy(_._1).map { case (d, ss) =>
        val kept = ss.sortBy(_._2)
          .filter(s => firstAt(s._3) == ((s._1, s._2)))
        d -> (ss.size.toLong, kept.size.toLong,
          kept.map(_._3).mkString(" "))
      }
      val spark0 = spark
      import spark0.implicits._
      val df = texts.zipWithIndex
        .map { case (t, d) => (d.toLong, t) }.toDF("doc_id", "text")
      val got = Curation.segmentDedup(df, segW)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(got == model, s"texts=$texts")
    }
  }
}
