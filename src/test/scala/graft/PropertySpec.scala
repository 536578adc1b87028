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

  // ---------------------------------------------------------------------
  // Query language: generated ASTs (incl. the grammar's edge literals —
  // bigints `123N`, Infinity/NaN floats, nil — reference query.g4:61-69)
  // must (a) round-trip print -> parse and (b) compile to a predicate
  // that agrees row-for-row with a direct three-valued evaluator of the
  // documented semantics (QueryLanguage scaladoc: numeric try-cast
  // equality, null-guarded inequalities, Kleene and/or, truthiness).
  // ---------------------------------------------------------------------

  test("query language: AST print->parse round-trip + compiled predicate " +
    "agrees with a direct evaluator (query.g4:61-69 edge literals)") {
    import QueryLanguage._
    import org.apache.spark.sql.functions.{coalesce => fcoalesce, col => fcol, lit => flit}

    // ------------------------------------------------------- canonical printer
    def pv(a: Ast): String = a match {
      case BoolLit(v) => v.toString
      case NullLit => "nil"
      case LongLit(v) => v.toString
      case DoubleLit(v) =>
        if (v.isNaN) "NaN"
        else if (v == Double.PositiveInfinity) "Infinity"
        else if (v == Double.NegativeInfinity) "-Infinity"
        else v.toString
      case BigLit(v) => v.toBigInt.toString + "N"
      case StrLit(s) => "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
      case FieldRef(f) => f
      case other => fail(s"not a value: $other")
    }
    def print(a: Ast): String = a match {
      case Cmp(op, l, r) => s"${pv(l)} $op ${pv(r)}"
      case LikeMatch(t, p) => s"${pv(t)} =~ ${pv(StrLit(p))}"
      case RegexMatch(t, p) => s"${pv(t)} ~= ${pv(StrLit(p))}"
      case Tagged(t) => s"tagged ${pv(StrLit(t))}"
      case Not(p) => s"(not ${print(p)})"
      case And(l, r) => s"(${print(l)} and ${print(r)})"
      case Or(l, r) => s"(${print(l)} or ${print(r)})"
      case v => pv(v)
    }
    // NaN breaks case-class equality (NaN != NaN); normalize for the check
    def norm(a: Ast): Ast = a match {
      case DoubleLit(v) if v.isNaN => StrLit("\u0000NaN")
      case Cmp(o, l, r) => Cmp(o, norm(l), norm(r))
      case LikeMatch(t, p) => LikeMatch(norm(t), p)
      case RegexMatch(t, p) => RegexMatch(norm(t), p)
      case Not(p) => Not(norm(p))
      case And(l, r) => And(norm(l), norm(r))
      case Or(l, r) => Or(norm(l), norm(r))
      case v => v
    }

    // ------------------------------------------------------------ generator
    val numField = Gen.oneOf("metric", "ttl")
    val strField = Gen.oneOf("host", "service", "state", "k", "j", "zzz")
    val anyField = Gen.oneOf("metric", "ttl", "host", "service", "state", "k", "j", "zzz")
    val strPool = Gen.oneOf("ok", "critical", "a", "b", "foo", "2", "2.5",
      "", " 3 ", "1e2", "辻斬", "x%")
    val numLit: Gen[Ast] = Gen.frequency(
      (3, Gen.chooseNum(-5L, 5L).map(LongLit(_))),
      (2, Gen.oneOf(-1.5, 1.0, 2.0, 2.5, 1e300).map(DoubleLit(_))),
      (1, Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity).map(DoubleLit(_))),
      (1, Gen.oneOf(BigDecimal(2),
        BigDecimal("123456789012345678901234567890")).map(BigLit(_))))
    val valueAst: Gen[Ast] = Gen.frequency(
      (3, anyField.map(FieldRef(_))), (3, numLit),
      (2, strPool.map(StrLit(_))), (1, Gen.const(NullLit)))
    val cmp = for {
      o <- Gen.oneOf("=", "!=", "<", ">", "<=", ">=")
      l <- valueAst; r <- valueAst
    } yield Cmp(o, l, r)
    // like/regex targets stay on string-shaped fields: numeric targets
    // exercise Spark's double->string cast formatting, not the language
    val like = for {
      f <- strField
      p <- Gen.oneOf("%", "o%", "%o%", "cri%", "2_5", "%斬")
    } yield LikeMatch(FieldRef(f), p)
    val regex = for {
      f <- strField
      p <- Gen.oneOf("o.", "^ok$", "crit", "a|b", "[0-9]+")
    } yield RegexMatch(FieldRef(f), p)
    val tagged = Gen.oneOf("x", "y", "zz").map(Tagged(_))
    val bare: Gen[Ast] = Gen.frequency(
      (2, anyField.map(FieldRef(_))),
      (1, Gen.oneOf(BoolLit(true), BoolLit(false), NullLit: Ast)),
      (1, strPool.map(StrLit(_))), (1, numLit))
    def tree(depth: Int): Gen[Ast] =
      if (depth == 0)
        Gen.frequency((6, cmp), (2, like), (2, regex), (1, tagged), (1, bare))
      else Gen.frequency(
        (4, tree(0)),
        (2, for { l <- tree(depth - 1); r <- tree(depth - 1) } yield And(l, r)),
        (2, for { l <- tree(depth - 1); r <- tree(depth - 1) } yield Or(l, r)),
        (2, tree(depth - 1).map(Not(_))))

    // -------------------------------------------------------------- fixture
    val df = events(
      E(id = 1, host = "a", service = "cpu", state = "ok", metric = 1.0,
        ttl = 60.0, tags = Seq("x"), attributes = Map("k" -> "1")),
      E(id = 2, host = "b", service = "mem", state = "critical", metric = -1.5,
        tags = Seq("x", "y"), attributes = Map("k" -> "2.5", "j" -> "foo")),
      E(id = 3, host = null, service = null),
      E(id = 4, host = "n", service = "nan", metric = Double.NaN),
      E(id = 5, host = "inf", metric = Double.PositiveInfinity, state = "2"),
      E(id = 6, host = "ninf", metric = Double.NegativeInfinity, state = " 3 "),
      E(id = 7, host = "辻斬", service = "u", state = "foo",
        metric = 1e300, tags = Seq("zz"),
        attributes = Map("j" -> "1e2", "k" -> "x%")),
      E(id = 8, host = "", service = "cpu", state = "2.5", metric = 2.5,
        ttl = 0.0)).cache()

    // evaluator row model, derived from the relation itself
    case class RE(host: Option[String], service: Option[String],
        state: Option[String], metric: Option[Double], ttl: Option[Double],
        tags: Option[Seq[String]], attrs: Option[Map[String, String]])
    val model: Map[Long, RE] = df.collect().map { r =>
      def s(n: String) = Option(r.getAs[String](n))
      r.getAs[Long]("event_id") -> RE(s("host"), s("service"), s("state"),
        Option(r.getAs[java.lang.Double]("metric")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("ttl")).map(_.doubleValue),
        Option(r.getAs[scala.collection.Seq[String]]("tags")).map(_.toSeq),
        Option(r.getAs[scala.collection.Map[String, String]]("attributes"))
          .map(_.toMap))
    }.toMap

    // ----------------------------------------------------- direct evaluator
    val numFields = Set("metric", "ttl")
    val strFields = Set("host", "service", "state", "description")
    def isNumAst(a: Ast) = a match {
      case _: LongLit | _: DoubleLit | _: BigLit => true
      case FieldRef(f) => numFields(f)
      case _ => false
    }
    def isStrAst(a: Ast) = a match {
      case _: StrLit => true
      case FieldRef(f) => strFields(f) || !numFields(f)
      case _ => false
    }
    // Spark's string->double cast: java parse, then the special
    // floating-point literals (Cast.processFloatingPointSpecialLiterals:
    // inf/infinity/nan, case-insensitive, optional sign)
    def tryCastD(s: String): Option[Double] = {
      val t = s.trim
      if (t.isEmpty) None
      else try Some(t.toDouble) catch {
        case _: NumberFormatException => t.toLowerCase match {
          case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
          case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
          case "nan" | "+nan" | "-nan" => Some(Double.NaN)
          case _ => None
        }
      }
    }
    def strVal(a: Ast, re: RE): Option[String] = a match {
      case StrLit(s) => Some(s)
      case FieldRef("host") => re.host
      case FieldRef("service") => re.service
      case FieldRef("state") => re.state
      case FieldRef(f) => re.attrs.flatMap(_.get(f))
      case _ => None
    }
    def numVal(a: Ast, re: RE): Option[Double] = a match {
      case LongLit(v) => Some(v.toDouble)
      case DoubleLit(v) => Some(v)
      case BigLit(v) => Some(v.toDouble)
      case StrLit(s) => tryCastD(s)
      case FieldRef("metric") => re.metric
      case FieldRef("ttl") => re.ttl
      case f: FieldRef => strVal(f, re).flatMap(tryCastD)
      case _ => None
    }
    // Spark double semantics: NaN = NaN, NaN greater than everything,
    // -0.0 = 0.0 (the fixture avoids -0.0)
    def cmpD(a: Double, b: Double): Int =
      if (a == b) 0 else java.lang.Double.compare(a, b)
    def kEq(l: Ast, r: Ast, re: RE): Boolean = {
      val mixed = (isNumAst(l) && isStrAst(r)) || (isNumAst(r) && isStrAst(l))
      if (mixed || (isNumAst(l) && isNumAst(r)))
        (numVal(l, re), numVal(r, re)) match {
          case (Some(a), Some(b)) => cmpD(a, b) == 0
          case (None, None) => true
          case _ => false
        }
      else if (isStrAst(l) && isStrAst(r)) strVal(l, re) == strVal(r, re)
      else { // a nil side: lit(null) <=> x
        def side(a: Ast): Option[Any] =
          if (isNumAst(a)) numVal(a, re) else if (isStrAst(a)) strVal(a, re)
          else None
        (side(l), side(r)) match {
          case (None, None) => true
          case _ => false
        }
      }
    }
    def kleene(a: Ast, re: RE): Option[Boolean] = a match {
      case And(l, r) => (kleene(l, re), kleene(r, re)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (kleene(l, re), kleene(r, re)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(p) => Some(!kleene(p, re).getOrElse(false))
      case Cmp("=", l, r) => Some(kEq(l, r, re))
      case Cmp("!=", l, r) => Some(!kEq(l, r, re))
      case Cmp(op, l, r) => Some((numVal(l, re), numVal(r, re)) match {
        case (Some(x), Some(y)) => op match {
          case "<" => cmpD(x, y) < 0
          case ">" => cmpD(x, y) > 0
          case "<=" => cmpD(x, y) <= 0
          case ">=" => cmpD(x, y) >= 0
        }
        case _ => false // numeric guard: null operand -> false
      })
      case LikeMatch(t, p) => strVal(t, re).map { s =>
        val rx = "^" + p.flatMap {
          case '%' => ".*"
          case c => java.util.regex.Pattern.quote(c.toString)
        } + "$"
        s.matches(rx)
      }
      case RegexMatch(t, p) => strVal(t, re).map(s =>
        java.util.regex.Pattern.compile(p).matcher(s).find())
      case Tagged(t) => re.tags.map(_.contains(t))
      case BoolLit(v) => Some(v)
      case NullLit => Some(false)
      case StrLit(_) | LongLit(_) | DoubleLit(_) | BigLit(_) => Some(true)
      case FieldRef(f) => Some(
        if (numFields(f)) numVal(FieldRef(f), re).isDefined
        else strVal(FieldRef(f), re).isDefined) // truthiness: non-nil
    }

    // ------------------------------------------------------------ the check
    val asts = scala.collection.mutable.ArrayBuffer[Ast]()
    forAllN(Gen.chooseNum(0, 2).flatMap(tree), 160)(a => { asts += a; () })
    asts.foreach { a =>
      val printed = print(a)
      assert(norm(QueryLanguage.parse(printed)) == norm(a),
        s"print->parse round-trip diverged for: $printed")
    }
    asts.grouped(40).foreach { chunk =>
      val cols = chunk.zipWithIndex.map { case (a, i) =>
        fcoalesce(QueryLanguage.compile(a, df.schema), flit(false)).as(s"p$i") }
      df.select(fcol("event_id") +: cols.toIndexedSeq: _*).collect().foreach { row =>
        val re = model(row.getLong(0))
        chunk.zipWithIndex.foreach { case (a, i) =>
          val got = row.getBoolean(i + 1)
          val want = kleene(a, re).getOrElse(false)
          assert(got == want,
            s"compiled predicate diverged from the evaluator on row " +
              s"${row.getLong(0)} for: ${print(a)} (compiled=$got model=$want)")
        }
      }
    }
    df.unpersist()
    ()
  }
}
