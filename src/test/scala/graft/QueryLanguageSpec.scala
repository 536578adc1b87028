package graft

import graft.query.QueryLanguage
import graft.query.QueryLanguage._

/** Port of the reference's query-language golden tables
  * (test/riemann/query_test.clj:6-84 AST cases, :189-262 predicate
  * behavior). Divergence noted in QueryLanguage's doc: our relation is
  * typed, so `state = 2` on a string column uses numeric try-cast
  * semantics rather than Clojure's type-strict `=`. */
class QueryLanguageSpec extends SparkSpec {

  // ------------------------------------------------ AST (query_test.clj:6-84)
  val astCases: Seq[(String, Ast)] = Seq(
    "state = true" -> Cmp("=", FieldRef("state"), BoolLit(true)),
    "host = true" -> Cmp("=", FieldRef("host"), BoolLit(true)),
    "ttl = 64" -> Cmp("=", FieldRef("ttl"), LongLit(64)),
    "true" -> BoolLit(true),
    "false" -> BoolLit(false),
    "nil" -> NullLit,
    "null" -> NullLit,
    "state = 0" -> Cmp("=", FieldRef("state"), LongLit(0)),
    "state = -1" -> Cmp("=", FieldRef("state"), LongLit(-1)),
    "state = 0.0" -> Cmp("=", FieldRef("state"), DoubleLit(0.0)),
    "state = 1.5" -> Cmp("=", FieldRef("state"), DoubleLit(1.5)),
    "state = -1.5" -> Cmp("=", FieldRef("state"), DoubleLit(-1.5)),
    "state = 1e5" -> Cmp("=", FieldRef("state"), DoubleLit(1e5)),
    "state = 1E5" -> Cmp("=", FieldRef("state"), DoubleLit(1e5)),
    "state = -1.2e-5" -> Cmp("=", FieldRef("state"), DoubleLit(-1.2e-5)),
    "state = \"\"" -> Cmp("=", FieldRef("state"), StrLit("")),
    "state = \"foo\"" -> Cmp("=", FieldRef("state"), StrLit("foo")),
    "state = \" \\\" \\\\ \"" -> Cmp("=", FieldRef("state"), StrLit(" \" \\ ")),
    "state = \"辻斬\"" -> Cmp("=", FieldRef("state"), StrLit("辻斬")),
    "state > 2" -> Cmp(">", FieldRef("state"), LongLit(2)),
    "state < 2" -> Cmp("<", FieldRef("state"), LongLit(2)),
    "state >= 2" -> Cmp(">=", FieldRef("state"), LongLit(2)),
    "state <= 2" -> Cmp("<=", FieldRef("state"), LongLit(2)),
    "state != 2" -> Cmp("!=", FieldRef("state"), LongLit(2)),
    "state =~ \"%foo%\"" -> LikeMatch(FieldRef("state"), "%foo%"),
    "tagged \"cat\"" -> Tagged("cat"),
    "not host = 1" -> Not(Cmp("=", FieldRef("host"), LongLit(1))),
    "host = 1 and state = 2" -> And(
      Cmp("=", FieldRef("host"), LongLit(1)),
      Cmp("=", FieldRef("state"), LongLit(2))),
    "host = 1 or state = 2" -> Or(
      Cmp("=", FieldRef("host"), LongLit(1)),
      Cmp("=", FieldRef("state"), LongLit(2))),
    "(host = 1)" -> Cmp("=", FieldRef("host"), LongLit(1)),
    "((host = 1))" -> Cmp("=", FieldRef("host"), LongLit(1)),
    "not host = 1 and host = 2" -> And(
      Not(Cmp("=", FieldRef("host"), LongLit(1))),
      Cmp("=", FieldRef("host"), LongLit(2))),
    "not host = 1 or host = 2 and host = 3" -> Or(
      Not(Cmp("=", FieldRef("host"), LongLit(1))),
      And(Cmp("=", FieldRef("host"), LongLit(2)),
        Cmp("=", FieldRef("host"), LongLit(3)))),
    "not ((host = 1 or host = 2) and host = 3)" -> Not(And(
      Or(Cmp("=", FieldRef("host"), LongLit(1)),
        Cmp("=", FieldRef("host"), LongLit(2))),
      Cmp("=", FieldRef("host"), LongLit(3))))
  )

  test("AST table (query_test.clj:6-84)") {
    astCases.foreach { case (q, expected) =>
      assert(parse(q) == expected, s"for query: $q")
    }
  }

  test("parse errors") {
    assertThrows[ParseException](parse("state ="))
    assertThrows[ParseException](parse("state = \"unterminated"))
    assertThrows[ParseException](parse("(host = 1"))
    assertThrows[ParseException](parse("host = 1 extra"))
  }

  // ------------------------- predicate behavior (query_test.clj:189-262)
  private def matchIds(q: String, df: org.apache.spark.sql.DataFrame): Seq[Long] =
    ids(df.filter(QueryLanguage.predicate(q, df.schema)))

  test("truthy literals (query_test.clj:189-200)") {
    val df = events(E(id = 1, state = "foo"), E(id = 2))
    assert(matchIds("true", df) == Seq(1L, 2L))
    assert(matchIds("false", df) == Seq())
    assert(matchIds("null", df) == Seq())
  }

  test("equality (query_test.clj:202-211)") {
    val df = events(E(id = 1, state = "foo"), E(id = 2, state = "bar"), E(id = 3))
    assert(matchIds("state = \"foo\"", df) == Seq(1L))
    assert(matchIds("state != \"foo\"", df) == Seq(2L, 3L))
  }

  test("wildcard =~ (query_test.clj:213-216)") {
    val df = events(E(id = 1, host = "s."), E(id = 2, host = "foos."),
      E(id = 3, host = "a."), E(id = 4, host = "s.murf"), E(id = 5, host = null))
    assert(matchIds("host =~ \"%s.\"", df) == Seq(1L, 2L))
  }

  test("regex ~= (query_test.clj:218-221)") {
    val df = events(E(id = 1, host = "foo19"), E(id = 2, host = "foo1"),
      E(id = 3, host = "fo42"), E(id = 4, host = "abc"), E(id = 5, host = "foo"),
      E(id = 6, host = "fooo42"), E(id = 7, host = null))
    assert(matchIds("host ~= \"foo?[1-9]+\"", df) == Seq(1L, 2L, 3L))
  }

  test("inequality with numeric guard (query_test.clj:223-235)") {
    def df1(ms: Option[Double]*) = events(ms.zipWithIndex.map { case (m, i) =>
      E(id = i + 1, metric = m.map(Double.box).orNull)
    }: _*)
    assert(matchIds("metric > 1e10", df1(Some(1e11), Some(1e10), None)) == Seq(1L))
    assert(matchIds("metric >= -1", df1(Some(0), Some(-1), Some(-2), None)) == Seq(1L, 2L))
    assert(matchIds("metric < 1.2e2", df1(Some(1.5e1), Some(1.2e2), None)) == Seq(1L))
    assert(matchIds("metric <= 1", df1(Some(1), Some(-20), Some(2), None)) == Seq(1L, 2L))
  }

  test("tagged (query_test.clj:237-240)") {
    val df = events(E(id = 1, tags = Seq("cat", "dog")), E(id = 2, tags = Seq("cat")),
      E(id = 3, tags = Seq("dog")), E(id = 4))
    assert(matchIds("tagged \"cat\"", df) == Seq(1L, 2L))
  }

  test("null handling (query_test.clj:242-245)") {
    val df = events(
      E(id = 1, time = null, description = "x"),
      E(id = 2, description = "hey"),
      E(id = 3, time = 2L, description = "x"),
      E(id = 4, description = null),
      E(id = 5))
    assert(matchIds("time_s = null and description != nil", df) == Seq(1L, 2L))
  }

  test("boolean composition (query_test.clj:247-250)") {
    val df = events(
      E(id = 1, host = "1", service = "z"),
      E(id = 2, host = "z", service = "3"),
      E(id = 3, host = "z", service = "z"),
      E(id = 4, host = "2", service = "3"))
    assert(matchIds("not ((host = \"1\" or host = \"2\") and service = \"3\")", df)
      == Seq(1L, 2L, 3L))
  }

  test("custom attributes (query_test.clj:252-262)") {
    val df = events(
      E(id = 1, time = 2L, tags = Seq("fuzzy", "catz"), attributes = Map("paws" -> "4")),
      E(id = 2, time = 2L, tags = Seq("fuzzy"), attributes = Map("paws" -> "4")),
      E(id = 3, time = 2L, tags = Seq(), attributes = Map("paws" -> "4")),
      E(id = 4, time = 2L, attributes = Map("paws" -> "4")),
      E(id = 5, time = 2L, tags = Seq("fuzzy", "catz"), attributes = Map("paws" -> "3")),
      E(id = 6, time = 2L, tags = Seq("fuzzy", "catz")),
      E(id = 7, time = 2L, tags = Seq("fuzzy", "catz"), attributes = Map()))
    assert(matchIds("paws = 4 and tagged \"catz\"", df) == Seq(1L))
  }

  test("numeric string-literal comparison (ADVICE: metric = \"2\")") {
    val df = events(E(id = 1, metric = 2.0), E(id = 2, metric = null),
      E(id = 3, metric = 3.0))
    // try-cast divergence (documented): "2" casts to 2.0 and matches 2.0,
    // and crucially does NOT match null metrics
    assert(matchIds("metric = \"2\"", df) == Seq(1L))
  }

  test("Infinity / NaN / bigint literals (query.g4:61-69)") {
    val df = events(E(id = 1, metric = 1e300), E(id = 2, metric = -1e300))
    assert(matchIds("metric < Infinity", df) == Seq(1L, 2L))
    assert(matchIds("metric > -Infinity", df) == Seq(1L, 2L))
    assert(matchIds("metric = NaN", df) == Seq())
    assert(parse("metric = 123N") ==
      Cmp("=", FieldRef("metric"), BigLit(BigDecimal(123))))
  }
}
