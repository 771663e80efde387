package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Totality of the sanitizer re-expressions (C1–C3): the reference's
  * safe_int / safe_decimal / safe_list (`webscraper-postgres.py:174–188,
  * 230–237`) return NULL/[] on any garbage and never raise — our
  * `try_cast` / `coalesce(…, array())` forms must do the same even under
  * Spark 4.x ANSI mode (SURVEY.md §7.5). Property inputs come from a
  * fixed-seed ScalaCheck generator so runs are reproducible. */
class TryCastSpec extends SparkSpec {
  import spark.implicits._

  private val garbage: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.numStr,
    Gen.oneOf("N/A", "", " ", "12.", ".5", "1e3", "∞", "-", "8.8 (2.1M)",
      "null", "NaN", "12a", "²", "  42  ", "+7", "-13", "999999999999"))

  private val samples: Seq[String] =
    Gen.listOfN(300, garbage).pureApply(Gen.Parameters.default, Seed(42L))

  test("try_cast to INT is total: parses what scala parses, nulls garbage, never throws") {
    val out = samples.toDF("s")
      .select(expr("try_cast(s AS INT)").as("i"), col("s")).collect()
    out.foreach { r =>
      val s = r.getString(1)
      val scalaInt = scala.util.Try(s.trim.toInt).toOption
      val got = if (r.isNullAt(0)) None else Some(r.getInt(0))
      // anything scala parses as Int, try_cast must parse identically…
      scalaInt.foreach(v => assert(got.contains(v), s"'$s' -> $got, expected $v"))
      // …and try_cast must never conjure a number from non-numeric text
      if (got.isDefined && scalaInt.isEmpty)
        assert(scala.util.Try(s.trim.toDouble).isSuccess,
          s"'$s' parsed to ${got.get} but is not numeric")
    }
  }

  test("try_cast to DECIMAL(3,1) nulls anything out of range or malformed") {
    val cases = Seq(
      "8.8" -> Some(BigDecimal("8.8")),
      "12.3" -> Some(BigDecimal("12.3")),
      "99.99" -> None, // rounds to 100.0 at scale 1 = precision 4 > 3 ⇒ overflow ⇒ null
      "1234" -> None,                        // overflows precision
      "abc" -> None,
      "" -> None)
    val out = cases.map(_._1).toDF("s")
      .select(col("s"), expr("try_cast(s AS DECIMAL(3,1))").as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getDecimal(1)).map(BigDecimal(_))).toMap
    cases.foreach { case (s, want) => assert(out(s) == want, s"'$s'") }
  }

  test("safe_list: null array coalesces to empty, arrays pass through") {
    val df = Seq((1, Some(Seq("a", "b"))), (2, None)).toDF("id", "xs")
      .select(col("id"), coalesce(col("xs"), array()).as("xs"))
    val got = df.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(1) == Seq("a", "b"))
    assert(got(2) == Seq.empty)
  }

  test("null join keys never match (pandas merge-on-NaN parity, J1)") {
    val left = Seq((Some("k1"), 1), (None, 2)).toDF("k", "lv")
    val right = Seq((Some("k1"), 10), (None, 20)).toDF("k", "rv")
    val joined = left.join(right, left("k") === right("k"), "left")
      .select(col("lv"), col("rv")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(joined(1) == Some(10))
    assert(joined(2) == None, "null keys must not match null keys")
  }
}
