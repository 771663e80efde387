package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** The custom codegen Expression must be a drop-in for the higher-order
  * built-in formula it replaces (same values, same null behavior) — the
  * contract that keeps the DuckDB oracles valid after the swap. */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("dot_long equals aggregate(zip_with(...)) on real embeddings") {
    VectorExprs.register(spark)
    val diff = Tables.embeddings(spark, sf)
      .select(expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("ai"))
      .select(
        expr("dot_long(ai, ai)").as("native"),
        expr("aggregate(zip_with(ai, ai, (x, y) -> x * y), 0L, (acc, x) -> acc + x)").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, "codegen dot product must match the interpreted formula")
  }

  test("dot_long null and edge semantics") {
    VectorExprs.register(spark)
    val rows = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))), // 4+10+18 = 32
      (None, Some(Seq(1L))),                           // null in -> null out
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])))  // empty -> 0
      .toDF("a", "b")
      .select(expr("dot_long(a, b)").as("d")).collect()
    assert(rows(0).getLong(0) == 32L)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 0L)
  }

  test("GraftExtensions applies cleanly and dot_long resolves in SQL") {
    // the injection shape must be accepted by the public extensions API
    // (a real deployment sets spark.sql.extensions=graft.functions.
    // GraftExtensions at session build; a second SparkContext can't be
    // created here, so SQL resolution is checked via the live session)
    new graft.functions.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.VectorExprs.register(spark)
    assert(spark.sql("SELECT dot_long(array(2L, 3L), array(4L, 5L)) AS d").head.getLong(0) == 23L)
  }

  test("sorted_intersect_count equals array_intersect size on sorted distinct arrays") {
    VectorExprs.register(spark)
    val diff = Tables.embeddings(spark, sf)
      .select(expr("sort_array(array_distinct(transform(embedding, x -> CAST(round(x * 100) AS BIGINT))))").as("a"),
        expr("sort_array(array_distinct(transform(embedding, x -> CAST(round(x * 50) AS BIGINT))))").as("b"))
      .select(
        expr("sorted_intersect_count(a, b)").as("fast"),
        expr("CAST(size(array_intersect(a, b)) AS BIGINT)").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty)
  }

  test("sorted_intersect_count null/empty semantics") {
    VectorExprs.register(spark)
    val rows = Seq(
      (Some(Seq(1L, 3L, 5L)), Some(Seq(2L, 3L, 5L, 9L))), // {3,5} -> 2
      (Some(Seq.empty[Long]), Some(Seq(1L))),             // 0
      (None, Some(Seq(1L))))                              // null
      .toDF("a", "b").select(expr("sorted_intersect_count(a, b)").as("n")).collect()
    assert(rows(0).getLong(0) == 2L)
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0))
  }

  test("dot_long rejects non-array<bigint> inputs at analysis time") {
    VectorExprs.register(spark)
    val e = intercept[Exception] {
      Seq(("x", 1L)).toDF("a", "b").select(expr("dot_long(a, b)")).collect()
    }
    assert(e.getMessage.contains("dot_long") || e.getMessage.contains("DATATYPE"))
  }

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null || (t.getCause eq t)) t else rootCause(t.getCause)

  test("lsh_bands fails loudly on a non-16-element vector, both eval paths (VERDICT r15 item 1)") {
    // lsh_bands is publicly registered and its 16-element read loops
    // are unguarded by construction — a short array<bigint> would read
    // past UnsafeArrayData's payload and band SILENTLY on garbage.
    // Both eval paths must throw instead.
    VectorExprs.register(spark)
    val coefs = (1 to 16).mkString(",")
    // codegen path (whole-stage generated java)
    val e = intercept[Exception] {
      Seq(Seq(1L, 2L, 3L)).toDF("v")
        .select(expr(s"lsh_bands(v, 1L, 1, 1, array($coefs), array(0L))"))
        .collect()
    }
    assert(rootCause(e).getMessage.contains("16-element"),
      s"codegen path must name the dimension contract: ${rootCause(e).getMessage}")
    // interpreted path (direct expression eval, no codegen)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(1L, 2L),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val ie = graft.functions.CenteredLshBands(lit, 1L, 1, 1,
      Array.fill(16)(1), Array(0L))
    val e2 = intercept[IllegalArgumentException] { ie.eval(null) }
    assert(e2.getMessage.contains("16-element"))
    // and a well-formed 16-element vector agrees across both paths
    val v16 = (1L to 16L).toSeq
    val fromDf = Seq(v16).toDF("v")
      .select(expr(s"lsh_bands(v, 1L, 1, 1, array($coefs), array(0L))").as("b"))
      .collect()(0).getSeq[Long](0)
    val lit16 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      v16, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val fromEval = graft.functions.CenteredLshBands(lit16, 1L, 1, 1,
      (1 to 16).toArray, Array(0L)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(fromDf == fromEval, s"$fromDf vs $fromEval")
  }

  test("lsh_bands requires literal config args with a clear error (VERDICT r15 item 3)") {
    // the builder evals config args eagerly at registration-call time;
    // a non-literal config arg must surface as this require message,
    // not an obscure unbound-attribute eval error
    VectorExprs.register(spark)
    val coefs = (1 to 16).mkString(",")
    val e = intercept[Exception] {
      Seq((Seq.fill(16)(1L), 2L)).toDF("v", "k")
        .select(expr(s"lsh_bands(v, k, 1, 1, array($coefs), array(0L))"))
        .collect()
    }
    assert(rootCause(e).getMessage.contains("must be literals"),
      s"got: ${rootCause(e).getMessage}")
  }
}
