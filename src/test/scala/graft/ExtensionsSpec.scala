package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.plans.GraftExtensions

/** The SQL function surface: GraftExtensions must expose the compiled
  * kernels to plain-SQL sessions with EXACTLY the Column API semantics
  * (same expressions underneath — this spec pins the wiring).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL kernels match the Column API bit-for-bit") {
    GraftExtensions.register(spark)
    val df = Seq((1L, "the cat sat on the cat sat")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT poly_hash(text) AS h,
        |       dup_ngram_stats(split(text, ' '), 2) AS d,
        |       shingle_hash_counts(split(text, ' '), 2) AS hc,
        |       repetition_stats(split(text, ' '), 3) AS r
        |FROM ext_docs""".stripMargin).collect().head
    val viaCol = df.select(
      TextFunctions.stringHash(col("text")).as("h"),
      TextFunctions.dupNgramStats(TextFunctions.tokens(col("text")), 2).as("d"),
      TextFunctions.shingleHashCounts(TextFunctions.tokens(col("text")), 2).as("hc"),
      TextFunctions.repetitionStats(TextFunctions.tokens(col("text")), 3).as("r"))
      .collect().head
    viaSql shouldBe viaCol
  }

  test("integer vector kernels evaluate exactly in SQL") {
    GraftExtensions.register(spark)
    spark.sql("SELECT int_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS v")
      .as[Long].collect().head shouldBe 32L
    spark.sql("SELECT int_sqdist(array(0L, 3L), array(4L, 0L)) AS v")
      .as[Long].collect().head shouldBe 25L
    spark.sql("SELECT sq_norm(array(cast(3.0 as float), cast(4.0 as float))) AS v")
      .as[Double].collect().head shouldBe 25.0
  }

  test("misuse fails fast: wrong arity and non-literal n") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT poly_hash('a', 'b')").collect()
    }
    intercept[Exception] {
      // n must be a literal: a column reference cannot size the shingle
      spark.sql("SELECT shingle_hash_set(split('a b', ' '), id) FROM range(1)").collect()
    }
    intercept[Exception] {
      // an out-of-int BIGINT literal must fail loudly, never truncate
      spark.sql("SELECT shingle_hash_set(split('a b', ' '), 4294967298)").collect()
    }
  }

  test("the extensions hook exposes the full kernel catalog") {
    GraftExtensions.descriptions.map(_._1.funcName).toSet shouldBe Set(
      "poly_hash", "shingle_hash_set", "shingle_hash_counts", "dup_ngram_stats",
      "repetition_stats", "char_ngram_hash_set", "term_counts",
      "dot_product", "sq_norm", "sq_dist", "int_dot", "int_sqdist")
    // the config-path entry class is instantiable and applies cleanly
    noException should be thrownBy
      new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
