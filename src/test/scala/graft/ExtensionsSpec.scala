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
        |       shingle_string_counts(split(text, ' '), 2) AS sc,
        |       char_bigram_counts(substring(text, 1, 7)) AS cb,
        |       repetition_stats(split(text, ' '), 3) AS r
        |FROM ext_docs""".stripMargin).collect().head
    val viaCol = df.select(
      TextFunctions.stringHash(col("text")).as("h"),
      TextFunctions.dupNgramStats(TextFunctions.tokens(col("text")), 2).as("d"),
      TextFunctions.shingleHashCounts(TextFunctions.tokens(col("text")), 2).as("hc"),
      TextFunctions.shingleStringCounts(TextFunctions.tokens(col("text")), 2).as("sc"),
      org.apache.spark.sql.graftshim.Shim.column(graft.functions.CharBigramCounts(
        org.apache.spark.sql.graftshim.Shim.expression(substring(col("text"), 1, 7)))).as("cb"),
      TextFunctions.repetitionStats(TextFunctions.tokens(col("text")), 3).as("r"))
      .collect().head
    viaSql shouldBe viaCol
  }

  test("shingle_string_counts: distinct n-grams with multiplicities, first-seen order, vs HOF recompute") {
    val toks = "the cat sat on the cat sat".split(" ").toSeq
    val df = Seq(Tuple1(toks)).toDF("toks")
    val got = df.select(explode(TextFunctions.shingleStringCounts(col("toks"), 2)).as("sc"))
      .select(col("sc.ngram"), col("sc.c")).as[(String, Long)].collect().toSeq
    val expect = toks.sliding(2).map(_.mkString(" ")).toSeq
      .foldLeft(Vector.empty[(String, Long)]) { (acc, g) =>
        acc.indexWhere(_._1 == g) match {
          case -1 => acc :+ (g, 1L)
          case i  => acc.updated(i, (g, acc(i)._2 + 1))
        }
      }
    got shouldBe expect
    // shorter-than-n array yields no rows
    Seq(Tuple1(Seq("one"))).toDF("toks")
      .select(explode(TextFunctions.shingleStringCounts(col("toks"), 2)))
      .count() shouldBe 0L
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
      "shingle_string_counts", "char_bigram_counts", "sign_code",
      "dot_product", "sq_norm", "sq_dist", "int_dot", "int_sqdist")
    // the config-path entry class is instantiable and applies cleanly
    noException should be thrownBy
      new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
