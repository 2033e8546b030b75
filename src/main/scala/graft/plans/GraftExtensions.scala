package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the compiled graft kernels — a
  * `SparkSessionExtensions` hook that registers the native Catalyst
  * expressions in the session FunctionRegistry, so plain-`spark.sql`
  * users (and JDBC/notebook sessions that never touch the Scala
  * Column API) can call the engine's hot-path functions directly:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * spark.sql("SELECT poly_hash(text), dup_ngram_stats(split(text,' '), 3) FROM docs")
  * }}}
  *
  * For an already-running session (tests, REPL), [[GraftExtensions.register]]
  * installs the same builders into the live registry.
  *
  * This is the intended use of SparkSessionExtensions for this engine:
  * the operators themselves stay declarative DataFrame plans (Catalyst
  * optimizes them untouched), and only genuinely new SCALAR kernels —
  * mod-p hashes, shingle statistics, integer vector arithmetic — enter
  * through the function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def intLit(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => java.lang.Math.toIntExact(v) // loud on overflow, never truncate
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: the n argument must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def desc(name: String, usage: String, b: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", name, usage), b)

  /** Every registered kernel: name, usage line, builder. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    desc("poly_hash", "poly_hash(str) - mod-p polynomial string hash",
      { args => arity("poly_hash", args, 1); PolyHash(args.head) }),
    desc("shingle_hash_set", "shingle_hash_set(toks, n) - distinct hashed n-token shingles",
      { args => arity("shingle_hash_set", args, 2)
        ShingleHashSet(args.head, intLit("shingle_hash_set", args(1))) }),
    desc("shingle_hash_counts", "shingle_hash_counts(toks, n) - distinct shingle hashes with multiplicities",
      { args => arity("shingle_hash_counts", args, 2)
        ShingleHashCounts(args.head, intLit("shingle_hash_counts", args(1))) }),
    desc("dup_ngram_stats", "dup_ngram_stats(toks, n) - (dup_occ, n_ngrams) duplicated-ngram statistics",
      { args => arity("dup_ngram_stats", args, 2)
        DupNgramStats(args.head, intLit("dup_ngram_stats", args(1))) }),
    desc("repetition_stats", "repetition_stats(toks, n) - (max_rep, n_tris) top-shingle statistics",
      { args => arity("repetition_stats", args, 2)
        RepetitionStats(args.head, intLit("repetition_stats", args(1))) }),
    desc("char_ngram_hash_set", "char_ngram_hash_set(str, n) - distinct hashed character n-grams",
      { args => arity("char_ngram_hash_set", args, 2)
        CharNgramHashSet(args.head, intLit("char_ngram_hash_set", args(1))) }),
    desc("term_counts", "term_counts(toks) - per-row (term, tf, weight) TF relation",
      { args => arity("term_counts", args, 1); TermCounts(args.head) }),
    desc("shingle_string_counts", "shingle_string_counts(toks, n) - distinct n-gram strings with multiplicities",
      { args => arity("shingle_string_counts", args, 2)
        ShingleStringCounts(args.head, intLit("shingle_string_counts", args(1))) }),
    desc("char_bigram_counts", "char_bigram_counts(str) - per-row (term, tf, weight) char-bigram TF relation",
      { args => arity("char_bigram_counts", args, 1); CharBigramCounts(args.head) }),
    desc("sign_code", "sign_code(vec) - (hi, lo) 32-bit sign-bit halves of a 64-dim vector",
      { args => arity("sign_code", args, 1)
        SignCode(args.head) }),
    desc("dot_product", "dot_product(a, b) - strict element-order float dot product",
      { args => arity("dot_product", args, 2); DotProductExpr(args.head, args(1)) }),
    desc("sq_norm", "sq_norm(a) - squared L2 norm",
      { args => arity("sq_norm", args, 1); SqNormExpr(args.head) }),
    desc("sq_dist", "sq_dist(a, b) - squared euclidean distance",
      { args => arity("sq_dist", args, 2); SqDistExpr(args.head, args(1)) }),
    desc("int_dot", "int_dot(a, b) - exact int64 dot product",
      { args => arity("int_dot", args, 2); IntDotExpr(args.head, args(1)) }),
    desc("int_sqdist", "int_sqdist(a, b) - exact int64 squared distance",
      { args => arity("int_sqdist", args, 2); IntSqDistExpr(args.head, args(1)) }))

  /** Install the kernels into an already-running session's registry
    * (the config-free path for tests, REPLs, and embedded use).
    */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
