package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** F4-F7 — the neural-encoder plug-in boundary in its BATCHED form,
  * mirroring the reference's inference loop
  * (`meercat/encode_mentions.py:94-122`): the model is initialized once
  * per process, rows are fed through a fixed-size-batch DataLoader, and
  * outputs concatenate in input order.
  *
  * Spark form: `mapPartitions` with per-partition encoder init (the
  * `model.to(device)` analog — tokenizer load, FFI session, GPU
  * binding), `Iterator.grouped(batchSize)` as the DataLoader, one
  * vectorized `encodeBatch` call per group, order preserved. A real
  * transformer drops in by implementing [[TextEncoder]]; the
  * deterministic [[hashEncoder]] stand-in reproduces
  * `TextFunctions.hashEmbed` exactly (spec-pinned), so pipelines built
  * on this boundary are bit-identical whichever side of it runs.
  */
object BatchedInference {

  /** Plug-in contract: one instance per partition, batch-at-a-time. */
  trait TextEncoder {
    def encodeBatch(batch: Seq[Array[String]]): Seq[Array[Float]]
  }

  /** Deterministic toy encoder = the hashEmbed expression's math
    * ([[graft.functions.HashEmbedExpr]]), reproduced on the plug-in
    * side of the boundary.
    */
  def hashEncoder(dim: Int, seed: Long = 42L): () => TextEncoder = () => new TextEncoder {
    private val P = HashExpressions.P
    def encodeBatch(batch: Seq[Array[String]]): Seq[Array[Float]] = batch.map { toks =>
      // null tokens hash as "" — HashEmbedExpr's null handling, kept
      // bit-identical across the plug-in boundary
      val th = toks.map { s0 =>
        val s = if (s0 == null) "" else s0
        HashExpressions.polyHashChars(s, 0, s.length, 0L)
      }
      Array.tabulate(dim) { k =>
        var sum = 0L
        var i = 0
        while (i < th.length) { sum += ((th(i) + k + seed) * 2654435761L) % P - P / 2; i += 1 }
        (sum.toDouble / th.length / (P / 2).toDouble).toFloat
      }
    }
  }

  /** Encode a token-array column in per-partition batches. `make` runs
    * once per partition (expensive init amortized); `batchSize` is the
    * DataLoader batch. Output: (uid, embedding), row order preserved
    * within partitions.
    */
  def encodeMentions(df: DataFrame, id: Column, tokens: Column,
                     batchSize: Int, make: () => TextEncoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("_1"), tokens.cast("array<string>").as("_2"))
      .as[(Long, Array[String])]
      .mapPartitions { it =>
        val enc = make() // per-partition model init
        it.grouped(batchSize).flatMap { batch =>
          val vecs = enc.encodeBatch(batch.map(_._2))
          batch.iterator.zip(vecs.iterator).map { case ((uid, _), v) => (uid, v) }
        }
      }
      .toDF("uid", "embedding")
  }
}
