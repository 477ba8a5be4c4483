package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native catalyst expressions for the dedup hot loops.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) are evaluated
  * by the interpreter — a k×n minhash loop written as nested lambdas costs
  * ~1000× a native loop and drops the whole projection out of whole-stage
  * codegen. These expressions keep the DataFrame API surface (they are
  * Columns like any other) but run the loop as primitive-array Scala over
  * Spark's own XXH64, the same hash the built-in `xxhash64` uses.
  * CodegenFallback costs one virtual call per row; the loop itself is JIT
  * native. Deterministic: fixed seeds, no session state.
  */
object DedupExprs {
  /** Seed matching the built-in xxhash64's default. */
  val DefaultSeed = 42L
  /** Independent second hash family seed for the double-hash minhash. */
  val AltSeed = 0x9e3779b97f4a7c15L
}

/** Distinct word n-gram shingles of a single-space-tokenized text column,
  * natively: one pass over the split words, first-occurrence order.
  * Fewer than n words → empty array.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= words.length - n) {
      seen.add(UTF8String.concatWs(space, java.util.Arrays.copyOfRange(words, i, i + n): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Distinct character n-gram shingles, natively (codepoint indexing, same
  * as the built-in `substring`). Shorter than n chars → empty array. */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** MinHash band signatures of an `array<string>` shingle column in one
  * pass: per-shingle base hashes h1 (seed 42) and h2 (seed φ·2^64), k
  * derived functions h_t = h1 + t·h2 (the standard double-hashing MinHash
  * family), minima per t, then `bands` band signatures, each the XXH64
  * fold of its k/bands signature slice. Null/empty input → empty array.
  */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && bands > 0 && k % bands == 0, "k must be a multiple of bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val h1 = new Array[Long](n)
    val h2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      h1(i) = XXH64.hashUTF8String(s, DedupExprs.DefaultSeed)
      h2(i) = XXH64.hashUTF8String(s, DedupExprs.AltSeed)
      i += 1
    }
    val sig = new Array[Long](k)
    var t = 0
    while (t < k) {
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = h1(j) + t * h2(j)
        if (v < mn) mn = v
        j += 1
      }
      sig(t) = mn
      t += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = DedupExprs.DefaultSeed
      var j = 0
      while (j < r) {
        acc = XXH64.hashLong(sig(b * r + j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<string>` shingle column: bit i of the
  * output is set when the sum over shingles of ±1 (bit i of the shingle's
  * XXH64, seed 42 — identical to the built-in `xxhash64`) is
  * non-negative. One hash per shingle, 64 counters, native loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), DedupExprs.DefaultSeed)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) >= 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
