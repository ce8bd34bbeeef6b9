package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen MinHash signature: one pass over a shingle string array
  * computes all nPerm permutation minima — replaces nPerm interpreted
  * higher-order aggregates (CodegenFallback) with a single primitive loop.
  *
  * Permutation j: h_j(s) = floorMod(a_j * hash64(s) + b_j, p), p = 2^61-1,
  * a_j = 2j+1 (odd), b_j from a splitmix stream. hash64 is FNV-1a+splitmix
  * over the UTF-8 bytes (deterministic across JVMs; wraparound arithmetic
  * is intentional).
  */
case class MinHashSigExpr(child: Expression, nPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    MinHashSigExpr.signature(arr, nPerm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigExpr.signature($c, $nPerm);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  final val P = 2305843009213693951L // 2^61 - 1

  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Shared by interpreted eval and generated code (called statically). */
  def signature(arr: ArrayData, nPerm: Int): GenericArrayData = {
    val mins = Array.fill(nPerm)(Long.MaxValue)
    val b0 = 0x9E3779B97F4A7C15L
    val bStep = 0x6C62272E07BB0142L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(arr.getUTF8String(i))
      var j = 0
      var b = b0
      while (j < nPerm) {
        val a = 2L * j + 1L
        val v = java.lang.Math.floorMod(a * h + b, P)
        if (v < mins(j)) mins(j) = v
        b += bStep
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins) // primitive long[] overload
  }

  /** Signature over PRE-HASHED shingles (array<long>): the permutation
    * loop only — used when the pipeline carries 8-byte shingle hashes
    * instead of strings (3× fewer shuffle bytes on the verify join). */
  def signatureFromHashes(arr: ArrayData, nPerm: Int): GenericArrayData = {
    val mins = Array.fill(nPerm)(Long.MaxValue)
    val b0 = 0x9E3779B97F4A7C15L
    val bStep = 0x6C62272E07BB0142L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      var b = b0
      while (j < nPerm) {
        val a = 2L * j + 1L
        val v = java.lang.Math.floorMod(a * h + b, P)
        if (v < mins(j)) mins(j) = v
        b += bStep
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSig(shingles: Column, nPerm: Int): Column =
    GraftColumnBridge.column(MinHashSigExpr(GraftColumnBridge.expression(shingles), nPerm))

  def minhashSigHashed(hashes: Column, nPerm: Int): Column =
    GraftColumnBridge.column(MinHashSigHashedExpr(GraftColumnBridge.expression(hashes), nPerm))
}

/** MinHashSigExpr over an array<long> of pre-hashed shingles. */
case class MinHashSigHashedExpr(child: Expression, nPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig_hashed"

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.signatureFromHashes(input.asInstanceOf[ArrayData], nPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigExpr.signatureFromHashes($c, $nPerm);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
