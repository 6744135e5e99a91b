package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled MinHash signature: text → k signature minima in one pass.
  *
  * Computes EXACTLY the same integers as the declarative pipeline in
  * [[TextFunctions.minhashSignature]] / the DuckDB oracle SQL
  * (tokens = split(space-trim(lower(text)), \s+); word-3-gram shingles,
  * distinct; base hash = fold (acc*31 + char) mod 1e9+7 seeded with 1;
  * sig_i = min over shingles of ((2i+1)·h + 31i + 7) mod 1e9+7) — but as
  * a single JVM loop instead of nested interpreted higher-order
  * functions (~10× faster on the documents corpus; this is the scale
  * path, the HOF variant remains as the cross-engine-checkable spec).
  *
  * ASCII/BMP note: characters are folded as UTF-16 code units, which
  * equals the per-codepoint fold of the declarative variant for all
  * non-surrogate text.
  */
case class MinHashSigExpr(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private val P = TextFunctions.HashMod

  /** Codegen: call the JVM kernel through a captured reference instead of
    * CodegenFallback — the surrounding operators stay inside ONE
    * whole-stage-codegen region (fallback would force the whole stage
    * back to interpreted eval; the kernel itself is already a tight
    * loop, so a virtual call is all codegen needs to emit).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, input => {
      val r = ctx.freshName("sig")
      s"""
         |Object $r = $ref.compute($input);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r;
         |}
       """.stripMargin
    })
  }

  def compute(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // space-only trim (Spark/DuckDB trim semantics, NOT String.trim)
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    // limit -1: KEEP trailing empty tokens — Spark's split (and DuckDB's
    // regexp_split_to_array) keep them, and text ending in non-space
    // whitespace survives the space-only trim above; Java's default
    // limit 0 would drop them and diverge from the declarative spec
    val toks = text.substring(lo, hi).toLowerCase(Locale.ROOT).split("\\s+", -1)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val sh = sb.toString
      if (seen.add(sh)) {
        var h = 1L
        var c = 0
        while (c < sh.length) { h = (h * 31 + sh.charAt(c)) % P; c += 1 }
        var s = 0
        while (s < k) {
          val v = ((2L * (s + 1) + 1) * h + 31L * (s + 1) + 7) % P
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Column wrapper (Spark 4: Column <-> Expression via ColumnBridge). */
  def minhashSig(text: Column, n: Int = 3, k: Int = 8): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), n, k))
  }
}
