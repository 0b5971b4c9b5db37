package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation (zip_with + aggregate) is
  * interpreted per element and allocates an intermediate array per row
  * pair; these expressions generate a single fused loop inside
  * whole-stage codegen — no allocation, no virtual calls. On the
  * brute-force similarity scan this is the difference between the probe
  * × corpus join being compute-bound and being allocation-bound (at
  * 100 TB corpus scale the scan cost dominates everything, so the inner
  * loop must be tight).
  *
  * Determinism: single left-to-right accumulation per statistic, double
  * arithmetic — matches the sequential-fold HOF semantics bit-for-bit
  * (asserted in SimilaritySpec) and the DuckDB oracle to <1 ulp.
  *
  * Inputs must be ARRAY<DOUBLE> (cast floats via VectorFunctions
  * .asDouble); nulls propagate via the default BinaryExpression
  * null-safety.
  */
abstract class ArrayPairFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String

  /** (dot, normA, normB) => result */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  /** Java source: expression over accumulators `dot`, `na`, `nb`. */
  protected def finishCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    finish(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ${finishCode(dot, na, nb)};
       """.stripMargin
    })
}

/** cosine(a, b) = dot / (sqrt(|a|²) · sqrt(|b|²)). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends ArrayPairFold {
  override def prettyName: String = "cosine_similarity"
  protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / (math.sqrt(na) * math.sqrt(nb))
  protected def finishCode(dot: String, na: String, nb: String): String =
    s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends ArrayPairFold {
  override def prettyName: String = "dot_product"
  protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  protected def finishCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash from an ARRAY<LONG> of token hashes, folded in one codegen
  * loop: per-bit majority vote over the hashes, bit set where the vote is
  * non-negative. Replaces the explode + 64-conditional-aggregate
  * formulation with a shuffle-free per-row map — at corpus scale the
  * signature stage becomes embarrassingly parallel. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] >= 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full 64-slot MinHash signature from an ARRAY<STRING> of shingles, in
  * one fused pass per row: each shingle is XXH64-hashed from its UTF-8
  * bytes (bit-identical to SQL `xxhash64(shingle)`, seed 42), then
  * slot i = min over shingles of xxhash64(shingle_hash, i) — exactly
  * the `min(xxhash64(xxhash64(sh), lit(i)))` aggregate formulation.
  * Replaces explode(shingles) → 64-slot groupBy with a shuffle-free
  * narrow map, and hashes the strings natively rather than through an
  * interpreted `transform` lambda: at corpus scale the signature stage
  * stops shuffling shingle rows entirely and becomes embarrassingly
  * parallel (the only remaining shuffle in LSH dedup is the bucket join
  * itself). Returns null for an empty shingle array (no shingles ⇒ no
  * signature, matching explode's drop semantics). */
case class MinHash64(child: Expression, slots: Int = 64)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  // nullable even over a non-nullable child: an EMPTY shingle array maps
  // to null (without this, codegen would emit an assignment to a
  // FalseLiteral isNull and fall back to interpreted mode)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    if (hs.numElements() == 0) return null
    val mins = Array.fill(slots)(Long.MaxValue)
    var i = 0
    while (i < hs.numElements()) {
      val sh = hs.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
      val h0 = XXH64.hashLong(h, 42L)
      var s = 0
      while (s < slots) {
        val v = XXH64.hashInt(s, h0)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[org.apache.spark.sql.catalyst.expressions.XXH64].getName
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sh = ctx.freshName("sh")
      val h = ctx.freshName("h")
      val h0 = ctx.freshName("h0")
      val v = ctx.freshName("v")
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$slots];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    UTF8String $sh = $a.getUTF8String($i);
         |    long $h = $xxh.hashUnsafeBytes(
         |      $sh.getBaseObject(), $sh.getBaseOffset(), $sh.numBytes(), 42L);
         |    long $h0 = $xxh.hashLong($h, 42L);
         |    for (int $s = 0; $s < $slots; $s++) {
         |      long $v = $xxh.hashInt($s, $h0);
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint (Karp-Rabin rolling hash + min-in-window) from a
  * STRING, in one codegen pass: polynomial rolling hash (base 257, mod
  * 2^61-1) over each `k`-char window, then the minimum window hash per
  * winnowing window of `w` — the classic local document fingerprint
  * (Schleimer et al., SIGMOD'03 "winnowing") reduced to its smallest
  * useful form: the global minimum k-gram hash, a 1-slot MinHash that is
  * stable under content shifts. Shuffle-free per-row map.
  */
case class RollingMinHash(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_min_hash"

  private val Mod = (1L << 61) - 1
  private val Base = 257L

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    if (s.length < k) return java.lang.Long.valueOf(-1L)
    // modmul via Math.multiplyHigh-free 128-bit split (base < 2^9 keeps
    // products < 2^70; split into high/low to stay exact)
    def mulmod(a: Long, b: Long): Long = {
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod (2^61-1)
      val r = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
      val f = (r & Mod) + (r >>> 61)
      if (f >= Mod) f - Mod else f
    }
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = mulmod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (mulmod(h, Base) + s.charAt(i)) % Mod; i += 1 }
    var minH = h
    while (i < s.length) {
      h = (h + Mod - mulmod(s.charAt(i - k), pow) % Mod) % Mod
      h = (mulmod(h, Base) + s.charAt(i)) % Mod
      if (h < minH) minH = h
      i += 1
    }
    java.lang.Long.valueOf(minH)
  }

  // interpreted eval is already a tight loop over the string; fall back
  // to it from generated code via the standard codegen-fallback shape
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rollingMinHash", this,
      classOf[RollingMinHash].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (Long) $self.nullSafeEval($a.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two ARRAY<STRING> treated as sets, in one
  * hash-set pass — replaces array_intersect/array_union (which sort or
  * rescan per pair) in the dedup verification join, where millions of
  * candidate pairs each carry shingle sets. Interpreted kernel invoked
  * from generated code (same shape as RollingMinHash): the per-row cost
  * is the HashSet build, already optimal, so fused codegen arithmetic
  * would not help here — avoiding the per-pair intermediate arrays is
  * the win. */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sets"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[Any](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i)); i += 1 }
    val seen = new java.util.HashSet[Any](y.numElements() * 2)
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      val v = y.getUTF8String(j)
      if (seen.add(v) && set.contains(v)) inter += 1
      j += 1
    }
    val union = set.size() + seen.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaccardSets", this,
      classOf[JaccardSets].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (Double) $self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| of two LEXICOGRAPHICALLY SORTED, duplicate-free ARRAY<STRING>
  * by linear merge — no hashing, no allocation, no materialized
  * intersection (`array_intersect` builds a per-row hash set AND an
  * output array the caller immediately reduces to a size). The verify
  * stage of the exact prefix join runs this over every surviving
  * candidate pair, so the per-pair constant is the stage's cost.
  * Callers must pre-sort with `array_sort` (UTF8String binary order —
  * the same ordering the merge compares with); sortedness is the
  * caller's contract, not re-checked per row. */
case class IntersectSizeSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("intersectSizeSorted", this,
      classOf[IntersectSizeSorted].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (Integer) $self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: per-subspace nearest-centroid codes for
  * an ARRAY<DOUBLE> vector against driver-trained codebooks (a plan
  * constant carried inside the expression and reached from generated
  * code via addReferenceObj). Replaces the builtin composition
  * (m × ksub slice/zip_with/aggregate subtrees — a ~5000-node expression
  * whose analysis + janino compile dominated query setup) with ONE
  * expression evaluating a fused triple loop, no per-subspace allocation.
  * Ties break to the lowest code, matching the
  * array_position(array_min) spec formulation (asserted in
  * SimilaritySpec). */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private val m = books.length
  private val ksub = books(0).length
  private val dsub = books(0)(0).length
  // codebooks flattened to [((j·ksub)+c)·dsub + i] for a cache-friendly
  // scan; rebuilt lazily on each deserialized executor copy
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](m * ksub * dsub)
    var o = 0
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        var i = 0
        while (i < dsub) { f(o) = books(j)(c)(i); o += 1; i += 1 }
        c += 1
      }
      j += 1
    }
    f
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val t = v.getDouble(j * dsub + i) - flat(base + i)
          s += t * t
          i += 1
        }
        if (s < bd) { bd = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  // interpreted kernel invoked from generated code (same shape as
  // RollingMinHash): the per-row cost is the fused loop itself; inlining
  // its source into the generated method would buy nothing
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE tokenizer APPLY: segments each word of an ARRAY<STRING> input
  * into subword units under a trained merge table (a plan constant —
  * the output of TextAnalysis.bpeTrain), returning the flattened
  * ARRAY<STRING> of subwords with the `</w>` end-of-word marker fused
  * into the final unit of each word. Standard apply semantics
  * (subword-nmt): repeatedly rewrite the LOWEST-RANK adjacent pair
  * present in the word, greedy left-to-right within a pass, until no
  * pair is in the table. One narrow map per row; the merge table is
  * O(merges) and rides the closure once per executor. */
case class BpeApply(child: Expression, merges: Array[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  private def applyWord(w: String,
      out: scala.collection.mutable.ArrayBuffer[org.apache.spark.unsafe.types.UTF8String]): Unit = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
    var ci = 0
    while (ci < w.length) { syms += w.charAt(ci).toString; ci += 1 }
    syms += "</w>"
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) bestRank = r
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = merges(bestRank)
        val nb = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            nb += l + r; j += 2
          } else { nb += syms(j); j += 1 }
        }
        syms = nb
      }
    }
    var k = 0
    while (k < syms.length) {
      out += org.apache.spark.unsafe.types.UTF8String.fromString(syms(k))
      k += 1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < words.numElements()) {
      applyWord(words.getUTF8String(i).toString, out)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  // interpreted kernel from generated code (RollingMinHash shape): the
  // per-row work is string segmentation, not arithmetic codegen can fuse
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
