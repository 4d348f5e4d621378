package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the hot numeric kernels of the
 * dedup/similarity operators.
 *
 * Why these exist: Spark's higher-order functions (`transform`,
 * `aggregate`, `zip_with`) evaluate their lambda as an interpreted
 * expression tree PER ARRAY ELEMENT — a 64-dim dot product through
 * `zip_with`+`aggregate` costs ~128 boxed expression evaluations per
 * row-pair, which dominates brute-force similarity scans. Each
 * expression here is one virtual call per row with a tight JVM loop
 * inside (JIT-vectorised), 1-2 orders of magnitude faster on the
 * kernels that matter. Everything stays deterministic and identical in
 * value to the HOF formulation (sequential left-to-right accumulation).
 */
object VectorExpressions {

  /** splitmix64 finaliser (public-domain constant mix). */
  @inline private[functions] def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — fast, stable string hash. */
  @inline private[functions] def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Σ aᵢ·bᵢ in double, sequential order; accepts float or double
    * arrays on either side. Fully codegen'd (doGenCode emits the same
    * tight loop), so brute-force similarity scans stay inside one
    * WholeStageCodegen span instead of crossing an interpreted
    * expression boundary per row pair. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def isFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType
    private lazy val lf = isFloat(left)
    private lazy val rf = isFloat(right)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xi * yi
        i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("dotN")
        val i = ctx.freshName("dotI")
        val s = ctx.freshName("dotS")
        val getL = if (lf) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        val getR = if (rf) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $getL * $getR;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a splitmix64-style integer mix mapped to [-1, 1]. Shared by the
    * Column-level formulation in SimilarityOps and the fused
    * [[SignBuckets]] kernel — one definition, bit-identical planes. */
  @inline def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L +
      dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /**
   * All `nTables` sign-bit LSH bucket ids of a vector in ONE pass:
   * bucket(t) = Σ_j [vec·plane(t·nBits+j) > 0]·2^j + (t << 32), planes
   * generated on the fly from [[planeComponent]]. Replaces the
   * `array(lshBuckets(t=0), …, lshBuckets(t=n-1))` Column formulation,
   * which inlined nTables·nBits separate dot-product loops and
   * nTables·nBits·dim plane literals into the plan — past ~100 bits the
   * generated projection method outgrows JIT limits and the whole stage
   * drops to interpreted execution. Arithmetic is sequential
   * multiply-add in the same order, so bucket ids are bit-identical to
   * the unfused form. Stays CodegenFallback on purpose: one virtual
   * call per ROW around a JIT-vectorised 12k-flop loop, instead of a
   * giant inlined method.
   */
  case class SignBuckets(child: Expression, dim: Int, nBits: Int,
                         nTables: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    // planes are tiny (nTables·nBits·dim doubles) and deterministic —
    // precompute once per expression instance, not per row
    private lazy val planes: Array[Array[Double]] =
      Array.tabulate(nTables * nBits)(p =>
        Array.tabulate(dim)(i => planeComponent(p, i)))
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      val out = new Array[Long](nTables)
      var t = 0
      while (t < nTables) {
        var sig = t.toLong << 32
        var j = 0
        while (j < nBits) {
          val plane = planes(t * nBits + j)
          var s = 0.0
          var i = 0
          while (i < n) {
            val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
            s += x * plane(i)
            i += 1
          }
          if (s > 0) sig += (1L << j)
          j += 1
        }
        out(t) = sig
        t += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /**
   * MinHash signature of a string-array column: `numHashes` minima of
   * per-seed remixes of one FNV-1a base hash per element.
   */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h0 = fnv64(arr.getUTF8String(i).getBytes)
        var s = 0
        while (s < numHashes) {
          val h = mix64(h0 ^ mix64(s.toLong))
          if (h < mins(s)) mins(s) = h
          s += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /**
   * 64-bit SimHash of a string-array column: per element one base
   * hash; each of the 64 bits votes ±1, sign of the tally sets the bit.
   */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = fnv64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /**
   * Distinct word n-gram shingles of a string: single-space tokenize,
   * join every n consecutive tokens, dedup preserving first-seen order.
   * (The `transform`+`concat_ws`+`array_distinct` HOF chain this
   * replaces re-interprets its lambda per shingle and dominated MinHash
   * runtime.) Short texts yield one (possibly shorter) shingle,
   * matching `slice` semantics of the HOF version.
   */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val text = input.toString.trim
      val toks = text.split(' ')
      val count = math.max(toks.length - n + 1, 1)
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder
        var j = i
        val end = math.min(i + n, toks.length)
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) {
        out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        k += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /**
   * Fraction of a text's word n-grams occupied by its single most
   * common n-gram — the Gopher "most common n-gram" repetition signal,
   * computed per ROW in one pass (local hash map of n-gram counts).
   * Replaces an explode + two grouped aggregations with a narrow map:
   * the signal is a pure per-document function, so shuffling every
   * n-gram of the corpus only to group it straight back by doc id is
   * wasted exchange volume at any scale. Short texts (< n words) yield
   * one truncated whole-text gram (fraction 1.0), matching the shingle
   * kernel's convention.
   */
  case class TopShingleFraction(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val toks = input.toString.trim.split(' ')
      val count = math.max(toks.length - n + 1, 1)
      val counts = new java.util.HashMap[String, Integer](count * 2)
      var mx = 0
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder
        var j = i
        val end = math.min(i + n, toks.length)
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        val c = counts.merge(sb.toString, 1, (a, b) => a + b)
        if (c > mx) mx = c
        i += 1
      }
      mx.toDouble / count
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /**
   * |a ∩ b| for two string arrays (set semantics) — count only, no
   * intersection array materialised. `array_intersect` allocates and
   * dedups per pair, which dominates near-dup verification when
   * candidate volume is millions of pairs.
   */
  case class SetIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // probe the smaller side against a set of the larger
      val (small, large) =
        if (x.numElements() <= y.numElements()) (x, y) else (y, x)
      val set = new java.util.HashSet[Any](large.numElements() * 2)
      var i = 0
      while (i < large.numElements()) {
        set.add(large.getUTF8String(i)); i += 1
      }
      var n = 0
      i = 0
      while (i < small.numElements()) {
        if (set.contains(small.getUTF8String(i))) n += 1
        i += 1
      }
      n
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  /**
   * Multi-probe expansion of an array of LSH bucket ids: for every
   * bucket, emit the bucket itself plus every xor-flip of up to
   * `probeBits` of its low `nBits` bits — `tables · Σ C(nBits, ≤p)`
   * longs per row in one tight loop. The `transform`+`concat` HOF
   * formulation interprets ~137 expressions per bucket (nBits=16,
   * p=2) and dominates the near-dup probe side.
   */
  case class LshProbes(child: Expression, nBits: Int, probeBits: Int)
      extends UnaryExpression with CodegenFallback {
    require(probeBits >= 0 && probeBits <= 2,
      s"probeBits must be 0..2 (got $probeBits) — wider probing needs " +
        "more mask tiers here AND makes bucket coverage near-all-pairs")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val masks: Array[Long] = {
      val b = Array.newBuilder[Long]
      b += 0L
      if (probeBits >= 1)
        for (j <- 0 until nBits) b += 1L << j
      if (probeBits >= 2)
        for (j <- 0 until nBits; k <- j + 1 until nBits)
          b += (1L << j) | (1L << k)
      b.result()
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n * masks.length)
      var i = 0
      var o = 0
      while (i < n) {
        val bucket = arr.getLong(i)
        var m = 0
        while (m < masks.length) {
          out(o) = bucket ^ masks(m)
          o += 1
          m += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // Double-hashing position schedule shared by the bloom build and
  // probe sides (Kirsch–Mitzenmacher: pos_i = h1 + i·h2 mod m, h1/h2
  // splitmix64 remixes of the input hash; h2 forced odd so the probe
  // sequence never degenerates).
  private[functions] def bloomSeed(h: Long): (Long, Long) = {
    def mix(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (mix(h), mix(h ^ 0xA5A5A5A5A5A5A5A5L) | 1L)
  }

  /** Bit positions a hash sets in a `numBits` bloom filter — the BUILD
    * side (explode → byte-index aggregation → tiny driver model). */
  case class BloomPositions(child: Expression, numBits: Int,
                            numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val (h1, h2) = bloomSeed(input.asInstanceOf[Long])
      val out = new Array[Long](numHashes)
      var i = 0
      while (i < numHashes) {
        out(i) = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** True iff every one of the hash's [[BloomPositions]] bits is set in
    * the bloom byte array — the PROBE side. Never false-negative; the
    * false-positive rate is the standard (1-e^{-kn/m})^k. */
  case class BloomContains(left: Expression, right: Expression,
                           numBits: Int, numHashes: Int)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(bloom: Any, hash: Any): Any = {
      val bytes = bloom.asInstanceOf[Array[Byte]]
      val (h1, h2) = bloomSeed(hash.asInstanceOf[Long])
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong)
        if ((bytes(pos.toInt >> 3) & (1 << (pos.toInt & 7))) == 0)
          return false
        i += 1
      }
      true
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** [[BloomContains]] with the bloom bytes carried as a `Broadcast`
    * HANDLE in the expression tree instead of a bytes column: probing
    * through a column copies the whole array (512 KB at numBits=2²²)
    * out of the UnsafeRow for EVERY probe row, which dominates the
    * scan. The handle dereferences the executor-local block once per
    * partition and the plan stays constant-size (a handle is not a
    * k-scaled literal — the model-as-data rule concerns plan/codegen
    * growth, and none occurs here). Registry builders cannot construct
    * this (a Broadcast is not a Literal), hence the
    * [[org.apache.spark.sql.ColumnIntrospection]] wrap. */
  case class BloomContainsBc(child: Expression,
                             bloomBc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                             numBits: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    @transient private lazy val bytes = bloomBc.value
    override def nullSafeEval(hash: Any): Any = {
      val (h1, h2) = bloomSeed(hash.asInstanceOf[Long])
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong)
        if ((bytes(pos.toInt >> 3) & (1 << (pos.toInt & 7))) == 0)
          return false
        i += 1
      }
      true
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Nearest-centroid cell id with the model carried as a `Broadcast`
    * HANDLE (the [[BloomContainsBc]] pattern): one pass over the k
    * cells per row, distance = ||c||² − 2·v·c (the rank-equivalent
    * [[graft.operators.SimilarityOps]] `cellDist`), accumulated in the
    * exact sequential order [[DotProduct]] uses, ties to the LOWEST
    * cell id via `Double.compare` — argmin-identical to the
    * broadcast-join + `min(struct(__d, __cell))` formulation it
    * replaces on the model-fit/ingest paths, but a NARROW projection:
    * no broadcast exchange, no ×k candidate rows, and no group-by
    * shuffle of the full vector column per assignment pass. The model
    * is `(cvec, cnorm2)` indexed BY cell id. Registry builders cannot
    * construct this (a Broadcast is not a Literal) — reached through
    * the [[org.apache.spark.sql.ColumnIntrospection]] wrap. */
  case class NearestCellBc(child: Expression,
                           modelBc: org.apache.spark.broadcast.Broadcast[
                             Array[(Array[Double], Double)]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val model = modelBc.value
    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      var best = 0
      var bestD = Double.NaN
      var c = 0
      while (c < model.length) {
        val (cv, cn2) = model(c)
        val n = math.min(x.numElements(), cv.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          s += xi * cv(i)
          i += 1
        }
        val d = cn2 - 2.0 * s
        // Double.compare mirrors Spark's DoubleType ordering (NaN
        // greatest, -0.0 < 0.0) — the struct-min tie semantics
        if (c == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; best = c
        }
        c += 1
      }
      best
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** All `m` PQ subspace codes of a vector in ONE narrow pass, the
    * codebooks carried as a `Broadcast` handle ([[NearestCellBc]]'s
    * multi-subspace sibling): code(s) = argmin over book `s` of
    * ||c||² − 2·v[s·sd..]·c, accumulated in [[DotProduct]]'s
    * sequential order with ties to the LOWEST code id — argmin-
    * identical to the subVectors-explode + broadcast-join +
    * min(struct) encode it replaces, which paid an ×m row explode and
    * two grouped shuffles of the sub-vector column per encode pass.
    * Model: `books(s)(code) = (cvec, cnorm2)`. */
  case class PqCodesBc(child: Expression,
                       booksBc: org.apache.spark.broadcast.Broadcast[
                         Array[Array[(Array[Double], Double)]]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val books = booksBc.value
    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val m = books.length
      val out = new Array[Int](m)
      var s = 0
      var off = 0
      while (s < m) {
        val book = books(s)
        val sd = if (book.isEmpty) 0 else book(0)._1.length
        var best = 0
        var bestD = Double.NaN
        var c = 0
        while (c < book.length) {
          val (cv, cn2) = book(c)
          // mirror slice(): stop at the vector's end on short inputs
          val n = math.min(math.max(x.numElements() - off, 0), sd)
          var acc = 0.0
          var i = 0
          while (i < n) {
            val xi = if (isFloat) x.getFloat(off + i).toDouble
                     else x.getDouble(off + i)
            acc += xi * cv(i)
            i += 1
          }
          val d = cn2 - 2.0 * acc
          if (c == 0 || java.lang.Double.compare(d, bestD) < 0) {
            bestD = d; best = c
          }
          c += 1
        }
        out(s) = best
        off += sd
        s += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---- Column-level API ----
  // Expressions reach the plan through the session FunctionRegistry
  // (the supported extension point; direct Column construction from an
  // Expression is private[sql] in Spark 4). register() is idempotent —
  // operators call it on their input's session before using these.

  private def intLitAt(exprs: Seq[Expression], i: Int, what: String): Int =
    exprs(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an int literal, got $other")
    }

  /** name → builder for every kernel — the single source for both the
    * per-session [[register]] path and the application-wide
    * [[graft.GraftExtensions]] injection path, so a session reached
    * either way resolves identical expressions. */
  private[graft] val kernelBuilders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_minhash" -> (exprs => MinHashSig(exprs(0),
      intLitAt(exprs, 1, "graft_minhash numHashes"))),
    "graft_simhash" -> (exprs => SimHash64(exprs(0))),
    "graft_isect_size" -> (exprs => SetIntersectSize(exprs(0), exprs(1))),
    "graft_lsh_probes" -> (exprs => LshProbes(exprs(0),
      intLitAt(exprs, 1, "graft_lsh_probes nBits"),
      intLitAt(exprs, 2, "graft_lsh_probes probeBits"))),
    "graft_sign_buckets" -> (exprs => SignBuckets(exprs(0),
      intLitAt(exprs, 1, "graft_sign_buckets dim"),
      intLitAt(exprs, 2, "graft_sign_buckets nBits"),
      intLitAt(exprs, 3, "graft_sign_buckets nTables"))),
    "graft_shingles" -> (exprs => WordShingles(exprs(0),
      intLitAt(exprs, 1, "graft_shingles n"))),
    "graft_top_shingle_frac" -> (exprs => TopShingleFraction(exprs(0),
      intLitAt(exprs, 1, "graft_top_shingle_frac n"))),
    "graft_bloom_pos" -> (exprs => BloomPositions(exprs(0),
      intLitAt(exprs, 1, "graft_bloom_pos numBits"),
      intLitAt(exprs, 2, "graft_bloom_pos numHashes"))),
    "graft_bloom_contains" -> (exprs => BloomContains(exprs(0), exprs(1),
      intLitAt(exprs, 2, "graft_bloom_contains numBits"),
      intLitAt(exprs, 3, "graft_bloom_contains numHashes"))),
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // by a registry builder in an AggregateExpression (Complete)
    "graft_bounded_min_ids" -> (exprs => BoundedMinIds(exprs(0), exprs(1),
      intLitAt(exprs, 2, "graft_bounded_min_ids cap"))),
    "graft_bloom_agg" -> (exprs => BloomBytesAgg(exprs(0),
      intLitAt(exprs, 1, "graft_bloom_agg numBits"),
      intLitAt(exprs, 2, "graft_bloom_agg numHashes"))),
    "graft_bounded_min_pairs" -> (exprs => BoundedMinPairs(exprs(0),
      exprs(1), intLitAt(exprs, 2, "graft_bounded_min_pairs cap"))))

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    // every operator entry point calls register(); skip when this
    // session already has ALL kernels (re-registration is harmless but
    // WARN-logs once per function per call — noisy in Verify/Bench)
    if (kernelBuilders.forall { case (n, _) => r.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)) })
      return
    kernelBuilders.foreach { case (n, b) =>
      r.createOrReplaceTempFunction(n, b, "built-in") }
  }

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def minhashSig(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash", shingles, lit(numHashes))
  def simhash64(tokens: Column): Column = call_function("graft_simhash", tokens)
  def wordShingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))
  def topShingleFraction(text: Column, n: Int): Column =
    call_function("graft_top_shingle_frac", text, lit(n))
  def setIntersectSize(a: Column, b: Column): Column =
    call_function("graft_isect_size", a, b)
  def lshProbes(buckets: Column, nBits: Int, probeBits: Int): Column =
    call_function("graft_lsh_probes", buckets, lit(nBits), lit(probeBits))
  def signBuckets(vec: Column, dim: Int, nBits: Int, nTables: Int): Column =
    call_function("graft_sign_buckets", vec, lit(dim), lit(nBits),
      lit(nTables))
  def bloomPositions(hash: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_pos", hash, lit(numBits), lit(numHashes))
  def bloomContains(bloom: Column, hash: Column, numBits: Int,
                    numHashes: Int): Column =
    call_function("graft_bloom_contains", bloom, hash, lit(numBits),
      lit(numHashes))
  def bloomContainsBc(hash: Column,
                      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                      numBits: Int, numHashes: Int): Column = {
    val CI = org.apache.spark.sql.ColumnIntrospection
    CI.column(BloomContainsBc(CI.expression(hash), bc, numBits, numHashes))
  }
  def nearestCellBc(vec: Column,
                    bc: org.apache.spark.broadcast.Broadcast[
                      Array[(Array[Double], Double)]]): Column = {
    val CI = org.apache.spark.sql.ColumnIntrospection
    CI.column(NearestCellBc(CI.expression(vec), bc))
  }
  def pqCodesBc(vec: Column,
                bc: org.apache.spark.broadcast.Broadcast[
                  Array[Array[(Array[Double], Double)]]]): Column = {
    val CI = org.apache.spark.sql.ColumnIntrospection
    CI.column(PqCodesBc(CI.expression(vec), bc))
  }
  def boundedMinIds(sortKey: Column, id: Column, cap: Int): Column =
    call_function("graft_bounded_min_ids", sortKey, id, lit(cap))
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_agg", hash, lit(numBits), lit(numHashes))
  def boundedMinPairs(sortKey: Column, id: Column, cap: Int): Column =
    call_function("graft_bounded_min_pairs", sortKey, id, lit(cap))
}
