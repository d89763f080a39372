package graft.expressions

import org.apache.spark.QueryContext
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, SupportQueryContext, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the per-document text-dedup hot path.
  *
  * The higher-order-function formulations are interpreted per array element
  * (LambdaFunction bodies never reach codegen), which made MinHash ~4M and
  * SimHash ~16M interpreted node evaluations at sf0.1. These expressions
  * evaluate once per row with tight JVM loops instead. They use
  * CodegenFallback deliberately: per-row eval cost is the loop itself, and
  * these sit in per-document projections (thousands of rows), not the
  * millions-of-rows join paths where full codegen matters
  * (cf. [[DotProductDouble]]).
  *
  * Arithmetic is IDENTICAL to the HOF forms (and to the DuckDB oracle SQL):
  * same hash inputs, same (a·h+b) mod p permutations, same majority-vote
  * bits — results stay hash-equal.
  */

/** Distinct word n-gram shingles (space-joined, first-occurrence order —
  * matching transform+array_distinct semantics). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      var first = true
      while (j < n) {
        // null tokens are skipped without a separator — concat_ws semantics,
        // matching the HOF formulation this kernel replaces
        if (!toks.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a pre-hashed shingle array:
  * sig_k = min_h (a_k·h + b_k) mod p. Null for empty input (matching the
  * guarded HOF form). */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null result for empty/all-null input regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val k = as.length
    val out = new Array[Long](k)
    var any = false
    var ki = 0
    while (ki < k) {
      val a = as(ki); val b = bs(ki)
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        // null slots are skipped (array_min semantics in the HOF form);
        // inputs are 28-bit hashes and a,b < 2^31 → a*h+b < 2^60, no
        // overflow; all positive so % equals pmod
        if (!hs.isNullAt(i)) {
          val x = (hs.getLong(i) * a + b) % p
          if (x < best) best = x
          any = true
        }
        i += 1
      }
      out(ki) = best
      ki += 1
    }
    if (!any) null else new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash over pre-hashed tokens: bit b set iff a strict majority
  * of token hashes have bit b set. */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val counts = new Array[Int](60)
    var nonNull = 0
    var i = 0
    while (i < m) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 60) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        nonNull += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 > nonNull) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer) — the canonical-
  * composition pass every text-curation pipeline runs before hashing or
  * dedup: "é" as U+0065+U+0301 and as U+00E9 must fingerprint identically
  * or every downstream exact/near-dup operator silently treats canonically
  * equal documents as distinct. Spark has no builtin for this; the JDK
  * normalizer is the reference implementation of UAX #15, so results agree
  * with any conforming engine (DuckDB's `nfc_normalize` oracles it).
  *
  * Fast path: `isNormalized` is a cheap quick-check scan (true for all
  * ASCII), so the common case allocates nothing — at 100 TB the normalizer
  * only pays composition work on the rows that actually need it. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared scaffolding for the binary string-array kernels below: the
  * array<string>-pair type check and the codegen shape (delegate to a
  * static [[TextKernels]] JVM loop inside whole-stage codegen — the
  * [[DotProductDouble]] doctrine for join-path kernels, unlike the
  * per-document CodegenFallback expressions above). */
trait StringArrayPairExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** DISTINCT-set Jaccard of two string arrays in one pass per side:
  * |distinct(A) ∩ distinct(B)| / |distinct(A) ∪ distinct(B)| — exactly
  * size(array_intersect(a,b)) / size(array_union(a,b)) for ARBITRARY
  * inputs (duplicates collapse, a null element counts once), which is
  * what licenses [[RewriteSetSimilarity]] to substitute this kernel for
  * the built-in idiom wherever it appears. Intersection by hash-set
  * probe, union by the inclusion–exclusion identity |A|+|B|−|A∩B| over
  * the DISTINCT counts. The one edge is two EMPTY arrays (a 0/0
  * division in the built-in idiom): `failOnError` carries the matched
  * Divide's eval mode through the rewrite — ANSI divisions raise the
  * same DIVIDE_BY_ZERO the built-in raises (with the expression's query
  * context in the message), while legacy division and try_divide get
  * NULL, the value those modes produce (null-propagating, unlike NaN,
  * which would poison aggregates). Direct kernel calls default to the
  * lenient NULL — the operators filter empty shingle sets and pin that
  * contract in their oracles. The built-in pair allocates and
  * materializes TWO result arrays per row; this kernel allocates two
  * sets and no arrays. It sits on the LSH verification path — millions
  * of candidate pairs on a dup-storm corpus. */
case class DistinctSetJaccard(left: Expression, right: Expression,
                              failOnError: Boolean = false)
    extends StringArrayPairExpression with SupportQueryContext {

  override def dataType: DataType = DoubleType
  // NULL on null input OR (lenient mode) two empty arrays
  override def nullable: Boolean = true
  override def prettyName: String = "distinct_set_jaccard"

  override def initQueryContext(): Option[QueryContext] =
    if (failOnError) Some(origin.context) else None

  override def nullSafeEval(a: Any, b: Any): Any = {
    val j = TextKernels.distinctJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(j)) {
      if (failOnError) {
        throw org.apache.spark.sql.graftx.ErrorBridge
          .divideByZeroError(getContextOrNull())
      }
      null
    } else j
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, { (a, b) =>
      // the ratio of non-negative counts is NaN iff 0/0 (two empty
      // distinct sets) — route that to the mode's 0/0 channel
      val onZero =
        if (failOnError) {
          val errorContext = getContextOrNullCode(ctx)
          "throw org.apache.spark.sql.graftx.ErrorBridge" +
            s".divideByZeroError($errorContext);"
        } else s"${ev.isNull} = true;"
      s"""
         |${ev.value} = graft.expressions.TextKernels.distinctJaccard($a, $b);
         |if (Double.isNaN(${ev.value})) { $onZero }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |distinct(A) ∩ distinct(B)| of two string arrays — exactly
  * size(array_intersect(a,b)) for ARBITRARY inputs. The
  * asymmetric-containment verification kernel (containment = overlap
  * over whatever denominator the caller writes; |A| is an O(1) size
  * read, so only the intersection needs a pass). Same doctrine and same
  * hash-set loop as [[DistinctSetJaccard]]. */
case class DistinctSetOverlap(left: Expression, right: Expression)
    extends StringArrayPairExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "distinct_set_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.distinctOverlap(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.TextKernels.distinctOverlap($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernels callable from generated code. */
object TextKernels {
  /** See [[DistinctSetOverlap]]: |distinct(A) ∩ distinct(B)|, duplicate-
    * safe. Build a set over the smaller side, then count REMOVALS while
    * walking the other — removal both dedupes the probe side and counts
    * each common element exactly once; the set-emptied early exit bounds
    * pathological long-probe rows. Null elements participate as a single
    * set member (HashSet admits null), matching array_intersect. */
  def distinctOverlap(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    val (s, l, ns, nl) = if (nx <= ny) (x, y, nx, ny) else (y, x, ny, nx)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) {
      set.add(if (s.isNullAt(i)) null else s.getUTF8String(i))
      i += 1
    }
    var inter = 0
    i = 0
    while (i < nl && !set.isEmpty) {
      if (set.remove(if (l.isNullAt(i)) null else l.getUTF8String(i))) inter += 1
      i += 1
    }
    inter
  }

  /** See [[DistinctSetJaccard]]: distinct intersection and distinct
    * union (inclusion–exclusion over the DISTINCT counts), duplicate-
    * safe — |setA| is read off the built set, B's distinct count and the
    * common count accumulate in one walk guarded by a B-side set. */
  def distinctJaccard(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    val setA = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) {
      setA.add(if (x.isNullAt(i)) null else x.getUTF8String(i))
      i += 1
    }
    val da = setA.size
    val setB = new java.util.HashSet[UTF8String](ny * 2)
    var inter = 0
    var db = 0
    i = 0
    while (i < ny) {
      val e = if (y.isNullAt(i)) null else y.getUTF8String(i)
      if (setB.add(e)) {
        db += 1
        if (setA.contains(e)) inter += 1
      }
      i += 1
    }
    inter.toDouble / (da + db - inter)
  }
}

/** Stopword-vote language ID (optimization round 19, guide §4): one pass
  * over the token array testing membership in each language's stopword
  * set, then argmax with declaration-order tie-break; null (caller
  * coalesces to "und") on null input, "und" on zero votes. Replaces the
  * `aggregate` HOF formulation whose per-token lambda (CreateArray +
  * 5 CaseWhen/In) evaluated interpreted — stack-sampled at ~10 s of task
  * CPU per streaming-ingest lifecycle at sf0.1. Vote counts, tie-break,
  * and null-token handling (no vote — `isin` semantics) are identical. */
case class LangIdVotes(child: Expression, langs: Seq[String],
                       words: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"expected array<string>, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "langid_votes"

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    words.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  @transient private lazy val langU: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray
  @transient private lazy val und = UTF8String.fromString("und")

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val k = sets.length
    val votes = new Array[Int](k)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (sets(j).contains(t)) votes(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var best = 0
    var j = 0
    while (j < k) { if (votes(j) > best) best = votes(j); j += 1 }
    if (best == 0) und
    else {
      j = 0
      while (votes(j) != best) j += 1 // first hit = declaration order
      langU(j)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Doc-grain excision kernel (optimization round 19, guide §2.3/§8:
  * decide on metadata, keep heavy rows in place). Inputs: this document's
  * token array and its span starts as `array<struct<p,e>>` — 1-based
  * half-open token intervals `[p, e)`, any order, overlaps allowed.
  * Output: `struct(n_kept int, cleaned string)` — the tokens OUTSIDE the
  * interval union, space-joined in position order.
  *
  * Replaces the token-grain formulation of
  * [[graft.operators.SuffixArray.removeCoveredTokens]] (posexplode →
  * (doc_id,pos) join → per-doc running-max window → sorted collect_list
  * rebuild — four token-grain exchanges per call) with per-document
  * arithmetic: sort the (tiny) span set, one linear merge over spans +
  * tokens. An `aggregate` HOF could do the same merge but accumulates
  * immutable arrays — O(spans · kept) copying, quadratic exactly on the
  * span-dense documents (a fully-duplicated document makes every
  * position a span start); the kernel is O(spans log spans + tokens).
  * Null tokens are skipped without a separator (array_join semantics,
  * matching the collect_list rebuild this replaces). */
case class ExciseCovered(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StructType(f), _))
          if f.length == 2 && f.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (array<string>, array<struct<bigint,bigint>>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))
  override def prettyName: String = "excise_covered"

  override def nullSafeEval(toksV: Any, spansV: Any): Any = {
    val toks = toksV.asInstanceOf[ArrayData]
    val spans = spansV.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val k = spans.numElements()
    val ps = new Array[Long](k)
    val es = new Array[Long](k)
    var i = 0
    while (i < k) {
      val row = spans.getStruct(i, 2)
      ps(i) = row.getLong(0)
      es(i) = row.getLong(1)
      i += 1
    }
    // sort spans by start (callers pass collect_list output — unordered)
    val idx = Array.tabulate(k)(java.lang.Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Long.compare(ps(a), ps(b)))
    val sb = new java.lang.StringBuilder()
    var kept = 0
    // append tokens [from, untilEx) — 1-based half-open
    def appendRange(from: Long, untilEx: Long): Unit = {
      var p = math.max(from, 1L)
      val end = math.min(untilEx, n + 1L)
      while (p < end) {
        val j = (p - 1).toInt
        if (!toks.isNullAt(j)) {
          if (sb.length() > 0) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
        }
        kept += 1
        p += 1
      }
    }
    var cur = 1L
    i = 0
    while (i < k) {
      val s = ps(idx(i)); val e = es(idx(i))
      if (s > cur) appendRange(cur, s)
      if (e > cur) cur = e
      i += 1
    }
    if (cur <= n) appendRange(cur, n + 1L)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](kept, UTF8String.fromString(sb.toString)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  def langIdVotes(toks: Column, langs: Seq[String],
                  words: Seq[Seq[String]]): Column =
    ColumnBridge.column(LangIdVotes(
      ColumnBridge.expression(toks), langs, words))
  def exciseCovered(toks: Column, spans: Column): Column =
    ColumnBridge.column(ExciseCovered(
      ColumnBridge.expression(toks), ColumnBridge.expression(spans)))
  def wordShingles(toks: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), n))
  def minhashSignature(hashes: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), as, bs, p))
  def simhash60(hashes: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(hashes)))
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def distinctSetJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(DistinctSetJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def distinctSetOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(DistinctSetOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
