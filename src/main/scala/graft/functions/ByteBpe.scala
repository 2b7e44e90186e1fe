package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact byte-level BPE token count — the pretraining-budget unit the
  * whitespace proxy ([[graft.operators.TextAnalysis.tokenCount]]) only
  * approximates. Algorithm is the published GPT-2 tokenizer shape
  * (Radford et al. 2019; Sennrich et al. 2016 "Neural Machine
  * Translation of Rare Words with Subword Units"):
  *
  *  1. pre-tokenize with the GPT-2-style alternation
  *     `" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"` (each word keeps its
  *     leading space, the Ġ convention) — the SAME regex as
  *     `TextAnalysis.bpeishTokens`, already oracle-verified against
  *     DuckDB's RE2 in `text_profile.n_bpeish`;
  *  2. split each pre-token into single-character symbols;
  *  3. repeat: find the lowest-rank adjacent symbol pair present in
  *     the merges table and fuse its LEFTMOST occurrence; stop when no
  *     pair is in the table. (Leftmost-one-at-a-time is equivalent to
  *     GPT-2's merge-all-left-to-right: fusing the leftmost occurrence
  *     leaves every non-overlapping later occurrence of the same —
  *     still best-ranked — pair to be fused on the next iterations.)
  *  4. token count = Σ over pre-tokens of surviving symbols.
  *
  * "Byte"-level: symbols start as code points; on ASCII text (the
  * fixture corpus is verified pure ASCII) code points ARE bytes, and
  * the DuckDB oracle replays the identical recursion over
  * `regexp_extract_all(w, '(?s).')` character lists. Non-ASCII input
  * still tokenizes deterministically (per code point), it just isn't
  * raw-UTF-8-byte granularity — stated caller contract, like the
  * U+0001 exclusion below.
  *
  * Scale shape: a pure row-local PROJECTION — the merges table is a
  * compile-time constant (or a small user table a caller can
  * broadcast), so token counting adds no shuffle, no explode, and no
  * driver state to whatever aggregation sits above it; at 100 TB the
  * budget rollup is one map-side-combined groupBy exactly like the
  * whitespace-proxy path it upgrades. Per-thread word→count memo:
  * natural corpora repeat words heavily (GPT-2's reference encoder
  * carries the same cache), and the memo makes the amortized cost one
  * HashMap probe per word.
  *
  * Oracle parity notes: the DuckDB replay keys merge lookups as
  * `a || chr(1) || b`, so text containing U+0001 is outside the
  * cross-engine contract (the engine itself is indifferent — it
  * compares pair components directly).
  */
case class BpeTokenCount(child: Expression,
    merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count needs string, got ${other.sql}")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // first occurrence wins, matching list_position in the oracle
      m.putIfAbsent(a + '\u0001' + b, Integer.valueOf(i + 1))
    }
    m
  }

  // per-thread memo: BPE is a pure function of the pre-token, and the
  // expression tree (hence `ranks`) is shared across a task thread's
  // rows. Bounded: cleared when it reaches 1 << 16 entries.
  @transient private lazy val memo: ThreadLocal[
      java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer]())

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  /** The whole per-row loop — shared by the interpreted eval and the
    * generated projection, which calls it through an object reference
    * on the unboxed UTF8String so the surrounding whole-stage span
    * stays fused (the SimHash64/MinHashSig recipe, round 11; object
    * reference instead of a static because the merges table is
    * per-expression state).
    */
  def count(input: UTF8String): Long = {
    val text = input.toString
    val m = ByteBpe.preToken.matcher(text)
    var total = 0L
    val cache = memo.get()
    if (cache.size > (1 << 16)) cache.clear()
    while (m.find()) {
      val w = m.group()
      val hit = cache.get(w)
      val n =
        if (hit != null) hit.intValue()
        else {
          val v = ByteBpe.countSymbols(w, ranks)
          cache.put(w, v)
          v
        }
      total += n
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this,
      classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeTokenCount = copy(child = newChild)
}

/** Full byte-level BPE tokenization — the token-ID stream a training
  * pipeline materializes, under the same merges table and recursion
  * as [[BpeTokenCount]] (`size(bpe_encode(x)) == bpe_token_count(x)`
  * by construction; a spec pins it).
  *
  * ID scheme is the published GPT-2 layout: single-symbol tokens get
  * their code point, the product of merge rank i (1-based) gets
  * `256 + (i - 1)` — i.e. base alphabet first, then one new vocab
  * entry per merge in learned order. If two merges would produce the
  * same product string, the FIRST rank wins (same first-wins rule as
  * the rank table itself; the oracle's `list_position` has identical
  * semantics). Caller contract: on ASCII text (the oracle fixture is
  * verified pure ASCII) the two ID ranges are disjoint; non-ASCII
  * single-codepoint symbols ≥ U+0100 share the merged-ID space —
  * real byte-level deployments map bytes to a 256-symbol alphabet
  * first (Radford et al.'s byte-to-unicode table), which composes
  * with this expression unchanged.
  *
  * Scale shape: identical to [[BpeTokenCount]] — a row-local
  * projection with a per-thread pre-token memo, no shuffle, no
  * driver state; emitting IDs instead of a count changes only the
  * output width.
  */
case class BpeEncode(child: Expression,
    merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs string, got ${other.sql}")
    }

  @transient private lazy val ranks = ByteBpe.rankMap(merges)
  @transient private lazy val ids = ByteBpe.productIds(merges)

  @transient private lazy val memo: ThreadLocal[
      java.util.HashMap[String, Array[Int]]] =
    ThreadLocal.withInitial(
      () => new java.util.HashMap[String, Array[Int]]())

  override protected def nullSafeEval(input: Any): Any =
    encodeIds(input.asInstanceOf[UTF8String])

  /** Shared per-row loop (interpreted eval + generated projection via
    * object reference — see [[BpeTokenCount.count]]).
    */
  def encodeIds(input: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val text = input.toString
    val m = ByteBpe.preToken.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val cache = memo.get()
    if (cache.size > (1 << 16)) cache.clear()
    while (m.find()) {
      val w = m.group()
      var toks = cache.get(w)
      if (toks == null) {
        toks = ByteBpe.encode(w, ranks)
          .map(s => ByteBpe.idOf(s, ids)).toArray
        cache.put(w, toks)
      }
      var i = 0
      while (i < toks.length) { out += toks(i); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.encodeIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeEncode = copy(child = newChild)
}

/** Inverse of [[BpeEncode]] — token IDs back to text, closing the
  * tokenizer surface (encode → pack → train-loader → DECODE for
  * inspection/eval): id ≥ 256 with a merge product at rank id−256
  * yields that product string; any other id yields its UTF-16 code
  * unit. Byte-level BPE is lossless, so `decode(encode(s)) == s`
  * holds exactly (property spec) for every `s` whose characters
  * avoid [[BpeEncode]]'s stated ID-collision band — code units in
  * `[256, 256 + merges.size)` share the merged-ID space (the oracle
  * fixture is verified pure ASCII; real byte-level deployments map
  * bytes through Radford et al.'s byte-to-unicode table first, which
  * composes with both expressions unchanged) — and whose text
  * survives the GPT-2 pre-tokenizer (runs of spaces beyond each
  * word's single leading space are outside the alternation and drop;
  * single-spaced corpora roundtrip bit-exact, non-BMP characters
  * included, since code-unit emission reassembles surrogate pairs on
  * concatenation).
  *
  * Scale shape: row-local projection like its inverse — the id→text
  * table is expression state, no shuffle, no driver state.
  */
case class BpeDecode(child: Expression,
    merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode needs array<int>, got ${other.sql}")
    }

  @transient private lazy val products: Array[String] =
    merges.map { case (a, b) => a + b }.toArray

  override protected def nullSafeEval(input: Any): Any =
    decodeIds(input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData])

  /** Shared per-row loop (interpreted eval + generated projection via
    * object reference — see [[BpeTokenCount.count]]). A null array
    * element is skipped — it decodes as empty (the encoder never emits
    * one, `containsNull = false` upstream; the explicit isNullAt guard
    * keeps that contract true for hand-built arrays too, where
    * ArrayData.getInt on a null slot would otherwise read 0 and append
    * U+0000 — r13 ADVICE).
    */
  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData)
      : UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) { i += 1 }
      else {
      val id = ids.getInt(i)
      if (id >= 256 && id - 256 < products.length)
        sb.append(products(id - 256))
      else sb.append(id.toChar)
      i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecode", this,
      classOf[BpeDecode].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.decodeIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeDecode = copy(child = newChild)
}

object ByteBpe {

  /** GPT-2-style pre-tokenizer — MUST stay textually identical to
    * `TextAnalysis.bpeishTokens` and the oracle's regex.
    */
  private[functions] val preToken: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+")

  /** Apply the merge recursion to one pre-token; returns the surviving
    * symbol count. Exposed for the spec (and [[encode]] below shows
    * the actual symbols for test-vector assertions).
    */
  private[functions] def countSymbols(w: String,
      ranks: java.util.HashMap[String, Integer]): Int =
    encode(w, ranks).size

  /** The full tokenization of one pre-token (spec surface; the
    * expression only needs the count).
    */
  private[graft] def encode(w: String,
      ranks: java.util.HashMap[String, Integer]): Vector[String] = {
    var syms = w.map(_.toString).toVector
    var done = syms.size <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms(i) + '\u0001' + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = i
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        syms = (syms.take(bestPos) :+
          (syms(bestPos) + syms(bestPos + 1))) ++
          syms.drop(bestPos + 2)
        if (syms.size <= 1) done = true
      }
    }
    syms
  }

  private[graft] def rankMap(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + '\u0001' + b, Integer.valueOf(i + 1))
    }
    m
  }

  /** Deterministic fixture merges table, priority = list order — a
    * hand-picked BPE-learned-style English vocabulary small enough for
    * the DuckDB oracle to replay the recursion verbatim (the oracle
    * inlines this exact list via [[mergesSqlList]]). Production use
    * passes a real learned merges file through the same expression;
    * nothing below is specific to the fixture size.
    *
    * Shape mirrors a real learned table: high-frequency 2-char pairs
    * first, then compounds over earlier merge products (th+e, in+g,
    * an+d), then Ġ-style space-prefixed word starts, digit and
    * punctuation runs.
    */
  val fixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "h" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u", "i" -> "t",
    "i" -> "s", "t" -> "o", "a" -> "l", "n" -> "g", "e" -> "d",
    "l" -> "l", "o" -> "o", "e" -> "e", "o" -> "w", "a" -> "s",
    "l" -> "e", "c" -> "o", "d" -> "e", "s" -> "e", "m" -> "e",
    "th" -> "e", "in" -> "g", "an" -> "d", "er" -> "e", "at" -> "a",
    " " -> "t", " t" -> "h", " th" -> "e", " " -> "a", " " -> "o",
    " " -> "i", " " -> "s", " " -> "w", " " -> "b", " " -> "c",
    " " -> "d", " " -> "f", " " -> "p", " " -> "m", " " -> "r",
    "0" -> "0", "1" -> "0", "." -> ".", ".." -> ".")

  /** The fixture merges rendered as the DuckDB list literal the oracle
    * SQL cross-joins — single source of truth for both engines. Keys
    * are `a || chr(1) || b`; U+0027 in symbols would need escaping but
    * the fixture has none (asserted).
    */
  def mergesSqlList: String = mergesSqlListOf(fixtureMerges)

  private def sqlSafe(ms: Seq[(String, String)]): Unit =
    require(ms.forall { case (a, b) =>
      !(a + b).exists(c => c == '\'' || c == '\u0001')
    }, "merges must be SQL-literal-safe")

  /** [[mergesSqlList]] for an arbitrary merges table (the
    * byte-alphabet-mapped fixture uses this).
    */
  def mergesSqlListOf(ms: Seq[(String, String)]): String = {
    sqlSafe(ms)
    ms.map { case (a, b) => s"'$a'||chr(1)||'$b'" }
      .mkString("[", ", ", "]")
  }

  /** The fixture merges with every symbol passed through the
    * byte-to-unicode alphabet ([[ByteAlphabet.mapString]]) — the
    * merges table that drives BPE over MAPPED text: ASCII letters and
    * punctuation keep their identity, the space prefix of the
    * Ġ-style merges becomes its U+E020 alphabet char, so the same
    * linguistic merges fire on the alphabet image. Single source of
    * truth for the engine and (via [[mergesSqlListMapped]] /
    * [[productsSqlListMapped]]) the oracle.
    */
  lazy val fixtureMergesMapped: Seq[(String, String)] =
    fixtureMerges.map { case (a, b) =>
      (ByteAlphabet.mapString(a), ByteAlphabet.mapString(b))
    }

  def mergesSqlListMapped: String =
    mergesSqlListOf(fixtureMergesMapped)

  def productsSqlListMapped: String = {
    sqlSafe(fixtureMergesMapped)
    fixtureMergesMapped.map { case (a, b) => s"'${a + b}'" }
      .mkString("[", ", ", "]")
  }

  /** First-wins map from merge-product string to its token ID
    * (`256 + 0-based first rank`) — see [[BpeEncode]]'s ID scheme.
    */
  private[graft] def productIds(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, Integer.valueOf(256 + i))
    }
    m
  }

  /** Token ID of one surviving symbol under [[BpeEncode]]'s scheme. */
  private[graft] def idOf(sym: String,
      products: java.util.HashMap[String, Integer]): Int =
    if (sym.length == 1) sym.charAt(0).toInt
    else products.get(sym).intValue()

  /** The fixture merge PRODUCTS as a DuckDB list literal (order =
    * merge rank), for the oracle's `255 + list_position(...)` ID
    * rule — `list_position` returns the FIRST match, mirroring
    * [[productIds]]'s putIfAbsent.
    */
  def productsSqlList: String = {
    require(fixtureMerges.forall { case (a, b) =>
      !(a + b).exists(c => c == '\'' || c == '\u0001')
    }, "fixture merges must be SQL-literal-safe")
    fixtureMerges.map { case (a, b) => s"'${a + b}'" }
      .mkString("[", ", ", "]")
  }

  /** Column entry point: exact BPE token count of `text` under
    * `merges` (defaults to the fixture table).
    */
  def bpeTokenCount(text: Column,
      merges: Seq[(String, String)] = fixtureMerges): Column =
    Shims.column(BpeTokenCount(Shims.expression(text), merges))

  /** Column entry point: full BPE token-ID stream of `text` under
    * `merges` (defaults to the fixture table).
    */
  def bpeEncode(text: Column,
      merges: Seq[(String, String)] = fixtureMerges): Column =
    Shims.column(BpeEncode(Shims.expression(text), merges))

  /** Column entry point: token IDs back to text ([[BpeDecode]]),
    * under `merges` (defaults to the fixture table).
    */
  def bpeDecode(ids: Column,
      merges: Seq[(String, String)] = fixtureMerges): Column =
    Shims.column(BpeDecode(Shims.expression(ids), merges))
}
