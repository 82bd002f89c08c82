package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-compat functions that a TEXT rewrite cannot bridge (VERDICT r8
  * item 1): the blockers are type-ambiguity (`len` means `length` on
  * strings but `size` on lists — undecidable without the schema) and
  * part-literal dispatch (`date_diff('month', …)` counts boundary
  * crossings, a composition with no single Spark twin). Registering
  * session functions solves both: analysis-time expressions see child
  * dataTypes, and function builders see literal arguments at parse time.
  *
  * [[DuckDialect.sql]] registers these (idempotently) before its first
  * parse attempt, so a reference user's `len(col)` — the single most
  * common DuckDB spelling (reference surface: delta-unity-duckdb.js
  * :330-339 accepts arbitrary DuckDB SQL) — resolves directly instead of
  * landing in the guidance table.
  *
  * Semantics verified against the installed DuckDB (values noted per
  * function). Documented type divergences, mirroring the quantile_disc
  * precedent: DuckDB's `list_sum` over integers returns HUGEINT (int128)
  * — here it is BIGINT, overflowing at ±2⁶³ instead of ±2¹²⁷; DECIMAL
  * element sums widen to DOUBLE.
  *
  * Scale note: every expression here is a per-row scalar over an
  * already-materialized array column — no shuffle, no driver state; all
  * are whole-stage-codegen'd (no CodegenFallback in the set except the
  * composed ArrayFilter for `list_aggregate('count')`, which Spark
  * itself ships as CodegenFallback — acceptable for a dialect-compat
  * path that is never inside a graft operator's hot loop).
  */
object DuckCompat {

  /** Bytes sampled from the head of the first file by the CSV sniffer. */
  private val SniffSampleBytes: Int = 64 * 1024

  /** DuckDB-style CSV dialect sniffer (r13, VERDICT r12 item 3) over a
    * head sample of the file: returns Some((delimiter, header)) when the
    * dialect is UNAMBIGUOUS, None otherwise (the caller refuses with
    * guidance — a mis-sniffable input must never get a silently
    * different parse). The accepted subset mirrors the installed
    * DuckDB's observed behavior, pinned by DuckCompatMatrixR13b:
    *
    *  - DELIMITER: candidates , ; | \t parsed RFC-quote-aware ('"'
    *    quote, '""' escape, quote honored at field start). A candidate
    *    is viable when every sampled line parses cleanly to the SAME
    *    field count >= 2. Exactly one viable -> chosen. None viable ->
    *    single-column mode when every candidate consistently yields one
    *    field per line (DuckDB's own fallback — a ','-ragged file reads
    *    as one VARCHAR column); otherwise None. MULTIPLE viable -> None:
    *    DuckDB breaks such ties by candidate order (verified: ','
    *    beats ';' on `a,b;c`), but any file hitting the tie is
    *    delimiter-junk and a refusal is safer than a coin-flip parse.
    *  - HEADER (DuckDB's documented rule, all branches verified):
    *    column classes are probed over the data rows (rows 2+; the
    *    sole row of a one-line file probes itself); if every column is
    *    VARCHAR the first row is the header (verified: `foo;bar\nbaz;
    *    qux` -> header foo/bar, and a one-line `foo,bar` file is ALL
    *    header); otherwise the first row is the header iff some typed
    *    column's first-row value does not conform to the class
    *    (verified: `1,alice,3.5` rows -> headerless column0..N).
    *    Conformance classes mirror DuckDB's sniffer on sane values
    *    (trimmed; BIGINT without '+' — `+4` is VARCHAR there, verified
    *    — DOUBLE with ./exponent forms, DATE/TIME/TIMESTAMP digit
    *    shapes, BOOLEAN true/false/t/f); exotic tokens (Infinity,
    *    underscore groups) may class differently and can flip the
    *    header guess on adversarial files — the same residual-risk
    *    class as the documented inferSchema width divergence. */
  private[graft] def sniffCsv(sample: Array[Byte],
      restOfFile: Option[() => java.io.InputStream] = None)
      : Option[(String, Boolean)] = {
    val raw = new String(sample, java.nio.charset.StandardCharsets.UTF_8)
    // a full sample buffer likely cut mid-line — drop the partial tail
    val cut =
      if (sample.length >= SniffSampleBytes && !raw.endsWith("\n")) {
        val k = raw.lastIndexOf('\n'); if (k < 0) return None else k
      } else raw.length
    val lines = raw.substring(0, cut).split("\r\n|\n|\r", -1).toSeq
      .filter(_.nonEmpty).take(100)
    if (lines.isEmpty) return None
    def fields(line: String, d: Char): Option[Seq[String]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new java.lang.StringBuilder
      var inQ = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (inQ) {
          if (c == '"') {
            if (i + 1 < line.length && line.charAt(i + 1) == '"') {
              cur.append('"'); i += 1
            } else inQ = false
          } else cur.append(c)
        } else if (c == '"' && cur.length == 0) inQ = true
        else if (c == d) { out += cur.toString; cur.setLength(0) }
        else cur.append(c)
        i += 1
      }
      if (inQ) None else { out += cur.toString; Some(out.toSeq) }
    }
    val cands = Seq(',', ';', '|', '\t').flatMap { d =>
      val parsed = lines.map(fields(_, d))
      if (parsed.exists(_.isEmpty)) Nil
      else {
        val counts = parsed.map(_.get.length).distinct
        if (counts.length == 1) Seq((d, counts.head, parsed.map(_.get)))
        else Nil
      }
    }
    val (delim, ncols, rows) = cands.filter(_._2 >= 2) match {
      case Seq(one) => one
      case Seq() if cands.nonEmpty && cands.forall(_._2 == 1) =>
        // single-column fallback (DuckDB's own: a file no dialect splits
        // consistently reads as one VARCHAR column of whole lines) —
        // the reader needs a separator that CANNOT occur, or Spark
        // would split what DuckDB didn't. r14 (ADVICE): absence from
        // the 64 KB head sample proves nothing about the rest of the
        // file, so when the sample is partial the caller passes an
        // opener and we stream the WHOLE file (decompressed, for gz)
        // before committing to a synthetic byte — a later occurrence
        // would otherwise split lines DuckDB reads whole, silently.
        def absentEverywhere(c: Char): Boolean =
          !raw.contains(c) && restOfFile.forall { mk =>
            val in = mk()
            try {
              var b = in.read()
              while (b >= 0 && b != c.toInt) b = in.read()
              b < 0
            } finally in.close()
          }
        val d = "\u0001\u0007\u001f".find(absentEverywhere)
          .getOrElse(return None)
        (d, 1, lines.map(Seq(_)))
      case _ => return None // ambiguous tie or ragged under every dialect
    }
    val LongRe = """-?\d+""".r
    val DoubleRe = """-?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?""".r
    val DateRe = """\d{4}-\d{1,2}-\d{1,2}""".r
    val TsRe = """\d{4}-\d{1,2}-\d{1,2}[ T]\d{1,2}:\d{2}(:\d{2}(\.\d+)?)?""".r
    val TimeRe = """\d{1,2}:\d{2}(:\d{2}(\.\d+)?)?""".r
    val BoolRe = """(?i)(true|false|t|f)""".r
    def conforms(v0: String, cls: Int): Boolean = {
      val v = v0.trim
      if (v.isEmpty) true // null conforms to every class
      else cls match {
        case 0 => LongRe.matches(v)
        case 1 => DoubleRe.matches(v) // plain ints cast to DOUBLE too;
        // class order (long before double) keeps pure-int columns BIGINT
        case 2 => DateRe.matches(v)
        case 3 => TsRe.matches(v)
        case 4 => TimeRe.matches(v)
        case 5 => BoolRe.matches(v)
        case _ => true // 6 = varchar
      }
    }
    val dataRows = if (rows.length >= 2) rows.tail else rows
    val classes = (0 until ncols).map { c =>
      val vs = dataRows.map(r => r(c).trim).filter(_.nonEmpty)
      if (vs.isEmpty) 6
      else (0 to 5).find(k => vs.forall(conforms(_, k))).getOrElse(6)
    }
    val header =
      if (classes.forall(_ == 6)) true
      else (0 until ncols).exists(c =>
        classes(c) != 6 && !conforms(rows.head(c), classes(c)))
    Some((delim.toString, header))
  }

  /** DuckDB `len(x)`: BIGINT character count for strings (len('héllo')=5
    * — CHARS, where strlen is octets), element count for lists. DuckDB
    * rejects MAP and numeric inputs (verified) — so does this. */
  case class DuckLen(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      // NullType: a bare len(NULL) is NULL in DuckDB too
      case _: StringType | _: ArrayType | NullType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"len expects STRING or ARRAY, got ${t.sql} (DuckDB's len is " +
          "undefined there too; use length/size/cardinality)")
    }
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = child.dataType match {
      case _: StringType => v.asInstanceOf[UTF8String].numChars().toLong
      case _ => v.asInstanceOf[ArrayData].numElements().toLong
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      child.dataType match {
        case _: StringType =>
          defineCodeGen(ctx, ev, c => s"(long) $c.numChars()")
        case _ =>
          defineCodeGen(ctx, ev, c => s"(long) $c.numElements()")
      }
    override def prettyName: String = "len"
    override protected def withNewChildInternal(c: Expression): DuckLen =
      copy(child = c)
  }

  /** Shared numeric-array fold: NULL elements are SKIPPED (DuckDB:
    * list_sum([1,NULL,3])=4) and an empty / all-NULL list yields NULL
    * (list_sum([])=NULL, verified) — hence nullable and nullSafeCodeGen
    * with an explicit isNull store. */
  sealed abstract class ListFold extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY of numeric, got ${t.sql}")
    }
    override def nullable: Boolean = true
    protected lazy val elemType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType
    /** Java source reading element `$i` of ArrayData `$c` as double/long. */
    protected def getter(c: String, i: String): String = elemType match {
      case ByteType => s"(long) $c.getByte($i)"
      case ShortType => s"(long) $c.getShort($i)"
      case IntegerType => s"(long) $c.getInt($i)"
      case LongType => s"$c.getLong($i)"
      case FloatType => s"(double) $c.getFloat($i)"
      case DoubleType => s"$c.getDouble($i)"
      case d: DecimalType =>
        s"$c.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
    protected def elemAsDouble(a: ArrayData, i: Int): Double = elemType match {
      case ByteType => a.getByte(i).toDouble
      case ShortType => a.getShort(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case LongType => a.getLong(i).toDouble
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
  }

  /** DuckDB `list_sum(x)` / `list_aggregate(x, 'sum')`. Integral
    * elements sum as BIGINT (DuckDB: HUGEINT — divergence documented
    * above), fractional/decimal as DOUBLE. */
  case class DuckListSum(child: Expression) extends ListFold {
    override def dataType: DataType = elemType match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case _ => DoubleType
    }
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      var seen = false
      if (dataType == LongType) {
        var s = 0L
        while (i < n) {
          if (!arr.isNullAt(i)) { seen = true; s += elemAsLong(arr, i) }
          i += 1
        }
        if (seen) s else null
      } else {
        var s = 0.0
        while (i < n) {
          if (!arr.isNullAt(i)) { seen = true; s += elemAsDouble(arr, i) }
          i += 1
        }
        if (seen) s else null
      }
    }
    private def elemAsLong(a: ArrayData, i: Int): Long = elemType match {
      case ByteType => a.getByte(i).toLong
      case ShortType => a.getShort(i).toLong
      case IntegerType => a.getInt(i).toLong
      case LongType => a.getLong(i)
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val jt = if (dataType == LongType) "long" else "double"
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val seen = ctx.freshName("seen")
        s"""
          |int $n = $c.numElements();
          |$jt $s = ($jt) 0; boolean $seen = false;
          |for (int $i = 0; $i < $n; $i++) {
          |  if (!$c.isNullAt($i)) { $seen = true; $s += ${getter(c, i)}; }
          |}
          |if ($seen) { ${ev.value} = $s; } else { ${ev.isNull} = true; }
        """.stripMargin
      })
    override def prettyName: String = "list_sum"
    override protected def withNewChildInternal(c: Expression): DuckListSum =
      copy(child = c)
  }

  /** DuckDB `list_avg(x)` / `list_aggregate(x, 'avg')`: DOUBLE mean of
    * the non-NULL elements; NULL when there are none (verified:
    * list_avg([1,NULL,2])=1.5, list_avg([])=NULL). */
  case class DuckListAvg(child: Expression) extends ListFold {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      var cnt = 0L
      var s = 0.0
      while (i < n) {
        if (!arr.isNullAt(i)) { cnt += 1; s += elemAsDouble(arr, i) }
        i += 1
      }
      if (cnt > 0) s / cnt else null
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val cnt = ctx.freshName("cnt")
        s"""
          |int $n = $c.numElements();
          |double $s = 0.0; long $cnt = 0L;
          |for (int $i = 0; $i < $n; $i++) {
          |  if (!$c.isNullAt($i)) { $cnt++; $s += (double) (${getter(c, i)}); }
          |}
          |if ($cnt > 0) { ${ev.value} = $s / $cnt; } else { ${ev.isNull} = true; }
        """.stripMargin
      })
    override def prettyName: String = "list_avg"
    override protected def withNewChildInternal(c: Expression): DuckListAvg =
      copy(child = c)
  }

  // ---- builder-time compositions (dispatch on literal args) ----

  /** DuckDB part spelling → Spark unit name, shared by timestampdiff and
    * date_trunc (the same names are valid trunc formats). DuckDB accepts
    * singular/plural/abbreviated, case-insensitive (verified: 'months',
    * 'MONTH', 'mon' all work). century/decade/millennium/era have no
    * timestampdiff twin → None, caller falls to guidance.
    *
    * Used by [[graft.DuckDialect]]'s TEXT bridge for `date_diff` — a
    * registered function cannot intercept that name: Spark's PARSER
    * grammar-matches 3-arg date_diff into timestampdiff and rejects a
    * quoted unit before the function registry is ever consulted. */
  private val Parts: Map[String, String] = Map(
    "year" -> "YEAR", "years" -> "YEAR", "yr" -> "YEAR", "yrs" -> "YEAR",
    "y" -> "YEAR",
    "quarter" -> "QUARTER", "quarters" -> "QUARTER",
    "month" -> "MONTH", "months" -> "MONTH", "mon" -> "MONTH",
    "mons" -> "MONTH",
    "week" -> "WEEK", "weeks" -> "WEEK",
    "day" -> "DAY", "days" -> "DAY", "d" -> "DAY",
    "hour" -> "HOUR", "hours" -> "HOUR", "hr" -> "HOUR", "hrs" -> "HOUR",
    "h" -> "HOUR",
    "minute" -> "MINUTE", "minutes" -> "MINUTE", "min" -> "MINUTE",
    "mins" -> "MINUTE",
    "second" -> "SECOND", "seconds" -> "SECOND", "sec" -> "SECOND",
    "secs" -> "SECOND", "s" -> "SECOND",
    "millisecond" -> "MILLISECOND", "milliseconds" -> "MILLISECOND",
    "ms" -> "MILLISECOND",
    "microsecond" -> "MICROSECOND", "microseconds" -> "MICROSECOND",
    "us" -> "MICROSECOND")

  /** Spark unit name for a DuckDB date-part spelling, or None (→ the
    * caller's guidance path). */
  def partUnit(part: String): Option[String] =
    Parts.get(part.trim.toLowerCase(java.util.Locale.ROOT))

  private def strLit(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, _: StringType) => Some(s.toString)
    case _ => None
  }

  /** DuckDB `list_aggregate(x, 'fn')`: the function name must be a
    * LITERAL (as in DuckDB, where it binds at plan time too). count
    * skips NULL elements (verified: ([1,NULL,3],'count') = 2). */
  private def listAggregate(l: Expression, fn: Expression): Expression = {
    val name = strLit(fn).getOrElse(throw new IllegalArgumentException(
      "list_aggregate: the aggregate name must be a string literal"))
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "sum" => DuckListSum(l)
      case "avg" | "mean" => DuckListAvg(l)
      case "min" => ArrayMin(l)
      case "max" => ArrayMax(l)
      case "count" =>
        val x = UnresolvedNamedLambdaVariable(Seq("_duck_x"))
        Cast(Size(ArrayFilter(l, LambdaFunction(IsNotNull(x), Seq(x))),
          legacySizeOfNull = false), LongType)
      case other => throw new IllegalArgumentException(
        s"list_aggregate: '$other' is not bridged (supported: sum, avg, " +
          "min, max, count); use aggregate(x, zero, (acc, e) -> …)")
    }
  }

  /** DuckDB `strftime`/`strptime` with ARBITRARY (non-literal) C format
    * strings — the text bridge only reaches literal formats because the
    * %-code conversion must happen before Spark sees the pattern; as an
    * expression the conversion happens per evaluated format (cached for
    * the common constant-column case). DuckDB accepts either argument
    * order for strftime (the engine dispatches on types; so does this —
    * the temporal-typed argument is the value). Unsupported % codes
    * raise, as DuckDB does, rather than formatting garbage. */
  case class DuckStrftime(left: Expression, right: Expression,
      timeZoneId: Option[String] = None)
      extends BinaryExpression
      with TimeZoneAwareExpression
      with CodegenFallback {
    override def withTimeZone(tz: String): DuckStrftime =
      copy(timeZoneId = Some(tz))
    private def temporalFirst: Boolean = left.dataType match {
      case TimestampType | DateType | TimestampNTZType => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left.dataType, right.dataType)
      def isTemporal(t: DataType) =
        t == TimestampType || t == DateType || t == TimestampNTZType
      def isStr(t: DataType) = t.isInstanceOf[StringType]
      if ((isTemporal(ok.head) && isStr(ok(1))) ||
        (isStr(ok.head) && isTemporal(ok(1))))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "strftime expects (timestamp/date, format) in either order, got " +
          s"(${ok.head.sql}, ${ok(1).sql})")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    @transient private var cachedFmt: String = _
    @transient private var cachedFormatter: java.time.format.DateTimeFormatter = _
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val (vE, fE) = if (temporalFirst) (left, right) else (right, left)
      val v = vE.eval(input)
      val f = fE.eval(input)
      if (v == null || f == null) return null
      val cFmt = f.asInstanceOf[UTF8String].toString
      if (cachedFormatter == null || cachedFmt != cFmt) {
        val jdk = graft.DuckDialect.cFormatToJdk(cFmt).getOrElse(
          throw new IllegalArgumentException(
            s"strftime: format '$cFmt' carries a % code with no JDK " +
              "twin (locale weeks/%U, zones/%Z, ...); use date_format " +
              "with a JDK pattern"))
        cachedFormatter = java.time.format.DateTimeFormatter.ofPattern(
          jdk, java.util.Locale.US)
        cachedFmt = cFmt
      }
      val ldt = vE.dataType match {
        case DateType => java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong).atStartOfDay()
        case TimestampNTZType =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(v.asInstanceOf[Long], 1000000L),
            (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        case _ => java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(v.asInstanceOf[Long], 1000000L),
            Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L),
          zoneId)
      }
      UTF8String.fromString(cachedFormatter.format(ldt))
    }
    override def prettyName: String = "strftime"
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DuckStrftime =
      copy(left = l, right = r)
  }

  /** DuckDB `strptime(text, c_format)` → TIMESTAMP; raises on a parse
    * failure (DuckDB does too). Non-literal formats supported — the
    * text bridge cannot reach them. */
  case class DuckStrptime(left: Expression, right: Expression,
      timeZoneId: Option[String] = None)
      extends BinaryExpression
      with TimeZoneAwareExpression
      with CodegenFallback {
    override def withTimeZone(tz: String): DuckStrptime =
      copy(timeZoneId = Some(tz))
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType])
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"strptime expects (string, format), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    override def dataType: DataType = TimestampType
    override def nullable: Boolean = true
    @transient private var cachedFmt: String = _
    @transient private var cachedFormatter: java.time.format.DateTimeFormatter = _
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = left.eval(input)
      val f = right.eval(input)
      if (v == null || f == null) return null
      val cFmt = f.asInstanceOf[UTF8String].toString
      if (cachedFormatter == null || cachedFmt != cFmt) {
        val jdk = graft.DuckDialect.cFormatToJdk(cFmt).getOrElse(
          throw new IllegalArgumentException(
            s"strptime: format '$cFmt' carries a % code with no JDK " +
              "twin; use to_timestamp with a JDK pattern"))
        // defaults AFTER the pattern, and YEAR_OF_ERA (the 'y' pattern
        // field) — defaulting the plain YEAR field alongside a parsed
        // 'y' pattern makes resolution fail on the whole text
        cachedFormatter = new java.time.format.DateTimeFormatterBuilder()
          .appendPattern(jdk)
          .parseDefaulting(java.time.temporal.ChronoField.YEAR_OF_ERA, 1970)
          .parseDefaulting(java.time.temporal.ChronoField.MONTH_OF_YEAR, 1)
          .parseDefaulting(java.time.temporal.ChronoField.DAY_OF_MONTH, 1)
          .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
          .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
          .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
          .toFormatter(java.util.Locale.US)
        cachedFmt = cFmt
      }
      val ldt = java.time.LocalDateTime.parse(
        v.asInstanceOf[UTF8String].toString, cachedFormatter)
      val instant = ldt.atZone(zoneId).toInstant
      instant.getEpochSecond * 1000000L + instant.getNano / 1000L
    }
    override def prettyName: String = "strptime"
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DuckStrptime =
      copy(left = l, right = r)
  }

  /** DuckDB `list_extract(x, i)` / `array_extract(x, i)` — TYPE-AMBIGUOUS
    * like `len` (the r10 reason it moved from a text rename to an
    * analysis-time expression): 1-based element access on LISTS, but
    * 1-based CHARACTER access on STRINGS. Verified against the installed
    * DuckDB: lists — negative i from the end, i = 0 and out-of-range →
    * NULL; strings — negative i from the end, i = 0 / out-of-range →
    * EMPTY STRING (not NULL); NULL input or index → NULL (both forms).
    *
    * RuntimeReplaceable: the replacement is composed AFTER the children
    * resolve (the dataType dispatch needs the schema), from fully-typed
    * resolved nodes — explicit casts, typed literals — because
    * ReplaceExpressions swaps it in post-analysis where no coercion
    * runs. Array access is TryEval(ElementAt) (try_element_at), exactly
    * the text rename this replaces, so array behavior is unchanged. */
  case class DuckListExtract(left: Expression, right: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(left, right)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (_: StringType | _: ArrayType | NullType,
          ByteType | ShortType | IntegerType | LongType) =>
          TypeCheckResult.TypeCheckSuccess
        case (_: StringType | _: ArrayType | NullType, NullType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"list_extract expects (STRING|ARRAY, INTEGER), got " +
            s"(${l.sql}, ${r.sql})")
      }
    override lazy val replacement: Expression = left.dataType match {
      case _: StringType =>
        val idx = Cast(right, IntegerType)
        If(EqualTo(idx, Literal(0)),
          Literal(UTF8String.fromString(""), StringType),
          Substring(left, idx, Literal(1)))
      case ArrayType(et, _) =>
        val idx = Cast(right, IntegerType)
        // index 0 → NULL in DuckDB, but Spark's try_element_at THROWS
        // INVALID_INDEX_OF_ZERO (deliberately uncaught — a usage error,
        // not a data error, and constant folding evaluates the branch
        // bottom-up even under the If guard) — so ElementAt only ever
        // sees a substitute non-zero index; the outer If discards it
        val safeIdx = If(EqualTo(idx, Literal(0)), Literal(1), idx)
        If(EqualTo(idx, Literal(0)), Literal.create(null, et),
          TryEval(ElementAt(left, safeIdx, None, failOnError = true)))
      case _ => Literal.create(null, NullType)
    }
    override def prettyName: String = "list_extract"
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): DuckListExtract =
      copy(left = cs(0), right = cs(1))
  }

  /** DuckDB `list_slice(x, b, e[, step])` / `array_slice` — the r10
    * superset of the r9 parse-time composition (which only knew the
    * 3-arg LIST form): TYPE-DISPATCHED like [[DuckListExtract]], so the
    * STRING form and the 4-arg STEP form resolve instead of landing in
    * guidance. All clamp semantics verified against the installed
    * DuckDB:
    *   - 3-arg, lists: 1-based inclusive bounds, negatives from the end
    *     (sz+i+1), begin clamped up to 1, end clamped down to sz,
    *     begin > end → empty — unchanged from r9.
    *   - 3-arg, strings: the SAME clamp formula over characters,
    *     'DuckDB'[2..4] = 'uck', (4,2) → '', (-100,100) → whole string.
    *   - 4-arg, lists: inclusive bounds walked by step. step > 0: begin
    *     clamped up to 1, end down to sz, begin > end → empty. step < 0
    *     walks DOWNWARD from begin to end: begin < 1 → empty, else
    *     begin clamped down to sz, end clamped up to 1, begin < end →
    *     empty ((5,1,-2) → [5,3,1], (3,0,-1) → [3,2,1], (0,5,-1) → [],
    *     (100,-100,-2) → [5,3,1]). step = 0 raises (DuckDB: Invalid
    *     Input; here Sequence's step check raises the same way).
    *   - 4-arg on STRINGS: refused — DuckDB itself ships "Not
    *     implemented" for string step slicing.
    *   - NULL in any argument → NULL (both engines).
    * The step walk composes sequence(B, E, step) → transform(i → x[i])
    * over indices the clamps already bounded to [1, sz] — ArrayTransform
    * is CodegenFallback (as Spark ships it), acceptable on the dialect
    * surface, never in an operator hot loop. */
  case class DuckListSlice(args: Seq[Expression])
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = args
    private def x = args.head
    override def checkInputDataTypes(): TypeCheckResult = {
      val boundsOk = args.tail.forall(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType | NullType => true
        case _ => false
      })
      if (!boundsOk) return TypeCheckResult.TypeCheckFailure(
        "list_slice bounds/step must be integers")
      x.dataType match {
        case _: ArrayType | NullType => TypeCheckResult.TypeCheckSuccess
        case _: StringType if args.length == 3 =>
          TypeCheckResult.TypeCheckSuccess
        case _: StringType => TypeCheckResult.TypeCheckFailure(
          "list_slice with a step is not implemented for strings (DuckDB" +
            " refuses it too); slice characters with substring instead")
        case t => TypeCheckResult.TypeCheckFailure(
          s"list_slice expects a LIST or STRING, got ${t.sql}")
      }
    }
    override lazy val replacement: Expression = {
      val bi = Cast(args(1), IntegerType)
      val ei = Cast(args(2), IntegerType)
      x.dataType match {
        case _: StringType =>
          val sz = Length(x)
          val bp = CaseWhen(Seq((LessThan(bi, Literal(0)),
            Add(Add(sz, bi), Literal(1)))), bi)
          val bc = CaseWhen(Seq((LessThan(bp, Literal(1)), Literal(1))), bp)
          val ep = CaseWhen(Seq((LessThan(ei, Literal(0)),
            Add(Add(sz, ei), Literal(1)))), ei)
          val ec = CaseWhen(Seq((GreaterThan(ep, sz), sz)), ep)
          val len0 = Add(Subtract(ec, bc), Literal(1))
          Substring(x, bc,
            CaseWhen(Seq((LessThan(len0, Literal(0)), Literal(0))), len0))
        case at @ ArrayType(_, _) =>
          val sz = Size(x, legacySizeOfNull = false)
          def fromEnd(i: Expression) = CaseWhen(Seq((LessThan(i, Literal(0)),
            Add(Add(sz, i), Literal(1)))), i)
          if (args.length == 3) {
            val bc = CaseWhen(
              Seq((LessThan(fromEnd(bi), Literal(1)), Literal(1))),
              fromEnd(bi))
            val ec = CaseWhen(Seq((GreaterThan(fromEnd(ei), sz), sz)),
              fromEnd(ei))
            val len0 = Add(Subtract(ec, bc), Literal(1))
            Slice(x, bc,
              CaseWhen(Seq((LessThan(len0, Literal(0)), Literal(0))), len0))
          } else {
            val si = Cast(args(3), IntegerType)
            val bp = fromEnd(bi)
            val ep = fromEnd(ei)
            // step > 0: B = max(bp, 1), E = min(ep, sz), empty when B > E
            // step < 0: empty when bp < 1; B = min(bp, sz),
            //           E = max(ep, 1), empty when B < E
            val b2 = CaseWhen(Seq(
              (GreaterThan(si, Literal(0)),
                CaseWhen(Seq((LessThan(bp, Literal(1)), Literal(1))), bp)),
              (LessThan(bp, Literal(1)), Literal(0)), // neg-step sentinel
              (GreaterThan(bp, sz), sz)), bp)
            val e2 = CaseWhen(Seq(
              (GreaterThan(si, Literal(0)),
                CaseWhen(Seq((GreaterThan(ep, sz), sz)), ep)),
              (LessThan(ep, Literal(1)), Literal(1))), ep)
            val empty = Or(
              And(GreaterThan(si, Literal(0)), GreaterThan(b2, e2)),
              And(LessThan(si, Literal(0)),
                Or(EqualTo(b2, Literal(0)), LessThan(b2, e2))))
            val lv = NamedLambdaVariable("i", IntegerType, nullable = false)
            val walk = ArrayTransform(
              new Sequence(b2, e2, Some(si), Some("UTC")),
              LambdaFunction(ElementAt(x, lv, None, failOnError = true),
                Seq(lv)))
            If(IsNull(x), Literal.create(null, at),
              CaseWhen(Seq((empty,
                Literal(new org.apache.spark.sql.catalyst.util
                  .GenericArrayData(Array.empty[Any]), at))), walk))
          }
        case _ => Literal.create(null, NullType)
      }
    }
    override def prettyName: String = "list_slice"
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): DuckListSlice = copy(args = cs)
  }

  /** DuckDB `date_sub('part', a, b)`: complete-interval count from a
    * START-ANCHORED walk — NOT boundary crossings (that is date_diff)
    * and NOT java.time's month arithmetic. Verified against the
    * installed DuckDB:
    *   - month family (month/quarter/year/decade/century/millennium):
    *     the count of whole units n such that a + n·unit ≤ b, where the
    *     month-add CLAMPS to month-end (Jan-31 + 1 month = Feb-28, so
    *     date_sub('month', Jan-31, Feb-28) = 1 where java.time's
    *     MONTHS.between says 0); time-of-day rides along (Jan-31 05:00 →
    *     Feb-28 04:59:59 is 0, … 05:00:00 is 1).
    *   - fixed-width parts (week/day/hour/minute/second/ms/us): the
    *     microsecond difference over the unit width, truncated toward
    *     zero.
    *   - backward ranges NEGATE the forward count (Feb-28 → Jan-31 =
    *     −1, the mirror of Jan-31 → Feb-28 = 1) — verified, and NOT the
    *     same as a floor (floor would give −2 for −1.98 hours; DuckDB
    *     gives −1).
    * java.time.plusMonths clamps exactly like DuckDB's month-add, so the
    * walk is: raw month-diff / unit, minus at most one unit when the
    * clamped landing overshoots b (proof in [[dateSubMonthFamily]]).
    * Whole-stage codegen via static helper calls. */
  case class DuckDateSub(part: String, left: Expression, right: Expression)
      extends BinaryExpression {
    private val unitMonths: Int = part match {
      case "month" => 1; case "quarter" => 3; case "year" => 12
      case "decade" => 120; case "century" => 1200
      case "millennium" => 12000; case _ => 0
    }
    private val widthUs: Long = part match {
      case "week" => 7L * 86400000000L
      case "day" => 86400000000L
      case "hour" => 3600000000L
      case "minute" => 60000000L
      case "second" => 1000000L
      case "millisecond" => 1000L
      case "microsecond" => 1L
      case _ => 0L
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      if (unitMonths == 0 && widthUs == 0L)
        return TypeCheckResult.TypeCheckFailure(
          s"date_sub: unknown part '$part' (year/quarter/month/week/day/" +
            "hour/minute/second/millisecond/microsecond and the " +
            "decade/century/millennium month multiples)")
      def ok(t: DataType) = t match {
        case _: DateType | _: TimestampType | _: TimestampNTZType => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"date_sub expects DATE/TIMESTAMP operands, got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
    override def dataType: DataType = LongType
    private def micros(v: Any, t: DataType): Long = t match {
      case _: DateType => v.asInstanceOf[Int] * 86400000000L
      case _ => v.asInstanceOf[Long]
    }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (am, bm) = (micros(a, left.dataType), micros(b, right.dataType))
      if (unitMonths > 0) dateSubMonthFamily(unitMonths, am, bm)
      else (bm - am) / widthUs
    }
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def m(c: String, t: DataType): String = t match {
        case _: DateType => s"($c * 86400000000L)"
        case _ => c
      }
      nullSafeCodeGen(ctx, ev, (a, b) =>
        if (unitMonths > 0)
          s"${ev.value} = graft.functions.DuckCompat.dateSubMonthFamily(" +
            s"$unitMonths, ${m(a, left.dataType)}, ${m(b, right.dataType)});"
        else
          s"${ev.value} = (${m(b, right.dataType)} - " +
            s"${m(a, left.dataType)}) / ${widthUs}L;")
    }
    override def prettyName: String = "date_sub"
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DuckDateSub =
      copy(left = l, right = r)
  }

  /** Static helper for [[DuckDateSub]]'s month family (called from
    * generated code): whole clamped units from a start-anchored walk.
    * raw/unit never UNDERshoots (plusMonths only clamps days downward,
    * the landing month is exact), and overshoots by at most one unit
    * (one decrement moves the landing a full month earlier than b's
    * month) — so the "loop" is a single conditional. Backward ranges
    * negate the forward walk (DuckDB-verified). */
  def dateSubMonthFamily(unitMonths: Int, aMicros: Long, bMicros: Long): Long = {
    if (aMicros > bMicros) return -dateSubMonthFamily(unitMonths, bMicros, aMicros)
    val a = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(aMicros, 1000000L),
      (Math.floorMod(aMicros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val b = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(bMicros, 1000000L),
      (Math.floorMod(bMicros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val rawMonths = (b.getYear.toLong * 12 + b.getMonthValue) -
      (a.getYear.toLong * 12 + a.getMonthValue)
    var n = rawMonths / unitMonths
    if (n > 0 && a.plusMonths(n * unitMonths).isAfter(b)) n -= 1
    n
  }

  /** Idempotent per-session registration of the DuckDB-compat names.
    * NOTE: `len` SHADOWS a Spark builtin alias inside the session —
    * deliberately: it keeps Spark's semantics for strings (widened to
    * DuckDB's BIGINT) and gains DuckDB's for arrays. Applied only on the
    * dialect-tolerant surfaces ([[graft.DuckDialect.sql]] → CLI/REPL/
    * DeltaScanner) — operator-module sessions never see these. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    def arity(name: String, n: Int, es: Seq[Expression]): Unit =
      require(es.length == n, s"$name expects $n arguments, got ${es.length}")

    put("len") { es => arity("len", 1, es); DuckLen(es.head) }
    put("list_sum") { es => arity("list_sum", 1, es); DuckListSum(es.head) }
    put("list_avg") { es => arity("list_avg", 1, es); DuckListAvg(es.head) }
    put("list_aggregate") { es =>
      arity("list_aggregate", 2, es); listAggregate(es.head, es(1))
    }
    put("list_aggr") { es =>
      arity("list_aggr", 2, es); listAggregate(es.head, es(1))
    }
    // array_length: DuckDB's 1-arg form, plus the Postgres-style 2-arg
    // (list, dimension) form for dimension 1 — its nested LISTs are
    // jagged, so dimension > 1 is not well-defined on ArrayType either.
    put("array_length") { es =>
      require(es.length == 1 || es.length == 2,
        s"array_length expects 1 or 2 arguments, got ${es.length}")
      if (es.length == 2 && !es(1).semanticEquals(Literal(1)))
        throw new IllegalArgumentException(
          "array_length: only dimension 1 is supported (nested lists are " +
            "jagged; map over the outer list for inner lengths)")
      Cast(Size(es.head, legacySizeOfNull = false), LongType)
    }
    // regexp_full_match for ARBITRARY (non-literal) patterns — the text
    // bridge only reaches literals because the \A…\z wrap must land
    // inside the literal; as an expression the wrap is a runtime concat.
    // \A/\z (not ^/$): Java's $ admits a trailing line terminator that
    // DuckDB's full match rejects (ADVICE r8, both engines verified).
    put("regexp_full_match") { es =>
      arity("regexp_full_match", 2, es)
      RLike(es.head, Concat(Seq(
        Literal(UTF8String.fromString("\\A(?:"), StringType), es(1),
        Literal(UTF8String.fromString(")\\z"), StringType))))
    }
    // strftime / strptime: arbitrary (non-literal) C formats — the text
    // bridge stays for the pure-rewrite path; these make the FIRST parse
    // attempt succeed and cover expression-valued formats.
    put("strftime") { es =>
      arity("strftime", 2, es); DuckStrftime(es.head, es(1))
    }
    put("strptime") { es =>
      arity("strptime", 2, es); DuckStrptime(es.head, es(1))
    }
    // list_slice / array_slice — [[DuckListSlice]] (r10: type-dispatched
    // RuntimeReplaceable; the r9 parse-time composition only knew the
    // 3-arg LIST form — the STRING form and the 4-arg STEP form now
    // resolve instead of landing in guidance). CaseWhen clamp logic and
    // its NULL rationale live in the expression's Scaladoc.
    def slices(name: String)(es: Seq[Expression]): Expression = {
      require(es.length == 3 || es.length == 4,
        s"$name expects 3 or 4 arguments, got ${es.length}")
      DuckListSlice(es)
    }
    put("list_slice")(slices("list_slice"))
    put("array_slice")(slices("array_slice"))
    // list_extract / array_extract — type-ambiguous since the STRING
    // form exists (character access); [[DuckListExtract]]. The array
    // branch is try_element_at, exactly the text rename it supersedes.
    put("list_extract") { es =>
      arity("list_extract", 2, es); DuckListExtract(es.head, es(1))
    }
    put("array_extract") { es =>
      arity("array_extract", 2, es); DuckListExtract(es.head, es(1))
    }
    // list_value: DuckDB's array constructor — registered so statements
    // whose ONLY other duckism is list_value resolve on the FIRST parse
    // and reach the analysis-time expressions above (the text rename to
    // `array` still serves the pure-rewrite path)
    put("list_value") { es => CreateArray(es) }
    // list_prepend(elem, list): DuckDB's argument order is (element,
    // list) — the REVERSE of Spark's array_prepend — which is exactly
    // why the text rename table refuses it (a rename would silently
    // swap the arguments); as a registered builder the swap is
    // explicit. DuckDB edge mirrored: a NULL LIST yields [elem]
    // (verified) where array_prepend yields NULL.
    put("list_prepend") { es =>
      arity("list_prepend", 2, es)
      If(IsNull(es(1)), CreateArray(Seq(es.head)),
        ArrayPrepend(es(1), es.head))
    }
    // string_split / str_split / string_to_array (s, sep): DuckDB
    // splits on the LITERAL separator where Spark's split() takes a
    // REGEX — the rename table refuses them for that reason; here the
    // literal separator is Pattern-quoted so metacharacters ('||',
    // '.') split literally, and limit -1 keeps trailing empties as
    // DuckDB does ('a,b,,' → [a, b, '', '']; verified). A NULL literal
    // separator mirrors DuckDB's no-split [s]. An EMPTY separator is
    // DuckDB's per-char explode — and Spark's split(s, '', -1) is the
    // IDENTICAL per-char form (r12, verified on both engines: unicode
    // chars, [''] for '', NULL propagation; Spark's StringSplit does
    // NOT append Java's raw trailing '' — the pre-r12 refusal here
    // assumed it did). Refused loudly: non-literal separators
    // (quote-at-eval needs a custom expression; use split() with a
    // regex).
    def strSplit(name: String)(es: Seq[Expression]): Expression = {
      arity(name, 2, es)
      es(1) match {
        case Literal(null, _) => CreateArray(Seq(es.head))
        case Literal(sep: UTF8String, _: StringType)
            if sep.toString.nonEmpty =>
          StringSplit(es.head, Literal(UTF8String.fromString(
            java.util.regex.Pattern.quote(sep.toString)), StringType),
            Literal(-1))
        case Literal(s: UTF8String, _: StringType) if s.toString.isEmpty =>
          StringSplit(es.head,
            Literal(UTF8String.fromString(""), StringType), Literal(-1))
        case _ => throw new IllegalArgumentException(
          s"$name needs a LITERAL separator (DuckDB splits on the " +
            "literal; Spark's split() is regex) — for an expression " +
            "separator use split(s, <regex>) and quote it yourself")
      }
    }
    put("string_split")(strSplit("string_split"))
    put("str_split")(strSplit("str_split"))
    put("string_to_array")(strSplit("string_to_array"))
    // array_to_string(list, sep): DuckDB defines it as the macro
    // list_aggr(arr, 'string_agg', sep) — NULL elements are SKIPPED
    // (string_agg semantics, same as Spark's array_join) and a list
    // with ZERO NON-NULL elements yields NULL (string_agg over zero
    // rows) where array_join yields '' — hence the filtered-size guard
    // (a bare size()=0 check missed the all-NULL case; caught by the
    // r11 random matrix, DuckDB-verified: [NULL] → NULL, [''] → '').
    // Elements cast to string implicitly (DECIMAL keeps scale in both
    // engines; verified). Registered so statements mixing it with the
    // type-dispatched list_* natives resolve on the FIRST parse; the
    // guarded CASE in DuckDialect's char-scan is the pure-rewrite twin.
    put("array_to_string") { es =>
      arity("array_to_string", 2, es)
      val lv = org.apache.spark.sql.catalyst.expressions
        .UnresolvedNamedLambdaVariable(Seq("_graft_a2s"))
      val nonNull = ArrayFilter(es.head,
        LambdaFunction(IsNotNull(lv), Seq(lv)))
      If(EqualTo(Size(nonNull, legacySizeOfNull = false), Literal(0)),
        Literal.create(null, StringType),
        ArrayJoin(Cast(es.head, ArrayType(StringType)), es(1), None))
    }
    // date_sub: 3-arg DuckDB form (complete clamped intervals —
    // [[DuckDateSub]]); the 2-arg form stays Spark's own date_sub(d, n)
    // (this registration SHADOWS it, so the builder restores it).
    def dateSub(name: String)(es: Seq[Expression]): Expression = {
      require(es.length == 2 || es.length == 3,
        s"$name expects (date, days) or ('part', a, b), got ${es.length}")
      if (es.length == 2) DateSub(es.head, es(1))
      else es.head match {
        case Literal(p: UTF8String, _: StringType) =>
          val part = p.toString.toLowerCase(java.util.Locale.ROOT) match {
            case "months" => "month"; case "quarters" => "quarter"
            case "years" => "year"; case "decades" => "decade"
            case "centuries" => "century"
            case "millennia" | "millenniums" => "millennium"
            case "weeks" => "week"; case "days" => "day"
            case "hours" => "hour"; case "minutes" | "min" | "mins" => "minute"
            case "seconds" | "sec" | "secs" => "second"
            case "milliseconds" | "ms" | "msec" => "millisecond"
            case "microseconds" | "us" | "usec" => "microsecond"
            case other => other
          }
          DuckDateSub(part, es(1), es(2))
        case other => throw new IllegalArgumentException(
          s"$name expects a literal part string, got $other")
      }
    }
    put("date_sub")(dateSub("date_sub"))
    put("datesub")(dateSub("datesub"))

    // list_reduce(l, (acc, e) -> …): DuckDB's seedless fold — seed is the
    // FIRST element, the lambda folds the rest (verified:
    // list_reduce([1,2,3], (x,y) -> x - y) = (1-2)-3 = -4). Expressed as
    // aggregate(slice(l, 2, size-1), l[1], lambda): the parser already
    // produced a LambdaFunction with unresolved lambda variables, and
    // ArrayAggregate is a real higher-order function the analyzer binds.
    // DuckDB errors on an empty list; here element_at(l, 1) raises under
    // ANSI the same way.
    put("list_reduce") { es =>
      arity("list_reduce", 2, es)
      val l = es.head
      val lam = es(1) match {
        case f: LambdaFunction => f
        case other => throw new IllegalArgumentException(
          s"list_reduce expects a lambda as the second argument, got $other")
      }
      val rest = Slice(l, Literal(2),
        Greatest(Seq(Subtract(Size(l, legacySizeOfNull = false), Literal(1)),
          Literal(0))))
      ArrayAggregate(rest, ElementAt(l, Literal(1)), lam,
        LambdaFunction.identity)
    }
    // delta_scan('path') as a real TABLE FUNCTION (the reference's own
    // SQL spells Delta reads this way — its $TABLE substitution emits
    // delta_scan('<path>'), delta-unity-duckdb.js:331-335, and users
    // paste it directly). Resolves through graft's public-protocol
    // Delta reader (log replay + checkpoints + DVs); a non-Delta path
    // falls back to a plain parquet scan, mirroring PathResolver. The
    // path must be a literal — as in DuckDB, where table functions bind
    // at plan time.
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "delta_scan", exprs => {
        val path = exprs match {
          case scala.collection.immutable.Seq(
            Literal(p: UTF8String, _: StringType)) => p.toString
          case _ => throw new IllegalArgumentException(
            "delta_scan expects exactly one string-literal path")
        }
        val df =
          if (graft.sources.DeltaLog.isDeltaTable(spark, path))
            graft.sources.DeltaLog.read(spark, path)
          else spark.read.parquet(path)
        df.queryExecution.analyzed
      }, "built-in")

    // read_csv / read_json as real TABLE FUNCTIONS (r10 — previously
    // guidance-only): DuckDB's file readers with the option subset that
    // maps 1:1 onto spark.read. Paths are literal strings or literal
    // lists (a bracket list parses after the rewrite's bracket bridge —
    // read_csv(['a','b']) arrives here as CreateArray). Named options
    // arrive as the parser's `EqualTo(attr, literal)` (DuckDB's
    // `header = true` spelling) or Spark's `name => value`. Supported:
    //   csv — header (DuckDB AUTO-DETECTS header and delimiter when
    //   not given, so the option-free form refuses below rather than
    //   silently applying spark.read's no-header ',' defaults;
    //   no-header columns are named column0..N as DuckDB names them),
    //   delim/sep/delimiter, quote,
    //   escape, nullstr, compression, names (list literal),
    //   all_varchar (disables inference);
    //   json — format 'auto'/'newline_delimited'/'nd' (NDJSON, the
    //   spark.read.json default) or 'array' (multiLine).
    // sample_size / maximum_object_size / auto_detect are accepted and
    // ignored (sampling limits, not semantics). Anything else raises
    // with the supported list — loud, never a silent divergence. Type
    // inference runs like DuckDB's auto-detection (inferSchema; an
    // extra sampling pass, same trade DuckDB makes) but the INFERRED
    // WIDTHS can differ (DuckDB: BIGINT; Spark CSV: INT when values
    // fit) — cast explicitly where width matters, as q175 does.
    def readFileArgs(name: String, exprs: Seq[Expression])
        : (Seq[String], Map[String, Any]) = {
      def lit(e: Expression): Option[Any] = e match {
        case Literal(p: UTF8String, _: StringType) => Some(p.toString)
        case Literal(v, BooleanType | IntegerType | LongType) => Some(v)
        case _ => None
      }
      val paths = exprs.headOption match {
        case Some(Literal(p: UTF8String, _: StringType)) => Seq(p.toString)
        case Some(CreateArray(items, _))
            if items.nonEmpty && items.forall(lit(_).exists(_.isInstanceOf[String])) =>
          items.map(i => lit(i).get.asInstanceOf[String])
        case _ => throw new IllegalArgumentException(
          s"$name expects a literal path or a literal list of paths as " +
            "the first argument")
      }
      // named options arrive THREE ways: `name => value`
      // (NamedArgumentExpression), `header = true` (EqualTo over an
      // attribute — only when the analyzer let it through), or the
      // rewrite's flattened ('header', true) literal PAIRS (the normal
      // path — DuckDialect.rewrite flattens because the analyzer
      // rejects unresolved attributes in table-function args before
      // this builder runs)
      val rest = exprs.tail
      val pairs = scala.collection.mutable.ListBuffer.empty[(String, Expression)]
      var pi = 0
      while (pi < rest.length) {
        rest(pi) match {
          case EqualTo(
              a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute,
              v) =>
            pairs += ((a.name.toLowerCase(java.util.Locale.ROOT), v)); pi += 1
          case NamedArgumentExpression(key, v) =>
            pairs += ((key.toLowerCase(java.util.Locale.ROOT), v)); pi += 1
          case Literal(k: UTF8String, _: StringType) if pi + 1 < rest.length =>
            pairs += ((k.toString.toLowerCase(java.util.Locale.ROOT),
              rest(pi + 1))); pi += 2
          case other => throw new IllegalArgumentException(
            s"$name options must be named (`header = true`), got $other")
        }
      }
      val opts = pairs.toSeq.map {
        case (k, CreateArray(items, _))
            if items.forall(lit(_).exists(_.isInstanceOf[String])) =>
          k -> items.map(i => lit(i).get.asInstanceOf[String])
        case (k, v) => k -> lit(v).getOrElse(
          throw new IllegalArgumentException(
            s"$name option $k must be a literal"))
      }.toMap
      (paths, opts)
    }
    // Spark's read path decompresses by EXTENSION only — .gz via Hadoop,
    // .zst/.zstd via Spark 4's zstd-jni fallback (HadoopCodecStreams);
    // the `compression` option is write-only and silently IGNORED on
    // read. DuckDB (pinned) honors the OPTION over the extension and
    // auto-detects only .gz/.zst. Two divergence classes follow, both
    // refused rather than risked:
    //   1. extensions Spark decompresses but DuckDB reads as raw bytes
    //      (.gzip / .zstd — DuckDB-pinned raw-parse errors);
    //   2. a compression option that is not redundant with what the
    //      extension already implies (DuckDB decompresses a noext file
    //      under compression='gzip' and reads a .zst raw under 'none';
    //      Spark ignores the option either way).
    // 'auto' is always redundant (both engines extension-detect);
    // 'gzip'/'zstd' must match every path's extension; 'none' requires
    // no decompressing extension; other spellings are DuckDB parser
    // errors anyway ("Unrecognized file compression type").
    def guardCompression(name: String, paths: Seq[String],
        opts: Map[String, Any]): Map[String, Any] = {
      def refuse(why: String): Nothing = throw new IllegalArgumentException(
        s"$name: $why — Spark decompresses by file extension only " +
          "(.gz/.zst) and ignores the compression option on read, " +
          "while DuckDB honors the option; bridging would silently " +
          "parse different bytes. Rename the file to the matching " +
          "extension (or drop the option) and retry")
      for (p <- paths)
        if (p.matches("(?i).*\\.(gzip|zstd)$"))
          refuse(s"'$p' has an extension Spark decompresses but DuckDB " +
            "reads as plain bytes (.gzip/.zstd)")
      opts.get("compression") match {
        case None => opts
        case Some(v: String) =>
          val ok = v.toLowerCase(java.util.Locale.ROOT) match {
            case "auto" => true
            case "gzip" => paths.forall(_.matches("(?i).*\\.gz$"))
            case "zstd" => paths.forall(_.matches("(?i).*\\.zst$"))
            case "none" => paths.forall(!_.matches("(?i).*\\.(gz|zst)$"))
            case other => refuse(s"compression '$other' is not a DuckDB " +
              "compression type (auto/none/gzip/zstd)")
          }
          if (!ok) refuse(s"compression = '$v' is not redundant with " +
            s"the path extension(s) of ${paths.mkString(", ")}")
          opts - "compression"
        case Some(other) =>
          refuse(s"compression must be a string, got $other")
      }
    }
    val readCsvBuilder = (exprs: Seq[Expression]) => {
        val (paths, opts0) = readFileArgs("read_csv", exprs)
        val opts = guardCompression("read_csv", paths, opts0)
        val ignored = Set("sample_size", "maximum_object_size", "auto_detect")
        // DuckDB accepts 0/1 wherever it accepts booleans (verified:
        // header = 0, all_varchar = 1) — normalize before dispatch
        def truthy(v: Any): Boolean = v match {
          case b: Boolean => b
          case 1L | 1 => true
          case 0L | 0 => false
          case other => throw new IllegalArgumentException(
            s"read_csv expects a boolean (or 0/1), got $other")
        }
        // escape defaults to '"' (DuckDB's default — RFC `""` doubling;
        // Spark's backslash default mis-reads `"c""d"` as literal
        // quotes, r13 matrix); an explicit escape option still wins in
        // the fold below
        val r = spark.read.option("inferSchema",
          !opts.get("all_varchar").exists(truthy))
          .option("escape", "\"")
        var header = false
        var names: Seq[String] = Nil
        val withOpts = opts.filterNot(kv => ignored(kv._1)).foldLeft(r) {
          case (acc, ("header", v @ (_: Boolean | _: Long | _: Int))) =>
            header = truthy(v)
            acc.option("header", header)
          case (acc, ("delim" | "sep" | "delimiter", v: String)) =>
            acc.option("sep", v)
          case (acc, ("quote", v: String)) => acc.option("quote", v)
          case (acc, ("escape", v: String)) => acc.option("escape", v)
          case (acc, ("nullstr", v: String)) => acc.option("nullValue", v)
          case (acc, ("names", v: Seq[_])) =>
            names = v.map(_.toString); acc
          case (acc, ("all_varchar", _)) => acc
          case (_, (k, v)) => throw new IllegalArgumentException(
            s"read_csv option '$k' = $v is not bridged (supported: " +
              "header, delim/sep, quote, escape, nullstr, compression, " +
              "names, all_varchar; sample_size/maximum_object_size/" +
              "auto_detect are ignored) — use spark.read directly for " +
              "the rest")
        }
        // Option-free / delimiter-free form (r13, VERDICT r12 item 3):
        // DuckDB auto-detects header and delimiter where spark.read
        // defaults to header=false + ',' — the r10 guard refused this
        // form outright; now [[sniffCsv]] reproduces DuckDB's detection
        // on a head sample of the FIRST file (matrix-pinned against the
        // installed DuckDB) and only an AMBIGUOUS dialect still refuses.
        // gz and zst head-sample decompressed (r15); bz2/lz4/snappy
        // have no DuckDB auto-detect twin — refuse to explicit options.
        var sniffed: Option[(String, Boolean)] = None
        if (!opts.contains("header") &&
            !Seq("delim", "sep", "delimiter").exists(opts.contains)) {
          def refuse(why: String): Nothing = throw new IllegalArgumentException(
            s"read_csv without header/delim options: $why. DuckDB " +
              "auto-detects both from the file; this bridge sniffs the " +
              "unambiguous cases and refuses the rest rather than risk a " +
              "silently different parse. Pass explicit options, e.g. " +
              "read_csv('f.csv', header = true, delim = ',')")
          // compression never reaches here: guardCompression stripped a
          // redundant option or refused a non-redundant one already
          if (paths.exists(_.matches("(?i).*\\.(bz2|lz4|snappy)$")))
            refuse("cannot head-sample a compressed file")
          // r14 (ADVICE): sniff EVERY resolved path and require the
          // dialects to agree — DuckDB re-sniffs each file of a
          // multi-file read, so parsing later files with the first
          // file's dialect would silently diverge on mixed directories.
          // r15 (VERDICT r14 item 6): `.gz` sniffs like DuckDB does —
          // transparently — by sampling DECOMPRESSED bytes through the
          // JDK's GZIPInputStream (the whole-file separator scan of the
          // single-column fallback decompresses too). r15 second pass:
          // `.zst` sniffs through zstd-jni's ZstdInputStream — the SAME
          // library Spark 4's read fallback (HadoopCodecStreams) uses,
          // so the sniffed bytes equal the read bytes by construction.
          // bz2/lz4/snappy keep the refusal above (DuckDB does not
          // auto-detect them either). Matrix-pinned: every gz/zst
          // dialect answer equals DuckDB's on the same bytes.
          val perPath = paths.map { raw =>
            val p = java.nio.file.Paths.get(raw.stripPrefix("file:"))
            if (!java.nio.file.Files.isRegularFile(p))
              refuse(s"cannot sample $p (not a readable plain file; " +
                "globs are only bridged with explicit options)")
            val gz = raw.matches("(?i).*\\.gz$")
            val zst = raw.matches("(?i).*\\.zst$")
            def open(): java.io.InputStream = {
              val base = new java.io.BufferedInputStream(
                java.nio.file.Files.newInputStream(p))
              if (gz) new java.util.zip.GZIPInputStream(base)
              else if (zst) new com.github.luben.zstd.ZstdInputStream(base)
              else base
            }
            // read one byte PAST the sample size: a gz stream's
            // decompressed length is unknowable from metadata, so the
            // overflow byte is the partial-sample signal for both forms
            val (sample, partial) = {
              val in =
                try open()
                catch { case e: java.io.IOException =>
                  refuse(s"cannot decompress $p for sampling " +
                    s"(${e.getMessage})")
                }
              try {
                val buf = new Array[Byte](SniffSampleBytes + 1)
                var n = 0
                var r = 0
                while (n < buf.length && r >= 0) {
                  r = in.read(buf, n, buf.length - n); if (r > 0) n += r
                }
                (java.util.Arrays.copyOf(buf,
                  math.min(n, SniffSampleBytes)), n > SniffSampleBytes)
              } catch { case e: java.io.IOException =>
                refuse(s"cannot decompress $p for sampling " +
                  s"(${e.getMessage})")
              } finally in.close()
            }
            sniffCsv(sample, if (partial) Some(() => open()) else None)
          }
          if (perPath.exists(_.isEmpty))
            refuse("the sample's dialect is ambiguous (no single " +
              "delimiter parses every line to one consistent width)")
          if (perPath.distinct.length > 1)
            refuse("the files disagree on dialect (" +
              perPath.flatten.map { case (d, h) =>
                s"delim=${if (d.head < ' ') "<none>" else d} header=$h"
              }.distinct.mkString(" vs ") +
              ") — DuckDB sniffs each file separately; one Spark read " +
              "cannot")
          sniffed = perPath.head
        }
        val sniffApplied = sniffed match {
          case Some((d, h)) =>
            header = h
            withOpts.option("sep", d).option("header", h)
          case None => withOpts
        }
        var df = sniffApplied.csv(paths: _*)
        if (names.nonEmpty)
          // a names list LONGER than the file's column count truncates
          // to the width, exactly as DuckDB does (verified; ADVICE r10 —
          // the untruncated toDF raised an opaque arity error)
          df = df.toDF(names.take(df.columns.length) ++
            df.columns.drop(names.length): _*)
        else if (!header)
          // DuckDB names headerless columns column0..N; Spark _c0.._cN
          df = df.toDF(df.columns.indices.map(i => s"column$i"): _*)
        df.queryExecution.analyzed
    }
    val readJsonBuilder = (exprs: Seq[Expression]) => {
        val (paths, opts0) = readFileArgs("read_json", exprs)
        // same guard as read_csv: .gzip/.zstd extensions and
        // non-redundant compression options refuse (Spark decompresses
        // by extension only; a redundant option is dropped — .gz/.zst
        // decompress identically in both engines)
        val opts = guardCompression("read_json", paths, opts0)
        val ignored = Set("sample_size", "maximum_object_size",
          "auto_detect")
        val r = opts.filterNot(kv => ignored(kv._1)).foldLeft(spark.read) {
          case (acc, ("format", "auto" | "newline_delimited" | "nd")) => acc
          case (acc, ("format", "array")) => acc.option("multiLine", true)
          // records = false changes the RESULT SHAPE (one STRUCT column
          // per JSON value instead of unpacked fields — DuckDB-verified)
          // and has no spark.read twin: refuse loudly rather than
          // silently return a different schema
          case (acc, ("records", true | "auto" | 1L | 1)) => acc
          case (_, (k, v)) => throw new IllegalArgumentException(
            s"read_json option '$k' = $v is not bridged (supported: " +
              "format auto/newline_delimited/nd/array, compression, " +
              "records auto/true; records=false returns one STRUCT " +
              "column per value in DuckDB and has no spark.read twin) " +
              "— use spark.read directly for the rest")
        }
        r.json(paths: _*).queryExecution.analyzed
    }
    // the _auto spellings are DuckDB's auto-detect aliases — same
    // readers here (inference is already on)
    for (n <- Seq("read_csv", "read_csv_auto"))
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(n, readCsvBuilder, "built-in")
    for (n <- Seq("read_json", "read_json_auto"))
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(n, readJsonBuilder, "built-in")

    // NOTE deliberately absent: date_diff. Spark's parser grammar-matches
    // the 3-arg form into timestampdiff and rejects DuckDB's quoted unit
    // BEFORE function resolution, so no registered function can catch it
    // — it is a TEXT bridge in DuckDialect.rewrite instead (the part is
    // always a literal in the text), and the 2-arg Spark form never
    // reaches the parser special-case.
  }
}
