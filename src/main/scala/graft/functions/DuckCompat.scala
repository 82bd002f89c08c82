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
    // list_slice / array_slice for ARBITRARY (non-literal, mixed-sign)
    // bounds — the text bridge only reaches single-sign integer
    // literals. DuckDB's 1-based inclusive bounds with clamping, the
    // full matrix verified against the installed DuckDB (b=0 → 1,
    // either end past either edge → clamp/empty, start>end → [],
    // NULL list/bound → NULL):
    //   B' = b < 0 ? sz+b+1 : b;   B = B' < 1 ? 1 : B'
    //   E' = e < 0 ? sz+e+1 : e;   E = E' > sz ? sz : E'
    //   slice(x, B, max(E-B+1, 0))
    // CaseWhen, NOT Greatest/Least: a NULL CASE predicate falls to the
    // ELSE operand (the bound itself, still NULL → Slice propagates),
    // where Greatest/Least would IGNORE the null and fabricate a bound.
    // Composed entirely from codegen'd built-ins. The STRING form stays
    // unbridged (substring is the twin) — a string arg fails Slice's
    // type check into guidance. The 4-arg step form has no Spark twin.
    def duckSlice(es: Seq[Expression]): Expression = {
      val (x, b, e) = (es.head, es(1), es(2))
      val sz = Size(x, legacySizeOfNull = false)
      val bp = CaseWhen(Seq((LessThan(b, Literal(0)),
        Add(Add(sz, b), Literal(1)))), b)
      val bc = CaseWhen(Seq((LessThan(bp, Literal(1)), Literal(1))), bp)
      val ep = CaseWhen(Seq((LessThan(e, Literal(0)),
        Add(Add(sz, e), Literal(1)))), e)
      val ec = CaseWhen(Seq((GreaterThan(ep, sz), sz)), ep)
      val len0 = Add(Subtract(ec, bc), Literal(1))
      Slice(x, bc,
        CaseWhen(Seq((LessThan(len0, Literal(0)), Literal(0))), len0))
    }
    put("list_slice") { es => arity("list_slice", 3, es); duckSlice(es) }
    put("array_slice") { es => arity("array_slice", 3, es); duckSlice(es) }

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

    // NOTE deliberately absent: date_diff. Spark's parser grammar-matches
    // the 3-arg form into timestampdiff and rejects DuckDB's quoted unit
    // BEFORE function resolution, so no registered function can catch it
    // — it is a TEXT bridge in DuckDialect.rewrite instead (the part is
    // always a literal in the text), and the 2-arg Spark form never
    // reaches the parser special-case.
  }
}
