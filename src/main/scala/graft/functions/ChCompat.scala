package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** ClickHouse-compatible SQL function aliases (SURVEY §2C).
  *
  * The reference's documented analytical SQL (reference: README.md:88-129)
  * and its internally-issued queries (reference:
  * app/service/log_importer_status_checker.ts:23-26,
  * app/service/gitee_importer.ts:110-114) use a handful of ClickHouse
  * built-ins. Each alias here maps 1:1 onto an existing *codegen'd*
  * Catalyst expression — no UDF in the path, so whole-stage codegen and
  * constant folding still apply. Registered per-session via
  * [[registerAll]]; after that the reference SQL runs near-verbatim
  * through `spark.sql`.
  *
  * NOTE: registration is session-scoped and OPT-IN precisely because a
  * few names shadow Spark built-ins with ClickHouse semantics — `any`
  * becomes "arbitrary value" (ClickHouse) instead of Spark's boolean
  * OR aggregate; `median`/`ifNull` keep equivalent semantics. A session
  * that wants vanilla Spark SQL simply doesn't register the dialect.
  */
object ChCompat {

  /** Splits a JSON array text into the raw JSON text of its elements —
    * ClickHouse `JSONExtractArrayRaw` (reference: README.md:98). Kept as
    * an interpreted expression (compat shim, not a hot-path operator); in
    * our data model Nested columns are already `array<struct>` so the
    * idiomatic form is `explode(col)` and this function only serves
    * verbatim-SQL compatibility.
    */
  case class JsonExtractArrayRaw(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType)
    override def nullSafeEval(v: Any): Any = {
      val s = v.toString.trim
      if (!s.startsWith("[") || !s.endsWith("]")) null
      else {
        val body = s.substring(1, s.length - 1)
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.unsafe.types.UTF8String]
        var depth = 0; var inStr = false; var esc = false
        val cur = new StringBuilder
        def flush(): Unit = {
          val t = cur.toString.trim
          if (t.nonEmpty) out += org.apache.spark.unsafe.types.UTF8String.fromString(t)
          cur.clear()
        }
        body.foreach { c =>
          if (esc) { cur += c; esc = false }
          else if (inStr) { cur += c; if (c == '\\') esc = true else if (c == '"') inStr = false }
          else c match {
            case '"' => cur += c; inStr = true
            case '[' | '{' => depth += 1; cur += c
            case ']' | '}' => depth -= 1; cur += c
            case ',' if depth == 0 => flush()
            case _ => cur += c
          }
        }
        flush()
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Running prefix sums over a numeric array (CH `arrayCumSum`).
    * Double-typed (the builder casts the input): CH's per-int-width
    * result types don't survive a single expression; a compat shim,
    * like [[JsonExtractArrayRaw]].
    */
  case class ArrayCumSum(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      var acc = 0.0
      val out = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { acc += a(i); out(i) = acc; i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Adjacent differences, first element 0 (CH `arrayDifference`). */
  case class ArrayDifference(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      val out = new Array[Double](a.length)
      var i = 1
      while (i < a.length) { out(i) = a(i) - a(i - 1); i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Collapse CONSECUTIVE duplicates (CH `arrayCompact`) — not a
    * distinct: [1,1,2,1] → [1,2,1].
    */
  case class ArrayCompact(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = child.dataType
    override def nullSafeEval(v: Any): Any = {
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var prev: Any = this // sentinel unequal to any element
      var i = 0
      while (i < a.numElements()) {
        val e = a.get(i, elemType)
        if (out.isEmpty || e != prev) { out += e; prev = e }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  private def fmtInt(e: Expression, fmt: String): Expression =
    Cast(DateFormatClass(e, Literal(fmt)), IntegerType)
  private def fmtLong(e: Expression, fmt: String): Expression =
    Cast(DateFormatClass(e, Literal(fmt)), LongType)

  private def dblArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** floor a timestamp to `secs`-second buckets via epoch arithmetic */
  private def tsFloorSeconds(ts: Expression, secs: Long): Expression =
    Cast(Multiply(
      IntegralDivide(Cast(Cast(ts, TimestampType), LongType),
        Literal(secs), evalMode = EvalMode.LEGACY),
      Literal(secs)), TimestampType)

  /** parse_url part extraction; CH URL functions return '' (not null)
    * for absent parts
    */
  private def urlPart(url: Expression, part: String): Expression =
    Coalesce(Seq(new ParseUrl(Seq(url, Literal(part))), Literal("")))

  /** CH's multi-expression aggregate arguments count distinct TUPLES:
    * one arg passes through, several wrap in a struct.
    */
  private def tupleOf(es: Seq[Expression]): Expression =
    if (es.length == 1) es.head else CreateStruct(es)

  /** timestamp + seconds via epoch-second arithmetic (exact at CH's
    * second-precision DateTime).
    */
  private def chTsPlusSeconds(ts: Expression, secs: Expression): Expression =
    Cast(Add(Cast(Cast(ts, TimestampType), LongType), secs), TimestampType)

  /** TRY-mode cast: null instead of error/garbage on unparseable input. */
  private def tryCastTo(e: Expression, t: DataType): Expression =
    Cast(e, t, None, EvalMode.TRY)

  /** Column-side dot product / squared L2 — the same one-fold shape the
    * ANN operators use (codegen'd zip_with + aggregate).
    */
  private def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  }

  private def vecL2Sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x)
  }

  /** rotate left by n (mod size); empty arrays pass through */
  private def arrayRotate(a: Column, n: Column): Column = {
    import org.apache.spark.sql.functions._
    val sz = size(a)
    val k = pmod(n.cast("int"), sz)
    when(sz <= 0, a).otherwise(
      when(k === 0, a).otherwise(
        concat(slice(a, k + 1, sz - k), slice(a, lit(1), k))))
  }

  /** CH quantileExact: the ELEMENT at sorted index floor(level·n),
    * 0-based and clamped — no interpolation (quantileExact([1,2,3,4],
    * 0.5) = 3, where interpolating percentile gives 2.5).
    */
  private def chQuantileExactExpr(value: Expression, level: Expression)
      : Expression = {
    val sorted = new SortArray(
      aggregate.CollectList(value).toAggregateExpression())
    val n = Size(sorted)
    val idx = Least(Seq(
      Add(Cast(Floor(Multiply(Cast(level, DoubleType),
        Cast(n, DoubleType))), IntegerType), Literal(1)),
      n))
    If(EqualTo(n, Literal(0)), Literal.create(null, NullType),
      ElementAt(sorted, idx))
  }

  /** name -> expression builder; analyzer applies implicit type coercion
    * and wraps aggregate functions, exactly as for built-ins.
    */
  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "toYYYYMM" -> (es => fmtInt(es.head, "yyyyMM")),
    "toYYYYMMDD" -> (es => fmtInt(es.head, "yyyyMMdd")),
    "toYYYYMMDDhhmmss" -> (es => fmtLong(es.head, "yyyyMMddHHmmss")),
    "toYear" -> (es => Year(Cast(es.head, DateType))),
    "toMonth" -> (es => Month(Cast(es.head, DateType))),
    "toHour" -> (es => Hour(es.head)),
    "toStartOfMonth" -> (es => TruncDate(Cast(es.head, DateType), Literal("month"))),
    "toDate" -> (es => Cast(es.head, DateType)),
    "toUInt32" -> (es => Cast(es.head, IntegerType)),
    "toUInt64" -> (es => Cast(es.head, LongType)),
    "toString" -> (es => Cast(es.head, StringType)),
    "argMin" -> (es => MinBy(es(0), es(1))),
    "argMax" -> (es => MaxBy(es(0), es(1))),
    "JSONExtractString" -> (es =>
      GetJsonObject(es(0), Concat(Seq(Literal("$."), es(1))))),
    "JSONExtractInt" -> (es =>
      Cast(GetJsonObject(es(0), Concat(Seq(Literal("$."), es(1)))), LongType)),
    "JSONExtractArrayRaw" -> (es => JsonExtractArrayRaw(es.head)),
    "arrayJoin" -> (es => Explode(es.head)),
    "countIf" -> (es =>
      aggregate.Sum(If(es.head, Literal(1L), Literal(0L)))),
    "intDiv" -> (es => IntegralDivide(es(0), es(1), evalMode = EvalMode.LEGACY)),

    // ---- breadth beyond the reference's own queries: the aliases a
    // ClickHouse user reaches for in ad-hoc SQL. Every one maps to a
    // codegen'd Catalyst expression; none is a UDF. ----
    "toDayOfMonth" -> (es => DayOfMonth(Cast(es.head, DateType))),
    // ClickHouse numbers Monday=1..Sunday=7; Spark weekday() is Mon=0
    "toDayOfWeek" -> (es => Add(WeekDay(Cast(es.head, DateType)), Literal(1))),
    "toQuarter" -> (es => Quarter(Cast(es.head, DateType))),
    "toMinute" -> (es => Minute(es.head)),
    "toSecond" -> (es => Second(es.head)),
    "toStartOfYear" -> (es => TruncDate(Cast(es.head, DateType), Literal("year"))),
    "toStartOfDay" -> (es => TruncTimestamp(Literal("day"), es.head)),
    "toStartOfHour" -> (es => TruncTimestamp(Literal("hour"), es.head)),
    "toMonday" -> (es => TruncDate(Cast(es.head, DateType), Literal("week"))),
    "toUnixTimestamp" -> (es => UnixTimestamp(es.head,
      Literal("yyyy-MM-dd HH:mm:ss"))),
    "today" -> (_ => CurrentDate()),
    "yesterday" -> (_ => DateSub(CurrentDate(), Literal(1))),
    "formatDateTime" -> (es => DateFormatClass(es(0), chFormat(es(1)))),
    "toInt32" -> (es => Cast(es.head, IntegerType)),
    "toInt64" -> (es => Cast(es.head, LongType)),
    "toFloat32" -> (es => Cast(es.head, FloatType)),
    "toFloat64" -> (es => Cast(es.head, DoubleType)),
    "ifNull" -> (es => Coalesce(es)),
    // conditional aggregate combinators (the *If family)
    "sumIf" -> (es => aggregate.Sum(If(es(1), es(0),
      Literal.create(null, NullType)))),
    "avgIf" -> (es => aggregate.Average(If(es(1), es(0),
      Literal.create(null, NullType)))),
    "minIf" -> (es => aggregate.Min(If(es(1), es(0),
      Literal.create(null, NullType)))),
    "maxIf" -> (es => aggregate.Max(If(es(1), es(0),
      Literal.create(null, NullType)))),
    // distinct-count If-combinators: the condition routes non-matching
    // rows to NULL, which every distinct aggregate ignores
    "uniqIf" -> (es => aggregate.HyperLogLogPlusPlus(
      If(es.last, tupleOf(es.dropRight(1)), Literal.create(null, NullType)))),
    "uniqExactIf" -> (es => Size(aggregate.CollectSet(
      If(es.last, tupleOf(es.dropRight(1)), Literal.create(null, NullType)))
      .toAggregateExpression())),
    "groupArrayIf" -> (es => aggregate.CollectList(
      If(es(1), es(0), Literal.create(null, NullType)))),
    // uniq is approximate in ClickHouse too (HLL-family) — mapping it
    // to HyperLogLog++ preserves the contract; uniqExact is exact.
    // The CH uniq family takes MULTIPLE expressions (distinct tuples):
    // wrap >1 arg in a struct so the hash covers the tuple.
    "uniq" -> (es => aggregate.HyperLogLogPlusPlus(tupleOf(es))),
    // exact distinct as size(collect_set): a pre-built distinct
    // AggregateExpression does not survive analyzer re-wrapping
    "uniqExact" -> (es => Size(
      aggregate.CollectSet(tupleOf(es)).toAggregateExpression())),
    "any" -> (es => aggregate.First(es.head, ignoreNulls = false)),
    "anyLast" -> (es => aggregate.Last(es.head, ignoreNulls = false)),
    "groupArray" -> (es => aggregate.CollectList(es.head)),
    "groupUniqArray" -> (es => aggregate.CollectSet(es.head)),
    "median" -> (es => aggregate.Percentile(es.head, Literal(0.5), Literal(1L))),
    // array/string helpers
    "splitByChar" -> (es => StringSplit(es(1), es(0), Literal(-1))),
    "arrayStringConcat" -> (es =>
      if (es.length > 1) ArrayJoin(es(0), es(1), None)
      else ArrayJoin(es(0), Literal(""), None)),
    "arrayDistinct" -> (es => ArrayDistinct(es.head)),
    "has" -> (es => ArrayContains(es(0), es(1))),
    "indexOf" -> (es => ArrayPosition(es(0), es(1))),

    // ---- second widening pass: conditionals, date arithmetic,
    // string/array predicates. Same contract as above — every alias
    // is a thin builder over a codegen'd Catalyst expression. ----
    // multiIf(c1,v1, c2,v2, …, else) — ClickHouse's flat CASE
    "multiIf" -> (es => {
      val branches = es.dropRight(1).grouped(2)
        .map { case Seq(c, v) => (c, v) }.toSeq
      CaseWhen(branches, Some(es.last))
    }),
    // chDateDiff: target of ChSqlRewrite's dateDiff('unit',…) rewrite
    // (Spark's grammar reserves the dateDiff name and demands an
    // unquoted unit). CH counts UNIT-BOUNDARY crossings (both sides
    // truncated to the unit, then diffed), not elapsed whole units:
    // dateDiff('hour', 10:59, 11:01) = 1. CH's optional 4th timezone
    // argument is accepted and ignored — the session runs in UTC.
    "chDateDiff" -> (es => {
      def seconds(e: Expression, unit: String): Expression =
        Cast(TruncTimestamp(Literal(unit), Cast(e, TimestampType)), LongType)
      def bySeconds(per: Long, unit: String): Expression = Cast(
        IntegralDivide(Subtract(seconds(es(2), unit), seconds(es(1), unit)),
          Literal(per), evalMode = EvalMode.LEGACY), IntegerType)
      es.head match {
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          u.toString match {
            case "day" =>
              DateDiff(Cast(es(2), DateType), Cast(es(1), DateType))
            case "month" => Subtract(
              Add(Multiply(Year(Cast(es(2), DateType)), Literal(12)),
                Month(Cast(es(2), DateType))),
              Add(Multiply(Year(Cast(es(1), DateType)), Literal(12)),
                Month(Cast(es(1), DateType))))
            case "year" => Subtract(Year(Cast(es(2), DateType)),
              Year(Cast(es(1), DateType)))
            case "hour" => bySeconds(3600L, "hour")
            case "minute" => bySeconds(60L, "minute")
            case "second" => bySeconds(1L, "second")
            case other => throw new IllegalArgumentException(
              s"dateDiff: unsupported unit '$other'")
          }
        case _ => throw new IllegalArgumentException(
          "dateDiff: unit must be a string literal")
      }
    }),
    // age('unit', start, end) — CH's ELAPSED-whole-units counterpart
    // to dateDiff's boundary counting: age('hour', 10:59, 11:01) = 0.
    "age" -> (es => {
      def epoch(e: Expression): Expression =
        Cast(Cast(e, TimestampType), LongType)
      def byElapsed(per: Long): Expression = Cast(
        IntegralDivide(Subtract(epoch(es(2)), epoch(es(1))),
          Literal(per), evalMode = EvalMode.LEGACY), IntegerType)
      es.head match {
        case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          u.toString match {
            case "year" => Cast(IntegralDivide(
              Cast(MonthsBetween(Cast(es(2), TimestampType),
                Cast(es(1), TimestampType), Literal(false)), IntegerType),
              Literal(12L), evalMode = EvalMode.LEGACY), IntegerType)
            case "month" => Cast(MonthsBetween(Cast(es(2), TimestampType),
              Cast(es(1), TimestampType), Literal(false)), IntegerType)
            case "day" => byElapsed(86400L)
            case "hour" => byElapsed(3600L)
            case "minute" => byElapsed(60L)
            case "second" => byElapsed(1L)
            case other => throw new IllegalArgumentException(
              s"age: unsupported unit '$other'")
          }
        case _ => throw new IllegalArgumentException(
          "age: unit must be a string literal")
      }
    }),
    // chQuantile/chQuantiles (CH's APPROXIMATE quantile contract) map
    // to the exact interpolating Percentile aggregate — deterministic,
    // and a valid implementation of an approximate contract.
    "chQuantile" -> (es => aggregate.Percentile(es(1), es(0), Literal(1L))),
    // quantileDeterministic(level)(x, det): the determinator only
    // stabilizes CH's sampling — the exact interpolating percentile
    // is deterministic already, so the third argument is ignored
    "chQuantileDet" -> (es =>
      aggregate.Percentile(es(1), es(0), Literal(1L))),
    "chQuantiles" -> (es => aggregate.Percentile(es.last,
      CreateArray(es.dropRight(1)), Literal(1L))),
    // chQuantileExact/chMedianExact: CH returns an ACTUAL ELEMENT, not
    // an interpolation — sorted[floor(level * n)] (0-based, clamped).
    // Built as element_at(sort(collect_list(x)), idx) so the semantics
    // match exactly; buffers the group like any exact quantile.
    "chQuantileExact" -> (es => chQuantileExactExpr(es(1), es(0))),
    "chMedianExact" -> (es => chQuantileExactExpr(es.head, Literal(0.5))),
    "chQuantilesExact" -> (es => CreateArray(
      es.dropRight(1).map(p => chQuantileExactExpr(es.last, p)))),
    // uniqCombined/uniqHLL12: CH's other HLL-family estimators — same
    // HyperLogLog++ contract as uniq, incl. multi-arg tuple form
    "uniqCombined" -> (es => aggregate.HyperLogLogPlusPlus(tupleOf(es))),
    "uniqHLL12" -> (es => aggregate.HyperLogLogPlusPlus(tupleOf(es))),
    // uniqTheta: CH's theta-sketch estimator — same approximate
    // distinct-count contract, served by the HLL++ estimator here
    "uniqTheta" -> (es => aggregate.HyperLogLogPlusPlus(tupleOf(es))),
    // group bitwise aggregates
    "groupBitAnd" -> (es => aggregate.BitAndAgg(es.head)),
    "groupBitOr" -> (es => aggregate.BitOrAgg(es.head)),
    "groupBitXor" -> (es => aggregate.BitXorAgg(es.head)),
    // the *Stable variants differ only in summation order (CH offers
    // them for reproducibility); the statistic is identical
    "corrStable" -> (es => aggregate.Corr(es(0), es(1))),
    "varSampStable" -> (es => aggregate.VarianceSamp(es.head)),
    "varPopStable" -> (es => aggregate.VariancePop(es.head)),
    "covarPopStable" -> (es => aggregate.CovPopulation(es(0), es(1))),
    "covarSampStable" -> (es => aggregate.CovSample(es(0), es(1))),
    // avgWeighted(x, w) = sum(x*w) / sum(w), NULL on zero total weight
    // (CH returns NaN there; NULL is Spark's honest spelling of the
    // same undefined case and survives comparisons)
    "avgWeighted" -> (es => {
      val sumW = aggregate.Sum(Cast(es(1), DoubleType)).toAggregateExpression()
      Divide(
        aggregate.Sum(Multiply(Cast(es(0), DoubleType),
          Cast(es(1), DoubleType))).toAggregateExpression(),
        If(EqualTo(sumW, Literal(0.0d)), Literal(null, DoubleType), sumW),
        EvalMode.LEGACY)
    }),
    // external dictionaries (Dictionaries.register first): broadcast
    // hash-map probes that compose anywhere an expression can — incl.
    // GROUP BY keys, where a subquery rewrite would be rejected
    "dictGet" -> (Dictionaries.dictGet _),
    "dictGetOrDefault" -> (Dictionaries.dictGetOrDefault _),
    "dictHas" -> (Dictionaries.dictHas _),
    "dictGetString" -> Dictionaries.dictGetTyped(StringType),
    "dictGetUInt64" -> Dictionaries.dictGetTyped(LongType),
    "dictGetInt64" -> Dictionaries.dictGetTyped(LongType),
    "dictGetUInt32" -> Dictionaries.dictGetTyped(IntegerType),
    "dictGetInt32" -> Dictionaries.dictGetTyped(IntegerType),
    "dictGetFloat64" -> Dictionaries.dictGetTyped(DoubleType),
    "dictGetDate" -> Dictionaries.dictGetTyped(DateType),
    "dictGetDateTime" -> Dictionaries.dictGetTyped(TimestampType),
    // tuple: CH's anonymous struct constructor (also the dictionary
    // composite-key spelling); tupleElement by 1-based index or name
    "tuple" -> (es => CreateStruct(es)),
    "tupleElement" -> (es => es(1) match {
      case Literal(i: Int, IntegerType) => GetStructField(es(0), i - 1)
      case Literal(_, StringType) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(es(0), es(1))
      case other => throw new IllegalArgumentException(
        s"tupleElement: index must be an int or string literal, got $other")
    }),
    // URL family over parse_url (codegen'd); CH returns '' for absent
    // parts, hence the coalesce
    "protocol" -> (es => urlPart(es.head, "PROTOCOL")),
    "domain" -> (es => urlPart(es.head, "HOST")),
    "domainWithoutWWW" -> (es => RegExpReplace(urlPart(es.head, "HOST"),
      Literal("^www\\."), Literal(""))),
    "topLevelDomain" -> (es => RegExpExtract(urlPart(es.head, "HOST"),
      Literal("\\.([^.]+)$"), Literal(1))),
    "path" -> (es => urlPart(es.head, "PATH")),
    "pathFull" -> (es => urlPart(es.head, "FILE")),
    "queryString" -> (es => urlPart(es.head, "QUERY")),
    "extractURLParameter" -> (es => Coalesce(Seq(
      new ParseUrl(Seq(es(0), Literal("QUERY"), es(1))), Literal("")))),
    "cutQueryString" -> (es => RegExpReplace(es.head,
      Literal("\\?[^#]*"), Literal(""))),
    // hash family. sipHash64/cityHash64/farmHash64 keep CH's CONTRACT
    // (uniform 64-bit hash of the arguments, multi-arg combined) via
    // xxhash64 — the bit VALUES differ from ClickHouse's (these names
    // exist for bucketing/sampling/fingerprinting, where any strong
    // hash serves; cross-engine bit-parity is only promised for
    // halfMD5, which is defined in terms of standard MD5)
    "sipHash64" -> (es => XxHash64(es, 42L)),
    "cityHash64" -> (es => XxHash64(es, 42L)),
    "farmHash64" -> (es => XxHash64(es, 42L)),
    "farmFingerprint64" -> (es => XxHash64(es, 42L)),
    "intHash64" -> (es => XxHash64(es, 42L)),
    "intHash32" -> (es => Murmur3Hash(es, 42)),
    // halfMD5: first 8 MD5 bytes as a big-endian unsigned integer —
    // bit-compatible with ClickHouse (DECIMAL(20,0): UInt64 range
    // exceeds Long)
    "halfMD5" -> (es => Cast(Conv(Substring(Md5(es.head), Literal(1),
      Literal(16)), Literal(16), Literal(10)), DecimalType(20, 0))),
    "hex" -> (es => Hex(es.head)),
    "unhex" -> (es => Unhex(es.head)),
    "MD5" -> (es => Md5(es.head)),
    "SHA256" -> (es => Sha2(es.head, Literal(256))),
    // relative-time bucket numbers (epoch-anchored, CH semantics)
    "toRelativeSecondNum" -> (es => Cast(Cast(es.head, TimestampType), LongType)),
    "toRelativeMinuteNum" -> (es => IntegralDivide(
      Cast(Cast(es.head, TimestampType), LongType), Literal(60L),
      evalMode = EvalMode.LEGACY)),
    "toRelativeHourNum" -> (es => IntegralDivide(
      Cast(Cast(es.head, TimestampType), LongType), Literal(3600L),
      evalMode = EvalMode.LEGACY)),
    "toRelativeDayNum" -> (es => IntegralDivide(
      Cast(Cast(es.head, TimestampType), LongType), Literal(86400L),
      evalMode = EvalMode.LEGACY)),
    // n-unit time buckets
    "toStartOfFiveMinutes" -> (es => tsFloorSeconds(es.head, 300L)),
    "toStartOfTenMinutes" -> (es => tsFloorSeconds(es.head, 600L)),
    "toStartOfFifteenMinutes" -> (es => tsFloorSeconds(es.head, 900L)),
    // toStartOfInterval(ts, INTERVAL n unit): day-time intervals floor
    // by epoch seconds; year-month intervals support the calendar
    // buckets with a trunc equivalent (1 month / 1 quarter / 1 year)
    "toStartOfInterval" -> (es => es(1) match {
      case Literal(micros: Long, _: DayTimeIntervalType) =>
        val secs = micros / 1000000L
        require(secs > 0 && micros % 1000000L == 0,
          "toStartOfInterval: sub-second intervals unsupported")
        tsFloorSeconds(es(0), secs)
      case Literal(months: Int, _: YearMonthIntervalType) => months match {
        case 1 => TruncTimestamp(Literal("month"), es(0))
        case 3 => TruncTimestamp(Literal("quarter"), es(0))
        case 12 => TruncTimestamp(Literal("year"), es(0))
        case n => throw new IllegalArgumentException(
          s"toStartOfInterval: $n-month buckets unsupported (1/3/12 are)")
      }
      case other => throw new IllegalArgumentException(
        s"toStartOfInterval: second argument must be an INTERVAL literal, got $other")
    }),
    // text tokenization: letters-only runs (CH alphaTokens)
    "alphaTokens" -> (es => ArrayRemove(
      StringSplit(es.head, Literal("[^\\p{L}]+"), Literal(-1)), Literal(""))),
    // array math/shape (second batch)
    "arrayIntersect" -> (es => es.reduceLeft(ArrayIntersect(_, _))),
    "arrayZip" -> (es => ArraysZip(es)),
    "arrayAvg" -> (es => {
      val a = dblArray(es.head)
      If(Or(IsNull(a), EqualTo(Size(a), Literal(0))), Literal(0.0),
        Divide(ArrayAggregate(a, Literal(0.0),
          LambdaFunction(Add(UnresolvedNamedLambdaVariable(Seq("acc")),
            UnresolvedNamedLambdaVariable(Seq("x"))),
            Seq(UnresolvedNamedLambdaVariable(Seq("acc")),
              UnresolvedNamedLambdaVariable(Seq("x")))),
          LambdaFunction.identity), Cast(Size(a), DoubleType)))
    }),
    "arrayProduct" -> (es => ArrayAggregate(dblArray(es.head), Literal(1.0),
      LambdaFunction(Multiply(UnresolvedNamedLambdaVariable(Seq("acc")),
        UnresolvedNamedLambdaVariable(Seq("x"))),
        Seq(UnresolvedNamedLambdaVariable(Seq("acc")),
          UnresolvedNamedLambdaVariable(Seq("x")))),
      LambdaFunction.identity)),
    "arrayCumSum" -> (es => ArrayCumSum(dblArray(es.head))),
    "arrayDifference" -> (es => ArrayDifference(dblArray(es.head))),
    "arrayCompact" -> (es => ArrayCompact(es.head)),
    "arrayPopBack" -> (es => Slice(es.head, Literal(1),
      Greatest(Seq(Subtract(Size(es.head), Literal(1)), Literal(0))))),
    "arrayPushFront" -> (es => Concat(Seq(CreateArray(Seq(es(1))), es(0)))),
    // per-key map aggregation over parallel (keys, values) arrays —
    // CH's Nested-counter idiom; bounded (distinct-key-sized) buffer
    "sumMap" -> (es => MapCombineAgg(es(0),
      Cast(es(1), ArrayType(DoubleType)), "sum")),
    "minMap" -> (es => MapCombineAgg(es(0),
      Cast(es(1), ArrayType(DoubleType)), "min")),
    "maxMap" -> (es => MapCombineAgg(es(0),
      Cast(es(1), ArrayType(DoubleType)), "max")),
    // CH window-function names over Spark's identical Lag/Lead
    "lagInFrame" -> (es => Lag(es(0),
      if (es.length > 1) es(1) else Literal(1),
      if (es.length > 2) es(2) else Literal(null), ignoreNulls = false)),
    "leadInFrame" -> (es => Lead(es(0),
      if (es.length > 1) es(1) else Literal(1),
      if (es.length > 2) es(2) else Literal(null), ignoreNulls = false)),
    // nullability adapters: Spark columns are nullable by convention,
    // so both are semantic no-ops that keep CH SQL parsing
    "assumeNotNull" -> (es => es.head),
    "toNullable" -> (es => es.head),
    // typed empty-array constructors
    "emptyArrayString" -> (_ =>
      Literal.create(Array.empty[String], ArrayType(StringType, false))),
    "emptyArrayInt64" -> (_ =>
      Literal.create(Array.empty[Long], ArrayType(LongType, false))),
    "emptyArrayUInt64" -> (_ =>
      Literal.create(Array.empty[Long], ArrayType(LongType, false))),
    "emptyArrayInt32" -> (_ =>
      Literal.create(Array.empty[Int], ArrayType(IntegerType, false))),
    "emptyArrayUInt32" -> (_ =>
      Literal.create(Array.empty[Int], ArrayType(IntegerType, false))),
    "emptyArrayFloat64" -> (_ =>
      Literal.create(Array.empty[Double], ArrayType(DoubleType, false))),
    // toTimeZone: CH re-displays the same instant in another zone;
    // Spark timestamps render in the session zone, so the nearest
    // spelling is from_utc_timestamp's wall-clock shift — the INSTANT
    // changes but the rendered wall-clock matches CH's display,
    // which is what dashboard queries grouped by local hour want
    "toTimeZone" -> (es => FromUTCTimestamp(es(0), es(1))),
    "toTimezone" -> (es => FromUTCTimestamp(es(0), es(1))),
    // arrayReduce('aggName', arr): dispatch on the literal agg name
    "arrayReduce" -> (es => {
      val arr = es(1)
      es.head match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          s.toString.toLowerCase match {
            case "sum" => builders("arraySum")(Seq(arr))
            case "min" => ArrayMin(arr)
            case "max" => ArrayMax(arr)
            case "avg" => builders("arrayAvg")(Seq(arr))
            case "count" => Size(arr)
            case "uniq" | "uniqexact" => Size(ArrayDistinct(arr))
            case other => throw new IllegalArgumentException(
              s"arrayReduce: unsupported aggregate '$other' " +
                "(sum/min/max/avg/count/uniq/uniqExact)")
          }
        case other => throw new IllegalArgumentException(
          s"arrayReduce: first argument must be a string literal, got $other")
      }
    }),
    // CH transform(x, from, to[, default]): value mapping over literal
    // arrays — reached as chTransform via ChSqlRewrite's arity
    // dispatch (the bare name is Spark's array HOF and stays intact)
    "chTransform" -> (es => {
      val mapped = ElementAt(MapFromArrays(es(1), es(2)), es(0),
        failOnError = false)
      if (es.length > 3) Coalesce(Seq(mapped, es(3)))
      else Coalesce(Seq(mapped, es(0)))
    }),
    // the moment-statistics family: CH's Pop/Samp names over Spark's
    // identical-formula aggregates. skewPop matches Spark's skewness
    // (population m3/m2^1.5); kurtPop is NON-excess kurtosis where
    // Spark's kurtosis is excess — the +3 restores CH's value exactly.
    "stddevPop" -> (es => aggregate.StddevPop(es.head)),
    "stddevSamp" -> (es => aggregate.StddevSamp(es.head)),
    "varPop" -> (es => aggregate.VariancePop(es.head)),
    "varSamp" -> (es => aggregate.VarianceSamp(es.head)),
    "covarPop" -> (es => aggregate.CovPopulation(es(0), es(1))),
    "covarSamp" -> (es => aggregate.CovSample(es(0), es(1))),
    "corr" -> (es => aggregate.Corr(es(0), es(1))),
    "skewPop" -> (es => aggregate.Skewness(es.head)),
    "kurtPop" -> (es => Add(
      aggregate.Kurtosis(es.head).toAggregateExpression(), Literal(3.0d))),
    // anyHeavy: CH's single heavy-hitter value — the k=1 cut of the
    // frequent-items sketch (string-typed, like chTopK). failOnError =
    // false so an all-NULL group (empty sketch cut) yields NULL under
    // ANSI mode too, instead of INVALID_ARRAY_INDEX.
    "anyHeavy" -> (es => ElementAt(
      FreqTopK(Cast(es.head, StringType), k = 1, maxMapSize = 1024,
        itemsOnly = true).toAggregateExpression(),
      Literal(1), None, failOnError = false)),
    // chTopK: target of ChSqlRewrite's topK(k)(x) — CH returns the
    // value array; backed by the string-keyed FreqTopK frequent-items
    // sketch, so the result is array<string> regardless of the input
    // type (a DOCUMENTED divergence: CH preserves the element type;
    // preserving it here would need a type-generic sketch serde)
    "chTopK" -> (es => es.head match {
      case Literal(k: Int, IntegerType) =>
        FreqTopK(Cast(es(1), StringType), k, maxMapSize = 1024,
          itemsOnly = true)
      case other => throw new IllegalArgumentException(
        s"topK: k must be an integer literal, got $other")
    }),
    // chTopKWeighted: curried topKWeighted(k)(x, w) — each row counts
    // `w` times in the frequent-items sketch (same string-typed
    // divergence as chTopK)
    "chTopKWeighted" -> (es => es.head match {
      case Literal(k: Int, IntegerType) =>
        FreqTopK(Cast(es(1), StringType), k, maxMapSize = 1024,
          itemsOnly = true, weight = Some(Cast(es(2), LongType)))
      case other => throw new IllegalArgumentException(
        s"topKWeighted: k must be an integer literal, got $other")
    }),
    "addDays" -> (es => DateAdd(Cast(es(0), DateType), es(1))),
    "subtractDays" -> (es => DateSub(Cast(es(0), DateType), es(1))),
    "addMonths" -> (es => AddMonths(Cast(es(0), DateType), es(1))),
    "subtractMonths" -> (es =>
      AddMonths(Cast(es(0), DateType), UnaryMinus(es(1)))),
    "addYears" -> (es => AddMonths(Cast(es(0), DateType),
      Multiply(es(1), Literal(12)))),
    "subtractYears" -> (es => AddMonths(Cast(es(0), DateType),
      Multiply(UnaryMinus(es(1)), Literal(12)))),
    // sub-day arithmetic via epoch seconds — CH DateTime is
    // second-precision, so ts→long→ts round-trips exactly
    "addHours" -> (es => chTsPlusSeconds(es(0),
      Multiply(Cast(es(1), LongType), Literal(3600L)))),
    "addMinutes" -> (es => chTsPlusSeconds(es(0),
      Multiply(Cast(es(1), LongType), Literal(60L)))),
    "addSeconds" -> (es => chTsPlusSeconds(es(0), Cast(es(1), LongType))),
    "subtractHours" -> (es => chTsPlusSeconds(es(0),
      Multiply(Cast(es(1), LongType), Literal(-3600L)))),
    "subtractMinutes" -> (es => chTsPlusSeconds(es(0),
      Multiply(Cast(es(1), LongType), Literal(-60L)))),
    "subtractSeconds" -> (es => chTsPlusSeconds(es(0),
      UnaryMinus(Cast(es(1), LongType)))),
    "toLastDayOfMonth" -> (es => LastDay(Cast(es.head, DateType))),
    "toStartOfMinute" -> (es => TruncTimestamp(Literal("minute"), es.head)),
    // splitByString: LITERAL separator (splitByChar's multi-char
    // sibling) — quote it so regex metacharacters split literally
    "splitByString" -> (es => es(0) match {
      case Literal(sep: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        StringSplit(es(1),
          Literal(java.util.regex.Pattern.quote(sep.toString)), Literal(-1))
      case other => throw new IllegalArgumentException(
        s"splitByString: separator must be a string literal, got $other")
    }),
    "toStartOfQuarter" -> (es =>
      TruncDate(Cast(es.head, DateType), Literal("quarter"))),
    // CH default mode 0 is SUNDAY-start; ODD modes (1, 3, …) are
    // Monday-start. Spark's trunc('week') is Monday-start, so the
    // Sunday form rolls back explicitly: d - (dayofweek(d) - 1).
    "toStartOfWeek" -> (es => {
      val monday = es.lift(1) match {
        case None => false
        case Some(Literal(m: Int, IntegerType)) => m % 2 == 1
        case Some(other) => throw new IllegalArgumentException(
          s"toStartOfWeek: mode must be an integer literal, got $other")
      }
      if (monday) TruncDate(Cast(es.head, DateType), Literal("week"))
      else DateSub(Cast(es.head, DateType),
        Subtract(DayOfWeek(Cast(es.head, DateType)), Literal(1)))
    }),
    "toDateTime" -> (es => Cast(es.head, TimestampType)),
    "now" -> (_ => Cast(CurrentTimestamp(), TimestampType)),
    // string predicates/helpers
    "empty" -> (es => EqualTo(Length(es.head), Literal(0))),
    "notEmpty" -> (es => GreaterThan(Length(es.head), Literal(0))),
    "lengthUTF8" -> (es => Length(es.head)),
    // chPosition: CH's position(haystack, needle[, start]) — argument
    // order is the REVERSE of Spark's built-in position(substr, str).
    // Registered under a non-colliding name so the built-in (and the
    // SQL-standard `POSITION(x IN y)` form, which parses to a call of
    // `position`) keep Spark semantics; ChSqlRewrite maps the CH
    // dialect's comma-form `position(...)` here.
    "chPosition" -> (es => StringLocate(es(1), es(0),
      if (es.length > 2) es(2) else Literal(1))),
    "positionCaseInsensitive" -> (es =>
      StringLocate(Lower(es(1)), Lower(es(0)),
        if (es.length > 2) es(2) else Literal(1))),
    "substringUTF8" -> (es => Substring(es(0), es(1), es(2))),
    "lowerUTF8" -> (es => Lower(es.head)),
    "upperUTF8" -> (es => Upper(es.head)),
    "leftPad" -> (es => StringLPad(es(0), es(1),
      if (es.length > 2) es(2) else Literal(" "))),
    "rightPad" -> (es => StringRPad(es(0), es(1),
      if (es.length > 2) es(2) else Literal(" "))),
    "trimBoth" -> (es => StringTrim(es.head)),
    // array math/shape
    "arraySum" -> (es => ArrayAggregate(
      es.head,
      Literal(0.0),
      LambdaFunction(Add(UnresolvedNamedLambdaVariable(Seq("acc")),
        Cast(UnresolvedNamedLambdaVariable(Seq("x")), DoubleType)),
        Seq(UnresolvedNamedLambdaVariable(Seq("acc")),
          UnresolvedNamedLambdaVariable(Seq("x")))),
      LambdaFunction.identity)),
    "arrayMin" -> (es => ArrayMin(es.head)),
    "arrayMax" -> (es => ArrayMax(es.head)),
    "arrayConcat" -> (es => Concat(es)),
    "arraySort" -> (es => new SortArray(es.head)),
    "arrayReverse" -> (es => Reverse(es.head)),
    "arrayFlatten" -> (es => Flatten(es.head)),
    "arraySlice" -> (es => Slice(es(0), es(1), es(2))),
    "arrayPushBack" -> (es => Concat(Seq(es(0), CreateArray(Seq(es(1)))))),
    // 1-based position indexes, CH's companion to arrayJoin
    // bookkeeping. Empty arrays must not fall into Sequence's
    // descending default (the same trap `range` guards against).
    "arrayEnumerate" -> (es => If(IsNull(es.head),
      Literal.create(null, ArrayType(IntegerType, false)),
      If(EqualTo(Size(es.head), Literal(0)),
        Literal.create(Array.empty[Int], ArrayType(IntegerType, false)),
        Sequence(Literal(1), Size(es.head), None, None)))),
    // range: CH's half-open [start, end) with explicit step. Spark's
    // Sequence is closed and DEFAULTS to step -1 when start > stop, so
    // the empty cases (range(0), range(5,2)) must not fall through to
    // a descending sequence: guard with an empty-array branch.
    "range" -> (es => {
      val (startE, endE, stepE) = es.length match {
        case 1 => (Literal(0L), Cast(es(0), LongType), Literal(1L))
        case 2 => (Cast(es(0), LongType), Cast(es(1), LongType), Literal(1L))
        case _ => (Cast(es(0), LongType), Cast(es(1), LongType),
          Cast(es(2), LongType))
      }
      // null inputs propagate to NULL (matching both CH and the plain
      // Sequence form); only a genuinely-empty range yields []
      If(Or(IsNull(startE), Or(IsNull(endE), IsNull(stepE))),
        Literal.create(null, ArrayType(LongType, false)),
        If(LessThan(startE, endE),
          Sequence(startE, Subtract(endE, Literal(1L)), Some(stepE), None),
          Literal.create(Array.empty[Long], ArrayType(LongType, false))))
    }),
    // string/regex (third pass)
    "match" -> (es => RLike(es(0), es(1))),
    // chExtract: CH's regex extract(haystack, pattern) — first
    // capturing group if the pattern has one, else the whole match —
    // decided at plan time by COMPILING a literal pattern and counting
    // its real capturing groups (a contains-"(" check misfires on \(
    // and (?:...)); non-literal patterns default to the whole match.
    // Registered under a non-colliding name: `EXTRACT(YEAR FROM ts)`
    // parses to a call of `extract`, which must stay Spark's date-part
    // built-in. ChSqlRewrite maps the CH comma-form `extract(x, re)`
    // here (the two shapes differ in top-level arg count).
    "chExtract" -> (es => {
      val group = es(1) match {
        case Literal(p: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          try {
            if (java.util.regex.Pattern.compile(p.toString)
              .matcher("").groupCount() > 0) 1 else 0
          } catch { case _: Exception => 0 }
        case _ => 0
      }
      RegExpExtract(es(0), es(1), Literal(group))
    }),
    "replaceAll" -> (es => StringReplace(es(0), es(1), es(2))),
    "replaceRegexpAll" -> (es => RegExpReplace(es(0), es(1), es(2))),
    // replaceOne: first occurrence only — Spark has no replace-first
    // builtin, so compose it: h[1..pos) ++ r ++ h[pos+len(p)..] when
    // the needle occurs, else h unchanged (empty needle: instr=1 per
    // CH/Spark convention, degenerating to prepend — matches CH)
    "replaceOne" -> (es => {
      val pos = StringLocate(es(1), es(0), Literal(1))
      If(GreaterThan(pos, Literal(0)),
        Concat(Seq(
          Substring(es(0), Literal(1), Subtract(pos, Literal(1))),
          es(2),
          Substring(es(0), Add(pos, Length(es(1))), Literal(Int.MaxValue)))),
        es(0))
    }),
    // empty needle is defined as 0, not a NULL from divide-by-zero
    "countSubstrings" -> (es => If(EqualTo(Length(es(1)), Literal(0)),
      Literal(0),
      Cast(IntegralDivide(
        Subtract(Length(es(0)),
          Length(StringReplace(es(0), es(1), Literal("")))),
        Length(es(1)), evalMode = EvalMode.LEGACY), IntegerType))),
    "trimLeft" -> (es => StringTrimLeft(es.head)),
    "trimRight" -> (es => StringTrimRight(es.head)),
    "arrayUniq" -> (es => Size(ArrayDistinct(es.head))),
    "bitCount" -> (es => BitwiseCount(es.head)),
    // array predicates over a second array
    "hasAny" -> (es => ArraysOverlap(es(0), es(1))),
    "hasAll" -> (es => EqualTo(Size(ArrayExcept(es(1), es(0))), Literal(0))),
    // higher-order array functions — ClickHouse puts the LAMBDA FIRST
    // (`arrayMap(x -> x * 2, arr)`); Spark's HOF expressions take the
    // array first, so the builders swap. The lambda parses through the
    // same grammar as Spark's own transform/filter and resolves in the
    // analyzer exactly like a built-in HOF's.
    // CH's multi-array map over TWO arrays is Spark's zip_with; more
    // than two (or multi-array filter/exists/all) has no single Spark
    // HOF — reject loudly rather than silently dropping arguments
    "arrayMap" -> (es => es.length match {
      case 2 => ArrayTransform(es(1), es(0))
      case 3 => ZipWith(es(1), es(2), es(0))
      case n => throw new IllegalArgumentException(
        s"arrayMap: expected a lambda and 1-2 arrays, got $n args")
    }),
    "arrayFilter" -> (es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"arrayFilter: expected a lambda and 1 array, got ${es.length} args")
      ArrayFilter(es(1), es(0))
    }),
    "arrayExists" -> (es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"arrayExists: expected a lambda and 1 array, got ${es.length} args")
      ArrayExists(es(1), es(0))
    }),
    "arrayAll" -> (es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"arrayAll: expected a lambda and 1 array, got ${es.length} args")
      ArrayForAll(es(1), es(0))
    }),
    // arrayCount/arrayFirst live in ChSqlRewrite, not here: their
    // natural builders (Size/ElementAt over a filter) put a
    // non-higher-order function at the resolution root, which the
    // analyzer rejects when a lambda argument is present — the
    // rewrite spells them as size(filter(...)) / try_element_at
    // instead, where the lambda's parent IS the built-in HOF.
    // chUniqUpTo: CH's uniqUpTo(N)(x…) — exact distinct while ≤ N,
    // N+1 as the saturation marker beyond (reached via the curried
    // rewrite). Multi-arg form counts distinct tuples like uniq.
    "chUniqUpTo" -> (es => Least(Seq(
      Size(aggregate.CollectSet(tupleOf(es.tail)).toAggregateExpression()),
      Add(Cast(es.head, IntegerType), Literal(1))))),
    // chWindowFunnel(w[, 'mode'…], ts, c1, …): target of the curried
    // windowFunnel(w[, 'mode'…])(ts, c1, …) rewrite — the funnel UDAF.
    // Default ordering is CH's: non-decreasing timestamps between
    // steps; the 'strict_increase' mode opts into strictly-later.
    // CH's other modes (strict_order, strict_deduplication) change
    // which events may INTERLEAVE a chain, not its time comparison —
    // unimplemented, so they throw rather than silently mis-match.
    "chWindowFunnel" -> (es => {
      val w = es.head match {
        case l: Literal => l.value match {
          case n: Number => n.longValue()
          case other => throw new IllegalArgumentException(
            s"windowFunnel: window must be a numeric literal, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"windowFunnel: window must be a literal, got ${other.sql}")
      }
      val modes = es.drop(1).takeWhile {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
          => true
        case _ => false
      }.map(_.asInstanceOf[Literal].value.toString)
      val strict = modes.map {
        case "strict_increase" => true
        case other => throw new IllegalArgumentException(
          s"windowFunnel: unsupported mode '$other' " +
            "(only 'strict_increase' is implemented)")
      }.contains(true)
      val rest = es.drop(1 + modes.length)
      WindowFunnelAgg(w, rest.head, rest.tail, strictIncrease = strict)
        .toAggregateExpression()
    }),
    // chSequenceMatch(pattern, ts, c1, …): target of the curried
    // sequenceMatch('(?1)(?2)…')(ts, c1, …) rewrite. The supported
    // pattern subset is the ordered-chain form — event refs in any
    // order, optionally separated by `.*` (which adds nothing: the
    // chain semantics already allow interleaved events, same contract
    // as operators.Funnel.sequenceMatch, gate r31). Time-constrained
    // patterns ((?t<=3600)) throw rather than mis-match. Rides on
    // WindowFunnelAgg with an unbounded window: matched iff the
    // deepest level equals the pattern length. Equal-timestamp events
    // sit in "undefined order" in CH's sequenceMatch contract; this
    // engine resolves the ambiguity DETERMINISTICALLY as
    // strictly-increasing (equal-time events never chain) — a pinned
    // choice inside CH's undefined space, unlike windowFunnel where
    // CH defines equal-time chaining and the default matches it.
    "chSequenceMatch" -> (es => {
      val ordered = chainPatternConds(es, "sequenceMatch")
      EqualTo(
        WindowFunnelAgg(Long.MaxValue / 4000000L, es(1), ordered,
          strictIncrease = true)
          .toAggregateExpression(),
        Literal(ordered.length))
    }),
    // chSequenceCount(pattern, ts, c1, …): target of the curried
    // sequenceCount('(?1)(?2)…')(ts, c1, …) rewrite — the number of
    // DISJOINT ordered chains, same pattern subset (and same pinned
    // strict equal-time resolution) as sequenceMatch
    "chSequenceCount" -> (es => {
      val ordered = chainPatternConds(es, "sequenceCount")
      WindowFunnelAgg(Long.MaxValue / 4000000L, es(1), ordered,
        countChains = true, strictIncrease = true).toAggregateExpression()
    }),
    // retention(c1, …, cN): r[0] = c1 fired on some row, r[i] = c1
    // fired on some row AND c_i+1 fired on some (other) row — CH's
    // UNORDERED cohort-retention aggregate (conditions are evaluated
    // independently across the group's rows, no time constraint;
    // ordered chains are windowFunnel's job)
    "retention" -> (es => {
      val anyC1 = aggregate.Max(es.head).toAggregateExpression()
      CreateArray(
        Cast(anyC1, IntegerType) +:
          es.tail.map(c => Cast(And(anyC1,
            aggregate.Max(c).toAggregateExpression()), IntegerType)))
    }),
    // -State / -Merge combinator SQL spellings — CH's two-phase
    // pre-aggregation contract ([[graft.operators.Sketches]], r26,
    // carries the DataFrame form). uniqState emits Spark's native
    // binary HLL sketch (HLL_8), uniqMerge unions + estimates;
    // sum/min/max partials merge by re-application, count partials
    // merge by SUM (the classic corruption trap, spelled correctly
    // here so SQL users can't hit it)
    "uniqState" -> (es => new aggregate.HllSketchAgg(es.head)),
    "uniqMerge" -> (es => HllSketchEstimate(
      new aggregate.HllUnionAgg(es.head).toAggregateExpression())),
    "sumState" -> (es => aggregate.Sum(es.head)),
    "sumMerge" -> (es => aggregate.Sum(es.head)),
    "minState" -> (es => aggregate.Min(es.head)),
    "minMerge" -> (es => aggregate.Min(es.head)),
    "maxState" -> (es => aggregate.Max(es.head)),
    "maxMerge" -> (es => aggregate.Max(es.head)),
    "countState" -> (es => if (es.isEmpty) aggregate.Count(Seq(Literal(1)))
      else aggregate.Count(es)),
    "countMerge" -> (es => aggregate.Sum(es.head)),
    // sumCount(x): CH's fused (sum, count) pair
    "sumCount" -> (es => CreateStruct(Seq(
      aggregate.Sum(es.head).toAggregateExpression(),
      aggregate.Count(es).toAggregateExpression()))),
    // ---- eighth pass: date/string/float/map/JSON odds and ends ----
    // fromUnixTimestamp: 1-arg → DateTime; 2-arg → formatted string
    // (exactly Spark's from_unixtime contract for the 2-arg form)
    "fromUnixTimestamp" -> (es =>
      if (es.length == 1) Cast(Cast(es.head, LongType), TimestampType)
      else FromUnixTime(es(0), chFormat(es(1)))),
    "now64" -> (_ => CurrentTimestamp()),
    "monthName" -> (es =>
      DateFormatClass(Cast(es.head, TimestampType), Literal("MMMM"))),
    // dateName('part', d) for the parts with string names; numeric
    // parts return their number as string, like CH
    "dateName" -> (es => es.head match {
      case l: Literal if l.dataType == StringType =>
        val d = Cast(es(1), TimestampType)
        l.value.toString.toLowerCase match {
          case "month" => DateFormatClass(d, Literal("MMMM"))
          case "weekday" => DateFormatClass(d, Literal("EEEE"))
          case "year" => DateFormatClass(d, Literal("yyyy"))
          case "quarter" => Cast(Quarter(d), StringType)
          case "day" => Cast(DayOfMonth(d), StringType)
          case "hour" => Cast(Hour(d), StringType)
          case "minute" => Cast(Minute(d), StringType)
          case "second" => Cast(Second(d), StringType)
          case other => throw new IllegalArgumentException(
            s"dateName: unsupported part '$other'")
        }
      case other => throw new IllegalArgumentException(
        s"dateName: part must be a string literal, got ${other.sql}")
    }),
    // MJD epoch is 1858-11-17
    "toModifiedJulianDay" -> (es => DateDiff(Cast(es.head, DateType),
      Cast(Literal("1858-11-17"), DateType))),
    // timeSlot: floor to the half hour (CH's fixed 1800s slot)
    "timeSlot" -> (es => SecondsToTimestamp(Multiply(IntegralDivide(
      Cast(Cast(es.head, TimestampType), LongType), Literal(1800L),
      EvalMode.LEGACY), Literal(1800L)))),
    "leftUTF8" -> (es => Left(es(0), es(1))),
    "rightUTF8" -> (es => Right(es(0), es(1))),
    "reverseUTF8" -> (es => Reverse(es.head)),
    "concatWithSeparator" -> (es => ConcatWs(es)),
    // extractAll(h, re): all matches; CH takes the first capture group
    // when the pattern has one, else the whole match
    "extractAll" -> (es => {
      // CH takes the first capture group when the pattern HAS one,
      // else the whole match. Ask the regex compiler itself — a
      // lexical paren sniff miscounts \( escapes and [(] classes.
      val idx = es(1) match {
        case l: Literal if l.dataType == StringType =>
          try {
            if (java.util.regex.Pattern.compile(l.value.toString)
              .matcher("").groupCount() > 0) Literal(1) else Literal(0)
          } catch { case _: Exception => Literal(0) }
        case _ => Literal(0)
      }
      RegExpExtractAll(es(0), es(1), idx)
    }),
    // multiSearchAny(h, [n1, n2, …]) over an array literal
    "multiSearchAny" -> (es => es(1) match {
      case CreateArray(items, _) if items.nonEmpty =>
        items.map(n => Contains(es.head, n): Expression).reduce(Or)
      case other => throw new IllegalArgumentException(
        "multiSearchAny: needles must be an array literal, got " +
          other.sql)
    }),
    // float classification
    "isFinite" -> (es => And(Not(IsNaN(es.head)),
      Not(EqualTo(Abs(Cast(es.head, DoubleType)),
        Literal(Double.PositiveInfinity))))),
    "isInfinite" -> (es => EqualTo(Abs(Cast(es.head, DoubleType)),
      Literal(Double.PositiveInfinity))),
    "ifNotFinite" -> (es => If(
      And(Not(IsNaN(es.head)),
        Not(EqualTo(Abs(Cast(es.head, DoubleType)),
          Literal(Double.PositiveInfinity)))),
      es.head, es(1))),
    "roundBankers" -> (es =>
      if (es.length == 1) BRound(es.head, Literal(0))
      else BRound(es(0), es(1))),
    // map accessors (CH names; Spark's are map_keys/map_values/…)
    "mapKeys" -> (es => MapKeys(es.head)),
    "mapValues" -> (es => MapValues(es.head)),
    "mapContains" -> (es => ArrayContains(MapKeys(es(0)), es(1))),
    "bitTest" -> (es => Cast(BitwiseAnd(
      ShiftRight(Cast(es(0), LongType), Cast(es(1), IntegerType)),
      Literal(1L)), IntegerType)),
    // JSON family: keys compose into a $.path; typed variants cast
    "JSONExtractString" -> (es => GetJsonObject(es.head, jsonPath(es.tail))),
    "JSONExtractInt" -> (es =>
      Cast(GetJsonObject(es.head, jsonPath(es.tail)), LongType)),
    "JSONExtractFloat" -> (es =>
      Cast(GetJsonObject(es.head, jsonPath(es.tail)), DoubleType)),
    "JSONExtractBool" -> (es =>
      Cast(GetJsonObject(es.head, jsonPath(es.tail)), BooleanType)),
    // JSONHas must see a key holding JSON null as PRESENT (CH returns
    // 1): membership comes from the parent's key list / array length,
    // not from the value lookup (which yields NULL for both missing
    // and null)
    "JSONHas" -> (es => es.last match {
      case l: Literal if l.dataType == StringType =>
        val parent =
          if (es.length == 2) es.head
          else GetJsonObject(es.head, jsonPath(es.tail.dropRight(1)))
        Coalesce(Seq(
          ArrayContains(JsonObjectKeys(parent), l),
          Literal(false)))
      case l: Literal if l.dataType == IntegerType =>
        val i = l.value.asInstanceOf[Int]
        val parent =
          if (es.length == 2) es.head
          else GetJsonObject(es.head, jsonPath(es.tail.dropRight(1)))
        Coalesce(Seq(
          GreaterThanOrEqual(LengthOfJsonArray(parent), Literal(i)),
          Literal(false)))
      case other => throw new IllegalArgumentException(
        s"JSONHas: keys must be literals, got ${other.sql}")
    }),
    // the legacy visitParam/simpleJSON names are single-key lookups
    "visitParamExtractString" -> (es =>
      GetJsonObject(es.head, jsonPath(es.tail))),
    "simpleJSONExtractString" -> (es =>
      GetJsonObject(es.head, jsonPath(es.tail))),
    // toInterval*: CH's interval constructors → Spark interval types
    // (day-time for sub-month units, year-month above)
    "toIntervalSecond" -> (es => new MakeDTInterval(Literal(0),
      Literal(0), Literal(0), Cast(es.head, DecimalType(18, 6)))),
    "toIntervalMinute" -> (es => new MakeDTInterval(Literal(0),
      Literal(0), Cast(es.head, IntegerType))),
    "toIntervalHour" -> (es => new MakeDTInterval(Literal(0),
      Cast(es.head, IntegerType))),
    "toIntervalDay" -> (es =>
      new MakeDTInterval(Cast(es.head, IntegerType))),
    "toIntervalWeek" -> (es => new MakeDTInterval(
      Multiply(Cast(es.head, IntegerType), Literal(7)))),
    "toIntervalMonth" -> (es =>
      MakeYMInterval(Literal(0), Cast(es.head, IntegerType))),
    "toIntervalQuarter" -> (es => MakeYMInterval(Literal(0),
      Multiply(Cast(es.head, IntegerType), Literal(3)))),
    "toIntervalYear" -> (es =>
      MakeYMInterval(Cast(es.head, IntegerType), Literal(0))),
    // formatReadableSize: CH's human-readable byte formatter — nested
    // threshold CASE, '1.00 MiB' style (binary units, 2 decimals)
    "formatReadableSize" -> (es => {
      val x = Cast(es.head, DoubleType)
      val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
      // printf, not format_number: CH never emits grouping commas
      def fmt(scaled: Expression, unit: String): Expression =
        FormatString(Literal("%.2f " + unit) +: Seq(scaled): _*)
      units.zipWithIndex.init.foldRight(
        fmt(Divide(x, Literal(math.pow(1024.0, units.length - 1)),
          EvalMode.LEGACY), units.last): Expression) {
        case ((u, i), rest) =>
          If(LessThan(Abs(x), Literal(math.pow(1024.0, i + 1))),
            fmt(Divide(x, Literal(math.pow(1024.0, i)), EvalMode.LEGACY),
              u), rest)
      }
    }),
    // formatReadableQuantity: thousands/millions/billions, CH style
    "formatReadableQuantity" -> (es => {
      val x = Cast(es.head, DoubleType)
      val units = Seq(("", 1.0), (" thousand", 1e3), (" million", 1e6),
        (" billion", 1e9), (" trillion", 1e12))
      def fmt(scale: Double, unit: String): Expression =
        FormatString(Literal("%.2f" + unit) +:
          Seq(Divide(x, Literal(scale), EvalMode.LEGACY)): _*)
      units.init.foldRight(
        fmt(units.last._2, units.last._1): Expression) {
        case ((u, s), rest) =>
          If(LessThan(Abs(x), Literal(s * 1e3)), fmt(s, u), rest)
      }
    }),
    // arithmetic/bit names
    "modulo" -> (es => Remainder(es(0), es(1), EvalMode.LEGACY)),
    "plus" -> (es => Add(es(0), es(1))),
    "minus" -> (es => Subtract(es(0), es(1))),
    "multiply" -> (es => Multiply(es(0), es(1))),
    "bitAnd" -> (es => BitwiseAnd(es(0), es(1))),
    "bitOr" -> (es => BitwiseOr(es(0), es(1))),
    "bitXor" -> (es => BitwiseXor(es(0), es(1))),
    "bitShiftLeft" -> (es => ShiftLeft(es(0), es(1))),
    "bitShiftRight" -> (es => ShiftRight(es(0), es(1))),
    // CH divide() ALWAYS returns Float64 (7/2 = 3.5), unlike Spark's
    // `/` on integers under some dialects — the cast makes it explicit
    "divide" -> (es => Divide(Cast(es(0), DoubleType),
      Cast(es(1), DoubleType), EvalMode.LEGACY)),
    // best-effort timestamp parse: try the formats CH's
    // parseDateTimeBestEffort actually sees in this domain (ISO with
    // and without 'T'/zone, date-only, epoch seconds), first hit wins,
    // NULL if none — the orNull variant's contract; CH proper throws,
    // a distinction not worth a crashing executor here (documented).
    "parseDateTimeBestEffort" -> parseBestEffort _,
    "parseDateTimeBestEffortOrNull" -> parseBestEffort _,

    // ---- third widening pass (round 10 probe batch 2 gaps) ----
    "bitNot" -> (es => BitwiseNot(es.head)),
    // CH's OrZero division variants: x/0 -> 0 instead of an error
    "intDivOrZero" -> (es => If(
      EqualTo(Cast(es(1), LongType), Literal(0L)), Literal(0L),
      IntegralDivide(es(0), es(1), EvalMode.LEGACY))),
    "moduloOrZero" -> (es => If(
      EqualTo(Cast(es(1), LongType), Literal(0L)), Literal(0L),
      Cast(Remainder(es(0), es(1), EvalMode.LEGACY), LongType))),
    "base64Encode" -> (es => Base64(Cast(es.head, BinaryType))),
    "base64Decode" -> (es => Cast(UnBase64(es.head), StringType)),
    "toDayOfYear" -> (es => DayOfYear(Cast(es.head, DateType))),
    // Spark's weekofyear IS the ISO week; ISO year = calendar year of
    // that week's Thursday (date + (4 - isoWeekday)), weekday() is Mon=0
    "toISOWeek" -> (es => WeekOfYear(Cast(es.head, DateType))),
    "toISOYear" -> (es => Year(DateAdd(Cast(es.head, DateType),
      Subtract(Literal(3), WeekDay(Cast(es.head, DateType)))))),
    // unsigned ints: Spark has no unsigned types — each maps to the
    // narrowest SIGNED type that holds the full unsigned range
    // (UInt64 maps to Long, the one lossy corner, documented)
    "toUInt8" -> (es => Cast(es.head, ShortType)),
    "toUInt16" -> (es => Cast(es.head, IntegerType)),
    "toUInt32" -> (es => Cast(es.head, LongType)),
    "toUInt64" -> (es => Cast(es.head, LongType)),
    // dotted-quad <-> UInt32, pure integer/string arithmetic
    "IPv4NumToString" -> (es => {
      def octet(shift: Int): Expression = Cast(BitwiseAnd(
        ShiftRight(Cast(es.head, LongType), Literal(shift)),
        Literal(255L)), StringType)
      Concat(Seq(octet(24), Literal("."), octet(16), Literal("."),
        octet(8), Literal("."), octet(0)))
    }),
    "IPv4StringToNum" -> (es => {
      val parts = StringSplit(es.head, Literal("\\."), Literal(-1))
      def octet(i: Int): Expression =
        Cast(ElementAt(parts, Literal(i)), LongType)
      Add(Add(Add(
        Multiply(octet(1), Literal(16777216L)),
        Multiply(octet(2), Literal(65536L))),
        Multiply(octet(3), Literal(256L))), octet(4))
    }),
    // logical-operator FUNCTION spellings (CH allows and(a,b,...))
    "not" -> (es => Not(Cast(es.head, BooleanType))),
    "and" -> (es => es.map(e => Cast(e, BooleanType): Expression)
      .reduceLeft(And(_, _))),
    "or" -> (es => es.map(e => Cast(e, BooleanType): Expression)
      .reduceLeft(Or(_, _))),
    "xor" -> (es => es.map(e => Cast(e, BooleanType): Expression)
      .reduceLeft((a, b) => Not(EqualTo(a, b)))),
    // Shannon entropy of the value distribution. Composed over
    // collect_list (per-group buffer ∝ group size, same bound class
    // as uniqExact's collect_set — the ad-hoc convenience spelling;
    // a distinct-bounded production form is the two-level
    // count-per-value GROUP BY).
    "entropy" -> viaCols { cs =>
      import org.apache.spark.sql.functions._
      val l = collect_list(cs.head.cast("string"))
      val n = size(l).cast("double")
      negate(aggregate(transform(array_distinct(l), v => {
        val p = size(filter(l, e => e === v)).cast("double") / n
        p * log2(p)
      }), lit(0.0), (acc, x) => acc + x))
    },
    // groupArraySample(k[, seed])(x): bounded arbitrary-subset sample.
    // "Any k elements" satisfies the contract; this takes the first k
    // of the collection order (CH's own pick is unspecified too).
    "chGroupArraySample" -> (es => Slice(
      aggregate.CollectList(es.last).toAggregateExpression(),
      Literal(1), Cast(es.head, IntegerType))),

    // ---- third widening pass: cryptographic hashes, vector distances,
    // map accessors, string search/split, readable formatting, OrZero/
    // OrNull safe casts, bit tests, relative-time numbers, and the
    // aggregate spellings (avgWeighted, -Array combinators, sumCount).
    // Same contract: codegen'd Catalyst compositions via builders or
    // the Column bridge; the two formatReadable shims are the only
    // interpreted additions. ----
    // CH's crypto hashes return FixedString binary — mapped to
    // unhex(<spark hex digest>) so the idiomatic `hex(MD5(x))` spelling
    // round-trips to the same uppercase hex CH prints. Registered under
    // ch-prefixed names (ChSqlRewrite renames the case-SENSITIVE
    // uppercase spellings): the registry is case-insensitive, so a
    // bare "MD5" entry would hijack Spark's hex-string md5() that the
    // dedup operators and gates emit. Raw Catalyst construction, not
    // viaCols — a registry round-trip here would resolve back to this
    // very builder and loop the analyzer.
    "chMD5" -> (es => Unhex(Md5(Cast(es.head, BinaryType)))),
    "chSHA1" -> (es => Unhex(Sha1(Cast(es.head, BinaryType)))),
    "chSHA256" -> (es =>
      Unhex(Sha2(Cast(es.head, BinaryType), Literal(256)))),
    // same CONTRACT note as cityHash64: a stable 64-bit hash, not CH's
    // exact bit pattern (Spark's xxhash64 seeds differently)
    "xxHash64" -> (es => XxHash64(es, 42L)),
    // vector arithmetic (the CH array-distance family) — one fold per
    // pair via zip_with/aggregate, the same codegen'd shape the ANN
    // operators use
    "dotProduct" -> viaCols(cs => vecDot(cs(0), cs(1))),
    "L1Distance" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      aggregate(zip_with(cs(0), cs(1),
        (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    }),
    "L2SquaredDistance" -> viaCols(cs => vecL2Sq(cs(0), cs(1))),
    "L2Distance" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      sqrt(vecL2Sq(cs(0), cs(1)))
    }),
    "LinfDistance" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      array_max(zip_with(cs(0), cs(1),
        (x, y) => abs(x.cast("double") - y.cast("double"))))
    }),
    "L2Norm" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      sqrt(vecDot(cs.head, cs.head))
    }),
    "normalizeL2" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      val n = sqrt(vecDot(cs.head, cs.head))
      when(n === 0.0, transform(cs.head, x => x.cast("double")))
        .otherwise(transform(cs.head, x => x.cast("double") / n))
    }),
    "cosineDistance" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      lit(1.0) - vecDot(cs(0), cs(1)) /
        (sqrt(vecDot(cs(0), cs(0))) * sqrt(vecDot(cs(1), cs(1))))
    }),
    // map construction from parallel key/value arrays
    "mapFromArrays" -> (es => MapFromArrays(es(0), es(1))),
    // string search / split additions (match/multiSearchAny/
    // countSubstrings/splitByString/alphaTokens shipped in earlier
    // passes — see above)
    "positionUTF8" -> (es => StringLocate(es(1), es(0), Literal(1))),
    "tokens" -> (es =>
      RegExpExtractAll(es.head, Literal("[A-Za-z0-9]+"), Literal(0))),
    "ngrams" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      val s = cs(0); val n = cs(1).cast("int")
      when(length(s) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(s) - n + 1),
          i => s.substr(i, n)))
    }),
    // CH char() takes MANY codepoints ('AB' from char(65,66)); the
    // single-arg form matches Spark's chr
    "char" -> (es => Concat(es.map(e => Chr(Cast(e, LongType)): Expression))),
    // safe-cast family: TRY-mode casts (null on failure), OrZero
    // coalesces to the type's zero — CH's ingestion workhorses
    "toInt32OrNull" -> (es => tryCastTo(es.head, IntegerType)),
    "toInt32OrZero" -> (es =>
      Coalesce(Seq(tryCastTo(es.head, IntegerType), Literal(0)))),
    "toInt64OrNull" -> (es => tryCastTo(es.head, LongType)),
    "toInt64OrZero" -> (es =>
      Coalesce(Seq(tryCastTo(es.head, LongType), Literal(0L)))),
    "toFloat64OrNull" -> (es => tryCastTo(es.head, DoubleType)),
    "toFloat64OrZero" -> (es =>
      Coalesce(Seq(tryCastTo(es.head, DoubleType), Literal(0.0)))),
    "toDateOrNull" -> (es => tryCastTo(es.head, DateType)),
    "toDateTimeOrNull" -> (es => tryCastTo(es.head, TimestampType)),
    // math
    "exp2" -> (es => Pow(Literal(2.0), Cast(es.head, DoubleType))),
    "exp10" -> (es => Pow(Literal(10.0), Cast(es.head, DoubleType))),
    "intExp2" -> (es => ShiftLeft(Literal(1L), Cast(es.head, IntegerType))),
    "intExp10" -> (es => Cast(
      Pow(Literal(10.0), Cast(es.head, DoubleType)), LongType)),
    "isNaN" -> (es => IsNaN(Cast(es.head, DoubleType))),
    // bit-test combinators (bitTest itself shipped earlier)
    "bitTestAll" -> (es => es.tail.map(i =>
      EqualTo(BitwiseAnd(ShiftRightUnsigned(Cast(es.head, LongType),
        Cast(i, IntegerType)), Literal(1L)), Literal(1L)): Expression)
      .reduceLeft(And(_, _))),
    "bitTestAny" -> (es => es.tail.map(i =>
      EqualTo(BitwiseAnd(ShiftRightUnsigned(Cast(es.head, LongType),
        Cast(i, IntegerType)), Literal(1L)), Literal(1L)): Expression)
      .reduceLeft(Or(_, _))),
    "bitRotateLeft" -> (es => BitwiseOr(
      ShiftLeft(Cast(es(0), LongType), Cast(es(1), IntegerType)),
      ShiftRightUnsigned(Cast(es(0), LongType),
        Subtract(Literal(64), Cast(es(1), IntegerType))))),
    "bitRotateRight" -> (es => BitwiseOr(
      ShiftRightUnsigned(Cast(es(0), LongType), Cast(es(1), IntegerType)),
      ShiftLeft(Cast(es(0), LongType),
        Subtract(Literal(64), Cast(es(1), IntegerType))))),
    "bitHammingDistance" -> (es => BitwiseCount(
      BitwiseXor(Cast(es(0), LongType), Cast(es(1), LongType)))),
    // CH toTime: same wall-clock time re-anchored on 1970-01-02
    "toTime" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      concat(lit("1970-01-02 "), date_format(cs.head, "HH:mm:ss"))
        .cast("timestamp")
    }),
    // aggregate spellings
    "anyIf" -> (es => aggregate.First(
      If(es(1), es(0), Literal.create(null, NullType)),
      ignoreNulls = true)),
    "sumArray" -> (es =>
      aggregate.Sum(builders("arraySum")(Seq(es.head)))),
    "minArray" -> (es => aggregate.Min(ArrayMin(es.head))),
    "maxArray" -> (es => aggregate.Max(ArrayMax(es.head))),
    "countArray" -> (es =>
      aggregate.Sum(Cast(Size(es.head), LongType))),
    "avgArray" -> (es => Divide(
      aggregate.Sum(Cast(builders("arraySum")(Seq(es.head)), DoubleType))
        .toAggregateExpression(),
      aggregate.Sum(Cast(Size(es.head), DoubleType))
        .toAggregateExpression())),
    // CH's OTHER transform: value mapping through parallel from/to
    // arrays with a default (4-arg) or passthrough (3-arg); the Spark
    // higher-order transform(arr, lambda) keeps working through the
    // same name via arity/lambda dispatch
    "transform" -> (es => es match {
      case Seq(arr, l: LambdaFunction) => ArrayTransform(arr, l)
      case Seq(x, from, to) => Coalesce(Seq(
        ElementAt(MapFromArrays(from, to), x, None, failOnError = false), x))
      case Seq(x, from, to, default) => Coalesce(Seq(
        ElementAt(MapFromArrays(from, to), x, None, failOnError = false),
        default))
    }),
    // introspection + environment
    "toTypeName" -> (es => TypeOf(es.head)),
    "version" -> (_ => SparkVersion()),
    "hostName" -> (_ =>
      Literal(java.net.InetAddress.getLocalHost.getHostName)),
    // array widening, part 3
    "arrayWithConstant" -> (es =>
      ArrayRepeat(es(1), Cast(es(0), IntegerType))),
    "arrayReverseSort" -> (es => SortArray(es.head, Literal(false))),
    "arrayRotateLeft" -> viaCols(cs => arrayRotate(cs(0), cs(1))),
    "arrayRotateRight" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      arrayRotate(cs(0), -cs(1).cast("int") + size(cs(0)))
    }),
    "arrayJaccardIndex" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      size(array_intersect(cs(0), cs(1))).cast("double") /
        size(array_union(cs(0), cs(1))).cast("double")
    }),
    "arrayResize" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      val a = cs(0); val n = cs(1).cast("int")
      val pad = if (cs.length > 2) cs(2)
        else lit(null).cast("string") // 2-arg: null pad (CH pads type default)
      when(size(a) >= n, slice(a, lit(1), n))
        .otherwise(concat(a, array_repeat(pad, n - size(a))))
    }),

    // ---- fourth widening pass (round 10 probe batch 4 gaps) ----
    // countDistinct is CH's canonical alias of uniqExact
    "countDistinct" -> (es => Size(
      aggregate.CollectSet(tupleOf(es)).toAggregateExpression())),
    // Kahan summation is a single-node float trick; the distributed
    // parity form is a plain double sum (partials merge exactly the
    // same way CH's combinators do)
    "sumKahan" -> (es => aggregate.Sum(Cast(es.head, DoubleType))),
    "arrayShuffle" -> (es => Shuffle(es.head)),
    // CH only promises the first n elements are the n smallest,
    // sorted; a fully sorted array satisfies that contract
    "arrayPartialSort" -> (es => SortArray(es(1), Literal(true))),
    // CH counts quarters from year 0: year*4 + (month-1)/3
    "toRelativeQuarterNum" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      val d = cs.head.cast("date")
      (year(d) * 4 + floor((month(d) - 1) / 3)).cast("long")
    }),
    "bar" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      // full-block approximation of CH's eighth-block bar; CH's
      // width argument is optional (default 80)
      val width = if (cs.length > 3) cs(3) else lit(80)
      repeat(lit("█"),
        floor((cs(0) - cs(1)) / (cs(2) - cs(1)) * width).cast("int"))
    }),
    "caseWithExpression" -> (es => {
      val scrutinee = es.head
      val rest = es.tail
      val (pairs, default) =
        if (rest.length % 2 == 1) (rest.init, Some(rest.last))
        else (rest, None)
      CaseWhen(pairs.grouped(2).map { case Seq(k, v) =>
        (EqualTo(scrutinee, k), v) }.toSeq, default)
    }),
    "editDistance" -> (es => Levenshtein(es(0), es(1))),
    "levenshteinDistance" -> (es => Levenshtein(es(0), es(1))),
    "damerauLevenshteinDistance" -> (es => DamerauLevenshtein(es(0), es(1))),
    "jaroSimilarity" -> (es => JaroSimilarity(es(0), es(1))),
    "jaroWinklerSimilarity" -> (es =>
      JaroSimilarity(es(0), es(1), winkler = true)),
    "reinterpretAsUInt8" -> (es => ReinterpretAsUInt(es.head, 1)),
    "reinterpretAsUInt16" -> (es => ReinterpretAsUInt(es.head, 2)),
    "reinterpretAsUInt32" -> (es => ReinterpretAsUInt(es.head, 4)),
    "reinterpretAsUInt64" -> (es => ReinterpretAsUInt(es.head, 8)),
    "base58Encode" -> (es => Base58Encode(es.head)),
    "javaHash" -> (es => JavaHashString(es.head)),
    // Spark ships Hive's hash natively; for strings it IS Java's
    // hashCode, matching CH's hiveHash docs
    "hiveHash" -> (es => HiveHash(es)),
    // byte-set Jaccard (exact for single-byte encodings; CH computes
    // over bytes, this over characters — identical on ASCII corpora)
    "stringJaccardIndex" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      val a = array_distinct(split(cs(0), ""))
      val b = array_distinct(split(cs(1), ""))
      size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double")
    }),
    // haversine on CH's sphere radius (6372797.560856 m); CH's
    // geoDistance applies an ellipsoid correction on top — the
    // spherical form is documented-approximate for it
    "greatCircleDistance" -> viaCols(greatCircle),
    "geoDistance" -> viaCols(greatCircle),
    "toDecimal32" -> (es => Cast(es(0),
      DecimalType(9, litInt(es(1), "toDecimal32 scale")))),
    "toDecimal64" -> (es => Cast(es(0),
      DecimalType(18, litInt(es(1), "toDecimal64 scale")))),
    "toDecimal128" -> (es => Cast(es(0),
      DecimalType(38, litInt(es(1), "toDecimal128 scale")))),
    // CH pads FixedString with null bytes
    "toFixedString" -> (es => StringRPad(es(0), es(1), Literal("\u0000"))),
    "generateUUIDv4" -> (_ => Uuid()),
    "isValidJSON" -> (es => IsNotNull(GetJsonObject(es.head, Literal("$")))),
    "JSONArrayLength" -> (es => LengthOfJsonArray(es.head)),
    // lenient decode (CH's try* contract: garbage in, empty-ish out —
    // Spark's unbase64 is itself lenient)
    "tryBase64Decode" -> (es => Cast(UnBase64(es.head), StringType)),
    // literal scrubbing: quoted strings then bare numbers become '?'
    // (CH additionally collapses ?-lists; fingerprint-compatible, not
    // byte-identical to CH's own normalizer)
    "normalizeQuery" -> viaCols(cs => normalizeQueryCol(cs.head)),
    // stable 64-bit fingerprint of the normalized query (CH hashes
    // with its own function — fingerprint semantics, not bit parity);
    // SHARES the normalizer so the CH guarantee
    // normalizedQueryHash(q) == hash(normalizeQuery(q)) holds by
    // construction
    "normalizedQueryHash" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      xxhash64(normalizeQueryCol(cs.head))
    }),
    // CH's simhash fingerprints, served by our native SimHashSig —
    // fingerprint SEMANTICS (near-dup docs get near signatures), not
    // CH's bit values (CH hashes with CityHash; cross-system simhash
    // values were never comparable anyway)
    "wordShingleSimHash" -> (es => SimHashSig(es.head)),
    "ngramSimHash" -> (es => SimHashSig(es.head)),
    // UUID text → its 16 raw bytes
    "UUIDStringToNum" -> (es => Unhex(StringReplace(es.head,
      Literal("-"), Literal("")))),
    "erf" -> viaCols(cs => erfCol(cs.head.cast("double"))),
    "erfc" -> viaCols(cs => erfcCol(cs.head.cast("double"))),
    "lgamma" -> viaCols(cs => lgammaCol(cs.head.cast("double"))),
    "tgamma" -> viaCols(cs => {
      import org.apache.spark.sql.functions._
      exp(lgammaCol(cs.head.cast("double")))
    }),

    // slope of the (min-x, its y) → (max-x, its y) chord
    "boundingRatio" -> (es => Divide(
      Subtract(
        Cast(MaxBy(es(1), es(0)).toAggregateExpression(), DoubleType),
        Cast(MinBy(es(1), es(0)).toAggregateExpression(), DoubleType)),
      Subtract(
        Cast(aggregate.Max(es(0)).toAggregateExpression(), DoubleType),
        Cast(aggregate.Min(es(0)).toAggregateExpression(), DoubleType)))),
  )

  /** Shared query-literal scrubber for normalizeQuery/-Hash. */
  private def normalizeQueryCol(q: Column): Column = {
    import org.apache.spark.sql.functions._
    regexp_replace(
      regexp_replace(q, "'[^']*'", "?"),
      "\\b\\d+(\\.\\d+)?\\b", "?")
  }

  /** A&S 7.1.26 tail polynomial: poly(|x|)·e^(−x²) = erfc(|x|) —
    * max absolute error 1.5e-7. Kept as the TAIL form so erfc keeps
    * relative accuracy for large x (1−erf cancels to exactly 0 past
    * x≈6.5 where the true tail is ~1e-23).
    */
  private def erfcTail(ax: Column): Column = {
    import org.apache.spark.sql.functions._
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ax)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    poly * exp(negate(ax * ax))
  }

  /** Abramowitz & Stegun 7.1.26 rational approximation of erf —
    * max absolute error 1.5e-7, the standard no-libm form (CH's own
    * erf is an approximation too; no engine promises bit equality).
    */
  private def erfCol(x: Column): Column = {
    import org.apache.spark.sql.functions._
    val e = lit(1.0) - erfcTail(abs(x))
    when(x >= 0, e).otherwise(negate(e))
  }

  /** erfc via the tail form directly — algebraically the same
    * identity, but no 1−erf cancellation for large positive x.
    */
  private def erfcCol(x: Column): Column = {
    import org.apache.spark.sql.functions._
    when(x >= 0, erfcTail(x)).otherwise(lit(2.0) - erfcTail(negate(x)))
  }

  /** Lanczos (g=7, n=9) log-gamma for positive arguments — ~1e-13
    * relative error; non-positive inputs return NULL (CH throws;
    * NULL is the engine's SQL-friendly analogue).
    */
  private def lgammaCol(x: Column): Column = {
    import org.apache.spark.sql.functions._
    val g = Seq(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    val z = x - lit(1.0)
    val a0 = g.zipWithIndex.tail.foldLeft(lit(g.head)) { case (acc, (c, i)) =>
      acc + lit(c) / (z + lit(i.toDouble))
    }
    val t = z + lit(7.5)
    val res = lit(0.5 * math.log(2 * math.Pi)) +
      (z + lit(0.5)) * log(t) - t + log(a0)
    when(x > 0, res).otherwise(lit(null).cast("double"))
  }

  /** Haversine great-circle distance in meters on ClickHouse's sphere
    * radius; CH argument order (lon1, lat1, lon2, lat2).
    */
  private def greatCircle(cs: Seq[Column]): Column = {
    import org.apache.spark.sql.functions._
    val R = 6372797.560856
    val lon1 = radians(cs(0).cast("double")); val lat1 = radians(cs(1).cast("double"))
    val lon2 = radians(cs(2).cast("double")); val lat2 = radians(cs(3).cast("double"))
    val h = pow(sin((lat2 - lat1) / 2), 2) +
      cos(lat1) * cos(lat2) * pow(sin((lon2 - lon1) / 2), 2)
    lit(2 * R) * asin(sqrt(h))
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Lift a Column-API composition into a registry builder (the
    * [[PipelineFunctions]] viaColumns pattern). */
  private def viaCols(f: Seq[Column] => Column): Seq[Expression] => Expression =
    es => ColumnBridge.expression(f(es.map(ColumnBridge.column)))

  /** `$`-path for the JSONExtract family: string-literal keys become
    * `.key` members, integer-literal keys become 0-based `[i]` array
    * indices (CH indices are 1-based; negatives unsupported here).
    */
  private def jsonPath(keys: Seq[Expression]): Expression = {
    val parts = keys.map {
      case l: Literal if l.dataType == StringType => s".${l.value}"
      case l: Literal if l.dataType == IntegerType =>
        val i = l.value.asInstanceOf[Int]
        if (i < 1) throw new IllegalArgumentException(
          "JSONExtract*: only positive 1-based array indices supported")
        s"[${i - 1}]"
      case other => throw new IllegalArgumentException(
        s"JSONExtract*: keys must be literals, got ${other.sql}")
    }
    Literal("$" + parts.mkString)
  }

  /** Shared pattern parsing for sequenceMatch/sequenceCount: the
    * ordered-chain subset — `(?i)(?j)…` refs in any order with
    * optional `.*` separators (which add nothing: chain semantics
    * already allow interleaved events). Time-constrained `(?t…)`
    * forms throw rather than mis-match. Returns the step conditions
    * in pattern order.
    */
  private def chainPatternConds(es: Seq[Expression],
      fname: String): Seq[Expression] = {
    val pat = es.head match {
      case l: Literal if l.dataType == StringType => l.value.toString
      case other => throw new IllegalArgumentException(
        s"$fname: pattern must be a string literal, got ${other.sql}")
    }
    if (pat.contains("(?t")) throw new IllegalArgumentException(
      s"$fname: time-constrained patterns ((?t…)) are not supported — " +
        "use windowFunnel for windowed chains")
    val refRe = """\(\?(\d+)\)""".r
    val refs = refRe.findAllMatchIn(pat).map(_.group(1).toInt).toSeq
    val stripped = refRe.replaceAllIn(pat, "").replace(".*", "")
    if (refs.isEmpty || stripped.trim.nonEmpty)
      throw new IllegalArgumentException(
        s"$fname: unsupported pattern `$pat` — only the ordered-chain " +
          "form (?i)(?j)… with optional .* separators")
    val conds = es.drop(2)
    refs.find(r => r < 1 || r > conds.length).foreach(r =>
      throw new IllegalArgumentException(
        s"$fname: pattern references (?$r) but only " +
          s"${conds.length} conditions given"))
    refs.map(r => conds(r - 1))
  }

  private def parseBestEffort(es: Seq[Expression]): Expression = {
    val s = es.head
    val fmts = Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss",
      "yyyy-MM-dd'T'HH:mm:ssXXX", "yyyy-MM-dd HH:mm:ssXXX",
      "yyyy/MM/dd HH:mm:ss", "yyyy-MM-dd", "dd/MM/yyyy HH:mm:ss")
    val tries: Seq[Expression] = fmts.map(f =>
      new ParseToTimestamp(s, Some(Literal(f)), TimestampType, None,
        false)) :+
      // all-digit strings are epoch seconds
      If(RLike(s, Literal("^\\d{9,11}$")),
        Cast(Cast(s, LongType), TimestampType), Literal(null, TimestampType))
    Coalesce(tries)
  }

  /** Translate a LITERAL ClickHouse %-style format to Spark's java
    * pattern (the common placeholders; unknown ones pass through).
    */
  private def chFormat(e: Expression): Expression = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      val out = new StringBuilder
      val str = s.toString
      var i = 0
      while (i < str.length) {
        if (str.charAt(i) == '%' && i + 1 < str.length) {
          out.append(str.charAt(i + 1) match {
            case 'Y' => "yyyy"; case 'y' => "yy"; case 'm' => "MM"
            case 'd' => "dd"; case 'H' => "HH"; case 'M' => "mm"
            case 'S' => "ss"; case 'F' => "yyyy-MM-dd"; case 'T' => "HH:mm:ss"
            case '%' => "%"
            case other => s"%$other"
          })
          i += 2
        } else { out.append(str.charAt(i)); i += 1 }
      }
      Literal(out.toString)
    case other => throw new IllegalArgumentException(
      "formatDateTime: format must be a string literal")
  }

  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
    // projection auto-rewrite rule (idempotent; execution conf-gated)
    ChProjections.enableAutoRewrite(spark)
  }

  /** Run ClickHouse-flavored SQL — ONE entry point for the whole CH
    * statement surface: [[ChSqlRewrite]] for query constructs Spark's
    * parser rejects outright, the registered aliases for everything
    * else, and statement-level routing for the non-query surface:
    *
    *  - `CREATE TABLE … ENGINE = …` (the reference's own DDL shape,
    *    app/service/log_importer.ts:120-127) → [[ChDdl]] — types
    *    mapped, Replacing* engines registered for FINAL;
    *  - `CREATE MATERIALIZED VIEW …` → [[ChMatView]] (POPULATE runs
    *    immediately, as in CH);
    *  - `ALTER TABLE … DELETE/UPDATE/DROP PARTITION` (and the modern
    *    `DELETE FROM t WHERE …` spelling), `ALTER TABLE … MODIFY TTL /
    *    MATERIALIZE TTL`, and `OPTIMIZE TABLE … [FINAL]` →
    *    [[ChMutations]] copy-on-write (TTL statements route on to
    *    [[ChTtl]]).
    *
    * Sessions configured with
    * `spark.sql.extensions=graft.GraftExtensions` get the query
    * rewrite transparently inside plain `spark.sql`.
    */
  def sql(spark: SparkSession, chSql: String): org.apache.spark.sql.DataFrame =
    if (explainSyntaxRe.findFirstIn(chSql).isDefined) {
      // CH's EXPLAIN SYNTAX shows the server's rewritten query — here
      // that is literally the dialect front-end's output, the exact
      // Spark SQL that would run (the debugging window into every
      // rewrite this object applies)
      import spark.implicits._
      Seq(ChSqlRewrite(explainSyntaxRe.replaceFirstIn(chSql, "")))
        .toDF("rewritten_sql")
    } else if (explainPipeRe.findFirstIn(chSql).isDefined) {
      // CH's EXPLAIN PIPELINE / PLAN ≈ the physical/optimized plan;
      // system.* views must exist for the explain just as for the run
      val rewritten = ChSqlRewrite(explainPipeRe.replaceFirstIn(chSql, ""))
      if (rewritten.contains("__ch_system_"))
        materializeSystemViews(spark, rewritten)
      spark.sql("EXPLAIN FORMATTED " + rewritten)
    } else if (chMatViewRe.findFirstIn(chSql).isDefined) {
      ChMatView.create(spark, chSql)
      invalidateSystemViews(spark)
      spark.emptyDataFrame
    } else if (chDdlRe.findFirstIn(chSql).isDefined) {
      ChDdl.create(spark, chSql)
      invalidateSystemViews(spark)
      spark.emptyDataFrame
    } else if (chMutationRe.findFirstIn(chSql).isDefined) {
      ChMutations.mutate(spark, chSql)
      invalidateSystemViews(spark)
      spark.emptyDataFrame
    } else {
      val rewritten = ChSqlRewrite(chSql)
      if (rewritten.contains("__ch_system_"))
        materializeSystemViews(spark, rewritten)
      val out = spark.sql(rewritten)
      // a passthrough statement that isn't a read (CREATE/DROP/INSERT/
      // …) executes eagerly inside spark.sql, so by now the catalog
      // may differ from any cached system.* snapshot
      if (readOnlyRe.findFirstIn(rewritten).isEmpty)
        invalidateSystemViews(spark)
      out
    }

  /** Snapshots of the `system.*` introspection views a CH client
    * queries on connect (rewritten to `__ch_system_<t>` by
    * [[ChSqlRewrite]]), cached per session and SELF-VALIDATED against a
    * catalog fingerprint: a CH client's on-connect chatter probes
    * `system.columns` repeatedly, and each rebuild is a full
    * listTables+listColumns catalog walk — O(tables) driver RPCs. The
    * fingerprint (sorted database/name/isTemporary over one cheap
    * listTables) is recomputed on every probe, so catalog changes made
    * AROUND [[sql]] — bare `createOrReplaceTempView`, direct
    * `spark.sql` DDL, ChDdl/ChMutations calls — are picked up without
    * any caller-side invalidation; only the expensive O(tables)
    * listColumns walk is reused while the fingerprint is unchanged.
    * Limitation: a mutation that changes COLUMNS but not the table list
    * (ALTER TABLE ADD COLUMN on an existing name) is invisible to the
    * fingerprint — every such path routed through [[sql]] calls
    * [[invalidateSystemViews]] explicitly; external callers doing the
    * same outside sql() should too.
    *
    * Keyed by the session OBJECT in a synchronized WeakHashMap:
    * identity semantics (SparkSession doesn't override equals), so two
    * live sessions can never collide, and entries die with their
    * session instead of accumulating.
    */
  private case class SystemViewSnapshot(fingerprint: String,
      built: Set[String])
  private val systemViewCache: java.util.Map[SparkSession, SystemViewSnapshot] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SystemViewSnapshot]())
  /** Instrumentation for ChCompatSpec: total catalog snapshot builds. */
  private[graft] val systemViewBuilds =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** system.parts footer-count cache: (path#len#mtime) → row count.
    * Sound because parquet data files are immutable (any rewrite lands
    * a new name or a new mtime); bounded by a crude clear at 100k
    * entries (stale keys of deleted files are merely dead weight).
    */
  private val footerRowsCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Drop the session's cached snapshots: the next `system.*` probe
    * rebuilds instead of serving the cache. Only REQUIRED for
    * column-shape mutations that keep the table list identical (see
    * the cache doc above); table create/drop/replace is caught by the
    * fingerprint automatically.
    */
  def invalidateSystemViews(spark: SparkSession): Unit =
    systemViewCache.remove(spark)

  /** One cheap catalog pass; `__ch_system_*` views are excluded so the
    * snapshot views' own creation doesn't churn the fingerprint.
    */
  private def catalogFingerprint(
      tables: Array[org.apache.spark.sql.catalog.Table]): String = {
    val sig = tables.iterator
      .filterNot(_.name.startsWith("__ch_system_"))
      .map(t => Option(t.database).getOrElse("") + "" + t.name +
        "" + t.isTemporary)
      .toArray
    java.util.Arrays.sort(sig, java.util.Comparator.naturalOrder[String]())
    sig.length + ":" +
      scala.util.hashing.MurmurHash3.arrayHash(sig).toHexString
  }

  private def materializeSystemViews(spark: SparkSession,
      rewritten: String): Unit = {
    val needed = Seq("databases", "tables", "columns", "one", "parts")
      .filter(t => rewritten.contains(s"__ch_system_$t"))
    if (needed.isEmpty) return
    val tables = spark.catalog.listTables().collect()
    val fp = catalogFingerprint(tables)
    val built = Option(systemViewCache.get(spark))
      .collect { case s if s.fingerprint == fp => s.built }
      .getOrElse(Set.empty[String])
    // system.parts reflects DATA (rows/bytes per partition), not just
    // catalog shape — the fingerprint can't witness an INSERT, so it
    // is rebuilt on every probe and never enters the cached set
    val missing = needed.filterNot(t => built(t) && t != "parts")
    missing.foreach(buildSystemView(spark, _, tables))
    val cacheable = (built ++ missing) - "parts"
    if (missing.nonEmpty)
      systemViewCache.put(spark, SystemViewSnapshot(fp, cacheable))
  }

  private def buildSystemView(spark: SparkSession, view: String,
      tables: Array[org.apache.spark.sql.catalog.Table]): Unit = {
    import spark.implicits._
    systemViewBuilds.incrementAndGet()
    view match {
      case "databases" =>
        spark.catalog.listDatabases().select("name")
          .createOrReplaceTempView("__ch_system_databases")
      case "tables" =>
        spark.catalog.listTables()
          .selectExpr(
            "coalesce(nullif(array_join(namespace, '.'), ''), 'default') " +
              "AS database",
            "name", "tableType AS engine", "isTemporary AS is_temporary")
          .createOrReplaceTempView("__ch_system_tables")
      case "columns" =>
        // reuses the fingerprint's listTables pass — only the O(tables)
        // listColumns RPC walk is paid here
        val cols = tables
          .filterNot(_.name.startsWith("__ch_system_")).flatMap { t =>
            try spark.catalog.listColumns(t.name).collect().zipWithIndex
              .map { case (c, i) =>
                (Option(t.database).getOrElse("default"), t.name, c.name,
                  c.dataType, i + 1)
              }
            catch { case _: Exception => Array.empty[(String, String,
              String, String, Int)] }
          }
        cols.toSeq.toDF("database", "table", "name", "type", "position")
          .createOrReplaceTempView("__ch_system_columns")
      case "one" =>
        Seq(0).toDF("dummy").createOrReplaceTempView("__ch_system_one")
      case "parts" =>
        // ClickHouse's system.parts drives its maintenance tooling
        // (OPTIMIZE / TTL / DROP PARTITION decisions). The analogue of
        // a MergeTree part here is a PARTITION DIRECTORY of a catalog
        // parquet table — the unit the mutation/TTL surface rewrites
        // and drops; an unpartitioned table surfaces one part named
        // 'tuple()' (CH's own partition id for unpartitioned
        // MergeTree). The whole view is built from METADATA in one FS
        // walk per location: bytes_on_disk / file_count from the
        // listing, `rows` from each parquet FOOTER's record count —
        // no Spark job, no data page decoded (CH reads its part
        // metadata the same way; a per-table count() job cost the
        // first implementation 7+ s per probe at sf0.1). Driver-side
        // and O(files): right at catalog scale; a multi-million-file
        // lake would parallelize the footer walk as one Spark job
        // over the path list. Data-dependent, so NEVER served from
        // the fingerprint cache (see materializeSystemViews).
        val catalog = spark.sessionState.catalog
        val hconf = spark.sessionState.newHadoopConf()
        // (rows, bytes, files) of every parquet data file under uri.
        // Footer opens are (a) CACHED by (path, length, mtime) —
        // parquet files are immutable, an overwrite changes the key —
        // so only files new since the last probe pay the open, and
        // (b) read through a parallel stream: a bench session holds
        // ~2.5k bucket/partition files and a sequential walk measured
        // 14 s where the parallel+cached walk is sub-second (and ~0
        // on every later probe).
        def partStats(uri: java.net.URI): (Long, Long, Long) = {
          val p = new org.apache.hadoop.fs.Path(uri)
          val fs = p.getFileSystem(hconf)
          if (!fs.exists(p)) (0L, 0L, 0L)
          else {
            val sts = new java.util.ArrayList[
              org.apache.hadoop.fs.FileStatus]()
            var bytes = 0L; var files = 0L
            // listStatus recursion, NOT fs.listFiles(recursive=true):
            // listFiles materializes BLOCK LOCATIONS per file (~5 ms
            // each on this FS — 4.5 s for a 960-file table), which
            // this view never uses
            def walk(d: org.apache.hadoop.fs.Path): Unit =
              fs.listStatus(d).foreach { st =>
                val nm = st.getPath.getName
                if (st.isDirectory) {
                  if (!nm.startsWith("_") && !nm.startsWith(".")) walk(st.getPath)
                } else if (!nm.startsWith("_") && !nm.startsWith(".")) {
                  bytes += st.getLen; files += 1
                  if (nm.endsWith(".parquet")) sts.add(st)
                }
              }
            walk(p)
            if (footerRowsCache.size() > 100000) footerRowsCache.clear()
            val rows = sts.parallelStream()
              .mapToLong { st =>
                val key = st.getPath.toString + "#" + st.getLen + "#" +
                  st.getModificationTime
                footerRowsCache.computeIfAbsent(key, _ =>
                  try {
                    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                      org.apache.parquet.hadoop.util.HadoopInputFile
                        .fromStatus(st, hconf))
                    try java.lang.Long.valueOf(r.getRecordCount)
                    finally r.close()
                  } catch { case _: Exception => java.lang.Long.valueOf(0L) })
                  .longValue()
              }.sum()
            (rows, bytes, files)
          }
        }
        val partRows = tables
          .filterNot(t => t.isTemporary || t.name.startsWith("__ch_system_"))
          .flatMap { t =>
            try {
              val ident = org.apache.spark.sql.catalyst.TableIdentifier(
                t.name, Option(t.database).filter(_.nonEmpty))
              val meta = catalog.getTableMetadata(ident)
              if (meta.tableType ==
                  org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW)
                Seq.empty
              else {
                val db = Option(t.database).getOrElse("default")
                val partCols = meta.partitionColumnNames
                if (partCols.isEmpty) {
                  val (rows, bytes, files) = meta.storage.locationUri
                    .map(partStats).getOrElse((0L, 0L, 0L))
                  Seq((db, t.name, "tuple()", true, rows, bytes, files))
                } else {
                  catalog.listPartitions(ident).map { p =>
                    val vals = partCols.toList.map(c => p.spec.collectFirst {
                      case (k, v) if k.equalsIgnoreCase(c) => v
                    }.getOrElse(""))
                    val partId =
                      if (vals.lengthCompare(1) == 0) vals.head
                      else vals.mkString("(", ",", ")")
                    val (rows, bytes, files) = partStats(p.location)
                    (db, t.name, partId, true, rows, bytes, files)
                  }
                }
              }
            } catch { case _: Exception =>
              Seq.empty[(String, String, String, Boolean, Long, Long, Long)]
            }
          }
        partRows.toSeq
          .toDF("database", "table", "partition", "active", "rows",
            "bytes_on_disk", "file_count")
          .createOrReplaceTempView("__ch_system_parts")
    }
  }

  /** A statement whose execution cannot change the catalog — safe to
    * serve system.* snapshots across. Anything else (CREATE/DROP/
    * INSERT/SET/…) conservatively bumps the epoch.
    */
  private val readOnlyRe =
    """(?is)^\s*\(*\s*(?:SELECT|WITH|VALUES|TABLE|SHOW|DESC(?:RIBE)?|EXPLAIN)\b""".r

  private val explainSyntaxRe = """(?is)^\s*EXPLAIN\s+SYNTAX\s+""".r
  private val explainPipeRe =
    """(?is)^\s*EXPLAIN\s+(?:PIPELINE|PLAN)\s+""".r
  private val chDdlRe =
    """(?is)^\s*CREATE\s+TABLE\s[\s\S]*\bENGINE\s*=""".r
  private val chMatViewRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\b""".r
  private val chMutationRe =
    ("""(?is)^\s*(?:ALTER\s+TABLE\s+[`"\w.]+\s+""" +
      """(?:DELETE|UPDATE|DROP\s+PARTITION|ADD\s+COLUMN|DROP\s+COLUMN""" +
      """|RENAME\s+COLUMN|MODIFY\s+COLUMN|MODIFY\s+TTL""" +
      """|MATERIALIZE\s+TTL|ADD\s+PROJECTION|MATERIALIZE\s+PROJECTION""" +
      """|DROP\s+PROJECTION)\b|OPTIMIZE\s+TABLE\b""" +
      """|DELETE\s+FROM\s+[`"\w.]+\s+WHERE\b)""").r

  // Column-API forms for Scala callers.
  def toYYYYMM(c: Column): Column =
    ColumnBridge.column(fmtInt(ColumnBridge.expression(c), "yyyyMM"))
  def toYYYYMMDDhhmmss(c: Column): Column =
    ColumnBridge.column(fmtLong(ColumnBridge.expression(c), "yyyyMMddHHmmss"))
  def argMin(value: Column, ord: Column): Column =
    org.apache.spark.sql.functions.min_by(value, ord)
  def argMax(value: Column, ord: Column): Column =
    org.apache.spark.sql.functions.max_by(value, ord)
}
