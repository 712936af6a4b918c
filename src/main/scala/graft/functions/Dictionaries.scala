package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse external-dictionary emulation (`dictGet` /
  * `dictGetOrDefault` / `dictHas` and the typed `dictGetString`-style
  * names).
  *
  * A CH dictionary is BY DEFINITION a RAM-resident key→attributes
  * table, eagerly loaded and consulted per row — so the faithful
  * Spark analogue is a driver-collected, BROADCAST hash map consulted
  * by a native expression, not a join: the lookup composes anywhere
  * an expression can appear (GROUP BY keys, aggregate arguments,
  * join conditions), which a scalar-subquery rewrite cannot (Catalyst
  * rejects correlated subqueries in grouping expressions — and
  * `SELECT dictGet(…) AS x … GROUP BY x` is the single most common
  * CH dictionary idiom).
  *
  * Scale: the broadcast ships once per executor (torrent), the map
  * entries are Catalyst-internal values (UTF8String / Long / …) so no
  * per-row conversion happens, and [[register]] enforces an explicit
  * entry cap — a dictionary that does not fit in RAM is not a
  * dictionary, it is the probe side of a join (use one).
  * The expressions capture the broadcast at ANALYSIS time, so the
  * plan is self-contained — executors never consult the registry.
  */
object Dictionaries {

  final case class Dict(
      name: String,
      keyType: DataType,
      attrs: Map[String, (Int, DataType)],
      data: Broadcast[java.util.HashMap[Any, Array[Any]]]) {
    def attrIndex(attr: String): (Int, DataType) =
      attrs.getOrElse(attr, throw new IllegalArgumentException(
        s"dictionary '$name' has no attribute '$attr' " +
          s"(has: ${attrs.keys.mkString(", ")})"))

    /** canonical probe key: composite (struct) keys become a List of
      * their catalyst atoms (InternalRow has reference equality only —
      * it cannot key a hash map)
      */
    def probeKey(key: Any): Any = keyType match {
      case st: StructType =>
        val r = key.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        List.tabulate(st.fields.length)(i => r.get(i, st.fields(i).dataType))
      case _ => key
    }
  }

  private val dicts =
    scala.collection.concurrent.TrieMap.empty[String, Dict]

  /** Load `table` (a catalog/temp-view name) as dictionary `name`
    * keyed by `key` — or by a COMPOSITE key when `key` is
    * comma-separated ("org, repo"); probe composite keys with
    * `dictGet('d', 'attr', tuple(org, repo))`. Every non-key column
    * becomes an attribute. Eager, like CH's LAYOUT(HASHED) /
    * LAYOUT(COMPLEX_KEY_HASHED) dictionaries. Re-registering replaces.
    */
  def register(spark: SparkSession, name: String, table: String,
      key: String, maxEntries: Int = 5000000): Dict = {
    val df = spark.table(table)
    registerDf(spark, name, df, key, maxEntries)
  }

  def registerDf(spark: SparkSession, name: String, df: DataFrame,
      key: String, maxEntries: Int = 5000000): Dict = {
    val schema = df.schema
    val keyNames = key.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val keyFields = keyNames.map(k =>
      schema.fields.find(_.name.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"dictionary '$name': key column '$k' not in " +
            schema.fieldNames.mkString(", "))))
    val keyType: DataType =
      if (keyFields.length == 1) keyFields.head.dataType
      else StructType(keyFields.map(f => StructField(f.name, f.dataType)))
    val attrFields = schema.fields.filterNot(f =>
      keyNames.exists(_.equalsIgnoreCase(f.name)))
    val attrs = attrFields.zipWithIndex
      .map { case (f, i) => f.name -> (i, f.dataType) }.toMap
    val ordered = keyFields.map(_.name) ++ attrFields.map(_.name)
    val rows = df.selectExpr(ordered.map(n => s"`$n`"): _*).collect()
    require(rows.length <= maxEntries,
      s"dictionary '$name': ${rows.length} entries exceed maxEntries=" +
        s"$maxEntries — a table this size should be a JOIN, not a dictionary")
    val nk = keyFields.length
    val keyConvs = keyFields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val attrConvs = attrFields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val map = new java.util.HashMap[Any, Array[Any]](rows.length * 2)
    rows.foreach { r =>
      val ks = List.tabulate(nk)(i => keyConvs(i)(r.get(i)))
      val k: Any = if (nk == 1) ks.head else ks
      if (nk > 1 || k != null) {
        val vals = Array.tabulate[Any](attrFields.length)(i =>
          attrConvs(i)(r.get(i + nk)))
        map.put(k, vals)
      }
    }
    val d = Dict(name, keyType, attrs,
      spark.sparkContext.broadcast(map))
    dicts.put(name.toLowerCase, d)
    d
  }

  def get(name: String): Dict = {
    val short = name.split('.').last.toLowerCase // db qualifier dropped
    dicts.getOrElse(short, throw new IllegalArgumentException(
      s"no dictionary registered as '$short' " +
        s"(registered: ${dicts.keys.toSeq.sorted.mkString(", ")}; " +
        "Dictionaries.register(spark, name, table, key))"))
  }

  def unregister(name: String): Unit = dicts.remove(name.toLowerCase)

  // ---------------------------------------------------------------
  // expression builders (wired into ChCompat.builders)
  // ---------------------------------------------------------------

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** dictGet('dict', 'attr', key) */
  def dictGet(es: Seq[Expression]): Expression = {
    require(es.length == 3, "dictGet(dict, attr, key) takes 3 arguments")
    val d = get(litStr(es(0), "dictGet: dictionary name"))
    DictGetExpr(d, litStr(es(1), "dictGet: attribute name"),
      Cast(es(2), d.keyType))
  }

  /** dictGetOrDefault('dict', 'attr', key, default) */
  def dictGetOrDefault(es: Seq[Expression]): Expression = {
    require(es.length == 4,
      "dictGetOrDefault(dict, attr, key, default) takes 4 arguments")
    Coalesce(Seq(dictGet(es.take(3)), es(3)))
  }

  /** dictHas('dict', key) */
  def dictHas(es: Seq[Expression]): Expression = {
    require(es.length == 2, "dictHas(dict, key) takes 2 arguments")
    val d = get(litStr(es(0), "dictHas: dictionary name"))
    DictHasExpr(d, Cast(es(1), d.keyType))
  }

  /** the typed dictGetX family: same lookup, result cast to the
    * CH-named type (the dictionary's declared attr type wins when it
    * already matches).
    */
  def dictGetTyped(target: DataType)(es: Seq[Expression]): Expression = {
    val g = dictGet(es)
    if (g.dataType == target) g else Cast(g, target)
  }
}

/** The lookup expression: broadcast hash-map probe per row. Catalyst-
  * internal values in, catalyst-internal values out — no conversion on
  * the hot path. CodegenFallback: the per-row cost is one hash probe;
  * the map access dominates either way (same trade as the sketch
  * expressions in this package).
  */
case class DictGetExpr(dict: Dictionaries.Dict, attr: String,
    child: Expression) extends UnaryExpression with CodegenFallback {

  private val (attrIdx, attrType) = dict.attrIndex(attr)

  override def dataType: DataType = attrType
  override def nullable: Boolean = true
  override def prettyName: String = "dictGet"

  override def nullSafeEval(key: Any): Any = {
    val vals = dict.data.value.get(dict.probeKey(key))
    if (vals == null) null else vals(attrIdx)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** dictHas: true iff the key is present. A null key is absent (CH
  * returns 0), not null.
  */
case class DictHasExpr(dict: Dictionaries.Dict, child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dictHas"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val key = child.eval(input)
    key != null && dict.data.value.containsKey(dict.probeKey(key))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
