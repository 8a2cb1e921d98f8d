package graft

import scala.collection.mutable
import scala.sys.process.{Process, ProcessLogger}
import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.{DatasetSpec, QueryEngine}
import graft.query.QueryParser

/**
 * Randomized differential fuzzer for the fr query language: generates seeded
 * random query ASTs AS JSON (exercising QueryParser's shorthand expansion,
 * the includeZero truth table and RelationParser), plans them through
 * QueryEngine over the real sf0.001 events table, and checks every result
 * table against a DuckDB oracle GENERATED from the same random model
 * (executed by tools/fuzz_oracle.py in one batch).
 *
 * The battery (Verify + check_correctness.py) enumerates each operator
 * singly; this covers the INTERACTIONS — filters × count/sum targets ×
 * includeZero × multi-condition relations (precedence, names, parens) ×
 * sequences (negated steps, maxDuration) × aggregations × funnel (incl.
 * step/end aggregations) × timeframe — the reference itself only
 * hand-enumerates (tests/test_query_engine.py:426-497).
 *
 * Null-semantics coverage: the raw events table has no nulls, so two derived
 * columns (`etype_n`, `value_n`) inject NULLs deterministically from
 * event_id on BOTH sides, making the pandas null contract (`!=`/`not
 * contains` true on null, everything else false) observable.
 *
 * Determinism contracts this relies on (see memory/BENCH.md conventions):
 * decimal(20,4) measure on both sides (exact distributed sums), epoch-nanos
 * longs compared as int64, per-value aggs restricted to ≤6-distinct columns
 * with top=10 so LIMIT never cuts and tie-break order cannot matter (rows
 * are sorted canonically before comparing).
 */
object QueryFuzzer {

  // ------------------------------------------------------------- primitives

  def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    } + "\""

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  private def sqlCmp(op: String) = op match {
    case "==" => "="
    case "!=" => "<>"
    case o    => o
  }

  /** One row filter: JSON fragment (shorthand or verbose, random) + the
    * DuckDB predicate mirroring QueryEngine.compileFilter's null semantics. */
  final case class GFilter(json: String, sql: String)

  private def filterJson(rnd: Random, c: String, op: String, jsonValue: String) =
    if (rnd.nextBoolean()) s"""[${jsonStr(c)}, ${jsonStr(op)}, $jsonValue]"""
    else s"""{"column": ${jsonStr(c)}, "op": ${jsonStr(op)}, "value": $jsonValue}"""

  private def strFilter(rnd: Random, c: String, op: String, v: String): GFilter = {
    val sql = op match {
      case "=="           => s"COALESCE($c = ${sqlStr(v)}, FALSE)"
      case "!="           => s"COALESCE($c <> ${sqlStr(v)}, TRUE)"
      case "contains"     => s"COALESCE(contains($c, ${sqlStr(v)}), FALSE)"
      case "not contains" => s"(NOT COALESCE(contains($c, ${sqlStr(v)}), FALSE))"
      case "regex"        => s"COALESCE(regexp_matches($c, ${sqlStr(v)}), FALSE)"
    }
    GFilter(filterJson(rnd, c, op, jsonStr(v)), sql)
  }

  private def numFilter(rnd: Random, c: String, op: String, v: String): GFilter = {
    val default = if (op == "!=") "TRUE" else "FALSE"
    GFilter(filterJson(rnd, c, op, v), s"COALESCE($c ${sqlCmp(op)} $v, $default)")
  }

  private def boolFilter(rnd: Random, c: String, op: String, v: Boolean): GFilter = {
    val default = if (op == "!=") "TRUE" else "FALSE"
    GFilter(filterJson(rnd, c, op, v.toString),
      s"COALESCE($c ${sqlCmp(op)} $v, $default)")
  }

  private val EventTypes    = Seq("view", "click", "purchase", "error", "signup", "absent")
  private val ContainsPool  = Seq("ick", "pur", "err", "v", "zzz", "up")
  private val RegexPool     = Seq("^p", "c.ick", "(view|click)", "r{2}", "up$", "^z.*")
  private val PropsContains = Seq("\"k\": 8", "7}", "k\": 1")
  private val PropsRegex    = Seq("k\": [0-9]{2}", "8[0-9]}", ": [0-9]+")
  private val NumVals       = Seq("0.03", "10", "50", "100", "150", "250.5", "327.53")
  private val IdVals        = Seq("0", "100", "500", "12345")
  private val CmpOps        = Seq("==", "!=", ">", ">=", "<", "<=")
  private val CountVals     = Seq(0L, 1L, 2L, 3L, 5L, 10L, 15L, 30L)
  private val SumVals       = Seq("50", "200.25", "500", "1500.5", "5000")
  private val IdSumVals     = Seq("1000", "5000", "20000", "100000")
  private val Durations     = Seq(3600000000000L, 86400000000000L,
                                  604800000000000L, 2000000000000000L)
  private val TfBounds      = Seq(1704500000000000000L, 1705000000000000000L,
                                  1705500000000000000L, 1706000000000000000L,
                                  1706500000000000000L)
  private val CondNames     = Seq("alpha", "beta", "gamma", "delta")

  private def pick[T](rnd: Random, xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  private def genFilter(rnd: Random): GFilter = rnd.nextInt(11) match {
    case p if p < 4 =>
      val c = if (rnd.nextInt(4) == 0) "etype_n" else "event_type"
      rnd.nextInt(6) match {
        case 0 => strFilter(rnd, c, "!=", pick(rnd, EventTypes))
        case 1 => strFilter(rnd, c, "contains", pick(rnd, ContainsPool))
        case 2 => strFilter(rnd, c, "not contains", pick(rnd, ContainsPool))
        case 3 => strFilter(rnd, c, "regex", pick(rnd, RegexPool))
        case _ => strFilter(rnd, c, "==", pick(rnd, EventTypes))
      }
    case p if p < 8 =>
      // value_nan: the NaN-injected double (Spark and DuckDB agree on NaN
      // ordering — NaN greatest, == false / != true vs finite values — so
      // the oracle needs no special-casing; see DIVERGENCES.md for the
      // deliberate departure from pandas' all-False NaN comparisons).
      val c = rnd.nextInt(6) match {
        case 0     => "value_n"
        case 1 | 2 => "value_nan"
        case _     => "value"
      }
      numFilter(rnd, c, pick(rnd, CmpOps), pick(rnd, NumVals))
    case 8 =>
      numFilter(rnd, "event_id", pick(rnd, CmpOps), pick(rnd, IdVals))
    case 9 =>
      if (rnd.nextBoolean()) strFilter(rnd, "props", "contains", pick(rnd, PropsContains))
      else strFilter(rnd, "props", "regex", pick(rnd, PropsRegex))
    case _ =>
      // boolean column (incl. nullable): only ==/!= are valid (validator
      // boolOps); the null-injected variant exercises the pandas null
      // contract on booleans too.
      val c = if (rnd.nextBoolean()) "is_big_n" else "is_big"
      boolFilter(rnd, c, if (rnd.nextBoolean()) "==" else "!=", rnd.nextBoolean())
  }

  private def genStep(rnd: Random): (String, String, Boolean) = {
    val filters = Seq.fill(1 + rnd.nextInt(2))(genFilter(rnd))
    val rowFound = rnd.nextInt(5) != 0
    val fs =
      if (filters.size == 1 && rnd.nextBoolean())
        s""""filter": ${filters.head.json}"""
      else s""""filters": [${filters.map(_.json).mkString(", ")}]"""
    val rf = if (rowFound) "" else """, "rowFound": false"""
    (s"{$fs$rf}", filters.map(_.sql).mkString(" AND "), rowFound)
  }

  /**
   * Chained-anchor CTEs for a sequence/funnel over source CTE `src`,
   * mirroring QueryEngine.sequenceCols step by step: anchor j = min ts of
   * rows matching step j strictly after the previous anchor; negated steps
   * (`rowFound:false`) require NO such row and do not advance the anchor.
   * Returns (ctes, lastCteName, cumulative passed expr per step — the final
   * entry is the sequence-condition pass, intermediates are the funnel's
   * per-step flags including the per-step maxDuration term).
   */
  private def seqSql(tag: String, src: String, steps: Seq[(String, String, Boolean)],
                     maxDuration: Option[Long]): (Seq[String], String, Seq[String]) = {
    val ctes = mutable.Buffer[String]()
    var prev: Option[String] = None
    var carried = Seq.empty[String]
    var anchor: Option[String] = None
    var firstAnchor: Option[String] = None
    val parts = mutable.Buffer[String]()
    val stepPassed = mutable.Buffer[String]()
    steps.zipWithIndex.foreach { case ((_, pred, rowFound), j) =>
      val cteName = s"${tag}_$j"
      val cond = anchor match {
        case Some(a) => s"($pred) AND tl > p.$a"
        case None    => s"($pred)"
      }
      val aggCol =
        if (rowFound) s"min(CASE WHEN $cond THEN tl END) AS a$j"
        else s"max(CASE WHEN $cond THEN 1 END) AS x$j"
      val carry = carried.map(c => s"max(p.$c) AS $c")
      val from = prev match {
        case Some(pc) => s"$src JOIN $pc p USING (user_id)"
        case None     => src
      }
      ctes += s"$cteName AS (SELECT ${(Seq("user_id") ++ carry :+ aggCol).mkString(", ")} " +
        s"FROM $from GROUP BY user_id)"
      if (rowFound) {
        parts += s"a$j IS NOT NULL"
        anchor = Some(s"a$j")
        if (firstAnchor.isEmpty) firstAnchor = Some(s"a$j")
        carried :+= s"a$j"
      } else {
        parts += s"x$j IS NULL"
        carried :+= s"x$j"
      }
      val durTerm = for {
        d <- maxDuration; la <- anchor; fa <- firstAnchor; if la != fa
      } yield s"$la - $fa <= $d"
      stepPassed += (parts.toSeq ++ durTerm).map(p => s"($p)").mkString(" AND ")
      prev = Some(cteName)
    }
    (ctes.toSeq, prev.get, stepPassed.toSeq)
  }

  /** One condition: JSON fragment + the CTEs defining c<i>(user_id, p). */
  private def genCondition(rnd: Random, i: Int, name: Option[String])
      : (String, Seq[String]) = {
    val nm = name.map(n => s""""name": ${jsonStr(n)}, """).getOrElse("")
    if (rnd.nextInt(10) < 3) {
      // sequence condition
      val steps = Seq.fill(2 + rnd.nextInt(3))(genStep(rnd))
      val md = if (rnd.nextInt(20) < 7) Some(pick(rnd, Durations)) else None
      val mdJson = md.map(d => s""", "maxDuration": $d""").getOrElse("")
      val json = s"""{$nm"sequence": [${steps.map(_._1).mkString(", ")}]$mdJson}"""
      val (ctes, last, passed) = seqSql(s"c${i}s", "e", steps, md)
      (json, ctes :+ s"c$i AS (SELECT user_id, ${passed.last} AS p FROM $last)")
    } else {
      // filters + target condition
      val filters = Seq.fill(1 + rnd.nextInt(2))(genFilter(rnd))
      val pred = filters.map(_.sql).mkString(" AND ")
      val mc = s"sum(CASE WHEN $pred THEN 1 ELSE 0 END)"
      val fjson =
        if (filters.size == 1 && rnd.nextBoolean())
          s""""filter": ${filters.head.json}"""
        else s""""filters": [${filters.map(_.json).mkString(", ")}]"""
      val (tjson, pass) =
        if (rnd.nextInt(7) == 0) {
          // omit target → default count >= 1, includeZero false
          ("", s"(($mc >= 1) AND $mc > 0)")
        } else if (rnd.nextInt(10) < 7) {
          // count target, includeZero per the parser's truth table
          val op = pick(rnd, CmpOps)
          val v = pick(rnd, CountVals)
          val legalTrue = (op == "==" && v == 0) || (op == ">=" && v == 0) ||
            (op == "!=" && v != 0) || (op == "<" && v > 0) || op == "<="
          val legalFalse = !(op == "==" && v == 0)
          val iz: Option[Boolean] = rnd.nextInt(3) match {
            case 0 if legalTrue  => Some(true)
            case 1 if legalFalse => Some(false)
            case _               => None
          }
          val resolved = iz.getOrElse(op == "==" && v == 0)
          val tj =
            if (rnd.nextBoolean()) s"""["count", ${jsonStr(op)}, $v]"""
            else s"""{"type": "count", "op": ${jsonStr(op)}, "value": $v}"""
          val izj = iz.map(b => s""", "includeZero": $b""").getOrElse("")
          val base = s"($mc ${sqlCmp(op)} $v)"
          (s""", "target": $tj$izj""",
            if (resolved) base else s"($base AND $mc > 0)")
        } else {
          // sum target (includeZero not applicable); event_id exercises
          // integer sums (exact int64 both sides) alongside the decimals.
          val (c, pool) = rnd.nextInt(6) match {
            case 0     => ("value_n", SumVals)
            case 1     => ("event_id", IdSumVals)
            case 2     => ("value_nan", SumVals) // NaN-poisoned sums: both
            // engines propagate NaN and order it greatest, exactly
            case _     => ("value", SumVals)
          }
          val op = pick(rnd, CmpOps)
          val v = pick(rnd, pool)
          val tj =
            if (rnd.nextBoolean()) s"""["sum", ${jsonStr(c)}, ${jsonStr(op)}, $v]"""
            else s"""{"type": "sum", "column": ${jsonStr(c)}, "op": ${jsonStr(op)}, "value": $v}"""
          (s""", "target": $tj""",
            s"(($mc > 0) AND (COALESCE(sum(CASE WHEN $pred THEN $c END), 0) ${sqlCmp(op)} $v))")
        }
      val json = s"{$nm$fjson$tjson}"
      (json, Seq(s"c$i AS (SELECT user_id, $pass AS p FROM e GROUP BY user_id)"))
    }
  }

  // ---------------------------------------------------------------- relation

  private sealed trait Rel
  private final case class RRef(i: Int) extends Rel
  private final case class RAnd(l: Rel, r: Rel) extends Rel
  private final case class ROr(l: Rel, r: Rel) extends Rel

  private def genTree(rnd: Random, n: Int, leaves: Int): Rel =
    if (leaves == 1) RRef(rnd.nextInt(n))
    else {
      val l = 1 + rnd.nextInt(leaves - 1)
      val left = genTree(rnd, n, l)
      val right = genTree(rnd, n, leaves - l)
      if (rnd.nextBoolean()) RAnd(left, right) else ROr(left, right)
    }

  private def treeJson(t: Rel, ref: Int => String): String = t match {
    case RRef(i)    => ref(i)
    case RAnd(l, r) => s"(${treeJson(l, ref)} and ${treeJson(r, ref)})"
    case ROr(l, r)  => s"(${treeJson(l, ref)} or ${treeJson(r, ref)})"
  }

  private def treeSql(t: Rel): String = t match {
    case RRef(i)    => s"c$i.p"
    case RAnd(l, r) => s"(${treeSql(l)} AND ${treeSql(r)})"
    case ROr(l, r)  => s"(${treeSql(l)} OR ${treeSql(r)})"
  }

  // ------------------------------------------------------------ aggregations

  /** One aggregation request: JSON fragment + oracle SQL builder per
    * expanded aggregation (3 for the default-triple expansion), over a
    * caller-supplied FROM/WHERE so the same generator serves plain
    * aggregations (`FROM me`) and funnel step/end aggregations (`FROM me
    * JOIN fl ... WHERE fl.p<j>`). Per-value aggs are restricted to
    * ≤6-distinct columns so top=10 never cuts and ordering ties cannot
    * matter (results compare as sorted sets). */
  private def genAgg(rnd: Random, allowDefaultTriple: Boolean = true)
      : (String, (String, String) => Seq[String]) = {
    def pv = rnd.nextInt(5) match {
      case 0 => "etype_n"
      case 1 => "is_big_n" // 3 distinct values incl. the null group
      case _ => "event_type"
    }
    rnd.nextInt(6) match {
      case 0 if allowDefaultTriple =>
        val c = pv
        (s"""{"column": ${jsonStr(c)}}""", (f, w) => Seq(
          s"SELECT count(me.$c) AS value FROM $f$w",
          s"SELECT me.$c AS value, count(*) AS count FROM $f$w GROUP BY me.$c",
          s"SELECT me.$c AS value, count(DISTINCT me.user_id) AS groups FROM $f$w GROUP BY me.$c"))
      case 0 | 1 =>
        val c = pick(rnd, Seq("value_n", "event_type", "etype_n", "props", "value"))
        (s"""{"column": ${jsonStr(c)}, "type": "count"}""",
          (f, w) => Seq(s"SELECT count(me.$c) AS value FROM $f$w"))
      case 2 =>
        val c = pv
        (s"""{"column": ${jsonStr(c)}, "type": "countPerValue"}""",
          (f, w) => Seq(s"SELECT me.$c AS value, count(*) AS count FROM $f$w GROUP BY me.$c"))
      case 3 =>
        val c = pv
        (s"""{"column": ${jsonStr(c)}, "type": "groupsPerValue"}""",
          (f, w) => Seq(s"SELECT me.$c AS value, count(DISTINCT me.user_id) AS groups " +
            s"FROM $f$w GROUP BY me.$c"))
      case 4 =>
        val c = pv
        val o = rnd.nextInt(5) match {
          case 0 => "value_n"
          case 1 => "event_id" // integer measure: exact int64 sum both sides
          case 2 => "value_nan" // NaN groups agree exactly (NaN-propagating
          // sums of integer-valued doubles: order-independent both sides)
          case _ => "value"
        }
        (s"""{"column": ${jsonStr(c)}, "type": "sumPerValue", "otherColumn": ${jsonStr(o)}}""",
          (f, w) => Seq(s"SELECT me.$c AS value, CAST(sum(me.$o) AS DOUBLE) AS sum " +
            s"FROM $f$w GROUP BY me.$c"))
      case _ =>
        val c = pv
        val o = rnd.nextInt(5) match {
          case 0 => "value_n"
          case 1 => "event_id" // integer measure: exact int64 sum both sides
          case 2 => "value_nan" // NaN groups agree exactly (NaN-propagating
          // sums of integer-valued doubles: order-independent both sides)
          case _ => "value"
        }
        (s"""{"column": ${jsonStr(c)}, "type": "meanPerValue", "otherColumn": ${jsonStr(o)}}""",
          (f, w) => Seq(s"SELECT me.$c AS value, CAST(sum(me.$o) AS DOUBLE) / count(me.$o) AS mean " +
            s"FROM $f$w GROUP BY me.$c"))
    }
  }

  // ----------------------------------------------------------- whole queries

  final case class GQuery(json: String, summarySql: String,
                          aggSqls: Seq[String], funnelSql: Option[String],
                          funnelAggSqls: Seq[String])

  def genQuery(rnd: Random, parquetPath: String): GQuery = {
    // Timeframe (p≈0.4): one- or two-sided nanos bounds inside the data range.
    val timeframe: Option[(String, String)] = if (rnd.nextInt(5) < 2) {
      val a = pick(rnd, TfBounds)
      val b = pick(rnd, TfBounds)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      rnd.nextInt(4) match {
        case 0 => Some((s"""{"from": $lo}""", s"epoch_ns(ts) >= $lo"))
        case 1 => Some((s"""{"to": $hi}""", s"epoch_ns(ts) < $hi"))
        case _ if lo < hi =>
          Some((s"""{"from": $lo, "to": $hi}""",
            s"epoch_ns(ts) >= $lo AND epoch_ns(ts) < $hi"))
        case _ => Some((s"""{"from": $lo}""", s"epoch_ns(ts) >= $lo"))
      }
    } else None

    // Base CTE: the Spark-side frame mirrored (decimal measure, epoch-nanos
    // tl, deterministic injected-null columns), timeframe applied first like
    // QueryEngine's `framed`.
    val where = timeframe.map { case (_, w) => s" WHERE $w" }.getOrElse("")
    val eCte =
      s"""e AS (SELECT user_id, event_type, event_id, props, epoch_ns(ts) AS tl,
         |  CAST(value AS DECIMAL(20,4)) AS value,
         |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS etype_n,
         |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE CAST(value AS DECIMAL(20,4)) END AS value_n,
         |  CAST(value AS DECIMAL(20,4)) > 150 AS is_big,
         |  CASE WHEN event_id % 3 = 0 THEN NULL
         |       ELSE CAST(value AS DECIMAL(20,4)) > 150 END AS is_big_n,
         |  CASE WHEN event_id % 11 = 0 THEN 'NaN'::DOUBLE
         |       ELSE CAST(floor(CAST(value AS DECIMAL(20,4))) AS DOUBLE) END AS value_nan
         |  FROM read_parquet(${sqlStr(parquetPath)})$where)""".stripMargin

    val nCond = rnd.nextInt(5) // 0..4
    val named = nCond > 0 && rnd.nextInt(3) == 0
    val names = if (named) CondNames.take(nCond).map(Some(_)) else Seq.fill(nCond)(None)
    val conds = (0 until nCond).map(i => genCondition(rnd, i, names(i).map(n => n: String)))

    def ref(i: Int): String =
      if (named && rnd.nextBoolean()) {
        val n = CondNames(i)
        "$" + (if (rnd.nextInt(4) == 0) n.toUpperCase else n)
      } else s"$$$i"

    val relation: Option[(String, String)] =
      if (nCond <= 1) None
      else rnd.nextInt(6) match {
        case 0 => None // default AND over all
        case 1 =>
          Some(("or", (0 until nCond).map(i => s"c$i.p").mkString(" OR ")))
        case 2 if nCond >= 3 =>
          // un-parenthesized precedence checks: and binds tighter than or
          if (rnd.nextBoolean())
            Some((s"${ref(0)} and ${ref(1)} or ${ref(2)}", "((c0.p AND c1.p) OR c2.p)"))
          else
            Some((s"${ref(0)} or ${ref(1)} and ${ref(2)}", "(c0.p OR (c1.p AND c2.p))"))
        case 3 =>
          // Expression-form COMPLETE AND over every condition (r14): the
          // parser canonicalizes this spelling to None, so the routed fuzz
          // dimension exercises Auto routing through it — semantically the
          // default relation, oracle identical to case 0's.
          Some(((0 until nCond).map(ref).mkString(" and "),
            (0 until nCond).map(i => s"c$i.p").mkString(" AND ")))
        case _ =>
          val t = genTree(rnd, nCond, 2 + rnd.nextInt(3))
          Some((treeJson(t, ref), treeSql(t)))
      }

    val aggCount = rnd.nextInt(5) match { case 0 | 1 => 0; case 2 | 3 => 1; case _ => 2 }
    val aggs = Seq.fill(aggCount)(genAgg(rnd))

    type AggGen = (String, (String, String) => Seq[String])
    val funnel: Option[(String, Seq[(String, String, Boolean)], Option[Long],
                        Seq[AggGen], Seq[AggGen])] =
      if (rnd.nextInt(10) < 3) {
        val steps = Seq.fill(2 + rnd.nextInt(2))(genStep(rnd))
        val md = if (rnd.nextInt(5) < 2) Some(pick(rnd, Durations)) else None
        // step/end aggregations (F2/F3) over the per-step survivors; typed
        // only (no default-triple) to keep the expansion 1:1 with the SQL.
        val stepAggs =
          if (rnd.nextInt(3) == 0) Seq(genAgg(rnd, allowDefaultTriple = false)) else Nil
        val endAggs =
          if (rnd.nextInt(3) == 0) Seq(genAgg(rnd, allowDefaultTriple = false)) else Nil
        val mdJson = md.map(d => s""", "maxDuration": $d""").getOrElse("")
        val saJson =
          if (stepAggs.isEmpty) ""
          else s""", "stepAggregations": [${stepAggs.map(_._1).mkString(", ")}]"""
        val eaJson =
          if (endAggs.isEmpty) ""
          else s""", "endAggregations": [${endAggs.map(_._1).mkString(", ")}]"""
        Some((s"""{"sequence": [${steps.map(_._1).mkString(", ")}]$mdJson$saJson$eaJson}""",
          steps, md, stepAggs, endAggs))
      } else None

    // ---- assemble JSON
    val queryParts = mutable.Buffer[String]()
    if (conds.nonEmpty) queryParts += s""""conditions": [${conds.map(_._1).mkString(", ")}]"""
    relation.foreach { case (rj, _) => queryParts += s""""relation": ${jsonStr(rj)}""" }
    if (aggs.nonEmpty) queryParts += s""""aggregations": [${aggs.map(_._1).mkString(", ")}]"""
    val topParts = mutable.Buffer[String]()
    if (queryParts.nonEmpty) topParts += s""""query": {${queryParts.mkString(", ")}}"""
    funnel.foreach { case (fj, _, _, _, _) => topParts += s""""funnel": $fj""" }
    timeframe.foreach { case (tj, _) => topParts += s""""timeframe": $tj""" }
    val json = s"{${topParts.mkString(", ")}}"

    // ---- assemble SQL
    val condCtes = conds.flatMap(_._2)
    val mCte =
      if (nCond == 0) None
      else {
        val joins = (1 until nCond).map(i => s" JOIN c$i USING (user_id)").mkString
        val relExpr = relation.map(_._2)
          .getOrElse((0 until nCond).map(i => s"c$i.p").mkString(" AND "))
        Some(s"m AS (SELECT c0.user_id FROM c0$joins WHERE $relExpr)")
      }
    val meCte =
      if (nCond == 0) "me AS (SELECT * FROM e)"
      else "me AS (SELECT e.* FROM e JOIN m USING (user_id))"
    val prefix =
      s"WITH ${(Seq(eCte) ++ condCtes ++ mCte.toSeq :+ meCte).mkString(",\n")}\n"

    val summarySql = prefix +
      "SELECT count(DISTINCT user_id) AS matching_groups, count(*) AS matching_group_rows FROM me"
    val aggSqls = aggs.flatMap(_._2("me", "")).map(prefix + _)
    var funnelAggSqls = Seq.empty[String]
    val funnelSql = funnel.map { case (_, steps, md, stepAggs, endAggs) =>
      val (ctes, last, passed) = seqSql("f", "me", steps, md)
      val flCols = passed.zipWithIndex.map { case (p, j) => s"$p AS p$j" }
      val fl = s"fl AS (SELECT ${(Seq("user_id") ++ flCols).mkString(", ")} FROM $last)"
      val funnelPrefix =
        prefix.stripSuffix("\n") + ",\n" + (ctes :+ fl).mkString(",\n") + "\n"
      val stepSelects = passed.indices.map { j =>
        s"SELECT $j AS step, count(DISTINCT CASE WHEN fl.p$j THEN me.user_id END) AS step_groups, " +
          // COALESCE: a funnel over an empty matched set counts ZERO rows
          // (r16, both engine plans agree) — bare SUM over empty is NULL.
          s"COALESCE(sum(CASE WHEN fl.p$j THEN 1 ELSE 0 END), 0) AS step_rows FROM me JOIN fl USING (user_id)"
      }
      // Engine order: step aggs j-outer/agg-inner over step-j survivors,
      // then end aggs over the last step's survivors.
      val joined = "me JOIN fl USING (user_id)"
      funnelAggSqls =
        (for { j <- passed.indices; (_, fn) <- stepAggs; sql <- fn(joined, s" WHERE fl.p$j") }
          yield funnelPrefix + sql) ++
        (for { (_, fn) <- endAggs; sql <- fn(joined, s" WHERE fl.p${passed.size - 1}") }
          yield funnelPrefix + sql)
      funnelPrefix.stripSuffix("\n") + "\n" + stepSelects.mkString("\nUNION ALL\n")
    }
    GQuery(json, summarySql, aggSqls, funnelSql, funnelAggSqls)
  }

  // ----------------------------------------------------------- negative fuzz

  /** One INVALID query (JSON, reason): a valid fragment plus one mutation
    * that violates a documented parse/validation rule. The negative test
    * asserts parse+validate rejects every one with QueryValidationException —
    * the reference's invalid-query tests, randomized. */
  def genInvalid(rnd: Random): (String, String) = {
    def f = genFilter(rnd).json
    rnd.nextInt(20) match {
      case 0 => (s"""{"query": {"conditions": [{"filter": $f, "target": ["sum", "value", ">", 10], "includeZero": true}]}}""",
        "includeZero not applicable to sum targets")
      case 1 => (s"""{"query": {"conditions": [{"filter": $f, "target": ["count", ">", ${pick(rnd, CountVals)}], "includeZero": true}]}}""",
        "includeZero=true with a zero-precluding count target")
      case 2 => (s"""{"query": {"conditions": [{"filter": $f, "target": ["count", "==", 0], "includeZero": false}]}}""",
        "count==0 requires includeZero")
      case 3 => (s"""{"query": {"conditions": [{"filter": ["value", "${pick(rnd, Seq("contains", "not contains", "regex"))}", "x"]}]}}""",
        "string operator on a numeric column")
      case 4 => (s"""{"query": {"conditions": [{"filter": ["event_type", "${pick(rnd, Seq(">", ">=", "<", "<="))}", "view"]}]}}""",
        "ordered comparison on a string column")
      case 5 => (s"""{"query": {"conditions": [{"filter": ["event_type", "==", ${pick(rnd, IdVals)}]}]}}""",
        "numeric value against a string column")
      case 6 => (s"""{"query": {"conditions": [{"filter": ["no_such_col_${rnd.nextInt(100)}", "==", 1]}]}}""",
        "unknown column")
      case 7 => (s"""{"query": {"conditions": [{"filter": $f}], "relation": "$$0 and $$${1 + rnd.nextInt(8)}"}}""",
        "relation references a nonexistent condition")
      case 8 => (s"""{"query": {"conditions": [{"filter": $f}], "relation": "($$0 and"}}""",
        "relation syntax error")
      case 9 => (s"""{"query": {"conditions": [{"name": "dup", "filter": $f}, {"name": "DUP", "filter": $f}]}}""",
        "duplicate condition names (case-insensitive)")
      case 10 => (s"""{"nope_${rnd.nextInt(10)}": 1}""", "unknown top-level key")
      case 11 => (s"""{"query": {"aggregations": [{"column": "event_type", "type": "medianPerValue"}]}}""",
        "unknown aggregation type")
      case 12 => (s"""{"query": {"aggregations": [{"column": "event_type", "type": "countPerValue", "otherColumn": "value"}]}}""",
        "otherColumn on a type that does not take one")
      case 13 => (s"""{"query": {"aggregations": [{"column": "event_type", "type": "${pick(rnd, Seq("sumPerValue", "meanPerValue"))}"}]}}""",
        "missing otherColumn")
      case 14 => (s"""{"query": {"conditions": [{"filter": $f, "target": ["count", ">", -${1 + rnd.nextInt(5)}]}]}}""",
        "negative count target")
      case 15 => ("""{"funnel": {"sequence": []}}""", "empty funnel sequence")
      case 16 => ("""{"timeframe": {"from": 1706000000000000000, "to": 1705000000000000000}, "query": {}}""",
        "timeframe to < from")
      case 17 => (s"""{"query": {"conditions": [{"filter": {"column": "value", "op": ">", "value": 1, "extra": 2}}]}}""",
        "extra key in a verbose filter")
      case 18 => (s"""{"query": {"conditions": [{"filter": $f, "filters": [$f]}]}}""",
        "both filter and filters")
      case _ => (s"""{"query": {"aggregations": [{"type": "count"}]}}""",
        "aggregation without a column")
    }
  }

  // --------------------------------------------------------- canonicalization

  private val IntRe = "[-+]?[0-9]+".r
  private val NumRe = "[-+]?[0-9]*\\.?[0-9]+([eE][-+]?[0-9]+)?".r

  /** Canonical cell form shared by both engines' stringified outputs:
    * integers via BigInt; short decimals (exact DECIMAL results) via
    * BigDecimal stripTrailingZeros; anything longer via a Double round-trip
    * (both engines emit round-trip-exact shortest forms, so equal doubles
    * canonicalize identically even when the source strings differ). */
  def canon(s: String): String =
    if (s == null) " NULL"
    else if (s == "True" || s == "true") "true"   // python str(bool) vs Scala
    else if (s == "False" || s == "false") "false"
    else if (s.equalsIgnoreCase("nan")) "NaN"     // python repr vs Java toString
    else if (IntRe.matches(s)) BigInt(s).toString
    else if (NumRe.matches(s)) {
      val bd = new java.math.BigDecimal(s)
      if (bd.scale <= 6 && bd.precision <= 18) bd.stripTrailingZeros.toPlainString
      else java.lang.Double.toString(s.toDouble)
    } else s

  def canonRows(rows: Seq[Seq[String]]): Seq[Seq[String]] =
    rows.map(_.map(canon)).sortBy(_.mkString(""))
}

class FuzzSpec extends SparkSpec {
  import QueryFuzzer._

  // Defaults are what CI runs; GRAFT_FUZZ_SEED / GRAFT_FUZZ_N / GRAFT_FUZZ_SF
  // allow exploratory sweeps (different seeds, bigger corpora, other SFs)
  // without touching the committed reproducible run.
  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(200)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed)

  private lazy val duckdbOk =
    Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0

  private def sparkCell(v: Any): String = v match {
    case null                        => null
    case d: java.math.BigDecimal     => d.toPlainString
    case x                           => x.toString
  }

  /** The fuzz frame: real events plus the derived decimal measure and
    * deterministic injected-null / boolean columns (mirrored in the
    * oracle's `e` CTE). */
  private def fuzzFrame: DataFrame =
    graft.ops.Tables.events(spark, sfDir)
      .withColumn("value", col("value").cast("decimal(20,4)"))
      .withColumn("etype_n",
        when(pmod(col("event_id"), lit(7)) === 0, lit(null).cast("string"))
          .otherwise(col("event_type")))
      .withColumn("value_n",
        when(pmod(col("event_id"), lit(5)) === 0, lit(null).cast("decimal(20,4)"))
          .otherwise(col("value")))
      .withColumn("is_big", col("value") > 150)
      .withColumn("is_big_n",
        when(pmod(col("event_id"), lit(3)) === 0, lit(null).cast("boolean"))
          .otherwise(col("value") > 150))
      // NaN dimension: a FLOAT measure with real NaNs (testdata carries
      // nulls, never NaNs). Non-NaN values are floored to integer-valued
      // doubles so multi-row sums are order-independent (exact < 2^53) in
      // both engines; a NaN in any summed group poisons the sum to NaN
      // identically on both sides.
      .withColumn("value_nan",
        when(pmod(col("event_id"), lit(11)) === 0, lit(Double.NaN))
          .otherwise(floor(col("value")).cast("double")))

  test(s"$N seeded random queries match generated DuckDB oracles") {
    assume(duckdbOk, "python3 + duckdb unavailable — differential fuzz skipped")
    assume(new java.io.File(s"$sfDir/events.parquet").exists(), s"$sfDir missing")

    val rnd = new Random(Seed)
    val queries = (0 until N).map(i => i -> genQuery(rnd, s"$sfDir/events.parquet"))

    // ---- DuckDB side: one batched subprocess over all statements
    val sqlMap: Map[String, String] = queries.flatMap { case (i, q) =>
      Seq(s"q${i}_summary" -> q.summarySql) ++
        q.aggSqls.zipWithIndex.map { case (s, k) => s"q${i}_agg$k" -> s } ++
        q.funnelSql.map(s"q${i}_funnel" -> _) ++
        q.funnelAggSqls.zipWithIndex.map { case (s, k) => s"q${i}_fagg$k" -> s }
    }.toMap
    val qFile = java.io.File.createTempFile("fuzz_queries", ".json")
    val rFile = java.io.File.createTempFile("fuzz_results", ".json")
    val fw = new java.io.FileWriter(qFile)
    try fw.write(org.json4s.jackson.Serialization.write(sqlMap)(DefaultFormats))
    finally fw.close()
    val script = new java.io.File("tools/fuzz_oracle.py").getAbsolutePath
    val rc = Process(Seq("python3", script, qFile.getAbsolutePath, rFile.getAbsolutePath)).!
    assert(rc == 0, s"fuzz_oracle.py exited $rc")
    val duck: Map[String, Either[String, Seq[Seq[String]]]] =
      JsonMethods.parse(rFile).asInstanceOf[JObject].obj.map {
        case (k, JArray(rows)) =>
          k -> Right(rows.map {
            case JArray(cells) => cells.map {
              case JNull      => null
              case JString(s) => s
              case other      => JsonMethods.compact(other)
            }
            case other => fail(s"bad row in $k: $other")
          })
        case (k, obj: JObject) =>
          k -> Left(JsonMethods.compact(obj))
        case (k, other) => k -> Left(s"unexpected: $other")
      }.toMap

    // ---- Spark side + comparison
    // Window plan pinned as the primary fuzz target (the general plan every
    // oracle mirrors step by step); the ROUTED dimension below re-runs a
    // quarter of the draws through the default Auto engine.
    val engine = new QueryEngine(DatasetSpec("user_id", "ts")).withWindowPlan
    // ROUTED dimension (r13): every fourth query runs through the DEFAULT
    // engine, whose Auto routing resolves shape/type-compatible sequence
    // conditions via SequenceMatch + semi-join and aggregation-free funnels
    // via funnelCounts — against the SAME oracles. This fuzzes the routing
    // DECISION itself: whichever plan fires for a random combination of
    // relations × negated steps × maxDuration × step/end aggregations ×
    // string gids (i%4==2 crosses i%5==0) must be semantically invisible.
    // Size gate disabled: sf0.001 is far below the measured crossover —
    // the point here is fuzzing the ROUTED plan's semantics. numGroups is
    // SET (r15): an under-cap registered group count turns on the
    // survivor-sharing broadcast plan for every multi-frame routed draw,
    // so the fuzzer exercises the hinted cached-survivors path on random
    // shapes (the gate-off r14 plan stays covered by the battery rows and
    // the OperatorsSpec gate test's no-numGroups variant).
    // gidMaxBytes (r16): on the routed × string-gid crossings (i ≡ 10
    // mod 20) this sends the survivor gate through its BYTE-estimate
    // branch ("u"+4 digits ≤ 8 B; 1000 × 32 B ≪ 512 MB → hinted) instead
    // of the stat-less count-cap fallback; integral draws ignore it.
    val engineRouted = new QueryEngine(DatasetSpec("user_id", "ts",
        numGroups = Some(1000L), gidMaxBytes = Some(8L)))
      .withRoutingThreshold(0)
    val df = fuzzFrame.cache()
    // STRING-GID dimension (r12): every fifth query runs the ENTIRE
    // engine surface — conditions, relations, sequences, aggregations,
    // funnels — over the same frame with user_id as a non-numeric
    // string ("u<id>"). The reference's gid contract is int-or-string
    // (registration_task_runner.py:85-92) and every fuzz oracle is
    // gid-representation-invariant (no generated aggregation emits gid
    // VALUES, only counts over event columns), so the DuckDB results
    // are reused verbatim. Any lossy gid cast anywhere in the window
    // plan would null the ids and blow every count.
    val dfS = fuzzFrame
      .withColumn("user_id", concat(lit("u"), col("user_id").cast("string")))
      .cache()
    def check(qid: String, sparkDf: DataFrame, sql: String, json: String): Seq[String] = {
      val got = canonRows(sparkDf.collect().toIndexedSeq.map(_.toSeq.map(sparkCell)))
      duck.get(qid) match {
        case Some(Right(rows)) =>
          val want = canonRows(rows)
          if (got != want)
            Seq(s"""MISMATCH $qid
               |query: $json
               |sql: $sql
               |spark (${got.size} rows): ${got.take(8).mkString(" | ")}
               |duckdb (${want.size} rows): ${want.take(8).mkString(" | ")}""".stripMargin)
          else Nil
        case Some(Left(err)) =>
          Seq(s"ORACLE ERROR $qid: $err\nquery: $json\nsql: $sql")
        case None =>
          Seq(s"MISSING oracle result for $qid")
      }
    }

    def evalOne(i: Int, q: GQuery): Seq[String] =
      try {
        val parsed = QueryParser.parse(q.json)
        val routed = i % 4 == 2
        val eng = if (routed) engineRouted else engine
        val planned = eng.runValidated(if (i % 5 == 0) dfS else df, parsed)
        if (planned.aggregations.size != q.aggSqls.size)
          return Seq(s"q$i: ${planned.aggregations.size} planned aggs vs " +
            s"${q.aggSqls.size} oracles\n${q.json}")
        if (planned.funnelAggregations.size != q.funnelAggSqls.size)
          return Seq(s"q$i: ${planned.funnelAggregations.size} planned funnel aggs vs " +
            s"${q.funnelAggSqls.size} oracles\n${q.json}")
        // The counts-only funnel twin (SequenceMatch.funnelCounts) rides
        // the SAME funnel oracle whenever the fuzzed funnel is in its
        // domain (no negated steps): random steps × maxDuration × the
        // condition-matched input — far broader than the unit test's one
        // seed.
        val fastFunnel = (parsed.funnel, q.funnelSql) match {
          case (Some(f), Some(fsql)) if f.steps.exists(_.rowFound) =>
            // Same oracle RESULT as q<i>_funnel (the twin's whole
            // contract); only the label distinguishes which plan diverged.
            // Every third draw runs the twin over a NON-NUMERIC STRING
            // gid ("u<id>") — funnel counts are gid-representation-
            // invariant, so the oracle is unchanged, but any surviving
            // lossy long cast (the r11 silent-collapse hazard) would
            // null every gid and blow the counts.
            val (input, gidCol, label) =
              if (i % 3 == 0)
                (planned.matchedRows.withColumn("__gid_s",
                  concat(lit("u"), col("user_id").cast("string"))),
                  "__gid_s", "funnelCounts twin, string gid")
              else (planned.matchedRows, "user_id", "funnelCounts twin")
            check(s"q${i}_funnel",
              graft.operators.SequenceMatch.funnelCounts(
                input, gidCol, "ts", f.steps, f.maxDuration),
              fsql, q.json).map(m => s"[$label] $m")
          case _ => Nil
        }
        // Label routed-engine divergences so a failure names which planner
        // produced it (the seed alone reproduces either way).
        val tag = (ms: Seq[String]) =>
          if (routed) ms.map(m => s"[routed engine] $m") else ms
        tag(check(s"q${i}_summary", planned.summary, q.summarySql, q.json) ++
          planned.aggregations.zipWithIndex.flatMap { case ((_, adf), k) =>
            check(s"q${i}_agg$k", adf, q.aggSqls(k), q.json)
          } ++
          q.funnelSql.toSeq.flatMap(fsql =>
            check(s"q${i}_funnel", planned.funnel.get, fsql, q.json)) ++
          planned.funnelAggregations.zipWithIndex.flatMap { case ((_, adf), k) =>
            check(s"q${i}_fagg$k", adf, q.funnelAggSqls(k), q.json)
          }) ++ fastFunnel
      } catch {
        case e: Exception =>
          Seq(s"q$i PLAN/EXEC FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}\nquery: ${q.json}")
      }

    try {
      // Spark actions are thread-safe; 4 concurrent query evaluations hide
      // the per-job scheduling latency that dominates at this data size
      // (tiny cached input, hundreds of small collects).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val failures =
        try Await.result(
          Future.sequence(queries.map { case (i, q) => Future(evalOne(i, q)) }),
          30.minutes).flatten
        finally pool.shutdown()
      assert(failures.isEmpty,
        s"${failures.size} of $N fuzzed queries diverged (seed=$Seed):\n\n${failures.take(10).mkString("\n\n")}")
    } finally { df.unpersist(); dfS.unpersist() }
  }

  test("300 randomized invalid queries are rejected by parse + validation") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(), s"$sfDir missing")
    // Negative side of the fuzz: every mutation of a valid query that
    // violates a documented rule must throw QueryValidationException from
    // parse or schema validation — never plan silently. Pure driver-side
    // (schema only, no Spark jobs), so it costs milliseconds.
    val rnd = new Random(Seed + 1)
    val spec = DatasetSpec("user_id", "ts")
    val schema = fuzzFrame.schema
    (0 until 300).foreach { i =>
      val (json, why) = genInvalid(rnd)
      val rejected =
        try {
          val q = QueryParser.parse(json)
          graft.query.SchemaValidator.validate(schema, spec, q)
          false
        } catch { case _: graft.query.QueryValidationException => true }
      assert(rejected, s"invalid query #$i accepted ($why): $json")
    }
  }
}
