package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL syntax for the native as-of join, via `injectParser`: the one
  * operator in graft's surface Spark SQL cannot express (DuckDB ships
  * `ASOF JOIN` as first-class grammar; Spark has no equivalent).
  *
  * Dialect (single-part table/view names, backward direction — the
  * DuckDB default `l.t >= r.t`):
  *
  * {{{
  * SELECT * FROM probes ASOF JOIN quotes
  *   ON probes.user_id = quotes.user_id AND probes.ts >= quotes.ts
  *   TIEBREAK event_id [PAYLOAD event_id, price]
  * }}}
  *
  * Every `=` conjunct is an equality key (same column name both sides,
  * as the native exec requires), the single `>=` conjunct names the
  * time column, TIEBREAK orders right rows at equal times, PAYLOAD
  * defaults to the right columns minus keys/time/tiebreak. The parse
  * builds [[AsOfJoinPlan]] directly over the catalog relations —
  * `spark.sql(...)` lands on AsOfJoinExec's two-pointer merge, not a
  * window rewrite. Any other statement delegates verbatim, so the
  * whole Spark SQL surface is untouched.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseAsOf(session, sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    parseAsOf(session, sqlText).getOrElse(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  private val Stmt = (
    "(?is)^\\s*SELECT\\s+\\*\\s+FROM\\s+(\\w+)\\s+ASOF\\s+JOIN\\s+(\\w+)" +
      "\\s+ON\\s+(.+?)\\s+TIEBREAK\\s+(\\w+)" +
      "(?:\\s+PAYLOAD\\s+([\\w, ]+?))?\\s*;?\\s*$").r
  private val Marker = "(?is).*\\bASOF\\s+JOIN\\b.*".r
  private val Cond = "(?s)^(\\w+)\\.(\\w+)\\s*(>=|=)\\s*(\\w+)\\.(\\w+)$".r

  /** Some(plan) if the text is an ASOF JOIN statement; None delegates.
    * A statement that mentions ASOF JOIN but doesn't parse raises with
    * the dialect spelled out, rather than cascading into the delegate's
    * unrelated syntax error. */
  def parseAsOf(session: SparkSession, text: String): Option[LogicalPlan] =
    text match {
      case Stmt(l, r, on, tieBreak, payload) =>
        def fail(why: String): Nothing =
          throw new IllegalArgumentException(
            s"ASOF JOIN: $why. Dialect: SELECT * FROM l ASOF JOIN r ON " +
              "l.k = r.k [AND ...] AND l.t >= r.t TIEBREAK col " +
              "[PAYLOAD c1, c2]")
        val conds = on.split("(?i)\\s+AND\\s+").toSeq.map(_.trim).map {
          case Cond(lq, lc, op, rq, rc) =>
            if (lq != l || rq != r)
              fail(s"condition sides must be $l.<col> <op> $r.<col>, " +
                s"got $lq.$lc $op $rq.$rc")
            if (lc != rc)
              fail(s"column names must match on both sides, got $lc/$rc")
            (op, lc)
          case c => fail(s"unsupported condition '$c'")
        }
        val keys = conds.collect { case ("=", c) => c }
        val times = conds.collect { case (">=", c) => c }
        if (keys.isEmpty) fail("at least one equality key is required")
        if (times.length != 1)
          fail(s"exactly one l.t >= r.t condition required, got $times")
        val left = session.table(l)
        val right = session.table(r)
        val payloadCols = Option(payload)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(right.columns.toSeq
            .filterNot(c => keys.contains(c) || c == times.head ||
              c == tieBreak))
        if (payloadCols.isEmpty) fail("payload resolved to zero columns")
        Some(graft.functions.AsOfJoin
          .backwardNative(left, right, keys, times.head, tieBreak,
            payloadCols)
          .queryExecution.logical)
      case Marker() =>
        throw new IllegalArgumentException(
          "ASOF JOIN: statement shape not recognized. Dialect: " +
            "SELECT * FROM l ASOF JOIN r ON l.k = r.k [AND ...] AND " +
            "l.t >= r.t TIEBREAK col [PAYLOAD c1, c2]")
      case _ => None
    }
}
