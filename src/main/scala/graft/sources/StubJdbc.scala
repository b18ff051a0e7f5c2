package graft.sources

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Types}
import java.util.Properties
import java.util.concurrent.atomic.AtomicBoolean
import java.util.logging.Logger

/** S9's IO leg, made testable offline (r15 verdict #1): a minimal
  * read-only JDBC driver built entirely on JDK interfaces — no
  * dependency, no network — serving one deterministic in-memory table,
  * so `Jdbc.readPartitioned` / `Jdbc.readPlanned` can be driven through
  * Spark's REAL JDBC scan path end-to-end: schema probe
  * (`SELECT * FROM t WHERE 1=0`), per-partition predicate scans,
  * pushed-filter WHERE clauses, type mapping, NULL key handling.
  *
  * This is a TEST DOUBLE, not a database: it understands exactly the
  * SQL shapes Spark's JDBC V1 relation emits (a single-table SELECT
  * with an optional WHERE over comparisons / IS [NOT] NULL / AND / OR /
  * parens — plus the literal `1` column list the scan uses when all
  * columns prune away) and throws loudly on anything else, so a Spark
  * upgrade that changes the emitted SQL fails the spec instead of
  * silently returning garbage. Thread-safety: the table is immutable
  * and every `executeQuery` returns a fresh cursor, so the 32 local
  * executor threads can scan partitions concurrently.
  *
  * The served table (`people`) is sized and shaped for the split
  * planner's edge cases: 1,000 rows with `id` 0..999 plus ONE row with
  * a NULL `id` — the row the first stride's `… OR id IS NULL` clause
  * must adopt (JdbcSplitSpec proves the planner math; JdbcReadSpec
  * proves the same contract through Spark's executors).
  */
class StubJdbcDriver extends Driver {
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else StubJdbc.newConnection()
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(StubJdbc.UrlPrefix)
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new SQLFeatureNotSupportedException("graft stub JDBC: no parent logger")
}

object StubJdbc {
  val UrlPrefix = "jdbc:graftstub:"
  val Url: String = UrlPrefix + "mem"
  val Table = "people"
  val DriverClassName: String = classOf[StubJdbcDriver].getName

  /** Idempotent DriverManager registration — callers that go through
    * Spark's `driver` option don't need it (Spark instantiates the
    * class by name), but direct `DriverManager.getConnection` users do. */
  private val registered = new AtomicBoolean(false)
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) {
      DriverManager.registerDriver(new StubJdbcDriver)
    }

  // ---------------------------------------------------------------- data

  private[sources] case class ColMeta(name: String, sqlType: Int,
      typeName: String, precision: Int, scale: Int)

  private val PeopleCols = Vector(
    ColMeta("id", Types.BIGINT, "BIGINT", 19, 0),
    ColMeta("name", Types.VARCHAR, "VARCHAR", 255, 0),
    ColMeta("score", Types.DOUBLE, "DOUBLE", 15, 15))

  /** 1,000 keyed rows + the NULL-key row the first stride must adopt. */
  private val PeopleRows: IndexedSeq[Array[AnyRef]] =
    (0 until 1000).map { i =>
      Array[AnyRef](Long.box(i.toLong), s"name_$i", Double.box(i * 0.5))
    } :+ Array[AnyRef](null, "name_null", Double.box(-1.0))

  /** Ground truth for the spec's union/aggregate assertions. */
  private[graft] val RowCount: Long = PeopleRows.length.toLong
  private[graft] val IdSum: Long = (0L until 1000L).sum

  // ------------------------------------------------------------- parsing

  private sealed trait Tok
  private case class TIdent(s: String) extends Tok // bare or "quoted"
  private case class TNum(raw: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TSym(s: String) extends Tok

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val j = sql.indexOf('"', i + 1)
        if (j < 0) throw new SQLException(s"unterminated quoted identifier in: $sql")
        out += TIdent(sql.substring(i + 1, j)); i = j + 1
      } else if (c == '\'') {
        val j = sql.indexOf('\'', i + 1)
        if (j < 0) throw new SQLException(s"unterminated string literal in: $sql")
        out += TStr(sql.substring(i + 1, j)); i = j + 1
      } else if (c.isDigit || (c == '-' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        out += TNum(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += TIdent(sql.substring(start, i))
      } else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (two == ">=" || two == "<=" || two == "<>" || two == "!=") {
          out += TSym(two); i += 2
        } else if ("=<>(),*".indexOf(c) >= 0) {
          out += TSym(c.toString); i += 1
        } else throw new SQLException(s"unexpected character '$c' in: $sql")
      }
    }
    out.result()
  }

  /** Predicate AST over a row; comparisons use SQL three-valued logic
    * collapsed to "UNKNOWN is false" (the only way Spark's generated
    * predicates consume it — NULL keys are routed by explicit IS NULL). */
  private sealed trait Pred { def eval(row: Array[AnyRef]): Boolean }

  private final class Parser(toks: Vector[Tok], colIndex: Map[String, Int],
      sql: String) {
    private var p = 0
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    def next(): Tok = { val t = toks(p); p += 1; t }
    def done: Boolean = p >= toks.length
    private def fail(msg: String): Nothing =
      throw new SQLException(s"graft stub JDBC cannot parse ($msg): $sql")

    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _         => false
    }
    def expectKw(kw: String): Unit =
      if (done || !isKw(next(), kw)) fail(s"expected $kw")

    // expr := term {OR term} ; term := fact {AND fact}
    // fact := '(' expr ')' | operand (IS [NOT] NULL | cmp operand)
    def expr(): Pred = {
      var l = term()
      while (!done && isKw(toks(p), "OR")) { p += 1; val r = term(); l = Or(l, r) }
      l
    }
    private def term(): Pred = {
      var l = fact()
      while (!done && isKw(toks(p), "AND")) { p += 1; val r = fact(); l = And(l, r) }
      l
    }
    private def fact(): Pred = peek match {
      case Some(TSym("(")) =>
        p += 1; val e = expr()
        next() match { case TSym(")") => e; case _ => fail("expected )") }
      case Some(t) if isKw(t, "NOT") =>
        p += 1; val e = fact(); Not(e)
      case _ =>
        val lhs = operand()
        peek match {
          case Some(t) if isKw(t, "IS") =>
            p += 1
            peek match {
              case Some(t2) if isKw(t2, "NOT") =>
                p += 1; expectKw("NULL"); NotNull(lhs)
              case _ => expectKw("NULL"); IsNull(lhs)
            }
          case Some(TSym(op)) if Set(">=", "<=", "<>", "!=", "=", "<", ">")(op) =>
            p += 1; Cmp(lhs, op, operand())
          case other => fail(s"expected comparison, got $other")
        }
    }
    private def operand(): Operand = next() match {
      case TNum(raw) => NumLit(BigDecimal(raw))
      case TStr(s)   => StrLit(s)
      case TIdent(s) =>
        colIndex.get(s.toLowerCase) match {
          case Some(i) => ColRef(i)
          case None    => fail(s"unknown column '$s'")
        }
      case other => fail(s"unexpected operand $other")
    }
  }

  private sealed trait Operand { def value(row: Array[AnyRef]): AnyRef }
  private case class ColRef(i: Int) extends Operand {
    def value(row: Array[AnyRef]): AnyRef = row(i)
  }
  private case class NumLit(v: BigDecimal) extends Operand {
    def value(row: Array[AnyRef]): AnyRef = v
  }
  private case class StrLit(s: String) extends Operand {
    def value(row: Array[AnyRef]): AnyRef = s
  }

  private case class And(l: Pred, r: Pred) extends Pred {
    def eval(row: Array[AnyRef]): Boolean = l.eval(row) && r.eval(row)
  }
  private case class Or(l: Pred, r: Pred) extends Pred {
    def eval(row: Array[AnyRef]): Boolean = l.eval(row) || r.eval(row)
  }
  private case class Not(e: Pred) extends Pred {
    def eval(row: Array[AnyRef]): Boolean = !e.eval(row)
  }
  private case class IsNull(o: Operand) extends Pred {
    def eval(row: Array[AnyRef]): Boolean = o.value(row) == null
  }
  private case class NotNull(o: Operand) extends Pred {
    def eval(row: Array[AnyRef]): Boolean = o.value(row) != null
  }
  private case class Cmp(l: Operand, op: String, r: Operand) extends Pred {
    def eval(row: Array[AnyRef]): Boolean = {
      val a = l.value(row); val b = r.value(row)
      if (a == null || b == null) return false // UNKNOWN → not selected
      val c: Int = (a, b) match {
        case (x: String, y: String) => x.compareTo(y)
        // DOUBLE semantics (r16 advice): a real driver binds the pushed
        // literal to a BINARY DOUBLE before comparing, so `score = 0.1`
        // matches a stored 0.1d. Exact-decimal arithmetic diverges
        // (BigDecimal("0.1") != BigDecimal(0.1d)) and worked here only
        // because the fixture's scores are dyadic (i * 0.5).
        case _ if a.isInstanceOf[java.lang.Double] ||
            b.isInstanceOf[java.lang.Double] =>
          java.lang.Double.compare(toDouble(a), toDouble(b))
        case _ => toBig(a).compare(toBig(b))
      }
      op match {
        case "="          => c == 0
        case "<>" | "!="  => c != 0
        case "<"          => c < 0
        case "<="         => c <= 0
        case ">"          => c > 0
        case ">="         => c >= 0
      }
    }
    private def toDouble(v: AnyRef): Double = v match {
      case d: java.lang.Double  => d.doubleValue
      case d: BigDecimal        => d.toDouble
      case l: java.lang.Long    => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case s: String            => throw new SQLException(s"numeric comparison against string '$s'")
      case other                => throw new SQLException(s"uncomparable value $other")
    }
    private def toBig(v: AnyRef): BigDecimal = v match {
      case d: BigDecimal        => d
      case l: java.lang.Long    => BigDecimal(l.longValue)
      case i: java.lang.Integer => BigDecimal(i.intValue)
      case d: java.lang.Double  => BigDecimal(d.doubleValue)
      case s: String            => throw new SQLException(s"numeric comparison against string '$s'")
      case other                => throw new SQLException(s"uncomparable value $other")
    }
  }

  /** Execute one of Spark's generated SELECT shapes against the table. */
  private[sources] def execute(sql: String): (Vector[ColMeta], IndexedSeq[Array[AnyRef]]) = {
    val toks = lex(sql)
    val colIndex = PeopleCols.map(_.name.toLowerCase).zipWithIndex.toMap
    val ps = new Parser(toks, colIndex, sql)
    ps.expectKw("SELECT")
    // projection list: '*' | items(ident | numeric-literal) ',' …
    val proj = Vector.newBuilder[(ColMeta, Int)] // meta + source index (-1 = literal 1)
    var star = false
    var first = true
    var loop = true
    while (loop) {
      ps.peek match {
        case Some(TIdent(s)) if s.equalsIgnoreCase("FROM") && !first =>
          loop = false
        case Some(TSym(",")) => ps.next()
        case Some(TSym("*")) if first =>
          ps.next(); star = true
        case Some(TIdent(s)) =>
          ps.next()
          val i = colIndex.getOrElse(s.toLowerCase,
            throw new SQLException(s"unknown column '$s' in: $sql"))
          proj += ((PeopleCols(i), i))
        case Some(TNum("1")) =>
          // the all-columns-pruned scan: SELECT 1 FROM t [WHERE …]
          ps.next()
          proj += ((ColMeta("1", Types.INTEGER, "INTEGER", 10, 0), -1))
        case other =>
          throw new SQLException(s"graft stub JDBC cannot parse projection at $other in: $sql")
      }
      first = false
    }
    ps.expectKw("FROM")
    ps.next() match {
      case TIdent(t) if t.equalsIgnoreCase(Table) => ()
      case other => throw new SQLException(s"unknown table $other in: $sql")
    }
    val pred: Option[Pred] = ps.peek match {
      case Some(TIdent(s)) if s.equalsIgnoreCase("WHERE") =>
        ps.next(); Some(ps.expr())
      case None => None
      case other =>
        throw new SQLException(s"graft stub JDBC: trailing tokens at $other in: $sql")
    }
    if (!ps.done) throw new SQLException(s"graft stub JDBC: trailing tokens in: $sql")

    val cols: Vector[(ColMeta, Int)] =
      if (star) PeopleCols.zipWithIndex else proj.result()
    val selected = pred match {
      case Some(pd) => PeopleRows.filter(pd.eval)
      case None     => PeopleRows
    }
    val projected = selected.map { row =>
      cols.map { case (_, i) =>
        if (i < 0) Int.box(1) else row(i)
      }.toArray
    }
    (cols.map(_._1), projected)
  }

  // -------------------------------------------------------------- proxies

  /** Reflective proxy: `handle` covers the methods the Spark scan path
    * uses; void-returning methods it doesn't cover are read-only-safe
    * no-ops (setters, close, cancel); anything else throws with the
    * method name so a changed Spark JDBC path fails diagnosably. */
  private def proxy[T](iface: Class[_])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(classOf[StubJdbcDriver].getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(proxyObj: AnyRef, m: Method, rawArgs: Array[AnyRef]): AnyRef = {
          val args = if (rawArgs == null) Array.empty[AnyRef] else rawArgs
          m.getName match {
            case "toString" => s"graft-stub-${iface.getSimpleName}"
            case "hashCode" => Int.box(System.identityHashCode(proxyObj))
            case "equals"   => Boolean.box(proxyObj eq args(0))
            case name =>
              val key = (name, args)
              if (handle.isDefinedAt(key)) handle(key)
              else if (m.getReturnType == java.lang.Void.TYPE) null // no-op setter/close
              else if (name == "isClosed" || name == "isWrapperFor") Boolean.box(false)
              else if (name == "isValid") Boolean.box(true)
              else if (name == "getWarnings") null
              else throw new UnsupportedOperationException(
                s"graft stub JDBC: ${iface.getSimpleName}.$name not implemented")
          }
        }
      }).asInstanceOf[T]

  private[sources] def newConnection(): Connection = {
    lazy val conn: Connection = proxy[Connection](classOf[Connection]) {
      case ("prepareStatement", args) if args.nonEmpty && args(0).isInstanceOf[String] =>
        newStatement(args(0).asInstanceOf[String], conn)
      case ("createStatement", _) => newStatement(null, conn)
      case ("getMetaData", _)     => dbMeta(conn)
      case ("getAutoCommit", _)   => Boolean.box(true)
      case ("isReadOnly", _)      => Boolean.box(true)
      case ("getTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_NONE)
      case ("getCatalog", _) | ("getSchema", _) => null
    }
    conn
  }

  private def newStatement(presetSql: String, conn: Connection): PreparedStatement = {
    // PreparedStatement extends Statement — one proxy serves both the
    // schema-probe path (prepareStatement + executeQuery()) and any
    // plain-Statement caller (createStatement + executeQuery(sql)).
    proxy[PreparedStatement](classOf[PreparedStatement]) {
      case ("executeQuery", args) =>
        val sql =
          if (args.nonEmpty && args(0).isInstanceOf[String]) args(0).asInstanceOf[String]
          else presetSql
        if (sql == null) throw new SQLException("executeQuery with no SQL")
        val (cols, rows) = execute(sql)
        newResultSet(cols, rows)
      case ("getConnection", _)   => conn
      case ("getFetchSize", _)    => Int.box(0)
      case ("getQueryTimeout", _) => Int.box(0)
      case ("getMaxRows", _)      => Int.box(0)
      case ("getResultSetType", _) => Int.box(ResultSet.TYPE_FORWARD_ONLY)
    }
  }

  private def newResultSet(cols: Vector[ColMeta],
      rows: IndexedSeq[Array[AnyRef]]): ResultSet = {
    var cursor = -1
    var lastWasNull = false
    def cell(i: Int): AnyRef = {
      val v = rows(cursor)(i - 1)
      lastWasNull = v == null
      v
    }
    proxy[ResultSet](classOf[ResultSet]) {
      case ("next", _) =>
        cursor += 1; Boolean.box(cursor < rows.length)
      case ("wasNull", _) => Boolean.box(lastWasNull)
      case ("getMetaData", _) => rsMeta(cols)
      case ("getLong", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null                 => Long.box(0L)
        case l: java.lang.Long    => l
        case i: java.lang.Integer => Long.box(i.longValue)
        case other => throw new SQLException(s"getLong on $other")
      }
      case ("getInt", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null                 => Int.box(0)
        case i: java.lang.Integer => i
        case l: java.lang.Long    => Int.box(l.intValue)
        case other => throw new SQLException(s"getInt on $other")
      }
      case ("getDouble", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null                => Double.box(0.0)
        case d: java.lang.Double => d
        case l: java.lang.Long   => Double.box(l.doubleValue)
        case other => throw new SQLException(s"getDouble on $other")
      }
      case ("getString", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null      => null
        case s: String => s
        case other     => other.toString
      }
      case ("getObject", args) if args.length == 1 =>
        cell(args(0).asInstanceOf[Integer])
      case ("findColumn", args) =>
        val label = args(0).asInstanceOf[String]
        val i = cols.indexWhere(_.name.equalsIgnoreCase(label))
        if (i < 0) throw new SQLException(s"no column '$label'")
        Int.box(i + 1)
      case ("getType", _) => Int.box(ResultSet.TYPE_FORWARD_ONLY)
      case ("isBeforeFirst", _) => Boolean.box(cursor < 0)
      case ("isAfterLast", _)   => Boolean.box(cursor >= rows.length)
    }
  }

  private def rsMeta(cols: Vector[ColMeta]): ResultSetMetaData = {
    def at(args: Array[AnyRef]): ColMeta = cols(args(0).asInstanceOf[Integer] - 1)
    proxy[ResultSetMetaData](classOf[ResultSetMetaData]) {
      case ("getColumnCount", _)        => Int.box(cols.length)
      case ("getColumnLabel", args)     => at(args).name
      case ("getColumnName", args)      => at(args).name
      case ("getColumnType", args)      => Int.box(at(args).sqlType)
      case ("getColumnTypeName", args)  => at(args).typeName
      case ("getPrecision", args)       => Int.box(at(args).precision)
      case ("getScale", args)           => Int.box(at(args).scale)
      case ("isSigned", _)              => Boolean.box(true)
      case ("isNullable", _)            => Int.box(ResultSetMetaData.columnNullable)
      case ("isCaseSensitive", _)       => Boolean.box(false)
      case ("isAutoIncrement", _)       => Boolean.box(false)
      case ("isCurrency", _)            => Boolean.box(false)
      case ("isSearchable", _)          => Boolean.box(true)
      case ("isReadOnly", _)            => Boolean.box(true)
      case ("isWritable", _) | ("isDefinitelyWritable", _) => Boolean.box(false)
      case ("getColumnDisplaySize", args) => Int.box(at(args).precision)
      case ("getCatalogName", _) | ("getSchemaName", _) | ("getTableName", _) => ""
      case ("getColumnClassName", args) => at(args).sqlType match {
        case Types.BIGINT  => classOf[java.lang.Long].getName
        case Types.INTEGER => classOf[java.lang.Integer].getName
        case Types.DOUBLE  => classOf[java.lang.Double].getName
        case _             => classOf[String].getName
      }
    }
  }

  private def dbMeta(conn: Connection): DatabaseMetaData =
    proxy[DatabaseMetaData](classOf[DatabaseMetaData]) {
      case ("getURL", _)                  => Url
      case ("getUserName", _)             => "graft"
      case ("getDriverName", _)           => "graft-stub-jdbc"
      case ("getDriverVersion", _)        => "1.0"
      case ("getDriverMajorVersion", _)   => Int.box(1)
      case ("getDriverMinorVersion", _)   => Int.box(0)
      case ("getDatabaseProductName", _)  => "GraftStub"
      case ("getDatabaseProductVersion", _) => "1.0"
      case ("getJDBCMajorVersion", _)     => Int.box(4)
      case ("getJDBCMinorVersion", _)     => Int.box(2)
      case ("getDatabaseMajorVersion", _) => Int.box(1)
      case ("getDatabaseMinorVersion", _) => Int.box(0)
      case ("getIdentifierQuoteString", _) => "\""
      case ("supportsTransactions", _)    => Boolean.box(false)
      case ("supportsMixedCaseIdentifiers", _) => Boolean.box(false)
      case ("storesUpperCaseIdentifiers", _) | ("storesLowerCaseIdentifiers", _) |
           ("storesMixedCaseIdentifiers", _) => Boolean.box(false)
      case ("getConnection", _)           => conn
      case ("getSQLKeywords", _)          => ""
    }
}
