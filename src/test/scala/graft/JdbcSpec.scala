package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

class JdbcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  private def tmpDb(): String =
    Files.createTempDirectory("graft-jdbc").toString + "/db"

  test("IntegerSplitter split points: interval semantics match the reference") {
    // splitSize = (5-0)/2 = 2 -> boundaries 0,2,4 then close at max
    assert(Jdbc.integerSplitPoints(2, 0, 5) == Seq(0L, 2L, 4L, 5L))
    // even division ends exactly on max
    assert(Jdbc.integerSplitPoints(3, 0, 6) == Seq(0L, 2L, 4L, 6L))
    // min == max degenerates to one closed interval
    assert(Jdbc.integerSplitPoints(4, 7, 7) == Seq(7L, 7L))
    // splitSize floors at 1
    assert(Jdbc.integerSplitPoints(10, 0, 3) == Seq(0L, 1L, 2L, 3L))
  }

  test("split predicates: open intervals, closed last, reference clause format") {
    val preds = Jdbc.integerSplitPredicates("id", 2, 0, 5)
    assert(preds == Seq(
      "( id >= 0 ) AND ( id < 2 )",
      "( id >= 2 ) AND ( id < 4 )",
      "( id >= 4 ) AND ( id <= 5 )"))
  }

  test("DBOutputFormat.constructQuery parity") {
    assert(Jdbc.constructInsertQuery("pageview", Array("url", "pageview")) ==
      "INSERT INTO pageview (url,pageview) VALUES (?,?);")
    // unknown field names: array of nulls -> no column list
    assert(Jdbc.constructInsertQuery("t", Array[String](null, null)) ==
      "INSERT INTO t VALUES (?,?);")
    intercept[IllegalArgumentException] {
      Jdbc.constructInsertQuery("t", null)
    }
  }

  test("Derby roundtrip: write, bounding query, partitioned read") {
    val url = Jdbc.derbyUrl(tmpDb())
    val df = spark.range(100).select(
      col("id").as("ID"),
      concat(lit("row"), col("id")).as("V"))
    Jdbc.write(df, url, "T_ROUNDTRIP",
      columnTypes = Some("V VARCHAR(32)"))

    assert(Jdbc.boundingVals(url, "T_ROUNDTRIP", "ID") == Some((0L, 99L)))

    val back = Jdbc.readPartitioned(spark, url, "T_ROUNDTRIP", "ID", numSplits = 3)
    // one Spark partition per DataDrivenDBInputSplit predicate
    assert(back.rdd.getNumPartitions == 3)
    assert(back.select(col("ID"), col("V")).as[(Long, String)].collect().toSet ==
      (0L until 100L).map(i => (i, s"row$i")).toSet)
  }

  test("TextSplitter mapping is order-preserving and invertible on prefixes") {
    val words = Seq("Ham", "Happy", "Haze", "alpha", "omega", "zebra")
    val mapped = words.map(Jdbc.stringToBigDecimal)
    assert(mapped == mapped.sorted, "base-65536 mapping must preserve order")
    // roundtrip through the decimal space reproduces the string (<=8 chars)
    words.foreach { w =>
      assert(Jdbc.bigDecimalToString(Jdbc.stringToBigDecimal(w)) == w)
    }
  }

  test("text split predicates cover the range with the user bounds pinned") {
    val preds = Jdbc.textSplitPredicates("name", 3, "Ham", "Haze")
    // shared prefix "Ha" stays on every interpolated bound
    assert(preds.nonEmpty && preds.forall(_.contains("name >= 'Ha")))
    assert(preds.head.contains("( name >= 'Ham' )"))
    assert(preds.last.contains("name <= 'Haze'"))
    assert(preds.init.forall(_.contains("<")), "interior intervals are half-open")
  }

  test("partitioned text read over Derby: complete and disjoint") {
    val url = Jdbc.derbyUrl(tmpDb())
    val df = spark.range(200).select(
      concat(lit("name"), lpad(col("id").cast("string"), 3, "0")).as("NAME"),
      col("id").as("ID"))
    Jdbc.write(df, url, "T_TEXT", columnTypes = Some("NAME VARCHAR(16)"))
    val back = Jdbc.readPartitionedText(spark, url, "T_TEXT", "NAME", 4)
    assert(back.rdd.getNumPartitions >= 2, "text splits should fan out")
    assert(back.count() == 200, "intervals must be disjoint (no duplicates)")
    assert(back.select(col("ID")).as[Long].collect().toSet == (0L until 200L).toSet)
  }

  test("BigDecimal split points mirror the integer splitter's tail rule") {
    def bd(i: Int) = new java.math.BigDecimal(i)
    val pts = Jdbc.bigDecimalSplitPoints(2, bd(0), bd(5))
    assert(pts.map(_.intValue()) == Seq(0, 2, 5) ||
      pts.map(_.doubleValue()).last == 5.0)
    assert(pts.head == bd(0) && pts.last.compareTo(bd(5)) == 0)
  }

  test("FloatSplitter predicates: interval semantics match the reference") {
    // splitSize = (3-0)/3 = 1.0; half-open intervals, closed last
    assert(Jdbc.floatSplitPredicates("v", 3, Some(0.0), Some(3.0)) == Seq(
      "( v >= 0.0 ) AND ( v < 1.0 )",
      "( v >= 1.0 ) AND ( v < 2.0 )",
      "( v >= 2.0 ) AND ( v <= 3.0 )"))
    // min == max: MIN_INCREMENT guard -> one closed interval
    assert(Jdbc.floatSplitPredicates("v", 4, Some(1.5), Some(1.5)) ==
      Seq("( v >= 1.5 ) AND ( v <= 1.5 )"))
    // one NULL extremum: rs.getDouble reads the null end as 0.0 and a
    // NULL split is appended (FloatSplitter.java:96-100)
    val withNull = Jdbc.floatSplitPredicates("v", 2, None, Some(2.0))
    assert(withNull.head.startsWith("( v >= 0.0 )"))
    assert(withNull.last == "( v IS NULL ) AND ( v IS NULL )")
    // both NULL: only the null split
    assert(Jdbc.floatSplitPredicates("v", 2, None, None) ==
      Seq("( v IS NULL ) AND ( v IS NULL )"))
  }

  test("BooleanSplitter: one split per truth value in [min,max], null handling") {
    assert(Jdbc.booleanSplitPredicates("b", Some(false), Some(true)) == Seq(
      "( b = FALSE ) AND ( b = FALSE )", "( b = TRUE ) AND ( b = TRUE )"))
    assert(Jdbc.booleanSplitPredicates("b", Some(true), Some(true)) ==
      Seq("( b = TRUE ) AND ( b = TRUE )"))
    assert(Jdbc.booleanSplitPredicates("b", Some(false), Some(false)) ==
      Seq("( b = FALSE ) AND ( b = FALSE )"))
    assert(Jdbc.booleanSplitPredicates("b", None, None) ==
      Seq("( b IS NULL ) AND ( b IS NULL )"))
    // one NULL extremum: getBoolean reads it as false -> FALSE split,
    // plus the NULL split (BooleanSplitter.java:63-67)
    assert(Jdbc.booleanSplitPredicates("b", None, Some(true)) == Seq(
      "( b = FALSE ) AND ( b = FALSE )", "( b = TRUE ) AND ( b = TRUE )",
      "( b IS NULL ) AND ( b IS NULL )"))
  }

  test("DateSplitter predicates: epoch-long intervals with quoted JDBC literals") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val preds = Jdbc.dateSplitPredicates("d", 2,
      Some(ts("2020-01-01 00:00:00")), Some(ts("2020-01-01 00:00:04")))
    assert(preds == Seq(
      "( d >= '2020-01-01 00:00:00.0' ) AND ( d < '2020-01-01 00:00:02.0' )",
      "( d >= '2020-01-01 00:00:02.0' ) AND ( d <= '2020-01-01 00:00:04.0' )"))
    // bound nanos survive on the outermost literals (DateSplitter.java:84-105)
    val lo = ts("2020-01-01 00:00:00"); lo.setNanos(123456789)
    val hi = ts("2020-01-01 00:00:04"); hi.setNanos(987654321)
    val np = Jdbc.dateSplitPredicates("d", 1, Some(lo), Some(hi))
    assert(np == Seq(
      "( d >= '2020-01-01 00:00:00.123456789' ) AND ( d <= '2020-01-01 00:00:04.987654321' )"))
    // DATE type renders date-only literals
    val dp = Jdbc.dateSplitPredicates("d", 1,
      Some(ts("2020-01-01 00:00:00")), Some(ts("2020-01-03 00:00:00")),
      java.sql.Types.DATE)
    assert(dp == Seq("( d >= '2020-01-01' ) AND ( d <= '2020-01-03' )"))
    // NULL-to-NULL: single IS NULL split
    assert(Jdbc.dateSplitPredicates("d", 3, None, None) ==
      Seq("( d IS NULL ) AND ( d IS NULL )"))
    // exactly ONE NULL extremum: a one-sided interval + the IS NULL
    // split — complete coverage with no Long.MinValue sentinel (which
    // used to overflow the splitter into a ~2^63-iteration loop for the
    // NULL-minimum direction and render a year-292278994 literal)
    assert(Jdbc.dateSplitPredicates("d", 3, Some(ts("2020-01-01 00:00:00")), None) ==
      Seq("( d >= '2020-01-01 00:00:00.0' ) AND ( d >= '2020-01-01 00:00:00.0' )",
        "( d IS NULL ) AND ( d IS NULL )"))
    assert(Jdbc.dateSplitPredicates("d", 3, None, Some(ts("2020-01-01 00:00:00"))) ==
      Seq("( d <= '2020-01-01 00:00:00.0' ) AND ( d <= '2020-01-01 00:00:00.0' )",
        "( d IS NULL ) AND ( d IS NULL )"))
    // direct splitter calls with sentinel-wide ranges still terminate
    assert(Jdbc.integerSplitPoints(3, Long.MinValue, 0L) == Seq(Long.MinValue, 0L))
    // ...and near Long.MaxValue the loop counter must not wrap forever
    val top = Jdbc.integerSplitPoints(2, Long.MaxValue - 3, Long.MaxValue - 1)
    assert(top.head == Long.MaxValue - 3 && top.last == Long.MaxValue - 1 &&
      top.size <= 4, s"wrapped walk: $top")
  }

  test("Oracle dialect: TO_TIMESTAMP split literals and ROWNUM pagination") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // OracleDateSplitter renders every boundary as TO_TIMESTAMP(...)
    // with the same interval arithmetic as the portable DateSplitter
    val preds = Jdbc.oracleDateSplitPredicates("d", 2,
      Some(ts("2020-01-01 00:00:00")), Some(ts("2020-01-01 00:00:04")))
    assert(preds == Seq(
      "( d >= TO_TIMESTAMP('2020-01-01 00:00:00.0', 'YYYY-MM-DD HH24:MI:SS.FF') ) AND " +
        "( d < TO_TIMESTAMP('2020-01-01 00:00:02.0', 'YYYY-MM-DD HH24:MI:SS.FF') )",
      "( d >= TO_TIMESTAMP('2020-01-01 00:00:02.0', 'YYYY-MM-DD HH24:MI:SS.FF') ) AND " +
        "( d <= TO_TIMESTAMP('2020-01-01 00:00:04.0', 'YYYY-MM-DD HH24:MI:SS.FF') )"))
    // getSplitter routing: date-ish types -> Oracle lane, others refuse
    // (they take the dialect-independent portable splitters)
    assert(Jdbc.oracleSplitPredicates("d", 1, java.sql.Types.DATE,
      Some(ts("2020-01-01 00:00:00")), Some(ts("2020-01-02 00:00:00"))).size == 1)
    intercept[IllegalArgumentException] {
      Jdbc.oracleSplitPredicates("d", 1, java.sql.Types.INTEGER, None, None)
    }
    // OracleDBRecordReader.getSelectQuery's double-nested ROWNUM wrapper,
    // byte-for-byte (OracleDBRecordReader.java:86-93)
    assert(Jdbc.oracleRowRangeQuery("SELECT A, B FROM T WHERE C > 0", 10, 5) ==
      "SELECT * FROM (SELECT a.*,ROWNUM dbif_rno FROM ( SELECT A, B FROM T WHERE C > 0 ) a " +
        "WHERE rownum <= 10 + 5 ) WHERE dbif_rno >= 10")
  }

  test("partitioned date read over Derby: complete and disjoint") {
    val url = Jdbc.derbyUrl(tmpDb())
    val df = spark.range(96).select(
      col("id").as("ID"),
      expr("timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2021-06-01 00:00:00')")
        .as("TS"))
    Jdbc.write(df, url, "T_DATE")
    val back = Jdbc.readPartitionedDate(spark, url, "T_DATE", "TS", 4)
    assert(back.rdd.getNumPartitions >= 3, "date splits should fan out")
    assert(back.select(col("ID")).as[Long].collect().toSet ==
      (0L until 96L).toSet, "intervals must cover all rows exactly once")
  }

  test("partitioned float read over Derby: complete and disjoint") {
    val url = Jdbc.derbyUrl(tmpDb())
    val df = spark.range(100).select(
      col("id").as("ID"), (col("id") / 10.0).as("V"))
    Jdbc.write(df, url, "T_FLOAT")
    val back = Jdbc.readPartitionedFloat(spark, url, "T_FLOAT", "V", 4)
    assert(back.rdd.getNumPartitions >= 3, "float splits should fan out")
    assert(back.select(col("ID")).as[Long].collect().toSet ==
      (0L until 100L).toSet, "intervals must cover all rows exactly once")
  }

  test("partitioned read with conditions (getInputConditions analog)") {
    val url = Jdbc.derbyUrl(tmpDb())
    val df = spark.range(50).select(col("id").as("ID"), (col("id") % 5).as("K"))
    Jdbc.write(df, url, "T_COND")
    val filtered = Jdbc.readPartitioned(spark, url, "T_COND", "ID", 2, Some("K = 3"))
    assert(filtered.count() == 10)
    assert(filtered.select(max(col("K"))).as[Long].head() == 3L)
  }

  test("empty table degrades to a single unpartitioned read") {
    val url = Jdbc.derbyUrl(tmpDb())
    val df = spark.range(1).select(col("id").as("ID")).where(lit(false))
    Jdbc.write(df, url, "T_EMPTY")
    assert(Jdbc.boundingVals(url, "T_EMPTY", "ID").isEmpty)
    assert(Jdbc.readPartitioned(spark, url, "T_EMPTY", "ID", 4).count() == 0)
  }
}
