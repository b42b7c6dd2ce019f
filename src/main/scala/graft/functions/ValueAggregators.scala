package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The aggregate framework's string-driven plugin surface.
  *
  * Reference grammar (ValueAggregatorBaseDescriptor.java:39-117): an
  * aggregation is named by type string — LongValueSum, DoubleValueSum,
  * LongValueMax/Min, StringValueMax/Min, UniqValueCount, ValueHistogram —
  * dispatched case-insensitively by `generateValueAggregator`; user
  * classes load by name through `UserDefinedValueAggregatorDescriptor`
  * (UserDefinedValueAggregatorDescriptor.java:41-79, reflective no-arg
  * construction).
  *
  * Here a descriptor is `"<Type>:<column>[:<param>]"`, or
  * `"UserDefined,<className>:<column>"` where the class implements
  * [[UserAggregatorDescriptor]]. Every descriptor becomes one column of
  * a single groupBy — the whole set runs as ONE partial+final hash
  * aggregate (the reference runs the same plugins inside its
  * combiner/reducer; Spark's map-side partial is that combiner).
  */
trait UserAggregatorDescriptor {
  def name: String
  def column(c: Column): Column
}

/** Example user descriptors (the AggregateWordHistogram pattern —
  * reference: hadoop-mapreduce-examples/.../AggregateWordHistogram.java:38-55,
  * a user class plugged in by name): exact fixed-point min/max, types the
  * built-in descriptor set lacks.
  */
class DecimalMinDescriptor extends UserAggregatorDescriptor {
  def name: String = "DecimalMin"
  def column(c: Column): Column =
    min(c.cast(org.apache.spark.sql.types.DecimalType(18, 2)))
}

class DecimalMaxDescriptor extends UserAggregatorDescriptor {
  def name: String = "DecimalMax"
  def column(c: Column): Column =
    max(c.cast(org.apache.spark.sql.types.DecimalType(18, 2)))
}

object ValueAggregators {

  /** Descriptor string -> (output column name, aggregation column). */
  def parse(desc: String): (String, Column) =
    if (desc.startsWith("UserDefined,")) {
      // "UserDefined,<className>:<column>" — reflective class loading
      val rest = desc.stripPrefix("UserDefined,")
      val Array(clsName, colName) = rest.split(":", 2)
      val inst = Class.forName(clsName).getDeclaredConstructor()
        .newInstance().asInstanceOf[UserAggregatorDescriptor]
      (s"${inst.name}_$colName", inst.column(col(colName)))
    } else {
      val parts = desc.split(":")
      require(parts.length >= 2, s"descriptor needs <Type>:<column>, got: $desc")
      val (tpe, c) = (parts(0), parts(1))
      val agg = tpe.toLowerCase match {
        case "longvaluesum"   => sum(col(c).cast("long"))
        case "doublevaluesum" => sum(col(c).cast("double"))
        case "longvaluemax"   => max(col(c).cast("long"))
        case "longvaluemin"   => min(col(c).cast("long"))
        case "stringvaluemax" => max(col(c).cast("string"))
        case "stringvaluemin" => min(col(c).cast("string"))
        case "uniqvaluecount" => parts.lift(2) match {
          // optional cap ≙ mapreduce.aggregate.max.num.unique.values;
          // the capped lane stringifies the value like the reference
          // (UniqValueCount.java:59 keys its TreeMap by val.toString()),
          // so ANY column type caps faithfully
          case Some(cap) =>
            Aggregators.cappedDistinctString(col(c).cast("string"), cap.toInt)
          case None      => countDistinct(col(c))
        }
        case "valuehistogram" => Aggregators.valueHistogram(col(c))
        case other =>
          throw new IllegalArgumentException(s"unknown aggregator type: $other")
      }
      (s"${tpe}_${parts.drop(1).mkString("_")}", agg)   // param-qualified: cap variants stay distinct
    }

  /** One groupBy over all descriptors — the ValueAggregatorJob analog
    * (mapreduce/lib/aggregate/ValueAggregatorJob.java): group key +
    * one aggregated column per descriptor.
    */
  def aggregate(df: DataFrame, keyCol: String, descriptors: Seq[String]): DataFrame = {
    require(descriptors.nonEmpty, "need at least one descriptor")
    val cols = descriptors.map(parse).map { case (name, c) => c.as(name) }
    df.groupBy(col(keyCol)).agg(cols.head, cols.tail: _*)
  }
}
