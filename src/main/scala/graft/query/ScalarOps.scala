package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine.quantized

/** Remaining scalar/shape operators from SURVEY.md §2 B/C — each a pure
  * column expression (whole-stage codegen), each with a transliterated
  * DuckDB oracle in SparkEntry.
  */
object ScalarOps {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** B4: fixed-point ×10⁷ amount formatting (amount.String analog —
    * stroops → "x.xxxxxxx", operation_factory.go:137).
    */
  def fixedPoint(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        format_string("%d.%07d",
          floor((col("l_orderkey") * 10000000L + col("l_partkey")) / 10000000L).cast("long"),
          (col("l_orderkey") * 10000000L + col("l_partkey")) % 10000000L).as("amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** B5: rational {n,d} → double price (big.Rat.Float64 analog,
    * operation_factory.go:204-205) — keeps n,d alongside the division.
    */
  def rationalPrice(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        (col("l_partkey") + 1).as("n"), (col("l_suppkey") + 1).as("d"),
        quantized(((col("l_partkey") + 1).cast("double")) / ((col("l_suppkey") + 1).cast("double"))).as("price_q"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** B8: nullable-struct assembly (NewAccountThresholds analog,
    * es/account_thresholds.go:14-41) — struct present iff ≥1 field set;
    * flattened for the cross-engine compare.
    */
  def nullableStruct(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events")
    val lo = when(col("value") > 25, col("value"))
    val hi = when(col("value") > 75, col("value"))
    val thr = when(lo.isNotNull || hi.isNotNull,
      struct(quantized(lo).as("low"), quantized(hi).as("high")))
    e.select(col("event_id"),
        thr.isNotNull.as("has_thresholds"),
        thr.getField("low").as("low_q"),
        thr.getField("high").as("high_q"))
      .orderBy(col("event_id"))
  }

  /** B9: synthetic id from parts (NewAsset analog, es/asset.go:17-32):
    * native branch vs `code + "-" + issuer` concat.
    */
  def assetId(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        when(col("p_partkey") % 10 === 0, lit("native"))
          .otherwise(concat_ws("-", col("p_brand"), col("p_type"))).as("asset_id"))
      .orderBy(col("p_partkey"))

  /** B11: success predicate (fee-bump-aware code check analog,
    * es/transaction.go:38-43) + C10 success gating: downstream rows only
    * for successful parents.
    */
  def successGate(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("successful", col("event_type") =!= "error" && col("value") >= 1.0)
      .filter(col("successful"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"), quantized(sum(col("value"))).as("sum_q"))
      .orderBy(col("event_type"))

  /** B12: epoch↔timestamp conversion (time.Unix analog, ledger_header.go:39). */
  def epochTs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(timestamp_seconds(unix_timestamp(col("o_orderdate"))), "yyyy-MM-dd HH:mm:ss").as("roundtrip"))
      .orderBy(col("o_orderkey"))

  /** C4/C5: N-way type dispatch with per-type projections (assignSpecifics
    * 16-way switch analog, operation_factory.go:100-134) — one typed value
    * column per branch over the 5 event types.
    */
  def typeDispatch(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        when(col("event_type") === "click", quantized(col("value") * 2))
          .when(col("event_type") === "view", quantized(col("value") / 2))
          .when(col("event_type") === "purchase", quantized(col("value") * 100))
          .when(col("event_type") === "signup", lit(1L))
          .otherwise(lit(-1L)).as("typed_value"),
        when(col("event_type").isin("click", "view"), col("user_id"))
          .otherwise(lit(null)).as("actor"))
      .orderBy(col("event_id"))

  /** C7: double fan-out — each source row emits 2 mirrored rows
    * (seller/buyer views with reciprocal price, ÷0 guarded → "0.0";
    * es/trade_extractor.go:136-187).
    */
  def mirrorFanout(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem").filter(col("l_orderkey") < 100)
    val price = col("l_extendedprice")
    val sold = col("l_quantity")
    li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        explode(array(
          struct(lit("seller").as("side"),
            when(sold =!= 0, quantized(price / sold)).otherwise(lit(0L)).as("px_q")),
          struct(lit("buyer").as("side"),
            when(price =!= 0, quantized(sold / price)).otherwise(lit(0L)).as("px_q"))
        )).as("leg"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("leg.side").as("side"), col("leg.px_q").as("px_q"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("side"))
  }
}
