package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Timestamps

/** The reference's 44-column trade-in schema pair (SURVEY.md §2.2 P3):
  * an all-VARCHAR *staging* shape (reference DDL at
  * rqtradein_etl.py:43-89) and a typed *target* shape
  * (rqtradein_etl.py:98-145), plus the explicit staging→target cast map.
  *
  * The reference's data model is "strings first, types later": the API
  * payload lands in staging with every column VARCHAR(255); typing happens
  * once, on the staging→target hop. Re-expressed for Spark that is a
  * `StructType` of `StringType` columns and a single typed projection —
  * one narrow `select` of codegen'd casts, no UDFs, no shuffle.
  *
  * Target SQL-Server types map as: INT → IntegerType, VARCHAR(n) →
  * StringType, DATETIME → TimestampType, DECIMAL(18,2) →
  * DecimalType(18,2).
  */
object TradeInSchema {

  /** The 44 data columns in the reference's staging-DDL order
    * (rqtradein_etl.py:44-87 — also the bulk-insert column list at
    * :232-237 and the MERGE column list at :153-159, reordered). */
  val columns: Seq[String] = Seq(
    "SaleInvoiceID", "TradeInTransactionID", "InvoiceIDByStore",
    "InvoiceID", "TradeInStatus", "ItemID", "ManufacturerModel",
    "SerialNumber", "StoreName", "RegionName", "TradeInDate",
    "TradeInDateEST", "PhoneRebateAmount", "PromotionValue",
    "PreDeviceValueAmount", "PrePromotionValueAmount", "TrackingNumber",
    "OriginalTradeInvoiceID", "OrderNumber", "CreditApplicationNum",
    "LocationCode", "MasterOrderNumber", "SequenceNumber", "PromoValue",
    "OrganicPrice", "ComputedPrice", "TradeInMobileNumber", "SubmissionId",
    "TradeInEquipMake", "TradeInEquipCarrier", "DeviceSku",
    "TradeInDeviceId", "LobType", "OrderType", "PurchaseDeviceId",
    "TradeInAmount", "AmountUsed", "AmountPending", "PromoCompletion",
    "PostTime", "PostTimeEST", "ResponseTime", "ResponseTimeEST",
    "MobileNumber")

  /** Audit columns (reference: ETLRowInsertedEST DATETIME DEFAULT GETDATE()
    * on both tables, ETLRowUpdatedEST on target only). */
  val insertedCol = "ETLRowInsertedEST"
  val updatedCol  = "ETLRowUpdatedEST"

  /** Columns derived during staging, not present in the raw API payload
    * (rqtradein_etl.py:324-335). */
  val derivedEstCols: Seq[String] = Seq("TradeInDateEST", "PostTimeEST", "ResponseTimeEST")
  /** Raw API timestamp columns and the EST column each derives. */
  val tsPairs: Seq[(String, String)] = Seq(
    "TradeInDate" -> "TradeInDateEST",
    "PostTime"    -> "PostTimeEST",
    "ResponseTime" -> "ResponseTimeEST")
  /** The 41 columns the API payload itself carries. */
  val rawColumns: Seq[String] = columns.filterNot(derivedEstCols.contains)

  val intCols: Set[String] = Set(
    "SaleInvoiceID", "TradeInTransactionID", "ItemID", "SequenceNumber")
  val decimalCols: Set[String] = Set(
    "PhoneRebateAmount", "PromotionValue", "PreDeviceValueAmount",
    "PrePromotionValueAmount", "PromoValue", "OrganicPrice",
    "ComputedPrice", "TradeInAmount", "AmountUsed", "AmountPending")
  val timestampCols: Set[String] = Set(
    "TradeInDate", "TradeInDateEST", "PostTime", "PostTimeEST",
    "ResponseTime", "ResponseTimeEST")

  /** Target type per data column (reference target DDL
    * rqtradein_etl.py:98-145; VARCHAR length caps collapse to String). */
  def targetType(name: String): DataType =
    if (intCols(name)) IntegerType
    else if (decimalCols(name)) DecimalType(18, 2)
    else if (timestampCols(name)) TimestampType
    else StringType

  /** All-VARCHAR staging schema + audit timestamp (rqtradein_etl.py:43-89). */
  val stagingSchema: StructType = StructType(
    columns.map(c => StructField(c, StringType)) :+
      StructField(insertedCol, TimestampType))

  /** Typed target schema + both audit timestamps (rqtradein_etl.py:98-145). */
  val targetSchema: StructType = StructType(
    columns.map(c => StructField(c, targetType(c))) ++ Seq(
      StructField(insertedCol, TimestampType),
      StructField(updatedCol, TimestampType)))

  /** The staging→target cast of one string column. Timestamps go through
    * the multi-format parser (F2) because staging holds the normalized
    * string forms; ints and decimals use `try_cast` — null on garbage
    * even under ANSI mode (Spark 4's default, where a plain cast throws),
    * matching the reference's fail-soft posture. */
  def castColumn(name: String): Column = targetType(name) match {
    case TimestampType      => Timestamps.parseTimestamp(col(name)).as(name)
    case t: DecimalType     => expr(s"try_cast($name AS ${t.sql})").as(name)
    case IntegerType        => expr(s"try_cast($name AS INT)").as(name)
    case _                  => col(name).as(name)
  }

  /** P3: the whole staging→target typed projection. Keeps any audit
    * columns present; purely per-row, stays in whole-stage codegen. */
  def toTyped(staging: DataFrame): DataFrame = {
    val audit = staging.columns.filter(c => c == insertedCol || c == updatedCol)
      .map(c => col(c)).toSeq
    staging.select(columns.map(castColumn) ++ audit: _*)
  }
}
