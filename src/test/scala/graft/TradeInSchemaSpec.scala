package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TradeInSchema

/** The 44-column schema pair and the staging→target cast map (P3,
  * rqtradein_etl.py:43-145). */
class TradeInSchemaSpec extends AnyFunSuite {
  import TestSpark._

  test("staging schema: 44 string columns + audit timestamp") {
    val s = TradeInSchema.stagingSchema
    assert(s.fields.length == 45)
    assert(s.fields.init.forall(_.dataType == StringType))
    assert(s("ETLRowInsertedEST").dataType == TimestampType)
  }

  test("target schema: types match the reference DDL") {
    val t = TradeInSchema.targetSchema
    assert(t.fields.length == 46)
    assert(t("SaleInvoiceID").dataType == IntegerType)
    assert(t("TradeInDate").dataType == TimestampType)
    assert(t("PhoneRebateAmount").dataType == DecimalType(18, 2))
    assert(t("ManufacturerModel").dataType == StringType)
    assert(t("ETLRowUpdatedEST").dataType == TimestampType)
  }

  test("toTyped casts every column class; garbage numerics go null") {
    val vals = TradeInSchema.columns.map {
      case "SaleInvoiceID"  => "123"
      case "ItemID"         => "not-a-number"      // int garbage → null
      case "TradeInDate"    => "2024-01-02T03:04:05.5Z"
      case "PostTime"       => "2024-01-02 03:04:05"
      case "TradeInAmount"  => "99.95"
      case "PromoValue"     => "cheap"             // decimal garbage → null
      case "SequenceNumber" => "7"
      case other            => s"v-$other"
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row.fromSeq(vals)), 1),
      StructType(TradeInSchema.columns.map(c => StructField(c, StringType))))
    val row = TradeInSchema.toTyped(df).head()
    val get = (c: String) => row.get(row.fieldIndex(c))
    assert(get("SaleInvoiceID") == 123)
    assert(get("ItemID") == null)
    assert(get("SequenceNumber") == 7)
    assert(get("TradeInAmount") == new java.math.BigDecimal("99.95"))
    assert(get("PromoValue") == null)
    assert(get("TradeInDate").toString == "2024-01-02 03:04:05.5")
    assert(get("PostTime").toString == "2024-01-02 03:04:05.0")
    assert(get("ManufacturerModel") == "v-ManufacturerModel")
  }
}
