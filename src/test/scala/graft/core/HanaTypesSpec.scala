package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class HanaTypesSpec extends AnyFunSuite {

  val all21 = Seq(
    "NVARCHAR", "VARCHAR", "ALPHANUM", "SHORTTEXT", "BLOB", "CLOB", "NCLOB",
    "TEXT", "VARBINARY", "INTEGER", "DATE", "TIME", "DATETIME", "BOOLEAN",
    "TINYINT", "SMALLINT", "BIGINT", "SMALLDECIMAL", "DECIMAL", "DOUBLE", "REAL")

  test("all 21 reference types are mapped (HanaToBQ.java:59-81)") {
    all21.foreach { t => HanaTypes.toSpark(t) } // must not throw
    assert(HanaTypes.mapping(HanaTypes.RefCompatible).size == 21)
  }

  test("int widths collapse to 64-bit (HanaToBQ.java:69,74-76)") {
    Seq("TINYINT", "SMALLINT", "INTEGER", "BIGINT").foreach { t =>
      assert(HanaTypes.toSpark(t) == LongType)
    }
  }

  test("ref-compatible DECIMAL lanes are lossy doubles; lossless mode keeps decimal") {
    assert(HanaTypes.toSpark("DECIMAL") == DoubleType)
    assert(HanaTypes.toSpark("DECIMAL", HanaTypes.Lossless).isInstanceOf[DecimalType])
    assert(HanaTypes.toSpark("BLOB") == StringType)
    assert(HanaTypes.toSpark("BLOB", HanaTypes.Lossless) == BinaryType)
  }

  test("unmapped type is a hard failure (HanaToBQ.java:129-132)") {
    Seq("TIMESTAMP", "SECONDDATE", "ST_GEOMETRY", "ARRAY").foreach { t =>
      val e = intercept[IllegalArgumentException](HanaTypes.toSpark(t))
      assert(e.getMessage.contains("Unhandled Hana type"))
    }
  }

  test("case-insensitive lookup, VARBINARY is the only bytes lane") {
    assert(HanaTypes.toSpark("varbinary") == BinaryType)
    assert(HanaTypes.mapping(HanaTypes.RefCompatible).count(_._2 == BinaryType) == 1)
  }

  test("schemaFor preserves catalog position order (HanaToBQ.java:111-119)") {
    val s = HanaTypes.schemaFor(Seq("b" -> "BIGINT", "a" -> "NVARCHAR"))
    assert(s.fieldNames.toSeq == Seq("b", "a"))
    assert(s.fields(0).dataType == LongType)
  }
}
