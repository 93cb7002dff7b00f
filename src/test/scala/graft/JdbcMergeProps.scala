package graft

import java.util.Locale

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sink.JdbcMerge

/** ScalaCheck properties for the auto-evolve diff (C4) — the seam that
  * decides, every micro-batch, whether the sink table needs DDL. The
  * directed JdbcMergeSpec cases pin known shapes; these generate RANDOM
  * schemas, widenings, and metadata decorations and require the
  * Connect-sink contract to hold on all of them:
  *
  *  - a widening emits EXACTLY the new columns' ALTERs, in schema order;
  *  - an unchanged schema (however the live metadata happens to case or
  *    decorate its type names) emits NOTHING — this is what makes the
  *    per-batch diff a no-op in steady state;
  *  - a type change and a NOT NULL addition are rejected loudly.
  *
  * Pure driver-side SQL generation — no Spark jobs, generous case
  * count. */
object JdbcMergeProps extends Properties("JdbcMergeEvolve") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(120)

  private val colTypes: Seq[DataType] = Seq(
    IntegerType, LongType, BooleanType, DoubleType, FloatType,
    StringType, BinaryType, DateType, TimestampType, DecimalType(12, 2))

  private val colName: Gen[String] =
    Gen.zip(Gen.alphaChar, Gen.alphaNumStr.map(_.take(6)))
      .map { case (h, t) => (h + t).toUpperCase(Locale.ROOT) }

  /** A base schema: distinct names, first column the NOT NULL key. */
  private val baseSchema: Gen[StructType] = for {
    n <- Gen.chooseNum(1, 5)
    names <- Gen.listOfN(n + 3, colName).map(_.distinct).suchThat(_.size >= 2)
    types <- Gen.listOfN(names.size, Gen.oneOf(colTypes))
  } yield StructType(names.zip(types).zipWithIndex.map { case ((nm, dt), i) =>
    StructField(nm, dt, nullable = i != 0)
  })

  private def cfgFor(schema: StructType) =
    JdbcMerge.Config(table = "t_props", keyCols = Seq(schema.head.name))

  /** What JDBC metadata would report for the live table, with the
    * decorations real servers apply: case-shuffled TYPE_NAME, length
    * specs dropped or present, trailing qualifiers ("int identity"). */
  private def liveColumns(schema: StructType, decorate: Int): Seq[(String, String)] =
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val t = JdbcMerge.TSql.sqlType(f.dataType)
      val dec = (decorate + i) % 4 match {
        case 0 => t                                 // verbatim
        case 1 => t.toLowerCase(Locale.ROOT)        // lowercased metadata
        case 2 => t.takeWhile(_ != '(')             // length spec omitted
        case 3 => t.takeWhile(_ != '(') + " identity" // qualifier suffix
      }
      // name case shuffled too: SQL Server collation is case-insensitive
      val nm = if (i % 2 == 0) f.name.toLowerCase(Locale.ROOT) else f.name
      (nm, dec)
    }

  property("a widening emits exactly the new columns' ALTERs, in schema order") =
    Prop.forAll(baseSchema, Gen.listOfN(3, colName), Gen.chooseNum(0, 3)) {
      (base, addNames0, dec) =>
        val existing = base.fieldNames.map(_.toUpperCase(Locale.ROOT)).toSet
        val addNames = addNames0.distinct.filterNot(n => existing(n))
        val widened = addNames.foldLeft(base)((s, n) => s.add(StructField(n, StringType)))
        val alters = JdbcMerge.evolveTableSql(cfgFor(base), liveColumns(base, dec), widened)
        alters == addNames.map(n => s"ALTER TABLE [t_props] ADD [$n] NVARCHAR(MAX) NULL")
    }

  property("an unchanged schema emits NOTHING, whatever the metadata's case/decorations") =
    Prop.forAll(baseSchema, Gen.chooseNum(0, 3)) { (base, dec) =>
      JdbcMerge.evolveTableSql(cfgFor(base), liveColumns(base, dec), base).isEmpty
    }

  property("a type change is rejected loudly, never emitted as DDL") =
    Prop.forAll(baseSchema, Gen.chooseNum(0, 100)) { (base, pick) =>
      val i = pick % base.length
      val f = base.fields(i)
      // swap to a type whose T-SQL base token differs (INT<->BIGINT etc.)
      val swapped = colTypes.find { t =>
        JdbcMerge.TSql.sqlType(t).takeWhile(_ != '(') !=
          JdbcMerge.TSql.sqlType(f.dataType).takeWhile(_ != '(')
      }.get
      val changed = StructType(base.fields.updated(i, f.copy(dataType = swapped)))
      Prop.throws(classOf[IllegalArgumentException]) {
        JdbcMerge.evolveTableSql(cfgFor(base), liveColumns(base, 0), changed)
      }
    }

  property("a NOT NULL addition is rejected loudly") =
    Prop.forAll(baseSchema, colName) { (base, nm0 ) =>
      val existing = base.fieldNames.map(_.toUpperCase(Locale.ROOT)).toSet
      val nm = if (existing(nm0)) nm0 + "_X" else nm0
      val widened = base.add(StructField(nm, IntegerType, nullable = false))
      Prop.throws(classOf[IllegalArgumentException]) {
        JdbcMerge.evolveTableSql(cfgFor(base), liveColumns(base, 0), widened)
      }
    }

  property("columns present only in the table are left alone (the MERGE ignores them)") =
    Prop.forAll(baseSchema, colName) { (base, extra0) =>
      val existing = base.fieldNames.map(_.toUpperCase(Locale.ROOT)).toSet
      val extra = if (existing(extra0)) extra0 + "_Y" else extra0
      val live = liveColumns(base, 0) :+ ((extra, "nvarchar"))
      JdbcMerge.evolveTableSql(cfgFor(base), live, base).isEmpty
    }
}
