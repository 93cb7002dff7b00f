package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sources.AvroSerde

/** ScalaCheck properties for the Avro wire serde — the directed
  * AvroSerdeSpec cases pin known shapes (the movies schema, Debezium
  * keys, embeddings); these generate RANDOM schemas over the supported
  * type surface with random rows (nulls included) and require:
  *
  *  - round-trip identity: fromBytes(toBytes(row)) == row, bit-exact;
  *  - schema round-trip: structType(avroSchema(st)) is a fixpoint after
  *    ONE normalization hop (the hop drops metadata and widens
  *    Short/Byte — applying it twice must change nothing, which is what
  *    the replication facade's Avro-normalized identity compare and the
  *    "state shape independent of framing" invariant lean on).
  *
  * No Spark jobs — pure driver-side serde, so the case count can be
  * generous. */
object AvroSerdeProps extends Properties("AvroSerde") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(80)

  // the supported scalar surface (see AvroSerde.avroSchema): each entry
  // generates (DataType, Gen[non-null value])
  private val scalarGens: Seq[(DataType, Gen[Any])] = Seq(
    IntegerType -> Gen.chooseNum(Int.MinValue, Int.MaxValue).map(x => x: Any),
    LongType -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(x => x: Any),
    DoubleType -> Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e300)).map(x => x: Any),
    FloatType -> Gen.chooseNum(-1e6f, 1e6f).map(x => x: Any),
    BooleanType -> Gen.oneOf(true, false).map(x => x: Any),
    StringType -> Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("", "it's", "tab\tchar", "uni✓code", "line\nbreak"))
      .map(x => x: Any),
    BinaryType -> Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray: Any),
    DecimalType(10, 2) -> Gen.chooseNum(-99999999L, 99999999L)
      .map(u => new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 2): Any))

  private case class Field(name: String, dt: DataType, nullable: Boolean, gen: Gen[Any])

  private val genFields: Gen[List[Field]] = for {
    n <- Gen.chooseNum(1, 6)
    picks <- Gen.listOfN(n, Gen.oneOf(scalarGens))
    nullables <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield picks.lazyZip(nullables).lazyZip(1 to n).map {
    case ((dt, g), nu, i) => Field(s"f$i", dt, nu, g)
  }.toList

  private def rowGen(fields: List[Field]): Gen[Row] =
    Gen.sequence[List[Any], Any](fields.map { f =>
      if (f.nullable) Gen.frequency(1 -> Gen.const(null: Any), 4 -> f.gen)
      else f.gen
    }).map(vs => Row(vs: _*))

  private def sameCell(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x, y) => x == y
  }

  property("rows round-trip bit-exact over random schemas, nulls included") =
    Prop.forAll(genFields.flatMap(fs => rowGen(fs).map(fs -> _))) {
      case (fields, row) =>
        val st = StructType(fields.map(f => StructField(f.name, f.dt, f.nullable)))
        val schema = AvroSerde.avroSchema(st)
        val back = AvroSerde.fromBytes(AvroSerde.toBytes(row, st, schema), st, schema)
        (0 until row.length).forall(i => sameCell(row.get(i), back.get(i)))
    }

  property("the Avro normalization hop is idempotent") =
    Prop.forAll(genFields) { fields =>
      val st = StructType(fields.map(f => StructField(f.name, f.dt, f.nullable)))
      val once = AvroSerde.structType(AvroSerde.avroSchema(st))
      val twice = AvroSerde.structType(AvroSerde.avroSchema(once))
      once == twice
    }

  /** v1 writer, v2 = v1 + random ADDITIVE-NULLABLE fields (the only
    * evolution the engine and its JDBC sink admit): every v1-framed
    * record resolves under the v2 reader with common fields bit-exact
    * and the added fields null — the registry consumer contract over
    * random widenings, not just AvroEvolutionSpec's movies fixture. */
  property("random additive-nullable widenings resolve v1 frames with nulls for the new fields") =
    Prop.forAll(
      for {
        base <- genFields
        extra <- genFields.map(_.map(f =>
          f.copy(name = s"w${f.name}", nullable = true)))
        row <- rowGen(base)
      } yield (base, extra, row)) {
      case (base, extra, row) =>
        val v1 = StructType(base.map(f => StructField(f.name, f.dt, f.nullable)))
        val v2 = StructType((base ++ extra).map(f => StructField(f.name, f.dt, f.nullable)))
        val (w, r) = (AvroSerde.avroSchema(v1), AvroSerde.avroSchema(v2))
        val framed = AvroSerde.toBytesWithId(row, v1, w, schemaId = 1)
        val back = AvroSerde.fromBytesResolved(framed, w, v2, r)
        val commonOk = (0 until row.length).forall(i => sameCell(row.get(i), back.get(i)))
        val addedNull = (row.length until v2.length).forall(back.isNullAt)
        AvroSerde.schemaIdOf(framed) == 1 && commonOk && addedNull
    }

  /** The mirror direction: a v2 writer read under the NARROWER v1
    * reader skips the dropped fields and keeps the common ones
    * bit-exact — what a consumer pinned to an older projection sees
    * while the subject is ahead of it. */
  property("a narrower reader skips the writer's extra fields and keeps the rest bit-exact") =
    Prop.forAll(
      for {
        base <- genFields
        extra <- genFields.map(_.map(f =>
          f.copy(name = s"w${f.name}", nullable = true)))
        row <- rowGen(base ++ extra)
      } yield (base, extra, row)) {
      case (base, extra, row) =>
        val v1 = StructType(base.map(f => StructField(f.name, f.dt, f.nullable)))
        val v2 = StructType((base ++ extra).map(f => StructField(f.name, f.dt, f.nullable)))
        val (w, r) = (AvroSerde.avroSchema(v2), AvroSerde.avroSchema(v1))
        val framed = AvroSerde.toBytesWithId(row, v2, w, schemaId = 7)
        val back = AvroSerde.fromBytesResolved(framed, w, v1, r)
        back.length == v1.length &&
          (0 until v1.length).forall(i => sameCell(row.get(i), back.get(i)))
    }
}
