package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TypeMapSpec extends AnyFunSuite {

  /** deterministic property driver (scalatestplus is not on the offline
    * classpath, so Gens are pumped by hand with fixed seeds)
    */
  def forAllSeeded[T](gen: Gen[T], n: Int = 200)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  test("primitive mappings follow SURVEY §1.2") {
    assert(TypeMap.parse("boolean") == BooleanType)
    assert(TypeMap.parse("int") == IntegerType)
    assert(TypeMap.parse("long") == LongType)
    assert(TypeMap.parse("float") == FloatType)
    assert(TypeMap.parse("double") == DoubleType)
    assert(TypeMap.parse("date") == DateType)
    assert(TypeMap.parse("timestamp") == TimestampNTZType)
    assert(TypeMap.parse("timestamptz") == TimestampType)
    assert(TypeMap.parse("uuid") == StringType)
    assert(TypeMap.parse("binary") == BinaryType)
    assert(TypeMap.parse("fixed") == BinaryType)
    assert(TypeMap.parse("decimal(10, 2)") == DecimalType(10, 2))
  }

  test("ns timestamps map to µs types instead of the reference's todo!() panic") {
    assert(TypeMap.parse("timestamp_ns") == TimestampNTZType)
    assert(TypeMap.parse("timestamptz_ns") == TimestampType)
  }

  test("time maps to LongType (micros-since-midnight, documented gap)") {
    assert(TypeMap.parse("time") == LongType)
  }

  test("nested types parse recursively") {
    assert(TypeMap.parse("list<string>") == ArrayType(StringType))
    assert(TypeMap.parse("map<string, int>") == MapType(StringType, IntegerType))
    val st = TypeMap.parse("struct<a: int, b: list<decimal(5, 1)>>")
    assert(st == StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", ArrayType(DecimalType(5, 1))))))
  }

  test("bare struct (the reference's opaque rendering) parses") {
    assert(TypeMap.parse("struct") == StructType(Seq.empty))
  }

  // generator over the renderable type space
  private val genType: Gen[DataType] = {
    val prim = Gen.oneOf[DataType](BooleanType, IntegerType, LongType,
      FloatType, DoubleType, DateType, StringType, BinaryType,
      TimestampNTZType, TimestampType)
    val dec = for {
      p <- Gen.choose(1, 38); s <- Gen.choose(0, p)
    } yield DecimalType(p, s)
    def sized(depth: Int): Gen[DataType] =
      if (depth <= 0) Gen.oneOf(prim, dec)
      else Gen.frequency(
        6 -> prim, 2 -> dec,
        1 -> sized(depth - 1).map(ArrayType(_)),
        1 -> (for {
          k <- Gen.oneOf[DataType](StringType, IntegerType, LongType)
          v <- sized(depth - 1)
        } yield MapType(k, v)),
        1 -> (for {
          n <- Gen.choose(1, 3)
          names <- Gen.listOfN(n, Gen.identifier.map(_.take(8)))
          ts <- Gen.listOfN(n, sized(depth - 1))
        } yield StructType(names.zip(ts).map { case (nm, t) =>
          StructField(nm, t)
        })))
    sized(3)
  }

  test("property: parse(render(t)) == t for the full recursive type space") {
    forAllSeeded(genType) { t =>
      assert(TypeMap.parse(TypeMap.render(t)) == t)
    }
  }

  test("flatten walks nested structs depth-first with depth tags") {
    val st = StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", StructType(Seq(
        StructField("c", StringType),
        StructField("d", StructType(Seq(StructField("e", LongType)))))))))
    val flat = TypeMap.flatten(st)
    assert(flat.map(r => (r._1, r._2)) ==
      Seq((0, "a"), (0, "b"), (1, "c"), (1, "d"), (2, "e")))
  }
}

class TypeMapNegativeSpec extends AnyFunSuite {
  test("malformed type strings raise instead of mis-parsing") {
    Seq("decimal(10)", "list<", "map<string>", "struct<a int>", "wibble",
      "int extra").foreach { bad =>
      assertThrows[IllegalArgumentException](TypeMap.parse(bad))
    }
  }
}
