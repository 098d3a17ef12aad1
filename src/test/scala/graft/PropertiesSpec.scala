package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, Merge}
import graft.plans.TableOrder

/** Property-based checks over the algebraic operator laws. */
class PropertiesSpec extends AnyFunSuite {

  // seeded scalacheck sampling (the scalatest bridge isn't on the
  // classpath; deterministic seeds keep runs reproducible)
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next).take(n)
      .flatMap(seed => g.apply(params, seed)).toSeq
  }
  private lazy val spark = SparkSuite.session
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(12, for {
      id <- Gen.chooseNum(0L, 6L)
      name <- Gen.alphaStr.map(_.take(4))
      amt <- Gen.chooseNum(0, 1000).map(_.toDouble)
    } yield (id, name, amt))

  test("upsert is idempotent: applying the same batch twice changes nothing") {
    for ((destRows, inRows) <- samples(rowsGen, 5).zip(samples(rowsGen, 5).reverse)) {
      {
        val dest = Dedup.keepFirst(
          destRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
        val in = Dedup.keepFirst(
          inRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
        val once = Merge.upsert(dest, in, Seq("id"))
        val twice = Merge.upsert(once, in, Seq("id"))
        assert(once.orderBy("id", "name", "amount").collect().toSeq ===
          twice.orderBy("id", "name", "amount").collect().toSeq)
      }
    }
  }

  test("upsert row set = dest keys ∪ incoming keys") {
    for ((destRows, inRows) <- samples(rowsGen, 5).zip(samples(rowsGen, 5).reverse)) {
      val dest = Dedup.keepFirst(
        destRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
      val in = Dedup.keepFirst(
        inRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
      val out = Merge.upsert(dest, in, Seq("id"))
      val expect = (destRows.map(_._1) ++ inRows.map(_._1)).toSet
      assert(out.select("id").as[Long].collect().toSet === expect)
      assert(out.count() === expect.size)
    }
  }

  test("keepFirst is idempotent and never grows") {
    for (rows <- samples(rowsGen, 5)) {
      val df = rows.toDF("id", "name", "amount")
      val d1 = Dedup.keepFirst(df, Seq("id"), Seq(col("name"), col("amount")))
      val d2 = Dedup.keepFirst(d1, Seq("id"), Seq(col("name"), col("amount")))
      assert(d1.count() <= rows.size)
      assert(d1.orderBy("id").collect().toSeq === d2.orderBy("id").collect().toSeq)
    }
  }

  test("TableOrder output is a permutation respecting every dependency") {
    val tablesGen = Gen.someOf(graft.sources.Tables.All).map(_.toList)
    for (tables <- samples(tablesGen, 20)) {
      val order = TableOrder.order(tables)
      assert(order.sorted === tables.sorted)
      for (t <- tables; dep <- TableOrder.StarSchemaDeps.getOrElse(t, Set.empty)
           if tables.contains(dep))
        assert(order.indexOf(dep) < order.indexOf(t), s"$dep must precede $t")
    }
  }
}
