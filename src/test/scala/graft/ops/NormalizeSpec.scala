package graft.ops

import org.scalacheck.Gen

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeColumnNames trims, uppercases, underscores") {
    val d = Seq((1, 2, 3)).toDF("  sale id ", "Sale_Date", "qty")
    assert(Normalize.normalizeColumnNames(d).columns.toSeq ==
      Seq("SALE_ID", "SALE_DATE", "QTY"))
  }

  test("renameAll ignores unknown keys (withColumnRenamed semantics)") {
    val d = Seq((1, 2)).toDF("a", "b")
    val r = Normalize.renameAll(d, Map("a" -> "x", "nope" -> "y"))
    assert(r.columns.toSeq == Seq("x", "b"))
  }

  test("selectCols projects and reorders by name") {
    val d = Seq((1, "s", 2.0)).toDF("a", "b", "c")
    assert(Normalize.selectCols(d, Seq("c", "a")).columns.toSeq ==
      Seq("c", "a"))
  }

  test("property: normalization is idempotent and space-free") {
    val nameGen = Gen.listOfN(8,
      Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)
    Gen.listOfN(300, nameGen).sample.getOrElse(Nil).foreach { raw =>
      val once = raw.trim.toUpperCase.replace(' ', '_')
      val twice = once.trim.toUpperCase.replace(' ', '_')
      assert(once == twice, s"not idempotent for '$raw'")
      assert(!once.contains(' '))
    }
  }
}
