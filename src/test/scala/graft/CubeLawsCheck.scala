package graft

import graft.core._
import graft.functions.{Reducers, Scalar}
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for cube-operator laws (SURVEY §5: null-propagation laws
  * and engine≡in-memory agreement on the long-form cube), mirroring the
  * reference's numpy-vs-dask equivalence checks (tests/general_checks.py).
  */
object CubeLawsCheck extends Properties("CubeLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** tiny cube: ≤2 bands × ≤6 positions, integer-valued doubles + nulls */
  val genCells: Gen[List[(Long, String, Option[Int])]] = for {
    nBands <- Gen.choose(1, 2)
    nPos <- Gen.choose(1, 6)
    cells <- Gen.sequence[List[(Long, String, Option[Int])], (Long, String, Option[Int])](
      (for {
        b <- 0 until nBands
        p <- 0 until nPos
      } yield Gen.option(Gen.choose(-100, 100))
        .map(v => (p.toLong, s"B$b", v))).toList)
  } yield cells

  def toCube(cells: List[(Long, String, Option[Int])]): DataCube = {
    val df = cells.map { case (p, b, v) =>
      (p, b, v.map(_.toDouble).map(java.lang.Double.valueOf).orNull)
    }.toDF("i", "band", "value")
    DataCube.fromTable(df, Seq("i", "band"), "value",
      Map("i" -> DimType.Other, "band" -> DimType.Bands))
  }

  property("reduce sum equals in-memory groupBy sum") =
    forAll(genCells) { cells =>
      val got = ReduceOps.reduceDimension(toCube(cells), "i",
        v => Reducers.sumR(v))
        .df.collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val want = cells.groupBy(_._2).map { case (b, cs) =>
        val vs = cs.flatMap(_._3)
        b -> (if (vs.isEmpty) None else Some(vs.sum.toDouble))
      }
      got == want
    }

  property("merge_cubes with + resolver is symmetric") =
    forAll(genCells, genCells) { (a, b) =>
      def collect(c: DataCube) = c.df.collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      val c1 = toCube(a)
      val c2 = toCube(b.map { case (p, band, v) => (p + 3, band, v) }) // partial overlap
      val m12 = collect(MergeOps.mergeCubes(c1, c2, Some(_ + _)))
      val m21 = collect(MergeOps.mergeCubes(c2, c1, Some(_ + _)))
      m12 == m21
    }

  property("sortAlong preserves the per-series multiset") =
    forAll(genCells) { cells =>
      // sortAlong output column order is (band, i, value)
      val sorted = WindowOps.sortAlong(toCube(cells), "i")
        .df.collect()
        .map(r => (r.getString(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val got = sorted.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted.toList).toMap
      val want = cells.groupBy(_._2).map { case (b, cs) =>
        b -> cs.map(_._3.map(_.toDouble)).sorted.toList
      }
      got == want
    }

  property("interpolate_linear never changes non-null cells") =
    forAll(genCells) { cells =>
      val before = cells.collect { case (p, b, Some(v)) => (p, b) -> v.toDouble }.toMap
      val after = WindowOps.interpolateLinear(toCube(cells), "i")
        .df.collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      before.forall { case (k, v) => after(k).contains(v) }
    }

  property("comparison null propagation: null operand → null result") =
    forAll(Gen.option(Gen.choose(-5, 5)), Gen.option(Gen.choose(-5, 5))) { (x, y) =>
      val df = Seq((x.map(_.toDouble).map(java.lang.Double.valueOf).orNull,
        y.map(_.toDouble).map(java.lang.Double.valueOf).orNull)).toDF("a", "b")
      val r = df.select(
        Scalar.eq(col("a"), col("b")).as("eq"),
        Scalar.lt(col("a"), col("b")).as("lt"),
        Scalar.gte(col("a"), col("b")).as("gte")).collect()(0)
      val anyNull = x.isEmpty || y.isEmpty
      (0 until 3).forall(i => r.isNullAt(i) == anyNull)
    }
}
