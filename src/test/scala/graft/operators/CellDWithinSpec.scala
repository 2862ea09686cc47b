package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession
import graft.functions.ST._

/** The partitioned big-big dwithin join must produce the exact
  * multiset of pairs of a brute-force distance cross join — including
  * pairs at exactly the radius, pairs spanning many cells, and under
  * salting — with no duplicates from multi-cell covers.
  */
class CellDWithinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def left = (1 to 300).map { i =>
    (i.toLong, (i * 13 % 71).toDouble - 35.0, (i * 7 % 51).toDouble - 25.0)
  }.toDF("lid", "lx", "ly").withColumn("lpt", st_point($"lx", $"ly"))

  private def right = (1 to 200).map { j =>
    (j.toLong, (j * 17 % 71).toDouble - 35.0, (j * 11 % 51).toDouble - 25.0)
  }.toDF("rid", "rx", "ry").withColumn("rpt", st_point($"rx", $"ry"))

  private def bruteParis(radius: Double): Set[(Long, Long)] =
    left.crossJoin(right)
      .filter(($"lx" - $"rx") * ($"lx" - $"rx") + ($"ly" - $"ry") * ($"ly" - $"ry")
        <= radius * radius)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet

  test("cellDWithinJoin matches brute force, exact multiset, several levels") {
    val expected = bruteParis(3.0)
    assert(expected.nonEmpty)
    for (level <- Seq(4, 6, 8)) {
      val got = SpatialJoins.cellDWithinJoin(left, "lpt", right, "rpt",
        radius = 3.0, level = level)
        .select($"lid", $"rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicates at level $level")
      assert(got.toSet === expected, s"wrong pairs at level $level")
    }
  }

  test("pairs at exactly the radius are included") {
    val l = Seq((1L, 0.0, 0.0)).toDF("lid", "lx", "ly")
      .withColumn("lpt", st_point($"lx", $"ly"))
    val r = Seq((10L, 2.0, 0.0), (11L, 2.000001, 0.0)).toDF("rid", "rx", "ry")
      .withColumn("rpt", st_point($"rx", $"ry"))
    val got = SpatialJoins.cellDWithinJoin(l, "lpt", r, "rpt", radius = 2.0, level = 6)
      .select($"rid").as[Long].collect().toSet
    assert(got === Set(10L))
  }

  test("salting preserves the exact result") {
    val expected = bruteParis(3.0)
    val got = SpatialJoins.cellDWithinJoin(left, "lpt", right, "rpt",
      radius = 3.0, level = 6, saltBuckets = 4, saltKey = "lid")
      .select($"lid", $"rid").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === expected)
  }
}
