package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, BoundReference, SortOrder}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the shared bounded-heap prune, including the
  * group-count flush bound the partial exec uses: a finite maxGroups
  * may split a group's candidates across several emissions, but their
  * UNION must still contain that group's true top-k (the final exec
  * re-prunes per co-located group, so supersets are sound, misses are
  * not). */
class TopKPruneSpec extends AnyFunSuite {
  private val g = AttributeReference("g", IntegerType, nullable = false)()
  private val v = AttributeReference("v", IntegerType, nullable = false)()
  private val input = Seq(g, v)
  private val order = Seq(SortOrder(BoundReference(1, IntegerType, false), Ascending))
  private val part = Seq(BoundReference(0, IntegerType, false))

  private def rows(data: Seq[(Int, Int)]): Iterator[InternalRow] =
    data.iterator.map { case (a, b) => InternalRow(a, b) }

  /** union of emitted candidate values per group key */
  private def candidates(data: Seq[(Int, Int)], k: Int, maxGroups: Int) =
    TopK.prune(rows(data), k, part, order, input, maxGroups)
      .toSeq
      .groupBy(_._1.getInt(0))
      .view.mapValues(_.flatMap(_._2).map(_.getInt(1)).toSet).toMap

  test("unbounded prune keeps exactly the k best per group") {
    val data = for (key <- 0 until 10; i <- 0 until 20) yield (key, i * 7 % 20)
    val got = candidates(data, 3, Int.MaxValue)
    assert(got.keySet == (0 until 10).toSet)
    got.foreach { case (_, vs) => assert(vs == Set(0, 1, 2)) }
  }

  test("flushing at a small group bound still covers the true top-k") {
    // interleave keys so every chunk sees a mix of groups and each
    // group's rows straddle several flushes
    val data = for (i <- 0 until 50; key <- 0 until 25) yield (key, (i * 13 + key) % 50)
    val truth = data.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(4).toSet).toMap
    val got = candidates(data, 4, maxGroups = 3)
    truth.foreach { case (key, top) =>
      assert(top.subsetOf(got(key)), s"group $key lost candidates: $top vs ${got(key)}")
    }
  }

  test("flush emits the same key multiple times but never loses rows") {
    val data = Seq((1, 5), (2, 5), (3, 5), (1, 1), (2, 1), (3, 1))
    val emitted = TopK.prune(rows(data), 1, part, order, input, maxGroups = 2).toSeq
    // 3 distinct keys with bound 2 → at least one flush → >3 tuples
    assert(emitted.size > 3)
    val got = emitted.groupBy(_._1.getInt(0))
      .view.mapValues(_.flatMap(_._2).map(_.getInt(1)).toSet).toMap
    assert(Set(1, 2, 3).forall(k => got(k).contains(1)))
  }

  test("empty input yields empty output") {
    assert(TopK.prune(Iterator.empty, 3, part, order, input, 2).isEmpty)
  }
}
