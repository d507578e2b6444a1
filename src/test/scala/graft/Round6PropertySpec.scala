package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Property tests for the round-6 math that a fixed-input gate can't
  * fully exercise: the WMA window-sum decomposition and the funnel's
  * strictly-after anchor chaining — both checked against brute-force
  * Scala references over random inputs, the dedupCcLoop-vs-union-find
  * pattern applied to the new operators.
  */
class Round6PropertySpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def passes(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  // -------------------------------------------------------------- wma

  test("property: decomposed WMA equals brute-force weighted average") {
    import s.implicits._
    val seriesGen: Gen[List[(String, Int, Double)]] = for {
      nSeries <- Gen.chooseNum(1, 3)
      lens <- Gen.listOfN(nSeries, Gen.chooseNum(1, 45))
      rows <- Gen.sequence[List[List[(String, Int, Double)]],
        List[(String, Int, Double)]](
        lens.zipWithIndex.map { case (len, k) =>
          Gen.listOfN(len, Gen.chooseNum(-1000, 1000))
            .map(_.zipWithIndex.map { case (v, i) =>
              (s"s$k", i, v / 7.0)
            })
        }).map(_.flatten)
      } yield rows
    passes(Prop.forAll(seriesGen) { rows =>
      rows.isEmpty || {
        val width = 4 // small frame so short series exercise warm-up
        val df = rows.toDF("k", "i", "v")
        val got = graft.ops.TimeSeries.wmaOver(df, "k", "i", "v", width)
          .collect()
          .map(r => (r.getAs[String]("k"), r.getAs[Int]("i")) ->
            r.getAs[Double]("wma")).toMap
        // brute force: weights 1..c over the trailing window, newest
        // heaviest
        val bySeries = rows.groupBy(_._1)
        bySeries.forall { case (k, rs) =>
          val ordered = rs.sortBy(_._2)
          ordered.indices.forall { i =>
            val frame = ordered.slice(math.max(0, i - width), i + 1)
            val c = frame.length
            val num = frame.zipWithIndex
              .map { case ((_, _, v), j) => v * (j + 1) }.sum
            val expect = num / (c * (c + 1) / 2.0)
            math.abs(got((k, ordered(i)._2)) - expect) < 1e-3
          }
        }
      }
    })
  }

  test("property: WMA with colliding order keys is total via tiebreak") {
    import s.implicits._
    // duplicated-corpus shape (the sf1 harness): every order value
    // appears d times; only the tiebreak column distinguishes copies.
    // The smoother must (a) match brute force over the (order, tb)
    // sort and (b) be invariant to input row order — without the
    // tiebreak both are engine-luck at every tie.
    val gen: Gen[(List[(String, Int, Long, Double)], Long)] = for {
      d <- Gen.chooseNum(2, 4)
      len <- Gen.chooseNum(1, 15)
      vs <- Gen.listOfN(len * d, Gen.chooseNum(-1000, 1000))
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (vs.zipWithIndex.map { case (v, j) =>
      ("s", j % len, j.toLong, v / 7.0)  // order j%len collides d ways
    }, seed)
    passes(Prop.forAll(gen) { case (rows, seed) =>
      val width = 4
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      def run(rs: List[(String, Int, Long, Double)]) =
        graft.ops.TimeSeries.wmaOver(
            rs.toDF("k", "i", "tb", "v"), "k", "i", "v", width,
            tiebreak = Seq("tb"))
          .collect()
          .map(r => (r.getAs[Int]("i"), r.getAs[Long]("tb")) ->
            r.getAs[Double]("wma")).toMap
      val got = run(rows)
      val ordered = rows.sortBy(r => (r._2, r._3))
      val expectOk = ordered.indices.forall { i =>
        val frame = ordered.slice(math.max(0, i - width), i + 1)
        val c = frame.length
        val num = frame.zipWithIndex
          .map { case ((_, _, _, v), j) => v * (j + 1) }.sum
        math.abs(got((ordered(i)._2, ordered(i)._3)) -
          num / (c * (c + 1) / 2.0)) < 1e-3
      }
      expectOk && run(shuffled) == got
    })
  }

  // ----------------------------------------------------------- funnel

  test("property: funnel depths equal a per-user sequential scan") {
    import s.implicits._
    val steps = Seq("A", "B", "C")
    val evGen: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.chooseNum(0, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 6L)
        t <- Gen.oneOf("A", "B", "C", "X") // X = noise the funnel ignores
      } yield (u, t))
    } yield evs.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
    passes(Prop.forAll(evGen) { evs =>
      val df = evs.toDF("user_id", "event_type", "tus")
      val got = graft.ops.Reshape.funnelOver(df, steps)
        .collect()
        .map(r => r.getAs[Long]("depth") ->
          (r.getAs[Long]("n_users"), r.getAs[Long]("n_reached"))).toMap
      // brute force: walk each user's events in time order, advancing
      // one anchor at a time, strictly-after
      val depths = evs.groupBy(_._1).flatMap { case (_, rs) =>
        val ordered = rs.sortBy(_._3)
        var anchor = Option.empty[Long]
        var depth = 0
        for (step <- steps) {
          val hit = ordered.find(e =>
            e._2 == step && anchor.forall(e._3 > _))
          if (hit.isDefined && depth == steps.indexOf(step)) {
            anchor = Some(hit.get._3); depth += 1
          }
        }
        if (depth > 0) Some(depth.toLong) else None
      }.toList
      val expectUsers = depths.groupBy(identity).map {
        case (d, xs) => d -> xs.length.toLong
      }
      val expectReach = expectUsers.map { case (d, _) =>
        d -> expectUsers.filter(_._1 >= d).values.sum
      }
      got.keySet == expectUsers.keySet &&
        got.forall { case (d, (nu, nr)) =>
          expectUsers(d) == nu && expectReach(d) == nr
        }
    })
  }
}
