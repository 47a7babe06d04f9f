package graft

import graft.engine.text.TextOps

/** The distributed connected-components resolver on adversarial graph
  * shapes (round-2 advice: plain min-label propagation needs rounds
  * proportional to component DIAMETER, so a chain-shaped dup graph
  * would abort on any constant cap — pointer jumping makes the round
  * count logarithmic, and these specs pin that bound).
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e0 = edges.toDF("a", "b")
    TextOps.resolveDistributed(e0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("200-node chain converges to the min label in O(log n) rounds") {
    val chain = (0L until 199L).map(i => (i, i + 1))
    val lbl = resolve(chain)
    assert(lbl.size == 200 && lbl.values.forall(_ == 0L),
      s"all chain nodes must resolve to 0: ${lbl.filter(_._2 != 0L).take(5)}")
    // diameter 199; plain propagation needs ~199 rounds and would hit
    // the 50-round cap. Pointer jumping: observed rounds must sit well
    // under the cap (theory: ~log2(199) + constant)
    assert(TextOps.lastResolveRounds <= 20,
      s"chain took ${TextOps.lastResolveRounds} rounds — jumping not effective")
  }

  test("random graphs: distributed resolve ≡ reference union-find (seeded cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(5, 60)
      m <- Gen.choose(2, 120)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es.filter { case (a, b) => a != b }
    val cases = (1 to 40).iterator
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
      .filter(_.nonEmpty).take(4).toSeq
    assert(cases.size == 4)
    cases.foreach { edges =>
      val got = resolve(edges)
      // reference union-find (min-root attachment, as in production)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(got.keySet == nodes.toSet, "label table covers exactly the graph's nodes")
      nodes.foreach { v =>
        assert(got(v) == find(v), s"node $v: got ${got(v)}, want ${find(v)}; edges=$edges")
      }
    }
  }

  test("ring + disjoint components + reversed ids resolve independently") {
    // a 50-ring labeled 100..149, a star at 0, and a 2-node island —
    // also exercises edges pointing from high to low ids
    val ring = (0L until 50L).map(i => (100L + i, 100L + (i + 1) % 50))
    val star = (1L to 5L).map(i => (i, 0L))
    val island = Seq((900L, 800L))
    val lbl = resolve(ring ++ star ++ island)
    assert((100L to 149L).forall(lbl(_) == 100L), "ring resolves to 100")
    assert((0L to 5L).forall(lbl(_) == 0L), "star resolves to 0")
    assert(lbl(900L) == 800L && lbl(800L) == 800L, "island resolves to 800")
  }
}
