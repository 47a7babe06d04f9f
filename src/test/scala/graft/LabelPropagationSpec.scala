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
