package graft

import org.scalatest.funsuite.AnyFunSuite

/** Floor-governance contract (Bench.parseFloors): the floors resource may
  * mix legacy flat entries (`"q": 1.2`) with annotated history entries
  * (`"q": {"floor": …, "prev": …, "pinned_round": …, "reason": …}`); a
  * re-pin must never erase the gate that guarded the previous pipeline —
  * `prev` carries it and Bench prints when a wall exceeds it.
  */
class BenchFloorsSpec extends AnyFunSuite {

  test("parseFloors: legacy flat entries") {
    val m = Bench.parseFloors("""{"q_a": 0.5, "q_b": 1.25e0}""")
    assert(m("q_a").floor == 0.5 && m("q_a").prev.isEmpty)
    assert(m("q_b").floor == 1.25)
  }

  test("parseFloors: annotated entries with history, null prev, and " +
      "mixed-form files") {
    val m = Bench.parseFloors(
      """{
        | "q_flat": 0.25,
        | "q_repinned": {"floor": 2.45, "prev": 1.303, "pinned_round": "r11", "reason": "pipeline change, 'quoted'"},
        | "q_fresh": {"floor": 0.9, "prev": null, "pinned_round": "r12", "reason": "new query"}
        |}""".stripMargin)
    assert(m.size == 3)
    assert(m("q_flat").floor == 0.25 && m("q_flat").prev.isEmpty)
    val r = m("q_repinned")
    assert(r.floor == 2.45 && r.prev.contains(1.303))
    assert(r.pinnedRound == "r11" && r.reason.nonEmpty)
    assert(m("q_fresh").floor == 0.9 && m("q_fresh").prev.isEmpty)
    // an object's inner numeric fields must NOT leak as flat floors
    assert(!m.contains("floor") && !m.contains("prev"))
  }

  test("checked-in sf0.1 floors resource parses; the r11 re-pins keep " +
      "their pre-re-pin history") {
    val in = getClass.getResourceAsStream("/graft/bench_floors_sf0.1.json")
    assert(in != null, "floors resource missing")
    val t = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val m = Bench.parseFloors(t)
    assert(m.size >= 140, s"only ${m.size} floor entries parsed")
    assert(m.values.forall(e => e.floor > 0 && !e.floor.isNaN))
    // the two floors VERDICT r11 flagged as history-erasing re-pins now
    // carry the old gate as prev (regression memory)
    assert(m("q_dedup_simhash").prev.contains(1.303))
    assert(m("q_text_topterms").prev.contains(0.445))
    // prev is the pre-re-pin gate and may sit on EITHER side of the
    // current floor: below it after a loosening re-pin (pipeline got
    // deliberately heavier), above it after a tightening one (the writer
    // keeps the LOOSEST history so repeated clean re-pins don't shed
    // regression memory — Bench.scala's floor-write rule). The invariant
    // is only that recorded history is a real, positive gate.
    m.foreach { case (k, e) =>
      e.prev.foreach(p => assert(p > 0 && !p.isNaN,
        s"$k: prev $p is not a valid historical gate"))
    }
  }
}
