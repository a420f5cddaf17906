package graft

import org.scalatest.funsuite.AnyFunSuite

import Bench.FloorEntry

/** Floor-governance contract (Bench.parseFloors + Bench.repin, v2): the
  * floors resource may mix legacy flat entries (`"q": 1.2`) with annotated
  * history entries (`"q": {"floor": …, "prev": [a, b], …}`; pre-v2 files
  * carry `prev` as a bare number). Re-pins are MONOTONE for unchanged
  * pipelines — a floor may only ratchet down unless the query is named a
  * deliberate pipeline change, and an upward re-pin pushes the old floor
  * onto a bounded history whose tightest entry is never dropped.
  */
class BenchFloorsSpec extends AnyFunSuite {

  test("parseFloors: legacy flat entries") {
    val m = Bench.parseFloors("""{"q_a": 0.5, "q_b": 1.25e0}""")
    assert(m("q_a").floor == 0.5 && m("q_a").prev.isEmpty)
    assert(m("q_b").floor == 1.25)
  }

  test("parseFloors: annotated entries with scalar/list/null prev and " +
      "mixed-form files") {
    val m = Bench.parseFloors(
      """{
        | "q_flat": 0.25,
        | "q_repinned": {"floor": 2.45, "prev": 1.303, "pinned_round": "r11", "reason": "pipeline change, 'quoted'"},
        | "q_hist": {"floor": 2.45, "prev": [1.303, 0.9], "pinned_round": "r13", "reason": "two re-pins"},
        | "q_fresh": {"floor": 0.9, "prev": null, "pinned_round": "r12", "reason": "new query"}
        |}""".stripMargin)
    assert(m.size == 4)
    assert(m("q_flat").floor == 0.25 && m("q_flat").prev.isEmpty)
    val r = m("q_repinned")
    assert(r.floor == 2.45 && r.prev == List(1.303))
    assert(r.pinnedRound == "r11" && r.reason.nonEmpty)
    assert(m("q_hist").prev == List(1.303, 0.9))
    assert(m("q_fresh").floor == 0.9 && m("q_fresh").prev.isEmpty)
    // an object's inner numeric fields must NOT leak as flat floors
    assert(!m.contains("floor") && !m.contains("prev"))
  }

  test("repin: unchanged pipelines are monotone — a floor never increases") {
    val old = FloorEntry(0.234, List(0.2), "r10", "orig")
    // slower round wall: the old entry survives untouched (provenance too)
    assert(Bench.repin(Some(old), 0.552, changed = false, "r13", "noise") == old)
    // faster round wall: ratchets down, history carried
    val down = Bench.repin(Some(old), 0.180, changed = false, "r13", "opt")
    assert(down.floor == 0.180 && down.prev == List(0.2) && down.pinnedRound == "r13")
    // no old entry: fresh pin
    val fresh = Bench.repin(None, 0.5, changed = false, "r13", "new")
    assert(fresh.floor == 0.5 && fresh.prev.isEmpty)
  }

  test("repin: a declared pipeline change may loosen, old floor joins the " +
      "history, tightest-ever survives any bounded sequence of re-pins") {
    val up = Bench.repin(Some(FloorEntry(0.839, Nil, "r11", "xx")), 1.681,
      changed = true, "r12", "md5 twin heavier by design")
    assert(up.floor == 1.681 && up.prev == List(0.839))
    // repeated loosening re-pins: history is bounded but min is retained
    var e = FloorEntry(0.1, Nil, "r0", "start")
    for (i <- 1 to 10) {
      e = Bench.repin(Some(e), 0.1 + i * 0.3, changed = true, s"r$i", "change")
      assert(e.prev.size <= Bench.MaxPrevHist, s"history unbounded: ${e.prev}")
      assert(e.prev.min == 0.1, s"tightest-ever floor dropped: ${e.prev}")
    }
    // a tightening re-pin on a changed pipeline sheds nothing tighter
    val tight = Bench.repin(Some(e), 0.05, changed = true, "r11", "faster")
    assert(tight.floor == 0.05 && tight.prev == e.prev)
  }

  test("write-path reason escaping keeps parseFloors' object matcher safe") {
    // braces in a reason would otherwise truncate the [^{}]* body match
    val reason = """re-pin {"cause": "skew"} done""".replace("\"", "'")
      .replace("{", "(").replace("}", ")")
    val m = Bench.parseFloors(
      s"""{"q_a": {"floor": 1.0, "prev": null, "pinned_round": "r13", "reason": "$reason"}}""")
    assert(m("q_a").floor == 1.0 && m("q_a").reason.contains("('cause': 'skew')"))
  }

  test("checked-in sf0.1 floors resource parses; every pin is the r21 " +
      "noop-sink fresh pin or tighter") {
    val in = getClass.getResourceAsStream("/graft/bench_floors_sf0.1.json")
    assert(in != null, "floors resource missing")
    val t = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val m = Bench.parseFloors(t)
    assert(m.size >= 140, s"only ${m.size} floor entries parsed")
    assert(m.values.forall(e => e.floor > 0 && !e.floor.isNaN))
    // the r21 methodology change (count() -> noop sink, guide §1.4)
    // retired the count-era floors WHOLESALE: count() pruned final sorts
    // and columns (and after the r21 cutSpans fusion, whole subtrees), so
    // every old floor gated a smaller computation than the one now timed.
    // Fresh pins carry no prev history — the count-era gates live in git
    // history, not in a permanently-firing NOTE. Post-r21 re-pins resume
    // the monotone governance (repin tests above) against THESE pins.
    m.foreach { case (k, e) =>
      e.prev.foreach(p => assert(p > 0 && !p.isNaN,
        s"$k: prev $p is not a valid historical gate"))
      assert(e.pinnedRound.nonEmpty && e.reason.nonEmpty,
        s"$k: a floor without provenance")
    }
  }

  test("floor slack is proportional with an absolute floor: sub-second " +
      "queries keep a real gate") {
    // rule: max(0.1, 0.25 x floor). The old FLAT 0.3 s slack let
    // q_knn_join sit at 2.27x its 0.266 s floor for two rounds without
    // tripping (r14 verdict) — under the flat term, any floor < 0.3 s
    // had its gate dominated by slack, not by FloorFactor.
    assert(Bench.floorSlack(0.266) == 0.1)   // 0.25x = 0.0665 -> abs floor
    assert(Bench.floorSlack(0.4) == 0.1)     // exactly at the crossover
    assert(Bench.floorSlack(2.0) == 0.5)     // proportional regime
    assert(Bench.floorSlack(10.0) == 2.5)
    // the r14 reading that motivated the change now trips the gate:
    // wall 0.605 > 2.0 x 0.266 + 0.1 = 0.632 is false, but the r14
    // q_knn_join best (0.605) against the OLD flat gate 0.832 had
    // 0.227 s of hidden headroom; the proportional gate cuts it to 0.027
    assert(2.0 * 0.266 + Bench.floorSlack(0.266) == 0.632)
    // monotone in the floor: a tighter floor never yields a looser gate
    val fs = Seq(0.05, 0.1, 0.3, 0.4, 0.5, 1.0, 5.0)
    fs.sliding(2).foreach { case Seq(a, b) =>
      assert(Bench.floorSlack(a) <= Bench.floorSlack(b))
    }
  }

  test("acknowledged-historical allowlist is EXACT: empty since the r21 " +
      "noop re-pin retired every count-era prev anchor") {
    // This pin fails on any SILENT addition — a new acknowledgment must
    // edit this literal assertion too, which is the review moment the
    // mechanism exists to create. The four count-era entries
    // (q_tar_roundtrip 0.234, q_stream_neardup 0.839, q_text_topterms
    // 0.445, q_pipeline_clean 0.611) anchored to prev floors measured
    // under the count() action; the r21 fresh pins carry no prev history,
    // so those acknowledgments would dangle — they were retired with the
    // floors (OPTIMIZATION_r21.md).
    assert(Bench.AcknowledgedHistorical.isEmpty)
    // the mechanism itself stays armed: a future acknowledgment fires
    // only on an exact tightest-prev match, only at sf0.1, only by name
    assert(Bench.acknowledged("q_dedup_exact",
      Bench.FloorEntry(1.0, List(0.234), "r1", "x")).isEmpty)
  }

  test("floors cover exactly the declared surface: no floorless query, " +
      "no stale floor") {
    val in = getClass.getResourceAsStream("/graft/bench_floors_sf0.1.json")
    val t = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val floors = Bench.parseFloors(t).keySet
    val declared = SparkEntry.defs.map(_.name).toSet
    val floorless = declared -- floors
    val stale = floors -- declared
    assert(floorless.isEmpty,
      s"declared queries with no floor (new query shipped without a pin): $floorless")
    assert(stale.isEmpty,
      s"floors for queries no longer declared (rename left a stale pin): $stale")
  }
}
