package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Validates the machine-readable provenance map in BASELINE_QUERIES.json
  * (round-18 item 5: the per-row freeze provenance — which windows priced
  * the row, under which convention, what it replaced — moved from a
  * ~4,000-char prose string only a human could parse into a structured
  * map written exclusively by tools/freeze_baseline.py). Two consumers
  * depend on the schema staying exact: the freeze tool's own `validate`
  * (Python side) and Bench's positional window-count grep
  * ([[Bench.parseBaselineWindows]] — it greps rather than parses, which
  * is only sound while every entry's key order is (frozen_s, n_windows,
  * ...)); this spec holds both against a real JSON read of the committed
  * file.
  */
class BaselineProvenanceSpec extends AnyFunSuite {

  private val conventions =
    Set("min", "serve_priced", "publish_inclusive", "deliberate_config")

  private lazy val txt = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("BASELINE_QUERIES.json")), "UTF-8")
  private lazy val root = new ObjectMapper().readTree(txt)

  test("header invariants: n_queries and total_s derive from query_min_s") {
    val qm = root.get("query_min_s")
    assert(root.get("n_queries").asInt() == qm.size())
    val sum = qm.properties().asScala.map(_.getValue.asDouble()).sum
    assert(math.abs(root.get("total_s").asDouble() - sum) < 0.06,
      s"total_s ${root.get("total_s")} vs sum $sum")
    // the prose summary survives as a summary, not the record
    assert(root.get("frozen_from").isTextual)
  }

  test("every frozen entry has a well-formed provenance row") {
    val qm = root.get("query_min_s")
    val prov = root.get("provenance")
    assert(prov != null && prov.isObject, "provenance map missing")
    qm.properties().asScala.foreach { e =>
      val q = e.getKey
      val p = prov.get(q)
      assert(p != null, s"$q: no provenance entry")
      // frozen_s mirrors the gate value exactly
      assert(p.get("frozen_s").asDouble() == e.getValue.asDouble(),
        s"$q: frozen_s != query_min_s entry")
      // at least one recorded window, and the count is consistent
      val ws = p.get("windows")
      assert(ws != null && ws.isArray && ws.size() >= 1,
        s"$q: windows missing/empty")
      assert(p.get("n_windows").asInt() == ws.size(),
        s"$q: n_windows != windows.size")
      ws.asScala.foreach { w =>
        assert(w.isArray && w.size() == 2 && w.get(0).isTextual &&
          w.get(1).isNumber, s"$q: malformed window $w")
      }
      assert(conventions(p.get("convention").asText()),
        s"$q: unknown convention ${p.get("convention")}")
      // no key-order assertion: Bench parses real JSON (round-18
      // review replaced the positional grep), so the freeze tool's
      // fixed write order is diff-stability style, not a contract
      // refrozen, when present, records (label, prior value) pairs
      Option(p.get("refrozen")).foreach { rf =>
        assert(rf.isArray && rf.asScala.forall(r =>
          r.isArray && r.size() == 2 && r.get(0).isTextual &&
            r.get(1).isNumber), s"$q: malformed refrozen $rf")
      }
    }
    // no orphaned provenance for unfrozen queries
    prov.properties().asScala.foreach { e =>
      assert(qm.has(e.getKey), s"${e.getKey}: provenance without entry")
    }
  }

  test("Bench reads the same window counts this spec parses from the committed file") {
    val benchView = Bench.parseBaselineWindows(txt)
    val prov = root.get("provenance")
    val parsed = prov.properties().asScala
      .map(e => e.getKey -> e.getValue.get("n_windows").asInt()).toMap
    assert(benchView == parsed,
      s"Bench/spec drift: ${(benchView.toSet diff parsed.toSet).take(3)} " +
        s"/ ${(parsed.toSet diff benchView.toSet).take(3)}")
    // so the suspect annotation has a count for every row a driver
    // window could flag
    assert(root.get("query_min_s").properties().asScala
      .forall(e => benchView.contains(e.getKey)))
    // and a malformed/absent provenance degrades to empty, never throws
    assert(Bench.parseBaselineWindows("{not json").isEmpty)
    assert(Bench.parseBaselineWindows("{\"provenance\": 3}").isEmpty)
  }
}
