package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the tail-survivability contract of the bench artifact line.
  *
  * The driver captures only the LAST ~2000 chars of [[Bench.renderLine]]
  * (BENCH_r07.json's `tail` field is exactly 2000 chars), so every
  * number a judge compares across rounds — both totals, the slowest
  * queries, the failure count — must live inside that window for a
  * realistic 101-query pack. A full per-query dict is ~3500 chars and
  * silently evicts anything printed after it; r7 lost the warm numbers
  * that way and an over-correction would have lost cold_total. This
  * spec fails if the end-block ever regrows past the capture window.
  */
class BenchLineSpec extends AnyFunSuite {

  private val names = (1 to 101).map(i => f"q$i%02d_some_operator_name")
  private val warm = names.zipWithIndex.map { case (n, i) => n -> (0.123456789 + i * 0.037) }
  private val cold = names.zipWithIndex.map { case (n, i) => n -> (0.923456789 + i * 0.041) }

  test("both totals, top-10 dicts and failed count fit in the captured 2000-char tail") {
    val line = Bench.renderLine(warm, cold, "/root/testdata/sf0.1")
    val tail = line.takeRight(2000)
    for (key <- Seq("\"warm_top\":{", "\"cold_top\":{", "\"failed\":", "\"cold_total\":", "\"warm_total\":", "\"sf\":"))
      assert(tail.contains(key), s"$key missing from 2000-char tail (end block too large or misordered)")
    // the end block must be ordered so totals come last — a future full
    // dict inserted after them would evict them again
    assert(tail.indexOf("\"cold_total\":") < tail.indexOf("\"warm_total\":"))
    assert(tail.indexOf("\"warm_total\":") < tail.indexOf("\"sf\":"))
  }

  test("full dicts still present for untruncated readers, with the spec'd keys") {
    val line = Bench.renderLine(warm, cold, "/tmp/sf")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains("\"queries\":{"))
    assert(line.contains("\"cold\":{"))
    names.foreach(n => assert(line.contains("\"" + n + "\":")))
  }

  test("failed queries (-1 sentinel) are excluded from totals and top-10 but counted") {
    val w = warm.updated(0, warm.head._1 -> -1.0)
    val line = Bench.renderLine(w, cold, "/tmp/sf")
    assert(line.contains("\"failed\":1"))
    val warmTotal = w.map(_._2).filter(_ >= 0).sum
    assert(line.contains(s""""warm_total":$warmTotal"""))
    // the -1 row must not surface as a top-10 "slowest" entry
    val top = line.substring(line.indexOf("\"warm_top\":"), line.indexOf("\"cold_top\":"))
    assert(!top.contains(w.head._1))
  }

  test("top-10 dicts are the genuinely slowest queries, descending") {
    val line = Bench.renderLine(warm, cold, "/tmp/sf")
    val top = line.substring(line.indexOf("\"warm_top\":{") + 12, line.indexOf("},\"cold_top\""))
    val entries = top.split(",").map(_.split(":")).map(a => a(0).replace("\"", "") -> a(1).toDouble)
    assert(entries.length == 10)
    assert(entries.map(_._2).toSeq == entries.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    val expected = warm.sortBy(-_._2).take(10).map(_._1).toSet
    assert(entries.map(_._1).toSet == expected)
  }
}
