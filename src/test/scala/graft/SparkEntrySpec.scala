package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants for [[SparkEntry]]. */
class SparkEntrySpec extends AnyFunSuite with Matchers with SparkSpec {

  test("entry (flagship) returns rows on the smoke fixture") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
  }

  test("every oracle key names a declared query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    os -- qs shouldBe empty // an orphan oracle would silently never run
    all(qs.toSeq) should fullyMatch regex "q\\d+_[a-z0-9_]+"
    // every declared query must have a DuckDB oracle (q39 gained its
    // byte-fold/BMP-header oracle in round 6, closing the last carve-out)
    (qs -- os) shouldBe empty
  }

  test("oracle SQL is syntactically loadable (no stray quotes breaking the dump)") {
    SparkEntry.oracleSql.values.foreach { sql =>
      sql should not include "\"\"\""
      sql.trim should not be empty
    }
  }

  test("bench JSON line fits the driver's stdout tail capture") {
    // The driver keeps only the last ~2000 bytes of Bench output (plus
    // sbt's trailing "[success]" line inside the same window); round 3's
    // 2060-byte line arrived truncated and was recorded unparsed. This
    // pins the HARD byte budget only: jsonLine degrades precision
    // 3->2->1->0 decimals by design as the battery grows, so the test
    // fails only when even whole-second rendering cannot fit — the point
    // where query names themselves must shrink.
    val worst = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 88.888)
    val line = Bench.jsonLine(worst, "/root/testdata/sf0.1")
    line.length should be <= 1840
    line should startWith("{\"metric\":\"total\"")
    line should endWith("}")
    // a realistic full-battery result must keep sub-second resolution —
    // past 84 queries full names no longer fit at 0.1 s, so the keys
    // degrade to their unique qNN ordinals BEFORE the values lose
    // precision (BASELINE.md documents the prefix mapping); past ~149
    // queries a uniformly-3-decimal line no longer fits the byte
    // budget either, so the adaptive fallback drops to centisecond
    // values — still sub-second, and only when the line demands it
    // (real lines keep ms while their digit mix fits)
    // a REALISTIC digit mix (modeled on the r16 driver line: mostly
    // sub-second, some 1-5 s, a few 10+ s — mean entry ~9.4 B incl.
    // comma; the r16 line was 1784 B at 182 entries). Uniform
    // worst-case values are pinned by `worst` above for the BYTE cap
    // only: at 186 uniform-3-char values overflow decisecond by a few
    // bytes and the adaptive ladder drops ONLY such a line to the
    // whole-second floor — real lines keep sub-second while their
    // digit mix fits, which this pins at the CURRENT battery size
    val realistic = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .map { case (k, i) =>
        k -> (if (i % 37 == 0) 10.0 + (i % 5) // the q162-class outliers
          else if (i % 7 == 0) 1.0 + (i % 40) / 10.0 // 1-5 s rows
          else (i % 9 + 1) / 10.0) // the sub-second bulk
      }
    // the REAL driver line always carries the checked-in anchors (the
    // battery passed the 198-row ladder ceiling at row 199, so a full
    // anchor-less realistic mix now rides the whole-second floor; with
    // anchors, the ELIDE tiers keep deciseconds for exactly the rows
    // the 2x gate reads — at/under-1.5x rows leave the map into "ok")
    val sfAnchors = Bench.loadAnchors("sf0.1", "BENCH_ANCHORS.txt")
    val rLine = Bench.jsonLine(realistic, "/root/testdata/sf0.1",
      anchors = sfAnchors)
    rLine.length should be <= 1840
    rLine should include(""""ok":""") // elision fired at this size
    // sub-second resolution survives for shipped rows: some over-anchor
    // row keeps its tenth (never the all-whole-second floor)
    rLine should include regex """:\d+\.\d"""
    // the shortened keys stay unique and keep their ordinal — at the
    // round-16 battery size (170) the 1-decimal qNN tier overflows by
    // ~13 bytes, so the keys degrade further to the bare ordinal
    // before any value rounds to whole seconds
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    prefixes.distinct.size shouldBe prefixes.size
    // every over-1.5x-anchor row ships; elided count accounts for the rest
    val shipped = realistic.count { case (k, v) =>
      sfAnchors.get(k.takeWhile(_ != '_')).forall(a => v > 1.5 * a) }
    val okN = """"ok":(\d+)""".r.findFirstMatchIn(rLine).get.group(1).toInt
    okN shouldBe realistic.size - shipped
    // worst case WITH the adjudication field (cap of 5 re-run outliers)
    // still fits the same tail-capture budget
    val adj = worst.take(5).map { case (n, _) => n -> 88.888 }
    val aLine = Bench.jsonLine(worst, "/root/testdata/sf0.1", adjudicated = adj)
    aLine.length should be <= 1840
    aLine should include("\"adjudicated\":{")
    // GROWTH headroom: the degradation tiers must keep a 190-query
    // battery inside the driver's ~1850-byte capture (r13 shipped 1834
    // bytes at 152 queries — 16 bytes of margin; this pins the next
    // tiers before a new query can truncate the line, the r3 failure
    // mode). At 170 uniform-0.488 queries the 1-decimal qNN tier
    // overflows, the bare-ordinal tier carries decisecond values to
    // ~185; past that the whole-second floor holds the line
    // (BENCH_ANCHORS.txt header records the simulation).
    Seq(170, 185, 190, 200).foreach { n =>
      val grown = (1 to n).map(i => f"q$i%02d_synthetic" -> 0.488)
      val gLine = Bench.jsonLine(grown, "/root/testdata/sf0.1")
      withClue(s"$n queries: ") { gLine.length should be <= 1840 }
      val gAdj = grown.take(5).map { case (name, _) => name -> 88.888 }
      Bench.jsonLine(grown, "/root/testdata/sf0.1", adjudicated = gAdj)
        .length should be <= 1840
    }
    // sub-second resolution survives to 185 via the ordinal tier
    Bench.jsonLine((1 to 185).map(i => f"q$i%02d_synthetic" -> 0.488),
      "/root/testdata/sf0.1") should include(":0.5")
    // the graded whole-render tiers (10 s -> 5 s -> 2 s -> 1 s), plus
    // the LEAN wrapper (failed absent-means-0, whole total), carry a
    // REALISTIC digit mix past the flat-decisecond ceiling: a 193-query
    // battery shaped like the r16 driver line must keep the sub-second
    // bulk's tenth (never the whole-second floor, where 0.4 -> "0"
    // would poison the anchor gate) by rendering only its >= 1-2 s rows
    // whole (simulated ceiling: 193 fits lean at the 1 s tier, 195 does
    // not — the next battery row past 193 must free line bytes first)
    val grownRealistic = (1 to 193).map { i =>
      f"q$i%02d_synthetic" -> (if (i % 37 == 0) 10.0 + (i % 5)
        else if (i % 7 == 0) 1.0 + (i % 40) / 10.0
        else (i % 9 + 1) / 10.0)
    }
    val grLine = Bench.jsonLine(grownRealistic, "/root/testdata/sf0.1")
    grLine.length should be <= 1840
    grLine should include(":0.5") // the bulk keeps its tenth
    // a 3.1 s row rides whichever graded tier the line landed on —
    // whole ("3") under byte pressure, decisecond ("3.1") otherwise —
    // but never disappears into "0"
    grLine should (include(""""21":3.1""") or include(""""21":3,"""))
  }

  test("past the exhausted key ladder the ELIDE tiers hold deciseconds " +
      "for every over-anchor row at 210+ battery rows") {
    // the round-18 ladder (bare+hyper+ultra-lean) is exhausted at ~198
    // worst-case rows; row 199+ rides the elide tiers instead of the
    // whole-second floor: at/under-1.5x-anchor rows leave the map
    // (absent = at anchor, counted in "ok"), so the rows the 2x anchor
    // gate actually reads keep their tenth at ANY battery size
    Seq(210, 230, 300).foreach { n =>
      val rows = (1 to n).map { i =>
        f"q$i%02d_synthetic" -> (if (i % 23 == 0) 12.0 + (i % 5) // >10 s
          else if (i % 11 == 0) 3.1 // 6.2x its anchor — must ship
          else 0.5) // at anchor — elidable
      }
      val anchors = rows.map { case (k, _) =>
        k.takeWhile(_ != '_') -> 0.5 }.toMap
      val line = Bench.jsonLine(rows, "/root/testdata/sf0.1",
        anchors = anchors)
      withClue(s"$n rows: ") {
        line.length should be <= 1840
        line should include(""":3.1""") // over-anchor rows keep the tenth
        line should include(""""ok":""") // elided rows are counted
        line should not include ":0.5" // at-anchor rows elide
      }
    }
    // adjudication worst case rides along: every over-2x row re-read
    val rows = (1 to 210).map { i =>
      f"q$i%02d_synthetic" -> (if (i % 3 == 0) 3.1 else 0.5) }
    val anchors = rows.map { case (k, _) =>
      k.takeWhile(_ != '_') -> 0.5 }.toMap
    val adj = rows.filter(_._2 > 1.0).map { case (k, _) => k -> 0.5 }
    Bench.jsonLine(rows, "/root/testdata/sf0.1", adjudicated = adj,
      anchors = anchors).length should be <= 1840
    // no anchors -> nothing elides -> the pre-elide ladder still rules
    // (the whole-second floor, as before this tier existed)
    val noAnchor = Bench.jsonLine(rows, "/root/testdata/sf0.1")
    noAnchor.length should be <= 1840
    noAnchor should not include """"ok":"""
    // values that elide still count in the headline total: the 210-row
    // elide line's whole-rendered total must cover the full battery sum,
    // not just the shipped rows
    val all210 = (1 to 210).map { i =>
      f"q$i%02d_synthetic" -> (if (i % 11 == 0) 3.1 else 0.5) }
    val a210 = all210.map { case (k, _) => k.takeWhile(_ != '_') -> 0.5 }
      .toMap
    val line210 = Bench.jsonLine(all210, "/root/testdata/sf0.1",
      anchors = a210)
    val rendered = """"value":(\d+)""".r.findFirstMatchIn(line210)
      .get.group(1).toDouble
    rendered shouldBe all210.map(_._2).sum +- 1.0
  }

  test("checked-in anchors parse and cover the battery at both SFs") {
    val battery = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_')).toSet
    Seq("sf0.1", "sf0.01").foreach { sf =>
      val anchors = Bench.loadAnchors(sf, "BENCH_ANCHORS.txt")
      anchors.keySet shouldBe battery // stale or missing rows both fail
      all(anchors.values) should be > 0.0
    }
    // an unrecorded sf disables adjudication instead of crashing the bench
    Bench.loadAnchors("sf99", "BENCH_ANCHORS.txt") shouldBe empty
    Bench.loadAnchors("sf0.1", "/nonexistent/anchors.txt") shouldBe empty
  }

  test("synthetic-slow outlier selection: >2x anchor re-runs, the rest don't") {
    val anchors = Map("q01" -> 1.0, "q02" -> 1.0, "q03" -> 1.0, "q04" -> 1.0)
    val results = Seq(
      "q01_fine" -> 1.9,       // under 2x — left alone
      "q02_slow" -> 4.0,       // 4x — adjudicated
      "q03_crashed" -> -1.0,   // failed — a crash is not a timing artifact
      "q04_worse" -> 9.0,      // 9x — adjudicated, ranked first
      "q05_no_anchor" -> 99.0) // new query, no anchor row — skipped
    Bench.outliers(results, anchors) shouldBe Seq("q04_worse", "q02_slow")
    // EVERY tripping row adjudicates by default (the round-18 record left
    // six over-2x rows unverified under the old ~5 cap — VERDICT r18
    // item 1); the cap remains available as an explicit knob
    val many = (10 to 30).map(i => s"q$i" -> 10.0)
    val manyAnchors = many.map { case (n, _) => n -> 1.0 }.toMap
    Bench.outliers(many, manyAnchors) should have size many.size
    Bench.outliers(many, manyAnchors, cap = 5) should have size 5
    // both readings ship: original min under queries, re-run adjudicated
    val line = Bench.jsonLine(Seq("q72_salted_join" -> 4.489),
      "/root/testdata/sf0.1", adjudicated = Seq("q72_salted_join" -> 1.99))
    line should include(""""q72_salted_join":4.489""")
    line should include(""""adjudicated":{"q72_salted_join":1.99}""")
    // and the field costs nothing when there were no outliers
    Bench.jsonLine(Seq("q72_salted_join" -> 1.8), "/root/testdata/sf0.1")
      .contains("adjudicated") shouldBe false
  }
}
