package graft.operators

import scala.util.Random
import graft.SparkSpec
import graft.core.{GraftConfig, HanaTypes}

/** Property-style tests (SURVEY.md §5.3): the chunk-plan invariants of the
  * reference's algorithm (`HanaToBQ.java:150-172`) must hold for arbitrary
  * timestamp multisets, chunk sizes, and start offsets. Seeded randomization
  * keeps runs deterministic. */
class ChunkingPropertySpec extends SparkSpec {

  private val rnd = new Random(42)
  private def cases(n: Int): Seq[(List[Long], Long, Long)] =
    (1 to n).map { _ =>
      val ts = List.fill(120)(rnd.nextLong(5001L))
      (ts, 1L + rnd.nextLong(40L), rnd.nextLong(2501L))
    }

  test("intervals always partition [start, sentinel): seeded, contiguous, sentinel-closed") {
    import spark.implicits._
    cases(8).foreach { case (ts, chunk, start) =>
      val df = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("ts", "id")
      val b = Chunking.boundaries(df, "ts", Seq("id"), chunk, start)
      val iv = Chunking.intervals(b, "ts", start)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      assert(iv.head._2 == start)
      assert(iv.last._3 == GraftConfig.Sentinel)
      iv.foreach { case (_, lo, hi) => assert(lo < hi) }
      iv.sliding(2).foreach {
        case List((_, _, h1), (_, l2, _)) => assert(h1 == l2)
        case _ => ()
      }
      // every filtered row falls in exactly one half-open interval
      val kept = ts.filter(_ > start)
      val assigned = kept.map(t => iv.count { case (_, lo, hi) => t >= lo && t < hi })
      assert(assigned.forall(_ == 1))
    }
  }

  test("boundary count == floor(filtered rows / chunkSize) for any input") {
    import spark.implicits._
    cases(6).foreach { case (ts, chunk, start) =>
      val df = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("ts", "id")
      val k = Chunking.boundaries(df, "ts", Seq("id"), chunk, start).count()
      assert(k == ts.count(_ > start) / chunk)
    }
  }

  test("distributed and parity boundary computations agree for any input") {
    import spark.implicits._
    cases(6).foreach { case (ts, chunk, start) =>
      val df = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("ts", "id")
      val a = Chunking.boundaries(df, "ts", Seq("id"), chunk, start)
        .collect().map(_.getLong(0)).toList
      val b = Chunking.boundariesDistributed(df, "ts", Seq("id"), chunk, start, 5)
        .collect().map(_.getLong(0)).toList
      assert(a == b)
    }
  }

  test("distributed interval zip is bit-identical to the parity form for any input") {
    import spark.implicits._
    cases(6).foreach { case (ts, chunk, start) =>
      val df = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("ts", "id")
      // forced-small chunkSize -> many boundaries, exercising partition edges
      val b = Chunking.boundaries(df, "ts", Seq("id"), chunk, start)
      val parity = Chunking.intervals(b, "ts", start)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val dist = Chunking.intervalsDistributed(b, "ts", start, numPartitions = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      assert(parity == dist)
    }
  }

  test("type map is total over the 21 declared types and fails closed otherwise") {
    val declared = HanaTypes.mapping(HanaTypes.RefCompatible).keys.toList
    declared.foreach { t =>
      HanaTypes.toSpark(t) // never throws for declared
      HanaTypes.toSpark(t.toLowerCase)
    }
    (1 to 50).foreach { _ =>
      val s = Random.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      if (!declared.contains(s.toUpperCase))
        intercept[IllegalArgumentException](HanaTypes.toSpark(s))
    }
  }
}
