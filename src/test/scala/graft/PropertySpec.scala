package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.VideoFns

/** Property-based coverage of the pure functions (SURVEY.md §5.2).
  * scalacheck Gen sampled manually (no scalatestplus bridge offline). */
class FnPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(20260812L))

  test("pyRound is banker's rounding (agrees with Math.rint)") {
    samples(Gen.chooseNum(-1e9, 1e9)).foreach { x =>
      assert(VideoFns.pyRound(x) == Math.rint(x).toLong, s"x=$x")
    }
    // explicit ties
    assert(VideoFns.pyRound(0.5) == 0 && VideoFns.pyRound(1.5) == 2
      && VideoFns.pyRound(2.5) == 2 && VideoFns.pyRound(-0.5) == 0)
  }

  test("sizeofFmt shape + approximate round-trip") {
    val unitVal = Map("B" -> 1d, "KiB" -> 1024d, "MiB" -> math.pow(1024, 2),
      "GiB" -> math.pow(1024, 3), "TiB" -> math.pow(1024, 4),
      "PiB" -> math.pow(1024, 5), "EiB" -> math.pow(1024, 6))
    val re = "^\\s*([0-9]+\\.[0-9])(B|KiB|MiB|GiB|TiB|PiB|EiB|ZiB|YiB)$".r
    samples(Gen.chooseNum(0L, 1L << 60)).foreach { n =>
      VideoFns.sizeofFmt(n.toDouble) match {
        case re(num, unit) =>
          val back = num.toDouble * unitVal.getOrElse(unit, math.pow(1024, 7))
          assert(n == 0 || math.abs(back - n) / math.max(n.toDouble, 1) <= 0.06,
            s"$n -> $num$unit")
        case other => fail(s"unexpected shape: $other")
      }
    }
  }

  test("parseTitleYear inverts well-formed [year] title naming") {
    val titleGen = Gen.alphaNumStr
      .suchThat(t => t.nonEmpty && !t.contains("[") && !t.contains("]"))
    val pairs = samples(Gen.zip(titleGen, Gen.chooseNum(1900, 2099)), 200)
    pairs.foreach { case (t, y) =>
      val (title, year) = VideoFns.parseTitleYear(s"[$y] $t")
      assert(title == t.trim && year == y.toString)
      // identifier tokens are stripped wherever they appear
      val (title2, year2) = VideoFns.parseTitleYear(s"[$y] $t [3D][AV1][4K]")
      assert(title2 == t.trim && year2 == y.toString)
    }
  }

  test("hms concise shape is always Nh:Nm:Ns-like") {
    val re = "^([0-9]+h:)?([0-9]+m:)?[0-9]+(\\.[0-9]+)?s$".r
    samples(Gen.chooseNum(0.0, 500000.0)).foreach { s =>
      assert(re.findFirstIn(VideoFns.hms(s, concise = true)).isDefined, s"s=$s")
    }
  }
}

/** Randomized pipeline invariants over generated corpora. */
class PipelinePropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.operators._
  import graft.sources.Tsv

  private val rnd = new scala.util.Random(20260812L)

  private def randomListing(n: Int) = {
    import spark.implicits._
    (1 to n).map { k =>
      val id = rnd.nextInt(5000)
      FileListing(
        s"/vol${id % 3}/d${id % 7}/f$id/[${1980 + id % 40}] Movie ${id % 59}.mkv",
        math.abs(rnd.nextLong() % (1L << 40)), s"vol${id % 3}")
    }.distinctBy(_.path).toDF("path", "sizeBytes", "volume")
  }

  test("TSV render/parse round-trip recovers typed fields") {
    import spark.implicits._
    val listing = randomListing(300)
    val built = VideoPipeline.build(listing, Seq.empty[(String, Long)]
      .toDF("path", "size_bytes"), new StubProber)
    val parsed = Tsv.parseLines(
      Tsv.renderLines(built).withColumnRenamed("line", "value"))
    val a = built.select(
        coalesce($"width", lit(0)).as("width"), $"size_bytes", $"title",
        $"compression_candidate", $"volume", $"path_on_volume")
      .collect().map(_.toSeq).toSet
    val b = parsed.select(
        coalesce($"width", lit(0)).as("width"), $"size_bytes", $"title",
        $"compression_candidate", $"volume", $"path_on_volume")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("anti-join novel set is disjoint from existing and covers incoming") {
    val incoming = randomListing(400)
    val existing = incoming.sample(withReplacement = false, 0.5, seed = 7)
      .select("path")
    val novel = VideoPipeline.novelFiles(incoming, existing)
    assert(novel.join(existing, Seq("path"), "inner").count() == 0)
    assert(novel.count() + existing.join(incoming, Seq("path"), "left_semi").count()
      == incoming.count())
  }

  test("merge preserves row multiplicity (union all)") {
    val a = randomListing(150)
    val b = randomListing(100)
    assert(VideoPipeline.merge(
      Seq(VideoPipeline.scanFilters(a), VideoPipeline.scanFilters(b))
        .map(df => VideoPipeline.deriveColumns(
          VideoPipeline.probeStage(df, new StubProber)))).count()
      == VideoPipeline.scanFilters(a).count() + VideoPipeline.scanFilters(b).count())
  }

  test("whole-line sort is a descending permutation") {
    import spark.implicits._
    val built = VideoPipeline.build(randomListing(200),
      Seq.empty[(String, Long)].toDF("path", "size_bytes"), new StubProber)
    val lines = Tsv.renderLines(built)
    val sorted = Tsv.sortLinesDesc(lines).as[String].collect()
    assert(sorted.sorted(Ordering[String].reverse).toSeq == sorted.toSeq)
    assert(sorted.sorted.toSeq == lines.as[String].collect().sorted.toSeq)
  }
}
