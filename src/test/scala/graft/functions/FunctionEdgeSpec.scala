package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}

/** Edge-input contracts of the exposed SQL functions (reachable with
  * arbitrary arrays via `minhash_signature`/`simhash32`, unlike the NearDup
  * call sites which always pass >=1 non-null shingle), plus a regression for
  * the codegen local-name collision that silently dropped whole projections
  * to interpreted mode in round 1. */
class FunctionEdgeSpec extends SparkSpec {

  private def ensureRegistered(): Unit = GraftExtensions.registerAll(spark)

  test("minhash_signature: empty array yields all-NULL signature (array_min semantics)") {
    ensureRegistered()
    val row = spark.sql(
      "SELECT minhash_signature(CAST(array() AS ARRAY<STRING>), 4) AS sig").head()
    val sig = row.getSeq[String](0)
    assert(sig.length == 4 && sig.forall(_ == null))
  }

  test("minhash_signature: null elements are skipped, not NPE") {
    ensureRegistered()
    val both = spark.sql(
      """SELECT minhash_signature(array('a', CAST(NULL AS STRING), 'b'), 4) AS withNull,
        |       minhash_signature(array('a', 'b'), 4) AS withoutNull""".stripMargin).head()
    assert(both.getSeq[String](0) == both.getSeq[String](1))
  }

  test("simhash32: null elements skipped; empty array fingerprints to 0") {
    ensureRegistered()
    val r = spark.sql(
      """SELECT simhash32(array('a', CAST(NULL AS STRING), 'b')) AS withNull,
        |       simhash32(array('a', 'b')) AS withoutNull,
        |       simhash32(CAST(array() AS ARRAY<STRING>)) AS empty""".stripMargin).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(2) == 0L)
  }

  test("minhash_signature rejects non-foldable / non-INT numHashes with a clear error") {
    ensureRegistered()
    val nonFoldable = intercept[AnalysisException] {
      spark.sql("SELECT minhash_signature(array('a'), CAST(rand() * 4 AS INT))").collect()
    }
    assert(nonFoldable.getMessage.contains("foldable INT literal"))
    val wrongType = intercept[AnalysisException] {
      spark.sql("SELECT minhash_signature(array('a'), 4L)").collect()
    }
    assert(wrongType.getMessage.contains("foldable INT literal"))
  }

  test("two instances of a native expression in one projection stay codegen'd") {
    import spark.implicits._
    // CODEGEN_ONLY turns the round-1 "Redefinition of local variable" janino
    // failure into a hard error instead of an interpreted-mode fallback.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq(
        (Array(1.0f, 0.0f), Array(1.0f, 1.0f), Array("a", "b"), Array("b", "c")))
        .toDF("u", "v", "s", "t")
      val r = df.select(
        VectorFunctions.cosine_similarity(col("u"), col("v")).as("c1"),
        VectorFunctions.cosine_similarity(col("v"), col("u")).as("c2"),
        VectorFunctions.sorted_intersect_count(col("s"), col("t")).as("i1"),
        VectorFunctions.sorted_intersect_count(col("t"), col("s")).as("i2")).head()
      assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2)) < 1e-15)
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("cosine_similarity: null algebra matches the cosineHof composition") {
    ensureRegistered()
    // unequal lengths / null elements poison to NULL (zip_with padding),
    // never a silent min-length truncation or null-read-as-0.0 — the same
    // defect class fixed in mat_vec in round 7
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT))) AS len_mismatch,
        |  cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS null_elem,
        |  cosine_similarity(CAST(NULL AS ARRAY<FLOAT>),
        |                    array(CAST(1.0 AS FLOAT))) AS null_array,
        |  cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                    array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS self
        |""".stripMargin).head()
    assert(r.isNullAt(0), "unequal lengths must be NULL, not min-length truncation")
    assert(r.isNullAt(1), "a null element must poison, not read as 0.0")
    assert(r.isNullAt(2))
    assert(r.getDouble(3) == 1.0)
  }

  test("squared_distances: a null element skips its term (sum-skips-null), never reads 0.0") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(1.0f), Some(3.0f)))) // (withNull, withoutThatDim)
      .toDF("u", "w")
    val cents3 = typedlit(Seq(Seq(0.0, 5.0, 0.0)))
    val cents2 = typedlit(Seq(Seq(0.0, 0.0)))
    val r = df.select(
      VectorFunctions.squared_distances(col("u"), cents3).as("withNull"),
      VectorFunctions.squared_distances(col("w"), cents2).as("control")).head()
    // u = [1, NULL, 3] vs c = [0, 5, 0]: the NULL dim contributes nothing
    // (the exploded form's (v-c)*(v-c) is NULL there and sum skips it) —
    // NOT (0-5)^2 = 25, which the old bitmap-ignoring read produced.
    val got = r.getSeq[java.math.BigDecimal](0).head
    val want = r.getSeq[java.math.BigDecimal](1).head // 1^2 + 3^2 = 10
    assert(got.compareTo(want) == 0, s"null dim leaked into the sum: $got vs $want")
  }

  test("word_grams: native one-pass form is bit-identical to the HOF chain") {
    import spark.implicits._
    // adversarial corners: empty, all-punctuation, fewer tokens than n,
    // exactly n, repeats (distinct dedupe + first-occurrence order), case
    // folding, digit runs, leading/trailing separators, long separator runs
    val texts = Seq(
      "", "!!! ??? ...", "one", "a b", "a b c d e f g h",
      "a b c d e f g h i j k", "x x x x x x x x x x",
      "The QUICK brown FOX, the quick brown fox!",
      "a1 b2 c3 -- a1 b2 c3 -- a1 b2 c3",
      "  leading and   trailing   ", "tab\tsep\nnewline",
      "123 456 789 0", "mixedCASE42 under_score dash-dash")
    val df = texts.toDF("text")
    for (n <- Seq(1, 2, 8)) {
      val w = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
      val hof = array_distinct(transform(
        sequence(lit(1), greatest(size(w) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      val rows = df.select(
        TextHashFunctions.word_grams(col("text"), n).as("native"),
        hof.as("hof")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text='$t': native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("mat_vec: null vector element null-propagates (HOF contract), never reads as 0") {
    // aggregate(zip_with(row, vec, _*_), 0.0, _+_) with a null element
    // poisons the accumulator to null — the native expression must match,
    // not silently read the null slot as 0.0 through ArrayData.getDouble
    val df = spark.sql(
      """SELECT CAST(array(1.0, NULL, 3.0) AS ARRAY<DOUBLE>) AS v,
        |       array(CAST(array(2.0, 5.0, 7.0) AS ARRAY<DOUBLE>),
        |             CAST(array(1.0, 1.0, 1.0) AS ARRAY<DOUBLE>)) AS m,
        |       CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>) AS vok""".stripMargin)
    val r = df.select(
      VectorFunctions.mat_vec(col("v"), col("m")).as("nulled"),
      VectorFunctions.mat_vec(col("vok"), col("m")).as("clean")).head()
    val nulled = r.getSeq[Any](0)
    assert(nulled == Seq(null, null), s"got $nulled")
    assert(r.getSeq[Double](1) == Seq(2.0 + 10.0 + 21.0, 6.0))
  }

  test("mat_vec: null matrix row yields a null output element") {
    val df = spark.sql(
      """SELECT CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>) AS v,
        |       array(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>),
        |             CAST(NULL AS ARRAY<DOUBLE>)) AS m""".stripMargin)
    val out = df.select(VectorFunctions.mat_vec(col("v"), col("m"))).head().getSeq[Any](0)
    assert(out == Seq(11.0, null), s"got $out")
  }

  test("mat_vec: declared containsNull includes the matrix OUTER null level " +
      "and the null survives an unsafe-row shuffle barrier") {
    import org.apache.spark.sql.types._
    // matrix with non-null INNER elements but nullable OUTER rows — the
    // round-8 dataType only consulted the inner level, declaring
    // containsNull=false while compute() emits a null output element for
    // the null row; unsafe serialization trusting that schema could read
    // the slot as 0.0
    val schema = StructType(Seq(
      StructField("v", ArrayType(DoubleType, containsNull = false)),
      StructField("m", ArrayType(
        ArrayType(DoubleType, containsNull = false), containsNull = true))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq(1.0, 2.0), Seq(Seq(3.0, 4.0), null)))
    val df = spark.createDataFrame(rows, schema)
    val expr = VectorFunctions.mat_vec(col("v"), col("m"))
    val proj = df.select(expr.as("out"))
    val outType = proj.schema("out").dataType.asInstanceOf[ArrayType]
    assert(outType.containsNull,
      "output containsNull must be true when the matrix outer level is nullable")
    // round-trip through an exchange (UnsafeRow serialization honors schema)
    val got = proj.repartition(2).head().getSeq[Any](0)
    assert(got == Seq(11.0, null), s"got $got")
  }
}
