package graft.expressions

import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.pipeline.{Crypto, Validator}

/** Native Catalyst expression spec: SQL-registered usage, null/error
  * semantics, codegen + interpreted parity, and agreement with the
  * plain-Scala reference implementations. */
class GraftExpressionsSpec extends SparkSuite {

  private def sql1(q: String): Any = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(q).collect()(0).get(0)
  }

  test("canonical_json sorts top-level keys only (JsonUtils.kt:7-14)") {
    assert(sql1("""SELECT canonical_json('{"b":{"z":1,"a":2},"a":3}')""")
      == """{"a":3,"b":{"z":1,"a":2}}""")
    assert(sql1("""SELECT canonical_json('not json')""") == null)
    assert(sql1("""SELECT canonical_json(NULL)""") == null)
  }

  test("canonical_json over a column matches the Scala form (codegen path)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val docs = Seq("""{"z":1,"a":"x"}""", """{"k":[3,2,1],"b":null}""",
      """{"one":{"c":1,"b":2}}""").toDF("j")
    val viaExpr = docs.selectExpr("canonical_json(j)").as[String].collect().toSeq
    val viaScala = docs.as[String].collect().toSeq.map(Validator.sortJsonByKey)
    assert(viaExpr == viaScala)
  }

  test("graft_aes_ctr_decrypt round-trips Crypto.encrypt") {
    val key = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("MD5").digest("expr-key".getBytes))
    val iv = MessageDigest.getInstance("MD5").digest("expr-iv".getBytes)
    val ivB64 = Base64.getEncoder.encodeToString(iv)
    val plain = """{"_id": "00042"}"""
    val ct = Crypto.encrypt(key, iv, plain.getBytes("UTF-8"))
    assert(sql1(s"SELECT graft_aes_ctr_decrypt('$key', '$ivB64', '$ct')") == plain)
    // failure → NULL, never a thrown task error
    assert(sql1(s"SELECT graft_aes_ctr_decrypt('$key', '$ivB64', '%%bad%%')") == null)
    assert(sql1(s"SELECT graft_aes_ctr_decrypt('notakey', '$ivB64', '$ct')") == null)
    assert(sql1(s"SELECT graft_aes_ctr_decrypt(NULL, '$ivB64', '$ct')") == null)
  }

  test("decrypt expression participates in codegen over many rows") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val key = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("MD5").digest("bulk-key".getBytes))
    val rows = (0 until 500).map { i =>
      val iv = MessageDigest.getInstance("MD5").digest(s"iv$i".getBytes)
      (Base64.getEncoder.encodeToString(iv),
        Crypto.encrypt(key, iv, s"plain-$i".getBytes("UTF-8")), i)
    }
    val df = rows.toDF("iv", "ct", "i")
    val out = df.selectExpr(s"graft_aes_ctr_decrypt('$key', iv, ct) AS p", "i")
      .where(col("p") === concat(lit("plain-"), col("i")))
    assert(out.count() == 500)
  }

  test("vec_dot is bitwise-identical to the HOF aggregate form") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("i", "a", "b")
    val out = df.selectExpr(
      "vec_dot(a, b) AS fast",
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v) AS slow")
    // bit-exact equality, not approximate — same left-to-right order
    assert(out.filter(col("fast") =!= col("slow")).count() == 0)
    assert(out.filter(col("fast").isNull).count() == 0)
  }

  test("vec_dot on ragged pairs returns NULL, matching zip_with (no task kill)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (1, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (2, Array(1f, 2f, 3f), Array(1f, 2f)), // ragged
      (3, Array[Float](), Array[Float]())).toDF("i", "a", "b")
    val out = df.selectExpr("i",
      "vec_dot(a, b) AS fast",
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v) AS slow")
      .orderBy("i").collect()
    assert(out(0).getDouble(1) == 14.0 && out(0).getDouble(2) == 14.0)
    assert(out(1).isNullAt(1), "ragged pair must be NULL, not OOB")
    assert(out(1).isNullAt(2), "HOF twin is NULL on ragged too")
    assert(out(2).getDouble(1) == 0.0 && out(2).getDouble(2) == 0.0)
  }

  test("graft_minhash matches the per-k array_min(transform(...)) HOF form bit-exactly") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map(i =>
      (i, Array.fill(rnd.nextInt(50) + 1)(rnd.nextLong().abs % (1L << 60))))
    val df = rows.toDF("i", "sh")
    val coeffs = graft.queries.Dedup.HashCoeffs
    val aList = coeffs.map(_._1).mkString(",")
    val bList = coeffs.map(_._2).mkString(",")
    val p = graft.queries.Dedup.P
    val hofCols = coeffs.zipWithIndex.map { case ((a, b), k) =>
      s"array_min(transform(sh, x -> ($a * (x % $p) + $b) % $p)) AS slow$k"
    }
    val out = df.selectExpr(
      Seq(s"graft_minhash(sh, CAST(array($aList) AS ARRAY<BIGINT>), " +
        s"CAST(array($bList) AS ARRAY<BIGINT>)) AS fast") ++ hofCols: _*)
    coeffs.indices.foreach { k =>
      assert(out.filter(element_at(col("fast"), k + 1) =!= col(s"slow$k"))
        .count() == 0, s"minhash $k diverges from the HOF form")
    }
  }

  test("graft_minhash on an empty shingle set is NULL (array_min(empty) parity)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1, Array.empty[Long]), (2, Array(42L))).toDF("i", "sh")
    val out = df.selectExpr("i",
      "graft_minhash(sh, CAST(array(3, 5) AS ARRAY<BIGINT>), " +
        "CAST(array(7, 11) AS ARRAY<BIGINT>)) AS mh")
      .orderBy("i").collect()
    assert(out(0).isNullAt(1), "empty set must be NULL, not a signature")
    assert(!out(1).isNullAt(1))
  }

  test("graft_minhash rejects mismatched coefficient array lengths at analysis time") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1, Array(42L))).toDF("i", "sh")
    // both arrays are foldable, so the mismatch is knowable before any
    // task runs — must fail analysis, not out-of-bounds at execution
    val e = intercept[Exception] {
      df.selectExpr("graft_minhash(sh, CAST(array(3, 5) AS ARRAY<BIGINT>), " +
        "CAST(array(7) AS ARRAY<BIGINT>))").collect()
    }
    assert(e.getMessage.contains("equal length"), e.getMessage)
  }

  test("graft_l2sq_q6 equals the decimal-fold HOF form and the grouped decimal SUM") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val cent = Array.fill(64)(
      BigDecimal(rnd.nextDouble() * 2 - 1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val arr = cent.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
    val df = vecs.toDF("i", "a")
    val out = df.selectExpr(
      "i",
      s"graft_l2sq_q6(a, $arr) AS fast",
      s"""CAST(aggregate(zip_with(a, $arr,
         |  (x, c) -> CAST((CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)
         |            AS DECIMAL(25,6))),
         |  CAST(0 AS DECIMAL(25,6)),
         |  (acc, t) -> CAST(acc + t AS DECIMAL(25,6))) AS DOUBLE) AS slow""".stripMargin)
    assert(out.filter(col("fast") =!= col("slow")).count() == 0)
    assert(out.filter(col("fast").isNull).count() == 0)
    // grouped decimal SUM over the exploded form (the oracle's shape)
    val grouped = df
      .select(col("i"), posexplode(col("a")))
      .select(col("i"), col("pos"), col("col").cast("double").as("v"))
      .withColumn("c", element_at(typedLit(cent.toSeq), col("pos") + 1))
      .groupBy("i")
      .agg(sum(((col("v") - col("c")) * (col("v") - col("c")))
        .cast(org.apache.spark.sql.types.DecimalType(25, 6)))
        .cast("double").as("grp"))
    val joined = out.join(grouped, "i")
    assert(joined.filter(col("fast") =!= col("grp")).count() == 0)
  }

  test("graft_l2sq_q6 on a ragged pair is NULL") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1, Array(1f, 2f))).toDF("i", "a")
    val out = df.selectExpr(
      "graft_l2sq_q6(a, array(CAST(0.5 AS DOUBLE))) AS d").collect()
    assert(out(0).isNullAt(0))
  }

  test("interpreted path (eval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = CanonicalJson(Literal(UTF8String.fromString("""{"b":1,"a":2}"""),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == UTF8String.fromString("""{"a":2,"b":1}"""))
    assert(CanonicalJson(Literal(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
  }
}
