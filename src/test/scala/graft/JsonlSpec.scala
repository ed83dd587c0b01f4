package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** JSONL interchange: the q81 round-trip contract on adversarial content
  * (the fixture gate only sees ASCII word salad — this spec is where
  * escaping actually gets exercised). */
class JsonlSpec extends SparkSpec {

  test("q81 fixture round trip equals the source table") {
    val got = graft.sources.Jsonl.roundTrip(spark, sf).collect().map(_.toSeq).toSeq
    val want = Tables.documents(spark, sf).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("JSONL write->read is lossless on quotes, escapes, newlines, unicode, nulls") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text"),
      (2L, "tab\there and \"quotes\" and a \\ backslash"),
      (3L, "embedded\nnewline and carriage\rreturn"),
      (4L, "unicode: été 中文 emoji 😀 nul-adjacent "),
      (5L, null.asInstanceOf[String]),
      (6L, ""))
    val df = rows.toDF("doc_id", "text")
    val out = Files.createTempDirectory("graft-jsonl-spec")
    df.write.mode("overwrite").json(out.toString)
    val back = spark.read.schema(df.schema).json(out.toString)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == rows.sortBy(_._1))
    // the single-line invariant JSONL depends on: no raw newline ever
    // reaches the file (escaped as \n inside the JSON string)
    val lines = spark.read.text(out.toString).count()
    assert(lines == rows.size.toLong, "one JSON object per line, always")
  }

  test("q103: the salted corruption is real — FAILFAST refuses what PERMISSIVE absorbs") {
    import org.apache.spark.sql.types._
    val dir = TestSpark.sf
    val salted = graft.sources.Robustness.saltedJsonl(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
    // PERMISSIVE (the q102/q103 path) accounts for every line
    val buckets = graft.sources.Robustness.corruptTolerantRead(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets("CORRUPT") == graft.sources.Robustness.CorruptLines.toLong)
    assert(buckets.filterKeys(_ != "CORRUPT").values.sum == docs.count())
    // FAILFAST on the identical input must throw — proving the gate
    // exercises genuine corruption, not a parser quirk
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.schema(docs.schema)
        .option("mode", "FAILFAST")
        .json(salted.resolve("data").toString)
        .count()
    }
    assert(e.getMessage.contains("FAILFAST") ||
      String.valueOf(e.getCause).contains("Malformed") ||
      String.valueOf(e.getCause).contains("FAILFAST"))
  }
}
