package graft

import graft.ops.OracleKit
import org.apache.spark.sql.functions._

/** UTF-8 byte-level oracle replay (VERDICT r11 #2, supersedes the r10
  * AsciiOracleGuardSpec): OracleKit's string-hash path now reads true
  * UTF-8 bytes ([[OracleKit.utf8BytesSql]] + `strlen`), so a non-ASCII
  * corpus JOINS the hash gate instead of failing a named guard. This
  * spec runs the actual generated SQL in the oracle engine (python3 +
  * duckdb, the driver's gate tooling — `assume`d, so an environment
  * without it cancels rather than fails):
  *
  *  - non-ASCII grams through the XXH64 string chain → exactly Spark's
  *    xxhash64 (the flip the r11 verdict asked for);
  *  - the byte-list expression itself equals the JVM's UTF-8 encoding;
  *  - the FULL gate (Spark query → parquet, oracle SQL → DuckDB,
  *    exact column/row compare) passes on a planted multilingual
  *    corpus for the fingerprint/rolling-hash/minhash chains. */
class Utf8OracleSpec extends SparkSpec {

  /** Run `sql` in DuckDB; Right(first-column first-row as string) or
    * Left(error message). */
  private def duck(sql: String): Either[String, String] = {
    import scala.sys.process._
    val f = java.nio.file.Files.createTempFile("graft_utf8", ".sql")
    java.nio.file.Files.writeString(f, sql)
    val script =
      s"""import duckdb, sys
         |try:
         |    con = duckdb.connect()
         |    r = con.sql(open(${"\"" + f.toString + "\""}).read()).fetchall()
         |    print("OK", r[0][0] if r else "<empty>")
         |except Exception as e:
         |    print("ERR", str(e))
         |""".stripMargin
    val pf = java.nio.file.Files.createTempFile("graft_utf8", ".py")
    java.nio.file.Files.writeString(pf, script)
    val out = new StringBuilder
    val code = Seq("python3", pf.toString) ! ProcessLogger(l => { out.append(l).append('\n'); () })
    val text = out.toString.trim
    if (code != 0) Left(s"python exited $code: $text")
    else if (text.startsWith("OK ")) Right(text.stripPrefix("OK "))
    else Left(text.stripPrefix("ERR "))
  }

  private lazy val duckAvailable: Boolean = duck("SELECT 1").isRight

  private def lit1(s: String): String = "'" + s.replace("'", "''") + "'"

  private def xxSql(gram: String): String =
    OracleKit.nestedProjections(
      s"SELECT ${lit1(gram)} AS sh", OracleKit.xxhash64StrSteps("sh"),
      s"${OracleKit.toSigned64("hu")} AS h")

  // lengths straddle the XXH64 stripe/tail branches (1-byte tail, 4-byte
  // word, 8-byte word, 32-byte stripes + mixed tail) in several scripts
  private val grams = Seq(
    "a", "word", "brownfox", "the quick brown fox jumps over the lazy dog",
    "é", "café", "smørrebrød", "日本語テスト", "προσθήκη δεδομένων",
    "🚀 emoji Ω mix", "日本語のテキストが三十二バイトを超える長い文字列です")

  test("non-ASCII and ASCII grams through the XXH64 replay equal Spark's xxhash64 exactly") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    val want = spark.range(1).select(
      grams.map(g => xxhash64(lit(g)).cast("string")): _*).head.toSeq
    grams.zip(want).foreach { case (g, w) =>
      duck(xxSql(g)) match {
        case Right(v) => assert(v == w, s"gram '$g': duckdb $v != spark $w")
        case Left(m)  => fail(s"gram '$g' failed the byte-level chain: $m")
      }
    }
  }

  test("utf8BytesSql equals the JVM's UTF-8 encoding byte for byte") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    grams.foreach { g =>
      val want = g.getBytes("UTF-8").map(b => (b & 0xff).toString).mkString("[", ", ", "]")
      duck(s"SELECT ${OracleKit.utf8BytesSql(lit1(g))}") match {
        case Right(v) => assert(v == want, s"'$g': duckdb $v != jvm $want")
        case Left(m)  => fail(s"'$g' byte list failed: $m")
      }
    }
    duck(s"SELECT len(${OracleKit.utf8BytesSql("''")})") match {
      case Right(v) => assert(v == "0", s"empty string must give an empty byte list, got $v")
      case Left(m)  => fail(s"empty string byte list failed: $m")
    }
  }

  test("sparkRound replays Spark's round(double, 6) on midpoint-adversarial quotients") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    // quotient-shaped doubles whose 7th decimal sits at or near ..5:
    // exactly the class where Spark's shortest-repr HALF_UP and DuckDB's
    // scale-the-binary round(DOUBLE, 6) can disagree (q_perplexity_kn's
    // one-row sf0.1 diff)
    val rnd = new scala.util.Random(13)
    val vals = ((1 to 150).map(k => (k * 1000 + 0.5) / 1e6) ++
      (1 to 150).map(k => -(k * 997 + 0.5) / 1e6) ++
      (1 to 100).map(_ => -(rnd.nextInt(8000000) + 0.5) / (rnd.nextInt(97) + 3).toDouble / 1e4) ++
      Seq(3.41638650000000021, -2.0000005, 0.0000005, -0.0000005, 123.4567895)).distinct
    import spark.implicits._
    val want = vals.toDF("x").select(round(col("x"), 6)).collect().map(_.getDouble(0))
    val lits = vals.map(_.toString).mkString("[", ", ", "]")
    val sql =
      s"""SELECT string_agg(CAST(${graft.ops.OracleKit.sparkRound("x", 6)} AS VARCHAR), ',' ORDER BY i)
         |FROM (SELECT unnest($lits) AS x, generate_subscripts($lits, 1) AS i)""".stripMargin
    duck(sql) match {
      case Right(s) =>
        val got = s.split(",").map(_.toDouble)
        assert(got.length == want.length)
        vals.indices.foreach { i =>
          assert(java.lang.Double.compare(got(i), want(i)) == 0,
            s"x=${vals(i)}: duck sparkRound ${got(i)} != spark round ${want(i)}")
        }
      case Left(m) => fail(s"sparkRound batch failed: $m")
    }
  }

  /** The full driver gate on one query over a planted corpus dir: Spark
    * result → parquet, oracle SQL → DuckDB over a `documents` view,
    * exact column/row/value compare (check_oracle.py's semantics). */
  private def gateCompare(name: String, dir: String): Unit = {
    val res = SparkEntry.queries(name)(spark, dir)
    val out = s"$dir/__gate_$name"
    res.write.mode("overwrite").parquet(out)
    val sqlFile = java.nio.file.Files.createTempFile("graft_gate", ".sql")
    java.nio.file.Files.writeString(sqlFile, SparkEntry.oracleSql(name))
    val script =
      s"""import duckdb, pandas as pd
         |con = duckdb.connect()
         |con.sql("CREATE VIEW documents AS SELECT * FROM '$dir/documents.parquet/*.parquet'")
         |a = con.sql("SELECT * FROM '$out/*.parquet'").df()
         |b = con.sql(open('$sqlFile').read()).df()
         |a = a.reindex(sorted(a.columns), axis=1).sort_values(by=sorted(a.columns)).reset_index(drop=True)
         |b = b.reindex(sorted(b.columns), axis=1).sort_values(by=sorted(b.columns)).reset_index(drop=True)
         |assert list(a.columns) == list(b.columns), f"cols {list(a.columns)} vs {list(b.columns)}"
         |assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
         |pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
         |print("OK", len(a))
         |""".stripMargin
    val pf = java.nio.file.Files.createTempFile("graft_gate", ".py")
    java.nio.file.Files.writeString(pf, script)
    import scala.sys.process._
    val outBuf = new StringBuilder
    val code = Seq("python3", pf.toString) ! ProcessLogger(l => { outBuf.append(l).append('\n'); () })
    assert(code == 0 && outBuf.toString.contains("OK"),
      s"$name gate mismatch on the multilingual corpus:\n${outBuf.toString.take(2000)}")
  }

  test("the full hash gate passes on a planted multilingual corpus (winnow/substr/minhash chains)") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    import spark.implicits._
    // 40 docs, mixed scripts; a shared >=50-byte phrase planted verbatim
    // in benchmark-side (doc_id < 25) and training-side docs so the
    // rolling-hash span ops have cross-set repeats to find
    val shared = "これは五十バイトを超える共有スパンです — the shared span croisée №7! "
    val scripts = Seq(
      "café latte and smörgåsbord for breakfast — na zdraví! ",
      "日本語のテキストを処理するための分散クエリエンジンのテストです。",
      "Продолжение теста на кириллице с длинным текстом. ",
      "Mixed 🚀 emoji and Ωmega symbols in the corpus. ",
      // the \u000B vertical tab pins preTokPattern's explicit whitespace
      // class: Java \s includes VT, RE2's does not (ADVICE r12)
      "plain ascii filler,\u000Bit's 3.14 — don't split wrong.  ")
    val docs = (0 until 40).map { i =>
      val base = scripts(i % scripts.size) * 3
      val text = if (i % 4 == 0) base + shared + scripts((i + 1) % scripts.size)
      else base + scripts((i + 2) % scripts.size)
      (i.toLong, text, Seq("en", "ja", "ru", "fr")(i % 4), s"src${i % 3}", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_utf8corpus").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("q_fingerprint_winnow", "q_dedup_substr", "q_span_decontam", "q_dedup_minhash",
        "q_bpe_bytes", "q_bpe_pretok", "q_decontam_strip")
      .foreach(gateCompare(_, dir))
    // byte-exact excision (VERDICT r12 #5): the planted shared span —
    // which lands mid-multi-byte-character in several docs — must be
    // GONE from every cut doc, with no split-character residue (the
    // result is a JVM String, so validity is structural; completeness
    // is the check)
    val cut = SparkEntry.queries("q_decontam_strip")(spark, dir)
      .filter(col("n_cut") > 0).collect()
    assert(cut.nonEmpty, "the planted cross-set span must be found")
    cut.foreach { r =>
      assert(!r.getString(2).contains(shared.trim),
        s"doc ${r.getLong(0)}: leaked span survived the byte-exact strip")
    }
  }
}
