package graft

import graft.ops.OracleKit
import org.apache.spark.sql.functions._

/** The named ASCII guard on the string-hash oracles (VERDICT r10 #8):
  * OracleKit's byte extraction (`ord(substr)`) is byte-faithful only on
  * ASCII, so a non-ASCII corpus used to fail the gate as a bare hash
  * mismatch with no cause attached. Now the generated SQL carries
  * [[OracleKit.asciiGuardSql]] and fails with a NAMED DuckDB error. This
  * spec runs the actual generated SQL in the oracle engine (python3 +
  * duckdb, the driver's gate tooling — `assume`d, so an environment
  * without it cancels rather than fails):
  *
  *  - a non-ASCII gram through the XXH64 string chain → the named error;
  *  - an ASCII gram through the same chain → exactly Spark's xxhash64
  *    (the cross-engine equality the gate usually checks at sf scale);
  *  - the doc-level guard predicate: non-ASCII → named error, ASCII →
  *    keeps every row. */
class AsciiOracleGuardSpec extends SparkSpec {

  /** Run `sql` in DuckDB; Right(first-column first-row as string) or
    * Left(error message). */
  private def duck(sql: String): Either[String, String] = {
    import scala.sys.process._
    val script =
      s"""import duckdb, sys
         |try:
         |    con = duckdb.connect()
         |    r = con.sql(r${"\"\"\""}$sql${"\"\"\""}).fetchall()
         |    print("OK", r[0][0] if r else "<empty>")
         |except Exception as e:
         |    print("ERR", str(e))
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_ascii", ".py")
    java.nio.file.Files.writeString(f, script)
    val out = new StringBuilder
    val code = Seq("python3", f.toString) ! ProcessLogger(l => { out.append(l).append('\n'); () })
    val text = out.toString.trim
    if (code != 0) Left(s"python exited $code: $text")
    else if (text.startsWith("OK ")) Right(text.stripPrefix("OK "))
    else Left(text.stripPrefix("ERR "))
  }

  private lazy val duckAvailable: Boolean =
    duck("SELECT 1").isRight

  private def xxSql(gram: String): String =
    OracleKit.nestedProjections(
      s"SELECT '$gram' AS sh", OracleKit.xxhash64StrSteps("sh"),
      s"${OracleKit.toSigned64("hu")} AS h")

  test("non-ASCII gram through the XXH64 string replay fails with the named reason") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    duck(xxSql("café latte")) match {
      case Left(msg) =>
        assert(msg.contains("non-ASCII"), s"failure must be named: $msg")
        assert(msg.contains("ord(substr)"), s"failure must carry the cause: $msg")
      case Right(v) => fail(s"non-ASCII gram hashed to $v instead of failing loud")
    }
  }

  test("ASCII grams through the guarded chain still equal Spark's xxhash64 exactly") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    // lengths straddle the XXH64 stripe/tail branches: 1-byte tail,
    // 4-byte word, 8-byte word, full 32-byte stripes + mixed tail
    val grams = Seq("a", "word", "brownfox", "the quick brown fox jumps over the lazy dog")
    val want = spark.range(1).select(
      grams.map(g => xxhash64(lit(g)).cast("string")): _*).head.toSeq
    grams.zip(want).foreach { case (g, w) =>
      duck(xxSql(g)) match {
        case Right(v) => assert(v == w, s"gram '$g': duckdb $v != spark $w")
        case Left(m)  => fail(s"ASCII gram '$g' failed the guard: $m")
      }
    }
  }

  test("the doc-level guard predicate: non-ASCII errors loud, ASCII keeps every row") {
    assume(duckAvailable, "python3+duckdb (the oracle gate engine) not available")
    val guard = OracleKit.asciiGuardSql("text", "documents.text")
    duck(s"SELECT COUNT(*) FROM (SELECT 'plain ascii' AS text) WHERE $guard") match {
      case Right(v) => assert(v == "1", s"ASCII doc filtered out: $v")
      case Left(m)  => fail(s"ASCII doc errored: $m")
    }
    duck(s"SELECT COUNT(*) FROM (SELECT 'smørrebrød' AS text) WHERE $guard") match {
      case Left(msg) => assert(msg.contains("non-ASCII"), s"failure must be named: $msg")
      case Right(v)  => fail(s"non-ASCII doc passed the guard: $v")
    }
  }
}
