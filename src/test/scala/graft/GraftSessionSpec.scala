package graft

/** The cluster posture map: values well-formed, and every SQL-dynamic
  * conf is acceptable to a live session (a typo'd key or value would
  * only surface at deploy time otherwise). */
class GraftSessionSpec extends SparkSpec {

  test("clusterConf: well-formed, SQL-dynamic keys settable on a live session") {
    val conf = GraftSession.clusterConf(totalCores = 8000, checkpointDir = "/ckpt")
    assert(conf("spark.sql.shuffle.partitions") == "16000")
    assert(conf("spark.sql.adaptive.advisoryPartitionSizeInBytes").toLong == 256L << 20)
    assert(conf("spark.sql.files.maxPartitionBytes").toLong == 256L << 20)
    val dynamic = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.files.maxPartitionBytes")
    dynamic.foreach { k =>
      val prev = spark.conf.getOption(k)
      try spark.conf.set(k, conf(k)) // throws on an invalid key/value
      finally prev match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }
}
