package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parameter pin for materialized serving indexes (MinHash bands,
  * fingerprint chunks, IVFADC codes). A serving index probed or appended
  * with parameters other than the ones it was built with does not fail —
  * it silently misses duplicates / neighbors (different band keys, chunk
  * boundaries or codebooks never collide). The `_index_spec` file pins
  * the build parameters; append and probe verify it and fail with a
  * clear message on mismatch. Indexes created before the spec existed
  * are accepted (no file = no check; append heals by writing it).
  *
  * Write-ordering discipline for builders: on overwrite, DELETE the old
  * spec before any data write and write the new one only after every
  * data write commits — a build that dies mid-way leaves no spec, so a
  * later probe under new parameters cannot silently pass the guard over
  * stale-parameter data.
  */
private[graft] object IndexSpec {

  private def specPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/_index_spec")

  def delete(df: DataFrame, dir: String): Unit = delete(df.sparkSession, dir)

  def delete(spark: SparkSession, dir: String): Unit = {
    val p = specPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  def write(df: DataFrame, dir: String, spec: String): Unit =
    write(df.sparkSession, dir, spec)

  def write(spark: SparkSession, dir: String, spec: String): Unit = {
    val p = specPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(spec.getBytes("UTF-8")) finally out.close()
  }

  def check(
      df: DataFrame, dir: String, spec: String,
      writeIfMissing: Boolean = false): Unit =
    check(df.sparkSession, dir, spec, writeIfMissing)

  def check(
      spark: SparkSession, dir: String, spec: String,
      writeIfMissing: Boolean): Unit = {
    if (!checkReturningPresence(spark, dir, spec) && writeIfMissing)
      write(spark, dir, spec)
  }

  /** Verify the stored spec if one exists and report whether it did.
    * Append paths use this to DEFER the heal (or first-append build)
    * spec write until after their data writes commit — writing the spec
    * upfront on a fresh dir would leave a valid spec over partial data
    * if the append dies mid-way, the exact silent-miss case the
    * write-ordering discipline above exists to prevent. */
  def checkReturningPresence(
      df: DataFrame, dir: String, spec: String): Boolean =
    checkReturningPresence(df.sparkSession, dir, spec)

  /** The stored spec line, if the table carries one — the SQL MERGE
    * surface derives (key, buckets) from it so the statement cannot
    * drift from the pinned layout. */
  def read(spark: SparkSession, dir: String): Option[String] = {
    val p = specPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        Some(new String(buf, "UTF-8"))
      } finally in.close()
    }
  }

  def checkReturningPresence(
      spark: SparkSession, dir: String, spec: String): Boolean = {
    val p = specPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val stored =
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf)
          new String(buf, "UTF-8")
        } finally in.close()
      require(stored == spec,
        s"index at $dir was built with '$stored' but accessed with '$spec' — " +
          "mismatched parameters silently miss duplicates; rebuild or use the " +
          "original parameters")
      true
    } else false
  }
}
