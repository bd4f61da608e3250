package graft.io

import org.apache.spark.sql.SparkSession

/** Small string-file IO through a path's OWN Hadoop filesystem — the
  * sidecar idiom shared by the IVF+PQ index metadata and the persisted
  * BPE tokenizer: metadata must ride the same hdfs://-or-s3a:// tree as
  * the data it describes, never strand on the driver's local disk. */
object FsText {

  /** Write `text` (UTF-8) at `path`. With `overwrite = false` the create
    * is EXCLUSIVE: returns false (writing nothing) when the file already
    * exists — atomic on HDFS and local filesystems; object stores without
    * atomic create-no-overwrite make this best-effort. */
  def write(spark: SparkSession, path: String, text: String,
      overwrite: Boolean = true): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try fs.create(p, overwrite)
      catch { case _: java.io.IOException if !overwrite && fs.exists(p) => return false }
    try out.write(text.getBytes("UTF-8")) finally out.close()
    true
  }

  /** The file's UTF-8 contents, or None when it does not exist. */
  def read(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }
  }
}
