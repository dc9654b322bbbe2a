package graft.engine

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Zip-archive container IO — the reference's `to_zip`/`read_zip`
  * round-trip (SURVEY.md §2.1 [P]).
  *
  * A .zip archive is inherently a single sequential file, so the
  * archive step itself cannot be distributed — but the DATA work stays
  * parallel: the rows are written as csv part files by the cluster, and
  * packing only streams those byte-for-byte into the archive (no row
  * ever materializes on the driver). Reading reverses it: unpack bytes,
  * then a parallel csv scan over the extracted parts. For 100 TB data
  * zip is the wrong container (use parquet); this exists for parity
  * with the reference's archive interchange surface.
  */
object ZipIo {

  /** Write `df` as one .zip of csv parts (header in every part). */
  def writeZip(df: DataFrame, zipPath: String): Unit = {
    val stage = Scratch.dir(s"zip_stage/${new File(zipPath).getName}")
    df.write.mode("overwrite").option("header", "true").csv(stage)
    val parts = Option(new File(stage).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .sortBy(_.getName)
    val target = new File(zipPath)
    Option(target.getParentFile).foreach(_.mkdirs())
    val out = new ZipOutputStream(new FileOutputStream(target))
    try parts.foreach { p =>
      out.putNextEntry(new ZipEntry(p.getName))
      val in = new BufferedInputStream(new FileInputStream(p))
      try in.transferTo(out) finally in.close()
      out.closeEntry()
    } finally out.close()
  }

  /** Read a .zip of csv entries back as a DataFrame (schema mandatory —
    * the stable-schema contract all chunked constructors share).
    */
  def readZip(spark: SparkSession, zipPath: String, schema: StructType): DataFrame = {
    val extract = new File(Scratch.dir(s"zip_extract/${new File(zipPath).getName}"))
    if (extract.exists()) {
      Option(extract.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    } else extract.mkdirs()
    val in = new ZipInputStream(new BufferedInputStream(new FileInputStream(zipPath)))
    try {
      Iterator.continually(in.getNextEntry).takeWhile(_ != null).foreach { e =>
        val dest = new File(extract, new File(e.getName).getName)
        val out = new FileOutputStream(dest)
        try in.transferTo(out) finally out.close()
        in.closeEntry()
      }
    } finally in.close()
    spark.read.schema(schema).option("header", "true").csv(extract.getAbsolutePath)
  }
}
