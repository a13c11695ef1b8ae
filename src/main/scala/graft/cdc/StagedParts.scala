package graft.cdc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** The mechanical half of every staged-rename publisher in this package:
  * distributed text write into a (hidden) temp directory, then the
  * name-sorted list of produced part files. The COMMIT half — what gets
  * swept, what the final names are, whether parts rename individually
  * into a live directory ([[JdbcIncremental]]'s polls/chunks: the log is
  * already live, names must slot into the committed order) or the whole
  * temp tree promotes with one atomic rename ([[CdcLogCompaction]]: the
  * output must be absent-or-complete) — is protocol, and deliberately
  * stays with each publisher.
  */
private[graft] object StagedParts {

  /** Write `df` as text into `tmp` (overwriting) and return its part
    * files sorted by name — the deterministic order every publisher's
    * zero-padded final naming relies on.
    */
  def write(df: DataFrame, fs: FileSystem, tmp: Path): Seq[Path] = {
    df.write.mode("overwrite").text(tmp.toString)
    fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)
      .sortBy(_.getName)
  }
}
