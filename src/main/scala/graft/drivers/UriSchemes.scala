package graft.drivers

/** URI-scheme utilities backing driver auto-resolution — parity with the
  * reference's scheme-addressed driver model (`@Driver` declares schemes;
  * `NoDriverForSchemeException` / `UnclearDriverException` in
  * `/root/reference/src/Exception/`), where migrations may declare
  * `csv://dir/out.csv` or `sqlite:///db.sqlite` and the engine picks the
  * driver from the scheme.
  */
object UriSchemes {
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.\\-]*):".r

  /** Schemes naming a graft *format* driver rather than a Hadoop
    * filesystem; these are stripped by [[path]] before a file driver
    * hands the location to Spark.
    */
  private[graft] val FormatSchemes = Set("parquet", "orc", "csv", "json", "jsonl", "yaml", "yml")

  /** Lowercased scheme of a URI, if it has one. */
  def schemeOf(uri: String): Option[String] =
    SchemeRe.findFirstMatchIn(uri).map(_.group(1).toLowerCase)

  /** Strip a leading *format* scheme (`csv://out/dir` → `out/dir`,
    * `yaml:///abs/dir` → `/abs/dir`) so the file drivers accept
    * reference-style URIs; genuine filesystem schemes (`file://`,
    * `hdfs://`, `s3a://`, …) pass through for Hadoop to resolve.
    */
  def path(uri: String): String = schemeOf(uri) match {
    case Some(s) if FormatSchemes(s) =>
      val rest = uri.substring(s.length + 1)
      if (rest.startsWith("//")) rest.substring(2) else rest
    case _ => uri
  }

  /** Normalize a database URI to a JDBC URL: `jdbc:…` passes through,
    * anything else (`sqlite:///db.sqlite`, reference-style) gets the
    * `jdbc:` prefix the Spark JDBC source expects.
    */
  def jdbcUrl(uri: String): String =
    if (uri.startsWith("jdbc:")) uri else "jdbc:" + uri
}
