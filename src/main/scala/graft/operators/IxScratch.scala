package graft.operators

/** Session-scoped scratch homes for the registered queries' stored
  * indexes ([[RetrievalIndex]], [[DecontamIndex]]): a registered query
  * cannot take an index directory as a parameter, so each family builds
  * its index once per (dataset, family) into a temp dir and re-serves
  * it for the rest of the JVM.
  *
  * The cache key embeds a FINGERPRINT of the dataset files (name, size,
  * mtime): a dataset regenerated at the same path within one JVM — or
  * across a long verify session — must rebuild, not silently serve a
  * stale index. A shutdown hook removes every temp dir this object
  * handed out.
  */
private[operators] object IxScratch {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  sys.addShutdownHook {
    dirs.forEach { p =>
      import java.nio.file.{Files, Path, Paths}
      import java.util.Comparator
      val root = Paths.get(p)
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
  }

  /** Fingerprint of one parquet table under a dataset dir (relative
    * path, length, mtime — enough to catch regeneration in place). The
    * walk is RECURSIVE: a partitioned or bucketed table nests its part
    * files in subdirectories, and a top-level-only listing would
    * fingerprint it as empty (every regeneration would silently serve
    * the first build's index). */
  def fingerprint(d: String, table: String = "documents.parquet"): String = {
    val root = new java.io.File(d.stripPrefix("file:"), table)
    val files: Array[(String, java.io.File)] =
      if (root.isFile) Array(root.getName -> root)
      else if (!root.exists()) Array.empty
      else {
        import java.nio.file.{Files, Path}
        val s = Files.walk(root.toPath)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => Files.isRegularFile(p))
            .map(p => root.toPath.relativize(p).toString -> p.toFile)
            .toArray
        } finally s.close()
      }
    files.sortBy(_._1)
      .map { case (rel, f) => s"$rel:${f.length}:${f.lastModified}" }
      .mkString(d + "|", ",", "")
  }

  /** The temp dir for `key`, building it with `make` on first use. */
  def cached(key: String, prefix: String)(make: String => Unit): String =
    cache.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory(prefix).toString
      dirs.add(p)
      make(p)
      p
    })
}
