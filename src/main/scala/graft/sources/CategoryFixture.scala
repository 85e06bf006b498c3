package graft.sources

/** Test-fixture generator for the reference-shaped gallery-metadata
  * JSON ({"train": [[label, path], …], "categories": [...]}, the
  * train_val.json layout of precompute_features.py:136-213). Lives in
  * the fixture layer so QUERY BUILDING stays side-effect-free: `ensure`
  * is idempotent (content-addressed path, written only when absent) and
  * memoized per JVM, so after the first call a query referencing the
  * fixture is a pure plan over an existing input file. In production the
  * JSON is a real input; this generator only exists because the test
  * container ships no gallery export.
  */
object CategoryFixture {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  /** Path to a deterministic train_val.json for labels 0..maxLabel
    * (category name = "cat_<label>"), generated under the build dir
    * exactly once per (JVM, maxLabel). */
  def ensure(maxLabel: Long): String = cache.getOrElseUpdate(maxLabel, {
    val cats = (0L to maxLabel).map(l => s""""cat_$l"""").mkString(",")
    val items = (0L to maxLabel)
      .map(l => s"""[$l, "img_seed_$l.png"]""").mkString(",")
    val dir = java.nio.file.Paths.get("target", "graft-tmp")
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(s"train_val_$maxLabel.json")
    // write-to-temp + atomic move: a pre-existing file could be a
    // truncated leftover from a crashed run, and generation is cheap
    // and deterministic — so ALWAYS rewrite, and never let a reader
    // (this JVM or a concurrent one) observe a half-written file
    val tmp = java.nio.file.Files.createTempFile(dir, "train_val_", ".tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"train": [$items], "categories": [$cats]}""")
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    p.toString
  })
}
