package graft.util

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Temp fixture directories with real cleanup. `File.deleteOnExit`
  * cannot remove non-empty directories, so fixture dirs full of
  * parquet/CSV files would leak into /tmp on every Verify/Bench run.
  * One JVM shutdown hook deletes every registered root recursively
  * (children before parents).
  */
object Scratch {
  private val roots = mutable.ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.synchronized(roots.foreach(deleteRecursively))))

  /** Create a temp directory cleaned up recursively at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    roots.synchronized { roots += p }
    p.toString
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      val all = try s.toArray(n => new Array[Path](n)) finally s.close()
      all.sortBy(p => -p.getNameCount).foreach(Files.deleteIfExists(_))
    }
}
