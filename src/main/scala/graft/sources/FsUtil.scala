package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Shared Hadoop-FileSystem file plumbing — one implementation of the
  * scheme-agnostic (file://, hdfs://, s3a://) single-file patterns the
  * sinks use, so fixes apply everywhere at once. */
object FsUtil {

  /** Join a base dir (possibly a URI) and a child name WITHOUT
    * java.nio.Paths — Paths.get collapses the '//' of a scheme. */
  def child(dir: String, name: String): String =
    dir.stripSuffix("/") + "/" + name

  /** Promote the single part file of a Spark text/json write out of its
    * temp directory to `dest`, replacing any existing file, and remove
    * the temp dir. */
  def promotePartFile(tmpDir: String, dest: String): Unit = {
    val fs = new HPath(tmpDir).getFileSystem(new Configuration())
    val part = fs.listStatus(new HPath(tmpDir)).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file written under $tmpDir"))
    val destPath = new HPath(dest)
    Option(destPath.getParent).foreach(fs.mkdirs)
    fs.delete(destPath, false)
    fs.rename(part, destPath)
    fs.delete(new HPath(tmpDir), true)
  }

  /** Driver-side small-file write through the FileSystem API (the
    * scheme-agnostic replacement for java.nio Files.writeString). */
  def writeString(path: String, content: String): Unit = {
    val p = new HPath(path)
    val fs = p.getFileSystem(new Configuration())
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Driver-side small-file read (scheme-agnostic). */
  def readString(path: String): String = {
    val p = new HPath(path)
    val fs = p.getFileSystem(new Configuration())
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
