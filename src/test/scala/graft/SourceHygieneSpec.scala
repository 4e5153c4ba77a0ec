package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene gate: no Scala source may contain a NUL (0x00)
  * byte. A NUL makes git classify the file as binary, which hides its
  * entire content — and every future edit — from textual diff review
  * (the review-evasion hazard flagged by ADVICE.md r1 on NormalizeTs).
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: String): Seq[Path] = {
    val base = Paths.get(root)
    if (!Files.exists(base)) Seq.empty
    else Files.walk(base).iterator.asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toSeq
  }

  test("no NUL bytes in any .scala source (diffs must stay textual)") {
    val offenders = (scalaSources("src/main") ++ scalaSources("src/test"))
      .filter(p => Files.readAllBytes(p).contains(0.toByte))
    assert(offenders.isEmpty,
      s"NUL byte found in: ${offenders.mkString(", ")} — git will treat " +
        "these as binary and hide their diffs from review")
  }
}
