package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Source-layer contract: `dir` is a filesystem-agnostic URI prefix.
  * Reading through an explicit `file://` scheme exercises the same
  * generic Hadoop-filesystem resolution an `s3a://` bucket path takes
  * (no local-path special-casing anywhere in Tables), per the README
  * object-store recipe. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("loaders accept scheme-qualified URIs identically to bare paths") {
    val bare = Tables.lineitem(spark, TestSpark.Sf)
    val uri = Tables.lineitem(spark, s"file://${TestSpark.Sf}")
    assert(uri.schema == bare.schema)
    assert(uri.count() == bare.count())
    // events takes the nanos-conf read path; cover it too
    assert(Tables.events(spark, s"file://${TestSpark.Sf}").count() ==
      Tables.events(spark, TestSpark.Sf).count())
  }

  test("every registered table resolves through the same URI contract") {
    Tables.all.foreach { name =>
      assert(Tables(spark, s"file://${TestSpark.Sf}", name).count() > 0, name)
    }
  }
}
