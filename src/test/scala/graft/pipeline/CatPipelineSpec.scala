package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CatPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("full lifecycle runs, validates laws, and resumes idempotently") {
    val root = Files.createTempDirectory("graft-cat").toString
    val r1 = CatPipeline.run(spark, TestSpark.sf001, root)
    assert(r1.pipeline.computedStages === 6)
    assert(r1.pages.count() > 0)
    assert(r1.zoned.count() > 0)
    assert(r1.osmNodes.count() === r1.conjoined.count()) // no dup coords here
    assert(r1.pipeline.validate(CatPipeline.laws).isEmpty)

    // second run: everything resumes from the manifests
    val r2 = CatPipeline.run(spark, TestSpark.sf001, root)
    assert(r2.pipeline.computedStages === 0)
    assert(r2.zoned.count() === r1.zoned.count())
  }
}
