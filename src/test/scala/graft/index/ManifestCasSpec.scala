package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.CodeCorpus

/** The manifest commit's version CAS: a mutator that read its basis at
  * version v must commit exactly v+1. If another writer advanced LATEST
  * in between, a blind commit would discard that writer's epochs from
  * the manifest view — the CAS turns the single-writer contract
  * violation into a loud error instead of silent data loss.
  */
class ManifestCasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("commitVersion rejects a commit whose basis is not the current LATEST") {
    val dir = java.nio.file.Files.createTempDirectory("graftcas").toString
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"), 256, 2)
    IndexStore.create(CodeCorpus.generate(spark, 30, 2), config, dir, "snap-0")
    assert(IndexStore.currentVersion(dir) === 1)
    // committing v3 on a store whose LATEST is v1 = a stale basis (the
    // writer read v2 that a concurrent writer has since replaced, or
    // skipped ahead) — must fail loudly, and LATEST must be untouched
    val ex = intercept[IllegalStateException](IndexStore.commitVersion(dir, 3))
    assert(ex.getMessage.contains("concurrent manifest writer"), ex.getMessage)
    assert(IndexStore.currentVersion(dir) === 1)
    // the happy path still advances: a real mutator reads basis 1 and
    // commits 2
    IndexStore.updateConfig(spark, dir, set = Map("k" -> "v"))
    assert(IndexStore.currentVersion(dir) === 2)
    assert(IndexStore.configValue(spark, dir, "k") === Some("v"))
  }
}
