package graft

/** Per-test form of [[HeavyTest]] — tag individual long tests inside an
  * otherwise-fast suite: `test("...", Heavy) { ... }`. Excluded from
  * the default `sbt test` (budget rationale in HeavyTest.java); run
  * everything with GRAFT_HEAVY_TESTS=1. */
object Heavy extends org.scalatest.Tag("graft.HeavyTest")
