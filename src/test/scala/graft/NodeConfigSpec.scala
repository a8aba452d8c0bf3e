package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.{BatchingSettings, CacheSettings, ConfigLoader}

class NodeConfigSpec extends AnyFunSuite {

  private val full =
    """# engine node config
      |node_id: "alpha"
      |bind_address: "0.0.0.0:7000"
      |peers {
      |  node_id: "beta"
      |  address: "10.0.0.2:7000"
      |}
      |peers {
      |  node_id: "gamma"
      |  address: "10.0.0.3:7000"
      |}
      |shards {
      |  shard_id: "docs-0"
      |  dimension: 64
      |  index_path: "/data/docs-0"
      |}
      |cache {
      |  max_entries: 2048
      |  default_ttl_seconds: 30
      |}
      |batching {
      |  preferred_batch_size: 16
      |  max_batch_delay_ms: 5
      |}
      |""".stripMargin

  test("full config parses every field") {
    val cfg = ConfigLoader.fromString(full)
    assert(cfg.nodeId === "alpha")
    assert(cfg.bindAddress === "0.0.0.0:7000")
    assert(cfg.peers.map(_.nodeId) === Seq("beta", "gamma"))
    assert(cfg.peers(1).address === "10.0.0.3:7000")
    assert(cfg.shards.map(s => (s.shardId, s.dimension, s.indexPath)) ===
      Seq(("docs-0", 64, "/data/docs-0")))
    assert(cfg.cache === CacheSettings(2048, 30))
    assert(cfg.batching === BatchingSettings(16, 5))
  }

  test("absent cache/batching blocks take reference defaults (1024/60, 8/2)") {
    val cfg = ConfigLoader.fromString("""node_id: "solo"""")
    assert(cfg.cache === CacheSettings(1024, 60))
    assert(cfg.batching === BatchingSettings(8, 2))
    assert(cfg.peers.isEmpty && cfg.shards.isEmpty)
  }

  test("empty config is all defaults") {
    val cfg = ConfigLoader.fromString("")
    assert(cfg.cache === CacheSettings(1024, 60))
    assert(cfg.batching === BatchingSettings(8, 2))
    assert(cfg.nodeId === "")
  }

  test("quoted-string escapes decode (\\n, \\t, \\\\, \\\") and unknown escapes raise") {
    val cfg = ConfigLoader.fromString(
      "node_id: \"a\\nb\\tc\\\\d\\\"e\"")
    assert(cfg.nodeId === "a\nb\tc\\d\"e")
    intercept[IllegalArgumentException](
      ConfigLoader.fromString("node_id: \"bad\\x escape\""))
  }

  test("missing file and malformed content raise") {
    intercept[IllegalArgumentException](ConfigLoader.fromFile("/nonexistent/x.textproto"))
    intercept[IllegalArgumentException](ConfigLoader.fromString("cache {"))
    intercept[IllegalArgumentException](ConfigLoader.fromString("}"))
    intercept[IllegalArgumentException](ConfigLoader.fromString("node_id: \"unterminated"))
  }

  test("file round-trip") {
    val f = java.nio.file.Files.createTempFile("graft-node", ".textproto")
    java.nio.file.Files.write(f, full.getBytes("UTF-8"))
    try {
      val cfg = ConfigLoader.fromFile(f.toString)
      assert(cfg.nodeId === "alpha")
      assert(cfg.cache.maxEntries === 2048)
    } finally java.nio.file.Files.delete(f)
  }
}
