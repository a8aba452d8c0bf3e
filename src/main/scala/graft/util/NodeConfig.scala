package graft.util

import scala.collection.mutable.ArrayBuffer

/** Typed node configuration with the reference's default-on-absent
  * semantics (`src/util/config.cc:24-48`: cache 1024 entries / 60 s TTL,
  * batching 8 / 2 ms when the blocks are absent). The on-disk format is
  * the same textproto shape the reference reads (`config/node1.textproto`,
  * schema `proto/config.proto`) — parsed here by a small self-contained
  * reader (no protobuf dependency): `key: value` scalars, `key { … }`
  * blocks (repeatable), `#` comments.
  *
  * In the Spark engine the node/peer/shard fields are descriptive (the
  * cluster manager owns placement); cache and batching settings feed
  * [[graft.operators.SearchService]].
  */
final case class PeerInfo(nodeId: String, address: String)
final case class ShardInfo(shardId: String, dimension: Int, indexPath: String)
final case class CacheSettings(maxEntries: Int = 1024, ttlSeconds: Int = 60)
final case class BatchingSettings(preferredBatchSize: Int = 8, maxBatchDelayMs: Int = 2)

final case class NodeRuntimeConfig(
    nodeId: String = "",
    bindAddress: String = "",
    peers: Seq[PeerInfo] = Nil,
    shards: Seq[ShardInfo] = Nil,
    cache: CacheSettings = CacheSettings(),
    batching: BatchingSettings = BatchingSettings())

object ConfigLoader {

  def fromFile(path: String): NodeRuntimeConfig = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p))
      throw new IllegalArgumentException(s"Failed to open config file: $path")
    fromString(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  }

  def fromString(content: String): NodeRuntimeConfig = {
    val root = parseBlock(new Tokenizer(content), topLevel = true)
    def block(fields: Seq[(String, Any)], name: String): Option[Seq[(String, Any)]] =
      fields.collectFirst { case (`name`, b: Seq[_]) =>
        b.asInstanceOf[Seq[(String, Any)]] }
    def blocks(fields: Seq[(String, Any)], name: String): Seq[Seq[(String, Any)]] =
      fields.collect { case (`name`, b: Seq[_]) => b.asInstanceOf[Seq[(String, Any)]] }
    def str(fields: Seq[(String, Any)], name: String, dflt: String = ""): String =
      fields.collectFirst { case (`name`, v: String) => v }.getOrElse(dflt)
    def int(fields: Seq[(String, Any)], name: String, dflt: Int): Int =
      fields.collectFirst { case (`name`, v: String) => v.toInt }.getOrElse(dflt)

    NodeRuntimeConfig(
      nodeId = str(root, "node_id"),
      bindAddress = str(root, "bind_address"),
      peers = blocks(root, "peers").map(b =>
        PeerInfo(str(b, "node_id"), str(b, "address"))),
      shards = blocks(root, "shards").map(b =>
        ShardInfo(str(b, "shard_id"), int(b, "dimension", 0), str(b, "index_path"))),
      // default-on-absent: absent BLOCK → all defaults (reference parity);
      // within a present block, absent fields are proto3 zero — but the
      // reference always writes both fields, so field-level absence keeps
      // the same defaults here for robustness.
      cache = block(root, "cache").map(b =>
        CacheSettings(int(b, "max_entries", 1024), int(b, "default_ttl_seconds", 60)))
        .getOrElse(CacheSettings()),
      batching = block(root, "batching").map(b =>
        BatchingSettings(int(b, "preferred_batch_size", 8), int(b, "max_batch_delay_ms", 2)))
        .getOrElse(BatchingSettings()))
  }

  // ---- minimal textproto-subset reader ----
  //
  // String escapes: exactly the subset the reference's configs use —
  // \n \t \r \\ \" \' . The full textproto grammar also allows \a \b \f
  // \v, octal (\NNN), hex (\xNN) and unicode (\uNNNN) escapes; those
  // are REJECTED with a parse error (fail loudly, never silently mangle
  // a value). Extend the match in Tokenizer.next() if a config needs
  // them.

  private final class Tokenizer(s: String) {
    private var i = 0
    private def skipWs(): Unit = {
      while (i < s.length && (s(i).isWhitespace || s(i) == '#')) {
        if (s(i) == '#') while (i < s.length && s(i) != '\n') i += 1
        else i += 1
      }
    }
    /** next token: "{", "}", identifier, or quoted/bare value; null at end */
    def next(): String = {
      skipWs()
      if (i >= s.length) return null
      s(i) match {
        case '{' | '}' => i += 1; s.substring(i - 1, i)
        case ':' => i += 1; next()
        case '"' =>
          val start = i + 1
          i += 1
          val sb = new StringBuilder
          while (i < s.length && s(i) != '"') {
            if (s(i) == '\\' && i + 1 < s.length) {
              // decode the standard textproto escapes; anything else is
              // a parse error rather than a silently mangled value
              s(i + 1) match {
                case 'n'  => sb.append('\n')
                case 't'  => sb.append('\t')
                case 'r'  => sb.append('\r')
                case '\\' => sb.append('\\')
                case '"'  => sb.append('"')
                case '\'' => sb.append('\'')
                case other => throw new IllegalArgumentException(
                  s"Unable to parse node config: unsupported escape '\\$other' at offset $i")
              }
              i += 2
            }
            else { sb.append(s(i)); i += 1 }
          }
          if (i >= s.length) throw new IllegalArgumentException(
            s"Unable to parse node config: unterminated string at offset $start")
          i += 1
          sb.toString
        case _ =>
          val start = i
          while (i < s.length && !s(i).isWhitespace &&
            s(i) != ':' && s(i) != '{' && s(i) != '}' && s(i) != '#') i += 1
          if (i == start) throw new IllegalArgumentException(
            s"Unable to parse node config at offset $i")
          s.substring(start, i)
      }
    }
  }

  /** Parse fields until '}' (or end of input at top level); values are
    * String (scalar) or Seq[(String, Any)] (nested block). */
  private def parseBlock(t: Tokenizer, topLevel: Boolean): Seq[(String, Any)] = {
    val fields = ArrayBuffer.empty[(String, Any)]
    var tok = t.next()
    while (tok != null && tok != "}") {
      val key = tok
      val v = t.next()
      if (v == null) throw new IllegalArgumentException(
        s"Unable to parse node config: dangling field '$key'")
      if (v == "{") fields += key -> parseBlock(t, topLevel = false)
      else fields += key -> v
      tok = t.next()
    }
    if (tok == null && !topLevel) throw new IllegalArgumentException(
      "Unable to parse node config: unterminated block")
    if (tok == "}" && topLevel) throw new IllegalArgumentException(
      "Unable to parse node config: unmatched '}'")
    fields.toSeq
  }
}
