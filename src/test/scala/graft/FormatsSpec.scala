package graft

import java.nio.file.Files
import graft.sources.Tables

/** Source/sink format breadth: the engine's tables round-trip through
  * CSV and JSON (schema-preserving reads, no inference) — the generic
  * `spark.read`/`write` surface SURVEY.md §2 Table B promises. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("orders round-trips through CSV with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val orders = Tables.orders(spark, sf)
    orders.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(dir)
    val back = spark.read
      .schema(Tables.ordersSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(dir)
    assert(back.schema === orders.schema)
    assert(back.count() === orders.count())
    val a = orders.orderBy($"o_orderkey").collect().map(_.toSeq)
    val b = back.orderBy($"o_orderkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("embeddings round-trip through JSON (arrays preserved)") {
    val dir = Files.createTempDirectory("graft-json").toString
    val emb = Tables.embeddings(spark, sf)
    emb.write.mode("overwrite").json(dir)
    val back = spark.read.schema(Tables.embeddingsSchema).json(dir)
    assert(back.count() === emb.count())
    val a = emb.orderBy($"vec_id").select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val b = back.orderBy($"vec_id").select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(a.sameElements(b))
  }

  test("documents round-trip through ORC") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(Tables.documentsSchema).orc(dir)
    assert(back.schema === docs.schema)
    assert(back.orderBy($"doc_id").collect().map(_.toSeq).toSeq ===
      docs.orderBy($"doc_id").collect().map(_.toSeq).toSeq)
  }
}
